"""Special functions for driver-side inference — no scipy dependency.

Regularized incomplete gamma by the textbook pair (series expansion for
x < s + 1, modified Lentz continued fraction otherwise — the classical
``gammp``/``gammq`` construction), giving the chi-square survival
function for real (Satterthwaite, non-integer) degrees of freedom.
Accuracy ~1e-12 relative over the statistical range; pinned in tests
against closed forms (df=2: exp(-x/2); df=1: erfc(sqrt(x/2)); df=4:
exp(-x/2)(1+x/2)).
"""

from __future__ import annotations

import math

_MAX_ITER = 500
_EPS = 3e-15


def _gamma_p_series(s: float, x: float) -> float:
    """Regularized lower incomplete gamma P(s, x) by series; x < s + 1."""
    ap = s
    term = 1.0 / s
    total = term
    for _ in range(_MAX_ITER):
        ap += 1.0
        term *= x / ap
        total += term
        if abs(term) < abs(total) * _EPS:
            break
    return total * math.exp(-x + s * math.log(x) - math.lgamma(s))


def _gamma_q_contfrac(s: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(s, x) by modified Lentz
    continued fraction; x >= s + 1."""
    tiny = 1e-300
    b = x + 1.0 - s
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER + 1):
        an = -i * (i - s)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h * math.exp(-x + s * math.log(x) - math.lgamma(s))


def gammainc_q(s: float, x: float) -> float:
    """Regularized UPPER incomplete gamma Q(s, x) = Gamma(s, x)/Gamma(s)."""
    if s <= 0.0:
        raise ValueError("s must be positive")
    if x < 0.0:
        raise ValueError("x must be non-negative")
    if x == 0.0:
        return 1.0
    if x < s + 1.0:
        return 1.0 - _gamma_p_series(s, x)
    return _gamma_q_contfrac(s, x)


def chi2_sf(x: float, df: float) -> float:
    """Chi-square survival function P(X > x) for real df > 0."""
    if df <= 0.0:
        raise ValueError("df must be positive")
    if x <= 0.0:
        return 1.0
    return gammainc_q(df / 2.0, x / 2.0)
