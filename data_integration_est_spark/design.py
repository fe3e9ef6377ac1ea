"""Survey-design carriers — the Spark analogue of ``survey::svydesign``.

The reference passes (data, weights) pairs around as ``svydesign`` objects
(reference ``RegDI2.R:181-185``, ``PC.R:190,216``) and calibrated variants of
them (``RegDI2.R:188-193``, ``PC.R:222-227``).  Here a design is a thin
dataclass wrapping a DataFrame + column names; estimation methods live in
``kernels.stats`` and take the design as input.  Nothing is materialized at
construction — a design is a logical plan plus metadata.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class SurveyDesign:
    """A (data, weight) pair: each row is an element-level sampling unit.

    Mirrors ``svydesign(ids=~1, data=..., weights=...)`` — independent
    sampling of elements, with-replacement variance approximation, no FPC
    (the only design shape the reference constructs, ``RegDI2.R:181-185``).
    With ``strata_col`` it becomes ``svydesign(ids=~1, strata=~h, ...)``:
    estimation is unchanged, but the linearization variance is summed
    WITHIN strata (independent draws per stratum), the natural design for
    the stratified study populations (``nb[3]``, ``nb[12]``).
    """

    df: DataFrame
    weight_col: str
    # Set when the design came out of `calibrate`: the design-matrix columns
    # used for calibration, and the pre-calibration weight column.  svymean
    # variance on a calibrated design linearizes against these columns.
    calibration_cols: list[str] | None = None
    base_weight_col: str | None = None
    # Stratified element sampling: variance contributions are computed and
    # degree-of-freedom-corrected per stratum, then summed.
    strata_col: str | None = None
    # Finite population correction — ``svydesign(fpc=~N)``: a column
    # holding the POPULATION size of each row's stratum (constant within
    # a stratum; with no strata, the overall N).  When set, each
    # stratum's variance piece is scaled by (1 - n_h/N_h) — the SRS-WOR
    # correction; a census stratum (n_h = N_h) contributes zero
    # variance.  Estimation (point values, weights) is unchanged.
    fpc_col: str | None = None
    # Two-stage cluster sampling — ``svydesign(ids=~psu)`` (r14): a
    # column naming each element's first-stage sampling unit.  The
    # reference constructs only ``ids=~1`` (every row its own cluster,
    # ``RegDI2.R:181-185``), but a survey user's first generalization is
    # PSU sampling; estimation (point values, weights) is unchanged and
    # the linearization variance becomes the with-replacement
    # FIRST-STAGE approximation: per-stratum variance of weighted PSU
    # totals with the n_h/(n_h-1) correction, n_h = number of sampled
    # PSUs in stratum h (the ``survey`` package's default
    # ``options(survey.lonely.psu=)``-free behavior).  PSUs must nest
    # within strata.  With ``fpc_col`` set, N_h is the POPULATION count
    # of PSUs in the stratum (not elements).  Calibrated cluster
    # designs: the four moment kernels (svymean/svytotal/svyratio/
    # svyvar) linearize directly (r15 — the GREG residual projection B
    # comes from the ELEMENT-level d-Gram, then the residualized
    # influence collapses to PSU totals: survey::svyrecvar's shape);
    # the remaining SE kernels refuse, pointing at brr_mean /
    # jackknife_psu_calibrated_mean.
    psu_col: str | None = None

    def __post_init__(self) -> None:
        cols = set(self.df.columns)
        if self.weight_col not in cols:
            raise ValueError(f"weight column {self.weight_col!r} not found in the data")

    @property
    def is_calibrated(self) -> bool:
        return self.calibration_cols is not None


@dataclass
class CalibrationSpec:
    """A linear (GREG / chi-square distance) calibration problem.

    ``x_cols`` are the design-matrix columns (already materialized on the
    DataFrame — the reference builds them as ``delta_*`` helper columns,
    ``RegDI2.R:126-141``); ``totals`` maps each x column to its known or
    estimated population total (``RegDI2.R:143-168``, ``PC.R:180-199``).
    """

    x_cols: list[str]
    totals: dict[str, float] = field(default_factory=dict)

    def totals_vector(self) -> list[float]:
        missing = [c for c in self.x_cols if c not in self.totals]
        if missing:
            raise ValueError(f"missing population totals for calibration columns: {missing}")
        return [float(self.totals[c]) for c in self.x_cols]
