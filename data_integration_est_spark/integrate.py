"""Sample integration: the A/B full-outer join + membership indicators.

Reproduces the reference's combine step (``RegDI2.R:44-88``, ``PC.R:87-132``):

1. rename each table's id column to a shared ``id``;
2. full-outer join A and B on ``id``;
3. disambiguate *colliding* non-id columns with ``_A``/``_B`` suffixes
   (dplyr ``full_join(suffix=c("_A","_B"))`` semantics: non-colliding names
   stay bare);
4. derive membership indicators ``ind_var_A``/``ind_var_B`` from
   non-null-ness of the outcome columns.

Engine fix (documented reference bug, ``nb[10]:55,67,80``): when
``y_A_col != y_B_col`` the reference reads the *bare* outcome names, which
errors (or silently reads the wrong side) whenever the name also exists in
the other table.  We always resolve the outcome to its side-specific column
(the ``_A``-suffixed name for A's outcome if A's name collided, etc.), so
both the same-name and different-name cases behave.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IntegrationError(ValueError):
    """Input-validation failure; mirrors the reference's ``stop()`` checks
    (``RegDI2.R:26-42``, ``PC.R:69-85``)."""


@dataclass
class IntegratedData:
    """The combined table plus side-resolved column names."""

    df: DataFrame
    id_col: str = "id"
    ind_A: str = "ind_var_A"
    ind_B: str = "ind_var_B"
    y_A: str = ""
    y_B: str = ""
    # name -> resolved-name maps for each side (suffix-aware)
    resolved_A: dict[str, str] = field(default_factory=dict)
    resolved_B: dict[str, str] = field(default_factory=dict)

    def col_A(self, name: str) -> str:
        return self.resolved_A.get(name, name)

    def col_B(self, name: str) -> str:
        return self.resolved_B.get(name, name)


def integrate_samples(
    data_A: DataFrame,
    data_B: DataFrame,
    id_var_A: str,
    id_var_B: str,
    y_A_col: str,
    y_B_col: str,
) -> IntegratedData:
    """Full-outer integrate the probability sample A with the big-data
    sample B.  Shuffle profile: ONE shuffle on ``id`` (sort-merge or, with
    AQE, shuffled-hash); both sides are repartitioned by the same key so
    every downstream per-id derivation is shuffle-free."""
    if id_var_A not in data_A.columns:
        raise IntegrationError(f"column {id_var_A!r} not found in 'data_A'")
    if id_var_B not in data_B.columns:
        raise IntegrationError(f"column {id_var_B!r} not found in 'data_B'")
    if y_A_col not in data_A.columns:
        raise IntegrationError(f"outcome column {y_A_col!r} not found in 'data_A'")
    if y_B_col not in data_B.columns:
        raise IntegrationError(f"outcome column {y_B_col!r} not found in 'data_B'")

    a = data_A.withColumnRenamed(id_var_A, "id")
    b = data_B.withColumnRenamed(id_var_B, "id")

    collisions = (set(a.columns) & set(b.columns)) - {"id"}
    resolved_A = {c: (f"{c}_A" if c in collisions else c) for c in a.columns if c != "id"}
    resolved_B = {c: (f"{c}_B" if c in collisions else c) for c in b.columns if c != "id"}
    for c in collisions:
        a = a.withColumnRenamed(c, f"{c}_A")
        b = b.withColumnRenamed(c, f"{c}_B")

    joined = a.join(b, on="id", how="full_outer")

    y_A_res = resolved_A[y_A_col]
    y_B_res = resolved_B[y_B_col]
    joined = joined.withColumn(
        "ind_var_A", F.when(F.col(y_A_res).isNotNull(), F.lit(1)).otherwise(F.lit(0))
    ).withColumn(
        "ind_var_B", F.when(F.col(y_B_res).isNotNull(), F.lit(1)).otherwise(F.lit(0))
    )

    return IntegratedData(
        df=joined,
        y_A=y_A_res,
        y_B=y_B_res,
        resolved_A=resolved_A,
        resolved_B=resolved_B,
    )
