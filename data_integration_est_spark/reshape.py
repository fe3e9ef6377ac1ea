"""Reshape operators (SURVEY.md §2.7 R1-R4, §2.2 P9).

The reference reshapes its Monte Carlo result tables with reshape2/tidyr:
``melt`` (``nb[26]:12-16``), ``pivot_longer`` (``nb[41]:2-10``),
``pivot_wider`` (``nb[41]:52-54``), ``separate`` (``nb[41]:9,30``), and
``mutate(across(starts_with(...)))`` (``nb[40]:6-7``).  These are thin,
Spark-idiomatic wrappers — results tables are small, but the operators are
fully distributed and safe on any size.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_vars: list[str],
    value_vars: list[str] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long (reshape2 ``melt`` / tidyr ``pivot_longer``).
    ``value_vars`` defaults to every non-id column."""
    if value_vars is None:
        value_vars = [c for c in df.columns if c not in id_vars]
    return df.unpivot(
        ids=id_vars, values=value_vars,
        variableColumnName=var_name, valueColumnName=value_name,
    )


def pivot_wider(
    df: DataFrame,
    id_vars: list[str],
    names_from: str,
    values_from: str,
    agg: Callable[[str], Column] = F.first,
) -> DataFrame:
    """Long -> wide (tidyr ``pivot_wider``); one row per id combination,
    one column per ``names_from`` level.  ``agg`` resolves duplicates
    (``first`` matches tidyr's default expectation of unique cells)."""
    return df.groupBy(*id_vars).pivot(names_from).agg(agg(values_from))


def separate(
    df: DataFrame,
    col: str,
    into: list[str],
    pattern: str,
    casts: dict[str, str] | None = None,
    drop: bool = True,
) -> DataFrame:
    """Split one string column into several via a regex with one capture
    group per output column (tidyr ``separate`` with ``sep`` generalized
    to a full pattern).  ``casts``: output column -> Spark type name."""
    casts = casts or {}
    for i, name in enumerate(into, start=1):
        expr: Column = F.regexp_extract(F.col(col), pattern, i)
        if name in casts:
            expr = expr.cast(casts[name])
        df = df.withColumn(name, expr)
    return df.drop(col) if drop else df


def mutate_across(
    df: DataFrame,
    prefix: str,
    fn: Callable[[Column], Column],
    names: str = "{col}",
) -> DataFrame:
    """Apply ``fn`` to every column starting with ``prefix`` (dplyr
    ``mutate(across(starts_with(prefix), fn, .names=...))``).  ``names``
    templates the output name with ``{col}`` = source column."""
    for c in [c for c in df.columns if c.startswith(prefix)]:
        df = df.withColumn(names.format(col=c), fn(F.col(c)))
    return df


def bind_rows(frames: list[DataFrame]) -> DataFrame:
    """Row-bind by column name (dplyr ``bind_rows`` / ``rbind`` loops,
    ``nb[23]:146,156``); missing columns are filled with nulls."""
    if not frames:
        raise ValueError("bind_rows needs at least one DataFrame")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
