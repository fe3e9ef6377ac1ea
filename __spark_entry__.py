"""Driver contract for the PySpark data-integration engine.

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query for the dual-oracle
correctness gate; rows-only entries (engine-specific hashing) omitted.

Implementations live in ``data_integration_est_spark.entry_queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from data_integration_est_spark import entry_queries as _eq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the RegDI calibration estimator end-to-end (join-free
    direct mode) on the sf0.001 derived population."""
    return _eq.q_regdi_aux(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _eq.queries()


def oracle_sql() -> dict[str, str]:
    return _eq.oracle_sql()
