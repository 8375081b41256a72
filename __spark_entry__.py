"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the named corpus from
``datasplash_spark.queries`` for the sf0.01 DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datasplash_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return Q.q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()


def rows_only() -> dict[str, str]:
    """Names in ``queries()`` that intentionally carry NO oracle
    (RNG/sketch value-level non-determinism), mapped to the rationale
    and the fully-oracled deterministic twin that proves the same
    operator code path. The driver's ``err: no_oracle`` rows for
    these are BY DESIGN, not missing coverage."""
    return Q.rows_only()
