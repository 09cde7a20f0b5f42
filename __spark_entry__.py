"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 via the athena SQL
layer) at sf0.001. ``queries()`` exposes every implemented operator
from SURVEY.md §2; ``oracle_sql()`` the matching DuckDB oracles
(approximate operators are rows-only by design — see
plans/oracles.py docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from aws_data_wrangler_spark._session import ensure_session_defaults
    from aws_data_wrangler_spark.plans import QUERIES

    ensure_session_defaults(spark)
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from aws_data_wrangler_spark._session import ensure_session_defaults
    from aws_data_wrangler_spark.plans import QUERIES

    def wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_defaults(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; approximate ops omitted (rows-only)."""
    from aws_data_wrangler_spark.plans import ORACLES

    return dict(ORACLES)
