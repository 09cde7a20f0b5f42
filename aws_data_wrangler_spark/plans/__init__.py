"""Query registry: the engine's headline queries + DuckDB oracles."""

from aws_data_wrangler_spark.plans.queries import QUERIES, register_tables  # noqa: F401
from aws_data_wrangler_spark.plans.oracles import ORACLES  # noqa: F401

__all__ = ["QUERIES", "ORACLES", "register_tables"]
