"""Athena module — SQL-as-a-service analog, with Spark SQL as the engine.

Ref: /root/reference/awswrangler/athena/ (_read.py ``read_sql_query``
``read_sql_table``; _utils.py query lifecycle, ``repair_table``,
``show_create_table``, ``describe_table``).

Athena's value is "SQL over cataloged S3 datasets"; on Spark that is
literally ``spark.sql`` over the session catalog, with Catalyst doing
what Presto's optimizer does for Athena (pushdown, pruning, join
planning). The query-execution lifecycle (ids / states / wait) is
mapped onto eager-materialized Spark queries so callers of the
reference API keep working.
"""

from __future__ import annotations

import posixpath
import time
import uuid
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from aws_data_wrangler_spark._config import apply_configs
from aws_data_wrangler_spark._data_types import spark2athena
from aws_data_wrangler_spark.exceptions import QueryFailed
from aws_data_wrangler_spark.s3._fs import _active_spark

__all__ = [
    "flush_cache",
    "read_sql_query",
    "read_sql_table",
    "create_athena_bucket",
    "create_ctas_table",
    "describe_table",
    "get_query_columns_types",
    "get_query_execution",
    "get_work_group",
    "repair_table",
    "show_create_table",
    "start_query_execution",
    "stop_query_execution",
    "wait_query",
]

# query-execution registry (driver-side bookkeeping only; the data
# itself stays distributed — we never collect results here)
_EXECUTIONS: Dict[str, Dict[str, Any]] = {}

# query-result cache keyed by (database, sql): the reference reuses the
# s3 result files of an identical query run within ``max_cache_seconds``
# (ref: awswrangler/athena/_read.py:146 _check_for_cached_results); our
# analog marks the result DataFrame for in-memory materialization and
# hands the same cached plan back — like Athena's, the cached result is
# a snapshot and does NOT see table changes made inside the TTL window.
_RESULT_CACHE: Dict[Any, Any] = {}

_CTAS_SCRATCH: Optional[str] = None


def _ctas_scratch_base() -> str:
    """Session-scoped scratch dir for ctas_approach materializations;
    removed at interpreter exit (files must outlive the lazy reader,
    so per-call deletion is impossible — session scope is the bound)."""
    global _CTAS_SCRATCH
    if _CTAS_SCRATCH is None:
        import atexit
        import shutil
        import tempfile

        _CTAS_SCRATCH = tempfile.mkdtemp(prefix="sg_ctas_")
        atexit.register(shutil.rmtree, _CTAS_SCRATCH, ignore_errors=True)
    return _CTAS_SCRATCH


def _cached_result(key: Any, ttl: int):
    import time as _time

    entry = _RESULT_CACHE.get(key)
    if entry is None:
        return None
    ts, df = entry
    if _time.time() - ts > ttl:
        df.unpersist()
        del _RESULT_CACHE[key]
        return None
    return df


def flush_cache() -> None:
    """Drop all cached query results (reference: new queries simply
    fall out of the inspection window; we expose an explicit flush)."""
    for _, df in _RESULT_CACHE.values():
        df.unpersist()
    _RESULT_CACHE.clear()


def _apply_params(sql: str, params: Optional[Dict[str, Any]]) -> str:
    """``:name;`` parameter substitution, matching the reference's
    convention (/root/reference/awswrangler/athena/_read.py)."""
    if params:
        for key, value in params.items():
            sql = sql.replace(f":{key};", str(value))
    return sql


@apply_configs
def read_sql_query(
    sql: str,
    database: Optional[str] = None,
    params: Optional[Dict[str, Any]] = None,
    ctas_approach: Optional[bool] = None,
    max_cache_seconds: Optional[int] = None,
    spark: Optional[SparkSession] = None,
    **_: Any,
) -> DataFrame:
    """Run SQL against the catalog; returns a lazy DataFrame.

    ``ctas_approach=True`` materializes the result as a parquet table
    first and reads that back — the reference's CTAS path
    (ref: awswrangler/athena/_read.py:read_sql_query). On Spark the
    lazy plan is usually better (no extra write), but CTAS is the
    right call when the same result feeds many downstream queries:
    pay the write once, every reader scans parquet. Defaults to
    ``config.ctas_approach`` (unset ⇒ lazy). ``chunksize`` is
    subsumed by the distributed result.
    """
    import uuid

    from aws_data_wrangler_spark._config import config

    spark = _active_spark(spark)
    if database:
        spark.catalog.setCurrentDatabase(database)
    final_sql = _apply_params(sql, params)
    ttl = (config.max_cache_seconds or 0) if max_cache_seconds is None else max_cache_seconds
    cache_key = (database or spark.catalog.currentDatabase(), final_sql)
    if ttl > 0:
        hit = _cached_result(cache_key, ttl)
        if hit is not None:
            return hit
    use_ctas = config.ctas_approach if ctas_approach is None else ctas_approach
    if use_ctas:
        from aws_data_wrangler_spark.s3._fs import normalize_path

        # Materialize into an EXTERNAL table at session-scratch, read
        # the parquet path directly, then drop the table right away:
        # the catalog never accumulates temp_ctas_* entries (the old
        # managed-table variant leaked one permanent table — and a full
        # result copy — per call), and since the drop is metadata-only
        # the already-returned lazy reader stays valid. Scratch files
        # are reclaimed at interpreter exit. Mirrors the reference,
        # which deletes its Glue temp table after reading
        # (awswrangler/athena/_read.py _resolve_query_with_cache).
        db = database or config.database or "default"
        temp_table = f"temp_ctas_{uuid.uuid4().hex[:12]}"
        loc = posixpath.join(_ctas_scratch_base(), temp_table)
        create_ctas_table(sql, database=db, table=temp_table, path=loc, params=params, spark=spark)
        result = spark.read.parquet(normalize_path(loc))
        spark.sql(f"DROP TABLE IF EXISTS `{db}`.`{temp_table}`")
    else:
        result = spark.sql(final_sql)
    if ttl > 0:
        import time as _time

        result = result.cache()
        _RESULT_CACHE[cache_key] = (_time.time(), result)
    return result


@apply_configs
def read_sql_table(
    table: str,
    database: Optional[str] = None,
    chunksize: Optional[int] = None,
    spark: Optional[SparkSession] = None,
    **_: Any,
) -> Any:
    """Ref: awswrangler/athena/_read.py:read_sql_table.
    ``chunksize`` returns the reference's pandas-frame iterator."""
    spark = _active_spark(spark)
    qualified = f"`{database}`.`{table}`" if database else f"`{table}`"
    df = spark.table(qualified)
    if chunksize:
        from aws_data_wrangler_spark.s3._read import _iter_pandas_chunks

        return _iter_pandas_chunks(df, int(chunksize))
    return df


def start_query_execution(
    sql: str,
    database: Optional[str] = None,
    params: Optional[Dict[str, Any]] = None,
    spark: Optional[SparkSession] = None,
    **_: Any,
) -> str:
    """Execute SQL, return a query-execution id.

    Ref: awswrangler/athena/_utils.py:start_query_execution.
    """
    spark = _active_spark(spark)
    query_id = str(uuid.uuid4())
    record: Dict[str, Any] = {
        "QueryExecutionId": query_id,
        "Query": sql,
        "StartTime": time.time(),
        "State": "RUNNING",
    }
    _EXECUTIONS[query_id] = record
    try:
        df = read_sql_query(sql, database=database, params=params, spark=spark)
        record["DataFrame"] = df
        record["Schema"] = df.schema
        record["State"] = "SUCCEEDED"
    except Exception as error:  # noqa: BLE001 - surfaced via state, like Athena
        record["State"] = "FAILED"
        record["StateChangeReason"] = str(error)
    record["CompletionTime"] = time.time()
    return query_id


def get_query_execution(query_execution_id: str, **_: Any) -> Dict[str, Any]:
    """Ref: awswrangler/athena/_utils.py:get_query_execution."""
    record = _EXECUTIONS[query_execution_id]
    return {k: v for k, v in record.items() if k not in ("DataFrame",)}


def wait_query(query_execution_id: str, **_: Any) -> Dict[str, Any]:
    """Ref: awswrangler/athena/_utils.py:wait_query."""
    response = get_query_execution(query_execution_id)
    if response["State"] == "FAILED":
        raise QueryFailed(response.get("StateChangeReason"))
    return response


def stop_query_execution(query_execution_id: str, **_: Any) -> None:
    """Ref: awswrangler/athena/_utils.py:stop_query_execution."""
    record = _EXECUTIONS.get(query_execution_id)
    if record is not None and record["State"] == "RUNNING":
        record["State"] = "CANCELLED"


def get_query_results(query_execution_id: str) -> DataFrame:
    """The (lazy, distributed) result of a started query."""
    return _EXECUTIONS[query_execution_id]["DataFrame"]


def get_query_columns_types(query_execution_id: str, **_: Any) -> Dict[str, str]:
    """{column: athena_type} of a finished query.
    Ref: awswrangler/athena/_utils.py:get_query_columns_types."""
    schema = _EXECUTIONS[query_execution_id]["Schema"]
    return {f.name: spark2athena(f.dataType) for f in schema.fields}


def create_ctas_table(
    sql: str,
    database: str,
    table: str,
    path: Optional[str] = None,
    params: Optional[Dict[str, Any]] = None,
    spark: Optional[SparkSession] = None,
) -> None:
    """CREATE TABLE AS SELECT — the engine behind the reference's
    ``ctas_approach`` (awswrangler/athena/_read.py materializes query
    results as a parquet table). With ``path`` the table is external
    (data at the given prefix); without, it is catalog-managed.
    """
    from aws_data_wrangler_spark.s3._fs import normalize_path

    spark = _active_spark(spark)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{database}`")
    location = f" LOCATION '{normalize_path(path)}'" if path else ""
    spark.sql(
        f"CREATE TABLE `{database}`.`{table}` USING PARQUET{location} AS "
        + _apply_params(sql, params)
    )


def repair_table(
    table: str, database: Optional[str] = None, spark: Optional[SparkSession] = None, **_: Any
) -> str:
    """MSCK REPAIR TABLE. Ref: awswrangler/athena/_utils.py:repair_table."""
    spark = _active_spark(spark)
    qualified = f"`{database}`.`{table}`" if database else f"`{table}`"
    spark.sql(f"MSCK REPAIR TABLE {qualified}")
    return "SUCCEEDED"


def describe_table(
    table: str, database: Optional[str] = None, spark: Optional[SparkSession] = None, **_: Any
) -> DataFrame:
    """DESCRIBE output as a DataFrame. Ref: awswrangler/athena/_utils.py:describe_table."""
    spark = _active_spark(spark)
    qualified = f"`{database}`.`{table}`" if database else f"`{table}`"
    return spark.sql(f"DESCRIBE TABLE EXTENDED {qualified}")


def show_create_table(
    table: str, database: Optional[str] = None, spark: Optional[SparkSession] = None, **_: Any
) -> str:
    """Ref: awswrangler/athena/_utils.py:show_create_table."""
    spark = _active_spark(spark)
    qualified = f"`{database}`.`{table}`" if database else f"`{table}`"
    return spark.sql(f"SHOW CREATE TABLE {qualified}").collect()[0][0]


def create_athena_bucket(spark: Optional[SparkSession] = None, **_: Any) -> str:
    """Default results staging location analog (local tmp dir).
    Ref: awswrangler/athena/_utils.py:create_athena_bucket."""
    import tempfile

    path = f"{tempfile.gettempdir()}/athena-results"
    import os

    os.makedirs(path, exist_ok=True)
    return f"file://{path}/"


def get_work_group(workgroup: str = "primary", **_: Any) -> Dict[str, Any]:
    """API-shaped analog. Ref: awswrangler/athena/_utils.py:get_work_group."""
    return {
        "WorkGroup": {
            "Name": workgroup,
            "State": "ENABLED",
            "Configuration": {"ResultConfiguration": {"OutputLocation": create_athena_bucket()}},
        }
    }
