"""Dataset readers (parquet/csv/json/fwf).

Ref: /root/reference/awswrangler/s3/_read_parquet.py (``read_parquet``,
``read_parquet_table``, ``read_parquet_metadata``) and _read_text.py
(``read_csv``, ``read_json``, ``read_fwf``).

Spark-first: every reader returns a *lazy* DataFrame (the reference's
``chunked`` iterator is subsumed by Spark's lazy/partitioned
execution). ``columns`` becomes a projection and ``filters`` a
predicate — both reach the parquet scan via Catalyst (column pruning,
predicate + partition pushdown), which is what makes the same call
viable on a 100 TB dataset.
"""

from __future__ import annotations

import posixpath
import re
from typing import Any, Dict, List, Optional, Tuple, Union

from pyspark.sql import Column, DataFrame, SparkSession

from aws_data_wrangler_spark._data_types import athena2spark, spark2athena
from aws_data_wrangler_spark.exceptions import InvalidArgument
from aws_data_wrangler_spark.s3._fs import _active_spark, list_objects, normalize_path

FiltersType = Union[str, Column, List[Tuple[str, str, Any]], None]


def _sql_literal(value: Any) -> str:
    if isinstance(value, str):
        escaped = value.replace("'", "''")
        return f"'{escaped}'"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (list, tuple, set)):
        return "(" + ", ".join(_sql_literal(v) for v in value) + ")"
    return str(value)


def _filters_to_predicate(filters: FiltersType) -> Optional[Union[str, Column]]:
    """Accept a SQL string, a Column, or pyarrow-style tuples
    ``[(col, op, value), ...]`` (the reference's format) ANDed together."""
    if filters is None or isinstance(filters, (str, Column)):
        return filters
    clauses = []
    for col, op, value in filters:
        op = {"=": "=", "==": "=", "in": "IN", "not in": "NOT IN"}.get(op.lower() if isinstance(op, str) else op, op)
        clauses.append(f"`{col}` {op} {_sql_literal(value)}")
    return " AND ".join(clauses)


def _apply_projection_filter(
    df: DataFrame, columns: Optional[List[str]], filters: FiltersType
) -> DataFrame:
    predicate = _filters_to_predicate(filters)
    if predicate is not None:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def read_parquet(
    path: Union[str, List[str]],
    columns: Optional[List[str]] = None,
    filters: FiltersType = None,
    dataset: bool = False,
    schema: Optional[str] = None,
    chunked: Union[bool, int] = False,
    spark: Optional[SparkSession] = None,
    **options: Any,
) -> Any:
    """Read parquet file(s)/dataset into a DataFrame.

    ``dataset=True`` reads a partitioned prefix (hive-style dirs become
    partition columns, pruned by ``filters``).

    ``chunked`` mirrors the reference's batched-consumption mode
    (ref ``read_parquet(chunked=True)``): returns an *iterator of
    pandas DataFrames* — Arrow-batched via ``toLocalIterator``-style
    streaming, never materializing the full result on the driver.
    ``chunked=True`` yields one frame per Spark partition;
    ``chunked=N`` re-batches to ~N rows per frame. This is the
    driver-side consumption path for moderate results; distributed
    pipelines keep the DataFrame.
    Ref: /root/reference/awswrangler/s3/_read_parquet.py ``read_parquet``.
    """
    spark = _active_spark(spark)
    paths = [path] if isinstance(path, str) else list(path)
    paths = [normalize_path(p) for p in paths]
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if dataset and len(paths) == 1:
        reader = reader.option("basePath", paths[0])
    for key, value in options.items():
        reader = reader.option(key, value)
    df = reader.parquet(*paths)
    df = _apply_projection_filter(df, columns, filters)
    if chunked:
        return _iter_pandas_chunks(df, None if chunked is True else int(chunked))
    return df


def _iter_pandas_chunks(df: DataFrame, rows_per_chunk: Optional[int]):
    """Stream a DataFrame to the driver as pandas frames, one Spark
    partition at a time (Arrow-serialized; no full materialization)."""
    import pandas as pd

    cols = df.columns
    buf: list = []
    buffered = 0
    for row in df.toLocalIterator(prefetchPartitions=True):
        buf.append(row)
        buffered += 1
        if rows_per_chunk is not None and buffered >= rows_per_chunk:
            yield pd.DataFrame.from_records([r.asDict() for r in buf], columns=cols)
            buf, buffered = [], 0
        elif rows_per_chunk is None and buffered >= 10_000:
            yield pd.DataFrame.from_records([r.asDict() for r in buf], columns=cols)
            buf, buffered = [], 0
    if buf:
        yield pd.DataFrame.from_records([r.asDict() for r in buf], columns=cols)


def read_parquet_table(
    table: str,
    database: Optional[str] = None,
    columns: Optional[List[str]] = None,
    filters: FiltersType = None,
    spark: Optional[SparkSession] = None,
) -> DataFrame:
    """Read a catalog-registered table.

    Ref: /root/reference/awswrangler/s3/_read_parquet.py ``read_parquet_table``.
    """
    spark = _active_spark(spark)
    qualified = f"{database}.{table}" if database else table
    return _apply_projection_filter(spark.table(qualified), columns, filters)


_PARTITION_DIR_RE = re.compile(r"^([^=/]+)=([^/]*)$")


def read_parquet_metadata(
    path: str,
    dataset: bool = False,
    spark: Optional[SparkSession] = None,
) -> Tuple[Dict[str, str], Optional[Dict[str, str]]]:
    """(columns_types, partitions_types) as Athena DDL strings, inferred
    from footers + directory layout — no data scan.

    Ref: /root/reference/awswrangler/s3/_read_parquet.py ``read_parquet_metadata``.
    """
    spark = _active_spark(spark)
    df = read_parquet(path, dataset=dataset, spark=spark)
    partition_keys: List[str] = []
    if dataset:
        root = normalize_path(path).rstrip("/").split("://", 1)[-1].lstrip("/")
        for obj in list_objects(path, spark=spark):
            rel = obj.split(":", 1)[-1].lstrip("/")[len(root):].lstrip("/")
            keys = [m.group(1) for part in rel.split("/")[:-1] if (m := _PARTITION_DIR_RE.match(part))]
            if keys:
                partition_keys = keys
                break
    columns: Dict[str, str] = {}
    partitions: Dict[str, str] = {}
    for field in df.schema.fields:
        target = partitions if field.name in partition_keys else columns
        target[field.name] = spark2athena(field.dataType)
    return columns, (partitions if dataset else None)


def read_csv(
    path: Union[str, List[str]],
    columns: Optional[List[str]] = None,
    filters: FiltersType = None,
    dataset: bool = False,
    header: bool = True,
    infer_schema: bool = True,
    schema: Optional[str] = None,
    sep: str = ",",
    spark: Optional[SparkSession] = None,
    **options: Any,
) -> DataFrame:
    """Ref: /root/reference/awswrangler/s3/_read_text.py ``read_csv``."""
    spark = _active_spark(spark)
    paths = [path] if isinstance(path, str) else list(path)
    paths = [normalize_path(p) for p in paths]
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    if dataset and len(paths) == 1:
        reader = reader.option("basePath", paths[0])
    for key, value in options.items():
        reader = reader.option(key, value)
    df = reader.csv(*paths)
    return _apply_projection_filter(df, columns, filters)


def read_json(
    path: Union[str, List[str]],
    columns: Optional[List[str]] = None,
    filters: FiltersType = None,
    dataset: bool = False,
    lines: bool = True,
    schema: Optional[str] = None,
    spark: Optional[SparkSession] = None,
    **options: Any,
) -> DataFrame:
    """Ref: /root/reference/awswrangler/s3/_read_text.py ``read_json``."""
    spark = _active_spark(spark)
    paths = [path] if isinstance(path, str) else list(path)
    paths = [normalize_path(p) for p in paths]
    reader = spark.read
    if not lines:
        reader = reader.option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema)
    if dataset and len(paths) == 1:
        reader = reader.option("basePath", paths[0])
    for key, value in options.items():
        reader = reader.option(key, value)
    df = reader.json(*paths)
    return _apply_projection_filter(df, columns, filters)


def read_fwf(
    path: Union[str, List[str]],
    widths: List[int],
    names: List[str],
    dtype: Optional[Dict[str, str]] = None,
    spark: Optional[SparkSession] = None,
) -> DataFrame:
    """Fixed-width files via ``spark.read.text`` + substring slicing —
    stays in whole-stage codegen (no Python row loop).

    Ref: /root/reference/awswrangler/s3/_read_text.py ``read_fwf``.
    """
    from pyspark.sql import functions as F

    if len(widths) != len(names):
        raise InvalidArgument("widths and names must have the same length")
    spark = _active_spark(spark)
    paths = [path] if isinstance(path, str) else list(path)
    paths = [normalize_path(p) for p in paths]
    df = spark.read.text(*paths)
    cols = []
    offset = 1  # substring() is 1-indexed
    for name, width in zip(names, widths):
        col = F.trim(F.substring(F.col("value"), offset, width))
        if dtype and name in dtype:
            col = col.cast(athena2spark(dtype[name]))
        cols.append(col.alias(name))
        offset += width
    return df.select(*cols)
