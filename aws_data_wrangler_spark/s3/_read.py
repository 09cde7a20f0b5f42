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


def _mtime_option(value: Any) -> str:
    """Render a datetime (or ISO string) for Spark's modifiedBefore/
    modifiedAfter file-source options.

    tz-aware datetimes keep their UTC offset (the options accept
    offsets); dropping it would silently reinterpret the instant in
    the Spark session timezone — the reference compares tz-aware
    datetimes in UTC (awswrangler/s3/_list.py last_modified filters).
    """
    if hasattr(value, "strftime"):
        fmt = "%Y-%m-%dT%H:%M:%S%z" if getattr(value, "tzinfo", None) is not None else "%Y-%m-%dT%H:%M:%S"
        return value.strftime(fmt)
    return str(value)


def _unescape_partition_value(raw: str) -> Optional[str]:
    """Hive/URL-unescape a partition value parsed from a path segment.

    Hive writes ``%``-escaped values (space → ``%20``) and nulls as
    ``__HIVE_DEFAULT_PARTITION__``; user-facing callables and equality
    predicates must see the real value (the reference passes unescaped
    values to ``partition_filter``)."""
    if raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    from urllib.parse import unquote

    return unquote(raw)


def _suffix_filtered_paths(
    paths: List[str],
    path_suffix: Optional[Union[str, List[str]]],
    path_ignore_suffix: Optional[Union[str, List[str]]],
    spark: SparkSession,
) -> List[str]:
    """Expand prefixes to object lists filtered by suffix — the
    reference's path_suffix/path_ignore_suffix semantics (driver-side
    listing, same as awswrangler's _path2list)."""
    keep = [path_suffix] if isinstance(path_suffix, str) else (path_suffix or [])
    drop = [path_ignore_suffix] if isinstance(path_ignore_suffix, str) else (path_ignore_suffix or [])
    out: List[str] = []
    for p in paths:
        objs = list_objects(p, spark=spark) or [p]
        for obj in objs:
            if keep and not any(obj.endswith(s) for s in keep):
                continue
            if drop and any(obj.endswith(s) for s in drop):
                continue
            out.append(obj)
    if not out:
        raise InvalidArgument("no objects match the path/suffix filters")
    return out


def _partition_pruned_paths(
    root: str,
    partition_filter: Any,
    spark: SparkSession,
) -> List[str]:
    """Hive-partition dirs under ``root`` whose value-dict passes the
    callable — the reference's ``partition_filter`` (push-down via
    driver-side listing; ref awswrangler/s3/_read.py
    ``_apply_partition_filter``)."""
    dirs: Dict[str, Dict[str, Optional[str]]] = {}
    root_norm = normalize_path(root).rstrip("/")
    root_schemeless = root_norm.split("://", 1)[-1].lstrip("/")
    for obj in list_objects(root, spark=spark):
        rel = obj.split(":", 1)[-1].lstrip("/")[len(root_schemeless):].lstrip("/")
        parts = rel.split("/")[:-1]
        values = {}
        for seg in parts:
            m = _PARTITION_DIR_RE.match(seg)
            if m:
                # the callable sees unescaped values; the kept PATH
                # stays escaped (it must match the on-disk layout)
                values[m.group(1)] = _unescape_partition_value(m.group(2))
        if values:
            dirs.setdefault(f"{root_norm}/{'/'.join(parts)}", values)
    kept = [d for d, vals in dirs.items() if partition_filter(vals)]
    if not kept:
        raise InvalidArgument("partition_filter excluded every partition")
    return kept


def read_parquet(
    path: Union[str, List[str]],
    columns: Optional[List[str]] = None,
    filters: FiltersType = None,
    dataset: bool = False,
    schema: Optional[str] = None,
    chunked: Union[bool, int] = False,
    path_suffix: Optional[Union[str, List[str]]] = None,
    path_ignore_suffix: Optional[Union[str, List[str]]] = None,
    partition_filter: Optional[Any] = None,
    validate_schema: bool = False,
    last_modified_begin: Optional[Any] = None,
    last_modified_end: Optional[Any] = None,
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

    ``partition_filter`` is the reference's callable partition pruner:
    it receives each hive partition's ``{col: value}`` dict and only
    passing partitions are scanned. ``last_modified_begin/end`` map to
    Spark's modifiedAfter/modifiedBefore file-source options.
    ``validate_schema=True`` raises when files disagree on schema
    (field-set comparison of plain vs schema-merged footer reads).
    Ref: /root/reference/awswrangler/s3/_read_parquet.py ``read_parquet``.
    """
    spark = _active_spark(spark)
    paths = [path] if isinstance(path, str) else list(path)
    paths = [normalize_path(p) for p in paths]
    base_path = paths[0] if dataset and len(paths) == 1 else None
    if partition_filter is not None:
        if not (dataset and base_path):
            raise InvalidArgument("partition_filter requires dataset=True and a single root path")
        paths = _partition_pruned_paths(base_path, partition_filter, spark)
    if path_suffix or path_ignore_suffix:
        paths = _suffix_filtered_paths(paths, path_suffix, path_ignore_suffix, spark)
    def build_reader():
        # DataFrameReader.option mutates the reader in place, so every
        # consumer (schema probes, the final read) gets a FRESH reader —
        # otherwise a probe's mergeSchema=true leaks into the final scan
        # and silently changes the result schema (e.g. int/long upcasts)
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        if base_path:
            r = r.option("basePath", base_path)
        if last_modified_begin is not None:
            r = r.option("modifiedAfter", _mtime_option(last_modified_begin))
        if last_modified_end is not None:
            r = r.option("modifiedBefore", _mtime_option(last_modified_end))
        for key, value in options.items():
            r = r.option(key, value)
        return r

    if validate_schema and schema is None:
        from aws_data_wrangler_spark.exceptions import InvalidSchemaConvergence

        plain = {(f.name, f.dataType) for f in build_reader().parquet(*paths).schema.fields}
        try:
            merged_schema = (
                build_reader().option("mergeSchema", "true").parquet(*paths).schema
            )
        except Exception as exc:  # incompatible types fail the merge itself
            raise InvalidSchemaConvergence(
                f"schemas cannot be merged across files: {exc}"
            ) from exc
        merged = {(f.name, f.dataType) for f in merged_schema.fields}
        if plain != merged:
            diverged = sorted({name for name, _ in merged ^ plain})
            raise InvalidSchemaConvergence(
                f"schemas diverge across files on columns: {diverged}"
            )
    df = build_reader().parquet(*paths)
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
    partition_filter: Optional[Any] = None,
    chunked: Union[bool, int] = False,
    spark: Optional[SparkSession] = None,
    **_: Any,
) -> Any:
    """Read a catalog-registered table.

    ``partition_filter`` receives each catalog partition's
    ``{col: value}`` dict; kept partitions become a static IN-style
    predicate on the partition columns (plan-time pruning).
    Ref: /root/reference/awswrangler/s3/_read_parquet.py ``read_parquet_table``.
    """
    spark = _active_spark(spark)
    qualified = f"{database}.{table}" if database else table
    df = spark.table(qualified)
    if partition_filter is not None:
        from aws_data_wrangler_spark import catalog

        parts = catalog.get_partitions(database or spark.catalog.currentDatabase(), table, spark=spark)
        pcols: List[str] = []
        kept_rows: List[Dict[str, str]] = []
        for location, values in parts.items():
            vals = {}
            for seg in location.rstrip("/").split("/"):
                m = _PARTITION_DIR_RE.match(seg)
                if m:
                    vals[m.group(1)] = _unescape_partition_value(m.group(2))
            if not pcols:
                pcols = list(vals)
            if partition_filter(vals):
                kept_rows.append(vals)
        if not kept_rows:
            raise InvalidArgument("partition_filter excluded every partition")
        from pyspark.sql import functions as F

        clause = None
        for vals in kept_rows:
            row = None
            for c in pcols:
                # unescaped comparison; __HIVE_DEFAULT_PARTITION__ = null
                eq = (
                    F.col(c).isNull()
                    if vals[c] is None
                    else F.col(c).cast("string") == F.lit(vals[c])
                )
                row = eq if row is None else (row & eq)
            clause = row if clause is None else (clause | row)
        df = df.filter(clause)
    df = _apply_projection_filter(df, columns, filters)
    if chunked:
        return _iter_pandas_chunks(df, None if chunked is True else int(chunked))
    return df


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


def read_parquet_bloom_filters(
    path: str,
    spark: Optional[SparkSession] = None,
) -> Dict[str, bool]:
    """Which columns of a parquet FILE carry a bloom filter —
    {column: True/False} read from the footer via parquet-mr (no data
    scan). The audit twin of ``to_parquet(bloom_filter_cols=...)``:
    stats-based pruning is visible in ``EXPLAIN`` (PushedFilters), but
    whether the point-lookup bloom filters actually landed on disk is
    only visible in the footer — this is the pre-flight that checks
    an ingest job's write options before a 100 TB backfill repeats the
    mistake. Accepts any Hadoop-FS URI; for a dataset, point it at one
    data file (every file of a well-formed dataset shares options).

    Ref: extends the reference's footer-inspection surface
    (/root/reference/awswrangler/s3/_read_parquet.py
    ``read_parquet_metadata``) to the bloom-filter flag.
    """
    spark = _active_spark(spark)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(normalize_path(path)), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        out: Dict[str, bool] = {}
        blocks = reader.getFooter().getBlocks()
        for b in range(blocks.size()):
            cols = blocks.get(b).getColumns()
            for i in range(cols.size()):
                c = cols.get(i)
                name = ".".join(c.getPath().toArray())
                out[name] = bool(out.get(name, False) or c.getBloomFilterOffset() >= 0)
        return out
    finally:
        reader.close()


def read_csv(
    path: Union[str, List[str]],
    columns: Optional[List[str]] = None,
    filters: FiltersType = None,
    dataset: bool = False,
    header: bool = True,
    infer_schema: bool = True,
    schema: Optional[str] = None,
    sep: str = ",",
    chunksize: Optional[int] = None,
    path_suffix: Optional[Union[str, List[str]]] = None,
    path_ignore_suffix: Optional[Union[str, List[str]]] = None,
    partition_filter: Optional[Any] = None,
    last_modified_begin: Optional[Any] = None,
    last_modified_end: Optional[Any] = None,
    spark: Optional[SparkSession] = None,
    **options: Any,
) -> Any:
    """Ref: /root/reference/awswrangler/s3/_read_text.py ``read_csv``.

    ``chunksize`` returns the reference's pandas-frame iterator;
    ``partition_filter`` / suffix / last-modified filters behave as in
    ``read_parquet``.
    """
    spark = _active_spark(spark)
    paths = [path] if isinstance(path, str) else list(path)
    paths = [normalize_path(p) for p in paths]
    base_path = paths[0] if dataset and len(paths) == 1 else None
    if partition_filter is not None:
        if not base_path:
            raise InvalidArgument("partition_filter requires dataset=True and a single root path")
        paths = _partition_pruned_paths(base_path, partition_filter, spark)
    if path_suffix or path_ignore_suffix:
        paths = _suffix_filtered_paths(paths, path_suffix, path_ignore_suffix, spark)
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
    if base_path:
        reader = reader.option("basePath", base_path)
    if last_modified_begin is not None:
        reader = reader.option("modifiedAfter", _mtime_option(last_modified_begin))
    if last_modified_end is not None:
        reader = reader.option("modifiedBefore", _mtime_option(last_modified_end))
    for key, value in options.items():
        reader = reader.option(key, value)
    df = reader.csv(*paths)
    df = _apply_projection_filter(df, columns, filters)
    if chunksize:
        return _iter_pandas_chunks(df, int(chunksize))
    return df


def read_json(
    path: Union[str, List[str]],
    columns: Optional[List[str]] = None,
    filters: FiltersType = None,
    dataset: bool = False,
    lines: bool = True,
    schema: Optional[str] = None,
    chunksize: Optional[int] = None,
    path_suffix: Optional[Union[str, List[str]]] = None,
    path_ignore_suffix: Optional[Union[str, List[str]]] = None,
    partition_filter: Optional[Any] = None,
    last_modified_begin: Optional[Any] = None,
    last_modified_end: Optional[Any] = None,
    spark: Optional[SparkSession] = None,
    **options: Any,
) -> Any:
    """Ref: /root/reference/awswrangler/s3/_read_text.py ``read_json``.
    Filter/iterator kwargs behave as in ``read_csv``."""
    spark = _active_spark(spark)
    paths = [path] if isinstance(path, str) else list(path)
    paths = [normalize_path(p) for p in paths]
    base_path = paths[0] if dataset and len(paths) == 1 else None
    if partition_filter is not None:
        if not base_path:
            raise InvalidArgument("partition_filter requires dataset=True and a single root path")
        paths = _partition_pruned_paths(base_path, partition_filter, spark)
    if path_suffix or path_ignore_suffix:
        paths = _suffix_filtered_paths(paths, path_suffix, path_ignore_suffix, spark)
    reader = spark.read
    if not lines:
        reader = reader.option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema)
    if base_path:
        reader = reader.option("basePath", base_path)
    if last_modified_begin is not None:
        reader = reader.option("modifiedAfter", _mtime_option(last_modified_begin))
    if last_modified_end is not None:
        reader = reader.option("modifiedBefore", _mtime_option(last_modified_end))
    for key, value in options.items():
        reader = reader.option(key, value)
    df = reader.json(*paths)
    df = _apply_projection_filter(df, columns, filters)
    if chunksize:
        return _iter_pandas_chunks(df, int(chunksize))
    return df


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


def read_orc(
    path: Union[str, List[str]],
    columns: Optional[List[str]] = None,
    filters: FiltersType = None,
    dataset: bool = False,
    chunked: Union[bool, int] = False,
    path_suffix: Optional[Union[str, List[str]]] = None,
    path_ignore_suffix: Optional[Union[str, List[str]]] = None,
    partition_filter: Optional[Any] = None,
    last_modified_begin: Optional[Any] = None,
    last_modified_end: Optional[Any] = None,
    spark: Optional[SparkSession] = None,
    **options: Any,
) -> Any:
    """Columnar ORC read with the same pruning surface as
    ``read_parquet``: column projection and filters reach the ORC
    reader (predicate pushdown + pruned ReadSchema), dataset mode
    prunes Hive partitions before the scan. No reference counterpart
    (awswrangler 1.x is parquet/text-only); included because the Spark
    ORC source makes the format free and real lakes mix both.
    """
    spark = _active_spark(spark)
    paths = [path] if isinstance(path, str) else list(path)
    paths = [normalize_path(p) for p in paths]
    base_path = paths[0] if dataset and len(paths) == 1 else None
    if partition_filter is not None:
        if not base_path:
            raise InvalidArgument("partition_filter requires dataset=True and a single root path")
        paths = _partition_pruned_paths(base_path, partition_filter, spark)
    if path_suffix or path_ignore_suffix:
        paths = _suffix_filtered_paths(paths, path_suffix, path_ignore_suffix, spark)
    reader = spark.read
    if base_path:
        reader = reader.option("basePath", base_path)
    if last_modified_begin is not None:
        reader = reader.option("modifiedAfter", _mtime_option(last_modified_begin))
    if last_modified_end is not None:
        reader = reader.option("modifiedBefore", _mtime_option(last_modified_end))
    for key, value in options.items():
        reader = reader.option(key, value)
    df = reader.orc(*paths)
    df = _apply_projection_filter(df, columns, filters)
    if chunked:
        return _iter_pandas_chunks(df, None if chunked is True else int(chunked))
    return df
