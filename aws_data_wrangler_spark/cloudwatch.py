"""CloudWatch Logs Insights analog (ref: /root/reference/awswrangler/cloudwatch.py).

The reference submits Logs Insights queries (``fields | filter |
stats | sort | limit`` pipelines) and polls for results. Here log
groups are structured tables/datasets and the Insights pipeline is
compiled onto a Spark logical plan — same DSL shape, Catalyst does
the execution planning, so a "log query" scans TBs of partitioned
log parquet with pushdown instead of a service-side scan.
"""

from __future__ import annotations

import datetime
import re
import time
import uuid
from typing import Any, Dict, List, Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_data_wrangler_spark.exceptions import InvalidArgument, QueryFailed
from aws_data_wrangler_spark.s3._fs import _active_spark

__all__ = ["start_query", "wait_query", "run_query", "read_logs"]

_QUERIES: Dict[str, Dict[str, Any]] = {}


def _load_log_group(spark: SparkSession, log_group: str) -> DataFrame:
    """A log group is a catalog table name or a dataset path."""
    if "/" in log_group or "://" in log_group:
        from aws_data_wrangler_spark import s3

        return s3.read_parquet(log_group, dataset=True, spark=spark)
    return spark.table(log_group)


def _split_top_level(body: str) -> List[str]:
    """Split on commas not nested inside parentheses."""
    parts: List[str] = []
    depth = 0
    current: List[str] = []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(current).strip())
            current = []
        else:
            current.append(ch)
    if current:
        parts.append("".join(current).strip())
    return parts


# Logs Insights bin(<n><unit>) time bucketing; the analog buckets the
# log table's ``ts`` column (Insights buckets @timestamp implicitly)
_BIN_RE = re.compile(r"\bbin\(\s*(\d+)\s*(s|m|h|d)\s*\)", re.IGNORECASE)
_BIN_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


# string literals in a stage: single- OR double-quoted, with doubled
# quotes ('' / "") and backslash escapes (\' / \") consumed as literal
# CONTENT — so a predicate like  filter msg != 'it''s bin(5m)'  keeps
# its bin() untouched instead of being mis-segmented at the escape
_STR_LIT_RE = re.compile(
    r"""'(?:[^'\\]|\\.|'')*'|"(?:[^"\\]|\\.|"")*\"""",
)


def _rewrite_bins(stage: str) -> str:
    """Rewrite ``bin(<n><unit>)`` into the bucketing expression —
    outside string literals only (both quote styles, escape-aware),
    so a literal like ``'bin(5m)'`` in a filter predicate passes
    through untouched. Callers must not apply this to ``parse``
    stages (their regex bodies are opaque); `_compile_insights`
    rewrites per stage."""

    def repl(m: "re.Match[str]") -> str:
        secs = int(m.group(1)) * _BIN_SECONDS[m.group(2).lower()]
        return f"timestamp_seconds(floor(unix_seconds(ts) / {secs}) * {secs})"

    out: List[str] = []
    pos = 0
    for lit in _STR_LIT_RE.finditer(stage):
        out.append(_BIN_RE.sub(repl, stage[pos : lit.start()]))
        out.append(lit.group(0))
        pos = lit.end()
    tail = stage[pos:]
    # after every complete literal is consumed, any remaining quote
    # starts an UNTERMINATED literal — rewriting through it would
    # treat quoted text as code, so fail the parse loudly instead
    if "'" in tail or '"' in tail:
        raise ValueError(
            f"unterminated string literal in query stage: {stage!r}"
        )
    out.append(_BIN_RE.sub(repl, tail))
    return "".join(out)


def _key_expr(key: str) -> "F.Column":
    """Group key with optional trailing alias. The `` as `` must sit
    OUTSIDE parentheses (``cast(x as int)`` is not an alias) — checked
    by requiring the head to be paren-balanced."""
    m = re.fullmatch(r"(?is)(.+?)\s+as\s+(\w+)\s*", key)
    if m and m.group(1).count("(") == m.group(1).count(")"):
        return F.expr(m.group(1).strip()).alias(m.group(2))
    return F.expr(key)


def _compile_insights(df: DataFrame, query: str) -> DataFrame:
    """Compile a Logs-Insights-style pipeline onto a DataFrame plan.

    Supported stages (SQL expressions inside stages):
    ``fields a, b AS c`` | ``filter <predicate>`` |
    ``stats agg1 AS x, agg2 AS y by k1, k2 [as name]`` |
    ``sort col [asc|desc]`` | ``limit n`` |
    ``parse <col> /<regex>/ as g1, g2`` (regex groups) |
    ``dedup k1, k2`` (one row per key — the latest by ``ts`` when the
    column is present, so the keep choice is deterministic).
    ``bin(<n><s|m|h|d>)`` anywhere in a stage buckets ``ts`` to the
    interval floor (Insights time bucketing), e.g.
    ``stats count(*) as n by bin(1h) as hour``.
    """
    for raw_stage in [s.strip() for s in query.split("|") if s.strip()]:
        lowered = raw_stage.lower()
        # bin() rewriting is per-stage and never touches parse stages —
        # a /<regex>/ body containing "bin(5m)" must stay verbatim
        if not lowered.startswith("parse "):
            raw_stage = _rewrite_bins(raw_stage)
            lowered = raw_stage.lower()
        if lowered.startswith("fields "):
            df = df.selectExpr(*_split_top_level(raw_stage[7:]))
        elif lowered.startswith("filter "):
            df = df.filter(raw_stage[7:])
        elif lowered.startswith("stats "):
            body = raw_stage[6:]
            by_idx = body.lower().rfind(" by ")
            if by_idx >= 0:
                aggs, keys = body[:by_idx], _split_top_level(body[by_idx + 4 :])
            else:
                aggs, keys = body, []
            agg_exprs = _split_top_level(aggs)
            if keys:
                df = df.groupBy(*[_key_expr(k) for k in keys]).agg(
                    *[F.expr(a) for a in agg_exprs]
                )
            else:
                df = df.agg(*[F.expr(a) for a in agg_exprs])
        elif lowered.startswith("sort "):
            body = raw_stage[5:].strip()
            descending = body.lower().endswith(" desc")
            if descending:
                body = body[:-5]
            elif body.lower().endswith(" asc"):
                body = body[:-4]
            df = df.orderBy(F.expr(body.strip()).desc() if descending else F.expr(body.strip()).asc())
        elif lowered.startswith("limit "):
            df = df.limit(int(raw_stage[6:].strip()))
        elif lowered.startswith("dedup ") or lowered == "dedup":
            keys = _split_top_level(raw_stage[6:]) if len(raw_stage) > 6 else list(df.columns)
            if "ts" in df.columns:
                from pyspark.sql.window import Window

                order = [F.col("ts").desc()] + [
                    F.col(c).desc() for c in df.columns if c == "event_id"
                ]
                w = Window.partitionBy(*[F.expr(k) for k in keys]).orderBy(*order)
                df = (
                    df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
            else:
                df = df.dropDuplicates(keys)
        elif lowered.startswith("parse "):
            body = raw_stage[6:]
            col_part, _, rest = body.partition("/")
            regex, _, as_part = rest.rpartition("/")
            names = [n.strip() for n in as_part.replace("as ", "", 1).split(",")]
            src = col_part.strip()
            for i, name in enumerate(names, start=1):
                df = df.withColumn(name, F.regexp_extract(F.col(src), regex, i))
        else:
            raise InvalidArgument(f"unsupported Insights stage: {raw_stage}")
    return df


def start_query(
    query: str,
    log_group_names: Union[str, List[str]],
    start_time: Optional[datetime.datetime] = None,
    end_time: Optional[datetime.datetime] = None,
    limit: Optional[int] = None,
    time_column: str = "ts",
    spark: Optional[SparkSession] = None,
) -> str:
    """Ref: awswrangler/cloudwatch.py:18 ``start_query``."""
    spark = _active_spark(spark)
    groups = [log_group_names] if isinstance(log_group_names, str) else list(log_group_names)
    df: Optional[DataFrame] = None
    for group in groups:
        part = _load_log_group(spark, group)
        df = part if df is None else df.unionByName(part, allowMissingColumns=True)
    assert df is not None
    if start_time is not None:
        df = df.filter(F.col(time_column) >= F.lit(start_time))
    if end_time is not None:
        df = df.filter(F.col(time_column) < F.lit(end_time))
    query_id = str(uuid.uuid4())
    record: Dict[str, Any] = {"queryId": query_id, "status": "Running", "start": time.time()}
    _QUERIES[query_id] = record
    try:
        result = _compile_insights(df, query)
        if limit is not None:
            result = result.limit(limit)
        record["DataFrame"] = result
        record["status"] = "Complete"
    except Exception as error:  # noqa: BLE001 - surfaced via status, like the service
        record["status"] = "Failed"
        record["reason"] = str(error)
    return query_id


def wait_query(query_id: str, **_: Any) -> Dict[str, Any]:
    """Ref: awswrangler/cloudwatch.py:77 ``wait_query``."""
    record = _QUERIES[query_id]
    if record["status"] == "Failed":
        raise QueryFailed(record.get("reason"))
    return {k: v for k, v in record.items() if k != "DataFrame"}


def run_query(
    query: str,
    log_group_names: Union[str, List[str]],
    **kwargs: Any,
) -> DataFrame:
    """start + wait + results. Ref: awswrangler/cloudwatch.py:120 ``run_query``."""
    query_id = start_query(query, log_group_names, **kwargs)
    wait_query(query_id)
    return _QUERIES[query_id]["DataFrame"]


def read_logs(
    query: str,
    log_group_names: Union[str, List[str]],
    **kwargs: Any,
) -> DataFrame:
    """Ref: awswrangler/cloudwatch.py:174 ``read_logs``."""
    return run_query(query, log_group_names, **kwargs)
