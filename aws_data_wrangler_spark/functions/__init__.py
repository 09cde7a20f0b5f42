"""Shared column-expression helpers (JVM-side, codegen-friendly).

The numeric-stability conventions live here: cross-engine-stable
truncation and the vector primitives used by similarity/dedup
operators — all built from ``pyspark.sql.functions`` so they stay
inside whole-stage codegen.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def trunc_digits(col: ColumnOrName, digits: int = 6) -> Column:
    """Truncate toward -inf at ``digits`` decimals.

    Used instead of ``round`` for per-row float outputs that must match
    a second engine bit-for-bit: IEEE ``floor`` on an identical double
    is identical everywhere, while round-half behavior differs between
    engines (Spark HALF_UP vs DuckDB's sprintf-style rounding).
    """
    scale = float(10**digits)
    return F.floor(_col(col) * scale) / scale


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a parquet event-time column to Spark TIMESTAMP (µs, LTZ).

    Source datasets encode event time differently across generators:

    - ``TIMESTAMP(NANOS)`` parquet has no Spark type and surfaces as
      ``bigint`` under ``spark.sql.legacy.parquet.nanosAsLong`` —
      convert with integer ``div 1000`` (float division loses µs
      precision at ns magnitudes).
    - ``TIMESTAMP(MICROS, isAdjustedToUTC=false)`` surfaces as
      ``timestamp_ntz`` — cast to LTZ; the engine pins the session
      timezone to UTC so the cast is value-preserving and functions
      like ``unix_micros``/``window`` (TIMESTAMP-only) resolve.
    - Already-``timestamp`` columns pass through untouched.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def pinned(cond: Column) -> Column:
    """Pin a filter at the plan position where it is written.

    ``PushDownPredicates`` only relocates *deterministic* predicates;
    OR-ing in an always-false non-deterministic term makes the filter
    immovable without changing its value. Use when an expensive
    computed-column filter would otherwise be pushed below the
    exchange that parallelizes its inputs — e.g. the quality+lang
    regex filter of the curation pipeline was inlined and pushed onto
    a single-row-group parquet scan, serializing all regex work into
    one task AND re-expanding every aliased subexpression inside the
    pushed condition (measured 12× slower at sf0.1).

    The anchor term is ``spark_partition_id() < 0`` — always false,
    free to evaluate, flagged non-deterministic — OR-ed in so the
    predicate stays ONE boolean the optimizer can neither split
    (conjunctions get split and their deterministic conjuncts pushed
    anyway) nor constant-fold (``rand() < -1`` does NOT work: the
    optimizer bounds rand's range and folds the term away).
    """
    return cond | (F.spark_partition_id() < F.lit(0))


def salted_join(
    left,
    right,
    on: str,
    how: str = "inner",
    salt_factor: int = 16,
):
    """Skew-resistant equi-join: salt the skewed (left) side, explode the
    small/replicated (right) side across all salt values.

    AQE's skew-join splitting handles most cases at runtime; explicit
    salting is for the pathological hot-key joins (one key = 30% of a
    100 TB fact table) where even a split partition overwhelms a task.
    The right side is replicated ``salt_factor``× — use with dimension
    tables, not fact-fact joins.
    """
    # per-row (not per-key!) salt: rows of a hot key must spread across
    # salt buckets, so derive from the row position, never from the key
    left_salted = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_factor)).cast("long")
    )
    right_salted = right.withColumn(
        "__salt_arr", F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<long>")
    ).withColumn("__salt", F.explode("__salt_arr")).drop("__salt_arr")
    out = left_salted.join(right_salted, [on, "__salt"], how)
    return out.drop("__salt")


def vec_dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Sequential (left-to-right) dot product of two array columns —
    same summation order as DuckDB's list_dot_product, so results are
    bit-identical across engines."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm(a: ColumnOrName) -> Column:
    """L2 norm with sequential summation."""
    col = _col(a)
    return F.sqrt(F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def vec_cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity (assumes nonzero vectors)."""
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
