"""Temporal join operators Spark lacks natively: as-of and interval joins.

Both avoid the naive non-equi-join trap (a broadcast-nested-loop that
dies at scale):

- ``asof_join``: the union-sort trick — tag both sides, sort within the
  key by time, and carry the last right-side payload forward with
  ``last(..., ignorenulls)`` over a running window. One shuffle on the
  key, no per-key iteration, no point-lookup joins. This is how
  point-in-time joins are done on 100 TB feature stores.
- ``interval_join_bucketed``: time-bucket the probe side, replicate
  each left interval into every bucket it overlaps, equi-join on the
  bucket, then apply the exact range predicate. The equi-join keeps
  Catalyst on a hash join; fan-out = interval_length / bucket_size.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: Optional[List[str]] = None,
    suffix: str = "_right",
    how: str = "inner",
    direction: str = "backward",
    tolerance: Optional[float] = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.time <= left.time`` within the same ``on`` key
    (``direction="backward"``, the default), the earliest right row
    with ``right.time >= left.time`` (``direction="forward"``), or
    whichever of the two sits closer in time
    (``direction="nearest"``; ties → backward, the pandas rule) — the
    three pandas ``merge_asof`` directions. ``tolerance`` (seconds, or
    plain units for numeric time columns) bounds how far away the
    match may be; out-of-tolerance matches become nulls (then drop
    under ``how="inner"``).

    Ties on the right side (equal times) resolve to the greatest value
    of the first payload column — pre-dedup the right side if a
    different policy is needed. ``how="left"`` keeps unmatched left
    rows with nulls.

    Scale shape is unchanged by the new knobs: one union-sort window
    per key (a single shuffle on ``on``), no per-key loops; tolerance
    is a post-mask on the carried match, never a join condition.
    ``nearest`` runs BOTH direction windows over the same key
    partitioning — a second within-partition sort, still the one
    shuffle — and picks the closer candidate per row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward', or 'nearest', got {direction!r}"
        )
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be non-negative, got {tolerance}")
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    l_tagged = left.withColumn("__t", F.col(left_time)).withColumn("__is_left", F.lit(1))
    r_payload = F.struct(
        F.col(right_time).alias("__rt"), *[F.col(c) for c in right_cols]
    )
    r_tagged = (
        right.select(F.col(on), F.col(right_time).alias("__t"), r_payload.alias("__payload"))
        .withColumn("__is_left", F.lit(0))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # backward scans time ascending, forward descending — either way
    # right rows sort before left rows at equal time (<= / >=
    # semantics), and among equal-time right rows the struct sort puts
    # the greatest payload last, so last() picks it deterministically
    def _carry(dirn: str) -> F.Column:
        t_order = F.col("__t").asc() if dirn == "backward" else F.col("__t").desc()
        window = (
            Window.partitionBy(on)
            .orderBy(t_order, F.col("__is_left").asc(), F.col("__payload").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__payload", ignorenulls=True).over(window)

    def _masked(match: F.Column, dirn: str) -> F.Column:
        # the carried match is the CLOSEST candidate on its side, so if
        # it sits outside the tolerance every other candidate does too
        if tolerance is None:
            return match
        delta = F.col("__t").cast("double") - match.getField("__rt").cast("double")
        if dirn == "forward":
            delta = -delta
        return F.when(delta <= F.lit(float(tolerance)), match)

    if direction == "nearest":
        # both windows share the key partitioning: the second differs
        # only in sort order, so it adds a within-partition sort, not a
        # second Exchange; per row the closer candidate wins, ties →
        # backward (the pandas rule)
        carried = (
            unioned.withColumn("__mb", _masked(_carry("backward"), "backward"))
            .withColumn("__mf", _masked(_carry("forward"), "forward"))
        )
        t = F.col("__t").cast("double")
        db = t - F.col("__mb").getField("__rt").cast("double")
        df_ = F.col("__mf").getField("__rt").cast("double") - t
        carried = carried.withColumn(
            "__match",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(db <= df_, F.col("__mb"))
            .otherwise(F.col("__mf")),
        ).drop("__mb", "__mf")
    else:
        carried = unioned.withColumn(
            "__match", _masked(_carry(direction), direction)
        )
    out = carried.filter(F.col("__is_left") == 1)
    for col in right_cols:
        out = out.withColumn(
            col + suffix if col in left.columns else col, F.col("__match").getField(col)
        )
    out = out.withColumn(
        right_time + suffix if right_time in left.columns else right_time,
        F.col("__match").getField("__rt"),
    )
    out = out.drop("__t", "__is_left", "__match", "__payload")
    if how == "inner":
        matched_time = right_time + suffix if right_time in left.columns else right_time
        out = out.filter(F.col(matched_time).isNotNull())
    return out


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    window_seconds: float,
    bucket_seconds: Optional[float] = None,
) -> DataFrame:
    """All (left, right) pairs with ``right.time`` in
    ``[left.time, left.time + window_seconds)`` — no equi key.

    Each left row is replicated into every time bucket its window
    overlaps; the join is an equi-join on the bucket id, then the exact
    range filter. Columns are returned with ``l_`` / ``r_`` prefixes.
    """
    bucket_seconds = bucket_seconds or window_seconds
    n_buckets = int(window_seconds // bucket_seconds) + 1
    l_us = F.unix_micros(F.col(left_time))
    r_us = F.unix_micros(F.col(right_time))
    bucket_us = int(bucket_seconds * 1_000_000)
    window_us = int(window_seconds * 1_000_000)

    l_pref = left.select([F.col(c).alias(f"l_{c}") for c in left.columns]).withColumn(
        "__lus", F.unix_micros(F.col(f"l_{left_time}"))
    )
    r_pref = right.select([F.col(c).alias(f"r_{c}") for c in right.columns]).withColumn(
        "__rus", F.unix_micros(F.col(f"r_{right_time}"))
    )
    l_bucketed = l_pref.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col("__lus") / bucket_us).cast("long"),
                ((F.col("__lus") + window_us) / bucket_us).cast("long"),
            )
        ),
    )
    r_bucketed = r_pref.withColumn("__bucket", (F.col("__rus") / bucket_us).cast("long"))
    # no distinct needed: each right row lives in exactly ONE bucket, so a
    # (left, right) pair can only meet once — adding one would be a full
    # extra shuffle of the join output
    return (
        l_bucketed.join(r_bucketed, "__bucket")
        .filter((F.col("__rus") >= F.col("__lus")) & (F.col("__rus") < F.col("__lus") + window_us))
        .drop("__bucket", "__lus", "__rus")
    )
