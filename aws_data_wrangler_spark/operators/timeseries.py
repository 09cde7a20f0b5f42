"""Time-series operators: bucket rollups with gap filling.

The hypertable pattern (continuous aggregate + gap fill + last-value
interpolation) the reference's users run in Athena with date spines.
Spark-first shape: per-key bounds → ``sequence`` spine (one array per
key, exploded — generating a year of hourly buckets is 8760 rows per
key, never a cartesian) → keyed left join → carry-forward window.
Two shuffles total (join + window, same key), both on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_rollup(
    df: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
    step: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """Bucketed rollup with dense time spine per key:
    ``(key, bucket_ts, n_events, filled_avg)``.

    Empty buckets appear with ``n_events = 0`` and ``filled_avg``
    carried forward from the most recent non-empty bucket (classic
    locf interpolation). The spine spans each key's own [min, max]
    bucket range.
    """
    bucketed = F.date_trunc(bucket, F.col(time_col))
    rollup = df.groupBy(F.col(key_col), bucketed.alias("__bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        # grid-stable avg (round the sum at the value's 2dp grid first;
        # a bare round(avg) is boundary-unstable across engines)
        F.round(F.round(F.sum(value_col), 2) / F.count(F.lit(1)), 6).alias("avg_value"),
    )
    bounds = rollup.groupBy(key_col).agg(
        F.min("__bucket").alias("__mn"), F.max("__bucket").alias("__mx")
    )
    spine = bounds.select(
        F.col(key_col),
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"), F.expr(step))).alias("__bucket"),
    )
    joined = spine.join(rollup, [key_col, "__bucket"], "left")
    carry = Window.partitionBy(key_col).orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        F.col(key_col),
        F.date_format(F.col("__bucket"), "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        F.last("avg_value", ignorenulls=True).over(carry).alias("filled_avg"),
    )


def mad_anomalies(
    df: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    bucket: str = "hour",
    threshold: float = 3.5,
    seasonal: str = None,
) -> DataFrame:
    """Robust anomaly detection on bucketed counts: per key, flag
    buckets whose modified z-score |0.6745·(n − median)| / MAD exceeds
    ``threshold`` (Iglewicz & Hoaglin's 3.5 convention) — the
    median/MAD pair survives the very outliers a mean/stddev rule is
    dragged toward, which is why it's the standard ops-monitoring
    detector. Output: (key, bucket_ts, n, med, mad, score) for flagged
    buckets only.

    Plan shape: one bucketed count aggregate, then TWO key-grouped
    exact-percentile aggregates over the already-tiny per-bucket count
    table (buckets-per-key rows, never raw events), broadcast back —
    no global window, no second scan of the corpus. Exact
    ``percentile`` (R-7 interpolation) matches DuckDB's
    ``quantile_cont`` bit-for-bit — the events_value_percentiles
    precedent; the score is 6dp floor-truncated. An all-identical key
    (MAD = 0) yields no flags (score undefined ⇒ filtered), matching
    the textbook treatment.

    ``seasonal="hour_of_day"`` / ``"day_of_week"`` computes the
    median/MAD per (key, season) instead of per key — the traffic
    pattern where 9am is ALWAYS 10× of 3am and a global center would
    flag every business hour; the bucket is compared against peers of
    the same phase. Same plan shape, one extra tiny grouping column.
    """
    from aws_data_wrangler_spark.functions import trunc_digits

    if seasonal is None:
        season = F.lit(0)
    elif seasonal == "hour_of_day":
        season = F.hour(F.col("bucket_ts"))
    elif seasonal == "day_of_week":
        season = F.dayofweek(F.col("bucket_ts"))
    else:
        raise ValueError(
            f"seasonal must be None, 'hour_of_day', or 'day_of_week'; got {seasonal!r}"
        )
    hourly = (
        df.select(
            F.col(key_col).alias("key"),
            F.date_trunc(bucket, F.col(time_col)).alias("bucket_ts"),
        )
        .groupBy("key", "bucket_ts")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("__season", season)
        # the count table feeds THREE derivations (med, dev, scored);
        # cache() materializes it once — buckets-per-key-sized by
        # construction — so the raw-event count aggregate runs one
        # time, not once per un-reused exchange. cache, NOT
        # localCheckpoint: checkpoint blocks have no lineage, so one
        # lost executor kills the job on a real cluster, and they
        # survive catalog.clearCache() — a cached plan recomputes on
        # loss and is released by the standard cache hygiene
        .cache()
    )
    grp = ["key", "__season"]
    med = hourly.groupBy(*grp).agg(
        F.expr("percentile(n, 0.5)").alias("med")
    )
    dev = (
        hourly.join(F.broadcast(med), grp)
        .select(*grp, (F.abs(F.col("n") - F.col("med"))).alias("adev"))
        .groupBy(*grp)
        .agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    )
    scored = (
        hourly.join(F.broadcast(med), grp)
        .join(F.broadcast(dev), grp)
        .filter(F.col("mad") > 0)
        .select(
            F.col("key").alias(key_col),
            "bucket_ts",
            "n",
            "med",
            "mad",
            trunc_digits(
                F.abs(F.lit(0.6745) * (F.col("n") - F.col("med")) / F.col("mad"))
            ).alias("score"),
        )
    )
    return scored.filter(F.col("score") > threshold)
