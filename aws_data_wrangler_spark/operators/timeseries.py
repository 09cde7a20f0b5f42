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
