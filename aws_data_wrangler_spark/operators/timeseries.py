"""Time-series operators: bucket rollups with gap filling.

The hypertable pattern (continuous aggregate + gap fill + last-value
interpolation) the reference's users run in Athena with date spines.
Spark-first shape: per-key bounds → ``sequence`` spine (one array per
key, exploded — generating a year of hourly buckets is 8760 rows per
key, never a cartesian) → keyed left join → carry-forward window.
Two shuffles total (join + window, same key), both on the bucket key.
"""

from __future__ import annotations

from typing import Optional

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
    joined = _rollup_spine(df, time_col, key_col, value_col, bucket, step)
    carry = Window.partitionBy(key_col).orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        F.col(key_col),
        F.date_format(F.col("__bucket"), "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        F.last("avg_value", ignorenulls=True).over(carry).alias("filled_avg"),
    )


def _rollup_spine(
    df: DataFrame,
    time_col: str,
    key_col: str,
    value_col: str,
    bucket: str,
    step: str,
) -> DataFrame:
    """Shared scaffolding of ``gapfill_rollup`` / ``interpolate_linear``:
    the grid-stable bucketed rollup (round the sum at the value's 2dp
    grid BEFORE dividing — a bare round(avg) is boundary-unstable
    across engines), the per-key [min, max] ``sequence`` spine, and the
    keyed left join. ONE place owns the rollup convention; the fillers
    differ only in their window step."""
    bucketed = F.date_trunc(bucket, F.col(time_col))
    rollup = df.groupBy(F.col(key_col), bucketed.alias("__bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.round(F.sum(value_col), 2) / F.count(F.lit(1)), 6).alias("avg_value"),
    )
    bounds = rollup.groupBy(key_col).agg(
        F.min("__bucket").alias("__mn"), F.max("__bucket").alias("__mx")
    )
    spine = bounds.select(
        F.col(key_col),
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"), F.expr(step))).alias("__bucket"),
    )
    return spine.join(rollup, [key_col, "__bucket"], "left")


def _season_expr(seasonal):
    if seasonal is None:
        return F.lit(0)
    if seasonal == "hour_of_day":
        return F.hour(F.col("bucket_ts"))
    if seasonal == "day_of_week":
        return F.dayofweek(F.col("bucket_ts"))
    raise ValueError(
        f"seasonal must be None, 'hour_of_day', or 'day_of_week'; got {seasonal!r}"
    )


def bucket_counts(
    df: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    bucket: str = "hour",
    seasonal: str = None,
) -> DataFrame:
    """(key, bucket_ts, n, __season): the bucketed count table every
    robust-anomaly step consumes — one map-side-combining aggregate
    over the raw events, buckets-per-key-sized output."""
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.date_trunc(bucket, F.col(time_col)).alias("bucket_ts"),
        )
        .groupBy("key", "bucket_ts")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("__season", _season_expr(seasonal))
    )


def robust_centers(
    df: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    bucket: str = "hour",
    seasonal: str = None,
) -> DataFrame:
    """Train the (median, MAD) robust centers per key (and per seasonal
    phase) from a HISTORY window — the offline half of the anomaly
    monitor: centers are the artifact a production deployment trains on
    yesterday's traffic and scores today's stream against
    (``streaming.anomaly_monitor``). Output (key, __season, med, mad);
    two key-grouped exact-percentile aggregates over the bucket-sized
    count table, never a second corpus scan."""
    counts = bucket_counts(df, time_col, key_col, bucket, seasonal).cache()
    grp = ["key", "__season"]
    med = counts.groupBy(*grp).agg(F.expr("percentile(n, 0.5)").alias("med"))
    return (
        counts.join(F.broadcast(med), grp)
        .select(*grp, "med", (F.abs(F.col("n") - F.col("med"))).alias("adev"))
        .groupBy(*grp, "med")
        .agg(F.expr("percentile(adev, 0.5)").alias("mad"))
        # stamp the TRAINING mode on the artifact: __season values alone
        # can't always identify it (a day_of_week domain {1..7} is a
        # legal hour_of_day domain too), and the monitor must refuse a
        # cross-seasonal score rather than silently matching wrong
        # phases. score_anomalies ignores the column.
        .select(*grp, "med", "mad", F.lit(seasonal or "none").alias("__season_mode"))
    )


def score_anomalies(
    counts: DataFrame,
    centers: DataFrame,
    key_col: str = "event_type",
    threshold: float = 3.5,
) -> DataFrame:
    """Score a bucketed count table against trained centers: the
    modified z-score |0.6745·(n − med)| / MAD, flagged rows only
    (score > threshold; MAD = 0 keys yield no flags — score undefined,
    the textbook treatment). The centers table is key-cardinality-sized
    and broadcasts; buckets whose key/phase has no trained center drop
    (a monitor cannot score what it never saw — train wider instead)."""
    from aws_data_wrangler_spark.functions import trunc_digits

    grp = ["key", "__season"]
    scored = (
        counts.join(F.broadcast(centers), grp)
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
    buckets only. Self-trained: centers come from the same window being
    scored (``robust_centers`` + ``score_anomalies`` compose the
    offline-train / online-score split the streaming monitor uses).

    Plan shape: one bucketed count aggregate, then TWO key-grouped
    exact-percentile aggregates over the already-tiny per-bucket count
    table (buckets-per-key rows, never raw events), broadcast back —
    no global window, no second scan of the corpus. Exact
    ``percentile`` (R-7 interpolation) matches DuckDB's
    ``quantile_cont`` bit-for-bit — the shared percentile-replica
    convention; the score is 6dp floor-truncated. An all-identical key
    (MAD = 0) yields no flags (score undefined ⇒ filtered), matching
    the textbook treatment.

    ``seasonal="hour_of_day"`` / ``"day_of_week"`` computes the
    median/MAD per (key, season) instead of per key — the traffic
    pattern where 9am is ALWAYS 10× of 3am and a global center would
    flag every business hour; the bucket is compared against peers of
    the same phase. Same plan shape, one extra tiny grouping column.
    """
    # the count table feeds the centers AND the scoring pass; cache()
    # materializes it once — buckets-per-key-sized by construction.
    # cache, NOT localCheckpoint: checkpoint blocks have no lineage, so
    # one lost executor kills the job on a real cluster, and they
    # survive catalog.clearCache()
    counts = bucket_counts(df, time_col, key_col, bucket, seasonal).cache()
    grp = ["key", "__season"]
    med = counts.groupBy(*grp).agg(F.expr("percentile(n, 0.5)").alias("med"))
    centers = (
        counts.join(F.broadcast(med), grp)
        .select(*grp, "med", (F.abs(F.col("n") - F.col("med"))).alias("adev"))
        .groupBy(*grp, "med")
        .agg(F.expr("percentile(adev, 0.5)").alias("mad"))
        .select(*grp, "med", "mad")
    )
    return score_anomalies(counts, centers, key_col=key_col, threshold=threshold)


def interpolate_linear(
    df: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
    step: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """Dense per-key time spine with LINEAR interpolation across empty
    buckets — the hypertable ``interpolate()`` companion to
    ``gapfill_rollup``'s carry-forward: an empty bucket between two
    observed ones gets ``prev + (t−t_prev)/(t_next−t_prev) ·
    (next−prev)``; leading/trailing gaps (no neighbor on one side) stay
    NULL, the textbook treatment. Output ``(key, bucket_ts, n_events,
    interp_avg)``.

    Plan shape: the gap-fill discipline — bucketed rollup, per-key
    ``sequence`` spine (calendar-bounded arrays, never a cartesian),
    keyed left join, then TWO windows over the SAME key partitioning
    (carry-back is the carry-forward window reversed), so the whole
    operator is two shuffles on the bucket key. Interpolation
    arithmetic is plain IEEE double over epoch-second integers — the
    DuckDB oracle replicates it bit-for-bit under the grid-stable avg
    convention."""
    from aws_data_wrangler_spark.functions import trunc_digits

    joined = _rollup_spine(df, time_col, key_col, value_col, bucket, step)
    fwd = Window.partitionBy(key_col).orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bwd = Window.partitionBy(key_col).orderBy("__bucket").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    t = F.unix_timestamp("__bucket").cast("double")
    t_marked = F.when(F.col("avg_value").isNotNull(), t)
    prev_v = F.last("avg_value", ignorenulls=True).over(fwd)
    next_v = F.first("avg_value", ignorenulls=True).over(bwd)
    prev_t = F.last(t_marked, ignorenulls=True).over(fwd)
    next_t = F.first(t_marked, ignorenulls=True).over(bwd)
    interp = F.when(F.col("avg_value").isNotNull(), F.col("avg_value")).otherwise(
        # both neighbors required; equal-ts case can't occur on a spine
        prev_v + (t - prev_t) / (next_t - prev_t) * (next_v - prev_v)
    )
    return joined.select(
        F.col(key_col),
        F.date_format("__bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        trunc_digits(interp).alias("interp_avg"),
    )


def ewma(
    df: DataFrame,
    alpha: float = 0.25,
    time_col: str = "ts",
    key_col: str = "event_type",
    bucket: str = "hour",
) -> DataFrame:
    """Exponentially-weighted moving average of per-bucket event counts,
    folded chronologically per key: ``s_1 = n_1``, ``s_t = alpha·n_t +
    (1−alpha)·s_{t−1}`` — the classic ops smoothing that weights recent
    buckets geometrically more. Output one row per key: ``(key,
    n_buckets, last_bucket_ts, ewma)`` — the CURRENT smoothed level, the
    number a monitor compares the next bucket against.

    Plan shape: one map-side-combining bucketed count aggregate, then
    one per-key ``collect_list`` + sequential ``F.aggregate`` fold —
    the per-key array is CALENDAR-bounded (8,760 hourly buckets per
    key-year, the gap-fill spine magnitude), never data-sized, so the
    fold state stays trivial at any corpus scale and the whole operator
    is two shuffles on the same key.

    Determinism: the fold is a left-to-right IEEE double chain over
    chronologically-sorted buckets; with ``alpha`` exactly
    representable in binary (0.25, 0.5, 0.125, …) the result is
    bit-identical across engines — DuckDB's ``list_reduce`` replicates
    it term-for-term (the dot-product-fold convention).
    """
    counts = bucket_counts(df, time_col, key_col, bucket).drop("__season")
    return ewma_from_counts(counts, alpha, key_col)


def _fold_counts(counts: DataFrame, key_col: str, fold_of_vals, out_of_state):
    """Shared pack/fold scaffolding of the per-key chronological count
    smoothers (``ewma_from_counts`` / ``holt_from_counts`` — folded
    into one helper per VERDICT r9 #5, now that both rows rotate
    through the same driver window): key resolution (the explicit
    ``key_col`` wins over a leftover generic ``key`` column),
    partitioning-invariant chronological pack (``array_sort`` over
    ``(bucket_ts, n)`` structs — bucket_ts is unique per key after the
    producing groupBy, so the order is total), and ONE map-side-
    combining groupBy emitting ``(key, n_buckets, last_bucket_ts,
    *state-derived columns)``. The per-key array is CALENDAR-bounded
    (8,760 hourly buckets per key-year), never data-sized.

    ``fold_of_vals(vals)`` builds the fold expression over the
    chronological double array; ``out_of_state(st)`` maps the folded
    state column to the operator's output columns."""
    if key_col in counts.columns:
        # explicit parameter wins over a leftover generic "key" column
        counts = counts.select(F.col(key_col).alias("key"), "bucket_ts", "n")
    elif "key" not in counts.columns:
        raise ValueError(
            f"counts must carry the key column {key_col!r} (or the "
            f"generic 'key'); got {counts.columns}"
        )
    arr = F.array_sort(F.collect_list(F.struct("bucket_ts", "n")))
    vals = F.transform(arr, lambda s: s["n"].cast("double"))
    return (
        counts.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.date_format(F.max("bucket_ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "last_bucket_ts"
            ),
            fold_of_vals(vals).alias("__st"),
        )
        .select(
            F.col("key").alias(key_col),
            "n_buckets",
            "last_bucket_ts",
            *out_of_state(F.col("__st")),
        )
    )


def ewma_from_counts(
    counts: DataFrame, alpha: float = 0.25, key_col: str = "event_type"
) -> DataFrame:
    """The EWMA fold over an already-bucketed ``(key, bucket_ts, n)``
    count table — shared by the batch ``ewma`` (its counts come from
    ``bucket_counts``) and the streaming ``ewma_monitor`` (its counts
    come from a complete-mode stateful aggregate), so stream replay
    equals batch by construction.

    ``key_col`` applies to the INPUT as well as the output: a counts
    table keyed by e.g. ``event_type`` resolves through the parameter
    (the internal producers — ``bucket_counts`` and the streaming
    monitor aggregate — emit the generic ``key`` name, which is
    accepted as-is). Pack/fold scaffolding shared with
    ``holt_from_counts`` via ``_fold_counts``; the fold itself is a
    left-to-right IEEE double chain (bit-identical across engines with
    exactly-representable ``alpha``)."""
    from aws_data_wrangler_spark.functions import trunc_digits

    def fold(vals):
        return F.aggregate(
            F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
            F.element_at(vals, 1),
            lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
        )

    return _fold_counts(
        counts, key_col, fold, lambda st: [trunc_digits(st).alias("ewma")]
    )


def holt_linear(
    df: DataFrame,
    alpha: float = 0.25,
    beta: float = 0.25,
    time_col: str = "ts",
    key_col: str = "event_type",
    bucket: str = "hour",
) -> DataFrame:
    """Holt double-exponential smoothing of per-bucket event counts —
    the trend rung above `ewma` (which tracks LEVEL only and lags any
    ramp by design): per key the chronological fold

        l_t = α·n_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = α·β·(n_t − l_{t−1}) + (β·(1−α) + (1−β))·b_{t−1}

    (the standard Holt update with the trend step algebraically
    expanded so each state field depends ONLY on the previous state —
    the form both engines evaluate as one expression tree) with
    ``l_1 = n_1, b_1 = 0``. Output one row per key: the current
    ``level``, ``trend`` (buckets/bucket ramp rate), and
    ``forecast_next = level + trend`` — what a traffic monitor expects
    the NEXT bucket to be, correct under ramps where the EWMA level is
    systematically behind.

    Plan/determinism contract = `ewma`'s: two shuffles on the same
    key, calendar-bounded per-key arrays, a left-to-right IEEE fold
    over a 2-element array state ([level, trend] — an ARRAY, not a
    struct: DuckDB 1.0's list_reduce evaluates struct fields against a
    partially-updated accumulator, while array construction is atomic
    in both engines). With α, β ∈ {0.25, 0.5, …} every coefficient
    (α, 1−α, αβ, β(1−α)+(1−β)) is exactly representable, so the chain
    is bit-identical across engines."""
    counts = bucket_counts(df, time_col, key_col, bucket).drop("__season")
    return holt_from_counts(counts, alpha, beta, key_col)


def holt_from_counts(
    counts: DataFrame,
    alpha: float = 0.25,
    beta: float = 0.25,
    key_col: str = "event_type",
) -> DataFrame:
    """The Holt fold over an already-bucketed ``(key, bucket_ts, n)``
    count table — the `ewma_from_counts` contract (shared by the batch
    smoother and any streaming replay of the same counts), for the
    level+trend state. Pack/fold scaffolding shared with
    ``ewma_from_counts`` via ``_fold_counts`` (VERDICT r9 #5 — the r9
    byte-identity deferral resolved in the round both rows rotate
    through the window); only the fold expression and the state→output
    mapping differ."""
    from aws_data_wrangler_spark.functions import trunc_digits

    # exactly-representable coefficient set (documented contract)
    c_l_prev = F.lit(1.0 - alpha)
    c_trend_x = F.lit(alpha * beta)
    c_trend_prev = F.lit(beta * (1.0 - alpha) + (1.0 - beta))

    def fold(vals):
        return F.aggregate(
            F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
            F.array(F.element_at(vals, 1), F.lit(0.0)),
            lambda acc, x: F.array(
                x * F.lit(alpha)
                + (F.element_at(acc, 1) + F.element_at(acc, 2)) * c_l_prev,
                (x - F.element_at(acc, 1)) * c_trend_x
                + F.element_at(acc, 2) * c_trend_prev,
            ),
        )

    def out(st):
        return [
            trunc_digits(F.element_at(st, 1)).alias("level"),
            trunc_digits(F.element_at(st, 2)).alias("trend"),
            trunc_digits(
                F.element_at(st, 1) + F.element_at(st, 2)
            ).alias("forecast_next"),
        ]

    return _fold_counts(counts, key_col, fold, out)


_BUCKET_STEPS = {
    # date_trunc bucket -> matching spine step; a mismatched pair
    # fabricates phantom zero buckets between every real one and
    # silently desyncs any position-indexed fold (review finding r11)
    "minute": "INTERVAL 1 MINUTE",
    "hour": "INTERVAL 1 HOUR",
    "day": "INTERVAL 1 DAY",
    "week": "INTERVAL 1 WEEK",
}


def _step_for_bucket(bucket: str, step) -> str:
    """Resolve the spine step from the truncation bucket. ``step=None``
    (the default) derives it; an explicit step is honored as-is for
    exotic grids, but the silent-corruption case — a non-hour bucket
    riding a stale hourly default — cannot happen because there IS no
    literal default anymore."""
    if step is not None:
        return step
    # date_trunc accepts case-insensitive bucket names — so must we
    # (second-review finding r11: "HOUR" worked before the derivation)
    got = _BUCKET_STEPS.get(bucket.lower())
    if got is None:
        raise ValueError(
            f"no spine step known for bucket={bucket!r} — pass step= "
            f"explicitly (known buckets: {sorted(_BUCKET_STEPS)})"
        )
    return got


def holt_winters(
    df: DataFrame,
    period: int = 24,
    alpha: float = 0.25,
    beta: float = 0.25,
    gamma: float = 0.25,
    time_col: str = "ts",
    key_col: str = "event_type",
    bucket: str = "hour",
    step: Optional[str] = None,
) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing of per-bucket event
    counts — the seasonality rung above `holt_linear` (which tracks
    level+trend and reads every daily rush hour as a fresh ramp):
    level, trend, and a ``period``-slot seasonal profile folded
    chronologically per key; ``forecast_next`` is seasonally adjusted
    (``level + trend + s_next``), which is what an hourly traffic
    monitor must compare against or it pages on every peak.

    The seasonal slot is the FOLD POSITION mod ``period``, so the count
    series must be GAPLESS per key — this wrapper densifies the
    bucketed counts over each key's own [min, max] spine with
    zero-filled empty buckets (exactly `gapfill_rollup`'s spine; an
    empty bucket is a real zero observation for a count series) before
    handing them to ``holt_winters_from_counts``. Plan/determinism
    contract = `holt_linear`'s, plus the spine join of
    `gapfill_rollup`: calendar-bounded per-key arrays, one fold over a
    ``(3 + period)``-element ARRAY state, all update coefficients
    dyadic at the default α=β=γ=0.25 so the chain is bit-identical
    across engines.
    """
    counts = bucket_counts(df, time_col, key_col, bucket).drop("__season")
    return holt_winters_from_counts(
        dense_counts(counts, _step_for_bucket(bucket, step)),
        period, alpha, beta, gamma, key_col,
    )


def dense_counts(
    counts: DataFrame, step: str = "INTERVAL 1 HOUR", key_col: str = "key"
) -> DataFrame:
    """Zero-fill a bucketed ``(key, bucket_ts, n)`` count table over
    each key's own [min, max] spine (the ``gapfill_rollup`` spine; an
    empty bucket is a real zero observation for a COUNT series) — the
    densification every position-indexed fold needs
    (``holt_winters_from_counts``: the seasonal slot is fold position
    mod period, so a missing bucket desyncs every later slot). Shared
    by the batch `holt_winters` wrapper and the streaming
    ``holt_winters_monitor`` so replay equals batch by construction.
    One bounded aggregate + one keyed equi-join; output is
    buckets-per-key-sized, never data-sized.

    ``key_col`` names the key column for composition with the
    ``*_from_counts`` operators' keyed tables (ADVICE r11: an
    ``event_type``-keyed table used to raise instead of resolving),
    under the ``_fold_counts`` resolution rule — the explicit
    ``key_col`` wins, a generic ``"key"`` table still resolves — so
    ``holt_winters_from_counts(dense_counts(c, key_col=k), key_col=k)``
    composes directly whichever name ``c`` carries. The output keeps
    the input's actual key name.
    """
    renamed = False
    if key_col != "key":
        # the _fold_counts resolution rule verbatim: the explicit
        # key_col wins over a leftover generic "key" column; a table
        # carrying only the generic "key" still resolves (r12 review
        # finding — raising here broke drop-in composition for
        # generic-key tables the *_from_counts operators accept)
        if key_col in counts.columns:
            counts = counts.select(F.col(key_col).alias("key"), "bucket_ts", "n")
            renamed = True
        elif "key" not in counts.columns:
            raise ValueError(
                f"counts must carry the key column {key_col!r} (or the "
                f"generic 'key'); got {counts.columns}"
            )
    bounds = counts.groupBy("key").agg(
        F.min("bucket_ts").alias("__mn"), F.max("bucket_ts").alias("__mx")
    )
    spine = bounds.select(
        "key",
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"), F.expr(step))).alias(
            "bucket_ts"
        ),
    )
    dense = spine.join(counts, ["key", "bucket_ts"], "left").select(
        "key", "bucket_ts", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    if renamed:
        dense = dense.select(F.col("key").alias(key_col), "bucket_ts", "n")
    return dense


def holt_winters_from_counts(
    counts: DataFrame,
    period: int = 24,
    alpha: float = 0.25,
    beta: float = 0.25,
    gamma: float = 0.25,
    key_col: str = "event_type",
) -> DataFrame:
    """The Holt-Winters additive fold over an already-bucketed,
    GAPLESS ``(key, bucket_ts, n)`` count table (the
    ``holt_from_counts`` contract; compose with ``gapfill_rollup`` /
    the `holt_winters` spine when buckets can be empty — the seasonal
    slot is the fold position mod ``period``, so a missing bucket
    desyncs every later slot from the calendar).

    Per key, with observation ``y_t`` at fold position ``t`` (1-based)
    and seasonal slot ``j = (t−1) mod period``, the standard additive
    update algebraically expanded so every state field depends ONLY on
    the previous state (the `holt_linear` one-expression-tree form):

        l_t = α·(y_t − s_j) + (1−α)·(l_{t−1} + b_{t−1})
        b_t = αβ·(y_t − s_j − l_{t−1}) + (β(1−α) + (1−β))·b_{t−1}
        s_j' = γ(1−α)·(y_t − l_{t−1} − b_{t−1}) + (1 − γ(1−α))·s_j

    Cold start: ``l_1 = y_1``, ``b_1 = 0``, all seasonal slots 0 — the
    first cycle learns the profile (the EWMA-family seeding
    convention; the classical first-season-average init needs a second
    pass the fold form doesn't buy anything from). State is one
    ``(3 + period)``-element DOUBLE ARRAY ``[level, trend, t,
    s_0..s_{period−1}]`` — an ARRAY, not a struct (the DuckDB
    partially-updated-accumulator rule), rebuilt atomically each step
    with the touched slot replaced via an indexed ``transform``. With
    α, β, γ ∈ {0.25, 0.5, …} every expanded coefficient (α, 1−α, αβ,
    β(1−α)+(1−β), γ(1−α), 1−γ(1−α)) is exactly representable, so the
    fold is bit-identical across engines and a DuckDB oracle
    exact-matches, no envelope.

    Output per key: ``(key, n_buckets, last_bucket_ts, level, trend,
    forecast_next, season_range)`` — ``forecast_next = level + trend +
    s_{t mod period}`` (the NEXT observation's slot), ``season_range =
    max(s) − min(s)`` (the learned peak-to-trough amplitude, the
    "is there seasonality at this period" readout).
    """
    from aws_data_wrangler_spark.functions import trunc_digits

    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    # exactly-representable expanded coefficient set (documented)
    c_a = F.lit(alpha)
    c_lp = F.lit(1.0 - alpha)
    c_tx = F.lit(alpha * beta)
    c_tp = F.lit(beta * (1.0 - alpha) + (1.0 - beta))
    c_sx = F.lit(gamma * (1.0 - alpha))
    c_sp = F.lit(1.0 - gamma * (1.0 - alpha))

    def step(acc, x):
        slot = F.element_at(acc, 3).cast("int") % period  # 0-based
        s_prev = F.element_at(acc, slot + F.lit(4))
        l_prev, b_prev = F.element_at(acc, 1), F.element_at(acc, 2)
        return F.concat(
            F.array(
                (x - s_prev) * c_a + (l_prev + b_prev) * c_lp,
                (x - s_prev - l_prev) * c_tx + b_prev * c_tp,
                F.element_at(acc, 3) + F.lit(1.0),
            ),
            F.transform(
                F.slice(acc, 4, period),
                lambda s, i: F.when(
                    i == slot, (x - l_prev - b_prev) * c_sx + s * c_sp
                ).otherwise(s),
            ),
        )

    def fold(vals):
        init = F.concat(
            F.array(F.element_at(vals, 1), F.lit(0.0), F.lit(1.0)),
            F.array_repeat(F.lit(0.0), period),
        )
        return F.aggregate(
            F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
            init,
            step,
        )

    def out(st):
        next_slot = F.element_at(st, 3).cast("int") % period
        s_next = F.element_at(st, next_slot + F.lit(4))
        seasonals = F.slice(st, 4, period)
        return [
            trunc_digits(F.element_at(st, 1)).alias("level"),
            trunc_digits(F.element_at(st, 2)).alias("trend"),
            trunc_digits(
                F.element_at(st, 1) + F.element_at(st, 2) + s_next
            ).alias("forecast_next"),
            trunc_digits(
                F.array_max(seasonals) - F.array_min(seasonals)
            ).alias("season_range"),
        ]

    return _fold_counts(counts, key_col, fold, out)
