"""Temporal join operators: as-of and bucketed interval joins."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from aws_data_wrangler_spark.operators import joins


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute, 0)


class TestAsofJoin:
    def test_most_recent_at_or_before(self, spark):
        left = spark.createDataFrame(
            [(1, 10, _ts(5)), (2, 10, _ts(20)), (3, 10, _ts(1)), (4, 20, _ts(10))],
            "event_id long, user_id long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(10, _ts(2), 100), (10, _ts(5), 101), (10, _ts(15), 102), (20, _ts(30), 200)],
            "user_id long, ts timestamp, payload long",
        )
        out = joins.asof_join(left, right, on="user_id", right_cols=["payload"], how="inner")
        rows = {r["event_id"]: r["payload"] for r in out.collect()}
        # event 1 @5 → right @5 (equal time matches, <= semantics)
        # event 2 @20 → right @15; event 3 @1 → none (dropped, inner)
        # event 4 (user 20) @10 → right @30 is later → dropped
        assert rows == {1: 101, 2: 102}

    def test_left_keeps_unmatched(self, spark):
        left = spark.createDataFrame([(1, 10, _ts(1))], "event_id long, user_id long, ts timestamp")
        right = spark.createDataFrame([(10, _ts(9), 1)], "user_id long, ts timestamp, payload long")
        out = joins.asof_join(left, right, on="user_id", right_cols=["payload"], how="left")
        row = out.collect()[0]
        assert row["event_id"] == 1 and row["payload"] is None

    def test_forward_direction(self, spark):
        left = spark.createDataFrame(
            [(1, 10, _ts(5)), (2, 10, _ts(20)), (3, 10, _ts(40)), (4, 20, _ts(50))],
            "event_id long, user_id long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(10, _ts(2), 100), (10, _ts(5), 101), (10, _ts(30), 102), (20, _ts(10), 200)],
            "user_id long, ts timestamp, payload long",
        )
        out = joins.asof_join(
            left, right, on="user_id", right_cols=["payload"], how="inner", direction="forward"
        )
        rows = {r["event_id"]: r["payload"] for r in out.collect()}
        # event 1 @5 → right @5 (equal time matches, >= semantics)
        # event 2 @20 → right @30 (earliest at-or-after)
        # event 3 @40 → none; event 4 (user 20) @50 → right @10 is earlier → none
        assert rows == {1: 101, 2: 102}

    def test_nearest_direction_picks_closer_side(self, spark):
        left = spark.createDataFrame(
            [(1, 10, _ts(6)), (2, 10, _ts(26)), (3, 10, _ts(17)), (4, 20, _ts(50))],
            "event_id long, user_id long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(10, _ts(2), 100), (10, _ts(8), 101), (10, _ts(30), 102), (20, _ts(56), 200)],
            "user_id long, ts timestamp, payload long",
        )
        out = joins.asof_join(
            left, right, on="user_id", right_cols=["payload"], direction="nearest"
        )
        rows = {r["event_id"]: r["payload"] for r in out.collect()}
        # event 1 @6: backward @2 (gap 4) vs forward @8 (gap 2) → 101
        # event 2 @26: backward @8 (18) vs forward @30 (4) → 102
        # event 3 @17: @8 (9) vs @30 (13) → 101
        # event 4 (user 20) @50: no backward, forward @56 → 200
        assert rows == {1: 101, 2: 102, 3: 101, 4: 200}
        # equidistant → backward (the pandas tie rule): @5 between @2/@8
        tie = spark.createDataFrame(
            [(9, 10, _ts(5))], "event_id long, user_id long, ts timestamp"
        )
        got = joins.asof_join(
            tie, right, on="user_id", right_cols=["payload"], direction="nearest"
        ).collect()
        assert got[0]["payload"] == 100
        # tolerance (seconds) masks each side independently at 5 min:
        # e1 both in range → closer forward; e2 backward (18 min) out,
        # forward (4 min) in; e3 (9/13 min) both out; e4 (6 min) out
        tol = joins.asof_join(
            left, right, on="user_id", right_cols=["payload"],
            direction="nearest", tolerance=300.0, how="left",
        )
        rows = {r["event_id"]: r["payload"] for r in tol.collect()}
        assert rows == {1: 101, 2: 102, 3: None, 4: None}
        # still ONE exchange: the second direction's window reuses the
        # key partitioning (a sort, not a shuffle)
        from aws_data_wrangler_spark.plans.audit import plan_summary

        s = plan_summary(
            joins.asof_join(
                left, right, on="user_id", right_cols=["payload"], direction="nearest"
            )
        )
        assert s["exchanges"] <= 2  # union window (+ AQE read), same as backward

    def test_tolerance_masks_stale_matches(self, spark):
        left = spark.createDataFrame(
            [(1, 10, _ts(5)), (2, 10, _ts(59))],
            "event_id long, user_id long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(10, _ts(4), 100)], "user_id long, ts timestamp, payload long"
        )
        # 10-minute tolerance: event 1 (1 min gap) matches, event 2
        # (55 min gap) nulls out and drops under inner
        out = joins.asof_join(
            left, right, on="user_id", right_cols=["payload"], how="inner", tolerance=600.0
        )
        rows = {r["event_id"]: r["payload"] for r in out.collect()}
        assert rows == {1: 100}
        kept = joins.asof_join(
            left, right, on="user_id", right_cols=["payload"], how="left", tolerance=600.0
        )
        rows = {r["event_id"]: r["payload"] for r in kept.collect()}
        assert rows == {1: 100, 2: None}

    def test_asof_matches_duckdb_semantics_on_events(self, spark, events):
        # backward inner asof of clicks onto signups must equal the
        # per-row max(right.ts <= left.ts) computed by brute force
        clicks = events.filter("event_type = 'click'").select("event_id", "user_id", "ts")
        signups = events.filter("event_type = 'signup'").select(
            "user_id", F.col("ts").alias("signup_ts")
        )
        out = joins.asof_join(
            clicks, signups, on="user_id", left_time="ts", right_time="signup_ts"
        )
        brute = (
            clicks.join(signups, "user_id")
            .filter(F.col("signup_ts") <= F.col("ts"))
            .groupBy("event_id")
            .agg(F.max("signup_ts").alias("signup_ts"))
        )
        got = {(r["event_id"], r["signup_ts"]) for r in out.select("event_id", "signup_ts").collect()}
        want = {(r["event_id"], r["signup_ts"]) for r in brute.collect()}
        assert got == want

    def test_asof_rejects_bad_args(self, spark):
        import pytest as _pytest

        df = spark.createDataFrame([(1, 10, _ts(1))], "event_id long, user_id long, ts timestamp")
        with _pytest.raises(ValueError, match="direction"):
            joins.asof_join(df, df, on="user_id", direction="sideways")
        with _pytest.raises(ValueError, match="tolerance"):
            joins.asof_join(df, df, on="user_id", tolerance=-1.0)


class TestIntervalJoin:
    def test_pairs_within_window(self, spark):
        left = spark.createDataFrame([(1, _ts(0)), (2, _ts(40))], "id long, ts timestamp")
        right = spark.createDataFrame(
            [(100, _ts(5)), (101, _ts(41)), (102, _ts(59))], "id long, ts timestamp"
        )
        out = joins.interval_join_bucketed(left, right, "ts", "ts", window_seconds=600.0)
        pairs = {(r["l_id"], r["r_id"]) for r in out.collect()}
        # window = [t, t+10min): left@0 ↔ right@5; left@40 ↔ right@41
        assert pairs == {(1, 100), (2, 101)}

    def test_equals_naive_join(self, spark, events):
        errors = events.filter("event_type = 'error'").select("event_id", "ts")
        clicks = events.filter("event_type = 'click'").select("event_id", "ts")
        bucketed = joins.interval_join_bucketed(errors, clicks, "ts", "ts", window_seconds=3600.0)
        naive = (
            errors.alias("e").join(clicks.alias("c"))
            .filter(
                (F.unix_micros("c.ts") >= F.unix_micros("e.ts"))
                & (F.unix_micros("c.ts") < F.unix_micros("e.ts") + 3600 * 1_000_000)
            )
            .select(F.col("e.event_id").alias("l_event_id"), F.col("c.event_id").alias("r_event_id"))
        )
        got = {(r["l_event_id"], r["r_event_id"]) for r in bucketed.select("l_event_id", "r_event_id").collect()}
        want = {(r["l_event_id"], r["r_event_id"]) for r in naive.collect()}
        assert got == want
