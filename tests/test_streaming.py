"""Streaming operators — availableNow replay equality + stateful sessionization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_data_wrangler_spark import streaming
from tests.conftest import SF_DIR


class TestWindowedRollup:
    def test_available_now_equals_batch(self, spark, events):
        stream = streaming.read_event_stream(f"{SF_DIR}/events.parquet", spark=spark)
        result = streaming.run_available_now(
            streaming.windowed_rollup(stream, "1 hour", "2 hours")
        )
        batch = (
            events.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
                F.round(F.avg("value"), 6).alias("avg_value"),
            )
        )
        got = {tuple(r) for r in result.collect()}
        want = {tuple(r) for r in batch.collect()}
        assert got == want

    def test_watermark_column_present(self, spark):
        stream = streaming.read_event_stream(f"{SF_DIR}/events.parquet", spark=spark)
        rollup = streaming.windowed_rollup(stream)
        assert set(rollup.columns) == {"window_start", "event_type", "n_events", "sum_value", "avg_value"}
        assert rollup.isStreaming

    def test_watermark_drops_late_data_across_restarts(self, spark, tmp_prefix):
        # run 1 commits watermark 11:45 to the checkpoint; run 2 (same
        # checkpoint) then delivers a stale 00:30 event, which must be
        # DROPPED — the persisted watermark bounds state across
        # restarts and never resurrects a closed window. (Within one
        # availableNow run the filtering watermark does not advance
        # between micro-batches, so the drop guarantee is a
        # restart-boundary property — also the operational reality.)
        import datetime as dt

        src = f"{tmp_prefix}/late_src"
        sink = f"{tmp_prefix}/late_sink"
        ckpt = f"{tmp_prefix}/late_ckpt"
        schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

        def write_file(name, rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
                f"{src}/{name}"
            )

        def run_once():
            stream = (
                spark.readStream.schema(schema)
                .option("recursiveFileLookup", "true")
                .parquet(src)
            )
            windows = (
                stream.withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 hour"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.date_format("window.start", "HH:mm").alias("w"), "n")
            )
            q = (
                windows.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        base = dt.datetime(2024, 1, 1)
        write_file("f1", [
            (1, base.replace(hour=10, minute=15), 1, "click", 1.0),
            (2, base.replace(hour=12, minute=45), 1, "click", 1.0),
        ])
        run_once()
        write_file("f2", [(3, base.replace(hour=0, minute=30), 1, "click", 1.0)])
        run_once()
        got = {(r["w"], r["n"]) for r in spark.read.parquet(sink).collect()}
        # 10:00 closed when the watermark hit 11:45 and emitted; the
        # stale 00:00 window must never appear; 12:00 is still open
        assert ("10:00", 1) in got
        assert not any(w == "00:00" for w, _ in got)
        assert not any(w == "12:00" for w, _ in got)


class TestStreamingDedup:
    def test_duplicate_events_emitted_once(self, spark, events, tmp_prefix):
        from aws_data_wrangler_spark import s3

        # duplicate the whole backlog: every event_id appears twice
        doubled = events.unionByName(events)
        s3.to_parquet(doubled, f"{tmp_prefix}/dups", dataset=True, mode="overwrite")
        stream = streaming.read_event_stream(f"{tmp_prefix}/dups", spark=spark)
        deduped = streaming.dedup_stream(stream, key_cols=["event_id"])
        query = (
            deduped.writeStream.format("memory")
            .queryName("sg_dedup_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
        out = spark.table("sg_dedup_stream")
        assert out.count() == events.count()
        assert out.select("event_id").distinct().count() == events.count()

    def test_streaming_ingest_curation_pipeline(self, spark, documents, tmp_prefix):
        """Ingest-stage curation composes in streaming: HTML strip +
        quality gate are pure projections (streaming-safe by
        construction), fingerprint dedup bounds state — the whole
        WET-file-style ingest path in one availableNow micro-batch
        pipeline, equal to its batch twin."""
        from aws_data_wrangler_spark import s3
        from aws_data_wrangler_spark.operators import text

        # wrap every document in markup noise and double the backlog
        html = F.concat(
            F.lit("<html><head><script>var x=1;</script></head><body><p>"),
            F.col("text"),
            F.lit("</p><!-- footer --></body></html>"),
        )
        raw = documents.withColumn("text", html)
        s3.to_parquet(
            raw.unionByName(raw), f"{tmp_prefix}/wet", dataset=True, mode="overwrite"
        )

        def curate(df):
            cleaned = text.with_gopher_flags(
                text.strip_html(df), text_col="clean_text"
            )
            return (
                cleaned.filter(F.col("gopher_keep"))
                .withColumn("fingerprint", F.md5(F.col("clean_text")))
                # ingest timestamp for the dedup watermark (documents
                # carry none; a real WET ingest uses the fetch time)
                .withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
            )

        stream = streaming.read_event_stream(f"{tmp_prefix}/wet", spark=spark)
        out = streaming.run_available_now(
            streaming.dedup_stream(curate(stream), key_cols=["fingerprint"]).select(
                "doc_id", "fingerprint"
            ),
            output_mode="append",
        )
        batch = curate(raw).select("fingerprint").distinct()
        assert out.count() == batch.count() > 0
        assert {r["fingerprint"] for r in out.collect()} == {
            r["fingerprint"] for r in batch.collect()
        }
        # the strip actually removed the markup: no fingerprint of the
        # raw HTML text survives
        raw_fps = {r["f"] for r in raw.select(F.md5("text").alias("f")).collect()}
        assert not ({r["fingerprint"] for r in out.collect()} & raw_fps)

    def test_stream_dedup_against_static_corpus(self, spark, events, tmp_prefix):
        from aws_data_wrangler_spark import s3

        # corpus already holds the 'click' fingerprints; the stream
        # must emit only fingerprints the corpus has never seen, each
        # once (within-stream dedup)
        fingerprint = F.md5(F.concat_ws("|", F.col("event_type"), F.col("props")))
        s3.to_parquet(events, f"{tmp_prefix}/ingest", dataset=True, mode="overwrite")
        corpus_keys = events.filter(F.col("event_type") == "click").select(
            fingerprint.alias("fingerprint")
        )
        stream = streaming.read_event_stream(
            f"{tmp_prefix}/ingest", spark=spark
        ).withColumn("fingerprint", fingerprint)
        fresh = streaming.dedup_stream_against_corpus(stream, corpus_keys)
        out = streaming.run_available_now(
            fresh.select("fingerprint"), output_mode="append"
        )
        got = {r["fingerprint"] for r in out.collect()}
        expected = {
            r["f"]
            for r in events.filter(F.col("event_type") != "click")
            .select(fingerprint.alias("f"))
            .distinct()
            .collect()
        }
        # no corpus-known fingerprint leaks through; every novel one
        # arrives exactly once
        assert got == expected
        assert out.count() == len(got)


class TestStatefulSessionize:
    def test_sessions_via_stateful_operator(self, spark):
        stream = streaming.read_event_stream(f"{SF_DIR}/events.parquet", spark=spark)
        sessions = streaming.sessionize_stateful(stream, gap_seconds=1800.0)
        # a ProcessingTimeTimeout query schedules timeout-check batches
        # forever, so processAllAvailable/availableNow never settle —
        # poll progress until the data batch has been processed, then stop
        import time

        query = (
            sessions.writeStream.format("memory")
            .queryName("sg_sessions_test")
            .outputMode("append")
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            progress = query.lastProgress
            if progress and progress["batchId"] >= 1:
                break
            time.sleep(2)
        query.stop()
        out = spark.table("sg_sessions_test")
        # single-batch append emits only *closed* sessions (open ones wait
        # on the timeout); every emitted session must respect the gap
        rows = out.collect()
        for row in rows:
            assert row["session_end"] >= row["session_start"]
            assert row["n_events"] >= 1
        # closed sessions exist for this dataset (multi-session users)
        assert len(rows) > 0


def test_interval_join_stream_equals_batch(spark):
    """Stream-stream bucketed interval join replayed availableNow equals
    the batch interval join on the same data."""
    from aws_data_wrangler_spark import streaming
    from aws_data_wrangler_spark.operators import joins
    from aws_data_wrangler_spark.plans.queries import load

    sf = "/root/testdata/sf0.001"
    events = load(spark, sf, "events")
    errors_b = events.filter(F.col("event_type") == "error").select("event_id", "ts")
    clicks_b = events.filter(F.col("event_type") == "click").select("event_id", "ts")
    batch = joins.interval_join_bucketed(errors_b, clicks_b, "ts", "ts", window_seconds=3600.0)
    expected = {(r["l_event_id"], r["r_event_id"]) for r in batch.collect()}

    errors_s = streaming.read_event_stream(f"{sf}/events.parquet", spark=spark).filter(
        F.col("event_type") == "error"
    ).select("event_id", "ts")
    clicks_s = streaming.read_event_stream(f"{sf}/events.parquet", spark=spark).filter(
        F.col("event_type") == "click"
    ).select("event_id", "ts")
    out = streaming.run_available_now(
        streaming.interval_join_stream(errors_s, clicks_s, window_seconds=3600.0),
        output_mode="append",
    )
    got = {(r["l_event_id"], r["r_event_id"]) for r in out.collect()}
    assert got == expected
    assert len(got) > 0


class TestQuantileSketchSink:
    def test_streamed_sketch_state_equals_batch_sketches(self, spark, events, tmp_prefix):
        # two files → maxFilesPerTrigger=1 forces two micro-batches;
        # the streamed sketch table must merge to the SAME grid, bit
        # for bit, as batch sketches over the same row partition —
        # per-batch grids are exact order statistics and the union is
        # integer-threshold arithmetic, so equality is exact, not ±eps
        from aws_data_wrangler_spark import streaming
        from aws_data_wrangler_spark.operators import profiling

        median = events.selectExpr("percentile(unix_micros(ts), 0.5) p").first()["p"]
        early = events.filter(F.unix_micros("ts") <= median).coalesce(1)
        late = events.filter(F.unix_micros("ts") > median).coalesce(1)
        src = f"{tmp_prefix}/qsketch_src"
        early.write.mode("overwrite").parquet(src)
        late.write.mode("append").parquet(src)

        stream = streaming.read_event_stream(
            src, spark=spark, maxFilesPerTrigger="1"
        ).select("value")
        state = f"{tmp_prefix}/qsketch_state"
        sketches = streaming.quantile_sketch_sink(
            stream, ["value"], state, bins=32
        )
        rows = sketches.collect()
        assert len(rows) == 2 and {r["column"] for r in rows} == {"value"}
        streamed = profiling.quantile_union(sketches).collect()[0]
        # batch twin over the same two row groups
        batch = profiling.quantile_union(
            profiling.quantile_sketches(
                events.withColumn(
                    "b", (F.unix_micros("ts") <= median).cast("int")
                ),
                ["value"],
                batch_col="b",
                bins=32,
            )
        ).collect()[0]
        assert streamed["n"] == batch["n"] == events.filter("value is not null").count()
        assert list(streamed["grid"]) == list(batch["grid"])
        # the estimate answers the corpus-lifetime question within the
        # rank envelope of the exact quantile
        est = profiling.quantile_estimates(sketches, [0.9]).collect()[0]["est"]
        xs = sorted(r["value"] for r in events.select("value").collect()
                    if r["value"] is not None)
        import math

        n = len(xs)
        eps = 2.0 / 32
        lo = xs[max(int(math.floor((0.9 - eps) * (n - 1))), 0)]
        hi = xs[min(int(math.ceil((0.9 + eps) * (n - 1))), n - 1)]
        assert lo <= est <= hi


class TestHllSketchSink:
    def test_streamed_ndv_state_matches_batch_sketches(self, spark, events, tmp_prefix):
        # two micro-batches of HLL state must union to the same
        # estimates as the single-pass batch sketch (exact-mode NDV at
        # this scale) with n_rows summing exactly across batches
        from aws_data_wrangler_spark import streaming
        from aws_data_wrangler_spark.operators import profiling

        median = events.selectExpr("percentile(unix_micros(ts), 0.5) p").first()["p"]
        early = events.filter(F.unix_micros("ts") <= median).coalesce(1)
        late = events.filter(F.unix_micros("ts") > median).coalesce(1)
        src = f"{tmp_prefix}/hll_src"
        early.write.mode("overwrite").parquet(src)
        late.write.mode("append").parquet(src)

        stream = streaming.read_event_stream(
            src, spark=spark, maxFilesPerTrigger="1"
        ).select("user_id", "event_type")
        state = f"{tmp_prefix}/hll_state"
        sketches = streaming.hll_sketch_sink(
            stream, ["user_id", "event_type"], state
        )
        assert sketches.count() == 2  # one state row per micro-batch
        streamed = {
            r["column"]: r
            for r in profiling.hll_estimates(sketches).collect()
        }
        single = {
            r["column"]: r
            for r in profiling.hll_estimates(
                profiling.hll_column_sketches(events, ["user_id", "event_type"])
            ).collect()
        }
        n = events.count()
        for col in ("user_id", "event_type"):
            assert streamed[col]["n_rows"] == n  # per-batch counts sum exactly
            # the merged-vs-single 2% invariant (exact equality holds
            # in the exact-mode regime but breaks past representation
            # promotion — the profiling_hll_invariants contract — so
            # the assertion must survive a larger SF_DIR fixture)
            s = single[col]["n_distinct_est"]
            assert abs(streamed[col]["n_distinct_est"] - s) <= max(0.02 * s, 1)
        # tiny cardinalities stay exact in HLL
        assert streamed["event_type"]["n_distinct_est"] == events.select(
            "event_type"
        ).distinct().count()


class TestCmsSketchSink:
    def test_streamed_counters_equal_batch_table_bit_for_bit(self, spark, events, tmp_prefix):
        # two micro-batches of Count-Min state must union to the
        # IDENTICAL counter table as the single-pass batch sketch —
        # integer cell sums commute, the strongest determinism class
        # in the sketch-sink family — and point queries answered from
        # state alone must equal the exact per-key counts in the
        # no-collision regime (5 keys, width 1024)
        from aws_data_wrangler_spark import streaming
        from aws_data_wrangler_spark.operators import profiling

        median = events.selectExpr("percentile(unix_micros(ts), 0.5) p").first()["p"]
        early = events.filter(F.unix_micros("ts") <= median).coalesce(1)
        late = events.filter(F.unix_micros("ts") > median).coalesce(1)
        src = f"{tmp_prefix}/cms_src"
        early.write.mode("overwrite").parquet(src)
        late.write.mode("append").parquet(src)

        stream = streaming.read_event_stream(
            src, spark=spark, maxFilesPerTrigger="1"
        ).select("event_type")
        state = f"{tmp_prefix}/cms_state"
        sketches = streaming.cms_sketch_sink(stream, "event_type", state)
        assert sketches.select("batch").distinct().count() == 2
        key = lambda r: (r["row_i"], r["bucket"], r["cnt"])
        streamed = sorted(map(key, profiling.cms_union(sketches).collect()))
        batch = sorted(
            map(key, profiling.cms_union(
                profiling.cms_sketches(events, "event_type")
            ).collect())
        )
        assert streamed == batch
        true = {
            r["event_type"]: r["c"]
            for r in events.groupBy("event_type").agg(F.count("*").alias("c")).collect()
        }
        est = {
            r["value"]: r["cms_est"]
            for r in profiling.cms_estimates(
                sketches, events.select("event_type"), "event_type"
            ).collect()
        }
        assert est == true  # exact in the no-collision regime


class TestKmvSketchSink:
    def test_streamed_kmv_state_merges_bit_identical_to_batch(self, spark, events, tmp_prefix):
        # two micro-batches of KMV state must union to the IDENTICAL
        # mins array as the single-pass batch sketch (the k smallest
        # overall hashes each survive their own batch's k-min — a pure
        # set minimum, the Count-Min determinism class), with n_rows
        # summing exactly; estimates answered from state alone are
        # exact in the under-full regime
        from aws_data_wrangler_spark import streaming
        from aws_data_wrangler_spark.operators import profiling

        median = events.selectExpr("percentile(unix_micros(ts), 0.5) p").first()["p"]
        early = events.filter(F.unix_micros("ts") <= median).coalesce(1)
        late = events.filter(F.unix_micros("ts") > median).coalesce(1)
        src = f"{tmp_prefix}/kmv_src"
        early.write.mode("overwrite").parquet(src)
        late.write.mode("append").parquet(src)

        stream = streaming.read_event_stream(
            src, spark=spark, maxFilesPerTrigger="1"
        ).select("user_id")
        state = f"{tmp_prefix}/kmv_state"
        sketches = streaming.kmv_sketch_sink(stream, ["user_id"], state, k=64)
        assert sketches.select("batch").distinct().count() == 2
        streamed = profiling.kmv_union(sketches).collect()[0]
        batch = profiling.kmv_sketches(events, ["user_id"], k=64).collect()[0]
        assert list(streamed["mins"]) == list(batch["mins"])
        assert streamed["n_rows"] == batch["n_rows"] == events.count()
        est = profiling.kmv_estimates(sketches).collect()[0]
        exact = events.select("user_id").distinct().count()
        if exact < 64:  # under-full: the sketch IS the distinct set
            assert est["n_distinct_est"] == exact


class TestUpsertSink:
    def test_multi_batch_merge_equals_argmax(self, spark, events, tmp_prefix):
        from aws_data_wrangler_spark import s3, streaming

        # two files split by time → maxFilesPerTrigger=1 forces two
        # micro-batches, so the second merge must read snapshot v=0
        median = events.selectExpr("percentile(unix_micros(ts), 0.5) p").first()["p"]
        early = events.filter(F.unix_micros("ts") <= median).coalesce(1)
        late = events.filter(F.unix_micros("ts") > median).coalesce(1)
        src = f"{tmp_prefix}/upsert_src"
        early.write.mode("overwrite").parquet(src)
        late.write.mode("append").parquet(src)

        stream = streaming.read_event_stream(src, spark=spark, maxFilesPerTrigger="1")
        target = f"{tmp_prefix}/latest"
        final = streaming.upsert_sink(
            stream, target, key_cols=["user_id"], order_col="ts",
            tiebreak_cols=["event_id"],
        )

        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
        want = (
            events.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
        )
        got = {tuple(r) for r in final.select("user_id", "event_id").collect()}
        expect = {tuple(r) for r in want.select("user_id", "event_id").collect()}
        assert got == expect

        # snapshot-per-batch: versions v=0..N committed, reader sees max
        versions = streaming._latest_snapshot_version(target, spark)
        assert versions >= 1  # at least two snapshots (two batches)
        assert streaming.read_upsert_table(target, spark).count() == len(expect)

        # time travel: v=0 holds only the first batch's keys
        v0 = streaming.read_upsert_table(target, spark, version=0)
        assert v0.count() <= len(expect)

        # retention: vacuum to 1 snapshot; latest survives, v=0 gone
        removed = streaming.vacuum_upsert_table(target, keep_versions=1, spark=spark)
        assert removed == versions  # v=0..N-1 dropped
        assert streaming.read_upsert_table(target, spark).count() == len(expect)
        assert streaming.read_upsert_table(target, spark, version=0) is None

    def test_empty_target_reader_returns_none(self, spark, tmp_prefix):
        from aws_data_wrangler_spark import streaming

        assert streaming.read_upsert_table(f"{tmp_prefix}/nope", spark) is None

    def test_merge_batch_retry_is_exactly_once(self, spark, tmp_prefix):
        # a retried micro-batch (same batch id, e.g. failure between
        # snapshot write and checkpoint commit) must not write a new
        # version; the next batch id must
        from aws_data_wrangler_spark import streaming

        target = f"{tmp_prefix}/retry"
        batch = spark.createDataFrame([(1, 10, 100), (2, 20, 200)], "k long, ts long, v long")
        streaming.merge_upsert_batch(batch, 0, target, ["k"], ["ts"])
        assert streaming._latest_snapshot_version(target, spark) == 0
        streaming.merge_upsert_batch(batch, 0, target, ["k"], ["ts"])  # retry
        assert streaming._latest_snapshot_version(target, spark) == 0
        later = spark.createDataFrame([(1, 99, 999)], "k long, ts long, v long")
        streaming.merge_upsert_batch(later, 1, target, ["k"], ["ts"])
        assert streaming._latest_snapshot_version(target, spark) == 1
        rows = {
            (r["k"], r["v"]) for r in streaming.read_upsert_table(target, spark).collect()
        }
        assert rows == {(1, 999), (2, 200)}


class TestGrowingCorpusDedup:
    def test_cross_batch_first_occurrence_only(self, spark, events, tmp_prefix):
        # two micro-batches with overlapping fingerprints: a key seen in
        # batch 0 must NOT be re-emitted by batch 1, and the corpus key
        # table must grow to the union of accepted keys
        from aws_data_wrangler_spark import streaming

        keyed = events.withColumn(
            "fingerprint", F.md5(F.concat_ws("|", "event_type", "user_id"))
        )
        median = keyed.selectExpr("percentile(unix_micros(ts), 0.5) p").first()["p"]
        early = keyed.filter(F.unix_micros("ts") <= median).coalesce(1)
        late = keyed.filter(F.unix_micros("ts") > median).coalesce(1)
        src = f"{tmp_prefix}/grow_src"
        early.write.mode("overwrite").parquet(src)
        late.write.mode("append").parquet(src)

        stream = streaming.read_event_stream(src, spark=spark, maxFilesPerTrigger="1")
        stream = stream.withColumn(
            "fingerprint", F.md5(F.concat_ws("|", "event_type", "user_id"))
        )
        target = f"{tmp_prefix}/growing"
        accepted = streaming.dedup_growing_corpus_sink(
            stream, target, key_cols=["fingerprint"]
        )
        rows = accepted.select("fingerprint").collect()
        fps = [r["fingerprint"] for r in rows]
        # exactly one accepted row per distinct key, across ALL batches
        assert len(fps) == len(set(fps))
        assert set(fps) == {
            r["fingerprint"] for r in keyed.select("fingerprint").distinct().collect()
        }
        # corpus key table holds the union
        corpus = streaming.read_upsert_table(f"{target}/corpus_keys", spark=spark)
        assert {r["fingerprint"] for r in corpus.collect()} == set(fps)

    def test_seed_corpus_suppresses_known_keys(self, spark, events, tmp_prefix):
        from aws_data_wrangler_spark import streaming

        keyed = events.withColumn(
            "fingerprint", F.md5(F.concat_ws("|", "event_type", "user_id"))
        )
        seed = keyed.select("fingerprint").distinct().limit(20)
        seed_keys = {r["fingerprint"] for r in seed.collect()}
        src = f"{tmp_prefix}/seed_src"
        keyed.coalesce(1).write.mode("overwrite").parquet(src)
        stream = streaming.read_event_stream(src, spark=spark).withColumn(
            "fingerprint", F.md5(F.concat_ws("|", "event_type", "user_id"))
        )
        target = f"{tmp_prefix}/seeded"
        accepted = streaming.dedup_growing_corpus_sink(
            stream, target, key_cols=["fingerprint"], seed_corpus_keys=seed
        )
        got = {r["fingerprint"] for r in accepted.select("fingerprint").collect()}
        assert got.isdisjoint(seed_keys)
        all_keys = {r["fingerprint"] for r in keyed.select("fingerprint").distinct().collect()}
        assert got == all_keys - seed_keys

    def test_replayed_batch_id_is_skipped(self, spark, tmp_prefix):
        # retry semantics: re-running an already-committed batch id must
        # neither re-land rows nor grow the corpus
        from aws_data_wrangler_spark import streaming

        batch = spark.createDataFrame(
            [(1, "a"), (2, "b"), (2, "b")], "id long, fingerprint string"
        )
        corpus = f"{tmp_prefix}/retry/corpus_keys"
        out = f"{tmp_prefix}/retry/accepted"
        streaming.dedup_growing_corpus_batch(batch, 0, corpus, out, ["fingerprint"])
        first = spark.read.parquet(out).count()
        assert first == 2  # intra-batch dup collapsed
        streaming.dedup_growing_corpus_batch(batch, 0, corpus, out, ["fingerprint"])
        assert spark.read.parquet(out).count() == 2
        assert streaming._latest_snapshot_version(corpus, spark) == 0
        # a NEW batch with one overlapping + one fresh key
        nxt = spark.createDataFrame([(3, "b"), (4, "c")], "id long, fingerprint string")
        streaming.dedup_growing_corpus_batch(nxt, 1, corpus, out, ["fingerprint"])
        accepted = spark.read.parquet(out)
        assert {r["fingerprint"] for r in accepted.collect()} == {"a", "b", "c"}
        assert accepted.count() == 3
        keys = streaming.read_upsert_table(corpus, spark=spark)
        assert {r["fingerprint"] for r in keys.collect()} == {"a", "b", "c"}


class TestIndexIngestSink:
    def _seeds(self, embeddings, n=8):
        from pyspark.sql import Window as W

        return (
            embeddings.orderBy("vec_id").limit(n)
            .withColumn("cid", F.row_number().over(W.orderBy("vec_id")) - 1)
            .select("cid", F.col("embedding").alias("cvec"))
        )

    def test_ingested_index_equals_batch_build(self, spark, embeddings, tmp_prefix):
        from aws_data_wrangler_spark.operators import similarity

        seeds = self._seeds(embeddings)
        streamed = f"{tmp_prefix}/ivf_streamed"
        batch = f"{tmp_prefix}/ivf_batch"
        stream = streaming.read_event_stream(f"{SF_DIR}/embeddings.parquet", spark=spark)
        streaming.index_ingest_sink(stream, seeds, streamed, metric="cosine")
        similarity.build_partitioned_ivf(embeddings, seeds, batch, metric="cosine")
        got = sorted(
            map(tuple, spark.read.parquet(streamed).select("vec_id", "cid", "vnorm").collect())
        )
        want = sorted(
            map(tuple, spark.read.parquet(batch).select("vec_id", "cid", "vnorm").collect())
        )
        assert got == want
        # and the grown index is searchable with pruning, matching ivf_topk
        queries = embeddings.filter("vec_id < 5")
        out = similarity.ivf_partitioned_topk(
            spark, streamed, queries, seeds, k=5, nprobe=4, metric="cosine"
        )
        ref = similarity.ivf_topk(
            embeddings, queries, k=5, nprobe=4, centroids=seeds, metric="cosine"
        )
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))

    def test_ingest_carries_metadata_cols_for_filtered_search(
        self, spark, embeddings, tmp_prefix
    ):
        # the byte-compatible-rows contract extends to metadata: a
        # filtered index built with metadata_cols must be ingested with
        # the SAME list, and streamed rows then answer where= searches
        from aws_data_wrangler_spark.operators import similarity

        seeds = self._seeds(embeddings)
        index = f"{tmp_prefix}/ivf_meta_grow"
        similarity.build_partitioned_ivf(
            embeddings.filter("vec_id % 2 = 0"), seeds, index,
            metric="cosine", metadata_cols=["label"],
        )
        stream = streaming.read_event_stream(
            f"{SF_DIR}/embeddings.parquet", spark=spark
        ).filter("vec_id % 2 = 1")
        streaming.index_ingest_sink(
            stream, seeds, index, metric="cosine", metadata_cols=["label"]
        )
        queries = embeddings.filter("vec_id < 5")
        out = similarity.ivf_partitioned_topk(
            spark, index, queries, seeds, k=5, nprobe=4, metric="cosine",
            where="label < 4",
        )
        ref = similarity.ivf_topk(
            embeddings.filter("label < 4"), queries, k=5, nprobe=4,
            centroids=seeds, metric="cosine",
        )
        got = sorted(map(tuple, out.collect()))
        assert got == sorted(map(tuple, ref.collect()))
        # streamed (odd-id) rows really are reachable through the filter
        assert any(r[1] % 2 == 1 for r in got)

    def test_replay_with_same_checkpoint_is_idempotent(self, spark, embeddings, tmp_prefix):
        seeds = self._seeds(embeddings)
        index = f"{tmp_prefix}/ivf_idem"
        stream = streaming.read_event_stream(f"{SF_DIR}/embeddings.parquet", spark=spark)
        streaming.index_ingest_sink(stream, seeds, index, metric="cosine")
        n1 = spark.read.parquet(index).count()
        # same checkpoint, same backlog: the committed batch must NOT
        # be re-appended
        stream2 = streaming.read_event_stream(f"{SF_DIR}/embeddings.parquet", spark=spark)
        streaming.index_ingest_sink(stream2, seeds, index, metric="cosine")
        n2 = spark.read.parquet(index).count()
        assert n1 == n2 == embeddings.count()

    def test_pq_ingest_grows_the_serving_index(self, spark, embeddings, tmp_prefix):
        # build the compressed serving index on the even half, then
        # stream-ingest the odd half using the sidecar codebooks: the
        # grown index must search value-identical to the full-corpus
        # ivfpq_topk with the same artifacts
        from pyspark.sql import Window as W

        from aws_data_wrangler_spark.operators import similarity

        seeds = (
            embeddings.orderBy("vec_id").limit(16)
            .withColumn("cid", F.row_number().over(W.orderBy("vec_id")) - 1)
            .select("cid", F.col("embedding").alias("cvec"))
        )
        index = f"{tmp_prefix}/ivfpq_grow"
        even = embeddings.filter("vec_id % 2 = 0")
        books = similarity.build_partitioned_ivfpq(
            even, seeds, index, m=8, num_codes=16, iterations=0
        )
        stream = streaming.read_event_stream(
            f"{SF_DIR}/embeddings.parquet", spark=spark
        ).filter("vec_id % 2 = 1")
        sidecar = similarity.load_pq_codebooks(f"{index}/_codebooks.json")
        assert sidecar == books
        streaming.index_ingest_sink(stream, seeds, index, pq_codebooks=sidecar)
        queries = embeddings.filter("vec_id < 5")
        out = similarity.ivfpq_partitioned_topk(
            spark, index, queries, seeds, books, k=5, nprobe=4, rescore_factor=4
        )
        ref = similarity.ivfpq_topk(
            embeddings, queries, k=5, nprobe=4, num_centroids=16, m=8,
            num_codes=16, rescore_factor=4, centroids=seeds, codebooks=books,
        )
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))

    def test_compaction_restores_file_bound_and_results(self, spark, embeddings, tmp_prefix):
        # fragment an index across two ingest batches, compact, and
        # verify the bound + identical search results + sidecar carry
        import glob

        from pyspark.sql import Window as W

        from aws_data_wrangler_spark.operators import similarity

        seeds = (
            embeddings.orderBy("vec_id").limit(8)
            .withColumn("cid", F.row_number().over(W.orderBy("vec_id")) - 1)
            .select("cid", F.col("embedding").alias("cvec"))
        )
        index = f"{tmp_prefix}/ivfpq_frag"
        books = similarity.build_partitioned_ivfpq(
            embeddings.filter("vec_id % 2 = 0"), seeds, index,
            m=8, num_codes=16, iterations=0,
        )
        stream = streaming.read_event_stream(
            f"{SF_DIR}/embeddings.parquet", spark=spark
        ).filter("vec_id % 2 = 1")
        streaming.index_ingest_sink(stream, seeds, index, pq_codebooks=books)
        compacted = f"{tmp_prefix}/ivfpq_compact"
        similarity.compact_partitioned_index(spark, index, compacted)
        n_cells = len(glob.glob(f"{compacted}/cid=*"))
        assert len(glob.glob(f"{compacted}/cid=*/*.parquet")) <= n_cells
        assert similarity.load_pq_codebooks(f"{compacted}/_codebooks.json") == books
        queries = embeddings.filter("vec_id < 5")
        before = similarity.ivfpq_partitioned_topk(
            spark, index, queries, seeds, books, k=5, nprobe=4
        )
        after = similarity.ivfpq_partitioned_topk(
            spark, compacted, queries, seeds, k=5, nprobe=4
        )
        assert sorted(map(tuple, before.collect())) == sorted(map(tuple, after.collect()))


class TestAnomalyMonitor:
    def test_stream_scoring_equals_batch_scorer(self, spark):
        # offline-trained centers + streamed counts must equal the
        # batch score_anomalies over the same buckets (the scorer and
        # the count expressions are literally shared)
        from pyspark.sql import functions as F

        from aws_data_wrangler_spark import streaming
        from aws_data_wrangler_spark.operators import timeseries
        from aws_data_wrangler_spark.plans.queries import load

        events = load(spark, SF_DIR, "events")
        centers = timeseries.robust_centers(events.filter(F.col("event_id") % 2 == 0))
        stream = streaming.read_event_stream(
            f"{SF_DIR}/events.parquet", spark=spark
        ).filter(F.col("event_id") % 2 == 1)
        got = streaming.anomaly_monitor(stream, centers, threshold=0.0)
        batch_counts = timeseries.bucket_counts(
            events.filter(F.col("event_id") % 2 == 1)
        )
        want = timeseries.score_anomalies(batch_counts, centers, threshold=0.0)
        k = lambda r: (r["event_type"], str(r["bucket_ts"]))
        assert sorted(map(tuple, got.collect()), key=str) == sorted(
            map(tuple, want.collect()), key=str
        )
        # self-trained composition unchanged: mad_anomalies ==
        # robust_centers + score_anomalies over its own counts
        own = timeseries.mad_anomalies(events, threshold=3.5)
        composed = timeseries.score_anomalies(
            timeseries.bucket_counts(events),
            timeseries.robust_centers(events),
            threshold=3.5,
        )
        assert sorted(map(tuple, own.collect()), key=str) == sorted(
            map(tuple, composed.collect()), key=str
        )

    def test_seasonal_mismatch_raises_instead_of_empty_join(self, spark):
        # centers trained with one seasonal mode scored with another
        # would silently drop every bucket at the (key, __season) join
        # — the monitor validates the centers' __season domain up front
        import pytest
        from pyspark.sql import functions as F

        from aws_data_wrangler_spark import streaming
        from aws_data_wrangler_spark.operators import timeseries
        from aws_data_wrangler_spark.plans.queries import load

        events = load(spark, SF_DIR, "events")
        stream = streaming.read_event_stream(f"{SF_DIR}/events.parquet", spark=spark)
        flat = timeseries.robust_centers(events)  # seasonal=None
        hourly = timeseries.robust_centers(events, seasonal="hour_of_day")
        daily = timeseries.robust_centers(events, seasonal="day_of_week")
        # robust_centers stamps its mode — every cross-seasonal pairing
        # is caught, including day_of_week-vs-hour_of_day, whose
        # __season domain ({1..7}) is indistinguishable by values alone
        with pytest.raises(ValueError, match="seasonal=None"):
            streaming.anomaly_monitor(stream, hourly)
        with pytest.raises(ValueError, match="trained with seasonal mode"):
            streaming.anomaly_monitor(stream, flat, seasonal="hour_of_day")
        with pytest.raises(ValueError, match="trained with seasonal mode"):
            streaming.anomaly_monitor(stream, daily, seasonal="hour_of_day")
        with pytest.raises(ValueError, match="trained with seasonal mode"):
            streaming.anomaly_monitor(stream, hourly, seasonal="day_of_week")
        with pytest.raises(ValueError, match="__season column"):
            streaming.anomaly_monitor(stream, flat.drop("__season"), seasonal=None)
        # UNstamped user-built centers fall back to domain heuristics
        with pytest.raises(ValueError, match="seasonal=None"):
            streaming.anomaly_monitor(stream, hourly.drop("__season_mode"))
        with pytest.raises(ValueError, match="trained with seasonal=None"):
            streaming.anomaly_monitor(
                stream, flat.drop("__season_mode"), seasonal="hour_of_day"
            )
        with pytest.raises(ValueError, match="outside"):
            streaming.anomaly_monitor(
                stream, hourly.drop("__season_mode"), seasonal="day_of_week"
            )

    def test_ewma_monitor_equals_batch_smoother(self, spark):
        # availableNow replay through the complete-mode counts must
        # equal the batch ewma over the same rows — the fold is
        # literally shared (ewma_from_counts)
        from pyspark.sql import functions as F

        from aws_data_wrangler_spark import streaming
        from aws_data_wrangler_spark.operators import timeseries
        from aws_data_wrangler_spark.plans.queries import load

        events = load(spark, SF_DIR, "events")
        stream = streaming.read_event_stream(
            f"{SF_DIR}/events.parquet", spark=spark
        ).filter(F.col("event_id") % 2 == 1)
        got = streaming.ewma_monitor(stream, alpha=0.25)
        want = timeseries.ewma(events.filter(F.col("event_id") % 2 == 1), alpha=0.25)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        # the monitor-family contract: no pinned memory-sink view left
        assert not [
            t.name for t in spark.catalog.listTables() if t.name.startswith("sg_ewma_")
        ]

    def test_holt_winters_monitor_equals_batch_smoother(self, spark):
        # availableNow replay through the complete-mode counts must
        # equal the batch holt_winters over the same rows — the spine
        # (dense_counts) AND the fold (holt_winters_from_counts) are
        # literally shared, so even the zero-filled gap buckets line up
        from pyspark.sql import functions as F

        from aws_data_wrangler_spark import streaming
        from aws_data_wrangler_spark.operators import timeseries
        from aws_data_wrangler_spark.plans.queries import load

        events = load(spark, SF_DIR, "events")
        stream = streaming.read_event_stream(
            f"{SF_DIR}/events.parquet", spark=spark
        ).filter(F.col("event_id") % 2 == 1)
        got = streaming.holt_winters_monitor(stream, period=6)
        want = timeseries.holt_winters(
            events.filter(F.col("event_id") % 2 == 1), period=6
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        assert not [
            t.name for t in spark.catalog.listTables() if t.name.startswith("sg_hw_")
        ]

    def test_monitors_drop_their_memory_sink_tables(self, spark):
        # repeated monitor calls in a long-lived session must not
        # accumulate complete-mode memory-sink tables: the counts are
        # materialized and the temp view dropped before returning
        from pyspark.sql import functions as F

        from aws_data_wrangler_spark import streaming
        from aws_data_wrangler_spark.operators import timeseries
        from aws_data_wrangler_spark.plans.queries import load

        events = load(spark, SF_DIR, "events")
        centers = timeseries.robust_centers(events.filter(F.col("event_id") % 2 == 0))
        base = events.filter(F.col("event_id") % 2 == 0)

        def monitor_views():
            return [
                t.name for t in spark.catalog.listTables()
                if t.name.startswith(("sg_drift_", "sg_anomaly_"))
            ]

        before = monitor_views()
        stream = streaming.read_event_stream(
            f"{SF_DIR}/events.parquet", spark=spark
        ).filter(F.col("event_id") % 2 == 1)
        flagged = streaming.anomaly_monitor(stream, centers, threshold=0.0)
        drift = streaming.drift_monitor(
            streaming.read_event_stream(f"{SF_DIR}/events.parquet", spark=spark),
            base, "event_type",
        )
        assert monitor_views() == before
        # the returned frames survive the drop (materialized, not a
        # view over the vanished sink) — collect() must not raise
        # TABLE_OR_VIEW_NOT_FOUND
        flagged.collect()
        assert drift.count() > 0


class TestDriftMonitor:
    def test_stream_drift_equals_batch_profiler(self, spark):
        # availableNow replay of the current half as a stream must
        # reproduce the batch PSI profile term-for-term (the bucketing
        # and psi expressions are literally shared)
        from pyspark.sql import functions as F

        from aws_data_wrangler_spark import streaming
        from aws_data_wrangler_spark.operators import profiling
        from aws_data_wrangler_spark.plans.queries import load

        events = load(spark, SF_DIR, "events")
        base = events.filter(F.col("event_id") % 2 == 0)
        cur_batch = events.filter(F.col("event_id") % 2 == 1)
        stream = streaming.read_event_stream(
            f"{SF_DIR}/events.parquet", spark=spark
        ).filter(F.col("event_id") % 2 == 1)
        got = streaming.drift_monitor(stream, base, "event_type")
        want = profiling.distribution_drift(base, cur_batch, "event_type")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        # the numeric-edges path streams identically (bounded buckets)
        edges = [0.0, 10.0, 50.0]
        got_n = streaming.drift_monitor(
            streaming.read_event_stream(f"{SF_DIR}/events.parquet", spark=spark)
            .filter(F.col("event_id") % 2 == 1),
            base, "value", edges=edges,
        )
        want_n = profiling.distribution_drift(base, cur_batch, "value", edges=edges)
        assert sorted(map(tuple, got_n.collect())) == sorted(map(tuple, want_n.collect()))
