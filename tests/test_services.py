"""cloudwatch / emr / db / sts / config / data-types modules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_data_wrangler_spark import cloudwatch, db, emr, sts
from aws_data_wrangler_spark._config import config
from aws_data_wrangler_spark._data_types import athena2spark, sanitize_name, spark2athena
from aws_data_wrangler_spark.exceptions import InvalidArgument, QueryFailed


class TestCloudwatch:
    def test_run_query_pipeline(self, spark, events):
        events.createOrReplaceTempView("cw_events")
        out = cloudwatch.run_query(
            "filter event_type = 'error' | stats count(*) AS n by user_id | sort n desc | limit 5",
            "cw_events",
            spark=spark,
        )
        rows = out.collect()
        assert len(rows) <= 5
        assert rows == sorted(rows, key=lambda r: -r["n"])

    def test_fields_and_parse(self, spark, events):
        events.createOrReplaceTempView("cw_events")
        out = cloudwatch.read_logs(
            "fields event_id, props | parse props /\"k\": (\\d+)/ as k_val | limit 3",
            "cw_events",
            spark=spark,
        )
        rows = out.collect()
        assert len(rows) == 3
        assert all(r["k_val"].isdigit() for r in rows)

    def test_bin_time_bucketing(self, spark, events):
        events.createOrReplaceTempView("cw_events")
        out = cloudwatch.run_query(
            "stats count(*) as n by bin(1h) as hour | sort hour asc",
            "cw_events",
            spark=spark,
        )
        expect = (
            events.groupBy(F.date_trunc("hour", "ts").alias("hour"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("hour")
        )
        assert [(r["hour"], r["n"]) for r in out.collect()] == [
            (r["hour"], r["n"]) for r in expect.collect()
        ]

    def test_bin_literal_survives_parse_and_quotes(self, spark, events):
        events.createOrReplaceTempView("cw_events")
        # a literal bin(5m) inside a parse regex must NOT be rewritten
        # into the bucketing expression (it would corrupt the pattern)
        out = cloudwatch.read_logs(
            "parse props /(bin\\(5m\\))?\"k\": (\\d+)/ as b, k_val | limit 3",
            "cw_events",
            spark=spark,
        )
        rows = out.collect()
        assert len(rows) == 3 and all(r["k_val"].isdigit() for r in rows)
        # ...and inside a quoted string literal in a filter stage
        out2 = cloudwatch.run_query(
            "filter props != 'bin(5m)' | stats count(*) as n",
            "cw_events",
            spark=spark,
        )
        assert out2.collect()[0]["n"] == events.count()

    def test_bin_literal_survives_escaped_and_double_quotes(self):
        # escaped quotes must not mis-segment the literal scan: a ''
        # doubled quote (and a backslash escape, and a double-quoted
        # literal) keeps the bin() inside the string verbatim while a
        # bin() after the literal still rewrites
        from aws_data_wrangler_spark.cloudwatch import _rewrite_bins

        for stage in (
            "filter msg != 'it''s bin(5m)'",
            "filter msg != 'it\\'s bin(5m)'",
            'filter msg != "bin(5m)"',
        ):
            assert _rewrite_bins(stage) == stage, stage
        mixed = "filter msg != 'it''s bin(5m)' or t = bin(1h)"
        out = _rewrite_bins(mixed)
        assert "'it''s bin(5m)'" in out and "floor(unix_seconds(ts) / 3600)" in out

    def test_unterminated_literal_raises_instead_of_rewriting_through(self):
        # an unmatched trailing quote means the literal scan cannot
        # segment the stage — rewriting bin() text inside it would
        # treat quoted content as code, so the parse must fail loudly
        import pytest

        from aws_data_wrangler_spark.cloudwatch import _rewrite_bins

        for stage in (
            "filter msg != 'unclosed bin(5m)",
            'filter msg != "unclosed bin(5m)',
            "filter a = 'ok' and b = 'unclosed bin(5m)",
        ):
            with pytest.raises(ValueError, match="unterminated"):
                _rewrite_bins(stage)

    def test_key_alias_does_not_eat_cast(self, spark, events):
        events.createOrReplaceTempView("cw_events")
        out = cloudwatch.run_query(
            "stats count(*) as n by cast(user_id as int) | limit 3",
            "cw_events",
            spark=spark,
        )
        # the ' as ' inside cast() must NOT parse as a key alias
        assert "n" in out.columns and len(out.columns) == 2

    def test_dedup_stage_keeps_latest_per_key(self, spark, events):
        events.createOrReplaceTempView("cw_events")
        out = cloudwatch.run_query(
            "dedup user_id, event_type | fields user_id, event_type, ts",
            "cw_events",
            spark=spark,
        )
        got = {(r["user_id"], r["event_type"]): r["ts"] for r in out.collect()}
        want = {
            (r["user_id"], r["event_type"]): r["latest"]
            for r in events.groupBy("user_id", "event_type")
            .agg(F.max("ts").alias("latest"))
            .collect()
        }
        assert got == want  # one row per key, and it is the latest

    def test_time_range_filter(self, spark, events):
        import datetime

        bounds = events.selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()[0]
        mid = bounds["lo"] + (bounds["hi"] - bounds["lo"]) / 2
        out = cloudwatch.run_query(
            "stats count(*) AS n", "cw_events",
            start_time=mid, spark=spark,
        )
        n_after = out.collect()[0]["n"]
        assert 0 < n_after < events.count()

    def test_unknown_stage_fails(self, spark, events):
        events.createOrReplaceTempView("cw_events")
        qid = cloudwatch.start_query("frobnicate x", "cw_events", spark=spark)
        with pytest.raises(QueryFailed):
            cloudwatch.wait_query(qid)


class TestEmr:
    def test_cluster_and_sql_step(self, spark):
        cid = emr.create_cluster("test-cluster", spark=spark)
        assert emr.get_cluster_state(cid) == "WAITING"
        sid = emr.submit_step(cid, command="SELECT 41 + 1 AS answer")
        assert emr.get_step_state(cid, sid) == "COMPLETED"
        sid2 = emr.submit_step(cid, command="SELECT * FROM missing_tbl_xyz")
        assert emr.get_step_state(cid, sid2) == "FAILED"
        emr.terminate_cluster(cid)
        assert emr.get_cluster_state(cid) == "TERMINATED"
        with pytest.raises(InvalidArgument):
            emr.submit_step(cid, command="SELECT 1")

    def test_pyfile_step(self, spark, tmp_prefix):
        path = f"{tmp_prefix}/step.py"
        with open(path, "w", encoding="utf-8") as fh:
            fh.write("spark.sql('SELECT 1').collect()\n")
        cid = emr.create_cluster(spark=spark)
        sid = emr.submit_spark_step(cid, path)
        assert emr.get_step_state(cid, sid) == "COMPLETED"


class TestDb:
    def test_spark_catalog_engine_roundtrip(self, spark, lineitem):
        con = db.get_engine("spark-catalog", database="sg_db_test")
        db.to_sql(lineitem.limit(50), con, "li_copy", if_exists="replace")
        back = db.read_sql_table("li_copy", con)
        assert back.count() == 50
        out = db.read_sql_query("SELECT count(*) AS n FROM li_copy", con)
        assert out.collect()[0]["n"] == 50
        spark.sql("DROP DATABASE IF EXISTS sg_db_test CASCADE")
        spark.catalog.setCurrentDatabase("default")

    def test_copy_unload_warehouse(self, spark, lineitem, tmp_prefix):
        con = db.get_engine("spark-catalog", database="sg_db_test2")
        db.copy_to_warehouse(lineitem.limit(20), f"{tmp_prefix}/stage", con, "li_copied")
        assert db.read_sql_table("li_copied", con).count() == 20
        unloaded = db.unload_warehouse(
            "SELECT l_orderkey FROM li_copied WHERE l_orderkey >= 0",
            f"{tmp_prefix}/unload", con,
        )
        assert unloaded.count() == 20
        spark.sql("DROP DATABASE IF EXISTS sg_db_test2 CASCADE")
        spark.catalog.setCurrentDatabase("default")

    def test_jdbc_engine_url(self):
        con = db.get_engine("postgresql", host="example", database="d", user="u", password="p")
        assert con.url == "jdbc:postgresql://example:5432/d"
        assert con.properties["driver"] == "org.postgresql.Driver"
        from aws_data_wrangler_spark.exceptions import InvalidConnection

        with pytest.raises(InvalidConnection):
            db.get_engine("oracle")

    def test_jdbc_derby_roundtrip(self, spark, lineitem):
        # live JDBC against embedded Derby (jars ship with Spark):
        # write, append, table read, query read, partitioned read
        con = db.get_engine("derby", database="memory:sgtest_db")
        sample = lineitem.select("l_orderkey", "l_quantity", "l_returnflag").limit(30)
        db.to_sql(sample, con, "li_jdbc", if_exists="replace")
        assert db.read_sql_table("li_jdbc", con).count() == 30
        db.to_sql(sample.limit(5), con, "li_jdbc", if_exists="append")
        assert db.read_sql_table("li_jdbc", con).count() == 35
        # identifiers are created quoted-lowercase; quote them in SQL
        out = db.read_sql_query('SELECT count(*) AS "n" FROM li_jdbc', con)
        assert out.collect()[0]["n"] == 35
        part = db.read_sql_table(
            "li_jdbc", con,
            partition_column='"l_orderkey"', lower_bound=0,
            upper_bound=1000000, num_partitions=4,
        )
        assert part.rdd.getNumPartitions() == 4
        assert part.count() == 35

    def test_jdbc_derby_copy_to_warehouse(self, spark, lineitem, tmp_prefix):
        # the COPY pattern against a real JDBC sink: parquet staging →
        # bulk JDBC load (ref awswrangler db.py:654 copy_to_redshift)
        con = db.get_engine("derby", database="memory:sgtest_copy")
        db.copy_to_warehouse(
            lineitem.select("l_orderkey", "l_quantity").limit(20),
            f"{tmp_prefix}/stage", con, "li_copied", mode="overwrite",
        )
        assert db.read_sql_table("li_copied", con).count() == 20


class TestMisc:
    def test_sts(self):
        assert sts.get_account_id() == "000000000000"
        assert sts.get_current_identity_name()
        assert "arn:" in sts.get_current_identity_arn()

    def test_config(self):
        config.database = "mydb"
        assert config.database == "mydb"
        config.reset("database")
        assert config.database is None
        with pytest.raises(AttributeError):
            config.not_a_key = 1

    def test_apply_configs(self):
        from aws_data_wrangler_spark._config import apply_configs

        @apply_configs
        def fn(sql, ctas_approach=None, workgroup=None, **kw):
            return ctas_approach, workgroup, kw

        try:
            config.ctas_approach = True
            config.workgroup = "wg"
            # unset args take config values; explicit args win
            assert fn("q") == (True, "wg", {})
            assert fn("q", ctas_approach=False) == (False, "wg", {})
            # **kwargs pass through
            assert fn("q", extra=1)[2] == {"extra": 1}
        finally:
            config.reset("ctas_approach")
            config.reset("workgroup")
        assert fn("q") == (None, None, {})

    def test_session_defaults_respect_user_shuffle_partitions(self, spark):
        from aws_data_wrangler_spark._session import ensure_session_defaults

        original = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            # an explicitly configured value (big-cluster tuning) must
            # survive; only Spark's stock 200 gets resized to cores
            spark.conf.set("spark.sql.shuffle.partitions", "2000")
            ensure_session_defaults(spark)
            assert spark.conf.get("spark.sql.shuffle.partitions") == "2000"
            spark.conf.set("spark.sql.shuffle.partitions", "200")
            ensure_session_defaults(spark)
            assert spark.conf.get("spark.sql.shuffle.partitions") == str(
                spark.sparkContext.defaultParallelism
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", original)

    def test_type_mapping_roundtrip(self):
        cases = {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "bigint": T.LongType(),
            "double": T.DoubleType(),
            "decimal(10,2)": T.DecimalType(10, 2),
            "array<int>": T.ArrayType(T.IntegerType()),
            "map<string,double>": T.MapType(T.StringType(), T.DoubleType()),
            "struct<a:int,b:array<string>>": T.StructType(
                [T.StructField("a", T.IntegerType()), T.StructField("b", T.ArrayType(T.StringType()))]
            ),
        }
        for ddl, spark_type in cases.items():
            assert athena2spark(ddl) == spark_type
            assert spark2athena(spark_type) == ddl.replace("integer", "int")

    def test_sanitize(self):
        assert sanitize_name("Hello World!") == "hello_world"
        assert sanitize_name("snake_ok_1") == "snake_ok_1"
        assert sanitize_name("CamelCaseCol") == "camel_case_col"


def test_quicksight_extract_columns(spark):
    from aws_data_wrangler_spark import quicksight
    from aws_data_wrangler_spark.plans.queries import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    cols = quicksight.extract_athena_query_columns(
        "SELECT n_nationkey, n_name, CAST(n_regionkey AS DOUBLE) AS r FROM nation"
    )
    assert cols == [
        {"Name": "n_nationkey", "Type": "INTEGER"},
        {"Name": "n_name", "Type": "STRING"},
        {"Name": "r", "Type": "DECIMAL"},
    ]
