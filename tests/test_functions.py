"""functions module: salted join, vector primitives, truncation —
plus hypothesis property tests for the type bridge."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from aws_data_wrangler_spark._data_types import athena2spark, sanitize_name, spark2athena
from aws_data_wrangler_spark.functions import salted_join, trunc_digits, vec_cosine


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, lineitem):
        dim = lineitem.select("l_returnflag").distinct().withColumn(
            "flag_label", F.concat(F.lit("label_"), F.col("l_returnflag"))
        )
        plain = lineitem.join(dim, "l_returnflag").select("l_orderkey", "l_linenumber", "flag_label")
        salted = salted_join(lineitem, dim, "l_returnflag").select("l_orderkey", "l_linenumber", "flag_label")
        assert plain.count() == salted.count()
        assert plain.exceptAll(salted).count() == 0

    def test_spreads_hot_key(self, spark, lineitem):
        # every row of the hot key must not land in one salt bucket
        salted = lineitem.withColumn(
            "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(8)).cast("long")
        )
        buckets = salted.filter("l_returnflag = 'N'").select("__salt").distinct().count()
        assert buckets > 1


class TestVectorPrimitives:
    def test_cosine_of_identical_vectors(self, spark):
        df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "v array<double>")
        val = df.select(vec_cosine("v", "v").alias("c")).collect()[0]["c"]
        assert val == pytest.approx(1.0)

    def test_trunc_digits(self, spark):
        df = spark.createDataFrame([(0.1234567,), (0.9999999,), (1.0,)], "x double")
        vals = [r["t"] for r in df.select(trunc_digits("x").alias("t")).collect()]
        assert vals == [0.123456, 0.999999, 1.0]


# hypothesis strategies for the athena<->spark type bridge
_simple = st.sampled_from(
    ["boolean", "tinyint", "smallint", "int", "bigint", "float", "double",
     "string", "binary", "date", "timestamp"]
)
_decimal = st.tuples(st.integers(1, 38), st.integers(0, 10)).map(
    lambda ps: f"decimal({ps[0]},{min(ps[1], ps[0])})"
)
_athena_type = st.recursive(
    _simple | _decimal,
    lambda children: st.one_of(
        children.map(lambda t: f"array<{t}>"),
        st.tuples(_simple, children).map(lambda kv: f"map<{kv[0]},{kv[1]}>"),
        st.lists(
            st.tuples(st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True), children),
            min_size=1, max_size=3, unique_by=lambda kv: kv[0],
        ).map(lambda fs: "struct<" + ",".join(f"{n}:{t}" for n, t in fs) + ">"),
    ),
    max_leaves=6,
)


class TestTypeBridgeProperties:
    @given(_athena_type)
    @settings(max_examples=200, deadline=None)
    def test_roundtrip(self, ddl):
        spark_type = athena2spark(ddl)
        back = spark2athena(spark_type)
        # canonical form: integer->int, real->float are one-way aliases
        canonical = ddl.replace("integer", "int").replace("real", "float")
        assert back == canonical
        assert athena2spark(back) == spark_type

    @given(st.text(min_size=1, max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_sanitize_always_valid(self, name):
        out = sanitize_name(name)
        import re

        assert re.fullmatch(r"[a-z0-9_]+", out)
