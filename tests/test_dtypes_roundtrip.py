"""Full-dtype round-trip matrix — modeled on the reference's
tests/test_metadata.py + test_s3_parquet.py dtype coverage: every
supported type must survive to_parquet → read_parquet → catalog
registration → SQL read-back."""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_data_wrangler_spark import athena, catalog, s3

SCHEMA = (
    "c_bool boolean, c_byte tinyint, c_short smallint, c_int int, c_long bigint, "
    "c_float float, c_double double, c_dec decimal(12,3), c_str string, "
    "c_bin binary, c_date date, c_ts timestamp, "
    "c_arr array<int>, c_map map<string,double>, "
    "c_struct struct<x:int,y:string>"
)

ROWS = [
    (
        True, 1, 2, 3, 4, 1.5, 2.5, Decimal("123.456"), "hello",
        bytearray(b"\x00\x01"), datetime.date(2020, 1, 2),
        datetime.datetime(2020, 1, 2, 3, 4, 5), [1, 2, 3], {"a": 1.0},
        Row(x=7, y="z"),
    ),
    (
        False, None, None, None, None, None, None, None, None,
        None, None, None, None, None, None,
    ),
]


@pytest.fixture(scope="module")
def typed_df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


class TestDtypeRoundtrip:
    def test_parquet_roundtrip_preserves_schema(self, spark, typed_df, tmp_prefix):
        out = f"{tmp_prefix}/typed"
        s3.to_parquet(typed_df, out, dataset=True, mode="overwrite")
        back = s3.read_parquet(out, dataset=True)
        assert dict(back.dtypes) == dict(typed_df.dtypes)
        a = typed_df.orderBy("c_bool").collect()
        b = back.orderBy("c_bool").collect()
        assert a == b

    def test_orc_roundtrip_preserves_schema(self, spark, typed_df, tmp_prefix):
        out = f"{tmp_prefix}/typed_orc"
        s3.to_orc(typed_df, out, dataset=True, mode="overwrite")
        back = s3.read_orc(out, dataset=True)
        assert dict(back.dtypes) == dict(typed_df.dtypes)
        a = typed_df.orderBy("c_bool").collect()
        b = back.orderBy("c_bool").collect()
        assert a == b

    def test_catalog_registration_all_types(self, spark, typed_df, tmp_prefix):
        out = f"{tmp_prefix}/typed_cat"
        s3.to_parquet(typed_df, out, dataset=True, mode="overwrite",
                      database="sg_dtypes", table="typed")
        types = catalog.get_table_types("sg_dtypes", "typed")
        assert types["c_dec"] == "decimal(12,3)"
        assert types["c_arr"] == "array<int>"
        assert types["c_map"] == "map<string,double>"
        assert types["c_struct"] == "struct<x:int,y:string>"
        back = athena.read_sql_query(
            "SELECT c_struct.x AS x, c_arr[0] AS first, c_map['a'] AS a FROM sg_dtypes.typed WHERE c_bool"
        )
        row = back.collect()[0]
        assert (row["x"], row["first"], row["a"]) == (7, 1, 1.0)
        catalog.delete_database("sg_dtypes")

    def test_json_roundtrip_complex(self, spark, typed_df, tmp_prefix):
        out = f"{tmp_prefix}/typed_json"
        subset = typed_df.select("c_bool", "c_int", "c_str", "c_arr", "c_struct")
        s3.to_json(subset, out, dataset=True, mode="overwrite")
        back = s3.read_json(out, dataset=True, schema="c_bool boolean, c_int int, c_str string, c_arr array<int>, c_struct struct<x:int,y:string>")
        assert back.count() == 2
        assert back.filter("c_struct.x = 7").count() == 1

    def test_dtype_override_on_write(self, spark, typed_df, tmp_prefix):
        out = f"{tmp_prefix}/typed_cast"
        s3.to_parquet(
            typed_df.select("c_int", "c_double"), out, dataset=True, mode="overwrite",
            dtype={"c_int": "bigint", "c_double": "decimal(10,2)"},
        )
        back = s3.read_parquet(out, dataset=True)
        assert dict(back.dtypes) == {"c_int": "bigint", "c_double": "decimal(10,2)"}

    def test_typed_partition_columns_roundtrip(self, spark, typed_df, tmp_prefix):
        # partition values live in the PATH (strings); the read must
        # surface them typed again (ref: test_s3_parquet partition tests)
        out = f"{tmp_prefix}/typed_part"
        df = typed_df.filter("c_bool").select("c_int", "c_str", "c_date", "c_long")
        s3.to_parquet(df, out, dataset=True, mode="overwrite",
                      partition_cols=["c_date", "c_int"])
        back = s3.read_parquet(out, dataset=True)
        got = dict(back.dtypes)
        assert got["c_date"] == "date"
        assert got["c_int"] == "int"
        row = back.collect()[0]
        assert row["c_date"] == datetime.date(2020, 1, 2) and row["c_int"] == 3

    def test_deep_nesting_roundtrip(self, spark, tmp_prefix):
        schema = (
            "id int, arr_structs array<struct<k:string,v:array<int>>>, "
            "map_arr map<string,array<double>>, "
            "s struct<inner:struct<a:int,b:map<string,int>>>"
        )
        rows = [
            (1, [Row(k="x", v=[1, 2])], {"m": [1.5, 2.5]},
             Row(inner=Row(a=9, b={"z": 3}))),
            (2, [], {}, None),
        ]
        df = spark.createDataFrame(rows, schema)
        out = f"{tmp_prefix}/deep"
        s3.to_parquet(df, out, dataset=True, mode="overwrite")
        back = s3.read_parquet(out, dataset=True)
        assert dict(back.dtypes) == dict(df.dtypes)
        assert back.orderBy("id").collect() == df.orderBy("id").collect()

    def test_timestamp_ntz_roundtrip(self, spark, tmp_prefix):
        df = spark.createDataFrame(
            [(1, datetime.datetime(2024, 6, 1, 12, 0, 0))], "id int, ts timestamp_ntz"
        )
        out = f"{tmp_prefix}/ntz"
        s3.to_parquet(df, out, dataset=True, mode="overwrite")
        back = s3.read_parquet(out, dataset=True)
        assert dict(back.dtypes)["ts"] == "timestamp_ntz"
        assert back.collect() == df.collect()

    def test_max_precision_decimal_roundtrip(self, spark, tmp_prefix):
        # decimal(38,x) is the parquet/athena precision ceiling
        # (ref awswrangler/_data_types.py decimal handling)
        df = spark.createDataFrame(
            [
                (1, Decimal("9" * 20 + "." + "9" * 18), Decimal("0." + "0" * 37 + "1")),
                (2, Decimal("-" + "9" * 20 + "." + "9" * 18), None),
            ],
            "id int, d_hi decimal(38,18), d_lo decimal(38,38)",
        )
        out = f"{tmp_prefix}/dec38"
        s3.to_parquet(df, out, dataset=True, mode="overwrite")
        back = s3.read_parquet(out, dataset=True)
        assert dict(back.dtypes) == dict(df.dtypes)
        assert back.orderBy("id").collect() == df.orderBy("id").collect()

    def test_map_struct_with_partition_cols(self, spark, tmp_prefix):
        # complex data columns under dataset mode WITH partition columns
        # (ref _data_types.py:24,151 nested types; partition layout must
        # not disturb nested data columns)
        df = spark.createDataFrame(
            [
                ("p1", {"a": 1.5}, Row(x=1, y="one"), [Row(k="k1", v=[1])]),
                ("p2", {"b": 2.5}, Row(x=2, y="two"), []),
                ("p2", None, None, None),
            ],
            "part string, m map<string,double>, s struct<x:int,y:string>, "
            "ns array<struct<k:string,v:array<int>>>",
        )
        out = f"{tmp_prefix}/complex_part"
        s3.to_parquet(df, out, dataset=True, mode="overwrite", partition_cols=["part"])
        back = s3.read_parquet(out, dataset=True)
        got = dict(back.dtypes)
        assert got["m"] == "map<string,double>"
        assert got["s"] == "struct<x:int,y:string>"
        assert got["ns"] == "array<struct<k:string,v:array<int>>>"
        assert back.count() == 3
        assert back.filter("s.x = 2").collect()[0]["m"] == {"b": 2.5}
        # overwrite_partitions only touches p2
        repl = spark.createDataFrame(
            [("p2", {"c": 9.0}, Row(x=9, y="nine"), [])], df.schema
        )
        s3.to_parquet(repl, out, dataset=True, mode="overwrite_partitions",
                      partition_cols=["part"])
        after = s3.read_parquet(out, dataset=True)
        assert after.filter("part = 'p1'").count() == 1
        assert after.filter("part = 'p2'").count() == 1
        assert after.filter("part = 'p2'").collect()[0]["s"]["x"] == 9

    def test_null_only_columns_roundtrip(self, spark, tmp_prefix):
        # a column with no non-null value in any row must keep its
        # declared type through the dataset round-trip (ref
        # _data_types.py null-column handling)
        df = spark.createDataFrame(
            [(1, None, None, None), (2, None, None, None)],
            "id int, s string, d decimal(10,2), arr array<int>",
        )
        out = f"{tmp_prefix}/nulls"
        s3.to_parquet(df, out, dataset=True, mode="overwrite")
        back = s3.read_parquet(out, dataset=True)
        assert dict(back.dtypes) == dict(df.dtypes)
        assert back.filter("s IS NULL AND d IS NULL AND arr IS NULL").count() == 2

    def test_empty_frame_roundtrip(self, spark, typed_df, tmp_prefix):
        out = f"{tmp_prefix}/empty"
        s3.to_parquet(typed_df.limit(0), out, dataset=True, mode="overwrite")
        back = s3.read_parquet(out, dataset=True)
        assert back.count() == 0
        assert dict(back.dtypes) == dict(typed_df.dtypes)
