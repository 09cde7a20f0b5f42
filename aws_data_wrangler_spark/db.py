"""Database connector module (ref: /root/reference/awswrangler/db.py).

The reference wraps SQLAlchemy engines + Redshift COPY/UNLOAD. The
Spark-native equivalents:

- ``to_sql`` / ``read_sql_query`` / ``read_sql_table`` → Spark's JDBC
  source/sink (predicate pushdown, ``partitionColumn`` parallel reads
  — the scale path for pulling a warehouse table onto the cluster).
- ``copy_to_warehouse`` / ``unload_warehouse`` → the Redshift
  COPY/UNLOAD pattern (ref db.py:654 ``copy_to_redshift``, :1041
  ``unload_redshift``): stage columnar files on the object store,
  then issue the bulk load — here parquet staging + JDBC.

The JDBC path runs for real against *embedded Apache Derby* (whose
jars ship with Spark for the Hive metastore) — ``get_engine("derby",
database=...)``; a ``spark-catalog://`` engine flavor additionally
backs the same API with catalog tables. Server-mode databases
(postgresql/mysql/redshift/sqlserver) use the same code with a
host/port URL on a real deployment.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

from aws_data_wrangler_spark.exceptions import InvalidConnection
from aws_data_wrangler_spark.s3._fs import _active_spark

_JDBC_DEFAULT_PORTS = {"postgresql": 5432, "mysql": 3306, "redshift": 5439, "sqlserver": 1433}
_JDBC_DRIVERS = {
    "postgresql": "org.postgresql.Driver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "redshift": "com.amazon.redshift.jdbc42.Driver",
    "sqlserver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    "derby": "org.apache.derby.jdbc.EmbeddedDriver",
}


@dataclass
class Engine:
    """Connection descriptor — the analog of a SQLAlchemy engine.

    ``kind="jdbc"`` targets a real database through Spark's JDBC
    source; ``kind="spark-catalog"`` targets the session catalog
    (used in tests and for lakehouse-local "databases").
    """

    kind: str
    url: str = ""
    properties: Dict[str, str] = field(default_factory=dict)
    database: str = "default"


def get_engine(
    db_type: str,
    host: str = "localhost",
    port: Optional[int] = None,
    database: str = "",
    user: str = "",
    password: str = "",
) -> Engine:
    """Build a connection descriptor. Ref: awswrangler/db.py:596 ``get_engine``.

    ``db_type="derby"`` builds an *embedded* Apache Derby engine (the
    Derby jars ship with Spark for the Hive metastore, so the JDBC
    source/sink runs for real with no external service): ``database``
    is a filesystem path or ``memory:name``. Embedded Derby lives
    inside the local JVM — it exercises the full JDBC code path in
    tests and single-node runs; a cluster deployment points the same
    API at a server-mode URL (postgresql/mysql/redshift/sqlserver).
    """
    if db_type == "spark-catalog":
        return Engine(kind="spark-catalog", database=database or "default")
    if db_type not in _JDBC_DRIVERS:
        raise InvalidConnection(f"unsupported db_type {db_type}")
    if db_type == "derby":
        try:  # keep embedded Derby's log out of the process cwd
            import tempfile

            spark = _active_spark(None)
            spark._jvm.java.lang.System.setProperty(
                "derby.stream.error.file", f"{tempfile.gettempdir()}/derby.log"
            )
        except Exception:
            pass
        url = f"jdbc:derby:{database};create=true"
        return Engine(kind="jdbc", url=url, properties={"driver": _JDBC_DRIVERS[db_type]}, database=database)
    port = port or _JDBC_DEFAULT_PORTS[db_type]
    sub = "sqlserver" if db_type == "sqlserver" else db_type
    url = f"jdbc:{sub}://{host}:{port}/{database}"
    props = {"user": user, "password": password, "driver": _JDBC_DRIVERS[db_type]}
    return Engine(kind="jdbc", url=url, properties=props, database=database)


def get_redshift_temp_engine(*_: Any, **__: Any) -> Engine:
    """Temporary-credential Redshift engine (cluster-only; needs IAM).
    Ref: awswrangler/db.py:525."""
    raise NotImplementedError("temporary Redshift credentials require an AWS runtime")


def _qualify(engine: Engine, table: str, schema: Optional[str]) -> str:
    if engine.kind == "spark-catalog":
        db = schema or engine.database
        return f"`{db}`.`{table}`"
    return f"{schema}.{table}" if schema else table


def to_sql(
    df: DataFrame,
    con: Engine,
    name: str,
    schema: Optional[str] = None,
    if_exists: str = "append",
    spark: Optional[SparkSession] = None,
) -> None:
    """Write a DataFrame to a database table. Ref: awswrangler/db.py:269 ``to_sql``."""
    spark = _active_spark(spark)
    mode = {"append": "append", "replace": "overwrite", "fail": "errorifexists"}.get(if_exists, if_exists)
    if con.kind == "spark-catalog":
        spark.sql(f"CREATE DATABASE IF NOT EXISTS `{schema or con.database}`")
        df.write.mode(mode).saveAsTable(_qualify(con, name, schema).replace("`", ""))
        return
    writer = df.write.mode(mode).format("jdbc").option("url", con.url).option("dbtable", _qualify(con, name, schema))
    for key, value in con.properties.items():
        writer = writer.option(key, value)
    writer.save()


def read_sql_query(
    sql: str,
    con: Engine,
    partition_column: Optional[str] = None,
    lower_bound: Optional[Any] = None,
    upper_bound: Optional[Any] = None,
    num_partitions: int = 16,
    spark: Optional[SparkSession] = None,
) -> DataFrame:
    """Query a database into a DataFrame. Ref: awswrangler/db.py:369.

    With ``partition_column`` bounds, Spark issues ``num_partitions``
    range-parallel queries — the scale path for large pulls.
    """
    spark = _active_spark(spark)
    if con.kind == "spark-catalog":
        spark.catalog.setCurrentDatabase(con.database)
        return spark.sql(sql)
    reader = spark.read.format("jdbc").option("url", con.url)
    for key, value in con.properties.items():
        reader = reader.option(key, value)
    if partition_column is not None:
        # Spark rejects `query` + partitionColumn; wrap the SQL as a
        # derived table so the range predicates compose with it
        reader = (
            reader.option("dbtable", f"({sql}) AS sgsub")
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    else:
        reader = reader.option("query", sql)
    return reader.load()


def read_sql_table(
    table: str,
    con: Engine,
    schema: Optional[str] = None,
    spark: Optional[SparkSession] = None,
    **kwargs: Any,
) -> DataFrame:
    """Ref: awswrangler/db.py:446 ``read_sql_table``."""
    spark = _active_spark(spark)
    if con.kind == "spark-catalog":
        return spark.table(_qualify(con, table, schema))
    return read_sql_query(f"SELECT * FROM {_qualify(con, table, schema)}", con, spark=spark, **kwargs)


def copy_to_warehouse(
    df: DataFrame,
    path: str,
    con: Engine,
    table: str,
    schema: Optional[str] = None,
    mode: str = "append",
    spark: Optional[SparkSession] = None,
) -> None:
    """Stage parquet at ``path``, then bulk-load into the warehouse —
    the COPY pattern. Ref: awswrangler/db.py:654 ``copy_to_redshift``."""
    from aws_data_wrangler_spark import s3

    spark = _active_spark(spark)
    s3.to_parquet(df, path, dataset=True, mode="overwrite", spark=spark)
    staged = s3.read_parquet(path, dataset=True, spark=spark)
    to_sql(staged, con, table, schema=schema, if_exists="replace" if mode == "overwrite" else "append", spark=spark)


def unload_warehouse(
    sql: str,
    path: str,
    con: Engine,
    spark: Optional[SparkSession] = None,
) -> DataFrame:
    """Run a warehouse query and land the result as parquet at ``path``
    — the UNLOAD pattern. Ref: awswrangler/db.py:1041 ``unload_redshift``."""
    from aws_data_wrangler_spark import s3

    spark = _active_spark(spark)
    df = read_sql_query(sql, con, spark=spark)
    s3.to_parquet(df, path, dataset=True, mode="overwrite", spark=spark)
    return s3.read_parquet(path, dataset=True, spark=spark)


# Reference-name aliases (awswrangler/db.py): the "warehouse" functions
# implement the same COPY/UNLOAD staging patterns Redshift uses.
copy_to_redshift = copy_to_warehouse
unload_redshift = unload_warehouse


def copy_files_to_redshift(
    path: Any,
    con: Engine,
    table: str,
    schema: Optional[str] = None,
    mode: str = "append",
    spark: Optional[SparkSession] = None,
) -> None:
    """Bulk-load already-staged parquet files into the warehouse.
    Ref: awswrangler/db.py:813 ``copy_files_to_redshift``."""
    from aws_data_wrangler_spark import s3

    spark = _active_spark(spark)
    staged = s3.read_parquet(path, dataset=not isinstance(path, list), spark=spark)
    to_sql(staged, con, table, schema=schema,
           if_exists="replace" if mode == "overwrite" else "append", spark=spark)


def unload_redshift_to_files(
    sql: str,
    path: str,
    con: Engine,
    spark: Optional[SparkSession] = None,
) -> List[str]:
    """UNLOAD to parquet files, returning the file list.
    Ref: awswrangler/db.py:1188 ``unload_redshift_to_files``."""
    from aws_data_wrangler_spark import s3

    spark = _active_spark(spark)
    unload_warehouse(sql, path, con, spark=spark)
    return s3.list_objects(path, spark=spark)


def write_warehouse_copy_manifest(paths: List[str], manifest_path: str, spark: Optional[SparkSession] = None) -> Dict[str, Any]:
    """COPY manifest JSON for staged files. Ref: awswrangler/db.py:966."""
    import json

    from aws_data_wrangler_spark.s3._fs import _fs_for, _hpath, size_objects

    spark = _active_spark(spark)
    sizes = size_objects(paths, spark=spark)
    manifest = {
        "entries": [
            {"url": p, "mandatory": True, "meta": {"content_length": sizes.get(p)}} for p in paths
        ]
    }
    fs, jvm = _fs_for(spark, manifest_path)
    out = fs.create(_hpath(jvm, manifest_path), True)
    out.write(bytearray(json.dumps(manifest).encode()))
    out.close()
    return manifest


# reference-name alias (Redshift is "the warehouse" in awswrangler 1.x)
write_redshift_copy_manifest = write_warehouse_copy_manifest
