"""SparkSession factory tuned for the engine's workloads.

The reference passes a ``boto3_session`` everywhere; our equivalent
ambient context is the SparkSession. ``get_spark`` builds (or returns)
one with the scale-oriented defaults every operator in this package
assumes:

- AQE on (runtime coalesce, skew-join splitting, dynamic broadcast) —
  at 100 TB the static plan is never right, let the runtime re-plan.
- Arrow transfers on — every pandas UDF path is Arrow-batched.
- Dynamic partition overwrite — required for ``mode="overwrite_partitions"``
  dataset writes (Glue/Athena-style partition replacement).
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from typing import Dict, Optional, Set, Tuple

from pyspark.sql import SparkSession

from aws_data_wrangler_spark._config import config

_SHIPPED: Set[Tuple[int, str]] = set()


def ship_package(spark: SparkSession) -> None:
    """Ship this package's source to Python workers via ``addPyFile``.

    Arrow-batched kernels (mapInPandas / applyInPandasWithState) pickle
    references to module-level functions; workers must be able to import
    the package regardless of the driver's cwd. On a real cluster this
    is also how the code reaches executors — same mechanism, no deploy
    step.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    key = (id(spark.sparkContext), root)
    if key in _SHIPPED:
        return
    zip_path = os.path.join(
        tempfile.gettempdir(), f"aws_data_wrangler_spark_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for dirpath, _, files in os.walk(pkg_dir):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(dirpath, fname)
                    zf.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)


def get_spark(
    app_name: str = "aws-data-wrangler-spark",
    master: Optional[str] = None,
    extra_conf: Optional[Dict[str, str]] = None,
) -> SparkSession:
    """Build or fetch a SparkSession with engine defaults.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]`` (all cores if unset).
    """
    cpus = os.getenv("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    shuffle = str(config.shuffle_partitions or (cpus or 32))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet TIMESTAMP(NANOS) (e.g. pandas-written ns timestamps) has
        # no Spark type; read as long and convert at the load boundary
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.getenv("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if config.broadcast_threshold is not None:
        builder = builder.config(
            "spark.sql.autoBroadcastJoinThreshold", str(config.broadcast_threshold)
        )
    if config.s3_endpoint_url is not None:
        builder = builder.config("spark.hadoop.fs.s3a.endpoint", config.s3_endpoint_url)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark


def ensure_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-built session.

    The driver hands us a bare SparkSession; dataset-mode writes need
    dynamic partition overwrite and operators assume UTC + AQE.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # a bare session keeps the 200-partition default — at test scale
    # that is ~6× more tasks than cores for every shuffle; size to the
    # actual parallelism (AQE coalescing handles the rest). Only when
    # still at Spark's stock 200: an explicitly configured value (e.g.
    # 2000 for large-cluster shuffles) must survive this call.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
        )
    ship_package(spark)
    return spark
