"""aws_data_wrangler_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of AWS Data Wrangler
(``awswrangler`` 1.x, ref: /root/reference/awswrangler/__init__.py)
on Apache Spark: dataset IO, catalog, SQL engine, database
connectors, log analytics — plus first-class large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal columns).

All compute is declared through the DataFrame/SQL API so Catalyst
and Tungsten pick the physical strategy; the same code that runs on
``local[*]`` over ``file://`` paths runs on a 1000-executor cluster
over ``s3a://`` paths.
"""

from aws_data_wrangler_spark import (  # noqa: F401
    athena,
    catalog,
    cloudwatch,
    db,
    emr,
    exceptions,
    operators,
    quicksight,
    s3,
    streaming,
    sts,
)
from aws_data_wrangler_spark._config import config  # noqa: F401
from aws_data_wrangler_spark._session import get_spark  # noqa: F401

__title__ = "aws_data_wrangler_spark"
__description__ = "PySpark-native ETL + analytics engine (AWS Data Wrangler capability surface)."
__version__ = "0.1.0"
__license__ = "Apache License 2.0"

__all__ = [
    "athena",
    "catalog",
    "cloudwatch",
    "db",
    "emr",
    "exceptions",
    "operators",
    "quicksight",
    "s3",
    "streaming",
    "sts",
    "config",
    "get_spark",
    "__description__",
    "__license__",
    "__title__",
    "__version__",
]
