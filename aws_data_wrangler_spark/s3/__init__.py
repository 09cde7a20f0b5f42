"""Dataset IO module (ref: /root/reference/awswrangler/s3/__init__.py).

Path-based object IO over any Hadoop filesystem URI — ``file://`` in
tests, ``s3a://`` (S3), ``hdfs://``, ``abfs://`` on a cluster.
"""

from aws_data_wrangler_spark.s3._fs import (  # noqa: F401
    copy_objects,
    delete_objects,
    describe_objects,
    does_object_exist,
    list_directories,
    list_objects,
    merge_datasets,
    open_s3_object,
    size_objects,
    wait_objects_exist,
    wait_objects_not_exist,
)
from aws_data_wrangler_spark.s3._read import (  # noqa: F401
    read_csv,
    read_fwf,
    read_json,
    read_orc,
    read_parquet,
    read_parquet_bloom_filters,
    read_parquet_metadata,
    read_parquet_table,
)
from aws_data_wrangler_spark.s3._write import (  # noqa: F401
    merge_upsert_table,
    store_parquet_metadata,
    to_csv,
    to_json,
    to_orc,
    to_parquet,
    zorder_layout,
)


def get_bucket_region(bucket: str, **_: object) -> str:
    """Region of a bucket. Local/file-based deployments have none; on a
    real cluster this is carried by the s3a client config.
    Ref: /root/reference/awswrangler/s3/_list.py ``get_bucket_region``.
    """
    return "local"


def get_botocore_valid_kwargs(function_name: str, s3_additional_kwargs: dict) -> dict:
    """Filter extra kwargs down to the ones the named engine function
    accepts — the reference filters against botocore operation models
    (ref: /root/reference/awswrangler/s3/_fs.py:66); the Spark engine's
    analog filters against the target function's signature, so callers
    can pass one spreadable option dict across engines.
    """
    import inspect
    import sys

    fn = getattr(sys.modules[__name__], function_name, None)
    if fn is None:
        return dict(s3_additional_kwargs)
    params = inspect.signature(fn).parameters
    if any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()):
        # target takes **kwargs: every option is acceptable (most
        # engine functions absorb reference-only kwargs this way —
        # filtering against named params alone would drop everything)
        return dict(s3_additional_kwargs)
    return {k: v for k, v in s3_additional_kwargs.items() if k in params}


__all__ = [
    "merge_upsert_table",
    "copy_objects",
    "merge_datasets",
    "delete_objects",
    "describe_objects",
    "get_bucket_region",
    "get_botocore_valid_kwargs",
    "size_objects",
    "does_object_exist",
    "list_directories",
    "list_objects",
    "open_s3_object",
    "read_parquet",
    "read_parquet_bloom_filters",
    "read_parquet_metadata",
    "read_parquet_table",
    "read_csv",
    "read_fwf",
    "read_json",
    "read_orc",
    "wait_objects_exist",
    "wait_objects_not_exist",
    "store_parquet_metadata",
    "to_parquet",
    "to_csv",
    "to_json",
    "to_orc",
    "zorder_layout",
]
