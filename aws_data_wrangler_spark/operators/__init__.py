"""Large-scale training-data operators (beyond the reference surface).

Dedup, similarity search, text analysis, multimodal columns — the
operations a 100 TB LLM-data pipeline runs on top of the IO/catalog
layer.
"""

from aws_data_wrangler_spark.operators import (  # noqa: F401
    bpe,
    classifier,
    dedup,
    joins,
    multimodal,
    profiling,
    sampling,
    similarity,
    text,
    timeseries,
)

__all__ = [
    "bpe",
    "classifier",
    "dedup",
    "joins",
    "multimodal",
    "profiling",
    "sampling",
    "similarity",
    "text",
    "timeseries",
]
