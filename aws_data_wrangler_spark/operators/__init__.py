"""Large-scale training-data operators (beyond the reference surface).

The operations a 100 TB LLM-data pipeline runs on top of the
IO/catalog layer: the dedup ladder (document / line / token-span /
embedding / cluster-semantic), similarity search (brute-force, LSH,
IVF, SQ8), text analysis and quality gates, a trainable quality
classifier, deterministic sampling/splitting/mixing, BPE tokenizer
training, temporal joins, pre-shuffle profiling, and multimodal
binary columns.
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
