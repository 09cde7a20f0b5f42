"""Large-scale training-data operators (beyond the reference surface).

The operations a 100 TB LLM-data pipeline runs on top of the
IO/catalog layer: the dedup ladder (document / line / token-span /
embedding / cluster-semantic), similarity search (brute-force, LSH,
IVF, SQ8, product quantization), text analysis and quality gates
(incl. HTML boilerplate stripping, the full Gopher repetition-rule
family, and unigram/bigram LM surprisal), a trainable quality
classifier, deterministic sampling/splitting/mixing and sharded
training shuffles, BPE tokenizer training, temporal joins (as-of
with direction/tolerance, interval), pre-shuffle profiling (key
skew, null profile, join fan-out forecasts), and multimodal binary
columns.
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
