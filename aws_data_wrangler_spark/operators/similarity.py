"""Similarity search over embedding columns (``array<float>``).

Six tiers, trading recall for cost (the FAISS index family,
re-expressed as DataFrame plans):

- ``cosine_topk``: brute-force exact top-k. The query set is small and
  broadcast; the corpus is scanned once, linearly, with all vector
  math in JVM codegen (`zip_with`/`aggregate`) — at 100 TB this is a
  single map stage + a top-k-per-query aggregation (no global sort).
- ``sq8_topk``: int8 scalar-quantized coarse scan (~4× smaller corpus)
  + exact-cosine rescoring of the shortlist — final scores are never
  approximate.
- ``pq_topk``: product quantization (IndexPQ) — codegen ADC over the
  code table (m array lookups per row, float vectors untouched), then
  exact rescore of the shortlist.
- ``lsh_topk``: random-hyperplane LSH — sign-bit bucket equi-join
  prunes the corpus to same/near buckets before exact scoring.
- ``ivf_topk``: IVF — a k-means coarse quantizer (trained
  DataFrame-side) prunes to the ``nprobe`` nearest centroid cells;
  ``metric="l2"|"cosine"`` picks the coarse distance.
- ``ivfpq_topk``: IVF+PQ (IndexIVFPQ) — nprobe cell pruning, then ADC
  over product-quantized RESIDUALS within the probed cells, then
  exact rescore.

Every quantized/approximate tier rescores its shortlist against
full-precision vectors, so approximation can cost recall at the cut
but never wrong final scores. Deterministic everywhere: fixed seeds,
ties broken by (score desc, id asc).
"""

from __future__ import annotations

from functools import reduce
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_data_wrangler_spark.functions import trunc_digits


def _with_norm(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    vec = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        vec.alias(f"{prefix}_vec"),
        F.sqrt(
            F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        ).alias(f"{prefix}_norm"),
    )


def _cosine(a_vec: str, b_vec: str, a_norm: str, b_norm: str) -> "F.Column":
    dot = F.aggregate(
        F.zip_with(F.col(a_vec), F.col(b_vec), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.col(a_norm) * F.col(b_norm))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector:
    (query_id, neighbor_id, rank, cosine). Excludes self-matches.

    The query side is broadcast (small); per-query top-k is a window
    over the scored scan — with AQE this is the canonical
    "broadcast-nested-loop + partial top-k" plan.
    """
    q = F.broadcast(_with_norm(queries, id_col, vec_col, "q"))
    c = _with_norm(corpus, id_col, vec_col, "c")
    scored = (
        c.crossJoin(q)
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            trunc_digits(_cosine("q_vec", "c_vec", "q_norm", "c_norm")).alias("cosine"),
        )
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k via Arrow-batched numpy matmul.

    Same semantics as ``cosine_topk``; the scoring runs as a BLAS
    matrix product per Arrow batch instead of per-element codegen.
    For dense embedding workloads this is the rare case where the
    pandas-UDF path beats built-in expressions — the work is a dense
    GEMM, which BLAS does orders of magnitude better than row-wise
    expression evaluation. The query matrix is collected once
    (queries are small by contract) and closed over; the corpus
    streams through mapInPandas partition-parallel. Per-batch partial
    top-k keeps the shuffle at O(#queries × k × #batches).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def kernel(batches):
        for batch in batches:
            c_ids = batch[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(batch[vec_col]), dtype=np.float64)
            if len(c_ids) == 0:
                continue
            c_norm = np.linalg.norm(c_mat, axis=1)
            scores = (q_mat @ c_mat.T) / (q_norm[:, None] * c_norm[None, :])
            scores = np.floor(scores * 1e6) / 1e6  # trunc_digits convention
            for qi, qid in enumerate(q_ids):
                row = scores[qi]
                mask = c_ids != qid
                ids, vals = c_ids[mask], row[mask]
                if len(ids) > k:  # partial top-k per batch
                    part = np.argpartition(-vals, k)[: k * 2]
                    ids, vals = ids[part], vals[part]
                yield pd.DataFrame(
                    {"query_id": qid, "neighbor_id": ids, "cosine": vals}
                )

    scored = corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)
    window = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> List[List[float]]:
    """Deterministic random hyperplanes (numpy PRNG on the driver; tiny,
    shipped as literals)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def lsh_bucket(vec_col: "F.Column", planes: Sequence[Sequence[float]]) -> "F.Column":
    """Sign-bit bucket id of a vector under the given hyperplanes."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        lits = F.array(*[F.lit(float(w)) for w in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, lits, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bucket = bucket.bitwiseOR(F.shiftleft(F.when(dot >= 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint")), i))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH:
    (query_id, neighbor_id, rank, cosine).

    ``num_tables`` independent hash tables; candidates = union of
    same-bucket pairs (equi-join on (table, bucket)), then exact
    cosine + top-k on candidates only. Recall grows with tables;
    cost stays bucket-local — the 100 TB path.
    """
    c = _with_norm(corpus, id_col, vec_col, "c")
    q = _with_norm(queries, id_col, vec_col, "q")
    c_buckets = []
    q_buckets = []
    for t in range(num_tables):
        planes = _hyperplanes(dim, num_planes, seed + t)
        c_buckets.append(
            c.select("c_id", "c_vec", "c_norm", F.lit(t).alias("tbl"), lsh_bucket(F.col("c_vec"), planes).alias("bucket"))
        )
        q_buckets.append(
            q.select("q_id", "q_vec", "q_norm", F.lit(t).alias("tbl"), lsh_bucket(F.col("q_vec"), planes).alias("bucket"))
        )
    c_all = c_buckets[0]
    for extra in c_buckets[1:]:
        c_all = c_all.unionByName(extra)
    q_all = q_buckets[0]
    for extra in q_buckets[1:]:
        q_all = q_all.unionByName(extra)
    candidates = (
        c_all.join(F.broadcast(q_all), ["tbl", "bucket"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", "q_vec", "c_vec", "q_norm", "c_norm")
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = candidates.select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("neighbor_id"),
        trunc_digits(_cosine("q_vec", "c_vec", "q_norm", "c_norm")).alias("cosine"),
    )
    window = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization (SQ8):
    (id, codes array<int> in [-127, 127], scale double).

    ``x̂_i = codes_i * scale`` reconstructs the vector;
    ``scale = max|x| / 127``. A pure projection — no shuffle, no
    Python — that shrinks a float32 corpus ~4× (64 B codes + one scale
    per 64-dim vector), the memory lever that keeps a 100 TB embedding
    corpus cacheable for repeated ANN probes. Zero vectors quantize to
    all-zero codes with scale 0.
    """
    vec = F.col(vec_col).cast("array<double>")
    max_abs = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = (max_abs / F.lit(127.0)).alias("scale")
    codes = F.when(
        max_abs > 0,
        F.transform(vec, lambda x: F.round(x * F.lit(127.0) / max_abs).cast("int")),
    ).otherwise(F.transform(vec, lambda x: F.lit(0))).alias("codes")
    return df.select(F.col(id_col), codes, scale)


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rescore_factor: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantized: Optional[DataFrame] = None,
) -> DataFrame:
    """Two-stage ANN over an SQ8-quantized corpus:
    (query_id, neighbor_id, rank, cosine).

    Stage 1 scans the int8 codes (4× smaller than the float corpus)
    and scores every vector with the RECONSTRUCTED cosine — integer
    codes × per-vector scale, all in JVM codegen — keeping the top
    ``k * rescore_factor`` per query. Stage 2 rescores only those
    candidates against the full-precision vectors (semi-join by id)
    and emits the exact-cosine top-k, so quantization error can only
    cost recall in the stage-1 cut, never wrong final scores. The
    production shape: ``quantized=`` takes a pre-materialized
    ``quantize_embeddings`` table (the persisted artifact) so the
    float corpus is touched only for the tiny rescore set.
    """
    if quantized is None:
        quantized = quantize_embeddings(corpus, id_col, vec_col)
    q = F.broadcast(_with_norm(queries, id_col, vec_col, "q"))
    # reconstructed corpus vector: codes*scale; its norm folds the
    # scale out of the sum — |x̂| = scale * |codes|
    code_norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("codes"), lambda c: c.cast("double") * c),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    c = quantized.select(
        F.col(id_col).alias("c_id"),
        F.col("codes"),
        F.col("scale"),
        (F.col("scale") * code_norm).alias("c_norm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("codes"), lambda x, cc: x * cc.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    ) * F.col("scale")
    approx = (
        c.crossJoin(q)
        .filter((F.col("q_id") != F.col("c_id")) & (F.col("c_norm") > 0))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            (dot / (F.col("q_norm") * F.col("c_norm"))).alias("approx_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        approx.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * rescore_factor)
        .select("query_id", "neighbor_id")
    )
    # exact rescore: full-precision vectors for the shortlist only
    cv = _with_norm(corpus, id_col, vec_col, "c")
    rescored = (
        shortlist.join(cv, shortlist.neighbor_id == cv.c_id)
        .join(q, shortlist.query_id == F.col("q_id"))
        .select(
            "query_id",
            "neighbor_id",
            trunc_digits(_cosine("q_vec", "c_vec", "q_norm", "c_norm")).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    num_codes: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> List[List[List[float]]]:
    """Product-quantization codebooks: ``m`` per-subspace k-means
    codebooks of ``num_codes`` centroids each (FAISS PQ training),
    returned driver-side as plain nested lists — the tiny persistable
    artifact (m × num_codes × dim/m floats) a production pipeline
    trains once, stores, and ships as literals into encode/search
    plans.

    Each subspace trains with the same deterministic Lloyd loop as
    ``train_ivf_centroids`` over the sliced subvectors — ``m``
    linear-scan loops. At corpus scale, train on a
    ``sampling.hash_sample`` of the corpus (FAISS trains on samples
    too); the codebooks generalize, the encode pass sees every row
    anyway.
    """
    dim = _infer_dim(corpus, vec_col)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    vec = F.col(vec_col).cast("array<double>")
    books: List[List[List[float]]] = []
    for s in range(m):
        sub_df = corpus.select(
            F.col(id_col), F.slice(vec, s * sub + 1, sub).alias(vec_col)
        )
        cb = train_ivf_centroids(
            sub_df, num_centroids=num_codes, iterations=iterations,
            id_col=id_col, vec_col=vec_col,
        )
        rows = {int(r["cid"]): [float(x) for x in r["cvec"]] for r in cb.collect()}
        books.append([rows[c] for c in sorted(rows)])
    return books


def _lit_vec(vals: Sequence[float]) -> "F.Column":
    return F.array(*[F.lit(float(v)) for v in vals])


def pq_encode(
    corpus: DataFrame,
    codebooks: List[List[List[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-encode a corpus: (id, codes array<int>, approx_norm double).

    Each subvector maps to its nearest codebook centroid (squared-L2
    argmin over the ``num_codes`` literal centroids; ties → lowest
    code). ``approx_norm`` is the norm of the reconstructed vector —
    a literal-table lookup, precomputed here so the search never
    recomputes it. A pure codegen projection (the codebooks are plan
    literals): a 64-dim float corpus shrinks to ``m`` small ints +
    one double per row, the ~16-32× memory lever that keeps ANN over
    a 100 TB corpus scan-cheap.
    """
    m = len(codebooks)
    sub = len(codebooks[0][0])
    vec = F.col(vec_col).cast("array<double>")
    code_cols = []
    norm_sq = F.lit(0.0)
    for s, book in enumerate(codebooks):
        subvec = F.slice(vec, s * sub + 1, sub)
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(subvec, _lit_vec(cent), lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                for cent in book
            ]
        )
        code = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        code_cols.append(code)
        norms_sq = _lit_vec([sum(x * x for x in cent) for cent in book])
        # element_at is 1-indexed; the code for THIS subspace is the
        # last one appended — recompute via the same expr (codegen CSE
        # handles the shared subtree)
        norm_sq = norm_sq + F.element_at(norms_sq, code + 1)
    return corpus.select(
        F.col(id_col),
        F.array(*code_cols).alias("codes"),
        F.sqrt(norm_sq).alias("approx_norm"),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rescore_factor: int = 4,
    m: int = 8,
    num_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: Optional[List[List[List[float]]]] = None,
    encoded: Optional[DataFrame] = None,
) -> DataFrame:
    """Two-stage ANN over a product-quantized corpus:
    (query_id, neighbor_id, rank, cosine) — the FAISS IndexPQ shape
    with asymmetric distance computation (ADC).

    Stage 1 scans only the code table: each query precomputes a
    ``m × num_codes`` lookup table of subvector·centroid dot products
    (built on the broadcast query side from the literal codebooks),
    and every corpus row's approximate cosine is ``m`` array lookups
    summed — no float vectors touched. Stage 2 rescores the
    ``k × rescore_factor`` shortlist against the full-precision
    vectors, so final scores are exact; quantization error can only
    cost recall at the cut, never wrong scores (the ``sq8_topk``
    contract). Production passes ``codebooks`` (trained once) and
    ``encoded`` (the materialized ``pq_encode`` table).
    """
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, m=m, num_codes=num_codes, id_col=id_col, vec_col=vec_col
        )
    m = len(codebooks)
    sub = len(codebooks[0][0])
    if encoded is None:
        encoded = pq_encode(corpus, codebooks, id_col, vec_col)
    qvec = F.col("q_vec")
    luts = [
        F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        F.slice(qvec, s * sub + 1, sub), _lit_vec(cent), lambda x, y: x * y
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                for cent in book
            ]
        ).alias(f"lut_{s}")
        for s, book in enumerate(codebooks)
    ]
    q = F.broadcast(_with_norm(queries, id_col, vec_col, "q").select("q_id", "q_norm", "q_vec", *luts))
    approx_dot = reduce(
        lambda acc, s: acc + F.element_at(F.col(f"lut_{s}"), F.element_at("codes", s + 1) + 1),
        range(m),
        F.lit(0.0),
    )
    c = encoded.select(
        F.col(id_col).alias("c_id"), F.col("codes"), F.col("approx_norm")
    )
    approx = (
        c.crossJoin(q)
        .filter((F.col("q_id") != F.col("c_id")) & (F.col("approx_norm") > 0))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            (approx_dot / (F.col("q_norm") * F.col("approx_norm"))).alias("approx_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        approx.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * rescore_factor)
        .select("query_id", "neighbor_id")
    )
    cv = _with_norm(corpus, id_col, vec_col, "c")
    q_plain = F.broadcast(_with_norm(queries, id_col, vec_col, "q"))
    rescored = (
        shortlist.join(cv, shortlist.neighbor_id == cv.c_id)
        .join(q_plain, shortlist.query_id == F.col("q_id"))
        .select(
            "query_id",
            "neighbor_id",
            trunc_digits(_cosine("q_vec", "c_vec", "q_norm", "c_norm")).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    num_centroids: int = 16,
    m: int = 8,
    num_codes: int = 16,
    rescore_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[DataFrame] = None,
    codebooks: Optional[List[List[List[float]]]] = None,
    iterations: int = 5,
) -> DataFrame:
    """IVF+PQ ANN (the FAISS IndexIVFPQ shape): a coarse quantizer
    prunes to ``nprobe`` cells, product-quantized RESIDUALS
    (vector − cell centroid) score the survivors via ADC, and the
    ``k × rescore_factor`` shortlist rescores against full-precision
    vectors — exact final scores, approximation only at the cuts.

    The two artifacts compose the standalone tiers: ``centroids``
    (``train_ivf_centroids``) and ``codebooks``
    (``train_pq_codebooks`` over residuals — trained here when not
    given, on a CACHED residual table so the m Lloyd loops do not
    re-derive the assignment each pass; production trains both once,
    offline, on a sample).

    Scale shape: assignment and probing are broadcast nested-loops
    over the tiny centroid table; the scoring join is a cell-keyed
    EQUI-join of the code table against the broadcast probe set — the
    crossJoin of ``pq_topk`` shrinks to ~nprobe/num_centroids of the
    corpus, and each scored row costs m array lookups plus the
    precomputed q·centroid term. Approximate cosine uses the EXACT
    corpus-vector norm (free at encode time), so ADC error lives only
    in the dot product.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, num_centroids, iterations, id_col=id_col, vec_col=vec_col
        )
    cvec = F.col("cvec").cast("array<double>")
    cent = F.broadcast(centroids.select("cid", cvec.alias("cvec")))
    c = _with_norm(corpus, id_col, vec_col, "c")
    # assign each corpus vector to its nearest (L2) cell and carry the
    # residual + exact norm
    dist_c = F.aggregate(
        F.zip_with(F.col("c_vec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    assigned = (
        c.crossJoin(cent)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("c_id").orderBy(dist_c.asc(), F.col("cid").asc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "c_id",
            "c_norm",
            "cid",
            F.zip_with(F.col("c_vec"), F.col("cvec"), lambda x, y: x - y).alias("residual"),
        )
    )
    if codebooks is None:
        residuals = assigned.select(F.col("c_id").alias(id_col), F.col("residual").alias(vec_col))
        # cache: each of the m Lloyd loops actions this plan several
        # times; uncached, every action re-runs the assignment join
        residuals = residuals.cache()
        codebooks = train_pq_codebooks(
            residuals, m=m, num_codes=num_codes, iterations=iterations,
            id_col=id_col, vec_col=vec_col,
        )
        # codebooks are collected driver-side — the cached residual
        # table has no further consumer; release executor storage so
        # repeated calls in a long-lived session don't accumulate it
        residuals.unpersist()
    m = len(codebooks)
    sub = len(codebooks[0][0])
    encoded = (
        pq_encode(assigned.select("c_id", "c_norm", "cid", F.col("residual").alias("__r")), codebooks, id_col="c_id", vec_col="__r")
        .select("c_id", "codes")
    )
    encoded = encoded.join(assigned.select("c_id", "c_norm", "cid"), "c_id")
    # probe: top-nprobe cells per query by L2, carrying q·centroid
    q = _with_norm(queries, id_col, vec_col, "q")
    dist_q = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    qdot_cent = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("cvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    luts = [
        F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        F.slice(F.col("q_vec"), s * sub + 1, sub), _lit_vec(cent_vec), lambda x, y: x * y
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                for cent_vec in book
            ]
        ).alias(f"lut_{s}")
        for s, book in enumerate(codebooks)
    ]
    q_cells = F.broadcast(
        q.crossJoin(cent)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(dist_q.asc(), F.col("cid").asc())
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "q_norm", "cid", qdot_cent.alias("q_dot_cent"), *luts)
    )
    adc = reduce(
        lambda acc, s: acc + F.element_at(F.col(f"lut_{s}"), F.element_at("codes", s + 1) + 1),
        range(m),
        F.lit(0.0),
    )
    approx = (
        encoded.join(q_cells, "cid")
        .filter((F.col("q_id") != F.col("c_id")) & (F.col("c_norm") > 0))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            ((F.col("q_dot_cent") + adc) / (F.col("q_norm") * F.col("c_norm"))).alias(
                "approx_cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        approx.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * rescore_factor)
        .select("query_id", "neighbor_id")
    )
    cv = _with_norm(corpus, id_col, vec_col, "c")
    q_plain = F.broadcast(_with_norm(queries, id_col, vec_col, "q"))
    rescored = (
        shortlist.join(cv, shortlist.neighbor_id == cv.c_id)
        .join(q_plain, shortlist.query_id == F.col("q_id"))
        .select(
            "query_id",
            "neighbor_id",
            trunc_digits(_cosine("q_vec", "c_vec", "q_norm", "c_norm")).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    num_centroids: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """K-means coarse quantizer trained with DataFrame ops.

    Init = the ``num_centroids`` lowest-id vectors (deterministic);
    each Lloyd iteration is one broadcast-join assignment + one
    groupBy mean — linear scans, no driver data movement beyond the
    centroid table itself (tiny).
    """
    vec = F.col(vec_col).cast("array<double>")
    points = corpus.select(F.col(id_col).alias("pid"), vec.alias("pvec"))
    dim = _infer_dim(corpus, vec_col)
    centroids = (
        points.orderBy("pid")
        .limit(num_centroids)
        .withColumn("cid", F.row_number().over(Window.orderBy("pid")) - 1)
        .select("cid", F.col("pvec").alias("cvec"))
    )
    for _ in range(iterations):
        dist = F.aggregate(
            F.zip_with(F.col("pvec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        assigned = (
            points.crossJoin(F.broadcast(centroids))
            .withColumn("dist", dist)
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("pid").orderBy(F.col("dist").asc(), F.col("cid").asc())
                ),
            )
            .filter(F.col("rn") == 1)
        )
        # new centroid = per-cell mean, dimension-wise (one groupBy,
        # map-side partials; centroid table stays tiny)
        updated = assigned.groupBy("cid").agg(
            F.array(
                *[F.avg(F.element_at(F.col("pvec"), i + 1)) for i in range(dim)]
            ).alias("cvec")
        )
        # materialize the (tiny) centroid table each round: without
        # this the lineage re-derives every prior Lloyd iteration on
        # each action — O(iterations²) work and an unbounded plan
        rows = [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in updated.collect()]
        centroids = corpus.sparkSession.createDataFrame(
            rows, "cid int, cvec array<double>"
        )
    return centroids


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    return int(row[0]["d"]) if row else 0


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[DataFrame] = None,
    metric: str = "l2",
) -> DataFrame:
    """IVF approximate top-k: (query_id, neighbor_id, rank, cosine).

    Corpus vectors are assigned to their nearest centroid cell once
    (broadcast join); each query probes its ``nprobe`` nearest cells,
    so the scored set is ~``nprobe/num_centroids`` of the corpus.

    ``metric`` picks the coarse-quantizer distance — ``"l2"`` (FAISS
    IVF default) or ``"cosine"`` (spherical cells; with pre-trained
    ``centroids`` every step is deterministic dot-product arithmetic,
    which is what lets the registered query's DuckDB oracle replicate
    the cell assignment exactly). Final neighbor scores are exact
    cosine either way.
    """
    if metric not in ("l2", "cosine"):
        raise ValueError(f"metric must be 'l2' or 'cosine', got {metric!r}")
    if centroids is None:
        centroids = train_ivf_centroids(corpus, num_centroids, id_col=id_col, vec_col=vec_col)
    cvec = F.col("cvec").cast("array<double>")
    cent = centroids.select(
        "cid",
        cvec.alias("cvec"),
        F.sqrt(
            F.aggregate(F.transform(cvec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        ).alias("cent_norm"),
    )
    cent = F.broadcast(cent)
    c = _with_norm(corpus, id_col, vec_col, "c")
    q = _with_norm(queries, id_col, vec_col, "q")

    def cell_rank(prefix: str) -> "F.Column":
        if metric == "cosine":
            score = _cosine(f"{prefix}_vec", "cvec", f"{prefix}_norm", "cent_norm")
            order = [score.desc(), F.col("cid").asc()]
        else:
            dist = F.aggregate(
                F.zip_with(F.col(f"{prefix}_vec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            order = [dist.asc(), F.col("cid").asc()]
        return F.row_number().over(Window.partitionBy(f"{prefix}_id").orderBy(*order))

    c_cells = (
        c.crossJoin(cent)
        .withColumn("rn", cell_rank("c"))
        .filter(F.col("rn") == 1)
        .select("c_id", "c_vec", "c_norm", "cid")
    )
    q_cells = (
        q.crossJoin(cent)
        .withColumn("rn", cell_rank("q"))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "q_vec", "q_norm", "cid")
    )
    scored = (
        c_cells.join(F.broadcast(q_cells), "cid")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            trunc_digits(_cosine("q_vec", "c_vec", "q_norm", "c_norm")).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    window = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# Artifact persistence — the production story for the quantized tiers.
# Codebooks/centroids are tiny driver-side artifacts trained once
# (offline, usually on a hash_sample) and shipped into every
# encode/search plan; these helpers make them durable. JSON carries
# the nested-list codebooks (Python json round-trips doubles exactly
# via repr), parquet carries the DataFrame-shaped artifacts
# (centroids, encoded corpora — parquet doubles/ints are exact), so a
# load-then-search is bit-identical to the in-process train-then-search.
# Paths are any Hadoop-FS URI (file:// in tests, s3a:// on a cluster).
# ---------------------------------------------------------------------------


def save_pq_codebooks(
    codebooks: List[List[List[float]]], path: str, spark=None
) -> None:
    """Persist PQ codebooks (``train_pq_codebooks`` output) as JSON."""
    import json

    from aws_data_wrangler_spark.s3._fs import open_s3_object

    payload = {
        "format": "pq_codebooks",
        "m": len(codebooks),
        "num_codes": len(codebooks[0]) if codebooks else 0,
        "sub": len(codebooks[0][0]) if codebooks and codebooks[0] else 0,
        "codebooks": codebooks,
    }
    with open_s3_object(path, "w", spark=spark) as f:
        json.dump(payload, f)


def load_pq_codebooks(path: str, spark=None) -> List[List[List[float]]]:
    """Load codebooks saved by ``save_pq_codebooks`` — validated shape,
    floats exact (json round-trips doubles via repr)."""
    import json

    from aws_data_wrangler_spark.s3._fs import open_s3_object

    with open_s3_object(path, "r", spark=spark) as f:
        payload = json.load(f)
    if payload.get("format") != "pq_codebooks":
        raise ValueError(f"not a pq_codebooks artifact: {path}")
    books = [
        [[float(x) for x in cent] for cent in book] for book in payload["codebooks"]
    ]
    if len(books) != payload["m"] or any(len(b) != payload["num_codes"] for b in books):
        raise ValueError(f"corrupt pq_codebooks artifact: {path}")
    return books


def save_ivf_centroids(centroids: DataFrame, path: str) -> None:
    """Persist an IVF centroid table (``train_ivf_centroids`` output,
    also the SemDeDup ``centroids=`` shape) as parquet."""
    centroids.select(
        F.col("cid").cast("int").alias("cid"),
        F.col("cvec").cast("array<double>").alias("cvec"),
    ).write.mode("overwrite").parquet(path)


def load_ivf_centroids(spark, path: str) -> DataFrame:
    """Load a centroid table saved by ``save_ivf_centroids``."""
    return spark.read.parquet(path).select("cid", "cvec")


def save_encoded_corpus(encoded: DataFrame, path: str) -> None:
    """Persist an encoded corpus table — ``pq_encode`` output
    (id, codes, approx_norm) or ``quantize_embeddings`` output
    (id, codes, scale) — as parquet, partition-parallel. At 100 TB
    this IS the index build: write once, every search after scans the
    ~16-32× smaller code table instead of the float corpus."""
    encoded.write.mode("overwrite").parquet(path)


def load_encoded_corpus(spark, path: str) -> DataFrame:
    """Load a table saved by ``save_encoded_corpus`` (pass to
    ``pq_topk(encoded=...)`` / ``sq8_topk(quantized=...)``)."""
    return spark.read.parquet(path)
