"""Distributed trainable quality classifier (fasttext-style).

The quality-filter stage of large corpus pipelines that the heuristic
gates (``text.with_quality_score``, ``text.with_gopher_flags``) cannot
cover: a logistic-regression scorer over hashed bag-of-words/bigram
features, trained with full-batch (or deterministic mini-batch)
gradient descent expressed ENTIRELY as DataFrame aggregates — no
driver-side data movement beyond the per-iteration bias scalar and no
Python in the row path.

Plan shape, built for 100 TB: featurization is a projection + explode
(distinct (doc, feature) pairs, sharded by feature hash); each
training iteration is two shuffles over the feature-pair table — the
margin aggregate (groupBy doc) and the gradient aggregate (groupBy
feature, map-side partials) — joined against a weight table that is
bounded by the number of DISTINCT observed features (≤ 2^18 by
construction), never the corpus. Mini-batching composes with the
deterministic hash sampler, so every batch is reproducible on any
cluster. The weight table is localCheckpoint'd per iteration (the
cluster_pairs lineage discipline) so the plan stays flat across
iterations.

Training is iterative and its float sums reassociate across
partitions, so — like k-means ANN and BPE — it carries no cross-engine
SQL oracle; correctness is pinned by learning planted rules in the
unit tests (holdout accuracy, artifact reuse).

Ref: the reference has no model-training surface (awswrangler defers
to pandas/sklearn single-node); semantics follow the standard hashed
bag-of-n-grams linear classifier of corpus quality filtering.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_data_wrangler_spark.functions import trunc_digits


class QualityClassifier(NamedTuple):
    """Trained artifact: the sparse weight table plus the parameters a
    scorer must reuse — hashing features with a different space or
    n-gram setting would silently score garbage, so ``score_quality``
    takes the whole artifact, not a bare table."""

    weights: DataFrame  # (feature bigint, weight double)
    bias: float
    num_features: int
    use_bigrams: bool
    token_hash: str = "xxhash64"


def hashed_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 18,
    use_bigrams: bool = True,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Distinct (id, feature) pairs: tokens (and adjacent-token bigrams)
    hashed into ``[0, num_features)`` — binary presence features, the
    robust default for text quality models. Pure projection + explode;
    within-doc dedup happens BEFORE the explode so no global distinct
    shuffle is needed.

    ``token_hash="md5"`` swaps the (faster) xxhash64 for the md5-prefix
    hash that has a literal DuckDB twin — the simhash convention
    (``('0x' || substr(md5(tok), 1, 15))::BIGINT % num_features``) —
    so a scorer built on it is oracle-replicable end-to-end. Bigrams
    hash the two tokens joined by an 0x1f unit separator."""
    if token_hash not in ("xxhash64", "md5"):
        raise ValueError(f"token_hash must be 'xxhash64' or 'md5', got {token_hash!r}")

    def _h(*cols):
        if token_hash == "xxhash64":
            return F.pmod(F.xxhash64(*cols), F.lit(num_features))
        joined = cols[0] if len(cols) == 1 else F.concat_ws("\x1f", *cols)
        return F.pmod(
            F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long"),
            F.lit(num_features),
        )

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), toks.alias("__toks"))
    t = F.col("__toks")
    unigram_feats = F.transform(t, lambda x: _h(x))
    if use_bigrams:
        n = F.size(t)
        bigram_feats = F.when(
            n > 1,
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: _h(
                    F.element_at(t, (i + 1).cast("int")),
                    F.element_at(t, (i + 2).cast("int")),
                ),
            ),
        ).otherwise(F.array())
        feats = F.concat(unigram_feats, bigram_feats)
    else:
        feats = unigram_feats
    return base.select(
        F.col(id_col), F.explode(F.array_distinct(feats)).alias("feature")
    )


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 18,
    use_bigrams: bool = True,
    token_hash: str = "xxhash64",
    iterations: int = 20,
    learning_rate: float = 2.0,
    l2: float = 1e-6,
    batch_fraction: Optional[float] = None,
    class_weight: Optional[str] = None,
) -> QualityClassifier:
    """Train the logistic scorer: ``label_col`` is 0/1 (1 = keep-worthy).

    Full-batch gradient descent by default; ``batch_fraction`` switches
    to deterministic mini-batches drawn with the hash sampler (salted
    by iteration number) — the same batch on every run and cluster.
    Feature pairs are computed once and cached; each iteration touches
    the pair table twice (margin + gradient) and the tiny weight table.

    ``class_weight="balanced"`` reweights each example by
    ``n / (2 · n_class)`` (sklearn's balanced rule) — essential in the
    realistic quality-filter regime where keep-worthy documents are a
    small minority of a crawl and an unweighted fit collapses onto the
    majority class. Weights come from ONE count aggregate over the
    full label table (mini-batches reuse them).

    Rows with a NULL label are dropped before training (an unlabeled
    document is not a training example); a single-class input raises
    — a logistic fit with no contrast is degenerate, and silently
    returning one would score every document identically.
    """
    if class_weight not in (None, "balanced"):
        raise ValueError(f"class_weight must be None or 'balanced', got {class_weight!r}")
    feats = hashed_features(df, id_col, text_col, num_features, use_bigrams, token_hash).cache()
    labels = df.select(
        F.col(id_col), F.col(label_col).cast("double").alias("__y")
    ).filter(F.col("__y").isNotNull())
    counts = {
        float(r["__y"]): int(r["n"])
        for r in labels.groupBy("__y").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    missing = {0.0, 1.0} - set(counts)
    if missing:
        raise ValueError(
            f"{label_col} has no non-NULL examples of class(es) "
            f"{sorted(int(v) for v in missing)}: a single-class fit is degenerate"
        )
    if class_weight == "balanced":
        n_total = sum(counts.values())
        w_pos = n_total / (2.0 * counts[1.0])
        w_neg = n_total / (2.0 * counts[0.0])
        labels = labels.withColumn(
            "__w", F.when(F.col("__y") == 1.0, F.lit(w_pos)).otherwise(F.lit(w_neg))
        )
    else:
        labels = labels.withColumn("__w", F.lit(1.0))
    bias = 0.0
    # sparse init: only observed features ever get weights; start at 0
    weights = (
        feats.select("feature").distinct().withColumn("weight", F.lit(0.0)).localCheckpoint()
    )
    for it in range(iterations):
        it_labels = labels
        if batch_fraction is not None and batch_fraction < 1.0:
            from aws_data_wrangler_spark.operators.sampling import hash_sample

            it_labels = hash_sample(labels, batch_fraction, id_col=id_col, salt=f"it{it}")
        it_feats = feats.join(it_labels.select(id_col), id_col, "left_semi")
        margins = (
            it_feats.join(weights, "feature")
            .groupBy(id_col)
            .agg(F.sum("weight").alias("__margin"))
        )
        resid = (
            it_labels.join(margins, id_col, "left")
            .select(
                F.col(id_col),
                (
                    F.col("__w")
                    * (
                        F.lit(1.0)
                        / (F.lit(1.0) + F.exp(-(F.coalesce(F.col("__margin"), F.lit(0.0)) + F.lit(bias))))
                        - F.col("__y")
                    )
                ).alias("__resid"),
                F.col("__w"),
            )
        )
        # weighted batch size: with class_weight=None every __w is 1.0,
        # so wsum is exactly the row count (same doubles as before)
        n_stats = resid.agg(
            F.sum("__w").alias("wsum"), F.sum("__resid").alias("rsum")
        ).collect()[0]
        denom = float(max(n_stats["wsum"] or 0.0, 1.0))
        grad = (
            it_feats.join(resid, id_col)
            .groupBy("feature")
            .agg((F.sum("__resid") / F.lit(denom)).alias("__g"))
        )
        # every weight decays (l2); only features in the batch get a
        # gradient step — the sparse-update shape of hashed-feature LR
        new_weights = (
            weights.join(grad, "feature", "left")
            .select(
                "feature",
                (
                    F.col("weight") * F.lit(1.0 - learning_rate * l2)
                    - F.lit(learning_rate) * F.coalesce(F.col("__g"), F.lit(0.0))
                ).alias("weight"),
            )
            .localCheckpoint()
        )
        weights = new_weights
        bias -= learning_rate * float(n_stats["rsum"] or 0.0) / denom
    feats.unpersist()
    return QualityClassifier(weights, bias, num_features, use_bigrams, token_hash)


def score_quality(
    df: DataFrame,
    model: QualityClassifier,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Attach the model's keep probability to every document: feature
    join + per-doc weight sum + sigmoid (one shuffle on the feature
    pairs; the weight table joins by feature hash). Scores are 6dp
    floor-truncated like every per-row float output."""
    feats = hashed_features(
        df, id_col, text_col, model.num_features, model.use_bigrams,
        model.token_hash,
    )
    margins = (
        feats.join(model.weights, "feature")
        .groupBy(id_col)
        .agg(F.sum("weight").alias("__margin"))
    )
    prob = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(-(F.coalesce(F.col("__margin"), F.lit(0.0)) + F.lit(model.bias)))
    )
    return (
        df.join(margins, id_col, "left")
        .withColumn(out_col, trunc_digits(prob, 6))
        .drop("__margin")
    )
