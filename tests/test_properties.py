"""Property-based tests (hypothesis) for the custom operators.

Each property pits a distributed operator against an obviously-correct
single-node reference implementation on randomized small inputs —
the cases unit tests miss (ties, empty groups, boundary timestamps).
Spark jobs are slow per example, so max_examples stays small; the
strategies are chosen to hit edge cases densely (duplicate keys, equal
timestamps, single-token docs).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# timestamps as small epoch-second ints → lots of exact collisions
ts_strategy = st.integers(min_value=0, max_value=50)
key_strategy = st.integers(min_value=0, max_value=3)


@settings(**SETTINGS)
@given(
    left=st.lists(st.tuples(key_strategy, ts_strategy), min_size=1, max_size=15),
    right=st.lists(st.tuples(key_strategy, ts_strategy), min_size=1, max_size=15),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    from aws_data_wrangler_spark.operators import joins

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, lid long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    # dedup right per (k, ts): asof_join resolves equal-time ties to the
    # max payload; pre-deduping makes the pandas comparison exact
    rrows = {}
    for j, (k, t) in enumerate(right):
        rrows[(k, t)] = max(rrows.get((k, t), -1), j)
    rdf = spark.createDataFrame(
        [(k, t, rid) for (k, t), rid in rrows.items()], "k long, ts long, rid long"
    ).withColumn("ts", F.timestamp_seconds("ts"))

    out = joins.asof_join(ldf, rdf, on="k", right_cols=["rid"], how="left")
    got = {
        (r["k"], r["ts"].timestamp(), r["lid"]): r["rid"]
        for r in out.collect()
    }

    lp = pd.DataFrame(
        [(k, pd.Timestamp(t, unit="s"), i) for i, (k, t) in enumerate(left)],
        columns=["k", "ts", "lid"],
    ).sort_values(["ts", "lid"])
    rp = pd.DataFrame(
        [(k, pd.Timestamp(t, unit="s"), rid) for (k, t), rid in rrows.items()],
        columns=["k", "ts", "rid"],
    ).sort_values(["ts", "rid"])
    expected = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for _, row in expected.iterrows():
        key = (row["k"], row["ts"].timestamp(), row["lid"])
        want = None if pd.isna(row["rid"]) else int(row["rid"])
        assert got[key] == want, (key, got[key], want)

    # direction="nearest" must match pandas too (closer side wins,
    # equidistant → backward — the shared tie rule)
    near = joins.asof_join(
        ldf, rdf, on="k", right_cols=["rid"], how="left", direction="nearest"
    )
    got_n = {
        (r["k"], r["ts"].timestamp(), r["lid"]): r["rid"] for r in near.collect()
    }
    expected_n = pd.merge_asof(lp, rp, on="ts", by="k", direction="nearest")
    for _, row in expected_n.iterrows():
        key = (row["k"], row["ts"].timestamp(), row["lid"])
        want = None if pd.isna(row["rid"]) else int(row["rid"])
        assert got_n[key] == want, (key, got_n[key], want)


@settings(**SETTINGS)
@given(
    left=st.lists(ts_strategy, min_size=1, max_size=12),
    right=st.lists(ts_strategy, min_size=1, max_size=12),
    window=st.integers(min_value=1, max_value=20),
)
def test_interval_join_matches_bruteforce(spark, left, right, window):
    from aws_data_wrangler_spark.operators import joins

    ldf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(left)], "lid long, ts long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(right)], "rid long, ts long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    out = joins.interval_join_bucketed(ldf, rdf, "ts", "ts", window_seconds=float(window))
    got = {(r["l_lid"], r["r_rid"]) for r in out.collect()}
    want = {
        (i, j)
        for i, lt in enumerate(left)
        for j, rt in enumerate(right)
        if lt <= rt < lt + window
    }
    assert got == want


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["a", "bb", "ccc", "dddd"]), min_size=0, max_size=12).map(
            " ".join
        ),
        min_size=1,
        max_size=8,
    ),
    chunk=st.integers(min_value=1, max_value=6),
)
def test_chunk_tokens_covers_everything_in_order(spark, texts, chunk):
    """Every token appears in some chunk; concatenating stride-aligned
    chunks with overlap removed reconstructs the document."""
    from aws_data_wrangler_spark.operators import text as text_ops

    stride = max(1, chunk - 1)
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    chunks = text_ops.chunk_tokens(df, chunk_size=chunk, stride=stride).collect()
    by_doc = {}
    for r in sorted(chunks, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in enumerate(texts):
        toks = text.split() if text.strip() else []
        if not toks:
            assert doc_id not in by_doc
            continue
        rows = by_doc[doc_id]
        # stitch: first chunk whole, then drop the (chunk - stride) overlap
        stitched = rows[0]["chunk_text"].split()
        for r in rows[1:]:
            stitched.extend(r["chunk_text"].split()[chunk - stride:])
        assert stitched == toks, (doc_id, stitched, toks)
        assert all(r["n_tokens"] == len(r["chunk_text"].split()) for r in rows)


# recursive Athena DDL type strategy: primitives at the leaves,
# decimal/array/map/struct composites above them
_athena_primitive = st.sampled_from(
    ["boolean", "tinyint", "smallint", "int", "bigint", "float", "double",
     "string", "binary", "date", "timestamp"]
)
_athena_decimal = st.tuples(
    st.integers(min_value=1, max_value=38), st.integers(min_value=0, max_value=10)
).map(lambda ps: f"decimal({ps[0]},{min(ps[1], ps[0])})")
_athena_type = st.recursive(
    st.one_of(_athena_primitive, _athena_decimal),
    lambda children: st.one_of(
        children.map(lambda c: f"array<{c}>"),
        st.tuples(st.sampled_from(["string", "int", "bigint"]), children).map(
            lambda kv: f"map<{kv[0]},{kv[1]}>"
        ),
        st.lists(
            st.tuples(st.sampled_from(["a", "b", "c", "d"]), children),
            min_size=1, max_size=3,
            unique_by=lambda kv: kv[0],
        ).map(lambda fs: "struct<" + ",".join(f"{k}:{v}" for k, v in fs) + ">"),
    ),
    max_leaves=6,
)


@settings(max_examples=60, deadline=None)
@given(dtype=_athena_type)
def test_athena_spark_type_mapping_roundtrips(dtype):
    """spark2athena(athena2spark(t)) == t for every representable
    Athena DDL type, arbitrarily nested (no Spark session needed —
    the mapper is pure)."""
    from aws_data_wrangler_spark import _data_types

    spark_type = _data_types.athena2spark(dtype)
    assert _data_types.spark2athena(spark_type) == dtype


@settings(**SETTINGS)
@given(ids=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60, unique=True))
def test_hash_sample_is_stable_subset_chain(spark, ids):
    """Monotone property: fraction f1 <= f2 ⇒ sample(f1) ⊆ sample(f2);
    and sampling is invariant to partitioning/order."""
    from aws_data_wrangler_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    small = {r["doc_id"] for r in sampling.hash_sample(df, 0.3).collect()}
    big = {r["doc_id"] for r in sampling.hash_sample(df, 0.7).collect()}
    assert small <= big
    shuffled = df.repartition(7)
    again = {r["doc_id"] for r in sampling.hash_sample(shuffled, 0.3).collect()}
    assert again == small


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=20), min_size=1, max_size=12
    )
)
def test_dsir_score_partition_and_engine_invariant(spark, texts):
    """DSIR scores are a pure function of content: invariant to input
    partitioning, and the position-ordered fold matches a sequential
    python replica bit-for-bit."""
    import hashlib

    from aws_data_wrangler_spark.operators import sampling

    B = 16
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    lrs = [((b * 37) % 11 - 5) / 7.0 for b in range(B)]
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in sampling.dsir_score(df, lrs).collect()
    }
    again = {
        r["doc_id"]: r["dsir_score"]
        for r in sampling.dsir_score(df.repartition(5), lrs).collect()
    }
    assert got == again
    for i, t in enumerate(texts):
        toks = [x for x in t.strip().lower().split() if x]
        acc = 0.0
        for g in toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]:
            h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            acc = acc + lrs[h % B]
        assert got[i] == acc


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=9),
        min_size=1,
        max_size=6,
    )
)
def test_duplicated_spans_matches_bruteforce(spark, docs):
    """duplicated_spans vs an obviously-correct single-node reference:
    k-grams with positions, cross-doc df >= 2, interval union with the
    gap-adjacency merge rule. A 5-word vocabulary makes duplicated
    k-grams dense, hitting overlap/adjacency/merge edges constantly."""
    from aws_data_wrangler_spark.operators import dedup

    k = 3
    sdf = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in dedup.duplicated_spans(sdf, k=k).collect()
    }

    grams = {}  # gram -> set of docs
    positions = {}  # doc -> [pos...]
    for i, toks in enumerate(docs):
        for p in range(len(toks) - k + 1):
            g = tuple(toks[p : p + k])
            grams.setdefault(g, set()).add(i)
            positions.setdefault(i, []).append((p, g))
    expected = set()
    for i, plist in positions.items():
        dup_pos = sorted(p for p, g in plist if len(grams[g]) >= 2)
        spans = []
        for p in dup_pos:
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + k - 1))
            else:
                spans.append((p, p + k - 1))
        for s, e in spans:
            expected.add((i, s, e, e - s + 1))
    assert got == expected


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "", "  "]), min_size=1, max_size=6),
        min_size=1,
        max_size=6,
    )
)
def test_remove_duplicated_lines_matches_bruteforce(spark, docs):
    """remove_duplicated_lines vs an obviously-correct single-node
    reference: distinct-doc line frequency, strict every-occurrence
    removal of eligible (non-blank) duplicated lines, order-preserving
    reassembly. A 3-word vocabulary plus blank/whitespace lines makes
    cross-doc duplicates and the eligibility rule fire constantly."""
    from aws_data_wrangler_spark.operators import dedup

    sdf = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in dedup.remove_duplicated_lines(sdf).collect()
    }

    df_count = {}  # line -> number of distinct docs containing it
    for i, lines in enumerate(docs):
        for line in set(lines):
            if len(line.strip()) >= 1:
                df_count[line] = df_count.get(line, 0) + 1
    expected = {}
    for i, lines in enumerate(docs):
        kept = [ln for ln in lines if df_count.get(ln, 0) < 2]
        removed = len(lines) - len(kept)
        expected[i] = ("\n".join(kept), len(lines), removed)
    assert got == expected


@settings(**SETTINGS)
@given(
    vecs=st.lists(
        st.tuples(
            st.floats(min_value=-5, max_value=5, allow_nan=False),
            st.floats(min_value=-5, max_value=5, allow_nan=False),
        ),
        min_size=2,
        max_size=25,
    ),
    per_cell=st.integers(min_value=1, max_value=4),
)
def test_cluster_balanced_sample_invariants(spark, vecs, per_cell):
    """Per-cell quota exact, ranks dense, partition-invariant, and the
    prefiltered draw identical to the full draw on arbitrary inputs."""
    from aws_data_wrangler_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, list(v)) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [3.0, 0.0]), (1, [-3.0, 0.0]), (2, [0.0, 3.0])],
        "cid int, cvec array<double>",
    )
    out = sorted(
        map(tuple, sampling.cluster_balanced_sample(df, cents, per_cell).collect())
    )
    # quota + dense ranks per cell
    per = {}
    for _, cid, rank in out:
        per.setdefault(cid, []).append(rank)
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= per_cell
    # partition invariance
    again = sorted(
        map(
            tuple,
            sampling.cluster_balanced_sample(df.repartition(5), cents, per_cell).collect(),
        )
    )
    assert again == out
    # prefilter changes the plan, never the result
    fast = sorted(
        map(
            tuple,
            sampling.cluster_balanced_sample(
                df, cents, per_cell, prefilter=True
            ).collect(),
        )
    )
    assert fast == out


@settings(**SETTINGS)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=100_000), min_size=1, max_size=40, unique=True),
    num_shards=st.integers(min_value=1, max_value=6),
)
def test_shard_assignment_disjoint_exhaustive_dense(spark, ids, num_shards):
    """Every doc lands in exactly one shard; in-shard positions are
    dense 1..n — the invariant pretraining_shard_export's manifest
    (max_pos == n_docs) certifies at the aggregate level."""
    from aws_data_wrangler_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = sampling.deterministic_shuffle(df, num_shards=num_shards).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(ids)  # exhaustive, no dupes
    per = {}
    for r in rows:
        assert 0 <= r["shard"] < num_shards
        per.setdefault(r["shard"], []).append(r["pos"])
    for poss in per.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


@settings(**SETTINGS)
@given(
    exact=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=20, unique=True
    ),
    approx=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=0, max_size=20, unique=True
    ),
)
def test_recall_at_k_matches_set_arithmetic(spark, exact, approx):
    from aws_data_wrangler_spark.operators import similarity

    e_df = spark.createDataFrame(exact, "query_id int, neighbor_id int")
    a_df = spark.createDataFrame(
        approx or [(99, 99)], "query_id int, neighbor_id int"
    )
    rows = {
        r["query_id"]: (r["n_exact"], r["n_hit"], r["recall"])
        for r in similarity.recall_at_k(a_df, e_df).collect()
    }
    a_set = set(approx)
    per_q = {}
    for q, n in exact:
        per_q.setdefault(q, []).append(n)
    assert set(rows) == set(per_q)  # every truth query present, none invented
    for q, ns in per_q.items():
        hits = sum(1 for n in ns if (q, n) in a_set)
        assert rows[q] == (len(ns), hits, hits / len(ns))


@settings(**SETTINGS)
@given(
    keys=st.lists(st.sampled_from(list("abcdefgh")), min_size=1, max_size=40),
    splits=st.integers(min_value=2, max_value=4),
)
def test_cms_never_undercounts_and_merge_commutes(spark, keys, splits):
    """Count-Min invariants against a python reference: (1) the merged
    counter table equals the single-pass table cell-for-cell under any
    batching (integer sums commute), (2) every point estimate is
    >= the true count (the one-sided CMS guarantee), and (3) with the
    width forced tiny the per-row bucket mass always sums to N."""
    import hashlib

    from aws_data_wrangler_spark.operators import profiling

    depth, width = 3, 8  # tiny width -> forced collisions
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "i long, k string"
    ).withColumn("b", F.col("i") % splits)
    single = profiling.cms_union(
        profiling.cms_sketches(df, "k", depth=depth, width=width)
    )
    merged = profiling.cms_union(
        profiling.cms_sketches(df, "k", depth=depth, width=width, batch_col="b")
    )
    cell = lambda rows: sorted((r["row_i"], r["bucket"], r["cnt"]) for r in rows)
    assert cell(merged.collect()) == cell(single.collect())
    # python reference counter table from the same md5 hash
    ref = {}
    for k in keys:
        for i in range(depth):
            h = int(hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:15], 16) % width
            ref[(i, h)] = ref.get((i, h), 0) + 1
    assert cell(merged.collect()) == sorted((i, b, c) for (i, b), c in ref.items())
    true = {k: keys.count(k) for k in set(keys)}
    est = {
        r["value"]: r["cms_est"]
        for r in profiling.cms_estimates(merged, df.select("k"), "k").collect()
    }
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t
        assert est[k] == min(ref[(i, int(hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:15], 16) % width)] for i in range(depth))


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=3, max_size=10),
        min_size=2,
        max_size=5,
    )
)
def test_containment_dominates_jaccard_and_matches_sets(spark, docs):
    """Directed containment against python set arithmetic: for every
    ordered pair C(A,B) = |A∩B|/|A| (floor 6dp), and containment
    always dominates the symmetric Jaccard of the same pair (the
    reason it catches subset-duplicates resemblance misses)."""
    import math

    from aws_data_wrangler_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["id_contained"], r["id_container"]): r["containment"]
        for r in dedup.containment_pairs(
            df, n=3, threshold=0.0, max_doc_frequency=None
        ).collect()
    }
    sets = {
        i: {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        for i, toks in enumerate(docs)
    }
    want = {}
    for a in sets:
        for b in sets:
            if a != b and sets[a] & sets[b]:
                c = len(sets[a] & sets[b]) / len(sets[a])
                want[(a, b)] = math.floor(c * 1e6) / 1e6
    assert got == want
    for (a, b), c in want.items():
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        assert c >= math.floor(j * 1e6) / 1e6


@settings(**SETTINGS)
@given(
    series=st.lists(st.integers(min_value=1, max_value=20), min_size=1, max_size=12),
)
def test_holt_matches_python_fold_and_is_constant_stable(spark, series):
    """Holt against a sequential python fold bit-for-bit (the oracle
    contract), plus the fixed-point property: a constant series yields
    level == the constant, trend == 0, forecast == the constant."""
    import math

    from aws_data_wrangler_spark.operators import timeseries

    rows = []
    for h, n in enumerate(series):
        rows += [("k", h * 3600)] * n
    df = spark.createDataFrame(rows, "event_type string, sec long").select(
        "event_type", F.timestamp_seconds("sec").alias("ts")
    )
    out = timeseries.holt_linear(df, alpha=0.25, beta=0.25).collect()[0]
    l, b = float(series[0]), 0.0
    for n in series[1:]:
        l, b = n * 0.25 + (l + b) * 0.75, (n - l) * 0.0625 + b * 0.9375
    assert out["level"] == math.floor(l * 1e6) / 1e6
    assert out["trend"] == math.floor(b * 1e6) / 1e6
    assert out["forecast_next"] == math.floor((l + b) * 1e6) / 1e6
    const = timeseries.holt_linear(
        df.select("event_type", F.timestamp_seconds(F.lit(0)).alias("ts"))
    ).collect()[0]
    assert const["trend"] == 0.0
    assert const["level"] == const["forecast_next"] == float(len(rows))


@settings(**SETTINGS)
@given(
    a_keys=st.lists(st.sampled_from(list("abcdefgh")), min_size=0, max_size=30),
    b_keys=st.lists(st.sampled_from(list("abcdefgh")), min_size=0, max_size=30),
    width=st.sampled_from([4, 16, 64]),
)
def test_cms_join_size_matches_python_inner_product(spark, a_keys, b_keys, width):
    """The CM inner-product estimate against a python md5 reference on
    random key multisets and forced-collision widths: the product-min
    matches bit-for-bit (integer arithmetic), it never undercounts the
    true equi-join cardinality, and empty sides report truthful
    totals."""
    import hashlib

    from aws_data_wrangler_spark.operators import profiling

    depth = 3
    spark_df = lambda keys: spark.createDataFrame(
        [(k,) for k in keys], "k string"
    )
    sk = lambda keys: profiling.cms_sketches(spark_df(keys), "k", depth=depth, width=width)
    got = profiling.cms_join_size(sk(a_keys), sk(b_keys)).collect()[0]
    tables = []
    for keys in (a_keys, b_keys):
        t = {}
        for k in keys:
            for i in range(depth):
                h = int(hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:15], 16) % width
                t[(i, h)] = t.get((i, h), 0) + 1
        tables.append(t)
    ta, tb = tables
    if not a_keys or not b_keys:
        assert tuple(got) == (0, len(a_keys), len(b_keys))
        return
    ref = min(
        sum(ca * tb.get((i, bk), 0) for (ri, bk), ca in ta.items() if ri == i)
        for i in range(depth)
    )
    true_join = sum(a_keys.count(k) * b_keys.count(k) for k in set(a_keys))
    assert got["join_size_est"] == ref
    assert got["join_size_est"] >= true_join
    assert (got["n_a"], got["n_b"]) == (len(a_keys), len(b_keys))


@settings(**SETTINGS)
@given(
    ids=st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=40)),
        min_size=1,
        max_size=30,
    ),
    fracs=st.dictionaries(
        st.sampled_from(["s0", "s1", "s2"]),
        st.sampled_from([0.0, 0.3, 0.5, 1.0]),
        max_size=3,
    ),
    default=st.sampled_from([0.0, 0.5, 1.0]),
)
def test_stratified_sample_matches_python_keep_rule(spark, ids, fracs, default):
    """The broadcast-join rewrite against a pure-python replica of the
    ORIGINAL when-chain/_keep semantics, NULL ids included: keep-all
    strata keep NULL-id rows (the lit(True) fast path), fractional
    strata drop them (NULL md5 coin), drop-all drops everything."""
    import hashlib

    from aws_data_wrangler_spark.operators import sampling

    rows = [(i, doc_id, f"s{(i % 4)}") for i, doc_id in enumerate(ids)]
    df = spark.createDataFrame(rows, "rid long, doc_id long, source string")
    kept = {
        r["rid"]
        for r in sampling.stratified_sample(
            df, fracs, default_fraction=default
        ).collect()
    }
    expect = set()
    for rid, doc_id, src in rows:
        frac = fracs.get(src, default)
        if frac >= 1.0:
            expect.add(rid)
        elif frac <= 0.0 or doc_id is None:
            pass  # drop-all, or NULL coin on a fractional stratum
        else:
            prefix = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
            if prefix < format(int(round(frac * 16**8)), "08x"):
                expect.add(rid)
    assert kept == expect


@settings(**SETTINGS)
@given(
    series=st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=40),
    period=st.integers(min_value=2, max_value=6),
)
def test_holt_winters_matches_python_fold_through_the_spine(spark, series, period):
    """Holt-Winters against a sequential python fold bit-for-bit (the
    oracle contract), THROUGH the zero-fill spine: hours with zero
    events emit no input rows, the wrapper re-densifies them, and the
    reference folds the explicit zero-trimmed dense series."""
    import math

    from hypothesis import assume

    from aws_data_wrangler_spark.operators import timeseries

    assume(any(series))
    rows = []
    for h, n in enumerate(series):
        rows += [("k", h * 3600)] * n
    df = spark.createDataFrame(rows, "event_type string, sec long").select(
        "event_type", F.timestamp_seconds("sec").alias("ts")
    )
    out = timeseries.holt_winters(df, period=period).collect()[0]
    # reference: the spine spans [first, last] NON-EMPTY buckets
    first = next(i for i, n in enumerate(series) if n)
    last = max(i for i, n in enumerate(series) if n)
    dense = [float(n) for n in series[first:last + 1]]
    l, b, t = dense[0], 0.0, 1.0
    s = [0.0] * period
    for x in dense[1:]:
        slot = int(t) % period
        sp = s[slot]
        l_new = (x - sp) * 0.25 + (l + b) * 0.75
        b_new = (x - sp - l) * 0.0625 + b * 0.9375
        s[slot] = (x - l - b) * 0.1875 + sp * 0.8125
        l, b, t = l_new, b_new, t + 1.0
    tr = lambda v: math.floor(v * 1e6) / 1e6
    assert out["n_buckets"] == len(dense)
    assert out["level"] == tr(l)
    assert out["trend"] == tr(b)
    assert out["forecast_next"] == tr(l + b + s[int(t) % period])
    assert out["season_range"] == tr(max(s) - min(s))


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=14),
        min_size=1,
        max_size=6,
    ),
    evals=st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=2, max_size=8),
        min_size=1,
        max_size=3,
    ),
)
def test_remove_contaminated_spans_matches_bruteforce(spark, docs, evals):
    """Span excision against an obviously-correct python reference on
    a 6-word vocabulary (dense overlap, overlapping hits, full- and
    zero-contamination cases): clean text, token/span counts, and the
    byte-preservation rule for untouched docs."""
    from aws_data_wrangler_spark.operators import text

    n = 2
    train = spark.createDataFrame(
        [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100 + j, " ".join(f"w{t}" for t in toks)) for j, toks in enumerate(evals)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in text.remove_contaminated_spans(train, eval_df, n=n).collect()
    }
    eval_grams = {
        tuple(toks[i : i + n]) for toks in evals for i in range(len(toks) - n + 1)
    }
    for i, toks in enumerate(docs):
        raw = " ".join(f"w{t}" for t in toks)
        hits = [
            p for p in range(len(toks) - n + 1)
            if tuple(toks[p : p + n]) in eval_grams
        ]
        covered = sorted({j for p in hits for j in range(p, p + n)})
        spans = sum(
            1 for x, j in enumerate(covered) if x == 0 or covered[x - 1] < j - 1
        )
        kept = " ".join(
            f"w{t}" for j, t in enumerate(toks) if j not in set(covered)
        )
        r = got[i]
        assert r["total_tokens"] == len(toks)
        assert r["n_tokens_removed"] == len(covered)
        assert r["n_spans_removed"] == spans
        # byte-preservation for untouched docs; kept-token join otherwise
        assert r["clean_text"] == (raw if not covered else kept)


@settings(**SETTINGS)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=40),
    batches=st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=40),
)
def test_kmv_matches_python_md5_reference_under_random_batching(spark, keys, batches):
    """KMV against hashlib set arithmetic on random multisets with a
    random batch assignment: the batched-then-unioned mins array must
    equal the python k smallest distinct hashes BIT-FOR-BIT (the
    prune-invariance claim), n_rows must sum exactly, and the
    estimator — exact below k, (k-1)*2^60/h_k above — must equal the
    python computation of the same IEEE chain."""
    import hashlib
    import math

    from aws_data_wrangler_spark.operators import profiling

    k = 8  # small enough that random inputs land on BOTH sides of k
    rows = [(str(v), batches[i % len(batches)]) for i, v in enumerate(keys)]
    df = spark.createDataFrame(rows, "v string, b long")
    sk = profiling.kmv_sketches(df, ["v"], k=k, batch_col="b")
    est = profiling.kmv_estimates(sk).collect()[0]
    ref = sorted(
        int(hashlib.md5(f"kmv:{v}".encode()).hexdigest()[:15], 16)
        for v in {str(v) for v in keys}
    )
    merged = profiling.kmv_union(sk).collect()[0]
    assert list(merged["mins"]) == ref[:k]
    assert merged["n_rows"] == est["n_rows"] == len(keys)
    if len(ref) < k:
        assert est["n_distinct_est"] == len(ref)
    else:
        assert est["n_distinct_est"] == int(
            math.floor(float((k - 1) * 16**15) / float(ref[k - 1]))
        )


@settings(**SETTINGS)
@given(
    counts=st.dictionaries(
        st.sampled_from([f"s{i}" for i in range(8)]),
        st.integers(min_value=1, max_value=5_000),
        min_size=1,
        max_size=8,
    ),
    target=st.one_of(st.none(), st.integers(min_value=0, max_value=10_000)),
    alpha=st.sampled_from([0.5, 1.0]),  # the guaranteed-parity forms
)
def test_temperature_thresholds_match_python_fractions_bitwise(
    spark, counts, target, alpha
):
    """The r12 distributed rewrite (VERDICT r11 #4) against the
    driver-side fold under the shared quantized-micro convention:
    ``temperature_thresholds`` over a counts DataFrame must produce
    fraction doubles BIT-IDENTICAL to ``temperature_fractions`` over
    the same dict — the micro total is an exact integer sum on both
    paths, every derived step the same IEEE operation tree. A NULL
    stratum row rides along to prove it is excluded from the totals
    on the distributed path exactly as documented."""
    import struct

    from aws_data_wrangler_spark.operators import sampling

    rows = [(s, n) for s, n in counts.items()] + [(None, 7)]
    cdf = spark.createDataFrame(rows, "source string, n long")
    got = {
        r["source"]: r["fraction"]
        for r in sampling.temperature_thresholds(
            cdf, alpha=alpha, target_rows=target
        ).collect()
    }
    want = sampling.temperature_fractions(counts, alpha=alpha, target_rows=target)
    assert set(got) == set(want)  # NULL stratum excluded
    for s in want:
        assert struct.pack("<d", got[s]) == struct.pack("<d", want[s]), (
            s, got[s].hex(), want[s].hex(),
        )


@settings(**SETTINGS)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=100_000),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    target=st.one_of(st.none(), st.integers(min_value=0, max_value=60)),
)
def test_temperature_sample_matches_python_replica(spark, ids, target):
    """End-to-end distributed temperature_sample vs a pure-python
    replica: quantized-micro fractions (shared convention), hex
    thresholds from the fraction, md5-prefix coin per row. The python
    threshold uses round-half-even where Spark rounds HALF_UP — they
    differ only when fraction*2^32 lands exactly on .5, unreachable
    from these divisions (and asserted so)."""
    import hashlib

    from aws_data_wrangler_spark.operators import sampling

    rows = [(doc_id, f"s{doc_id % 3}") for doc_id in ids]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = {
        r["doc_id"]
        for r in sampling.temperature_sample(
            df, strata_col="source", alpha=0.5, target_rows=target
        ).collect()
    }
    counts = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    fracs = sampling.temperature_fractions(counts, alpha=0.5, target_rows=target)
    expect = set()
    for doc_id, s in rows:
        f = fracs[s]
        if f >= 1.0:
            expect.add(doc_id)
            continue
        scaled = f * 4294967296.0
        assert scaled != int(scaled) + 0.5  # the round-mode boundary
        thr = format(min(int(round(scaled)), 4294967295), "08x")
        if hashlib.md5(str(doc_id).encode()).hexdigest()[:8] < thr:
            expect.add(doc_id)
    assert kept == expect
