"""Unit tests for dedup / similarity / text operators."""

import math

import pytest
from pyspark.sql import functions as F

from omop_etl_spark.functions.text import (
    bpe_token_count,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    token_signature,
)
from omop_etl_spark.operators.dedup import (
    dedup_groups,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
    simhash_text,
    token_shingles,
)
from omop_etl_spark.operators.similarity import (
    cosine_pairs,
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from omop_etl_spark.planner.surrogate import with_surrogate_id


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("one",)], "text string"
    )
    got = [r[0] for r in df.select(token_count("text")).collect()]
    assert got == [3, 0, 0, 1]


def test_token_signature_order_insensitive(spark):
    df = spark.createDataFrame([("b a b",), ("a b",)], "text string")
    sigs = [r[0] for r in df.select(token_signature("text")).collect()]
    assert sigs[0] == sigs[1] == "a b"


def test_fingerprint_matches_signature_md5(spark):
    df = spark.createDataFrame([("x y z",)], "text string")
    fp, sig = df.select(fingerprint("text"), token_signature("text")).first()
    import hashlib

    assert fp == hashlib.md5(sig.encode()).hexdigest()


def test_lang_id_prefers_hit_language_and_ties_lexicographic(spark):
    df = spark.createDataFrame(
        [("the cat and the dog",), ("el perro y la casa que es",), ("xyzzy blorp",)],
        "text string",
    )
    got = [r[0] for r in df.select(lang_id("text")).collect()]
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "de"  # zero hits everywhere -> lexicographically first


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over a lazy dog " * 3,), ("!!!",)],
        "text string",
    )
    vals = [r[0] for r in df.select(quality_score("text")).collect()]
    assert 0.0 <= vals[1] <= vals[0] <= 1.0


def test_label_centroids(spark):
    from omop_etl_spark.operators.similarity import label_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 6.0]), (1, [10.0, 0.0])],
        "label int, embedding array<float>",
    )
    got = {
        (r["label"], r["pos"]): (r["centroid"], r["n_vectors"])
        for r in label_centroids(df).collect()
    }
    assert got == {
        (0, 0): (2.0, 2), (0, 1): (4.0, 2), (1, 0): (10.0, 1), (1, 1): (0.0, 1)
    }
    fp = {
        (r["label"], r["pos"]): r["centroid"]
        for r in label_centroids(df, fixed_point=2).collect()
    }
    assert fp == {(0, 0): 200, (0, 1): 400, (1, 0): 1000, (1, 1): 0}


def test_pii_scrub_and_counts(spark):
    from omop_etl_spark.functions.text import pii_counts, pii_scrub

    df = spark.createDataFrame(
        [
            ("mail a.b+c@ex-ample.co.uk now",),
            ("call +1 555-010-1234 or 555-9999-0000",),
            ("clean text with no pii at all",),
            ("",),
        ],
        "text string",
    )
    ne, np_ = pii_counts("text")
    got = df.select(
        pii_scrub("text").alias("s"), ne.alias("ne"), np_.alias("np")
    ).collect()
    assert got[0]["s"] == "mail <EMAIL> now" and got[0]["ne"] == 1
    assert got[1]["s"] == "call +1 <PHONE> or <PHONE>" and got[1]["np"] == 2
    assert got[2]["s"] == "clean text with no pii at all"
    assert got[2]["ne"] == got[2]["np"] == 0
    assert got[3]["s"] == ""


def test_exact_dedup_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "k1", "b"), (2, "k1", "a"), (3, "k2", "c")], "id int, k string, v string"
    )
    out = exact_dedup(df, ["k"], tiebreak=["v"]).orderBy("k").collect()
    assert [(r.id, r.k) for r in out] == [(2, "k1"), (3, "k2")]


def test_exact_dedup_aggregate_fast_path(spark):
    # (key, tiebreak)-only frames take the grouped-MIN fast path:
    # no Window node in the plan, survivor identical to the windowed
    # row_number spelling including nulls-first tiebreak order (r17)
    df = spark.createDataFrame(
        [("k1", 5), ("k1", 2), ("k2", 7), ("k3", None), ("k3", 1)],
        "k string, doc_id int",
    )
    out = exact_dedup(df, ["k"], tiebreak=["doc_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "HashAggregate" in plan
    got = {r.k: r.doc_id for r in out.collect()}
    # k3: ascending nulls-first -> the NULL tiebreak row survives
    assert got == {"k1": 2, "k2": 7, "k3": None}
    assert out.columns == df.columns

    # payload column present -> window path, unchanged semantics
    df3 = spark.createDataFrame(
        [("k1", 2, "x"), ("k1", 5, "y")], "k string, doc_id int, v string"
    )
    out3 = exact_dedup(df3, ["k"], tiebreak=["doc_id"])
    assert "Window" in out3._jdf.queryExecution().executedPlan().toString()
    assert [(r.k, r.doc_id, r.v) for r in out3.collect()] == [("k1", 2, "x")]


def test_dedup_groups_counts(spark):
    df = spark.createDataFrame(
        [(10, "x"), (11, "x"), (12, "y")], "doc_id int, k string"
    )
    out = {r.k: (r.keep_id, r.dup_count) for r in dedup_groups(df, ["k"]).collect()}
    assert out == {"x": (10, 2), "y": (12, 1)}


def test_token_shingles_short_text(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], "text string")
    got = [r[0] for r in df.select(token_shingles("text", 3)).collect()]
    assert got[0] == ["a b"]  # shorter than n -> whole text
    assert sorted(got[1]) == ["a b c", "b c d"]


def test_jaccard_pairs_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6"),
            (2, "w1 w2 w3 w4 w5 w6"),  # identical -> jaccard 1.0
            (3, "q1 q2 q3 q4 q5 q6"),  # disjoint
        ],
        "doc_id int, text string",
    )
    out = jaccard_pairs(df, threshold=0.9).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in out] == [(1, 2, 1.0)]


def test_jaccard_prefix_filter_matches_exhaustive(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = sorted(map(tuple, jaccard_pairs(docs, threshold=0.7).collect()))
    pref = sorted(
        map(tuple, jaccard_pairs(docs, threshold=0.7, prefix_filter=True).collect())
    )
    assert full == pref and len(full) > 0


def test_jaccard_hot_shingle_auto_matches_counting(spark):
    # every doc shares one boilerplate shingle (document frequency = N);
    # auto mode must flip to the prefix path (hot_df=8 < N) and still
    # produce exactly the counting path's pairs
    rows = [(i, f"u{i}x u{i}y the quick brown u{i}z u{i}w") for i in range(60)]
    rows += [
        (1000, "dup dup2 dup3 dup4 the quick brown"),
        (1001, "dup dup2 dup3 dup4 the quick brown"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    auto = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(df, threshold=0.5, hot_df=8).collect()
    )
    counting = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(df, threshold=0.5, prefix_filter=False).collect()
    )
    assert auto == counting
    assert (1000, 1001, 1.0) in auto


def test_prefix_postings_bound_hot_shingle(spark):
    # the boilerplate shingle posts in every doc but lands in ~no prefix:
    # the index join input for the hot key shrinks from N to O(1)
    from omop_etl_spark.operators.dedup import _prefix_postings

    rows = [(i, f"u{i}x u{i}y the quick brown u{i}z u{i}w") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sh = df.select(
        F.col("doc_id").alias("__id"), token_shingles("text", 3).alias("__sh")
    )
    inv = sh.select(
        "__id",
        F.size("__sh").alias("__sz"),
        F.explode(F.transform("__sh", lambda g: F.xxhash64(g))).alias("__g"),
    )
    raw_max = inv.groupBy("__g").count().agg(F.max("count")).first()[0]
    pref = _prefix_postings(inv, 0.5)
    pref_max = pref.groupBy("__g").count().agg(F.max("count")).first()[0]
    assert raw_max == 60  # hot shingle posts everywhere
    assert pref_max <= 2  # but is outranked by rarer shingles in every prefix


def test_minhash_subset_of_exact(spark):
    rows = [
        (1, "w1 w2 w3 w4 w5 w6 w7 w8"),
        (2, "w1 w2 w3 w4 w5 w6 w7 w8"),
        (3, "w1 w2 w3 w4 w5 w6 w7 zz"),
        (4, "a b c d e f g h"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    exact = {(r.id_a, r.id_b) for r in jaccard_pairs(df, threshold=0.5).collect()}
    approx = {
        (r.id_a, r.id_b) for r in minhash_lsh_pairs(df, threshold=0.5).collect()
    }
    assert approx <= exact
    assert (1, 2) in approx  # identical docs always collide


def test_minhash_lsh_join_flags_cross_dups_only(spark):
    from omop_etl_spark.operators.dedup import minhash_lsh_join

    incoming = spark.createDataFrame(
        [
            (10, "w1 w2 w3 w4 w5 w6 w7 w8"),   # dup of existing 1
            (11, "p q r s t u v w"),            # unique
        ],
        "doc_id int, text string",
    )
    existing = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8"),
            (2, "w1 w2 w3 w4 w5 w6 w7 w8"),   # dup inside existing — must NOT pair
            (3, "a b c d e f g h"),
        ],
        "doc_id int, text string",
    )
    got = {
        (r.in_id, r.ex_id)
        for r in minhash_lsh_join(incoming, existing, threshold=0.8).collect()
    }
    assert got == {(10, 1), (10, 2)}  # only incoming→existing links


def test_minhash_lsh_join_bucket_cap_links_bucket_min(spark):
    from omop_etl_spark.operators.dedup import minhash_lsh_join

    # 30 identical existing pages + one identical incoming page, cap=5:
    # the over-full existing bucket star-links the incoming doc ONLY to
    # the bucket-minimum existing id — candidates stay linear, and the
    # incoming doc is still flagged (the incremental-dedup contract).
    text = "dup dup2 dup3 dup4 dup5 dup6 dup7 dup8"
    existing = spark.createDataFrame(
        [(i, text) for i in range(1, 31)], "doc_id int, text string"
    )
    incoming = spark.createDataFrame([(100, text)], "doc_id int, text string")
    got = {
        (r.in_id, r.ex_id)
        for r in minhash_lsh_join(
            incoming, existing, threshold=0.8, max_bucket=5
        ).collect()
    }
    assert got == {(100, 1)}


def test_minhash_lsh_join_md5_matches_xxhash_verdicts(spark):
    from omop_etl_spark.operators.dedup import minhash_lsh_join

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    incoming = docs.filter(F.col("doc_id") % 7 == 0)
    existing = docs.filter(F.col("doc_id") % 7 != 0)
    md5 = {
        (r.in_id, r.ex_id): r.jaccard
        for r in minhash_lsh_join(
            incoming, existing, threshold=0.8, base_hash="md5"
        ).collect()
    }
    xx = {
        (r.in_id, r.ex_id): r.jaccard
        for r in minhash_lsh_join(
            incoming, existing, threshold=0.8, base_hash="xxhash64"
        ).collect()
    }
    # identical docs (jaccard 1.0) collide in EVERY band under any base
    # hash, so they must be reported by both; sub-1.0 pairs may differ
    # (LSH recall jitter near the threshold), but where both report a
    # pair the verified exact jaccard must agree bit-for-bit
    exact_md5 = {p for p, j in md5.items() if j == 1.0}
    exact_xx = {p for p, j in xx.items() if j == 1.0}
    assert md5 and xx  # the sf0.001 corpus contains cross-split near-dups
    assert exact_md5 == exact_xx
    for p in md5.keys() & xx.keys():
        assert md5[p] == xx[p]


def test_simhash_relational_matches_column_form(spark):
    from omop_etl_spark.operators.dedup import simhash_signatures

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rel = {
        (r["__id"], r["__sig"]) for r in simhash_signatures(docs).collect()
    }
    col = {
        (r.doc_id, r.sig)
        for r in docs.select("doc_id", simhash_text("text", 32, 3).alias("sig")).collect()
    }
    assert rel == col


def test_simhash_banding_equals_bruteforce(spark):
    # the pigeonhole banding must find EXACTLY the pairs a full O(N^2)
    # hamming scan finds — recall 1.0 is a theorem, verify it anyway
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(docs, max_hamming=3).collect()
    }
    sig = docs.select("doc_id", simhash_text("text", 32, 3).alias("sig"))
    a, b = sig.alias("a"), sig.alias("b")
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute and len(brute) > 0


def test_cosine_pairs_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.01]),   # nearly parallel to 1
            (3, [0.0, 1.0]),    # orthogonal to 1
        ],
        "vec_id int, embedding array<double>",
    )
    got = [(r.id_a, r.id_b) for r in cosine_pairs(df, threshold=0.9).collect()]
    assert got == [(1, 2)]


def test_cosine_pairs_bounded_input_guard(spark):
    # the exact all-pairs baseline REFUSES unbounded input: over
    # max_rows raises before the quadratic join is built
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)],
        "vec_id int, embedding array<double>",
    )
    with pytest.raises(ValueError, match="max_rows"):
        cosine_pairs(df, threshold=0.5, max_rows=3)
    # raising the bound (explicit opt-in) restores the old behavior
    assert cosine_pairs(df, threshold=0.999, max_rows=5).count() >= 0


def _seeded_two_lobe_embeddings(spark, n=60, dim=8, seed=7):
    """n vectors in two well-separated lobes (around e0 and e1) with
    small perturbations — plenty of within-lobe near-dup pairs, plus
    a few straddlers placed between the lobes."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        base = np.zeros(dim)
        base[i % 2] = 1.0
        v = base + rng.normal(0, 0.02, dim)
        rows.append((i, [float(x) for x in v]))
    # boundary straddlers: a near-dup PAIR sitting between the lobes,
    # likely to be split by k-means when k grows
    mid = np.full(dim, 1.0 / np.sqrt(dim))
    for j, eps in ((n, 0.0), (n + 1, 0.001)):
        rows.append((j, [float(x) for x in mid + eps]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_scoped_cosine_pairs_parity_within_clusters(spark):
    """VERDICT r10 #4: scoped == exact restricted to co-assigned pairs.

    (a) every scoped pair is an exact pair with the identical score;
    (b) the ONLY exact pairs scoped misses are boundary-straddlers
        (ids assigned to different k-means clusters);
    (c) growing k never produces a wrong pair — found pairs stay a
        subset of exact with equal scores, only recall changes.
    """
    from omop_etl_spark.operators.kmeans import kmeans_assign
    from omop_etl_spark.operators.similarity import scoped_cosine_pairs

    df = _seeded_two_lobe_embeddings(spark)
    thr = 0.99
    exact = {
        (r.id_a, r.id_b): r.score
        for r in cosine_pairs(df, threshold=thr).collect()
    }
    assert len(exact) > 10  # the lobes generate real near-dup mass

    for k in (2, 4):
        asn = {
            r.vec_id: r.cluster_id
            for r in kmeans_assign(df, k=k, iters=2).collect()
        }
        scoped = {
            (r.id_a, r.id_b): r.score
            for r in scoped_cosine_pairs(df, threshold=thr, k=k, iters=2).collect()
        }
        # (a)/(c): subset with identical scores at every k
        for pair, score in scoped.items():
            assert exact[pair] == score
        # (b): misses are exactly the straddlers; co-assigned exact
        # pairs are ALL found
        for (a, b), score in exact.items():
            if asn[a] == asn[b]:
                assert scoped[(a, b)] == score
            else:
                assert (a, b) not in scoped


def test_scoped_cosine_pairs_finds_lobe_dups_at_matched_k(spark):
    """With k = the true lobe count, recall is total: the generator's
    two lobes co-assign, so scoped == exact on this input."""
    from omop_etl_spark.operators.similarity import scoped_cosine_pairs

    df = _seeded_two_lobe_embeddings(spark)
    thr = 0.99
    exact = {(r.id_a, r.id_b) for r in cosine_pairs(df, threshold=thr).collect()}
    scoped = {
        (r.id_a, r.id_b)
        for r in scoped_cosine_pairs(df, threshold=thr, k=2, iters=2).collect()
    }
    missed = exact - scoped
    # the straddler pair may fall either side of a centroid boundary;
    # everything within a lobe must be found
    assert scoped <= exact
    assert all(a >= 60 or b >= 60 for a, b in missed), missed


def test_ivf_full_probe_matches_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    exact = sorted(
        (r.query_id, r.neighbor_id) for r in cosine_topk(q, emb, k=3).collect()
    )
    # probing every list degenerates IVF to the exact scan
    full = sorted(
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(q, emb, k=3, num_centroids=8, nprobe=8).collect()
    )
    assert full == exact
    # partial probe returns k rows per query (recall may drop, shape not)
    part = ivf_topk(q, emb, k=3, num_centroids=8, nprobe=2)
    counts = {r.query_id: r.n for r in part.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert all(v == 3 for v in counts.values())


def test_bpe_token_count_edges(spark):
    df = spark.createDataFrame(
        [("hello, world! 42",), ("",), ("a1b2",)], "text string"
    )
    got = [r[0] for r in df.select(bpe_token_count("text")).collect()]
    # hello , world ! 42 -> 5 ; "" -> 0 ; a 1 b 2 -> 4
    assert got == [5, 0, 4]


def test_cosine_topk_hand_computed(spark):
    vecs = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [1.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<float>")
    out = cosine_topk(df.filter("vec_id = 1"), df, k=2).collect()
    assert [(r.query_id, r.neighbor_id) for r in out] == [(1, 1), (1, 3)]
    assert out[0].score == pytest.approx(1.0)
    assert out[1].score == pytest.approx(1 / math.sqrt(2), abs=1e-6)


def test_lsh_topk_scores_match_exact_for_found(spark):
    import random

    random.seed(7)
    vecs = [
        (i, [random.gauss(0, 1) for _ in range(8)]) for i in range(30)
    ]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<float>")
    exact = {
        (r.query_id, r.neighbor_id): r.score
        for r in cosine_topk(df.filter("vec_id < 3"), df, k=5).collect()
    }
    approx = lsh_topk(df.filter("vec_id < 3"), df, k=5, num_bits=4, dim=8).collect()
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact:
            assert r.score == pytest.approx(exact[(r.query_id, r.neighbor_id)], abs=1e-6)
        assert r.query_id is not None


def test_lsh_topk_recall_floor(spark):
    # measured recall gate vs the exact sibling on the bundled corpus:
    # quality regressions fail here instead of passing a rows-only check.
    # Fully deterministic (seeded planes, fixed testdata) — measured
    # 0.82 at this config; gated at 0.6 for slack against reordering.
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 10")
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(q, emb, k=5).collect()}
    rows = lsh_topk(
        q, emb, k=5, num_bits=6, num_probes=7, num_tables=6
    ).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(approx & exact) / len(exact) >= 0.6
    # multi-probe + multi-table: no query starves below k
    assert len(rows) == 50


def test_ivf_topk_recall_floor(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 10")
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(q, emb, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(q, emb, k=5, num_centroids=16, nprobe=4).collect()
    }
    # measured 0.54 at nprobe=4/16 lists (deterministic); gated at 0.4
    assert len(approx & exact) / len(exact) >= 0.4


import pytest as _pytest


@_pytest.mark.parametrize("base_hash", ["xxhash64", "md5"])
def test_minhash_lsh_recall_floor(spark, base_hash):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {(r.id_a, r.id_b) for r in jaccard_pairs(docs, threshold=0.7).collect()}
    approx = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, threshold=0.7, base_hash=base_hash
        ).collect()
    }
    # precision is exact by construction (post-verification)
    assert approx <= exact
    # measured recall 0.964 xxhash64 / same ballpark md5 (deterministic);
    # gated at 0.85 for both base hashes
    assert len(approx & exact) / len(exact) >= 0.85


@_pytest.mark.slow
def test_ann_recall_at_bench_scale(spark):
    """Recall@10 vs the exact sibling on the BENCH corpus (sf0.1, 2000
    vectors), not a toy fixture (VERDICT r5 #6). The sf0.1 embeddings
    are near-isotropic (weak angular contrast — the hard case for
    angular LSH), so the recall levers are turned up: wider buckets +
    more tables for LSH, 10/16 lists probed for IVF. Deterministic
    (seeded planes/centroids, fixed testdata): measured 0.945 (LSH) and
    0.87 (IVF), gated at 0.8."""
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    q = emb.filter("vec_id % 100 = 0")  # 20 queries
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(q, emb, k=10).collect()}
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(
            q, emb, k=10, num_bits=5, num_probes=8, num_tables=6
        ).collect()
    }
    assert len(lsh & exact) / len(exact) >= 0.8
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(q, emb, k=10, num_centroids=16, nprobe=10).collect()
    }
    assert len(ivf & exact) / len(exact) >= 0.8


def test_surrogate_ids_dense_and_deterministic(spark):
    df = spark.createDataFrame(
        [(c,) for c in "zebra apple mango kiwi banana".split()], "k string"
    ).repartition(4)
    out = {r.k: r.id for r in with_surrogate_id(df, ["k"]).collect()}
    assert out == {"apple": 1, "banana": 2, "kiwi": 3, "mango": 4, "zebra": 5}


def test_salted_join_matches_plain_join(spark):
    from omop_etl_spark.operators.skew import salted_join

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet").select(
        "p_partkey", "p_name"
    )
    plain = sorted(
        map(
            tuple,
            li.join(part, li.l_partkey == part.p_partkey)
            .select("l_orderkey", "l_partkey", "p_name")
            .collect(),
        )
    )
    salted = sorted(
        map(
            tuple,
            salted_join(
                li.withColumnRenamed("l_partkey", "p_partkey"), part,
                on=["p_partkey"], num_salts=4,
            )
            .select("l_orderkey", "p_partkey", "p_name")
            .collect(),
        )
    )
    # same multiset of joined rows (modulo the key-column naming)
    assert len(salted) == len(plain) > 0
    assert [(o, k) for o, k, _ in salted] == [(o, k) for o, k, _ in plain]


def test_two_stage_agg_matches_direct(spark):
    from omop_etl_spark.operators.skew import two_stage_agg

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    direct = {
        (r.l_returnflag, r.n, float(r.s))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    staged = {
        (r.l_returnflag, r.n, float(r.s))
        for r in two_stage_agg(
            li,
            ["l_returnflag"],
            partial=[F.count(F.lit(1)).alias("pc"), F.sum("l_quantity").alias("ps")],
            final=[F.sum("pc").alias("n"), F.sum("ps").alias("s")],
        ).collect()
    }
    assert staged == direct


def test_quantize_embeddings_codes_and_error(spark):
    from omop_etl_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [0.5, 0.25]), (2, [1.0, 0.75])],
        "vec_id bigint, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    # range [0,1] over 255 levels: extremes hit 0 and 255 exactly
    assert out[0]["codes"] == [0, 255]
    assert out[2]["codes"][0] == 255
    for r in out.values():
        assert all(0 <= c <= 255 for c in r["codes"])
        # 8-bit quantization on [0,1]: recon error per dim <= step/2
        assert r["recon_err"] <= (1.0 / 255) * (2 ** 0.5)
    # exact grid points reconstruct exactly
    assert out[0]["recon_err"] == 0.0


def test_quantize_embeddings_degenerate_range(spark):
    from omop_etl_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(0, [2.5, 2.5]), (1, [2.5, 2.5])],
        "vec_id bigint, embedding array<float>",
    )
    for r in quantize_embeddings(df).collect():
        assert r["codes"] == [0, 0]
        assert r["recon_err"] == 0.0


def test_quantize_embeddings_fewer_bits_coarser(spark):
    from omop_etl_spark.operators.similarity import quantize_embeddings
    import random

    random.seed(7)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    e8 = sum(r["recon_err"] for r in quantize_embeddings(df, num_bits=8).collect())
    e4 = sum(r["recon_err"] for r in quantize_embeddings(df, num_bits=4).collect())
    assert e8 < e4


def test_containment_pairs_asymmetric_quote_inclusion(spark):
    from omop_etl_spark.operators.dedup import containment_pairs

    long_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    quote = "gamma delta epsilon zeta eta"  # embedded in long_text
    df = spark.createDataFrame(
        [
            (1, long_text),
            (2, quote),                      # contained in 1, not vice versa
            (3, "one two three four five"),  # unrelated
        ],
        "doc_id int, text string",
    )
    out = {
        (r.contained_id, r.container_id): r.containment
        for r in containment_pairs(df, threshold=0.8).collect()
    }
    # 2's three 3-gram shingles all occur in 1; 1 has 8 shingles of
    # which only 3 occur in 2 -> one direction only
    assert set(out) == {(2, 1)}
    assert out[(2, 1)] == 1.0


def test_containment_matches_bruteforce_on_real_docs(spark):
    from omop_etl_spark.operators.dedup import containment_pairs, token_shingles

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        (r.contained_id, r.container_id, r.containment)
        for r in containment_pairs(docs, threshold=0.6).collect()
    )
    sh = docs.select(
        F.col("doc_id").alias("i"), token_shingles("text", 3).alias("s")
    )
    brute = (
        sh.alias("a")
        .crossJoin(sh.alias("b"))
        .filter(F.col("a.i") != F.col("b.i"))
        .select(
            F.col("a.i").alias("ca"),
            F.col("b.i").alias("cb"),
            (
                F.size(F.array_intersect("a.s", "b.s")) / F.size("a.s")
            ).alias("cont"),
        )
        .filter(F.col("cont") >= 0.6)
    )
    want = sorted(
        (r.ca, r.cb, round(r.cont, 6)) for r in brute.collect()
    )
    assert got == want and len(got) > 0


def test_rolling_median_matches_bruteforce(spark):
    """__spark_entry__._q_events_rolling_median vs an independent
    brute-force formulation (range join day-6..day, sorted-list
    lower median in Python) on the real sf0.001 events."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod_rm", "/root/repo/__spark_entry__.py"
    )
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    got = {
        (r["event_type"], str(r["day"])): (r["n_win"], r["med_cents"])
        for r in em._q_events_rolling_median(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .selectExpr(
            "event_type",
            "to_date(ts) AS day",
            "CAST(floor(value * 100) AS BIGINT) AS cents",
        )
        .collect()
    )
    by_type_day = {}
    for r in rows:
        by_type_day.setdefault((r["event_type"], r["day"]), []).append(
            r["cents"]
        )
    import datetime

    want = {}
    for (et, day) in by_type_day:
        vals = []
        for back in range(7):
            vals.extend(
                by_type_day.get((et, day - datetime.timedelta(days=back)), [])
            )
        vals.sort()
        want[(et, str(day))] = (len(vals), vals[(len(vals) - 1) // 2])
    assert got == want
