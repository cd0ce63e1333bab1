"""Unit tests for dedup / similarity / text operators."""

import math

import pytest
from pyspark.sql import functions as F

from omop_etl_spark.functions.text import (
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
    token_shingles,
)
from omop_etl_spark.operators.similarity import cosine_topk, lsh_topk
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


def test_exact_dedup_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "k1", "b"), (2, "k1", "a"), (3, "k2", "c")], "id int, k string, v string"
    )
    out = exact_dedup(df, ["k"], tiebreak=["v"]).orderBy("k").collect()
    assert [(r.id, r.k) for r in out] == [(2, "k1"), (3, "k2")]


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


def test_surrogate_ids_dense_and_deterministic(spark):
    df = spark.createDataFrame(
        [(c,) for c in "zebra apple mango kiwi banana".split()], "k string"
    ).repartition(4)
    out = {r.k: r.id for r in with_surrogate_id(df, ["k"]).collect()}
    assert out == {"apple": 1, "banana": 2, "kiwi": 3, "mango": 4, "zebra": 5}
