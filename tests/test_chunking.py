"""Unit tests for operators/chunking.py (document chunking + TF-IDF)."""

import pytest
from pyspark.sql import functions as F

from omop_etl_spark.operators.chunking import chunk_documents, tfidf_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_and_overlap(spark):
    text = " ".join(str(i) for i in range(10))  # tokens 0..9
    out = chunk_documents(
        _docs(spark, [(1, text)]), chunk_tokens=4, overlap=2
    ).orderBy("chunk_id").collect()
    # starts 0,2,4,6,8 -> windows [0..3],[2..5],[4..7],[6..9],[8..9]
    assert [r.chunk_id for r in out] == [0, 1, 2, 3, 4]
    assert out[0].chunk_text == "0 1 2 3"
    assert out[1].chunk_text == "2 3 4 5"
    assert out[4].chunk_text == "8 9"
    assert [r.n_tokens for r in out] == [4, 4, 4, 4, 2]


def test_chunk_short_and_empty_docs(spark):
    out = chunk_documents(
        _docs(spark, [(1, "a b"), (2, ""), (3, "   ")]),
        chunk_tokens=8,
        overlap=2,
    ).collect()
    # doc 1: one short chunk; docs 2-3: no tokens -> no rows
    assert len(out) == 1
    assert out[0].doc_id == 1 and out[0].chunk_text == "a b" and out[0].n_tokens == 2


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "x")]), chunk_tokens=4, overlap=4)


def test_chunk_is_map_only(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # the 100 TB contract: zero shuffles


def test_chunk_reconstruction_covers_all_tokens(spark):
    # every token index of every doc appears in >=1 chunk window
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    total = docs.select(
        F.sum(F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")))
    ).collect()[0][0]
    covered = (
        chunk_documents(docs, chunk_tokens=64, overlap=16)
        .select("doc_id", "chunk_id", "n_tokens")
        .groupBy("doc_id")
        # non-final chunks advance by step=48; the final chunk
        # contributes its full length
        .agg((F.max("chunk_id") * 48 + F.max_by("n_tokens", "chunk_id")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert covered == total


def test_tfidf_topk_scores_and_ties(spark):
    out = tfidf_topk(
        _docs(
            spark,
            [
                (1, "apple banana apple cherry"),
                (2, "banana cherry cherry durian"),
            ],
        ),
        k=3,
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    # apple: tf=2 df=1 -> rarest+frequent wins; banana/cherry tie on
    # score (tf=1, df=2) -> lexicographic order
    assert [r.term for r in d1] == ["apple", "banana", "cherry"]
    assert d1[0].tf == 2 and d1[0].df == 1
    d2 = sorted(by_doc[2], key=lambda r: r.rank)
    # durian: tf=1 df=1 -> only positive idf; banana/cherry both score
    # 0 (df=2 with N=2 -> ln(3/3)=0, tf irrelevant) -> lexicographic
    assert [r.term for r in d2] == ["durian", "banana", "cherry"]
    assert all(r.rank == i + 1 for d in (d1, d2) for i, r in enumerate(d))


def test_corpus_ngram_counts_distinct_docs(spark):
    from omop_etl_spark.operators.chunking import corpus_ngram_counts

    docs = _docs(
        spark,
        [
            (1, "the cat sat and the cat ran"),  # "the cat" twice, 1 doc
            (2, "the cat slept"),
            (3, "no overlap here"),
        ],
    )
    uni = {r.ngram: (r["count"], r.n_docs)
           for r in corpus_ngram_counts(docs, n=1).collect()}
    # total occurrences vs DISTINCT docs must differ for repeated terms
    assert uni["the"] == (3, 2)
    assert uni["cat"] == (3, 2)
    bi = {r.ngram: (r["count"], r.n_docs)
          for r in corpus_ngram_counts(docs, n=2).collect()}
    assert bi["the cat"] == (3, 2)
    assert bi["cat sat"] == (1, 1)
    # short/empty docs contribute no n-grams; ordering+limit determinism
    top = corpus_ngram_counts(docs, n=2, top_k=2).collect()
    assert [r.ngram for r in top] == ["the cat", "and the"]


def test_token_cooccurrence_matches_bruteforce(spark):
    import itertools
    import re
    from collections import Counter

    from omop_etl_spark.operators.chunking import token_cooccurrence
    from pyspark.sql import Row

    corp = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "the cat and the dog"),
        (4, "a cat a dog a mat"),
        (5, "dog cat"),
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in corp])
    got = {
        (r["term_a"], r["term_b"]): (
            r["pair_count"],
            r["df_a"],
            r["df_b"],
            r["lift_ppm"],
        )
        for r in token_cooccurrence(df, min_support=2).collect()
    }
    # brute force
    docsets = {i: set(re.split(r"[^a-z0-9]+", t.lower())) - {""} for i, t in corp}
    dfreq = Counter(t for s in docsets.values() for t in s)
    freq = {t for t, c in dfreq.items() if c >= 2}
    pc = Counter()
    for s in docsets.values():
        for a, b in itertools.combinations(sorted(s & freq), 2):
            pc[(a, b)] += 1
    want = {
        (a, b): (
            c,
            dfreq[a],
            dfreq[b],
            len(corp) * c * 1_000_000 // (dfreq[a] * dfreq[b]),
        )
        for (a, b), c in pc.items()
        if c >= 2
    }
    assert got == want and len(got) > 0


def test_encode_tokens_preserves_order_and_oov(spark):
    import re
    from collections import Counter

    from omop_etl_spark.operators.chunking import build_vocab, encode_tokens
    from pyspark.sql import Row

    corp = [
        (1, "apple banana apple cherry"),
        (2, "banana banana durian"),
        (3, "apple elderberry"),
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in corp])
    vocab = build_vocab(df, vocab_size=3)
    vmap = {r["term"]: r["token_id"] for r in vocab.collect()}
    # frequency: banana=3, apple=3, cherry/durian/elderberry=1
    # order: count desc, term asc -> apple=1, banana=2, then one of the 1-count terms
    assert vmap["apple"] == 1 and vmap["banana"] == 2 and len(vmap) == 3
    got = {r["doc_id"]: list(r["ids"]) for r in encode_tokens(df, vocab).collect()}
    for i, t in corp:
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        assert got[i] == [vmap.get(w, 0) for w in toks], (i, got[i])


def test_bm25_topk_matches_reference(spark):
    """bm25_topk == a plain-Python BM25 (same micro-unit floor) on a
    fixture with repeated terms, multi-term matches, an empty doc
    (counts toward N and avgdl), and score ties broken by doc id."""
    import math

    from omop_etl_spark.operators.chunking import bm25_topk

    rows = [
        (1, "hash join hash join hash"),
        (2, "join vector"),
        (3, "spark spark spark vector hash"),
        (4, ""),
        (5, "nothing relevant here"),
        (6, "join vector"),  # identical to doc 2 -> tie, id ascends
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    qt = ["hash", "join", "vector"]
    got = [tuple(r) for r in bm25_topk(df, qt, k=4).collect()]

    docs = {i: [w for w in t.lower().split() if w] for i, t in rows}
    n = len(docs)
    t = sum(len(v) for v in docs.values())
    dfreq = {q: sum(1 for v in docs.values() if q in v) for q in qt}
    scores = {}
    for i, v in docs.items():
        s, m = 0, 0
        for q in qt:
            tf = v.count(q)
            if not tf:
                continue
            m += 1
            idf = math.log((n - dfreq[q] + 0.5) / (dfreq[q] + 0.5) + 1.0)
            tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * ((len(v) * n) / t)))
            s += math.floor(idf * tfn * 1_000_000.0)
        if m:
            scores[i] = (m, s)
    want = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:4]
    assert got == [
        (i, m, s, r + 1) for r, (i, (m, s)) in enumerate(want)
    ]
    # the tie pair (docs 2 and 6) must both appear, id order
    tie = [g for g in got if g[0] in (2, 6)]
    assert [g[0] for g in tie] == [2, 6] and tie[0][2] == tie[1][2]


def test_rrf_fuse_integer_exact(spark):
    """RRF fusion: integer reciprocal contributions, missing-ranker
    candidates score from one list only, ties break on id."""
    from omop_etl_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank long")
    got = [
        tuple(r) for r in rrf_fuse([a, b], k=10, c=60).orderBy("rank").collect()
    ]
    s = 1_000_000_000
    exp = {
        1: (1, s // 61),
        2: (2, s // 62 + s // 61),
        3: (1, s // 63),
        4: (1, s // 62),
    }
    want = sorted(exp.items(), key=lambda kv: (-kv[1][1], kv[0]))
    assert got == [
        (i, n, sc, r + 1) for r, (i, (n, sc)) in enumerate(want)
    ]
    # doc 2 (in both lists) must rank first
    assert got[0][0] == 2 and got[0][1] == 2
