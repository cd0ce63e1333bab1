"""End-to-end curate_corpus pipeline tests on constructed corpora."""

from omop_etl_spark.pipelines import curate_corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_full_pipeline(spark):
    # min_docs=3: the header (in 4 docs) is boilerplate; the identical
    # bodies of docs 1+2 (2 docs) are NOT — they survive stripping and
    # collapse in the exact-dedup stage instead. (At min_docs=2 the
    # shared bodies would themselves be stripped as boilerplate — the
    # documented strip/dedup ordering interaction.)
    docs = _docs(
        spark,
        [
            (1, "SHARED HEADER\nthe quick brown fox jumps over the dog"),
            (2, "SHARED HEADER\nthe quick brown fox jumps over the dog"),
            (3, "SHARED HEADER\nan entirely different document body here"),
            # doc that is all boilerplate -> dropped
            (4, "SHARED HEADER"),
        ],
    )
    out = curate_corpus(
        docs, boilerplate_min_docs=3, dedup_exact=True,
        chunk_tokens=4, overlap=0,
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # docs 1+2 collapse to one survivor (min id) after the shared
    # header is stripped; doc 4 vanished entirely
    assert set(by_doc) == {1, 3}
    d1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.text for r in d1] == [
        "the quick brown fox", "jumps over the dog",
    ]
    assert all(r.n_tokens == 4 for r in d1)
    d3 = sorted(by_doc[3], key=lambda r: r.chunk_id)
    assert " ".join(r.text for r in d3) == "an entirely different document body here"


def test_curate_row_gates(spark):
    docs = _docs(
        spark,
        [
            (1, "a solid english sentence with plenty of reasonable words"),
            (2, "x"),  # too short
        ],
    )
    out = curate_corpus(
        docs, min_tokens=3, boilerplate_min_docs=None, dedup_exact=False,
    ).collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].n_tokens == 9


def test_curate_decontaminate_stage(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "epsilon zeta eta theta"),
            (3, "unrelated prose entirely here"),
        ],
    )
    # doc 1 shares a 4-gram with the benchmark verbatim; doc 2 shares
    # nothing
    bench = _docs(spark, [(100, "prefix alpha beta gamma delta suffix")])
    out = curate_corpus(
        docs, boilerplate_min_docs=None, dedup_exact=False,
        benchmark=bench, decontaminate_n=4,
    ).collect()
    assert sorted(r.doc_id for r in out) == [2, 3]


def test_curate_near_dedup_stage(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    docs = _docs(
        spark,
        [
            (1, base + "tail one"),
            (2, base + "tail one"),  # exact dup of 1 -> exact stage
            (3, base + "tail two"),  # near dup of 1 -> minhash stage
            (4, "completely different text about spark catalyst plans"),
        ],
    )
    out = curate_corpus(
        docs, boilerplate_min_docs=None, dedup_exact=True,
        near_dedup_threshold=0.5,
    ).collect()
    assert sorted(r.doc_id for r in out) == [1, 4]


def test_curate_doc_mode_no_chunking(spark):
    docs = _docs(spark, [(1, "same text"), (2, "same text"), (3, "other")])
    out = {r.doc_id: r for r in curate_corpus(
        docs, boilerplate_min_docs=None, dedup_exact=True
    ).collect()}
    # min doc_id survives per distinct text; no chunk_id column
    assert set(out) == {1, 3}
    assert "chunk_id" not in out[1].asDict()


def test_curate_batch_incremental_stages(spark):
    from omop_etl_spark.pipelines import curate_batch_incremental

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight"),
        ],
        "doc_id int, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of corpus 1
            (11, "short doc"),                                       # fails token gate
            (12, "fresh unique content nine ten eleven twelve thirteen"),
            (13, "fresh unique content nine ten eleven twelve thirteen"),  # batch-internal dup of 12
            (14, "one two three four five six seven NINE"),          # near-dup of corpus 2
        ],
        "doc_id int, text string",
    )
    out = curate_batch_incremental(
        batch, corpus, min_tokens=5, near_dedup_threshold=0.7
    )
    got = {r.doc_id: r.n_tokens for r in out.collect()}
    # 10 dropped (exact vs corpus), 11 gated, 13 loses to 12, 14 near-dup
    assert got == {12: 8}
