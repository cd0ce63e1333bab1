"""BPE encode: known vectors, UDF plumbing, and plan shape."""

from pyspark.sql import functions as F

from omop_etl_spark.operators.bpe import (
    BASE_SYMBOLS,
    DEFAULT_MERGES,
    bpe_vocab,
    encode_documents,
    encode_words,
    py_encode_word,
)

VOCAB = bpe_vocab(DEFAULT_MERGES)


def test_vocab_is_injective_and_stable():
    assert len(VOCAB) == len(BASE_SYMBOLS) + len(DEFAULT_MERGES)
    assert VOCAB["a"] == 0 and VOCAB["9"] == 35
    assert VOCAB["th"] == 36  # first merge output
    ids = list(VOCAB.values())
    assert ids == sorted(ids) == list(range(len(ids)))


def test_known_vectors():
    def syms(word):
        return [
            {v: k for k, v in VOCAB.items()}[i]
            for i in py_encode_word(word, DEFAULT_MERGES, VOCAB)
        ]

    # t h e a t e r -> th -> the | then (e,r) r3, then (a,t) r7
    assert syms("theater") == ["the", "at", "er"]
    # lowest-rank-first: ("t","h") rank 0 beats ("h","e") rank 30
    assert syms("the") == ["the"]
    # no applicable merge: stays characters
    assert syms("zzz") == ["z", "z", "z"]
    # ("t","h") rank 0 preempts the ("i","t") path, so the chained
    # (w,it)(wit,h) rules never fire on the word "with" itself
    assert syms("with") == ["w", "i", "th"]
    assert syms("2019") == ["20", "19"]
    assert syms("information") == ["in", "for", "m", "at", "i", "on"]


def test_left_to_right_nonoverlap_matches_replace_semantics():
    # 'ananan': ("a","n") rank 4 -> an an an; no ("an","an") merge;
    # then no further merges apply ("an","d") needs a d.
    assert py_encode_word("ananan", DEFAULT_MERGES, VOCAB) == [VOCAB["an"]] * 3


def test_encode_words_matches_python(spark):
    words = ["theater", "and", "zzz", "with", "information", "2019"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r.word: list(r.token_ids) for r in encode_words(df).collect()}
    assert got == {w: py_encode_word(w, DEFAULT_MERGES, VOCAB) for w in words}


def test_encode_documents_order_and_join(spark):
    docs = spark.createDataFrame(
        [(1, "The cat, the hat!"), (2, ""), (3, "...")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r.doc_id, r.pos, r.word, list(r.token_ids))
        for r in encode_documents(docs).collect()
    )
    the = py_encode_word("the", DEFAULT_MERGES, VOCAB)
    # doc 2 and 3 vanish (no alnum tokens); positions keep document order
    assert [r[0] for r in rows] == [1, 1, 1, 1]
    assert [r[2] for r in rows] == ["the", "cat", "the", "hat"]
    assert rows[0][3] == rows[2][3] == the


def test_encode_is_arrow_batched_not_rowwise(spark):
    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    plan = encode_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
