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


def test_large_merge_table_matches_rank_scan(spark):
    """Production tokenizers carry tens of thousands of merges; the
    dict-based lowest-pair search must equal the naive scan of the
    merges table in rank order, and the Spark encode must agree, on a
    500-merge table generated from corpus bigram statistics."""
    import random

    rng = random.Random(99)
    # synthesize a 500-merge table over the base alphabet: start from
    # random char pairs, then chain merges so outputs feed later rules
    merges, symbols = [], [c for c in BASE_SYMBOLS]
    seen = set()
    while len(merges) < 500:
        a, b = rng.choice(symbols), rng.choice(symbols)
        if (a, b) in seen or len(a + b) > 12:
            continue
        seen.add((a, b))
        merges.append((a, b))
        symbols.append(a + b)
    vocab = bpe_vocab(merges)

    def naive(word):
        syms = list(word)
        while True:
            best = None
            for a, b in merges:  # rank order
                if any(
                    syms[i] == a and syms[i + 1] == b
                    for i in range(len(syms) - 1)
                ):
                    best = (a, b)
                    break
            if best is None:
                break
            a, b = best
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return [vocab[s] for s in syms]

    words = [
        "".join(rng.choice(BASE_SYMBOLS) for _ in range(rng.randrange(1, 15)))
        for _ in range(60)
    ]
    for w in words:
        assert py_encode_word(w, merges, vocab) == naive(w), w

    df = spark.createDataFrame([(w,) for w in set(words)], "word string")
    got = {
        r.word: list(r.token_ids) for r in encode_words(df, merges=merges).collect()
    }
    assert got == {w: naive(w) for w in set(words)}


def test_learn_merges_matches_python(spark):
    """Distributed learner == single-node trainer on a corpus with the
    tricky shapes: overlapping repeats (aaa -> two (a,a) counts, one
    merged pair), back-to-back pair occurrences (inin), merges whose
    operands are earlier merge outputs, and count ties broken
    lexicographically."""
    from omop_etl_spark.operators.bpe import learn_merges, py_learn_merges

    wc = [
        ("the", 50), ("there", 10), ("then", 20), ("inin", 7),
        ("aaa", 5), ("banana", 3), ("a", 9), ("zz", 4), ("yy", 4),
    ]
    df = spark.createDataFrame(wc, "word string, n long")
    got = learn_merges(df, k=16)
    want = py_learn_merges(wc, 16)
    assert got == want
    # ties: (z,z) and (y,y) both count 4 -> (y,y) must rank first
    yz = [m[:2] for m in want if m[:2] in {("y", "y"), ("z", "z")}]
    assert yz == [("y", "y"), ("z", "z")]


def test_learn_merges_stops_when_dry(spark):
    """k is a cap, not a promise: single-character words have no
    adjacent pairs after (a,a) merges exhaust."""
    from omop_etl_spark.operators.bpe import learn_merges

    df = spark.createDataFrame([("aa", 3), ("b", 5)], "word string, n long")
    got = learn_merges(df, k=10)
    assert got == [("a", "a", 3)]


def test_learned_merges_feed_encode(spark):
    """End-to-end: train on a corpus, encode with the learned table —
    high-frequency words must collapse to one token."""
    from omop_etl_spark.operators.bpe import (
        bpe_vocab,
        encode_words,
        learn_merges,
        py_encode_word,
    )

    wc = [("the", 100), ("them", 30), ("theme", 10), ("cat", 5)]
    df = spark.createDataFrame(wc, "word string, n long")
    learned = [(a, b) for a, b, _ in learn_merges(df, k=8)]
    vocab = bpe_vocab(learned)
    assert "the" in vocab  # two merges reach 'the'
    enc = {
        r.word: list(r.token_ids)
        for r in encode_words(
            spark.createDataFrame([(w,) for w, _ in wc], "word string"),
            merges=learned,
        ).collect()
    }
    for w, _ in wc:
        assert enc[w] == py_encode_word(w, learned, vocab)
    assert enc["the"] == [vocab["the"]]
