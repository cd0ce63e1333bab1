"""content_defined_chunks + profile_table unit tests."""

import random
import string

import pytest
from pyspark.sql import functions as F

from omop_etl_spark.operators.chunking import content_defined_chunks
from omop_etl_spark.operators.profile import profile_table

W, B, M, D = 8, 31, 1_048_573, 64


def _ref_chunks(t):
    if not t:
        return []
    n = len(t)
    b = [0]
    for pos in range(W, n + 1):
        h = sum(ord(t[pos - 1 - j]) * pow(B, j, M) for j in range(W)) % M
        if h % D == 0:
            b.append(pos)
    b.append(n)
    return [c for c in (t[b[i]:b[i + 1]] for i in range(len(b) - 1)) if c]


def test_cdc_chunks_match_python_reference(spark):
    rng = random.Random(99)
    alphabet = string.ascii_letters + string.digits + " .,\né✓"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 300)))
        for _ in range(25)
    ] + ["", "tiny", "x" * 7, "x" * 8]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_chars"])
        for r in content_defined_chunks(df).collect()
    }
    exp = {}
    for i, t in enumerate(texts):
        for ci, c in enumerate(_ref_chunks(t)):
            exp[(i, ci)] = (c, len(c))
    assert got == exp
    # chunks reassemble the document exactly
    for i, t in enumerate(texts):
        joined = "".join(
            exp[(i, ci)][0] for ci in range(sum(1 for k in exp if k[0] == i))
        )
        assert joined == t


def test_cdc_chunks_shift_invariant_interior(spark):
    """The CDC property: prepending a prefix only perturbs chunks near
    the front — interior chunk identity survives the offset shift."""
    rng = random.Random(7)
    body = "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(2000))
    shifted = "ZQX-PREFIX-9 " * 3 + body
    df = spark.createDataFrame([(0, body), (1, shifted)], "doc_id long, text string")
    rows = content_defined_chunks(df).collect()
    a = {r["chunk_text"] for r in rows if r["doc_id"] == 0}
    b = {r["chunk_text"] for r in rows if r["doc_id"] == 1}
    assert len(a & b) >= len(a) - 2, (len(a), len(a & b))


def test_cdc_chunks_bad_params(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        content_defined_chunks(df, window=0)
    with pytest.raises(ValueError):
        content_defined_chunks(df, divisor=1)


def test_profile_table_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "b", 2.5, None),
            (2, None, 1.5, None),
            (2, "a", None, None),
        ],
        "k long, s string, f double, z string",
    )
    out = {r["column_name"]: r for r in profile_table(df).collect()}
    assert out["k"]["n_nulls"] == 0 and out["k"]["n_distinct"] == 2
    assert out["k"]["min_value"] == "1" and out["k"]["max_value"] == "2"
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_value"] == "a" and out["s"]["max_value"] == "b"
    # float min/max render floor(x*100) cents by default (exact
    # cross-engine); raw engine rendering only when opted in
    assert out["f"]["min_value"] == "150" and out["f"]["max_value"] == "250"
    assert out["f"]["n_nulls"] == 1 and out["f"]["n_distinct"] == 2
    opt = {r["column_name"]: r for r in profile_table(df, float_minmax=True).collect()}
    assert opt["f"]["min_value"] == "1.5"
    assert out["z"]["n_distinct"] == 0 and out["z"]["n_nulls"] == 3
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError):
        profile_table(df.select(F.col("k")).limit(0), [])


def test_profile_table_single_job(spark):
    """The whole profile rides one wide aggregate — no per-column jobs."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"), F.col("id").cast("string").alias("s")
    )
    plan = profile_table(df)._jdf.queryExecution().optimizedPlan().toString()
    # one scan of the input, not one per column
    assert plan.count("Range (0, 100") == 1, plan


def test_unigram_segment_matches_python_dp(spark):
    from omop_etl_spark.operators.chunking import unigram_segment_words

    rng = random.Random(5)
    pieces = [(c, rng.randint(5, 40)) for c in string.ascii_lowercase]
    seen = {p for p, _ in pieces}
    for _ in range(150):
        p = "".join(rng.choice("abcdefgh") for _ in range(rng.randint(2, 4)))
        if p not in seen:
            seen.add(p)
            pieces.append((p, rng.randint(3, 60)))
    pdf = spark.createDataFrame(pieces, "piece string, cost long")
    words = {
        "".join(rng.choice("abcdefghz") for _ in range(rng.randint(1, 16)))
        for _ in range(150)
    }
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: (r["seg_cost"], r["n_pieces"])
        for r in unigram_segment_words(wdf, pdf).collect()
    }
    cost = dict(pieces)

    def ref(w):
        inf = float("inf")
        dp = [(0, 0)] + [(inf, 0)] * len(w)
        for i in range(1, len(w) + 1):
            best = (inf, 0)
            for j in range(max(0, i - 4), i):
                p = w[j:i]
                if p in cost and dp[j][0] != inf:
                    cand = (dp[j][0] + cost[p], dp[j][1] + 1)
                    if cand < best:
                        best = cand
            dp[i] = best
        return (None, None) if dp[len(w)][0] == float("inf") else dp[len(w)]

    assert all(got[w] == ref(w) for w in words), [
        (w, got[w], ref(w)) for w in words if got[w] != ref(w)
    ][:5]
    # unreachable word (char outside vocab) -> NULLs, never a bogus 0
    r = unigram_segment_words(
        spark.createDataFrame([("ab9",)], "word string"), pdf
    ).collect()[0]
    assert r["seg_cost"] is None and r["n_pieces"] is None
    # over-long words are excluded, bad params raise
    long_df = spark.createDataFrame([("a" * 40,)], "word string")
    assert unigram_segment_words(long_df, pdf, max_word_len=16).count() == 0
    with pytest.raises(ValueError):
        unigram_segment_words(wdf, pdf, max_piece_len=0)
    with pytest.raises(ValueError):
        unigram_segment_words(wdf, pdf, max_word_len=2000)


def test_functional_dependencies(spark):
    from omop_etl_spark.operators.profile import functional_dependencies

    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (1, "a", 11),
            (2, "b", 10),
            (2, "c", 10),
            (3, None, 10),
        ],
        "k long, v string, w long",
    )
    out = {
        (r["determinant"], r["dependent"]): r
        for r in functional_dependencies(df, [("k", "v"), ("k", "w"), ("v", "k")]).collect()
    }
    # k->v: group 2 maps to {b,c} -> violated; NULL-only group 3 ok
    r = out[("k", "v")]
    assert r["n_groups"] == 3 and r["n_violations"] == 1 and not r["holds"]
    # k->w: group 1 maps to {10,11} -> violated
    assert not out[("k", "w")]["holds"]
    # v->k holds (a->1, b->2, c->2; NULL determinant groups too)
    assert out[("v", "k")]["holds"]
    with pytest.raises(ValueError):
        functional_dependencies(df, [])
    with pytest.raises(ValueError):
        functional_dependencies(df, [("k", "nope")])


def test_unigram_segment_pieces_canonical_path(spark):
    """Pieces variant (round 11): same (cost, n_pieces) as the scorer,
    pieces reassemble the word, and ties between optimal paths resolve
    to the CANONICAL longest-piece-first backtrack on both a hand case
    and a fuzz sweep against a python reference."""
    from omop_etl_spark.operators.chunking import (
        unigram_segment_pieces,
        unigram_segment_words,
    )

    # hand case: 'abab' with ab=5 — two pieces either way, but 'ab|ab'
    # is the canonical path; 'aa' has a unique path
    pdf0 = spark.createDataFrame(
        [("a", 10), ("b", 10), ("ab", 5), ("ba", 5)],
        "piece string, cost long",
    )
    wdf0 = spark.createDataFrame([("abab",), ("aa",)], "word string")
    got0 = {
        r["word"]: (r["seg_cost"], r["n_pieces"], list(r["seg_pieces"]))
        for r in unigram_segment_pieces(wdf0, pdf0).collect()
    }
    assert got0["abab"] == (10, 2, ["ab", "ab"])
    assert got0["aa"] == (20, 2, ["a", "a"])

    rng = random.Random(17)
    pieces = [(c, rng.randint(5, 40)) for c in string.ascii_lowercase]
    seen = {p for p, _ in pieces}
    for _ in range(120):
        p = "".join(rng.choice("abcde") for _ in range(rng.randint(2, 4)))
        if p not in seen:
            seen.add(p)
            pieces.append((p, rng.randint(3, 60)))
    pdf = spark.createDataFrame(pieces, "piece string, cost long")
    words = {
        "".join(rng.choice("abcdez") for _ in range(rng.randint(1, 16)))
        for _ in range(120)
    }
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: (
            r["seg_cost"],
            r["n_pieces"],
            None if r["seg_pieces"] is None else list(r["seg_pieces"]),
        )
        for r in unigram_segment_pieces(wdf, pdf).collect()
    }
    scored = {
        r["word"]: (r["seg_cost"], r["n_pieces"])
        for r in unigram_segment_words(wdf, pdf).collect()
    }
    cost = dict(pieces)

    def ref_pieces(w):
        inf = float("inf")
        dp = [(0, 0)] + [(inf, 0)] * len(w)
        for i in range(1, len(w) + 1):
            best = (inf, 0)
            for j in range(max(0, i - 4), i):
                p = w[j:i]
                if p in cost and dp[j][0] != inf:
                    cand = (dp[j][0] + cost[p], dp[j][1] + 1)
                    if cand < best:
                        best = cand
            dp[i] = best
        if dp[len(w)][0] == float("inf"):
            return None
        # canonical backtrack: smallest start (longest piece) whose
        # predecessor state is optimal
        out, pos = [], len(w)
        while pos > 0:
            for j in range(max(0, pos - 4), pos):
                p = w[j:pos]
                if (
                    p in cost
                    and dp[j][0] != float("inf")
                    and (dp[j][0] + cost[p], dp[j][1] + 1) == dp[pos]
                ):
                    out.insert(0, p)
                    pos = j
                    break
        return out

    for w in words:
        assert got[w][:2] == scored[w], w
        want = ref_pieces(w)
        assert got[w][2] == want, (w, got[w][2], want)
        if want is not None:
            assert "".join(got[w][2]) == w


def test_learn_unigram_vocab_two_rounds(spark):
    """Hard-EM rounds match a python reference: canonical-path usage
    counts, multi-char pruning (1-grams always survive), bits(usage)
    re-costing; final (cost, usage) pairs are self-consistent."""
    from omop_etl_spark.operators.chunking import learn_unigram_vocab

    words = [("abab", 3), ("abc", 2), ("cc", 5), ("zq", 1)]
    seed = [
        ("a", 20), ("b", 20), ("c", 20), ("z", 20), ("q", 20),
        ("ab", 9), ("bc", 9), ("abab", 15), ("cc", 9), ("ba", 9),
    ]
    wdf = spark.createDataFrame(words, "word string, cnt long")
    pdf = spark.createDataFrame(seed, "piece string, cost long")
    got = {
        r.piece: (r.cost, r.usage)
        for r in learn_unigram_vocab(wdf, pdf, rounds=2).collect()
    }

    def seg(w, cost):
        inf = float("inf")
        dp = [(0, 0)] + [(inf, 0)] * len(w)
        for i in range(1, len(w) + 1):
            for j in range(max(0, i - 4), i):
                p = w[j:i]
                if p in cost and dp[j][0] != inf:
                    cand = (dp[j][0] + cost[p], dp[j][1] + 1)
                    if cand < dp[i]:
                        dp[i] = cand
        out, pos = [], len(w)
        while pos > 0:
            for j in range(max(0, pos - 4), pos):
                p = w[j:pos]
                if p in cost and dp[j][0] != float("inf") and (
                    dp[j][0] + cost[p], dp[j][1] + 1
                ) == dp[pos]:
                    out.insert(0, p)
                    pos = j
                    break
        return out

    cost = dict(seed)
    for _ in range(2):
        usage = {}
        for w, n in words:
            for p in seg(w, cost):
                usage[p] = usage.get(p, 0) + n
        cost = {
            p: (48 - len(bin(usage.get(p, 0))[2:])) * 4 + len(p)
            for p in cost
            if len(p) == 1 or p in usage
        }
    want = {p: (c, usage.get(p, 0)) for p, c in cost.items()}
    assert got == want
    # structural expectations: 1-grams retained even when unused;
    # the whole-word piece for 'abab' dominates and survives
    assert "z" in got and "q" in got
    assert got["abab"][1] == 3
    assert "ba" not in got  # never on a canonical path -> pruned
