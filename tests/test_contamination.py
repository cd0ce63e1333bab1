"""Decontamination + repetition metrics
(omop_etl_spark/operators/contamination.py) and the deterministic
global shuffle (sampling.shuffle_shards)."""

import itertools

from pyspark.sql import functions as F

from omop_etl_spark.operators.contamination import (
    decontaminate,
    repetition_stats,
)
from omop_etl_spark.operators.sampling import shuffle_shards


def _corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
        (2, "the quick brown fox went home early today"),  # shares 3-gram w/ 0
        (3, "completely unrelated words appear here only once"),
        (4, "a b"),  # shorter than n -> whole-text shingle
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_decontaminate_flags_overlapping_docs(spark):
    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], "doc_id bigint, text string"
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(docs, bench, n=3).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4}
    # "the quick brown" + "quick brown fox" shared by docs 0 and 2
    assert out[0] == (2, True)
    assert out[2] == (2, True)
    assert out[1] == (0, False)
    assert out[3] == (0, False)
    assert out[4] == (0, False)


def test_decontaminate_shuffle_join_path_matches(spark):
    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], "doc_id bigint, text string"
    )
    a = sorted(map(tuple, decontaminate(docs, bench, n=3).collect()))
    b = sorted(
        map(
            tuple,
            decontaminate(docs, bench, n=3, broadcast_benchmark=False).collect(),
        )
    )
    assert a == b


def test_repetition_stats_degenerate_vs_natural(spark):
    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam"),  # one distinct 2-gram
            (1, "one two three four five six"),  # all 2-grams distinct
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_stats(docs, n=2).collect()}
    assert out[0]["total_grams"] == 5 and out[0]["distinct_grams"] == 1
    assert out[0]["dup_gram_frac"] == 0.8
    assert out[0]["top_gram_frac"] == 1.0
    assert out[1]["dup_gram_frac"] == 0.0
    assert out[1]["top_gram_frac"] == 0.2


def test_repetition_stats_counts_multiplicity(spark):
    # "a b a b a" -> 2-grams: ab, ba, ab, ba -> total 4, distinct 2
    docs = spark.createDataFrame([(0, "a b a b a")], "doc_id bigint, text string")
    row = repetition_stats(docs, n=2).collect()[0]
    assert row["total_grams"] == 4
    assert row["distinct_grams"] == 2
    assert row["dup_gram_frac"] == 0.5
    assert row["top_gram_frac"] == 0.5


def test_shuffle_shards_is_permutation_and_deterministic(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = shuffle_shards(df, num_shards=8)
    rows = [(r["doc_id"], r["shard"], r["pos"]) for r in out.collect()]
    assert len(rows) == 500
    # every shard's positions are 0..len-1 (dense ranks, no gaps)
    by_shard = {}
    for _, s, p in rows:
        by_shard.setdefault(s, []).append(p)
    assert set(by_shard) <= set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # deterministic across recomputation
    again = [(r["doc_id"], r["shard"], r["pos"]) for r in out.collect()]
    assert sorted(rows) == sorted(again)
    # and actually shuffled: within-shard id order differs from pos order
    some_shard = max(by_shard, key=lambda s: len(by_shard[s]))
    ids_by_pos = sorted(
        ((p, i) for i, s, p in rows if s == some_shard), key=lambda t: t[0]
    )
    ids = [i for _, i in ids_by_pos]
    assert ids != sorted(ids)


def test_strip_boilerplate_removes_shared_lines(spark):
    from omop_etl_spark.operators.contamination import strip_boilerplate

    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nunique alpha\nFOOTER"),
            (2, "COOKIE BANNER\nunique beta\nFOOTER"),
            (3, "totally original\ncontent here"),
            (4, "COOKIE BANNER\nFOOTER"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in strip_boilerplate(docs, min_docs=2).collect()}
    assert len(out) == 4
    # shared lines stripped everywhere, order of survivors preserved
    assert out[1].text_clean == "unique alpha" and out[1].n_lines_kept == 1
    assert out[2].text_clean == "unique beta"
    assert out[3].text_clean == "totally original\ncontent here"
    assert out[3].n_lines_kept == 2
    # all-boilerplate doc keeps its row, empty
    assert out[4].text_clean == "" and out[4].n_lines_kept == 0


def test_strip_boilerplate_line_order_restored(spark):
    from omop_etl_spark.operators.contamination import strip_boilerplate

    text = "\n".join(f"line {i:03d}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, text), (2, "other doc")], "doc_id long, text string"
    ).repartition(4)
    out = {r.doc_id: r for r in strip_boilerplate(docs, min_docs=2).collect()}
    assert out[1].text_clean == text  # nothing shared -> intact, ordered


def test_strip_boilerplate_distinct_doc_count_not_occurrences(spark):
    from omop_etl_spark.operators.contamination import strip_boilerplate

    # "dup" appears twice but only in ONE doc -> NOT boilerplate
    docs = spark.createDataFrame(
        [(1, "dup\nmiddle\ndup"), (2, "unrelated")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in strip_boilerplate(docs, min_docs=2).collect()}
    assert out[1].text_clean == "dup\nmiddle\ndup"


def test_dedup_lines_keep_first_occurrence(spark):
    from omop_etl_spark.operators.contamination import dedup_lines

    syndicated = "this syndicated paragraph is long enough to dedup"
    docs = spark.createDataFrame(
        [
            (1, f"unique opening line of doc one\n{syndicated}\nshort"),
            (2, f"{syndicated}\nunique middle line of doc two here"),
            (3, f"short\n{syndicated}"),
        ],
        "doc_id long, text string",
    ).repartition(3)
    out = {r.doc_id: r for r in dedup_lines(docs, min_chars=20).collect()}
    # doc 1 holds the first occurrence -> intact
    assert out[1].text_clean == (
        f"unique opening line of doc one\n{syndicated}\nshort"
    )
    # later occurrences removed; short lines never deduped
    assert out[2].text_clean == "unique middle line of doc two here"
    assert out[3].text_clean == "short"
    assert out[3].n_lines_kept == 1


def test_dedup_lines_first_is_by_position_within_doc(spark):
    from omop_etl_spark.operators.contamination import dedup_lines

    dup = "a repeated line well over the char threshold"
    docs = spark.createDataFrame(
        [(5, f"{dup}\nmiddle content line that is long\n{dup}")],
        "doc_id long, text string",
    )
    out = dedup_lines(docs, min_chars=20).collect()[0]
    # within one doc the FIRST position survives
    assert out.text_clean == f"{dup}\nmiddle content line that is long"


def test_dedup_lines_matches_python_reference(spark):
    import random

    from omop_etl_spark.operators.contamination import dedup_lines

    rng = random.Random(7)
    pool = [f"shared content line number {i} padded out" for i in range(12)]
    docs = []
    for d in range(40):
        lines = [f"doc {d} own line {j} with enough padding chars" for j in range(3)]
        lines += rng.sample(pool, rng.randint(0, 4)) + ["x"]
        rng.shuffle(lines)
        docs.append((d, "\n".join(lines)))

    seen: set[str] = set()
    expect = {}
    for d, text in sorted(docs):
        kept = []
        for ln in text.split("\n"):
            if len(ln) < 20:
                kept.append(ln)
            elif ln not in seen:
                seen.add(ln)
                kept.append(ln)
        expect[d] = "\n".join(kept)

    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(5)
    got = {r.doc_id: r.text_clean for r in dedup_lines(df, min_chars=20).collect()}
    assert got == expect


def test_cross_doc_dup_stats(spark):
    from omop_etl_spark.operators.contamination import cross_doc_dup_stats

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),  # shares 'alpha beta gamma'
            (3, "zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cross_doc_dup_stats(docs, n=3).collect()}
    assert out[1].n_grams == 2 and out[1].dup_grams == 1
    assert out[1].dup_frac == 0.5
    assert out[2].dup_grams == 1
    assert out[3].dup_grams == 0 and out[3].dup_frac == 0.0


def test_cross_doc_dup_short_doc_whole_text_gram(spark):
    from omop_etl_spark.operators.contamination import cross_doc_dup_stats

    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "other")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cross_doc_dup_stats(docs, n=13).collect()}
    assert out[1].dup_grams == 1 and out[2].dup_grams == 1
    assert out[3].dup_grams == 0


def test_source_overlap_jaccard(spark):
    from omop_etl_spark.operators.contamination import source_overlap

    docs = spark.createDataFrame(
        [
            (1, "a", "one two three four"),
            (2, "b", "one two three five"),
            (3, "c", "six seven eight nine"),
        ],
        "doc_id long, source string, text string",
    )
    rows = {(r.src_a, r.src_b): r for r in source_overlap(docs, n=3).collect()}
    # a: {one two three, two three four}; b: {one two three, two three five}
    r = rows[("a", "b")]
    assert r.grams_a == 2 and r.grams_b == 2 and r.common_grams == 1
    assert abs(r.jaccard - 1 / 3) < 1e-6
    # disjoint pair emits no row
    assert ("a", "c") not in rows and ("b", "c") not in rows


def test_dup_span_stats_hand_case(spark):
    from omop_etl_spark.operators.contamination import dup_span_stats

    # n=3 grams; docs 1 and 2 share the run "a b c d" (grams "a b c",
    # "b c d" -> one span of 2); doc 3 is all-unique
    rows = [
        (1, "a b c d x y z w"),
        (2, "q a b c d r s t"),
        (3, "k l m n o p"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in dup_span_stats(df, n=3).collect()}
    # doc 1: 6 grams, dup grams at pos 0,1 -> 1 span of 2
    assert (got[1].n_grams, got[1].n_dup_grams, got[1].n_spans, got[1].max_span_grams) == (6, 2, 1, 2)
    # doc 2: same shared run at pos 1,2
    assert (got[2].n_dup_grams, got[2].n_spans, got[2].max_span_grams) == (2, 1, 2)
    # doc 3: nothing duplicated
    assert (got[3].n_dup_grams, got[3].n_spans, got[3].max_span_grams) == (0, 0, 0)


def test_dup_span_stats_within_doc_repetition(spark):
    from omop_etl_spark.operators.contamination import dup_span_stats

    # a gram repeated INSIDE one document counts as duplicated too
    df = spark.createDataFrame(
        [(1, "a b c z z z a b c w w w")], "doc_id int, text string"
    )
    got = dup_span_stats(df, n=3).collect()[0]
    assert got.n_dup_grams >= 2  # both "a b c" occurrences
    assert got.n_spans >= 1


def test_source_influence_exact_vs_python_reference(spark):
    """Leave-one-out description-length delta replays a brute-force
    python model exactly (integer bits costs, no floats anywhere)."""
    from omop_etl_spark.operators.contamination import source_influence

    docs = spark.createDataFrame(
        [
            (1, "web", "the cat sat on the mat"),
            (2, "web", "the dog sat"),
            (3, "books", "a cat and a dog and a bird"),
            (4, "books", "the bird sat on the cat"),
            (5, "code", "x y x y zebra"),
        ],
        "doc_id int, source string, text string",
    )
    got = {
        r["source"]: (
            r["n_tokens"], r["influence_bits"],
            r["monopoly_terms"], r["monopoly_mass"],
        )
        for r in source_influence(docs).collect()
    }

    # brute-force reference
    import collections
    import re as _re

    rows = docs.collect()
    per = collections.defaultdict(collections.Counter)
    for r in rows:
        toks = [t for t in _re.split(r"[^a-z0-9]+", r["text"].lower()) if t]
        per[r["source"]].update(toks)
    glob = collections.Counter()
    for c in per.values():
        glob.update(c)

    def bits(x):
        return len(bin(x)) - 2

    def code_len(counter):
        return sum(c * (48 - bits(c)) for c in counter.values())

    L = code_len(glob)
    for src, cnt in per.items():
        rest = glob - cnt  # Counter difference drops zeros
        expect_inf = L - code_len(rest)
        mono = [t for t in cnt if glob[t] == cnt[t]]
        assert got[src] == (
            sum(cnt.values()),
            expect_inf,
            len(mono),
            sum(cnt[t] for t in mono),
        ), src


def test_contamination_spans_runs_and_severity(spark):
    """Run structure: consecutive overlapping grams fold into islands;
    a verbatim leak shows one long run, scattered idiom shows short
    ones; clean docs report zeros."""
    from omop_etl_spark.operators.contamination import contamination_spans

    bench = spark.createDataFrame(
        [(100, "q w e r t y u i o p")], "doc_id int, text string"
    )
    docs = spark.createDataFrame(
        [
            # verbatim 10-token leak embedded mid-doc: 8 consecutive
            # 3-gram hits, one span
            (1, "a b c q w e r t y u i o p d e"),
            # two separated 3-token borrowings: 1-gram runs, two spans
            (2, "q w e z z z r t y z z z"),
            # clean
            (3, "alpha beta gamma delta"),
            # shorter than n: whole text is one gram, no bench match
            (4, "xy zq"),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: (r["n_flagged_grams"], r["n_spans"], r["max_run_grams"])
        for r in contamination_spans(docs, bench, n=3).collect()
    }
    assert got[1] == (8, 1, 8)
    assert got[2] == (2, 2, 1)
    assert got[3] == (0, 0, 0)
    assert got[4] == (0, 0, 0)
