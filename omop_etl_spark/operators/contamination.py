"""Train/test decontamination and intra-document repetition metrics.

Standard LLM-corpus hygiene the reference has no counterpart for (its
scope ends at SQL ETL; see SURVEY.md §2 north-star extensions):

* :func:`decontaminate` — flag training documents that share any word
  n-gram with an evaluation/benchmark set (the GPT-3/PaLM-style "13-gram
  overlap" decontamination rule, parameterized n).
* :func:`repetition_stats` — per-document duplicate-n-gram and
  top-n-gram character fractions (the Gopher repetition quality
  signals, Rae et al. 2021 §A1.1), used to drop degenerate
  boilerplate/spam pages before training.

Both are built from explode + hash-aggregate only — no windows over the
corpus, no driver-side state — so they scale as a constant number of
shuffles regardless of corpus size.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import token_shingles
from .util import spread

__all__ = [
    "contamination_spans",
    "cross_doc_dup_stats",
    "dup_span_stats",
    "decontaminate",
    "dedup_lines",
    "repetition_stats",
    "source_influence",
    "source_overlap",
    "strip_boilerplate",
]


def strip_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level boilerplate line removal (the CCNet/RefinedWeb
    pattern): a line occurring in ``min_docs`` or more DISTINCT
    documents is boilerplate (nav bars, cookie banners, license
    headers) and is dropped from every document. Returns one row per
    input document: ``(id_col, text_clean, n_lines_kept)`` — documents
    whose every line was boilerplate keep their row with an empty
    ``text_clean``.

    Plan shape: explode lines (map-side), one hash aggregate on the
    line value to find hot lines (map-side combined), one anti-join
    back, one hash aggregate on the doc key to reassemble. The hot set
    is usually small (boilerplate vocabulary), but on a web corpus with
    heavy page duplication it can be arbitrarily large, so the join
    strategy is left to AQE — it broadcasts when the measured size
    allows and falls back to a shuffled hash join when it does not.
    No global sort; line order inside a doc is restored with
    ``array_sort`` over (line_no, line) structs within the doc's
    aggregate row.
    """
    # F.split takes a Java regex while concat_ws below reassembles with
    # the literal string — escape so a separator like "." or "|" splits
    # literally too (re.escape output is Java-regex-safe: it never
    # escapes alphanumerics, and Java accepts \<punct> as the literal).
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
            "__ln", "__line"
        ),
    )
    hot = (
        lines.groupBy("__line")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__line")
    )
    kept = lines.join(hot, "__line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("__ln", "__line"))),
                lambda s: s["__line"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    ids = df.select(F.col(id_col))
    return ids.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("int").alias("n_lines_kept"),
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 20,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-global exact line dedup, keep-first (the line-granular
    form of Lee et al. 2022's "Deduplicating Training Data" exact
    substring dedup). Every line of at least ``min_chars`` characters
    is kept only at its FIRST occurrence in the corpus — first by
    ``(id_col, line position)`` — and removed everywhere else. Lines
    shorter than ``min_chars`` (blank lines, bullets, code braces) are
    never deduplicated: they are legitimate repeats, and removing them
    would shred document structure.

    Complements :func:`strip_boilerplate`: that operator removes a hot
    line from EVERY document (frequency >= min_docs), this one keeps
    exactly one canonical occurrence — the right semantics when the
    duplicated span is real content (syndicated articles, quoted
    passages) rather than chrome.

    Returns one row per input document: ``(id_col, text_clean,
    n_lines_kept)``; fully-deduplicated documents keep their row with
    an empty ``text_clean``.

    Plan shape: explode lines (map-side), reduce to the first
    ``(id, position)`` per 8-byte ``xxhash64`` line key (one hash
    aggregate, map-side combined — skew-robust even when one line
    repeats 10^6 times, unlike a window over the line key), join that
    winner set back on the hash (strategy left to AQE), rebuild with
    one aggregate on the doc key. Raw line text never enters a shuffle:
    both wide stages carry the 8-byte hash.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
            "__ln", "__line"
        ),
    ).withColumn("__lh", F.xxhash64("__line"))

    dedupable = F.length("__line") >= min_chars
    firsts = (
        lines.filter(dedupable)
        .groupBy("__lh")
        .agg(F.min(F.struct(F.col(id_col), F.col("__ln"))).alias("__first"))
    )
    kept = (
        lines.join(firsts, "__lh", "left")
        .filter(
            ~dedupable
            | (
                (F.col(f"__first.{id_col}") == F.col(id_col))
                & (F.col("__first.__ln") == F.col("__ln"))
            )
        )
        .select(id_col, "__ln", "__line")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("__ln", "__line"))),
                lambda s: s["__line"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    ids = df.select(F.col(id_col))
    return ids.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("int").alias("n_lines_kept"),
    )


def cross_doc_dup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per-document CROSS-document duplication metrics: of a document's
    distinct word ``n``-grams, how many also occur in at least one
    OTHER document. The corpus-internal dual of :func:`decontaminate`
    (there the "other side" is a benchmark; here it is the rest of the
    corpus itself) and the cross-doc dual of :func:`repetition_stats`
    (which is within-document). High ``dup_frac`` flags syndicated /
    mirrored / templated pages that exact and near dedup may miss when
    edits are scattered.

    Returns ``(id_col, n_grams, dup_grams, dup_frac)`` with one row per
    input document (documents shorter than ``n`` tokens count their
    whole text as one gram, matching ``token_shingles``).

    Plan shape: explode distinct shingles to ``(doc, hash)`` (one
    aggregate), count documents per hash (second aggregate on the
    8-byte key, map-side combined), join the document-frequency back
    and reduce per doc (third aggregate). All shuffles carry hashed
    grams + counts; nothing is quadratic — a gram shared by 10^6 docs
    contributes one row per (doc, gram), same as the explode input.
    """
    # token_shingles is already distinct-per-document, so the exploded
    # (doc, hash) pairs are unique without an extra shuffle
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(token_shingles(text_col, n)).alias("__gram"),
    ).select(id_col, F.xxhash64("__gram").alias("__gh"))
    gram_df = doc_grams.groupBy("__gh").agg(F.count(F.lit(1)).alias("__df"))
    per_doc = (
        doc_grams.join(gram_df, "__gh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("__df") >= 2).cast("bigint")).alias("dup_grams"),
        )
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce("dup_grams", F.lit(0)).cast("bigint").alias("dup_grams"),
        F.round(
            F.coalesce("dup_grams", F.lit(0))
            / F.greatest(F.coalesce("n_grams", F.lit(0)), F.lit(1)).cast("double"),
            6,
        ).alias("dup_frac"),
    )


def source_overlap(
    docs: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Pairwise n-gram Jaccard overlap between corpus strata (sources,
    dumps, snapshots). For every unordered pair of strata, over each
    stratum's DISTINCT word-``n``-gram set: ``|A ∩ B| / |A ∪ B|``.
    The standard corpus-forensics view for "how much of source X is
    re-hosted in source Y" before mixing sources into a training run.

    Returns ``(src_a, src_b, grams_a, grams_b, common_grams, jaccard)``
    with ``src_a < src_b`` lexicographically.

    Plan shape: reduce to distinct ``(stratum, gram-hash)`` (one
    aggregate; raw grams never shuffle), self-join on the hash with
    ``src_a < src_b`` to count intersections (the per-gram fan-out is
    bounded by the number of strata, not documents, so the join output
    is at most ``S^2/2`` rows per gram — strata counts are small by
    construction), broadcast the per-stratum set sizes (one row per
    stratum) onto the pair counts. Suitable when strata number in the
    hundreds; it is a strata-pair matrix, not a document operator.
    """
    # r17: considered checkpointing grams (3 consumers: sizes + both
    # self-join sides, 4 source scans in the plan audit) — measured and
    # REJECTED: the distinct n-GRAM set is near-token-count-sized (not
    # Zipf-bounded like a unigram vocab), and materializing it read
    # 15 -> 25 s at the 100x tier with GC pressure; the rescans' distinct
    # exchange is runtime-reused across consumers instead.
    grams = (
        docs.select(
            F.col(strata_col).alias("__src"),
            F.explode(token_shingles(text_col, n)).alias("__gram"),
        )
        .select("__src", F.xxhash64("__gram").alias("__gh"))
        .distinct()
    )
    sizes = grams.groupBy("__src").agg(F.count(F.lit(1)).alias("__sz"))
    a = grams.select(F.col("__src").alias("src_a"), "__gh")
    b = grams.select(F.col("__src").alias("src_b"), "__gh")
    common = (
        a.join(b, "__gh")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("common_grams"))
    )
    sz_a = F.broadcast(sizes.select(F.col("__src").alias("src_a"), F.col("__sz").alias("grams_a")))
    sz_b = F.broadcast(sizes.select(F.col("__src").alias("src_b"), F.col("__sz").alias("grams_b")))
    return (
        common.join(sz_a, "src_a")
        .join(sz_b, "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("grams_a").cast("bigint").alias("grams_a"),
            F.col("grams_b").cast("bigint").alias("grams_b"),
            F.col("common_grams").cast("bigint").alias("common_grams"),
            F.round(
                F.col("common_grams")
                / (
                    F.col("grams_a") + F.col("grams_b") - F.col("common_grams")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 13,
    broadcast_benchmark: bool = False,
) -> DataFrame:
    """Tag every training document with its n-gram overlap against a
    benchmark corpus.

    Returns one row per input document: ``(id_col, n_hits,
    contaminated)`` where ``n_hits`` is the number of DISTINCT document
    shingles that also occur anywhere in the benchmark and
    ``contaminated`` is ``n_hits > 0``. Filter on ``~contaminated`` to
    produce the decontaminated corpus; keeping the count (not just the
    flag) lets callers apply a laxer "≥ k collisions" rule.

    Plan shape: the benchmark's distinct shingles are reduced to 8-byte
    ``xxhash64`` keys (map-side-combined aggregate over the benchmark
    only). By default AQE picks the join strategy — it broadcasts the
    gram set whenever it actually fits, and falls back to a shuffle
    join on the hash key when the "benchmark" is itself large (e.g.
    cross-corpus contamination), so no plan can OOM at scale. Set
    ``broadcast_benchmark=True`` only for a contract-bounded benchmark
    (a fixed eval suite, KBs–MBs of grams) to pin the broadcast hash
    join: the 100 TB side is then guaranteed never to shuffle, one
    pass, map-only until the final per-document count.
    Hashing shingles to 64 bits
    trades a ~2^-64-per-pair false-collision rate for never moving raw
    n-gram strings through the shuffle.
    """
    bcol = bench_text_col or text_col
    bench_grams = (
        benchmark.select(
            F.explode(token_shingles(bcol, n)).alias("__gram")
        )
        .select(F.xxhash64("__gram").alias("__gh"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)

    doc_grams = docs.select(
        F.col(id_col), F.explode(token_shingles(text_col, n)).alias("__gram")
    ).select(id_col, F.xxhash64("__gram").alias("__gh"))

    hits = (
        doc_grams.join(bench_grams, "__gh")
        .groupBy(id_col)
        .agg(F.count_distinct("__gh").alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Per-document n-gram repetition metrics (Gopher quality signals).

    For each document, over its word n-grams WITH multiplicity:

    * ``total_grams`` / ``distinct_grams``
    * ``dup_gram_frac`` — fraction of gram occurrences that are
      repeats: ``1 - distinct/total``
    * ``top_gram_frac`` — occurrences of the single most frequent gram
      over total (Gopher's "fraction of characters in the most common
      n-gram", word-weighted)

    A document of pure boilerplate repetition scores near 1 on both;
    natural prose scores near 0. Thresholding (Gopher drops
    ``top_2gram_frac > 0.2`` etc.) is left to the caller.

    Plan shape: explode to ``(doc, gram)``, count multiplicity (one
    hash aggregate, map-side combined), then reduce per document (a
    second aggregate on ``doc`` alone). Both shuffles carry 8-byte
    hashed grams and counts — raw text never leaves the scan stage, and
    no per-document state exceeds its own distinct-gram count.
    """
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
    ).otherwise(F.array(F.array_join(toks, " ")))

    per_gram = (
        docs.select(F.col(id_col), F.explode(grams).alias("__gram"))
        .select(id_col, F.xxhash64("__gram").alias("__gh"))
        .groupBy(id_col, "__gh")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    return per_gram.groupBy(id_col).agg(
        F.sum("__cnt").cast("bigint").alias("total_grams"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_grams"),
        F.round(
            1.0 - F.count(F.lit(1)) / F.sum("__cnt").cast("double"), 6
        ).alias("dup_gram_frac"),
        F.round(
            F.max("__cnt") / F.sum("__cnt").cast("double"), 6
        ).alias("top_gram_frac"),
    )


def dup_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per-document duplicated-SPAN diagnostics — the run-length view of
    exact-substring dedup (Lee et al. 2022, arXiv:2107.06499): a token
    ``n``-gram is *duplicated* when it occurs more than once in the
    corpus (any document, including its own); consecutive duplicated
    grams form spans. Returns per doc::

        (id_col, n_grams, n_dup_grams, n_spans, max_span_grams)

    where ``max_span_grams`` is the longest consecutive run — the
    quantity a span-granular deduper would actually cut.

    Scale design: grams are reduced to engine-portable 64-bit md5 keys
    BEFORE the corpus-wide count (the shuffle carries 8-byte keys, not
    13-gram strings); the count frame aggregates to distinct-gram size;
    the span detection is the islands trick (position minus per-doc
    rank) — one window on the doc key, no self-join, nothing quadratic.
    Collision risk of the 64-bit key at web scale (~1e-5 for 1e7
    distinct grams) only perturbs *diagnostics counts*, never text.
    """
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
    ).otherwise(F.array(F.array_join(toks, " ")))
    ex = spread(df).select(
        F.col(id_col).alias("__id"), F.posexplode(grams).alias("__pos", "__g")
    )
    # 64-bit md5-derived key (first 16 hex chars): engine-portable, so
    # the DuckDB oracle replays the exact same counts
    key = F.conv(F.substring(F.md5(F.col("__g")), 1, 15), 16, 10).cast("bigint")
    hashed = ex.select("__id", "__pos", key.alias("__k"))
    counts = hashed.groupBy("__k").agg(F.count(F.lit(1)).alias("__cnt"))
    dup = (
        hashed.join(counts.filter(F.col("__cnt") > 1), "__k")
        .select("__id", "__pos")
    )
    w = Window.partitionBy("__id").orderBy("__pos")
    runs = (
        dup.withColumn("__grp", F.col("__pos") - F.row_number().over(w))
        .groupBy("__id", "__grp")
        .agg(F.count(F.lit(1)).alias("__len"))
    )
    per_doc_runs = runs.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max("__len").alias("max_span_grams"),
        F.sum("__len").alias("__ndup"),
    )
    totals = hashed.groupBy("__id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        totals.join(per_doc_runs, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.coalesce(F.col("__ndup"), F.lit(0)).cast("bigint").alias("n_dup_grams"),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce(F.col("max_span_grams"), F.lit(0))
            .cast("bigint")
            .alias("max_span_grams"),
        )
    )


def source_influence(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    cost_ceiling: int = 48,
) -> DataFrame:
    """Leave-one-out DESCRIPTION-LENGTH influence of each corpus
    source — the data-valuation primitive for "which slice, if
    dropped, changes the corpus distribution most" when weighing a
    training mix. Complements :func:`source_overlap` (pairwise set
    overlap) and the TV-drift gate (pairwise distribution distance):
    influence is each source's GLOBAL marginal contribution, computed
    exactly, no retraining and no pairwise blow-up.

    Model: the corpus unigram code with the integer cost schedule the
    unigram learner uses (chunking.learn_unigram_vocab) — a term of
    count ``c`` costs ``cost_ceiling - bits(c)`` bits per occurrence,
    ``bits`` = binary digit count (``length(bin(c))``, exact in any
    engine — no libm log anywhere). Corpus code length ``L = sum_t
    c(t) * (C - bits(c(t)))``; dropping source ``s`` re-prices every
    term it touches, so its influence folds to a single join on the
    term key:

        influence_bits(s) = sum over terms t with c_s(t) > 0 of
            c(t)*(C - bits(c(t))) - (c(t)-c_s(t))*(C - bits(c(t)-c_s(t)))

    Also reports each source's vocabulary MONOPOLY (terms appearing
    nowhere else, and their token mass) — the irreplaceability view of
    the same question.

    Plan shape (all linear, Zipf-bounded term-TYPE frames): one
    explode + hash-agg to per-(source, term) counts, one term-keyed
    hash-agg to global counts, one equi-join on the term key, one
    map-side-combined final agg per source. int64 headroom: the
    per-term products are < c * cost_ceiling, safe past 10^17 corpus
    tokens at the default ceiling.

    Output: one row per source — ``(source, n_tokens, influence_bits,
    monopoly_terms, monopoly_mass)``, all bigint.
    """
    if not 2 <= cost_ceiling <= 62:
        raise ValueError("source_influence: cost_ceiling must be in 2..62")
    c_lit = F.lit(int(cost_ceiling))

    def bits(col):
        return F.length(F.bin(col))

    toks = spread(docs).select(
        F.col(source_col).alias("__src"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                lambda t: t != "",
            )
        ).alias("__term"),
    )
    tc = toks.groupBy("__src", "__term").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cs")
    )
    gc = tc.groupBy("__term").agg(F.sum("__cs").alias("__c"))
    joined = tc.join(gc, "__term")
    rest = F.col("__c") - F.col("__cs")
    delta = F.col("__c") * (c_lit - bits(F.col("__c"))) - F.when(
        rest > 0, rest * (c_lit - bits(rest))
    ).otherwise(F.lit(0))
    return (
        joined.groupBy("__src")
        .agg(
            F.sum("__cs").cast("bigint").alias("n_tokens"),
            F.sum(delta).cast("bigint").alias("influence_bits"),
            F.sum(F.when(rest == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("monopoly_terms"),
            F.sum(F.when(rest == 0, F.col("__cs")).otherwise(0))
            .cast("bigint")
            .alias("monopoly_mass"),
        )
        .select(
            F.col("__src").alias(source_col),
            "n_tokens",
            "influence_bits",
            "monopoly_terms",
            "monopoly_mass",
        )
    )


def contamination_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 13,
) -> DataFrame:
    """SEVERITY view of :func:`decontaminate`: per training document,
    the contiguous RUNS of benchmark-overlapping word n-grams — a
    3-gram hit could be idiom, a 40-gram run is a verbatim leaked
    answer, and the flag-only view cannot tell them apart. A run of
    ``L`` consecutive overlapping n-grams witnesses a shared span of
    ``L + n - 1`` tokens (when the document has at least ``n`` tokens).

    Output: one row per input document — ``(id_col, n_flagged_grams,
    n_spans, max_run_grams)``, zeros when clean. ``max_run_grams`` is
    run length in GRAMS (exactly defined for every document, including
    the shorter-than-``n`` whole-text-gram case where token algebra
    would overstate).

    Plan shape: the benchmark reduces to distinct 8-byte gram hashes
    (strategy left to AQE, like :func:`decontaminate`); the corpus
    side explodes POSITIONAL grams (no distinct — positions are the
    point), semi-joins on the hash, and folds runs with the classic
    islands trick (``pos - row_number()`` per document, a per-doc
    window over only the FLAGGED positions — tiny next to the corpus).
    All arithmetic is exact integers.
    """
    bcol = bench_text_col or text_col
    bench_grams = (
        benchmark.select(F.explode(token_shingles(bcol, n)).alias("__gram"))
        .select(F.xxhash64("__gram").alias("__gh"))
        .distinct()
    )
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
    ).otherwise(F.array(F.array_join(toks, " ")))
    pos = spread(docs).select(
        F.col(id_col), F.posexplode(grams).alias("__pos", "__gram")
    ).select(id_col, "__pos", F.xxhash64("__gram").alias("__gh"))
    flagged = pos.join(bench_grams, "__gh").select(id_col, "__pos")
    w = Window.partitionBy(id_col).orderBy("__pos")
    runs = (
        flagged.withColumn("__isl", F.col("__pos") - F.row_number().over(w))
        .groupBy(id_col, "__isl")
        .agg(F.count(F.lit(1)).alias("__len"))
    )
    per_doc = runs.groupBy(id_col).agg(
        F.sum("__len").cast("bigint").alias("n_flagged_grams"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.max("__len").cast("bigint").alias("max_run_grams"),
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_flagged_grams", F.lit(0)).cast("bigint").alias(
                "n_flagged_grams"
            ),
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("max_run_grams", F.lit(0)).cast("bigint").alias(
                "max_run_grams"
            ),
        )
    )
