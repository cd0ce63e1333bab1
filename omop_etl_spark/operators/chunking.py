"""Corpus-level text operators for training-data preparation:
fixed-window document chunking and TF-IDF term scoring.

Reference parity: the reference engine (clinical-ai/omop-etl) has no
text-corpus surface — these belong to the LLM-data-pipeline extension
(project brief), alongside ``operators/dedup.py`` and
``operators/contamination.py``.

Scale notes:

* :func:`chunk_documents` is MAP-ONLY — tokenize, build the window
  start sequence with ``F.sequence`` (JVM), explode, slice. No shuffle
  anywhere, so it scales linearly with input bytes and stays entirely
  inside whole-stage codegen; the natural first stage of an embedding
  or pre-tokenization pipeline over a 100 TB corpus.
* :func:`tfidf_topk` shuffles twice (doc-term counts, term document
  frequencies) plus one window pass on the doc key — all hash
  partitioned, no global sort, and the DF side aggregates to
  vocabulary size (≪ corpus size) before joining back.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..conf import checkpoint as _checkpoint
from ..conf import checkpoint_if_large as _checkpoint_if_large
from ..conf import input_bytes as _input_bytes

from .util import ppm_div_sql, spread

#: size gate for checkpoints whose re-derivation is a tokenize-explode
#: pass (~10x a plain scan per byte, so the gate opens earlier than the
#: 64 MiB scan default): skip below 4 MiB of source text — there the
#: eager materialization job costs more than the page-cached duplicate
#: tokenizes it removes (the r17 +0.5-0.8 s small-tier regressions on
#: the LM-scorer gates) — and checkpoint above it, keeping the measured
#: 100x-tier wins (unigram -47 %, bigram -36 %, cooccurrence CPU -30 %).
_TOKENIZE_CKPT_MIN_BYTES = 4 * 1024 * 1024


def _ckpt_tokenize(frame: DataFrame, src: DataFrame) -> DataFrame:
    """Size-gated checkpoint keyed on the SOURCE corpus bytes."""
    return _checkpoint_if_large(
        frame, size_hint=_input_bytes(src), min_bytes=_TOKENIZE_CKPT_MIN_BYTES
    )

__all__ = [
    "chunk_documents",
    "tfidf_topk",
    "bm25_topk",
    "corpus_ngram_counts",
    "unigram_logprob_scores",
    "rare_token_stats",
    "token_cooccurrence",
    "build_vocab",
    "encode_tokens",
    "bigram_surprisal_scores",
    "distinctive_terms",
    "vocab_coverage",
    "content_defined_chunks",
    "unigram_segment_words",
    "unigram_segment_pieces",
    "learn_unigram_vocab",
]


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split each document's whitespace token stream into fixed-size
    windows of ``chunk_tokens`` tokens advancing by ``chunk_tokens -
    overlap`` (trailing chunks may be shorter). Documents with no
    tokens produce no rows. Output: one row per chunk with
    ``(id_col, chunk_id, chunk_text, n_tokens)`` plus any ``keep_cols``
    carried through. ``chunk_id`` is the 0-based window index —
    ``(id_col, chunk_id)`` is a stable key for downstream
    embedding/dedup joins.

    Map-only: no shuffle, no UDF; everything is JVM array functions
    inside one codegen stage.
    """
    if overlap >= chunk_tokens:
        raise ValueError("chunk_documents: overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    # window starts: 0, step, 2*step, ... strictly below n
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(step))
    ).otherwise(F.array().cast("array<int>"))
    out = (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_id", "__start"),
        )
        .select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            "chunk_id",
            F.concat_ws(
                " ", F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(
                F.size(F.col("__toks")) - F.col("__start"), F.lit(chunk_tokens)
            ).alias("n_tokens"),
        )
    )
    return out


def _term_tokens(text_col: str) -> Column:
    """Lowercased word terms (letters+digits runs) — the tokenization
    both the Spark and oracle sides share."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda t: t != ""
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF:
    ``tf * ln((N + 1) / (df + 1))`` where ``tf`` is the in-document
    term count, ``df`` the number of documents containing the term and
    ``N`` the corpus size. Ties (identical scores — e.g. equal tf on
    equal-df terms) break lexicographically on the term, so the result
    is fully deterministic and engine-portable.

    Returns ``(id_col, term, tf, df, score, rank)`` with ``rank`` in
    ``1..k``.

    Two hash shuffles (doc-term counts; term DF) + one window on the
    doc key. The DF frame is vocabulary-sized, so the join back is
    broadcast-able at typical vocab sizes; at web-corpus vocab it
    degrades gracefully to a hash join on the term key.
    """
    terms = df.select(
        F.col(id_col), F.explode(_term_tokens(text_col)).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log((F.col("__n") + 1) / (F.col("df") + 1)), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a keyword query by BM25 — the lexical
    retrieval scorer every RAG / training-data search stack starts
    from (Robertson-Sparck Jones; the Lucene ``+1`` IDF smoothing so
    scores stay positive at any df).

    Determinism contract (same as :func:`bigram_surprisal_scores`):
    the per-(doc, term) contribution
    ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` is computed
    once as IEEE doubles with a FIXED expression tree (identical on
    both engines), floor-scaled to bigint micro-units, and per-doc
    accumulation is an exact integer sum; ties break on the doc key.

    Scale shape: tokens explode map-side and immediately filter to
    the query-term set (query-bounded), so the shuffled tf frame is
    ``|query| x docs-matching`` — never the corpus token stream. The
    df frame is query-bounded (broadcast); doc lengths ride one
    corpus-level aggregate per doc; the final top-k is a TakeOrdered
    (no global sort materialization).

    Returns ``(id_col, n_terms_matched, score_micro, rank)``.
    """
    if not query_terms:
        raise ValueError("bm25_topk requires at least one query term")
    qt = sorted(set(query_terms))
    toks = df.select(F.col(id_col), _term_tokens(text_col).alias("__toks"))
    # dl is SF-linear but NARROW (id + int); materializing it means
    # the wide text column is scanned twice total (dl + tf) instead of
    # four times (dl, stats, and the join would each rescan) — at
    # 100 TB the text scan is the dominant IO. conf.checkpoint rather
    # than persist (r17): downstream plans read a plain RDD scan, so
    # AQE still optimizes them (the KMV persist-vs-checkpoint A/B).
    dl = toks.select(id_col, F.size("__toks").alias("__dl")).transform(
        _checkpoint, eager=False
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__dl").alias("__t")
    )
    # tf feeds the per-term document frequency AND the contribution
    # join; it is QUERY-bounded (the explode filters to the query
    # terms map-side) — checkpoint it so the second text tokenize
    # runs once, not twice (r17: 3 text scans -> 2).
    tf = (
        toks.select(F.col(id_col), F.explode("__toks").alias("term"))
        .filter(F.col("term").isin(qt))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(_checkpoint, eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            # fixed expression tree, mirrored verbatim by the oracle:
            # dl/avgdl as (dl * N) / T keeps the only non-literal
            # division a single int-exact-to-double step.
            F.floor(
                F.expr(
                    f"(ln((__n - df + 0.5) / (df + 0.5) + 1.0) * "
                    f"((tf * {k1 + 1.0}) / "
                    f"(tf + {k1} * ({1.0 - b} + {b} * "
                    f"(CAST(__dl * __n AS DOUBLE) / __t))))) * 1000000.0"
                )
            )
            .cast("bigint")
            .alias("__c"),
        )
    )
    scored = contrib.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
        F.sum("__c").cast("bigint").alias("score_micro"),
    )
    # top-k via orderBy+limit compiles to TakeOrdered (per-partition
    # top-k, driver merge of k rows) — no partition-less Window ever
    # sees the SF-linear frame; the rank window below runs over the
    # k-bounded limit output only.
    topk = scored.orderBy(F.desc("score_micro"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score_micro"), F.asc(id_col))
    return topk.select(
        id_col,
        "n_terms_matched",
        "score_micro",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


def corpus_ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 1,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus-wide word-``n``-gram counts — the raw material of
    tokenizer/vocabulary training and frequency-based filtering.
    Returns ``(ngram, count, n_docs)``; with ``top_k``, only the
    ``top_k`` most frequent (ties broken lexicographically on the
    ngram, so the cut is deterministic).

    One corpus scan, two map-side-combinable hash aggregates: first by
    ``(doc, ngram)`` (combines within a document before anything
    shuffles), then by ``ngram`` over the already per-doc-collapsed
    stream — ``n_docs`` falls out as a plain row count, no
    ``countDistinct`` expand. The optional top-k is a
    ``TakeOrderedAndProject`` (per-partition heaps + driver merge of
    ``top_k`` rows), never a global sort of the vocabulary.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda t: t != ""
    )
    grams = (
        toks
        if n == 1
        else F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    # the synthetic doc id MUST be pinned in its own projection below
    # the Generate: monotonically_increasing_id() in the same select as
    # explode() evaluates per OUTPUT row (one fresh id per ngram, which
    # silently turns n_docs into a copy of count)
    base = df.select(
        F.monotonically_increasing_id().alias("__doc"), grams.alias("__g")
    )
    per_doc = (
        base.select("__doc", F.explode("__g").alias("ngram"))
        .groupBy("__doc", "ngram")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    out = per_doc.groupBy("ngram").agg(
        F.sum("__c").alias("count"), F.count(F.lit(1)).alias("n_docs")
    )
    if top_k is not None:
        out = out.orderBy(F.desc("count"), F.asc("ngram")).limit(top_k)
    return out


def unigram_logprob_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the classic cheap perplexity proxy for quality
    filtering (low mean logprob = rare/garbled text).

    Determinism contract: the per-token-type log-probability is scaled
    to a BIGINT once (``floor(ln(count/total) * 1e6)``), so the per-doc
    accumulation is an exact integer sum — independent of row order and
    partitioning — and only the final per-doc mean is a rounded float.

    Shuffle profile: one hash aggregate for doc-term counts, one
    vocabulary-sized aggregate for corpus counts, one join back on the
    term key (broadcast-able at typical vocab sizes), one final doc-key
    aggregate. The corpus total enters as a lazy 1-row broadcast.
    """
    terms = spread(df).select(
        F.col(id_col), F.explode(_term_tokens(text_col)).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # cf feeds the corpus total AND the logp projection; tf feeds cf
    # AND the final scoring join — without the cuts the corpus
    # tokenize + doc-term aggregate re-executes 3x (3 source scans in
    # the r17 audit). cf is vocabulary-bounded (Zipf); the doc-term
    # frame itself stays lazy — its duplicate consumer is removed by
    # checkpointing cf, and materializing a doc-term-sized frame is
    # the measured-rejected n-gram class.
    cf = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("cnt"))
        .transform(lambda d: _ckpt_tokenize(d, df))
    )
    total = cf.agg(F.sum("cnt").alias("__total"))
    logp = cf.crossJoin(F.broadcast(total)).select(
        "term",
        F.floor(F.log(F.col("cnt") / F.col("__total")) * 1_000_000)
        .cast("bigint")
        .alias("__logp"),
    )
    return (
        tf.join(logp, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("__logp")).cast("bigint").alias("__sum"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(F.col("__sum") / (F.col("n_tokens") * 1_000_000.0), 6).alias(
                "mean_logprob"
            ),
        )
    )


def rare_token_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_max_count: int = 2,
) -> DataFrame:
    """Per-document rare-token profile: token count, number of tokens
    whose CORPUS frequency is ≤ ``rare_max_count``, and the rare
    fraction — a float-free quality signal (high rare fraction flags
    OCR noise, mojibake, and boilerplate hashes). All-integer except
    the final rounded ratio, so fully engine-portable.

    Same shuffle profile as :func:`unigram_logprob_scores` (shared
    doc-term aggregate shape); the corpus-frequency frame is
    vocabulary-sized and joins back on the term key.
    """
    terms = spread(df).select(
        F.col(id_col), F.explode(_term_tokens(text_col)).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    return (
        tf.join(cf, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("cnt") <= rare_max_count, F.col("tf")).otherwise(0))
            .cast("bigint")
            .alias("n_rare"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_rare",
            F.round(F.col("n_rare") / F.col("n_tokens"), 6).alias("rare_frac"),
        )
    )


def token_cooccurrence(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_support: int = 5,
    top_k: int | None = None,
) -> DataFrame:
    """Frequent token co-occurrence (market-basket over documents):
    pairs of distinct terms appearing together in at least
    ``min_support`` documents, with an integer-ppm lift score.

    The A-priori bound does the scaling work: a PAIR can reach
    ``min_support`` only if BOTH terms individually do, so the per-doc
    self-join runs over support-filtered terms only — the pair space is
    |frequent terms per doc|^2, not |vocabulary|^2, and the long tail
    (which is most of a corpus's vocabulary) never enters the join.
    Plan: one distinct (doc, term) aggregate, one |vocab|-sized
    doc-frequency aggregate (broadcast back as the filter + df lookup),
    the doc-keyed self-join, and one pair-count aggregate.

    ``lift_ppm = floor(n_docs_total * pair_count * 1e6 / (df_a *
    df_b))`` — all-integer, so the score hashes identically across
    engines.  Output: ``term_a < term_b, pair_count, df_a, df_b,
    lift_ppm`` (optionally top-``top_k`` pairs by count, tie-broken on
    the terms — TakeOrderedAndProject, no global sort).
    """
    from .util import spread

    terms = (
        spread(df)
        .select(F.col(id_col).alias("__doc"), F.explode(_term_tokens(text_col)).alias("term"))
        .distinct()
    )
    dfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    frequent = dfreq.filter(F.col("df") >= min_support)
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))

    # both self-join sides read ft; the explode upstream defeats
    # ReuseExchange, so without the eager checkpoint each side re-runs
    # the corpus tokenize + distinct + support join (r17 audit: 5
    # scans). The frame is support-filtered — the A-priori bound has
    # already cut the long tail before it is materialized.
    # NOT size-gated (r18 A/B): ft feeds a SELF-JOIN, so skipping the
    # checkpoint re-runs tokenize+distinct+support-join TWICE — the
    # in-session toggle A/B read skip 2.42 s vs checkpoint 2.21 s
    # even at sf0.1, unlike the single-fan-out LM-scorer frames.
    ft = terms.join(F.broadcast(frequent), "term").select(
        "__doc", "term", "df"
    ).transform(_checkpoint)
    a = ft.select(
        F.col("__doc"), F.col("term").alias("term_a"), F.col("df").alias("df_a")
    )
    b = ft.select(
        F.col("__doc").alias("__doc_b"),
        F.col("term").alias("term_b"),
        F.col("df").alias("df_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("__doc") == F.col("__doc_b"))
            & (F.col("term_a") < F.col("term_b")),
        )
        .groupBy("term_a", "term_b", "df_a", "df_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_support)
    )
    out = pairs.crossJoin(F.broadcast(n_docs)).select(
        "term_a",
        "term_b",
        F.col("pair_count").cast("bigint").alias("pair_count"),
        F.col("df_a").cast("bigint").alias("df_a"),
        F.col("df_b").cast("bigint").alias("df_b"),
        # both sides pre-widened to DECIMAL(38,0): __n * pair_count and
        # df_a * df_b are corpus-size x count products that wrap int64
        # long before the x1e6 ppm scaling does (the r16
        # nation_revenue_share overflow class)
        F.expr(
            ppm_div_sql(
                "CAST(__n AS DECIMAL(38,0)) * pair_count",
                "CAST(df_a AS DECIMAL(38,0)) * df_b",
            )
        ).alias("lift_ppm"),
    )
    if top_k is not None:
        out = out.orderBy(
            F.desc("pair_count"), F.asc("term_a"), F.asc("term_b")
        ).limit(top_k)
    return out


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 4096,
) -> DataFrame:
    """Corpus vocabulary: the ``vocab_size`` most frequent terms with
    dense ids 1..vocab_size (0 is reserved for OOV).

    Ranking is (count DESC, term ASC) — a total order, so ids are
    deterministic across engines and reruns.  The top-k cut is
    ``TakeOrderedAndProject``; the rank window then runs on a frame of
    at most ``vocab_size`` rows (a constant, driver-bounded — the
    single sort partition is by design, not a scale bug).
    """
    counts = (
        spread(df)
        .select(F.explode(_term_tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(vocab_size)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return counts.withColumn("token_id", F.row_number().over(w)).select(
        "term", "token_id", "cnt"
    )


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Map each document's token sequence to vocabulary ids (OOV → 0),
    preserving order — the tokens-to-ids stage of training export.

    Plan: posexplode the filtered token list (positions are over the
    filtered sequence), LEFT-join the broadcast vocabulary, and
    reassemble with ``sort_array`` of (pos, id) structs — all JVM
    expressions, no Python.  The vocabulary is ``vocab_size`` rows, a
    broadcast by construction; the corpus never shuffles (the
    reassembly groups by the document key, one hash aggregate).

    Output: ``id_col, n_tokens, ids (array<int>, in token order)``.
    """
    toks = spread(df).select(
        F.col(id_col),
        F.posexplode(_term_tokens(text_col)).alias("pos", "term"),
    )
    joined = toks.join(F.broadcast(vocab.select("term", "token_id")), "term", "left")
    tid = F.coalesce(F.col("token_id"), F.lit(0)).cast("int")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("pos"), tid.alias("tid")))),
                lambda s: s["tid"],
            ).alias("ids"),
        )
        .select(F.col(id_col), F.col("n_tokens").cast("bigint"), "ids")
    )


def bigram_surprisal_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean bigram log-probability under the corpus's own
    bigram LM — one rung up the perplexity ladder from
    :func:`unigram_logprob_scores`: repetitive boilerplate scores HIGH
    (its transitions are corpus-frequent) while shuffled/garbled text
    scores LOW even when its unigrams are common, which is exactly the
    signal a quality gate wants for machine-generated spam.

    ``p(w2|w1) = c(w1,w2) / c(w1, *)`` with counts from the corpus
    itself, so every document bigram is observed (no smoothing term
    needed).  Documents with fewer than two tokens emit no bigrams and
    drop out — callers union them back with NULL scores if required.

    Determinism contract (same as the unigram operator): the per-
    bigram-TYPE logprob is floor-scaled to bigint micro-units once,
    so per-doc accumulation is an exact integer sum; only the final
    mean is a rounded float.

    Shuffle profile: one doc-bigram count, one corpus-bigram count
    (vocab^2-bounded, in practice far smaller), one w1-marginal agg,
    and joins back on bigram keys — all hash-partitioned; no windows,
    no per-doc sort.
    """
    toks = spread(df).select(F.col(id_col), _term_tokens(text_col).alias("__toks"))
    pairs = toks.select(
        id_col,
        F.explode(
            F.expr(
                "zip_with(slice(__toks, 1, greatest(size(__toks) - 1, 0)), "
                "slice(__toks, 2, greatest(size(__toks) - 1, 0)), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("__bg"),
    ).select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    bg_tf = pairs.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    # c12 feeds the w1-marginal AND the logp join; bg_tf feeds c12 AND
    # the final scoring join — without the cut the corpus bigram
    # explode + doc-bigram aggregate re-executes 3x (3 source scans in
    # the r17 audit). c12 is corpus-bigram-vocab-bounded (far below
    # the doc-bigram frame); bg_tf itself stays lazy — checkpointing
    # the doc-bigram-sized frame was measured and REJECTED (100x tier:
    # 11.5-12.3 s lazy vs 16.7-17.1 s materialized — the rejected
    # n-gram-materialization class).
    c12 = (
        bg_tf.groupBy("w1", "w2")
        .agg(F.sum("tf").alias("c12"))
        .transform(lambda d: _ckpt_tokenize(d, df))
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    logp = c12.join(c1, "w1").select(
        "w1",
        "w2",
        F.floor(F.log(F.col("c12") / F.col("c1")) * 1_000_000)
        .cast("bigint")
        .alias("__lp"),
    )
    return (
        bg_tf.join(logp, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("__lp")).cast("bigint").alias("sum_lp_micro"),
        )
        .select(
            id_col,
            "n_bigrams",
            "sum_lp_micro",
            F.round(
                F.col("sum_lp_micro") / (F.col("n_bigrams") * 1_000_000.0), 6
            ).alias("mean_logprob"),
        )
    )


def distinctive_terms(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 5,
) -> DataFrame:
    """Top-``k`` POSITIVELY distinctive terms per group by
    log-likelihood-ratio keyness (Dunning's G²) against the rest of
    the corpus — "which words make this source sound like itself", the
    standard corpus-linguistics contrast signal for mixture design and
    contamination triage.

    ``G² = 2·(a·ln(a/E1) + b·ln(b/E2))`` with ``a``/``b`` the term's
    in-group/rest counts and ``E``s the homogeneity-expected counts.
    Determinism contract: each log is computed once per (group, term)
    row from exact integer inputs (double ops are correctly rounded
    identically in any IEEE-754 engine) and floor-scaled to bigint
    micro-units; the combination ``2*(a*lp1 + b*lp2)`` is then exact
    int64 (headroom: a ~ 1e10 tokens times lp ~ 3e7 micro stays under
    2^63).  The over-representation filter ``a·n2 > b·n1`` runs in
    decimal(38,0) — the int64 cross-product wraps at corpus scale.

    Shuffle profile: term-key and group-key hash aggregates, one join
    on the term key, a per-group top-k (``WindowGroupLimit``).  The
    (group, term) frame is vocabulary-bounded per group.
    """
    if top_k < 1:
        raise ValueError("distinctive_terms requires top_k >= 1")
    terms = spread(df).select(
        F.col(group_col).alias("__g"), F.explode(_term_tokens(text_col)).alias("term")
    )
    # a_tab feeds term_tot, grp_tot AND the scoring join — three
    # consumers, and the explode upstream defeats ReuseExchange, so
    # without the eager checkpoint each one re-runs the corpus
    # tokenize + explode + aggregate (4 source scans in the r17
    # audit). The frame is (groups x vocab)-bounded — same class as
    # token_cooccurrence's basket checkpoint.
    # NOT size-gated (r18 toggle A/B, valid after the conf-precedence
    # fix): a_tab fans out to THREE aggregations; skipping re-runs the
    # tokenize+aggregate each time and measured SLOWER at both sf0.01
    # (skip 1.68 vs ckpt 1.42 s) and sf0.1 (1.76 vs 1.45) — unlike the
    # single-fan-out cf/c12 frames, the checkpoint pays for itself at
    # every tier.
    a_tab = (
        terms.groupBy("__g", "term")
        .agg(F.count(F.lit(1)).alias("a"))
        .transform(_checkpoint)
    )
    term_tot = a_tab.groupBy("term").agg(F.sum("a").alias("__tt"))
    grp_tot = a_tab.groupBy("__g").agg(F.sum("a").alias("n1"))
    total = grp_tot.agg(F.sum("n1").alias("__n"))
    j = (
        a_tab.join(term_tot, "term")
        .join(grp_tot, "__g")
        .crossJoin(F.broadcast(total))
        .withColumn("b", F.col("__tt") - F.col("a"))
        .withColumn("n2", F.col("__n") - F.col("n1"))
    )
    # a/E1 = a*N / ((a+b)*n1); b/E2 = b*N / ((a+b)*n2) — evaluated in
    # double (exact-int inputs, correctly-rounded ops), logged, floored
    # to micro-units ONCE per row.
    lp1 = F.when(
        F.col("a") > 0,
        F.floor(
            F.log(
                (F.col("a").cast("double") * F.col("__n").cast("double"))
                / (F.col("__tt").cast("double") * F.col("n1").cast("double"))
            )
            * 1_000_000
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    lp2 = F.when(
        F.col("b") > 0,
        F.floor(
            F.log(
                (F.col("b").cast("double") * F.col("__n").cast("double"))
                / (F.col("__tt").cast("double") * F.col("n2").cast("double"))
            )
            * 1_000_000
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    scored = (
        j.withColumn("g2_micro", 2 * (F.col("a") * lp1 + F.col("b") * lp2))
        .filter(
            F.expr(
                "CAST(a AS DECIMAL(38,0)) * CAST(n2 AS DECIMAL(38,0)) > "
                "CAST(b AS DECIMAL(38,0)) * CAST(n1 AS DECIMAL(38,0))"
            )
        )
    )
    w = Window.partitionBy("__g").orderBy(F.col("g2_micro").desc(), F.col("term").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_k)
        .select(
            F.col("__g").alias(group_col),
            "term",
            F.col("a").cast("bigint").alias("n_in_group"),
            F.col("g2_micro").cast("bigint").alias("g2_micro"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    checkpoints: Sequence[int] = (8, 16, 32, 64, 256, 1024, 4096, 16384),
) -> DataFrame:
    """Corpus coverage of the top-``k`` vocabulary for each checkpoint
    ``k`` — the curve that sizes a tokenizer vocabulary ("how much of
    the corpus do 16k types cover?").

    The ranked cumulative sum over the (vocabulary-sized, but
    SF-growing) term-count frame rides
    :func:`~omop_etl_spark.operators.rank.ranked_running_sum` — no
    partition-less window.  Coverage is exact integer ppm
    (``cum * 1e6 div total``).
    """
    from .rank import ranked_running_sum

    cps = sorted(set(int(c) for c in checkpoints))
    if not cps or cps[0] < 1:
        raise ValueError("vocab_coverage requires positive checkpoints")
    terms = spread(df).select(F.explode(_term_tokens(text_col)).alias("term"))
    cf = terms.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = ranked_running_sum(
        cf,
        [F.col("cnt").desc(), F.col("term").asc()],
        "cnt",
        rank_col="vocab_k",
        cum_col="__cum",
    )
    total = cf.agg(F.sum("cnt").alias("__t"))
    return (
        ranked.filter(F.col("vocab_k").isin(cps))
        .crossJoin(F.broadcast(total))
        .select(
            "vocab_k",
            F.col("__cum").cast("bigint").alias("cum_tokens"),
            # cumulative token counts cross the int64 x1e6 cliff near
            # 9.2e12 tokens — inside 100-TB corpus range, so widen
            F.expr(ppm_div_sql("__cum", "__t")).alias("coverage_ppm"),
        )
    )


def content_defined_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    base: int = 31,
    modulus: int = 1_048_573,
    divisor: int = 64,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Content-defined chunking: split each document at Rabin-style
    rolling-hash boundaries so that identical passages land in
    identical chunks REGARDLESS of their byte offset — the property
    fixed-window chunking lacks and the backbone of shift-resistant
    dedup (storage dedup, near-identical web page detection, corpus
    diff).

    A boundary falls after character position ``t`` (1-based) iff the
    polynomial hash of the trailing ``window`` codepoints satisfies
    ``(sum_j cp(t-j)*base^j mod modulus) mod divisor == 0`` — expected
    chunk length ≈ ``divisor`` chars. The rule is position-local, so
    both the boundary scan and the oracle replay are pure
    (engine-identical int64 arithmetic: max codepoint 0x10FFFF times
    ``modulus`` ≈ 2^40, summed over ``window`` terms ≪ 2^63).

    MAP-ONLY and UDF-free: the boundary positions come from one
    ``filter(sequence(...))`` higher-order expression per document
    (O(window) multiplies per character, inside whole-stage codegen),
    chunks from one ``posexplode`` — output rows ≈ chars/divisor, no
    shuffle anywhere. At 100 TB this scans linearly and feeds the
    chunk-hash dedup join downstream.

    LINEAR in document length (r10, SCALE.md §13): every per-position
    codepoint probe goes through a char array materialized ONCE per
    document (``split(text, '')`` is O(len); ``element_at`` on an
    array is O(1)), and chunk texts come from ``slice`` + ``array_join``
    over the same array. The obvious ``ascii(substring(text, t-j, 1))``
    form is O(len²): Spark's UTF8String indexes by CODEPOINT, so every
    substring call re-scans the bytes from the start — measured 4.6×
    wall on 4× doc length at fixed corpus volume.

    Output: ``(id_col, *keep_cols, chunk_id, chunk_text, n_chars)``
    with ``chunk_id`` the 0-based chunk index within the document.
    Null/empty documents produce no rows.
    """
    if window < 1 or base < 2 or modulus < 2 or divisor < 2:
        raise ValueError("content_defined_chunks: bad hash parameters")
    hash_terms = " + ".join(
        f"element_at(__cps, __t - {j}) * {pow(base, j, modulus)}"
        for j in range(window)
    )
    bnds = F.expr(
        f"CASE WHEN size(__chars) >= {window} THEN "
        f"filter(sequence({window}, size(__chars)), "
        f"__t -> (({hash_terms}) % {modulus}) % {divisor} = 0) "
        f"ELSE CAST(array() AS array<int>) END"
    )
    with_arr = (
        df.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            F.split(F.col(text_col), "").alias("__chars"),
        )
        .withColumn(
            "__cps",
            F.transform("__chars", lambda c: F.ascii(c).cast("bigint")),
        )
    )
    with_edges = with_arr.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.col("__chars"),
        F.concat(F.array(F.lit(0)), bnds).alias("__starts"),
        F.concat(bnds, F.array(F.size("__chars"))).alias("__ends"),
    )
    chunks = F.filter(
        F.expr(
            "transform(sequence(1, size(__starts)), __i -> "
            "array_join(slice(__chars, element_at(__starts, __i) + 1, "
            "element_at(__ends, __i) - element_at(__starts, __i)), ''))"
        ),
        lambda s: s != "",
    )
    return with_edges.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    ).withColumn("n_chars", F.length("chunk_text"))


def _piece_cost_map(
    pieces: DataFrame,
    piece_col: str,
    cost_col: str,
    max_word_len: int,
    op_name: str = "unigram_segment_words",
) -> DataFrame:
    """One-row broadcastable ``piece -> cost`` map with the cost-bound
    validation folded into the SAME aggregate (r9 regression: a
    separate eager min/max ``.first()`` re-executed the caller's whole
    upstream pipeline once for validation and again for the map;
    VERDICT r9 #4). ``raise_error`` fires at action time and reports
    ``op_name`` — the PUBLIC entry point that built this map
    (ADVICE r11: the helper is shared, a hardcoded name misattributed
    failures from the pieces/learn paths)."""
    cost_bound = (1 << 50) // (1024 * max_word_len)
    return pieces.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(F.col(piece_col), F.col(cost_col).cast("bigint"))
            )
        ).alias("__pm"),
        F.min(F.col(cost_col).cast("bigint")).alias("__lo"),
        F.max(F.col(cost_col).cast("bigint")).alias("__hi"),
    ).select(
        F.when(
            F.col("__lo") < 0,
            F.expr(
                f"raise_error('{op_name}: piece costs must "
                "be non-negative')"
            ),
        )
        .when(
            F.col("__hi") >= cost_bound,
            F.expr(
                f"raise_error(concat('{op_name}: max piece "
                f"cost ', __hi, ' >= {cost_bound} "
                "(= 2^50 / (1024 * max_word_len)); a clean path could "
                "reach the unreachable sentinel - rescale costs or "
                "lower max_word_len'))"
            ),
        )
        .otherwise(F.col("__pm"))
        .alias("__pm")
    )


def _unigram_dp_expr(w: str, max_piece_len: int, inf: int) -> str:
    """SQL-expression string for the full Viterbi dp ARRAY over word
    ``w`` (index k = packed min-(cost, n_pieces) of the length-(k-1)
    prefix, ``inf`` = unreachable sentinel). Shared by
    :func:`unigram_segment_words` (which reads only the last element)
    and :func:`unigram_segment_pieces` (which backtracks over it)."""
    return (
        f"aggregate(sequence(1, length({w})), array(CAST(0 AS BIGINT)), "
        f"(dp, i) -> concat(dp, array(array_min(transform("
        f"sequence(greatest(1, i - {max_piece_len - 1}), i), "
        f"j -> element_at(dp, j) + "
        f"coalesce(element_at(__pm, substring({w}, j, i - j + 1)) * 1024 + 1, "
        f"{inf}))))))"
    )


def unigram_segment_pieces(
    words: DataFrame,
    pieces: DataFrame,
    word_col: str = "word",
    piece_col: str = "piece",
    cost_col: str = "cost",
    max_piece_len: int = 4,
    max_word_len: int = 32,
    _op_name: str = "unigram_segment_pieces",
) -> DataFrame:
    """Canonical-path unigram segmentation: like
    :func:`unigram_segment_words` but materializes WHICH pieces the
    optimal path uses — the tokenizer-debugging / piece-usage view
    (and the E-step of a hard-EM vocabulary learner).

    Among the (possibly many) paths achieving the minimal packed
    ``(cost, n_pieces)``, the CANONICAL one is pinned by backtracking
    from the word's end and, at every position, taking the LONGEST
    piece whose predecessor state is on an optimal path (= the
    smallest start index satisfying ``dp[s-1] + cost(piece) ==
    dp[pos]``). That rule is a pure function of the dp array, so an
    unrolled SQL replay picks the identical pieces bit-for-bit — the
    property a "first optimal path found" implementation would not
    have.

    Same engine shape as the scoring variant: ONE broadcast cost-map
    row, dp + backtrack as JVM ``aggregate`` expressions per word — no
    UDF, no shuffle, O(max_word_len · max_piece_len) map probes per
    word. Unreachable words (characters outside the vocabulary) get
    NULL ``seg_pieces``.

    Output: input columns + ``(seg_cost, n_pieces,
    seg_pieces array<string>)``.

    Raises: same contract as :func:`unigram_segment_words` (eager
    ``ValueError`` for bad arguments; lazy USER_RAISED_EXCEPTION for
    out-of-bound piece costs).
    """
    if not 1 <= max_piece_len <= 16:
        raise ValueError(f"{_op_name}: max_piece_len must be in 1..16")
    if not 1 <= max_word_len < 1024:
        raise ValueError(f"{_op_name}: max_word_len must be in 1..1023")
    pm = _piece_cost_map(pieces, piece_col, cost_col, max_word_len, _op_name)
    inf = 1 << 50
    w = f"`{word_col}`"
    # boundary starts via backtrack over the dp ARRAY: acc = (pos,
    # starts); per round, s* = smallest start s in [pos - lmax + 1,
    # pos] whose predecessor dp state + piece cost equals dp[pos];
    # next pos = s* - 1. Bounded by max_word_len rounds;
    # already-finished rows pass through.
    s_star = (
        "element_at(filter(sequence(greatest(1, acc.pos - "
        f"{max_piece_len - 1}), acc.pos), "
        "s -> element_at(__dp, s) + coalesce(element_at(__pm, "
        "substring(" + w + ", s, acc.pos - s + 1)) * 1024 + 1, "
        f"{inf}) = element_at(__dp, acc.pos + 1)), 1)"
    )
    bt = (
        f"aggregate(sequence(1, {max_word_len}), "
        "named_struct('pos', length(" + w + "), "
        "'starts', CAST(array() AS ARRAY<INT>)), "
        "(acc, _r) -> IF(acc.pos <= 0, acc, "
        f"named_struct('pos', CAST({s_star} - 1 AS INT), "
        f"'starts', concat(array(CAST({s_star} AS INT)), acc.starts))), "
        "acc -> acc.starts)"
    )
    pcs = (
        "transform(sequence(1, size(__starts)), i -> substring("
        + w
        + ", element_at(__starts, i), "
        "(IF(i < size(__starts), element_at(__starts, i + 1), "
        "length(" + w + ") + 1)) - element_at(__starts, i)))"
    )
    out = (
        words.filter(
            F.col(word_col).isNotNull()
            & (F.length(word_col) > 0)
            & (F.length(word_col) <= max_word_len)
        )
        .crossJoin(F.broadcast(pm))
        .withColumn("__dp", F.expr(_unigram_dp_expr(w, max_piece_len, inf)))
        .withColumn("__comb", F.expr(f"element_at(__dp, length({w}) + 1)"))
        .withColumn(
            "__starts",
            F.when(F.col("__comb") < inf, F.expr(bt)),
        )
    )
    return out.select(
        *[c for c in words.columns],
        F.expr(f"CASE WHEN __comb < {inf} THEN __comb div 1024 END")
        .cast("bigint")
        .alias("seg_cost"),
        F.expr(f"CASE WHEN __comb < {inf} THEN __comb % 1024 END")
        .cast("bigint")
        .alias("n_pieces"),
        F.when(F.col("__starts").isNotNull(), F.expr(pcs)).alias("seg_pieces"),
    )


def learn_unigram_vocab(
    words: DataFrame,
    pieces: DataFrame,
    rounds: int = 2,
    word_col: str = "word",
    count_col: str = "cnt",
    piece_col: str = "piece",
    cost_col: str = "cost",
    max_piece_len: int = 4,
    max_word_len: int = 32,
) -> DataFrame:
    """Hard-EM (Viterbi re-estimation) unigram-LM vocabulary learning —
    the TRAINING step :func:`unigram_segment_words` encodes against,
    completing the learn/encode symmetry the module has for BPE
    (``bpe.learn_merges`` / ``bpe.encode_documents``).

    Per round: (E) segment every distinct word type with the current
    integer costs along the CANONICAL optimal path
    (:func:`unigram_segment_pieces` — path identity is deterministic,
    so the "expected" counts of hard EM are exact integers); (M) count
    weighted piece usage, PRUNE multi-char pieces that no optimal path
    used (single chars always survive — reachability), and re-cost
    every survivor with the same monotone frequency schedule the seed
    vocabulary uses: ``cost = 4·(48 − bits(usage)) + len``. This is
    SentencePiece's EM+prune loop with Viterbi counts instead of
    forward-backward expectations and integer costs instead of float
    log-probs — the trade that makes every round REPLAYABLE: a SQL
    engine unrolling (dp → backtrack → usage → re-cost) × rounds
    reproduces the final vocabulary bit-for-bit (gate
    ``docs_learn_unigram``).

    100 TB posture mirrors BPE's (SCALE.md): LEARN on the distinct-word
    frame of a bounded sample (word types, Zipf-compressed), ENCODE the
    full corpus with the final table. Each round is two vocab/type-
    bounded aggregates + one broadcast map build — no driver round-trip
    at all (the argmax-free M-step is BPE's k-collect loop's cheaper
    sibling); ``rounds`` is small (2-4) because Viterbi counts converge
    fast on a fixed seed vocabulary.

    Output: one row per surviving piece — ``(piece, cost, usage)``
    with ``cost``/``usage`` from the FINAL round's segmentation
    (retained single chars no optimal path uses carry ``usage = 0``).
    """
    if rounds < 1:
        raise ValueError("learn_unigram_vocab requires rounds >= 1")
    # Loop-materialization discipline (SCALE.md §18, VERDICT r8 #2/#3):
    # the loop-INVARIANT word frame eager-checkpoints BEFORE the loop
    # (its lineage — doc scan, tokenize, distinct — would otherwise
    # re-execute once per subplan occurrence per round: measured 10.7x
    # at the 10x tiling pre-fix), and the per-round vocab/usage frames
    # (vocab-bounded KBs) checkpoint each iterate so round r+1's plan
    # starts from materialized state instead of re-deriving round r.
    words = words.select(word_col, count_col).transform(_checkpoint)
    cur = pieces.select(piece_col, cost_col).transform(_checkpoint)
    usage = None
    for _ in range(rounds):
        # The checkpoint between segmentation and explode is
        # LOAD-BEARING, not hygiene: Catalyst's projection collapse
        # would inline the (already internally-reused) dp + backtrack
        # expression tree into the Generate, and higher-order
        # expressions evaluate interpreted — measured 51 s vs 1.1 s at
        # the 10x tiling for the identical segmentation when exploded
        # un-materialized. The frame is word-TYPE-sized (Zipf), arrays
        # of short strings — KBs to MBs at any corpus size.
        seg = unigram_segment_pieces(
            words, cur, word_col, piece_col, cost_col,
            max_piece_len, max_word_len,
            _op_name="learn_unigram_vocab",
        ).transform(_checkpoint)
        usage = (
            seg.select(
                F.explode("seg_pieces").alias(piece_col),
                F.col(count_col).cast("bigint").alias("__w"),
            )
            .groupBy(piece_col)
            .agg(F.sum("__w").alias("usage"))
            .transform(_checkpoint)
        )
        cur = (
            cur.select(piece_col)
            .join(usage, piece_col, "left")
            .filter((F.length(piece_col) == 1) | F.col("usage").isNotNull())
            .select(
                piece_col,
                F.expr(
                    f"(48 - length(bin(coalesce(usage, 0)))) * 4 "
                    f"+ length({piece_col})"
                ).alias(cost_col),
            )
            .transform(_checkpoint)
        )
    return (
        cur.join(usage, piece_col, "left")
        .select(
            piece_col,
            F.col(cost_col).cast("bigint").alias(cost_col),
            F.coalesce(F.col("usage"), F.lit(0)).cast("bigint").alias("usage"),
        )
    )


def unigram_segment_words(
    words: DataFrame,
    pieces: DataFrame,
    word_col: str = "word",
    piece_col: str = "piece",
    cost_col: str = "cost",
    max_piece_len: int = 4,
    max_word_len: int = 32,
) -> DataFrame:
    """Unigram-LM (SentencePiece-style) Viterbi segmentation: split
    each word into vocabulary pieces minimizing total integer cost —
    the second of the two dominant subword tokenizer families (BPE is
    greedy merge-order; unigram is global min-cost path).

    The DP is EXACT and engine-replayable: per word it minimizes the
    lexicographic pair (total cost, piece count), packed into one
    int64 as ``cost*1024 + n_pieces`` (valid while per-word piece
    count < 1024 — enforced by ``max_word_len``), so an unrolled SQL
    DP reproduces it bit-for-bit. Ties beyond that pair don't affect
    the output columns.

    Scale shape: callers pass the DISTINCT word frame (dictionary
    encoding — segment each type once, join back to token instances),
    and the piece vocabulary is collected into ONE broadcast map row
    (vocab-bounded by construction: a subword vocab is 10k-100k
    entries at any corpus size). The DP itself is a single
    higher-order ``aggregate`` expression per word — O(max_piece_len)
    map probes per character, no UDF, no shuffle.

    Words containing characters absent from the piece vocabulary are
    unreachable and return NULL cost/pieces (guarantee reachability by
    including all single characters in ``pieces``). Piece costs must
    be non-negative and < ``2^50 / (1024 * max_word_len)`` so the
    worst-case CLEAN path (``max_word_len`` pieces of maximum cost)
    stays strictly below the internal unreachable sentinel (2^50) —
    the bound is VALIDATED here with one aggregate over the
    vocab-bounded piece frame (ADVICE r8: the previously documented
    2^36 bound was loose — a legitimately segmentable word with large
    costs would have been misreported as unreachable).

    Output: input columns + ``(seg_cost, n_pieces)``.

    Raises:
        ValueError: eagerly, for out-of-range ``max_piece_len`` /
            ``max_word_len`` arguments.
        pyspark.errors.SparkRuntimeException: (USER_RAISED_EXCEPTION,
            at the first ACTION, not at call time) when a piece cost
            is negative or exceeds the documented bound — since r10
            the cost validation is folded into the same broadcast-map
            aggregate as the DP (one pass instead of two), so it can
            only surface lazily on the executors. Callers that caught
            ``ValueError`` for bad costs must catch the Spark
            exception instead.
    """
    if not 1 <= max_piece_len <= 16:
        raise ValueError("unigram_segment_words: max_piece_len must be in 1..16")
    if not 1 <= max_word_len < 1024:
        raise ValueError("unigram_segment_words: max_word_len must be in 1..1023")
    pm = _piece_cost_map(pieces, piece_col, cost_col, max_word_len)
    # Unreachable = a large finite sentinel, NOT NULL: the fold's
    # accumulator element type is non-nullable (array<bigint> from the
    # zero expression), and Spark coerces appended NULLs to 0 there —
    # a silent wrong answer. Any path through >= 1 missing piece costs
    # >= INF; clean paths stay far below it (max_word_len * max piece
    # cost * 1024 << 2^50).
    inf = 1 << 50
    w = f"`{word_col}`"
    dp = _unigram_dp_expr(w, max_piece_len, inf)
    comb = f"element_at({dp}, length({w}) + 1)"
    out = (
        words.filter(
            F.col(word_col).isNotNull()
            & (F.length(word_col) > 0)
            & (F.length(word_col) <= max_word_len)
        )
        .crossJoin(F.broadcast(pm))
        .withColumn("__comb", F.expr(comb))
        .select(
            *[c for c in words.columns],
            F.expr(f"CASE WHEN __comb < {inf} THEN __comb div 1024 END")
            .cast("bigint")
            .alias("seg_cost"),
            F.expr(f"CASE WHEN __comb < {inf} THEN __comb % 1024 END")
            .cast("bigint")
            .alias("n_pieces"),
        )
    )
    return out
