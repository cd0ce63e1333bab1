"""End-to-end corpus curation: the composition a training-data team
actually runs, wired from the individual operators.

Reference parity: none — the reference engine (clinical-ai/omop-etl)
has no corpus surface; this is the LLM-data-pipeline capstone composing
``operators/contamination.py`` (boilerplate strip),
``operators/dedup.py`` (exact dedup), ``functions/text.py`` (quality /
language gates) and ``operators/chunking.py`` (fixed-window chunking).

Every stage is individually 100 TB-shaped (see each operator's
docstring); the composition adds nothing quadratic — Catalyst fuses the
row-level gates into the scans and each corpus-wide stage keeps its
documented shuffle budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.text import lang_id, quality_score, token_count
from .operators.chunking import chunk_documents
from .operators.cluster import assign_clusters
from .operators.contamination import decontaminate, strip_boilerplate
from .operators.dedup import exact_dedup, minhash_lsh_pairs

__all__ = ["curate_corpus", "curate_batch_incremental"]


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    langs: tuple[str, ...] | None = None,
    min_quality: float | None = None,
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    boilerplate_min_docs: int | None = 2,
    benchmark: DataFrame | None = None,
    decontaminate_n: int = 13,
    decontaminate_broadcast: bool = False,
    dedup_exact: bool = True,
    near_dedup_threshold: float | None = None,
    near_dedup_opts: dict | None = None,
    chunk_tokens: int | None = None,
    overlap: int = 0,
) -> DataFrame:
    """Curate a raw document corpus into training-ready text.

    Stage order (each optional, controlled by its parameter):

    1. **Row-level gates** — language (``lang_id``), quality score,
       token-count bounds. Pure column predicates: Catalyst pushes
       them into the scan, no shuffle.
    2. **Boilerplate strip** (``boilerplate_min_docs``) — corpus-wide
       shared-line removal; the text column becomes the cleaned text.
       Documents left empty are dropped.
    3. **Decontamination** (``benchmark``) — drop documents sharing
       any ``decontaminate_n``-gram with the benchmark/eval corpus
       (``operators.contamination.decontaminate``). By default AQE
       picks the join strategy (it broadcasts the hashed gram set
       whenever it fits); set ``decontaminate_broadcast=True`` only
       when the benchmark is contract-bounded (a fixed eval suite) to
       force the broadcast and guarantee the corpus side never
       shuffles.
    4. **Exact dedup** (``dedup_exact``) — one survivor per distinct
       cleaned text, smallest ``id_col`` wins (deterministic).
    5. **Near-dup dedup** (``near_dedup_threshold``) — MinHash-LSH
       candidate pairs at that Jaccard threshold
       (``operators.dedup.minhash_lsh_pairs``; tune via
       ``near_dedup_opts``, e.g. ``{"base_hash": "md5"}`` for the
       oracle-replayable hash family), folded into connected
       components with one survivor per cluster — banded buckets and
       the O(log n)-round star contraction keep this the 100 TB path
       (nothing quadratic enters the composition).
    6. **Chunking** (``chunk_tokens``) — fixed-window splitting with
       ``overlap``; omitted, the output stays one row per document.

    Returns ``(id_col, text, n_tokens)`` per document, or per chunk
    (plus ``chunk_id``) when ``chunk_tokens`` is set.
    """
    out = docs.select(F.col(id_col), F.col(text_col))
    gates = []
    if langs is not None:
        gates.append(lang_id(text_col).isin(*langs))
    if min_quality is not None:
        gates.append(quality_score(text_col) >= min_quality)
    if min_tokens is not None:
        gates.append(token_count(text_col) >= min_tokens)
    if max_tokens is not None:
        gates.append(token_count(text_col) <= max_tokens)
    for g in gates:
        out = out.filter(g)

    if boilerplate_min_docs is not None:
        out = (
            strip_boilerplate(
                out, id_col=id_col, text_col=text_col,
                min_docs=boilerplate_min_docs,
            )
            .filter(F.col("text_clean") != "")
            .select(F.col(id_col), F.col("text_clean").alias(text_col))
        )

    if benchmark is not None:
        flags = decontaminate(
            out, benchmark, id_col=id_col, text_col=text_col,
            n=decontaminate_n, broadcast_benchmark=decontaminate_broadcast,
        )
        out = (
            out.join(flags, id_col)
            .filter(~F.col("contaminated"))
            .select(F.col(id_col), F.col(text_col))
        )

    if dedup_exact:
        out = exact_dedup(out, keys=[text_col], tiebreak=[id_col])

    if near_dedup_threshold is not None:
        from pyspark import StorageLevel

        # the curated frame above is consumed FOUR times below (minhash
        # signature build, jaccard-verify semi-join, cluster patch-back,
        # survivor join); without a persist every consumer re-executes
        # the whole gates->strip->decontaminate->dedup subplan (measured
        # ~4x the stage cost at sf0.1)
        out = out.persist(StorageLevel.MEMORY_AND_DISK)
        opts = dict(n=3, num_hashes=16, bands=8, base_hash="xxhash64")
        opts.update(near_dedup_opts or {})
        pairs = minhash_lsh_pairs(
            out, id_col=id_col, text_col=text_col,
            threshold=near_dedup_threshold, **opts,
        )
        survivors = (
            assign_clusters(out, pairs, id_col=id_col)
            .filter(F.col("is_survivor") == 1)
            .select(F.col(id_col))
        )
        out = out.join(survivors, id_col)

    if chunk_tokens is not None:
        return chunk_documents(
            out, id_col=id_col, text_col=text_col,
            chunk_tokens=chunk_tokens, overlap=overlap,
        ).select(
            F.col(id_col), "chunk_id",
            F.col("chunk_text").alias(text_col), "n_tokens",
        )
    return out.select(
        F.col(id_col), F.col(text_col), token_count(text_col).alias("n_tokens")
    )


def curate_batch_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    langs: tuple[str, ...] | None = None,
    min_quality: float | None = None,
    min_tokens: int | None = None,
    near_dedup_threshold: float | None = 0.8,
    near_dedup_opts: dict | None = None,
) -> DataFrame:
    """Curate a NEW batch of documents against an already-curated
    corpus — the steady-state ingestion path: cost is proportional to
    the batch, never the corpus (the corpus is only aggregated to
    hashes/signatures, never re-paired against itself).

    1. **Row-level gates** on the batch (language / quality / token
       floor) — pushed into the batch scan.
    2. **Exact dedup WITHIN the batch** — smallest ``id_col`` survives
       per distinct text.
    3. **Exact cross-dedup vs the corpus** — anti-join keyed on
       ``(xxhash64(text), text)``: the 8-byte hash is the shuffle/
       compare key, the text residual makes it collision-exact. The
       corpus side reduces to distinct texts.
    4. **Near-dup cross-dedup vs the corpus** —
       :func:`operators.dedup.minhash_lsh_join`: banded signatures on
       both sides, existing-side bucket cap, exact-Jaccard verify; any
       batch doc with a verified pair ≥ threshold is dropped.

    Returns the curated batch as ``(id_col, text_col, n_tokens)``.
    """
    from .operators.dedup import minhash_lsh_join

    out = batch.select(F.col(id_col), F.col(text_col))
    gates = []
    if langs is not None:
        gates.append(lang_id(text_col).isin(*langs))
    if min_quality is not None:
        gates.append(quality_score(text_col) >= min_quality)
    if min_tokens is not None:
        gates.append(token_count(text_col) >= min_tokens)
    for g in gates:
        out = out.filter(g)

    out = exact_dedup(out, keys=[text_col], tiebreak=[id_col])

    corpus_texts = corpus.select(
        F.xxhash64(text_col).alias("__th"), F.col(text_col).alias("__t")
    ).distinct()
    out = out.join(
        corpus_texts,
        (F.xxhash64(F.col(text_col)) == F.col("__th"))
        & (F.col(text_col) == F.col("__t")),
        "left_anti",
    )

    if near_dedup_threshold is not None:
        from pyspark import StorageLevel

        # consumed by the signature build AND the final anti-join
        out = out.persist(StorageLevel.MEMORY_AND_DISK)
        opts = dict(n=3, num_hashes=16, bands=8, base_hash="xxhash64")
        opts.update(near_dedup_opts or {})
        flagged = (
            minhash_lsh_join(
                out, corpus, id_col=id_col, text_col=text_col,
                threshold=near_dedup_threshold, **opts,
            )
            .select(F.col("in_id").alias("__dup"))
            .distinct()
        )
        out = out.join(
            flagged, F.col(id_col) == F.col("__dup"), "left_anti"
        )

    return out.select(
        F.col(id_col), F.col(text_col), token_count(text_col).alias("n_tokens")
    )
