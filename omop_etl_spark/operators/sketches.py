"""Distributed cardinality sketches with engine-replayable results.

The reference pipeline profiles source tables before mapping them
(row counts, distinct counts per key column — see
the compiled validation/*.yaml rules,
/root/reference/omop_etl/__main__.py:34-92); at 100 TB an
exact ``COUNT(DISTINCT x)`` per group is a full shuffle of every
distinct value.  The KMV (k-minimum-values) sketch bounds that state
to ``k`` hashes per group while keeping a provable relative error of
``~1/sqrt(k-2)``.

Unlike HyperLogLog (``approx_count_distinct``), whose register layout
is engine-private, KMV over a public hash (md5, via
:func:`~omop_etl_spark.operators.sampling.unit_hash`) is *exactly
replayable* in any SQL engine: the k smallest distinct hashes — and
therefore the estimate — are a pure function of the data.  That makes
the sketch value-oracle-checkable, not just rows-checkable.

Scale notes
-----------
* The ``(group, hash)`` dedup is a shuffle with map-side partial
  aggregation — heavy hitters collapse before the exchange.
* The per-group k-smallest runs as ``row_number() <= k``, which Spark
  compiles with a ``WindowGroupLimit`` partial pass: every map task
  keeps only its local top-k *before* the shuffle, so exchange volume
  is ``O(groups * k)`` regardless of distinct count.
* The estimate ``(k-1)/h_k`` divides two binary64-exact values
  (``h`` is a 32-bit integer over 2^32), and IEEE-754 division is
  exactly rounded — so ``floor()`` of it matches bit-for-bit across
  engines.  ``h_k`` is clamped to ``>= 2^-32`` (an all-zero md5
  prefix occurs with p ~= 2^-32 per distinct value) so the estimator
  is finite and identical in every engine even then; the oracle SQL
  applies the same ``greatest(h, 2^-32)``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import unit_hash

__all__ = ["kmv_distinct", "kmv_set_similarity", "cm_sketch_counts", "cm_estimate"]


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Estimate ``COUNT(DISTINCT value_col)`` per group with a KMV sketch.

    Returns one row per group with:

    * ``n_kept``      — ``min(k, true distinct)`` hashes retained
    * ``kth_hash_q``  — the k-th smallest hash scaled to a 2^32 integer
      (exact; the sketch's entire state summary)
    * ``est_distinct``— ``n_kept`` when the group has fewer than ``k``
      distinct values (the sketch is then *exact*), else
      ``floor((k-1) / h_k)`` — the classic KMV estimator.

    Every output is integral, so a DuckDB oracle replaying the same md5
    hash reproduces it bit-for-bit.
    """
    if k < 2:
        raise ValueError("kmv_distinct requires k >= 2")
    gcols = list(group_cols)
    h = unit_hash(value_col, salt)
    dedup = df.select(*gcols, h.alias("h")).distinct()
    w = Window.partitionBy(*gcols).orderBy("h")
    kept = (
        dedup.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    agg = kept.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("h_k"),
    )
    # h_k == 0 is possible (md5 prefix '00000000', p ~= 2^-32 per
    # distinct value); clamping to 2^-32 keeps the estimator finite and
    # engine-agreed instead of floor(inf) -> engine-dependent garbage.
    h_k_safe = F.greatest(F.col("h_k"), F.lit(1.0 / float(1 << 32)))
    est: Column = (
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(F.floor(F.lit(float(k - 1)) / h_k_safe))
        .cast("bigint")
    )
    return agg.select(
        *gcols,
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.floor(F.col("h_k") * F.lit(float(1 << 32))).cast("bigint").alias("kth_hash_q"),
        est.alias("est_distinct"),
    )


def kmv_set_similarity(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 128,
    salt: str = "kmv",
) -> DataFrame:
    """Pairwise set resemblance (Jaccard) between groups from their KMV
    sketches — corpus-overlap / drift estimation that never compares
    the raw sets.

    Theory: for the union's k smallest hashes, the fraction present in
    BOTH groups' sketches is an unbiased estimate of the Jaccard
    similarity (the classic k-minimum-values resemblance estimator).
    Everything after the per-group sketch (O(groups * k) rows) is
    sketch-sized: the pair enumeration, union-merge window, and
    membership counts all run on frames independent of the input
    row count — which is the entire point at 100 TB.

    Estimates are emitted as integer ppm (``matches * 1e6 div k``), so
    a SQL engine replaying the same md5 sketch reproduces them
    bit-for-bit.  Output: one row per unordered group pair —
    ``<group>_a, <group>_b, n_common, jaccard_ppm``.
    """
    if k < 1:
        raise ValueError("kmv_set_similarity requires k >= 1")
    h = unit_hash(value_col, salt)
    dedup = df.select(F.col(group_col).alias("__g"), h.alias("h")).distinct()
    w = Window.partitionBy("__g").orderBy("h")
    sk = (
        dedup.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    ga = sk.select(F.col("__g").alias("ga"), F.col("h").alias("ha"))
    gb = sk.select(F.col("__g").alias("gb"), F.col("h").alias("hb"))
    groups = sk.select("__g").distinct()
    pairs = (
        groups.select(F.col("__g").alias("ga"))
        .join(F.broadcast(groups.select(F.col("__g").alias("gb"))), F.col("ga") < F.col("gb"))
    )
    tagged = (
        pairs.join(ga, "ga")
        .select("ga", "gb", F.col("ha").alias("h"), F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(gb, "gb").select(
                "ga", "gb", F.col("hb").alias("h"),
                F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
            )
        )
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wm = Window.partitionBy("ga", "gb").orderBy("h")
    merged = tagged.withColumn("rn", F.row_number().over(wm)).filter(
        F.col("rn") <= k
    )
    return (
        merged.groupBy("ga", "gb")
        .agg(
            F.sum((F.col("in_a") * F.col("in_b")).cast("bigint")).alias("n_common"),
            F.count(F.lit(1)).alias("__m"),
        )
        .select(
            F.col("ga").alias(f"{group_col}_a"),
            F.col("gb").alias(f"{group_col}_b"),
            F.col("n_common").cast("bigint").alias("n_common"),
            F.expr("(n_common * 1000000) div __m").alias("jaccard_ppm"),
        )
    )


def cm_sketch_counts(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Build a count-min sketch over ``value_col`` occurrences:
    ``depth x width`` integer counters, each cell the exact count of
    values hashing into it.

    State is ``O(depth * width)`` — constant, mergeable (cells add),
    and partition-order independent (cells are SUMS, unlike
    SpaceSaving/Misra-Gries whose state depends on arrival order) — so
    the sketch, and every estimate read from it, is a pure function of
    the data multiset: exactly replayable in any engine with ``md5``.

    Returns ``(row, bucket, cnt)``; feed to :func:`cm_estimate`.
    Plan: ONE scan — each value explodes into its ``depth`` (row,
    bucket) cells inline (no per-row union re-scanning the input),
    then one map-side-combined aggregate: heavy hitters collapse
    before the exchange, and the exchange itself is at most
    ``depth * width`` rows per task.

    STREAMING twin: this same function applied to a streaming
    DataFrame in ``update`` output mode — cells are sums, so Spark's
    built-in streaming aggregation state (≤ depth*width keys, bounded
    forever) IS the sketch; no custom state operator needed.
    Prefix-equals-batch proven in
    tests/test_text_sources_streaming_sketch.py::
    test_stream_cm_sketch_prefix_equals_batch.
    """
    if depth < 1 or width < 1:
        raise ValueError("cm_sketch_counts requires depth, width >= 1")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _cm_bucket(F.col(value_col), r, width, salt).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("__c"))
        .select("__c.row", "__c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _cm_bucket(c: Column, row: int, width: int, salt: str) -> Column:
    """Bucket of a value in sketch row ``row``: first 8 md5 hex chars
    of ``salt|row|value`` modulo ``width`` — the same public-hash
    recipe as KMV, so an ANSI-SQL oracle replays it bit-for-bit."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}|{row}|"), c.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (h % width).cast("int")


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Point-query the count-min sketch for every probe value: the
    estimate is ``min`` over rows of the counter each row hashes the
    value into — an upper bound on the true count (classic CM
    guarantee: overestimate ≤ 2N/width with prob ≥ 1 - 2^-depth).

    The sketch frame is bounded (``depth * width`` rows) so the probe
    join broadcasts at any scale; missing cells count 0.
    """
    pr = probes.select(F.col(value_col).alias("__v")).distinct()
    probed = pr
    for r in range(depth):
        probed = probed.withColumn(
            f"__b{r}", _cm_bucket(F.col("__v"), r, width, salt)
        )
    lookups = None
    for r in range(depth):
        leg = probed.select(
            "__v", F.lit(r).alias("row"), F.col(f"__b{r}").alias("bucket")
        )
        lookups = leg if lookups is None else lookups.unionByName(leg)
    est = (
        lookups.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("__v")
        .agg(F.min("cnt").cast("bigint").alias("est_count"))
    )
    return est.select(F.col("__v").alias(value_col), "est_count")
