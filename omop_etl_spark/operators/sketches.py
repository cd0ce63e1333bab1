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

from ..conf import checkpoint as _checkpoint
from .sampling import unit_hash

__all__ = [
    "kmv_distinct",
    "kmv_set_similarity",
    "kmv_difference",
    "cm_sketch_counts",
    "cm_estimate",
    "hll_registers",
    "hll_estimate",
    "bloom_build",
    "bloom_probe",
    "kmv_sliding_distinct",
    "logq_buckets",
    "logq_quantiles",
]


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
    # the sketch frame is consumed by BOTH pair sides and the group
    # list; the hash/explode expressions upstream defeat ReuseExchange
    # canonicalization, so without the materialization every consumer
    # re-runs the full corpus tokenize + distinct (4 scans observed).
    # Eager checkpoint (conf.checkpoint: local by default, reliable
    # via conf) rather than persist: downstream plans read a plain RDD
    # scan, so AQE still optimizes them — an InMemoryRelation persist
    # measured SLOWER than the re-scans at both sf0.1 and sf1. The
    # frame is O(groups * k) rows — materializing it is the point of
    # a sketch.
    sk = (
        dedup.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .transform(_checkpoint)
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


def kmv_difference(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 128,
    salt: str = "kmv",
) -> DataFrame:
    """Directed set-difference cardinality ``|A \\ B|`` between every
    ordered group pair from their KMV/theta sketches — the classic
    theta-sketch **A-NOT-B** estimator (Apache DataSketches' set-
    difference operation), without ever comparing the raw sets.

    Theory: let ``S_g`` be the ``min(k, d_g)`` smallest distinct
    hashes of group ``g`` and ``θ_g = 1`` if the sketch is partial
    (``|S_g| < k``) else the k-th smallest hash. For the pair
    ``(a, b)`` with ``θ = min(θ_a, θ_b)``, every hash below ``θ`` is a
    uniform sample of the value space at rate ``θ``, and membership of
    such a hash in B is decided EXACTLY by B's retained set (B keeps
    everything below ``θ_b ≥ θ``). So
    ``est = |{h ∈ S_a : h < θ, h ∉ S_b}| / θ``. When both sketches
    are partial (``θ = 1``) the estimate is the exact difference
    cardinality.

    Everything after the per-group sketch is sketch-sized — the pair
    frame is ``O(G² · k)`` rows for ``G`` groups regardless of input
    rows, which is the 100 TB point: one linear scan builds the
    sketches (map-side distinct combine), the set algebra runs on
    KBs. All outputs are integers (``θ`` kept in exact 2^32-scaled
    form, estimate = ``count · 2^32 div θ_q``), so a DuckDB oracle
    replaying the same md5 hash reproduces them bit-for-bit.

    Output: one row per ordered pair — ``<group>_a, <group>_b,
    diff_kept`` (sample count), ``theta_q`` (2^32-scaled θ),
    ``est_diff``.
    """
    if k < 2:
        raise ValueError("kmv_difference requires k >= 2")
    h = unit_hash(value_col, salt)
    dedup = df.select(F.col(group_col).alias("__g"), h.alias("h")).distinct()
    w = Window.partitionBy("__g").orderBy("h")
    # consumed 6x downstream (theta both pair sides, ga, gb, and the
    # zero-survivor backfill's pair rebuild); see kmv_set_similarity —
    # same eager-checkpoint rationale, O(groups * k) rows
    sk = (
        dedup.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .transform(_checkpoint)
    )
    # θ_q per group: 2^32 for a partial sketch, else the k-th smallest
    # hash in exact 2^32-scaled integer form
    theta = sk.groupBy("__g").agg(
        F.when(F.count(F.lit(1)) < k, F.lit(1 << 32).cast("bigint"))
        .otherwise(F.floor(F.max("h") * F.lit(float(1 << 32))).cast("bigint"))
        .alias("__theta_q")
    )
    ga = sk.select(F.col("__g").alias("ga"), F.col("h").alias("h"))
    gb = sk.select(F.col("__g").alias("gb"), F.col("h").alias("hb"))
    pairs = (
        theta.select(F.col("__g").alias("ga"), F.col("__theta_q").alias("ta"))
        .join(
            F.broadcast(
                theta.select(F.col("__g").alias("gb"), F.col("__theta_q").alias("tb"))
            ),
            F.col("ga") != F.col("gb"),
        )
        .withColumn("theta_q", F.least("ta", "tb"))
    )
    # A's sampled hashes below θ, minus exact membership in B's sketch
    cand = pairs.join(ga, "ga").filter(
        F.floor(F.col("h") * F.lit(float(1 << 32))) < F.col("theta_q")
    )
    kept = cand.join(
        gb, (cand["gb"] == gb["gb"]) & (cand["h"] == gb["hb"]), "left_anti"
    )
    counts = kept.groupBy("ga", "gb", "theta_q").agg(
        F.count(F.lit(1)).alias("diff_kept")
    )
    # pairs with zero survivors must still be emitted (est 0)
    out = (
        pairs.select("ga", "gb", "theta_q")
        .join(counts, ["ga", "gb", "theta_q"], "left")
        .na.fill({"diff_kept": 0})
    )
    return out.select(
        F.col("ga").alias(f"{group_col}_a"),
        F.col("gb").alias(f"{group_col}_b"),
        F.col("diff_kept").cast("bigint").alias("diff_kept"),
        F.col("theta_q").cast("bigint").alias("theta_q"),
        F.expr("(diff_kept * 4294967296) div theta_q").cast("bigint").alias("est_diff"),
    )


def cm_sketch_counts(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
    count_col: str | None = None,
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
    if count_col is None:
        # one row per occurrence
        exploded = df.select(F.explode(cells).alias("__c")).select(
            "__c.row", "__c.bucket", F.lit(1).cast("bigint").alias("__w")
        )
    else:
        # pre-aggregated (value, count) spine: each cell accumulates
        # the occurrence count — identical cells (cells are SUMS over
        # the multiset), one pass over the vocabulary instead of the
        # corpus (r17)
        exploded = df.select(
            F.explode(cells).alias("__c"), F.col(count_col).alias("__w")
        ).select("__c.row", "__c.bucket", "__w")
    return (
        exploded.groupBy("row", "bucket")
        .agg(F.sum("__w").cast("bigint").alias("cnt"))
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


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    b: int = 12,
    salt: str = "hll",
) -> DataFrame:
    """Per-group HyperLogLog registers over a *public* hash — the
    mergeable cardinality sketch (Flajolet et al. 2007) with none of
    the engine-private register layout of ``approx_count_distinct``.

    Sketch state is ``(group, bucket, register)`` rows: bucket = the
    first ``b`` bits of ``md5(salt|value)``, register = the max over
    the group's values of ``rho`` (position of the first 1-bit in the
    next 60 bits, so ``1..61``).  ``MAX`` makes the state mergeable:
    registers of a union are the element-wise max of the parts'
    registers — the property that lets 1000 executors sketch 100 TB
    with one ``O(groups * 2^b)``-row shuffle (map-side partial MAX
    collapses everything bigger).

    Engine portability: ``rho`` is computed entirely with STRING ops
    on the md5 hex (strip leading zero nybbles, classify the first
    non-zero hex digit) — no float, no engine-specific bit intrinsics
    — so a DuckDB oracle replays the registers bit-for-bit.

    ``b`` must be a multiple of 4 (bucket = whole hex nybbles),
    4 <= b <= 16; default 4096 buckets (~1.6% standard error).
    """
    if b % 4 != 0 or not 4 <= b <= 16:
        raise ValueError("hll_registers requires b in {4, 8, 12, 16}")
    gcols = list(group_cols)
    nyb = b // 4
    hx = F.md5(F.concat(F.lit(f"{salt}|"), F.col(value_col).cast("string")))
    bucket = F.conv(F.substring(hx, 1, nyb), 16, 10).cast("bigint")
    stripped = F.regexp_replace(F.substring(hx, nyb + 1, 15), "^0+", "")
    first = F.substring(stripped, 1, 1)
    lz_digit = (
        F.when(first.isin("8", "9", "a", "b", "c", "d", "e", "f"), F.lit(0))
        .when(first.isin("4", "5", "6", "7"), F.lit(1))
        .when(first.isin("2", "3"), F.lit(2))
        .otherwise(F.lit(3))
    )
    rho = (
        F.when(stripped == "", F.lit(61))
        .otherwise((F.lit(15) - F.length(stripped)) * 4 + lz_digit + 1)
        .cast("int")
    )
    return (
        df.select(*gcols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: Sequence[str],
    b: int = 12,
) -> DataFrame:
    """Cardinality estimates from :func:`hll_registers` state, with
    every column either exactly integral or floor-scaled once — the
    same determinism contract as :func:`kmv_distinct`, so a SQL oracle
    reproduces the sketch AND the estimate bit-for-bit.

    * ``n_present`` / ``v_empty`` — buckets with/without data.
    * ``reg_sum`` — ``SUM(register)``: a compact exact checksum of the
      full register state (pins the sketch in correctness gates).
    * ``est_raw`` — the raw HLL estimator ``alpha_m * m^2 / Z`` where
      ``Z = sum(2^-register)`` over all ``m`` buckets, computed as ONE
      exact integer division: ``2^-register`` is scaled by ``2^61``
      into exact int64 terms summed in decimal(38,0), and
      ``alpha_m = 0.7213 / (1 + 1.079 / m)`` enters as the exact
      rational ``7213*m / (10000*m + 10790)`` — so no float touches
      the estimate at all.
    * ``est_lc_micro`` — linear-counting correction
      ``m * ln(m / V)`` in floor-scaled micro-units (the one libm
      call, floored once per group — the accepted pattern of
      ``unigram_logprob_scores``); NULL when every bucket is hit.
    * ``est_micro`` — the standard estimator choice, scaled 1e6:
      linear counting when ``est_raw <= 2.5m`` and empty buckets
      remain, else ``est_raw * 1e6``.
    """
    if b % 4 != 0 or not 4 <= b <= 16:
        raise ValueError("hll_estimate requires b in {4, 8, 12, 16}")
    gcols = list(group_cols)
    m = 1 << b
    two61 = 1 << 61
    num = 7213 * m * m * m * two61  # alpha numerator * m^2 * 2^61
    den_alpha = 10000 * m + 10790
    agg = registers.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
        F.sum("register").cast("bigint").alias("reg_sum"),
        F.sum(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 61 - register) AS DECIMAL(38,0))")
        ).alias("__ssum"),
    )
    est_raw = F.expr(
        f"CAST(CAST({num} AS DECIMAL(38,0)) div "
        f"(CAST({den_alpha} AS DECIMAL(38,0)) * "
        f"(__ssum + CAST(({m} - n_present) AS DECIMAL(38,0)) * CAST({two61} AS DECIMAL(38,0)))) "
        "AS BIGINT)"
    )
    v_empty = (F.lit(m) - F.col("n_present")).cast("bigint")
    est_lc_micro = F.when(
        v_empty > 0,
        F.lit(m)
        * F.floor(F.log(F.lit(float(m)) / v_empty) * 1_000_000).cast("bigint"),
    ).cast("bigint")
    out = agg.select(
        *gcols,
        "n_present",
        v_empty.alias("v_empty"),
        "reg_sum",
        est_raw.alias("est_raw"),
        est_lc_micro.alias("est_lc_micro"),
    )
    est_micro = (
        F.when(
            (F.col("v_empty") > 0) & (F.col("est_raw") * 2 <= 5 * m),
            F.col("est_lc_micro"),
        )
        .otherwise(F.col("est_raw") * 1_000_000)
        .cast("bigint")
    )
    return out.withColumn("est_micro", est_micro)


def _bloom_positions(value: Column, m: int, k: int, salt: str) -> Column:
    """Array of ``k`` bit positions in ``[0, m)`` for ``value``, each
    from an independently-salted md5 — pure string/int ops, so any
    engine with md5 replays the filter bit-for-bit."""
    legs = []
    for i in range(k):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}{i}|"), value.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        legs.append(h % m)
    return F.array(*legs)


def bloom_build(
    df: DataFrame,
    value_col: str,
    m: int = 8192,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Build a Bloom filter over ``value_col`` as a frame of SET BIT
    positions (``<= m`` rows) — the classic pre-join membership prune
    for 100 TB semi-joins: ship the bounded bit frame to every
    executor instead of shuffling the fact side against the member
    list.  No false negatives ever; false-positive rate
    ``~(1 - e^(-k*n/m))^k``.

    The explicit, hash-portable twin of Spark's runtime
    ``bloomFilter`` join reduction (which is engine-private state):
    this one is SQL-oracle-replayable and persistable as a tiny table.
    One scan, one ``m``-bounded distinct.
    """
    if m < 2 or k < 1:
        raise ValueError("bloom_build requires m >= 2, k >= 1")
    # groupBy, not .distinct(): identical semantics, but distinct shows
    # as Deduplicate in the ANALYZED plan while groupBy shows as
    # Aggregate — the row-collapsing node the broadcast-hint scale
    # guard (tests/test_plan_quality.py) recognizes between a hint and
    # an SF-linear scan.  The bit frame is <= m rows either way.
    return (
        df.select(
            F.explode(_bloom_positions(F.col(value_col), m, k, salt)).alias("bit")
        )
        .groupBy("bit")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select("bit")
    )


def bloom_probe(
    probes: DataFrame,
    bits: DataFrame,
    value_col: str,
    m: int = 8192,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Probe every (distinct) ``value_col`` against a
    :func:`bloom_build` bit frame: adds ``bloom_pass`` — true iff all
    ``k`` of the value's bits are set (so true members ALWAYS pass).

    The bit frame is ``<= m`` rows — broadcast at any scale; the probe
    explodes to ``k`` rows per distinct value, aggregates back with a
    count-of-hits compare.  Nothing SF-linear crosses the network
    twice.
    """
    if m < 2 or k < 1:
        raise ValueError("bloom_probe requires m >= 2, k >= 1")
    pr = probes.select(F.col(value_col).alias("__v")).distinct()
    legs = pr.select(
        "__v", F.explode(_bloom_positions(F.col("__v"), m, k, salt)).alias("bit")
    )
    hit = legs.join(
        F.broadcast(bits.withColumn("__set", F.lit(1))), "bit", "left"
    )
    return (
        hit.groupBy("__v")
        .agg((F.count("__set") == k).alias("bloom_pass"))
        .select(F.col("__v").alias(value_col), "bloom_pass")
    )


def kmv_sliding_distinct(
    df: DataFrame,
    time_col: str,
    value_col: str,
    window_days: int = 7,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Estimated distinct ``value_col`` over a trailing ``window_days``
    window per day — the sliding-cardinality report (trailing-7-day
    active users) that exact ``COUNT(DISTINCT)`` makes quadratic at
    scale (every day re-scans its whole window of facts).

    The scale trick is the KMV MERGE property: the k smallest hashes of
    ``A ∪ B`` are exactly the k smallest of ``k-min(A) ∪ k-min(B)`` —
    any union-minimum is a minimum of its own set.  So facts collapse
    ONCE to per-day sketches (``days * k`` rows), and the sliding
    window unions sketches, never facts: each day's sketch fans out to
    the ``window_days`` target days it participates in, hashes dedup
    per target day (the same value may appear on several days), and the
    per-target k-smallest cut re-sketches the union.  Everything after
    the one fact-sized dedup is sketch-sized.

    Output: one row per day with >= 1 event — ``n_kept``,
    ``est_distinct`` (exact when the window's true distinct < k),
    same estimator and determinism contract as :func:`kmv_distinct`.
    """
    if k < 2:
        raise ValueError("kmv_sliding_distinct requires k >= 2")
    if window_days < 1:
        raise ValueError("kmv_sliding_distinct requires window_days >= 1")
    h = unit_hash(value_col, salt)
    day = F.to_date(F.col(time_col)).alias("day")
    day_hashes = df.select(day, h.alias("h")).distinct()
    w_day = Window.partitionBy("day").orderBy("h")
    day_sketch = (
        day_hashes.withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    offsets = df.sparkSession.range(window_days).select(
        F.col("id").cast("int").alias("o")
    )
    fanned = (
        day_sketch.crossJoin(F.broadcast(offsets))
        .select(F.expr("date_add(day, o)").alias("tday"), "h")
        .distinct()
    )
    active = df.select(day).distinct()
    windowed = fanned.join(active.withColumnRenamed("day", "tday"), "tday")
    w_t = Window.partitionBy("tday").orderBy("h")
    merged = (
        windowed.withColumn("rn", F.row_number().over(w_t))
        .filter(F.col("rn") <= k)
        .groupBy("tday")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k"))
    )
    h_k_safe = F.greatest(F.col("h_k"), F.lit(1.0 / float(1 << 32)))
    est = (
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(F.floor(F.lit(float(k - 1)) / h_k_safe))
        .cast("bigint")
    )
    return merged.select(
        F.col("tday").alias("day"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        est.alias("est_distinct"),
    )


def logq_buckets(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    m: int = 5,
) -> DataFrame:
    """Log-linear quantile sketch REGISTERS (the DDSketch family,
    deterministic-integer edition): per group, counts per log2
    octave x ``2^m`` linear sub-buckets of a POSITIVE integer value
    column.  Bucket id is a pure integer function of the value —
    ``bl * 2^m + (v * 2^m div 2^(bl-1) - 2^m)`` with
    ``bl = bit-length(v)`` (computed portably as
    ``length(bin(v))``) — so the sketch, and any quantile read off
    it, replays bit-for-bit in any SQL engine (the same
    engine-replayability contract as :func:`kmv_distinct`; DDSketch's
    own ``ceil(log_gamma(x))`` indexing would hinge on transcendental
    ``log`` rounding, which IEEE does NOT pin down cross-engine).

    Guarantee: every value in bucket ``(bl, sub)`` lies within a
    factor of ``1 + 2^-m`` of the bucket's lower bound, so any
    quantile estimated from the sketch has bounded RELATIVE error
    ``< 2^-m`` — the property that makes log-histogram sketches the
    100 TB quantile workhorse (fixed ~1e2-1e3-row state per group,
    mergeable by plain SUM, vs an exact quantile's full value
    domain).

    Rows with ``value < 1`` are dropped (log sketches are defined on
    positive values); quantize first (e.g. cents) and count zeros
    separately if they matter.

    Scale: ONE scan, map-side-combinable groupBy — state is
    O(octaves * 2^m) per group regardless of row count; two sketches
    merge by summing counts per bucket id (same register algebra as
    :func:`hll_registers`' MAX-merge, here SUM).
    """
    two_m = 1 << m
    gcols = list(group_cols)
    v = f"CAST({value_col} AS BIGINT)"
    bl = f"length(bin({v}))"
    bucket = F.expr(
        f"{bl} * {two_m} + (({v} * {two_m}) div "
        f"shiftleft(CAST(1 AS BIGINT), {bl} - 1) - {two_m})"
    ).cast("bigint")
    return (
        df.filter(F.expr(f"{v} >= 1"))
        .groupBy(*gcols, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def logq_quantiles(
    buckets: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[tuple[int, int]],
    m: int = 5,
    count_col: str = "c",
) -> DataFrame:
    """Quantile ESTIMATES from a :func:`logq_buckets` sketch: for
    each ``(num, den)`` quantile (e.g. ``(1, 2)`` for p50), the lower
    bound of the smallest bucket whose cumulative count reaches
    ``num * (n - 1) div den + 1`` — the same lower-value rank rule as
    the exact path (stats.exact_quantile_cuts), applied to the
    sketch's bucket spine, so estimate error comes ONLY from bucket
    width (relative ``< 2^-m``), never from rank arithmetic.

    The bucket lower bound inverts the id arithmetically:
    ``2^(bl-1) * (2^m + sub) div 2^m`` — pure integers, so both
    engines render identical estimates.

    Scale: runs entirely on the bucket-bounded sketch frame — one
    partitioned cumulative window + one group collapse; the raw data
    is never touched.
    """
    two_m = 1 << m
    gcols = list(group_cols)
    w_cum = (
        Window.partitionBy(*gcols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*gcols)
    x = buckets.select(
        *gcols,
        "bucket",
        F.sum(count_col).over(w_cum).alias("__cum"),
        F.sum(count_col).over(w_tot).alias("__n"),
    )
    lb = (
        "shiftleft(CAST(1 AS BIGINT), CAST(bucket div {tm} AS INT) - 1) "
        "* ({tm} + bucket % {tm}) div {tm}"
    ).format(tm=two_m)
    aggs = [F.max("__n").cast("bigint").alias("n")]
    for num, den in quantiles:
        thr = f"__cum >= ({num} * (__n - 1)) div {den} + 1"
        aggs.append(
            F.min(F.when(F.expr(thr), F.expr(lb)))
            .cast("bigint")
            .alias(f"q{num}_{den}")
        )
    return x.groupBy(*gcols).agg(*aggs)
