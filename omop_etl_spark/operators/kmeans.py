"""Distributed Lloyd's k-means over an embedding column, in exact
fixed-point arithmetic.

Reference parity: none — the reference engine (clinical-ai/omop-etl,
see SURVEY.md §2) has no vector surface; this is part of the
LLM-data-pipeline suite (semantic clustering for corpus mixing /
SemDeDup-style cluster-then-dedup, Abbas et al. 2023).

Why fixed-point: float k-means is not reproducible across engines
(summation order changes the means, which changes assignments at
boundaries). Quantizing every component to ``floor(x * scale)`` makes
every distance an exact int64, every argmin deterministic (ties break
to the lowest centroid id), and every centroid update an exact
integer-average floor — so the whole iterative algorithm is
value-replayable by an ANSI-SQL oracle, chained CTE per iteration.
With ``scale = 10^6`` the quantization error is three orders of
magnitude below typical embedding noise.

Scale design (per iteration, all lazy — Spark builds ONE plan for all
iterations, no driver action in the loop):

* assignment — the ``k`` centroids collapse into ONE array row,
  broadcast, and the argmin runs entirely as an expression
  (``array_min`` over a ``transform`` of ``struct(dist, cid)``
  candidates, distances a JVM ``zip_with`` fold): a pure map-side
  projection with NO exchange — the corpus never shuffles during
  assignment (r18; the previous crossJoin + groupBy(id) spelling
  hash-aggregated the same argmin but re-shuffled every vector once
  per iteration).
* update — posexplode the winning vectors to (cid, pos, x) and hash
  aggregate the integer means: one shuffle of scalar triples, output
  ``k × dim`` rows collected into ``k`` array rows.

The corpus frame is persisted once (consumed by every iteration's
assignment); centroid frames are ``k`` rows throughout. Empty
clusters simply disappear (documented Lloyd's behavior); callers
wanting re-seeding can union fresh rows between calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..conf import checkpoint as _checkpoint

from .similarity import _as_double

__all__ = ["kmeans_assign", "kmeans_assign_two_level", "two_level_k"]


def two_level_k(n: int, target_cluster_rows: int = 150) -> tuple[int, int]:
    """Derive the ``(k1, k2)`` pair for
    :func:`kmeans_assign_two_level` from the corpus size: the fine
    cell count targets ``K = ceil(n / target_cluster_rows)`` total
    cells (expected cell size ~``target_cluster_rows``, so downstream
    within-cell pair work stays LINEAR in ``n``), split as ``k1 =
    max(8, ceil(sqrt(K)))`` coarse × ``k2 = max(4, ceil(K / k1))``
    sub-clusters — BOTH assignment stages are ``n * O(sqrt(K))``
    distance evaluations instead of the flat form's ``n * K``
    (quadratic in ``n`` once ``K`` scales with ``n``; VERDICT r11 #1).
    The floors pin the derivation at small corpora: n=500 (the
    oracle's sf0.01) lands on exactly (8, 4) = 32 cells, matching the
    flat form's old ``k=32`` floor."""
    if n < 0:
        raise ValueError("two_level_k requires n >= 0")
    big_k = -(-max(1, n) // max(1, target_cluster_rows))
    k1 = int(big_k**0.5)
    while k1 * k1 < big_k:  # integer ceil(sqrt): float sqrt can floor
        k1 += 1
    k1 = max(8, k1)
    k2 = max(4, -(-big_k // k1))
    return k1, k2


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations and return the final assignment:
    ``(id_col, cluster_id, dist_sq)`` with ``dist_sq`` the exact
    fixed-point squared L2 distance to the winning centroid.

    Initialization is deterministic: the ``k`` vectors with the
    smallest ``id_col`` seed the centroids (cluster_id = 0-based rank
    among them). Deterministic-init + exact-integer iterate means the
    output is a pure function of the input — reruns, engine ports, and
    the DuckDB oracle all agree row-for-row.

    int64 safety: ``|floor(x·scale)| ≤ scale`` for unit-scale
    embeddings, so a squared component diff ≤ ``4·scale²`` and
    ``dist_sq ≤ 4·scale²·dim`` — at the defaults 2.6e14, five orders
    below 2^63. Centroid sums stay exact in the aggregate's int64 and
    the mean is ``floor(avg)`` (avg of int64s is exact below 2^53).

    Resource contract (ADVICE r10): the quantized corpus frame is
    persisted for the Lloyd iterations and UNPERSISTED before return —
    the final assignment is eagerly local-checkpointed first (it's
    id+cluster+dist, tiny next to the corpus), which also truncates
    the ``iters``-deep loop lineage. Local checkpoints are
    non-reliable: if an executor holding blocks is lost, downstream
    stages cannot recompute them — at cluster scale with elastic
    executors, set a reliable ``spark.sparkContext.setCheckpointDir``
    and swap to ``.checkpoint()``, or accept job retry. (On local[*]
    executor loss means the app died; the trade is free.)
    """
    from pyspark import StorageLevel

    q = df.select(
        F.col(id_col),
        F.transform(
            _as_double(F.col(vec_col)),
            lambda x: F.floor(x * F.lit(float(scale))),
        ).alias("__xq"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # deterministic seeding: k smallest ids, rank = cluster id — the
    # window runs on a k-row frame, not the corpus
    w = F.row_number().over(Window.orderBy(id_col))
    cents = (
        q.orderBy(id_col)
        .limit(k)
        .select((w - 1).alias("cluster_id"), F.col("__xq").alias("__cq"))
    )

    assigned = None
    for _ in range(iters):
        # assignment is MAP-ONLY (r18, guide §2.4): the k centroids
        # collapse into ONE array row, broadcast, and the argmin runs
        # as an expression — array_min over struct(dist, cid) is the
        # identical lexicographic pick the old crossJoin+groupBy(id)
        # hash-aggregate made, but the corpus (vectors included) no
        # longer shuffles once per Lloyd iteration; only the k×dim
        # scalar means exchange remains. collect_list order is
        # irrelevant under min.
        cands = cents.agg(
            F.collect_list(F.struct("cluster_id", "__cq")).alias("__cands")
        )
        assigned = q.crossJoin(F.broadcast(cands)).select(
            id_col,
            "__xq",
            F.array_min(
                F.transform(
                    F.col("__cands"),
                    lambda c: F.struct(
                        _sq_dist(F.col("__xq"), c["__cq"]).alias("dist_sq"),
                        c["cluster_id"].alias("cluster_id"),
                    ),
                )
            ).alias("__win"),
        )
        means = (
            assigned.select(
                F.col("__win.cluster_id").alias("cluster_id"),
                F.posexplode("__xq").alias("pos", "x"),
            )
            .groupBy("cluster_id", "pos")
            .agg(F.floor(F.avg("x")).alias("m"))
        )
        cents = means.groupBy("cluster_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("__cq")
        )

    out = assigned.select(
        F.col(id_col),
        F.col("__win.cluster_id").cast("int").alias("cluster_id"),
        F.col("__win.dist_sq").cast("bigint").alias("dist_sq"),
    ).transform(_checkpoint)
    q.unpersist()
    return out


def kmeans_assign_two_level(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: int = 8,
    k2: int = 4,
    iters: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-level Lloyd's: ``k1`` coarse clusters over the corpus, then
    ``k2`` sub-clusters WITHIN each coarse cell — the at-scale form of
    :func:`kmeans_assign` for SemDeDup-style partitioning where the
    target CELL COUNT grows with the corpus (VERDICT r11 #1: flat
    ``k ∝ n`` makes assignment ``n·k = O(n²)`` work behind an O(n)
    centroid broadcast; splitting ``k = k1·k2`` with ``k1 ≈ k2 ≈
    sqrt(k)`` makes BOTH stages ``n·sqrt(k)`` and bounds every
    broadcast at ``sqrt(k)`` rows).

    Stage shapes:

    * coarse — exactly :func:`kmeans_assign`'s plan (broadcast
      ``k1``-row centroids, map-side cross join, hash-agg argmin):
      deterministic seed = the ``k1`` smallest ids, ``iters``
      fixed-point rounds.
    * fine — per coarse cell, seeds = the ``k2`` smallest ids IN that
      cell (one window partitioned by cell, never global), then the
      same fixed-point rounds with the candidate set produced by an
      EQUI-join on the coarse cell id: each vector scores only its
      own cell's ``k2`` sub-centroids, so no ``k1·k2``-row frame is
      ever broadcast — at scale the join shuffles on the cell id
      (AQE may still pick broadcast while the frame is tiny; there is
      deliberately no hint).

    The coarse assignment (id, cell, quantized vector) is eagerly
    local-checkpointed once — it feeds every fine round and the final
    projection, and the checkpoint truncates the coarse Lloyd lineage
    (same contract/caveats as :func:`kmeans_assign`).

    Output: ``(id_col, cluster_id, dist_sq)`` with ``cluster_id =
    coarse_cell * k2 + sub_cluster`` (stable, disjoint across cells)
    and ``dist_sq`` the exact fixed-point squared L2 distance to the
    winning SUB-centroid. Deterministic-init + exact-integer iterate
    at both levels keeps the whole pipeline a pure function of the
    input — value-replayable by the DuckDB oracle's chained CTEs
    (gate ``embed_kmeans2``).
    """
    from pyspark import StorageLevel

    if k1 < 1 or k2 < 1:
        raise ValueError("kmeans_assign_two_level requires k1 >= 1 and k2 >= 1")

    q = df.select(
        F.col(id_col),
        F.transform(
            _as_double(F.col(vec_col)),
            lambda x: F.floor(x * F.lit(float(scale))),
        ).alias("__xq"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    w = F.row_number().over(Window.orderBy(id_col))
    cents = (
        q.orderBy(id_col)
        .limit(k1)
        .select((w - 1).alias("__c"), F.col("__xq").alias("__cq"))
    )
    assigned = None
    for _ in range(iters):
        # map-only assignment, same spelling as kmeans_assign (r18,
        # guide §2.4): the k1 coarse centroids collapse to one array
        # row and the argmin is an expression — the corpus never
        # shuffles in the coarse stage
        cands = cents.agg(
            F.collect_list(F.struct("__c", "__cq")).alias("__cands")
        )
        assigned = q.crossJoin(F.broadcast(cands)).select(
            id_col,
            "__xq",
            F.array_min(
                F.transform(
                    F.col("__cands"),
                    lambda c: F.struct(
                        _sq_dist(F.col("__xq"), c["__cq"]).alias("dist_sq"),
                        c["__c"].alias("__c"),
                    ),
                )
            ).alias("__win"),
        )
        means = (
            assigned.select(
                F.col("__win.__c").alias("__c"),
                F.posexplode("__xq").alias("pos", "x"),
            )
            .groupBy("__c", "pos")
            .agg(F.floor(F.avg("x")).alias("m"))
        )
        cents = means.groupBy("__c").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("__cq")
        )

    # the fine stage's loop-invariant input: checkpoint BEFORE the
    # loop, derive everything from the checkpoint (SCALE.md §18)
    coarse = assigned.select(
        F.col(id_col), F.col("__win.__c").alias("__c"), "__xq"
    ).transform(_checkpoint)
    q.unpersist()

    # fine seeds: the k2 smallest ids per cell; the window is
    # PARTITIONED by cell (bounded per-partition work, never global)
    ws = Window.partitionBy("__c").orderBy(id_col)
    fcents = (
        coarse.withColumn("__rn", F.row_number().over(ws))
        .filter(F.col("__rn") <= k2)
        .select("__c", (F.col("__rn") - 1).alias("__sub"), F.col("__xq").alias("__cq"))
    )
    fassigned = None
    for _ in range(iters):
        # per-cell candidate ARRAYS (r18, guide §2.4): the k2
        # sub-centroids of each cell collapse into one row per cell,
        # the corpus equi-joins its own cell's row (k1-row right side
        # — AQE broadcasts while tiny, shuffles on the cell id at
        # scale, exactly like the old fcents join), and the argmin is
        # an expression — the old groupBy(id) hash aggregate that
        # re-shuffled the corpus (vectors included) EVERY fine
        # iteration is gone.
        fcands = fcents.groupBy("__c").agg(
            F.collect_list(F.struct("__sub", "__cq")).alias("__cands")
        )
        fassigned = coarse.join(fcands, "__c").select(
            id_col,
            "__c",
            "__xq",
            F.array_min(
                F.transform(
                    F.col("__cands"),
                    lambda c: F.struct(
                        _sq_dist(F.col("__xq"), c["__cq"]).alias("dist_sq"),
                        c["__sub"].alias("__sub"),
                    ),
                )
            ).alias("__win"),
        )
        fmeans = (
            fassigned.select(
                "__c",
                F.col("__win.__sub").alias("__sub"),
                F.posexplode("__xq").alias("pos", "x"),
            )
            .groupBy("__c", "__sub", "pos")
            .agg(F.floor(F.avg("x")).alias("m"))
        )
        fcents = fmeans.groupBy("__c", "__sub").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("__cq")
        )

    # LAZY checkpoint (r18, guide §5 job-count discipline): the fine
    # assignment has exactly one downstream consumer per call site
    # (scoped_cosine_pairs' cell frame / the kmeans2 gate's sink), so
    # the first consuming job materializes the checkpoint as a side
    # effect instead of a dedicated construction job; every lineage
    # root below it is the EAGER coarse checkpoint's cache, so the
    # fold-in recomputes nothing (q is already released). The lineage
    # cut itself (plan truncation after 2×iters unrolled rounds) is
    # identical either way.
    out = fassigned.select(
        F.col(id_col),
        (F.col("__c") * F.lit(int(k2)) + F.col("__win.__sub"))
        .cast("int")
        .alias("cluster_id"),
        F.col("__win.dist_sq").cast("bigint").alias("dist_sq"),
    ).transform(lambda d: _checkpoint(d, eager=False))
    return out
