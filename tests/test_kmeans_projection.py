"""Fixed-point k-means (operators/kmeans.py) and Achlioptas random
projection (similarity.random_projection)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from omop_etl_spark.operators.kmeans import kmeans_assign
from omop_etl_spark.operators.similarity import random_projection, rp_coefficients


def _blobs(spark, dim=8, per=30, centers=((5.0,) * 8, (-5.0,) * 8, (0.0,) * 8)):
    # vec_ids interleave across blobs so the deterministic seeding (k
    # smallest ids) draws one seed per blob — Lloyd's cannot merge two
    # blobs whose seeds start apart
    rng = random.Random(3)
    rows = []
    for j in range(per):
        for ci, c in enumerate(centers):
            rows.append(
                (
                    j * len(centers) + ci,
                    [c[d] + rng.gauss(0, 0.3) for d in range(dim)],
                    ci,
                )
            )
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, true_label int"
    )


def test_kmeans_recovers_separated_blobs(spark):
    df = _blobs(spark)
    out = kmeans_assign(df, k=3, iters=3, scale=1000)
    joined = out.join(df.select("vec_id", "true_label"), "vec_id")
    # every true blob maps to exactly one k-means cluster and vice versa
    m = joined.groupBy("true_label", "cluster_id").count().collect()
    assert len(m) == 3
    assert {r["count"] for r in m} == {30}


def test_kmeans_deterministic_across_partitionings(spark):
    df = _blobs(spark)
    a = sorted(
        (r["vec_id"], r["cluster_id"], r["dist_sq"])
        for r in kmeans_assign(df, k=3, iters=2, scale=1000).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster_id"], r["dist_sq"])
        for r in kmeans_assign(
            df.repartition(7), k=3, iters=2, scale=1000
        ).collect()
    )
    assert a == b


def test_kmeans_iteration_reduces_inertia(spark):
    df = _blobs(spark, centers=((3.0,) * 8, (-3.0,) * 8))
    inertia = [
        kmeans_assign(df, k=2, iters=t, scale=1000)
        .agg(F.sum("dist_sq").alias("s"))
        .collect()[0]["s"]
        for t in (1, 3)
    ]
    assert inertia[1] <= inertia[0]


def test_rp_coefficients_seeded_and_sparse():
    a = rp_coefficients(16, 64, seed=42)
    b = rp_coefficients(16, 64, seed=42)
    assert (a == b).all()
    assert set(a.ravel().tolist()) <= {-1, 0, 1}
    # Achlioptas density: ~1/3 nonzero
    nz = (a != 0).mean()
    assert 0.2 < nz < 0.5


def test_random_projection_preserves_relative_distances(spark):
    # JL sanity: the projection of far-apart vs near points keeps order
    rng = random.Random(11)
    base = [rng.gauss(0, 1) for _ in range(64)]
    near = [x + rng.gauss(0, 0.01) for x in base]
    far = [rng.gauss(0, 1) for _ in range(64)]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "vec_id long, embedding array<double>"
    )
    out = {
        r["vec_id"]: r["proj"]
        for r in random_projection(df, k=32, dim=64, seed=1).collect()
    }

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    assert dist(out[0], out[1]) < dist(out[0], out[2])


def test_random_projection_exact_integer_replay(spark):
    # the operator's contract: proj == sum(floor(x*scale) * coeff)
    vec = [0.5, -0.25, 0.125, 1.0]
    coeffs = rp_coefficients(3, 4, seed=9)
    df = spark.createDataFrame([(7, vec)], "vec_id long, embedding array<double>")
    out = random_projection(df, k=3, dim=4, seed=9, scale=1000).collect()[0]
    xq = [math.floor(x * 1000) for x in vec]
    expect = [sum(q * int(c) for q, c in zip(xq, row)) for row in coeffs]
    assert list(out["proj"]) == expect


def test_two_level_k_derivation():
    from omop_etl_spark.operators.kmeans import two_level_k

    # the oracle-SF pin: sf0.01's n=500 must land on (8, 4) = 32 cells
    assert two_level_k(500) == (8, 4)
    for n in (0, 1, 149, 150, 500, 5_000, 150_000, 10**7, 10**10):
        k1, k2 = two_level_k(n)
        big_k = -(-max(1, n) // 150)
        assert k1 >= 8 and k2 >= 4
        assert k1 * k2 >= big_k  # enough cells for the target size
        # both factors stay O(sqrt(K)): neither re-creates the flat form
        assert k1 <= max(8, int(big_k**0.5) + 1)
        assert k2 <= max(4, k1 + 1)
    with pytest.raises(ValueError):
        two_level_k(-1)


def test_kmeans_two_level_equals_flat_when_one_coarse_cell(spark):
    """k1=1 collapses the coarse stage to a single cell, so the fine
    stage IS flat kmeans_assign(k=k2): identical assignments and
    distances, cluster_id = 0 * k2 + sub."""
    from omop_etl_spark.operators.kmeans import kmeans_assign_two_level

    df = _blobs(spark)
    flat = sorted(
        (r["vec_id"], r["cluster_id"], r["dist_sq"])
        for r in kmeans_assign(df, k=3, iters=2, scale=1000).collect()
    )
    two = sorted(
        (r["vec_id"], r["cluster_id"], r["dist_sq"])
        for r in kmeans_assign_two_level(
            df, k1=1, k2=3, iters=2, scale=1000
        ).collect()
    )
    assert flat == two


def test_kmeans_two_level_recovers_blobs_and_is_deterministic(spark):
    from omop_etl_spark.operators.kmeans import kmeans_assign_two_level

    df = _blobs(spark)
    out = kmeans_assign_two_level(df, k1=3, k2=2, iters=2, scale=1000)
    rows_a = sorted(
        (r["vec_id"], r["cluster_id"], r["dist_sq"]) for r in out.collect()
    )
    # composite ids live in [0, k1*k2) and decompose as c*k2 + sub
    assert all(0 <= cid < 6 for _, cid, _ in rows_a)
    # blob purity: no composite cell mixes two true blobs (cells may
    # SPLIT a blob — that's the sub-clustering working)
    j = out.join(df.select("vec_id", "true_label"), "vec_id")
    mix = j.groupBy("cluster_id").agg(
        F.countDistinct("true_label").alias("nlab")
    )
    assert mix.filter(F.col("nlab") > 1).count() == 0
    # partitioning-invariant (exact integer pipeline)
    rows_b = sorted(
        (r["vec_id"], r["cluster_id"], r["dist_sq"])
        for r in kmeans_assign_two_level(
            df.repartition(7), k1=3, k2=2, iters=2, scale=1000
        ).collect()
    )
    assert rows_a == rows_b


def test_scoped_cosine_pairs_default_two_level_subset_of_exact(spark):
    """The k=None default (two-level SemDeDup scoping) returns a
    subset of the exact all-pairs result with identical scores."""
    from omop_etl_spark.operators.similarity import (
        cosine_pairs,
        scoped_cosine_pairs,
    )

    df = _blobs(spark, per=20)
    thr = 0.95
    exact = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in cosine_pairs(df, threshold=thr).collect()
    }
    scoped = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in scoped_cosine_pairs(df, threshold=thr).collect()
    }
    assert set(scoped) <= set(exact)
    assert all(exact[p] == s for p, s in scoped.items())
    # recall < 1 by contract (the floors give 32 cells on 60 rows, so
    # each blob shatters across cells — only co-assigned pairs emerge);
    # the operator must still surface real pairs, never invented ones
    assert len(scoped) > 0


@pytest.mark.slow
def test_kmeans_bench_scale(spark):
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    out = kmeans_assign(emb, k=8, iters=2)
    n = out.count()
    assert n == emb.count()
    sizes = [r["count"] for r in out.groupBy("cluster_id").count().collect()]
    assert len(sizes) >= 2


def test_pq_topk_exact_on_cluster_copies(spark):
    """Corpus of exact copies of two prototype vectors: after one
    Lloyd round each subspace codebook contains the prototypes
    exactly, so asymmetric distance equals the true distance — approx
    == exact for every returned neighbor, copies of the query rank
    first with distance 0, and ranks are contiguous from 1."""
    from omop_etl_spark.operators.similarity import pq_topk

    a = [0.0] * 8
    b = [1.0] * 8
    rows = [(i, a if i % 2 == 0 else b) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_topk(df, dim=8, m=2, k=2, train_iters=1, topk=6).collect()
    assert [r["rank"] for r in out] == list(range(1, 7))
    for r in out:
        assert r["approx_dist_sq"] == r["exact_dist_sq"]
    # the 5 other copies of the query prototype come first, at 0
    zeros = [r for r in out if r["approx_dist_sq"] == 0]
    assert {r["vec_id"] for r in zeros} == {2, 4, 6, 8, 10}


def test_pq_topk_orders_by_approx_distance(spark):
    """Distinct vectors along one axis: approximate ordering must be
    monotone in approx_dist_sq and deterministic on ties (vec_id)."""
    from omop_etl_spark.operators.similarity import pq_topk

    rows = [(i, [float(i)] * 8) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_topk(df, dim=8, m=4, k=4, train_iters=2, topk=9).collect()
    dists = [r["approx_dist_sq"] for r in out]
    assert dists == sorted(dists)
    assert len(out) == 9 and 0 not in [r["vec_id"] for r in out]


def test_kmeans_two_level_k2_exceeding_cell_size(spark):
    """Cells smaller than k2 seed only what they have; every vector
    still gets an assignment and composite ids stay disjoint."""
    from omop_etl_spark.operators.kmeans import kmeans_assign_two_level

    df = _blobs(spark, per=2)  # 6 vectors, k1=3 cells of ~2
    out = kmeans_assign_two_level(df, k1=3, k2=5, iters=2, scale=1000)
    rows = out.collect()
    assert len(rows) == 6
    assert len({r["vec_id"] for r in rows}) == 6
    assert all(0 <= r["cluster_id"] < 15 for r in rows)


def test_kmeans_two_level_rejects_bad_k(spark):
    from omop_etl_spark.operators.kmeans import kmeans_assign_two_level

    df = _blobs(spark, per=2)
    for k1, k2 in [(0, 4), (4, 0), (-1, 2)]:
        with pytest.raises(ValueError):
            kmeans_assign_two_level(df, k1=k1, k2=k2)


def test_scoped_cosine_pairs_oversized_cell_star_link(spark):
    """A dup blob bigger than max_cell star-links to the hub: pair
    count is linear (n-1, not n(n-1)/2), every member still appears,
    connected components recover ONE group, and scores stay exact."""
    from omop_etl_spark.operators.cluster import assign_clusters
    from omop_etl_spark.operators.similarity import scoped_cosine_pairs

    n = 40
    vec = [1.0, 0.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [(i, vec) for i in range(n)], "vec_id long, embedding array<double>"
    )
    pairs = scoped_cosine_pairs(
        df, threshold=0.9, k=1, iters=1, max_cell=10
    ).collect()
    # star: hub = min id = 0, one pair per other member
    assert len(pairs) == n - 1
    assert all(r["id_a"] == 0 and r["score"] == 1.0 for r in pairs)
    assert {r["id_b"] for r in pairs} == set(range(1, n))
    cl = assign_clusters(
        df,
        scoped_cosine_pairs(df, threshold=0.9, k=1, iters=1, max_cell=10),
        id_col="vec_id",
    ).collect()
    assert {r["cluster_id"] for r in cl} == {0}
    assert sum(r["is_survivor"] for r in cl) == 1
    # at-or-under the cap: all-pairs behavior unchanged
    full = scoped_cosine_pairs(
        df, threshold=0.9, k=1, iters=1, max_cell=n
    ).count()
    assert full == n * (n - 1) // 2
    # ADVICE r12: the explicit-k (calibration) path defaults to NO cap
    # — same all-pairs count without naming max_cell at all
    assert (
        scoped_cosine_pairs(df, threshold=0.9, k=1, iters=1).count() == full
    )


def test_scoped_cosine_pairs_bad_max_cell_raises_before_work(spark):
    """ADVICE r12: an invalid max_cell must raise up front, before the
    count/kmeans pass runs (the old check sat after the clustering)."""
    from omop_etl_spark.operators.similarity import scoped_cosine_pairs

    # a frame whose evaluation would EXPLODE if any job ran — the
    # validation must fire without triggering it
    df = spark.range(1).selectExpr(
        "id AS vec_id",
        "array(CAST(assert_true(false) IS NULL AS DOUBLE)) AS embedding",
    )
    # -1 included (ADVICE r13): the AUTO sentinel is a private object
    # now, so EVERY integer < 2 raises uniformly — no magic int value
    # silently selects the default-cap policy
    for bad in (1, 0, -1, -5):
        with pytest.raises(ValueError, match="max_cell"):
            scoped_cosine_pairs(df, threshold=0.5, k=2, max_cell=bad)


def test_scoped_cosine_pairs_explicit_k_uncapped_warns(spark):
    """ADVICE r13: the explicit-k path resolving the default cap to
    None (the r13 contract change from a 4096 cap) must be loud at the
    call site — existing explicit-k callers at scale silently regain
    O(cell^2) pair work otherwise. Passing max_cell explicitly, or
    using the self-scaling k=None path, stays silent."""
    import warnings

    from omop_etl_spark.operators.similarity import scoped_cosine_pairs

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    with pytest.warns(UserWarning, match="NO oversized-cell cap"):
        scoped_cosine_pairs(df, threshold=0.9, k=1, iters=1).count()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        # explicit cap on the explicit-k path: no warning
        scoped_cosine_pairs(
            df, threshold=0.9, k=1, iters=1, max_cell=10
        ).count()
        # self-scaling path (cap resolves to 4096): no warning
        scoped_cosine_pairs(df, threshold=0.9, iters=1).count()
