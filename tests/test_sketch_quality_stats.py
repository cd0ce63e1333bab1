"""Unit tests for the r06 operator families: KMV sketch, DQ rules,
weighted sampling, sweep-line concurrency, quantized covariance."""

import datetime as dt
import hashlib
import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from omop_etl_spark.operators.quality import DQRule, dq_profile
from omop_etl_spark.operators.sampling import weighted_sample
from omop_etl_spark.operators.sketches import kmv_distinct
from omop_etl_spark.operators.stats import quantized_covariance
from omop_etl_spark.operators.temporal import interval_concurrency


def _py_unit_hash(value, salt):
    h = hashlib.md5(f"{salt}|{value}".encode()).hexdigest()
    return int(h[:8], 16) / float(1 << 32)


# ---------------------------------------------------------------------------
# KMV


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=i % 10) for i in range(100)]
        + [Row(g="b", v=i % 3) for i in range(30)]
    )
    out = {
        r["g"]: r.asDict() for r in kmv_distinct(df, ["g"], "v", k=64).collect()
    }
    assert out["a"]["est_distinct"] == 10 and out["a"]["n_kept"] == 10
    assert out["b"]["est_distinct"] == 3 and out["b"]["n_kept"] == 3


def test_kmv_matches_python_reference_and_error_bound(spark):
    n_true = 5000
    k = 128
    df = spark.createDataFrame([Row(g="g", v=i) for i in range(n_true)])
    row = kmv_distinct(df, ["g"], "v", k=k).collect()[0]
    # exact replay: k-th smallest md5 hash in pure Python
    hashes = sorted(_py_unit_hash(i, "kmv") for i in range(n_true))
    h_k = hashes[k - 1]
    assert row["n_kept"] == k
    assert row["kth_hash_q"] == math.floor(h_k * (1 << 32))
    assert row["est_distinct"] == math.floor((k - 1) / h_k)
    # KMV relative-error bound ~1/sqrt(k-2); allow 5 sigma
    rel = abs(row["est_distinct"] - n_true) / n_true
    assert rel < 5.0 / math.sqrt(k - 2)


def test_kmv_rejects_bad_k(spark):
    df = spark.createDataFrame([Row(g="g", v=1)])
    with pytest.raises(ValueError):
        kmv_distinct(df, ["g"], "v", k=1)


# ---------------------------------------------------------------------------
# DQ rules


def test_dq_profile_counts(spark):
    child = spark.createDataFrame(
        [
            Row(id=1, status="O", amount=10.0, ref=1),
            Row(id=1, status="X", amount=-5.0, ref=2),
            Row(id=2, status=None, amount=None, ref=99),
            Row(id=3, status="F", amount=3.0, ref=None),
        ]
    )
    parent = spark.createDataFrame([Row(pid=1), Row(pid=2)])
    rules = [
        DQRule("status_domain", "child", "in_set", "status", values=("O", "F")),
        DQRule("amount_range", "child", "range", "amount", lo=0.0),
        DQRule("status_not_null", "child", "not_null", "status"),
        DQRule("id_unique", "child", "unique", "id"),
        DQRule("ref_fk", "child", "fk", "ref", ref_table="parent", ref_col="pid"),
    ]
    out = {
        r["rule_name"]: r.asDict()
        for r in dq_profile({"child": child, "parent": parent}, rules).collect()
    }
    assert len(out) == 5
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["status_domain"]["n_violations"] == 2  # 'X' and NULL
    assert out["amount_range"]["n_violations"] == 2  # -5.0 and NULL
    assert out["status_not_null"]["n_violations"] == 1
    assert out["id_unique"]["n_violations"] == 2  # both id=1 rows
    assert out["ref_fk"]["n_violations"] == 1  # ref=99 (NULL exempt)
    assert out["ref_fk"]["passed"] == 0
    clean = [r for r in out.values() if r["n_violations"] == 0]
    assert all(r["passed"] == 1 for r in clean)


def test_dq_profile_validates_input(spark):
    df = spark.createDataFrame([Row(a=1)])
    with pytest.raises(ValueError):
        dq_profile({"t": df}, [])
    with pytest.raises(KeyError):
        dq_profile({"t": df}, [DQRule("r", "missing", "not_null", "a")])
    with pytest.raises(ValueError):
        dq_profile({"t": df}, [DQRule("r", "t", "bogus", "a")]).collect()


# ---------------------------------------------------------------------------
# weighted sampling


def test_weighted_sample_deterministic_and_biased(spark):
    rows = [Row(doc_id=i, w=(1000 if i < 50 else 1)) for i in range(2000)]
    df = spark.createDataFrame(rows)
    s1 = sorted(r["doc_id"] for r in weighted_sample(df, 100, "w").collect())
    s2 = sorted(r["doc_id"] for r in weighted_sample(df, 100, "w").collect())
    assert s1 == s2 and len(s1) == 100
    # the 50 heavy rows carry ~96% of total weight; nearly all should be in
    heavy = sum(1 for d in s1 if d < 50)
    assert heavy >= 40


def test_weighted_sample_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, w=0), Row(doc_id=2, w=-3), Row(doc_id=3, w=5)]
    )
    out = [r["doc_id"] for r in weighted_sample(df, 10, "w").collect()]
    assert out == [3]


# ---------------------------------------------------------------------------
# interval concurrency


def _brute_concurrency(rows, minutes):
    by_key = {}
    for k, t in rows:
        by_key.setdefault(k, []).append(t)
    out = {}
    for k, starts in by_key.items():
        bounds = [(t, 1) for t in starts] + [
            (t + dt.timedelta(minutes=minutes), -1) for t in starts
        ]
        bounds.sort()
        run = best = 0
        for _, d in bounds:
            run += d
            best = max(best, run)
        out[k] = (len(starts), best)
    return out


def test_interval_concurrency_matches_bruteforce(spark):
    rng = random.Random(7)
    base = dt.datetime(2024, 3, 1)
    rows = [
        (rng.choice("abc"), base + dt.timedelta(minutes=rng.randrange(0, 60 * 72)))
        for _ in range(500)
    ]
    df = spark.createDataFrame([Row(k=k, ts=t) for k, t in rows])
    got = {
        r["k"]: (r["n_intervals"], r["max_concurrent"])
        for r in interval_concurrency(df, "k", "ts", "30 MINUTES").collect()
    }
    assert got == _brute_concurrency(rows, 30)


def test_interval_concurrency_crosses_bucket_boundary(spark):
    # two intervals overlapping only across midnight: carry-in offsets
    # must propagate the open interval into the next day's bucket
    base = dt.datetime(2024, 3, 1, 23, 50)
    df = spark.createDataFrame(
        [Row(k="x", ts=base), Row(k="x", ts=base + dt.timedelta(minutes=15))]
    )
    row = interval_concurrency(df, "k", "ts", "30 MINUTES").collect()[0]
    assert row["max_concurrent"] == 2


# ---------------------------------------------------------------------------
# quantized covariance


def test_quantized_covariance_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    x = rng.normal(size=(40, 6)).astype(np.float32)
    df = spark.createDataFrame(
        [Row(embedding=[float(v) for v in row]) for row in x]
    ).repartition(5)
    out = quantized_covariance(df, "embedding", shift=14).collect()
    assert len(out) == 6 * 7 // 2
    q = np.floor(x.astype(np.float64) * (1 << 14)).astype(np.int64)
    n = q.shape[0]
    for r in out:
        i, j = r["i"], r["j"]
        assert i <= j
        assert r["n"] == n
        assert r["s_i"] == int(q[:, i].sum())
        assert r["s_j"] == int(q[:, j].sum())
        assert r["s_ij"] == int((q[:, i] * q[:, j]).sum())
        num = n * r["s_ij"] - r["s_i"] * r["s_j"]
        assert r["cov_scaled"] == num // n  # python // is floor division


def test_kmv_skewed_heavy_hitter(spark):
    # one value repeated 50k times must not distort the estimate: the
    # (group, hash) pre-dedup collapses it map-side to a single hash
    rows = [Row(g="g", v=0)] * 50_000 + [Row(g="g", v=i) for i in range(1, 1000)]
    df = spark.createDataFrame(rows).repartition(8)
    row = kmv_distinct(df, ["g"], "v", k=128).collect()[0]
    rel = abs(row["est_distinct"] - 1000) / 1000.0
    assert rel < 5.0 / math.sqrt(126)


@pytest.mark.slow
def test_kmv_accuracy_at_bench_scale(spark):
    # sf0.1 events: per-type estimate within the theoretical error
    # bound of the exact distinct count
    from omop_etl_spark.sources import read_parquet_table

    ev = read_parquet_table(
        spark, "/root/testdata/sf0.1/events.parquet", ns_columns=["ts"]
    )
    est = {
        r["event_type"]: r["est_distinct"]
        for r in kmv_distinct(ev, ["event_type"], "user_id", k=256).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        if n >= 256:
            assert abs(est[t] - n) / n < 5.0 / math.sqrt(254)
        else:
            assert est[t] == n


# ---------------------------------------------------------------------------
# exact quantile cuts


def test_exact_quantile_cuts_bucketed_equals_plain_and_reference(spark):
    import random

    from omop_etl_spark.operators.stats import exact_quantile_cuts

    rng = random.Random(5)
    rows = [
        Row(g=g, v=rng.randrange(0, 10_000))
        for g in ("a", "b")
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows).repartition(9)
    qs = [0.01, 0.5, 0.99]
    plain = {
        r["g"]: (r["n"], r["q_p01"], r["q_p5"], r["q_p99"])
        for r in exact_quantile_cuts(df, ["g"], "v", qs).collect()
    }
    bucketed = {
        r["g"]: (r["n"], r["q_p01"], r["q_p5"], r["q_p99"])
        for r in exact_quantile_cuts(df, ["g"], "v", qs, bucket_width=500).collect()
    }
    assert plain == bucketed
    # count_col path: feeding the pre-aggregated (group, value, count)
    # spine must give the same cuts as the raw rows — the weighted-rank
    # identity the events_anomaly_mad / events_winsorize gates rely on
    spine = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    weighted = {
        r["g"]: (r["n"], r["q_p01"], r["q_p5"], r["q_p99"])
        for r in exact_quantile_cuts(
            spine, ["g"], "v", qs, count_col="c"
        ).collect()
    }
    assert plain == weighted
    bucketed_weighted = {
        r["g"]: (r["n"], r["q_p01"], r["q_p5"], r["q_p99"])
        for r in exact_quantile_cuts(
            spine, ["g"], "v", qs, bucket_width=500, count_col="c"
        ).collect()
    }
    assert plain == bucketed_weighted
    # reference: lower-value quantile definition on sorted values
    for g in ("a", "b"):
        vals = sorted(r.v for r in rows if r.g == g)
        n = len(vals)
        want = tuple(vals[int((n - 1) * q)] for q in qs)
        assert plain[g] == (n, *want)


def test_kmv_set_similarity_tracks_true_jaccard(spark):
    from omop_etl_spark.operators.sketches import kmv_set_similarity

    # two groups with known 50% overlap, one disjoint group
    rows = (
        [Row(g="a", v=i) for i in range(0, 2000)]
        + [Row(g="b", v=i) for i in range(1000, 3000)]  # J(a,b) = 1/3
        + [Row(g="c", v=i) for i in range(10_000, 11_000)]  # disjoint
    )
    df = spark.createDataFrame(rows).repartition(6)
    out = {
        (r["g_a"], r["g_b"]): r["jaccard_ppm"] / 1e6
        for r in kmv_set_similarity(df, "g", "v", k=256).collect()
    }
    assert abs(out[("a", "b")] - 1 / 3) < 0.12  # ~5/sqrt(k) tolerance
    assert out[("a", "c")] == 0.0 and out[("b", "c")] == 0.0
    # estimator is a pure function of the data: rerun identical
    again = {
        (r["g_a"], r["g_b"]): r["jaccard_ppm"] / 1e6
        for r in kmv_set_similarity(df, "g", "v", k=256).collect()
    }
    assert out == again


# ---------------------------------------------------------------------------
# count-min sketch


def test_cm_estimate_upper_bounds_and_hits_exact_when_sparse(spark):
    from pyspark.sql import Row

    from omop_etl_spark.operators.sketches import cm_estimate, cm_sketch_counts

    rows = [Row(v=f"t{i % 20}") for i in range(1000)]
    df = spark.createDataFrame(rows)
    sk = cm_sketch_counts(df, "v", depth=4, width=256)
    probes = spark.createDataFrame([Row(v=f"t{i}") for i in range(20)] + [Row(v="absent")])
    est = {r.v: r.est_count for r in cm_estimate(sk, probes, "v", depth=4, width=256).collect()}
    exact = {f"t{i}": 50 for i in range(20)}
    # CM never underestimates; with 20 values in 256 buckets collisions
    # are rare, so most estimates are exact
    assert all(est[k] >= v for k, v in exact.items())
    assert sum(1 for k, v in exact.items() if est[k] == v) >= 15
    assert est["absent"] >= 0  # upper bound only


def test_cm_sketch_count_col_equals_row_stream(spark):
    """The count_col path (pre-aggregated (value, count) spine) must
    build the IDENTICAL sketch as the row-per-occurrence stream —
    cells are sums over the multiset, the identity the
    sketch_term_counts gate's single-tokenize rewrite relies on."""
    from pyspark.sql import Row

    from pyspark.sql import functions as F

    from omop_etl_spark.operators.sketches import cm_sketch_counts

    rows = [Row(v=f"t{i % 17}") for i in range(600)]
    df = spark.createDataFrame(rows)
    spine = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    per_row = sorted(map(tuple, cm_sketch_counts(df, "v").collect()))
    weighted = sorted(
        map(tuple, cm_sketch_counts(spine, "v", count_col="c").collect())
    )
    assert per_row == weighted


def test_cm_sketch_partition_order_independent(spark):
    from pyspark.sql import Row

    from omop_etl_spark.operators.sketches import cm_sketch_counts

    rows = [Row(v=f"x{i % 13}") for i in range(500)]
    a = spark.createDataFrame(rows).repartition(13)
    b = spark.createDataFrame(list(reversed(rows))).repartition(2)
    sa = sorted(map(tuple, cm_sketch_counts(a, "v").collect()))
    sb = sorted(map(tuple, cm_sketch_counts(b, "v").collect()))
    assert sa == sb


def test_logq_sketch_error_bound_and_bucket_membership(spark):
    """Every estimated quantile is the lower bound of the bucket
    holding the true quantile: est <= exact < est * (1 + 2^-m) + 1,
    on a skewed random value set."""
    import random as _random

    from omop_etl_spark.operators.sketches import (
        logq_buckets,
        logq_quantiles,
    )

    rng = _random.Random(7)
    vals = [int(rng.lognormvariate(5, 1.5)) + 1 for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = logq_buckets(df, [], "v", m=5)
    est = logq_quantiles(sk, [], [(1, 2), (99, 100)], m=5).collect()[0]
    assert est["n"] == len(vals)
    svals = sorted(vals)
    for col, num, den in (("q1_2", 1, 2), ("q99_100", 99, 100)):
        exact = svals[(num * (len(vals) - 1)) // den]
        got = est[col]
        assert got <= exact, (col, got, exact)
        # relative bucket width: lb * (1 + 2^-5) bounds the bucket top
        assert exact <= got * (1 + 1 / 32) + 1, (col, got, exact)


def test_logq_sketch_merges_by_sum(spark):
    """Sketch of a union == per-bucket SUM of the parts' sketches —
    the property that makes it a sketch, not just a histogram."""
    from pyspark.sql import functions as F

    from omop_etl_spark.operators.sketches import logq_buckets

    a = spark.createDataFrame([(v,) for v in range(1, 500)], "v long")
    b = spark.createDataFrame([(v,) for v in range(200, 900)], "v long")
    both = a.unionAll(b)
    merged = (
        logq_buckets(a, [], "v")
        .unionAll(logq_buckets(b, [], "v"))
        .groupBy("bucket")
        .agg(F.sum("c").alias("c"))
    )
    want = sorted(map(tuple, logq_buckets(both, [], "v").collect()))
    got = sorted(map(tuple, merged.collect()))
    assert got == want


def test_logq_sketch_drops_nonpositive(spark):
    from omop_etl_spark.operators.sketches import logq_buckets

    df = spark.createDataFrame([(-3,), (0,), (1,)], "v long")
    out = logq_buckets(df, [], "v").collect()
    assert len(out) == 1 and out[0]["c"] == 1


# ---------------------------------------------------------------------------
# KMV theta A-NOT-B difference (round 11)


def test_kmv_difference_exact_when_partial(spark):
    """Both sketches partial (distinct < k) => theta = 1 and the
    estimate IS the exact |A \\ B| / |B \\ A|."""
    from omop_etl_spark.operators.sketches import kmv_difference

    rows = [("a", v) for v in range(50)] + [("b", v) for v in range(30, 80)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {(r.g_a, r.g_b): r for r in kmv_difference(df, "g", "v", k=128).collect()}
    assert out[("a", "b")].est_diff == 30  # {0..29}
    assert out[("b", "a")].est_diff == 30  # {50..79}
    assert out[("a", "b")].theta_q == 1 << 32
    assert out[("a", "b")].diff_kept == 30


def test_kmv_difference_estimates_with_error_bound(spark):
    """Full sketches: the A-NOT-B estimate lands within the standard
    ~1/sqrt(k) relative-error envelope (generous 5-sigma)."""
    from omop_etl_spark.operators.sketches import kmv_difference

    n, overlap, k = 4000, 2500, 256
    rows = [("a", v) for v in range(n)] + [
        ("b", v) for v in range(n - overlap, 2 * n - overlap)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {(r.g_a, r.g_b): r for r in kmv_difference(df, "g", "v", k=k).collect()}
    true_diff = n - overlap
    for pair in (("a", "b"), ("b", "a")):
        est = out[pair].est_diff
        assert abs(est - true_diff) <= 5 * true_diff / math.sqrt(k) + 5, (pair, est)


def test_kmv_difference_zero_pairs_emitted(spark):
    from omop_etl_spark.operators.sketches import kmv_difference

    rows = [("a", v) for v in range(20)] + [("b", v) for v in range(20)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {(r.g_a, r.g_b): r.est_diff for r in kmv_difference(df, "g", "v").collect()}
    assert out == {("a", "b"): 0, ("b", "a"): 0}


# ---------------------------------------------------------------------------
# interval_union (round 11)


def _brute_union(intervals):
    """islands by sweep: returns (n_islands, covered, max_island)."""
    ivs = sorted(intervals)
    islands = []
    for s, e in ivs:
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    lens = [e - s for s, e in islands]
    return (len(islands), sum(lens), max(lens))


def test_interval_union_hand_computed(spark):
    from omop_etl_spark.operators.temporal import interval_union

    rows = [
        # key u: [0,10) [5,15) [15,20) merge (touching merges); [30,40) alone
        ("u", 0, 10), ("u", 5, 15), ("u", 15, 20), ("u", 30, 40),
        # key v: nested interval swallowed
        ("v", 0, 100), ("v", 10, 20),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {r.k: (r.n_islands, r.covered, r.max_island)
           for r in interval_union(df, "k", "s", "e").collect()}
    assert got["u"] == (2, 30, 20)
    assert got["v"] == (1, 100, 100)


def test_interval_union_two_level_matches_single(spark):
    """bucket_width path is exactly the single-window answer, including
    islands that span bucket boundaries and carry-forward ends that
    cover whole later buckets."""
    from omop_etl_spark.operators.temporal import interval_union

    rng = random.Random(11)
    rows = []
    for k in ("x", "y"):
        for _ in range(300):
            s = rng.randrange(0, 10_000)
            rows.append((k, s, s + rng.randrange(1, 800)))
        # one giant interval covering many buckets
        rows.append((k, 500, 9_000))
    df = spark.createDataFrame(rows, "k string, s long, e long")
    single = {tuple(r) for r in interval_union(df, "k", "s", "e").collect()}
    two = {tuple(r) for r in
           interval_union(df, "k", "s", "e", bucket_width=1000).collect()}
    assert single == two
    # and both equal the brute-force sweep
    by_key = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    brute = {(k, *_brute_union(v)) for k, v in by_key.items()}
    assert single == brute
