"""Round-8 batch-1 operators: HyperLogLog sketch, NTILE-from-rank,
CUSUM change points, bigram surprisal.

Each test pins the property the oracle CAN'T see: mergeability of HLL
registers, NTILE parity with Spark's own window function, brute-force
agreement for CUSUM, and hand-computed surprisal on a tiny corpus.
"""

import math
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from omop_etl_spark.operators.rank import ntile_from_rank
from omop_etl_spark.operators.sketches import hll_estimate, hll_registers
from omop_etl_spark.operators.temporal import cusum_changepoints


# ---------------------------------------------------------------- HLL
@pytest.fixture(scope="module")
def ids(spark):
    rng = random.Random(17)
    rows = [(rng.choice("ab"), rng.randrange(5000)) for _ in range(20000)]
    return rows, spark.createDataFrame(rows, "g string, v long")


def test_hll_registers_merge_with_max(spark, ids):
    """The scale contract: registers of a union are the element-wise
    MAX of the parts' registers — what lets partial sketches combine
    across executors (and micro-batches) without rescanning."""
    rows, df = ids
    # build from two arbitrary halves via a deterministic row split
    tagged = df.withColumn("half", (F.monotonically_increasing_id() % 2).cast("int"))
    r_parts = (
        hll_registers(tagged, ["g", "half"], "v")
        .groupBy("g", "bucket")
        .agg(F.max("register").alias("reg_merged"))
    )
    r_whole = hll_registers(df, ["g"], "v").withColumnRenamed("register", "reg_whole")
    diff = r_parts.join(r_whole, ["g", "bucket"], "full").where(
        F.col("reg_merged").isNull()
        | F.col("reg_whole").isNull()
        | (F.col("reg_merged") != F.col("reg_whole"))
    )
    assert diff.count() == 0


def test_hll_estimate_tracks_exact(spark, ids):
    rows, df = ids
    est = {
        r["g"]: r["est_micro"] / 1e6
        for r in hll_estimate(hll_registers(df, ["g"], "v"), ["g"]).collect()
    }
    exact = {}
    for g, v in rows:
        exact.setdefault(g, set()).add(v)
    for g, vs in exact.items():
        # b=12 -> ~1.6% standard error; allow 5 sigma
        assert abs(est[g] - len(vs)) / len(vs) < 0.10, (g, est[g], len(vs))


def test_hll_rejects_bad_b(spark, ids):
    _, df = ids
    with pytest.raises(ValueError):
        hll_registers(df, ["g"], "v", b=10)
    with pytest.raises(ValueError):
        hll_estimate(df, ["g"], b=3)


# ------------------------------------------------------- NTILE parity
@pytest.mark.parametrize("n,k", [(1, 5), (4, 5), (5, 5), (23, 5), (100, 7), (57, 10), (3, 1)])
def test_ntile_from_rank_matches_native(spark, n, k):
    df = spark.range(1, n + 1).select(F.col("id").alias("r"), F.lit(n).alias("n"))
    out = df.select(
        ntile_from_rank("r", "n", k).alias("mine"),
        F.ntile(k).over(Window.orderBy("r")).alias("native"),
    ).collect()
    assert all(row.mine == row.native for row in out)


def test_ntile_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        ntile_from_rank("r", "n", 0)


# ------------------------------------------------------------- CUSUM
def test_cusum_finds_injected_shift(spark):
    rows = [("a", t, 10) for t in range(1, 21)] + [("a", t, 30) for t in range(21, 36)]
    rng = random.Random(3)
    rows += [("b", t, rng.randint(0, 5)) for t in range(1, 26)]
    df = spark.createDataFrame(rows, "g string, t int, v long")
    got = {r["g"]: r.asDict() for r in cusum_changepoints(df, ["g"], "t", "v").collect()}
    # brute-force reference
    for g in ("a", "b"):
        vs = [v for (gg, _, v) in rows if gg == g]
        n, tot, pre, best = len(vs), sum(vs), 0, None
        for t, v in enumerate(vs, 1):
            pre += v
            dev = abs(n * pre - t * tot)
            if best is None or dev > best[1]:
                best = (t, dev)
        assert got[g]["cp_at"] == best[0]
        assert got[g]["cp_dev_scaled"] == best[1]
    # the injected shift in series "a" is found at its true boundary
    assert got["a"]["cp_at"] == 20


# -------------------------------------------------- bigram surprisal
def test_bigram_surprisal_hand_computed(spark):
    from omop_etl_spark.operators.chunking import bigram_surprisal_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in bigram_surprisal_scores(docs).collect()}
    # corpus bigrams: (a,b) x2, (b,a) x2  ->  p(b|a)=1, p(a|b)=1
    # doc 3 has no bigrams and drops out
    assert set(out) == {1, 2}
    assert out[1]["n_bigrams"] == 3 and out[2]["n_bigrams"] == 1
    # ln(1) = 0 -> all logprobs exactly 0
    assert out[1]["sum_lp_micro"] == 0 and out[2]["sum_lp_micro"] == 0


def test_bigram_surprisal_orders_matter(spark):
    """Transition-rare text scores lower than transition-frequent text
    built from the SAME unigrams — the property unigram perplexity
    cannot express."""
    from omop_etl_spark.operators.chunking import bigram_surprisal_scores

    common = " ".join(["the cat sat on the mat"] * 5)
    shuffled = " ".join(["mat the on sat cat the"] * 1)
    docs = spark.createDataFrame(
        [(1, common), (2, common), (3, shuffled)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["mean_logprob"] for r in bigram_surprisal_scores(docs).collect()}
    assert out[3] < out[1]
