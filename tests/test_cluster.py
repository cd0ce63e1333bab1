"""Connected components / cluster assignment: equivalence with a
driver-side union-find on random graphs, long-chain convergence, and
survivor semantics."""

import random

import pytest
from pyspark.sql import functions as F

from omop_etl_spark.operators.cluster import assign_clusters, connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _cc_map(df):
    return {r["id"]: r["component"] for r in df.collect()}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_cc_matches_union_find_random(spark, seed):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(120), rng.randrange(120)) for _ in range(150)
    ]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = _cc_map(connected_components(df))
    want = _union_find([(a, b) for a, b in edges if a != b])
    assert got == want


def test_cc_long_chain_converges_fast(spark):
    # a 200-node path has diameter 199: naive min-propagation needs
    # ~200 rounds; large/small-star must finish well under the cap.
    chain = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(chain, "id_a bigint, id_b bigint")
    got = _cc_map(connected_components(df, max_iterations=12))
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_cc_self_loops_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, None), (None, 3), (4, 5)],
        "id_a bigint, id_b bigint",
    )
    got = _cc_map(connected_components(df))
    # only the real edge contributes; 1/2/3 are isolated (absent)
    assert got == {4: 4, 5: 4}
    empty = df.filter(F.lit(False))
    assert connected_components(empty).count() == 0


def test_assign_clusters_survivors(spark):
    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(1, 5), (5, 7), (2, 3)], "id_a bigint, id_b bigint"
    )
    out = assign_clusters(nodes, pairs)
    rows = {r["doc_id"]: (r["cluster_id"], r["is_survivor"]) for r in out.collect()}
    assert rows == {
        0: (0, 1), 4: (4, 1), 6: (6, 1),          # isolated: own survivor
        1: (1, 1), 5: (1, 0), 7: (1, 0),          # cluster min 1 survives
        2: (2, 1), 3: (2, 0),
    }
    assert out.filter("is_survivor = 1").count() == 5


def test_cc_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    out = connected_components(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
