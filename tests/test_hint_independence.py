"""Correctness is hint-independent (VERDICT r6 #7).

With ``spark.sql.autoBroadcastJoinThreshold = -1`` Spark is forbidden
from choosing a stats-based broadcast join, so every join in the plan
runs as a shuffle join unless a *forced* hint overrides it. Running
the formerly-hinted gate queries in that mode and matching the DuckDB
oracle value-for-value proves two things at once: (a) no forced
broadcast hint survives in these plans (the r6 offenders would still
broadcast and the plan assertion would catch them), and (b) the query
results do not depend on the join strategy AQE picks — the exact
situation at 100 TB where the formerly-broadcast sides no longer fit.
"""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
from check_correctness import norm_rows  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

# the two heaviest r6 hint offenders, per VERDICT r6 #7
CASES = ["agg_top_customers", "agg_small_qty_revenue"]


@pytest.fixture(scope="module")
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.mark.parametrize("name", CASES)
def test_shuffle_only_plan_matches_oracle(no_broadcast, name):
    import __spark_entry__ as e

    spark = no_broadcast
    df = e.queries()[name](spark, SF_DIR)
    # threshold -1 disables stats-based broadcast; a BroadcastHashJoin
    # in the initial physical plan can only come from a forced hint.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan.replace(
        "AdaptiveSparkPlan", ""
    ), f"{name}: forced broadcast hint present"

    s_cols = [c.lower() for c in df.columns]
    s_rows = [tuple(r) for r in df.collect()]

    con = duckdb.connect()
    for t in e.TPCH_TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    rel = con.sql(e.oracle_sql()[name])
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()
    con.close()

    sc, sr = norm_rows(s_cols, s_rows)
    dc, dr = norm_rows(d_cols, d_rows)
    assert sc == dc
    assert sr == dr, f"{name}: values differ under shuffle-only planning"
