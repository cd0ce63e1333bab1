"""Stage decomposition of cust_recs_topk at the probe tiers (VERDICT
r14 #3: its 8.9x sf1→sf10 marginal is the steepest in the 100x set —
find WHICH stage grows).

Times four cut points cumulatively (each includes everything above
it, all through the noop sink so nothing is pruned):

  1. owned     — lineitem⋈orders + distinct (the ownership frame)
  2. sim       — cooccurrence_topk_similar model (per-basket pair
                 fan-out + count + per-item top-5)
  3. scored    — ownership⋈model + per-(cust, candidate) aggregate
  4. full      — anti-join + per-customer top-3 window (the gate)

Stage N's own cost ≈ t(N) - t(N-1) on a settled box. One run per
tier per stage (the probe protocol), clearCache between stages.

Usage: python scripts/decompose_recs.py [tier=dir ...]
Default tiers: sf1=<repo>/testdata_sf1 sf10=<repo>/testdata_sf10
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def build(spark: SparkSession, sf_dir: str, upto: str):
    from omop_etl_spark.operators.graph import cooccurrence_topk_similar

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("basket"), F.col("o_custkey").alias("cust")
    )
    owned = (
        li.join(orders, "basket").select("cust", "item").distinct()
        .localCheckpoint(eager=True)
    )
    if upto == "owned":
        return owned
    sim = cooccurrence_topk_similar(li, "basket", "item", k=5, min_pairs=2)
    if upto == "sim":
        return sim
    cand = (
        owned.join(sim.select("item", "other", "cos_ppm"), "item")
        .groupBy("cust", F.col("other").alias("rec"))
        .agg(
            F.sum("cos_ppm").cast("bigint").alias("score_ppm"),
            F.count(F.lit(1)).cast("bigint").alias("n_contrib"),
        )
    )
    if upto == "scored":
        return cand
    fresh = cand.join(
        owned.select("cust", F.col("item").alias("rec")),
        ["cust", "rec"],
        "left_anti",
    )
    w = Window.partitionBy("cust").orderBy(F.col("score_ppm").desc(), F.col("rec"))
    return (
        fresh.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


def main() -> None:
    repo = Path(__file__).resolve().parent.parent
    tiers = [t.partition("=")[::2] for t in sys.argv[1:]] or [
        ("sf1", str(repo / "testdata_sf1")),
        ("sf10", str(repo / "testdata_sf10")),
    ]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        load1_before = round(os.getloadavg()[0], 1)
    except OSError:
        load1_before = -1.0
    from omop_etl_spark.conf import apply_recommended

    spark = (
        apply_recommended(SparkSession.builder.master(f"local[{cpus}]"), int(cpus))
        .config("spark.sql.warehouse.dir", "/tmp/decomp-wh")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows = []
    for label, d in tiers:
        row: dict = {"tier": label}
        prev = 0.0
        for stage in ("owned", "sim", "scored", "full"):
            t0 = time.perf_counter()
            build(spark, d, stage).write.format("noop").mode("overwrite").save()
            t = round(time.perf_counter() - t0, 2)
            row[f"{stage}_cum_s"] = t
            row[f"{stage}_own_s"] = round(t - prev, 2)
            prev = t
            spark.catalog.clearCache()
        rows.append(row)
        print(f"# {label}: {row}", file=sys.stderr, flush=True)
    doc = {"cpus": int(cpus), "load1_before": load1_before, "rows": rows}
    print(json.dumps(doc, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
