"""Benchmark runner: times every headline query at the target scale.

Prints ONE JSON line:
``{"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}``

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from omop_etl_spark.conf import apply_recommended

    spark = (
        apply_recommended(
            SparkSession.builder.master(f"local[{cpus}]"), int(cpus)
        )
        .config("spark.sql.warehouse.dir", "/tmp/bench-wh")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("omop-etl-spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup outside the timings: JVM/codegen spin-up, parquet footer
    # reads, and the engine's one-time catalog registration are session
    # setup, not query latency
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    entrymod._engine(spark, sf_dir)
    for t in ("documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()

    def _identity(batches):
        yield from batches

    # spin up one python worker per core (Arrow UDF queries otherwise
    # pay interpreter+numpy import inside their first timed task)
    spark.range(256).repartition(int(cpus)).mapInPandas(
        _identity, "id long"
    ).count()

    # best-of-N per query: the host is shared and single runs swing
    # 2-4x with neighbor load; the minimum measures the engine
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        best, n = float("inf"), -1
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, round(time.perf_counter() - t0, 3))
        timings[name] = best
        print(f"# {name}: {timings[name]}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": f"total wall-clock of all declared queries (ETL pipelines + analytics + pipeline ops), best of {runs} runs per query",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
