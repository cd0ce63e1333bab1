"""Off-SF oracle check for the SELF-SCALING embed gates (VERDICT r14
#5 follow-through).

`embed_dedup_clusters` / `embed_semdedup` derive their cell structure
from the data — ``(k1, k2) = two_level_k(count)`` — so the registry's
STATIC oracle SQL (pinned at the driver's sf0.01, n=500 → (8, 4)) is
only exact at that SF: at any other SF the gates cluster with the
pair ``two_level_k`` derives there (e.g. (12, 12) at sf1's n=20000)
and the pinned replay diverges BY DESIGN, not by defect. This script runs the
registry gate UNCHANGED and rebuilds its oracle through the
parameterized generators (`_oracle_embed_dedup_clusters(k1, k2)` /
`_oracle_embed_semdedup(k1, k2)`) with the pair the gate itself will
derive at the target SF, then compares with the driver protocol (row
count + column names + canonical dtypes + order-insensitive values).

Usage: python scripts/check_sf1_embed.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from scripts.check_correctness import compare  # driver-protocol compare

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / "testdata_sf1"
    )
    from omop_etl_spark.conf import apply_recommended
    from omop_etl_spark.operators.kmeans import two_level_k

    spark = (
        apply_recommended(SparkSession.builder.master("local[16]"), 16)
        .config("spark.sql.warehouse.dir", "/tmp/sf1embed-wh")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )

    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    k1, k2 = two_level_k(n)
    print(f"# n={n} -> two_level_k = ({k1}, {k2})", file=sys.stderr)

    checks = {
        "embed_dedup_clusters": (
            entrymod._q_embed_dedup_clusters,
            entrymod._oracle_embed_dedup_clusters(k1=k1, k2=k2),
        ),
        "embed_semdedup": (
            entrymod._q_embed_semdedup,
            entrymod._oracle_embed_semdedup(k1=k1, k2=k2),
        ),
    }
    failed = 0
    for name, (fn, sql) in checks.items():
        ok, _ = compare(name, fn(spark, sf_dir), con.sql(sql))
        failed += 0 if ok else 1
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
