"""Recommended Spark session configuration for this engine.

One place for the scale-relevant knobs so the CLI, bench, and user
sessions agree. Values are defaults, not mandates — callers override
via ``SparkSession.builder.config`` as usual.
"""

from __future__ import annotations

__all__ = ["recommended_conf", "apply_recommended"]


def recommended_conf(cores: int = 32) -> dict[str, str]:
    """Baseline config for the engine's workload shape.

    * AQE on (runtime re-plan, skew-join splitting, partition
      coalescing) — the engine relies on it for join strategy and
      post-shuffle sizing instead of hand-tuning per query.
    * ``shuffle.partitions`` starts at the core count; AQE coalesces
      down, and at cluster scale callers raise it to ~2-3x total cores
      so no post-shuffle partition exceeds executor memory.
    * 128 MiB scan partitions keep parquet splits task-sized.
    * Arrow enabled (pandas-UDF operators are Arrow-batched) with a
      bounded batch size so wide binary/multimodal rows cannot blow up
      a single batch.
    * Runtime bloom-filter join reduction stays at Spark defaults
      (enabled; application-side threshold 10 GiB): on a 100 TB fact
      scan joined to a selectively-filtered dimension, Spark builds a
      bloom filter over the dim's join keys and pushes
      ``might_contain`` into the fact scan — rows that cannot match
      never reach the shuffle. Inert at bench scale by design;
      plan-asserted in ``tests/test_plan_quality.py``.
    """
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(cores),
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.sql.parquet.compression.codec": "snappy",
    }


def apply_recommended(builder, cores: int = 32):
    """Fold :func:`recommended_conf` into a ``SparkSession.Builder``."""
    for k, v in recommended_conf(cores).items():
        builder = builder.config(k, v)
    return builder
