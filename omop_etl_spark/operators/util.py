"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread"]


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure a corpus frame has at least ``defaultParallelism``
    partitions before a CPU-heavy per-row stage (tokenize, shingle,
    vector scoring).

    A small single-file parquet scan arrives as ONE input partition (a
    single row group cannot be split), which serializes the whole stage
    on one core — the dominant cost of the dedup operators at bench
    scale. The round-robin repartition is one narrow shuffle of the
    input projection, far cheaper than a serialized map stage; at real
    scale the scan already has >= parallelism partitions and this is a
    no-op (it never coalesces).
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
