"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ppm_div_sql", "spread"]


def ppm_div_sql(numerator: str, denominator: str) -> str:
    """SQL fragment for an EXACT integer parts-per-million share:
    ``floor(numerator * 1e6 / denominator)`` as BIGINT, with BOTH sides
    widened to DECIMAL(38,0) first.

    This exists because ``x * 1000000`` on a bare int64 aggregate wraps
    at ``x ~ 9.2e12`` — and corpus/revenue-scaled sums (revenue cents
    per region at ~$92 B, cumulative token counts of a 100-TB corpus,
    per-source character tallies) sit squarely inside that range. Under
    ANSI mode the wrap is a hard error while a HUGEINT-backed oracle
    (DuckDB) stays silently exact, so the failure only surfaces at
    scale (the r16 ``nation_revenue_share`` sf10 find). Widening costs
    nothing measurable: every caller applies it to an aggregate-sized
    output frame, never a per-row hot path.

    Either operand may itself be a product; pre-widen its first factor
    at the call site (``CAST(a AS DECIMAL(38,0)) * b``) so the product
    is computed in decimal — the outer cast here cannot un-wrap a
    product that already overflowed in int64.

    Decimal ``div`` truncates toward zero (matching DuckDB HUGEINT
    ``//``), which equals floor exactly on the NONNEGATIVE numerators
    every ppm share has — callers with signed numerators need the
    posmod floor spelling instead (see stats.quantized_covariance).
    """
    return (
        f"CAST(CAST({numerator} AS DECIMAL(38,0)) * 1000000 div "
        f"CAST({denominator} AS DECIMAL(38,0)) AS BIGINT)"
    )


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
