"""Deduplication operators for document-scale pipelines.

Exact dedup is a hash-shuffle groupBy on the (possibly normalized) key —
fully distributed, one shuffle, AQE-skew-safe. Near-dup variants
(MinHash-LSH, SimHash, n-gram Jaccard) build on the same primitives and
live alongside; all are DataFrame-native (no driver-side loops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exact_dedup", "dedup_groups"]


def _key_cols(df: DataFrame, keys: list[str | Column]) -> list[Column]:
    return [F.col(k) if isinstance(k, str) else k for k in keys]


def exact_dedup(
    df: DataFrame,
    keys: list[str | Column],
    tiebreak: list[str | Column] | None = None,
) -> DataFrame:
    """Keep exactly one row per distinct key tuple.

    ``tiebreak`` orders rows within a key group (ascending); the first
    row survives. Without a tiebreak the survivor is arbitrary (use
    ``dropDuplicates`` semantics). Implemented as a windowed
    ``row_number`` partitioned by the keys — a single hash shuffle,
    no global ordering, scales linearly.
    """
    kcols = _key_cols(df, keys)
    order = _key_cols(df, tiebreak) if tiebreak else [F.lit(1)]
    w = Window.partitionBy(*kcols).orderBy(*order)
    return (
        df.withColumn("__dd_rn", F.row_number().over(w))
        .filter(F.col("__dd_rn") == 1)
        .drop("__dd_rn")
    )


def dedup_groups(
    df: DataFrame,
    keys: list[str | Column],
    id_col: str = "doc_id",
) -> DataFrame:
    """Group-level dedup summary: one row per distinct key with the
    surviving (minimum) id and the duplicate count."""
    kcols = _key_cols(df, keys)
    return df.groupBy(*kcols).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )
