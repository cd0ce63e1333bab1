"""Deterministic, distributed surrogate-id assignment.

The reference relies on a Postgres ``serial`` column: ids are sequential
in insertion order, which is scan-order-dependent and therefore
nondeterministic in the reference itself (generation.py:103,
schema.py:316-329). We define a *stronger* contract: the surrogate id
is the 1-based global rank of the row under ``ORDER BY order_cols``
(for mapping frames: source index, then each source's natural-key
columns). Deterministic ids make oracle comparisons and reruns stable —
a deliberate, documented deviation (SURVEY §4.3).

Scale design: a naive ``row_number() OVER (ORDER BY …)`` collapses to a
single partition — unusable at 100 TB. Instead:

1. range-repartition by the order columns (boundaries respect the sort
   order, so global rank is partition-boundary-independent),
2. rank locally per partition (``row_number`` partitioned by
   ``spark_partition_id`` — fully parallel),
3. compute per-partition row counts (a tiny ≤num-partitions frame),
   turn them into exclusive prefix sums with a single-partition window
   over that tiny frame, and broadcast-join the offsets back.

Every step is distributed over the data; the only single-partition work
touches one row per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_surrogate_id"]


def with_surrogate_id(
    df: DataFrame,
    order_cols: list[str | Column],
    id_col: str = "id",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = global 1-based rank of the row under
    ``ORDER BY order_cols`` (ascending, NULLS FIRST — Spark default).

    Rows whose order columns tie receive distinct but arbitrarily
    assigned consecutive ids (identical full rows are interchangeable;
    callers wanting full determinism must pass a unique ordering).
    """
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *order_cols)
    else:
        ranged = df.repartitionByRange(*order_cols)
    pid = ranged.withColumn("__sid_pid", F.spark_partition_id())

    counts = pid.groupBy("__sid_pid").agg(F.count(F.lit(1)).alias("__sid_cnt"))
    # exclusive prefix sum over ≤num_partitions rows — the window is
    # single-partition but its input is one row per data partition
    w_off = (
        Window.orderBy("__sid_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__sid_pid",
        F.coalesce(F.sum("__sid_cnt").over(w_off), F.lit(0)).alias("__sid_off"),
    )

    w_local = Window.partitionBy("__sid_pid").orderBy(*order_cols)
    out = (
        pid.join(F.broadcast(offsets), "__sid_pid")
        .withColumn(
            id_col,
            (F.row_number().over(w_local) + F.col("__sid_off") + F.lit(start - 1)).cast(
                "bigint"
            ),
        )
        .drop("__sid_pid", "__sid_off")
    )
    return out
