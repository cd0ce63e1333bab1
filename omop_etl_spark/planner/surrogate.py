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
single partition — unusable at 100 TB. This implementation:

1. range-repartitions by the order columns into a PINNED partition
   count (pinning keeps AQE from re-coalescing, so the boundaries are
   identical when the plan is evaluated more than once) and sorts
   within partitions,
2. counts rows per partition with a column-pruned pass (the shuffle
   carries only the order columns; the aggregate is one row per
   partition, collected to the driver — partition-count scale, not
   data scale),
3. assigns ``id = prefix_offset[partition] + local_position`` in one
   order-preserving ``mapInPandas`` sweep — Arrow batches stream
   through in partition order, so the assignment is a counter, not a
   window, and needs NO additional exchange.

An earlier version used ``row_number() OVER (PARTITION BY
spark_partition_id())`` for step 3; that window's clustering
requirement forced Spark to insert a full hash exchange of the data
(plus a second range exchange on the counts branch) — four wide
shuffles where this needs one wide + one narrow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

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

    Note: computes the per-partition row counts eagerly (one
    column-pruned job); the returned frame is lazy.
    """
    from pyspark import StorageLevel

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    # persist is load-bearing, not a cache hint: range boundaries are
    # SAMPLED per plan instantiation, so the counts pass and the assign
    # pass must share one lineage (one partitioner) or rows silently
    # land in different partitions between the two passes
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    counts = (
        ranged.groupBy(F.spark_partition_id().alias("__p"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    by_pid = {r["__p"]: r["__c"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(by_pid):
        offsets[p] = acc
        acc += by_pid[p]

    schema = StructType(list(df.schema.fields) + [StructField(id_col, LongType(), False)])

    def assign(batches):
        import numpy as np
        from pyspark import TaskContext

        base = offsets.get(TaskContext.get().partitionId(), 0) + start
        pos = 0
        for pdf in batches:
            pdf[id_col] = np.arange(base + pos, base + pos + len(pdf), dtype="int64")
            pos += len(pdf)
            yield pdf

    return ranged.mapInPandas(assign, schema)
