"""Table reconciliation: snapshot diffs and order-insensitive checksums.

The reference validates ETL output with per-table SQL checks run inside
Postgres (the compiled script from /root/reference/omop_etl/__main__.py:34-92
over the shipped validation/*.yaml rules); at 100 TB the analogous
questions are "did this rerun produce the same table?" and "what
exactly changed between snapshot N and N+1?" — answered without ever
sorting or collecting a table:

* :func:`table_checksum` folds every row into one commutative integer
  signature (sum of per-row md5 hashes).  Addition is order- and
  partition-independent, so two engines/snapshots agree iff their
  multisets of rows agree (up to md5 collisions) — one map-side
  aggregate, a 1-row exchange, no sort.
* :func:`snapshot_diff` classifies rows across two snapshots as
  added / removed / changed / unchanged with ONE full-outer equi-join
  on the key.  Comparison uses the same row hash, so wide rows shuffle
  a key + 1 bigint, not every column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "row_signature",
    "table_checksum",
    "partition_checksums",
    "snapshot_diff",
    "diff_column_counts",
]


def row_signature(cols: Sequence[str], salt: str = "rowsig") -> Column:
    """Deterministic 60-bit integer signature of the named columns.

    Each column is encoded LENGTH-PREFIXED — ``len(v) ':' v`` for a
    value, the single token ``'n'`` for NULL — then the encodings are
    concatenated and hashed once: ``md5(salt|e1|e2|...)`` first 15 hex
    chars as a BIGINT.  The encoding is injective over the column
    tuple: each element self-describes where it ends, so values
    containing the delimiter (``('a|b','c')`` vs ``('a','b|c')``) or a
    literal NULL-sentinel string cannot produce another row's byte
    stream (a value encoding always starts ``digits ':'``, which the
    NULL token ``'n'`` never does).  One md5 per ROW — an earlier
    per-column-digest design was equally injective but 3x slower on
    wide tables.  Exact in int64, replayable in any engine with
    ``md5``/``length``.  Column order is the caller's contract: pass a
    sorted list when comparing across engines.
    """
    parts = [F.lit(salt)]
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            F.coalesce(
                F.concat(F.length(s).cast("string"), F.lit(":"), s),
                F.lit("n"),
            )
        )
    joined = F.concat_ws("|", *parts)
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("bigint")


def table_checksum(
    df: DataFrame, cols: Sequence[str] | None = None, salt: str = "rowsig"
) -> DataFrame:
    """One-row frame ``(n_rows, checksum)`` identifying the table's row
    multiset.

    The checksum is ``sum(row_signature) mod 2^60`` — commutative, so
    identical regardless of partitioning, task order, or engine.
    Signatures are < 2^60, so int64 would overflow after ~8 rows; the
    sum runs in decimal(38,0) (exact up to ~10^19 rows of worst-case
    magnitude) and is reduced mod 2^60 once at the end.
    """
    cols = list(cols) if cols is not None else sorted(df.columns)
    sig = row_signature(cols, salt)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(sig.cast("decimal(38,0)")) % F.lit(int(2**60)))
        .cast("bigint")
        .alias("checksum"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots sharing a key.

    Returns one row per key present in either snapshot:
    ``*keys, change_type`` where ``change_type`` is ``added`` (key only
    in ``new``), ``removed`` (only in ``old``), ``changed`` (both, any
    compare column differs), or ``unchanged``.

    Both sides are first projected to ``(keys, row hash)`` — the
    full-outer join therefore shuffles ~16 bytes per row however wide
    the table is, and the classification is a null-pattern CASE.
    Duplicate keys within a snapshot are not supported (enforce with
    :func:`~omop_etl_spark.operators.quality.dq_profile`'s ``unique``
    rule first); they would make 'changed' ill-defined.
    """
    keys = list(keys)
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(c for c in shared if c not in keys)
    else:
        compare_cols = list(compare_cols)

    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        row_signature(compare_cols).alias("__oh"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        row_signature(compare_cols).alias("__nh"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    change = (
        F.when(F.col("__oh").isNull(), F.lit("added"))
        .when(F.col("__nh").isNull(), F.lit("removed"))
        .when(F.col("__oh") != F.col("__nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out_keys = [
        F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k) for k in keys
    ]
    return j.select(*out_keys, change.alias("change_type"))


def partition_checksums(
    df: DataFrame,
    partition_cols: Sequence[str],
    cols: Sequence[str] | None = None,
    salt: str = "rowsig",
) -> DataFrame:
    """Per-partition row-multiset checksums: ``*partition_cols, n_rows,
    checksum`` — the incremental-validation primitive for partitioned
    100 TB tables.

    Comparing two snapshots' partition checksums (a tiny frame join)
    pinpoints WHICH partitions changed; :func:`snapshot_diff` then runs
    only on those partitions' rows instead of the whole table.  Same
    commutative md5-sum construction as :func:`table_checksum`, so the
    per-partition values are engine-replayable and independent of file
    layout within the partition.  One hash aggregate with map-side
    partials; output is |partitions| rows.
    """
    pcols = list(partition_cols)
    cols = (
        list(cols)
        if cols is not None
        else sorted(c for c in df.columns if c not in pcols)
    )
    sig = row_signature(cols, salt)
    return df.groupBy(*pcols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(sig.cast("decimal(38,0)")) % F.lit(int(2**60)))
        .cast("bigint")
        .alias("checksum"),
    )


def diff_column_counts(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """COLUMN-level drill-down of a snapshot diff: for keys present in
    BOTH snapshots, how many rows changed in each compared column —
    the "what actually changed" question :func:`snapshot_diff`'s
    row-level ``changed`` flag leaves open (is it a reprice sweep or a
    status migration?).

    Returns one row per compared column:
    ``(column, n_changed, n_common)``.  A column "changed" when the
    two sides are not null-safe-equal (a NULL appearing or
    disappearing counts; NULL == NULL does not).

    Scale: ONE inner hash equi-join on the keys projecting only the
    compared columns, then ONE map-side-combinable aggregate whose
    state is a fixed vector of per-column counters; the per-column
    output rows come from unpivoting that single aggregate row —
    column count never touches shuffle width.  (Comparing C columns
    over N rows is O(N * C) cpu either way; this shape keeps it one
    pass with no per-column scans.)
    """
    keys = list(keys)
    compare_cols = list(compare_cols)
    o = old.select(
        *keys, *[F.col(c).alias(f"__dc_o_{c}") for c in compare_cols]
    )
    n = new.select(
        *keys, *[F.col(c).alias(f"__dc_n_{c}") for c in compare_cols]
    )
    j = o.join(n, keys, "inner")
    agg = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("__dc_common"),
        *[
            F.sum(
                (
                    ~F.col(f"__dc_o_{c}").eqNullSafe(F.col(f"__dc_n_{c}"))
                ).cast("bigint")
            )
            .cast("bigint")
            .alias(f"__dc_chg_{c}")
            for c in compare_cols
        ],
    )
    stack = ", ".join(f"'{c}', __dc_chg_{c}" for c in compare_cols)
    return agg.select(
        F.expr(
            f"stack({len(compare_cols)}, {stack}) AS (column, n_changed)"
        ),
        F.col("__dc_common").alias("n_common"),
    ).select("column", "n_changed", "n_common")
