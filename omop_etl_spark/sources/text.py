"""Text-format ingestion and layout-aware parquet export.

A 100 TB training-data pipeline rarely starts from parquet: raw corpora
arrive as JSONL shards and operational tables as CSV dumps.  The two
rules that keep those reads scale-safe:

* **Never infer schemas.**  Inference is a second full pass over the
  data (Spark samples but still scans), and a drifting inferred type
  silently changes downstream plans.  Every reader here requires an
  explicit schema.
* **Never drop bad records silently.**  ``PERMISSIVE`` mode with a
  ``_corrupt_record`` column keeps malformed lines as first-class rows,
  so corruption is measurable (feed it to
  ``operators.quality.dq_profile``) instead of vanishing.

On the write side, ``write_partitioned`` pairs hive-style partition
directories (partition pruning on read: the scan's ``PartitionFilters``
skip whole directories) with ``maxRecordsPerFile`` (bounds file size so
a skewed partition value cannot produce one giant unsplittable file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "DOCS_JSONL_SCHEMA",
    "read_jsonl",
    "read_csv",
    "ingest_stats",
    "read_fixed_width",
    "write_partitioned",
]

#: schema of the documents table when shipped as JSONL
DOCS_JSONL_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _with_corrupt(schema: str, corrupt_col: str) -> str:
    return f"{schema}, {corrupt_col} string"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCS_JSONL_SCHEMA,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema.

    Malformed lines land in ``corrupt_col`` (all data columns null)
    rather than being dropped — measure them with :func:`ingest_stats`,
    then ``.filter(col(corrupt_col).isNull()).drop(corrupt_col)`` for
    the clean frame.  (Spark refuses queries over a raw JSON/CSV scan
    that reference ONLY the corrupt column — the parser never populates
    it unless a data column is also requested — so always keep a data
    column in corrupt-row inspections, as ``ingest_stats`` does; the
    same applies to the clean frame — a bare ``.count()`` after the
    filter prunes back to corrupt-only, so count via
    ``agg(count(<data col>))`` or cache first.)
    JSON lines split by newline, so a shard parallelizes across tasks
    like any text file (one task per HDFS-block-sized split); no
    whole-file reads.
    """
    return (
        spark.read.schema(_with_corrupt(schema, corrupt_col))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read CSV with an explicit schema and quarantined bad lines.

    Same contract as :func:`read_jsonl`: no inference pass, malformed
    rows kept in ``corrupt_col``.  Multi-line quoted fields are NOT
    enabled (they force whole-file parsing and kill split parallelism);
    corpora needing embedded newlines belong in JSONL or parquet.
    """
    return (
        spark.read.schema(_with_corrupt(schema, corrupt_col))
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )


def ingest_stats(df: DataFrame, corrupt_col: str = "_corrupt_record") -> DataFrame:
    """One-row ingest report for a permissive read: ``n_rows``,
    ``n_corrupt`` (parser stashed the raw line — full OR partial
    failure), ``n_unparsed`` (every data column null: the fully
    malformed subset).

    Deliberately references the data columns alongside the corrupt one:
    Spark rejects aggregations over a raw JSON/CSV scan whose only
    referenced column is the internal corrupt record (the parser never
    populates it in that case), so the naive
    ``filter(corrupt.isNotNull()).count()`` fails at runtime.
    """
    from pyspark.sql import functions as F

    data_cols = [c for c in df.columns if c != corrupt_col]
    if not data_cols:
        raise ValueError("frame has no data columns besides the corrupt column")
    all_null = F.lit(True)
    for c in data_cols:
        all_null = all_null & F.col(c).isNull()
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(corrupt_col).isNotNull().cast("bigint")).alias("n_corrupt"),
        F.sum(all_null.cast("bigint")).alias("n_unparsed"),
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet with bounded file sizes.

    ``partition_by`` columns become directory keys — an equality or IN
    filter on them prunes at planning time (visible as
    ``PartitionFilters`` in the scan node), which is the single
    cheapest scan optimization available at 100 TB.  Choose keys with
    bounded cardinality (date, source, language); a high-cardinality
    partition key degenerates into millions of tiny files.
    ``maxRecordsPerFile`` caps the other failure mode: one hot
    partition value writing a single multi-GB file that only one task
    can read back.
    """
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: "list[tuple[str, int, int, str]]",
) -> DataFrame:
    """Read fixed-width records (mainframe/legacy extracts — a format
    clinical source systems still emit).

    ``colspecs`` is ``[(name, start, end, type), ...]`` with 1-based,
    end-inclusive character positions (the layout-sheet convention).
    Implemented as a line read + ``substring``/``trim``/``cast``
    projection — row-local, whole-stage-codegen, splittable by line
    like any text source.  Cast failures become NULLs (ANSI off for
    this projection) rather than killed tasks; gate with
    ``operators.quality.dq_profile`` downstream.
    """
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    cols = []
    for name, start, end, typ in colspecs:
        width = end - start + 1
        c = F.trim(F.substring(F.col("value"), start, width))
        c = F.when(c == "", None).otherwise(c)
        if typ != "string":
            c = c.try_cast(typ) if hasattr(c, "try_cast") else c.cast(typ)
        cols.append(c.alias(name))
    return raw.select(*cols)
