"""Source readers: parquet with nanosecond-timestamp compatibility.

Spark's vectorized parquet reader rejects ``TIMESTAMP(NANOS)`` columns
(``PARQUET_TYPE_ILLEGAL``) which pandas/pyarrow writers emit by default.
With ``spark.sql.legacy.parquet.nanosAsLong=true`` (a session conf) the
column surfaces as a raw epoch-nanos ``bigint``; we convert back to a
proper timestamp with integer division (``div 1000`` — double division
would lose precision above 2^53 ns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["enable_nanos_compat", "read_parquet_table", "EVENTS_NS_COLUMNS"]

#: known nanosecond-timestamp columns in the driver testdata
EVENTS_NS_COLUMNS = {"events": ["ts"]}


def enable_nanos_compat(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def read_parquet_table(
    spark: SparkSession, path: str, ns_columns: list[str] | None = None
) -> DataFrame:
    """Read parquet; convert the named epoch-nanos long columns to
    microsecond timestamps."""
    enable_nanos_compat(spark)
    df = spark.read.parquet(path)
    for c in ns_columns or ():
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df
