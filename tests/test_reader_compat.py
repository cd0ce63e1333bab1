"""Regression tests for parquet timestamp-encoding compat in
``read_parquet_table`` (sources/reader.py).

The driver's testdata is pandas-written: historically ``ts`` was
``timestamp[ns]`` (Spark needs the nanosAsLong shim), later regenerated
as ``timestamp[us]`` *without* a timezone, which Spark reads as
``TIMESTAMP_NTZ`` — breaking ``unix_micros()`` and TIMESTAMP/NTZ unions
(the round-3/4 outage).  These tests write both encodings pyarrow-side
(NOT Spark-side — writing fixtures with Spark is exactly how the bug
slipped past the old suite) and assert the reader normalizes each to a
plain ``timestamp`` column with the exact same epoch micros.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from omop_etl_spark.sources import read_parquet_table

EPOCHS_US = [1_700_000_000_000_000, 1_700_000_123_456_789, 0]


def _write(tmp_path, name, arrow_type, values):
    path = str(tmp_path / name)
    pq.write_table(
        pa.table({"user_id": pa.array([1, 2, 3], pa.int64()),
                  "ts": pa.array(values, arrow_type)}),
        path,
    )
    return path


@pytest.mark.parametrize(
    "arrow_type,values",
    [
        (pa.timestamp("us"), EPOCHS_US),                     # -> TIMESTAMP_NTZ
        (pa.timestamp("us", tz="UTC"), EPOCHS_US),           # -> TIMESTAMP
        (pa.timestamp("ns"), [v * 1000 for v in EPOCHS_US]), # -> nanosAsLong bigint
    ],
    ids=["us-no-tz", "us-utc", "ns-no-tz"],
)
def test_reader_normalizes_to_timestamp(spark, tmp_path, arrow_type, values):
    path = _write(tmp_path, "t.parquet", arrow_type, values)
    df = read_parquet_table(spark, path, ns_columns=["ts"])
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(
        r[0] for r in df.select(F.unix_micros("ts")).collect()
    )
    assert got == sorted(EPOCHS_US)


def test_ntz_events_sessionize_analyzes(spark, tmp_path):
    """End-to-end shape of the round-3/4 outage: a pandas-style
    timestamp[us]-no-tz events file must flow through sessionize_batch
    (which calls unix_micros on ts) without an AnalysisException."""
    base = datetime.datetime(2024, 1, 1)
    us = [int((base + datetime.timedelta(minutes=m)).timestamp() * 1e6)
          for m in (0, 5, 600)]
    path = str(tmp_path / "events.parquet")
    pq.write_table(
        pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "ts": pa.array(us, pa.timestamp("us")),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }),
        path,
    )
    from omop_etl_spark.streaming.events import sessionize_batch

    ev = read_parquet_table(spark, path, ns_columns=["ts"])
    rows = sessionize_batch(ev, gap_minutes=30).collect()
    # 5-minute gap stays in session 1; the 595-minute jump opens a new one
    assert len(rows) == 2


def test_asof_join_mixed_timestamp_types(spark):
    """asof_join must accept one TIMESTAMP and one TIMESTAMP_NTZ input
    (library users won't always route both sides through the reader)."""
    from omop_etl_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00")], "k int, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00", 42.0)], "k int, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = asof_join(
        left, right, left_on=["k"], right_on=["k"],
        left_ts="ts", right_ts="ts", value_cols=["v"],
    ).collect()
    assert len(out) == 1 and out[0]["asof_v"] == 42.0
