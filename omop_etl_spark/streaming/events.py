"""Structured Streaming operators for event streams.

The reference has no streaming surface (SURVEY §2.1 — verified); this
module is the green-field Spark-native extension for the ``events``
table shape (``event_id, ts, user_id, event_type, value, props``):

* :func:`read_events_stream` — file-source stream over parquet with the
  nanosecond-timestamp shim shared with the batch reader.
* :func:`hourly_counts` — watermarked tumbling-window aggregation whose
  *semantics match the batch* ``events_hourly`` gate query, so a
  stream's final result can be verified against the batch oracle.
* :func:`sessionize` — session windows per user (gap-based), the
  canonical stateful-streaming pattern.

All transformations are sink-agnostic: callers pick ``writeStream``
(production) or ``availableNow`` + memory sink (tests/backfills).
Watermarks bound state so a 100 TB/day stream holds only the open
windows per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_table_stream",
    "read_events_stream",
    "hourly_counts",
    "sliding_counts",
    "sessionize",
    "stream_dedup",
    "enrich_stream",
    "stream_interval_join",
    "stream_kmv_distinct",
    "stream_interval_union",
    "stream_logq_buckets",
    "stream_logq_quantile",
    "dq_monitor_stream",
    "stream_latest_state",
    "stream_cdc_state",
    "stream_burst_dedup",
]

#: schema of the raw parquet with ns timestamps surfaced as long
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # epoch nanos (nanosAsLong)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_table_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over ANY parquet table directory (or a single
    parquet file — streamed via a glob filter on its parent, since the
    file source requires a directory).

    The file source needs a user-supplied schema; it is taken from a
    batch footer read of the same path (footer-only, cheap) so the
    stream always matches what's on disk. Table-specific column
    normalization stays with the callers — :func:`read_events_stream`
    layers the ``ts`` timestamp-encoding shim on top of this.
    """
    from pathlib import Path

    from ..sources.reader import enable_nanos_compat

    enable_nanos_compat(spark)
    on_disk = spark.read.parquet(path).schema  # footer-only, cheap
    reader = spark.readStream.schema(on_disk).format("parquet")
    p = Path(path)
    if p.is_file():
        reader = reader.option("pathGlobFilter", p.name)
        path = str(p.parent)
    return reader.load(path)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events parquet path
    (:func:`read_table_stream`) with the ``ts`` column normalized the
    same way :func:`~omop_etl_spark.sources.read_parquet_table` does —
    rather than hard-code one timestamp encoding (the round-4 outage:
    the testdata moved from ``timestamp[ns]`` to
    ``timestamp[us]``-no-tz), the shim adapts to the footer schema.
    """
    raw = read_table_stream(spark, path)
    dtype = dict(raw.dtypes).get("ts")
    if dtype == "bigint":  # epoch nanos via nanosAsLong
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":  # pandas timestamp[us] without tz
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def hourly_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count, distinct-ish user
    count and exact value cents — late data beyond ``watermark`` is
    dropped, bounding state.

    ``approx_count_distinct`` replaces the batch ``countDistinct``
    (exact distinct needs unbounded per-window state in a stream — the
    documented batch/stream delta).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .select(
            F.col("win.start").cast("string").alias("hour_ts"),
            "event_type",
            "n_events",
            "n_users_approx",
            "value_cents",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """SLIDING event-time windows per event_type — the overlapping-
    window shape tumbling ``hourly_counts`` can't express (each event
    lands in ``window/slide`` windows; a 1h/15m slide gives the
    4x-overlapped rolling rate every alerting dashboard wants).

    Structured Streaming's ``window(ts, windowDuration, slide)``
    assigns the overlapping windows MAP-SIDE (no self-join, no
    re-scan per offset); watermarking bounds state exactly as in the
    tumbling case — per-key state is ``window/slide`` concurrent
    windows instead of 1, still constant.  The batch twin is the
    same ``F.window`` expression on a static frame
    (tests/test_streaming_multimodal.py pins stream == batch).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide).alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .select(
            F.col("win.start").cast("string").alias("win_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: events closer than ``gap`` merge into
    one session (built-in ``session_window`` — no custom state store
    needed)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .select(
            "user_id",
            F.col("sess.start").cast("string").alias("session_start"),
            F.col("sess.end").cast("string").alias("session_end"),
            "n_events",
            "value_cents",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    ttl_minutes: int | None = 60,
) -> DataFrame:
    """Streaming first-seen-wins deduplication with TTL-bounded state —
    the custom-stateful-operator pattern (``applyInPandasWithState``)
    the built-in ``dropDuplicates`` can't express: per-key state that
    expires after ``ttl_minutes`` of processing-time inactivity, so a
    key seen again after the TTL is emitted again (the at-most-once-
    per-TTL-window contract CDC/event pipelines want, with state bounded
    by the active-key set instead of growing forever).

    ``ttl_minutes=None`` disables expiry — and takes the pure-JVM fast
    path: first-seen-wins without a TTL is exactly streaming
    ``dropDuplicates``, a built-in stateful operator whose per-key
    state lives in the state store (RocksDB-backed on a real cluster)
    with NO Python worker in the loop. That removes the per-key Python
    group-dispatch constant (~90 µs/key/batch — the 100-TB tax of
    ``applyInPandasWithState`` on high-cardinality keys). It is also
    the replay mode: with a processing-time timeout configured, a
    ``Trigger.AvailableNow`` query keeps scheduling no-data batches
    after the data is exhausted so the pending timeouts can fire —
    i.e. it does not terminate until every key's TTL has elapsed.

    With a TTL the operator genuinely needs custom state
    (``applyInPandasWithState``): expiry after processing-time
    inactivity is not expressible as a built-in aggregation, so the
    pandas path is kept for exactly that contract.

    Emits each group's first-ever row. Output schema = input schema
    (the JVM path emits the first physical row per key, same as the
    pandas path — project the stream to the key columns first if the
    emitted row must be a pure function of the data).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if ttl_minutes is None:
        return events.dropDuplicates(keys)

    schema = events.schema
    use_ttl = True

    def dedup_fn(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        n = 0
        for pdf in pdf_iter:
            if not seen and len(pdf) > 0:
                seen = True
                yield pdf.iloc[[0]]
            n += len(pdf)
        prev = state.get[0] if state.exists else 0
        state.update((prev + n,))
        if use_ttl:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    return events.groupBy(*keys).applyInPandasWithState(
        dedup_fn,
        outputStructType=schema,
        stateStructType="n_seen long",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_ttl
            else GroupStateTimeout.NoTimeout
        ),
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch equi-joins the
    (re-read) static dimension. With ``broadcast=True`` the dimension
    ships to executors once per micro-batch — no stream-side shuffle,
    which is the only stream-static plan that holds up when the stream
    side is wide and hot. Stateless: no watermark required."""
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on, how)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join bounded by an event-time interval: match
    right rows with ``right_ts ∈ [left_ts - lower, left_ts + upper]``
    and equal ``on`` keys. Both sides are watermarked, and the
    interval bound is what lets Spark expire join state — an unbounded
    stream-stream join would buffer both streams forever. State per
    key ≈ rows inside ``watermark + interval`` only.

    ``how`` may be ``"inner"`` (default), ``"left_outer"``, or
    ``"full_outer"``: with an outer side, a left row with NO interval
    match emits null-padded ONCE the watermark has passed its match
    window — i.e. the row is provably unmatchable, the only moment a
    stream can say "no partner will ever arrive". Until then it sits
    in state; expect outer results one watermark-advance later than
    inner results (asserted in tests/test_incremental_replay.py).

    Column names must be disjoint between the two inputs (rename
    before calling); the equi keys are ``(left_col, right_col)``
    pairs. This is the streaming twin of
    :func:`...operators.temporal.range_join`."""
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(f"unsupported join type: {how}")
    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    for lc, rc in on:
        cond = cond & (F.col(lc) == F.col(rc))
    return l_wm.join(r_wm, cond, how)


def sessionize_batch(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Batch twin of :func:`sessionize` with a fully SQL-expressible
    contract: a session is a maximal per-user run of events whose
    inter-event gap is ≤ ``gap_minutes`` (computed with lag + a running
    sum of gap breaks — the classic islands pattern), so the result is
    verifiable row-for-row against any ANSI-SQL oracle. Emits epoch
    micros for the bounds (string-formatting timestamps differs across
    engines; integers compare exactly).

    One hash shuffle on ``user_id`` serves both windows and the final
    aggregation (same partitioning).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    brk = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("__brk")
    )
    marked = events.select("user_id", "ts", "event_id", "value", brk)
    sess = marked.withColumn(
        "__sess",
        F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "__sess")
        .agg(
            F.min(F.unix_micros("ts")).alias("session_start_us"),
            F.max(F.unix_micros("ts")).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .drop("__sess")
        .select(
            "user_id", "session_start_us", "session_end_us", "n_events", "value_cents"
        )
    )


def stream_kmv_distinct(
    events: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Streaming twin of ``operators.sketches.kmv_distinct``: a running
    distinct-count estimate per key over an unbounded stream, with state
    bounded to the k smallest md5 hashes per key (a few KB) no matter
    how many distinct values flow past — the property that makes
    cardinality monitoring viable on an infinite stream where
    ``dropDuplicates`` state would grow without bound.

    Uses the same public hash as the batch operator
    (``md5(salt|value)`` first 8 hex chars over 2^32), so after any
    prefix of the stream the per-key estimate EQUALS the batch
    ``kmv_distinct`` of the same prefix — an exactly testable
    streaming/batch equivalence, not just a statistical one.

    Emits one ``(key, n_kept, est_distinct)`` row per key per
    micro-batch in which that key received data (append mode).

    Cost shape (r17): per-value hashing runs **JVM-side** — the stream
    is projected to ``unit_hash(value)`` (the same md5-prefix/2^32
    expression the batch operator compiles, whole-stage codegen)
    BEFORE the stateful operator, and the state function reduces each
    Arrow batch with one ``np.unique`` merge against the k-array — no
    per-row Python anywhere. What remains Python is one group dispatch
    per key per batch, which is why this operator's contract is
    MODEST KEY CARDINALITY (per metric/tenant/event-type monitoring —
    the k-smallest-set state is not expressible as a built-in
    aggregation, unlike :func:`stream_latest_state`). For
    high-cardinality keys use :func:`stream_logq_buckets`-style
    register streams or batch :func:`...operators.sketches.
    kmv_distinct` snapshots instead.

    NULL values hash to NULL and are ignored (the batch operator's
    DISTINCT frame carries them, but a monitoring stream's value key
    is assumed non-null; quantify nulls upstream if they matter).
    """
    import numpy as np

    from ..operators.sampling import unit_hash

    clamp = 2.0**-32  # same zero-hash clamp as batch kmv_distinct

    def kmv_fn(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        cur = (
            np.asarray(state.get[0], dtype=np.float64)
            if state.exists
            else np.empty(0, dtype=np.float64)
        )
        for pdf in pdf_iter:
            h = pdf["__h"].to_numpy(dtype=np.float64, na_value=np.nan)
            # one sorted-distinct merge per Arrow batch (NaN = hashed
            # NULL sorts last and is trimmed with the > k tail)
            cur = np.unique(np.concatenate([cur, h]))
            if cur.size and np.isnan(cur[-1]):
                cur = cur[: cur.size - np.isnan(cur).sum()]
            cur = cur[:k]
        state.update((cur.tolist(),))
        n = int(cur.size)
        est = n if n < k else int((k - 1) / max(float(cur[-1]), clamp))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_kept": [n], "est_distinct": [est]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    key_type = dict(zip(events.schema.names, events.schema))[key_col].dataType.simpleString()
    hashed = events.select(
        F.col(key_col), unit_hash(value_col, salt).alias("__h")
    )
    return hashed.groupBy(key_col).applyInPandasWithState(
        kmv_fn,
        outputStructType=f"{key_col} {key_type}, n_kept long, est_distinct long",
        stateStructType="hashes array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_interval_union(
    stream: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    engine: str = "pandas",
) -> DataFrame:
    """Streaming twin of ``operators.temporal.interval_union``: a
    running merged-interval coverage (busy-time / uptime) per key over
    an unbounded, possibly OUT-OF-ORDER stream of half-open intervals
    ``[start, end)``. ``start_col`` / ``end_col`` are int64 epoch
    MICROSECONDS.

    ``engine="jvm"`` (r18): an interval ``[s, e)`` is an event at
    ``s`` with a DYNAMIC session gap of ``e - s`` — Spark's
    ``session_window`` merges overlapping-or-TOUCHING sessions
    (break is strictly greater than the gap, probed r12), which is
    exactly this operator's island fusion rule, so the merged islands
    are one built-in streaming session-window aggregation with NO
    per-key Python dispatch. Output here is one row per ISLAND —
    ``(key, island_start, island_end)``, epoch-µs longs — because the
    per-key rollup (count/covered/max) is a second aggregation a
    single streaming query cannot chain; run it on the sink (the
    replay gate does) or downstream. Run complete mode on a bounded
    replay / append behind a watermark on a continuous feed (same
    trade as :func:`stream_burst_dedup`). Requires ``e > s`` (a
    session gap must be positive; the pandas engine also accepts
    degenerate ``e == s`` points).

    ``engine="pandas"`` (default): state per key is the DISJOINT
    ISLAND LIST (sorted start/end arrays): each arriving interval
    binary-searches the islands it overlaps or touches and fuses them
    in O(log I + merged). That state is bounded by the key's
    merged-span structure — its GAPS — not by row count: overlapping
    traffic collapses into existing islands, so a key with steady
    activity holds O(1) islands forever (the property raw-event
    buffering lacks). A watermark-eviction variant could additionally
    retire islands older than the watermark; kept out deliberately so
    the emitted numbers stay prefix-exact.

    After ANY prefix of the stream the per-key emission EQUALS the
    batch ``interval_union`` of the same prefix — out-of-order arrival
    included, because island fusion is order-independent (set union of
    covered points) — an exactly testable equivalence (both engines;
    the jvm form is order-independent by construction). The pandas
    engine emits one ``(key, n_islands, covered, max_island)`` row per
    key per micro-batch in which that key received data (append mode).
    """
    if engine == "jvm":
        ts = F.timestamp_micros(F.col(start_col))
        gap = F.concat(
            (F.col(end_col) - F.col(start_col)).cast("string"),
            F.lit(" microseconds"),
        )
        return (
            stream.groupBy(F.col(key_col), F.session_window(ts, gap))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                key_col,
                F.unix_micros(F.col("session_window.start")).alias(
                    "island_start"
                ),
                F.unix_micros(F.col("session_window.end")).alias(
                    "island_end"
                ),
            )
        )
    if engine != "pandas":
        raise ValueError(f"unknown engine: {engine!r}")

    import bisect

    def fn(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        starts, ends = (
            (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
        )
        for pdf in pdf_iter:
            for s, e in zip(pdf[start_col], pdf[end_col]):
                s, e = int(s), int(e)
                # islands overlapping-or-touching [s, e): the run with
                # ends[j] >= s and starts[j] <= e (arrays co-sorted —
                # islands are disjoint)
                lo = bisect.bisect_left(ends, s)
                hi = bisect.bisect_right(starts, e)
                if lo < hi:
                    s = min(s, starts[lo])
                    e = max(e, ends[hi - 1])
                    del starts[lo:hi]
                    del ends[lo:hi]
                idx = bisect.bisect_left(starts, s)
                starts.insert(idx, s)
                ends.insert(idx, e)
        state.update((starts, ends))
        lens = [b - a for a, b in zip(starts, ends)]
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_islands": [len(lens)],
                "covered": [sum(lens)],
                "max_island": [max(lens)],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    key_type = dict(zip(stream.schema.names, stream.schema))[
        key_col
    ].dataType.simpleString()
    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{key_col} {key_type}, n_islands long, covered long, max_island long"
        ),
        stateStructType="starts array<long>, ends array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_logq_quantile(
    events: DataFrame,
    key_col: str,
    value_col: str,
    m: int = 5,
    quantile: tuple[int, int] = (1, 2),
) -> DataFrame:
    """Streaming twin of ``operators.sketches.logq_buckets`` /
    ``logq_quantiles``: a running quantile estimate per key over an
    unbounded stream, state bounded to the log-linear bucket registers
    (O(octaves * 2^m) counts per key — a few hundred longs) no matter
    how many rows flow past.  The monitoring question this answers —
    "what is p50/p99 of this metric so far, right now?" — is exactly
    the one an unbounded exact quantile cannot, because its state is
    the whole value multiset.

    Uses the same pure-integer bucket index as the batch operator
    (bit-length octave + 2^m linear sub-buckets) and the same
    lower-quantile rank rule, so after any prefix of the stream the
    per-key ``(n, q_est)`` EQUALS batch
    ``logq_quantiles(logq_buckets(prefix))`` — an exactly testable
    streaming/batch equivalence (the stream_kmv_distinct contract).

    ``value_col`` must be integral and >= 1 to count (quantize floats
    upstream, e.g. cents); non-positive values are ignored, mirroring
    the batch operator's positivity filter.  Emits one
    ``(key, n, q_est)`` row per key per micro-batch (append mode).
    The register update is plain Python over Arrow batches — O(1)
    dict bumps per row against register-bounded state.

    SCALE NOTE (r17): prefer :func:`stream_logq_buckets` — the
    pure-JVM register stream (no Python worker at all) — and read
    quantiles off the registers with the batch
    ``sketches.logq_quantiles``. This convenience form remains for
    per-batch inline estimates at modest key cardinality; every row
    and every key crosses the Python boundary here.
    """
    two_m = 1 << m
    num, den = quantile

    def _bucket(v: int) -> int:
        bl = v.bit_length()
        return bl * two_m + (v * two_m) // (1 << (bl - 1)) - two_m

    def _lb(b: int) -> int:
        bl, sub = divmod(b, two_m)
        return ((1 << (bl - 1)) * (two_m + sub)) // two_m

    def logq_fn(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        cur = (
            dict(zip(state.get[0], state.get[1])) if state.exists else {}
        )
        for pdf in pdf_iter:
            for v in pdf[value_col]:
                # NULLs arrive as NaN after Arrow->pandas; skip BEFORE
                # int() so a nullable value column degrades to the
                # documented "non-positive values are ignored" behavior
                # instead of crashing the state function
                if pd.isna(v):
                    continue
                v = int(v)
                if v >= 1:
                    b = _bucket(v)
                    cur[b] = cur.get(b, 0) + 1
        items = sorted(cur.items())
        state.update(([b for b, _ in items], [c for _, c in items]))
        n = sum(c for _, c in items)
        est = None
        if n:
            thr = (num * (n - 1)) // den + 1
            run = 0
            for b, c in items:
                run += c
                if run >= thr:
                    est = _lb(b)
                    break
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "q_est": [est]})

    from pyspark.sql.streaming.state import GroupStateTimeout

    key_type = dict(zip(events.schema.names, events.schema))[
        key_col
    ].dataType.simpleString()
    return events.groupBy(key_col).applyInPandasWithState(
        logq_fn,
        outputStructType=f"{key_col} {key_type}, n long, q_est long",
        stateStructType="buckets array<long>, counts array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_logq_buckets(
    events: DataFrame,
    key_col: str,
    value_col: str,
    m: int = 5,
) -> DataFrame:
    """Pure-JVM streaming register stream for the log-linear quantile
    sketch: per ``(key, bucket)``, the RUNNING count of values landing
    in that bucket — literally ``sketches.logq_buckets`` applied to
    the streaming frame, because the registers are a streaming
    ``groupBy(key, bucket).count()`` and the bucket id is a pure
    integer column expression (bit-length octave + 2^m linear
    sub-buckets, whole-stage codegen).

    This is the 100-TB path for streaming quantiles: no Python worker
    anywhere — rows never leave the JVM, state is one long per live
    ``(key, bucket)`` register in the state store (O(octaves * 2^m)
    per key), and partial aggregation combines map-side before the
    shuffle. Run the sink in **update** mode (aggregation without
    watermark); each micro-batch emits the updated registers'
    cumulative counts, which are NONDECREASING — so the final sketch
    is recoverable from any emission log as ``max(c)`` per
    ``(key, bucket)``, and quantiles read off it with the batch
    ``sketches.logq_quantiles`` (the exact streaming == batch
    equivalence the pandas operator documents, now without the
    per-row/per-key Python tax).

    Output: ``(key_col, bucket, c)`` — the ``logq_buckets`` register
    schema. Rows with ``value < 1`` are ignored (positivity filter).
    """
    from ..operators.sketches import logq_buckets

    return logq_buckets(events, [key_col], value_col, m=m)


def dq_monitor_stream(
    stream: DataFrame,
    rules,
    table_name: str,
    sink,
):
    """Per-micro-batch data-quality monitoring: each batch runs the
    same declarative rule set as the batch engine
    (``operators.quality.dq_profile``) and hands the rules-sized report
    (plus ``batch_id``) to ``sink(report_df, batch_id)`` — alerting,
    metrics export, or a quarantine decision.

    ``foreachBatch`` is the right integration point: the report frame
    is O(rules) rows per batch regardless of batch size, all row-local
    rules fold into one conditional-aggregate pass over the batch, and
    the sink callable runs on the driver where it can act (abort the
    query, page someone) — exactly what a declarative streaming
    aggregation could not do.

    Returns the ``DataStreamWriter`` (caller adds trigger/start), so
    checkpointing and restart semantics stay in the caller's hands.
    """
    from ..operators.quality import dq_profile

    def process(batch_df: DataFrame, batch_id: int) -> None:
        report = dq_profile({table_name: batch_df}, rules).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        sink(report, batch_id)

    return stream.writeStream.foreachBatch(process)


def stream_latest_state(
    stream: DataFrame,
    key_col: str,
    ord_col: str,
    value_col: str,
    engine: str = "jvm",
) -> DataFrame:
    """Streaming last-writer-wins state (the CDC/SCD1 'current value'
    table as a stream): per key, keep the value with the highest
    ``ord_col`` seen so far and emit one row per key per micro-batch in
    which that key received data.

    Arrival order is NOT trusted — late or out-of-order rows never
    regress the state (the batch engine's LWW column-rule semantics,
    SURVEY §2.1 #8, continuously maintained).  Ties on ``ord_col`` are
    broken deterministically by the greater value string (NULL loses
    to any value), applied identically within a micro-batch and across
    batches — so the surviving value for duplicate ord keys is a pure
    function of the data, independent of how rows were batched.  State
    per key is one (ord, value) pair, so memory is bounded by the
    live-key set.

    ``engine="jvm"`` (default): the reduction is a monotone argmax
    over the total order ``(ord, value)`` — with NULL sorting first,
    Spark's struct ordering IS that order — so the whole operator is a
    built-in streaming aggregation ``groupBy(key).agg(max(struct(ord,
    value)))``. Run the sink in **update** mode (an aggregate without
    a watermark cannot append). Everything stays JVM-side: state in
    the state store (RocksDB on a real cluster), per-key cost is a
    hash-agg probe — no per-key Python group dispatch (~90 µs/key/
    batch), which is what dominated the pandas path at 5 M live keys
    (SCALE.md: 453 s for the sf10 CDC replay, ~60 k rows/s).

    ``engine="pandas"`` keeps the ``applyInPandasWithState``
    formulation (append-mode emissions). Its per-batch reduction is
    vectorized, but each live key still crosses the Python boundary
    once per batch — use it only as the template for variants that
    genuinely need custom state (TTL expiry, non-monotone reducers);
    both paths emit identical rows per micro-batch.
    """
    if engine == "jvm":
        w = F.max(
            F.struct(
                F.col(ord_col).cast("long").alias(ord_col),
                F.col(value_col).cast("string").alias(value_col),
            )
        ).alias("__w")
        return (
            stream.groupBy(key_col)
            .agg(w)
            .select(
                key_col,
                F.col(f"__w.{ord_col}").alias(ord_col),
                F.col(f"__w.{value_col}").alias(value_col),
            )
        )
    if engine != "pandas":
        raise ValueError(f"unknown engine: {engine!r}")

    from pyspark.sql.streaming.state import GroupStateTimeout

    key_type = dict(zip(stream.schema.names, stream.schema))[key_col].dataType.simpleString()

    def latest_fn(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        def wins(o, v, bo, bv):
            # deterministic total order on (ord, value): higher ord
            # wins; on an ord tie the greater value string wins and
            # NULL loses to any value — the same rule within a batch
            # and across batches, so batching cannot change the result
            if bo is None or o > bo:
                return True
            if o < bo:
                return False
            return v is not None and (bv is None or v > bv)

        best_ord, best_val = state.get if state.exists else (None, None)
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            mo = pdf[ord_col].max()
            sub = pdf.loc[pdf[ord_col] == mo, value_col]
            vals = [None if pd.isna(x) else str(x) for x in sub]
            nonnull = [x for x in vals if x is not None]
            o, v = int(mo), (max(nonnull) if nonnull else None)
            if wins(o, v, best_ord, best_val):
                best_ord, best_val = o, v
        state.update((best_ord, best_val))
        yield pd.DataFrame(
            {key_col: [key[0]], ord_col: [best_ord], value_col: [best_val]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        latest_fn,
        outputStructType=f"{key_col} {key_type}, {ord_col} long, {value_col} string",
        stateStructType="best_ord long, best_val string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_cdc_state(
    stream: DataFrame,
    key_col: str,
    ord_col: str,
    value_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    engine: str = "jvm",
) -> DataFrame:
    """Streaming CDC materialization WITH deletes — the streaming twin
    of ``temporal.apply_cdc`` (VERDICT r7 #6: ``stream_latest_state``
    could keep the latest value but never drop a key).

    Per key, the change with the highest ``ord_col`` wins, whatever
    order batches arrive in; each micro-batch emits the winning
    ``(ord, op, value)`` for every key that received data. An
    append-mode stream cannot retract, so a delete is emitted as a row
    with ``op = delete_op`` and NULL value — the consumer materializes
    the current table as "last emission per key where op != delete_op"
    (exactly what the replay test folds, and what a keyed sink's
    tombstone write does).

    Like ``apply_cdc``, results are a pure function of the change set
    only when ``ord_col`` totally orders each key's changes (a log
    sequence number); on an ord tie the greater ``(op, value)`` string
    pair wins (NULL loses), applied identically within and across
    batches so batching still cannot change the outcome. State per key
    is one (ord, op, value) triple — a deleted key keeps its tombstone
    so late pre-delete changes cannot resurrect it (bound the live-key
    set upstream with retention if keys churn forever).

    ``engine="jvm"`` (default): the reducer is a monotone argmax over
    the total order ``(ord, op, value)`` — the exact order the Python
    path's ``pair()`` encodes, because struct comparison sorts NULL
    first (None < "" < any string, same as ``(x is not None, x or
    "")``) — so the operator is a built-in streaming aggregation
    ``groupBy(key).agg(max(struct(ord, op, value)))`` with the
    tombstone NULL applied in the output projection. Run the sink in
    **update** mode. No Python worker: per-key cost is a JVM hash-agg
    probe instead of the pandas path's ~90 µs/key/batch group
    dispatch — on the sf10 replay (27.5 M changes, 5 M live keys)
    that dispatch alone was ~450 s.

    ``engine="pandas"`` keeps the ``applyInPandasWithState``
    formulation (append mode, vectorized per-batch reduction) as the
    template for variants needing genuinely custom state; both paths
    emit identical rows per micro-batch.
    """
    if engine == "jvm":
        w = F.max(
            F.struct(
                F.col(ord_col).cast("long").alias(ord_col),
                F.col(op_col).cast("string").alias(op_col),
                F.col(value_col).cast("string").alias(value_col),
            )
        ).alias("__w")
        return (
            stream.groupBy(key_col)
            .agg(w)
            .select(
                key_col,
                F.col(f"__w.{ord_col}").alias(ord_col),
                F.col(f"__w.{op_col}").alias(op_col),
                # append-mode streams cannot retract: a winning delete
                # emits op = delete_op with NULL value (the tombstone),
                # exactly like the pandas path
                F.when(
                    F.col(f"__w.{op_col}") == delete_op,
                    F.lit(None).cast("string"),
                )
                .otherwise(F.col(f"__w.{value_col}"))
                .alias(value_col),
            )
        )
    if engine != "pandas":
        raise ValueError(f"unknown engine: {engine!r}")

    from pyspark.sql.streaming.state import GroupStateTimeout

    key_type = dict(zip(stream.schema.names, stream.schema))[key_col].dataType.simpleString()

    def cdc_fn(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return

        def pair(op, val):
            # deterministic tie order on (op, value): encode None as
            # the minimum so NULL loses to any value
            return ((op is not None, op or ""), (val is not None, val or ""))

        def wins(o, op, v, bo, bop, bv):
            if bo is None or o > bo:
                return True
            if o < bo:
                return False
            return pair(op, v) > pair(bop, bv)

        best_ord, best_op, best_val = (
            state.get if state.exists else (None, None, None)
        )
        saw = False
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            saw = True
            # the reduction is an associative argmax over the total
            # order (ord, pair(op, value)), so each batch reduces
            # vectorized to its single winner before one state compare
            mo = int(pdf[ord_col].max())
            sub = pdf.loc[pdf[ord_col] == mo, [op_col, value_col]]
            ops = [None if pd.isna(x) else str(x) for x in sub[op_col]]
            vals = [None if pd.isna(x) else str(x) for x in sub[value_col]]
            op, v = max(zip(ops, vals), key=lambda t: pair(*t))
            if wins(mo, op, v, best_ord, best_op, best_val):
                best_ord, best_op, best_val = mo, op, v
        state.update((best_ord, best_op, best_val))
        if saw:
            out_val = None if best_op == delete_op else best_val
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    ord_col: [best_ord],
                    op_col: [best_op],
                    value_col: [out_val],
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        cdc_fn,
        outputStructType=(
            f"{key_col} {key_type}, {ord_col} long, "
            f"{op_col} string, {value_col} string"
        ),
        stateStructType="best_ord long, best_op string, best_val string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_burst_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    id_col: str,
    gap_seconds: int = 300,
    engine: str = "pandas",
) -> DataFrame:
    """Streaming twin of ``operators.temporal.burst_dedup``: emit only
    the first event of every burst (chain of same-key events with
    consecutive gaps < ``gap_seconds``), continuously.

    ``engine="jvm"`` (r18): a burst IS a ``session_window(ts,
    gap_seconds)`` group — Spark's gap-based session sessionizes
    exactly the maximal chains whose consecutive gaps are < gap — and
    the burst survivor is the session's ``min(struct(ts, id))``. The
    whole operator is then one built-in streaming session-window
    aggregation: state lives in the state store, sessions merge
    JVM-side, and NO per-key Python group dispatch remains (the
    ~90 µs/key/batch that made the pandas path superlinear on a
    growing key set: 128 s at the sf10 replay tier, SCALEPROBE_stream
    _r17). Because session merging is a pure function of the event
    SET, the result is exactly batch ``burst_dedup`` for ANY arrival
    order — stronger than the pandas path's per-key-ordered prefix
    contract. Run it in **complete** mode for a bounded replay (an
    unwatermarked aggregate cannot append; the final sessions of a
    finite stream never pass a watermark, so append mode would hold
    them back forever) or append mode behind ``withWatermark`` on a
    continuous feed (state then evicts as sessions close).

    ``engine="pandas"`` keeps the ``applyInPandasWithState`` chain
    scan: state per key is ONE timestamp — the last event seen — so
    memory is bounded by the live-key set forever with NO watermark
    required (session-window state holds every open session; complete
    mode holds all of them), and emissions are append-mode
    exactly-once per survivor.  Within a micro-batch, rows sort by
    ``(ts, id)`` before the chain scan; across batches the chain
    extends from the stored last-seen timestamp.  For per-key-ordered
    arrival the emitted set after any prefix of the stream EQUALS the
    batch ``burst_dedup`` of the same prefix (asserted in
    tests/test_incremental_replay.py); an event arriving LATE (behind
    its key's last-seen ts) cannot retroactively split a burst — it is
    judged against the chain as already materialized, the one semantic
    a single-pass stream cannot replay.
    """
    keys = list(keys)
    if engine == "jvm":
        w = F.min(F.struct(F.col(ts_col), F.col(id_col))).alias("__w")
        # gap - 1 µs: session_window MERGES an event at exactly
        # prev_ts + gap (its break is strictly greater — probed by the
        # sessionize gate, r12), while the burst chain BREAKS at
        # >= gap. Timestamps are µs-resolution, so shrinking the
        # session gap by one microsecond makes the two definitions
        # coincide exactly: merge iff delta <= gap-1µs iff delta < gap.
        gap_us = int(gap_seconds) * 1_000_000 - 1
        return (
            stream.groupBy(
                *[F.col(k) for k in keys],
                F.session_window(F.col(ts_col), f"{gap_us} microseconds"),
            )
            .agg(w)
            .select(
                *keys,
                F.col(f"__w.{ts_col}").alias(ts_col),
                F.col(f"__w.{id_col}").alias(id_col),
            )
        )
    if engine != "pandas":
        raise ValueError(f"unknown engine: {engine!r}")

    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = stream.schema
    typ = {f.name: f.dataType.simpleString() for f in schema.fields}
    out_type = ", ".join(
        [f"{k} {typ[k]}" for k in keys]
        + [f"{ts_col} timestamp", f"{id_col} {typ[id_col]}"]
    )

    def burst_fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        last_us = state.get[0] if state.exists else None
        kept_ts = None
        # concatenate the key's whole micro-batch before sorting: the
        # Arrow reader may hand one key's rows as SEVERAL chunks, and
        # sorting each chunk independently would scan out of (ts, id)
        # order whenever a key spans chunks
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            # vectorized chain scan on bare numpy arrays (r17, guide
            # §4.2): the keep decision for row i depends only on row
            # i-1's timestamp (the chain pointer advances on EVERY
            # event, kept or not), so the whole scan is one shifted
            # int64 compare. Bare arrays matter as much as the
            # vectorization itself: per-key frames are ~10 rows, where
            # pandas sort_values / boolean row-indexing cost hundreds
            # of µs per CALL — an sf1 A/B of the pdf-indexing spelling
            # measured 3.6x SLOWER than this one. Timestamps are
            # non-null by the operator's event contract (a NaT would
            # now sort first instead of sort_values' NaT-last).
            if len(chunks) == 1:
                ts_np = chunks[0][ts_col].to_numpy()
                id_np = chunks[0][id_col].to_numpy()
            else:
                ts_np = np.concatenate([c[ts_col].to_numpy() for c in chunks])
                id_np = np.concatenate([c[id_col].to_numpy() for c in chunks])
            order = np.lexsort((id_np, ts_np))
            ts_np = ts_np[order]
            id_np = id_np[order]
            us = ts_np.astype("int64") // 1000
            gap_us = gap_seconds * 1_000_000
            prev = np.empty_like(us)
            # a None last_us (fresh key) must keep the first row:
            # us[0] - gap_us makes the first compare trivially true
            prev[0] = last_us if last_us is not None else us[0] - gap_us
            prev[1:] = us[:-1]
            keep = us >= prev + gap_us
            kept_ts = ts_np[keep]
            kept_id = id_np[keep]
            last_us = int(us[-1])
        state.update((last_us,))
        if kept_ts is not None and len(kept_ts):  # no survivors -> no
            # emission (an empty frame only feeds the serializer's
            # concat a zero-row entry)
            out = {k: [key[i]] * len(kept_ts) for i, k in enumerate(keys)}
            out[ts_col] = kept_ts
            out[id_col] = kept_id
            yield pd.DataFrame(out)

    return stream.groupBy(*keys).applyInPandasWithState(
        burst_fn,
        outputStructType=out_type,
        stateStructType="last_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
