"""Temporal joins the reference's SQL surface cannot express directly:
as-of (nearest-event) joins and point-in-interval range joins.

Both are staples of event/feature pipelines (the reference's
``visit_occurrence``/``condition_occurrence`` rules join on exact keys
only — reference omop_etl/schema.py TargetTable joins; these operators
extend that surface), and both are written so Catalyst sees only
equi-joins / window scans — never a ``BroadcastNestedLoopJoin`` or
``CartesianProduct``, which is what a naive ``ts BETWEEN lo AND hi``
join degenerates to on two large inputs.

Scale model (100 TB):

* :func:`asof_join` — ONE hash shuffle of ``left ∪ right`` on the key
  columns plus a per-partition sort; no join node at all. State per
  task = the sort spill of one key range, which Spark's
  ``UnsafeExternalSorter`` spills to disk, so a hot key degrades to
  disk sort, not OOM.
* :func:`range_join` — intervals are exploded to coarse time bins
  (O(interval/bin_width) rows each) and the join runs as a plain
  equi-join on ``(bin, *extra keys)`` with the exact range predicate
  applied as a post-filter. Bin width should be chosen near the median
  interval length: the explode factor stays O(1) and the equi-join
  shuffles both sides once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..conf import checkpoint as _checkpoint

__all__ = [
    "asof_join",
    "range_join",
    "overlap_join",
    "resample_ffill",
    "scd2_from_changes",
    "funnel",
    "interval_concurrency",
    "interval_union",
    "scd2_lookup",
    "burst_dedup",
    "apply_cdc",
    "upsert",
    "cusum_changepoints",
    "ema_smooth",
]


def _interval(spec: str | Column) -> Column:
    if isinstance(spec, Column):
        return spec
    return F.expr(f"INTERVAL {spec}")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: Sequence[str],
    right_on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: str | Column | None = None,
    allow_exact_matches: bool = True,
    tiebreak: Sequence[str] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: for every ``left`` row, attach the payload of
    the nearest ``right`` row with equal keys and ``right_ts <=
    left_ts`` (``direction="backward"``) or ``>=`` (``"forward"``).
    Unmatched left rows keep NULL payload columns (left-join shape,
    like ``pandas.merge_asof``).

    Implemented as the *union-window* as-of join: tag and union both
    inputs, hash-partition by key, sort by time within each partition,
    and carry the last (first) non-null right payload forward with
    ``F.last(..., ignorenulls=True)``. Catalyst's physical plan is one
    Exchange + one Sort + one Window — no join operator, no per-row
    range probe — so cost is a single shuffle of ``|L| + |R|`` rows
    regardless of how many right rows precede each left row.

    ``tolerance`` (e.g. ``"7 days"``) nulls out matches further than
    that from ``left_ts``.  ``tiebreak`` names right payload columns
    that deterministically order right rows sharing an identical
    ``(key, ts)`` — the greatest wins for ``backward``, the least for
    ``forward``; without it, equal-timestamp winners are unspecified.
    Right rows with a NULL key or NULL ``right_ts`` are dropped (SQL
    equi-join semantics: NULL matches nothing); left rows with NULL
    keys simply never match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction={direction!r}")
    left_on, right_on = list(left_on), list(right_on)
    if len(left_on) != len(right_on) or not left_on:
        raise ValueError("asof_join: left_on/right_on must be equal-length, non-empty")
    lt, rt = left.schema[left_ts].dataType, right.schema[right_ts].dataType
    if lt != rt and {lt.typeName(), rt.typeName()} <= {"timestamp", "timestamp_ntz"}:
        # Mixed TIMESTAMP/TIMESTAMP_NTZ inputs would fail the unionByName
        # below with an AnalysisException; normalize the right side to the
        # left's type. The cast is epoch-preserving ONLY under a UTC
        # session timezone (pinned by sources.reader.enable_nanos_compat);
        # surface the assumption where it is relied on (ADVICE r5).
        tz = right.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
        if tz != "UTC":
            import warnings

            warnings.warn(
                "asof_join: casting between TIMESTAMP and TIMESTAMP_NTZ "
                f"with session timeZone={tz!r}; the cast shifts epochs "
                "unless the session timezone is UTC "
                "(see omop_etl_spark.sources.reader.enable_nanos_compat)",
                stacklevel=2,
            )
        right = right.withColumn(right_ts, F.col(right_ts).cast(lt))
    payload_cols = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c not in right_on]
    )
    if right_ts not in payload_cols:
        payload_cols = [right_ts, *payload_cols]
    for c in tiebreak:
        if c not in payload_cols:
            raise ValueError(f"asof_join: tiebreak column {c!r} not in payload")

    keys = [f"__k{i}" for i in range(len(left_on))]
    payload_t = right.select(
        F.struct(*[F.col(c) for c in payload_cols]).alias("__p")
    ).schema[0].dataType

    left_branch = left.select(
        *[F.col(c) for c in left.columns],
        *[F.col(k).alias(a) for k, a in zip(left_on, keys)],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__evt"),
        F.lit(None).cast(payload_t).alias("__p"),
    )
    right_filter = F.col(right_ts).isNotNull()
    for k in right_on:
        right_filter = right_filter & F.col(k).isNotNull()
    right_branch = right.filter(right_filter).select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *[F.col(k).alias(a) for k, a in zip(right_on, keys)],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__evt"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__p"),
    )
    both = left_branch.unionByName(right_branch)

    backward = direction == "backward"
    ts_order = F.col("__ts").asc() if backward else F.col("__ts").desc()
    # At equal ts: right rows must be scanned before left rows for the
    # match to be visible (exact match allowed), after them otherwise.
    evt_order = F.col("__evt").asc() if allow_exact_matches else F.col("__evt").desc()
    tb_order = [
        (F.col(f"__p.{c}").asc() if backward else F.col(f"__p.{c}").desc())
        for c in tiebreak
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, evt_order, *tb_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__p", ignorenulls=True).over(w)
    if tolerance is not None:
        tol = _interval(tolerance)
        bound = (
            matched[right_ts] >= F.col("__ts") - tol
            if backward
            else matched[right_ts] <= F.col("__ts") + tol
        )
        matched = F.when(bound, matched)

    out = both.withColumn("__m", matched).filter(F.col("__evt") == 1)
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start: str,
    end: str,
    bin_width_seconds: int = 86_400,
    extra_on: Sequence[tuple[str, str]] = (),
    end_inclusive: bool = False,
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Inner join of point rows to every interval row whose
    ``[start, end)`` (or ``[start, end]``) contains ``point_ts``,
    optionally also matching on ``extra_on`` equi-key pairs
    ``(point_col, interval_col)``.

    A direct ``points.join(intervals, ts >= start & ts < end)`` has no
    equi-condition, so Spark plans a BroadcastNestedLoopJoin — O(|P|·|I|)
    compares and a broadcast of a possibly-huge side. Here each interval
    is exploded to the coarse time bins it overlaps
    (``sequence(floor(start/W), floor(end/W))``) and each point to its
    single bin, turning the range join into a hash equi-join on
    ``(__bin, *extra keys)`` with the exact predicate as a cheap
    post-filter. Pick ``bin_width_seconds`` near the median interval
    length: explode factor ≈ len/W + 1 per interval.

    Output = all point columns + the interval's ``payload_cols``
    (default: every interval column not used as a key). Intervals with
    NULL bounds are dropped.
    """
    p_extra = [p for p, _ in extra_on]
    i_extra = [i for _, i in extra_on]
    payload = list(
        payload_cols
        if payload_cols is not None
        else [c for c in intervals.columns if c not in i_extra]
    )
    overlap = set(payload) & set(points.columns)
    if overlap:
        raise ValueError(
            f"range_join: interval payload columns {sorted(overlap)} collide "
            f"with point columns; pass payload_cols or rename."
        )
    w = F.lit(int(bin_width_seconds))
    p_bin = F.floor(F.unix_timestamp(F.col(point_ts)) / w)
    i_bins = F.sequence(
        F.floor(F.unix_timestamp(F.col(start)) / w),
        F.floor(F.unix_timestamp(F.col(end)) / w),
    )
    p = points.withColumn("__bin", p_bin)
    i = (
        intervals.filter(F.col(start).isNotNull() & F.col(end).isNotNull())
        .filter(F.col(end) >= F.col(start))
        .select(
            *[F.col(c) for c in dict.fromkeys([*i_extra, start, end, *payload])],
            F.explode(i_bins).alias("__bin"),
        )
    )
    cond = (p["__bin"] == i["__bin"]) & (p[point_ts] >= i[start])
    cond &= p[point_ts] <= i[end] if end_inclusive else p[point_ts] < i[end]
    for pc, ic in extra_on:
        cond &= p[pc] == i[ic]
    joined = p.join(i, cond, "inner")
    return joined.select(
        *[p[c] for c in points.columns],
        *[i[c] for c in payload],
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width_seconds: int = 86_400,
    extra_on: Sequence[tuple[str, str]] = (),
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Inner join of interval rows to interval rows that OVERLAP them
    (half-open semantics: ``l_start < r_end and r_start < l_end``),
    optionally matching ``extra_on`` equi-keys — the interval-interval
    sibling of :func:`range_join`'s point-in-interval.

    Both sides explode to coarse time bins, turning the inequality pair
    into a hash equi-join on ``(__bin, *extra keys)``.  A pair that
    shares several bins would match once per shared bin; instead of a
    dedup shuffle, each pair is emitted ONLY at the bin containing the
    overlap's start (``greatest(l_start, r_start)``) — a pure filter,
    so the join output is exactly-once by construction.

    Output = all left columns + the right side's ``payload_cols``
    (default: all right columns not used as equi-keys).  NULL-bounded
    or inverted intervals are dropped on both sides.
    """
    l_extra = [a for a, _ in extra_on]
    r_extra = [b for _, b in extra_on]
    payload = list(
        payload_cols
        if payload_cols is not None
        else [c for c in right.columns if c not in r_extra]
    )
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"overlap_join: right payload columns {sorted(clash)} collide "
            f"with left columns; pass payload_cols or rename."
        )
    w = F.lit(int(bin_width_seconds))

    def _valid(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.filter(
            F.col(s).isNotNull() & F.col(e).isNotNull() & (F.col(e) >= F.col(s))
        )

    def _bins(s: str, e: str):
        return F.sequence(
            F.floor(F.unix_timestamp(F.col(s)) / w),
            F.floor(F.unix_timestamp(F.col(e)) / w),
        )

    l = _valid(left, left_start, left_end).withColumn(
        "__bin", F.explode(_bins(left_start, left_end))
    )
    r = _valid(right, right_start, right_end).select(
        *[
            F.col(c)
            for c in dict.fromkeys([*r_extra, right_start, right_end, *payload])
        ],
        F.explode(_bins(right_start, right_end)).alias("__bin"),
    )
    cond = (
        (l["__bin"] == r["__bin"])
        & (l[left_start] < r[right_end])
        & (r[right_start] < l[left_end])
    )
    for lc, rc in extra_on:
        cond &= l[lc] == r[rc]
    # exactly-once: keep the match only in the overlap-start bin
    anchor = F.floor(
        F.unix_timestamp(F.greatest(l[left_start], r[right_start])) / w
    )
    joined = l.join(r, cond & (l["__bin"] == anchor), "inner")
    return joined.select(
        *[l[c] for c in left.columns],
        *[r[c] for c in payload],
    )


def resample_ffill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    step: str = "1 HOUR",
    fill: Column | None = None,
) -> DataFrame:
    """Regularize an irregular time series onto a fixed ``step`` grid,
    carrying the last observed value forward across gaps.

    For every key tuple, emits one row per grid instant between the
    frame-wide min and max (``date_trunc``-aligned to ``step``'s unit);
    a grid instant with no observation inherits each value column from
    the nearest earlier instant that has one (leading gaps take
    ``fill``, default NULL). Input must already be aggregated to at
    most one row per (key, truncated instant) — compose with a
    ``groupBy`` upstream.

    Scale: the grid is built per key by ``sequence`` + ``explode``
    (O(span/step) rows per key, no cross join); the forward fill is one
    ``last(..., ignorenulls)`` running window per key — a single hash
    shuffle on the key columns, the same partitioning the upstream
    hourly aggregate already produced. The global bounds are a 1-row
    aggregate broadcast into the plan.
    """
    unit = step.split()[-1].lower()
    keys = [F.col(k) for k in key_cols]
    trunc = F.date_trunc(unit, F.col(ts_col))
    bounds = df.agg(
        F.date_trunc(unit, F.min(ts_col)).alias("__lo"),
        F.date_trunc(unit, F.max(ts_col)).alias("__hi"),
    )
    obs = df.select(
        *keys, trunc.alias("__grid"), *[F.col(v) for v in value_cols]
    )
    grid = (
        obs.select(*keys).distinct()
        .join(F.broadcast(bounds))
        .select(
            *keys,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), _interval(step))
            ).alias("__grid"),
        )
    )
    joined = grid.join(obs, [*key_cols, "__grid"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("__grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = [
        F.coalesce(
            F.last(v, ignorenulls=True).over(w),
            fill if fill is not None else F.lit(None),
        ).alias(v)
        for v in value_cols
    ]
    return joined.select(*keys, F.col("__grid").alias(ts_col), *filled)


def resample_interp(
    df: DataFrame,
    key_cols: Sequence[str],
    day_col: str,
    value_col: str,
    out_col: str = "interp_value",
) -> DataFrame:
    """Regularize a daily integer series onto the per-key day grid,
    LINEARLY interpolating interior gaps in exact integer arithmetic —
    the companion to :func:`resample_ffill` when "hold the last value"
    misstates a trend (sensor readings, balances, rates).

    For key ``k`` with observations at days ``t0 < t1`` and values
    ``v0, v1``, a missing day ``t`` in between gets
    ``floor((v0 * (t1 - t) + v1 * (t - t0)) / (t1 - t0))`` — exact
    int64 (valid while ``|v| * gap_days`` fits int64, i.e. any real
    series), so the result is engine-replayable bit-for-bit, unlike
    float lerp. Days before the first / after the last observation
    carry the edge value (no extrapolation). Grid spans each KEY's own
    min..max day (not the frame-wide span — a key absent for the
    first year shouldn't be back-filled into it).

    Input must have at most one row per (key, day) — aggregate
    upstream. ``day_col`` must be a date; ``value_col`` integral.

    Scale: per-key grid via ``sequence`` + ``explode`` (O(span) rows
    per key, no cross join); both the previous- and next-observation
    brackets ride ONE running window each over the same per-key hash
    partitioning — no self-join, no global window.
    """
    keys = [F.col(k) for k in key_cols]
    obs = df.select(
        *keys,
        F.col(day_col).alias("__day"),
        F.col(value_col).cast("bigint").alias("__v"),
    )
    span = obs.groupBy(*key_cols).agg(
        F.min("__day").alias("__lo"), F.max("__day").alias("__hi")
    )
    grid = span.select(
        *key_cols,
        F.explode(F.expr("sequence(__lo, __hi, interval 1 day)")).alias("__day"),
    ).select(*key_cols, F.col("__day").cast("date").alias("__day"))
    j = grid.join(obs, [*key_cols, "__day"], "left")
    wb = (
        Window.partitionBy(*keys)
        .orderBy("__day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy("__day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last("__v", ignorenulls=True).over(wb)
    prev_d = F.last(
        F.when(F.col("__v").isNotNull(), F.col("__day")), ignorenulls=True
    ).over(wb)
    next_v = F.first("__v", ignorenulls=True).over(wf)
    next_d = F.first(
        F.when(F.col("__v").isNotNull(), F.col("__day")), ignorenulls=True
    ).over(wf)
    num = (
        prev_v * F.datediff(next_d, F.col("__day")).cast("bigint")
        + next_v * F.datediff(F.col("__day"), prev_d).cast("bigint")
    )
    den = F.datediff(next_d, prev_d).cast("bigint")
    staged = j.select(
        *key_cols,
        "__day",
        "__v",
        prev_v.alias("__pv"),
        next_v.alias("__nv"),
        num.alias("__num"),
        den.alias("__den"),
    )
    # exact int64 floor division (den > 0 by construction): `a / b`
    # on bigints is a DOUBLE divide (precision loss past 2^53) and
    # `div` truncates toward zero on negatives — (a - pmod(a, b)) div
    # b is floor(a / b) in pure integer arithmetic for any sign of a.
    interp = F.when(F.col("__v").isNotNull(), F.col("__v")).otherwise(
        F.when(F.col("__pv").isNull(), F.col("__nv"))
        .when(F.col("__nv").isNull(), F.col("__pv"))
        .otherwise(F.expr("(__num - pmod(__num, __den)) div __den"))
    )
    return staged.select(
        *key_cols,
        F.col("__day").alias(day_col),
        F.col("__v").isNotNull().alias("observed"),
        interp.cast("bigint").alias(out_col),
    )


def scd2_from_changes(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Fold an attribute-change event log into a type-2 slowly-changing
    dimension: one row per (key, consecutive-distinct attribute state)
    with ``valid_from`` / ``valid_to`` interval columns, a 1-based
    ``version``, and an ``is_current`` flag on the open interval.

    The idiomatic immutable-data answer to the reference's mutable
    UPDATE-in-place tables (reference omop_etl/generation.py:159-189):
    instead of overwriting a dimension row, every historical state
    stays queryable by interval — compose with :func:`range_join` for
    point-in-time lookups.

    Consecutive rows with identical attribute tuples collapse into the
    earlier version (change-point detection via ``lag`` over the key
    window). Two window passes over the same (key, ts) ordering — the
    second runs on the change points only, a frame the first pass
    already shrank — and both share ONE hash shuffle on the keys.
    """
    keys = [F.col(k) for k in key_cols]
    order = [F.col(ts_col), *[F.col(t) for t in tiebreak]]
    state = F.struct(*[F.col(a) for a in attr_cols])
    w = Window.partitionBy(*keys).orderBy(*order)
    changes = (
        df.withColumn("__prev", F.lag(state).over(w))
        .filter(F.col("__prev").isNull() | (state != F.col("__prev")))
        .drop("__prev")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w2)
    return changes.select(
        *keys,
        *[F.col(a) for a in attr_cols],
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        F.row_number().over(w2).cast("bigint").alias("version"),
        nxt.isNull().cast("int").alias("is_current"),
    )


def funnel(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    stage_col: str,
    stages: Sequence[str],
    prefix: str = "t",
) -> DataFrame:
    """Ordered conversion funnel: for each key, the earliest timestamp
    of stage 0, then the earliest stage-1 event STRICTLY AFTER it, and
    so on — the standard product-analytics funnel where later stages
    must follow the preceding stage in time, not merely occur.

    Returns one row per key that reached stage 0: the per-stage
    timestamps ``t0..tN`` (NULL once the key drops out — nulls are
    monotone by construction) and ``depth`` = number of stages
    reached.

    Plan shape: one filtered hash aggregate per stage plus an equi-join
    against the accumulating funnel frame — ``len(stages)`` shuffles on
    the key columns, each over only that stage's events (the stage
    filter pushes into the scan). No windows over the full event
    stream, so a hot user costs one aggregate row per stage, not a
    sort.

    Resource contract (r17): the accumulating funnel frame is eagerly
    checkpointed per stage (``conf.checkpoint``). Stage ``i``
    references the stage ``i-1`` frame TWICE (the qualifying-event join
    and the left join that attaches ``t_i``), so without the
    materialization the re-derivation doubles per stage —
    ``2^(len(stages)-1)`` rebuilds of the stage-0 aggregate, one extra
    source scan each (the r17 audit read 7 scans for 3 stages instead
    of 3). The frame is one row per key that reached stage 0 —
    bounded by the converting-user count, far below the event count.
    """
    keys = list(key_cols)
    out: DataFrame | None = None
    for i, s in enumerate(stages):
        ev = df.filter(F.col(stage_col) == s).select(
            *keys, F.col(ts_col).alias("__fts")
        )
        if out is None:
            out = ev.groupBy(*keys).agg(F.min("__fts").alias(f"{prefix}0"))
        else:
            nxt = (
                ev.join(out.select(*keys, f"{prefix}{i-1}"), keys)
                .filter(F.col("__fts") > F.col(f"{prefix}{i-1}"))
                .groupBy(*keys)
                .agg(F.min("__fts").alias(f"{prefix}{i}"))
            )
            out = out.join(nxt, keys, "left")
        if i < len(stages) - 1:
            out = out.transform(_checkpoint)
    assert out is not None, "stages must be non-empty"
    depth = sum(
        (F.col(f"{prefix}{i}").isNotNull().cast("int") for i in range(len(stages))),
        F.lit(0),
    )
    return out.withColumn("depth", depth.cast("bigint"))


def interval_concurrency(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    duration: str,
    bucket: str = "day",
) -> DataFrame:
    """Max number of simultaneously-open intervals per key (peak
    concurrency), where each row opens the half-open interval
    ``[ts, ts + duration)``.

    The classic sweep-line needs a GLOBAL ordered prefix sum over
    boundary events — a single-partition window if written naively,
    which serializes on one core and dies at scale when ``key_col`` has
    low cardinality.  This implementation distributes the prefix sum in
    two levels:

    1. boundary events (+1 at ``ts``, -1 at ``ts + duration``) are
       windowed *within* ``(key, time-bucket)`` — thousands of
       independent sort partitions instead of one per key;
    2. per-bucket delta totals (a tiny ``keys x buckets`` frame) get
       their own cumulative window, giving each bucket its carry-in
       offset, broadcast back onto the boundary frame.

    Peak concurrency is ``max(offset + local running sum)``.  The result
    is exactly the single-window answer: within a tie-block of equal
    ``(ts, delta)`` the multiset of prefix sums is permutation-
    invariant, so the MAX is deterministic even though ROWS-frame
    attribution of individual ties is not.  End events sort before
    starts at the same instant (delta ASC), making the interval
    genuinely half-open.

    Output: one row per key — ``n_intervals``, ``max_concurrent``.
    """
    end_ts = F.col(ts_col) + _interval(duration)
    k = F.col(key_col)
    starts = df.select(k.alias("__k"), F.col(ts_col).alias("__t"), F.lit(1).alias("__d"))
    ends = df.select(k.alias("__k"), end_ts.alias("__t"), F.lit(-1).alias("__d"))
    bounds = starts.unionByName(ends).withColumn(
        "__b", F.date_trunc(bucket, F.col("__t"))
    )

    local_w = (
        Window.partitionBy("__k", "__b")
        .orderBy("__t", "__d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bounds.withColumn("__run", F.sum("__d").over(local_w))

    carry_w = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bounds.groupBy("__k", "__b")
        .agg(F.sum("__d").alias("__tot"))
        .select(
            F.col("__k").alias("__ok"),
            F.col("__b").alias("__ob"),
            F.coalesce(F.sum("__tot").over(carry_w), F.lit(0)).alias("__off"),
        )
    )

    conc = local.join(
        F.broadcast(offsets),
        (F.col("__k") == F.col("__ok")) & (F.col("__b") == F.col("__ob")),
    ).select("__k", (F.col("__off") + F.col("__run")).alias("__conc"))

    return conc.groupBy("__k").agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_intervals"),
        F.max("__conc").cast("bigint").alias("max_concurrent"),
    ).select(F.col("__k").alias(key_col), "n_intervals", "max_concurrent")


def interval_union(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int | None = None,
) -> DataFrame:
    """Merged-interval coverage per key (the gaps-and-islands union):
    overlapping or touching half-open intervals ``[start, end)`` fuse
    into islands; reports island count, total covered length, and the
    longest island — the uptime / busy-time / SLA-coverage primitive.

    ``start_col``/``end_col`` must be NUMERIC (cast timestamps to
    ``unix_micros`` first) with ``end > start``; touching intervals
    (``start == previous end``) merge, per half-open convention.

    Exact and engine-replayable: an island starts where ``start``
    exceeds the running max of all earlier ends (ordered by
    ``(start, end)``; the rule is permutation-invariant within exact
    ties), island ids are the running count of those starts, and all
    lengths are integer arithmetic on the input units.

    Scale: one shuffle on ``key_col``, windows partitioned per key.
    For SKEWED keys (one key ≈ a partition) pass ``bucket_width`` (in
    start-column units): both running aggregates (max-of-ends, count-
    of-island-starts) decompose into the two-level form of
    :func:`interval_concurrency` — a local window within
    ``(key, start div bucket_width)`` plus carry-in offsets from the
    tiny per-bucket totals frame — thousands of independent sort
    partitions per key instead of one, same exact result (max and sum
    are both associative over the bucket split).

    Output: one row per key — ``n_islands``, ``covered``,
    ``max_island`` (all bigint).
    """
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(start_col).cast("bigint").alias("__s"),
        F.col(end_col).cast("bigint").alias("__e"),
    )
    if bucket_width is None:
        w_prev = (
            Window.partitionBy("__k")
            .orderBy("__s", "__e")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_cum = (
            Window.partitionBy("__k")
            .orderBy("__s", "__e")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        prev_max = F.max("__e").over(w_prev)
        flagged = base.withColumn(
            "__new",
            F.when(prev_max.isNull() | (F.col("__s") > prev_max), 1).otherwise(0),
        ).withColumn("__isl", F.sum("__new").over(w_cum))
    else:
        if bucket_width < 1:
            raise ValueError("interval_union: bucket_width must be >= 1")
        # exact int64 floor division (ADVICE r11): floor(__s / W) goes
        # through a DOUBLE divide and misassigns buckets once __s
        # exceeds 2^53 (micros timestamps get there by year 2255, raw
        # counters sooner) — (a - pmod(a, b)) div b is floor(a / b) in
        # pure integer arithmetic for any sign of __s.
        wl = int(bucket_width)
        b = base.withColumn(
            "__b",
            F.expr(f"(__s - pmod(__s, {wl})) div {wl}").cast("bigint"),
        )
        local_prev = (
            Window.partitionBy("__k", "__b")
            .orderBy("__s", "__e")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_w = (
            Window.partitionBy("__k")
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carries = (
            b.groupBy("__k", "__b")
            .agg(F.max("__e").alias("__bmax"))
            .select(
                F.col("__k").alias("__ck"),
                F.col("__b").alias("__cb"),
                F.max("__bmax").over(carry_w).alias("__carry_max"),
            )
        )
        flagged = (
            b.join(
                F.broadcast(carries),
                (F.col("__k") == F.col("__ck")) & (F.col("__b") == F.col("__cb")),
            )
            .withColumn(
                "__prev_max",
                # greatest() skips NULLs (returns NULL only when BOTH
                # the local window is empty and no earlier bucket exists)
                F.greatest(F.max("__e").over(local_prev), F.col("__carry_max")),
            )
            .withColumn(
                "__new",
                F.when(
                    F.col("__prev_max").isNull()
                    | (F.col("__s") > F.col("__prev_max")),
                    1,
                ).otherwise(0),
            )
        )
        local_cum = (
            Window.partitionBy("__k", "__b")
            .orderBy("__s", "__e")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        flag_carries = (
            flagged.groupBy("__k", "__b")
            .agg(F.sum("__new").alias("__btot"))
            .select(
                F.col("__k").alias("__fk"),
                F.col("__b").alias("__fb"),
                F.coalesce(F.sum("__btot").over(carry_w), F.lit(0)).alias(
                    "__carry_cnt"
                ),
            )
        )
        flagged = flagged.join(
            F.broadcast(flag_carries),
            (F.col("__k") == F.col("__fk")) & (F.col("__b") == F.col("__fb")),
        ).withColumn(
            "__isl", F.sum("__new").over(local_cum) + F.col("__carry_cnt")
        )
    islands = flagged.groupBy("__k", "__isl").agg(
        F.min("__s").alias("__is"), F.max("__e").alias("__ie")
    )
    return (
        islands.groupBy("__k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum(F.col("__ie") - F.col("__is")).cast("bigint").alias("covered"),
            F.max(F.col("__ie") - F.col("__is")).cast("bigint").alias("max_island"),
        )
        .select(F.col("__k").alias(key_col), "n_islands", "covered", "max_island")
    )


def scd2_lookup(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    value_cols: Sequence[str] | None = None,
    prefix: str = "dim_",
) -> DataFrame:
    """Point-in-time lookup against a type-2 dimension: attach to each
    fact row the dimension version valid at ``fact_ts`` — the
    warehouse join ``ON key AND valid_from <= ts AND (ts < valid_to OR
    valid_to IS NULL)``.

    Because SCD2 intervals are CONTIGUOUS and non-overlapping per key
    (what :func:`scd2_from_changes` guarantees, and any sane SCD2 build
    does), the interval predicate is equivalent to "latest
    ``valid_from`` ≤ ts" — so this delegates to :func:`asof_join` and
    inherits its union-window plan: ONE shuffle of |facts| + |versions|
    rows, no join node, no interval explode.  Facts before a key's
    first version get NULL dimension columns (left-join shape).
    """
    payload = list(
        value_cols
        if value_cols is not None
        else [c for c in dim.columns if c not in (*keys, valid_from)]
    )
    return asof_join(
        fact,
        dim,
        left_on=list(keys),
        right_on=list(keys),
        left_ts=fact_ts,
        right_ts=valid_from,
        value_cols=payload,
        direction="backward",
        prefix=prefix,
    )


def burst_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: str | Column = "5 minutes",
    tiebreak: Sequence[str] | None = None,
) -> DataFrame:
    """Keep only the FIRST event of every burst — telemetry/sensor
    dedup where re-fires within ``gap`` of the previous event are
    noise, not signal.

    A burst is a maximal chain of same-key events whose CONSECUTIVE
    gaps are all < ``gap`` (the sessionization island definition, so
    results compose with ``streaming.sessionize_batch``); the chain's
    first event survives.  Note this differs from greedy
    keep-against-last-SURVIVOR dedup: a chain of events each 2s apart
    is ONE burst however long it runs.

    One ``lag`` window per key ordered by ``(ts, *tiebreak)`` —
    a single hash shuffle on the keys, no join, no cumsum: a row
    survives iff it has no predecessor within ``gap``.  Ties at the
    exact same timestamp need ``tiebreak`` columns for a total order
    (engine-stable survivor); the first row of a tie group survives
    only if the tie-predecessor is outside the gap — i.e. exact-time
    duplicates collapse to the tiebreak winner.
    """
    keys = list(keys)
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    g = _interval(gap) if isinstance(gap, str) else gap
    return (
        df.withColumn("__prev_ts", prev)
        .filter(
            F.col("__prev_ts").isNull()
            | (F.col(ts_col) >= F.col("__prev_ts") + g)
        )
        .drop("__prev_ts")
    )


def apply_cdc(
    changes: DataFrame,
    keys: Sequence[str],
    ord_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak: Sequence[str] | None = None,
) -> DataFrame:
    """Materialize a CDC change log into its final table state — the
    batch twin of ``streaming.stream_latest_state`` generalized to
    deletes.

    Per key, the change with the highest ``(ord_col, *tiebreak)``
    wins; if that winning change is a delete (``op_col ==
    delete_op``), the key is absent from the output, otherwise the
    winning row's payload columns are emitted (``op_col`` dropped).
    Arrival/file order is never trusted — the result is a pure
    function of the change set, so replaying a backfill out of order
    produces the identical table.

    One ``row_number`` window per key (single hash shuffle, no join);
    ties beyond the tiebreak columns would make the survivor
    ill-defined, so pass enough columns for a total order (e.g. a log
    sequence number).
    """
    keys = list(keys)
    order = [F.col(ord_col).desc()] + [
        F.col(c).desc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("__cdc_rn", F.row_number().over(w))
        .filter(F.col("__cdc_rn") == 1)
        .filter(F.col(op_col) != F.lit(delete_op))
        .drop("__cdc_rn", op_col)
    )


def upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """SCD1 upsert (the MERGE INTO ... WHEN MATCHED THEN UPDATE WHEN
    NOT MATCHED THEN INSERT shape, expressed relationally): rows of
    ``updates`` replace same-key rows of ``target``; unmatched update
    rows append; unmatched target rows survive.

    ``updates`` must be key-unique (enforce upstream with
    ``quality.dq_profile``'s unique rule or :func:`apply_cdc`);
    duplicate update keys would emit duplicate rows rather than pick a
    winner.  Plan: one left-anti join (target minus updated keys) + a
    union — both sides shuffle once on the keys, no window, no
    full-outer null-folding over every column.
    """
    keys = list(keys)
    kept = target.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates)


def segmented_cumsum(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    reset_col: str,
    seg_col: str = "seg",
    cum_col: str = "cum",
) -> DataFrame:
    """Running SUM(``value_col``) per key that RESETS whenever
    ``reset_col`` is true — meter readings after a counter reset,
    session spend after a re-login, balance after a statement close.

    The reset cannot be expressed as one window frame; the standard
    decomposition is two stacked windows: ``seg`` = inclusive running
    count of reset rows (so each reset row STARTS its segment and its
    own value is the first contribution), then the running sum
    partitioned by ``(keys..., seg)``.  Both windows are partitioned
    (never global) and each key's frame is that key's rows — the same
    scale class as any per-entity window.  ``order_cols`` must totally
    order each key's rows (include a unique id) or the sums at ties
    are ill-defined.
    """
    keys, order_cols = list(keys), list(order_cols)
    w1 = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn(
        seg_col,
        F.sum(F.when(F.col(reset_col), 1).otherwise(0)).over(w1).cast("bigint"),
    )
    w2 = (
        Window.partitionBy(*keys, seg_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.withColumn(cum_col, F.sum(value_col).over(w2).cast("bigint"))


def cusum_changepoints(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_prefix: str = "cp",
) -> DataFrame:
    """Single most-likely mean-shift point per group by the CUSUM
    statistic — where does each series stop looking like its own
    average?  (Page 1954; the standard first pass of drift detection
    on ingestion-volume / metric series.)

    For the group's series ``x_1..x_n`` in ``order_col`` order, the
    deviation at ``t`` is ``S_t = prefix_t - t * mean``; the change
    point is the ``t`` maximizing ``|S_t|`` (earliest wins ties).  To
    keep both engines bit-identical the statistic is scaled by ``n``:
    ``dev_t = n * prefix_t - t * total`` — pure int64 (headroom:
    ``n * total`` must stay under 2^63, which holds for any per-group
    series up to ~3e9 points of 1e9-scale values aggregated first —
    callers aggregate facts to a bounded grain, e.g. daily, before
    calling).

    Output: one row per group — ``<prefix>_at`` (the order key at the
    change point), ``<prefix>_dev_scaled`` (``|dev|``, scaled by n),
    ``n_points``, ``total_value``.

    Scale: windows are PARTITIONED by the group key; per-reducer state
    is one group's series at the aggregated grain, never the fact
    table.  No partition-less window anywhere.
    """
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy(order_col)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wg = Window.partitionBy(*gcols)
    scored = (
        df.select(*gcols, order_col, F.col(value_col).cast("bigint").alias("__v"))
        .withColumn("__t", F.row_number().over(w).cast("bigint"))
        .withColumn("__pre", F.sum("__v").over(wf).cast("bigint"))
        .withColumn("__n", F.count(F.lit(1)).over(wg).cast("bigint"))
        .withColumn("__tot", F.sum("__v").over(wg).cast("bigint"))
        .withColumn(
            "__dev", F.col("__n") * F.col("__pre") - F.col("__t") * F.col("__tot")
        )
    )
    pick = Window.partitionBy(*gcols).orderBy(
        F.abs(F.col("__dev")).desc(), F.col(order_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(
            *gcols,
            F.col(order_col).alias(f"{out_prefix}_at"),
            F.abs(F.col("__dev")).alias(f"{out_prefix}_dev_scaled"),
            F.col("__n").alias("n_points"),
            F.col("__tot").alias("total_value"),
        )
    )


def ema_smooth(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    alpha_num: int = 1,
    alpha_den: int = 4,
    out_col: str = "ema",
) -> DataFrame:
    """Exponential moving average per group series:
    ``ema_1 = x_1``, ``ema_t = a*x_t + (1-a)*ema_{t-1}`` with
    ``a = alpha_num / alpha_den`` (a dyadic rational by default, so
    every multiply is exact or correctly rounded identically in any
    IEEE-754 engine).

    The recursion is ORDER-SENSITIVE, so it cannot be a hash
    aggregate; instead each group's series (already at an aggregated
    grain — days, not facts) is collected into a sorted array and
    folded LEFT-TO-RIGHT with the JVM-side ``aggregate`` higher-order
    function — deterministic sequential float ops, which a recursive
    SQL CTE replays bit-for-bit.  Per-group state is the series at the
    aggregated grain; groups fold in parallel.  No Python, no UDF.

    Output: the input rows plus ``out_col`` (double).
    """
    if not 0 < alpha_num < alpha_den:
        raise ValueError("ema_smooth requires 0 < alpha_num < alpha_den")
    gcols = list(group_cols)
    a = alpha_num / alpha_den  # dyadic when alpha_den is a power of 2
    o_dtype = dict(df.dtypes)[order_col]
    series = df.groupBy(*gcols).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("o"),
                    F.col(value_col).cast("bigint").alias("v"),
                )
            )
        ).alias("__s")
    )
    step_val = f"(cast({a!r} as double) * x.v + cast({1 - a!r} as double) * st.last)"
    first_val = "cast(x.v as double)"
    ema_expr = f"if(st.started, {step_val}, {first_val})"
    folded = series.select(
        *gcols,
        F.explode(
            F.expr(
                "aggregate(__s, "
                f"struct(cast(array() as array<struct<o: {o_dtype}, v: bigint, ema: double>>) as acc, "
                "       cast(0.0 as double) as last, false as started), "
                f"(st, x) -> struct(concat(st.acc, array(struct(x.o as o, x.v as v, {ema_expr} as ema))), "
                f"                  {ema_expr}, true), "
                "st -> st.acc)"
            )
        ).alias("__e"),
    )
    return folded.select(
        *gcols,
        F.col("__e.o").alias(order_col),
        F.col("__e.v").alias(value_col),
        F.col("__e.ema").alias(out_col),
    )
