"""As-of join and binned range join: correctness vs brute force,
tie/tolerance/direction semantics, and plan-shape invariants."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from omop_etl_spark.operators.temporal import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def ts(h):
    return T0 + dt.timedelta(hours=h)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, ts(1), "a"),
            (1, ts(5), "b"),
            (1, ts(10), "c"),
            (2, ts(3), "d"),
            (3, ts(4), "e"),   # key with no quotes at all
            (None, ts(4), "f"),  # null key never matches
        ],
        "k bigint, t timestamp, tag string",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, ts(0), 100.0, 1),
            (1, ts(5), 105.0, 2),   # exact-match boundary for trade "b"
            (1, ts(5), 106.0, 3),   # same key+ts: tiebreak target
            (1, ts(8), 108.0, 4),
            (2, ts(9), 200.0, 5),   # only AFTER trade "d"
            (None, ts(0), -1.0, 6),  # null key must be dropped
        ],
        "k bigint, t timestamp, px double, qid int",
    )


def _asof_map(df, prefix="asof_"):
    return {
        r["tag"]: (r[f"{prefix}qid"], r[f"{prefix}px"])
        for r in df.collect()
    }


def test_asof_backward_basic(trades, quotes):
    out = asof_join(
        trades, quotes,
        left_on=["k"], right_on=["k"], left_ts="t", right_ts="t",
        tiebreak=["qid"],
    )
    assert set(out.columns) == {"k", "t", "tag", "asof_t", "asof_px", "asof_qid"}
    got = _asof_map(out)
    assert got["a"] == (1, 100.0)
    # exact match allowed; equal-ts tie broken by greatest qid
    assert got["b"] == (3, 106.0)
    assert got["c"] == (4, 108.0)
    assert got["d"] == (None, None)   # quote is after the trade
    assert got["e"] == (None, None)   # key has no quotes
    assert got["f"] == (None, None)   # null key matches nothing


def test_asof_strict_excludes_equal_ts(trades, quotes):
    got = _asof_map(
        asof_join(
            trades, quotes,
            left_on=["k"], right_on=["k"], left_ts="t", right_ts="t",
            allow_exact_matches=False, tiebreak=["qid"],
        )
    )
    assert got["b"] == (1, 100.0)   # ts(5) quotes excluded, falls back to ts(0)
    assert got["a"] == (1, 100.0)   # strictly-earlier quote still matches


def test_asof_forward(trades, quotes):
    got = _asof_map(
        asof_join(
            trades, quotes,
            left_on=["k"], right_on=["k"], left_ts="t", right_ts="t",
            direction="forward", tiebreak=["qid"],
        )
    )
    assert got["a"] == (2, 105.0)   # nearest following; equal-ts tie -> least qid
    assert got["b"] == (2, 105.0)   # exact match allowed
    assert got["c"] == (None, None)  # nothing after ts(10)
    assert got["d"] == (5, 200.0)


def test_asof_tolerance(trades, quotes):
    got = _asof_map(
        asof_join(
            trades, quotes,
            left_on=["k"], right_on=["k"], left_ts="t", right_ts="t",
            tolerance="2 hours", tiebreak=["qid"],
        )
    )
    assert got["a"] == (1, 100.0)   # 1h back, within tolerance
    assert got["c"] == (4, 108.0)   # 2h back, inclusive bound
    assert got["b"] == (3, 106.0)
    # trade e/d unmatched stays unmatched
    assert got["e"] == (None, None)


def test_asof_plan_has_no_join(trades, quotes):
    out = asof_join(
        trades, quotes,
        left_on=["k"], right_on=["k"], left_ts="t", right_ts="t",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan           # no join operator of any kind
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_matches_brute_force_on_random(spark):
    import random

    rng = random.Random(7)
    left = [(rng.randrange(5), ts(rng.randrange(200))) for _ in range(300)]
    right = [
        (rng.randrange(5), ts(rng.randrange(200)), i) for i in range(150)
    ]
    ldf = spark.createDataFrame(left, "k bigint, t timestamp")
    rdf = spark.createDataFrame(right, "k bigint, t timestamp, rid bigint")
    out = asof_join(
        ldf, rdf, left_on=["k"], right_on=["k"], left_ts="t", right_ts="t",
        tiebreak=["rid"],
    )
    got = {(r["k"], r["t"]): r["asof_rid"] for r in out.collect()}
    for k, t in set(left):
        cands = [(rt, rid) for rk, rt, rid in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[(k, t)] == want, (k, t)


# ---------------------------------------------------------------- range join


@pytest.fixture(scope="module")
def intervals(spark):
    return spark.createDataFrame(
        [
            (10, ts(0), ts(4), "w0"),
            (11, ts(3), ts(6), "w1"),    # overlaps w0
            (12, ts(50), ts(50), "zero"),  # zero-length
            (13, ts(7), ts(5), "bad"),   # end < start: dropped
            (14, None, ts(9), "nul"),    # null bound: dropped
        ],
        "iid bigint, lo timestamp, hi timestamp, name string",
    )


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [(i, ts(h)) for i, h in enumerate([0, 3, 4, 5, 50, 99])],
        "pid bigint, pt timestamp",
    )


def test_range_join_half_open(points, intervals):
    out = range_join(
        points, intervals, point_ts="pt", start="lo", end="hi",
        bin_width_seconds=3600 * 2,
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    # pt=0 in w0; pt=3h in w0,w1; pt=4h in w1 only (half-open); pt=5h in w1
    assert got == [(0, 10), (1, 10), (1, 11), (2, 11), (3, 11)]


def test_range_join_end_inclusive_and_zero_length(points, intervals):
    out = range_join(
        points, intervals, point_ts="pt", start="lo", end="hi",
        bin_width_seconds=3600 * 2, end_inclusive=True,
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [
        (0, 10), (1, 10), (1, 11), (2, 10), (2, 11), (3, 11), (4, 12)
    ]


def test_range_join_extra_keys_and_payload(spark):
    pts = spark.createDataFrame(
        [(1, 7, ts(1)), (2, 8, ts(1))], "pid bigint, grp bigint, pt timestamp"
    )
    ivs = spark.createDataFrame(
        [(7, ts(0), ts(2), "m7"), (9, ts(0), ts(2), "m9")],
        "g bigint, lo timestamp, hi timestamp, name string",
    )
    out = range_join(
        pts, ivs, point_ts="pt", start="lo", end="hi",
        extra_on=[("grp", "g")], payload_cols=["name"],
    )
    assert [(r["pid"], r["name"]) for r in out.collect()] == [(1, "m7")]
    assert set(out.columns) == {"pid", "grp", "pt", "name"}


def test_range_join_payload_collision_raises(points, intervals):
    bad = intervals.withColumnRenamed("name", "pid")
    with pytest.raises(ValueError, match="collide"):
        range_join(bad.select("iid", "lo", "hi", "pid"), bad,
                   point_ts="lo", start="lo", end="hi")


def test_range_join_plan_is_equi_join(points, intervals):
    out = range_join(
        points, intervals, point_ts="pt", start="lo", end="hi",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# resample_ffill


def test_resample_ffill_fills_gaps_and_leading(spark):
    from omop_etl_spark.operators.temporal import resample_ffill

    df = spark.createDataFrame(
        [
            ("a", ts(1), 10),
            ("a", ts(4), 40),
            ("b", ts(2), 20),
        ],
        "k string, t timestamp, v long",
    )
    out = resample_ffill(df, ["k"], "t", ["v"], step="1 HOUR")
    got = {(r["k"], r["t"]): r["v"] for r in out.collect()}
    # grid spans the frame-wide bounds [ts(1), ts(4)] for every key
    assert len(got) == 8
    assert got[("a", ts(1))] == 10
    assert got[("a", ts(2))] == 10  # gap carried forward
    assert got[("a", ts(3))] == 10
    assert got[("a", ts(4))] == 40
    assert got[("b", ts(1))] is None  # leading gap -> NULL by default
    assert got[("b", ts(2))] == 20
    assert got[("b", ts(4))] == 20


def test_resample_ffill_custom_fill_and_truncation(spark):
    from omop_etl_spark.operators.temporal import resample_ffill

    df = spark.createDataFrame(
        [("a", ts(0) + dt.timedelta(minutes=30), 7)],
        "k string, t timestamp, v long",
    )
    out = resample_ffill(df, ["k"], "t", ["v"], step="1 HOUR", fill=F.lit(0))
    rows = out.collect()
    # observation lands on its truncated hour
    assert [(r["t"], r["v"]) for r in rows] == [(ts(0), 7)]


# ---------------------------------------------------------------------------
# scd2_from_changes


def test_scd2_collapses_runs_and_versions(spark):
    from omop_etl_spark.operators.temporal import scd2_from_changes

    df = spark.createDataFrame(
        [
            (1, ts(1), 101, "x"),
            (1, ts(2), 102, "x"),   # same state: collapses into v1
            (1, ts(3), 103, "y"),
            (1, ts(4), 104, "x"),   # back to x: NEW version, not merged
            (2, ts(5), 105, "z"),
        ],
        "k bigint, t timestamp, eid bigint, s string",
    )
    out = scd2_from_changes(df, ["k"], "t", ["s"], tiebreak=["eid"])
    rows = sorted(
        ((r["k"], r["version"], r["s"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in out.collect())
    )
    assert rows == [
        (1, 1, "x", ts(1), ts(3), 0),
        (1, 2, "y", ts(3), ts(4), 0),
        (1, 3, "x", ts(4), None, 1),
        (2, 1, "z", ts(5), None, 1),
    ]


def test_scd2_intervals_partition_time_per_key(spark):
    from omop_etl_spark.operators.temporal import scd2_from_changes

    df = spark.createDataFrame(
        [(1, ts(i), i, "s" + str(i % 3)) for i in range(12)],
        "k bigint, t timestamp, eid bigint, s string",
    )
    out = scd2_from_changes(df, ["k"], "t", ["s"], tiebreak=["eid"]).collect()
    ivs = sorted((r["valid_from"], r["valid_to"]) for r in out)
    # each interval starts where the previous ended; exactly one open
    for (a, b), (c, _d) in zip(ivs, ivs[1:]):
        assert b == c
    assert sum(1 for _, b in ivs if b is None) == 1


# ---------------------------------------------------------------------------
# funnel


def test_funnel_strict_ordering(spark):
    from omop_etl_spark.operators.temporal import funnel

    df = spark.createDataFrame(
        [
            # user 1: full ordered funnel
            (1, ts(1), "view"),
            (1, ts(2), "click"),
            (1, ts(3), "buy"),
            # user 2: click BEFORE first view -> doesn't count; no click after
            (2, ts(1), "click"),
            (2, ts(2), "view"),
            # user 3: view only
            (3, ts(5), "view"),
            # user 4: never viewed -> absent from output
            (4, ts(1), "buy"),
        ],
        "u bigint, t timestamp, s string",
    )
    out = {
        r["u"]: (r["t0"], r["t1"], r["t2"], r["depth"])
        for r in funnel(df, ["u"], "t", "s", ["view", "click", "buy"]).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1] == (ts(1), ts(2), ts(3), 3)
    assert out[2] == (ts(2), None, None, 1)
    assert out[3] == (ts(5), None, None, 1)


def test_funnel_uses_first_qualifying_not_first_overall(spark):
    from omop_etl_spark.operators.temporal import funnel

    df = spark.createDataFrame(
        [
            (1, ts(2), "view"),
            (1, ts(1), "click"),   # before the view: ignored
            (1, ts(4), "click"),   # first click after view
            (1, ts(3), "buy"),     # before the qualifying click: ignored
            (1, ts(6), "buy"),
        ],
        "u bigint, t timestamp, s string",
    )
    row = funnel(df, ["u"], "t", "s", ["view", "click", "buy"]).collect()[0]
    assert (row["t0"], row["t1"], row["t2"], row["depth"]) == (
        ts(2), ts(4), ts(6), 3,
    )


def test_overlap_join_matches_bruteforce(spark):
    import datetime as dt
    import random

    from omop_etl_spark.operators.temporal import overlap_join
    from pyspark.sql import Row

    rng = random.Random(13)
    base = dt.datetime(2024, 5, 1)

    def mk_intervals(n, pfx):
        rows = []
        for i in range(n):
            s = base + dt.timedelta(minutes=rng.randrange(0, 60 * 100))
            e = s + dt.timedelta(minutes=rng.randrange(1, 600))
            rows.append((rng.randrange(3), i, s, e))
        return rows

    lrows = mk_intervals(120, "l")
    rrows = mk_intervals(150, "r")
    left = spark.createDataFrame(
        [Row(lk=k, lid=i, ls=s, le=e) for k, i, s, e in lrows]
    )
    right = spark.createDataFrame(
        [Row(rk=k, rid=i, rs=s, re_=e) for k, i, s, e in rrows]
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in overlap_join(
            left,
            right,
            left_start="ls",
            left_end="le",
            right_start="rs",
            right_end="re_",
            bin_width_seconds=3600,  # smaller than many intervals: multi-bin pairs
            extra_on=[("lk", "rk")],
            payload_cols=["rid"],
        ).collect()
    )
    want = sorted(
        (li, ri)
        for lk, li, ls, le in lrows
        for rk, ri, rs, re in rrows
        if lk == rk and ls < re and rs < le
    )
    assert got == want  # exactly-once: no bin-induced duplicates


def test_overlap_join_drops_invalid_intervals(spark):
    import datetime as dt

    from omop_etl_spark.operators.temporal import overlap_join
    from pyspark.sql import Row

    t = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            Row(lid=1, ls=t, le=t + dt.timedelta(hours=1)),
            Row(lid=2, ls=t, le=None),
            Row(lid=3, ls=t + dt.timedelta(hours=2), le=t),  # inverted
        ]
    )
    right = spark.createDataFrame(
        [Row(rid=1, rs=t + dt.timedelta(minutes=30), re_=t + dt.timedelta(hours=3))]
    )
    got = overlap_join(
        left,
        right,
        left_start="ls",
        left_end="le",
        right_start="rs",
        right_end="re_",
        payload_cols=["rid"],
    ).collect()
    assert [(r["lid"], r["rid"]) for r in got] == [(1, 1)]


def test_scd2_lookup_matches_interval_join(spark):
    import datetime as dt

    from omop_etl_spark.operators.temporal import scd2_lookup
    from pyspark.sql import Row

    t0 = dt.datetime(2024, 1, 1)
    dim = spark.createDataFrame(
        [
            Row(k=1, state="a", valid_from=t0, version=1),
            Row(k=1, state="b", valid_from=t0 + dt.timedelta(days=10), version=2),
            Row(k=2, state="x", valid_from=t0 + dt.timedelta(days=5), version=1),
        ]
    )
    fact = spark.createDataFrame(
        [
            Row(fid=1, k=1, ts=t0 + dt.timedelta(days=3)),   # -> a/v1
            Row(fid=2, k=1, ts=t0 + dt.timedelta(days=10)),  # boundary -> b/v2
            Row(fid=3, k=1, ts=t0 + dt.timedelta(days=30)),  # open interval -> b/v2
            Row(fid=4, k=2, ts=t0),                          # before first -> NULL
        ]
    )
    got = {
        r["fid"]: (r["dim_state"], r["dim_version"])
        for r in scd2_lookup(fact, dim, ["k"], "ts").collect()
    }
    assert got == {
        1: ("a", 1),
        2: ("b", 2),
        3: ("b", 2),
        4: (None, None),
    }


def test_burst_dedup_chain_semantics(spark):
    import datetime as dt

    from omop_etl_spark.operators.temporal import burst_dedup

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # key A: chain 0s,2s,4s (one burst) then 600s (new burst)
        ("a", t0, 1),
        ("a", t0 + dt.timedelta(seconds=2), 2),
        ("a", t0 + dt.timedelta(seconds=4), 3),
        ("a", t0 + dt.timedelta(seconds=600), 4),
        # key B: 0s and 4s with gap 5s -> 4s is within the gap: one burst
        ("b", t0, 5),
        ("b", t0 + dt.timedelta(seconds=4), 6),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid int")
    out = sorted(
        r.eid
        for r in burst_dedup(df, ["k"], "ts", "5 seconds", tiebreak=["eid"]).collect()
    )
    assert out == [1, 4, 5]


def test_burst_dedup_exact_tie_keeps_tiebreak_winner(spark):
    import datetime as dt

    from omop_etl_spark.operators.temporal import burst_dedup

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", t0, 9), ("a", t0, 2), ("a", t0, 5)],
        "k string, ts timestamp, eid int",
    )
    out = [r.eid for r in burst_dedup(df, ["k"], "ts", "5 seconds", tiebreak=["eid"]).collect()]
    assert out == [2]


def test_apply_cdc_last_writer_and_delete(spark):
    from omop_etl_spark.operators.temporal import apply_cdc

    rows = [
        # key 1: insert, update, delete (delete wins -> absent)
        (1, 10, "I", "a"),
        (1, 20, "U", "b"),
        (1, 30, "D", None),
        # key 2: delete then REINSERT later (insert wins)
        (2, 10, "D", None),
        (2, 20, "I", "z"),
        # key 3: out-of-order arrival, highest ord wins
        (3, 50, "U", "new"),
        (3, 40, "I", "old"),
    ]
    df = spark.createDataFrame(rows, "k int, seq int, op string, v string")
    got = {r.k: r.v for r in apply_cdc(df, ["k"], "seq").collect()}
    assert got == {2: "z", 3: "new"}


def test_apply_cdc_order_independent(spark):
    from omop_etl_spark.operators.temporal import apply_cdc

    rows = [(i % 7, i, ("D" if i % 11 == 0 else "U"), f"v{i}") for i in range(200)]
    df1 = spark.createDataFrame(rows, "k int, seq int, op string, v string")
    df2 = spark.createDataFrame(list(reversed(rows)), "k int, seq int, op string, v string")
    a = sorted(map(tuple, apply_cdc(df1, ["k"], "seq").collect()))
    b = sorted(map(tuple, apply_cdc(df2, ["k"], "seq").collect()))
    assert a == b


def test_upsert_merge_shape(spark):
    from omop_etl_spark.operators.temporal import upsert

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "k int, v string"
    )
    got = sorted(map(tuple, upsert(target, updates, ["k"]).collect()))
    assert got == [(1, "a"), (2, "B2"), (3, "c"), (4, "d")]


def test_segmented_cumsum_matches_python(spark):
    import random

    from omop_etl_spark.operators.temporal import segmented_cumsum

    rng = random.Random(8)
    rows = [
        (k, i, rng.randrange(-5, 20), rng.random() < 0.2)
        for k in range(6)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "k long, i long, v long, r boolean")
    got = {
        (x.k, x.i): (x.seg, x.cum)
        for x in segmented_cumsum(df, ["k"], ["i"], "v", "r").collect()
    }
    want = {}
    for k in range(6):
        seg, cum = 0, 0
        for kk, i, v, r in sorted(rows):
            if kk != k:
                continue
            if r:
                seg += 1
                cum = 0
            cum += v
            want[(k, i)] = (seg, cum)
    assert got == want


def test_resample_interp_exact(spark):
    """Interior gaps lerp with exact integer floor (negatives floor
    toward -inf, not zero); edges carry boundary values; per-key span."""
    import datetime as dt

    from omop_etl_spark.operators.temporal import resample_interp

    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 100),
        ("a", d(2024, 1, 4), 130),
        ("a", d(2024, 1, 6), -7),
        ("b", d(2024, 2, 10), 5),
    ]
    df = spark.createDataFrame(rows, "k string, day date, v long")
    got = [
        tuple(r)
        for r in resample_interp(df, ["k"], "day", "v").orderBy("k", "day").collect()
    ]
    assert got == [
        ("a", d(2024, 1, 1), True, 100),
        ("a", d(2024, 1, 2), False, 110),
        ("a", d(2024, 1, 3), False, 120),
        ("a", d(2024, 1, 4), True, 130),
        # floor((130*1 + -7*1)/2) = floor(61.5) = 61
        ("a", d(2024, 1, 5), False, 61),
        ("a", d(2024, 1, 6), True, -7),
        # key b never inherits key a's span
        ("b", d(2024, 2, 10), True, 5),
    ]
    # negative-lerp floors toward -inf: 0 .. -7 over 3 days
    df2 = spark.createDataFrame(
        [("c", d(2024, 1, 1), 0), ("c", d(2024, 1, 4), -7)],
        "k string, day date, v long",
    )
    vals = [
        r["interp_value"]
        for r in resample_interp(df2, ["k"], "day", "v").orderBy("day").collect()
    ]
    # floor(-7/3) = -3, floor(-14/3) = -5
    assert vals == [0, -3, -5, -7]
