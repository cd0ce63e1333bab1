"""Tests for JSONL/CSV ingestion, partitioned writes, and the
streaming KMV sketch (batch/stream equivalence)."""

import os
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from omop_etl_spark.operators.sketches import kmv_distinct
from omop_etl_spark.sources import read_csv, read_jsonl, write_partitioned

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_read_jsonl_clean_and_corrupt(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en", "source": "web", "n_chars": 5}\n'
        '{"doc_id": 2, "text": "salut", "lang": "fr", "source": "web", "n_chars": 5}\n'
        "{this is not json}\n"
    )
    df = read_jsonl(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and corrupt[0]["doc_id"] is None
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]


def test_read_csv_explicit_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name,score\n1,alpha,2.5\n2,beta,oops_not_a_number\n3,gamma,7.0\n")
    df = read_csv(spark, str(p), "id bigint, name string, score double")
    rows = {r["id"]: r for r in df.collect() if r["id"] is not None}
    assert rows[1]["score"] == 2.5
    bad = [r for r in df.collect() if r["_corrupt_record"] is not None]
    assert len(bad) == 1


def test_write_partitioned_prunes_on_read(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(doc_id=i, source=("web" if i % 2 else "book"), n=i) for i in range(100)]
    )
    out = str(tmp_path / "part")
    write_partitioned(df, out, ["source"], max_records_per_file=10)
    # directory layout is hive-style
    assert os.path.isdir(os.path.join(out, "source=web"))
    back = spark.read.parquet(out).filter(F.col("source") == "web")
    assert back.count() == 50
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "source" in plan
    # maxRecordsPerFile bounded the shard size
    files = [
        f for f in os.listdir(os.path.join(out, "source=web")) if f.endswith(".parquet")
    ]
    assert len(files) >= 5


def test_stream_kmv_matches_batch(spark):
    from omop_etl_spark.sources import read_parquet_table
    from omop_etl_spark.streaming import read_events_stream, stream_kmv_distinct

    stream = read_events_stream(spark, EVENTS)
    q = (
        stream_kmv_distinct(stream, "event_type", "user_id", k=32)
        .writeStream.format("memory")
        .queryName("kmv_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_type"]: (r["n_kept"], r["est_distinct"])
        for r in spark.table("kmv_t").collect()
    }
    batch = read_parquet_table(spark, EVENTS, ns_columns=["ts"])
    want = {
        r["event_type"]: (r["n_kept"], r["est_distinct"])
        for r in kmv_distinct(batch, ["event_type"], "user_id", k=32).collect()
    }
    assert got == want and len(got) > 0


def test_stream_kmv_state_is_bounded_across_batches(spark, tmp_path):
    # two files arriving as separate micro-batches; final estimate must
    # equal the batch sketch over the union (state carries the k-mins)
    import pandas as pd

    d = tmp_path / "stream_in"
    d.mkdir()
    pd.DataFrame({"k": ["a"] * 60, "v": list(range(60))}).to_parquet(d / "f1.parquet")
    pd.DataFrame({"k": ["a"] * 60, "v": list(range(30, 90))}).to_parquet(
        d / "f2.parquet"
    )
    from omop_etl_spark.streaming import stream_kmv_distinct

    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_kmv_distinct(stream, "k", "v", k=16)
        .writeStream.format("memory")
        .queryName("kmv_multi")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("kmv_multi").collect()
    assert len(rows) == 2  # one emission per micro-batch
    final = rows[-1]
    batch_df = spark.createDataFrame(
        [Row(k="a", v=v) for v in range(90)]
    )
    want = kmv_distinct(batch_df, ["k"], "v", k=16).collect()[0]
    # emissions are append-ordered; the last one reflects all 90 values
    ests = sorted(r["est_distinct"] for r in rows)
    assert want["est_distinct"] in ests
    assert final["n_kept"] == 16


def test_ingest_stats_counts_partial_and_full_corruption(spark, tmp_path):
    from omop_etl_spark.sources import ingest_stats

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "web", "n_chars": 2}\n'
        '{"doc_id": "notint", "text": "partial", "lang": "en", "source": "web", "n_chars": 7}\n'
        "garbage line\n"
    )
    df = read_jsonl(spark, str(p))
    row = ingest_stats(df).collect()[0]
    assert row["n_rows"] == 3
    assert row["n_corrupt"] == 2  # partial type failure + full garbage
    assert row["n_unparsed"] == 1  # only the garbage line parsed nothing


def test_dq_monitor_stream_reports_per_batch(spark, tmp_path):
    import pandas as pd

    from omop_etl_spark.operators.quality import DQRule
    from omop_etl_spark.streaming import dq_monitor_stream

    d = tmp_path / "dq_in"
    d.mkdir()
    pd.DataFrame({"k": [1, 2, 3], "v": [1.0, -5.0, 2.0]}).to_parquet(d / "f1.parquet")
    pd.DataFrame({"k": [4, 4, 5], "v": [None, 3.0, 9.0]}).to_parquet(d / "f2.parquet")

    stream = (
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    rules = [
        DQRule("v_nonneg", "batch", "range", "v", lo=0.0),
        DQRule("k_unique", "batch", "unique", "k"),
    ]
    reports = []

    def sink(report, batch_id):
        reports.append({(r["rule_name"]): r.asDict() for r in report.collect()})

    q = dq_monitor_stream(stream, rules, "batch", sink).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    assert len(reports) == 2
    merged_viol = sorted(
        (b["v_nonneg"]["n_violations"], b["k_unique"]["n_violations"])
        for b in reports
    )
    # one batch has the -5.0 (range violation), the other has null v +
    # duplicate k=4 (range counts NULL as violation; unique counts both rows)
    assert merged_viol == [(1, 0), (1, 2)]
    assert all(b["v_nonneg"]["n_rows"] == 3 for b in reports)


def test_stream_latest_state_survives_out_of_order_batches(spark, tmp_path):
    import pandas as pd

    from omop_etl_spark.streaming import stream_latest_state

    d = tmp_path / "lww_in"
    d.mkdir()
    # batch 1 carries the NEWEST ord for key "a"; batch 2 arrives later
    # with older data — state must not regress
    pd.DataFrame({"k": ["a", "b"], "o": [100, 5], "v": ["new_a", "old_b"]}).to_parquet(
        d / "f1.parquet"
    )
    pd.DataFrame({"k": ["a", "b"], "o": [50, 10], "v": ["stale_a", "new_b"]}).to_parquet(
        d / "f2.parquet"
    )
    stream = (
        spark.readStream.schema("k string, o long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_latest_state(stream, "k", "o", "v")
        .writeStream.format("memory")
        .queryName("lww_s")
        # the JVM fast path is a streaming aggregation: update mode
        # (same per-batch emission set as the pandas path's append)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("lww_s").collect()
    # last emission per key wins (update mode emits per batch)
    final = {}
    for r in rows:
        final[r["k"]] = (r["o"], r["v"])
    assert final == {"a": (100, "new_a"), "b": (10, "new_b")}


def test_stream_latest_state_max_struct_recovery(spark, tmp_path):
    """The driver gate's final-state recovery contract
    (events_latest_state_stream): with update-mode emissions across
    MULTIPLE micro-batches, ``max(struct(ord, value))`` equals the last
    emission per key — valid because the state is monotone under the
    operator's own (ord, value-with-NULL-losing) total order. Probed
    here including the NULL-tie case (struct comparison sorts NULL
    first, so NULL loses in max — the same rule as the operator)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from omop_etl_spark.streaming import stream_latest_state

    d = tmp_path / "lww_rec"
    d.mkdir()
    pd.DataFrame(
        {"k": ["a", "b", "c"], "o": [7, 5, 1], "v": [None, "mid_b", "c1"]}
    ).to_parquet(d / "f1.parquet")
    pd.DataFrame(
        {"k": ["a", "b", "c"], "o": [7, 9, 2], "v": ["tie_a", "new_b", None]}
    ).to_parquet(d / "f2.parquet")
    stream = (
        spark.readStream.schema("k string, o long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_latest_state(stream, "k", "o", "v")
        .writeStream.format("memory")
        .queryName("lww_rec")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["k"]: (r["o"], r["v"])
        for r in spark.table("lww_rec")
        .groupBy("k")
        .agg(F.max(F.struct("o", "v")).alias("w"))
        .select("k", "w.o", "w.v")
        .collect()
    }
    # a: ord tie 7 — the non-NULL value wins in state AND in recovery;
    # b: higher ord wins; c: higher ord wins even with a NULL value
    assert got == {"a": (7, "tie_a"), "b": (9, "new_b"), "c": (2, None)}


def test_read_fixed_width(spark, tmp_path):
    from omop_etl_spark.sources import read_fixed_width

    p = tmp_path / "fw.txt"
    p.write_text(
        "00123Alice     019.5\n"
        "00456Bob       BADNUM\n"
        "00789          003.25\n"
    )
    df = read_fixed_width(
        spark,
        str(p),
        [("id", 1, 5, "bigint"), ("name", 6, 15, "string"), ("score", 16, 21, "double")],
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows[123]["name"] == "Alice" and rows[123]["score"] == 19.5
    assert rows[456]["score"] is None  # bad numeric -> NULL, not a killed task
    assert rows[789]["name"] is None  # all-blank field -> NULL


def test_load_dq_rules_yaml(spark):
    from omop_etl_spark.operators.quality import dq_profile, load_dq_rules
    from pyspark.sql import Row

    yaml_text = """
rules:
  - {name: s_domain, table: t, kind: in_set, column: s, values: [x, y]}
  - {name: n_range, table: t, kind: range, column: n, lo: 0}
"""
    rules = load_dq_rules(yaml_text)
    df = spark.createDataFrame([Row(s="x", n=1), Row(s="z", n=-2)])
    out = {r["rule_name"]: r["n_violations"] for r in dq_profile({"t": df}, rules).collect()}
    assert out == {"s_domain": 1, "n_range": 1}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown keys"):
        load_dq_rules("rules:\n  - {name: a, table: t, kind: not_null, column: c, typo: 1}")
    with _pytest.raises(ValueError, match="missing required"):
        load_dq_rules("rules:\n  - {name: a, table: t, kind: not_null}")


def test_stream_latest_state_tie_resolution_batching_independent(spark, tmp_path):
    """ADVICE r6 (+ r17 engine parity): duplicate ord keys must resolve
    to the same survivor whether they arrive in one micro-batch or
    split across two — the (ord, value) lexicographic tiebreak, NULL
    lowest — and the pure-JVM max(struct) path must agree with the
    pandas-state path row-for-row (the two formulations of the same
    monotone argmax)."""
    import pandas as pd

    from omop_etl_spark.streaming import stream_latest_state

    def run(qname, frames, engine):
        d = tmp_path / qname
        d.mkdir()
        for i, f in enumerate(frames):
            pd.DataFrame(f).to_parquet(d / f"f{i}.parquet")
        stream = (
            spark.readStream.schema("k string, o long, v string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        q = (
            stream_latest_state(stream, "k", "o", "v", engine=engine)
            .writeStream.format("memory")
            .queryName(qname)
            # JVM path = streaming aggregation -> update; pandas path
            # = applyInPandasWithState -> append
            .outputMode("update" if engine == "jvm" else "append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        final = {}
        for r in spark.table(qname).collect():
            final[r["k"]] = (r["o"], r["v"])
        return final

    rows = {"k": ["a", "a", "a"], "o": [7, 7, 7], "v": ["zebra", None, "apple"]}
    split_frames = [
        {"k": ["a"], "o": [7], "v": ["apple"]},
        {"k": ["a", "a"], "o": [7, 7], "v": [None, "zebra"]},
    ]
    results = {
        eng: (
            run(f"lww_tie_one_{eng}", [rows], eng),
            run(f"lww_tie_split_{eng}", split_frames, eng),
        )
        for eng in ("jvm", "pandas")
    }
    for eng, (one_batch, split) in results.items():
        assert one_batch == split == {"a": (7, "zebra")}, eng


def test_stream_cm_sketch_prefix_equals_batch(spark, tmp_path):
    """The count-min sketch is a pure sum over (row, bucket) cells, so
    the BATCH operator is already a valid streaming aggregation: run
    cm_sketch_counts directly on a stream in update mode and after
    every micro-batch the folded state (last emission per cell) must
    equal the batch sketch over the prefix. No custom state code — the
    mergeable-cells property IS the streaming design."""
    import os

    import pandas as pd

    from omop_etl_spark.operators.sketches import cm_sketch_counts

    d = tmp_path / "cm_in"
    d.mkdir()
    batches = [
        pd.DataFrame({"term": ["spark"] * 5 + ["flink", "duck"]}),
        pd.DataFrame({"term": ["spark"] * 3 + ["duck"] * 4}),
        pd.DataFrame({"term": ["trino", "spark", "duck"]}),
    ]
    paths = []
    for i, pdf in enumerate(batches):
        p = d / f"b{i}.parquet"
        pdf.to_parquet(p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        paths.append(str(p))

    stream = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d))
    )
    emitted = []

    def capture(bdf, bid):
        for r in bdf.collect():
            emitted.append((bid, r["row"], r["bucket"], r["cnt"]))

    q = (
        cm_sketch_counts(stream, "term", depth=4, width=64)
        .writeStream.outputMode("update")
        .foreachBatch(capture)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert max(b for b, *_ in emitted) + 1 == 3

    for upto in range(3):
        folded = {}
        for bid, row, bucket, cnt in emitted:
            if bid <= upto:
                folded[(row, bucket)] = cnt
        prefix = spark.read.parquet(*paths[: upto + 1])
        want = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cm_sketch_counts(prefix, "term", depth=4, width=64).collect()
        }
        assert folded == want, f"prefix {upto}: stream != batch sketch"


def test_stream_logq_matches_batch(spark):
    """Streaming log-quantile sketch == batch logq_quantiles on the
    same prefix: identical (n, p50 estimate) per event type."""
    from pyspark.sql import functions as F

    from omop_etl_spark.operators.sketches import logq_buckets, logq_quantiles
    from omop_etl_spark.sources import read_parquet_table
    from omop_etl_spark.streaming import read_events_stream, stream_logq_quantile

    stream = read_events_stream(spark, EVENTS).select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    q = (
        stream_logq_quantile(stream, "event_type", "cents", m=5)
        .writeStream.format("memory")
        .queryName("logq_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("logq_t").collect()
    # keep the final (largest-n) emission per key across micro-batches
    got = {}
    for r in rows:
        if r["event_type"] not in got or r["n"] > got[r["event_type"]][0]:
            got[r["event_type"]] = (r["n"], r["q_est"])
    batch = read_parquet_table(spark, EVENTS, ns_columns=["ts"]).select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    want = {
        r["event_type"]: (r["n"], r["q1_2"])
        for r in logq_quantiles(
            logq_buckets(batch, ["event_type"], "cents", m=5),
            ["event_type"],
            [(1, 2)],
            m=5,
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stream_logq_state_carries_across_batches(spark, tmp_path):
    """Two files as separate micro-batches: the final estimate equals
    the batch sketch over the union (registers accumulate in state),
    and nonpositive values are ignored like the batch operator."""
    import pandas as pd

    from omop_etl_spark.operators.sketches import logq_buckets, logq_quantiles
    from omop_etl_spark.streaming import stream_logq_quantile

    d = tmp_path / "logq_in"
    d.mkdir()
    pd.DataFrame({"k": ["a"] * 51, "v": list(range(-25, 26))}).to_parquet(
        d / "f1.parquet"
    )
    pd.DataFrame({"k": ["a"] * 50, "v": list(range(100, 150))}).to_parquet(
        d / "f2.parquet"
    )
    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_logq_quantile(stream, "k", "v", m=5, quantile=(9, 10))
        .writeStream.format("memory")
        .queryName("logq_multi")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(spark.table("logq_multi").collect(), key=lambda r: r["n"])
    assert len(rows) >= 2 and rows[-1]["n"] == 75  # 25 positive + 50
    both = spark.createDataFrame(
        [("a", v) for v in list(range(-25, 26)) + list(range(100, 150))],
        "k string, v long",
    )
    want = logq_quantiles(
        logq_buckets(both, ["k"], "v", m=5), ["k"], [(9, 10)], m=5
    ).collect()[0]
    assert (rows[-1]["n"], rows[-1]["q_est"]) == (want["n"], want["q9_10"])


def test_no_ttl_streaming_reducers_are_pure_jvm_plans(spark, tmp_path):
    """r17 plan guard: the no-TTL reducers must compile to built-in
    streaming operators (Aggregate / Deduplicate) with NO Python node
    anywhere in the plan — the whole point of the JVM fast paths is
    that a 5M-live-key stream never crosses the Python boundary, and
    a silent regression back to FlatMapGroupsInPandasWithState would
    reintroduce the ~90 µs/key/batch dispatch without failing any
    value test."""
    import pandas as pd

    from omop_etl_spark.streaming import (
        stream_cdc_state,
        stream_dedup,
        stream_latest_state,
        stream_logq_buckets,
    )

    d = tmp_path / "plan_in"
    d.mkdir()
    pd.DataFrame(
        {"k": ["a"], "o": [1], "v": ["x"], "op": ["I"]}
    ).to_parquet(d / "f.parquet")
    stream = spark.readStream.schema(
        "k string, o long, v string, op string"
    ).parquet(str(d))
    plans = {
        "latest_state": stream_latest_state(stream, "k", "o", "v"),
        "cdc_state": stream_cdc_state(stream, "k", "o", "v", op_col="op"),
        "dedup": stream_dedup(stream.select("k"), ["k"], ttl_minutes=None),
        "logq_buckets": stream_logq_buckets(stream, "k", "o", m=5),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().analyzed().toString()
        assert "FlatMapGroupsInPandasWithState" not in plan, name
        assert "pythonudf" not in plan.lower(), name
        want = "Deduplicate" if name == "dedup" else "Aggregate"
        assert want in plan, (name, plan[:500])
    # the pandas formulations are still available where asked for
    pandas_plan = stream_latest_state(
        stream, "k", "o", "v", engine="pandas"
    )._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandasWithState" in pandas_plan


def test_stream_logq_buckets_jvm_registers_match_batch(spark, tmp_path):
    """r17 JVM register path: the streaming groupBy(key, bucket)
    counts in update mode are cumulative and nondecreasing, so the
    max(c)-per-register recovery equals the batch sketch over the
    union — and quantiles read off the recovered registers with the
    batch logq_quantiles match the batch path exactly. No Python
    worker anywhere in the streaming plan (it is a plain streaming
    aggregation)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from omop_etl_spark.operators.sketches import logq_buckets, logq_quantiles
    from omop_etl_spark.streaming import stream_logq_buckets

    d = tmp_path / "logq_jvm_in"
    d.mkdir()
    pd.DataFrame({"k": ["a"] * 51, "v": list(range(-25, 26))}).to_parquet(
        d / "f1.parquet"
    )
    pd.DataFrame({"k": ["a"] * 50 + ["b"] * 3, "v": list(range(100, 150)) + [7, 7, 9]}).to_parquet(
        d / "f2.parquet"
    )
    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_logq_buckets(stream, "k", "v", m=5)
        .writeStream.format("memory")
        .queryName("logq_jvm")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    sink = spark.table("logq_jvm")
    recovered = sink.groupBy("k", "bucket").agg(F.max("c").alias("c"))
    both = spark.createDataFrame(
        [("a", v) for v in list(range(-25, 26)) + list(range(100, 150))]
        + [("b", 7), ("b", 7), ("b", 9)],
        "k string, v long",
    )
    want_reg = {
        (r["k"], r["bucket"]): r["c"]
        for r in logq_buckets(both, ["k"], "v", m=5).collect()
    }
    got_reg = {(r["k"], r["bucket"]): r["c"] for r in recovered.collect()}
    assert got_reg == want_reg and len(got_reg) > 0
    got_q = {
        r["k"]: (r["n"], r["q1_2"])
        for r in logq_quantiles(recovered, ["k"], [(1, 2)], m=5).collect()
    }
    want_q = {
        r["k"]: (r["n"], r["q1_2"])
        for r in logq_quantiles(
            logq_buckets(both, ["k"], "v", m=5), ["k"], [(1, 2)], m=5
        ).collect()
    }
    assert got_q == want_q


def test_stream_interval_union_matches_batch(spark, tmp_path):
    """Prefix-exact streaming/batch equivalence for busy-time islands,
    with OUT-OF-ORDER arrival across micro-batches (round 11)."""
    import pandas as pd

    from omop_etl_spark.operators.temporal import interval_union
    from omop_etl_spark.streaming import stream_interval_union

    rng = random.Random(23)
    rows = []
    for k in ("a", "b"):
        for _ in range(120):
            s = rng.randrange(0, 5_000)
            rows.append((k, s, s + rng.randrange(1, 400)))
    rng.shuffle(rows)  # out of order everywhere
    d = tmp_path / "iv_stream"
    d.mkdir()
    pd.DataFrame(rows[:120], columns=["k", "s", "e"]).to_parquet(d / "f1.parquet")
    pd.DataFrame(rows[120:], columns=["k", "s", "e"]).to_parquet(d / "f2.parquet")

    stream = (
        spark.readStream.schema("k string, s long, e long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_interval_union(stream, "k", "s", "e")
        .writeStream.format("memory")
        .queryName("iv_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emissions = spark.table("iv_t").collect()
    assert len(emissions) == 4  # 2 keys x 2 micro-batches

    batch_df = spark.createDataFrame(rows, "k string, s long, e long")
    want_full = {
        r.k: (r.n_islands, r.covered, r.max_island)
        for r in interval_union(batch_df, "k", "s", "e").collect()
    }
    # each key emits exactly the batch answers of the two prefixes
    # (memory-sink row order across batches is not guaranteed, so
    # compare as sets): prefix exactness, not just final convergence
    prefix_df = spark.createDataFrame(rows[:120], "k string, s long, e long")
    want_prefix = {
        r.k: (r.n_islands, r.covered, r.max_island)
        for r in interval_union(prefix_df, "k", "s", "e").collect()
    }
    got = {}
    for r in emissions:
        got.setdefault(r.k, set()).add((r.n_islands, r.covered, r.max_island))
    for k in want_full:
        assert got[k] == {want_prefix[k], want_full[k]}, k


def test_stream_interval_union_jvm_engine_matches_batch(spark, tmp_path):
    """The r18 jvm engine (dynamic-gap session_window, one row per
    island, complete mode) rolls up to exactly the batch
    interval_union — including TOUCHING intervals (end == next start
    must fuse: session merge-at-touch equals the island rule) and
    out-of-order multi-batch arrival."""
    import pandas as pd
    from pyspark.sql import functions as F

    from omop_etl_spark.operators.temporal import interval_union
    from omop_etl_spark.streaming import stream_interval_union

    rng = random.Random(29)
    rows = []
    for k in ("a", "b"):
        for _ in range(120):
            s = rng.randrange(0, 5_000)
            rows.append((k, s, s + rng.randrange(1, 400)))
    # deliberate exact-touch chain and an isolated island per key
    rows += [("a", 9_000, 9_010), ("a", 9_010, 9_020), ("a", 20_000, 20_001),
             ("b", 9_005, 9_010), ("b", 9_010, 9_011)]
    rng.shuffle(rows)
    d = tmp_path / "iv_jvm"
    d.mkdir()
    pd.DataFrame(rows[:120], columns=["k", "s", "e"]).to_parquet(d / "f1.parquet")
    pd.DataFrame(rows[120:], columns=["k", "s", "e"]).to_parquet(d / "f2.parquet")
    stream = (
        spark.readStream.schema("k string, s long, e long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_interval_union(stream, "k", "s", "e", engine="jvm")
        .writeStream.format("memory")
        .queryName("iv_jvm_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ln = F.col("island_end") - F.col("island_start")
    got = {
        r.k: (r.n_islands, r.covered, r.max_island)
        for r in spark.table("iv_jvm_t")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(ln).alias("covered"),
            F.max(ln).alias("max_island"),
        )
        .collect()
    }
    batch_df = spark.createDataFrame(rows, "k string, s long, e long")
    want = {
        r.k: (r.n_islands, r.covered, r.max_island)
        for r in interval_union(batch_df, "k", "s", "e").collect()
    }
    assert got == want
