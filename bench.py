"""Benchmark runner: times every headline query at the target scale.

Prints ONE JSON line:
``{"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}``

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def _load1() -> float:
    try:
        return round(os.getloadavg()[0], 1)
    except OSError:  # pragma: no cover - platform without getloadavg
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # load at START as well as end (VERDICT r17 #2): the r17 32-core
    # run regressed 26 untouched queries up to 4x purely from neighbor
    # load, and a single end-of-run load1 could not prove it
    load1_start = _load1()
    t_run0 = time.perf_counter()

    from omop_etl_spark.conf import apply_recommended

    spark = (
        apply_recommended(
            SparkSession.builder.master(f"local[{cpus}]"), int(cpus)
        )
        .config("spark.sql.warehouse.dir", "/tmp/bench-wh")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("omop-etl-spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup outside the timings: JVM/codegen spin-up, parquet footer
    # reads, and the engine's one-time catalog registration are session
    # setup, not query latency
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        entrymod._engine(spark, sf_dir)
        for t in ("documents", "embeddings", "events"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()
    except Exception as exc:  # noqa: BLE001 - warmup is best-effort
        print(f"# warmup failed: {exc}", file=sys.stderr)

    def _identity(batches):
        yield from batches

    # spin up one python worker per core (Arrow UDF queries otherwise
    # pay interpreter+numpy import inside their first timed task)
    spark.range(256).repartition(int(cpus)).mapInPandas(
        _identity, "id long"
    ).count()

    def timed(fn, d: str) -> float:
        # the whole query — plan construction, any eager pipeline
        # materialization inside fn, and a FULL evaluation of every
        # output column through the noop sink — is inside the window.
        # A bare .count() would let Catalyst prune unused projections,
        # collapsing map-only queries (text_quality, doc_fingerprint,
        # ...) to a parquet metadata row count (ADVICE r1).
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # fixed canary (VERDICT r17 #2): a constant pure-CPU computation
    # (no I/O, no engine code) timed every CANARY_EVERY queries. Its
    # samples move with HOST CONTENTION only, so a judge can separate
    # "the code got slower" from "the box was busy" per run segment —
    # the discrimination the r17 round lacked until an accidental
    # 8-core control run supplied it.
    CANARY_EVERY = 20

    def canary() -> float:
        t0 = time.perf_counter()
        spark.range(2_000_000_000).selectExpr("sum(id % 7)").collect()
        return round(time.perf_counter() - t0, 3)

    # best-of-N per query: the host is shared and single runs swing
    # 2-4x with neighbor load; the minimum measures the engine
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    canaries: list[float] = []
    # per-query isolation: one broken query must not kill the whole
    # bench (BENCH_r03/r04 were rc=1 with no numbers because a single
    # AnalysisException escaped the warmup)
    for i, (name, fn) in enumerate(entrymod.queries().items()):
        if i % CANARY_EVERY == 0:
            canaries.append(canary())
        try:
            n = fn(spark, sf_dir).count()  # per-query warmup + row count
            timings[name] = min(timed(fn, sf_dir) for _ in range(runs))
            print(f"# {name}: {timings[name]}s rows={n}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 - record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
        finally:
            # between-query isolation (VERDICT r14 #7, same rationale
            # as scale_probe.py): drop this query's persisted blocks so
            # loop-heavy queries later in the run don't time against
            # another query's lingering cache + GC pressure — the main
            # identified source of the 168-193 s round-over-round band
            spark.catalog.clearCache()
    canaries.append(canary())

    # control pass at sf0.01, BEST-OF-3 since r18 (VERDICT r17 #2: the
    # single-run control exists precisely to separate regression from
    # host load and failed at it — under contention it inflated
    # identically to the main pass; the minimum of 3 is load-robust at
    # a cost of ~2 extra minutes)
    small_dir = os.environ.get("SPARK_GRAFT_SMALL_SF_DIR", "/root/testdata/sf0.01")
    small_runs = int(os.environ.get("SPARK_GRAFT_BENCH_SMALL_RUNS", "3"))
    small: dict[str, float] = {}
    if os.path.isdir(small_dir) and os.path.abspath(small_dir) != os.path.abspath(
        sf_dir
    ):
        for name, fn in entrymod.queries().items():
            try:
                small[name] = min(timed(fn, small_dir) for _ in range(small_runs))
            except Exception:  # noqa: BLE001 - already recorded at full SF
                pass
            finally:
                spark.catalog.clearCache()

    # A failed query must not make the total look FASTER (ADVICE r5):
    # charge each error a fixed 60 s penalty so round-over-round `value`
    # comparisons stay honest even if only the aggregate is read.
    penalty = 60.0 * len(errors)
    total = round(sum(timings.values()) + penalty, 3)
    # The driver keeps only the last 2000 chars of output and parses the
    # final line as JSON (BENCH_r02 failed to parse when this line grew
    # past that with a second per-query map).  Keep stdout to ONE compact
    # line: short metric string, 2-decimal per-query times, no small-SF
    # map.  Full-precision detail (incl. the sf0.01 pass) goes to
    # bench_detail.json next to this script.
    # host-load indicator (VERDICT r7 #7): BENCH_r07 read 10% slower
    # than the builder's quiet run purely from neighbor load; the
    # 1-minute loadavg at bench end lets a reader separate noise from
    # regression without forensics (32 hardware threads -> load1 well
    # above 32 means contended numbers).
    load1 = _load1()
    wall_s = round(time.perf_counter() - t_run0, 1)
    can = sorted(canaries)
    canary_stats = {
        "n": len(can),
        "min": can[0],
        "med": can[len(can) // 2],
        "max": can[-1],
    }
    out = {
        "metric": f"total sec, all queries, best-of-{runs} noop-sink runs"
        + (", +60s/failed query" if errors else ""),
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf,
        "load1": load1,
        "load1_start": load1_start,
        "wall_s": wall_s,
        "canary": canary_stats,
    }
    if errors:
        out["errors"] = len(errors)
    detail = {
        "metric": out["metric"],
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "load1": load1,
        "load1_start": load1_start,
        "wall_s": wall_s,
        "canary_secs": canaries,
    }
    if errors:
        detail["errors"] = errors
    if small:
        ms = re.search(r"sf([\d.]+)", small_dir)
        detail["sf_small"] = float(ms.group(1)) if ms else -1.0
        detail["queries_small"] = small
        detail["value_small"] = round(sum(small.values()), 3)
    Path(__file__).resolve().parent.joinpath("bench_detail.json").write_text(
        json.dumps(detail, indent=1) + "\n"
    )
    line = json.dumps(out)
    if len(line) > 1900:  # too long for the driver's tail buffer: keep
        # only the slowest queries inline (the ones any perf audit
        # reads first); the full map is in bench_detail.json
        slowest = dict(
            sorted(out["queries"].items(), key=lambda kv: -kv[1])[:40]
        )
        out["queries"] = slowest
        out["note"] = (
            f"slowest 40 of {len(timings)} inline; full map in bench_detail.json"
        )
        line = json.dumps(out)
        if len(line) > 1900:  # pathological names: drop the map entirely
            out["queries"] = {}
            out["note"] = "per-query times in bench_detail.json"
            line = json.dumps(out)
    sys.stderr.flush()
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
