"""Registry-wide plan sweep: duplicate-scan and red-flag audit.

For every ``__spark_entry__.queries()`` entry, builds the frame
(construction runs any eager checkpoints, exactly as a gate run would)
and audits the INITIAL executed plan: FileScan references per input
path (duplicate full passes), exchange count, InMemoryTableScan count
(cached-subtree printing, NOT re-derivation), and the red-flag nodes
the plan-quality suite bans. Prints one line per query, sorted by the
max per-file scan count, so re-derivation stragglers surface first.

Usage: python scripts/plan_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def audit(plan: str) -> dict:
    scans = Counter()
    for m in re.finditer(r"Location: [^\[\n]*\[([^\]]*)\]", plan):
        loc = m.group(1).split(",")[0]
        scans[Path(loc).name or loc] += 1
    flags = []
    if "CartesianProduct" in plan:
        flags.append("cartesian")
    if "BatchEvalPython" in plan:
        flags.append("BatchEvalPython")
    return {
        "scans": dict(scans),
        "max_scan": max(scans.values(), default=0),
        "total_scans": sum(scans.values()),
        "exchanges": plan.count("Exchange"),
        "inmem": plan.count("InMemoryTableScan"),
        "flags": flags,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("plan-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows.append((name, audit(plan)))
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            rows.append((name, {"error": str(exc)[:120]}))

    rows.sort(key=lambda r: -(r[1].get("max_scan", 0)))
    for name, a in rows:
        if "error" in a:
            print(f"{name:36s} ERROR {a['error']}")
            continue
        dup = {k: v for k, v in a["scans"].items() if v > 1}
        print(
            f"{name:36s} scans={a['total_scans']:3d} max={a['max_scan']:2d} "
            f"exch={a['exchanges']:3d} inmem={a['inmem']:2d} "
            f"flags={','.join(a['flags']) or '-'} dup={dup or '-'}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
