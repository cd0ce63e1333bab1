"""Generate a distribution-preserving scaled copy of an sf directory.

Purpose: the sf1 scale-growth probe (VERDICT r7 #4). The driver ships
sf<=0.1; measuring how query time GROWS with data needs a bigger input
whose distributions match, so the probe measures the engine, not a
different workload. Strategy: tile the source sf ``k`` times, each
replica key-offset into its own id range, with two twists that keep
per-replica structure identical while preventing cross-replica
collapse:

* ``documents.text``: replica ``i > 0`` rewrites every token ``t`` to
  ``t + str(i)``. Within a replica the exact/near-dup structure of the
  original corpus is preserved verbatim; across replicas NO shingle is
  shared, so the corpus-wide duplicate RATE is constant in SF — which
  is what a bigger crawl of the same distribution looks like. (Vocab
  grows k-fold; real vocab growth is sublinear, so vocab-keyed
  aggregates are measured pessimistically — an upper bound.)
  ``n_chars`` is recomputed from the rewritten text.
* ``embeddings.embedding``: replica ``i`` applies a seeded dimension
  permutation — norms and intra-replica geometry survive, while
  cross-replica cosines decorrelate, so near-dup pair counts scale
  linearly instead of quadratically.

Foreign keys are offset by their DIMENSION's own ``max+1`` (custkey by
customer's, partkey by part's, ...), so every join fan-out is exactly
the original's. region/nation stay single-copy (true dimensions);
nationkey/regionkey references are left untouched.

Output layout: ``<out>/<table>.parquet`` is a DIRECTORY of per-replica
part files — ``spark.read.parquet`` consumes it exactly like the
driver's single files, with better input-split parallelism.

Usage: python scripts/gen_scale_testdata.py [src_dir] [out_dir] [k]
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

#: key FAMILY -> (owning table, owning column). Every column whose name
#: ends with the family suffix is offset by i * (max(owning col) + 1).
FAMILIES = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

DIM_ONLY = {"region", "nation"}  # copied once, never tiled


def family_of(col: str) -> str | None:
    for fam in FAMILIES:
        if col.endswith(fam):
            return fam
    return None


def main() -> None:
    src, out = Path(SRC), Path(OUT)
    out.mkdir(parents=True, exist_ok=True)
    tables = {p.stem: p for p in src.glob("*.parquet")}

    base: dict[str, int] = {}
    for fam, (tname, col) in FAMILIES.items():
        t = pq.read_table(tables[tname], columns=[col])
        base[fam] = pc.max(t.column(col)).as_py() + 1

    for name, path in sorted(tables.items()):
        dest = out / f"{name}.parquet"
        dest.mkdir(exist_ok=True)
        t = pq.read_table(path)
        if name in DIM_ONLY:
            pq.write_table(t, dest / "part-0.parquet")
            print(f"{name}: dim copied once ({t.num_rows} rows)", flush=True)
            continue
        for i in range(K):
            cols = []
            names = []
            for col in t.column_names:
                arr = t.column(col)
                fam = family_of(col)
                if fam is not None and i > 0:
                    arr = pc.add(arr, i * base[fam])
                if name == "documents" and col == "text" and i > 0:
                    texts = [
                        " ".join(tok + str(i) for tok in s.split(" "))
                        for s in arr.to_pylist()
                    ]
                    arr = pa.array(texts, type=pa.string())
                if name == "embeddings" and col == "embedding" and i > 0:
                    vecs = arr.to_pylist()
                    dim = len(vecs[0])
                    perm = list(range(dim))
                    random.Random(1000 + i).shuffle(perm)
                    arr = pa.array(
                        [[v[p] for p in perm] for v in vecs],
                        type=t.schema.field("embedding").type,
                    )
                cols.append(arr)
                names.append(col)
            rt = pa.table(dict(zip(names, cols)))
            if name == "documents":
                # n_chars must describe the (possibly rewritten) text
                nc = pa.array(
                    [len(s) for s in rt.column("text").to_pylist()],
                    type=pa.int64(),
                )
                rt = rt.set_column(
                    rt.column_names.index("n_chars"), "n_chars", nc
                )
            pq.write_table(rt, dest / f"part-{i}.parquet")
        print(f"{name}: tiled x{K} ({t.num_rows * K} rows)", flush=True)


if __name__ == "__main__":
    main()
