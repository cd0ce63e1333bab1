"""sf10-tier VALUE checks for the text-dedup family (r17, extending
check_sf10_embed_graph.py's independent-oracle tier to the family the
r16 sweep explicitly could NOT reach: the gram-join DuckDB oracles go
super-linear at 500k docs — LOCALCHECK_r16).

Independent exact replay, driver-side, of the registry oracles' pinned
semantics over the raw parquet:

* Shingles exactly as ``operators.dedup.token_shingles`` / the DuckDB
  ``_duck_shingles`` spec: single-space split (empties kept), distinct
  word 3-grams, whole text for short docs — interned to int ids, one
  sorted numpy array per doc.
* The GRAM-JOIN identity (the oracle's own spec, not Spark's
  prefix-filter implementation): intersection counts for every doc
  pair sharing >= 1 shingle, accumulated per shingle block in numpy
  (packed 64-bit pair keys, chunked np.unique). Thresholds are exact
  integer tests (J >= 4/5 <=> 5*ti >= 4*union), so no float ever
  decides membership; reported scores replay DuckDB's HALF_UP round.
* MinHash-LSH bit-for-bit: the same md5-derived 31-bit shingle hash,
  the package's own seeded affine family (imported, not copied),
  2-row/8-band banding, the 256-cap star-link, exact-Jaccard verify.
* SimHash bit-for-bit: 32-bit majority-vote signatures; ALL pairs at
  hamming <= 3 found exactly by probing every <=3-bit xor mask (5488
  masks) against the sorted unique-signature array — no banding
  heuristic shared with the implementation under test.
* Connected components + survivor election via union-find (min-id
  labeling, survivor = own cluster id) for the *_clusters gates.

Self-validation protocol (same as the embed/graph checker): run at
sf0.01 and sf1 first, where the gates are DuckDB-driver-green; only a
replay that matches there is trusted at sf10.

Usage: python scripts/check_sf10_dedup.py [sf_dir] [gate ...]
"""

from __future__ import annotations

import hashlib
import sys
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

MERSENNE = (1 << 31) - 1

CHECKS = {}


def check(name):
    def deco(fn):
        CHECKS[name] = fn
        return fn

    return deco


def _round6(x: float) -> float:
    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _rows(df) -> list[tuple]:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return sorted(
        (tuple(t) for t in pdf[cols].itertuples(index=False, name=None)), key=repr
    )


def _want_rows(cols_to_vals: dict[str, list]) -> list[tuple]:
    cols = sorted(cols_to_vals)
    n = len(next(iter(cols_to_vals.values())))
    return sorted(
        (tuple(cols_to_vals[c][i] for c in cols) for i in range(n)), key=repr
    )


def _diff(got: list[tuple], want: list[tuple], name: str) -> bool:
    if got == want:
        print(f"PASS {name}: rows={len(got)}")
        return True
    only_g = [r for r in got if r not in set(want)][:3]
    only_w = [r for r in want if r not in set(got)][:3]
    print(
        f"FAIL {name}: got {len(got)} want {len(want)}; "
        f"got-only {only_g} want-only {only_w}"
    )
    return False


# ---------------------------------------------------------------------------
# corpus loading + shingling (shared, cached per sf_dir)

_CORPUS: dict[str, tuple] = {}


def _corpus(sf_dir: str):
    """(doc_ids int64[n], shingle_texts list[str] by id, per-doc sorted
    int32 shingle-id arrays, flat ids, flat doc index, offsets)."""
    if sf_dir in _CORPUS:
        return _CORPUS[sf_dir]
    import glob

    import pyarrow.parquet as pq

    path = f"{sf_dir}/documents.parquet"
    files = sorted(glob.glob(f"{path}/*.parquet")) or [path]
    ids_l, sets_l = [], []
    intern: dict[str, int] = {}
    for f in files:
        t = pq.read_table(f, columns=["doc_id", "text"])
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = text.split(" ")  # single-space split, empties kept
            if len(toks) >= 3:
                grams = {
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                }
            else:
                grams = {" ".join(toks)}
            arr = np.empty(len(grams), dtype=np.int64)
            for k, g in enumerate(grams):
                gid = intern.get(g)
                if gid is None:
                    gid = len(intern)
                    intern[g] = gid
                arr[k] = gid
            arr.sort()
            ids_l.append(did)
            sets_l.append(arr)
    doc_ids = np.asarray(ids_l, dtype=np.int64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    sets_l = [sets_l[i] for i in order]
    texts = [None] * len(intern)
    for g, gid in intern.items():
        texts[gid] = g
    sizes = np.asarray([a.shape[0] for a in sets_l], dtype=np.int64)
    flat = np.concatenate(sets_l)
    flat_doc = np.repeat(np.arange(doc_ids.shape[0]), sizes)
    print(
        f"# {sf_dir}: {doc_ids.shape[0]} docs, {len(intern)} distinct "
        f"shingles, {flat.shape[0]} postings",
        file=sys.stderr,
    )
    _CORPUS[sf_dir] = (doc_ids, texts, sets_l, sizes, flat, flat_doc)
    return _CORPUS[sf_dir]


_INTER: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}


def _intersections(sf_dir: str):
    """The gram-join: (ia, ib, ti) over LOCAL doc indices (ia < ib),
    one row per doc pair sharing >= 1 shingle. Chunked numpy: per
    shingle block, emit packed 64-bit pair keys; np.unique with counts
    per chunk; merge chunks with a final unique-sum."""
    if sf_dir in _INTER:
        return _INTER[sf_dir]
    doc_ids, _, _, _, flat, flat_doc = _corpus(sf_dir)
    order = np.argsort(flat, kind="stable")
    g_sorted = flat[order]
    d_sorted = flat_doc[order]
    # block boundaries per shingle
    starts = np.flatnonzero(np.r_[True, g_sorted[1:] != g_sorted[:-1]])
    ends = np.r_[starts[1:], g_sorted.shape[0]]
    dfs = ends - starts
    pair_total = int(np.sum(dfs * (dfs - 1) // 2))
    print(f"# gram-join pair volume: {pair_total}", file=sys.stderr)
    keys_chunks, budget, cur = [], 30_000_000, []
    cur_n = 0
    for s, e in zip(starts, ends):
        k = e - s
        if k < 2:
            continue
        block = np.sort(d_sorted[s:e])
        ii, jj = np.triu_indices(k, k=1)
        keys = (block[ii].astype(np.int64) << 32) | block[jj].astype(np.int64)
        cur.append(keys)
        cur_n += keys.shape[0]
        if cur_n >= budget:
            u, c = np.unique(np.concatenate(cur), return_counts=True)
            keys_chunks.append((u, c))
            cur, cur_n = [], 0
    if cur:
        u, c = np.unique(np.concatenate(cur), return_counts=True)
        keys_chunks.append((u, c))
    if not keys_chunks:
        out = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
        _INTER[sf_dir] = out
        return out
    allk = np.concatenate([u for u, _ in keys_chunks])
    allc = np.concatenate([c for _, c in keys_chunks])
    order2 = np.argsort(allk, kind="stable")
    allk, allc = allk[order2], allc[order2]
    starts2 = np.flatnonzero(np.r_[True, allk[1:] != allk[:-1]])
    ti = np.add.reduceat(allc, starts2)
    uk = allk[starts2]
    ia = (uk >> 32).astype(np.int64)
    ib = (uk & 0xFFFFFFFF).astype(np.int64)
    _INTER[sf_dir] = (ia, ib, ti)
    return _INTER[sf_dir]


# ---------------------------------------------------------------------------
# gates


@check("ngram_jaccard_pairs")
def _c_jaccard(spark, sf_dir, qs):
    doc_ids, _, _, sizes, _, _ = _corpus(sf_dir)
    ia, ib, ti = _intersections(sf_dir)
    union = sizes[ia] + sizes[ib] - ti
    keep = 5 * ti >= 4 * union  # J >= 0.8, exact integers
    want = _want_rows(
        {
            "id_a": doc_ids[ia[keep]].tolist(),
            "id_b": doc_ids[ib[keep]].tolist(),
            "jaccard": [
                _round6(t / u) for t, u in zip(ti[keep], union[keep])
            ],
        }
    )
    return _diff(
        _rows(qs["ngram_jaccard_pairs"](spark, sf_dir)), want, "ngram_jaccard_pairs"
    )


@check("docs_containment_dup")
def _c_containment(spark, sf_dir, qs):
    doc_ids, _, _, sizes, _, _ = _corpus(sf_dir)
    ia, ib, ti = _intersections(sf_dir)
    rows = {"contained_id": [], "container_id": [], "containment": []}
    for a, b, t in zip(
        np.r_[ia, ib], np.r_[ib, ia], np.r_[ti, ti]
    ):  # both orientations
        if 5 * t >= 4 * sizes[a]:
            rows["contained_id"].append(int(doc_ids[a]))
            rows["container_id"].append(int(doc_ids[b]))
            rows["containment"].append(_round6(int(t) / int(sizes[a])))
    return _diff(
        _rows(qs["docs_containment_dup"](spark, sf_dir)),
        _want_rows(rows),
        "docs_containment_dup",
    )


def _cc_survivors(doc_ids: np.ndarray, pair_idx: list[tuple[int, int]]):
    """Union-find over LOCAL indices; cluster = min reachable doc_id,
    survivor = (cluster == own id) — the recursive-CTE reach oracle."""
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pair_idx:
        ida, idb = int(doc_ids[a]), int(doc_ids[b])
        ra, rb = find(ida), find(idb)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = [find(int(i)) for i in doc_ids]
    return roots


@check("dedup_clusters")
def _c_clusters(spark, sf_dir, qs):
    doc_ids, _, _, sizes, _, _ = _corpus(sf_dir)
    ia, ib, ti = _intersections(sf_dir)
    union = sizes[ia] + sizes[ib] - ti
    keep = 5 * ti >= 4 * union
    roots = _cc_survivors(doc_ids, list(zip(ia[keep], ib[keep])))
    want = _want_rows(
        {
            "doc_id": doc_ids.tolist(),
            "cluster_id": roots,
            "is_survivor": [1 if r == int(i) else 0 for r, i in zip(roots, doc_ids)],
        }
    )
    return _diff(_rows(qs["dedup_clusters"](spark, sf_dir)), want, "dedup_clusters")


# --- MinHash-LSH -----------------------------------------------------------


def _md5_31(texts: list[str]) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.int64)
    for i, g in enumerate(texts):
        out[i] = (
            int(hashlib.md5(f"0|{g}".encode()).hexdigest()[:8], 16) & MERSENNE
        )
    return out


_MH_CACHE: dict[str, list[tuple[int, int, float]]] = {}


def _minhash_pairs(sf_dir: str):
    """Replay minhash_lsh_pairs(n=3, num_hashes=16, bands=8,
    threshold=0.8, base_hash="md5", max_bucket=256) — returns
    [(id_a, id_b, jaccard_rounded)] over REAL doc ids."""
    if sf_dir in _MH_CACHE:
        return _MH_CACHE[sf_dir]
    from omop_etl_spark.operators.dedup import _affine_params

    doc_ids, texts, sets_l, sizes, flat, flat_doc = _corpus(sf_dir)
    base = _md5_31(texts)  # per distinct shingle id
    h_flat = base[flat]
    n_docs = doc_ids.shape[0]
    offsets = np.r_[0, np.cumsum(sizes)][:-1]
    params = _affine_params(16)
    sig = np.empty((n_docs, 16), dtype=np.int64)
    for i, (a, b) in enumerate(params):
        v = (h_flat * a + b) % MERSENNE
        sig[:, i] = np.minimum.reduceat(v, offsets)
    # banding: 8 bands x 2 rows; bucket key = (band, m0, m1)
    cand: set[tuple[int, int]] = set()
    for band in range(8):
        m0, m1 = sig[:, band * 2], sig[:, band * 2 + 1]
        order = np.lexsort((m1, m0))
        s0, s1 = m0[order], m1[order]
        brk = np.flatnonzero(np.r_[True, (s0[1:] != s0[:-1]) | (s1[1:] != s1[:-1])])
        ends = np.r_[brk[1:], order.shape[0]]
        for s, e in zip(brk, ends):
            k = e - s
            if k < 2:
                continue
            members = np.sort(order[s:e])  # local doc indices ascending
            if k <= 256:
                for x in range(k):
                    for y in range(x + 1, k):
                        cand.add((members[x], members[y]))
            else:  # over-full bucket: star-link to the min doc
                mn = members[0]
                for m in members[1:]:
                    cand.add((mn, m))
    out = []
    for a, b in cand:
        t = np.intersect1d(sets_l[a], sets_l[b], assume_unique=True).shape[0]
        union = int(sizes[a] + sizes[b] - t)
        if 5 * t >= 4 * union:
            out.append((int(doc_ids[a]), int(doc_ids[b]), _round6(t / union)))
    _MH_CACHE[sf_dir] = (out, cand, doc_ids)
    return _MH_CACHE[sf_dir]


@check("dedup_minhash_lsh")
def _c_minhash(spark, sf_dir, qs):
    out, _, _ = _minhash_pairs(sf_dir)
    want = _want_rows(
        {
            "id_a": [a for a, _, _ in out],
            "id_b": [b for _, b, _ in out],
            "jaccard": [j for _, _, j in out],
        }
    )
    return _diff(
        _rows(qs["dedup_minhash_lsh"](spark, sf_dir)), want, "dedup_minhash_lsh"
    )


@check("dedup_near_clusters")
def _c_near_clusters(spark, sf_dir, qs):
    out, _, doc_ids = _minhash_pairs(sf_dir)
    id_to_local = {int(i): k for k, i in enumerate(doc_ids)}
    pair_idx = [(id_to_local[a], id_to_local[b]) for a, b, _ in out]
    roots = _cc_survivors(doc_ids, pair_idx)
    want = _want_rows(
        {
            "doc_id": doc_ids.tolist(),
            "cluster_id": roots,
            "is_survivor": [1 if r == int(i) else 0 for r, i in zip(roots, doc_ids)],
        }
    )
    return _diff(
        _rows(qs["dedup_near_clusters"](spark, sf_dir)), want, "dedup_near_clusters"
    )


# --- SimHash ---------------------------------------------------------------


@check("dedup_simhash")
def _c_simhash(spark, sf_dir, qs):
    doc_ids, texts, _, sizes, flat, _ = _corpus(sf_dir)
    # full 32-bit md5 prefix (unmasked) per distinct shingle
    base = np.empty(len(texts), dtype=np.int64)
    for i, g in enumerate(texts):
        base[i] = int(hashlib.md5(f"0|{g}".encode()).hexdigest()[:8], 16)
    h_flat = base[flat]
    offsets = np.r_[0, np.cumsum(sizes)][:-1]
    sig = np.zeros(doc_ids.shape[0], dtype=np.int64)
    for bit in range(32):
        ones = np.add.reduceat((h_flat >> bit) & 1, offsets)
        sig |= ((2 * ones > sizes).astype(np.int64)) << bit
    # exact hamming<=3 pair search: probe each of the 5488 <=3-bit xor
    # masks VECTORIZED against the sorted unique-signature array
    # (independent of the implementation's pigeonhole banding) — one
    # searchsorted pass per mask, O(masks * U log U) total
    uniq, inv = np.unique(sig, return_inverse=True)
    groups: dict[int, list[int]] = {}
    for loc, u in enumerate(inv):
        groups.setdefault(int(u), []).append(loc)
    masks = []
    for i in range(32):
        masks.append(1 << i)
        for j in range(i + 1, 32):
            masks.append((1 << i) | (1 << j))
            for k in range(j + 1, 32):
                masks.append((1 << i) | (1 << j) | (1 << k))
    rows = {"id_a": [], "id_b": [], "hamming": []}

    def emit(a_loc, b_loc, ham):
        a, b = int(doc_ids[a_loc]), int(doc_ids[b_loc])
        if a > b:
            a, b = b, a
        rows["id_a"].append(a)
        rows["id_b"].append(b)
        rows["hamming"].append(ham)

    for mem in groups.values():  # hamming 0 within a signature group
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                emit(mem[x], mem[y], 0)
    for mask in masks:
        ham = bin(mask).count("1")
        v = uniq ^ mask
        # probe only v > u so each unordered signature pair fires once
        sel = np.flatnonzero(v > uniq)
        pos = np.searchsorted(uniq, v[sel])
        ok = pos < uniq.shape[0]
        ok[ok] = uniq[pos[ok]] == v[sel[ok]]
        for ui, vi in zip(sel[ok], pos[ok]):
            for a_loc in groups[int(ui)]:
                for b_loc in groups[int(vi)]:
                    emit(a_loc, b_loc, ham)
    return _diff(
        _rows(qs["dedup_simhash"](spark, sf_dir)), _want_rows(rows), "dedup_simhash"
    )


@check("doc_fingerprint")
def _c_fingerprint(spark, sf_dir, qs):
    import glob

    import pyarrow.parquet as pq

    path = f"{sf_dir}/documents.parquet"
    files = sorted(glob.glob(f"{path}/*.parquet")) or [path]
    rows = {"doc_id": [], "fp": []}
    for f in files:
        t = pq.read_table(f, columns=["doc_id", "text"])
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = sorted(set(text.split(" ")))
            rows["doc_id"].append(did)
            rows["fp"].append(hashlib.md5(" ".join(toks).encode()).hexdigest())
    return _diff(
        _rows(qs["doc_fingerprint"](spark, sf_dir)), _want_rows(rows), "doc_fingerprint"
    )


# ---------------------------------------------------------------------------


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / "testdata_sf10"
    )
    names = sys.argv[2:] or list(CHECKS)
    from pyspark.sql import SparkSession

    from omop_etl_spark.conf import apply_recommended

    import __spark_entry__ as entrymod

    cpus = 16
    spark = (
        apply_recommended(SparkSession.builder.master(f"local[{cpus}]"), cpus)
        .config("spark.sql.warehouse.dir", "/tmp/sf10dd-wh")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    failed = 0
    for name in names:
        try:
            ok = CHECKS[name](spark, sf_dir, qs)
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"FAIL {name}: {type(exc).__name__}: {exc}")
            ok = False
        failed += 0 if ok else 1
    spark.stop()
    print(f"# {len(names) - failed}/{len(names)} checks passed at {sf_dir}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
