"""sf10-tier VALUE checks for the embed/graph families (VERDICT r16 #4).

The registry's DuckDB oracles cannot replay these gates at sf10 volume
(the Lloyd CROSS JOIN assigns, recursive-CTE connected components, and
unrolled iteration chains go super-linear in DuckDB at 200k vectors /
60M lineitems — LOCALCHECK_r16 §sweep), so the heaviest operator
families were the only ones value-verified at just one decade. This
script closes that gap with INDEPENDENT exact oracles:

* **embed family** — numpy on the driver. The sf10 embedding corpus is
  200k x 64 doubles (~100 MB), so every gate's pinned arithmetic
  (floor-quantized int64 sums, deterministic ties, HALF_UP rounding)
  replays exactly: integer matmuls for covariance/projection/Lloyd,
  Python bigints where products exceed int64, sequential-fold sums
  (np.cumsum) where the engines' fold order is the contract.
* **graph family** — pure-Python graph algorithms (set-intersection
  triangles, level BFS, bounded Bellman-Ford, synchronous LPA with the
  smaller-label tie, k-core peeling) over the co-purchase edge list the
  gate itself derives (the edge builder is shared; the ITERATIVE part —
  the piece most at risk of silent at-scale divergence — is what gets
  the independent replay).

Float-threshold gates (cosine >= t, top-k by score) additionally assert
a NO-BORDERLINE margin: no score within 1e-9 of a decision boundary, so
numpy's pairwise summation vs the engines' sequential fold cannot flip
a membership decision (error bound ~ d * eps ~ 1e-14 relative).

Self-validation: run this script at sf0.01/sf1 first — there the same
gates are DuckDB-driver-green, so a numpy/Python oracle that matches
validates the replay itself before it is trusted at sf10.

Usage: python scripts/check_sf10_embed_graph.py [sf_dir] [gate ...]
"""

from __future__ import annotations

import sys
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

CHECKS = {}


def check(name):
    def deco(fn):
        CHECKS[name] = fn
        return fn

    return deco


# ---------------------------------------------------------------------------
# shared loaders / helpers


def _read_table(sf_dir: str, name: str):
    import glob

    import pyarrow.parquet as pq

    path = f"{sf_dir}/{name}.parquet"
    files = sorted(glob.glob(f"{path}/*.parquet")) or [path]
    import pyarrow as pa

    return pa.concat_tables([pq.read_table(f) for f in files])


_EMB_CACHE: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}


def _embeddings(sf_dir: str):
    """(vec_ids int64, labels int64, X float64[n, d]) sorted by vec_id."""
    if sf_dir not in _EMB_CACHE:
        t = _read_table(sf_dir, "embeddings")
        ids = np.asarray(t["vec_id"], dtype=np.int64)
        labels = np.asarray(t["label"], dtype=np.int64)
        X = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        order = np.argsort(ids, kind="stable")
        _EMB_CACHE[sf_dir] = (ids[order], labels[order], X[order])
    return _EMB_CACHE[sf_dir]


def _seq_sum(M: np.ndarray) -> np.ndarray:
    """Sequential left-fold row sums — np.cumsum is defined as the
    running (sequential) sum, unlike np.sum's pairwise tree, so this
    reproduces the engines' fold order bit-for-bit."""
    return np.cumsum(M, axis=1)[:, -1]


def _round6(x: float) -> float:
    """Spark/DuckDB round(x, 6): HALF_UP on the exact binary value
    (Python's round() is banker's — wrong tie direction)."""
    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


_ROUND6_V = np.vectorize(_round6, otypes=[np.float64])


def _rows(df) -> list[tuple]:
    """Gate output -> sorted list of tuples (column-name order)."""
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    out = []
    for t in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(None if _isna(v) else v for v in t))
    return sorted(out, key=repr)


def _isna(v) -> bool:
    try:
        import pandas as pd

        return v is None or (isinstance(v, float) and pd.isna(v))
    except Exception:  # pragma: no cover
        return v is None


def _want_rows(cols_to_vals: dict[str, list]) -> list[tuple]:
    cols = sorted(cols_to_vals)
    n = len(next(iter(cols_to_vals.values())))
    out = [tuple(cols_to_vals[c][i] for c in cols) for i in range(n)]
    return sorted(out, key=repr)


def _diff(got: list[tuple], want: list[tuple], name: str) -> bool:
    if got == want:
        print(f"PASS {name}: rows={len(got)}")
        return True
    only_g = [r for r in got if r not in set(want)][:3]
    only_w = [r for r in want if r not in set(got)][:3]
    print(
        f"FAIL {name}: got {len(got)} want {len(want)} rows; "
        f"got-only {only_g} want-only {only_w}"
    )
    return False


# ---------------------------------------------------------------------------
# embed family — numpy oracles


@check("embed_norm_stats")
def _c_norm_stats(spark, sf_dir, qs):
    ids, _, X = _embeddings(sf_dir)
    sq = _seq_sum(X * X)
    tot = _seq_sum(X)
    d = X.shape[1]
    want = _want_rows(
        {
            "vec_id": ids.tolist(),
            "l2_norm": _ROUND6_V(np.sqrt(sq)).tolist(),
            "mean_val": _ROUND6_V(tot / d).tolist(),
            "min_val": _ROUND6_V(X.min(axis=1)).tolist(),
            "max_val": _ROUND6_V(X.max(axis=1)).tolist(),
        }
    )
    return _diff(_rows(qs["embed_norm_stats"](spark, sf_dir)), want, "embed_norm_stats")


@check("embed_quantize")
def _c_quantize(spark, sf_dir, qs):
    ids, _, X = _embeddings(sf_dir)
    lo, hi = X.min(), X.max()
    s = 255.0 / (hi - lo)
    codes = np.floor((X - lo) * s + 0.5)
    recon = lo + codes * ((hi - lo) / 255.0)
    err = X - recon
    want = _want_rows(
        {
            "vec_id": ids.tolist(),
            "code_sum": codes.sum(axis=1).astype(np.int64).tolist(),
            "code_min": codes.min(axis=1).astype(np.int64).tolist(),
            "code_max": codes.max(axis=1).astype(np.int64).tolist(),
            "recon_err": _ROUND6_V(np.sqrt(_seq_sum(err * err))).tolist(),
        }
    )
    return _diff(_rows(qs["embed_quantize"](spark, sf_dir)), want, "embed_quantize")


def _quantized(X: np.ndarray, scale: float) -> np.ndarray:
    return np.floor(X * scale).astype(np.int64)


def _comoments(X: np.ndarray, shift: int = 14):
    """(n, s int64[d], S int64[d, d]) — exact integer sufficient stats."""
    Q = _quantized(X, float(1 << shift))
    return Q.shape[0], Q.sum(axis=0, dtype=np.int64), Q.T @ Q


@check("embed_covariance")
def _c_covariance(spark, sf_dir, qs):
    _, _, X = _embeddings(sf_dir)
    n, s, S = _comoments(X)
    d = s.shape[0]
    i_l, j_l, cov_l = [], [], []
    si_l, sj_l, sij_l = [], [], []
    for i in range(d):
        for j in range(i, d):
            # Python bigints: n * s_ij crosses int64 exactly where the
            # r17 DECIMAL widening matters — the independent oracle
            # must not share the wrap
            t = int(n) * int(S[i, j]) - int(s[i]) * int(s[j])
            i_l.append(i)
            j_l.append(j)
            si_l.append(int(s[i]))
            sj_l.append(int(s[j]))
            sij_l.append(int(S[i, j]))
            cov_l.append(t // int(n))  # Python // = floor division
    want = _want_rows(
        {
            "i": i_l,
            "j": j_l,
            "n": [int(n)] * len(i_l),
            "s_i": si_l,
            "s_j": sj_l,
            "s_ij": sij_l,
            "cov_scaled": cov_l,
        }
    )
    return _diff(_rows(qs["embed_covariance"](spark, sf_dir)), want, "embed_covariance")


@check("embed_top_eigen")
def _c_top_eigen(spark, sf_dir, qs):
    _, _, X = _embeddings(sf_dir)
    n, s, S = _comoments(X)
    d = s.shape[0]
    # symmetric integer covariance matrix (Python bigints -> exact)
    M = [[0] * d for _ in range(d)]
    for i in range(d):
        for j in range(i, d):
            t = int(n) * int(S[i, j]) - int(s[i]) * int(s[j])
            M[i][j] = M[j][i] = t // int(n)
    v = [10**6] * d
    for _ in range(8):
        w = [sum(M[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(1, max(abs(x) for x in w))
        # DuckDB HUGEINT `//` truncates toward zero (probed r17);
        # replicate exactly
        v = [abs(x * 10**6) // mx * (1 if x >= 0 else -1) for x in w]
    want = _want_rows({"i": list(range(d)), "v": v})
    return _diff(_rows(qs["embed_top_eigen"](spark, sf_dir)), want, "embed_top_eigen")


@check("embed_project")
def _c_project(spark, sf_dir, qs):
    from omop_etl_spark.operators.similarity import rp_coefficients

    ids, _, X = _embeddings(sf_dir)
    C = np.asarray(rp_coefficients(16, 64, 42), dtype=np.int64)  # [16, 64]
    XQ = _quantized(X, 1_000_000.0)
    P = XQ @ C.T  # int64 exact: |xq| <= ~2^21, c in {-1,0,1}, d=64
    k = C.shape[0]
    want = _want_rows(
        {
            "vec_id": np.repeat(ids, k).tolist(),
            "pos": np.tile(np.arange(k), ids.shape[0]).tolist(),
            "proj_val": P.reshape(-1).tolist(),
        }
    )
    return _diff(_rows(qs["embed_project"](spark, sf_dir)), want, "embed_project")


@check("embed_centroids")
def _c_centroids(spark, sf_dir, qs):
    ids, labels, X = _embeddings(sf_dir)
    XQ = _quantized(X, 1_000_000.0)
    rows = {"label": [], "pos": [], "centroid": [], "n_vectors": []}
    for lab in np.unique(labels):
        sel = XQ[labels == lab]
        s = sel.sum(axis=0, dtype=np.int64)
        cnt = sel.shape[0]
        # floor(double(sum)/count): |sum| < 2^53 so the float division
        # is the exact quotient correctly rounded, same as both engines
        cent = np.floor(s.astype(np.float64) / cnt).astype(np.int64)
        for pos in range(XQ.shape[1]):
            rows["label"].append(int(lab))
            rows["pos"].append(pos)
            rows["centroid"].append(int(cent[pos]))
            rows["n_vectors"].append(cnt)
    return _diff(
        _rows(qs["embed_centroids"](spark, sf_dir)), _want_rows(rows), "embed_centroids"
    )


# --- exact fixed-point Lloyd replays -------------------------------------


def _assign(XQ: np.ndarray, C: np.ndarray, cluster_ids: np.ndarray):
    """argmin over integer sq dist, ties -> smaller cluster id.
    C rows must be ordered by ascending cluster id. Returns
    (assigned cluster id, dist) — all int64-exact (|xq| ~ 2e6, d=64)."""
    x2 = np.einsum("ij,ij->i", XQ, XQ)
    c2 = np.einsum("ij,ij->i", C, C)
    D = x2[:, None] - 2 * (XQ @ C.T) + c2[None, :]
    pick = np.argmin(D, axis=1)  # first occurrence = smallest index
    return cluster_ids[pick], D[np.arange(D.shape[0]), pick]


def _lloyd2(XQ: np.ndarray, k: int):
    """The _kmeans_oracle_ctes chain: seeds = k first rows (callers
    pass XQ sorted by vec_id), assign -> floor-mean update -> assign.
    Returns (cluster_id[n], dist[n])."""
    seeds = XQ[:k]
    a1, _ = _assign(XQ, seeds, np.arange(k))
    live = np.unique(a1)
    cents = np.stack(
        [
            np.floor(
                XQ[a1 == c].sum(axis=0, dtype=np.int64).astype(np.float64)
                / (a1 == c).sum()
            ).astype(np.int64)
            for c in live
        ]
    )
    return _assign(XQ, cents, live)


@check("embed_kmeans")
def _c_kmeans(spark, sf_dir, qs):
    ids, _, X = _embeddings(sf_dir)
    XQ = _quantized(X, 1_000_000.0)
    a2, d2 = _lloyd2(XQ, 8)
    want = _want_rows(
        {
            "vec_id": ids.tolist(),
            "cluster_id": a2.astype(int).tolist(),
            "dist_sq": d2.astype(int).tolist(),
        }
    )
    return _diff(_rows(qs["embed_kmeans"](spark, sf_dir)), want, "embed_kmeans")


def _lloyd2_two_level(XQ: np.ndarray, k1: int, k2: int):
    """kmeans_assign_two_level replay: coarse _lloyd2(k1) -> per final
    coarse cell, fine seeds = k2 smallest-id members, one fine
    assign/update/assign. Returns (coarse c[n], sub_id[n], dist[n])."""
    c_asn, _ = _lloyd2(XQ, k1)
    sub = np.zeros(XQ.shape[0], dtype=np.int64)
    dist = np.zeros(XQ.shape[0], dtype=np.int64)
    for c in np.unique(c_asn):
        m = np.flatnonzero(c_asn == c)  # ascending vec_id order
        cell = XQ[m]
        seeds = cell[:k2]
        f1, _ = _assign(cell, seeds, np.arange(seeds.shape[0]))
        live = np.unique(f1)
        cents = np.stack(
            [
                np.floor(
                    cell[f1 == s].sum(axis=0, dtype=np.int64).astype(np.float64)
                    / (f1 == s).sum()
                ).astype(np.int64)
                for s in live
            ]
        )
        f2, d2 = _assign(cell, cents, live)
        sub[m] = f2
        dist[m] = d2
    return c_asn, sub, dist


@check("embed_kmeans2")
def _c_kmeans2(spark, sf_dir, qs):
    ids, _, X = _embeddings(sf_dir)
    XQ = _quantized(X, 1_000_000.0)
    c, s, d = _lloyd2_two_level(XQ, 8, 4)
    want = _want_rows(
        {
            "vec_id": ids.tolist(),
            "cluster_id": (c * 4 + s).astype(int).tolist(),
            "dist_sq": d.astype(int).tolist(),
        }
    )
    return _diff(_rows(qs["embed_kmeans2"](spark, sf_dir)), want, "embed_kmeans2")


_CELL_CACHE: dict[str, tuple] = {}


def _cells(sf_dir: str):
    """Self-scaled two-level cells of the corpus: (ids, X, XQ,
    cell_id[n]) with cell = c * k2 + sub at (k1, k2) = two_level_k(n)."""
    if sf_dir in _CELL_CACHE:
        return _CELL_CACHE[sf_dir]
    from omop_etl_spark.operators.kmeans import two_level_k

    ids, _, X = _embeddings(sf_dir)
    k1, k2 = two_level_k(ids.shape[0])
    XQ = _quantized(X, 1_000_000.0)
    c, s, _ = _lloyd2_two_level(XQ, k1, k2)
    print(f"# {sf_dir}: n={ids.shape[0]} two_level_k=({k1},{k2})", file=sys.stderr)
    _CELL_CACHE[sf_dir] = (ids, X, XQ, c * k2 + s)
    return _CELL_CACHE[sf_dir]


@check("embed_semdedup")
def _c_semdedup(spark, sf_dir, qs):
    ids, _, XQ, cell = _cells(sf_dir)
    nn = np.einsum("ij,ij->i", XQ, XQ)
    dup = np.zeros(ids.shape[0], dtype=bool)
    for cid in np.unique(cell):
        m = np.flatnonzero(cell == cid)
        if m.shape[0] < 2:
            continue
        D = XQ[m] @ XQ[m].T  # int64 exact (|dot| <= 64 * (2.1e6)^2)
        na = nn[m]
        # threshold: dot > 0 and (5*dot)^2 >= 4*na*nb — floats suffice
        # except near the boundary, where exact bigints decide
        lhs = (5.0 * D) ** 2
        rhs = 4.0 * na[:, None].astype(np.float64) * na[None, :].astype(np.float64)
        iu = np.triu_indices(m.shape[0], k=1)
        close = np.abs(lhs[iu] - rhs[iu]) <= 1e-6 * np.maximum(lhs[iu], rhs[iu])
        hit = (D[iu] > 0) & (lhs[iu] >= rhs[iu]) & ~close
        for a_i, b_i in zip(iu[0][close], iu[1][close]):
            d_ab = int(D[a_i, b_i])
            if d_ab > 0 and (5 * d_ab) ** 2 >= 4 * int(na[a_i]) * int(na[b_i]):
                hit |= (iu[0] == a_i) & (iu[1] == b_i)
        dup[m[iu[1][hit]]] = True  # the larger vec_id of the pair drops
    rows = {"cluster_id": [], "n_vectors": [], "n_dropped": [], "kept_id_sum": []}
    for cid in np.unique(cell):
        m = cell == cid
        rows["cluster_id"].append(int(cid))
        rows["n_vectors"].append(int(m.sum()))
        rows["n_dropped"].append(int(dup[m].sum()))
        rows["kept_id_sum"].append(int(ids[m & ~dup].sum()))
    return _diff(
        _rows(qs["embed_semdedup"](spark, sf_dir)), _want_rows(rows), "embed_semdedup"
    )


@check("embed_dedup_clusters")
def _c_dedup_clusters(spark, sf_dir, qs):
    ids, X, _, cell = _cells(sf_dir)
    norms = np.sqrt(np.einsum("ij,ij->i", X, X))
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    n_border = 0
    for cid in np.unique(cell):
        m = np.flatnonzero(cell == cid)
        if m.shape[0] < 2:
            continue
        S = (X[m] @ X[m].T) / (norms[m][:, None] * norms[m][None, :])
        iu = np.triu_indices(m.shape[0], k=1)
        sc = S[iu]
        n_border += int(np.sum(np.abs(sc - 0.4) < 1e-9))
        for a_i, b_i in zip(iu[0][sc >= 0.4], iu[1][sc >= 0.4]):
            union(int(ids[m[a_i]]), int(ids[m[b_i]]))
    assert n_border == 0, (
        f"{n_border} cosine scores within 1e-9 of the 0.4 threshold — "
        "numpy fold order cannot arbitrate; check manually"
    )
    roots = [find(int(i)) for i in ids]
    want = _want_rows(
        {
            "vec_id": ids.tolist(),
            "cluster_id": roots,
            "is_survivor": [1 if r == int(i) else 0 for r, i in zip(roots, ids)],
        }
    )
    return _diff(
        _rows(qs["embed_dedup_clusters"](spark, sf_dir)), want, "embed_dedup_clusters"
    )


@check("sim_topk")
def _c_sim_topk(spark, sf_dir, qs):
    ids, _, X = _embeddings(sf_dir)
    qm = ids < 16
    norms = np.sqrt(np.einsum("ij,ij->i", X, X))
    S = (X[qm] @ X.T) / (norms[qm][:, None] * norms[None, :])
    rows = {"query_id": [], "neighbor_id": [], "score": []}
    for qi, qid in enumerate(ids[qm]):
        sc = S[qi]
        order = np.lexsort((ids, -sc))  # score DESC, neighbor_id ASC
        top = order[:5]
        gap = sc[order[4]] - sc[order[5]]
        assert gap > 1e-9 or sc[order[4]] == sc[order[5]], (
            f"query {qid}: rank-5/6 scores within 1e-9 — fold order "
            "could flip the cut"
        )
        for t in top:
            rows["query_id"].append(int(qid))
            rows["neighbor_id"].append(int(ids[t]))
            rows["score"].append(_round6(float(sc[t])))
    return _diff(_rows(qs["sim_topk"](spark, sf_dir)), _want_rows(rows), "sim_topk")


# ---------------------------------------------------------------------------
# graph family — pure-Python oracles over the gate's own edge frame


def _copurchase_edges(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod._copurchase_pairs(spark, sf_dir, with_count=True).collect()
    return [(r["u"], r["v"], r["n"]) for r in rows]


@check("parts_triangle_count")
def _c_triangles(spark, sf_dir, qs):
    edges = _copurchase_edges(spark, sf_dir)
    und = {(min(u, v), max(u, v)) for u, v, _ in edges if u != v}
    nodes = {u for u, _ in und} | {v for _, v in und}
    adj: dict[int, set[int]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)  # oriented low -> high by id
    empty: set[int] = set()
    tri = 0
    for u, v in und:
        tri += len(adj.get(u, empty) & adj.get(v, empty))
    want = _want_rows(
        {"n_nodes": [len(nodes)], "n_edges": [len(und)], "n_triangles": [tri]}
    )
    return _diff(
        _rows(qs["parts_triangle_count"](spark, sf_dir)), want, "parts_triangle_count"
    )


def _part_size1(sf_dir: str) -> set[int]:
    t = _read_table(sf_dir, "part")
    pk = np.asarray(t["p_partkey"], dtype=np.int64)
    sz = np.asarray(t["p_size"], dtype=np.int64)
    return set(pk[sz == 1].tolist())


@check("parts_bfs_hops")
def _c_bfs(spark, sf_dir, qs):
    edges = _copurchase_edges(spark, sf_dir)
    adj: dict[int, set[int]] = {}
    nodes = set()
    for u, v, _ in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
        nodes.add(u)
        nodes.add(v)
    seeds = _part_size1(sf_dir) & nodes
    hop = {n: 0 for n in seeds}
    frontier = set(seeds)
    for h in range(1, 4):
        nxt = set()
        for n in frontier:
            nxt |= adj.get(n, set())
        nxt -= hop.keys()
        if not nxt:
            break
        for n in nxt:
            hop[n] = h
        frontier = nxt
    per = {}
    for n, h in hop.items():
        c, s = per.get(h, (0, 0))
        per[h] = (c + 1, s + n)
    want = _want_rows(
        {
            "hop": list(per),
            "n_parts": [c for c, _ in per.values()],
            "partkey_sum": [s for _, s in per.values()],
        }
    )
    return _diff(_rows(qs["parts_bfs_hops"](spark, sf_dir)), want, "parts_bfs_hops")


@check("parts_sssp_nearest")
def _c_sssp(spark, sf_dir, qs):
    edges = _copurchase_edges(spark, sf_dir)
    bi = []
    nodes = set()
    for u, v, n in edges:
        if u == v:
            continue
        w = 1_000_000 // n
        bi.append((u, v, w))
        bi.append((v, u, w))
        nodes.add(u)
        nodes.add(v)
    seeds = _part_size1(sf_dir) & nodes
    dist = {n: 0 for n in seeds}
    for _ in range(3):
        base = dict(dist)  # relax against the PREVIOUS round only
        for a, b, w in bi:
            da = base.get(a)
            if da is not None:
                nd = da + w
                if nd < dist.get(b, float("inf")):
                    dist[b] = nd
    ranked = sorted(((d, n) for n, d in dist.items() if d > 0))[:50]
    want = _want_rows(
        {"node": [n for _, n in ranked], "dist": [d for d, _ in ranked]}
    )
    return _diff(
        _rows(qs["parts_sssp_nearest"](spark, sf_dir)), want, "parts_sssp_nearest"
    )


@check("parts_communities")
def _c_lpa(spark, sf_dir, qs):
    edges = _copurchase_edges(spark, sf_dir)
    di = []
    nodes = set()
    for u, v, _ in edges:
        di.append((u, v))
        di.append((v, u))
        nodes.add(u)
        nodes.add(v)
    label = {n: n for n in nodes}
    for _ in range(3):
        cnt: dict[int, dict[int, int]] = {}
        for s, d in di:
            c = cnt.setdefault(d, {})
            ls = label[s]
            c[ls] = c.get(ls, 0) + 1
        new = dict(label)
        for n, c in cnt.items():
            new[n] = min(c, key=lambda lb: (-c[lb], lb))
        label = new
    sizes: dict[int, int] = {}
    for lb in label.values():
        sizes[lb] = sizes.get(lb, 0) + 1
    want = _want_rows(
        {"label": list(sizes), "n_members": list(sizes.values())}
    )
    return _diff(
        _rows(qs["parts_communities"](spark, sf_dir)), want, "parts_communities"
    )


@check("events_kcore")
def _c_kcore(spark, sf_dir, qs):
    t = _read_table(sf_dir, "events")
    uid = np.asarray(t["user_id"], dtype=np.int64)
    et = t["event_type"].to_pylist()
    fwd = {(f"u{u}", f"t{e}") for u, e in zip(uid.tolist(), et)}
    edges = list(fwd) + [(b, a) for a, b in fwd]
    for _ in range(3):
        deg: dict[str, int] = {}
        for s, _d in edges:
            deg[s] = deg.get(s, 0) + 1
        keep = {n for n, c in deg.items() if c >= 4}
        edges = [(s, d) for s, d in edges if s in keep and d in keep]
    out: dict[str, int] = {}
    for s, _d in edges:
        out[s] = out.get(s, 0) + 1
    want = _want_rows({"node": list(out), "deg": list(out.values())})
    return _diff(_rows(qs["events_kcore"](spark, sf_dir)), want, "events_kcore")


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
        .config("spark.sql.warehouse.dir", "/tmp/sf10eg-wh")
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
