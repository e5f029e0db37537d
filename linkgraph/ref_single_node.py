"""Single-node numpy reference implementations — THE correctness oracle.

BASELINE.json north_rule: "converged outputs match the single-node reference
implementation per-vertex (PageRank scores allclose 1e-6; component/label IDs
exact; triangle counts exact)".  These are that reference: small, readable,
vectorized numpy, no Spark.  Tests additionally cross-check PageRank /
components / triangles against networkx (SURVEY.md §5.2); LPA is checked ONLY
against this module because networkx's LPA is asynchronous/randomized and not
a valid oracle for the synchronous min-tiebreak rule (SURVEY.md §7 trap 1).

Conventions shared with the distributed engine:
- PageRank (matches networkx.pagerank): weighted contributions
  ``r(u)·w(u,v)/wout(u)``; dangling mass redistributed uniformly each
  iteration; ``r_t = (1-d)/n + d·(scatter + dangling_mass/n)``; float64;
  converged when ``L∞(r_t − r_{t-1}) < tol``. Self-loops participate.
- Connected components: undirected simple view (self-loops dropped);
  component id = MIN vid in the component.
- LPA: SYNCHRONOUS updates over the undirected simple view; new label =
  most frequent neighbor label, ties -> MIN label; vertices with no
  neighbors keep their label; init label = vid; stop on zero changes or
  max_iter.
- Triangles: undirected simple view; per-vertex triangle membership counts.
"""

from __future__ import annotations

import numpy as np


def pagerank_ref(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n: int,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 1000,
) -> tuple[np.ndarray, int]:
    """Weighted PageRank with uniform dangling redistribution.

    Returns (ranks, supersteps_run)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)
    wout = np.zeros(n, dtype=np.float64)
    np.add.at(wout, src, w)
    dangling = wout == 0.0
    inv_wout_src = w / wout[src]  # per-edge scatter coefficient, fixed

    r = np.full(n, 1.0 / n, dtype=np.float64)
    for t in range(1, max_iter + 1):
        scatter = np.zeros(n, dtype=np.float64)
        np.add.at(scatter, dst, r[src] * inv_wout_src)
        dmass = float(r[dangling].sum())
        r_new = (1.0 - d) / n + d * (scatter + dmass / n)
        delta = float(np.max(np.abs(r_new - r))) if n else 0.0
        r = r_new
        if delta < tol:
            return r, t
    return r, max_iter


def _undirected_pairs(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Dedup + drop self-loops + canonicalize u<v, then return both
    directions (u->v and v->u) for neighbor iteration."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    keep = src != dst
    u = np.minimum(src[keep], dst[keep])
    v = np.maximum(src[keep], dst[keep])
    uv = np.unique(np.stack([u, v], axis=1), axis=0)
    u, v = uv[:, 0], uv[:, 1]
    return np.concatenate([u, v]), np.concatenate([v, u])


def components_ref(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Connected components; comp[v] = min vid in v's component."""
    comp = np.arange(n, dtype=np.int64)
    a, b = _undirected_pairs(src, dst)
    # Hash-min label propagation to fixpoint (same semantics as the engine).
    while True:
        # neighbor minimum per vertex
        new = comp.copy()
        np.minimum.at(new, b, comp[a])
        if np.array_equal(new, comp):
            return comp
        comp = new


def lpa_ref(src: np.ndarray, dst: np.ndarray, n: int, max_iter: int = 50) -> np.ndarray:
    """Synchronous label propagation, min-label tiebreak (see module doc)."""
    a, b = _undirected_pairs(src, dst)  # b receives a's label
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        nbr_label = labels[a]
        # count (receiver, label) pairs
        order = np.lexsort((nbr_label, b))
        rb, rl = b[order], nbr_label[order]
        # run-length encode (rb, rl)
        if len(rb) == 0:
            return labels
        boundary = np.ones(len(rb), dtype=bool)
        boundary[1:] = (rb[1:] != rb[:-1]) | (rl[1:] != rl[:-1])
        grp_v = rb[boundary]
        grp_l = rl[boundary]
        idx = np.flatnonzero(boundary)
        cnt = np.diff(np.append(idx, len(rb)))
        # argmax count per receiver, ties -> min label: sort by
        # (receiver, -count, label) and take the first row per receiver.
        o2 = np.lexsort((grp_l, -cnt, grp_v))
        gv, gl = grp_v[o2], grp_l[o2]
        first = np.ones(len(gv), dtype=bool)
        first[1:] = gv[1:] != gv[:-1]
        new = labels.copy()
        new[gv[first]] = gl[first]
        if np.array_equal(new, labels):
            return labels
        labels = new
    return labels


def bfs_ref(
    src: np.ndarray, dst: np.ndarray, n: int, sources: np.ndarray
) -> np.ndarray:
    """Hop distance from ``sources`` over the undirected simple view;
    unreached = -1.  Synchronous level expansion (same trajectory as
    pregel.BFSProgram per superstep)."""
    a, b = _undirected_pairs(src, dst)
    INF = np.iinfo(np.int64).max
    dist = np.full(n, INF, dtype=np.int64)
    dist[np.asarray(sources, dtype=np.int64)] = 0
    while True:
        relax = np.where(dist[a] < INF, dist[a] + 1, INF)
        new = dist.copy()
        np.minimum.at(new, b, relax)
        if np.array_equal(new, dist):
            break
        dist = new
    return np.where(dist == INF, -1, dist)


def sssp_ref(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n: int,
    sources: np.ndarray,
) -> np.ndarray:
    """Directed weighted shortest paths (Bellman-Ford to fixpoint) from
    ``sources``; unreached = +inf.  Synchronous relaxation rounds (same
    trajectory as pregel.SSSPProgram per superstep).  Parallel (src, dst)
    multi-edges are pre-SUMMED first — the engine relaxes on the pre-summed
    simple edge table (GraphContext esum), not per multi-edge row."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)
    key = src * np.int64(n) + dst
    uk, inv = np.unique(key, return_inverse=True)
    ws = np.zeros(len(uk))
    np.add.at(ws, inv, w)
    src, dst, w = uk // n, uk % n, ws
    dist = np.full(n, np.inf)
    dist[np.asarray(sources, dtype=np.int64)] = 0.0
    while True:
        relax = dist[src] + w
        new = dist.copy()
        np.minimum.at(new, dst, relax)
        if np.array_equal(new, dist):
            return dist
        dist = new


def widest_ref(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n: int,
    sources: np.ndarray,
    iters: int | None = None,
) -> np.ndarray:
    """Directed widest paths (max-bottleneck, max-min semiring) from
    ``sources`` — synchronous relaxation rounds mirroring
    pregel.WidestPathProgram.  cap(source) = +inf, unreached = -inf.
    Multi-edges pre-SUMMED like sssp_ref (the engine relaxes on the
    pre-summed simple edge table).  ``iters`` pins a fixed superstep
    count; None runs to fixpoint."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)
    key = src * np.int64(n) + dst
    uk, inv = np.unique(key, return_inverse=True)
    ws = np.zeros(len(uk))
    np.add.at(ws, inv, w)
    src, dst, w = uk // n, uk % n, ws
    cap = np.full(n, -np.inf)
    cap[np.asarray(sources, dtype=np.int64)] = np.inf
    t = 0
    while iters is None or t < iters:
        relax = np.minimum(cap[src], w)
        new = cap.copy()
        np.maximum.at(new, dst, relax)
        if np.array_equal(new, cap):
            return cap
        cap = new
        t += 1
    return cap


def ppr_ref(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n: int,
    seeds: np.ndarray,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 1000,
) -> tuple[np.ndarray, int]:
    """Personalized PageRank: teleport AND dangling mass to the uniform
    seed distribution; r_0 = s (matches pregel.PersonalizedPageRankProgram)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)
    wout = np.zeros(n, dtype=np.float64)
    np.add.at(wout, src, w)
    dangling = wout == 0.0
    inv_wout_src = w / wout[src]
    s = np.zeros(n, dtype=np.float64)
    s[np.asarray(seeds, dtype=np.int64)] = 1.0 / len(seeds)

    r = s.copy()
    for t in range(1, max_iter + 1):
        scatter = np.zeros(n, dtype=np.float64)
        np.add.at(scatter, dst, r[src] * inv_wout_src)
        dmass = float(r[dangling].sum())
        r_new = (1.0 - d) * s + d * (scatter + dmass * s)
        delta = float(np.max(np.abs(r_new - r))) if n else 0.0
        r = r_new
        if delta < tol:
            return r, t
    return r, max_iter


def hits_ref(
    src: np.ndarray, dst: np.ndarray, n: int, iters: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """Fixed-``iters`` HITS over the DISTINCT directed simple edge set, L1
    normalization after each half-step (matches hits.hits_scores exactly:
    authorities from h_{t-1}, normalize, hubs from normalized a_t,
    normalize).  Returns (authority, hub)."""
    e = np.unique(np.stack([np.asarray(src, np.int64), np.asarray(dst, np.int64)], axis=1), axis=0)
    es, ed = e[:, 0], e[:, 1]
    h = np.full(n, 1.0 / n, dtype=np.float64)
    a = np.zeros(n, dtype=np.float64)
    for _ in range(iters):
        a = np.zeros(n, dtype=np.float64)
        np.add.at(a, ed, h[es])
        a /= a.sum()
        h = np.zeros(n, dtype=np.float64)
        np.add.at(h, es, a[ed])
        h /= h.sum()
    return a, h


def salsa_ref(
    src: np.ndarray, dst: np.ndarray, n: int, iters: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """Fixed-``iters`` SALSA (Lempel & Moran 2000, public) over the DISTINCT
    directed simple edge set — the degree-normalized sibling of HITS: each
    half-step divides the propagated score by the SENDER's out-degree
    (authority step) / the TARGET side's in-degree (hub step), then
    L1-normalizes (matches hits.salsa_scores exactly).  Returns
    (authority, hub)."""
    e = np.unique(np.stack([np.asarray(src, np.int64), np.asarray(dst, np.int64)], axis=1), axis=0)
    es, ed = e[:, 0], e[:, 1]
    od = np.zeros(n, dtype=np.float64)
    np.add.at(od, es, 1.0)
    idg = np.zeros(n, dtype=np.float64)
    np.add.at(idg, ed, 1.0)
    h = np.full(n, 1.0 / n, dtype=np.float64)
    a = np.zeros(n, dtype=np.float64)
    for _ in range(iters):
        a = np.zeros(n, dtype=np.float64)
        np.add.at(a, ed, h[es] / od[es])
        a /= a.sum()
        h = np.zeros(n, dtype=np.float64)
        np.add.at(h, es, a[ed] / idg[ed])
        h /= h.sum()
    return a, h


def triangles_ref(src: np.ndarray, dst: np.ndarray, n: int) -> tuple[np.ndarray, int]:
    """Exact per-vertex triangle counts + global total (undirected simple)."""
    a, b = _undirected_pairs(src, dst)
    adj: list[set[int]] = [set() for _ in range(n)]
    for x, y in zip(a.tolist(), b.tolist()):
        adj[x].add(y)
    per_vertex = np.zeros(n, dtype=np.int64)
    total = 0
    # canonical u<v edges only (first half of _undirected_pairs output)
    m = len(a) // 2
    for x, y in zip(a[:m].tolist(), b[:m].tolist()):
        common = adj[x] & adj[y]
        for z in common:
            if z > y:  # count each triangle once (x < y < z)
                per_vertex[[x, y, z]] += 1
                total += 1
    return per_vertex, total
