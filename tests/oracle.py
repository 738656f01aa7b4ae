"""Pure-numpy semantic oracles (≤100 lines each, FIXTURES.md §3).

``pagerank_oracle`` transcribes the reference's serial sync semantics
(/root/reference/inc/pagerank.hxx:455-482 pagerankStaticOmp -> invoke ->
pagerankUpdateRanksSync): pull iteration, C0=(1-P)/N, L∞ tolerance,
double buffering. The graph oracles are brute force on tiny graphs.
"""

from __future__ import annotations

import numpy as np


def dedup_edges(src, dst, n, add_self_loops=True):
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if add_self_loops:
        src = np.concatenate([src, np.arange(n, dtype=np.int64)])
        dst = np.concatenate([dst, np.arange(n, dtype=np.int64)])
    keys = np.unique(src * np.int64(n) + dst)
    return keys // n, keys % n


def weighted_edges(src, dst, n, add_self_loops=True):
    """Multiplicity-weighted dedup: returns (src, dst, w) with w = the
    number of raw occurrences (+1 for the structural self-loop)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if add_self_loops:
        src = np.concatenate([src, np.arange(n, dtype=np.int64)])
        dst = np.concatenate([dst, np.arange(n, dtype=np.int64)])
    keys, cnt = np.unique(src * np.int64(n) + dst, return_counts=True)
    return keys // n, keys % n, cnt.astype(np.float64)


def pagerank_oracle(src, dst, n, damping=0.85, tol=1e-10, max_iter=500,
                    add_self_loops=True, warm=None, dangling="selfloops",
                    personalization=None, weighted=False):
    """Returns (ranks, iterations). ``personalization``: optional dense
    teleport vector (normalized here); restart mass and redistributed
    dangling mass both teleport proportionally to it. ``weighted=True``:
    multiplicity-weighted pull (contribution r_u * w_uv / W_u)."""
    if weighted:
        s, d, w = weighted_edges(src, dst, n, add_self_loops)
        outdeg = np.bincount(s, weights=w, minlength=n)
    else:
        s, d = dedup_edges(src, dst, n, add_self_loops)
        w = None
        outdeg = np.bincount(s, minlength=n).astype(np.float64)
    inv = np.where(outdeg > 0, 1.0 / np.maximum(outdeg, 1), 0.0)
    r = np.full(n, 1.0 / n) if warm is None else np.asarray(warm, dtype=np.float64).copy()
    tele = None
    if personalization is not None:
        tele = np.asarray(personalization, dtype=np.float64)
        tele = tele / tele.sum()
    C0 = (1.0 - damping) / n
    for it in range(1, max_iter + 1):
        contrib = r * inv
        sums = np.zeros(n)
        np.add.at(sums, d, contrib[s] if w is None else contrib[s] * w)
        M = r[outdeg == 0].sum() if dangling == "redistribute" else 0.0
        if tele is None:
            a = C0 + damping * sums + damping * M / n
        else:
            a = (1.0 - damping) * tele + damping * sums + damping * M * tele
        linf = np.abs(a - r).max()
        r = a
        if linf < tol:
            return r, it
    return r, max_iter


def cc_oracle(src, dst, n):
    """Min-vid label per weakly-connected component (brute force)."""
    labels = np.arange(n, dtype=np.int64)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    changed = True
    while changed:
        changed = False
        for u, v in zip(s, d):
            if labels[v] > labels[u]:
                labels[v] = labels[u]
                changed = True
            elif labels[u] > labels[v]:
                labels[u] = labels[v]
                changed = True
    return labels


def lp_oracle(src, dst, n, max_iterations=10):
    """Synchronous label propagation, lowest-label tie-break (engine spec)."""
    adj = [set() for _ in range(n)]
    for u, v in zip(src, dst):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_iterations):
        new = labels.copy()
        for v in range(n):
            if not adj[v]:
                continue
            counts: dict[int, int] = {}
            for w in adj[v]:
                counts[labels[w]] = counts.get(labels[w], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        if (new == labels).all():
            break
        labels = new
    return labels


def triangles_oracle(src, dst, n):
    """(global_count, per-vertex corner counts) by brute force."""
    adj = [set() for _ in range(n)]
    for u, v in zip(src, dst):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    count = 0
    per = np.zeros(n, dtype=np.int64)
    for u in range(n):
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    count += 1
                    per[u] += 1
                    per[v] += 1
                    per[w] += 1
    return count, per


def hits_oracle(src, dst, n, iterations=20, add_self_loops=True,
                weighted=False, normalize="iter"):
    """HITS reference: a = A^T h, h = A a from h0 = 1 (w_uv in both
    pulls when weighted). Returns (authority, hub), unit-L2."""
    if weighted:
        s, d, w = weighted_edges(src, dst, n, add_self_loops)
    else:
        s, d = dedup_edges(src, dst, n, add_self_loops)
        w = np.ones(len(s))
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iterations):
        a = np.zeros(n)
        np.add.at(a, d, h[s] * w)
        if normalize == "iter":
            na = np.sqrt((a * a).sum())
            if na > 0:
                a = a / na
        h = np.zeros(n)
        np.add.at(h, s, a[d] * w)
        if normalize == "iter":
            nh = np.sqrt((h * h).sum())
            if nh > 0:
                h = h / nh
    if normalize == "end":
        na = np.sqrt((a * a).sum())
        nh = np.sqrt((h * h).sum())
        if na > 0:
            a = a / na
        if nh > 0:
            h = h / nh
    return a, h


def core_oracle(src, dst, n):
    """Core number per vertex: sequential min-degree peel over the
    undirected deduped self-loop-free view (textbook Batagelj-Zaversnik)."""
    adj = [set() for _ in range(n)]
    for u, v in zip(src, dst):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    deg = np.array([len(s) for s in adj], dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    core = np.zeros(n, dtype=np.int64)
    k = 0
    remaining = n
    while remaining:
        k = max(k, int(deg[alive].min()))
        while True:
            fr = np.flatnonzero(alive & (deg <= k))
            if not fr.size:
                break
            for v in fr:
                core[v] = k
                alive[v] = False
                remaining -= 1
                for w in adj[v]:
                    if alive[w]:
                        deg[w] -= 1
    return core
