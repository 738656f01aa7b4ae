"""CC / LP / triangle counting vs brute-force oracles (exact matches)."""

import numpy as np
import pytest

from pagerank_cuda_dynamic_ray.pipelines import analytics
from pagerank_cuda_dynamic_ray.pipelines.graph import GraphContext

from .oracle import cc_oracle, lp_oracle, triangles_oracle


def _graph(seed, n, m):
    rng = np.random.RandomState(seed)
    return rng.randint(0, n, m).astype(np.int64), rng.randint(0, n, m).astype(np.int64)


@pytest.mark.parametrize("num_parts", [1, 4])
def test_connected_components_exact(num_parts):
    n = 60
    src, dst = _graph(5, n, 50)  # sparse -> several components
    ctx = GraphContext(n, num_parts)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    got = analytics.connected_components(ctx).to_pandas().sort_values("vid")["component"].to_numpy()
    want = cc_oracle(src, dst, n)
    np.testing.assert_array_equal(got, want)
    # idempotence: a second run returns the identical labeling
    got2 = analytics.connected_components(ctx).to_pandas().sort_values("vid")["component"].to_numpy()
    np.testing.assert_array_equal(got, got2)
    ctx.shutdown()


@pytest.mark.parametrize("num_parts", [1, 3])
def test_label_propagation_exact(num_parts):
    n = 40
    src, dst = _graph(9, n, 90)
    ctx = GraphContext(n, num_parts)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    got = analytics.label_propagation(ctx, max_iterations=10).to_pandas().sort_values("vid")["label"].to_numpy()
    want = lp_oracle(src, dst, n, max_iterations=10)
    np.testing.assert_array_equal(got, want)
    ctx.shutdown()


@pytest.mark.parametrize("num_parts", [1, 2, 4])
def test_triangles_exact(num_parts):
    n = 30
    src, dst = _graph(0, n, 120)
    want, want_per = triangles_oracle(src, dst, n)
    ctx = GraphContext(n, num_parts)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    got, per_ds = analytics.triangle_count(ctx)
    per = per_ds.to_pandas().sort_values("vid")["triangles"].to_numpy()
    assert got == want
    np.testing.assert_array_equal(per, want_per)
    assert per.sum() == 3 * got
    # chunked emission (tiny max_wedges forces many rounds) is exact too
    got_c, per_ds_c = analytics.triangle_count(ctx, max_wedges=8)
    per_c = per_ds_c.to_pandas().sort_values("vid")["triangles"].to_numpy()
    assert got_c == want
    np.testing.assert_array_equal(per_c, want_per)
    ctx.shutdown()


def test_cc_survives_batch_update():
    """Symmetric view invalidates and rebuilds after apply_batch."""
    n = 20
    src = np.array([0, 2, 4], dtype=np.int64)
    dst = np.array([1, 3, 5], dtype=np.int64)
    ctx = GraphContext(n, 2)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    before = analytics.connected_components(ctx).to_pandas()
    assert before["component"].nunique() == n - 3
    ins = np.array([[1, 3], [2, 4]], dtype=np.int64)  # chain them together
    ctx.apply_batch(np.empty((2, 0), dtype=np.int64), ins)
    after = analytics.connected_components(ctx).to_pandas()
    assert after["component"].nunique() == n - 5
    ctx.shutdown()


@pytest.mark.parametrize("num_parts", [1, 4])
def test_label_loops_p2p_equals_driver(num_parts):
    """The in-pool p2p label loop must be bit-identical to the
    driver-coordinated loop for CC, LP and BFS."""
    n = 80
    src, dst = _graph(9, n, 120)
    ctx = GraphContext(n, num_parts)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    for fn, col, kw in (
        (analytics.connected_components, "component", {}),
        (analytics.label_propagation, "label", {"max_iterations": 10}),
        (lambda c, mode, **k: analytics.bfs_distances(c, 0, mode=mode, **k), "distance", {}),
    ):
        a = fn(ctx, mode="p2p", **kw).to_pandas().sort_values("vid")[col].to_numpy()
        b = fn(ctx, mode="driver", **kw).to_pandas().sort_values("vid")[col].to_numpy()
        np.testing.assert_array_equal(a, b)
    ctx.shutdown()


@pytest.mark.parametrize("num_parts", [1, 4])
def test_cc_incremental_equals_cold(num_parts):
    """Warm CC after an insertion batch must equal a cold recompute."""
    n = 100
    src, dst = _graph(13, n, 60)  # sparse -> many components to merge
    ctx = GraphContext(n, num_parts)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    analytics.connected_components(ctx)  # converged labels on the shards
    rng = np.random.RandomState(3)
    ins = np.stack([rng.randint(0, n, 15), rng.randint(0, n, 15)]).astype(np.int64)
    ctx.apply_batch(np.empty((2, 0), dtype=np.int64), ins)
    for mode in ("driver", "p2p"):
        warm = (
            analytics.connected_components_incremental(ctx, ins, mode=mode)
            .to_pandas().sort_values("vid")["component"].to_numpy()
        )
        cold = cc_oracle(
            np.concatenate([src, ins[0]]), np.concatenate([dst, ins[1]]), n
        )
        np.testing.assert_array_equal(warm, cold)
    ctx.shutdown()


def test_cc_incremental_rejects_lp_labels():
    n = 20
    src, dst = _graph(1, n, 15)
    ctx = GraphContext(n, 2)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    analytics.label_propagation(ctx, max_iterations=3)
    ins = np.array([[0], [1]], dtype=np.int64)
    ctx.apply_batch(np.empty((2, 0), dtype=np.int64), ins)
    with pytest.raises(Exception):
        analytics.connected_components_incremental(ctx, ins)
    ctx.shutdown()


def test_triangles_empty_oriented_shard():
    """A shard whose every owned vertex is a local rank-maximum has an
    EMPTY oriented adjacency but still receives wedge queries.
    Regression: tri_answer indexed position 0 of the empty array.

    Construction (P=4): apex 2 connects to x=3 and y=4; x's other
    neighbors (0, 1) rank below it and y is not adjacent to x, so
    ori(x) = {}; vertex 7 (isolated, ori = {}) co-owns shard 3 with x —
    yet apex 2 emits the wedge query (3, 4) to that empty-ori shard.
    No triangle exists."""
    n = 8
    src = np.array([2, 2, 3, 3, 4, 4], dtype=np.int64)
    dst = np.array([3, 4, 0, 1, 5, 6], dtype=np.int64)
    ctx = GraphContext(n, 4)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    try:
        total, per = analytics.triangle_count(ctx)
        assert total == 0
        assert per.to_pandas()["triangles"].sum() == 0
    finally:
        ctx.shutdown()


@pytest.mark.parametrize("num_parts", [1, 3])
def test_triangles_incremental_equals_recount(num_parts):
    """Batch-delta triangle counting: after each insertion batch the
    incrementally-maintained total must equal a cold recount (which the
    brute-force oracle verifies). Batches deliberately include
    self-loops, duplicates, reversed duplicates and already-present
    edges — all must be no-ops for the delta."""
    n = 40
    src, dst = _graph(3, n, 100)
    ctx = GraphContext(n, num_parts)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    total, _ = analytics.triangle_count(ctx)
    rng = np.random.RandomState(17)
    empty = np.empty((2, 0), dtype=np.int64)
    all_src, all_dst = [src], [dst]
    for round_ in range(3):
        k = 12
        ins = np.stack([rng.randint(0, n, k), rng.randint(0, n, k)]).astype(np.int64)
        ins[:, 0] = ins[:, 1]  # duplicate pair inside the batch
        ins[0, 2] = ins[1, 2]  # self-loop
        ins[:, 3] = [dst[0], src[0]]  # reversed already-present edge
        total = analytics.triangle_count_incremental(ctx, ins, total)
        _, ins_t = ctx.tidy_batch(empty, ins)
        ctx.apply_batch(empty, ins_t)
        all_src.append(ins[0])
        all_dst.append(ins[1])
        cold, _ = analytics.triangle_count(ctx)
        assert total == cold, (round_, total, cold)
        want, _ = triangles_oracle(np.concatenate(all_src), np.concatenate(all_dst), n)
        assert total == want, (round_, total, want)
    ctx.shutdown()


@pytest.mark.parametrize("num_parts", [1, 3])
def test_hits_matches_oracle(num_parts):
    """HITS hubs/authorities vs the numpy oracle; transpose-exchange
    pull must survive a batch update (index rebuilt lazily)."""
    from .oracle import hits_oracle

    n = 50
    src, dst = _graph(21, n, 160)
    ctx = GraphContext(n, num_parts)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    a, h = ctx.hits(iterations=20)
    wa, wh = hits_oracle(src, dst, n, iterations=20)
    np.testing.assert_allclose(a, wa, atol=1e-9)
    np.testing.assert_allclose(h, wh, atol=1e-9)
    assert abs((a * a).sum() - 1.0) < 1e-9 and abs((h * h).sum() - 1.0) < 1e-9
    # end-normalized variant points the same direction
    a2, h2 = ctx.hits(iterations=20, normalize="end")
    np.testing.assert_allclose(a2, wa, atol=1e-7)
    np.testing.assert_allclose(h2, wh, atol=1e-7)
    # batch update invalidates the transpose index; rerun must match a
    # fresh oracle over the updated edge set
    empty = np.empty((2, 0), dtype=np.int64)
    rng = np.random.RandomState(5)
    ins = np.stack([rng.randint(0, n, 6), rng.randint(0, n, 6)]).astype(np.int64)
    _, ins_t = ctx.tidy_batch(empty, ins)
    ctx.apply_batch(empty, ins_t)
    a3, h3 = ctx.hits(iterations=20)
    wa3, wh3 = hits_oracle(np.concatenate([src, ins[0]]), np.concatenate([dst, ins[1]]), n, iterations=20)
    np.testing.assert_allclose(a3, wa3, atol=1e-9)
    np.testing.assert_allclose(h3, wh3, atol=1e-9)
    ctx.shutdown()


def test_hits_weighted():
    from .oracle import hits_oracle

    n = 30
    src, dst = _graph(8, n, 90)
    src = np.concatenate([src, src[:30]])
    dst = np.concatenate([dst, dst[:30]])
    ctx = GraphContext(n, 2, weighted=True)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    a, h = ctx.hits(iterations=15)
    wa, wh = hits_oracle(src, dst, n, iterations=15, weighted=True)
    np.testing.assert_allclose(a, wa, atol=1e-9)
    np.testing.assert_allclose(h, wh, atol=1e-9)
    # weights change the answer
    ua, _ = hits_oracle(src, dst, n, iterations=15)
    assert not np.allclose(a, ua, atol=1e-9)
    ctx.shutdown()


@pytest.mark.parametrize("num_parts", [1, 3])
def test_core_numbers_matches_oracle(num_parts):
    """Distributed parallel peel vs the sequential Batagelj-Zaversnik
    oracle (core numbers are a schedule-invariant graph invariant, so
    both must agree exactly); survives a batch update."""
    from .oracle import core_oracle

    n = 70
    src, dst = _graph(33, n, 260)  # dense enough for cores >= 3
    ctx = GraphContext(n, num_parts)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    got = analytics.core_numbers(ctx).to_pandas().sort_values("vid")["core"].to_numpy()
    want = core_oracle(src, dst, n)
    np.testing.assert_array_equal(got, want)
    assert want.max() >= 3  # exercise watermark jumps, not just the 0/1 fringe
    # batch update invalidates the symmetric view; rerun matches a fresh oracle
    empty = np.empty((2, 0), dtype=np.int64)
    rng = np.random.RandomState(7)
    ins = np.stack([rng.randint(0, n, 20), rng.randint(0, n, 20)]).astype(np.int64)
    _, ins_t = ctx.tidy_batch(empty, ins)
    ctx.apply_batch(empty, ins_t)
    got2 = analytics.core_numbers(ctx).to_pandas().sort_values("vid")["core"].to_numpy()
    want2 = core_oracle(np.concatenate([src, ins[0]]), np.concatenate([dst, ins[1]]), n)
    np.testing.assert_array_equal(got2, want2)
    ctx.shutdown()


def test_core_numbers_isolated_and_ring():
    """Structured shapes: isolated vertices core 0, a pure ring core 2,
    a pendant path core 1."""
    from .oracle import core_oracle

    # ring 0..9, path 10-11-12 hanging off vertex 0, isolated 13..15
    ring = np.arange(10)
    src = np.concatenate([ring, [0, 10, 11]]).astype(np.int64)
    dst = np.concatenate([(ring + 1) % 10, [10, 11, 12]]).astype(np.int64)
    n = 16
    ctx = GraphContext(n, 2)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    got = analytics.core_numbers(ctx).to_pandas().sort_values("vid")["core"].to_numpy()
    np.testing.assert_array_equal(got, core_oracle(src, dst, n))
    assert list(got[13:]) == [0, 0, 0] and got[12] == 1 and got[5] == 2
    ctx.shutdown()


@pytest.mark.parametrize("num_parts", [1, 3])
def test_random_walks_deterministic(num_parts):
    """Distributed walks vs a sequential replay of the same hash-choice
    protocol — paths must be identical at any partitioning."""
    from pagerank_cuda_dynamic_ray.functions.hashing import mix2

    n = 40
    src, dst = _graph(13, n, 120)
    ctx = GraphContext(n, num_parts)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    length, seed = 6, 3
    out = analytics.random_walks(ctx, length=length, seed=seed).to_pandas()
    # sequential oracle: engine adjacency = sorted unique out-dsts incl
    # the universal self-loop added by finalize
    adj = [np.unique(np.concatenate([dst[src == v], [v]])) for v in range(n)]
    off = (seed << 60) % (1 << 64)
    want = {}
    for w in range(n):
        cur = w
        want[(w, 0)] = cur
        for t in range(length):
            r = mix2(mix2(np.array([w], np.uint64), np.array([cur], np.uint64)),
                     np.uint64(off + t))[0]
            cur = int(adj[cur][int(r % np.uint64(len(adj[cur])))])
            want[(w, t + 1)] = cur
    got = {(int(r.walk), int(r.step)): int(r.vid) for r in out.itertuples()}
    assert got == want
    ctx.shutdown()


@pytest.mark.parametrize("num_parts", [1, 3])
def test_harmonic_centrality(num_parts):
    """Exact-integer truncated harmonic vs a brute-force BFS oracle."""
    from pagerank_cuda_dynamic_ray.functions.hashing import splitmix64

    n = 50
    src, dst = _graph(17, n, 110)
    ctx = GraphContext(n, num_parts)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    got = analytics.harmonic_centrality(ctx, num_seeds=6, max_depth=12, seed=2)
    got = got.to_pandas().sort_values("vid")["harmonic"].to_numpy()
    # oracle
    adj = [set() for _ in range(n)]
    for u, v in zip(src, dst):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    off = (2 << 60) % (1 << 64)
    h = splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(off))
    seeds = np.lexsort((np.arange(n), h))[:6]
    want = np.zeros(n, dtype=np.int64)
    for s in seeds:
        dist = {int(s): 0}
        frontier = [int(s)]
        d = 0
        while frontier and d < 12:
            d += 1
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        for v, dv in dist.items():
            if dv > 0:
                want[v] += 27720 // dv
    np.testing.assert_array_equal(got, want)
    ctx.shutdown()


@pytest.mark.parametrize("num_parts", [1, 3])
def test_neighborhood_jaccard(num_parts):
    """Top link-prediction pairs vs brute force; integer scores."""
    n = 40
    src, dst = _graph(23, n, 130)
    ctx = GraphContext(n, num_parts)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    out = analytics.neighborhood_jaccard(ctx, min_common=2, top=30).to_pandas()
    adj = [set() for _ in range(n)]
    for u, v in zip(src, dst):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    rows = []
    for a in range(n):
        for b in range(a + 1, n):
            c = len(adj[a] & adj[b])
            if c >= 2:
                rows.append((c * 1_000_000 // (len(adj[a]) + len(adj[b]) - c), a, b, c))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    want = rows[:30]
    got = [(int(r.jaccard_e6), int(r.a), int(r.b), int(r.common)) for r in out.itertuples()]
    assert got == want
    ctx.shutdown()


@pytest.mark.parametrize("num_parts", [1, 3])
def test_closeness_centrality(num_parts):
    """Integer closeness sufficient stats vs a brute-force BFS oracle."""
    from pagerank_cuda_dynamic_ray.functions.hashing import splitmix64

    n = 50
    src, dst = _graph(23, n, 110)
    ctx = GraphContext(n, num_parts)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    out = (analytics.closeness_centrality(ctx, num_seeds=6, max_depth=12, seed=2)
           .to_pandas().sort_values("vid"))
    adj = [set() for _ in range(n)]
    for u, v in zip(src, dst):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    off = (2 << 60) % (1 << 64)
    h = splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(off))
    seeds = np.lexsort((np.arange(n), h))[:6]
    want_n = np.zeros(n, dtype=np.int64)
    want_s = np.zeros(n, dtype=np.int64)
    for s in seeds:
        dist = {int(s): 0}
        frontier = [int(s)]
        d = 0
        while frontier and d < 12:
            d += 1
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        for v, dv in dist.items():
            if dv > 0:
                want_n[v] += 1
                want_s[v] += dv
    np.testing.assert_array_equal(out["n_reached"].to_numpy(), want_n)
    np.testing.assert_array_equal(out["sum_dist"].to_numpy(), want_s)
    ctx.shutdown()
