"""BFS distances and modularity vs brute-force oracles."""

import numpy as np
import pandas as pd
import pytest

from pagerank_cuda_dynamic_ray.pipelines.graph import GraphContext
from pagerank_cuda_dynamic_ray.pipelines import analytics as A


@pytest.fixture(scope="module")
def ctx():
    # two triangles bridged by one edge + an isolated vertex (vid 7)
    src = np.array([0, 1, 2, 3, 4, 5, 2, 0, 1, 3, 4, 5])
    dst = np.array([1, 2, 0, 4, 5, 3, 3, 2, 0, 5, 3, 4])
    c = GraphContext(8, 3, add_self_loops=False)
    c.ingest_pairs(src, dst)
    c.finalize()
    yield c
    c.shutdown()


def test_bfs_distances(ctx):
    got = (
        A.bfs_distances(ctx, 0).to_pandas().sort_values("vid")["distance"].to_numpy()
    )
    # undirected view: 0-1-2 triangle, bridge 2-3, triangle 3-4-5, vid 6/7 unreached
    want = np.array([0, 1, 1, 2, 3, 3, -1, -1])
    np.testing.assert_array_equal(got, want)


def test_two_hop_counts_bruteforce():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(9)
    names = np.array([f"v{i:02d}" for i in range(12)])
    src = names[rng.integers(0, 12, 30)]
    dst = names[rng.integers(0, 12, 30)]
    edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    ids = rd.from_arrow(pa.table({"conv_id": pa.array(names)}))
    got = (A.two_hop_counts(edges, ids, num_partitions=4).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    adj = {n: set() for n in names}
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    want = []
    for n in names:
        ball = set(adj[n])
        for u in adj[n]:
            ball |= adj[u]
        ball.discard(n)
        want.append(len(ball))
    np.testing.assert_array_equal(got["n_two_hop"].to_numpy(), np.array(want))


def test_two_hop_counts_capped_flag_semantics():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(5)
    names = np.array([f"v{i:02d}" for i in range(14)])
    src = names[rng.integers(0, 14, 40)].tolist()
    dst = names[rng.integers(0, 14, 40)].tolist()
    # a deliberate hub: v00 adjacent to everyone
    src += ["v00"] * 13
    dst += [f"v{i:02d}" for i in range(1, 14)]
    edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    ids = rd.from_arrow(pa.table({"conv_id": pa.array(names)}))
    cap = 4
    got = (A.two_hop_counts(edges, ids, num_partitions=4, cap=cap).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    # brute force the capped semantics: per vertex keep the cap SMALLEST
    # distinct neighbors; 2-hop over capped lists; truncated = own
    # overflow or any kept mid's overflow
    adj = {n: set() for n in names}
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    kept = {n: sorted(adj[n])[:cap] for n in names}
    over = {n: len(adj[n]) > cap for n in names}
    for i, n in enumerate(names):
        ball = set(kept[n])
        for u in kept[n]:
            ball |= set(kept[u])
        ball.discard(n)
        assert got.loc[i, "n_two_hop"] == len(ball), n
        want_tr = over[n] or any(over[u] for u in kept[n])
        assert bool(got.loc[i, "truncated"]) == want_tr, n
    # the hub must be flagged; with a generous cap nothing is flagged
    assert got.loc[0, "truncated"] == 1
    big = (A.two_hop_counts(edges, ids, num_partitions=4, cap=100).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    unc = (A.two_hop_counts(edges, ids, num_partitions=4).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    assert (big["truncated"] == 0).all()
    assert (big["n_two_hop"].to_numpy() == unc["n_two_hop"].to_numpy()).all()
    assert "truncated" not in unc.columns  # uncapped schema unchanged


def test_seg_cap_edge_regimes():
    from pagerank_cuda_dynamic_ray.pipelines.analytics import _seg_cap

    # empty input (a block with <= 2 a-runs slices an empty interior)
    a = np.array([], dtype=object)
    ka, kb, kov = _seg_cap(a, a, np.empty(0, np.int64), 3)
    assert len(ka) == 0 and len(kb) == 0 and len(kov) == 0
    # duplicates across blocks + block-overflow bit folding: the run's
    # over bit must see EVERY duplicate row's ov, not just the kept ones
    av = np.array(["x", "x", "x", "y"], dtype=object)
    bv = np.array(["1", "1", "2", "9"], dtype=object)
    ov = np.array([0, 1, 0, 0], dtype=np.int64)  # dup row carries the bit
    ka, kb, kov = _seg_cap(av, bv, ov, 2)
    assert ka.tolist() == ["x", "x", "y"]
    assert kb.tolist() == ["1", "2", "9"]
    assert kov.tolist() == [1, 1, 0]  # x over (block bit), y clean
    # truncation: distinct count > cap flags over even with no block bit
    av = np.array(["z"] * 4, dtype=object)
    bv = np.array(["1", "2", "3", "4"], dtype=object)
    ka, kb, kov = _seg_cap(av, bv, np.zeros(4, np.int64), 2)
    assert kb.tolist() == ["1", "2"] and kov.tolist() == [1, 1]


def test_two_hop_capped_many_tiny_blocks():
    # stress the sorted-segment boundary machinery: enough partitions
    # that most post-sort blocks hold only 1-2 vertex runs (the regime
    # that used to crash the interior slice / emit null-typed empties)
    import pyarrow as pa
    import ray.data as rd

    names = np.array([f"n{i:02d}" for i in range(10)])
    src = names[[0, 0, 1, 2, 3, 4, 5, 6, 7, 8]].tolist()
    dst = names[[1, 2, 2, 3, 4, 5, 6, 7, 8, 9]].tolist()
    edges = rd.from_arrow(pa.table({"src": pa.array(src),
                                    "dst": pa.array(dst)})).repartition(8)
    ids = rd.from_arrow(pa.table({"conv_id": pa.array(names)}))
    got = (A.two_hop_counts(edges, ids, num_partitions=4, cap=2).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    adj = {n: set() for n in names}
    for a, b in zip(src, dst):
        adj[a].add(b)
        adj[b].add(a)
    kept = {n: sorted(adj[n])[:2] for n in names}
    over = {n: len(adj[n]) > 2 for n in names}
    for i, n in enumerate(names):
        ball = set(kept[n])
        for u in kept[n]:
            ball |= set(kept[u])
        ball.discard(n)
        assert got.loc[i, "n_two_hop"] == len(ball), n
        assert bool(got.loc[i, "truncated"]) == (
            over[n] or any(over[u] for u in kept[n])), n
    # the distributed flag fallback (flag_broadcast_bytes=0 forces the
    # join + sorted-segment path) must agree exactly with the broadcast
    # per-block plan
    fb = (A.two_hop_counts(edges, ids, num_partitions=4, cap=2,
                           flag_broadcast_bytes=0).to_pandas()
          .sort_values("conv_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(fb, got)


def test_pseudo_diameter_double_sweep(ctx):
    # sweep 1 from vid 0 reaches vids 4/5 at distance 3 (tie -> vid 4);
    # sweep 2 from vid 4 back across the bridge is also eccentricity 3
    out = A.pseudo_diameter(ctx).to_pandas()
    assert len(out) == 1
    assert out["far_conv"].iloc[0] == "4"
    assert out["pseudo_diameter"].iloc[0] == 3


def test_pseudo_diameter_wholly_unreached_shard_blocks():
    # vertices 1,4,7 (shard 1 at P=3) and 2,5,8 (shard 2) are isolated:
    # their far_partial blocks take the all-unreached early return, whose
    # schema must match the reached branch (4 columns incl. disp) or
    # to_pandas fails schema unification
    src = np.array([0, 3])
    dst = np.array([3, 6])
    c = GraphContext(9, 3, add_self_loops=False)
    c.ingest_pairs(src, dst)
    c.finalize()
    try:
        out = A.pseudo_diameter(c).to_pandas()
        assert len(out) == 1
        assert out["pseudo_diameter"].iloc[0] == 2  # path 0-3-6
        assert out["far_conv"].iloc[0] == "6"
    finally:
        c.shutdown()


def test_modularity_matches_bruteforce(ctx):
    cc = A.connected_components(ctx)
    q = A.modularity(ctx)
    # brute force on the undirected simple graph
    edges = {(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)}
    deg = np.zeros(8)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    labels = cc.to_pandas().sort_values("vid")["component"].to_numpy()
    two_m = deg.sum()
    want = 0.0
    for comp in np.unique(labels):
        members = set(np.flatnonzero(labels == comp).tolist())
        within = 2 * sum(1 for a, b in edges if a in members and b in members)
        want += within / two_m - (deg[list(members)].sum() / two_m) ** 2
    assert abs(q - want) < 1e-12


def test_modularity_with_installed_labels(ctx):
    import ray
    import pyarrow as pa
    import ray.data as rd

    # perfect two-community split should beat the all-one-community split
    labels_good = rd.from_arrow(pa.table({
        "vid": np.arange(8, dtype=np.int64),
        "label": np.array([0, 0, 0, 1, 1, 1, 2, 3], dtype=np.int64),
    }))
    labels_one = rd.from_arrow(pa.table({
        "vid": np.arange(8, dtype=np.int64),
        "label": np.zeros(8, dtype=np.int64),
    }))
    q_good = A.modularity(ctx, labels_good)
    q_one = A.modularity(ctx, labels_one)
    assert q_good > q_one
    assert abs(q_one) < 1e-12  # single community: Q = 0 by definition


def test_modularity_install_guards(ctx):
    import pyarrow as pa
    import ray.data as rd
    import pytest

    # column picked by NAME even when another payload column precedes it
    labels = rd.from_arrow(pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(8)]),
        "vid": np.arange(8, dtype=np.int64),
        "component": np.array([0, 0, 0, 1, 1, 1, 2, 3], dtype=np.int64),
    }))
    q = A.modularity(ctx, labels)
    assert q > 0
    # partial coverage must raise, not silently merge into community 0
    partial = rd.from_arrow(pa.table({
        "vid": np.arange(4, dtype=np.int64),
        "label": np.zeros(4, dtype=np.int64),
    }))
    with pytest.raises(ValueError, match="cover every vertex"):
        A.modularity(ctx, partial)
    # unnameable label column must raise, not guess by position
    ambiguous = rd.from_arrow(pa.table({
        "vid": np.arange(8, dtype=np.int64),
        "foo": np.zeros(8, dtype=np.int64),
        "bar": np.zeros(8, dtype=np.int64),
    }))
    with pytest.raises(ValueError, match="ambiguous"):
        A.modularity(ctx, ambiguous)
    # duplicate vids must raise (the distributed install counts them
    # shard-side; a silent last-writer-wins would be nondeterministic)
    dup = rd.from_arrow(pa.table({
        "vid": np.array([0, 1, 2, 3, 4, 5, 6, 6], dtype=np.int64),
        "label": np.zeros(8, dtype=np.int64),
    }))
    with pytest.raises(ValueError, match="cover every vertex"):
        A.modularity(ctx, dup)
    # a failed install must not leave partial labels behind: a follow-up
    # valid install still works and prior ctx labels are intact
    q2 = A.modularity(ctx, labels)
    assert abs(q2 - q) < 1e-12


# ----------------------------------------------------------------------
# degree distribution + assortativity
# ----------------------------------------------------------------------

_FIX_SRC = np.array([0, 1, 2, 3, 4, 5, 2, 0, 1, 3, 4, 5])
_FIX_DST = np.array([1, 2, 0, 4, 5, 3, 3, 2, 0, 5, 3, 4])


def _brute_degrees(n, src, dst):
    pairs = sorted(set(zip(src.tolist(), dst.tolist())))
    od = np.zeros(n, np.int64)
    idg = np.zeros(n, np.int64)
    for a, b in pairs:
        od[a] += 1
        idg[b] += 1
    return pairs, od, idg


def test_degree_distribution_matches_bruteforce(ctx):
    got = (A.degree_distribution(ctx).to_pandas()
           .sort_values(["kind", "degree"]).reset_index(drop=True))
    _, od, idg = _brute_degrees(8, _FIX_SRC, _FIX_DST)
    import pandas as pd
    rows = []
    for kind, d in (("in", idg), ("out", od)):
        vals, cnt = np.unique(d, return_counts=True)
        for v, c in zip(vals, cnt):
            rows.append((kind, int(v), int(c)))
    want = pd.DataFrame(rows, columns=["kind", "degree", "n_vertices"])
    want = want.sort_values(["kind", "degree"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["kind", "degree", "n_vertices"]], want)


def test_assortativity_sums_match_bruteforce(ctx):
    pairs, od, idg = _brute_degrees(8, _FIX_SRC, _FIX_DST)
    x = np.array([od[a] for a, _ in pairs], np.int64)
    y = np.array([idg[b] for _, b in pairs], np.int64)
    s = A.assortativity_sums(ctx)
    assert s == {"m": len(pairs), "sx": int(x.sum()), "sy": int(y.sum()),
                 "sxy": int((x * y).sum()), "sxx": int((x * x).sum()),
                 "syy": int((y * y).sum())}
    # every edge source has outdeg 2 in this fixture -> zero x-variance
    # -> the coefficient is undefined; both sides must agree on NaN
    assert np.isnan(A.degree_assortativity(ctx))


def test_assortativity_partition_invariance():
    rng = np.random.RandomState(11)
    n = 60
    src = rng.randint(0, n, 400).astype(np.int64)
    dst = rng.randint(0, n, 400).astype(np.int64)
    sums = []
    for parts in (1, 4):
        c = GraphContext(n, parts, add_self_loops=True)
        c.ingest_pairs(src, dst)
        c.finalize()
        sums.append(A.assortativity_sums(c))
        c.shutdown()
    assert sums[0] == sums[1]
    # brute force incl. the structural self-loop on every vertex
    pairs = sorted(set(zip(src.tolist(), dst.tolist())) | {(v, v) for v in range(n)})
    od = np.zeros(n, np.int64)
    idg = np.zeros(n, np.int64)
    for a, b in pairs:
        od[a] += 1
        idg[b] += 1
    x = np.array([od[a] for a, _ in pairs], np.int64)
    y = np.array([idg[b] for _, b in pairs], np.int64)
    assert sums[0]["m"] == len(pairs)
    assert sums[0]["sxy"] == int((x * y).sum())
    # non-degenerate degrees here: coefficient matches numpy's Pearson r
    c = GraphContext(n, 4, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    r = A.degree_assortativity(c)
    c.shutdown()
    assert abs(r - float(np.corrcoef(x, y)[0, 1])) < 1e-12


# ----------------------------------------------------------------------
# SCC of seeds (directed forward ∩ backward reachability)
# ----------------------------------------------------------------------

@pytest.mark.parametrize("parts", [1, 3])
def test_scc_of_seeds_known_structure(parts):
    # cycle {0,1,2} -> 3, cycle {3,4}, isolated 5 (self-loops everywhere)
    src = np.array([0, 1, 2, 2, 3, 4])
    dst = np.array([1, 2, 0, 3, 4, 3])
    c = GraphContext(6, parts, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    got = A.scc_of_seeds(c, seeds=np.array([0, 3, 5])).to_pandas()
    c.shutdown()
    groups = {s: sorted(g["vid"]) for s, g in got.groupby("seed_vid")}
    assert groups == {0: [0, 1, 2], 3: [3, 4], 5: [5]}


def test_scc_seed_election_is_partition_invariant():
    rng = np.random.RandomState(5)
    src = rng.randint(0, 30, 120).astype(np.int64)
    dst = rng.randint(0, 30, 120).astype(np.int64)
    outs = []
    for parts in (1, 4):
        c = GraphContext(30, parts, add_self_loops=True)
        c.ingest_pairs(src, dst)
        c.finalize()
        outs.append(A.scc_of_seeds(c, num_seeds=3, seed=0).to_pandas()
                    .sort_values(["seed_vid", "vid"]).reset_index(drop=True))
        c.shutdown()
    import pandas as pd
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # brute-force check: membership == mutual reachability with the seed
    pairs = set(zip(src.tolist(), dst.tolist())) | {(v, v) for v in range(30)}
    adj = {v: set() for v in range(30)}
    radj = {v: set() for v in range(30)}
    for a, b in pairs:
        adj[a].add(b)
        radj[b].add(a)

    def reach(s, g):
        seen, stk = {s}, [s]
        while stk:
            v = stk.pop()
            for w in g[v]:
                if w not in seen:
                    seen.add(w)
                    stk.append(w)
        return seen

    for sv, g in outs[0].groupby("seed_vid"):
        want = sorted(reach(sv, adj) & reach(sv, radj))
        assert sorted(g["vid"]) == want


def test_eccentricity_sample_known_graph(ctx):
    # undirected view: path 0-1-2-3-4-5 shape from the two bridged
    # triangles; vids 6/7 isolated (no self-loops in this fixture)
    t = A.eccentricity_sample(ctx, seeds=np.array([0, 4, 6])).to_pandas()
    got = dict(zip(t["seed_vid"], t["eccentricity"]))
    # brute force: ecc(0)=3 (to 4/5), ecc(4)=3 (to 0/1), ecc(6)=-1
    # (unreached everywhere; isolated vertex never enters any frontier —
    # bfs_init only seeds owned vertices, and 6 has no edges, so dist_max
    # over reached is 0 at its own shard)
    assert got[0] == 3 and got[4] == 3
    assert got[6] == 0  # the seed itself is reached at distance 0


# ----------------------------------------------------------------------
# Brandes: shortest-path counts + sampled betweenness
# ----------------------------------------------------------------------

def _brute_brandes(n, pairs, sources):
    """Reference Brandes on the undirected simple graph."""
    from collections import deque
    adj = {v: set() for v in range(n)}
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    btw = np.zeros(n)
    all_sp = {}
    for s in sources:
        dist = {s: 0}
        sigma = {v: 0 for v in range(n)}
        sigma[s] = 1
        order = []
        dq = deque([s])
        while dq:
            v = dq.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    dq.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = {v: 0.0 for v in range(n)}
        for w in reversed(order):
            for v in adj[w]:
                if dist.get(v, -9) == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                btw[w] += delta[w]
        all_sp[s] = (dist, dict(sigma))
    return btw, all_sp


@pytest.mark.parametrize("parts", [1, 4])
def test_shortest_path_counts_and_betweenness(parts):
    rng = np.random.RandomState(9)
    n = 40
    src = rng.randint(0, n, 140).astype(np.int64)
    dst = rng.randint(0, n, 140).astype(np.int64)
    pairs = sorted(set(zip(src.tolist(), dst.tolist())))
    seeds = [0, 7, 13]
    btw, all_sp = _brute_brandes(n, pairs, seeds)
    c = GraphContext(n, parts, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    sp = (A.shortest_path_counts(c, 7).to_pandas()
          .sort_values("vid").reset_index(drop=True))
    dist7, sig7 = all_sp[7]
    for v in range(n):
        assert sp.loc[v, "distance"] == dist7.get(v, -1)
        assert sp.loc[v, "sigma"] == (sig7[v] if v in dist7 else 0)
    got = (A.betweenness_sample(c, seeds=np.array(seeds)).to_pandas()
           .sort_values("vid").reset_index(drop=True))
    c.shutdown()
    np.testing.assert_allclose(got["betweenness"].to_numpy(), btw, atol=1e-9)


def test_betweenness_partition_invariant_bitwise():
    rng = np.random.RandomState(21)
    n = 50
    src = rng.randint(0, n, 200).astype(np.int64)
    dst = rng.randint(0, n, 200).astype(np.int64)
    outs = []
    for parts in (1, 5):
        c = GraphContext(n, parts, add_self_loops=True)
        c.ingest_pairs(src, dst)
        c.finalize()
        outs.append(A.betweenness_sample(c, num_seeds=3, seed=0).to_pandas()
                    .sort_values("vid").reset_index(drop=True))
        c.shutdown()
    # deterministic per partitioning; across partitionings the float
    # combine order differs (per-shard partial sums), so allclose only
    np.testing.assert_allclose(outs[0]["betweenness"].to_numpy(),
                               outs[1]["betweenness"].to_numpy(),
                               rtol=0, atol=1e-9)
    # repeat runs at the same partitioning are bit-identical
    c = GraphContext(n, 5, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    a = A.betweenness_sample(c, num_seeds=3, seed=0).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    b = A.betweenness_sample(c, num_seeds=3, seed=0).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    c.shutdown()
    assert (a["betweenness"].to_numpy() == b["betweenness"].to_numpy()).all()


@pytest.mark.parametrize("parts", [1, 4])
def test_edge_triangle_support(parts):
    rng = np.random.RandomState(17)
    n = 30
    src = rng.randint(0, n, 150).astype(np.int64)
    dst = rng.randint(0, n, 150).astype(np.int64)
    c = GraphContext(n, parts, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    got = (A.edge_triangle_support(c).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    tri, _ = A.triangle_count(c)
    c.shutdown()
    # brute force: undirected simple edges + common-neighbor counts
    adj = {v: set() for v in range(n)}
    for x, y in zip(src.tolist(), dst.tolist()):
        if x != y:
            adj[x].add(y)
            adj[y].add(x)
    edges = sorted((a, b) for a in range(n) for b in adj[a] if a < b)
    assert list(zip(got["a"], got["b"])) == edges
    want = [len(adj[a] & adj[b]) for a, b in edges]
    assert got["support"].tolist() == want
    assert got["support"].sum() == 3 * tri   # every triangle has 3 edges


@pytest.mark.parametrize("parts", [1, 3])
def test_ktruss_edges(parts):
    # K5 (a 5-truss=“every edge in 3 triangles” clique) + a pendant
    # triangle chain that any k=4 peel must strip entirely
    src = np.array([0, 0, 0, 0, 1, 1, 1, 2, 2, 3, 4, 5, 5, 6])
    dst = np.array([1, 2, 3, 4, 2, 3, 4, 3, 4, 4, 5, 6, 7, 7])
    c = GraphContext(8, parts, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    got4 = (A.ktruss_edges(c, k=4).to_pandas()
            .sort_values(["a", "b"]).reset_index(drop=True))
    got5 = (A.ktruss_edges(c, k=5).to_pandas()
            .sort_values(["a", "b"]).reset_index(drop=True))
    got6 = A.ktruss_edges(c, k=6).to_pandas()
    c.shutdown()
    k5 = sorted((a, b) for a in range(5) for b in range(a + 1, 5))
    # k=4: the K5 clique survives (each edge in 3 clique triangles);
    # the 4-5-6-7 tail has edges in <=1 triangle and must peel away
    assert list(zip(got4["a"], got4["b"])) == k5
    assert list(zip(got5["a"], got5["b"])) == k5  # K5 is a 5-truss too
    assert len(got6) == 0                         # but not a 6-truss


def test_ktruss_bruteforce_random():
    rng = np.random.RandomState(23)
    n = 25
    src = rng.randint(0, n, 130).astype(np.int64)
    dst = rng.randint(0, n, 130).astype(np.int64)
    # brute force peel
    edges = {(min(a, b), max(a, b)) for a, b in zip(src.tolist(), dst.tolist()) if a != b}
    k = 4
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        dead = {(a, b) for a, b in edges if len(adj[a] & adj[b]) < k - 2}
        if not dead:
            break
        edges -= dead
    c = GraphContext(n, 3, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    got = (A.ktruss_edges(c, k=k).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    c.shutdown()
    assert list(zip(got["a"], got["b"])) == sorted(edges)


@pytest.mark.parametrize("parts", [1, 3])
def test_resource_allocation_bruteforce(parts):
    rng = np.random.RandomState(31)
    n = 30
    src = rng.randint(0, n, 90).astype(np.int64)
    dst = rng.randint(0, n, 90).astype(np.int64)
    adj = {}
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    scale = 1_000_000_000
    want = {}
    for z, nb in adj.items():
        w = scale // len(nb)
        nbs = sorted(nb)
        for i in range(len(nbs)):
            for j in range(i + 1, len(nbs)):
                want[(nbs[i], nbs[j])] = want.get((nbs[i], nbs[j]), 0) + w
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    c = GraphContext(n, parts, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    got = A.resource_allocation(c, top=20).to_pandas()
    c.shutdown()
    assert [((a, b), s) for a, b, s in
            zip(got["a"], got["b"], got["ra_e9"])] == top


@pytest.mark.parametrize("parts", [1, 3])
def test_clustering_coefficient(parts):
    # K4 on 0-3 (cc=1 each) + vertex 4 joined to 0,1 only (cc: one
    # closed pair of three -> tri=1, d=2 -> cc=1e6) + pendant 5-0
    src = np.array([0, 0, 0, 1, 1, 2, 4, 4, 5])
    dst = np.array([1, 2, 3, 2, 3, 3, 0, 1, 0])
    c = GraphContext(6, parts, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    got = (A.clustering_coefficient(c).to_pandas()
           .sort_values("vid").reset_index(drop=True))
    c.shutdown()
    deg = {0: 5, 1: 4, 2: 3, 3: 3, 4: 2, 5: 1}
    tri = {0: 4, 1: 4, 2: 3, 3: 3, 4: 1, 5: 0}
    want = [0 if deg[v] < 2 else (2 * tri[v] * 10**6) // (deg[v] * (deg[v] - 1))
            for v in range(6)]
    assert got["triangles"].tolist() == [tri[v] for v in range(6)]
    assert got["cc_e6"].tolist() == want


# ----------------------------------------------------------------------
# maximal independent set (Luby rounds, fixed splitmix64 priorities)
# ----------------------------------------------------------------------

def _greedy_mis(n, edges):
    """Sequential greedy MIS in increasing splitmix64(vid) order — the
    unique result the parallel rounds must reproduce."""
    from pagerank_cuda_dynamic_ray.functions.hashing import splitmix64

    nbrs = {v: set() for v in range(n)}
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    prio = splitmix64(np.arange(n, dtype=np.uint64))
    mis = set()
    for v in np.argsort(prio):
        if not (nbrs[int(v)] & mis):
            mis.add(int(v))
    return mis


@pytest.mark.parametrize("parts", [1, 3])
def test_mis_known_structure(parts):
    # two triangles bridged by 2-3, isolated 6 and 7
    src = np.array([0, 1, 2, 3, 4, 5, 2])
    dst = np.array([1, 2, 0, 4, 5, 3, 3])
    c = GraphContext(8, parts, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    got = A.maximal_independent_set(c).to_pandas().sort_values("vid")
    c.shutdown()
    members = set(got[got["in_mis"] == 1]["vid"].tolist())
    edges = set(zip(src.tolist(), dst.tolist()))
    # independent + maximal
    assert not any((a in members) and (b in members) for a, b in edges if a != b)
    assert {6, 7} <= members
    assert members == _greedy_mis(8, edges)


def test_mis_random_graph_matches_greedy_and_partition_invariant():
    rng = np.random.RandomState(11)
    src = rng.randint(0, 60, 300).astype(np.int64)
    dst = rng.randint(0, 60, 300).astype(np.int64)
    want = _greedy_mis(60, set(zip(src.tolist(), dst.tolist())))
    for parts in (1, 4, 7):
        # 0.25 CPU/shard: the module-scoped 3-shard fixture may be
        # alive; 7 x 0.5 + 1.5 would exhaust the 4-CPU test cluster
        c = GraphContext(60, parts, add_self_loops=True,
                         num_cpus_per_shard=0.25)
        c.ingest_pairs(src, dst)
        c.finalize()
        got = A.maximal_independent_set(c).to_pandas()
        c.shutdown()
        assert set(got[got["in_mis"] == 1]["vid"].tolist()) == want


# ----------------------------------------------------------------------
# weighted SSSP (Bellman-Ford BSP, deterministic hash weights)
# ----------------------------------------------------------------------

def _dijkstra_oracle(n, edges, source, wmod):
    """Sequential Dijkstra with the engine's weight function
    w(u,v) = 1 + mix2(min,max) % wmod; unreached = -1."""
    import heapq
    from pagerank_cuda_dynamic_ray.functions.hashing import mix2

    def w(a, b):
        lo, hi = (a, b) if a < b else (b, a)
        return 1 + int(mix2(np.uint64(lo), np.uint64(hi)) % np.uint64(wmod))

    nbrs = {v: set() for v in range(n)}
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    dist = {source: 0}
    heap = [(0, source)]
    while heap:
        d, v = heapq.heappop(heap)
        if d > dist.get(v, 1 << 62):
            continue
        for u in nbrs[v]:
            nd = d + w(v, u)
            if nd < dist.get(u, 1 << 62):
                dist[u] = nd
                heapq.heappush(heap, (nd, u))
    return np.array([dist.get(v, -1) for v in range(n)], dtype=np.int64)


def test_sssp_weighted_random_graph_matches_dijkstra_and_partition_invariant():
    rng = np.random.RandomState(7)
    src = rng.randint(0, 50, 220).astype(np.int64)
    dst = rng.randint(0, 50, 220).astype(np.int64)
    edges = set(zip(src.tolist(), dst.tolist()))
    from pagerank_cuda_dynamic_ray.pipelines.analytics import _elect_seeds

    want = None
    for parts in (1, 4, 7):
        # 0.25 CPU/shard: the module-scoped 3-shard fixture may be
        # alive; 7 x 0.5 + 1.5 would exhaust the 4-CPU test cluster
        c = GraphContext(50, parts, add_self_loops=True,
                         num_cpus_per_shard=0.25)
        c.ingest_pairs(src, dst)
        c.finalize()
        if want is None:
            seed_vid = int(_elect_seeds(c, 1, 0)[0])
            want = _dijkstra_oracle(50, edges, seed_vid, 8)
        got = A.sssp_weighted(c, wmod=8).to_pandas().sort_values("vid")
        c.shutdown()
        np.testing.assert_array_equal(got["sdist"].to_numpy(), want)


def test_sssp_weighted_disconnected_and_wmod1():
    # wmod=1 makes every weight 1: sdist must equal BFS hop distance
    src = np.array([0, 1, 2, 5])
    dst = np.array([1, 2, 3, 6])
    c = GraphContext(8, 3, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    from pagerank_cuda_dynamic_ray.pipelines.analytics import _elect_seeds
    seed_vid = int(_elect_seeds(c, 1, 0)[0])
    got = A.sssp_weighted(c, wmod=1).to_pandas().sort_values("vid")["sdist"].to_numpy()
    bfs = A.bfs_distances(c, seed_vid).to_pandas().sort_values("vid")["distance"].to_numpy()
    c.shutdown()
    np.testing.assert_array_equal(got, bfs)


# ----------------------------------------------------------------------
# greedy coloring (Jones-Plassmann rounds, fixed splitmix64 priorities)
# ----------------------------------------------------------------------

def _greedy_coloring(n, edges):
    """Sequential greedy coloring in increasing splitmix64(vid) order —
    the unique result the Jones-Plassmann rounds must reproduce."""
    from pagerank_cuda_dynamic_ray.functions.hashing import splitmix64

    nbrs = {v: set() for v in range(n)}
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    prio = splitmix64(np.arange(n, dtype=np.uint64))
    color = {}
    for v in np.argsort(prio):
        used = {color[u] for u in nbrs[int(v)] if u in color}
        c = 0
        while c in used:
            c += 1
        color[int(v)] = c
    return np.array([color[v] for v in range(n)], dtype=np.int64)


def test_coloring_random_graph_matches_greedy_and_partition_invariant():
    rng = np.random.RandomState(3)
    src = rng.randint(0, 60, 320).astype(np.int64)
    dst = rng.randint(0, 60, 320).astype(np.int64)
    edges = set(zip(src.tolist(), dst.tolist()))
    want = _greedy_coloring(60, edges)
    for parts in (1, 4, 7):
        # 0.25 CPU/shard: the module-scoped 3-shard fixture may be
        # alive; 7 x 0.5 + 1.5 would exhaust the 4-CPU test cluster
        c = GraphContext(60, parts, add_self_loops=True,
                         num_cpus_per_shard=0.25)
        c.ingest_pairs(src, dst)
        c.finalize()
        got = A.greedy_coloring(c).to_pandas().sort_values("vid")
        c.shutdown()
        np.testing.assert_array_equal(got["color"].to_numpy(), want)
        # proper coloring: no edge joins equal colors
        col = got["color"].to_numpy()
        assert not any(col[a] == col[b] for a, b in edges if a != b)


def test_coloring_clique_uses_exactly_k_colors():
    # K5 + 3 isolated vertices: clique needs exactly 5 colors, isolated get 0
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    src = np.array([p[0] for p in pairs])
    dst = np.array([p[1] for p in pairs])
    c = GraphContext(8, 3, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    got = A.greedy_coloring(c).to_pandas().sort_values("vid")["color"].to_numpy()
    c.shutdown()
    assert sorted(got[:5].tolist()) == [0, 1, 2, 3, 4]
    assert got[5:].tolist() == [0, 0, 0]


# ----------------------------------------------------------------------
# temporal earliest arrival (time-respecting directed reachability)
# ----------------------------------------------------------------------

def _ta_oracle(n, triples, source):
    """Label-correcting fixpoint: edge (u,v,t) usable iff t >= arr(u),
    delivering arr(v) = min(t + 1)."""
    INF = 1 << 62
    arr = {source: 0}
    changed = True
    while changed:
        changed = False
        for u, v, t in triples:
            if arr.get(u, INF) <= t and t + 1 < arr.get(v, INF):
                arr[v] = t + 1
                changed = True
    return np.array([arr.get(v, -1) for v in range(n)], dtype=np.int64)


def _ta_dataset(triples):
    import pandas as pd
    import ray.data as rd
    df = pd.DataFrame({
        "src": np.array([t[0] for t in triples], dtype=np.int64),
        "dst": np.array([t[1] for t in triples], dtype=np.int64),
        "ts": pd.to_datetime(np.array([t[2] for t in triples], dtype="int64"), unit="us"),
    })
    return rd.from_pandas(df)


def test_temporal_arrival_respects_time_and_partition_invariant():
    rng = np.random.RandomState(13)
    m = 300
    triples = list(zip(rng.randint(0, 40, m).tolist(),
                       rng.randint(0, 40, m).tolist(),
                       rng.randint(100, 10_000, m).tolist()))
    from pagerank_cuda_dynamic_ray.pipelines.analytics import _elect_seeds
    src = np.array([t[0] for t in triples])
    dst = np.array([t[1] for t in triples])
    want = None
    for parts in (1, 3, 5):
        # 0.25 CPU/shard and <= 5 parts: this test also runs a Ray Data
        # routing job while the pool (and the module-scoped 3-shard
        # fixture) is alive — its tasks must still find a CPU slot
        c = GraphContext(40, parts, add_self_loops=True,
                         num_cpus_per_shard=0.25)
        c.ingest_pairs(src, dst)
        c.finalize()
        if want is None:
            seed_vid = int(_elect_seeds(c, 1, 0)[0])
            want = _ta_oracle(40, triples, seed_vid)
        got = A.temporal_earliest_arrival(c, _ta_dataset(triples)).to_pandas()
        c.shutdown()
        np.testing.assert_array_equal(
            got.sort_values("vid")["arrival"].to_numpy(), want)


def test_temporal_arrival_blocks_backward_time_paths():
    # chain 0 -t=100-> 1 -t=50-> 2: arrival at 1 is 101 > 50, so 2 is
    # unreachable through the stale edge; a later edge 1 -t=200-> 3 works
    triples = [(0, 1, 100), (1, 2, 50), (1, 3, 200)]
    c = GraphContext(4, 2, add_self_loops=True)
    c.ingest_pairs(np.array([t[0] for t in triples]),
                   np.array([t[1] for t in triples]))
    c.finalize()
    from pagerank_cuda_dynamic_ray.pipelines.analytics import _elect_seeds
    seed_vid = int(_elect_seeds(c, 1, 0)[0])
    got = A.temporal_earliest_arrival(c, _ta_dataset(triples)).to_pandas()
    c.shutdown()
    want = _ta_oracle(4, triples, seed_vid)
    np.testing.assert_array_equal(got.sort_values("vid")["arrival"].to_numpy(), want)
    if seed_vid == 0:
        assert want.tolist() == [0, 101, -1, 201]


# ----------------------------------------------------------------------
# walk-count centrality (exact-integer truncated Katz)
# ----------------------------------------------------------------------

def test_walk_counts_match_matrix_power_and_partition_invariant():
    rng = np.random.RandomState(17)
    n, m, L = 30, 150, 4
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    # brute force over the deduped edge set + structural self-loops
    A_ = np.zeros((n, n), dtype=np.int64)
    for a, b in set(zip(src.tolist(), dst.tolist())):
        A_[a, b] = 1
    np.fill_diagonal(A_, 1)
    w = np.ones(n, dtype=np.int64)
    want = w.copy()
    for _ in range(L):
        w = A_.T @ w
        want += w
    for parts in (1, 3):
        c = GraphContext(n, parts, add_self_loops=True)
        c.ingest_pairs(src, dst)
        c.finalize()
        got = A.walk_count_centrality(c, length=L).to_pandas().sort_values("vid")
        c.shutdown()
        np.testing.assert_array_equal(got["walks"].to_numpy(), want)


# ----------------------------------------------------------------------
# round-3 structural family: Katz, link prediction, reciprocity,
# neighbor-degree profile, summary, component sizes
# ----------------------------------------------------------------------

def _rand_graph(seed=23, n=30, m=120):
    rng = np.random.RandomState(seed)
    return (rng.randint(0, n, m).astype(np.int64),
            rng.randint(0, n, m).astype(np.int64), n)


def test_katz_matches_damped_matrix_power_and_partition_invariant():
    src, dst, n = _rand_graph()
    L, mul = 4, 4
    A_ = np.zeros((n, n), dtype=np.int64)
    for a, b in set(zip(src.tolist(), dst.tolist())):
        A_[a, b] = 1
    np.fill_diagonal(A_, 1)
    x = np.ones(n, dtype=np.int64)
    acc = np.zeros(n, dtype=np.int64)
    for _ in range(L):
        x = A_.T @ x
        acc = mul * acc + x
    for parts in (1, 3):
        c = GraphContext(n, parts, add_self_loops=True)
        c.ingest_pairs(src, dst)
        c.finalize()
        got = A.katz_centrality(c, length=L, mul=mul).to_pandas().sort_values("vid")
        c.shutdown()
        np.testing.assert_array_equal(got["katz"].to_numpy(), acc)


def _sym_adj(src, dst):
    adj = {}
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    return adj


def test_common_neighbors_and_adamic_adar_bruteforce():
    src, dst, n = _rand_graph(seed=29)
    adj = _sym_adj(src, dst)
    want_cn, want_aa = {}, {}
    for z, nb in adj.items():
        d = len(nb)
        w_aa = 1_000_000_000 // max(int(np.floor(np.log2(d))), 1) if d >= 2 else 0
        nbs = sorted(nb)
        for i in range(len(nbs)):
            for j in range(i + 1, len(nbs)):
                k = (nbs[i], nbs[j])
                want_cn[k] = want_cn.get(k, 0) + 1
                want_aa[k] = want_aa.get(k, 0) + w_aa
    top_cn = sorted(want_cn.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    top_aa = sorted(want_aa.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    c = GraphContext(n, 3, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    got_cn = A.common_neighbors(c, top=20).to_pandas()
    got_aa = A.adamic_adar(c, top=20).to_pandas()
    c.shutdown()
    assert [((a, b), s) for a, b, s in
            zip(got_cn["a"], got_cn["b"], got_cn["common"])] == top_cn
    assert [((a, b), s) for a, b, s in
            zip(got_aa["a"], got_aa["b"], got_aa["aa_e9"])] == top_aa


def test_reciprocity_bruteforce_and_partition_invariant():
    src, dst, n = _rand_graph(seed=37)
    edges = set(zip(src.tolist(), dst.tolist())) | {(v, v) for v in range(n)}
    nonloop = {(a, b) for a, b in edges if a != b}
    mutual = sum(1 for a, b in nonloop if (b, a) in edges)
    for parts in (1, 4):
        c = GraphContext(n, parts, add_self_loops=True)
        c.ingest_pairs(src, dst)
        c.finalize()
        got = A.reciprocity(c).to_pandas().iloc[0]
        c.shutdown()
        assert got["n_edges"] == len(nonloop)
        assert got["n_mutual"] == mutual
        assert got["recip_e6"] == mutual * 1_000_000 // len(nonloop)


def test_avg_neighbor_degree_bruteforce():
    src, dst, n = _rand_graph(seed=41)
    adj = _sym_adj(src, dst)
    prof = {}
    for v, nb in adj.items():
        d = len(nb)
        s = sum(len(adj[u]) for u in nb)
        nv, sm = prof.get(d, (0, 0))
        prof[d] = (nv + 1, sm + s)
    c = GraphContext(n, 3, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    got = A.avg_neighbor_degree(c).to_pandas().sort_values("degree")
    c.shutdown()
    assert {int(r["degree"]): (int(r["n_vertices"]), int(r["sum_nbr_deg"]))
            for _, r in got.iterrows()} == prof


def test_graph_summary_bruteforce():
    src, dst, n = _rand_graph(seed=43)
    edges = set(zip(src.tolist(), dst.tolist())) | {(v, v) for v in range(n)}
    adj = _sym_adj(src, dst)
    outd = {}
    ind = {}
    for a, b in edges:
        outd[a] = outd.get(a, 0) + 1
        ind[b] = ind.get(b, 0) + 1
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    c = GraphContext(n, 3, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    got = A.graph_summary(c).to_pandas().iloc[0]
    c.shutdown()
    assert got["n_vertices"] == n
    assert got["n_edges_directed"] == len(edges)
    assert got["n_self_loops"] == n
    assert got["n_edges_undirected"] == len(und)
    assert got["max_outdeg"] == max(outd.values())
    assert got["max_indeg"] == max(ind.values())
    assert got["n_isolated"] == n - len(adj)


def test_component_sizes_known_structure(ctx):
    # ctx: two bridged triangles (component of 6) + vids 6, 7 isolated
    got = A.component_sizes(ctx).to_pandas().sort_values("size")
    assert [(int(r["size"]), int(r["n_components"]))
            for _, r in got.iterrows()] == [(1, 2), (6, 1)]


def test_run_split_regimes():
    from pagerank_cuda_dynamic_ray.pipelines.analytics import _run_split

    # empty
    s, e, idx = _run_split(np.array([], dtype=object))
    assert (s, e) == (0, 0) and len(idx) == 0
    # single run: all boundary (could continue in either neighbor block)
    s, e, idx = _run_split(np.array(["x"] * 4, dtype=object))
    assert (s, e) == (0, 0) and idx.tolist() == [0, 1, 2, 3]
    # two runs: both are first/last -> all boundary, no interior
    s, e, idx = _run_split(np.array(["x", "x", "y"], dtype=object))
    assert (s, e) == (0, 0) and idx.tolist() == [0, 1, 2]
    # three runs: middle run is the only interior
    a = np.array(["x", "x", "y", "y", "y", "z"], dtype=object)
    s, e, idx = _run_split(a)
    assert a[s:e].tolist() == ["y", "y", "y"]
    assert idx.tolist() == [0, 1, 5]
    # int keys too
    s, e, idx = _run_split(np.array([7, 7, 8, 9, 9]))
    assert (s, e) == (2, 3) and idx.tolist() == [0, 1, 3, 4]
