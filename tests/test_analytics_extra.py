"""BFS distances and modularity vs brute-force oracles."""

import numpy as np
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
