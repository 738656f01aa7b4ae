"""Hub in-edge splitting: unchanged results, balanced per-shard work.

The explicit skew-splitting criterion (SURVEY.md §4; reference degree-64
two-kernel split, pagerankCuda.hxx:470-481): vertices with in-degree over
the threshold get their in-edge sums computed as per-source-shard
partials combined at the owner.
"""

import numpy as np
import pytest
import ray

from pagerank_cuda_dynamic_ray.options import PagerankOptions
from pagerank_cuda_dynamic_ray.pipelines.graph import GraphContext


def _skewed_graph(n=1200, m=4000, seed=11):
    """Random graph plus a hub: vertex 0 receives an edge from everyone."""
    rng = np.random.RandomState(seed)
    src = np.concatenate([rng.randint(0, n, m), np.arange(n, dtype=np.int64)])
    dst = np.concatenate([rng.randint(0, n, m), np.zeros(n, dtype=np.int64)])
    return src.astype(np.int64), dst.astype(np.int64)


def _build(src, dst, n, threshold):
    ctx = GraphContext(n, 4, hub_split_threshold=threshold)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    return ctx


def test_hub_split_ranks_unchanged():
    n = 1200
    src, dst = _skewed_graph(n)
    plain = _build(src, dst, n, None)
    split = _build(src, dst, n, 100)
    # the hub must actually be split
    assert ray.get(split.shards[0].local_hubs.remote(100)).size >= 1
    sweep_plain = ray.get([s.sweep_edge_count.remote() for s in plain.shards])
    sweep_split = ray.get([s.sweep_edge_count.remote() for s in split.shards])
    # hub in-edges left the owner's sweep: its per-iteration work drops
    # to the same order as the other shards
    assert max(sweep_split) < max(sweep_plain) - n // 2
    assert max(sweep_split) <= 2 * (sum(sweep_split) / len(sweep_split) + 1)
    r_plain = plain.pagerank("static")
    r_split = split.pagerank("static")
    assert r_plain.iterations == r_split.iterations
    np.testing.assert_allclose(
        plain.assemble(r_plain.ranks), split.assemble(r_split.ranks), atol=1e-12
    )
    plain.shutdown()
    split.shutdown()


@pytest.mark.parametrize("mode", ["compiled", "p2p", "driver"])
def test_hub_split_modes_bit_equal(mode):
    """All three loop modes agree bit-exactly with hub splitting on."""
    n = 800
    src, dst = _skewed_graph(n, m=2500, seed=13)
    ctx = _build(src, dst, n, 64)
    base = ctx.pagerank("static", mode="compiled")
    other = ctx.pagerank("static", mode=mode)
    assert np.array_equal(ctx.assemble(base.ranks), ctx.assemble(other.ranks))
    ctx.shutdown()


def test_hub_split_dynamic_variants():
    """df/dfp (affected path computes exact full sums for hub rows) stay
    correct under splitting: same fixpoint as an unsplit static run."""
    n = 1000
    src, dst = _skewed_graph(n, m=3000, seed=17)
    ctx = _build(src, dst, n, 100)
    warm = ctx.pagerank("static").ranks
    ins = np.stack([
        np.random.RandomState(5).randint(0, n, 40),
        np.random.RandomState(6).randint(0, n, 40),
    ]).astype(np.int64)
    dels, ins = ctx.tidy_batch(np.empty((2, 0), dtype=np.int64), ins)
    ctx.apply_batch(dels, ins)
    marks = ctx.compute_frontier_marks(dels, ins)
    truth = ctx.pagerank("static")
    for variant in ("df", "dfp"):
        res = ctx.pagerank(variant, warm=warm, initial_marks=marks)
        np.testing.assert_allclose(
            ctx.assemble(res.ranks), ctx.assemble(truth.ranks), atol=1e-6
        )
    ctx.shutdown()
