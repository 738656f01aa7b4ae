"""Dynamic PageRank variants: conformance vs fresh static oracle per batch.

Mirrors the reference's protocol (/root/reference/main.cu:79-147): every
dynamic variant, warm-started from the previous batch's own ranks, must
land on the same fixpoint as a fresh static run on the updated graph
(allclose 1e-6 — FIXTURES.md §3)."""

import numpy as np
import pytest

from pagerank_cuda_dynamic_ray.options import PagerankOptions
from pagerank_cuda_dynamic_ray.pipelines.graph import GraphContext

from .oracle import pagerank_oracle

N = 80
EMPTY = np.empty((2, 0), dtype=np.int64)


def _random_graph(seed, n=N, m=260):
    rng = np.random.RandomState(seed)
    return rng.randint(0, n, m).astype(np.int64), rng.randint(0, n, m).astype(np.int64)


@pytest.fixture()
def ctx():
    src, dst = _random_graph(3)
    c = GraphContext(N, 3)
    c.ingest_pairs(src, dst)
    c.finalize()
    c._test_edges = (src, dst)
    yield c
    c.shutdown()


@pytest.mark.parametrize("variant", ["nd", "dt", "df", "dfp"])
def test_variant_converges_to_static_fixpoint_insertions(ctx, variant):
    src, dst = ctx._test_edges
    base = ctx.pagerank("static")
    rng = np.random.RandomState(7)
    ins = np.stack([rng.randint(0, N, 20), rng.randint(0, N, 20)]).astype(np.int64)
    dels, ins_t = ctx.tidy_batch(EMPTY, ins)
    ctx.apply_batch(dels, ins_t)
    marks = ctx.compute_frontier_marks(EMPTY, ins_t)
    res = ctx.pagerank(variant, warm=list(base.ranks), initial_marks=marks)
    got = ctx.assemble(res.ranks)
    # oracle: static on (edges + self-loops) ∪ insertions
    s2 = np.concatenate([src, ins_t[0]])
    d2 = np.concatenate([dst, ins_t[1]])
    want, _ = pagerank_oracle(s2, d2, N)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("variant", ["nd", "dt", "df", "dfp"])
def test_variant_with_deletions(ctx, variant):
    src, dst = ctx._test_edges
    base = ctx.pagerank("static")
    # delete a slice of existing (non-self-loop) edges
    keep = src != dst
    cand = np.stack([src[keep][:15], dst[keep][:15]])
    dels, _ = ctx.tidy_batch(cand, EMPTY)
    assert dels.shape[1] > 0
    marks_del = ctx.compute_frontier_marks(dels, EMPTY)  # expand in x BEFORE apply
    ctx.apply_batch(dels, EMPTY)
    marks = marks_del
    res = ctx.pagerank(variant, warm=list(base.ranks), initial_marks=marks)
    got = ctx.assemble(res.ranks)
    # oracle graph: dedup(all edges + self-loops) minus deleted pairs
    from .oracle import dedup_edges

    s0, d0 = dedup_edges(src, dst, N, add_self_loops=True)
    del_keys = set((dels[0] * N + dels[1]).tolist())
    mask = np.array([k not in del_keys for k in (s0 * N + d0)])
    want, _ = pagerank_oracle(s0[mask], d0[mask], N, add_self_loops=False)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("variant", ["nd", "dt", "df", "dfp"])
def test_weighted_variant_converges_to_weighted_static_fixpoint(variant):
    # weights × warm restart: the one protocol combination the static
    # weighted build and the unweighted dynamic path each cover half of
    src, dst = _random_graph(13)
    c = GraphContext(N, 3, weighted=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    try:
        base = c.pagerank("static")
        rng = np.random.RandomState(17)
        ins = np.stack([rng.randint(0, N, 20),
                        rng.randint(0, N, 20)]).astype(np.int64)
        # deliberate duplicate instances: multiplicity must accumulate
        ins = np.concatenate([ins, ins[:, :6]], axis=1)
        dels, ins_t = c.tidy_batch(EMPTY, ins)
        assert ins_t.shape[1] == ins.shape[1]  # weighted tidy keeps instances
        c.apply_batch(dels, ins_t)
        marks = c.compute_frontier_marks(EMPTY, ins_t)
        res = c.pagerank(variant, warm=list(base.ranks), initial_marks=marks)
        got = c.assemble(res.ranks)
        # oracle: weighted static over ALL instances (base + batch)
        want, _ = pagerank_oracle(np.concatenate([src, ins[0]]),
                                  np.concatenate([dst, ins[1]]),
                                  N, weighted=True)
        np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        c.shutdown()


def test_weighted_deletion_decrements_multiplicity():
    # (0,1) has multiplicity 2: deleting ONE instance must leave weight
    # 1, not remove the edge; deleting both removes it (clamped at 0)
    src = np.array([0, 0, 1, 1, 1, 2], dtype=np.int64)
    dst = np.array([1, 1, 2, 2, 2, 0], dtype=np.int64)
    n = 3
    c = GraphContext(n, 2, weighted=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    try:
        base = c.pagerank("static")
        one = np.array([[0], [1]], dtype=np.int64)
        dels, _ = c.tidy_batch(one, EMPTY)
        marks = c.compute_frontier_marks(dels, EMPTY)
        c.apply_batch(dels, EMPTY)
        res = c.pagerank("df", warm=list(base.ranks), initial_marks=marks)
        got = c.assemble(res.ranks)
        want, _ = pagerank_oracle(src[1:], dst[1:], n, weighted=True)
        np.testing.assert_allclose(got, want, atol=1e-6)
        # delete the remaining instance twice over: clamps, edge gone
        two = np.array([[0, 0], [1, 1]], dtype=np.int64)
        dels2, _ = c.tidy_batch(two, EMPTY)
        marks2 = c.compute_frontier_marks(dels2, EMPTY)
        c.apply_batch(dels2, EMPTY)
        res2 = c.pagerank("df", warm=list(res.ranks), initial_marks=marks2)
        got2 = c.assemble(res2.ranks)
        want2, _ = pagerank_oracle(src[2:], dst[2:], n, weighted=True)
        np.testing.assert_allclose(got2, want2, atol=1e-6)
    finally:
        c.shutdown()


def test_weighted_set_update_kernel():
    from pagerank_cuda_dynamic_ray.state import kernels as K

    keys = np.array([3, 7, 9], dtype=np.int64)
    w = np.array([2.0, 1.0, 5.0])
    ins = np.array([7, 7, 11], dtype=np.int64)   # +2 on 7, new edge 11
    dels = np.array([3, 3, 3, 9], dtype=np.int64)  # over-delete 3 (clamp)
    nk, nw = K.weighted_set_update(keys, w, dels, ins)
    assert nk.tolist() == [7, 9, 11]
    assert nw.tolist() == [3.0, 4.0, 1.0]
    nk2, nw2 = K.weighted_set_update(
        np.empty(0, np.int64), np.empty(0), np.empty(0, np.int64),
        np.array([5, 5], np.int64))
    assert nk2.tolist() == [5] and nw2.tolist() == [2.0]
    # minus-then-union order: over-delete + re-insert of the same edge
    # leaves it present with the inserted weight (matching the
    # unweighted set_minus_union / batch.hxx semantics), NOT dropped
    nk3, nw3 = K.weighted_set_update(
        np.array([4], np.int64), np.array([1.0]),
        np.array([4, 4], np.int64), np.array([4], np.int64))
    assert nk3.tolist() == [4] and nw3.tolist() == [1.0]


def test_tidy_batch_semantics(ctx):
    src, dst = ctx._test_edges
    from .oracle import dedup_edges

    s0, d0 = dedup_edges(src, dst, N, add_self_loops=True)
    existing = set((s0 * N + d0).tolist())
    rng = np.random.RandomState(11)
    batch = np.stack([rng.randint(0, N, 40), rng.randint(0, N, 40)]).astype(np.int64)
    # duplicate every edge once: tidy must dedup exactly (batch.hxx:183-191)
    batch = np.concatenate([batch, batch], axis=1)
    dels, ins = ctx.tidy_batch(batch, batch)
    dk = dels[0] * N + dels[1]
    ik = ins[0] * N + ins[1]
    assert len(set(dk.tolist())) == len(dk)          # deduped
    assert (np.diff(np.lexsort((dels[1], dels[0]))) > 0).all() or dels.shape[1] <= 1
    assert all(k in existing for k in dk.tolist())    # deletions must exist
    assert all(k not in existing for k in ik.tolist())  # insertions must not
    want = {k for k in set((batch[0] * N + batch[1]).tolist())}
    assert set(dk.tolist()) == {k for k in want if k in existing}
    assert set(ik.tolist()) == {k for k in want if k not in existing}


def test_dfp_prunes_and_df_monotone(ctx):
    """DF-P must converge in <= iterations of static; affected counts shrink."""
    base = ctx.pagerank("static")
    rng = np.random.RandomState(13)
    ins = np.stack([rng.randint(0, N, 5), rng.randint(0, N, 5)]).astype(np.int64)
    _, ins_t = ctx.tidy_batch(EMPTY, ins)
    ctx.apply_batch(EMPTY, ins_t)
    marks = ctx.compute_frontier_marks(EMPTY, ins_t)
    static = ctx.pagerank("static")
    dfp = ctx.pagerank("dfp", warm=list(base.ranks), initial_marks=marks)
    assert dfp.iterations <= static.iterations
    aff = [sum(p["affected"] for p in m["parts"]) for m in dfp.metrics]
    assert aff[-1] <= aff[0] or aff[0] == 0


def test_norm_delta_family(ctx):
    """Distributed l1/l2/linf norm deltas match numpy on the assembled
    vector (reference _vector.hxx:776-1284 norm family)."""
    res = ctx.pagerank("static")
    full = ctx.assemble(res.ranks)
    zeros = [np.zeros_like(r) for r in res.ranks]
    assert np.isclose(ctx.norm_delta(zeros, 1), np.abs(full).sum())
    assert np.isclose(ctx.norm_delta(zeros, 2), np.sqrt((full ** 2).sum()))
    assert np.isclose(ctx.norm_delta(zeros, float("inf")), np.abs(full).max())


def test_random_batch_generator(ctx):
    """Seeded random batch (reference batch.hxx:100-139 semantics):
    deletions sample existing edges, insertions uniform pairs; after
    tidy+apply every dynamic variant reaches the fresh static fixpoint."""
    warm = ctx.pagerank("static").ranks
    dels, ins = ctx.random_batch(num_insertions=25, num_deletions=15, seed=7)
    assert ins.shape == (2, 25)
    assert dels.shape[1] == 15
    assert (dels[0] != dels[1]).all(), "structural self-loops never sampled"
    # counter-mode RNG: the batch is a pure function of (seed, index) —
    # identical under a different shard count
    src, dst = ctx._test_edges
    other = GraphContext(N, 5)
    other.ingest_pairs(src, dst)
    other.finalize()
    try:
        d5, i5 = other.random_batch(num_insertions=25, num_deletions=15, seed=7)
        np.testing.assert_array_equal(d5, dels)
        np.testing.assert_array_equal(i5, ins)
    finally:
        other.shutdown()
    d2, i2 = ctx.tidy_batch(dels, ins)
    assert d2.shape[1] > 0, "sampled deletions must hit existing edges"
    marks_del = ctx.compute_frontier_marks(d2, EMPTY)
    ctx.apply_batch(d2, i2)
    marks_ins = ctx.compute_frontier_marks(EMPTY, i2)
    marks = [np.unique(np.concatenate([a, b])) for a, b in zip(marks_del, marks_ins)]
    truth = ctx.pagerank("static")
    for variant in ("nd", "df", "dfp", "dt"):
        res = ctx.pagerank(variant, warm=warm, initial_marks=marks)
        assert ctx.norm_delta(truth.ranks, 1) < 1e-4  # shards hold `res` ranks
        np.testing.assert_allclose(
            ctx.assemble(res.ranks), ctx.assemble(truth.ranks), atol=1e-6
        )


def test_random_batch_retry_on_zero_degree():
    """Star graph: only vertex 0 has data out-edges, so most deletion
    draws hit zero-data-degree vertices and must retry (up to 5 fresh
    vertex draws, batch.hxx retry semantics) or drop the sample."""
    n = 40
    src = np.zeros(12, dtype=np.int64)
    dst = np.arange(1, 13, dtype=np.int64)
    c = GraphContext(n, 2)
    c.ingest_pairs(src, dst)
    c.finalize()
    try:
        dels, _ = c.random_batch(num_deletions=30, num_insertions=0, seed=5)
        assert 0 < dels.shape[1] <= 30          # some survive, some may drop
        assert (dels[0] == 0).all()             # only vertex 0 has data edges
        assert np.isin(dels[1], dst).all()      # picks are existing out-edges
        few, _ = c.random_batch(num_deletions=30, num_insertions=0, seed=5,
                                retries=1)
        assert few.shape[1] < dels.shape[1]     # retries rescue samples
    finally:
        c.shutdown()


def test_random_batch_seed_zero_streams_independent():
    """seed=0 must still give independent draw streams. Regression: the
    stream separator was MULTIPLIED by the seed, so seed=0 collapsed
    insertion endpoints, deletion candidates, and edge picks onto one
    counter domain (systematically correlated batches)."""
    n = 40
    src = np.zeros(12, dtype=np.int64)
    dst = np.arange(1, 13, dtype=np.int64)
    c = GraphContext(n, 2)
    c.ingest_pairs(src, dst)
    c.finalize()
    try:
        from pagerank_cuda_dynamic_ray.functions.hashing import splitmix64
        from pagerank_cuda_dynamic_ray.pipelines.graph import (
            RB_STREAM_DEL, RB_STREAM_INS)

        dels, ins = c.random_batch(num_deletions=8, num_insertions=8, seed=0)
        assert ins.shape == (2, 8)
        # the two streams read from different splitmix64 counters
        i0 = splitmix64(RB_STREAM_INS + np.uint64(0))
        d0 = splitmix64(RB_STREAM_DEL + np.uint64(0))
        assert i0 != d0
        # retries<=1 degrades to single-draw sampling instead of crashing
        d1, _ = c.random_batch(num_deletions=8, num_insertions=0, seed=0,
                               retries=0)
        assert d1.shape[0] == 2
    finally:
        c.shutdown()


def test_pagerank_rejects_unknown_mode(ctx):
    """A typo'd mode must fail loudly, not silently fall through to the
    slow debugging driver loop."""
    with pytest.raises(AssertionError):
        ctx.pagerank("static", mode="complied")
