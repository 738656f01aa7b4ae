"""Warm label-propagation restart (label_propagation_incremental):
phase-exact vs a brute-force two-phase Python oracle, guard behavior,
and partition invariance. LP is not confluent, so the contract is the
SCHEDULE (cold rounds on base, warm rounds on updated graph), not
equality with a cold full-graph run."""

import numpy as np
import pytest

from pagerank_cuda_dynamic_ray.pipelines import analytics as A
from pagerank_cuda_dynamic_ray.pipelines.graph import GraphContext

EMPTY = np.empty((2, 0), dtype=np.int64)


def _lp_rounds(n: int, pairs: set[tuple[int, int]], init: np.ndarray,
               rounds: int) -> np.ndarray:
    """Sequential sync LP oracle: undirected view (self-loops dropped),
    every vertex adopts its neighbors' most frequent label (ties to the
    lowest); isolated vertices keep theirs; stop early at fixpoint."""
    adj = [set() for _ in range(n)]
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    lab = init.copy()
    for _ in range(rounds):
        nxt = lab.copy()
        for v in range(n):
            if adj[v]:
                votes: dict[int, int] = {}
                for u in adj[v]:
                    votes[lab[u]] = votes.get(lab[u], 0) + 1
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                nxt[v] = best[0]
        if (nxt == lab).all():
            break
        lab = nxt
    return lab


@pytest.mark.parametrize("parts", [2, 4])
def test_lp_incremental_matches_two_phase_oracle(parts):
    rng = np.random.default_rng(11)
    n = 24
    base = np.stack([rng.integers(0, n, 60), rng.integers(0, n, 60)])
    ins = np.stack([rng.integers(0, n, 12), rng.integers(0, n, 12)])
    ctx = GraphContext(n, parts, add_self_loops=True)
    ctx.ingest_pairs(base[0], base[1])
    ctx.finalize()
    try:
        A.label_propagation(ctx, max_iterations=10)
        dels, ins_t = ctx.tidy_batch(EMPTY, ins)
        ctx.apply_batch(dels, ins_t)
        got = (A.label_propagation_incremental(ctx, max_iterations=10)
               .to_pandas().sort_values("vid")["label"].to_numpy())
    finally:
        ctx.shutdown()

    base_pairs = set(zip(base[0].tolist(), base[1].tolist()))
    la = _lp_rounds(n, base_pairs, np.arange(n), 10)
    full_pairs = base_pairs | set(zip(ins[0].tolist(), ins[1].tolist()))
    want = _lp_rounds(n, full_pairs, la, 10)
    np.testing.assert_array_equal(got, want)


def test_lp_incremental_p2p_matches_driver():
    rng = np.random.default_rng(17)
    n = 20
    base = np.stack([rng.integers(0, n, 45), rng.integers(0, n, 45)])
    ins = np.stack([rng.integers(0, n, 10), rng.integers(0, n, 10)])
    labs = {}
    for mode in ("driver", "p2p"):
        ctx = GraphContext(n, 3, add_self_loops=True)
        ctx.ingest_pairs(base[0], base[1])
        ctx.finalize()
        try:
            A.label_propagation(ctx, max_iterations=10, mode=mode)
            dels, ins_t = ctx.tidy_batch(EMPTY, ins)
            ctx.apply_batch(dels, ins_t)
            labs[mode] = (
                A.label_propagation_incremental(ctx, max_iterations=10, mode=mode)
                .to_pandas().sort_values("vid")["label"].to_numpy())
        finally:
            ctx.shutdown()
    np.testing.assert_array_equal(labs["driver"], labs["p2p"])


def test_lp_incremental_requires_prior_lp():
    ctx = GraphContext(6, 2, add_self_loops=True)
    ctx.ingest_pairs(np.array([0, 1, 2]), np.array([1, 2, 3]))
    ctx.finalize()
    try:
        with pytest.raises(Exception, match="label_propagation"):
            A.label_propagation_incremental(ctx)
    finally:
        ctx.shutdown()


def test_lp_incremental_empty_batch_is_idempotent():
    ctx = GraphContext(10, 3, add_self_loops=True)
    rng = np.random.default_rng(3)
    ctx.ingest_pairs(rng.integers(0, 10, 25), rng.integers(0, 10, 25))
    ctx.finalize()
    try:
        cold = (A.label_propagation(ctx, max_iterations=10)
                .to_pandas().sort_values("vid")["label"].to_numpy())
        ctx.apply_batch(EMPTY, EMPTY)
        warm = (A.label_propagation_incremental(ctx, max_iterations=10)
                .to_pandas().sort_values("vid")["label"].to_numpy())
    finally:
        ctx.shutdown()
    np.testing.assert_array_equal(cold, warm)
