"""Checkpoint/resume lineage + partition-count invariance."""

import numpy as np
import pytest

from pagerank_cuda_dynamic_ray.options import PagerankOptions
from pagerank_cuda_dynamic_ray.pipelines.graph import GraphContext


def _graph(seed, n, m):
    rng = np.random.RandomState(seed)
    return rng.randint(0, n, m).astype(np.int64), rng.randint(0, n, m).astype(np.int64)


def test_resume_is_exact(tmp_path):
    """Kill after iteration k (simulated via max_iterations), resume from the
    per-partition parquet lineage, bit-compare against uninterrupted."""
    n = 300
    src, dst = _graph(2, n, 1500)
    ctx = GraphContext(n, 3)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    full = ctx.pagerank("static")
    o1 = PagerankOptions(checkpoint_every=7, checkpoint_dir=str(tmp_path), run_id="r", max_iterations=21)
    interrupted = ctx.pagerank("static", options=o1)
    assert interrupted.iterations == 21
    o2 = PagerankOptions(checkpoint_dir=str(tmp_path), run_id="r")
    resumed = ctx.pagerank("static", options=o2, resume=True)
    assert resumed.iterations == full.iterations
    assert np.array_equal(ctx.assemble(resumed.ranks), ctx.assemble(full.ranks))
    # lineage layout: {dir}/{run}/batch=0/iter=*/part-*.parquet + _COMPLETE
    assert (tmp_path / "r" / "batch=0" / "iter=21" / "_COMPLETE.json").exists()
    assert (tmp_path / "r" / "batch=0" / "iter=21" / "part-0.parquet").exists()
    assert (tmp_path / "r" / "metrics.jsonl").exists()
    ctx.shutdown()


def test_partition_count_invariance():
    """Same graph, different shard counts -> identical ranks (1e-12)."""
    n = 200
    src, dst = _graph(4, n, 900)
    results = []
    for P in (1, 2, 4):
        ctx = GraphContext(n, P)
        ctx.ingest_pairs(src, dst)
        ctx.finalize()
        res = ctx.pagerank("static")
        results.append(ctx.assemble(res.ranks))
        ctx.shutdown()
    np.testing.assert_allclose(results[0], results[1], atol=1e-12)
    np.testing.assert_allclose(results[0], results[2], atol=1e-12)
