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


@pytest.mark.parametrize("mode", ["compiled", "p2p", "driver"])
def test_resume_frontier_marks_exact(tmp_path, mode):
    """df resume mid-convergence must not lose in-flight frontier marks.

    Regression test: compiled/p2p modes hold the just-emitted marks
    outside shard state (driver feedback / p2p inbox); a checkpoint taken
    before they are flushed would under-mark the resumed run. The
    resumed ranks must be bit-equal to an uninterrupted run."""
    n = 300
    src, dst = _graph(7, n, 1200)
    ctx = GraphContext(n, 3)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    warm = ctx.pagerank("static").ranks
    ins = np.stack(_graph(8, n, 60))
    dels, ins = ctx.tidy_batch(np.empty((2, 0), dtype=np.int64), ins)
    ctx.apply_batch(dels, ins)
    marks = ctx.compute_frontier_marks(dels, ins)
    full = ctx.pagerank("df", warm=warm, initial_marks=marks, mode=mode)
    assert full.iterations > 8, "fixture must need enough iterations to interrupt"
    o1 = PagerankOptions(
        checkpoint_every=3, checkpoint_dir=str(tmp_path), run_id=f"m-{mode}",
        max_iterations=6,
    )
    ctx.pagerank("df", warm=warm, initial_marks=marks, options=o1, mode=mode)
    o2 = PagerankOptions(checkpoint_dir=str(tmp_path), run_id=f"m-{mode}")
    resumed = ctx.pagerank("df", warm=warm, initial_marks=marks, options=o2,
                           resume=True, mode=mode)
    assert resumed.iterations == full.iterations
    assert np.array_equal(ctx.assemble(resumed.ranks), ctx.assemble(full.ranks))
    ctx.shutdown()


def test_graph_snapshot_roundtrip(tmp_path):
    """save_graph/load_graph restores identical graph state: same edge
    counts, bit-identical static ranks."""
    n = 250
    src, dst = _graph(9, n, 1100)
    ctx = GraphContext(n, 3)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    want = ctx.pagerank("static")
    ctx.save_graph(str(tmp_path / "snap"))
    edges = ctx.num_edges()
    ctx.shutdown()
    ctx2 = GraphContext.load_graph(str(tmp_path / "snap"))
    assert ctx2.num_edges() == edges
    got = ctx2.pagerank("static")
    assert got.iterations == want.iterations
    assert np.array_equal(ctx2.assemble(got.ranks), ctx2.assemble(want.ranks))
    ctx2.shutdown()


def test_weighted_graph_snapshot_roundtrip(tmp_path):
    """Weighted graphs snapshot their multiplicity weights: restored
    static ranks are bit-identical and the weighted flag survives."""
    n = 120
    src, dst = _graph(11, n, 700)
    src = np.concatenate([src, src[:50]])  # duplicates -> weights > 1
    dst = np.concatenate([dst, dst[:50]])
    ctx = GraphContext(n, 3, weighted=True)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    want = ctx.pagerank("static")
    ctx.save_graph(str(tmp_path / "wsnap"))
    ctx.shutdown()
    ctx2 = GraphContext.load_graph(str(tmp_path / "wsnap"))
    assert ctx2.weighted
    got = ctx2.pagerank("static")
    assert got.iterations == want.iterations
    assert np.array_equal(ctx2.assemble(got.ranks), ctx2.assemble(want.ranks))
    ctx2.shutdown()


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


def test_actor_death_recovery_is_exact(tmp_path):
    """A shard actor dying mid-convergence must not lose the run.

    Protocol: checkpointed partial run -> ray.kill one shard actor ->
    the plain path raises RayActorError -> pagerank_recoverable detects
    the fault, rebuilds the pool from the graph snapshot, resumes from
    the newest complete checkpoint, and lands bit-equal to an
    uninterrupted run."""
    import ray
    from ray.exceptions import RayActorError

    from pagerank_cuda_dynamic_ray.pipelines.graph import pagerank_recoverable

    n = 300
    src, dst = _graph(11, n, 1400)
    ctx = GraphContext(n, 3)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    snap = str(tmp_path / "snap")
    ctx.save_graph(snap)
    full = ctx.pagerank("static")
    assert full.iterations > 10, "fixture must outlast the interruption point"
    o_part = PagerankOptions(
        checkpoint_every=4, checkpoint_dir=str(tmp_path / "ckpt"),
        run_id="ft", max_iterations=8,
    )
    ctx.pagerank("static", options=o_part)
    ray.kill(ctx.shards[1])
    with pytest.raises(RayActorError):
        ctx.pagerank(
            "static",
            options=PagerankOptions(
                checkpoint_dir=str(tmp_path / "ckpt"), run_id="ft"
            ),
            resume=True, mode="driver",
        )
    o_rest = PagerankOptions(checkpoint_dir=str(tmp_path / "ckpt"), run_id="ft")
    ctx2, res = pagerank_recoverable(snap, "static", options=o_rest, ctx=ctx)
    assert ctx2 is not ctx, "dead pool must have been rebuilt from the snapshot"
    assert res.iterations == full.iterations
    assert np.array_equal(ctx2.assemble(res.ranks), ctx.assemble(full.ranks))
    ctx2.shutdown()


def test_actor_death_recovery_p2p_mode(tmp_path):
    """p2p mode: a dead shard leaves its PEERS alive-but-hung awaiting
    its messages. The fail-fast collective get must surface the death
    (a plain ray.get(list) would block forever behind the first hung
    peer) so pagerank_recoverable can rebuild and resume bit-exactly."""
    import ray
    from ray.exceptions import RayActorError

    from pagerank_cuda_dynamic_ray.pipelines.graph import pagerank_recoverable

    n = 300
    src, dst = _graph(13, n, 1400)
    ctx = GraphContext(n, 3)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    snap = str(tmp_path / "snap")
    ctx.save_graph(snap)
    full = ctx.pagerank("static", mode="p2p")
    o_part = PagerankOptions(
        checkpoint_every=4, checkpoint_dir=str(tmp_path / "ckpt"),
        run_id="ftp", max_iterations=8,
    )
    ctx.pagerank("static", options=o_part, mode="p2p")
    ray.kill(ctx.shards[0])
    with pytest.raises(RayActorError):
        ctx.pagerank(
            "static",
            options=PagerankOptions(
                checkpoint_dir=str(tmp_path / "ckpt"), run_id="ftp"
            ),
            resume=True, mode="p2p",
        )
    o_rest = PagerankOptions(checkpoint_dir=str(tmp_path / "ckpt"), run_id="ftp")
    ctx2, res = pagerank_recoverable(
        snap, "static", options=o_rest, ctx=ctx, mode="p2p"
    )
    assert ctx2 is not ctx
    assert res.iterations == full.iterations
    assert np.array_equal(ctx2.assemble(res.ranks), ctx2.assemble(full.ranks))
    ctx2.shutdown()
