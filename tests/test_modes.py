"""Equivalence of the three iteration loops (driver / p2p / compiled)
and of chunked vs monolithic fixture generation."""

import numpy as np
import pytest

from pagerank_cuda_dynamic_ray import api
from pagerank_cuda_dynamic_ray.options import PagerankOptions
from pagerank_cuda_dynamic_ray.sources import transcripts as T


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    p = tmp_path_factory.mktemp("modes") / "transcripts.parquet"
    T.write_transcripts(str(p), n_conv=300, seed=7)
    ctx, batches = api.build_graph(
        str(p), num_parts=3, temporal=True, num_batches=1, batch_fraction=1e-2
    )
    yield ctx, batches
    ctx.shutdown()


def test_three_modes_bit_equal_static(built):
    ctx, _ = built
    ranks = {}
    iters = {}
    for mode in ("driver", "p2p", "compiled"):
        r = ctx.pagerank("static", mode=mode)
        ranks[mode] = ctx.assemble(r.ranks)
        iters[mode] = r.iterations
    assert iters["driver"] == iters["p2p"] == iters["compiled"]
    np.testing.assert_array_equal(ranks["driver"], ranks["p2p"])
    np.testing.assert_array_equal(ranks["driver"], ranks["compiled"])


def test_three_modes_bit_equal_frontier(built):
    ctx, batches = built
    base = ctx.pagerank("static")
    warm = list(base.ranks)
    empty = np.empty((2, 0), dtype=np.int64)
    dels, ins = ctx.tidy_batch(empty, batches[0])
    ctx.apply_batch(dels, ins)
    marks = ctx.compute_frontier_marks(empty, ins)
    for variant in ("df", "dfp", "dt"):
        got = {}
        for mode in ("driver", "p2p", "compiled"):
            r = ctx.pagerank(variant, warm=warm, initial_marks=marks, mode=mode)
            got[mode] = (r.iterations, ctx.assemble(r.ranks))
        assert got["driver"][0] == got["p2p"][0] == got["compiled"][0], variant
        np.testing.assert_array_equal(got["driver"][1], got["p2p"][1])
        np.testing.assert_array_equal(got["driver"][1], got["compiled"][1])


def test_chunked_generation_bit_equal(tmp_path, monkeypatch):
    whole = T.generate_table(1000, seed=11)
    monkeypatch.setattr(T, "CHUNK_CONVS", 137)
    path = str(tmp_path / "chunked.parquet")
    T.write_transcripts(path, 1000, seed=11)
    import pyarrow.parquet as pq
    import pyarrow.dataset as pds

    got = pds.dataset(path).to_table()
    assert got.sort_by([("ts", "ascending")]).equals(
        whole.sort_by([("ts", "ascending")])
    )


def test_broadcast_dag_layout_bit_equal(built):
    """The broadcast channel layout (contribs_packed_dag -> P channels)
    must be bit-equal to the sliced layout and the driver loop, for both
    the full-sweep and the frontier paths."""
    from pagerank_cuda_dynamic_ray.pipelines.graph import GraphContext

    ctx, batches = built
    old = GraphContext.DAG_SLICED_MAX_PARTS
    try:
        opts = PagerankOptions(max_iterations=25, tolerance=0.0)
        ctx._teardown_cdag()
        sliced = ctx.assemble(ctx.pagerank("static", options=opts, mode="compiled").ranks)

        GraphContext.DAG_SLICED_MAX_PARTS = 1  # force broadcast at P=3
        ctx._teardown_cdag()
        bcast = ctx.assemble(ctx.pagerank("static", options=opts, mode="compiled").ranks)
        drv = ctx.assemble(ctx.pagerank("static", options=opts, mode="driver").ranks)
        np.testing.assert_array_equal(bcast, sliced)
        np.testing.assert_array_equal(bcast, drv)

        # frontier path (df): marks travel through the broadcast DAG too
        base = ctx.pagerank("static")
        warm = list(base.ranks)
        empty = np.empty((2, 0), dtype=np.int64)
        dels, ins = ctx.tidy_batch(empty, batches[0])
        ctx.apply_batch(dels, ins)
        marks = ctx.compute_frontier_marks(empty, ins)
        r_b = ctx.pagerank("df", warm=warm, initial_marks=marks, mode="compiled")
        r_d = ctx.pagerank("df", warm=warm, initial_marks=marks, mode="driver")
        assert r_b.iterations == r_d.iterations
        np.testing.assert_array_equal(ctx.assemble(r_b.ranks), ctx.assemble(r_d.ranks))
    finally:
        GraphContext.DAG_SLICED_MAX_PARTS = old
        ctx._teardown_cdag()
