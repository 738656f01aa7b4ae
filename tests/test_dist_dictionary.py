"""Distributed-dictionary mode (Dataset + hash-join encode) must be
bit-equivalent to the broadcast-numpy path on every surface: the
(id, vid) mapping, the encoded edge set, PageRank ranks, and the
conv_id attachment joins."""

import numpy as np
import pytest

from pagerank_cuda_dynamic_ray import api
from pagerank_cuda_dynamic_ray.sources import edges as E
from pagerank_cuda_dynamic_ray.sources import transcripts as T


@pytest.fixture(scope="module")
def small_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("fixtures") / "small.parquet"
    T.write_transcripts(str(p), n_conv=300, seed=11)
    return str(p)


def test_dictionary_ds_matches_broadcast(small_path):
    ts = E.read_transcripts(
        small_path, columns=["conv_id", "turn_idx", "text", "tool", "ts"]
    )
    raw = E.extract_edges(ts).materialize()
    ts_ids = E.read_transcripts(small_path, columns=["conv_id"])
    d_np = E.vertex_dictionary(ts_ids, raw)
    d_pdf = (
        E.vertex_dictionary_ds(ts_ids, raw).to_pandas().sort_values("vid").reset_index(drop=True)
    )
    assert (d_pdf["vid"].to_numpy() == np.arange(len(d_np))).all()
    assert (d_pdf["id"].to_numpy().astype(d_np.dtype) == d_np).all()


def test_encode_ds_matches_broadcast(small_path):
    import ray

    ts = E.read_transcripts(
        small_path, columns=["conv_id", "turn_idx", "text", "tool", "ts"]
    )
    raw = E.extract_edges(ts).materialize()
    ts_ids = E.read_transcripts(small_path, columns=["conv_id"])
    d_np = E.vertex_dictionary(ts_ids, raw)
    dict_ds = E.vertex_dictionary_ds(ts_ids, raw).materialize()
    key = ["ts", "src", "dst", "turn_idx"]
    a = (
        E.encode_edges(raw, ray.put(d_np)).to_pandas()
        .sort_values(key).reset_index(drop=True)
    )
    b = (
        E.encode_edges_ds(raw, dict_ds, num_partitions=4).to_pandas()
        .sort_values(key).reset_index(drop=True)
    )
    assert len(a) == len(b)
    for c in ("src", "dst", "turn_idx"):
        assert (a[c].to_numpy() == b[c].to_numpy()).all()
    assert (a["ts"].to_numpy() == b["ts"].to_numpy()).all()


def _run_mode(path: str, mode: str):
    """Build in the given dictionary mode, collect all comparable
    surfaces, shut the pool down (two live pools would reserve every
    CPU of the 4-CPU test session and starve the join aggregators)."""
    from pagerank_cuda_dynamic_ray.pipelines import analytics

    ctx, _ = api.build_graph(path, num_parts=4, dictionary_mode=mode)
    try:
        res = ctx.pagerank("static")
        ranks = (
            ctx.ranks_dataset(res.ranks).to_pandas()
            .sort_values("vid").reset_index(drop=True)
        )
        cc = (
            analytics.connected_components(ctx).to_pandas()
            .sort_values("vid").reset_index(drop=True)
        )
        return {
            "dict_is_ds": ctx.dictionary is None and ctx.dictionary_ds is not None,
            "edges": ctx.num_edges(),
            "iterations": res.iterations,
            "full": ctx.assemble(res.ranks),
            "ranks": ranks,
            "cc": cc,
        }
    finally:
        ctx.shutdown()


def test_build_graph_distributed_mode_end_to_end(small_path):
    b = _run_mode(small_path, "broadcast")
    d = _run_mode(small_path, "distributed")
    assert not b["dict_is_ds"] and d["dict_is_ds"]
    assert b["edges"] == d["edges"]
    assert b["iterations"] == d["iterations"]
    assert np.allclose(b["full"], d["full"], atol=1e-14)
    # conv_id attachment: driver gather (broadcast) vs hash join (distributed)
    assert (b["ranks"]["conv_id"].to_numpy() == d["ranks"]["conv_id"].to_numpy()).all()
    assert np.allclose(b["ranks"]["rank"].to_numpy(), d["ranks"]["rank"].to_numpy(), atol=1e-14)
    # analytics conv attachment goes through the same join path
    assert (b["cc"]["component"].to_numpy() == d["cc"]["component"].to_numpy()).all()
    assert (b["cc"]["conv_id"].to_numpy() == d["cc"]["conv_id"].to_numpy()).all()
