"""Core engine correctness: generator, extraction, static PageRank vs oracle."""

import numpy as np
import pytest

from pagerank_cuda_dynamic_ray.pipelines.graph import GraphContext
from pagerank_cuda_dynamic_ray.sources import edges as E
from pagerank_cuda_dynamic_ray.sources import transcripts as T

from .oracle import pagerank_oracle


@pytest.fixture(scope="module")
def tiny_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("fixtures") / "tiny.parquet"
    T.write_transcripts(str(p), n_conv=64, seed=42)
    return str(p)


def test_generator_deterministic(tmp_path):
    t1 = T.generate_table(100, seed=42)
    t2 = T.generate_table(100, seed=42)
    assert t1.equals(t2)
    # ts strictly increasing == generation order (stable turn ordering invariant)
    ts = t1["ts"].to_numpy()
    assert (np.diff(ts.astype("int64")) > 0).all()


def test_extraction_matches_manual(tiny_path):
    import pyarrow.parquet as pq
    import re

    tbl = pq.read_table(tiny_path)
    ds = E.read_transcripts(tiny_path)
    got = E.extract_edges(ds).to_pandas().sort_values(["ts", "src", "turn_idx"]).reset_index(drop=True)
    # manual row-wise oracle
    rows = []
    for cid, ti, text, tool, ts in zip(
        tbl["conv_id"].to_pylist(), tbl["turn_idx"].to_pylist(),
        tbl["text"].to_pylist(), tbl["tool"].to_pylist(), tbl["ts"].to_pylist(),
    ):
        m = re.fullmatch(r"ref:([A-Za-z0-9_\-]+)", tool) or re.search(r"see:([A-Za-z0-9_\-]+)", text)
        if m:
            rows.append((cid, m.group(1), ts, ti))
    rows.sort(key=lambda r: (r[2], r[0], r[3]))
    assert len(got) == len(rows)
    assert got["src"].tolist() == [r[0] for r in rows]
    assert got["dst"].tolist() == [r[1] for r in rows]


def _edge_arrays(path):
    ds = E.read_transcripts(path)
    raw = E.extract_edges(ds)
    dictionary = E.vertex_dictionary(ds, raw)
    pdf = raw.to_pandas()
    src = np.searchsorted(dictionary, pdf["src"].to_numpy())
    dst = np.searchsorted(dictionary, pdf["dst"].to_numpy())
    return src, dst, len(dictionary), dictionary


@pytest.mark.parametrize("num_parts", [1, 3])
def test_static_pagerank_matches_oracle(tiny_path, num_parts):
    src, dst, n, _ = _edge_arrays(tiny_path)
    ctx = GraphContext(n, num_parts)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    res = ctx.pagerank("static")
    got = ctx.assemble(res.ranks)
    want, want_iters = pagerank_oracle(src, dst, n)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert abs(res.iterations - want_iters) <= 1
    assert abs(got.sum() - 1.0) < 1e-6  # self-loop graph: rank mass conserved


def test_static_pagerank_redistribute_dangling(tiny_path):
    src, dst, n, _ = _edge_arrays(tiny_path)
    ctx = GraphContext(n, 2, add_self_loops=False)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    from pagerank_cuda_dynamic_ray.options import PagerankOptions

    res = ctx.pagerank("static", options=PagerankOptions(dangling="redistribute"))
    got = ctx.assemble(res.ranks)
    want, _ = pagerank_oracle(src, dst, n, add_self_loops=False, dangling="redistribute")
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-6
    # the dangling-mass pre-sum is wired through every loop: the compiled
    # DAG appends it to each contribution channel, p2p piggybacks it on
    # the contribution message — all three must be bit-equal
    for mode in ("p2p", "compiled"):
        r2 = ctx.pagerank(
            "static", options=PagerankOptions(dangling="redistribute"), mode=mode
        )
        assert r2.iterations == res.iterations, mode
        np.testing.assert_array_equal(ctx.assemble(r2.ranks), got)


def test_degrees_and_self_loops(tiny_path):
    src, dst, n, _ = _edge_arrays(tiny_path)
    ctx = GraphContext(n, 3)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    assert ctx.count_self_loops() == n
    from .oracle import dedup_edges

    s, d = dedup_edges(src, dst, n, add_self_loops=True)
    assert ctx.num_edges() == len(s)
    deg = ctx.out_degrees().to_pandas().sort_values("vid")["outdeg"].to_numpy()
    want_deg = np.bincount(s, minlength=n)
    np.testing.assert_array_equal(deg, want_deg)


def test_personalized_pagerank_matches_oracle(tiny_path):
    """PPR via the §2.10 teleport seam: restart mass lands on the seed
    set, matches the numpy oracle, is bit-equal across loop modes, and
    does NOT leak into a later uniform run on the same context."""
    src, dst, n, _ = _edge_arrays(tiny_path)
    ctx = GraphContext(n, 3)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    pers = np.zeros(n)
    seeds = np.random.RandomState(7).choice(n, size=5, replace=False)
    pers[seeds] = 1.0
    res = ctx.pagerank("static", personalization=pers)
    got = ctx.assemble(res.ranks)
    want, want_iters = pagerank_oracle(src, dst, n, personalization=pers)
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert abs(res.iterations - want_iters) <= 1
    assert abs(got.sum() - 1.0) < 1e-6  # self-loop graph conserves mass
    # teleport targets dominate their uniform-PR counterparts
    uni = ctx.pagerank("static")
    got_uni = ctx.assemble(uni.ranks)
    assert (got[seeds] > got_uni[seeds]).all()
    # uniform run above must NOT have inherited the teleport vector
    want_uni, _ = pagerank_oracle(src, dst, n)
    np.testing.assert_allclose(got_uni, want_uni, atol=1e-6)
    # all three loop modes bit-equal (same kernel, same shard state)
    for mode in ("p2p", "compiled"):
        r2 = ctx.pagerank("static", personalization=pers, mode=mode)
        assert r2.iterations == res.iterations, mode
        np.testing.assert_array_equal(ctx.assemble(r2.ranks), got)


def test_personalized_pagerank_redistribute_dangling(tiny_path):
    """No self-loops: dangling mass teleports proportionally to the
    personalization vector (not uniformly)."""
    src, dst, n, _ = _edge_arrays(tiny_path)
    ctx = GraphContext(n, 2, add_self_loops=False)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    from pagerank_cuda_dynamic_ray.options import PagerankOptions

    pers = np.arange(1, n + 1, dtype=np.float64)  # non-uniform, full support
    res = ctx.pagerank(
        "static", options=PagerankOptions(dangling="redistribute"),
        personalization=pers,
    )
    got = ctx.assemble(res.ranks)
    want, _ = pagerank_oracle(
        src, dst, n, add_self_loops=False, dangling="redistribute",
        personalization=pers,
    )
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert abs(got.sum() - 1.0) < 1e-6


def test_personalized_dynamic_df_reaches_ppr_fixpoint(tiny_path):
    """DF warm-started after an insertion batch converges to the fresh
    personalized fixpoint (the dynamic variants compose with PPR)."""
    src, dst, n, _ = _edge_arrays(tiny_path)
    k = 8
    ctx = GraphContext(n, 3)
    ctx.ingest_pairs(src[:-k], dst[:-k])
    ctx.finalize()
    pers = np.zeros(n)
    pers[: max(3, n // 16)] = 1.0
    base = ctx.pagerank("static", personalization=pers)
    empty = np.empty((2, 0), dtype=np.int64)
    ins = np.stack([src[-k:].astype(np.int64), dst[-k:].astype(np.int64)])
    _, ins_t = ctx.tidy_batch(empty, ins)
    ctx.apply_batch(empty, ins_t)
    marks = ctx.compute_frontier_marks(empty, ins_t)
    df = ctx.pagerank(
        "df", warm=list(base.ranks), initial_marks=marks, personalization=pers
    )
    fresh = ctx.pagerank("static", personalization=pers)
    np.testing.assert_allclose(
        ctx.assemble(df.ranks), ctx.assemble(fresh.ranks), atol=1e-8
    )


def test_dfp_requires_self_loops(tiny_path):
    """The DF-P closed form divides by out-degree; without the self-loop
    transform a dangling vertex makes it undefined — must refuse."""
    src, dst, n, _ = _edge_arrays(tiny_path)
    ctx = GraphContext(n, 2, add_self_loops=False)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    with pytest.raises(ValueError, match="self-loop"):
        ctx.pagerank("dfp")


def test_weighted_pagerank_matches_oracle(tiny_path):
    """Multiplicity-weighted PageRank: duplicate mentions strengthen an
    edge (contribution r_u * w_uv / W_u). Shard-side unique-key
    aggregation is the weight reduction; matches the numpy oracle and is
    bit-equal across all three loop modes and partition counts."""
    src, dst, n, _ = _edge_arrays(tiny_path)
    # raw mention log carries duplicates naturally; amplify a few
    src = np.concatenate([src, src[:10], src[:5]])
    dst = np.concatenate([dst, dst[:10], dst[:5]])
    want, want_iters = pagerank_oracle(src, dst, n, weighted=True)
    got = {}
    for num_parts in (1, 3):
        ctx = GraphContext(n, num_parts, weighted=True)
        ctx.ingest_pairs(src, dst)
        ctx.finalize()
        res = ctx.pagerank("static")
        got[num_parts] = ctx.assemble(res.ranks)
        np.testing.assert_allclose(got[num_parts], want, atol=1e-9)
        assert abs(res.iterations - want_iters) <= 1
        assert abs(got[num_parts].sum() - 1.0) < 1e-6
        # weighted semantics differ from unweighted on this graph
        uw, _ = pagerank_oracle(src, dst, n)
        assert not np.allclose(got[num_parts], uw, atol=1e-9)
        for mode in ("p2p", "compiled"):
            r2 = ctx.pagerank("static", mode=mode)
            np.testing.assert_array_equal(ctx.assemble(r2.ranks), got[num_parts])
        ctx.shutdown()
    np.testing.assert_allclose(got[1], got[3], atol=1e-12)


def test_weighted_personalized_composes(tiny_path):
    """Weighted pull + personalized teleport through the same kernel."""
    src, dst, n, _ = _edge_arrays(tiny_path)
    src = np.concatenate([src, src[:7]])
    dst = np.concatenate([dst, dst[:7]])
    pers = np.zeros(n)
    pers[:4] = 1.0
    ctx = GraphContext(n, 2, weighted=True)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    got = ctx.assemble(ctx.pagerank("static", personalization=pers).ranks)
    want, _ = pagerank_oracle(src, dst, n, weighted=True, personalization=pers)
    np.testing.assert_allclose(got, want, atol=1e-9)
    ctx.shutdown()


def test_weighted_graph_updates_add_multiplicity_and_hub_split_refused(tiny_path):
    # round 4: weighted batch updates are SUPPORTED (multiset fold, +1
    # weight per insertion instance); hub splitting still refuses
    src, dst, n, _ = _edge_arrays(tiny_path)
    ctx = GraphContext(n, 2, weighted=True)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    empty = np.empty((2, 0), dtype=np.int64)
    ins = np.stack([src[:2].astype(np.int64), dst[:2].astype(np.int64)])
    base = ctx.pagerank("static")
    ctx.apply_batch(empty, ins)
    got = ctx.assemble(ctx.pagerank("static", warm=list(base.ranks)).ranks)
    want, _ = pagerank_oracle(np.concatenate([src, ins[0]]),
                              np.concatenate([dst, ins[1]]), n, weighted=True)
    np.testing.assert_allclose(got, want, atol=1e-9)
    ctx.shutdown()
    with pytest.raises(ValueError, match="weighted"):
        GraphContext(n, 2, weighted=True, hub_split_threshold=64)


def test_export_edges_parquet_roundtrip(tmp_path):
    import ray.data as rd
    from pagerank_cuda_dynamic_ray.pipelines.graph import GraphContext

    src = np.array([0, 1, 2, 2, 3])
    dst = np.array([1, 2, 0, 3, 4])
    c = GraphContext(5, 3, add_self_loops=True)
    c.ingest_pairs(src, dst)
    c.finalize()
    n = c.export_edges_parquet(str(tmp_path / "edges"))
    assert n == c.num_edges()
    got = rd.read_parquet(str(tmp_path / "edges")).to_pandas()
    c.shutdown()
    want = sorted(set(zip(src.tolist(), dst.tolist())) | {(v, v) for v in range(5)})
    assert sorted(zip(got["src"], got["dst"])) == want
    # a context rebuilt from the export matches the original graph
    c2 = GraphContext(5, 2, add_self_loops=False)  # loops already in file
    df = got
    c2.ingest_pairs(df["src"].to_numpy(), df["dst"].to_numpy())
    c2.finalize()
    assert c2.num_edges() == n
    c2.shutdown()


def test_ranks_dataset_live_matches_driver_assembly(tiny_path):
    # the shard-built (from_arrow_refs) ranks Dataset must equal the
    # driver-assembled one row-for-row, and norm_delta's scalar fold
    # must equal the assembled-vector l1 up to summation order
    src, dst, n, _ = _edge_arrays(tiny_path)
    ctx = GraphContext(n, 4)
    ctx.ingest_pairs(src, dst)
    ctx.finalize()
    res = ctx.pagerank("static")
    a = ctx.ranks_dataset(res.ranks).to_pandas().sort_values("vid").reset_index(drop=True)
    b = ctx.ranks_dataset_live().to_pandas().sort_values("vid").reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    np.testing.assert_array_equal(a["vid"].to_numpy(), b["vid"].to_numpy())
    np.testing.assert_array_equal(a["rank"].to_numpy(), b["rank"].to_numpy())
    full = ctx.assemble(res.ranks)
    perturbed = ctx.split(full * 1.0000001)
    want = float(np.abs(full - full * 1.0000001).sum())
    got = ctx.norm_delta(perturbed, ord=1)
    assert abs(got - want) < 1e-15 + 1e-9 * want
    ctx.shutdown()
