"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (transcripts -> edge derivation ->
static PageRank on the shard actor pool) at sf0.001. ``queries()`` exposes
one callable per implemented operator/pipeline from SURVEY.md §2 (graph
family over the deterministic transcript fixture, relational family over
the driver's TPC-H-ish tables, training-data family over documents /
embeddings). ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query; iterative graph algorithms (PageRank variants, CC,
LP) and hash-randomized pipelines (MinHash/SimHash/LSH) are rows-only by
design.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from pagerank_cuda_dynamic_ray import api
from pagerank_cuda_dynamic_ray.options import PagerankOptions
from pagerank_cuda_dynamic_ray.pipelines import analytics as A
from pagerank_cuda_dynamic_ray.sources import edges as E
from pagerank_cuda_dynamic_ray.sources import transcripts as T
from pagerank_cuda_dynamic_ray.stages import clustering as C
from pagerank_cuda_dynamic_ray.stages import corpus as CO
from pagerank_cuda_dynamic_ray.stages import dedup as D
from pagerank_cuda_dynamic_ray.stages import multimodal as MM
from pagerank_cuda_dynamic_ray.stages import sampling as SP
from pagerank_cuda_dynamic_ray.stages import similarity as S
from pagerank_cuda_dynamic_ray.stages import sketch as SK
from pagerank_cuda_dynamic_ray.stages import temporal as TP
from pagerank_cuda_dynamic_ray.stages import text_stage as TS

NUM_PARTS = 8

# ----------------------------------------------------------------------
# caches (one graph build shared by all graph-family queries in a run)
# ----------------------------------------------------------------------

_CTX: dict[str, Any] = {}
_PR: dict[str, Any] = {}
_PRQ: dict[str, Any] = {}
_TRI: dict[str, Any] = {}
_DOCS: dict[str, Any] = {}


def _analyzed_docs(sf_dir: str, with_fingerprint: bool):
    """Shared, materialized text-analysis pass (the _PR/_TRI pattern):
    the four doc_* queries differ only in projected columns, so the
    tokenize/regex/lang pass runs once per (sf_dir, fingerprint)."""
    key = f"{sf_dir}|{with_fingerprint}"
    if key not in _DOCS:
        _DOCS[key] = TS.analyze_documents(
            _tbl(sf_dir, "documents", ["doc_id", "text"]),
            with_fingerprint=with_fingerprint,
        ).materialize()
    return _DOCS[key]

# Fixed iteration count for the oracle-checked PageRank queries: both the
# engine and the DuckDB recursive-CTE oracle run EXACTLY this many
# synchronous iterations. 0.85^250 ≈ 2e-18, so both sides sit at the
# numerical fixpoint (agreement ~1e-15 relative — dominated by float
# summation-order noise, amplified ≤ 1/(1-d)), making the 1e10-quantized
# integer ranks deterministic across both implementations.
PR_ORACLE_ITERS = 250


def _fixture(sf_dir: str) -> str:
    return T.ensure_fixture(T.scale_for_sf_dir(sf_dir))


def _graph(sf_dir: str):
    key = os.path.abspath(sf_dir)
    if key not in _CTX:
        ctx, _ = api.build_graph(_fixture(sf_dir), num_parts=NUM_PARTS)
        _CTX[key] = ctx
    return _CTX[key]


def _pr(sf_dir: str):
    key = os.path.abspath(sf_dir)
    if key not in _PR:
        ctx = _graph(sf_dir)
        res = ctx.pagerank("static")
        _PR[key] = ctx.ranks_dataset(res.ranks)
    return _PR[key]


def _tri(sf_dir: str):
    key = os.path.abspath(sf_dir)
    if key not in _TRI:
        _TRI[key] = A.triangle_count(_graph(sf_dir))
    return _TRI[key]


def _pr_quantized(sf_dir: str) -> np.ndarray:
    """1e10-quantized integer ranks from a fixed PR_ORACLE_ITERS-iteration
    static run (dense, vid-indexed) — the oracle-comparable PageRank."""
    key = os.path.abspath(sf_dir)
    if key not in _PRQ:
        ctx = _graph(sf_dir)
        res = ctx.pagerank(
            "static", options=PagerankOptions(tolerance=0.0, max_iterations=PR_ORACLE_ITERS)
        )
        _PRQ[key] = np.round(ctx.assemble(res.ranks) * 1e10).astype(np.int64)
    return _PRQ[key]


def _q_mis(sf_dir: str):
    """Maximal independent set (Luby rounds, fixed splitmix64(vid)
    priorities) over the undirected view. Fixed priorities make the
    result the unique greedy MIS in increasing-hash order, so the SQL
    oracle's round replay lands on the identical membership."""
    ctx = _graph(sf_dir)
    return A.maximal_independent_set(ctx).select_columns(["conv_id", "in_mis"])


def _q_coloring(sf_dir: str):
    """Jones-Plassmann greedy coloring with fixed splitmix64(vid)
    priorities — equals the sequential greedy coloring in
    increasing-hash order, which the SQL oracle replays round by
    round."""
    ctx = _graph(sf_dir)
    return A.greedy_coloring(ctx).select_columns(["conv_id", "color"])


WALK_LEN = 4


def _q_walk_counts(sf_dir: str):
    """Exact-integer truncated-Katz walk counts (length 4) — int64
    end-to-end, so the SQL oracle's unrolled join+sum levels replay it
    bit-for-bit."""
    ctx = _graph(sf_dir)
    return A.walk_count_centrality(ctx, length=WALK_LEN).select_columns(
        ["conv_id", "walks"])


def _q_temporal_arrival(sf_dir: str):
    """Time-respecting earliest arrival from the hash-elected seed over
    the directed mention log: edge (u, v, ts) usable iff ts >=
    arrival(u), delivering arrival ts + 1 (int64 epoch-us); seed starts
    at 0; unreached -1. The per-edge timeline is re-encoded from the
    transcripts (the graph CSR drops timestamps) and streamed into the
    pool's temporal adjacency."""
    ctx = _graph(sf_dir)
    ts = E.read_transcripts(
        _fixture(sf_dir), columns=["conv_id", "turn_idx", "text", "tool", "ts"]
    )
    enc = E.encode_edges(E.extract_edges(ts), ray.put(ctx.dictionary))
    return A.temporal_earliest_arrival(ctx, enc).select_columns(["conv_id", "arrival"])


def _q_sssp(sf_dir: str):
    """Weighted SSSP (Bellman-Ford BSP) from the hash-elected seed;
    edge weights 1 + mix2(lo, hi) % SSSP_WMOD are pure functions of the
    endpoint vids, so the SQL oracle recomputes them bit-equal."""
    ctx = _graph(sf_dir)
    return A.sssp_weighted(ctx, wmod=SSSP_WMOD).select_columns(["conv_id", "sdist"])


def _vid_to_conv(ctx, ds: rd.Dataset, src_col: str, out_col: str) -> rd.Dataset:
    """Map an int64 vid-label column to its conv_id string via the
    broadcast dictionary (labels are min-vids, and the dictionary is
    sorted, so vid order == conv_id lexicographic order)."""
    dict_ref = ray.put(ctx.dictionary)

    def f(t: pa.Table) -> pa.Table:
        d = ray.get(dict_ref)
        return pa.table(
            {"conv_id": t["conv_id"], out_col: pa.array(d[t[src_col].to_numpy()])}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _rename(ds: rd.Dataset, mapping: dict[str, str]) -> rd.Dataset:
    def f(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(f, batch_format="pyarrow")


def _tbl(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    # Shape the tiny fixture files to ~one block per core: the driver-
    # written parquet carries 64 micro row-groups whose per-task
    # scheduling overhead dominates map stages at sf<=0.1 (measured 4x
    # on tfidf). Real corpora read as ~128MB blocks and skip this.
    n = None
    if ray.is_initialized():
        n = int(ray.cluster_resources().get("CPU", 0)) or None
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns,
                           override_num_blocks=n)


# ----------------------------------------------------------------------
# entry
# ----------------------------------------------------------------------

def entry() -> Any:
    """Flagship pipeline at sf0.001: transcripts -> edges -> vertex dict ->
    CSR shard pool -> static PageRank -> (conv_id, vid, rank) Dataset."""
    return _pr("/root/testdata/sf0.001")


# ----------------------------------------------------------------------
# graph-family queries (transcript fixture)
# ----------------------------------------------------------------------

def _q_edge_log(sf_dir: str):
    ts = E.read_transcripts(_fixture(sf_dir))
    return E.extract_edges(ts).select_columns(["src", "dst", "turn_idx"])


def _q_edge_log_jsonl(sf_dir: str):
    """JSONL source parity: the fixture transcripts round-trip through
    newline-delimited JSON (ts as int64 epoch-us) and the extracted
    edge log must hash-equal the Parquet path's — same SQL oracle as
    edge_log, so the new source format carries a full correctness row."""
    import pyarrow.parquet as pq

    fx = _fixture(sf_dir)
    out = (f"/tmp/graft_jsonl_{os.getpid()}_"
           f"{os.path.basename(os.path.abspath(sf_dir))}")
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        os.makedirs(out, exist_ok=True)
        pdf = pq.read_table(fx).to_pandas()
        pdf["ts"] = pdf["ts"].astype("int64")  # epoch-us
        pdf.to_json(os.path.join(out, "part.jsonl"), orient="records", lines=True)
        with open(done, "w") as f:
            f.write("ok")
    ts = E.read_transcripts_jsonl(out)
    return E.extract_edges(ts).select_columns(["src", "dst", "turn_idx"])


def _q_edge_log_csv(sf_dir: str):
    """CSV source parity: the fixture transcripts round-trip through
    comma-separated text (ts as int64 epoch-us) and the extracted edge
    log must hash-equal the Parquet path's — same SQL oracle as
    edge_log, so the third source format carries a correctness row."""
    import pyarrow.parquet as pq

    fx = _fixture(sf_dir)
    out = (f"/tmp/graft_csv_{os.getpid()}_"
           f"{os.path.basename(os.path.abspath(sf_dir))}")
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        os.makedirs(out, exist_ok=True)
        pdf = pq.read_table(fx).to_pandas()
        pdf["ts"] = pdf["ts"].astype("int64")  # epoch-us
        pdf.to_csv(os.path.join(out, "part.csv"), index=False)
        with open(done, "w") as f:
            f.write("ok")
    # read the .csv file, not the dir: unlike read_json, read_csv has no
    # default extension filter and would choke on the _DONE marker
    ts = E.read_transcripts_csv(os.path.join(out, "part.csv"))
    return E.extract_edges(ts).select_columns(["src", "dst", "turn_idx"])


def _q_doc_repetition(sf_dir: str):
    """Within-doc duplicate-3-gram profile (the Gopher repetition
    rule): total vs distinct word 3-grams per document, exact int64."""
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return CO.doc_repetition(docs, 3)


def _q_crossdoc_dup(sf_dir: str):
    """Cross-document duplicate-gram mass (stages/corpus.py): per doc,
    distinct 3-grams and how many occur in >= 1 OTHER document — the
    span-dedup signal, three bounded 16 B/row exchanges."""
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return CO.crossdoc_dup_mass(docs, 3)


def _q_vertex_dictionary(sf_dir: str):
    d = _graph(sf_dir).dictionary
    return pa.table({"conv_id": pa.array(d), "vid": pa.array(np.arange(len(d), dtype=np.int64))})


def _q_edges_encoded_dist(sf_dir: str):
    """The 100 TB dictionary path end-to-end: distributed (id, vid)
    dictionary Dataset + two-sided hash-join encode — the driver never
    holds the id universe. Hash-verifying the encoded vids against the
    SQL dense-rank dictionary checks BOTH the distributed distinct/sort
    and the join encode."""
    path = _fixture(sf_dir)
    ts = E.read_transcripts(path, columns=["conv_id", "turn_idx", "text", "tool", "ts"])
    raw = E.extract_edges(ts).materialize()
    ts_ids = E.read_transcripts(path, columns=["conv_id"])
    dict_ds = E.vertex_dictionary_ds(ts_ids, raw).materialize()
    return E.encode_edges_ds(raw, dict_ds, num_partitions=NUM_PARTS).select_columns(
        ["src", "dst", "turn_idx"]
    )


def _q_out_degrees(sf_dir: str):
    ctx = _graph(sf_dir)
    dict_ref = ray.put(ctx.dictionary)

    def f(t: pa.Table) -> pa.Table:
        d = ray.get(dict_ref)
        return pa.table({"conv_id": pa.array(d[t["vid"].to_numpy()]), "outdeg": t["outdeg"]})

    return ctx.out_degrees().map_batches(f, batch_format="pyarrow")


def _q_edges_export(sf_dir: str):
    """Graph export/import round trip: per-shard parallel Parquet dump
    of the live edge set, read back with read_parquet, vids mapped to
    conv ids — hash-verifies the portable snapshot path end-to-end."""
    ctx = _graph(sf_dir)
    out_dir = os.path.join(  # pid-scoped: concurrent sessions must not race
        f"/tmp/graft_export_{os.getpid()}",
        os.path.basename(os.path.abspath(sf_dir)))
    ctx.export_edges_parquet(out_dir)  # clears stale part files itself
    ds = rd.read_parquet(out_dir)
    dict_ref = ray.put(ctx.dictionary)

    def f(t: pa.Table) -> pa.Table:
        d = ray.get(dict_ref)
        return pa.table({"src_conv": pa.array(d[t["src"].to_numpy()]),
                         "dst_conv": pa.array(d[t["dst"].to_numpy()])})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_degree_distribution(sf_dir: str):
    """Degree histogram (out + in) of the deduped directed graph incl.
    structural self-loops — per-shard degree tables, tiny histogram
    shuffle (one row per distinct degree per block)."""
    return A.degree_distribution(_graph(sf_dir))


def _q_degree_assortativity(sf_dir: str):
    """Directed degree-assortativity sufficient statistics: exact int64
    sums of (x=outdeg(src), y=indeg(dst)) over every edge — one
    dedicated actor-to-actor degree exchange, driver folds P small
    vectors. The Pearson r derives from these six integers (float kept
    out of the hash-compare gate by design)."""
    s = A.assortativity_sums(_graph(sf_dir))
    return pa.table({k: pa.array([v], pa.int64()) for k, v in s.items()})


def _q_random_batch(sf_dir: str):
    """Seeded counter-RNG random batch over the live graph: 64 edge
    deletions (uniform vertex -> uniform non-loop out-edge, 5 retries
    on zero data degree) + 64 uniform vertex-pair insertions, vids
    mapped back to conv ids. (l, kind) identify each sample."""
    ctx = _graph(sf_dir)
    d = ctx.dictionary
    dels, inss, dl, il = ctx.random_batch(64, 64, seed=11, return_indices=True)
    return pa.table({
        "l": pa.array(np.concatenate([dl, il])),
        "kind": pa.array(["del"] * dels.shape[1] + ["ins"] * inss.shape[1]),
        "src": pa.array(d[np.concatenate([dels[0], inss[0]])]),
        "dst": pa.array(d[np.concatenate([dels[1], inss[1]])]),
    })


def _q_batch_tidy(sf_dir: str):
    """tidyBatchUpdateU (M7-M9) surfaced as a query: canonicalize the
    seed-11 random batch — existence filter against the live shards
    (deletions must exist; insertions must not, which also drops
    random self-loop pairs since the graph self-loops every vertex),
    sort, exact dedup. The oracle replays the generator AND the tidy
    relationally (IN / NOT IN against the deduped edge set)."""
    ctx = _graph(sf_dir)
    d = ctx.dictionary
    dels, inss = ctx.random_batch(64, 64, seed=11)
    tdel, tins = ctx.tidy_batch(dels, inss)
    return pa.table({
        "kind": pa.array(["del"] * tdel.shape[1] + ["ins"] * tins.shape[1]),
        "src": pa.array(d[np.concatenate([tdel[0], tins[0]])]),
        "dst": pa.array(d[np.concatenate([tdel[1], tins[1]])]),
    })


def _q_self_loops(sf_dir: str):
    return pa.table({"self_loops": pa.array([_graph(sf_dir).count_self_loops()], pa.int64())})


def _q_triangle_total(sf_dir: str):
    total, _ = _tri(sf_dir)
    return pa.table({"triangles": pa.array([total], pa.int64())})


def _q_triangles_per_vertex(sf_dir: str):
    _, per_vertex = _tri(sf_dir)
    return per_vertex.select_columns(["conv_id", "triangles"])


def _q_clustering_coefficient(sf_dir: str):
    """Exact scaled-int local clustering coefficient per vertex —
    triangle corner credits paired shard-side with symmetric degrees."""
    ds = A.clustering_coefficient(_graph(sf_dir))
    return ds.select_columns(["conv_id", "triangles", "cc_e6"])


def _q_pagerank_static(sf_dir: str):
    """Per-vertex PageRank, 1e10-quantized integers from a fixed
    250-iteration run — hash-comparable against the DuckDB recursive
    power-iteration oracle (float ranks cannot hash-match across
    engines; at the numerical fixpoint the quantized integers do)."""
    ctx = _graph(sf_dir)
    e10 = _pr_quantized(sf_dir)
    return pa.table({"conv_id": pa.array(ctx.dictionary), "rank_e10": pa.array(e10)})


def _q_pagerank_top20(sf_dir: str):
    ctx = _graph(sf_dir)
    e10 = _pr_quantized(sf_dir)
    order = np.lexsort((ctx.dictionary, -e10))[:20]
    return pa.table(
        {
            "pos": pa.array(np.arange(len(order), dtype=np.int64)),
            "conv_id": pa.array(ctx.dictionary[order]),
            "rank_e10": pa.array(e10[order]),
        }
    )


PPR_SEEDS = 10


def _q_pagerank_personalized(sf_dir: str):
    """Personalized PageRank (§2.10 teleport seam): restart mass lands
    uniformly on the 10 highest-out-degree vertices (ties -> lowest
    conv_id). Fixed PR_ORACLE_ITERS iterations, 1e10-quantized — hash-
    comparable against the DuckDB recursive oracle with the same
    per-vertex teleport term."""
    ctx = _graph(sf_dir)
    top = (
        ctx.out_degrees()
        .sort(["outdeg", "vid"], descending=[True, False])
        .limit(PPR_SEEDS)
        .to_pandas()
    )
    pers = np.zeros(ctx.N)
    pers[top["vid"].to_numpy()] = 1.0
    res = ctx.pagerank(
        "static", personalization=pers,
        options=PagerankOptions(tolerance=0.0, max_iterations=PR_ORACLE_ITERS),
    )
    e10 = np.round(ctx.assemble(res.ranks) * 1e10).astype(np.int64)
    return pa.table({"conv_id": pa.array(ctx.dictionary), "rank_e10": pa.array(e10)})


HITS_ITERS = 20


def _q_hits_scores(sf_dir: str):
    """HITS hubs/authorities: 20 iterations from h0=1, end-normalized to
    unit L2 (the variant a recursive CTE can replicate — per-iteration
    renormalization only rescales, directions are identical),
    1e10-quantized for hash comparison."""
    ctx = _graph(sf_dir)
    a, h = ctx.hits(iterations=HITS_ITERS, normalize="end")
    return pa.table({
        "conv_id": pa.array(ctx.dictionary),
        "auth_e10": pa.array(np.round(a * 1e10).astype(np.int64)),
        "hub_e10": pa.array(np.round(h * 1e10).astype(np.int64)),
    })


def _q_pagerank_weighted(sf_dir: str):
    """Multiplicity-weighted PageRank: edge weight = number of times dst
    is mentioned across src's turns (+1 structural self-loop); pull
    contribution r_u * w_uv / W_u. Fixed-iteration, 1e10-quantized,
    hash-comparable against the weighted recursive-CTE oracle."""
    ctx, _ = api.build_graph(_fixture(sf_dir), num_parts=NUM_PARTS, weighted=True)
    try:
        res = ctx.pagerank(
            "static",
            options=PagerankOptions(tolerance=0.0, max_iterations=PR_ORACLE_ITERS),
        )
        e10 = np.round(ctx.assemble(res.ranks) * 1e10).astype(np.int64)
        return pa.table({"conv_id": pa.array(ctx.dictionary), "rank_e10": pa.array(e10)})
    finally:
        ctx.shutdown()


def _q_pagerank_dynamic(sf_dir: str):
    out = api.run_temporal_experiment(
        _fixture(sf_dir), num_parts=NUM_PARTS, num_batches=3, batch_fraction=1e-3
    )
    rows = []
    for bi, rec in enumerate(out["batches"]):
        for variant, r in rec.items():
            rows.append(
                {
                    "batch": bi,
                    "variant": variant,
                    "iterations": r["iterations"],
                    "l1_error_small": bool(r["l1_error"] < 1e-6),
                }
            )
    return pd.DataFrame(rows)


def _q_pagerank_dynamic_ranks(sf_dir: str):
    """The dynamic protocol, hash-verified: base graph from the first
    80% of the ordered log, the remaining edges applied as two insertion
    batches with DF warm restarts — every run at a fixed
    ``PR_ORACLE_ITERS`` with zero tolerances, so each stage sits at the
    numerical fixpoint of its graph. Vertices unaffected by a batch keep
    their prior-fixpoint bits (the DF reachability argument,
    /root/reference/inc/pagerank.hxx:645-676); affected vertices iterate
    to the new fixpoint — so the final quantized ranks must equal the
    SQL power iteration over the COMPLETE edge set (the reference's own
    dynamic-vs-static validation, /root/reference/main.cu:88)."""
    ctx, batches = api.build_graph(
        _fixture(sf_dir), num_parts=NUM_PARTS, temporal=True,
        base_fraction=0.8, batch_fraction=0.1, num_batches=2,
    )
    try:
        o = PagerankOptions(
            tolerance=0.0, max_iterations=PR_ORACLE_ITERS, frontier_tolerance=0.0
        )
        res = ctx.pagerank("static", options=o)
        warm = list(res.ranks)
        empty = np.empty((2, 0), dtype=np.int64)
        for batch in batches:
            dels, ins = ctx.tidy_batch(empty, batch)
            ctx.apply_batch(dels, ins)
            marks = ctx.compute_frontier_marks(empty, ins)
            r = ctx.pagerank("df", warm=warm, initial_marks=marks, options=o)
            warm = list(r.ranks)
        e10 = np.round(ctx.assemble(warm) * 1e10).astype(np.int64)
        return pa.table({"conv_id": pa.array(ctx.dictionary), "rank_e10": pa.array(e10)})
    finally:
        ctx.shutdown()


def _q_pagerank_weighted_dynamic(sf_dir: str):
    """Weights × warm restart — the dynamic protocol on a
    multiplicity-weighted graph: weighted static PR on the first 80% of
    the ordered log, then two insertion batches folded through the
    multiset update (+1 weight per mention instance,
    state/kernels.weighted_set_update) with DF warm restarts. Every run
    at fixed PR_ORACLE_ITERS / zero tolerances, so the final quantized
    ranks must equal the weighted recursive-CTE power iteration over
    the COMPLETE log (same oracle body as pagerank_weighted — the
    replayed weights are exactly the one-shot build's)."""
    ctx, batches = api.build_graph(
        _fixture(sf_dir), num_parts=NUM_PARTS, temporal=True,
        base_fraction=0.8, batch_fraction=0.1, num_batches=2, weighted=True,
    )
    try:
        o = PagerankOptions(
            tolerance=0.0, max_iterations=PR_ORACLE_ITERS, frontier_tolerance=0.0
        )
        res = ctx.pagerank("static", options=o)
        warm = list(res.ranks)
        empty = np.empty((2, 0), dtype=np.int64)
        for batch in batches:
            dels, ins = ctx.tidy_batch(empty, batch)
            ctx.apply_batch(dels, ins)
            marks = ctx.compute_frontier_marks(empty, ins)
            r = ctx.pagerank("df", warm=warm, initial_marks=marks, options=o)
            warm = list(r.ranks)
        e10 = np.round(ctx.assemble(warm) * 1e10).astype(np.int64)
        return pa.table({"conv_id": pa.array(ctx.dictionary), "rank_e10": pa.array(e10)})
    finally:
        ctx.shutdown()


def _q_pagerank_dynamic_deletions(sf_dir: str):
    """Deletions-bearing dynamic protocol — the one path the reference
    driver never replays (main.cu:62-84 is insertion-only) but its
    kernels fully support (deletion targets enter the DF frontier,
    /root/reference/inc/pagerankCuda.hxx:273-299): static fixpoint on
    the full graph, then the seed-11 random batch (64 deletions + 64
    insertions) tidied and applied in ONE batch — existence filter,
    multiset minus-then-union, DF marking over BOTH deletion and
    insertion endpoints — followed by a DF warm restart. Every run at
    fixed PR_ORACLE_ITERS / zero tolerances, so the final quantized
    ranks must equal a cold SQL power iteration over the POST-BATCH
    edge set (generator + tidy replayed relationally, the batch_tidy
    oracle's machinery). Fresh context: the batch mutates the graph, so
    the shared _graph() cache must not see it."""
    ctx, _ = api.build_graph(_fixture(sf_dir), num_parts=NUM_PARTS)
    try:
        o = PagerankOptions(
            tolerance=0.0, max_iterations=PR_ORACLE_ITERS, frontier_tolerance=0.0
        )
        res = ctx.pagerank("static", options=o)
        warm = list(res.ranks)
        dels, inss = ctx.random_batch(64, 64, seed=11)
        tdel, tins = ctx.tidy_batch(dels, inss)
        empty = np.empty((2, 0), dtype=np.int64)
        # deletion marks expand in the OLD graph (the deleted edge's
        # target is no longer an out-neighbor afterwards); insertion
        # marks in the updated one — pagerank.hxx:645-676 ordering
        marks_del = ctx.compute_frontier_marks(tdel, empty)
        ctx.apply_batch(tdel, tins)
        marks_ins = ctx.compute_frontier_marks(empty, tins)
        marks = [np.unique(np.concatenate([a, b]))
                 for a, b in zip(marks_del, marks_ins)]
        r = ctx.pagerank("df", warm=warm, initial_marks=marks, options=o)
        e10 = np.round(ctx.assemble(r.ranks) * 1e10).astype(np.int64)
        return pa.table({"conv_id": pa.array(ctx.dictionary), "rank_e10": pa.array(e10)})
    finally:
        ctx.shutdown()


def _q_pagerank_weighted_dynamic_deletions(sf_dir: str):
    """Weights × deletions — the last dynamic composition: on the
    multiplicity-weighted full graph, the seed-11 random batch tidied
    per weighted semantics (deletion INSTANCES each remove one unit of
    weight, clamped at zero — state/kernels.weighted_set_update;
    insertion instances each add one, no dedup/existence filter) and
    applied in one batch, then a DF warm restart from the weighted
    static fixpoint. Fixed iterations / zero tolerances, so the final
    quantized ranks must equal a cold weighted power iteration over the
    POST-BATCH weights: w' = max(w − del_instances, 0) + ins_instances
    per (src, dst), edges kept while w' > 0."""
    ctx, _ = api.build_graph(_fixture(sf_dir), num_parts=NUM_PARTS, weighted=True)
    try:
        o = PagerankOptions(
            tolerance=0.0, max_iterations=PR_ORACLE_ITERS, frontier_tolerance=0.0
        )
        res = ctx.pagerank("static", options=o)
        warm = list(res.ranks)
        dels, inss = ctx.random_batch(64, 64, seed=11)
        tdel, tins = ctx.tidy_batch(dels, inss)
        empty = np.empty((2, 0), dtype=np.int64)
        marks_del = ctx.compute_frontier_marks(tdel, empty)
        ctx.apply_batch(tdel, tins)
        marks_ins = ctx.compute_frontier_marks(empty, tins)
        marks = [np.unique(np.concatenate([a, b]))
                 for a, b in zip(marks_del, marks_ins)]
        r = ctx.pagerank("df", warm=warm, initial_marks=marks, options=o)
        e10 = np.round(ctx.assemble(r.ranks) * 1e10).astype(np.int64)
        return pa.table({"conv_id": pa.array(ctx.dictionary), "rank_e10": pa.array(e10)})
    finally:
        ctx.shutdown()


PFX_STAGES = 2  # insertion batches after the base prefix (3 stages total)


def _q_pagerank_prefix_stages(sf_dir: str):
    """Rank evolution across the ordered log — the STRONGER form of
    pagerank_dynamic_ranks: every intermediate state hash-verified, not
    just the final one. Static fixpoint on the 80% prefix (stage 0),
    then per insertion batch a DF warm restart (stages 1..2); each run
    at fixed PR_ORACLE_ITERS / zero tolerances, so stage s sits at the
    numerical fixpoint of prefix-graph s and must match a cold SQL
    power iteration over that prefix (the DF reachability argument,
    /root/reference/inc/pagerank.hxx:645-676, applied per stage).
    Returns (stage, conv_id, rank_e10)."""
    ctx, batches = api.build_graph(
        _fixture(sf_dir), num_parts=NUM_PARTS, temporal=True,
        base_fraction=0.8, batch_fraction=0.1, num_batches=PFX_STAGES,
    )
    try:
        o = PagerankOptions(
            tolerance=0.0, max_iterations=PR_ORACLE_ITERS, frontier_tolerance=0.0
        )
        res = ctx.pagerank("static", options=o)
        warm = list(res.ranks)
        stages = [ctx.assemble(warm)]
        empty = np.empty((2, 0), dtype=np.int64)
        for batch in batches:
            dels, ins = ctx.tidy_batch(empty, batch)
            ctx.apply_batch(dels, ins)
            marks = ctx.compute_frontier_marks(empty, ins)
            r = ctx.pagerank("df", warm=warm, initial_marks=marks, options=o)
            warm = list(r.ranks)
            stages.append(ctx.assemble(warm))
        d = ctx.dictionary
        return pa.concat_tables([
            pa.table({
                "stage": pa.array(np.full(len(d), s, dtype=np.int64)),
                "conv_id": pa.array(d),
                "rank_e10": pa.array(np.round(rk * 1e10).astype(np.int64)),
            })
            for s, rk in enumerate(stages)
        ])
    finally:
        ctx.shutdown()


def _q_pagerank_weighted_personalized(sf_dir: str):
    """Weights × teleport — the two §2.10 extension seams composed:
    multiplicity-weighted pull (r_u·w_uv/W_u) with restart mass on the
    10 highest-out-degree vertices (same seed rule as
    pagerank_personalized; structural out-degrees, which weighted builds
    share with unweighted ones). Fixed-iteration, 1e10-quantized."""
    ctx, _ = api.build_graph(_fixture(sf_dir), num_parts=NUM_PARTS, weighted=True)
    try:
        top = (
            ctx.out_degrees()
            .sort(["outdeg", "vid"], descending=[True, False])
            .limit(PPR_SEEDS)
            .to_pandas()
        )
        pers = np.zeros(ctx.N)
        pers[top["vid"].to_numpy()] = 1.0
        res = ctx.pagerank(
            "static", personalization=pers,
            options=PagerankOptions(tolerance=0.0, max_iterations=PR_ORACLE_ITERS),
        )
        e10 = np.round(ctx.assemble(res.ranks) * 1e10).astype(np.int64)
        return pa.table({"conv_id": pa.array(ctx.dictionary), "rank_e10": pa.array(e10)})
    finally:
        ctx.shutdown()


def _q_bfs_distances(sf_dir: str):
    ctx = _graph(sf_dir)
    return A.bfs_distances(ctx, 0).select_columns(["conv_id", "distance"])


def _q_pseudo_diameter(sf_dir: str):
    """Double-sweep BFS pseudo-diameter: BFS from the lexicographic-min
    vertex, re-BFS from its farthest reached vertex (tie to the smaller
    conv_id); O(blocks) argmax fold between the sweeps."""
    ctx = _graph(sf_dir)
    return A.pseudo_diameter(ctx)


def _q_modularity(sf_dir: str):
    ctx = _graph(sf_dir)
    A.label_propagation(ctx, max_iterations=10)
    q = A.modularity(ctx)
    # 1e9-quantized: both sides combine the same exact integer
    # (within, degsum) community terms in float — only summation order
    # differs (~1e-16 relative), far inside the quantization step
    return pa.table({"modularity_e9": pa.array([int(np.round(q * 1e9))], pa.int64())})


TRI_INC_BATCHES = 3


def _q_triangles_incremental(sf_dir: str):
    """Dynamic triangle counting over the temporal protocol: base graph
    = 90% prefix of the ordered mention log, then TRI_INC_BATCHES
    insertion batches; after each batch the total is maintained via
    batch-delta counting (T1/T2/T3 classes, analytics.
    triangle_count_incremental) — never a full rescan. The oracle
    recounts each stage's prefix graph from scratch in SQL, so a hash
    match proves the incremental path lands on the exact cold counts."""
    ctx, batches = api.build_graph(
        _fixture(sf_dir), num_parts=NUM_PARTS, temporal=True,
        num_batches=TRI_INC_BATCHES,
    )
    try:
        total, _ = A.triangle_count(ctx)
        rows = [(0, total)]
        empty = np.empty((2, 0), dtype=np.int64)
        for j, b in enumerate(batches, start=1):
            total = A.triangle_count_incremental(ctx, b, total)
            _, ins_t = ctx.tidy_batch(empty, b)
            ctx.apply_batch(empty, ins_t)
            rows.append((j, total))
    finally:
        ctx.shutdown()
    return pa.table({
        "stage": pa.array([r[0] for r in rows], pa.int64()),
        "triangles": pa.array([r[1] for r in rows], pa.int64()),
    })


def _q_connected_components(sf_dir: str):
    ctx = _graph(sf_dir)
    ds = A.connected_components(ctx)
    return _vid_to_conv(ctx, ds, "component", "component_id")


def _q_core_numbers(sf_dir: str):
    """k-core decomposition (core number per vertex) of the undirected
    view — distributed parallel peel; bulk simultaneous removal gives
    the same schedule-invariant core numbers as the sequential
    Batagelj-Zaversnik peel, which the SQL oracle replays as a
    recursive windowed edge-filter."""
    ctx = _graph(sf_dir)
    return A.core_numbers(ctx).select_columns(["conv_id", "core"])


JAC_MIN_COMMON = 2
JAC_TOP = 100


def _q_neighborhood_jaccard(sf_dir: str):
    """Top-100 link-prediction pairs by neighborhood Jaccard; scores
    are exact integers (c·10^6)//(da+db-c) so ordering and the top cut
    cannot drift between engines (vid order == conv_id lex order, so
    the SQL tie-breaks agree)."""
    ctx = _graph(sf_dir)
    ds = A.neighborhood_jaccard(ctx, min_common=JAC_MIN_COMMON, top=JAC_TOP)
    dict_ref = ray.put(ctx.dictionary)

    def f(t: pa.Table) -> pa.Table:
        d = ray.get(dict_ref)
        return pa.table({
            "a": pa.array(d[t["a"].to_numpy()]),
            "b": pa.array(d[t["b"].to_numpy()]),
            "common": t["common"], "jaccard_e6": t["jaccard_e6"],
        })

    return ds.map_batches(f, batch_format="pyarrow")


RA_TOP = 100


def _q_resource_allocation(sf_dir: str):
    """Top-100 link-prediction pairs by the resource-allocation index
    Σ_z 10^9 // deg(z) over common neighbors — exact integers via the
    weighted wedge combine (jac_reset ra_scale), conv_id-mapped like
    neighborhood_jaccard."""
    ctx = _graph(sf_dir)
    ds = A.resource_allocation(ctx, top=RA_TOP)
    dict_ref = ray.put(ctx.dictionary)

    def f(t: pa.Table) -> pa.Table:
        d = ray.get(dict_ref)
        return pa.table({
            "a": pa.array(d[t["a"].to_numpy()]),
            "b": pa.array(d[t["b"].to_numpy()]),
            "ra_e9": t["ra_e9"],
        })

    return ds.map_batches(f, batch_format="pyarrow")


RW_LEN = 8  # random-walk length (distinct from WALK_LEN=4 above — was shadowed in r2)
HARM_SEEDS = 8
HARM_MAXD = 12
HARM_LCM = 27720  # lcm(1..12)
SCC_SEEDS = 4


def _q_edge_support(sf_dir: str):
    """Per-edge triangle support (the static heart of k-truss): wedge
    combine reused from link prediction, per-shard edge lookup, zero
    extra exchange. Σ support = 3·triangles."""
    return A.edge_triangle_support(_graph(sf_dir))


KTRUSS_K = 3  # the sf0.01 fixture graph has a 3-truss core but no 4-truss
KTRUSS_ROUNDS = 8


def _q_ktruss(sf_dir: str):
    """3-truss subgraph: iterated support peel (shard-resident first
    round, join-free sorted-segment Ray Data rounds after), bounded at
    KTRUSS_ROUNDS — the SQL oracle unrolls the same bound so both sides
    agree even if the bound binds."""
    return A.ktruss_edges(_graph(sf_dir), k=KTRUSS_K, rounds=KTRUSS_ROUNDS)


def _q_sp_counts(sf_dir: str):
    """Brandes forward pass from the panel's first hash-elected seed:
    exact shortest-path counts σ(v) + hop distance per vertex — the
    integer-verifiable heart of betweenness centrality (the backward
    dependency sweep is float-reduction-ordered and is verified by the
    pytest brute-force oracle instead)."""
    ctx = _graph(sf_dir)
    src = int(A._elect_seeds(ctx, 1, 0)[0])
    return A.shortest_path_counts(ctx, src)


def _q_eccentricity_sample(sf_dir: str):
    """Per-seed eccentricity (max BFS hop distance, undirected view)
    for 4 hash-elected seeds — the diameter-lower-bound sampler."""
    return A.eccentricity_sample(_graph(sf_dir), num_seeds=SCC_SEEDS, seed=0)


def _q_scc_of_seeds(sf_dir: str):
    """SCC membership (forward ∩ backward directed reachability) for 4
    hash-elected seeds — the FW-BW carve step over the frontier
    machinery; two sweeps per seed, Dataset out."""
    return A.scc_of_seeds(_graph(sf_dir), num_seeds=SCC_SEEDS, seed=0)


def _q_harmonic_centrality(sf_dir: str):
    """Truncated harmonic centrality from 8 hash-chosen seeds; scores
    are exact integers Σ floor(27720/d), so the multi-source BFS
    oracle matches bit-for-bit with no float summation."""
    ctx = _graph(sf_dir)
    ds = A.harmonic_centrality(ctx, num_seeds=HARM_SEEDS, max_depth=HARM_MAXD, seed=0)
    return ds.select_columns(["conv_id", "harmonic"])


def _q_closeness_sample(sf_dir: str):
    """Sampled closeness sufficient statistics (reached-seed count +
    integer distance sum) over the same 8-seed panel as harmonic —
    pure-integer output, bit-exact vs the recursive BFS oracle."""
    ctx = _graph(sf_dir)
    ds = A.closeness_centrality(ctx, num_seeds=HARM_SEEDS, max_depth=HARM_MAXD, seed=0)
    return ds.select_columns(["conv_id", "n_reached", "sum_dist"])


def _q_random_walks(sf_dir: str):
    """One deterministic walk per vertex, 8 steps over the out-CSR;
    every (walk, step, position) row is a pure function of the hash
    protocol, so the SQL oracle replays identical paths through a
    rank-ordered adjacency."""
    ctx = _graph(sf_dir)
    ds = A.random_walks(ctx, length=RW_LEN, seed=0)
    dict_ref = ray.put(ctx.dictionary)

    def f(t: pa.Table) -> pa.Table:
        d = ray.get(dict_ref)
        return pa.table({
            "walk": pa.array(d[t["walk"].to_numpy()]),
            "step": t["step"],
            "conv_id": pa.array(d[t["vid"].to_numpy()]),
        })

    return ds.map_batches(f, batch_format="pyarrow")


KATZ_LEN = 4   # truncated-Katz levels (alpha = 1/KATZ_MUL, scaled by MUL^LEN)
KATZ_MUL = 4
CN_TOP = 100   # common-neighbors / Adamic-Adar top cut


def _map_pair_cols(ctx, ds: rd.Dataset, keep: list[str]) -> rd.Dataset:
    """Map (a, b) vid pair columns to conv_id strings via the broadcast
    dictionary, keeping ``keep`` score columns (vid order == conv_id lex
    order, so SQL tie-breaks agree) — the resource_allocation mapper."""
    dict_ref = ray.put(ctx.dictionary)

    def f(t: pa.Table) -> pa.Table:
        d = ray.get(dict_ref)
        cols = {"a": pa.array(d[t["a"].to_numpy()]),
                "b": pa.array(d[t["b"].to_numpy()])}
        for c in keep:
            cols[c] = t[c]
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def _q_katz_centrality(sf_dir: str):
    """Truncated Katz centrality, alpha = 1/4 pre-scaled by 4^4: exact
    int64 per-level damped accumulator (katz = Σ 4^(4-l)·walks_l), so
    the SQL oracle's unrolled weighted levels replay it bit-for-bit."""
    ctx = _graph(sf_dir)
    return A.katz_centrality(ctx, length=KATZ_LEN, mul=KATZ_MUL).select_columns(
        ["conv_id", "katz"])


def _q_common_neighbors(sf_dir: str):
    """Top-100 link-prediction pairs by raw common-neighbor count —
    the unweighted wedge combine, integer-deterministic cut."""
    ctx = _graph(sf_dir)
    return _map_pair_cols(ctx, A.common_neighbors(ctx, top=CN_TOP), ["common"])


def _q_adamic_adar(sf_dir: str):
    """Top-100 pairs by the Adamic-Adar index (log2-floor integer
    variant): Σ_z 10^9 // floor(log2(deg(z))) — exact ints, so the SQL
    replay and the cut cannot drift."""
    ctx = _graph(sf_dir)
    return _map_pair_cols(ctx, A.adamic_adar(ctx, top=CN_TOP), ["aa_e9"])


def _q_reciprocity(sf_dir: str):
    """Directed-edge reciprocity (self-loops excluded): one reversed-
    membership exchange, scalar fold, single integer row."""
    return A.reciprocity(_graph(sf_dir))


def _q_avg_neighbor_degree(sf_dir: str):
    """Degree-degree correlation profile: per symmetric-degree class,
    vertex count + exact total of neighbor degrees (one degree-fetch
    exchange + per-shard reduceat; rows ∝ distinct degrees)."""
    return A.avg_neighbor_degree(_graph(sf_dir))


def _q_graph_summary(sf_dir: str):
    """One-row structural profile (order, sizes, self-loops, max
    degrees, isolated count) — per-shard 7-int partials, scalar fold."""
    return A.graph_summary(_graph(sf_dir))


def _q_component_sizes(sf_dir: str):
    """Connected-component size histogram — the CC label Dataset
    reduced twice through Ray Data groupbys (label→size, size→count)."""
    return A.component_sizes(_graph(sf_dir))


def _q_cc_incremental(sf_dir: str):
    """Incremental CC hash-verified: cold CC on the base 80% of the
    ordered log, then each insertion batch applied and the components
    warm-restarted from just the batch endpoints
    (``connected_components_incremental``). The final labels must equal
    the full-graph CC oracle — warm merging is exact for insertions."""
    ctx, batches = api.build_graph(
        _fixture(sf_dir), num_parts=NUM_PARTS, temporal=True,
        base_fraction=0.8, batch_fraction=0.1, num_batches=2,
    )
    try:
        A.connected_components(ctx)
        empty = np.empty((2, 0), dtype=np.int64)
        ds = None
        for batch in batches:
            dels, ins = ctx.tidy_batch(empty, batch)
            ctx.apply_batch(dels, ins)
            ds = A.connected_components_incremental(ctx, ins)
        return _vid_to_conv(ctx, ds, "component", "component_id").materialize()
    finally:
        ctx.shutdown()


def _q_label_propagation(sf_dir: str):
    ctx = _graph(sf_dir)
    ds = A.label_propagation(ctx, max_iterations=10)
    return _vid_to_conv(ctx, ds, "label", "label_id")


def _q_two_hop(sf_dir: str):
    """2-hop neighborhood sizes via a PURE Ray-Data plan: one native
    Dataset.join of the symmetrized edge set with itself + a sorted-
    segment distinct count (no actor pool) — isolated vertices kept
    with 0 through a left_outer join against the vertex universe."""
    fx = _fixture(sf_dir)
    ts = E.read_transcripts(fx, columns=["conv_id", "turn_idx", "text", "tool", "ts"])
    edges = E.extract_edges(ts).select_columns(["src", "dst"])
    d = _graph(sf_dir).dictionary
    ids = rd.from_arrow(pa.table({"conv_id": pa.array(d)}))
    return A.two_hop_counts(edges, ids)


def _q_two_hop_capped(sf_dir: str):
    """Capped-exact 2-hop sizes (the power-law-graph posture): neighbor
    lists truncated to the 3 smallest neighbors per vertex, plus the
    honest ``truncated`` lower-bound flag — pipelines/analytics.py
    _cap_adjacency's two-phase prefix-filter combiner."""
    fx = _fixture(sf_dir)
    ts = E.read_transcripts(fx, columns=["conv_id", "turn_idx", "text", "tool", "ts"])
    edges = E.extract_edges(ts).select_columns(["src", "dst"])
    d = _graph(sf_dir).dictionary
    ids = rd.from_arrow(pa.table({"conv_id": pa.array(d)}))
    return A.two_hop_counts(edges, ids, cap=3)


def _q_lp_incremental(sf_dir: str):
    """Incremental label propagation, phase-exact: cold LP (10 rounds)
    on the base 90% of the ordered log, one insertion batch applied,
    then a warm LP restart (10 more rounds) over the updated graph.
    LP is not confluent, so the oracle replays the IDENTICAL two-phase
    schedule — base-graph rounds, then warm rounds on the full graph."""
    ctx, batches = api.build_graph(
        _fixture(sf_dir), num_parts=NUM_PARTS, temporal=True,
        base_fraction=0.9, batch_fraction=0.1, num_batches=1,
    )
    try:
        A.label_propagation(ctx, max_iterations=LP_ITERS)
        empty = np.empty((2, 0), dtype=np.int64)
        ds = None
        for batch in batches:
            dels, ins = ctx.tidy_batch(empty, batch)
            ctx.apply_batch(dels, ins)
            ds = A.label_propagation_incremental(ctx, max_iterations=LP_ITERS)
        return _vid_to_conv(ctx, ds, "label", "label_id").materialize()
    finally:
        ctx.shutdown()


def _q_community_graph(sf_dir: str):
    """Graph contraction (coarsening): collapse LP communities into a
    weighted community->community quotient graph — undirected distinct
    vertex pairs labeled via two NATIVE hash joins against the LP label
    Dataset (the 100 TB shape: edges never leave the cluster, labels
    join by hash, contraction is a grouped count), community ids
    decoded to conv strings at the end (min-vid == least conv_id)."""
    ctx = _graph(sf_dir)
    lab = (A.label_propagation(ctx, max_iterations=10)
           .select_columns(["vid", "label"]))
    # per-process export dir: a fixed path races when two sessions run
    # this query concurrently (export unlinks part files mid-read)
    out_dir = os.path.join(
        f"/tmp/graft_export_cg_{os.getpid()}",
        os.path.basename(os.path.abspath(sf_dir)))
    ctx.export_edges_parquet(out_dir)

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        m = s != d
        return pa.table({"lo": pa.array(np.minimum(s[m], d[m])),
                         "hi": pa.array(np.maximum(s[m], d[m]))})

    und = (rd.read_parquet(out_dir).map_batches(canon, batch_format="pyarrow")
           .groupby(["lo", "hi"]).count().drop_columns(["count()"]))
    la = lab.map_batches(lambda t: t.rename_columns(["vid", "la"]),
                         batch_format="pyarrow")
    lb = lab.map_batches(lambda t: t.rename_columns(["vid", "lb"]),
                         batch_format="pyarrow")
    j = (und.join(la, "inner", 8, on=("lo",), right_on=("vid",))
         .join(lb, "inner", 8, on=("hi",), right_on=("vid",)))

    def pair(t: pa.Table) -> pa.Table:
        a = t["la"].to_numpy()
        b = t["lb"].to_numpy()
        return pa.table({"ca_v": pa.array(np.minimum(a, b)),
                         "cb_v": pa.array(np.maximum(a, b)),
                         "weight": pa.array(np.ones(len(a), dtype=np.int64))})

    g = (j.map_batches(pair, batch_format="pyarrow")
         .groupby(["ca_v", "cb_v"]).sum("weight"))
    dict_ref = ray.put(ctx.dictionary)

    def decode(t: pa.Table) -> pa.Table:
        d = ray.get(dict_ref)
        return pa.table({"ca": pa.array(d[t["ca_v"].to_numpy()]),
                         "cb": pa.array(d[t["cb_v"].to_numpy()]),
                         "weight": pa.array(t["sum(weight)"].to_numpy())})

    return g.map_batches(decode, batch_format="pyarrow")


# ----------------------------------------------------------------------
# relational-family queries (TPC-H-ish driver tables)
# ----------------------------------------------------------------------

def _q_lineitem_agg(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _tbl(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    agg = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Count(),
        Sum("l_quantity"),
        Min("l_extendedprice"),
        Max("l_extendedprice"),
    )
    return _rename(
        agg,
        {
            "count()": "n_rows",
            "sum(l_quantity)": "sum_qty",
            "min(l_extendedprice)": "min_price",
            "max(l_extendedprice)": "max_price",
        },
    )


def _q_top_customers(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _tbl(sf_dir, "orders", ["o_custkey"])
    agg = _rename(ds.groupby("o_custkey").aggregate(Count()), {"count()": "n_orders"})
    return agg.sort(["n_orders", "o_custkey"], descending=[True, False]).limit(10)


def _q_distinct_flags(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _tbl(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    return (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count())
        .select_columns(["l_returnflag", "l_linestatus"])
    )


def _q_events_summary(sf_dir: str):
    ds = _tbl(sf_dir, "events", ["event_type", "user_id", "value"])

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_events": np.array([len(g)], dtype=np.int64),
                "n_users": np.array([g["user_id"].nunique()], dtype=np.int64),
                "min_value": [g["value"].min()],
                "max_value": [g["value"].max()],
            }
        )

    return ds.groupby("event_type").map_groups(summarize, batch_format="pandas")


def _q_anti_join_users(sf_dir: str):
    """Users with a high-value purchase and no high-value error — the
    broadcast anti-join pattern (small side via ray.put, per-batch is_in
    instead of a shuffle join; SURVEY.md §2.6 set-difference)."""
    ds = _tbl(sf_dir, "events", ["user_id", "event_type", "value"])

    def high(t: pa.Table, etype: str) -> pa.Table:
        m = pc.and_(pc.equal(t["event_type"], etype), pc.greater(t["value"], 100.0))
        return t.filter(m).select(["user_id"])

    err_users = np.sort(
        np.unique(
            ds.map_batches(lambda t: high(t, "error"), batch_format="pyarrow")
            .to_pandas()["user_id"]
            .to_numpy()
        )
    )
    eref = ray.put(err_users)

    def f(t: pa.Table) -> pa.Table:
        u = high(t, "purchase")["user_id"].to_numpy()
        u = np.unique(u[~np.isin(u, ray.get(eref))])
        return pa.table({"user_id": pa.array(u, pa.int64())})

    pdf = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    u = np.unique(pdf["user_id"].to_numpy()) if len(pdf) else np.empty(0, np.int64)
    return pa.table({"user_id": pa.array(u, pa.int64())})


def _q_orders_by_segment(sf_dir: str):
    cust = _tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    cust = cust.sort_values("c_custkey")
    # broadcast the small side as sorted arrays; lookups are vectorized
    # np.searchsorted (no per-row Python dict access)
    seg_ref = ray.put(
        (cust["c_custkey"].to_numpy(), cust["c_mktsegment"].to_numpy(dtype="U"))
    )
    ds = _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def annotate(t: pa.Table) -> pa.Table:
        keys, segs = ray.get(seg_ref)
        s = segs[np.searchsorted(keys, t["o_custkey"].to_numpy())]
        return pa.table({"segment": pa.array(s), "o_totalprice": t["o_totalprice"]})

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "segment": [g["segment"].iloc[0]],
                "n_orders": np.array([len(g)], dtype=np.int64),
                "min_price": [g["o_totalprice"].min()],
                "max_price": [g["o_totalprice"].max()],
            }
        )

    return (
        ds.map_batches(annotate, batch_format="pyarrow")
        .groupby("segment")
        .map_groups(summarize, batch_format="pandas")
    )


def _q_revenue_by_nation(sf_dir: str):
    """TPC-H Q5-style multi-join rollup — the engine's join taxonomy in
    one query: a BIG-BIG distributed hash join (lineitem x orders on
    orderkey via ``Dataset.join``), broadcast dimension lookups
    (customer/nation/region shipped ONCE via ray.put, probed with
    vectorized searchsorted inside map_batches — at true scale customer
    graduates to a second hash join, the dims stay broadcast), and
    per-batch partial aggregation before a tiny final groupby (shuffle
    rows ∝ nations × blocks, not lineitems). Revenue is exact integer
    1e-4 dollars (prices are exact cents, discounts exact hundredths:
    px_cents * (100 - disc_pct)), so the sum is order-insensitive and
    hashes bit-equal to the SQL oracle."""
    from ray.data.aggregate import Sum

    li = _tbl(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _tbl(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas().sort_values("c_custkey")
    nat = _tbl(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas().sort_values("n_nationkey")
    reg = _tbl(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkey = int(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    dim_ref = ray.put((
        cust["c_custkey"].to_numpy(), cust["c_nationkey"].to_numpy(),
        nat["n_nationkey"].to_numpy(), nat["n_name"].to_numpy(dtype="U"),
        nat["n_regionkey"].to_numpy(),
    ))
    joined = li.join(
        orders, "inner", 8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def partial(t: pa.Table) -> pa.Table:
        ck, cn, nk, nname, nreg = ray.get(dim_ref)
        ni = np.searchsorted(nk, cn[np.searchsorted(ck, t["o_custkey"].to_numpy())])
        px = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        keep = nreg[ni] == rkey
        ni, rev = ni[keep], (px * (100 - disc))[keep]
        uniq, inv = np.unique(ni, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, rev)  # exact int64 segment sums
        return pa.table({
            "n_name": pa.array(nname[uniq].tolist(), pa.string()),
            "revenue_e4": pa.array(sums, pa.int64()),
        })

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("revenue_e4"))
    )
    return _rename(agg, {"sum(revenue_e4)": "revenue_e4"}).sort("n_name")


def _q_orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP(segment, year): the per-batch combiner pre-
    aggregates each batch at ALL THREE rollup levels (replication at
    the combiner, the hopping-window trick), so ONE small shuffle over
    the ~(segments × years × 3) group universe finishes every level.
    NULL rollup slots use sentinels ('ALL', -1) so the hash gate's
    columns stay non-null; prices quantized to exact integer cents."""
    from ray.data.aggregate import Sum

    cust = _tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    cust = cust.sort_values("c_custkey")
    seg_ref = ray.put(
        (cust["c_custkey"].to_numpy(), cust["c_mktsegment"].to_numpy(dtype="U"))
    )
    ds = _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        keys, segs = ray.get(seg_ref)
        seg = segs[np.searchsorted(keys, t["o_custkey"].to_numpy())]
        yr = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        pc_ = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        n = len(seg)
        df = pd.DataFrame({
            "segment": np.concatenate([seg, seg, np.full(n, "ALL", dtype="U8")]),
            "yr": np.concatenate([yr, np.full(n, -1, np.int64),
                                  np.full(n, -1, np.int64)]),
            "n": np.ones(3 * n, dtype=np.int64),
            "p": np.concatenate([pc_, pc_, pc_]),
        })
        g = df.groupby(["segment", "yr"], as_index=False, sort=False).agg(
            n=("n", "sum"), p=("p", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["segment", "yr"]).aggregate(Sum("n"), Sum("p")))
    return _rename(agg, {"sum(n)": "n_orders", "sum(p)": "sum_price_c"})


def _q_orders_cube(sf_dir: str):
    """GROUP BY CUBE(segment, year): orders_rollup's combiner-level
    replication with the fourth grouping set (ALL, yr) — all four
    levels finish in ONE small shuffle."""
    from ray.data.aggregate import Sum

    cust = _tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    cust = cust.sort_values("c_custkey")
    seg_ref = ray.put(
        (cust["c_custkey"].to_numpy(), cust["c_mktsegment"].to_numpy(dtype="U"))
    )
    ds = _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        keys, segs = ray.get(seg_ref)
        seg = segs[np.searchsorted(keys, t["o_custkey"].to_numpy())]
        yr = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        pc_ = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        n = len(seg)
        alls = np.full(n, "ALL", dtype="U8")
        m1 = np.full(n, -1, np.int64)
        df = pd.DataFrame({
            "segment": np.concatenate([seg, seg, alls, alls]),
            "yr": np.concatenate([yr, m1, yr, m1]),
            "n": np.ones(4 * n, dtype=np.int64),
            "p": np.concatenate([pc_, pc_, pc_, pc_]),
        })
        g = df.groupby(["segment", "yr"], as_index=False, sort=False).agg(
            n=("n", "sum"), p=("p", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["segment", "yr"]).aggregate(Sum("n"), Sum("p")))
    return _rename(agg, {"sum(n)": "n_orders", "sum(p)": "sum_price_c"})


def _q_events_pivot(sf_dir: str):
    """Pivot event counts per user to wide columns (conditional
    aggregation): one-hot counts combined per batch, one Sum shuffle."""
    from ray.data.aggregate import Sum

    types = ["click", "error", "purchase", "signup", "view"]
    ds = _tbl(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy()})
        et = t["event_type"].to_numpy(zero_copy_only=False)
        for ty in types:
            df[f"n_{ty}"] = (et == ty).astype(np.int64)
        return pa.Table.from_pandas(
            df.groupby("user_id", as_index=False, sort=False).sum(),
            preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("user_id").aggregate(*[Sum(f"n_{ty}") for ty in types]))
    return _rename(agg, {f"sum(n_{ty})": f"n_{ty}" for ty in types})


def _q_supplier_region(sf_dir: str):
    """Broadcast dimension join (stages/relational.broadcast_join):
    nation⨝region (tiny) ships once via ray.put; the supplier side
    streams through map_batches with ZERO shuffle — the named scale
    pattern for dimension-table joins."""
    from pagerank_cuda_dynamic_ray.stages import relational as R

    sup = _tbl(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"])
    nat = _tbl(sf_dir, "nation").to_pandas()
    reg = _tbl(sf_dir, "region").to_pandas()
    dim = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    dim = dim.rename(columns={"n_nationkey": "s_nationkey"})[
        ["s_nationkey", "n_name", "r_name"]]
    out = R.broadcast_join(sup, dim, on="s_nationkey", how="inner")
    return out.select_columns(["s_suppkey", "s_name", "n_name", "r_name"])


def _q_salted_event_counts(sf_dir: str):
    """Two-phase salted groupby (stages/relational.salted_groupby_count)
    over the 5-hot-key event_type column — explicit skew handling for
    the reduce fan-in; result is the plain grouped count."""
    from pagerank_cuda_dynamic_ray.stages import relational as R

    ev = _tbl(sf_dir, "events", columns=["event_type"])
    return R.salted_groupby_count(ev, "event_type", salt=8)


FUNNEL_STAGES = ["signup", "click", "purchase"]


def _q_funnel_events(sf_dir: str):
    """Ordered funnel (stages/temporal.funnel): first signup, first
    click strictly after it, first purchase strictly after that —
    greedy min-time semantics, -1 for missing, pure-integer output."""
    from pagerank_cuda_dynamic_ray.stages import temporal as TP

    ev = _tbl(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    return TP.funnel(ev, FUNNEL_STAGES)


def _q_label_centroids(sf_dir: str):
    """Grouped embedding centroids (similarity.grouped_centroid_sums):
    exact-integer per-label component sums at the PCA quantization —
    the vector-pooling combiner; centroid = s/(n*scale) in rationals."""
    emb = _tbl(sf_dir, "embeddings", columns=["label", "embedding"])
    return S.grouped_centroid_sums(emb, "label")


# late cutoff so a meaningful cohort is H1-exclusive (40/150 churned at
# sf0.01) — the full-outer join's exclusive-row semantics get exercised
CHURN_CUTOFF = "2024-01-30T12:00:00"


def _q_user_churn(sf_dir: str):
    """Churn analysis via Ray's NATIVE hash full-outer join: per-user
    event counts in the two halves of the time range, full-outer
    joined so half-exclusive users surface as churned/new; nulls
    coalesced to 0 and a status column derived row-locally."""
    ev = _tbl(sf_dir, "events", columns=["user_id", "ts"])
    cut = np.datetime64(CHURN_CUTOFF, "us")

    def half_counts(name):
        def part(t: pa.Table) -> pa.Table:
            tsv = t["ts"].to_numpy()
            keep = tsv < cut if name == "n_h1" else tsv >= cut
            u, c = np.unique(t["user_id"].to_numpy()[keep], return_counts=True)
            return pa.table({"user_id": pa.array(u.astype(np.int64)),
                             name: pa.array(c.astype(np.int64))})
        return (ev.map_batches(part, batch_format="pyarrow")
                .groupby("user_id").sum(name)
                .map_batches(lambda t, n=name: t.rename_columns(["user_id", n]),
                             batch_format="pyarrow"))

    j = half_counts("n_h1").join(half_counts("n_h2"), "full_outer", 8,
                                 on=("user_id",))

    def fin(df_: pd.DataFrame) -> pd.DataFrame:
        h1 = df_["n_h1"].fillna(0).astype(np.int64)
        h2 = df_["n_h2"].fillna(0).astype(np.int64)
        status = np.where(h1 > 0, np.where(h2 > 0, "retained", "churned"), "new")
        return pd.DataFrame({"user_id": df_["user_id"].astype(np.int64),
                             "n_h1": h1, "n_h2": h2, "status": status})

    return j.map_batches(fin, batch_format="pandas")


PROFILE_INT = ["l_orderkey", "l_partkey", "l_suppkey"]
PROFILE_FLOAT = ["l_quantity", "l_extendedprice", "l_discount"]
PROFILE_STR = ["l_returnflag", "l_linestatus"]


def _q_copurchase_pairs(sf_dir: str):
    """Bipartite projection (relational.copair_counts): customers
    ranked by how many distinct parts they co-purchased — native hash
    join to (part, customer), sorted-segment pair emission with
    O(blocks·run) boundary fix-up, one (a,b) merge. Top-100 cut
    deterministic by (shared desc, a, b)."""
    from pagerank_cuda_dynamic_ray.stages import relational as R

    li = _tbl(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    od = _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j = li.join(od, "inner", 8, on=("l_orderkey",), right_on=("o_orderkey",))
    return R.copair_counts(j, "l_partkey", "o_custkey", top=100)


def _q_copurchase_capped(sf_dir: str):
    """Capped-exact co-purchase (the power-law-group posture): every
    part's buyer set truncated to its 4 smallest customers before
    pairing, with the per-pair ``truncated`` lower-bound flag —
    relational.copair_counts(cap=4)."""
    from pagerank_cuda_dynamic_ray.stages import relational as R

    li = _tbl(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    od = _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j = li.join(od, "inner", 8, on=("l_orderkey",), right_on=("o_orderkey",))
    return R.copair_counts(j, "l_partkey", "o_custkey", top=100, cap=4)


def _q_lineitem_profile(sf_dir: str):
    """Data-profiling pass (relational.profile_table): per-column row
    count, null count, min, max over lineitem in ONE streaming scan —
    per-block per-column partials, tiny merge; floats as exact cents."""
    from pagerank_cuda_dynamic_ray.stages import relational as R

    li = _tbl(sf_dir, "lineitem", columns=PROFILE_INT + PROFILE_FLOAT + PROFILE_STR)
    return R.profile_table(li, PROFILE_INT, PROFILE_FLOAT, PROFILE_STR)


def _q_props_sum(sf_dir: str):
    """JSON-ish property extraction: pull the integer `k` out of the
    events.props JSON string with a compiled vectorized regex and sum
    per event_type — the schema-on-read pattern for semi-structured
    columns."""
    ev = _tbl(sf_dir, "events", columns=["event_type", "props"])

    def part(batch: pd.DataFrame) -> pa.Table:
        k = (batch["props"].str.extract(r'"k":\s*(\d+)', expand=False)
             .fillna(0).astype(np.int64))
        df_ = pd.DataFrame({"event_type": batch["event_type"], "k": k})
        g = df_.groupby("event_type", sort=True, as_index=False)["k"].agg(["sum", "count"])
        g.columns = ["event_type", "sum_k", "n"]
        return pa.Table.from_pandas(g, preserve_index=False)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "sum_k": t["sum(sum_k)"], "n": t["sum(n)"]})

    return (ev.map_batches(part, batch_format="pandas")
            .groupby("event_type").sum(["sum_k", "n"])
            .map_batches(fin, batch_format="pyarrow"))


def _q_value_stats_by_type(sf_dir: str):
    """Exact grouped mean/variance sufficient statistics (n, Σcents,
    Σcents²) — integer-exact, fold-order-free (relational.
    grouped_stats_cents)."""
    from pagerank_cuda_dynamic_ray.stages import relational as R

    ev = _tbl(sf_dir, "events", columns=["event_type", "value"])
    return R.grouped_stats_cents(ev, "event_type", "value")


def _q_distinct_users_by_type(sf_dir: str):
    """EXACT distinct users per event type (relational.
    distinct_count_by_key) — the sketch-free complement of
    hll_users_by_type; duplicate mass collapses in a per-block
    combiner before the pair dedup shuffle."""
    from pagerank_cuda_dynamic_ray.stages import relational as R

    ev = _tbl(sf_dir, "events", columns=["event_type", "user_id"])
    return R.distinct_count_by_key(ev, "event_type", "user_id")


def _q_events_unpivot(sf_dir: str):
    """Pivot -> UNPIVOT roundtrip: melt the wide per-user counts back
    to sparse long rows (stages/reshape.unpivot, a pure row-local
    map_batches — no shuffle beyond the pivot's own). Equals the plain
    grouped count, which is exactly what the oracle asserts."""
    from pagerank_cuda_dynamic_ray.stages import reshape as RS

    types = ["click", "error", "purchase", "signup", "view"]
    wide = _q_events_pivot(sf_dir)
    long = RS.unpivot(wide, ["user_id"], [f"n_{ty}" for ty in types],
                      var_name="event_type", value_name="n", drop_zero=True)

    def strip(df_: pd.DataFrame) -> pd.DataFrame:
        df_["event_type"] = df_["event_type"].str.removeprefix("n_")
        return df_

    return long.map_batches(strip, batch_format="pandas")


# ----------------------------------------------------------------------
# event-time operators (stages/temporal.py): tumbling windows, as-of
# join, interval-join aggregate, sessionization — custom operators Ray
# Data lacks natively, each one hash shuffle + vectorized kernels
# ----------------------------------------------------------------------

def _q_windowed_events(sf_dir: str):
    """Tumbling 1-day event-time windows per event_type (count + order-
    free min/max; partial combine inside map_batches, tiny merge)."""
    ds = _tbl(sf_dir, "events", ["ts", "event_type", "value"])
    return TP.windowed_aggregate(ds, ts="ts", key="event_type", value="value")


def _q_hopping_events(sf_dir: str):
    """Hopping (sliding) 1-day windows advancing every 6 h per event
    type: each event lands in 4 overlapping windows, replicated inside
    the per-batch combiner so the shuffle stays per-(window, key)."""
    ds = _tbl(sf_dir, "events", ["ts", "event_type", "value"])
    return TP.windowed_aggregate(ds, ts="ts", key="event_type", value="value",
                                 hop_us=6 * 3_600_000_000)


def _event_sides(sf_dir: str):
    ds = _tbl(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    return (ds.filter(expr="event_type == 'purchase'"),
            ds.filter(expr="event_type == 'click'"))


def _q_asof_purchase_click(sf_dir: str):
    """As-of join: each purchase matched to the same user's latest
    click at-or-before it (ties: max click event_id), inner."""
    p, c = _event_sides(sf_dir)
    out = TP.asof_join(
        p, c, key="user_id", ts="ts", lcols=["event_id"],
        rcols=["event_id", "ts"], right_tiebreak="event_id",
    )

    def finish(t: pa.Table) -> pa.Table:
        gap = pc.subtract(pc.cast(t["ts"], pa.int64()),
                          pc.cast(t["r__ts"], pa.int64()))
        return pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"], "ts": t["ts"],
            "click_id": t["r__event_id"], "click_ts": t["r__ts"],
            "gap_us": gap,
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _q_attribution_window(sf_dir: str):
    """Interval (range) join reduced at the join site: per purchase,
    the count of the user's clicks in the inclusive hour before it."""
    p, c = _event_sides(sf_dir)
    out = TP.interval_join_agg(
        p, c, key="user_id", ts="ts", lcols=["event_id"],
        lo_offset_us=-3_600_000_000, hi_offset_us=0,
    )
    return out.map_batches(
        lambda t: pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                            "n_clicks": t["n_matches"]}),
        batch_format="pyarrow",
    )


def _q_rolling_sum(sf_dir: str):
    """Per-user rolling window sum (SQL ROWS BETWEEN 3 PRECEDING AND
    CURRENT ROW) — distributed sort + in-block cumsum-difference with an
    O(blocks × window) head/tail fix-up; values quantized to cents so
    the sums are exact integers."""
    ds = _tbl(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return TP.rolling_sum(ds, key="user_id", ts="ts", order2="event_id",
                          value="value", preceding=3)


def _q_running_total(sf_dir: str):
    """Per-user cumulative sum (ROWS UNBOUNDED PRECEDING): two passes
    over the distributed sort, carries O(blocks) driver-side, exact
    integer cents."""
    ds = _tbl(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return TP.running_total(ds, key="user_id", ts="ts", order2="event_id",
                            value="value")


def _q_event_gaps(sf_dir: str):
    """Per-user gap to the previous event in exact integer µs (LAG
    diff; -1 for each user's first event)."""
    ds = _tbl(sf_dir, "events", ["event_id", "ts", "user_id"])
    return TP.lag_gap(ds, key="user_id", ts="ts", order2="event_id")


def _q_sessions(sf_dir: str):
    """Gap-based sessionization (30-min inactivity) of each user's
    event stream; per-session start/end/count rows."""
    ds = _tbl(sf_dir, "events", ["event_id", "user_id", "ts"])
    return TP.sessionize(ds, key="user_id", ts="ts", tiebreak="event_id")


# ----------------------------------------------------------------------
# training-data-family queries (documents / embeddings)
# ----------------------------------------------------------------------

def _q_pii_scrub(sf_dir: str):
    """PII redaction over documents. The synthetic corpus carries no
    natural PII, so the query first INJECTS deterministic doc_id-derived
    emails / phones / IPs (replicated verbatim in the SQL oracle), then
    scrubs — the driver hash-compares counts AND the full cleaned text."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "text"])

    def inject(df):
        did = df["doc_id"].to_numpy(np.int64)
        s = df["text"].fillna("") + " contact u" + df["doc_id"].astype(str) + "@ex.com"
        s = s.where(did % 3 != 0,
                    s + " call 555-010-" + pd.Series(did % 10000, index=df.index)
                    .astype(str).str.zfill(4))
        s = s.where(did % 5 != 0,
                    s + " host 10.0." + pd.Series(did % 256, index=df.index).astype(str)
                    + "." + pd.Series(did // 256 % 256, index=df.index).astype(str))
        return pd.DataFrame({"doc_id": did, "text": s.to_numpy()})

    return TS.scrub_pii(docs.map_batches(inject, batch_format="pandas"))


def _q_exact_dedup(sf_dir: str):
    return D.exact_dedup(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _q_doc_tokens(sf_dir: str):
    return _analyzed_docs(sf_dir, False).select_columns(
        ["doc_id", "n_chars", "n_tokens_ws", "n_tokens_bpe"])


def _q_doc_lang(sf_dir: str):
    return _analyzed_docs(sf_dir, False).select_columns(["doc_id", "lang"])


def _q_doc_quality(sf_dir: str):
    return _analyzed_docs(sf_dir, False).select_columns(
        ["doc_id", "punct_ratio", "upper_ratio", "stop_ratio", "quality"])


def _q_quality_filter(sf_dir: str):
    """The chained training-data filter stage: score documents
    (quality/tokens/lang, fingerprint skipped) and keep quality >= 0.2
    with >= 5 tokens — float threshold compare is exact because the
    score itself is hash-verified bitwise (see doc_quality)."""
    out = TS.quality_filter(_tbl(sf_dir, "documents", ["doc_id", "text"]),
                            min_quality=0.2, min_tokens=5)
    return out.select_columns(["doc_id", "n_tokens_ws", "quality", "lang"])


def _q_curation_pipeline(sf_dir: str):
    """End-to-end training-data curation chain, the composite a real
    user runs: quality filter -> text semi-join (hash Dataset.join) ->
    exact dedup (keep min-id representative per distinct text) ->
    deterministic hash split -> per-(split, lang) rollup with source-doc
    mass. Every stage is the already-verified library operator; the SQL
    oracle replays the identical chain end-to-end."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "text"])
    kept = TS.quality_filter(docs, min_quality=0.2, min_tokens=5) \
        .select_columns(["doc_id", "lang"])
    kd = docs.join(kept, "inner", NUM_PARTS, on=("doc_id",))
    reps = D.exact_dedup(kd)
    reps_lang = reps.join(kept, "inner", NUM_PARTS, on=("doc_id",))
    sp = SP.hash_split(reps_lang, SPLIT_WEIGHTS, seed=0)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["split", "lang"], sort=False)
             .agg(n_docs=("doc_id", "size"), n_source_docs=("n_dups", "sum"))
             .reset_index())
        g["n_docs"] = g["n_docs"].astype(np.int64)
        g["n_source_docs"] = g["n_source_docs"].astype(np.int64)
        g["__gk"] = g["split"] + "|" + g["lang"]
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "split": [g["split"].iloc[0]], "lang": [g["lang"].iloc[0]],
            "n_docs": np.array([g["n_docs"].sum()], np.int64),
            "n_source_docs": np.array([g["n_source_docs"].sum()], np.int64),
        })

    return (sp.map_batches(partial, batch_format="pandas")
            .groupby("__gk").map_groups(merge, batch_format="pandas"))


def _q_doc_fingerprint(sf_dir: str):
    return _analyzed_docs(sf_dir, True).select_columns(["doc_id", "fingerprint"])


# corpus-preparation family (stages/corpus.py): chunking, packing,
# BM25-lite scoring, contamination screen, prefix-dup grouping
CHUNK_SIZE, CHUNK_STRIDE = 32, 24
PACK_BUDGET = 256
BM25_TERMS = ["table", "window", "merge", "stream", "vector"]
BM25_K1, BM25_B = 1.2, 0.75
CONTAM_MOD, CONTAM_K = 20, 5
PREFIX_K = 8


def _q_doc_chunks(sf_dir: str):
    """Fixed-size token windows with overlap (context-window
    pre-chunking) — row-local, shuffle-free; chunk text re-joined with
    single spaces so the SQL list-slice replay is byte-identical."""
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return CO.chunk_documents(docs, CHUNK_SIZE, CHUNK_STRIDE)


def _q_pack_bins(sf_dir: str):
    """Contiguous token-budget sequence packing = exclusive global
    running sum // budget, via the O(blocks) carry contract."""
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return CO.pack_token_bins(docs, PACK_BUDGET)


def _q_bm25_scores(sf_dir: str):
    """BM25-lite (rational idf, per-term 1e-6 quantization before the
    integer sum) against a fixed query term set; corpus stats folded
    as O(blocks×terms) scalars and broadcast."""
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return CO.bm25_scores(docs, BM25_TERMS, BM25_K1, BM25_B)


def _q_contamination(sf_dir: str):
    """Benchmark-contamination screen: distinct word 5-grams of each
    non-benchmark doc intersected with the broadcast benchmark
    (doc_id % 20 == 0) shingle set — no shuffle on the corpus side."""
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return CO.contamination_screen(docs, CONTAM_MOD, CONTAM_K)


def _q_prefix_dups(sf_dir: str):
    """First-8-token prefix duplicate groups (boilerplate detector) via
    the exact_dedup 128-bit-hash sort — one row per distinct prefix."""
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return CO.prefix_dup_groups(docs, PREFIX_K)


# deterministic sampling family (stages/sampling.py): every operator
# keys on splitmix64(doc_id + seed*2^60), so the SQL oracle replays the
# exact membership through the emulated splitmix chain
SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
STRAT_RATES = {"en": 1.0, "de": 0.5, "fr": 0.25}
STRAT_DEFAULT = 0.1
PER_KEY_K = 50
VOCAB_TOP = 100
INVIDX_K = 32
PMI_WINDOW = 4
PMI_TOPK = 50


def _q_cooccurrence_pmi(sf_dir: str):
    """Top-k co-occurring token pairs (window ≤ 4 positions apart) with
    the integer sufficient statistics that fully determine PMI (pair
    count, unigram counts, corpus totals). The float pmi_e6 column is
    kept OUT of the hash gate — ln/round are not bit-portable across
    libm builds; any engine derives the identical coefficient from the
    verified integers. Pure-integer winner selection; driver touches
    O(k) rows only."""
    t = SP.cooccurrence_pmi(_tbl(sf_dir, "documents", ["doc_id", "text"]),
                            window=PMI_WINDOW, top_k=PMI_TOPK)
    return t.select(["pair", "n", "c_a", "c_b", "t_u", "t_p"])


def _q_inverted_index(sf_dir: str):
    """Capped inverted index over documents: per token, document
    frequency + the 32 smallest doc ids (CSV) — per-block smallest-k
    combiner, merge groups bounded by block count."""
    return SP.inverted_index(_tbl(sf_dir, "documents", ["doc_id", "text"]), k=INVIDX_K)


def _q_hash_split(sf_dir: str):
    docs = _tbl(sf_dir, "documents", columns=["doc_id"])
    return SP.hash_split(docs, SPLIT_WEIGHTS, seed=0).select_columns(["doc_id", "split"])


def _q_stratified_sample(sf_dir: str):
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "lang"])
    return SP.stratified_sample(
        docs, STRAT_RATES, seed=1, default_rate=STRAT_DEFAULT
    ).select_columns(["doc_id", "lang"])


def _q_sample_per_key(sf_dir: str):
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "lang"])
    return SP.sample_per_key(docs, PER_KEY_K, seed=2).select_columns(["doc_id", "lang"])


TEMP_ALPHA = 0.5


def _q_temperature_resample(sf_dir: str):
    """Temperature-flattening language resample (stages/sampling.py):
    per-key keep rate (c_min/c_key)^(1-alpha) realized as a pure
    deterministic hash filter after a distinct-key-sized count pass —
    the multilingual head-downsampler."""
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "lang"])
    return SP.temperature_resample(
        docs, alpha=TEMP_ALPHA, seed=7).select_columns(["doc_id", "lang"])


def _q_exact_dedup_norm(sf_dir: str):
    """Exact dedup after canonical normalization (lowercase, strip
    non-alphanumerics, collapse whitespace) — stages/dedup.py
    normalized_exact_dedup, reusing the 24 B/row hash sort."""
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return D.normalized_exact_dedup(docs)


TOPK_PER_USER = 3


def _q_topk_events_per_user(sf_dir: str):
    """Windowed top-k per group: the 3 highest-value events per user
    (ties by event_id) via the two-phase per-block partial top-k."""
    ev = _tbl(sf_dir, "events", columns=["event_id", "user_id", "value"])
    return SP.topk_per_key(ev, TOPK_PER_USER, "user_id", "value", "event_id")


def _q_mode_per_user(sf_dir: str):
    """Grouped mode: each user's most frequent event_type (+ count),
    ties to the lexicographically smallest type."""
    ev = _tbl(sf_dir, "events", columns=["user_id", "event_type"])
    return SP.mode_per_key(ev, "user_id", "event_type")


def _q_vocabulary(sf_dir: str):
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return SP.vocabulary(docs, top_n=VOCAB_TOP)


TFIDF_K = 5
QUANTILES = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p90": 0.9, "p99": 0.99}


HH_K = 100


def _q_heavy_hitter_tokens(sf_dir: str):
    """Exact ε-heavy-hitter tokens (count strictly above n_tokens/HH_K)
    via sharded candidate generation (per-block pigeonhole survivors,
    bounded blocks×k exchange) + an exact distributed verify pass —
    stages/sketch.heavy_hitter_tokens. Unlike vocabulary's full
    distinct-token groupby, nothing corpus-vocabulary-scale is ever
    shuffled; the oracle is the brute-force GROUP BY ... HAVING."""
    docs = _tbl(sf_dir, "documents", ["text"])
    return SK.heavy_hitter_tokens(docs, k=HH_K)


def _q_hll_distinct(sf_dir: str):
    """Deterministic HyperLogLog (p=12, splitmix64 stream) distinct
    counts for events.event_id and events.user_id — the estimate AND
    two integer register digests are hash-verified against a SQL
    replay of the identical sketch (not against exact counts)."""
    ev = _tbl(sf_dir, "events", columns=["event_id", "user_id"])
    rows = []
    for col, seed in (("event_id", 0), ("user_id", 1)):
        rows.append({"col": col, **SK.hll_distinct(ev, col, p=12, seed=seed)})
    return pa.table({
        "col": pa.array([r["col"] for r in rows]),
        "distinct_est": pa.array([r["distinct_est"] for r in rows], type=pa.int64()),
        "n_zero_regs": pa.array([r["n_zero_regs"] for r in rows], type=pa.int64()),
        "reg_sum_rho": pa.array([r["reg_sum_rho"] for r in rows], type=pa.int64()),
    })


def _q_hll_users_by_type(sf_dir: str):
    """GROUPED HLL: one distinct-user sketch per event_type — the
    per-segment cardinality query at sketch cost (per-block per-key
    register combiner, per-key map_groups estimate; no exact distinct
    shuffle). seed=1 = the hash stream already verified for user_id by
    hll_distinct, so the two sketches are mutually consistent."""
    ev = _tbl(sf_dir, "events", columns=["event_type", "user_id"])
    return SK.hll_distinct_by_key(ev, "event_type", "user_id", p=12, seed=1)


def _q_doc_ntile(sf_dir: str):
    """Exact global row_number + NTILE(10) over (n_chars, doc_id) —
    the distributed window-function pattern: O(distinct values)
    broadcast offset table + one value-keyed shuffle; numbering never
    runs through a single sequential pass."""
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return SP.global_rank_ntile(docs, "n_chars", "doc_id", tiles=10)


VQ_LO, VQ_HI, VQ_BINS = 0.0, 200.0, 1000
VQ_QS = {"p50": 0.5, "p90": 0.9, "p99": 0.99, "p999": 0.999}


def _q_value_quantiles_binned(sf_dir: str):
    """Histogram-sketch quantiles for the UNBOUNDED double events.value
    (the deterministic t-digest stand-in): fixed-width bins, per-block
    bincount combiner, order-statistic read-off — error <= 1 bin."""
    ev = _tbl(sf_dir, "events", columns=["value"])
    return SK.binned_quantiles(ev, "value", VQ_QS, VQ_LO, VQ_HI, VQ_BINS)


def _q_doc_window_ranks(sf_dir: str):
    """The remaining global window functions over (n_chars, doc_id):
    dense_rank (searchsorted into the broadcast distinct-value table —
    O(distinct) state) and percent_rank as the exact integer
    ((rn-1)·1e9)//(N-1), riding global_rank_ntile's row numbers."""
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "n_chars"])
    ranked = SP.global_rank_ntile(docs, "n_chars", "doc_id", tiles=10)
    hist = (ranked.map_batches(
                lambda t: pa.table({"value": pa.array(
                    np.unique(t["n_chars"].to_numpy()))}),
                batch_format="pyarrow")
            .groupby("value").count().to_pandas())
    values = np.sort(hist["value"].to_numpy(np.int64))
    n_total = docs.count()
    vref = ray.put(values)

    def fin(t: pa.Table) -> pa.Table:
        vals = ray.get(vref)
        rn = t["rn"].to_numpy()
        dr = np.searchsorted(vals, t["n_chars"].to_numpy()) + 1
        pr = (rn - 1) * np.int64(1_000_000_000) // max(n_total - 1, 1)
        return pa.table({"doc_id": t["doc_id"], "rn": t["rn"],
                         "dense_rank": pa.array(dr.astype(np.int64)),
                         "pr_e9": pa.array(pr.astype(np.int64))})

    return ranked.map_batches(fin, batch_format="pyarrow")


def _q_doc_len_quantiles(sf_dir: str):
    docs = _tbl(sf_dir, "documents", columns=["n_chars"])
    return SK.exact_quantiles_hist(docs, "n_chars", QUANTILES)


def _q_len_quantiles_by_lang(sf_dir: str):
    """Exact per-language n_chars quantiles (zero-indexed order
    statistic floor((n-1)q)) — distributed histogram, per-key read-off."""
    docs = _tbl(sf_dir, "documents", columns=["lang", "n_chars"])
    return SK.grouped_quantiles_hist(docs, "lang", "n_chars", QUANTILES)


CM_DEPTH, CM_WIDTH, CM_SEED = 4, 1024, 3
BLOOM_BITS, BLOOM_K, BLOOM_SEED = 1 << 16, 4, 7


def _q_countmin_user_counts(sf_dir: str):
    """Count-Min per-user event-count estimates (min over 4 rows of
    1024 counters) for every distinct user — integers, exactly
    replayable in SQL from the identical register layout."""
    ev = _tbl(sf_dir, "events", columns=["user_id"])
    regs = SK.countmin_registers(ev, "user_id", CM_DEPTH, CM_WIDTH, CM_SEED)
    users = np.sort(ev.to_pandas()["user_id"].unique())
    est = SK.countmin_query(regs, users, CM_SEED)
    return pa.table({"user_id": pa.array(users.astype(np.int64)),
                     "cm_count": pa.array(est)})


def _q_bloom_semi(sf_dir: str):
    """Bloom semi-join pruning: a filter built over BUILDING-segment
    customer keys prunes the orders stream before a join. Output pins
    the whole bitmap: total probes, bloom-kept rows (includes false
    positives) and the exact semi-join count."""
    cust = _tbl(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).filter(
        lambda r: r["c_mktsegment"] == "BUILDING"
    )
    orders = _tbl(sf_dir, "orders", columns=["o_custkey"])
    bm = SK.bloom_build(cust, "c_custkey", BLOOM_BITS, BLOOM_K, BLOOM_SEED)
    kept = SK.bloom_probe(orders, "o_custkey", bm, BLOOM_BITS, BLOOM_K, BLOOM_SEED)
    keys = np.sort(cust.to_pandas()["c_custkey"].unique())
    key_ref = ray.put(keys)

    def exact(t: pa.Table) -> pa.Table:
        k = ray.get(key_ref)
        n = int(np.isin(t["o_custkey"].to_numpy(), k).sum())
        return pa.table({"n": pa.array([n], type=pa.int64())})

    n_exact = int(orders.map_batches(exact, batch_format="pyarrow").to_pandas()["n"].sum())
    return pa.table({
        "n_input": pa.array([orders.count()], type=pa.int64()),
        "n_kept": pa.array([kept.count()], type=pa.int64()),
        "n_exact": pa.array([n_exact], type=pa.int64()),
    })


def _q_tfidf_top_terms(sf_dir: str):
    """Top-5 tf·idf terms per document: explode -> df combiner groupby
    -> hash join on token -> per-doc top-k; scores 1e6-quantized so the
    selection and ordering are integer-exact vs the SQL oracle."""
    docs = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return SP.tfidf_top_terms(docs, k=TFIDF_K)


def _q_minhash_dedup(sf_dir: str):
    return D.minhash_dedup(_tbl(sf_dir, "documents", ["doc_id", "text"]), threshold=0.7)


def _q_ngram_jaccard(sf_dir: str):
    return D.ngram_jaccard_pairs(
        _tbl(sf_dir, "documents", ["doc_id", "text"]), threshold=0.7
    )


def _q_ngram_dup_profile(sf_dir: str):
    """Exact n-gram duplication profile (doc-level exact-substring
    dedup): distinct word-3-gram sets, sorted-segment shared-shingle
    counting with O(blocks) boundary accounting."""
    return D.ngram_exact_dedup(_tbl(sf_dir, "documents", ["doc_id", "text"]), k=3)


def _q_simhash_dedup(sf_dir: str):
    return D.simhash_dedup(_tbl(sf_dir, "documents", ["doc_id", "text"]), max_hamming=3)


def _q_embedding_neardup(sf_dir: str):
    # 0.45: the synthetic embeddings have no true near-dups (max off-diag
    # cosine ~0.51), so a lower threshold exercises the operator end-to-end.
    out = D.embedding_neardup_pairs(
        _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=0.45
    )
    return pa.table(
        {
            "a": pa.array(out["a"].to_numpy().astype(np.int64) if len(out) else [], pa.int64()),
            "b": pa.array(out["b"].to_numpy().astype(np.int64) if len(out) else [], pa.int64()),
        }
    )


def _q_embedding_neardup_lsh(sf_dir: str):
    out = D.embedding_neardup_lsh(
        _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=0.45, bands=6
    )
    return pa.table(
        {
            "a": pa.array(out["a"].to_numpy().astype(np.int64) if len(out) else [], pa.int64()),
            "b": pa.array(out["b"].to_numpy().astype(np.int64) if len(out) else [], pa.int64()),
        }
    )


def _knn_queries(sf_dir: str) -> pd.DataFrame:
    pdf = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    return pdf.sort_values("vec_id").head(5).reset_index(drop=True)


def _q_embedding_covariance(sf_dir: str):
    """Exact-integer covariance numerators of the embedding column
    (upper triangle): per-block (n, Σq, Σqqᵀ) combiner rows, Python-int
    driver fold — cov_num = n·C_ij − S_i·S_j is summation-order-free,
    the distributed stats base of the PCA stage."""
    return S.embedding_covariance(_tbl(sf_dir, "embeddings", ["vec_id", "embedding"]))


KMEANS_K = 8
KMEANS_ITERS = 4


def _q_kmeans_clusters(sf_dir: str):
    """Deterministic exact-int k-means over the embedding column
    (stages/clustering.py): fixed Lloyd rounds on integer-quantized
    coordinates with truncating centroid division, so the full
    assignment vector is hash-verifiable against an unrolled SQL
    replay."""
    return C.kmeans_assign(_tbl(sf_dir, "embeddings", ["vec_id", "embedding"]),
                           k=KMEANS_K, iters=KMEANS_ITERS)


def _q_knn_bruteforce(sf_dir: str):
    emb = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = S.knn_bruteforce(emb, _knn_queries(sf_dir), k=10)
    out = out[["query_id", "neighbor_id", "rank"]].rename(columns={"rank": "knn_rank"})
    return out.astype({"query_id": np.int64, "neighbor_id": np.int64, "knn_rank": np.int64})


def _q_knn_lsh(sf_dir: str):
    emb = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = S.knn_lsh(emb, _knn_queries(sf_dir), k=10, nbits=8, probes=2)
    out = out[["query_id", "neighbor_id", "rank"]].rename(columns={"rank": "knn_rank"})
    return out.astype({"query_id": np.int64, "neighbor_id": np.int64, "knn_rank": np.int64})


def _q_knn_ivf(sf_dir: str):
    emb = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = S.knn_ivf(emb, _knn_queries(sf_dir), k=10, n_centroids=16, nprobe=4)
    out = out[["query_id", "neighbor_id", "rank"]].rename(columns={"rank": "knn_rank"})
    return out.astype({"query_id": np.int64, "neighbor_id": np.int64, "knn_rank": np.int64})


def _q_multimodal_decode(sf_dir: str):
    """Decode-stage digest: media id/kind + four sampled feature values
    as plain double columns — the whole decode path (payload -> feature
    vector) exercised, in a shape DuckDB can recompute hash-exactly."""
    media = rd.from_arrow(MM.synth_media_table(256))
    ds = MM.decode_features(media, mode="fake", feature_dim=16)

    def digest(t: pa.Table) -> pa.Table:
        f = np.array(t["features"].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "f0": pa.array(f[:, 0]),
                "f5": pa.array(f[:, 5]),
                "f10": pa.array(f[:, 10]),
                "f15": pa.array(f[:, 15]),
            }
        )

    return ds.map_batches(digest, batch_format="pyarrow")


N_MEDIA_STATS = 64  # synth_real_media rows for the real-codec digest


def _q_media_stats(sf_dir: str):
    """Real-codec decode digest: exact-integer pixel/sample sums through
    the actual PPM/WAV parsers (every video frame decoded). The oracle
    re-derives the synthetic payload streams arithmetically (splitmix64
    emulation) without parsing a byte — a header mis-parse or offset bug
    in the decoders breaks the hash."""
    media = rd.from_arrow(MM.synth_real_media_table(N_MEDIA_STATS))
    return MM.media_stats(media)


def _q_image_resize(sf_dir: str):
    """Thumbnail digest: 2x block-mean resize through the real PPM
    codec, then the exact-integer stats digest over the RESIZED
    payloads — the oracle recomputes the block means arithmetically
    from the regenerated pixel stream (floor-div by 4), so both the
    resize math and the re-encode/re-decode round trip are pinned."""
    media = rd.from_arrow(MM.synth_real_media_table(N_MEDIA_STATS))
    imgs = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow")
    return MM.media_stats(MM.resize_images(imgs, factor=2))


AUDIO_WINDOW = 256


def _q_audio_energy(sf_dir: str):
    """Windowed audio energy (VAD precursor) through the real WAV
    decoder: per 256-sample window, the exact int64 Σ sample² — the
    oracle regenerates the sample stream and groups by j // 256."""
    media = rd.from_arrow(MM.synth_real_media_table(N_MEDIA_STATS))
    return MM.audio_energy_windows(media, AUDIO_WINDOW)


def _q_frame_diffs(sf_dir: str):
    """Scene-cut signal: exact Σ |pixel_f − pixel_{f−1}| per adjacent
    video frame pair through the real concatenated-PPM path; the
    oracle regenerates BOTH frames' pixel streams (two chained
    splitmix64 emulations per element) and sums the absolute diff."""
    media = rd.from_arrow(MM.synth_real_media_table(N_MEDIA_STATS))
    return MM.frame_diffs(media)


def _q_frame_sample(sf_dir: str):
    media = rd.from_arrow(MM.synth_media_table(256))
    return MM.sample_frames(media, every_k=10, mode="fake").select_columns(
        ["media_id", "frame_idx"]
    )


# ----------------------------------------------------------------------
# registry
# ----------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    # Order = driver-verification priority (the gate samples the
    # registry head): first the never-driver-checked r5 additions, then
    # the 41 entries whose latest green row is r02, then r03-last, then
    # r04-last — so CORRECTNESS_r05's first 50 re-verifies the stalest
    # cohort (VERDICT r4 #7).
    return {
        "pagerank_dynamic_deletions": _q_pagerank_dynamic_deletions,
        "pagerank_weighted_dynamic_deletions": _q_pagerank_weighted_dynamic_deletions,
        "heavy_hitter_tokens": _q_heavy_hitter_tokens,
        "degree_assortativity": _q_degree_assortativity,
        "self_loops": _q_self_loops,
        "random_batch": _q_random_batch,
        "batch_tidy": _q_batch_tidy,
        "triangle_total": _q_triangle_total,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "triangles_incremental": _q_triangles_incremental,
        "clustering_coefficient": _q_clustering_coefficient,
        "pagerank_static": _q_pagerank_static,
        "pagerank_top20": _q_pagerank_top20,
        "pagerank_personalized": _q_pagerank_personalized,
        "pagerank_weighted": _q_pagerank_weighted,
        "hits_scores": _q_hits_scores,
        "pagerank_dynamic_ranks": _q_pagerank_dynamic_ranks,
        "connected_components": _q_connected_components,
        "maximal_independent_set": _q_mis,
        "sssp_weighted": _q_sssp,
        "greedy_coloring": _q_coloring,
        "temporal_arrival": _q_temporal_arrival,
        "core_numbers": _q_core_numbers,
        "random_walks": _q_random_walks,
        "harmonic_centrality": _q_harmonic_centrality,
        "closeness_sample": _q_closeness_sample,
        "scc_of_seeds": _q_scc_of_seeds,
        "eccentricity_sample": _q_eccentricity_sample,
        "sp_counts": _q_sp_counts,
        "edge_support": _q_edge_support,
        "ktruss": _q_ktruss,
        "neighborhood_jaccard": _q_neighborhood_jaccard,
        "cc_incremental": _q_cc_incremental,
        "label_propagation": _q_label_propagation,
        "community_graph": _q_community_graph,
        "bfs_distances": _q_bfs_distances,
        "modularity": _q_modularity,
        "lineitem_agg": _q_lineitem_agg,
        "top_customers": _q_top_customers,
        "distinct_flags": _q_distinct_flags,
        "events_summary": _q_events_summary,
        "anti_join_users": _q_anti_join_users,
        "orders_by_segment": _q_orders_by_segment,
        "revenue_by_nation": _q_revenue_by_nation,
        "doc_chunks": _q_doc_chunks,
        "pack_bins": _q_pack_bins,
        "bm25_scores": _q_bm25_scores,
        "contamination": _q_contamination,
        "prefix_dups": _q_prefix_dups,
        "doc_repetition": _q_doc_repetition,
        "edge_log_csv": _q_edge_log_csv,
        "lp_incremental": _q_lp_incremental,
        "two_hop_counts": _q_two_hop,
        "media_stats": _q_media_stats,
        "image_resize": _q_image_resize,
        "audio_energy": _q_audio_energy,
        "frame_diffs": _q_frame_diffs,
        "pseudo_diameter": _q_pseudo_diameter,
        "katz_centrality": _q_katz_centrality,
        "common_neighbors": _q_common_neighbors,
        "adamic_adar": _q_adamic_adar,
        "reciprocity": _q_reciprocity,
        "avg_neighbor_degree": _q_avg_neighbor_degree,
        "graph_summary": _q_graph_summary,
        "component_sizes": _q_component_sizes,
        "edge_log_jsonl": _q_edge_log_jsonl,
        "walk_counts": _q_walk_counts,
        "resource_allocation": _q_resource_allocation,
        "pagerank_dynamic": _q_pagerank_dynamic,
        "orders_rollup": _q_orders_rollup,
        "orders_cube": _q_orders_cube,
        "events_pivot": _q_events_pivot,
        "events_unpivot": _q_events_unpivot,
        "supplier_region": _q_supplier_region,
        "funnel_events": _q_funnel_events,
        "label_centroids": _q_label_centroids,
        "salted_event_counts": _q_salted_event_counts,
        "user_churn": _q_user_churn,
        "copurchase_pairs": _q_copurchase_pairs,
        "lineitem_profile": _q_lineitem_profile,
        "props_sum": _q_props_sum,
        "value_stats_by_type": _q_value_stats_by_type,
        "distinct_users_by_type": _q_distinct_users_by_type,
        "windowed_events": _q_windowed_events,
        "hopping_events": _q_hopping_events,
        "asof_purchase_click": _q_asof_purchase_click,
        "attribution_window": _q_attribution_window,
        "sessions": _q_sessions,
        "rolling_sum": _q_rolling_sum,
        "running_total": _q_running_total,
        "event_gaps": _q_event_gaps,
        "exact_dedup": _q_exact_dedup,
        "pii_scrub": _q_pii_scrub,
        "quality_filter": _q_quality_filter,
        "two_hop_capped": _q_two_hop_capped,
        "copurchase_capped": _q_copurchase_capped,
        "pagerank_weighted_dynamic": _q_pagerank_weighted_dynamic,
        "pagerank_weighted_personalized": _q_pagerank_weighted_personalized,
        "pagerank_prefix_stages": _q_pagerank_prefix_stages,
        "temperature_resample": _q_temperature_resample,
        "exact_dedup_norm": _q_exact_dedup_norm,
        "crossdoc_dup": _q_crossdoc_dup,
        "curation_pipeline": _q_curation_pipeline,
        "hash_split": _q_hash_split,
        "stratified_sample": _q_stratified_sample,
        "sample_per_key": _q_sample_per_key,
        "topk_events_per_user": _q_topk_events_per_user,
        "mode_event_per_user": _q_mode_per_user,
        "vocabulary": _q_vocabulary,
        "inverted_index": _q_inverted_index,
        "cooccurrence_pmi": _q_cooccurrence_pmi,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "hll_distinct": _q_hll_distinct,
        "hll_users_by_type": _q_hll_users_by_type,
        "doc_ntile": _q_doc_ntile,
        "doc_window_ranks": _q_doc_window_ranks,
        "doc_len_quantiles": _q_doc_len_quantiles,
        "value_quantiles_binned": _q_value_quantiles_binned,
        "len_quantiles_by_lang": _q_len_quantiles_by_lang,
        "countmin_user_counts": _q_countmin_user_counts,
        "bloom_semi": _q_bloom_semi,
        "ngram_jaccard": _q_ngram_jaccard,
        "ngram_dup_profile": _q_ngram_dup_profile,
        "embedding_neardup_lsh": _q_embedding_neardup_lsh,
        "embedding_covariance": _q_embedding_covariance,
        "kmeans_clusters": _q_kmeans_clusters,
        "knn_ivf": _q_knn_ivf,
        "doc_tokens": _q_doc_tokens,
        "doc_lang": _q_doc_lang,
        "doc_quality": _q_doc_quality,
        "doc_fingerprint": _q_doc_fingerprint,
        "minhash_dedup": _q_minhash_dedup,
        "simhash_dedup": _q_simhash_dedup,
        "embedding_neardup": _q_embedding_neardup,
        "knn_bruteforce": _q_knn_bruteforce,
        "knn_lsh": _q_knn_lsh,
        "multimodal_decode": _q_multimodal_decode,
        "frame_sample": _q_frame_sample,
        "edge_log": _q_edge_log,
        "vertex_dictionary": _q_vertex_dictionary,
        "edges_encoded_dist": _q_edges_encoded_dist,
        "out_degrees": _q_out_degrees,
        "degree_distribution": _q_degree_distribution,
        "edges_export": _q_edges_export,
    }


# ----------------------------------------------------------------------
# DuckDB oracles
# ----------------------------------------------------------------------

_FX01 = T.fixture_path("sf0.01")

_GRAPH_CTE = f"""WITH tr AS (SELECT * FROM read_parquet('{_FX01}')),
raw_edges AS (SELECT conv_id AS src,
    coalesce(nullif(regexp_extract(tool, '^ref:([A-Za-z0-9_-]+)$', 1), ''),
             nullif(regexp_extract(text, 'see:([A-Za-z0-9_-]+)', 1), '')) AS dst,
    turn_idx FROM tr),
mention AS (SELECT src, dst, turn_idx FROM raw_edges WHERE dst IS NOT NULL),
ids AS (SELECT DISTINCT conv_id FROM (SELECT conv_id FROM tr UNION SELECT dst AS conv_id FROM mention)),
uedges AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM mention UNION SELECT conv_id, conv_id FROM ids)),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM uedges WHERE src <> dst)"""

# ---- derived graph views shared by the iterative oracles ----
# odeg: out-degree per vertex over the deduped edge set (incl self-loops)
# nbr:  undirected neighbor pairs, self-loops excluded (== the engine's
#       symmetrized view, pipelines/analytics.py)
# nbrx: nbr plus an identity pair per vertex (keeps every vertex in the
#       recursive min-label working set)
_GRAPH_CTE2 = _GRAPH_CTE + """,
odeg AS (SELECT src AS v, count(*) AS outdeg FROM uedges GROUP BY src),
nbr AS (SELECT src AS a, dst AS b FROM uedges WHERE src <> dst
        UNION SELECT dst AS a, src AS b FROM uedges WHERE src <> dst),
nbrx AS (SELECT a, b FROM nbr UNION ALL SELECT conv_id AS a, conv_id AS b FROM ids)"""

CC_ORACLE_ITERS = 40   # >= diameter of any component at sf0.01 (verified in tests)
MIS_ORACLE_ROUNDS = 8  # Luby fixpoint takes 5 rounds at sf0.01; extras are no-ops
COLORING_ORACLE_ROUNDS = 32  # JP fixpoint takes 26 rounds at sf0.01
COLORING_MAXC = 16           # mex search bound; engine max color is 7
TA_ORACLE_ROUNDS = 24  # temporal-arrival unroll bound >= engine fixpoint
SSSP_WMOD = 8          # edge weights in 1..8 (1 + mix2(lo,hi) % 8)
SSSP_ORACLE_ROUNDS = 24  # Bellman-Ford unroll bound; engine fixpoint is 14
                         # at sf0.01 (ctx.last_sssp_rounds; extras carry no-ops)
BFS_ORACLE_CAP = 64    # recursion depth cap; >= source eccentricity
LP_ITERS = 10          # matches the engine query's max_iterations

# The PageRank oracle: the exact synchronous power iteration as a
# recursive CTE, run the same fixed number of iterations as the engine
# query. Both sides then quantize to 1e10 — see PR_ORACLE_ITERS.
_PR_CTE = f""",
nverts AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ids),
prr AS (
  WITH RECURSIVE pr(i, v, r) AS (
    SELECT 0, conv_id, (SELECT 1.0 / n FROM nverts) FROM ids
    UNION ALL
    SELECT pr.i + 1, e.dst,
           (SELECT (1.0 - 0.85) / n FROM nverts) + 0.85 * sum(pr.r * (1.0 / od.outdeg))
    FROM pr JOIN uedges e ON e.src = pr.v JOIN odeg od ON od.v = pr.v
    WHERE pr.i < {PR_ORACLE_ITERS}
    GROUP BY pr.i, e.dst
  ) SELECT v, CAST(round(r * 1e10) AS BIGINT) AS rank_e10
    FROM pr WHERE i = {PR_ORACLE_ITERS}
)"""

# Personalized-PR oracle: identical recursion, but the (1-d) restart term
# is (1-d)*tele_v with the teleport mass uniform over the PPR_SEEDS
# highest-out-degree vertices (ties -> lexicographically lowest id) — the
# same seed rule the engine query computes distributed. Same uniform 1/n
# init (the fixpoint is init-independent; 250 iterations erase it).
_PPR_CTE = f""",
nverts AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ids),
seeds AS (SELECT v FROM odeg ORDER BY outdeg DESC, v LIMIT {PPR_SEEDS}),
tele AS (SELECT conv_id AS v,
  CASE WHEN conv_id IN (SELECT v FROM seeds) THEN 1.0 / {PPR_SEEDS} ELSE 0.0 END AS t
  FROM ids),
pprr AS (
  WITH RECURSIVE pr(i, v, r) AS (
    SELECT 0, conv_id, (SELECT 1.0 / n FROM nverts) FROM ids
    UNION ALL
    SELECT pr.i + 1, e.dst,
           (1.0 - 0.85) * max(t.t) + 0.85 * sum(pr.r * (1.0 / od.outdeg))
    FROM pr JOIN uedges e ON e.src = pr.v JOIN odeg od ON od.v = pr.v
         JOIN tele t ON t.v = e.dst
    WHERE pr.i < {PR_ORACLE_ITERS}
    GROUP BY pr.i + 1, e.dst
  ) SELECT v, CAST(round(r * 1e10) AS BIGINT) AS rank_e10
    FROM pr WHERE i = {PR_ORACLE_ITERS}
)"""

# Weighted-PR oracle: multiplicity weights (mention count per (src,dst)
# pair; the structural self-loop rides the UNION ALL as one extra
# occurrence — identical to the shard build's unique-key counting). The
# per-edge value (r * (1/W)) * w mirrors the engine's op order exactly.
_WPR_CTE = f""",
nverts AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ids),
wed AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
        FROM (SELECT src, dst FROM mention UNION ALL SELECT conv_id, conv_id FROM ids)
        GROUP BY src, dst),
wdeg AS (SELECT src AS v, sum(w) AS wd FROM wed GROUP BY src),
wprr AS (
  WITH RECURSIVE pr(i, v, r) AS (
    SELECT 0, conv_id, (SELECT 1.0 / n FROM nverts) FROM ids
    UNION ALL
    SELECT pr.i + 1, e.dst,
           (SELECT (1.0 - 0.85) / n FROM nverts)
           + 0.85 * sum((pr.r * (1.0 / od.wd)) * e.w)
    FROM pr JOIN wed e ON e.src = pr.v JOIN wdeg od ON od.v = pr.v
    WHERE pr.i < {PR_ORACLE_ITERS}
    GROUP BY pr.i + 1, e.dst
  ) SELECT v, CAST(round(r * 1e10) AS BIGINT) AS rank_e10
    FROM pr WHERE i = {PR_ORACLE_ITERS}
)"""

# Weighted-personalized-PR oracle: the WPR recursion with the PPR
# restart term — (1-d)·tele_v plus the weighted pull, teleport mass
# uniform over the PPR_SEEDS highest-(structural)-out-degree vertices.
_WPPR_CTE = f""",
nverts AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ids),
wed AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
        FROM (SELECT src, dst FROM mention UNION ALL SELECT conv_id, conv_id FROM ids)
        GROUP BY src, dst),
wdeg AS (SELECT src AS v, sum(w) AS wd FROM wed GROUP BY src),
seeds AS (SELECT v FROM odeg ORDER BY outdeg DESC, v LIMIT {PPR_SEEDS}),
tele AS (SELECT conv_id AS v,
  CASE WHEN conv_id IN (SELECT v FROM seeds) THEN 1.0 / {PPR_SEEDS} ELSE 0.0 END AS t
  FROM ids),
wpprr AS (
  WITH RECURSIVE pr(i, v, r) AS (
    SELECT 0, conv_id, (SELECT 1.0 / n FROM nverts) FROM ids
    UNION ALL
    SELECT pr.i + 1, e.dst,
           (1.0 - 0.85) * max(t.t) + 0.85 * sum((pr.r * (1.0 / od.wd)) * e.w)
    FROM pr JOIN wed e ON e.src = pr.v JOIN wdeg od ON od.v = pr.v
         JOIN tele t ON t.v = e.dst
    WHERE pr.i < {PR_ORACLE_ITERS}
    GROUP BY pr.i + 1, e.dst
  ) SELECT v, CAST(round(r * 1e10) AS BIGINT) AS rank_e10
    FROM pr WHERE i = {PR_ORACLE_ITERS}
)"""

# LP oracle: 10 synchronous rounds; every vertex adopts the most frequent
# neighbor label (ties -> lexicographically lowest), isolated vertices
# keep their own label (identity self-vote).
_LP_CTE = f""",
iso AS (SELECT conv_id FROM ids WHERE conv_id NOT IN (SELECT a FROM nbr)),
symx AS (SELECT a, b FROM nbr UNION ALL SELECT conv_id AS a, conv_id AS b FROM iso),
lpr AS (
  WITH RECURSIVE lp(i, v, lab) AS (
    SELECT 0, conv_id, conv_id FROM ids
    UNION ALL
    SELECT i, v, lab FROM (
      SELECT c.i AS i, c.v AS v, c.lab AS lab,
             row_number() OVER (PARTITION BY c.i, c.v ORDER BY c.cnt DESC, c.lab) AS rn
      FROM (SELECT lp.i + 1 AS i, e.b AS v, lp.lab AS lab, count(*) AS cnt
            FROM lp JOIN symx e ON e.a = lp.v WHERE lp.i < {LP_ITERS}
            GROUP BY lp.i + 1, e.b, lp.lab) c
    ) WHERE rn = 1
  ) SELECT v, lab FROM lp WHERE i = {LP_ITERS}
)"""


# ---- emulated 64-bit hashing (splitmix64) in DuckDB ----
# DuckDB raises on UBIGINT overflow, so mod-2^64 multiply is emulated in
# HUGEINT via 32-bit limb splitting; everything else (xor, shifts) is
# native on UBIGINT. These generators build nested-SELECT chains so each
# intermediate is computed once.

_T64 = "18446744073709551616"


def _mulmod64(a_col: str, b_const: int) -> str:
    a = f"CAST({a_col} AS HUGEINT)"
    return (
        f"CAST((( ({a} % 4294967296) * {b_const} + "
        f"(((({a} // 4294967296) * {b_const}) % 4294967296) * 4294967296)"
        f") % {_T64}) AS UBIGINT)"
    )


def _sm64(sub: str, xexpr: str, out: str) -> str:
    """Chain ``splitmix64(xexpr) AS out`` onto subquery ``sub``."""
    c1, c2, c3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    return f"""(SELECT * EXCLUDE (__z0, __z1, __z2, __z3, __z4),
 xor(__z4, __z4 >> 31) AS {out} FROM
 (SELECT *, {_mulmod64('__z3', c3)} AS __z4 FROM
  (SELECT *, xor(__z2, __z2 >> 27) AS __z3 FROM
   (SELECT *, {_mulmod64('__z1', c2)} AS __z2 FROM
    (SELECT *, xor(__z0, __z0 >> 30) AS __z1 FROM
     (SELECT *, CAST((CAST({xexpr} AS HUGEINT) + {c1}) % {_T64} AS UBIGINT) AS __z0
      FROM {sub}))))))"""


def _sql_fingerprint() -> str:
    """Sum of the 4 smallest base-131 8-byte-window hashes mod 2^31-1
    (functions/text.fingerprint). Assumes ASCII docs of length >= 8 AND
    <= 8199 chars: the window index table is a fixed range(0, 8192) —
    longer docs would lose tail windows the engine hashes (current
    testdata max is ~550 chars; raise the range if documents grow)."""
    pows, p = [1], 1
    for _ in range(7):
        p = p * 131 % 2147483647
        pows.append(p)
    terms = " + ".join(
        f"CAST(ord(substr(text, i + {j + 1}, 1)) AS BIGINT) * {pows[j]}" for j in range(8)
    )
    # DuckDB's range() takes no lateral column bounds: cross-join a
    # constant index table sized by a scalar subquery and filter
    return f"""
WITH wins AS (
  SELECT doc_id, ({terms}) % 2147483647 AS h
  FROM documents
  JOIN range(0, 8192) t(i) ON t.i + 8 <= length(text)
),
mk AS (SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rk FROM wins)
SELECT doc_id, CAST(sum(h) AS BIGINT) AS fingerprint FROM mk WHERE rk <= 4 GROUP BY doc_id"""


def _sql_pii_scrub() -> str:
    """Replays _q_pii_scrub end-to-end: the deterministic doc_id-derived
    PII injection, then the sequential count+replace chain of
    stages/text_stage.PII_PATTERNS (patterns live in the RE2 ∩ Python-re
    agreement subset, so regexp_extract_all / regexp_replace 'g' match
    pandas str.count / str.replace exactly)."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
    ip = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    return f"""
WITH aug AS (
  SELECT doc_id,
    coalesce(text, '') || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex.com'
    || CASE WHEN doc_id % 3 = 0
            THEN ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.' || CAST(doc_id // 256 % 256 AS VARCHAR)
            ELSE '' END AS s0
  FROM documents),
t1 AS (SELECT doc_id,
  CAST(length(regexp_extract_all(s0, '{email}')) AS BIGINT) AS n_emails,
  regexp_replace(s0, '{email}', '<EMAIL>', 'g') AS s1 FROM aug),
t2 AS (SELECT doc_id, n_emails,
  CAST(length(regexp_extract_all(s1, '{phone}')) AS BIGINT) AS n_phones,
  regexp_replace(s1, '{phone}', '<PHONE>', 'g') AS s2 FROM t1)
SELECT doc_id, n_emails, n_phones,
  CAST(length(regexp_extract_all(s2, '{ip}')) AS BIGINT) AS n_ips,
  regexp_replace(s2, '{ip}', '<IP>', 'g') AS clean_text FROM t2"""


def _sql_curation_pipeline() -> str:
    """Replays _q_curation_pipeline: quality/lang scoring CTEs -> kept
    semi-join -> min-id dedup per distinct text -> splitmix hash split
    (seed 0) -> per-(split, lang) rollup."""
    total = float(sum(SPLIT_WEIGHTS.values()))
    names = list(SPLIT_WEIGHTS)
    edges = np.cumsum([SPLIT_WEIGHTS[k] / total for k in names])
    whens = " ".join(
        f"WHEN h < CAST('{_sm_threshold(float(e))}' AS UBIGINT) THEN '{nm}'"
        for nm, e in zip(names[:-1], edges[:-1])
    )
    hashed = _sm64("(SELECT * FROM reps_lang)",
                   f"CAST(doc_id AS HUGEINT) % {_T64}", "h")
    return rf"""
WITH f AS (SELECT doc_id, length(text) AS n_chars,
        len(regexp_extract_all(text, '\S+')) AS n_tok,
        len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
        regexp_extract_all(lower(text), '[a-zà-ÿ]+') AS ws
      FROM documents),
g AS (SELECT doc_id, n_tok,
        n_punct / greatest(n_chars, 1) AS punct_ratio,
        len(list_filter(ws, x -> x IN ({_EN}))) / greatest(n_tok, 1) AS stop_ratio,
        (n_chars - greatest(n_tok - 1, 0)) / greatest(n_tok, 1) AS mean_token_len,
        len(list_filter(ws, x -> x IN ({_DE}))) AS de,
        len(list_filter(ws, x -> x IN ({_EN}))) AS en,
        len(list_filter(ws, x -> x IN ({_ES}))) AS es,
        len(list_filter(ws, x -> x IN ({_FR}))) AS fr
      FROM f),
h0 AS (SELECT doc_id, n_tok,
        least(greatest(0.3 + 0.5 * stop_ratio - punct_ratio
                       - greatest(mean_token_len - 12, 0) * 0.02, 0.0), 1.0) AS quality,
        CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
             WHEN de >= en AND de >= es AND de >= fr THEN 'de'
             WHEN en >= es AND en >= fr THEN 'en'
             WHEN es >= fr THEN 'es' ELSE 'fr' END AS lang
      FROM g),
kept AS (SELECT doc_id, lang FROM h0 WHERE quality >= 0.2 AND n_tok >= 5),
kd AS (SELECT d.doc_id, d.text, k.lang FROM documents d JOIN kept k USING (doc_id)),
reps AS (SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_dups FROM kd GROUP BY text),
reps_lang AS (SELECT r.doc_id, r.n_dups, k.lang FROM reps r JOIN kept k USING (doc_id)),
sp AS (SELECT doc_id, n_dups, lang,
              CASE {whens} ELSE '{names[-1]}' END AS split
       FROM {hashed})
SELECT split, lang, count(*)::BIGINT AS n_docs,
       CAST(sum(n_dups) AS BIGINT) AS n_source_docs
FROM sp GROUP BY 1, 2"""


def _sm_threshold(rate: float) -> int:
    """rate -> integer hash threshold; the EXACT clamp formula of
    stages/sampling.py (Python-int domain — float 2^64-1 == 2^64)."""
    return min(int(round(max(0.0, min(1.0, rate)) * 2.0**64)), 2**64 - 1)


def _sql_doc_hash(seed: int, cols: str) -> str:
    """Subquery computing h = splitmix64(doc_id + seed*2^60 mod 2^64)
    over the documents table — the sampling family's row hash."""
    off = (seed << 60) % (1 << 64)
    return _sm64(
        f"(SELECT {cols} FROM documents)",
        f"(CAST(doc_id AS HUGEINT) + {off}) % {_T64}",
        "h",
    )


def _sql_hash_split() -> str:
    total = float(sum(SPLIT_WEIGHTS.values()))
    names = list(SPLIT_WEIGHTS)
    edges = np.cumsum([SPLIT_WEIGHTS[k] / total for k in names])
    whens = " ".join(
        f"WHEN h < CAST('{_sm_threshold(float(e))}' AS UBIGINT) THEN '{nm}'"
        for nm, e in zip(names[:-1], edges[:-1])
    )
    return (
        f"SELECT doc_id, CASE {whens} ELSE '{names[-1]}' END AS split\n"
        f"FROM {_sql_doc_hash(0, 'doc_id')}"
    )


def _sql_stratified_sample() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN CAST('{_sm_threshold(r)}' AS UBIGINT)"
        for k, r in STRAT_RATES.items()
    )
    return (
        f"SELECT doc_id, lang FROM {_sql_doc_hash(1, 'doc_id, lang')}\n"
        f"WHERE h < CASE lang {whens} "
        f"ELSE CAST('{_sm_threshold(STRAT_DEFAULT)}' AS UBIGINT) END"
    )


def _sql_temperature_resample() -> str:
    """Replays temperature_resample bit-for-bit: per-lang keep rate
    (c_min/c)^(1-alpha), threshold = floor(rate·2^64) clamped in the
    HUGEINT domain (the engine uses floor, not round, precisely so this
    double-precision expression computes the identical integer)."""
    x = 1.0 - TEMP_ALPHA
    return f"""
WITH cnt AS (SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM documents GROUP BY lang),
mn AS (SELECT min(c) AS cmin FROM cnt),
thr AS (SELECT lang,
  CAST(least(CAST(floor(pow((SELECT cmin FROM mn) / c, {x}) * 18446744073709551616.0) AS HUGEINT),
             CAST('18446744073709551615' AS HUGEINT)) AS UBIGINT) AS t FROM cnt)
SELECT d.doc_id, d.lang FROM {_sql_doc_hash(7, 'doc_id, lang')} d
JOIN thr ON thr.lang = d.lang WHERE d.h < thr.t"""


def _sql_sample_per_key() -> str:
    return (
        f"SELECT doc_id, lang FROM {_sql_doc_hash(2, 'doc_id, lang')}\n"
        f"QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) <= {PER_KEY_K}"
    )


def _sql_harmonic_centrality(seed: int = 0) -> str:
    """Seed panel = the HARM_SEEDS smallest splitmix64(vid + off) (ties
    by vid) over the lexicographic vid ranks; per-seed BFS as a
    depth-capped recursive walk; harmonic = Σ 27720 // min-distance."""
    off = (seed << 60) % (1 << 64)
    ranked = _sm64(
        "(SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)",
        f"(CAST(vid AS HUGEINT) + {off}) % {_T64}",
        "h",
    )
    return _GRAPH_CTE2 + f""",
seeds AS (SELECT conv_id FROM {ranked} ORDER BY h, vid LIMIT {HARM_SEEDS}),
hw AS (
  WITH RECURSIVE w(s, v, d) AS (
    SELECT conv_id, conv_id, 0 FROM seeds
    UNION
    SELECT w.s, e.b, w.d + 1 FROM w JOIN nbr e ON e.a = w.v WHERE w.d < {HARM_MAXD}
  ) SELECT s, v, min(d) AS d FROM w GROUP BY s, v
),
hsum AS (SELECT v, CAST(sum({HARM_LCM} // d) AS BIGINT) AS harmonic
         FROM hw WHERE d > 0 GROUP BY v)
SELECT i.conv_id, coalesce(h.harmonic, 0) AS harmonic
FROM ids i LEFT JOIN hsum h ON h.v = i.conv_id"""


def _sql_lineitem_profile() -> str:
    """profile_table replayed: one UNION ALL leg per column with the
    same min/max rendering (ints verbatim, floats as exact cents,
    strings lexicographic; all rendered VARCHAR)."""
    legs = []
    for c in PROFILE_INT:
        legs.append(f"""
SELECT '{c}' AS "column", count(*)::BIGINT AS n_rows,
       (count(*) - count({c}))::BIGINT AS n_null,
       CAST(min({c}) AS VARCHAR) AS min_v, CAST(max({c}) AS VARCHAR) AS max_v
FROM lineitem""")
    for c in PROFILE_FLOAT:
        legs.append(f"""
SELECT '{c}' AS "column", count(*)::BIGINT AS n_rows,
       (count(*) - count({c}))::BIGINT AS n_null,
       CAST(min(CAST(FLOOR({c} * 100 + 0.5) AS BIGINT)) AS VARCHAR) AS min_v,
       CAST(max(CAST(FLOOR({c} * 100 + 0.5) AS BIGINT)) AS VARCHAR) AS max_v
FROM lineitem""")
    for c in PROFILE_STR:
        legs.append(f"""
SELECT '{c}' AS "column", count(*)::BIGINT AS n_rows,
       (count(*) - count({c}))::BIGINT AS n_null,
       min({c}) AS min_v, max({c}) AS max_v
FROM lineitem""")
    return "\nUNION ALL\n".join(legs)


def _sql_closeness_sample(seed: int = 0) -> str:
    """Same seed panel + depth-capped recursive BFS as harmonic;
    reports count(reached seeds) and sum(min distance) per vertex."""
    off = (seed << 60) % (1 << 64)
    ranked = _sm64(
        "(SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)",
        f"(CAST(vid AS HUGEINT) + {off}) % {_T64}",
        "h",
    )
    return _GRAPH_CTE2 + f""",
seeds AS (SELECT conv_id FROM {ranked} ORDER BY h, vid LIMIT {HARM_SEEDS}),
hw AS (
  WITH RECURSIVE w(s, v, d) AS (
    SELECT conv_id, conv_id, 0 FROM seeds
    UNION
    SELECT w.s, e.b, w.d + 1 FROM w JOIN nbr e ON e.a = w.v WHERE w.d < {HARM_MAXD}
  ) SELECT s, v, min(d) AS d FROM w GROUP BY s, v
),
csum AS (SELECT v, CAST(count(*) AS BIGINT) AS n_reached,
                CAST(sum(d) AS BIGINT) AS sum_dist
         FROM hw WHERE d > 0 GROUP BY v)
SELECT i.conv_id, coalesce(c.n_reached, 0) AS n_reached,
       coalesce(c.sum_dist, 0) AS sum_dist
FROM ids i LEFT JOIN csum c ON c.v = i.conv_id"""


def _sql_scc_of_seeds(seed: int = 0) -> str:
    """scc_of_seeds replayed in SQL: the same splitmix64 seed election
    (over lexicographic vid ranks), then forward and backward directed
    transitive closures from the seeds as recursive UNION fixpoints,
    intersected."""
    off = (seed << 60) % (1 << 64)
    ranked = _sm64(
        "(SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)",
        f"(CAST(vid AS HUGEINT) + {off}) % {_T64}",
        "h",
    )
    return _GRAPH_CTE + f""",
seeds AS (SELECT conv_id FROM {ranked} ORDER BY h, vid LIMIT {SCC_SEEDS}),
fwd AS (
  WITH RECURSIVE r(s, v) AS (
    SELECT conv_id, conv_id FROM seeds
    UNION
    SELECT r.s, e.dst FROM r JOIN uedges e ON e.src = r.v
  ) SELECT s, v FROM r),
bwd AS (
  WITH RECURSIVE r(s, v) AS (
    SELECT conv_id, conv_id FROM seeds
    UNION
    SELECT r.s, e.src FROM r JOIN uedges e ON e.dst = r.v
  ) SELECT s, v FROM r),
dict AS (SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)
SELECT ds.vid AS seed_vid, dv.vid AS vid, f.v AS conv_id
FROM fwd f JOIN bwd b ON b.s = f.s AND b.v = f.v
JOIN dict ds ON ds.conv_id = f.s
JOIN dict dv ON dv.conv_id = f.v"""


def _sql_mis(rounds: int = None) -> str:
    """maximal_independent_set replayed in SQL: fixed splitmix64(vid)
    priorities over the lexicographic vid ranks, the Luby rounds
    unrolled as a materialized CTE chain (a round = strict-local-minima
    join + neighbor exclusion over still-active vertices; rounds past
    the fixpoint are no-ops on both sides). Fixed distinct priorities
    make both sides the unique greedy MIS in increasing-hash order."""
    rounds = MIS_ORACLE_ROUNDS if rounds is None else rounds
    hashed = _sm64(
        "(SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)",
        f"CAST(vid AS HUGEINT) % {_T64}",
        "h",
    )
    parts = [f"st0 AS MATERIALIZED (SELECT conv_id, h, 0 AS status FROM {hashed})"]
    for r in range(1, rounds + 1):
        parts.append(f"""nm{r} AS MATERIALIZED (
  SELECT s.conv_id FROM st{r - 1} s WHERE s.status = 0 AND NOT EXISTS (
    SELECT 1 FROM nbr n JOIN st{r - 1} t ON t.conv_id = n.b
    WHERE n.a = s.conv_id AND t.status = 0 AND t.h < s.h))""")
        parts.append(f"""st{r} AS MATERIALIZED (
  SELECT s.conv_id, s.h,
    CASE WHEN s.conv_id IN (SELECT conv_id FROM nm{r}) THEN 1
         WHEN s.status = 0 AND EXISTS (
           SELECT 1 FROM nbr n JOIN nm{r} m ON m.conv_id = n.b
           WHERE n.a = s.conv_id) THEN 2
         ELSE s.status END AS status
  FROM st{r - 1} s)""")
    return (_GRAPH_CTE2 + ",\n" + ",\n".join(parts)
            + f"\nSELECT conv_id, CAST(status = 1 AS BIGINT) AS in_mis FROM st{rounds}")


def _sql_coloring(rounds: int = None, maxc: int = None) -> str:
    """greedy_coloring replayed in SQL: fixed splitmix64(vid)
    priorities over the lexicographic vid ranks, the Jones-Plassmann
    rounds unrolled as a materialized CTE chain. A round: ready =
    uncolored vertices with no uncolored smaller-hash neighbor; each
    takes the mex of its colored neighbors' colors (computed as the
    min unused value over a range(0, maxc) cross join — maxc must
    exceed the chromatic bound, engine max color is 7 at sf0.01).
    Rounds past the fixpoint (26 at sf0.01) are no-ops on both sides."""
    rounds = COLORING_ORACLE_ROUNDS if rounds is None else rounds
    maxc = COLORING_MAXC if maxc is None else maxc
    hashed = _sm64(
        "(SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)",
        f"CAST(vid AS HUGEINT) % {_T64}",
        "h",
    )
    parts = [f"st0 AS MATERIALIZED (SELECT conv_id, h, CAST(NULL AS BIGINT) AS color FROM {hashed})"]
    for r in range(1, rounds + 1):
        parts.append(f"""rd{r} AS MATERIALIZED (
  SELECT s.conv_id FROM st{r - 1} s WHERE s.color IS NULL AND NOT EXISTS (
    SELECT 1 FROM nbr n JOIN st{r - 1} t ON t.conv_id = n.b
    WHERE n.a = s.conv_id AND t.color IS NULL AND t.h < s.h))""")
        parts.append(f"""nc{r} AS MATERIALIZED (
  SELECT r.conv_id, min(c.x) AS color
  FROM rd{r} r CROSS JOIN range(0, {maxc}) c(x)
  WHERE NOT EXISTS (
    SELECT 1 FROM nbr n JOIN st{r - 1} t ON t.conv_id = n.b
    WHERE n.a = r.conv_id AND t.color = c.x)
  GROUP BY r.conv_id)""")
        parts.append(f"""st{r} AS MATERIALIZED (
  SELECT s.conv_id, s.h, coalesce(s.color, m.color) AS color
  FROM st{r - 1} s LEFT JOIN nc{r} m ON m.conv_id = s.conv_id)""")
    return (_GRAPH_CTE2 + ",\n" + ",\n".join(parts)
            + f"\nSELECT conv_id, color FROM st{rounds}")


def _sql_sssp(seed: int = 0, wmod: int = None, rounds: int = None) -> str:
    """sssp_weighted replayed in SQL: the same seed election (min
    splitmix64(vid + seed·2^60), ties by vid), edge weights
    1 + mix2(least(va,vb), greatest(va,vb)) % wmod recomputed from the
    lexicographic vid ranks, and Bellman-Ford as a CC-style recursive
    min-aggregate with an iteration counter — weight-0 self edges carry
    every reached vertex forward, so the i = rounds slice is the
    converged distance for any rounds >= the engine fixpoint."""
    wmod = SSSP_WMOD if wmod is None else wmod
    rounds = SSSP_ORACLE_ROUNDS if rounds is None else rounds
    off = (seed << 60) % (1 << 64)
    ranked = _sm64(
        "(SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)",
        f"(CAST(vid AS HUGEINT) + {off}) % {_T64}",
        "h",
    )
    weighted = _mix2_sql(
        "(SELECT n.a, n.b, least(da.vid, db.vid) AS lo, greatest(da.vid, db.vid) AS hi"
        " FROM nbr n JOIN dict da ON da.conv_id = n.a JOIN dict db ON db.conv_id = n.b)",
        "CAST(lo AS UBIGINT)", "hi", "wh",
    )
    return _GRAPH_CTE2 + f""",
dict AS (SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids),
seedv AS (SELECT conv_id FROM {ranked} ORDER BY h, vid LIMIT 1),
wnbrx AS (SELECT a, b, CAST(1 + wh % {wmod} AS BIGINT) AS w FROM {weighted}
          UNION ALL SELECT conv_id, conv_id, 0 FROM ids),
spr AS (
  WITH RECURSIVE sp(i, v, d) AS (
    SELECT 0, conv_id, CAST(0 AS BIGINT) FROM seedv
    UNION ALL
    SELECT sp.i + 1, e.b, min(sp.d + e.w) FROM sp JOIN wnbrx e ON e.a = sp.v
    WHERE sp.i < {rounds} GROUP BY sp.i, e.b
  ) SELECT v, d FROM sp WHERE i = {rounds}
)
SELECT i.conv_id, coalesce(spr.d, -1) AS sdist
FROM ids i LEFT JOIN spr ON spr.v = i.conv_id"""


def _sql_walk_counts(length: int = None) -> str:
    """walk_count_centrality replayed in SQL: w0 = 1 per vertex, each
    level an integer join+sum over the deduped directed edges (uedges,
    incl. the structural self-loops), total = sum of all levels."""
    length = WALK_LEN if length is None else length
    parts = ["w0 AS MATERIALIZED (SELECT conv_id AS v, CAST(1 AS BIGINT) AS c FROM ids)"]
    for t in range(1, length + 1):
        parts.append(f"""w{t} AS MATERIALIZED (
  SELECT e.dst AS v, CAST(sum(w.c) AS BIGINT) AS c FROM uedges e
  JOIN w{t - 1} w ON w.v = e.src GROUP BY e.dst)""")
    union = " UNION ALL ".join(f"SELECT v, c FROM w{t}" for t in range(length + 1))
    return (_GRAPH_CTE + ",\n" + ",\n".join(parts)
            + f",\ntot AS ({union})\n"
            + "SELECT v AS conv_id, CAST(sum(c) AS BIGINT) AS walks FROM tot GROUP BY v")


def _sql_katz(length: int = None, mul: int = None) -> str:
    """katz_centrality replayed in SQL: the walk_counts unrolled levels
    with the damping weight mul^(L-t) folded per level — katz =
    Σ_{t=1..L} mul^(L-t)·w_t, exact BIGINT throughout."""
    length = KATZ_LEN if length is None else length
    mul = KATZ_MUL if mul is None else mul
    parts = ["w0 AS MATERIALIZED (SELECT conv_id AS v, CAST(1 AS BIGINT) AS c FROM ids)"]
    for t in range(1, length + 1):
        parts.append(f"""w{t} AS MATERIALIZED (
  SELECT e.dst AS v, CAST(sum(w.c) AS BIGINT) AS c FROM uedges e
  JOIN w{t - 1} w ON w.v = e.src GROUP BY e.dst)""")
    union = " UNION ALL ".join(
        f"SELECT v, c * CAST({mul ** (length - t)} AS BIGINT) AS c FROM w{t}"
        for t in range(1, length + 1))
    return (_GRAPH_CTE + ",\n" + ",\n".join(parts)
            + f",\ntot AS ({union})\n"
            + "SELECT v AS conv_id, CAST(sum(c) AS BIGINT) AS katz FROM tot GROUP BY v")


# Link-prediction wedge CTE (shared by common_neighbors / adamic_adar):
# apex z contributes one (x < y) pair per unordered pair of its
# neighbors — exactly the engine's per-apex wedge emission.
_WEDGE_CTE = """,
sdeg AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS d FROM nbr GROUP BY a),
wedges AS (SELECT n1.b AS x, n2.b AS y, n1.a AS z
           FROM nbr n1 JOIN nbr n2 ON n1.a = n2.a AND n1.b < n2.b)"""


def _sql_temporal_arrival(seed: int = 0, rounds: int = None) -> str:
    """temporal_arrival replayed in SQL: the same seed election, the
    mention log re-extracted WITH epoch-us timestamps (the shared
    mention CTE drops ts), and the time-respecting min-arrival
    fixpoint as a CC-style recursive min-aggregate — weight-free self
    edges (slf) carry reached vertices forward, real edges are usable
    only when t >= the current arrival and deliver t + 1."""
    rounds = TA_ORACLE_ROUNDS if rounds is None else rounds
    off = (seed << 60) % (1 << 64)
    ranked = _sm64(
        "(SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)",
        f"(CAST(vid AS HUGEINT) + {off}) % {_T64}",
        "h",
    )
    return _GRAPH_CTE2 + f""",
tmen AS (SELECT conv_id AS src,
    coalesce(nullif(regexp_extract(tool, '^ref:([A-Za-z0-9_-]+)$', 1), ''),
             nullif(regexp_extract(text, 'see:([A-Za-z0-9_-]+)', 1), '')) AS dst,
    epoch_us(ts) AS t FROM tr),
tedg AS (SELECT src, dst, t, FALSE AS slf FROM tmen WHERE dst IS NOT NULL
         UNION ALL SELECT conv_id, conv_id, 0, TRUE FROM ids),
seedv AS (SELECT conv_id FROM {ranked} ORDER BY h, vid LIMIT 1),
tar AS (
  WITH RECURSIVE r(i, v, a) AS (
    SELECT 0, conv_id, CAST(0 AS BIGINT) FROM seedv
    UNION ALL
    SELECT r.i + 1, e.dst, min(CASE WHEN e.slf THEN r.a ELSE e.t + 1 END)
    FROM r JOIN tedg e ON e.src = r.v AND (e.slf OR e.t >= r.a)
    WHERE r.i < {rounds} GROUP BY r.i, e.dst
  ) SELECT v, a FROM r WHERE i = {rounds}
)
SELECT i.conv_id, coalesce(tar.a, -1) AS arrival
FROM ids i LEFT JOIN tar ON tar.v = i.conv_id"""


def _sql_eccentricity_sample(seed: int = 0) -> str:
    """eccentricity_sample replayed in SQL: the splitmix64 seed panel,
    a depth-capped recursive BFS walk per seed (cap 64 ≥ any true
    eccentricity here), eccentricity = max over vertices of the min
    distance."""
    off = (seed << 60) % (1 << 64)
    ranked = _sm64(
        "(SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)",
        f"(CAST(vid AS HUGEINT) + {off}) % {_T64}",
        "h",
    )
    return _GRAPH_CTE2 + f""",
seeds AS (SELECT conv_id FROM {ranked} ORDER BY h, vid LIMIT {SCC_SEEDS}),
hw AS (
  WITH RECURSIVE w(s, v, d) AS (
    SELECT conv_id, conv_id, 0 FROM seeds
    UNION
    SELECT w.s, e.b, w.d + 1 FROM w JOIN nbr e ON e.a = w.v WHERE w.d < 64
  ) SELECT s, v, min(d) AS d FROM w GROUP BY s, v
),
dict AS (SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)
SELECT dc.vid AS seed_vid, CAST(max(hw.d) AS BIGINT) AS eccentricity
FROM hw JOIN dict dc ON dc.conv_id = hw.s GROUP BY 1"""


def _sql_ktruss(k: int = KTRUSS_K, rounds: int = KTRUSS_ROUNDS) -> str:
    """ktruss_edges replayed in SQL: the peel unrolled as a fixed chain
    of CTE rounds (a recursive CTE cannot self-join its working table,
    which the wedge recount needs — unrolling sidesteps the one-
    reference rule; extra rounds past the fixpoint are no-ops on both
    sides)."""
    parts = []
    prev = "und"
    for r in range(1, rounds + 1):
        # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs,
        # and each round references the previous one ~5 times, so the
        # un-materialized unroll expands 5^rounds scans of the parquet
        parts.append(f"""
d{r} AS MATERIALIZED (SELECT a AS x, b AS y FROM {prev} UNION ALL SELECT b, a FROM {prev}),
t{r} AS MATERIALIZED (SELECT e.a, e.b FROM {prev} e JOIN (
    SELECT n1.x AS p, n2.x AS q, count(*) AS c
    FROM d{r} n1 JOIN d{r} n2 ON n1.y = n2.y AND n1.x < n2.x
    GROUP BY 1, 2) cn
  ON cn.p = e.a AND cn.q = e.b AND cn.c >= {k - 2})""")
        prev = f"t{r}"
    return _GRAPH_CTE + "," + ",".join(parts) + f""",
dict AS (SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)
SELECT da.vid AS a, db.vid AS b
FROM {prev} e
JOIN dict da ON da.conv_id = e.a
JOIN dict db ON db.conv_id = e.b"""


def _sql_kmeans(k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                scale: int = 1 << 20) -> str:
    """kmeans_clusters replayed in SQL: the fixed Lloyd rounds unrolled
    as MATERIALIZED CTEs over the unnested quantized coordinates.
    Integer-exact end to end — quantize floor(f64(x)*scale), distances
    and sums in BIGINT, centroid update with DuckDB's truncating `//`,
    argmin ties to the lowest cluster (ORDER BY dist, ctr) — so the
    assignment vector hash-matches the engine bit for bit."""
    rounds = []
    prev = "c0"
    for r in range(1, iters + 1):
        rounds.append(f"""
a{r} AS MATERIALIZED (
  SELECT e.vec_id, c.ctr,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY sum((e.val - c.cval) * (e.val - c.cval)), c.ctr) AS rn
  FROM emb e JOIN {prev} c USING (dim)
  GROUP BY e.vec_id, c.ctr),
c{r} AS MATERIALIZED (
  SELECT p.ctr, p.dim, COALESCE(s.sval // s.cnt, p.cval) AS cval
  FROM {prev} p LEFT JOIN (
    SELECT a.ctr, e.dim, sum(e.val) AS sval, count(*) AS cnt
    FROM a{r} a JOIN emb e USING (vec_id)
    WHERE a.rn = 1 GROUP BY a.ctr, e.dim) s
  ON s.ctr = p.ctr AND s.dim = p.dim)""")
        prev = f"c{r}"
    return f"""WITH emb AS MATERIALIZED (
  SELECT vec_id,
         unnest(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {scale}.0) AS BIGINT))) AS val,
         unnest(range(len(embedding))) AS dim
  FROM embeddings),
c0 AS MATERIALIZED (
  SELECT r - 1 AS ctr, dim, val AS cval
  FROM (SELECT dense_rank() OVER (ORDER BY vec_id) AS r, dim, val FROM emb)
  WHERE r <= {k}),{",".join(rounds)},
afin AS (
  SELECT e.vec_id, c.ctr,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY sum((e.val - c.cval) * (e.val - c.cval)), c.ctr) AS rn
  FROM emb e JOIN {prev} c USING (dim)
  GROUP BY e.vec_id, c.ctr)
SELECT vec_id, CAST(ctr AS BIGINT) AS cluster FROM afin WHERE rn = 1"""


def _sql_sp_counts() -> str:
    """sp_counts replayed in SQL: min-distance BFS CTE, then σ by
    level — the recursive working table at step k holds exactly the
    level-k rows, so the grouped sum over it IS the Brandes forward
    recurrence σ(v) = Σ σ(u) over dist(u)=dist(v)-1 neighbors."""
    ranked = _sm64(
        "(SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)",
        f"CAST(vid AS HUGEINT) % {_T64}",
        "h",
    )
    return _GRAPH_CTE2 + f""",
seeds AS (SELECT conv_id FROM {ranked} ORDER BY h, vid LIMIT 1),
dw AS (
  WITH RECURSIVE w(v, d) AS (
    SELECT conv_id, 0 FROM seeds
    UNION
    SELECT e.b, w.d + 1 FROM w JOIN nbr e ON e.a = w.v WHERE w.d < 64
  ) SELECT v, min(d) AS d FROM w GROUP BY v
),
sig AS (
  WITH RECURSIVE s(d, v, sg) AS (
    SELECT 0, conv_id, CAST(1 AS BIGINT) FROM seeds
    UNION ALL
    SELECT s.d + 1, e.b, CAST(sum(s.sg) AS BIGINT)
    FROM s JOIN nbr e ON e.a = s.v JOIN dw ON dw.v = e.b AND dw.d = s.d + 1
    WHERE s.d < 64
    GROUP BY 1, 2
  ) SELECT v, sg FROM s
),
dict AS (SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)
SELECT dc.vid AS vid, CAST(coalesce(dw.d, -1) AS BIGINT) AS distance,
       CAST(coalesce(sig.sg, 0) AS BIGINT) AS sigma, i.conv_id
FROM ids i JOIN dict dc USING (conv_id)
LEFT JOIN dw ON dw.v = i.conv_id
LEFT JOIN sig ON sig.v = i.conv_id"""


def _sql_random_walks(seed: int = 0) -> str:
    """random_walks replayed in SQL: r = mix2(mix2(walk, v), off+step),
    next = rank-ordered adjacency row at r % deg."""
    off = (seed << 60) % (1 << 64)
    sub = f"(SELECT step, walk, v FROM w WHERE step < {RW_LEN})"
    sub = _mix2_sql(sub, "CAST(walk AS UBIGINT)", "v", "__r1")
    sub = _mix2_sql(sub, "__r1", f"(CAST(step AS HUGEINT) + {off}) % {_T64}", "__r2")
    return _GRAPH_CTE + f""",
vidm AS (SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids),
evid AS (SELECT s.vid AS src, d.vid AS dst
         FROM uedges e JOIN vidm s ON s.conv_id = e.src JOIN vidm d ON d.conv_id = e.dst),
adj AS (SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
               count(*) OVER (PARTITION BY src) AS deg FROM evid),
wk AS (
  WITH RECURSIVE w(step, walk, v) AS (
    SELECT 0, vid, vid FROM vidm
    UNION ALL
    SELECT w2.step + 1, w2.walk, a.dst
    FROM {sub} w2
    JOIN adj a ON a.src = w2.v
              AND a.idx = CAST(w2.__r2 % CAST(a.deg AS UBIGINT) AS BIGINT)
  ) SELECT step, walk, v FROM w
)
SELECT wm.conv_id AS walk, wk.step, vm.conv_id AS conv_id
FROM wk JOIN vidm wm ON wm.vid = wk.walk JOIN vidm vm ON vm.vid = wk.v"""


def _sql_hll_one(col: str, seed: int) -> str:
    """One column's HLL sketch replayed in SQL: identical splitmix
    stream, bucket/rho split (rho via length(bin(rem)) = bit_length),
    exact HUGEINT register sum, and the same float estimate expression
    (left-associated like the engine's alpha * K / S)."""
    off = (seed << 60) % (1 << 64)
    hsub = _sm64(
        f"(SELECT DISTINCT {col} AS v FROM events)",
        f"(CAST(v AS HUGEINT) + {off}) % {_T64}",
        "h",
    )
    mask = (1 << 52) - 1
    k77 = float(2**77)  # m^2 * 2^(64-p+1) — a power of two, exact
    return f"""
(SELECT '{col}' AS col,
        CAST(round(CASE WHEN e <= 10240.0 AND vz > 0
                        THEN 4096.0 * ln(4096.0 / vz) ELSE e END) AS BIGINT) AS distinct_est,
        vz AS n_zero_regs, rs AS reg_sum_rho
 FROM (SELECT vz, rs, 0.7213/(1.0 + 1.079/4096.0) * {k77!r} / CAST(s AS DOUBLE) AS e
       FROM (SELECT CAST(4096 - count(*) AS BIGINT) AS vz,
                    CAST(coalesce(sum(rho), 0) AS BIGINT) AS rs,
                    CAST(4096 - count(*) AS HUGEINT) * 9007199254740992
                      + coalesce(SUM(CAST((CAST(1 AS BIGINT) << (53 - rho)) AS HUGEINT)), 0) AS s
             FROM (SELECT bucket, max(rho) AS rho
                   FROM (SELECT h >> 52 AS bucket,
                                CASE WHEN (h & CAST({mask} AS UBIGINT)) = 0 THEN 53
                                     ELSE 53 - length(bin(CAST((h & CAST({mask} AS UBIGINT)) AS BIGINT)))
                                END AS rho
                         FROM {hsub})
                   GROUP BY bucket))))"""


def _sql_hll_distinct() -> str:
    return (
        _sql_hll_one("event_id", 0)
        + "\nUNION ALL\n"
        + _sql_hll_one("user_id", 1)
    )


def _sql_value_quantiles_binned() -> str:
    """binned_quantiles replayed: identical double bin expression
    (floor((v-lo)/w), clipped), windowed cumulative counts, smallest
    bin at cum >= floor((n-1)*q)+1, edges = the same lo + bin*w
    products. Quantile fractions CAST to DOUBLE so DuckDB doesn't run
    (n-1)*q in DECIMAL."""
    w = (VQ_HI - VQ_LO) / VQ_BINS
    vals = ", ".join(f"('{k}', {v!r})" for k, v in VQ_QS.items())
    return f"""
WITH h AS (SELECT CAST(least(greatest(floor((value - {VQ_LO!r}) / {w!r}), 0), {VQ_BINS - 1}) AS BIGINT) AS bin,
                  count(*)::BIGINT AS cnt FROM events GROUP BY 1),
c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM h),
nt AS (SELECT sum(cnt)::BIGINT AS n FROM h),
qq AS (SELECT v.q, CAST(v.p AS DOUBLE) AS p FROM (VALUES {vals}) v(q, p)),
r AS (SELECT q, CAST(floor((nt.n - 1) * p) AS BIGINT) AS rank FROM qq, nt)
SELECT r.q, min(c.bin) AS bin,
       {VQ_LO!r} + min(c.bin) * {w!r} AS lo_edge,
       {VQ_LO!r} + (min(c.bin) + 1) * {w!r} AS hi_edge,
       r.rank
FROM r JOIN c ON c.cum >= r.rank + 1
GROUP BY r.q, r.rank"""


def _sql_hll_by_key(key: str, col: str, seed: int) -> str:
    """_sql_hll_one with the register fold and estimate GROUPed BY a
    key column (the key rides through _sm64's SELECT * chain)."""
    off = (seed << 60) % (1 << 64)
    hsub = _sm64(
        f"(SELECT DISTINCT {key} AS k, {col} AS v FROM events)",
        f"(CAST(v AS HUGEINT) + {off}) % {_T64}",
        "h",
    )
    mask = (1 << 52) - 1
    k77 = float(2**77)  # m^2 * 2^(64-p+1), exact power of two
    return f"""
SELECT k AS {key},
       CAST(round(CASE WHEN e <= 10240.0 AND vz > 0
                       THEN 4096.0 * ln(4096.0 / vz) ELSE e END) AS BIGINT) AS distinct_est,
       vz AS n_zero_regs, rs AS reg_sum_rho
FROM (SELECT k, vz, rs, 0.7213/(1.0 + 1.079/4096.0) * {k77!r} / CAST(s AS DOUBLE) AS e
      FROM (SELECT k, CAST(4096 - count(*) AS BIGINT) AS vz,
                   CAST(coalesce(sum(rho), 0) AS BIGINT) AS rs,
                   CAST(4096 - count(*) AS HUGEINT) * 9007199254740992
                     + coalesce(SUM(CAST((CAST(1 AS BIGINT) << (53 - rho)) AS HUGEINT)), 0) AS s
            FROM (SELECT k, bucket, max(rho) AS rho
                  FROM (SELECT k, h >> 52 AS bucket,
                               CASE WHEN (h & CAST({mask} AS UBIGINT)) = 0 THEN 53
                                    ELSE 53 - length(bin(CAST((h & CAST({mask} AS UBIGINT)) AS BIGINT)))
                               END AS rho
                        FROM {hsub})
                  GROUP BY k, bucket)
            GROUP BY k))"""


def _sql_countmin() -> str:
    """The Count-Min sketch replayed: per hash row r, counters =
    grouped counts over bucket = splitmix64(v + (seed·depth+r)·2^60) %
    width; estimate = least() across rows."""
    parts, joins = [], []
    for r in range(CM_DEPTH):
        off = ((CM_SEED * CM_DEPTH + r) << 60) % (1 << 64)
        rows = _sm64("(SELECT user_id AS v FROM events)",
                     f"(CAST(v AS HUGEINT) + {off}) % {_T64}", "h")
        parts.append(
            f"cm{r} AS (SELECT CAST(h % {CM_WIDTH} AS BIGINT) AS bkt,"
            f" CAST(count(*) AS BIGINT) AS n FROM {rows} GROUP BY 1)"
        )
        du = _sm64("(SELECT DISTINCT user_id AS v FROM events)",
                   f"(CAST(v AS HUGEINT) + {off}) % {_T64}", "h")
        parts.append(
            f"q{r} AS (SELECT v, CAST(h % {CM_WIDTH} AS BIGINT) AS bkt FROM {du})"
        )
        joins.append(f"JOIN q{r} ON q{r}.v = du.v JOIN cm{r} ON cm{r}.bkt = q{r}.bkt")
    least = ", ".join(f"cm{r}.n" for r in range(CM_DEPTH))
    return (
        "WITH " + ",\n".join(parts)
        + ", du AS (SELECT DISTINCT user_id AS v FROM events)\n"
        + f"SELECT du.v AS user_id, least({least}) AS cm_count FROM du\n"
        + "\n".join(joins)
    )


def _sql_bloom_semi() -> str:
    """Bloom bitmap + probe replayed: bits = distinct hash positions of
    the key side; a probe row is kept iff all K of its positions are
    set; exact = the true semi-join count."""
    key_sub = "(SELECT c_custkey AS v FROM customer WHERE c_mktsegment = 'BUILDING')"
    probe_sub = "(SELECT o_custkey AS v FROM orders)"
    bit_parts, probe_parts, conds = [], [], []
    for j in range(BLOOM_K):
        off = ((BLOOM_SEED * BLOOM_K + j) << 60) % (1 << 64)
        bit_parts.append(
            f"SELECT DISTINCT CAST(h % {BLOOM_BITS} AS BIGINT) AS bit FROM "
            + _sm64(key_sub, f"(CAST(v AS HUGEINT) + {off}) % {_T64}", "h")
        )
        probe_parts.append(
            f"p{j} AS (SELECT rid, CAST(h % {BLOOM_BITS} AS BIGINT) AS bit FROM "
            + _sm64(
                "(SELECT row_number() OVER () AS rid, v FROM " + probe_sub + " t)",
                f"(CAST(v AS HUGEINT) + {off}) % {_T64}", "h",
            )
            + ")"
        )
        conds.append(
            f"JOIN p{j} ON p{j}.rid = p0.rid JOIN bits b{j} ON b{j}.bit = p{j}.bit"
            if j else ""
        )
    bits = " UNION ".join(bit_parts)
    kept_joins = "\n".join(c for c in conds if c)
    return f"""
WITH bits AS ({bits}),
{', '.join(probe_parts)},
kept AS (SELECT count(*) AS n FROM p0 JOIN bits b0 ON b0.bit = p0.bit
{kept_joins})
SELECT (SELECT count(*) FROM orders) AS n_input,
       (SELECT n FROM kept) AS n_kept,
       (SELECT count(*) FROM orders o
        WHERE o.o_custkey IN (SELECT c_custkey FROM customer
                              WHERE c_mktsegment = 'BUILDING')) AS n_exact"""


def _sql_doc_len_quantiles() -> str:
    vals = ", ".join(f"('{k}', {v!r})" for k, v in QUANTILES.items())
    return f"""
WITH s AS (SELECT n_chars AS v, row_number() OVER (ORDER BY n_chars) - 1 AS rk FROM documents),
nn AS (SELECT count(*) AS n FROM documents)
SELECT t.q, CAST(s.v AS BIGINT) AS value
FROM (VALUES {vals}) t(q, f)
JOIN s ON s.rk = CAST(floor(((SELECT n FROM nn) - 1) * t.f) AS BIGINT)"""


def _sql_len_quantiles_by_lang() -> str:
    vals = ", ".join(f"('{k}', {v!r})" for k, v in QUANTILES.items())
    return f"""
WITH s AS (SELECT lang, n_chars AS v,
                  row_number() OVER (PARTITION BY lang ORDER BY n_chars) - 1 AS rk,
                  count(*) OVER (PARTITION BY lang) AS n
           FROM documents)
SELECT s.lang, t.q, CAST(s.v AS BIGINT) AS value
FROM (VALUES {vals}) t(q, f)
JOIN s ON s.rk = CAST(floor((s.n - 1) * t.f) AS BIGINT)"""


def _sql_simhash_dedup() -> str:
    """Full SimHash pipeline in SQL: whitespace tokens -> base-131 byte
    fold over the first 16 bytes mod 2^31-1 -> splitmix64 -> 64-bit
    majority-vote signature -> 4x16-bit chunk blocking (bucket capped at
    the 64 smallest ids, as the engine does) -> hamming<=3 verify ->
    min-label clustering over the near-dup pair graph."""
    tok = (
        r"(SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),"
        r" x -> x <> '')) AS t, CAST(0 AS BIGINT) AS __f0 FROM documents)"
    )
    sql = tok
    for k in range(1, 17):
        sql = (
            f"(SELECT * EXCLUDE (__f{k - 1}), CASE WHEN length(t) >= {k} "
            f"THEN (__f{k - 1} * 131 + ord(substr(t, {k}, 1))) % 2147483647 "
            f"ELSE __f{k - 1} END AS __f{k} FROM {sql})"
        )
    th = _sm64(sql, "__f16", "__th")
    bitsums = ", ".join(
        f"sum(CAST((__th >> {b}) & 1 AS BIGINT)) AS __c{b}" for b in range(64)
    )
    sigterms = " + ".join(
        f"(CASE WHEN 2 * __c{b} > __n THEN CAST('{1 << b}' AS UBIGINT) "
        f"ELSE CAST(0 AS UBIGINT) END)"
        for b in range(64)
    )
    return f"""
WITH rawsig AS (
  SELECT doc_id, {sigterms} AS sig FROM
  (SELECT doc_id, count(*) AS __n, {bitsums} FROM {th} GROUP BY doc_id)
),
sig AS (
  SELECT d.doc_id, coalesce(s.sig, CAST(0 AS UBIGINT)) AS sig
  FROM documents d LEFT JOIN rawsig s ON s.doc_id = d.doc_id
),
chunks AS (
  SELECT doc_id, sig, c, CAST((sig >> CAST(16 * c AS INTEGER)) & 65535 AS BIGINT) AS ck
  FROM sig, range(0, 4) t(c)
),
buck AS (
  SELECT doc_id, sig, c, ck,
         row_number() OVER (PARTITION BY c, ck ORDER BY doc_id) AS rn
  FROM chunks
),
cand AS (
  SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b
  FROM buck b1 JOIN buck b2 ON b1.c = b2.c AND b1.ck = b2.ck AND b1.doc_id < b2.doc_id
  WHERE b1.rn <= 64 AND b2.rn <= 64
),
vpairs AS (
  SELECT cand.a, cand.b
  FROM cand JOIN sig sa ON sa.doc_id = cand.a JOIN sig sb ON sb.doc_id = cand.b
  WHERE bit_count(xor(sa.sig, sb.sig)) <= 3
),
pedges AS (
  SELECT a, b FROM vpairs UNION SELECT b AS a, a AS b FROM vpairs
  UNION SELECT doc_id AS a, doc_id AS b FROM documents
),
clus AS (
  WITH RECURSIVE cl(i, v, lab) AS (
    SELECT 0, doc_id, doc_id FROM documents
    UNION ALL
    SELECT cl.i + 1, e.b, min(cl.lab) FROM cl JOIN pedges e ON e.a = cl.v
    WHERE cl.i < 32 GROUP BY cl.i, e.b
  ) SELECT v AS doc_id, lab AS cluster_id FROM cl WHERE i = 32
)
SELECT doc_id, cluster_id, (doc_id = cluster_id) AS keep FROM clus"""


def _mix2_sql(sub: str, a_expr: str, b_col: str, out: str) -> str:
    """Chain ``mix2(a, b) AS out`` (functions/hashing.mix2:
    splitmix64(a ^ (splitmix64(b) + C1))) onto subquery ``sub``."""
    c1 = 0x9E3779B97F4A7C15
    s = _sm64(sub, b_col, "__mb")
    s = (f"(SELECT * EXCLUDE (__mb), xor({a_expr}, "
         f"CAST((CAST(__mb AS HUGEINT) + {c1}) % {_T64} AS UBIGINT)) AS __mx FROM {s})")
    s = _sm64(s, "__mx", out)
    return f"(SELECT * EXCLUDE (__mx) FROM {s})"


def _sql_random_batch(size: int = 64, seed: int = 11, retries: int = 5,
                      tail: str | None = None) -> str:
    """The counter-mode splitmix64 batch generator in SQL — recomputes
    every draw of GraphContext.random_batch exactly: insertion
    endpoints, the 5-attempt deletion vertex pick (first attempt with
    DATA out-degree > 0 wins — structural self-loops excluded, so
    loop-only vertices exercise the retry), and the (h % deg)-th
    non-loop out-neighbor in dst order (engine adjacency is
    dst-vid-ascending; conv_id order == vid order by construction)."""
    # stream separation mirrors pipelines.graph.RB_STREAM_*: additive
    # counter-domain offsets 2^60 apart (seed only shifts WITHIN a
    # domain, so streams stay independent at every seed incl. 0)
    s_ins, s_del, s_pick = (1 << 60), (2 << 60), (3 << 60)
    ins = _sm64(_sm64(f"(SELECT t.l AS l, n FROM range(0, {size}) t(l) CROSS JOIN nn)",
                      f"{seed}*1000003 + {s_ins} + 2*l", "hu"),
                f"{seed}*1000003 + {s_ins} + 2*l + 1", "hv")
    delc = _sm64(f"(SELECT t.l AS l, a.j AS j, n FROM range(0, {size}) t(l) "
                 f"CROSS JOIN range(0, {retries}) a(j) CROSS JOIN nn)",
                 f"{seed}*1000003 + {s_del} + {retries}*l + j", "hc")
    dvi = _sm64("(SELECT l, uvid, dg FROM du)", f"{seed}*1000003 + {s_pick} + l", "hp")
    tail = _RB_TAIL_RAW if tail is None else tail
    return _GRAPH_CTE + f""",
dict AS (SELECT conv_id, CAST(row_number() OVER (ORDER BY conv_id) - 1 AS BIGINT) AS vid FROM ids),
nn AS (SELECT count(*) AS n FROM ids),
insr AS (SELECT l, CAST(hu % CAST(n AS UBIGINT) AS BIGINT) AS uvid,
                CAST(hv % CAST(n AS UBIGINT) AS BIGINT) AS vvid FROM {ins}),
cand AS (SELECT l, j, CAST(hc % CAST(n AS UBIGINT) AS BIGINT) AS uvid FROM {delc}),
dedges AS (SELECT src, dst FROM uedges WHERE src <> dst),
vdeg AS (SELECT d.vid, count(*) AS dg FROM dict d JOIN dedges e ON e.src = d.conv_id GROUP BY d.vid),
pick AS (SELECT c.l, min(c.j) AS j FROM cand c JOIN vdeg v ON v.vid = c.uvid AND v.dg > 0 GROUP BY c.l),
du AS (SELECT c.l, c.uvid, v.dg FROM pick p JOIN cand c ON c.l = p.l AND c.j = p.j
       JOIN vdeg v ON v.vid = c.uvid),
dvi AS (SELECT l, uvid, CAST(hp % CAST(dg AS UBIGINT) AS BIGINT) AS vi FROM {dvi}),
adj AS (SELECT e.src, e.dst, row_number() OVER (PARTITION BY e.src ORDER BY e.dst) - 1 AS rk
        FROM dedges e)
{tail}"""


_RB_TAIL_RAW = """
SELECT x.l, 'del' AS kind, dc.conv_id AS src, a.dst AS dst
FROM dvi x JOIN dict dc ON dc.vid = x.uvid
JOIN adj a ON a.src = dc.conv_id AND a.rk = x.vi
UNION ALL
SELECT i.l, 'ins' AS kind, da.conv_id AS src, db.conv_id AS dst
FROM insr i JOIN dict da ON da.vid = i.uvid JOIN dict db ON db.vid = i.vvid
ORDER BY kind, l"""

# tidyBatchUpdateU replay: dedup each side, keep deletions that exist /
# insertions that don't (vs the deduped directed edge set incl. the
# structural self-loops, = the shards' live edge sets)
_RB_TAIL_TIDY = """,
rbd AS (SELECT DISTINCT dc.conv_id AS src, a.dst AS dst
        FROM dvi x JOIN dict dc ON dc.vid = x.uvid
        JOIN adj a ON a.src = dc.conv_id AND a.rk = x.vi),
rbi AS (SELECT DISTINCT da.conv_id AS src, db.conv_id AS dst
        FROM insr i JOIN dict da ON da.vid = i.uvid JOIN dict db ON db.vid = i.vvid)
SELECT 'del' AS kind, src, dst FROM rbd
WHERE (src, dst) IN (SELECT (src, dst) FROM uedges)
UNION ALL
SELECT 'ins' AS kind, src, dst FROM rbi
WHERE (src, dst) NOT IN (SELECT (src, dst) FROM uedges)
ORDER BY kind, src, dst"""

# pagerank_dynamic_deletions replay: generator + tidy (as in
# _RB_TAIL_TIDY), then a COLD power iteration over the post-batch edge
# set (uedges minus tidy-dels plus tidy-ins). Structural self-loops are
# undeletable (the generator draws non-loop out-edges only), so every
# vertex keeps outdeg >= 1 and an in-edge — no dangling terms.
_RB_TAIL_PR_DELS = f""",
rbd AS (SELECT DISTINCT dc.conv_id AS src, a.dst AS dst
        FROM dvi x JOIN dict dc ON dc.vid = x.uvid
        JOIN adj a ON a.src = dc.conv_id AND a.rk = x.vi),
rbi AS (SELECT DISTINCT da.conv_id AS src, db.conv_id AS dst
        FROM insr i JOIN dict da ON da.vid = i.uvid JOIN dict db ON db.vid = i.vvid),
tdel AS (SELECT src, dst FROM rbd
         WHERE (src, dst) IN (SELECT (src, dst) FROM uedges)),
tins AS (SELECT src, dst FROM rbi
         WHERE (src, dst) NOT IN (SELECT (src, dst) FROM uedges)),
pedges AS (SELECT src, dst FROM uedges
           WHERE (src, dst) NOT IN (SELECT (src, dst) FROM tdel)
           UNION SELECT src, dst FROM tins),
podeg AS (SELECT src AS v, count(*) AS outdeg FROM pedges GROUP BY src),
nverts AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ids),
prr AS (
  WITH RECURSIVE pr(i, v, r) AS (
    SELECT 0, conv_id, (SELECT 1.0 / n FROM nverts) FROM ids
    UNION ALL
    SELECT pr.i + 1, e.dst,
           (SELECT (1.0 - 0.85) / n FROM nverts)
           + 0.85 * sum(pr.r * (1.0 / od.outdeg))
    FROM pr JOIN pedges e ON e.src = pr.v JOIN podeg od ON od.v = pr.v
    WHERE pr.i < {PR_ORACLE_ITERS}
    GROUP BY pr.i, e.dst
  ) SELECT v, CAST(round(r * 1e10) AS BIGINT) AS rank_e10
    FROM pr WHERE i = {PR_ORACLE_ITERS}
)
SELECT v AS conv_id, rank_e10 FROM prr"""

# weighted deletions replay: per-(src,dst) INSTANCE counts of the batch
# (weighted tidy keeps instances on both sides; every generated deletion
# exists by construction — it is drawn from the live adjacency), then
# w' = max(w - dels, 0) + ins (the weighted_set_update fold) and a COLD
# weighted power iteration over the post-batch weights
_RB_TAIL_WPR_DELS = f""",
deli AS (SELECT dc.conv_id AS src, a.dst AS dst, count(*) AS dcnt
         FROM dvi x JOIN dict dc ON dc.vid = x.uvid
         JOIN adj a ON a.src = dc.conv_id AND a.rk = x.vi
         GROUP BY 1, 2),
insi AS (SELECT da.conv_id AS src, db.conv_id AS dst, count(*) AS icnt
         FROM insr i JOIN dict da ON da.vid = i.uvid JOIN dict db ON db.vid = i.vvid
         GROUP BY 1, 2),
wbase AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
          FROM (SELECT src, dst FROM mention UNION ALL SELECT conv_id, conv_id FROM ids)
          GROUP BY src, dst),
wkeys AS (SELECT src, dst FROM wbase UNION SELECT src, dst FROM insi),
wedp AS (SELECT * FROM (
    SELECT k.src, k.dst,
           greatest(coalesce(b.w, 0) - coalesce(d.dcnt, 0), 0)
           + coalesce(i.icnt, 0) AS w
    FROM wkeys k
    LEFT JOIN wbase b ON b.src = k.src AND b.dst = k.dst
    LEFT JOIN deli d ON d.src = k.src AND d.dst = k.dst
    LEFT JOIN insi i ON i.src = k.src AND i.dst = k.dst
) WHERE w > 0),
wdeg AS (SELECT src AS v, sum(w) AS wd FROM wedp GROUP BY src),
nverts AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ids),
wprr AS (
  WITH RECURSIVE pr(i, v, r) AS (
    SELECT 0, conv_id, (SELECT 1.0 / n FROM nverts) FROM ids
    UNION ALL
    SELECT pr.i + 1, e.dst,
           (SELECT (1.0 - 0.85) / n FROM nverts)
           + 0.85 * sum((pr.r * (1.0 / od.wd)) * e.w)
    FROM pr JOIN wedp e ON e.src = pr.v JOIN wdeg od ON od.v = pr.v
    WHERE pr.i < {PR_ORACLE_ITERS}
    GROUP BY pr.i + 1, e.dst
  ) SELECT v, CAST(round(r * 1e10) AS BIGINT) AS rank_e10
    FROM pr WHERE i = {PR_ORACLE_ITERS}
)
SELECT v AS conv_id, rank_e10 FROM wprr"""


def _sql_dsh_ctes() -> str:
    """tokh/trio/dsh CTE block shared by the shingle-based dedup
    oracles: whitespace tokens -> base-131 byte fold + splitmix64
    (functions/hashing.poly_token_hash64) -> rolling 3-gram mix2
    shingles -> DISTINCT per-doc shingle sets (the SQL twin of
    stages/dedup._shingles_flat). Assumes every doc has >= 3 tokens
    (the engine's <k combine-all fallback is not replicated here) AND
    <= 2048 whitespace tokens: the token index table is a fixed
    range(0, 2048) — longer docs would lose tail shingles the engine
    hashes (current testdata max is ~100 tokens). The testdata
    satisfies both. MATERIALIZED so the 16-level fold and the
    mix2/sm64 nests run once, not per downstream self-join branch."""
    tok = (r"(SELECT doc_id, t.i AS pos, toks[t.i + 1] AS tk, CAST(0 AS BIGINT) AS __f0 "
           r"FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks "
           r"FROM documents) JOIN range(0, 2048) t(i) ON t.i < len(toks))")
    sql = tok
    for k in range(1, 17):
        sql = (
            f"(SELECT * EXCLUDE (__f{k - 1}), CASE WHEN length(tk) >= {k} "
            f"THEN (__f{k - 1} * 131 + ord(substr(tk, {k}, 1))) % 2147483647 "
            f"ELSE __f{k - 1} END AS __f{k} FROM {sql})"
        )
    th = _sm64(sql, "__f16", "th")
    m2 = _mix2_sql(_mix2_sql("trio", "h0", "h1", "__m1"), "__m1", "h2", "sh")
    return f"""tokh AS MATERIALIZED (SELECT doc_id, pos, th FROM {th}),
trio AS MATERIALIZED (
  SELECT a.doc_id AS doc_id, a.th AS h0, b.th AS h1, c.th AS h2
  FROM tokh a JOIN tokh b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              JOIN tokh c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
dsh AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM {m2})"""


def _sql_ngram_jaccard(threshold: float = 0.7) -> str:
    """Exact n-gram Jaccard near-dup pairs in SQL: the same distinct
    shingle sets as the engine (see _sql_dsh_ctes), then ALL-PAIRS
    intersection counts via a self-join on shingle hash and the exact
    jaccard = i / (|a| + |b| - i). The engine side
    (stages/dedup.ngram_jaccard_pairs) reaches the identical pair set
    through lossless prefix filtering — this oracle is the brute-force
    proof of that losslessness. Both sides divide the same exact ints
    in double, so the jaccard column hash-matches bitwise."""
    return f"""
WITH {_sql_dsh_ctes()},
inter AS (
  SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS i
  FROM dsh sa JOIN dsh sb ON sb.sh = sa.sh AND sa.doc_id < sb.doc_id
  GROUP BY sa.doc_id, sb.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id)
SELECT i.a, i.b,
       CAST(i.i AS DOUBLE) / greatest(na.n + nb.n - i.i, 1) AS jaccard
FROM inter i JOIN sizes na ON na.doc_id = i.a
             JOIN sizes nb ON nb.doc_id = i.b
WHERE CAST(i.i AS DOUBLE) / greatest(na.n + nb.n - i.i, 1) >= {threshold}
ORDER BY a, b"""


def _sql_minhash_dedup(threshold: float = 0.7, num_perm: int = 64,
                       bands: int = 16, seed: int = 7) -> str:
    """The full MinHash-LSH dedup pipeline in SQL: whitespace tokens ->
    base-131 byte fold + splitmix64 (poly_token_hash64) -> rolling
    3-gram mix2 shingles -> 64 salted-splitmix minhash permutations ->
    16 band hashes (sequential mix2 fold) -> capped bucket candidate
    pairs -> exact shingle-set Jaccard >= threshold -> min-label
    clustering. Salts are precomputed here with the engine's own
    derivation and embedded as literals."""
    from pagerank_cuda_dynamic_ray.functions.hashing import splitmix64 as _smx

    rows_per_band = num_perm // bands
    assert rows_per_band == 4, "fold below is unrolled for 4 rows/band"
    salts = _smx(np.arange(num_perm, dtype=np.uint64) + np.uint64(seed * 0x51ED))
    salt_rows = ", ".join(f"({j}, CAST('{int(s)}' AS UBIGINT))" for j, s in enumerate(salts))
    perm = (f"(SELECT d.doc_id, d.sh, s.j, s.s FROM dsh d "
            f"CROSS JOIN (SELECT * FROM (VALUES {salt_rows}) v(j, s)) s)")
    perm = f"(SELECT *, xor(sh, s) AS __x FROM {perm})"
    perm = _sm64(perm, "__x", "m")
    accbase = (f"(SELECT doc_id, j // 4 AS band, "
               f"max(CASE WHEN j % 4 = 0 THEN m END) AS s0, "
               f"max(CASE WHEN j % 4 = 1 THEN m END) AS s1, "
               f"max(CASE WHEN j % 4 = 2 THEN m END) AS s2, "
               f"max(CASE WHEN j % 4 = 3 THEN m END) AS s3 "
               f"FROM minsig GROUP BY doc_id, j // 4)")
    acc = _mix2_sql(accbase, "CAST(0 AS UBIGINT)", "s0", "__a1")
    acc = _mix2_sql(acc, "__a1", "s1", "__a2")
    acc = _mix2_sql(acc, "__a2", "s2", "__a3")
    acc = _mix2_sql(acc, "__a3", "s3", "bh")
    return f"""
WITH {_sql_dsh_ctes()},
minsig AS MATERIALIZED (
  SELECT doc_id, j, min(m) AS m FROM {perm} GROUP BY doc_id, j
),
bandkeys AS MATERIALIZED (SELECT doc_id, band, bh FROM {acc}),
buck AS (
  SELECT doc_id, band, bh,
         row_number() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rn
  FROM bandkeys
),
cand AS (
  SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b
  FROM buck b1 JOIN buck b2 ON b1.band = b2.band AND b1.bh = b2.bh
                           AND b1.doc_id < b2.doc_id
  WHERE b1.rn <= 64 AND b2.rn <= 64
),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c JOIN dsh sa ON sa.doc_id = c.a
              JOIN dsh sb ON sb.doc_id = c.b AND sb.sh = sa.sh
  GROUP BY c.a, c.b
),
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
vpairs AS (
  SELECT i.a, i.b FROM inter i
  JOIN sizes na ON na.doc_id = i.a JOIN sizes nb ON nb.doc_id = i.b
  WHERE CAST(i.i AS DOUBLE) / greatest(na.n + nb.n - i.i, 1) >= {threshold}
),
pedges AS (
  SELECT a, b FROM vpairs UNION SELECT b AS a, a AS b FROM vpairs
  UNION SELECT doc_id AS a, doc_id AS b FROM documents
),
clus AS (
  WITH RECURSIVE cl(it, v, lab) AS (
    SELECT 0, doc_id, doc_id FROM documents
    UNION ALL
    SELECT cl.it + 1, e.b, min(cl.lab) FROM cl JOIN pedges e ON e.a = cl.v
    WHERE cl.it < 32 GROUP BY cl.it, e.b
  ) SELECT v AS doc_id, lab AS cluster_id FROM cl WHERE it = 32
)
SELECT doc_id, cluster_id, (doc_id = cluster_id) AS keep FROM clus"""


def _sql_embedding_neardup_lsh(threshold: float = 0.45, nbits: int = 8,
                               bands: int = 6, seed: int = 5) -> str:
    """Hyperplane-LSH near-dup in SQL: the seeded plane matrices are
    generated here (same splitmix64 derivation as the engine) and
    embedded as double-literal lists; buckets via sign of inner
    products, the engine's 64-per-bucket cap via row_number, cosine
    verify via list_cosine_similarity."""
    import pyarrow.parquet as _pq

    from pagerank_cuda_dynamic_ray.stages.similarity import HyperplaneLSH

    emb_path = "/root/testdata/sf0.01/embeddings.parquet"
    dim = len(_pq.read_table(emb_path, columns=["embedding"])["embedding"][0])
    selects = []
    for b in range(bands):
        planes = HyperplaneLSH(dim, nbits, seed + b).planes
        bits = " + ".join(
            "(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), "
            f"[{', '.join(repr(float(x)) for x in planes[i])}]) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i in range(nbits)
        )
        selects.append(
            f"SELECT vec_id, ({bits}) * {bands} + {b} AS bkey FROM embeddings"
        )
    return f"""
WITH bk AS ({' UNION ALL '.join(selects)}),
buck AS (
  SELECT vec_id, bkey, row_number() OVER (PARTITION BY bkey ORDER BY vec_id) AS rn
  FROM bk
),
cand AS (
  SELECT DISTINCT b1.vec_id AS a, b2.vec_id AS b
  FROM buck b1 JOIN buck b2 ON b1.bkey = b2.bkey AND b1.vec_id < b2.vec_id
  WHERE b1.rn <= 64 AND b2.rn <= 64
)
SELECT cand.a, cand.b
FROM cand JOIN embeddings e1 ON e1.vec_id = cand.a
          JOIN embeddings e2 ON e2.vec_id = cand.b
WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= {threshold}"""


def _sql_knn_lsh(k: int = 10, nbits: int = 8, seed: int = 5) -> str:
    """Multi-probe hyperplane-LSH kNN in SQL: same plane derivation as
    the engine, probe set = query bucket + all single-bit flips
    (probes=2 semantics), candidates scanned by bucket match, exact
    cosine ordering (score desc, neighbor asc)."""
    import pyarrow.parquet as _pq

    from pagerank_cuda_dynamic_ray.stages.similarity import HyperplaneLSH

    emb_path = "/root/testdata/sf0.01/embeddings.parquet"
    dim = len(_pq.read_table(emb_path, columns=["embedding"])["embedding"][0])
    planes = HyperplaneLSH(dim, nbits, seed).planes
    bits = " + ".join(
        "(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(float(x)) for x in planes[i])}]) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(nbits)
    )
    probe_rows = " UNION ".join(
        ["SELECT qid, qb AS pb FROM q"]
        + [f"SELECT qid, xor(qb, {1 << b}) AS pb FROM q" for b in range(nbits)]
    )
    return f"""
WITH bk AS (SELECT vec_id, ({bits}) AS qb FROM embeddings),
q AS (SELECT vec_id AS qid, qb FROM bk ORDER BY vec_id LIMIT 5),
probes AS ({probe_rows}),
cand AS (
  SELECT DISTINCT p.qid, b.vec_id AS nid
  FROM probes p JOIN bk b ON b.qb = p.pb WHERE b.vec_id <> p.qid
),
scored AS (
  SELECT c.qid, c.nid,
         list_cosine_similarity(eq.embedding, en.embedding) AS cos
  FROM cand c JOIN embeddings eq ON eq.vec_id = c.qid
              JOIN embeddings en ON en.vec_id = c.nid
),
r AS (SELECT qid, nid,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) - 1 AS rk
      FROM scored)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rk AS BIGINT) AS knn_rank
FROM r WHERE rk < {k}"""


def _sql_knn_ivf(k: int = 10, n_centroids: int = 16, nprobe: int = 4,
                 seed: int = 5) -> str:
    """IVF kNN in SQL. The coarse quantizer (hash-threshold-sampled seeded
    spherical k-means, stages/similarity.train_ivf_centroids) is a
    deterministic pure function of the embeddings table; it is replicated
    here in plain numpy (independent reimplementation, no engine objects)
    and the trained centroids + per-query probe cells embedded as
    literals. Cell assignment (argmax inner product, first-max tie-break
    — norms are per-row constants so normalization drops out of the
    argmax), candidate scan, and exact cosine ordering run in SQL."""
    import pyarrow.parquet as _pq

    from pagerank_cuda_dynamic_ray.functions.hashing import splitmix64 as _smx

    emb = (
        _pq.read_table("/root/testdata/sf0.01/embeddings.parquet",
                       columns=["vec_id", "embedding"])
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )

    def _norm(m):
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)

    # hash-threshold sample (pure function of vec_id), seeded init, 10 iters
    frac = min(1.0, 4096 / max(len(emb), 1))
    cut = np.uint64(int(frac * 2**64)) if frac < 1.0 else np.uint64(2**64 - 1)
    hh = _smx(emb["vec_id"].to_numpy(np.uint64) + np.uint64(seed * 0xA11CE))
    samp = emb.iloc[np.flatnonzero(hh <= cut)]
    mat = _norm(np.stack(samp["embedding"].to_list()).astype(np.float64))
    kc = min(n_centroids, len(mat))
    init = _smx(np.arange(len(mat), dtype=np.uint64) + np.uint64(seed)).argsort()[:kc]
    cents = mat[np.sort(init)].copy()
    for _ in range(10):
        assign = (mat @ cents.T).argmax(axis=1)
        for c in range(kc):
            rows = assign == c
            if rows.any():
                v = mat[rows].mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    # per-query probe cells (queries = first 5 vec_ids, as _knn_queries)
    qn = _norm(np.stack(emb["embedding"].to_list()[:5]).astype(np.float64))
    q_ids = emb["vec_id"].to_numpy()[:5]
    q_probe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    probe_rows = ", ".join(
        f"({int(q_ids[qi])}, {int(c)})" for qi in range(len(q_ids)) for c in q_probe[qi]
    )
    ip_selects = " UNION ALL ".join(
        f"SELECT vec_id, {c} AS c, "
        "list_inner_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(float(x)) for x in cents[c])}]) AS ip FROM embeddings"
        for c in range(kc)
    )
    return f"""
WITH ips AS ({ip_selects}),
cells AS (
  SELECT vec_id, c AS cell FROM (
    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY ip DESC, c) AS rn
    FROM ips
  ) WHERE rn = 1
),
probes(qid, pc) AS (VALUES {probe_rows}),
cand AS (
  SELECT DISTINCT p.qid, ce.vec_id AS nid
  FROM probes p JOIN cells ce ON ce.cell = p.pc WHERE ce.vec_id <> p.qid
),
scored AS (
  SELECT c.qid, c.nid,
         list_cosine_similarity(eq.embedding, en.embedding) AS cos
  FROM cand c JOIN embeddings eq ON eq.vec_id = c.qid
              JOIN embeddings en ON en.vec_id = c.nid
),
r AS (SELECT qid, nid,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) - 1 AS rk
      FROM scored)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rk AS BIGINT) AS knn_rank
FROM r WHERE rk < {k}"""


def _sql_multimodal_decode() -> str:
    base = "(SELECT CAST(x AS BIGINT) AS media_id FROM range(256) t(x))"
    q = _sm64(base, "media_id + 42", "__kh")
    cols = []
    for j in (0, 5, 10, 15):
        q = _sm64(q, f"media_id + {42 * 1_000_003 + j}", f"__w{j}")
        q = _sm64(q, f"__w{j}", f"__fh{j}")
        cols.append(f"CAST(__fh{j} AS DOUBLE) / 18446744073709551616.0 AS f{j}")
    return f"""
SELECT media_id,
       CASE __kh % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       {', '.join(cols)}
FROM {q}"""


def _sql_frame_sample() -> str:
    base = "(SELECT CAST(x AS BIGINT) AS media_id FROM range(256) t(x))"
    q = _sm64(base, "media_id + 42", "__h")
    return f"""
SELECT media_id, CAST(f AS INTEGER) AS frame_idx
FROM (SELECT media_id, CAST((__h >> 32) % 240 + 1 AS BIGINT) AS nf
      FROM {q} WHERE __h % 3 = 2)
JOIN range(0, 240) t(f) ON f < nf AND f % 10 = 0"""


_EN = "'the','and','of','to','a','in','is','it','that','for','was','with'"
_DE = "'der','die','das','und','ist','nicht','ein','eine','mit','für','auf'"
_FR = "'le','la','les','et','est','un','une','pour','dans','que','pas'"
_ES = "'el','la','los','las','es','un','una','para','que','no','con'"


def _sql_media_stats() -> str:
    """media_stats replayed WITHOUT byte parsing: the synthetic payload
    content is splitmix64-derived (multimodal.synth_real_media_table),
    so pixel/sample streams regenerate arithmetically per element —
    image/video pixels = sm64(j + 692·(i+1 | i·1000+f+1)) % 256, audio
    samples = sm64(j + 224·(i+1)) % 65536 − 32768 (692 = seed·97+13,
    224 = seed·31+7 at seed 7); kind = sm64(i + 7) % 3."""
    n, img_elems, audio_len, vframes = (
        N_MEDIA_STATS, 24 * 32 * 3, 2048, 6)
    kinds = _sm64(f"(SELECT unnest(generate_series(0, {n - 1})) AS i)",
                  "CAST(i + 7 AS UBIGINT)", "hk")
    img_sub = _sm64(
        f"(SELECT k.i, t.j FROM kb k, unnest(generate_series(0, {img_elems - 1})) AS t(j) "
        "WHERE k.k3 = 0)",
        "CAST(j + 692 * (i + 1) AS UBIGINT)", "hp")
    vid_sub = _sm64(
        f"(SELECT k.i, f.f, t.j FROM kb k, unnest(generate_series(0, {vframes - 1})) AS f(f), "
        f"unnest(generate_series(0, {img_elems - 1})) AS t(j) WHERE k.k3 = 2)",
        "CAST(j + 692 * (i * 1000 + f + 1) AS UBIGINT)", "hp")
    aud_sub = _sm64(
        f"(SELECT k.i, t.j FROM kb k, unnest(generate_series(0, {audio_len - 1})) AS t(j) "
        "WHERE k.k3 = 1)",
        "CAST(j + 224 * (i + 1) AS UBIGINT)", "hp")
    px_sums = ", ".join(
        f"CAST(sum(CASE WHEN ch = {c} THEN px ELSE 0 END) AS BIGINT) AS s{c}"
        for c in range(3))
    return f"""
WITH kb AS (SELECT i, CAST(hk % 3 AS BIGINT) AS k3 FROM {kinds}),
img AS (SELECT media_id, CAST(count(*) // 3 AS BIGINT) AS n_units, {px_sums}
        FROM (SELECT i AS media_id, j % 3 AS ch, CAST(hp % 256 AS BIGINT) AS px
              FROM {img_sub})
        GROUP BY media_id),
vid AS (SELECT media_id, CAST(count(*) // 3 AS BIGINT) AS n_units, {px_sums}
        FROM (SELECT i AS media_id, j % 3 AS ch, CAST(hp % 256 AS BIGINT) AS px
              FROM {vid_sub})
        GROUP BY media_id),
aud AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_units,
               CAST(sum(s) AS BIGINT) AS s0, CAST(sum(s * s) AS BIGINT) AS s1,
               CAST(0 AS BIGINT) AS s2
        FROM (SELECT i AS media_id, CAST(hp % 65536 AS BIGINT) - 32768 AS s
              FROM {aud_sub})
        GROUP BY media_id)
SELECT media_id, 'image' AS kind, n_units, s0, s1, s2 FROM img
UNION ALL SELECT media_id, 'audio', n_units, s0, s1, s2 FROM aud
UNION ALL SELECT media_id, 'video', n_units, s0, s1, s2 FROM vid"""


def _sql_image_resize() -> str:
    """image_resize digest replayed: regenerate the original pixel
    stream (as _sql_media_stats), group each pixel into its 2x2 block
    by integer index arithmetic, floor-divide the block sum by 4 (the
    engine's exact block-mean), then sum the resized channels."""
    n, img_w, img_elems = N_MEDIA_STATS, 32, 24 * 32 * 3
    kinds = _sm64(f"(SELECT unnest(generate_series(0, {n - 1})) AS i)",
                  "CAST(i + 7 AS UBIGINT)", "hk")
    img_sub = _sm64(
        f"(SELECT k.i, t.j FROM kb k, unnest(generate_series(0, {img_elems - 1})) AS t(j) "
        "WHERE k.k3 = 0)",
        "CAST(j + 692 * (i + 1) AS UBIGINT)", "hp")
    return f"""
WITH kb AS (SELECT i, CAST(hk % 3 AS BIGINT) AS k3 FROM {kinds}),
px AS (SELECT i AS media_id,
              (j // {img_w * 3}) // 2 AS br,
              ((j % {img_w * 3}) // 3) // 2 AS bc,
              j % 3 AS ch,
              CAST(hp % 256 AS BIGINT) AS px
       FROM {img_sub}),
blk AS (SELECT media_id, br, bc, ch, CAST(sum(px) // 4 AS BIGINT) AS rp
        FROM px GROUP BY media_id, br, bc, ch)
SELECT media_id, 'image' AS kind, CAST(count(*) // 3 AS BIGINT) AS n_units,
       CAST(sum(CASE WHEN ch = 0 THEN rp ELSE 0 END) AS BIGINT) AS s0,
       CAST(sum(CASE WHEN ch = 1 THEN rp ELSE 0 END) AS BIGINT) AS s1,
       CAST(sum(CASE WHEN ch = 2 THEN rp ELSE 0 END) AS BIGINT) AS s2
FROM blk GROUP BY media_id"""


def _sql_audio_energy() -> str:
    """audio_energy_windows replayed: regenerate the WAV sample stream
    (sm64(j + 224·(i+1)) % 65536 − 32768) and group by j // window."""
    n, audio_len, w = N_MEDIA_STATS, 2048, AUDIO_WINDOW
    kinds = _sm64(f"(SELECT unnest(generate_series(0, {n - 1})) AS i)",
                  "CAST(i + 7 AS UBIGINT)", "hk")
    aud_sub = _sm64(
        f"(SELECT k.i, t.j FROM kb k, unnest(generate_series(0, {audio_len - 1})) AS t(j) "
        "WHERE k.k3 = 1)",
        "CAST(j + 224 * (i + 1) AS UBIGINT)", "hp")
    return f"""
WITH kb AS (SELECT i, CAST(hk % 3 AS BIGINT) AS k3 FROM {kinds})
SELECT media_id, window_idx, CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(s * s) AS BIGINT) AS energy
FROM (SELECT i AS media_id, j // {w} AS window_idx,
             CAST(hp % 65536 AS BIGINT) - 32768 AS s
      FROM {aud_sub})
GROUP BY media_id, window_idx"""


def _sql_frame_diffs() -> str:
    """frame_diffs replayed: per element j of video i, regenerate frame
    f's and frame f−1's pixels (two chained splitmix64 emulations on
    the same row) and sum |Δ| per (i, f)."""
    n, img_elems, vframes = N_MEDIA_STATS, 24 * 32 * 3, 6
    kinds = _sm64(f"(SELECT unnest(generate_series(0, {n - 1})) AS i)",
                  "CAST(i + 7 AS UBIGINT)", "hk")
    elems = (f"(SELECT k.i, f.f, t.j FROM kb k, "
             f"unnest(generate_series(1, {vframes - 1})) AS f(f), "
             f"unnest(generate_series(0, {img_elems - 1})) AS t(j) WHERE k.k3 = 2)")
    both = _sm64(_sm64(elems, "CAST(j + 692 * (i * 1000 + f) AS UBIGINT)", "h0"),
                 "CAST(j + 692 * (i * 1000 + f + 1) AS UBIGINT)", "h1")
    return f"""
WITH kb AS (SELECT i, CAST(hk % 3 AS BIGINT) AS k3 FROM {kinds})
SELECT media_id, frame_idx, CAST(sum(d) AS BIGINT) AS diff_sum
FROM (SELECT i AS media_id, f AS frame_idx,
             abs(CAST(h1 % 256 AS BIGINT) - CAST(h0 % 256 AS BIGINT)) AS d
      FROM {both})
GROUP BY media_id, frame_idx"""


def _sql_lp_incremental() -> str:
    """Two-phase LP replay: cold rounds over the base 90% of the
    temporally-ordered mention log (row_number over (ts, src, turn_idx)
    = the engine's encoded-log sort order, since vids are positions in
    the sorted string dictionary), then warm rounds — initialized from
    the phase-A labels — over the full graph."""
    step = """
    SELECT i, v, lab FROM (
      SELECT c.i AS i, c.v AS v, c.lab AS lab,
             row_number() OVER (PARTITION BY c.i, c.v ORDER BY c.cnt DESC, c.lab) AS rn
      FROM (SELECT {w}.i + 1 AS i, e.b AS v, {w}.lab AS lab, count(*) AS cnt
            FROM {w} JOIN {sym} e ON e.a = {w}.v WHERE {w}.i < {iters}
            GROUP BY {w}.i + 1, e.b, {w}.lab) c
    ) WHERE rn = 1"""
    return _GRAPH_CTE2 + f""",
mts AS (SELECT conv_id AS src,
    coalesce(nullif(regexp_extract(tool, '^ref:([A-Za-z0-9_-]+)$', 1), ''),
             nullif(regexp_extract(text, 'see:([A-Za-z0-9_-]+)', 1), '')) AS dst,
    turn_idx, ts FROM tr),
mord AS (SELECT src, dst, row_number() OVER (ORDER BY ts, src, turn_idx) AS rn,
                count(*) OVER () AS m
         FROM mts WHERE dst IS NOT NULL),
based AS (SELECT DISTINCT src, dst FROM mord
          WHERE rn <= CAST(floor(0.9 * m) AS BIGINT)),
nbrb AS (SELECT src AS a, dst AS b FROM based WHERE src <> dst
         UNION SELECT dst AS a, src AS b FROM based WHERE src <> dst),
isob AS (SELECT conv_id FROM ids WHERE conv_id NOT IN (SELECT a FROM nbrb)),
symb AS (SELECT a, b FROM nbrb UNION ALL SELECT conv_id AS a, conv_id AS b FROM isob),
lpa AS (
  WITH RECURSIVE lp(i, v, lab) AS (
    SELECT 0, conv_id, conv_id FROM ids
    UNION ALL
    {step.format(w='lp', sym='symb', iters=LP_ITERS)}
  ) SELECT v, lab FROM lp WHERE i = {LP_ITERS}
),
iso AS (SELECT conv_id FROM ids WHERE conv_id NOT IN (SELECT a FROM nbr)),
symx AS (SELECT a, b FROM nbr UNION ALL SELECT conv_id AS a, conv_id AS b FROM iso),
lpb AS (
  WITH RECURSIVE lp2(i, v, lab) AS (
    SELECT 0, v, lab FROM lpa
    UNION ALL
    {step.format(w='lp2', sym='symx', iters=LP_ITERS)}
  ) SELECT v, lab FROM lp2 WHERE i = {LP_ITERS}
)
SELECT v AS conv_id, lab AS label_id FROM lpb"""


def _sql_doc_chunks() -> str:
    """chunk_documents replayed: list-slice windows over the \\S+ token
    list; chunk count = 1 + ceil((n-size)/stride) in integer division."""
    return rf"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents),
nn AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n FROM w WHERE len(ws) > 0),
c AS (SELECT doc_id, ws, n, unnest(generate_series(0,
        CASE WHEN n > {CHUNK_SIZE} THEN (n - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} ELSE 0 END)) AS i
      FROM nn)
SELECT doc_id, i AS chunk_idx,
       least(i*{CHUNK_STRIDE} + {CHUNK_SIZE}, n) - i*{CHUNK_STRIDE} AS n_tokens,
       array_to_string(list_slice(ws, i*{CHUNK_STRIDE} + 1, least(i*{CHUNK_STRIDE} + {CHUNK_SIZE}, n)), ' ') AS chunk_text
FROM c"""


def _sql_pack_bins() -> str:
    """pack_token_bins replayed: SQL's exclusive running-sum window —
    the semantics the distributed O(blocks)-carry pass implements."""
    return rf"""
WITH w AS (SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens FROM documents),
r AS (SELECT doc_id, n_tokens,
        coalesce(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM w)
SELECT doc_id, n_tokens, CAST(prev // {PACK_BUDGET} AS BIGINT) AS bin,
       CAST(prev % {PACK_BUDGET} AS BIGINT) AS bin_offset FROM r"""


def _sql_bm25_scores() -> str:
    """bm25_scores replayed term by term with the IDENTICAL double
    parse tree (rational idf, len·N/totlen, floor(x·1e6)) so every
    per-term contribution is bit-equal; the sum is then integer."""
    parts = []
    for i in range(len(BM25_TERMS)):
        parts.append(
            f"CAST(floor(((st.N - df{i} + 0.5) / (df{i} + 0.5)) * (tf{i} * ({BM25_K1} + 1.0)) / "
            f"(tf{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * (len_d * st.N) / st.totlen)) * 1000000.0) AS BIGINT)"
        )
    tf_cols = ",\n  ".join(
        f"CAST(len(list_filter(ws, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(BM25_TERMS))
    df_cols = ",\n  ".join(
        f"sum(CASE WHEN list_contains(ws, '{t}') THEN 1 ELSE 0 END) AS df{i}"
        for i, t in enumerate(BM25_TERMS))
    return rf"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents),
tf AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS len_d,
  {tf_cols}
  FROM w),
st AS (SELECT CAST(count(*) AS BIGINT) AS N, CAST(sum(len(ws)) AS BIGINT) AS totlen,
  {df_cols}
  FROM w)
SELECT doc_id, ({' + '.join(parts)}) AS score_e6 FROM tf, st"""


def _sql_contamination() -> str:
    """contamination_screen replayed on gram STRINGS (the engine
    compares 64-bit shingle hashes — equal barring collisions, the
    stance every n-gram oracle in this file takes)."""
    return rf"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents),
g AS (SELECT doc_id, array_to_string(list_slice(ws, i, i + {CONTAM_K - 1}), ' ') AS gram
      FROM w, unnest(generate_series(1, len(ws) - {CONTAM_K - 1})) AS t(i)
      WHERE len(ws) >= {CONTAM_K}),
gd AS (SELECT DISTINCT doc_id, gram FROM g),
bench AS (SELECT DISTINCT gram FROM gd WHERE doc_id % {CONTAM_MOD} = 0),
cnt AS (SELECT gd.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
        FROM gd JOIN bench USING (gram) WHERE gd.doc_id % {CONTAM_MOD} <> 0 GROUP BY gd.doc_id),
ng AS (SELECT doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_grams FROM gd GROUP BY doc_id)
SELECT d.doc_id, coalesce(ng.n_grams, 0) AS n_grams,
       coalesce(cnt.n_contaminated, 0) AS n_contaminated
FROM documents d LEFT JOIN ng ON ng.doc_id = d.doc_id
LEFT JOIN cnt ON cnt.doc_id = d.doc_id
WHERE d.doc_id % {CONTAM_MOD} <> 0"""


def _sql_prefix_dups() -> str:
    return rf"""
WITH p AS (SELECT doc_id,
    array_to_string(list_slice(regexp_extract_all(text, '\S+'), 1, {PREFIX_K}), ' ') AS prefix
  FROM documents)
SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_dups FROM p GROUP BY prefix"""


def oracle_sql() -> dict[str, str]:
    T.ensure_fixture("sf0.01")  # the graph-family oracles read this path
    return {
        "doc_chunks": _sql_doc_chunks(),
        "pack_bins": _sql_pack_bins(),
        "bm25_scores": _sql_bm25_scores(),
        "contamination": _sql_contamination(),
        "prefix_dups": _sql_prefix_dups(),
        "doc_repetition": r"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents),
g AS (SELECT doc_id, array_to_string(list_slice(ws, i, i + 2), ' ') AS gram
      FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
      WHERE len(ws) >= 3),
d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_total,
             CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct
      FROM g GROUP BY doc_id)
SELECT w.doc_id, coalesce(d.n_total, 0) AS n_grams_total,
       coalesce(d.n_distinct, 0) AS n_grams_distinct
FROM w LEFT JOIN d ON d.doc_id = w.doc_id""",
        "crossdoc_dup": r"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents),
g AS (SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i, i + 2), ' ') AS gram
      FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i) WHERE len(ws) >= 3),
dfq AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
dd AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS nd
       FROM g JOIN dfq USING (gram) GROUP BY g.doc_id),
base AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ngd FROM g GROUP BY doc_id)
SELECT w.doc_id, coalesce(b.ngd, 0) AS n_grams_distinct,
       coalesce(dd.nd, 0) AS n_dup_grams
FROM w LEFT JOIN base b ON b.doc_id = w.doc_id
LEFT JOIN dd ON dd.doc_id = w.doc_id""",
        "edge_log_csv": _GRAPH_CTE + "\nSELECT src, dst, turn_idx FROM mention",
        "pseudo_diameter": _GRAPH_CTE2 + f""",
pd1 AS (
  WITH RECURSIVE w(v, d) AS (
    SELECT (SELECT min(conv_id) FROM ids), 0
    UNION
    SELECT e.b, w.d + 1 FROM w JOIN nbr e ON e.a = w.v WHERE w.d < {BFS_ORACLE_CAP}
  ) SELECT v, min(d) AS d FROM w GROUP BY v
),
far AS (SELECT v FROM pd1 ORDER BY d DESC, v LIMIT 1),
pd2 AS (
  WITH RECURSIVE w2(v, d) AS (
    SELECT (SELECT v FROM far), 0
    UNION
    SELECT e.b, w2.d + 1 FROM w2 JOIN nbr e ON e.a = w2.v WHERE w2.d < {BFS_ORACLE_CAP}
  ) SELECT v, min(d) AS d FROM w2 GROUP BY v
)
SELECT (SELECT v FROM far) AS far_conv,
       CAST(max(d) AS BIGINT) AS pseudo_diameter FROM pd2""",
        "edge_log": _GRAPH_CTE + "\nSELECT src, dst, turn_idx FROM mention",
        # JSONL round-trip must land on the identical mention set
        "edge_log_jsonl": _GRAPH_CTE + "\nSELECT src, dst, turn_idx FROM mention",
        "vertex_dictionary": _GRAPH_CTE
        + "\nSELECT conv_id, CAST(row_number() OVER (ORDER BY conv_id) - 1 AS BIGINT) AS vid FROM ids",
        "edges_encoded_dist": _GRAPH_CTE
        + """,
dict AS (SELECT conv_id, CAST(row_number() OVER (ORDER BY conv_id) - 1 AS BIGINT) AS vid FROM ids)
SELECT ds.vid AS src, dd.vid AS dst, m.turn_idx
FROM mention m JOIN dict ds ON m.src = ds.conv_id JOIN dict dd ON m.dst = dd.conv_id""",
        "out_degrees": _GRAPH_CTE
        + "\nSELECT src AS conv_id, count(*) AS outdeg FROM uedges GROUP BY src",
        "edges_export": _GRAPH_CTE
        + "\nSELECT src AS src_conv, dst AS dst_conv FROM uedges",
        "degree_distribution": _GRAPH_CTE + """
, od AS (SELECT src AS v, count(*)::BIGINT AS degree FROM uedges GROUP BY src),
  idg AS (SELECT dst AS v, count(*)::BIGINT AS degree FROM uedges GROUP BY dst)
SELECT 'out' AS kind, degree, count(*)::BIGINT AS n_vertices FROM od GROUP BY degree
UNION ALL
SELECT 'in' AS kind, degree, count(*)::BIGINT AS n_vertices FROM idg GROUP BY degree""",
        "degree_assortativity": _GRAPH_CTE + """
, od AS (SELECT src AS v, count(*)::BIGINT AS d FROM uedges GROUP BY src),
  idg AS (SELECT dst AS v, count(*)::BIGINT AS d FROM uedges GROUP BY dst)
SELECT count(*)::BIGINT AS m,
       CAST(sum(x.d) AS BIGINT) AS sx, CAST(sum(y.d) AS BIGINT) AS sy,
       CAST(sum(x.d * y.d) AS BIGINT) AS sxy,
       CAST(sum(x.d * x.d) AS BIGINT) AS sxx,
       CAST(sum(y.d * y.d) AS BIGINT) AS syy
FROM uedges e JOIN od x ON x.v = e.src JOIN idg y ON y.v = e.dst""",
        "random_batch": _sql_random_batch(),
        "batch_tidy": _sql_random_batch(tail=_RB_TAIL_TIDY),
        # deletions-bearing dynamic run == cold power iteration on the
        # post-batch edge set (generator + tidy replayed relationally)
        "pagerank_dynamic_deletions": _sql_random_batch(tail=_RB_TAIL_PR_DELS),
        # weighted deletions: weighted_set_update fold replayed as
        # per-instance counts, cold weighted power iteration after
        "pagerank_weighted_dynamic_deletions": _sql_random_batch(
            tail=_RB_TAIL_WPR_DELS),
        # exact heavy hitters == brute-force GROUP BY ... HAVING over the
        # full token stream (the engine's two-pass candidate plan must
        # reproduce it exactly; strict > threshold both sides)
        "heavy_hitter_tokens": rf"""
WITH toks AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                        x -> x <> '')) AS token
              FROM documents),
nn AS (SELECT count(*) AS n FROM toks)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM toks GROUP BY token
HAVING count(*) * {HH_K} > (SELECT n FROM nn)
ORDER BY cnt DESC, token""",
        "self_loops": _GRAPH_CTE
        + "\nSELECT count(*) AS self_loops FROM uedges WHERE src = dst",
        "triangle_total": _GRAPH_CTE
        + """
SELECT count(*) AS triangles
FROM und e1
JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b""",
        # cold per-stage recount of the temporal prefixes the engine
        # maintains incrementally: stage s = first
        # min(m, floor(0.9 m) + s*ceil(1e-3 m)) rows of the ordered log
        "triangles_incremental": f"""WITH tr AS (SELECT * FROM read_parquet('{_FX01}')),
raw AS (SELECT conv_id AS src,
    coalesce(nullif(regexp_extract(tool, '^ref:([A-Za-z0-9_-]+)$', 1), ''),
             nullif(regexp_extract(text, 'see:([A-Za-z0-9_-]+)', 1), '')) AS dst,
    turn_idx, ts FROM tr),
mention AS (SELECT src, dst, turn_idx, ts FROM raw WHERE dst IS NOT NULL),
ordered AS (SELECT src, dst, row_number() OVER (ORDER BY ts, src, turn_idx) AS rn FROM mention),
mm AS (SELECT count(*) AS m FROM mention),
stages AS (SELECT s, least((SELECT m FROM mm),
                 CAST(floor(0.9 * (SELECT m FROM mm)) AS BIGINT)
                 + s * greatest(1, CAST(ceil(0.001 * (SELECT m FROM mm)) AS BIGINT))) AS cut
           FROM (SELECT unnest(range(0, {TRI_INC_BATCHES} + 1)) AS s)),
sund AS (SELECT DISTINCT st.s, least(o.src, o.dst) AS a, greatest(o.src, o.dst) AS b
         FROM stages st JOIN ordered o ON o.rn <= st.cut WHERE o.src <> o.dst),
tri AS (SELECT e1.s FROM sund e1
        JOIN sund e2 ON e2.s = e1.s AND e2.a = e1.a AND e2.b > e1.b
        JOIN sund e3 ON e3.s = e1.s AND e3.a = e1.b AND e3.b = e2.b)
SELECT st.s AS stage, CAST(coalesce(t.n, 0) AS BIGINT) AS triangles
FROM stages st LEFT JOIN (SELECT s, count(*) AS n FROM tri GROUP BY s) t ON t.s = st.s
ORDER BY stage""",
        "triangles_per_vertex": _GRAPH_CTE
        + """,
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
corners AS (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
SELECT i.conv_id AS conv_id, CAST(coalesce(c.n, 0) AS BIGINT) AS triangles
FROM ids i LEFT JOIN (SELECT v, count(*) AS n FROM corners GROUP BY v) c ON c.v = i.conv_id""",
        # same triangle corners + nbr degrees: cc = (2·tri·1e6)//(d(d−1))
        "clustering_coefficient": _GRAPH_CTE2
        + """,
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
corners AS (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
tpv AS (SELECT i.conv_id, CAST(coalesce(c.n, 0) AS BIGINT) AS triangles
        FROM ids i LEFT JOIN (SELECT v, count(*) AS n FROM corners GROUP BY v) c
        ON c.v = i.conv_id),
degs AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS deg FROM nbr GROUP BY a)
SELECT t.conv_id, t.triangles,
       CASE WHEN coalesce(d.deg, 0) >= 2
            THEN (2 * t.triangles * 1000000) // (d.deg * (d.deg - 1))
            ELSE 0 END AS cc_e6
FROM tpv t LEFT JOIN degs d ON d.v = t.conv_id""",
        "pagerank_static": _GRAPH_CTE2 + _PR_CTE
        + "\nSELECT v AS conv_id, rank_e10 FROM prr",
        # personalized PR: same fixed-iteration recursion, restart mass
        # on the 10 highest-out-degree vertices (ties -> lowest conv_id)
        "pagerank_personalized": _GRAPH_CTE2 + _PPR_CTE
        + "\nSELECT v AS conv_id, rank_e10 FROM pprr",
        "pagerank_weighted": _GRAPH_CTE + _WPR_CTE
        + "\nSELECT v AS conv_id, rank_e10 FROM wprr",
        # weighted dynamic replay lands on the one-shot weighted build's
        # exact weights (multiset +1 per instance), so the oracle IS the
        # full-log weighted power iteration
        "pagerank_weighted_dynamic": _GRAPH_CTE + _WPR_CTE
        + "\nSELECT v AS conv_id, rank_e10 FROM wprr",
        # both §2.10 seams composed: weighted pull + personalized restart
        "pagerank_weighted_personalized": _GRAPH_CTE2 + _WPPR_CTE
        + "\nSELECT v AS conv_id, rank_e10 FROM wpprr",
        # cold per-stage power iteration over the temporal prefixes the
        # engine reaches via DF warm restarts: stage s = first
        # min(m, floor(0.8 m) + s*max(1, ceil(0.1 m))) rows of the
        # ordered log, self-loops on the FULL vertex universe
        "pagerank_prefix_stages": f"""WITH tr AS (SELECT * FROM read_parquet('{_FX01}')),
raw AS (SELECT conv_id AS src,
    coalesce(nullif(regexp_extract(tool, '^ref:([A-Za-z0-9_-]+)$', 1), ''),
             nullif(regexp_extract(text, 'see:([A-Za-z0-9_-]+)', 1), '')) AS dst,
    turn_idx, ts FROM tr),
mention AS (SELECT src, dst, turn_idx, ts FROM raw WHERE dst IS NOT NULL),
ids AS (SELECT DISTINCT conv_id FROM
        (SELECT conv_id FROM tr UNION SELECT dst AS conv_id FROM mention)),
ordered AS (SELECT src, dst, row_number() OVER (ORDER BY ts, src, turn_idx) AS rn FROM mention),
mm AS (SELECT count(*) AS m FROM mention),
stages AS (SELECT s, least((SELECT m FROM mm),
                 CAST(floor(0.8 * (SELECT m FROM mm)) AS BIGINT)
                 + s * greatest(1, CAST(ceil(0.1 * (SELECT m FROM mm)) AS BIGINT))) AS cut
           FROM (SELECT unnest(range(0, {PFX_STAGES} + 1)) AS s)),
sed AS (SELECT DISTINCT st.s, o.src, o.dst FROM stages st JOIN ordered o ON o.rn <= st.cut
        UNION SELECT st.s, i.conv_id, i.conv_id FROM stages st CROSS JOIN ids i),
sodeg AS (SELECT s, src AS v, count(*) AS outdeg FROM sed GROUP BY s, src),
nverts AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ids),
prr AS (
  WITH RECURSIVE pr(s, i, v, r) AS (
    SELECT st.s, 0, i.conv_id, (SELECT 1.0 / n FROM nverts)
    FROM stages st CROSS JOIN ids i
    UNION ALL
    SELECT pr.s, pr.i + 1, e.dst,
           (SELECT (1.0 - 0.85) / n FROM nverts)
           + 0.85 * sum(pr.r * (1.0 / od.outdeg))
    FROM pr JOIN sed e ON e.s = pr.s AND e.src = pr.v
         JOIN sodeg od ON od.s = pr.s AND od.v = pr.v
    WHERE pr.i < {PR_ORACLE_ITERS}
    GROUP BY pr.s, pr.i + 1, e.dst
  ) SELECT s, v, CAST(round(r * 1e10) AS BIGINT) AS rank_e10
    FROM pr WHERE i = {PR_ORACLE_ITERS}
)
SELECT s AS stage, v AS conv_id, rank_e10 FROM prr""",
        # HITS: h recursion steps through the co-citation operator
        # (h_i = A Aᵀ h_{i-1} as one flat two-hop sum); authority at the
        # final step derives from h_{K-1}; both end-normalized to unit L2
        "hits_scores": _GRAPH_CTE + f""",
hrec AS (
  WITH RECURSIVE h(i, v, hv) AS (
    SELECT 0, conv_id, CAST(1.0 AS DOUBLE) FROM ids
    UNION ALL
    SELECT h.i + 1, e2.src, CAST(sum(h.hv) AS DOUBLE)
    FROM h JOIN uedges e1 ON e1.src = h.v JOIN uedges e2 ON e2.dst = e1.dst
    WHERE h.i < {HITS_ITERS}
    GROUP BY h.i + 1, e2.src
  ) SELECT i, v, hv FROM h
),
hfin AS (SELECT v, hv FROM hrec WHERE i = {HITS_ITERS}),
hprev AS (SELECT v, hv FROM hrec WHERE i = {HITS_ITERS} - 1),
afin AS (SELECT e.dst AS v, sum(hp.hv) AS av
         FROM hprev hp JOIN uedges e ON e.src = hp.v GROUP BY e.dst),
norms AS (SELECT (SELECT sqrt(sum(av * av)) FROM afin) AS na,
                 (SELECT sqrt(sum(hv * hv)) FROM hfin) AS nh)
SELECT a.v AS conv_id,
       CAST(round(a.av / (SELECT na FROM norms) * 1e10) AS BIGINT) AS auth_e10,
       CAST(round(h.hv / (SELECT nh FROM norms) * 1e10) AS BIGINT) AS hub_e10
FROM afin a JOIN hfin h ON h.v = a.v""",
        # the dynamic protocol (3 ordered insertion batches at 1e-3,
        # 5 variants each) is fully deterministic: fixed partitioning
        # (NUM_PARTS=8), fixed-order per-shard reductions, hash-elected
        # batches. Iteration counts and the l1-convergence flag are
        # therefore frozen expected constants (the rank VALUES them-
        # selves are hash-verified by pagerank_dynamic_ranks against a
        # from-scratch SQL power iteration; dfp's l1 vs the static
        # fixpoint is large by design — it prunes below the tolerance
        # scaled frontier, the documented /N closed-form variant)
        "pagerank_dynamic": """
SELECT CAST(batch AS BIGINT) AS batch, variant,
       CAST(iterations AS BIGINT) AS iterations, l1_error_small
FROM (VALUES
  (0, 'static', 60, true), (0, 'nd', 76, true), (0, 'df', 76, true),
  (0, 'dfp', 23, false), (0, 'dt', 76, true),
  (1, 'static', 61, true), (1, 'nd', 67, true), (1, 'df', 67, true),
  (1, 'dfp', 24, false), (1, 'dt', 67, true),
  (2, 'static', 61, true), (2, 'nd', 64, true), (2, 'df', 64, true),
  (2, 'dfp', 24, false), (2, 'dt', 64, true)
) AS t(batch, variant, iterations, l1_error_small)""",
        # the dynamic-protocol query must land on the SAME fixpoint as a
        # from-scratch power iteration over the complete edge set
        "pagerank_dynamic_ranks": _GRAPH_CTE2 + _PR_CTE
        + "\nSELECT v AS conv_id, rank_e10 FROM prr",
        "pagerank_top20": _GRAPH_CTE2 + _PR_CTE
        + """
SELECT CAST(row_number() OVER (ORDER BY rank_e10 DESC, conv_id) - 1 AS BIGINT) AS pos,
       conv_id, rank_e10
FROM (SELECT v AS conv_id, rank_e10 FROM prr)
ORDER BY pos LIMIT 20""",
        "connected_components": _GRAPH_CTE2 + f""",
ccr AS (
  WITH RECURSIVE cc(i, v, lab) AS (
    SELECT 0, conv_id, conv_id FROM ids
    UNION ALL
    SELECT cc.i + 1, e.b, min(cc.lab) FROM cc JOIN nbrx e ON e.a = cc.v
    WHERE cc.i < {CC_ORACLE_ITERS} GROUP BY cc.i, e.b
  ) SELECT v, lab FROM cc WHERE i = {CC_ORACLE_ITERS}
)
SELECT v AS conv_id, lab AS component_id FROM ccr""",
        "katz_centrality": _sql_katz(),
        "common_neighbors": _GRAPH_CTE2 + _WEDGE_CTE + f""",
cn AS (SELECT x AS a, y AS b, CAST(count(*) AS BIGINT) AS common
       FROM wedges GROUP BY x, y)
SELECT a, b, common FROM cn ORDER BY common DESC, a, b LIMIT {CN_TOP}""",
        "adamic_adar": _GRAPH_CTE2 + _WEDGE_CTE + f""",
aa AS (SELECT x AS a, y AS b,
       CAST(sum(1000000000 // CAST(floor(log2(sd.d)) AS BIGINT)) AS BIGINT) AS aa_e9
       FROM wedges JOIN sdeg sd ON sd.v = wedges.z GROUP BY x, y)
SELECT a, b, aa_e9 FROM aa ORDER BY aa_e9 DESC, a, b LIMIT {CN_TOP}""",
        "reciprocity": _GRAPH_CTE2 + """,
ne AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uedges WHERE src <> dst),
nm AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uedges e1
       JOIN uedges e2 ON e1.src = e2.dst AND e1.dst = e2.src
       WHERE e1.src <> e1.dst)
SELECT ne.n AS n_edges, nm.n AS n_mutual,
       CASE WHEN ne.n > 0 THEN nm.n * 1000000 // ne.n ELSE 0 END AS recip_e6
FROM ne, nm""",
        "avg_neighbor_degree": _GRAPH_CTE2 + """,
sdeg AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS d FROM nbr GROUP BY a),
pv AS (SELECT n.a AS v, any_value(sda.d) AS deg, CAST(sum(sdb.d) AS BIGINT) AS s
       FROM nbr n JOIN sdeg sda ON sda.v = n.a JOIN sdeg sdb ON sdb.v = n.b
       GROUP BY n.a)
SELECT deg AS degree, CAST(count(*) AS BIGINT) AS n_vertices,
       CAST(sum(s) AS BIGINT) AS sum_nbr_deg
FROM pv GROUP BY deg""",
        "graph_summary": _GRAPH_CTE2 + """
SELECT (SELECT CAST(count(*) AS BIGINT) FROM ids) AS n_vertices,
       (SELECT CAST(count(*) AS BIGINT) FROM uedges) AS n_edges_directed,
       (SELECT CAST(count(*) AS BIGINT) FROM uedges WHERE src = dst) AS n_self_loops,
       (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges_undirected,
       (SELECT CAST(max(outdeg) AS BIGINT) FROM odeg) AS max_outdeg,
       (SELECT CAST(max(c) AS BIGINT)
        FROM (SELECT count(*) AS c FROM uedges GROUP BY dst)) AS max_indeg,
       (SELECT CAST(count(*) AS BIGINT) FROM ids
        WHERE conv_id NOT IN (SELECT a FROM nbr)) AS n_isolated""",
        "component_sizes": _GRAPH_CTE2 + f""",
ccr AS (
  WITH RECURSIVE cc(i, v, lab) AS (
    SELECT 0, conv_id, conv_id FROM ids
    UNION ALL
    SELECT cc.i + 1, e.b, min(cc.lab) FROM cc JOIN nbrx e ON e.a = cc.v
    WHERE cc.i < {CC_ORACLE_ITERS} GROUP BY cc.i, e.b
  ) SELECT v, lab FROM cc WHERE i = {CC_ORACLE_ITERS}
),
sz AS (SELECT lab, CAST(count(*) AS BIGINT) AS size FROM ccr GROUP BY lab)
SELECT size, CAST(count(*) AS BIGINT) AS n_components FROM sz GROUP BY size""",
        "maximal_independent_set": _sql_mis(),
        "sssp_weighted": _sql_sssp(),
        "greedy_coloring": _sql_coloring(),
        "temporal_arrival": _sql_temporal_arrival(),
        "walk_counts": _sql_walk_counts(),
        # sequential Batagelj-Zaversnik peel replayed as a recursive
        # windowed edge filter: each step computes per-endpoint degrees
        # with window functions (one reference to the recursive CTE),
        # lifts the watermark to the current min degree, and drops every
        # edge touching a peeled vertex; a vertex's core = the watermark
        # at the step after its last appearance = greatest(k, min-deg)
        # of its last step. Terminates naturally (every step removes at
        # least the min-degree vertex). Isolated vertices core 0.
        "core_numbers": _GRAPH_CTE2 + """,
peel AS (
  WITH RECURSIVE pl(i, k, a, b) AS (
    SELECT 0, 0, a, b FROM nbr
    UNION ALL
    SELECT i + 1, newk, a, b FROM (
      SELECT i, a, b, sd, dd, greatest(k, min(sd) OVER ()) AS newk
      FROM (SELECT i, k, a, b,
                   count(*) OVER (PARTITION BY a) AS sd,
                   count(*) OVER (PARTITION BY b) AS dd
            FROM pl)
    ) WHERE sd > newk AND dd > newk
  ) SELECT i, k, a FROM pl
),
istat AS (SELECT i, max(k) AS k, min(d) AS mind FROM
            (SELECT i, k, a, count(*) AS d FROM peel GROUP BY i, k, a)
          GROUP BY i),
vlast AS (SELECT a AS v, max(i) AS li FROM peel GROUP BY a),
corev AS (SELECT l.v, greatest(s.k, s.mind) AS core
          FROM vlast l JOIN istat s ON s.i = l.li)
SELECT i.conv_id, CAST(coalesce(c.core, 0) AS BIGINT) AS core
FROM ids i LEFT JOIN corev c ON c.v = i.conv_id""",
        # the walk protocol replayed exactly: vid = lexicographic rank,
        # adjacency rank-ordered by dst vid (the engine's CSR stores
        # deduped dst-ascending neighbors), step choice = the same
        # nested mix2 chain, next = the adj row at idx = r % deg
        "random_walks": _sql_random_walks(),
        "harmonic_centrality": _sql_harmonic_centrality(),
        "closeness_sample": _sql_closeness_sample(),
        "scc_of_seeds": _sql_scc_of_seeds(),
        "eccentricity_sample": _sql_eccentricity_sample(),
        "sp_counts": _sql_sp_counts(),
        "edge_support": _GRAPH_CTE2 + """,
cn AS (SELECT n1.a AS x, n2.a AS y, CAST(count(*) AS BIGINT) AS cnt
       FROM nbr n1 JOIN nbr n2 ON n1.b = n2.b AND n1.a < n2.a
       GROUP BY 1, 2),
dict AS (SELECT conv_id, row_number() OVER (ORDER BY conv_id) - 1 AS vid FROM ids)
SELECT da.vid AS a, db.vid AS b, CAST(coalesce(cn.cnt, 0) AS BIGINT) AS support
FROM und e
JOIN dict da ON da.conv_id = e.a
JOIN dict db ON db.conv_id = e.b
LEFT JOIN cn ON cn.x = e.a AND cn.y = e.b""",
        "ktruss": _sql_ktruss(),
        # wedges via nbr self-join; scores exact-integer (c*1e6)//(da+db-c);
        # conv_id lex order == vid order, so tie-breaks match the engine
        "neighborhood_jaccard": _GRAPH_CTE2 + f"""
,wed AS (SELECT n1.b AS lo, n2.b AS hi FROM nbr n1 JOIN nbr n2
         ON n1.a = n2.a AND n1.b < n2.b),
cnt AS (SELECT lo, hi, CAST(count(*) AS BIGINT) AS common FROM wed GROUP BY lo, hi),
degs AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS deg FROM nbr GROUP BY a)
SELECT c.lo AS a, c.hi AS b, c.common,
       (c.common * 1000000) // (d1.deg + d2.deg - c.common) AS jaccard_e6
FROM cnt c JOIN degs d1 ON d1.v = c.lo JOIN degs d2 ON d2.v = c.hi
WHERE c.common >= {JAC_MIN_COMMON}
ORDER BY jaccard_e6 DESC, a, b LIMIT {JAC_TOP}""",
        # same wedge set, weighted by 10^9 // deg(apex) — exact BIGINTs;
        # conv_id lex order == vid order, so tie-breaks match the engine
        "resource_allocation": _GRAPH_CTE2 + f"""
,wed AS (SELECT n1.b AS lo, n2.b AS hi, n1.a AS z FROM nbr n1 JOIN nbr n2
         ON n1.a = n2.a AND n1.b < n2.b),
degs AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS deg FROM nbr GROUP BY a)
SELECT w.lo AS a, w.hi AS b, CAST(sum(1000000000 // d.deg) AS BIGINT) AS ra_e9
FROM wed w JOIN degs d ON d.v = w.z
GROUP BY w.lo, w.hi
ORDER BY ra_e9 DESC, a, b LIMIT {RA_TOP}""",
        # warm restarts must land on the same full-graph components
        "cc_incremental": _GRAPH_CTE2 + f""",
ccr AS (
  WITH RECURSIVE cc(i, v, lab) AS (
    SELECT 0, conv_id, conv_id FROM ids
    UNION ALL
    SELECT cc.i + 1, e.b, min(cc.lab) FROM cc JOIN nbrx e ON e.a = cc.v
    WHERE cc.i < {CC_ORACLE_ITERS} GROUP BY cc.i, e.b
  ) SELECT v, lab FROM cc WHERE i = {CC_ORACLE_ITERS}
)
SELECT v AS conv_id, lab AS component_id FROM ccr""",
        "label_propagation": _GRAPH_CTE2 + _LP_CTE
        + "\nSELECT v AS conv_id, lab AS label_id FROM lpr",
        "lp_incremental": _sql_lp_incremental(),
        "two_hop_counts": _GRAPH_CTE2 + """,
th AS (SELECT DISTINCT n1.a AS a, n2.b AS c
       FROM nbr n1 JOIN nbr n2 ON n2.a = n1.b WHERE n2.b <> n1.a
       UNION SELECT a, b FROM nbr),
cnt AS (SELECT a, CAST(count(*) AS BIGINT) AS n FROM th GROUP BY a)
SELECT i.conv_id, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_two_hop
FROM ids i LEFT JOIN cnt ON cnt.a = i.conv_id""",
        "two_hop_capped": _GRAPH_CTE2 + """,
rk AS (SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY b) AS rn,
              count(*) OVER (PARTITION BY a) AS deg FROM nbr),
kept AS (SELECT a, b FROM rk WHERE rn <= 3),
ovr AS (SELECT a, max(CASE WHEN deg > 3 THEN 1 ELSE 0 END) AS ov
        FROM rk GROUP BY a),
th AS (SELECT DISTINCT k1.a AS a, k2.b AS c
       FROM kept k1 JOIN kept k2 ON k2.a = k1.b WHERE k2.b <> k1.a
       UNION SELECT a, b FROM kept),
cnt AS (SELECT a, CAST(count(*) AS BIGINT) AS n FROM th GROUP BY a),
fl AS (SELECT k.a, max(CASE WHEN o1.ov = 1 OR o2.ov = 1 THEN 1 ELSE 0 END) AS tr
       FROM kept k JOIN ovr o1 ON o1.a = k.a JOIN ovr o2 ON o2.a = k.b
       GROUP BY k.a)
SELECT i.conv_id, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_two_hop,
       CAST(coalesce(fl.tr, 0) AS BIGINT) AS truncated
FROM ids i LEFT JOIN cnt ON cnt.a = i.conv_id
LEFT JOIN fl ON fl.a = i.conv_id""",
        "media_stats": _sql_media_stats(),
        "image_resize": _sql_image_resize(),
        "audio_energy": _sql_audio_energy(),
        "frame_diffs": _sql_frame_diffs(),
        # quotient graph over distinct unordered non-loop vertex pairs
        "community_graph": _GRAPH_CTE2 + _LP_CTE + """
SELECT least(l1.lab, l2.lab) AS ca, greatest(l1.lab, l2.lab) AS cb,
       count(*)::BIGINT AS weight
FROM und e JOIN lpr l1 ON l1.v = e.a JOIN lpr l2 ON l2.v = e.b
GROUP BY 1, 2""",
        "bfs_distances": _GRAPH_CTE2 + f""",
bfsw AS (
  WITH RECURSIVE w(v, d) AS (
    SELECT (SELECT min(conv_id) FROM ids), 0
    UNION
    SELECT e.b, w.d + 1 FROM w JOIN nbr e ON e.a = w.v WHERE w.d < {BFS_ORACLE_CAP}
  ) SELECT v, min(d) AS d FROM w GROUP BY v
)
SELECT i.conv_id AS conv_id, CAST(coalesce(b.d, -1) AS BIGINT) AS distance
FROM ids i LEFT JOIN bfsw b ON b.v = i.conv_id""",
        "modularity": _GRAPH_CTE2 + _LP_CTE
        + """,
m2 AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM nbr),
terms AS (
  SELECT la.lab AS c,
         sum(CASE WHEN la.lab = lb.lab THEN 1 ELSE 0 END) AS within,
         count(*) AS degsum
  FROM nbr JOIN lpr la ON la.v = nbr.a JOIN lpr lb ON lb.v = nbr.b
  GROUP BY la.lab
)
SELECT CAST(round(sum(within / (SELECT m FROM m2)
                      - (degsum / (SELECT m FROM m2)) * (degsum / (SELECT m FROM m2))) * 1e9)
            AS BIGINT) AS modularity_e9
FROM terms""",
        "embedding_neardup_lsh": _sql_embedding_neardup_lsh(),
        "knn_lsh": _sql_knn_lsh(),
        "knn_ivf": _sql_knn_ivf(),
        "minhash_dedup": _sql_minhash_dedup(),
        "ngram_jaccard": _sql_ngram_jaccard(),
        # same dsh shingle sets; dup = k-grams whose corpus count >= 2.
        # LEFT JOIN keeps zero-shingle docs (none in testdata, engine
        # emits them with n_ngrams=0)
        "ngram_dup_profile": f"""
WITH {_sql_dsh_ctes()},
cnt AS (SELECT sh, count(*) AS n FROM dsh GROUP BY sh),
prof AS (
  SELECT d.doc_id,
         CAST(count(*) AS BIGINT) AS n_ngrams,
         CAST(coalesce(sum(CASE WHEN c.n >= 2 THEN 1 END), 0) AS BIGINT) AS dup_ngrams
  FROM dsh d JOIN cnt c ON c.sh = d.sh GROUP BY d.doc_id
)
SELECT dd.doc_id, coalesce(p.n_ngrams, 0) AS n_ngrams,
       coalesce(p.dup_ngrams, 0) AS dup_ngrams
FROM documents dd LEFT JOIN prof p ON p.doc_id = dd.doc_id""",
        "doc_fingerprint": _sql_fingerprint(),
        "hash_split": _sql_hash_split(),
        "pii_scrub": _sql_pii_scrub(),
        "curation_pipeline": _sql_curation_pipeline(),
        "hll_distinct": _sql_hll_distinct(),
        "hll_users_by_type": _sql_hll_by_key("event_type", "user_id", 1),
        "doc_ntile": """
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
       NTILE(10) OVER (ORDER BY n_chars, doc_id) AS tile
FROM documents""",
        "doc_window_ranks": """
WITH r AS (SELECT doc_id,
                  row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
                  dense_rank() OVER (ORDER BY n_chars) AS dr,
                  count(*) OVER () AS n
           FROM documents)
SELECT doc_id, rn::BIGINT AS rn, dr::BIGINT AS dense_rank,
       (((rn - 1) * 1000000000) // greatest(n - 1, 1))::BIGINT AS pr_e9
FROM r""",
        "doc_len_quantiles": _sql_doc_len_quantiles(),
        "value_quantiles_binned": _sql_value_quantiles_binned(),
        "len_quantiles_by_lang": _sql_len_quantiles_by_lang(),
        "countmin_user_counts": _sql_countmin(),
        "bloom_semi": _sql_bloom_semi(),
        "stratified_sample": _sql_stratified_sample(),
        "sample_per_key": _sql_sample_per_key(),
        "topk_events_per_user": f"""
SELECT event_id, user_id, value FROM (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn
  FROM events) WHERE rn <= {TOPK_PER_USER}""",
        "mode_event_per_user": """
SELECT user_id, event_type, n FROM (
  SELECT user_id, event_type, count(*) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type) WHERE rn = 1""",
        "vocabulary": f"""
SELECT t AS token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents)
GROUP BY t ORDER BY n DESC, t LIMIT {VOCAB_TOP}""",
        "inverted_index": f"""
WITH tok AS (SELECT DISTINCT doc_id, token FROM
  (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents))
SELECT token, CAST(count(*) AS BIGINT) AS df,
       array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, {INVIDX_K}), ',')
         AS postings
FROM tok GROUP BY token""",
        "cooccurrence_pmi": f"""
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text,'\\S+')) AS token,
                    generate_subscripts(regexp_extract_all(text,'\\S+'),1) AS i FROM documents),
uni AS (SELECT token, count(*)::BIGINT AS c FROM tok GROUP BY token),
tu AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni),
pairs AS (SELECT least(t1.token,t2.token) || ' ' || greatest(t1.token,t2.token) AS pair,
                 count(*)::BIGINT AS n
          FROM tok t1 JOIN tok t2
            ON t1.doc_id = t2.doc_id AND t2.i - t1.i BETWEEN 1 AND {PMI_WINDOW}
          GROUP BY 1),
tp AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM pairs),
top AS (SELECT pair, n FROM pairs ORDER BY n DESC, pair LIMIT {PMI_TOPK})
SELECT top.pair, top.n, ua.c AS c_a, ub.c AS c_b,
  tu.t AS t_u, tp.t AS t_p
FROM top, tu, tp
JOIN uni ua ON ua.token = split_part(top.pair, ' ', 1)
JOIN uni ub ON ub.token = split_part(top.pair, ' ', 2)""",
        "tfidf_top_terms": f"""
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, token),
dft AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
SELECT doc_id, token,
       CAST(round(tf * ln((SELECT n FROM nn) / df) * 1e6) AS BIGINT) AS tfidf_e6
FROM tf JOIN dft USING (token)
QUALIFY row_number() OVER (
  PARTITION BY doc_id
  ORDER BY CAST(round(tf * ln((SELECT n FROM nn) / df) * 1e6) AS BIGINT) DESC, token
) <= {TFIDF_K}""",
        "simhash_dedup": _sql_simhash_dedup(),
        "multimodal_decode": _sql_multimodal_decode(),
        "frame_sample": _sql_frame_sample(),
        "lineitem_agg": """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows, sum(l_quantity) AS sum_qty,
       min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "top_customers": """
SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
ORDER BY n_orders DESC, o_custkey LIMIT 10""",
        "distinct_flags": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "events_summary": """
SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type""",
        "anti_join_users": """
SELECT DISTINCT user_id FROM events
WHERE event_type = 'purchase' AND value > 100
  AND user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'error' AND value > 100)""",
        "orders_by_segment": """
SELECT c.c_mktsegment AS segment, count(*) AS n_orders,
       min(o.o_totalprice) AS min_price, max(o.o_totalprice) AS max_price
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment""",
        "revenue_by_nation": """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_e4
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name ORDER BY n.n_name""",
        "orders_rollup": """
SELECT COALESCE(c.c_mktsegment, 'ALL') AS segment,
       COALESCE(year(o.o_orderdate), -1)::BIGINT AS yr,
       count(*)::BIGINT AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_price_c
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY ROLLUP(c.c_mktsegment, year(o.o_orderdate))""",
        "orders_cube": """
SELECT COALESCE(c.c_mktsegment, 'ALL') AS segment,
       COALESCE(year(o.o_orderdate), -1)::BIGINT AS yr,
       count(*)::BIGINT AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_price_c
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY CUBE(c.c_mktsegment, year(o.o_orderdate))""",
        "events_pivot": """
SELECT user_id,
       SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
       SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
       SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
       SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup,
       SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view
FROM events GROUP BY user_id""",
        # pivot -> melt(drop_zero) roundtrip == the sparse grouped count
        "events_unpivot": """
SELECT user_id, event_type, count(*)::BIGINT AS n
FROM events GROUP BY user_id, event_type""",
        "supplier_region": """
SELECT s.s_suppkey, s.s_name, n.n_name, r.r_name
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey""",
        "salted_event_counts": """
SELECT event_type, count(*)::BIGINT AS n FROM events GROUP BY event_type""",
        "copurchase_pairs": """
WITH cp AS (SELECT DISTINCT l.l_partkey AS p, o.o_custkey AS c
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
SELECT a.c AS a, b.c AS b, count(*)::BIGINT AS shared
FROM cp a JOIN cp b ON b.p = a.p AND a.c < b.c
GROUP BY 1, 2
ORDER BY shared DESC, a, b LIMIT 100""",
        "copurchase_capped": """
WITH cp AS (SELECT DISTINCT l.l_partkey AS p, o.o_custkey AS c
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
rk AS (SELECT p, c, row_number() OVER (PARTITION BY p ORDER BY c) AS rn,
              count(*) OVER (PARTITION BY p) AS sz FROM cp),
kept AS (SELECT p, c, CASE WHEN sz > 4 THEN 1 ELSE 0 END AS fl
         FROM rk WHERE rn <= 4)
SELECT a.c AS a, b.c AS b, count(*)::BIGINT AS shared,
       max(a.fl)::BIGINT AS truncated
FROM kept a JOIN kept b ON b.p = a.p AND a.c < b.c
GROUP BY 1, 2
ORDER BY shared DESC, a, b LIMIT 100""",
        "lineitem_profile": _sql_lineitem_profile(),
        "props_sum": r"""
SELECT event_type,
       SUM(CAST(coalesce(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), ''), '0')
                AS BIGINT))::BIGINT AS sum_k,
       count(*)::BIGINT AS n
FROM events GROUP BY event_type""",
        "user_churn": f"""
WITH h1 AS (SELECT user_id, count(*)::BIGINT AS n_h1 FROM events
            WHERE ts < TIMESTAMP '{CHURN_CUTOFF.replace("T", " ")}' GROUP BY user_id),
h2 AS (SELECT user_id, count(*)::BIGINT AS n_h2 FROM events
       WHERE ts >= TIMESTAMP '{CHURN_CUTOFF.replace("T", " ")}' GROUP BY user_id)
SELECT coalesce(h1.user_id, h2.user_id) AS user_id,
       coalesce(h1.n_h1, 0)::BIGINT AS n_h1, coalesce(h2.n_h2, 0)::BIGINT AS n_h2,
       CASE WHEN h1.user_id IS NOT NULL AND h2.user_id IS NOT NULL THEN 'retained'
            WHEN h1.user_id IS NOT NULL THEN 'churned' ELSE 'new' END AS status
FROM h1 FULL OUTER JOIN h2 ON h1.user_id = h2.user_id""",
        "value_stats_by_type": """
SELECT event_type, count(*)::BIGINT AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_c,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                * CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_sq_c
FROM events GROUP BY event_type""",
        "distinct_users_by_type": """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_distinct
FROM events GROUP BY event_type""",
        # greedy min-time funnel: each stage's first event strictly
        # after the previous stage's time; -1 = stage not reached
        "funnel_events": """
WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
       JOIN s1 ON s1.user_id = e.user_id
       WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
       JOIN s2 ON s2.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2 GROUP BY e.user_id)
SELECT u.user_id,
       (CASE WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS stages_completed,
       coalesce(s1.t1, -1)::BIGINT AS t_signup_us,
       coalesce(s2.t2, -1)::BIGINT AS t_click_us,
       coalesce(s3.t3, -1)::BIGINT AS t_purchase_us
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN s1 ON s1.user_id = u.user_id
LEFT JOIN s2 ON s2.user_id = u.user_id
LEFT JOIN s3 ON s3.user_id = u.user_id""",
        # same quantization as embedding_covariance; one row per (label, dim)
        "label_centroids": """
WITH el AS (SELECT label, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i FROM embeddings),
q AS (SELECT label::BIGINT AS label, i - 1 AS dim,
             CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) AS q FROM el)
SELECT label, dim::BIGINT AS dim, CAST(sum(q) AS BIGINT) AS s,
       count(*)::BIGINT AS n
FROM q GROUP BY label, dim""",
        "windowed_events": """
SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS window_start,
       event_type, count(*)::BIGINT AS n_events,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2""",
        "hopping_events": """
SELECT make_timestamp(((epoch_us(ts) // 21600000000) - r.i) * 21600000000)
         AS window_start,
       event_type, count(*)::BIGINT AS n_events,
       min(value) AS min_value, max(value) AS max_value
FROM events CROSS JOIN (SELECT unnest(range(4)) AS i) r
GROUP BY 1, 2""",
        "asof_purchase_click": """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT * FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts, l.click_id, l.click_ts,
       (epoch_us(p.ts) - epoch_us(l.click_ts))::BIGINT AS gap_us
FROM p, LATERAL (
  SELECT c.event_id AS click_id, c.ts AS click_ts FROM c
  WHERE c.user_id = p.user_id AND c.ts <= p.ts
  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) l""",
        "attribution_window": """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT * FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id,
       (SELECT count(*) FROM c
        WHERE c.user_id = p.user_id
          AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts)::BIGINT AS n_clicks
FROM p""",
        "sessions": """
WITH x AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid FROM x)
SELECT user_id, sid::BIGINT AS session_seq, min(ts) AS session_start,
       max(ts) AS session_end, count(*)::BIGINT AS n_events
FROM y GROUP BY 1, 2""",
        "rolling_sum": """
SELECT event_id, user_id,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_sum_c
FROM events""",
        "running_total": """
SELECT event_id, user_id,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_sum_c
FROM events""",
        "event_gaps": """
SELECT event_id, user_id,
       COALESCE(epoch_us(ts) - epoch_us(LAG(ts) OVER (
         PARTITION BY user_id ORDER BY ts, event_id)), -1)::BIGINT AS gap_us
FROM events""",
        "exact_dedup": "SELECT min(doc_id) AS doc_id, count(*) AS n_dups FROM documents GROUP BY text",
        "exact_dedup_norm": r"""
WITH nrm AS (SELECT doc_id,
  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                      '\s+', ' ', 'g')) AS t
  FROM documents)
SELECT min(doc_id) AS doc_id, count(*) AS n_dups FROM nrm GROUP BY t""",
        "temperature_resample": _sql_temperature_resample(),
        "doc_tokens": r"""
SELECT doc_id, length(text) AS n_chars,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+')) AS BIGINT) AS n_tokens_bpe
FROM documents""",
        "doc_lang": f"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-zà-ÿ]+') AS ws FROM documents),
h AS (SELECT doc_id,
        len(list_filter(ws, x -> x IN ({_DE}))) AS de,
        len(list_filter(ws, x -> x IN ({_EN}))) AS en,
        len(list_filter(ws, x -> x IN ({_ES}))) AS es,
        len(list_filter(ws, x -> x IN ({_FR}))) AS fr
      FROM w)
SELECT doc_id, CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
  WHEN de >= en AND de >= es AND de >= fr THEN 'de'
  WHEN en >= es AND en >= fr THEN 'en'
  WHEN es >= fr THEN 'es' ELSE 'fr' END AS lang FROM h""",
        "doc_quality": rf"""
WITH f AS (SELECT doc_id, length(text) AS n_chars,
        len(regexp_extract_all(text, '\S+')) AS n_tok,
        len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
        len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
        len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'), x -> x IN ({_EN}))) AS n_stop
      FROM documents),
g AS (SELECT doc_id,
        n_punct / greatest(n_chars, 1) AS punct_ratio,
        n_upper / greatest(n_chars, 1) AS upper_ratio,
        n_stop / greatest(n_tok, 1) AS stop_ratio,
        (n_chars - greatest(n_tok - 1, 0)) / greatest(n_tok, 1) AS mean_token_len
      FROM f)
SELECT doc_id, punct_ratio, upper_ratio, stop_ratio,
       least(greatest(0.3 + 0.5 * stop_ratio - punct_ratio - greatest(mean_token_len - 12, 0) * 0.02, 0.0), 1.0) AS quality
FROM g""",
        "quality_filter": rf"""
WITH f AS (SELECT doc_id, length(text) AS n_chars,
        len(regexp_extract_all(text, '\S+')) AS n_tok,
        len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
        regexp_extract_all(lower(text), '[a-zà-ÿ]+') AS ws
      FROM documents),
g AS (SELECT doc_id, n_tok,
        n_punct / greatest(n_chars, 1) AS punct_ratio,
        len(list_filter(ws, x -> x IN ({_EN}))) / greatest(n_tok, 1) AS stop_ratio,
        (n_chars - greatest(n_tok - 1, 0)) / greatest(n_tok, 1) AS mean_token_len,
        len(list_filter(ws, x -> x IN ({_DE}))) AS de,
        len(list_filter(ws, x -> x IN ({_EN}))) AS en,
        len(list_filter(ws, x -> x IN ({_ES}))) AS es,
        len(list_filter(ws, x -> x IN ({_FR}))) AS fr
      FROM f),
h AS (SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens_ws,
        least(greatest(0.3 + 0.5 * stop_ratio - punct_ratio
                       - greatest(mean_token_len - 12, 0) * 0.02, 0.0), 1.0) AS quality,
        CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
             WHEN de >= en AND de >= es AND de >= fr THEN 'de'
             WHEN en >= es AND en >= fr THEN 'en'
             WHEN es >= fr THEN 'es' ELSE 'fr' END AS lang
      FROM g)
SELECT doc_id, n_tokens_ws, quality, lang FROM h
WHERE quality >= 0.2 AND n_tokens_ws >= 5""",
        "embedding_neardup": """
SELECT e1.vec_id AS a, e2.vec_id AS b
FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= 0.45""",
        "embedding_covariance": """
WITH el AS (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i FROM embeddings),
q AS (SELECT vec_id, i - 1 AS i,
             CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) AS q FROM el),
nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
s AS (SELECT i, CAST(sum(q) AS BIGINT) AS s FROM q GROUP BY i),
c AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS c
      FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i GROUP BY 1, 2)
SELECT c.i, c.j, CAST(nn.n * c.c - sa.s * sb.s AS BIGINT) AS cov_num
FROM c, nn
JOIN s sa ON sa.i = c.i
JOIN s sb ON sb.i = c.j""",
        "kmeans_clusters": _sql_kmeans(),
        "knn_bruteforce": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 5),
s AS (SELECT q.qid, e.vec_id AS nid, list_cosine_similarity(q.qe, e.embedding) AS cos
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
r AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) - 1 AS rk FROM s)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rk AS BIGINT) AS knn_rank FROM r WHERE rk < 10""",
    }
