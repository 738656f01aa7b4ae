"""Top-level engine API: transcripts -> graph -> analytics.

The public entry points a reference user would call, re-expressed
Ray-Data-first. The flagship flow mirrors the reference experiment
driver (/root/reference/main.cu:48-148): load the temporal prefix as the
base graph, add self-loops, then replay insertion batches running the
five PageRank variants (+ CC / LP / triangles from SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data as rd

from .options import PagerankOptions, PagerankResult
from .pipelines.graph import GraphContext
from .sources import edges as E
from .sources import transcripts as T


# Above this many transcript rows, "auto" switches the vertex dictionary
# to the distributed (Dataset + hash-join) path: a broadcast numpy
# universe at ~16 B/id passes ~1 GiB per node around 5e7 ids, and the
# driver-side unique-merge stops being free well before 1e9.
DIST_DICT_THRESHOLD = 50_000_000


def _transcript_rows(path: str) -> int:
    """Row count from Parquet metadata only (no data read)."""
    import pyarrow.dataset as pads

    return pads.dataset(path).count_rows()


def auto_num_parts(num_edges: int) -> int:
    """Partition count sized to the data: ~150k edges per shard, clamped
    to [2, cpus-2] — small graphs avoid paying P×-scale exchange setup,
    big graphs use every core."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return int(np.clip(num_edges // 150_000, 2, max(2, cpus - 2)))


def build_graph(
    transcripts_path: str,
    num_parts: int | None = 8,
    add_self_loops: bool = True,
    temporal: bool = False,
    base_fraction: float = 0.90,
    batch_fraction: float = 1e-3,
    num_batches: int = 5,
    num_cpus_per_shard: float = 0.5,
    hub_split_threshold: int | None = None,
    dictionary_mode: str = "auto",
    weighted: bool = False,
):
    """Transcripts Parquet -> (GraphContext, insertion batches).

    With ``temporal=False`` the whole edge log becomes the graph and the
    batch list is empty. With ``temporal=True``, mirrors main.cu:167:
    the first ``base_fraction`` of the ordered mention-edge log is the
    base graph and the next ``num_batches`` windows of
    ``batch_fraction * M`` edges are returned as insertion batches
    ((2,k) vid arrays, temporal order preserved). ``num_parts=None``
    auto-sizes the shard count from the edge count.

    ``weighted=True``: edge weight = mention multiplicity — each
    (src, dst) pair carries the number of times dst is mentioned across
    src's turns (plus 1 for the structural self-loop). Composes with
    ``temporal=True``: insertion batches fold through the multiset
    update (+1 weight per instance), so the post-replay weights equal a
    one-shot weighted build of the full log.

    ``dictionary_mode``: ``"broadcast"`` builds the id->vid dictionary
    as one sorted numpy array shipped via ``ray.put`` (fast, fine up to
    ~10^8 ids); ``"distributed"`` keeps it a Dataset and encodes via
    hash joins — the driver never holds the universe (the 100 TB path);
    ``"auto"`` picks by the transcript row count
    (``DIST_DICT_THRESHOLD``). Both produce identical vids (the
    dictionary sort orders agree for ASCII conv_ids).
    """
    # column-pruned reads: edge extraction touches 5 columns, the
    # dictionary pass only conv_id — never load `role`/`text` twice
    ts = E.read_transcripts(
        transcripts_path, columns=["conv_id", "turn_idx", "text", "tool", "ts"]
    )
    raw_edges = E.extract_edges(ts).materialize()
    if num_parts is None:
        num_parts = auto_num_parts(raw_edges.count())
    ts_ids = E.read_transcripts(transcripts_path, columns=["conv_id"])
    if dictionary_mode == "auto":
        dictionary_mode = (
            "distributed" if _transcript_rows(transcripts_path) > DIST_DICT_THRESHOLD
            else "broadcast"
        )
    dictionary = dict_ds = None
    if dictionary_mode == "distributed":
        dict_ds = E.vertex_dictionary_ds(ts_ids, raw_edges).materialize()
        n = dict_ds.count()
        # materialize the join output BEFORE the shard actor pool exists:
        # the join's aggregator actors and the pool would otherwise
        # compete for CPU slots (blocks stay in the object store / spill)
        encoded_all = E.encode_edges_ds(
            raw_edges, dict_ds, num_partitions=num_parts
        ).materialize()
    else:
        dictionary = E.vertex_dictionary(ts_ids, raw_edges)
        n = len(dictionary)
        encoded_all = E.encode_edges(raw_edges, ray.put(dictionary))
    batches: list[np.ndarray] = []
    if temporal:
        # Encode BEFORE the global sort: vids are positions in the
        # sorted string dictionary, so ordering by (ts, src_vid,
        # turn_idx) is the identical total order as the string key —
        # but the shuffle compares int64 and ships ints, not strings.
        # Materialize the sorted log ONCE — split_at_indices would
        # otherwise re-execute the distributed sort per consumer.
        log = encoded_all.sort(["ts", "src", "turn_idx"]).materialize()
        base, batch_ds = E.temporal_split(log, base_fraction, batch_fraction, num_batches)
        encoded = base
        for b in batch_ds:
            pdf = b.to_pandas()  # batches are small (1e-3 * M)
            batches.append(np.stack([
                pdf["src"].to_numpy().astype(np.int64),
                pdf["dst"].to_numpy().astype(np.int64),
            ]))
    else:
        encoded = encoded_all
    ctx = GraphContext.from_edges(
        encoded.select_columns(["src", "dst"]), n, num_parts, dictionary, add_self_loops,
        num_cpus_per_shard=num_cpus_per_shard, hub_split_threshold=hub_split_threshold,
        dictionary_ds=dict_ds, weighted=weighted,
    )
    return ctx, batches


def pagerank(
    transcripts_path: str,
    num_parts: int = 8,
    options: PagerankOptions | None = None,
) -> tuple[GraphContext, PagerankResult]:
    """One-shot static PageRank over the full transcript-derived graph."""
    ctx, _ = build_graph(transcripts_path, num_parts)
    return ctx, ctx.pagerank("static", options=options)


def run_temporal_experiment(
    transcripts_path: str,
    num_parts: int = 8,
    variants: tuple[str, ...] = ("static", "nd", "df", "dfp", "dt"),
    options: PagerankOptions | None = None,
    base_fraction: float = 0.90,
    batch_fraction: float = 1e-3,
    num_batches: int = 5,
    ranks_out_dir: str | None = None,
) -> dict:
    """The reference's batch-update benchmark protocol (main.cu:79-147).

    Builds the base graph from the first 90% of the ordered edge log,
    computes a static ground truth, then per insertion batch: tidy ->
    snapshot marks -> apply -> run each variant warm-started from its own
    previous ranks -> compare to a fresh static run (L1 error, the
    reference's oracle metric, main.cu:55, 88).

    ``ranks_out_dir``: when set, each variant's FINAL ranks (after the
    last batch) are written as partitioned Parquet under
    ``{dir}/ranks_{variant}``. The shard actor pool is released before
    returning either way — callers receive metrics, not a live pool.
    """
    o = options or PagerankOptions()
    ctx, batches = build_graph(
        transcripts_path, num_parts, temporal=True,
        base_fraction=base_fraction, batch_fraction=batch_fraction, num_batches=num_batches,
    )
    base_res = ctx.pagerank("static", options=o)
    warm = {v: list(base_res.ranks) for v in variants}
    out = {"base_iterations": base_res.iterations, "batches": []}
    empty = np.empty((2, 0), dtype=np.int64)
    for bi, batch in enumerate(batches):
        dels, ins = ctx.tidy_batch(empty, batch)
        # DF/DT marking order (pagerank.hxx:645-676): deletion sources
        # expand in the OLD graph x (before apply), insertion sources in
        # the UPDATED graph y (after apply).
        marks_del = ctx.compute_frontier_marks(dels, empty)
        ctx.apply_batch(dels, ins)
        marks_ins = ctx.compute_frontier_marks(empty, ins)
        marks = [
            np.unique(np.concatenate([a, b])) for a, b in zip(marks_del, marks_ins)
        ]
        truth = ctx.pagerank("static", options=o)
        rec = {}
        for v in variants:
            # the 'static' variant IS the ground-truth computation (same
            # graph, same options, deterministic) — reuse it rather than
            # converging the identical run twice per batch. The reference
            # separates them only because its s0 uses tolerance 1e-100
            # (main.cu:88) while the timed static uses the method
            # tolerance.
            res = (
                truth
                if v == "static"
                else ctx.pagerank(v, warm=warm[v], options=o, initial_marks=marks)
            )
            warm[v] = list(res.ranks)
            # scalar-folded ||res - truth||_1: per-shard partials, P
            # floats to the driver — never an assembled N-vector (the
            # round-2 shape concatenated full rank vectors driver-side,
            # 8 GB at 10⁹ vertices). The pool's live ranks ARE res's
            # ranks here (just computed), so norm_delta reads in place;
            # the reused static run is identically its own truth.
            err = 0.0 if res is truth else ctx.norm_delta(truth.ranks, ord=1)
            rec[v] = {"iterations": res.iterations, "time": res.time, "l1_error": err}
        out["batches"].append(rec)
    if ranks_out_dir is not None:
        import os as _os

        for v in variants:
            ctx.ranks_dataset(warm[v]).write_parquet(
                _os.path.join(ranks_out_dir, f"ranks_{v}")
            )
    ctx.shutdown()
    return out
