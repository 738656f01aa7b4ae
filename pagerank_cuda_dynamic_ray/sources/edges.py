"""Transcript -> edge-table derivation (Ray Data, zero-copy Arrow).

Re-expresses the reference's temporal edge-stream source
(/root/reference/inc/snap.hxx:41-109 ``readTemporalDo``) Ray-Data-first:
instead of parsing ``u v`` text lines in file order, we

1. ``read_parquet`` the transcript table (column-pruned),
2. ``map_batches`` (pyarrow, vectorized regex) to extract
   conv_id -> conv_id mention edges: ``text`` turns carrying a
   ``see:<conv_id>`` token and ``tool`` turns carrying ``ref:<conv_id>``,
3. globally ``sort`` by ``(ts, src, turn_idx)`` — the stable per-turn
   ordering that replaces the reference's load-bearing file-line order
   (/root/reference/inc/snap.hxx:41-53),
4. split the ordered log into base graph (first 90%) + insertion batches
   (next ``batch_fraction * M`` rows each), exactly the protocol of
   /root/reference/main.cu:167, 79-85 — via ``Dataset.split_at_indices``
   (order-preserving, no driver materialization).

Vertex universe: every conv_id present in the transcripts (even if it
never appears in an edge) — mirroring the reference pre-declaring the
full vertex range before edges (/root/reference/inc/snap.hxx:133), so
isolated conversations still receive ranks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

TEXT_MENTION_RE = r"see:(?P<dst>[A-Za-z0-9_\-]+)"
TOOL_MENTION_RE = r"^ref:(?P<dst>[A-Za-z0-9_\-]+)$"

EDGE_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("ts", pa.timestamp("us")),
        ("turn_idx", pa.int32()),
    ]
)


def cluster_cpus(default: int = 8) -> int:
    """Session CPU count (``default`` when Ray is down) — the ONE probe
    behind every read/partition sizing decision in this module."""
    return int(ray.cluster_resources().get("CPU", default)) if ray.is_initialized() else default


def _uniq_ids(col: str):
    """Per-block distinct-id combiner shared by both dictionary builds:
    blocks shrink to their unique ids before leaving the read tasks."""
    def f(t: pa.Table) -> pa.Table:
        return pa.table({"id": pc.unique(t[col])})

    return f


def read_transcripts(path: str, columns: list[str] | None = None,
                     parallelism: int | None = None) -> rd.Dataset:
    """Column-pruned Parquet read of a transcript table.

    ``parallelism=None`` sizes the block count to the cluster: Ray's
    default splitting over-fragments small-file inputs (72 blocks for a
    single 25 MB file), and per-block task overhead then dominates the
    downstream map/sort stages. One block per core is enough to keep
    every core busy through extract/encode while keeping sort fan-in low.
    """
    if parallelism is None:
        cpus = cluster_cpus()
        parallelism = max(8, cpus)
    return rd.read_parquet(path, columns=columns, override_num_blocks=parallelism)


def _normalize_transcripts(columns: list[str] | None):
    """Shared per-batch normalizer for the non-Parquet transcript
    sources (JSONL, CSV): cast to the canonical schema so every
    downstream stage (extract/encode/replay) is source-agnostic.
    ``ts`` arrives as int64 epoch-microseconds or an ISO string (with
    or without fractional seconds — the two common export forms) and
    becomes timestamp[us]; ``turn_idx`` -> int32; id/text fields ->
    string (a null from a CSV empty cell stays null, which the mention
    extractor already treats as "no mention")."""

    def norm(t: pa.Table) -> pa.Table:
        cols = {}
        names = columns or ["conv_id", "turn_idx", "text", "tool", "ts"]
        for c in names:
            arr = t[c]
            if c == "ts" and not pa.types.is_timestamp(arr.type):
                if pa.types.is_integer(arr.type):
                    arr = arr.cast(pa.timestamp("us"))
                else:
                    # Arrow's native string->timestamp cast parses ISO
                    # 8601 with OR without fractional seconds (pyarrow's
                    # strptime lacks %f entirely, so the old strptime
                    # branch rejected '...T00:00:00.123456')
                    arr = arr.cast(pa.string()).cast(pa.timestamp("us"))
            elif c == "turn_idx":
                arr = arr.cast(pa.int32())
            elif c in ("conv_id", "text", "tool"):
                arr = arr.cast(pa.string())
            cols[c] = arr
        return pa.table(cols)

    return norm


def read_transcripts_jsonl(path: str, columns: list[str] | None = None,
                           parallelism: int | None = None) -> rd.Dataset:
    """JSONL transcript source — the same logical table as the Parquet
    reader, for pipelines whose upstream emits newline-delimited JSON
    (log shippers, API dumps). Column pruning happens batch-side (JSON
    has no column projection at the read, unlike Parquet — a documented
    format cost). Schema normalization: :func:`_normalize_transcripts`."""
    if parallelism is None:
        cpus = cluster_cpus()
        parallelism = max(8, cpus)
    ds = rd.read_json(path, override_num_blocks=parallelism)
    return ds.map_batches(_normalize_transcripts(columns), batch_format="pyarrow")


def read_transcripts_csv(path: str, columns: list[str] | None = None,
                         parallelism: int | None = None) -> rd.Dataset:
    """CSV transcript source — the same logical table as the Parquet /
    JSONL readers for comma-separated upstreams (spreadsheet exports,
    legacy ETL drops). Column pruning is batch-side — CSV has no
    projection at the read (documented format cost vs Parquet). Schema
    normalization: :func:`_normalize_transcripts`."""
    if parallelism is None:
        cpus = cluster_cpus()
        parallelism = max(8, cpus)
    ds = rd.read_csv(path, override_num_blocks=parallelism)
    return ds.map_batches(_normalize_transcripts(columns), batch_format="pyarrow")


def _extract_edges_batch(batch: pa.Table) -> pa.Table:
    """Vectorized mention extraction; one output row per mention-carrying turn."""
    text_m = pc.extract_regex(batch["text"], TEXT_MENTION_RE)
    tool_m = pc.extract_regex(batch["tool"], TOOL_MENTION_RE)
    text_dst = pc.struct_field(text_m, "dst")
    tool_dst = pc.struct_field(tool_m, "dst")
    # a turn carries at most one mention; tool takes precedence if both
    dst = pc.coalesce(tool_dst, text_dst)
    mask = pc.is_valid(dst)
    out = pa.table(
        {
            "src": batch["conv_id"],
            "dst": dst,
            "ts": batch["ts"],
            "turn_idx": batch["turn_idx"],
        }
    )
    return out.filter(mask).cast(EDGE_SCHEMA)


def extract_edges(transcripts: rd.Dataset) -> rd.Dataset:
    """Transcripts -> raw (unordered) string edge table."""
    return transcripts.map_batches(_extract_edges_batch, batch_format="pyarrow")


def edge_log(transcripts: rd.Dataset) -> rd.Dataset:
    """The authoritative ordered edge log: extract + global temporal sort.

    The sort is a range-partitioned distributed sort (Ray Data); its key
    ``(ts, src, turn_idx)`` is a total order on mention-carrying turns, so
    the log is deterministic. This replaces the reference's reliance on
    file-line order (snap.hxx:41-53).
    """
    return extract_edges(transcripts).sort(["ts", "src", "turn_idx"])


def temporal_split(
    log: rd.Dataset,
    base_fraction: float = 0.90,
    batch_fraction: float = 1e-3,
    num_batches: int = 5,
    total: int | None = None,
) -> tuple[rd.Dataset, list[rd.Dataset]]:
    """Split the ordered log into (base graph edges, insertion batches).

    base = first ``base_fraction * M`` rows; batch i = the next
    ``ceil(batch_fraction * M)`` rows, consumed consecutively — the exact
    protocol of /root/reference/main.cu:79-85, 167. Uses
    ``split_at_indices`` (order-preserving row split, no shuffle).
    """
    m = total if total is not None else log.count()
    base_n = int(base_fraction * m)
    b = max(1, int(np.ceil(batch_fraction * m)))
    idx, cuts = base_n, [base_n]
    for _ in range(num_batches):
        idx = min(m, idx + b)
        cuts.append(idx)
    parts = log.split_at_indices(cuts)
    return parts[0], list(parts[1 : 1 + num_batches])


def vertex_dictionary(transcripts: rd.Dataset, edges: rd.Dataset | None = None) -> np.ndarray:
    """Sorted distinct conv_id universe -> dense vid space (vid = position).

    Mirrors the reference's dense-id compaction ``vertexKeys``/``ksMap``
    (/root/reference/inc/properties.hxx:26-33,
    /root/reference/inc/pagerankCuda.hxx:765-775). The universe is the
    set of transcript conv_ids plus any mentioned id (mentions of ids
    outside the transcript set still become vertices, like the reference
    creating vertices for every endpoint).

    The distinct is distributed: per-block ``pc.unique`` (the combiner —
    blocks shrink to their distinct ids before leaving the read tasks);
    the driver merges only the pre-shrunk unique chunks with one
    ``np.unique(concatenate(...))``, which is **order-insensitive** —
    Ray Data's streaming executor does not preserve block order by
    default (``preserve_order=False``), so no step here may assume it.
    The result is a **fixed-width** numpy unicode array: it ships
    zero-copy through the object store (object-dtype string arrays
    pickle element-wise) and ``np.searchsorted`` against it is
    vectorized C. At 100 TB the dictionary would stay a Dataset
    (per-block unique -> distributed sort -> vid = per-partition offset
    prefix-sum) with a shuffle join instead of a broadcast — the
    per-block combiner below is the first stage of exactly that plan.
    """

    parts = transcripts.map_batches(_uniq_ids("conv_id"), batch_format="pyarrow")
    if edges is not None:
        parts = parts.union(edges.map_batches(_uniq_ids("dst"), batch_format="pyarrow"))

    chunks: list[np.ndarray] = []
    maxlen = 1
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        col = b["id"].combine_chunks() if isinstance(b["id"], pa.ChunkedArray) else b["id"]
        if len(col) == 0:
            continue
        ml = pc.max(pc.utf8_length(col)).as_py()
        maxlen = max(maxlen, int(ml or 1))
        chunks.append(np.asarray(col))
    if not chunks:
        return np.empty(0, dtype="U1")
    return np.unique(np.concatenate(chunks).astype(f"U{maxlen}"))


@ray.remote
def _append_vid(tbl: pa.Table, offset: int) -> pa.Table:
    return tbl.append_column(
        "vid", pa.array(np.arange(offset, offset + tbl.num_rows, dtype=np.int64))
    )


def _default_partitions() -> int:
    return max(8, cluster_cpus())


def vertex_dictionary_ds(transcripts: rd.Dataset,
                         edges: rd.Dataset | None = None) -> rd.Dataset:
    """The 100 TB dictionary path: (id, vid) as a Dataset — the id
    universe never lands on the driver (only per-block row COUNTS do).

    Same semantics as :func:`vertex_dictionary` (vid = rank of the id in
    the sorted distinct universe — identical order for ASCII conv_ids,
    since Arrow's UTF-8 byte order equals numpy's code-point order), but
    built as: per-block unique (combiner) -> hash-partitioned distinct
    (``groupby``) -> distributed sort -> per-block vid = block offset +
    local position, stamped by Ray tasks over the sorted block refs (a
    shared running index is the one step the Dataset API can't express;
    the driver touches only the per-block counts for the prefix sum).
    """

    parts = transcripts.map_batches(_uniq_ids("conv_id"), batch_format="pyarrow")
    if edges is not None:
        parts = parts.union(edges.map_batches(_uniq_ids("dst"), batch_format="pyarrow"))
    from ray.data.aggregate import Count

    distinct = parts.groupby("id").aggregate(Count()).select_columns(["id"])
    srt = distinct.sort("id").materialize()
    refs, offsets, off = [], [], 0
    for bundle in srt.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            refs.append(block_ref)
            offsets.append(off)
            off += meta.num_rows
    return rd.from_arrow_refs([
        _append_vid.remote(r, o) for r, o in zip(refs, offsets)
    ])


def encode_edges_ds(edges: rd.Dataset, dict_ds: rd.Dataset,
                    num_partitions: int | None = None) -> rd.Dataset:
    """Shuffle-join encode for universes too large to broadcast: two
    hash joins (src, then dst) against the (id, vid) dictionary Dataset.
    Inner joins are lossless here — the dictionary covers every endpoint
    by construction. Same output schema as :func:`encode_edges`.
    """
    P = num_partitions or _default_partitions()

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["src_vid"],
                "dst": t["dst_vid"],
                "ts": t["ts"],
                "turn_idx": t["turn_idx"],
            }
        )

    # Fractional-CPU aggregators, sized so BOTH joins' aggregator pools
    # (2 x P actors) together reserve at most half the cluster — a full
    # reservation leaves no slots for the read/map tasks feeding the
    # joins and the pipeline deadlocks (observed at 4 CPUs, P=4, 0.5).
    cpus = cluster_cpus()
    agg = {"num_cpus": min(0.5, max(0.1, (cpus / 2) / (2 * P)))}
    return (
        edges
        .join(dict_ds, "inner", P, on=("src",), right_on=("id",),
              aggregator_ray_remote_args=agg)
        .rename_columns({"vid": "src_vid"})
        .join(dict_ds, "inner", P, on=("dst",), right_on=("id",),
              aggregator_ray_remote_args=agg)
        .rename_columns({"vid": "dst_vid"})
        .map_batches(proj, batch_format="pyarrow")
    )


def encode_edges(edges: rd.Dataset, dictionary_ref) -> rd.Dataset:
    """Map string conv_ids -> dense int64 vids via the broadcast dictionary.

    ``dictionary_ref`` is a ``ray.put`` ObjectRef of the sorted string
    array — fetched once per task/actor (zero-copy per node), never
    re-shipped per batch.
    """

    def enc(batch: pa.Table) -> pa.Table:
        d = ray.get(dictionary_ref)
        src = np.searchsorted(d, np.asarray(batch["src"]).astype(d.dtype))
        dst = np.searchsorted(d, np.asarray(batch["dst"]).astype(d.dtype))
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "ts": batch["ts"],
                "turn_idx": batch["turn_idx"],
            }
        )

    return edges.map_batches(enc, batch_format="pyarrow")
