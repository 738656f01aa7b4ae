"""Routing edge data into the shard actor pool.

The Ray-Data side of graph construction: an encoded edge Dataset is
streamed through ``map_batches``; each batch is split by owner
(``vid % P``) and pushed into the long-lived shard actors. This replaces
the reference's single-process CSR build (/root/reference/inc/csr.hxx:
100-287) with a partitioned, backpressured ingest — at cluster scale the
same tasks run wherever the blocks live and only the per-owner slices
cross the network.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def split_by_owner(arr: np.ndarray, owners: np.ndarray, P: int) -> list[np.ndarray]:
    """Partition ``arr`` rows by ``owners`` (values in [0, P))."""
    order = np.argsort(owners, kind="stable")
    srt, own = arr[..., order] if arr.ndim > 1 else arr[order], owners[order]
    cuts = np.searchsorted(own, np.arange(P + 1))
    if arr.ndim > 1:
        return [srt[..., cuts[q]:cuts[q + 1]] for q in range(P)]
    return [srt[cuts[q]:cuts[q + 1]] for q in range(P)]


def split_pairs_by_owner(src: np.ndarray, dst: np.ndarray, P: int, by: str) -> list[np.ndarray]:
    """(src,dst) pairs -> per-owner (2,k) arrays, keyed by src or dst owner."""
    key = (src if by == "src" else dst) % P
    return split_by_owner(np.stack([src, dst]), key, P)


def route_edges(encoded: rd.Dataset, shards: list, batch_size: int = 131_072) -> int:
    """Stream an encoded edge Dataset into the shard pool.

    Each map_batches task splits its Arrow batch by src-owner (out-CSR
    side) and dst-owner (in-CSR side) and blocks on the actors' ingest —
    Ray Data's backpressure therefore extends into the actor mailboxes.
    Returns the total edge count routed.
    """
    P = len(shards)

    def route(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy()
        dst = batch["dst"].to_numpy()
        outs = split_pairs_by_owner(src, dst, P, "src")
        ins = split_pairs_by_owner(src, dst, P, "dst")
        refs = []
        for p in range(P):
            o = pa.table({"src": outs[p][0], "dst": outs[p][1]}) if outs[p].shape[1] else None
            i = pa.table({"src": ins[p][0], "dst": ins[p][1]}) if ins[p].shape[1] else None
            if o is not None or i is not None:
                refs.append(shards[p].ingest.remote(o, i))
        ray.get(refs)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    counts = encoded.map_batches(route, batch_format="pyarrow", batch_size=batch_size)
    return int(sum(r["n"] for r in counts.take_all()))


def route_labels(labels: rd.Dataset, shards: list, col: str,
                 batch_size: int = 262_144) -> int:
    """Stream an external (vid, label) Dataset into the shard pool's
    label vectors — the distributed replacement for pulling a
    vertex-scale label table to the driver. Each batch splits by owner
    (``vid % P``) and ships (local_idx, label) int64 slices; shards
    scatter into a pre-zeroed vector and track coverage/duplicates so
    the caller can verify an exact install with O(P) scalars
    (``finish_label_install``). Same backpressured 0.5-CPU shape as
    route_temporal. Returns the total row count routed."""
    P = len(shards)

    def route(batch: pa.Table) -> pa.Table:
        vid = batch["vid"].to_numpy().astype(np.int64)
        val = batch[col].to_numpy().astype(np.int64)
        outs = split_by_owner(np.stack([vid // P, val]), vid % P, P)
        refs = [shards[p].ingest_labels.remote(outs[p][0], outs[p][1])
                for p in range(P) if outs[p].shape[1]]
        ray.get(refs)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    counts = labels.map_batches(route, batch_format="pyarrow",
                                batch_size=batch_size, num_cpus=0.5)
    return int(sum(r["n"] for r in counts.take_all()))


def route_temporal(encoded: rd.Dataset, shards: list, batch_size: int = 131_072) -> int:
    """Stream an encoded (src, dst, ts) edge log into the shard pool's
    temporal adjacency (src-owner routed, per-edge timestamps kept as
    int64 epoch-us). Same backpressured shape as route_edges, but the
    routing tasks request 0.5 CPU: they mostly block on actor ingest,
    and a full-CPU request cannot schedule next to a shard pool that
    has reserved most of a small cluster's slots (the 4-CPU test
    cluster deadlocks otherwise)."""
    P = len(shards)

    def route(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy()
        dst = batch["dst"].to_numpy()
        t = batch["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        trip = np.stack([src, dst, t])
        outs = split_by_owner(trip, src % P, P)
        refs = []
        for p in range(P):
            if outs[p].shape[1]:
                refs.append(shards[p].ta_ingest.remote(pa.table({
                    "src": outs[p][0], "dst": outs[p][1], "t": outs[p][2],
                })))
        ray.get(refs)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    counts = encoded.map_batches(route, batch_format="pyarrow", batch_size=batch_size,
                                 num_cpus=0.5)
    return int(sum(r["n"] for r in counts.take_all()))
