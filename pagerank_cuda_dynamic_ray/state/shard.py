"""GraphShard — the stateful per-partition actor holding CSR graph state.

The Ray-native re-expression of the reference's frozen CSR + dense
vector state (/root/reference/inc/Graph.hxx:384-639 ``DiGraphCsr``,
/root/reference/inc/pagerankCuda.hxx:714-849 device lifecycle): graph
state lives as hash-partitioned CSR shards in numpy/Arrow buffers held
by a **fixed actor pool**, one actor per partition; rank/flag vectors
are per-shard dense arrays. Partitioning: vertex ``v`` is owned by shard
``v % P`` with dense local index ``v // P``.

Per power-iteration dataflow (SURVEY.md §3.2):
  1. every shard computes contributions ``c = r / outdeg`` for its owned
     sources and slices them per destination shard (``send_idx``, a
     build-time exchanged pull index) — the transfer volume is the
     number of *unique* (source, destination-shard) pairs, so a
     high-in-degree hub inflates no traffic: its thousands of in-edges
     reuse contribution entries already shipped for other edges. This is
     the engine's skew answer to the reference's degree-64 two-kernel
     split (/root/reference/inc/pagerankCuda.hxx:88-217): hub in-edge
     sums are a single vectorized segment-sum at the owner, and the
     combining the reference does in shared memory happens in the
     contribution exchange.
  2. each shard gathers its incoming slices (Ray object store, zero-copy
     numpy) and applies ``a[v] = C0 + d * sum`` (or the DF-P closed form
     /root/reference/inc/pagerankPrune.hxx:30-41) over affected rows
     only, computes its local L∞ delta, and emits frontier marks.
  3. the driver tree-reduces L∞ deltas (and dangling mass, when running
     in ``dangling="redistribute"`` mode) across shards.

All methods are synchronous actor calls; the driver loop lives in
``pipelines/graph.py``. No method touches ``ray.init``.
"""

from __future__ import annotations

import asyncio
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import kernels as K


def _np(col) -> np.ndarray:
    """Arrow column -> numpy (combining chunks if needed)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


class GraphShard:
    """One graph partition: CSR adjacency + rank/flag/label state."""

    def __init__(self, part_id: int, num_parts: int, num_vertices: int):
        self.p = part_id
        self.P = num_parts
        self.N = num_vertices
        self.n_local = max(0, (num_vertices - part_id + num_parts - 1) // num_parts)
        # raw edge-set state (authoritative, sorted-unique int64 keys):
        # out_keys = src_local * N + dst ; in_keys = dst_local * N + src
        self.out_keys = np.empty(0, dtype=np.int64)
        self.in_keys = np.empty(0, dtype=np.int64)
        # per-unique-edge multiplicity weights (weighted builds only)
        self.out_w: np.ndarray | None = None
        self.in_w: np.ndarray | None = None
        self.outw = None          # weighted out-degree per owned row
        self._w_sweep = None      # in_w permuted to sweep-stream order
        self._out_chunks: list[np.ndarray] = []
        self._in_chunks: list[np.ndarray] = []
        # derived CSR state (build() / _rebuild())
        self.out_offsets = self.out_dst = None
        self.in_offsets = self.in_src = None
        self.outdeg = self.inv_outdeg = None
        self.gather_ids = self.in_key = None
        self.gather_counts = None          # rows needed from each owner q
        self.send_idx: list[np.ndarray] | None = None
        self.send_cat: np.ndarray | None = None
        self.gather_layout: np.ndarray | None = None  # (P,2) segment per source
        # iteration state
        self.r = np.zeros(self.n_local)
        self.a = np.zeros(self.n_local)
        self.vaff = np.zeros(self.n_local, dtype=bool)
        # personalized-PageRank teleport slice (None = uniform 1/N).
        # Shard state rather than a step() argument so all three loop
        # modes (driver / p2p / compiled dag) pick it up unchanged.
        self.tele: np.ndarray | None = None
        # p2p iteration state (run_iterations)
        self._cv: asyncio.Condition | None = None
        self._contrib_inbox: dict[int, dict[int, tuple]] = {}
        self._marks_inbox: dict[int, dict[int, tuple]] = {}
        self._linf_inbox: dict[int, dict[int, float]] = {}
        # pipelined p2p protocol: one combined message per iteration
        self._bundle_inbox: dict[int, dict[int, tuple]] = {}
        # p2p label-loop state (run_label_iterations: cc / lp / bfs);
        # values are (payload, changed_prev) — the changed-count vote
        # piggybacks on the next round's message
        self._labelmsg_inbox: dict[int, dict[int, tuple]] = {}
        # hub splitting (off unless configure_hub_split is called)
        self.hub_split = False
        self.hub_rows = np.empty(0, dtype=np.int64)   # owned hub local rows
        self.hub_counts = np.zeros(num_parts, dtype=np.int64)  # |hubs| per owner
        self._hub_src: list[np.ndarray] = []
        self._hub_offs: list[np.ndarray] = []
        # symmetrized view (built on demand)
        self.sym_offsets = self.sym_adj = None
        self.labels = None
        self._label_frontier = None
        self._next_labels = None
        # oriented view for triangles
        self.ori_offsets = self.ori_adj = None

    # ------------------------------------------------------------------
    # ingest & build
    # ------------------------------------------------------------------

    def owned_vids(self) -> np.ndarray:
        return np.arange(self.n_local, dtype=np.int64) * self.P + self.p

    def ingest(self, out_tbl: pa.Table | None, in_tbl: pa.Table | None) -> int:
        """Accumulate routed edge chunks. out_tbl: edges with owned src;
        in_tbl: edges with owned dst. Both (src,dst) int64 global vids."""
        n = 0
        if out_tbl is not None and out_tbl.num_rows:
            src, dst = _np(out_tbl["src"]), _np(out_tbl["dst"])
            self._out_chunks.append(K.encode_pairs(src // self.P, dst, self.N))
            n += out_tbl.num_rows
        if in_tbl is not None and in_tbl.num_rows:
            src, dst = _np(in_tbl["src"]), _np(in_tbl["dst"])
            self._in_chunks.append(K.encode_pairs(dst // self.P, src, self.N))
            n += in_tbl.num_rows
        return n

    def build(self, add_self_loops: bool = True, weighted: bool = False) -> dict[int, np.ndarray]:
        """Finalize ingested edges into CSR state; returns the pull index
        (owner -> local source indices this shard needs).

        ``add_self_loops=True`` replicates the reference driver's
        dead-end elimination — a self loop on every vertex
        (/root/reference/main.cu:168-169, inc/selfLoop.hxx:33-79).

        ``weighted=True``: edge weight = ingest multiplicity (each routed
        duplicate counts 1; the structural self-loop adds 1) — for the
        transcript graph that is the mention count per (src, dst) pair.
        The unique-key aggregation the unweighted build already performs
        doubles as the weight reduction, so weighting adds no extra
        exchange. Batch updates fold through the multiset path of
        ``apply_update`` (each insertion instance = +1 multiplicity)."""
        chunks_out, chunks_in = self._out_chunks, self._in_chunks
        if add_self_loops and self.n_local:
            loops = K.encode_pairs(np.arange(self.n_local, dtype=np.int64), self.owned_vids(), self.N)
            chunks_out = chunks_out + [loops]
            chunks_in = chunks_in + [loops]
        if weighted:
            ocat = np.concatenate(chunks_out) if chunks_out else np.empty(0, dtype=np.int64)
            icat = np.concatenate(chunks_in) if chunks_in else np.empty(0, dtype=np.int64)
            self.out_keys, ocnt = np.unique(ocat, return_counts=True)
            self.in_keys, icnt = np.unique(icat, return_counts=True)
            self.out_w = ocnt.astype(np.float64)
            self.in_w = icnt.astype(np.float64)
        else:
            self.out_keys = (
                np.unique(np.concatenate(chunks_out)) if chunks_out else np.empty(0, dtype=np.int64)
            )
            self.in_keys = (
                np.unique(np.concatenate(chunks_in)) if chunks_in else np.empty(0, dtype=np.int64)
            )
            self.out_w = self.in_w = None
        self._out_chunks, self._in_chunks = [], []
        return self._rebuild()

    def _rebuild(self) -> dict[int, np.ndarray]:
        """Derive CSR structures + pull index from the raw edge sets."""
        n, N = self.n_local, self.N
        o_local, o_dst = self.out_keys // N, self.out_keys % N
        self.out_offsets, self.out_dst = K.build_csr(o_local, o_dst, n, dedup=False)
        i_local, i_src = self.in_keys // N, self.in_keys % N
        self.in_offsets, self.in_src = K.build_csr(i_local, i_src, n, dedup=False)
        self.outdeg = np.diff(self.out_offsets).astype(np.float64)
        # CSR position of each owned vertex's self-loop (-1 if none):
        # out_keys is sorted and build_csr orders by (local, dst) == key
        # order, so an out_keys index IS a CSR index. Used to exclude
        # structural self-loops from deletion sampling.
        if n and len(self.out_keys):
            own = np.arange(n, dtype=np.int64)
            lkeys = own * N + own * self.P + self.p
            pos = np.searchsorted(self.out_keys, lkeys)
            posc = np.minimum(pos, len(self.out_keys) - 1)
            has = self.out_keys[posc] == lkeys
            self.out_loop_rel = np.where(has, posc - self.out_offsets[own], -1)
        else:
            self.out_loop_rel = np.full(n, -1, dtype=np.int64)
        # weighted mode: contributions scale by 1/weighted-out-degree at
        # the source and by the edge weight at the destination, so
        # c_u * w_uv = r_u * w_uv / W_u (the standard weighted PR pull)
        if self.out_w is not None:
            self.outw = np.bincount(o_local, weights=self.out_w, minlength=n)
            with np.errstate(divide="ignore"):
                self.inv_outdeg = np.where(self.outw > 0, 1.0 / self.outw, 0.0)
            # per-row self-loop WEIGHT (for the DF-P closed form, which
            # factors the self-loop term out of the fixpoint): CSR order
            # == key order, so offset + loop_rel indexes out_w directly
            if n and len(self.out_w):
                own = np.arange(n, dtype=np.int64)
                pos = np.minimum(self.out_offsets[own]
                                 + np.maximum(self.out_loop_rel, 0),
                                 len(self.out_w) - 1)
                self._loop_w = np.where(self.out_loop_rel >= 0,
                                        self.out_w[pos], 0.0)
            else:
                self._loop_w = np.zeros(n, dtype=np.float64)
        else:
            self.outw = None
            self._loop_w = None
            with np.errstate(divide="ignore"):
                self.inv_outdeg = np.where(self.outdeg > 0, 1.0 / self.outdeg, 0.0)
        # pull index: unique needed sources, grouped by owner then local id
        uniq = np.unique(self.in_src)
        owner, local = uniq % self.P, uniq // self.P
        order = np.lexsort((local, owner))
        gather_ids = uniq[order]
        inv = np.empty(len(uniq), dtype=np.int64)
        inv[order] = np.arange(len(uniq))
        self.in_key = inv[np.searchsorted(uniq, self.in_src)]
        # full-sweep fast path: edges re-ordered by gather index so the
        # per-iteration gather reads the contribution array sequentially
        # (cache-streaming) and the row sums become a bincount scatter
        # into an L2-resident accumulator — the random-access gather is
        # otherwise the latency wall that caps strong scaling. int32
        # index arrays halve the per-edge index-stream bytes (shard-local
        # counts are far below 2^31; the iteration is DRAM-bandwidth
        # bound at high parallelism, so bytes/edge is the scaling lever).
        sweep_order = np.argsort(self.in_key, kind="stable")
        self.in_key_sweep = self.in_key[sweep_order].astype(np.int32)
        self.in_rows_sweep = np.repeat(
            np.arange(n, dtype=np.int64), np.diff(self.in_offsets)
        )[sweep_order].astype(np.int32)
        self._w_sweep = self.in_w[sweep_order] if self.in_w is not None else None
        self.gather_ids = gather_ids
        g_owner = gather_ids % self.P
        self.gather_counts = np.bincount(g_owner, minlength=self.P)
        # direct-read sweep layout: edges are key-sorted, and keys are
        # owner-major, so the edge stream splits into one contiguous run
        # per source shard. Each run's keys are rebased to that source's
        # segment so the per-iteration gather reads EACH producer's
        # shared-memory slice directly (np.take out= into a persistent
        # buffer) — no concatenated copy of the incoming contributions.
        # This cuts ~2x gather-array traffic per iteration, which is the
        # DRAM-bandwidth lever that strong scaling hinges on.
        gpref = np.zeros(self.P + 1, dtype=np.int64)
        np.cumsum(self.gather_counts, out=gpref[1:])
        self._edge_cuts = np.searchsorted(self.in_key_sweep, gpref)
        self._key_adj = (
            self.in_key_sweep
            - np.repeat(gpref[:-1], np.diff(self._edge_cuts)).astype(np.int32)
        )
        self._per_edge = np.empty(len(self.in_key_sweep), dtype=np.float64)
        self._delta = np.empty(n, dtype=np.float64)
        self._c = np.empty(n, dtype=np.float64)
        self._dangling_idx = np.flatnonzero(self.outdeg == 0)
        # invalidate derived views (incl. hub-split sweep filtering —
        # configure_hub_split must re-run after any rebuild)
        self.hub_split = False
        self.hub_rows = np.empty(0, dtype=np.int64)
        self.hub_counts = np.zeros(self.P, dtype=np.int64)
        self.sym_offsets = self.sym_adj = None
        self.ori_offsets = self.ori_adj = None
        return {q: (gather_ids[g_owner == q] // self.P) for q in range(self.P)}

    def set_send_index(self, send_idx: list[np.ndarray]) -> None:
        """send_idx[p] = local source indices whose contributions shard p pulls.

        The concatenation (destination order) is precomputed: each
        iteration emits ONE packed contribution array per source shard
        (P objects per iteration instead of P² slice objects — on a
        single node every destination maps the same shared-memory object
        zero-copy and slices its segment; on a real multi-node cluster
        the per-destination-slice exchange trades object count for
        shipping only each node's segment)."""
        self.send_idx = send_idx
        self.send_cat = (
            np.concatenate(send_idx) if send_idx else np.empty(0, dtype=np.int64)
        )
        # persistent per-iteration output buffers (np.take out=): fresh
        # allocations each iteration cost page faults + zero-fill — real
        # DRAM traffic on top of the copy itself. Segments are extended
        # by the destination's hub count when hub splitting is active.
        hc = self.hub_counts if self.hub_split else np.zeros(self.P, dtype=np.int64)
        self._send_buf = np.empty(len(self.send_cat) + int(hc.sum()), dtype=np.float64)
        self._send_bufs = [
            np.empty(len(ix) + int(hc[p]), dtype=np.float64)
            for p, ix in enumerate(send_idx)
        ]

    def set_gather_layout(self, layout: np.ndarray) -> None:
        """layout[q] = (start, end) of this shard's segment inside source
        shard q's packed contribution array."""
        self.gather_layout = layout

    # ------------------------------------------------------------------
    # hub in-edge splitting (explicit skew handling)
    #
    # The reference splits work for high-degree vertices into a separate
    # block-per-vertex kernel with a shared-memory reduction
    # (/root/reference/inc/pagerankCuda.hxx:163-217, partition at
    # :470-481). The distributed analogue: a hub's in-edge SUM is
    # computed as per-source-shard partial sums (each source shard sums
    # the contributions of ITS local sources pointing at the hub) that
    # ride the contribution exchange as a dense per-hub tail; the owner
    # combines P partials instead of segment-summing O(in-degree) edges
    # on one actor. Work and memory for the hub spread across the pool.
    # ------------------------------------------------------------------

    def local_hubs(self, threshold: int) -> np.ndarray:
        """Global vids of owned vertices with in-degree > threshold."""
        indeg = np.diff(self.in_offsets)
        return np.flatnonzero(indeg > threshold) * self.P + self.p

    def configure_hub_split(self, all_hubs: np.ndarray) -> None:
        """Install the global hub list: filter owned hub rows out of the
        full-sweep edge stream (their sums arrive as partials) and build
        the source-side per-destination partial-sum structures. The
        affected-path CSR (in_key / in_offsets) is untouched, so dynamic
        variants still compute exact full sums for hub rows."""
        if self.out_w is not None:
            raise ValueError(
                "hub splitting is unsupported on a weighted graph: the "
                "source-side hub partial sums do not carry edge weights"
            )
        P = self.P
        all_hubs = np.asarray(all_hubs, dtype=np.int64)
        self.hub_counts = np.bincount(all_hubs % P, minlength=P)
        self.hub_rows = all_hubs[all_hubs % P == self.p] // P
        if self.hub_rows.size:
            hubmask = np.zeros(self.n_local, dtype=bool)
            hubmask[self.hub_rows] = True
            keep = ~hubmask[self.in_rows_sweep]
            self.in_key_sweep = self.in_key_sweep[keep]
            self.in_rows_sweep = self.in_rows_sweep[keep]
            gpref = np.zeros(P + 1, dtype=np.int64)
            np.cumsum(self.gather_counts, out=gpref[1:])
            self._edge_cuts = np.searchsorted(self.in_key_sweep, gpref)
            self._key_adj = (
                self.in_key_sweep
                - np.repeat(gpref[:-1], np.diff(self._edge_cuts)).astype(np.int32)
            )
            self._per_edge = np.empty(len(self.in_key_sweep), dtype=np.float64)
        # source side: group local out-edges to hubs by (dest owner, hub)
        src_rows = np.repeat(
            np.arange(self.n_local, dtype=np.int64), np.diff(self.out_offsets)
        )
        sel = np.isin(self.out_dst, all_hubs)
        hs, hd = src_rows[sel], self.out_dst[sel]
        owner = hd % P
        self._hub_src, self._hub_offs = [], []
        for p in range(P):
            m = owner == p
            hubs_p = all_hubs[all_hubs % P == p]
            pos = np.searchsorted(hubs_p, hd[m])
            order = np.lexsort((hs[m], pos))
            offs = np.zeros(len(hubs_p) + 1, dtype=np.int64)
            np.cumsum(np.bincount(pos, minlength=len(hubs_p)), out=offs[1:])
            self._hub_src.append(hs[m][order])
            self._hub_offs.append(offs)
        self.hub_split = True

    def _pack_segment(self, c: np.ndarray, p: int, out: np.ndarray) -> None:
        """Fill destination p's combined segment [regular | hub partials]."""
        ix = self.send_idx[p]
        np.take(c, ix, out=out[: len(ix)])
        nh = int(self.hub_counts[p])
        if nh:
            out[len(ix):] = K.segment_sums(c[self._hub_src[p]], self._hub_offs[p])

    def num_edges(self) -> tuple[int, int]:
        return len(self.out_keys), len(self.in_keys)

    def sweep_edge_count(self) -> int:
        """Edges this shard segment-sums per full-sweep iteration (hub
        splitting moves hub in-edge work out of this count)."""
        return len(self.in_rows_sweep)

    def save_keys(self, snap_dir: str) -> str:
        """Persist this shard's authoritative edge sets (post-self-loop,
        sorted-unique int64 keys) — the graph-snapshot half of the resume
        lineage (CSR state is derived, so keys are all that's needed)."""
        path = os.path.join(snap_dir, f"part-{self.p}.npz")
        tmp = path + ".tmp.npz"
        if self.out_w is not None:
            np.savez(tmp, out_keys=self.out_keys, in_keys=self.in_keys,
                     out_w=self.out_w, in_w=self.in_w)
        else:
            np.savez(tmp, out_keys=self.out_keys, in_keys=self.in_keys)
        os.replace(tmp, path)
        return path

    def load_keys(self, snap_dir: str) -> dict[int, np.ndarray]:
        """Restore edge sets from a snapshot and rebuild CSR state;
        returns the pull index (same contract as ``build``)."""
        d = np.load(os.path.join(snap_dir, f"part-{self.p}.npz"))
        self.out_keys = d["out_keys"]
        self.in_keys = d["in_keys"]
        self.out_w = d["out_w"] if "out_w" in d.files else None
        self.in_w = d["in_w"] if "in_w" in d.files else None
        return self._rebuild()

    def write_edges_parquet(self, dir_path: str) -> int:
        """Write this shard's directed edge set (global vids, incl.
        structural self-loops) as one Parquet file — the portable
        graph-export path: P shards write in parallel, no driver
        gather, resumable via atomic tmp+rename (the snapshot npz twin
        for shared storage / external consumers)."""
        lk, dst = self.out_keys // self.N, self.out_keys % self.N
        src = lk * self.P + self.p
        tbl = pa.table({"src": pa.array(src.astype(np.int64)),
                        "dst": pa.array(dst.astype(np.int64))})
        path = os.path.join(dir_path, f"part-{self.p}.parquet")
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return tbl.num_rows

    def count_self_loops(self) -> int:
        """countSelfLoops equivalent (/root/reference/inc/selfLoop.hxx:15-19)."""
        if self.out_offsets is None:
            return 0
        lk, dst = self.out_keys // self.N, self.out_keys % self.N
        return int(np.count_nonzero(dst == lk * self.P + self.p))

    def out_degree_table(self) -> pa.Table:
        """(vid, outdeg) for owned vertices — degreesW equivalent
        (/root/reference/inc/properties.hxx:53-55)."""
        return pa.table(
            {"vid": pa.array(self.owned_vids()), "outdeg": pa.array(self.outdeg.astype(np.int64))}
        )

    def in_degree_table(self) -> pa.Table:
        """(vid, indeg) for owned vertices over the deduped directed
        edge set incl. structural self-loops — the transpose of
        out_degree_table (reference degreesW on transposeWithDegree,
        /root/reference/inc/transpose.hxx:90-149)."""
        indeg = (np.diff(self.in_offsets) if self.in_offsets is not None
                 else np.zeros(self.n_local, dtype=np.int64))
        return pa.table(
            {"vid": pa.array(self.owned_vids()), "indeg": pa.array(indeg.astype(np.int64))}
        )

    def degree_hist_table(self) -> pa.Table:
        """Per-shard degree histogram partials (kind 'out'|'in', degree,
        n_vertices) — ships one row per distinct degree per shard, so
        the driver/merge never sees an N-sized array."""
        cols_k, cols_d, cols_n = [], [], []
        for kind, offs in (("out", self.out_offsets), ("in", self.in_offsets)):
            deg = (np.diff(offs) if offs is not None
                   else np.zeros(self.n_local, dtype=np.int64))
            vals, cnt = np.unique(deg, return_counts=True)
            cols_k.extend([kind] * len(vals))
            cols_d.append(vals.astype(np.int64))
            cols_n.append(cnt.astype(np.int64))
        return pa.table({
            "kind": pa.array(cols_k, pa.string()),
            "degree": pa.array(np.concatenate(cols_d) if cols_d else
                               np.empty(0, np.int64)),
            "n_vertices": pa.array(np.concatenate(cols_n) if cols_n else
                                   np.empty(0, np.int64)),
        })

    # ---- degree assortativity (x = outdeg(src), y = indeg(dst) per edge) ----

    def assort_needs(self, q: int) -> np.ndarray:
        """Local ids of owner ``q``'s vertices this shard needs out-
        degrees for (= the pull index restricted to q). Shipped actor-
        to-actor as an ObjectRef — the driver never holds the cut."""
        g = self.gather_ids
        return (g[g % self.P == q] // self.P) if g is not None else np.empty(0, np.int64)

    def outdeg_int_for(self, locals_: np.ndarray) -> np.ndarray:
        """Integer out-degree (incl. self-loops) of owned local ids."""
        offs = self.out_offsets
        return (offs[locals_ + 1] - offs[locals_]).astype(np.int64)

    def assort_partial(self, deg_refs: list) -> np.ndarray:
        """Per-shard integer partial sums for degree assortativity over
        owned in-edges: [m, Σx, Σy, Σxy, Σx², Σy²] with x = outdeg(src)
        (gathered from the per-owner segments in ``deg_refs``, aligned
        to gather_ids' owner-major layout exactly like the rank
        exchange) and y = indeg(dst) (local). Exact int64 at any tested
        scale; at extreme scale the driver folds partials in Python
        ints, so only a single block's Σx² must fit int64."""
        import ray
        segs = ray.get(list(deg_refs))
        cat = (np.concatenate(segs) if segs else np.empty(0, np.int64))
        x = cat[self.in_key] if self.in_key is not None else np.empty(0, np.int64)
        indeg = (np.diff(self.in_offsets) if self.in_offsets is not None
                 else np.empty(0, np.int64))
        y = np.repeat(indeg, indeg).astype(np.int64)
        return np.array([len(x), x.sum(), y.sum(), (x * y).sum(),
                         (x * x).sum(), (y * y).sum()], dtype=np.int64)

    def out_degrees_of(self, locals_: np.ndarray) -> np.ndarray:
        """DATA out-degree (current CSR, structural self-loops excluded)
        for owned local ids — the degree probe of removeRandomEdgeFrom
        (/root/reference/inc/batch.hxx:29-39). Self-loops are the
        dead-end-elimination transform (selfLoop.hxx:33-79), not data
        edges — deleting one would leave a dangling vertex the DF-P
        closed form divides by, so the sampler never sees them."""
        offs = self.out_offsets
        deg = (offs[locals_ + 1] - offs[locals_]).astype(np.int64)
        return deg - (self.out_loop_rel[locals_] >= 0)

    def sample_out_edges(self, locals_: np.ndarray, hs: np.ndarray) -> np.ndarray:
        """The (h % datadeg)-th NON-LOOP out-neighbor (dst-vid-ascending
        order) of each owned local id — the edge pick of
        removeRandomEdgeFrom (/root/reference/inc/batch.hxx:29-39) with
        the stream RNG re-expressed as a counter hash. Callers guarantee
        data out-degree > 0 (see out_degrees_of)."""
        offs = self.out_offsets
        rel = self.out_loop_rel[locals_]
        deg = (offs[locals_ + 1] - offs[locals_]) - (rel >= 0)
        vi = (hs.astype(np.uint64) % deg.astype(np.uint64)).astype(np.int64)
        vi += ((rel >= 0) & (vi >= rel))
        return self.out_dst[offs[locals_] + vi]

    # ------------------------------------------------------------------
    # batch updates (dynamic graph)
    # ------------------------------------------------------------------

    def filter_batch_by_existence(self, src: np.ndarray, dst: np.ndarray, kind: str) -> np.ndarray:
        """Existence mask for tidy: deletions keep edges present, insertions
        keep edges absent (/root/reference/inc/batch.hxx:153-160). Input
        edges must have owned src."""
        keys = K.encode_pairs(src // self.P, dst, self.N)
        present = np.isin(keys, self.out_keys)
        return present if kind == "deletions" else ~present

    def apply_update(
        self,
        del_out: np.ndarray | None, ins_out: np.ndarray | None,
        del_in: np.ndarray | None, ins_in: np.ndarray | None,
    ) -> dict[int, np.ndarray]:
        """Fold a tidied batch into this shard's edge sets and rebuild —
        applyBatchUpdateU (/root/reference/inc/batch.hxx:222-248) as a
        per-partition Arrow/numpy set operation. Arguments are (2,n)
        [src,dst] arrays routed by src owner (out) / dst owner (in).

        Weighted graphs fold through the multiset analogue
        (kernels.weighted_set_update): each insertion INSTANCE adds one
        unit of multiplicity, each deletion instance removes one —
        replaying a temporally-split log therefore reproduces the exact
        weights of a one-shot weighted build of the full log."""

        def keys_of(pairs, by_dst):
            if pairs is None or pairs.shape[1] == 0:
                return np.empty(0, dtype=np.int64)
            s, d = pairs[0], pairs[1]
            return (
                K.encode_pairs(d // self.P, s, self.N) if by_dst
                else K.encode_pairs(s // self.P, d, self.N)
            )

        if self.out_w is not None:
            self.out_keys, self.out_w = K.weighted_set_update(
                self.out_keys, self.out_w,
                keys_of(del_out, False), keys_of(ins_out, False))
            self.in_keys, self.in_w = K.weighted_set_update(
                self.in_keys, self.in_w,
                keys_of(del_in, True), keys_of(ins_in, True))
            return self._rebuild()

        self.out_keys = K.set_minus_union(self.out_keys, keys_of(del_out, False), keys_of(ins_out, False))
        self.in_keys = K.set_minus_union(self.in_keys, keys_of(del_in, True), keys_of(ins_in, True))
        return self._rebuild()

    # ------------------------------------------------------------------
    # PageRank iteration
    # ------------------------------------------------------------------

    def init_ranks(self, warm: np.ndarray | None = None) -> None:
        """Uniform 1/N init (pagerank.hxx:285-313) or warm start from
        previous ranks (pagerank.hxx:325-352 — the 'dynamic' seed)."""
        if warm is not None:
            self.r = np.asarray(warm, dtype=np.float64).copy()
        else:
            self.r = np.full(self.n_local, 1.0 / self.N)
        self.a = self.r.copy()

    def set_teleport(self, tele: np.ndarray | None) -> None:
        """Install (or clear) this shard's slice of a personalized-
        PageRank teleport vector, indexed like the local rank vector
        (local row i <-> vid i*P + p). The §2.10 extension seam applied
        to the rank update: the uniform (1-d)/N restart term becomes
        (1-d)*tele_v, and redistributed dangling mass teleports
        proportionally to tele instead of uniformly."""
        if tele is None:
            self.tele = None
        else:
            t = np.asarray(tele, dtype=np.float64)
            assert t.shape == (self.n_local,), (t.shape, self.n_local)
            self.tele = t.copy()

    def get_ranks(self) -> np.ndarray:
        return self.r

    def ranks_table(self, dict_ref=None) -> pa.Table:
        """This shard's live ranks as an Arrow table (vid, rank[,
        conv_id]) — built SHARD-SIDE so the driver never concatenates
        rank vectors (the cluster-scale ranks_dataset path; conv ids
        resolve from one broadcast dictionary ref, zero-copy read)."""
        vids = np.arange(self.n_local, dtype=np.int64) * self.P + self.p
        cols = {"vid": pa.array(vids), "rank": pa.array(self.r)}
        if dict_ref is not None:
            d = ray.get(dict_ref)
            cols["conv_id"] = pa.array(d[vids])
        return pa.table(cols)

    def rank_norm_partial(self, other: np.ndarray, ord) -> float:
        """Partial of ||r - other||_ord over this shard's owned rows."""
        return K.norm_delta_partial(self.r, other, ord)

    def clear_flags(self) -> None:
        self.vaff[:] = False

    def affected_count(self) -> int:
        return int(self.vaff.sum())

    def _contrib_vec(self) -> np.ndarray:
        np.multiply(self.r, self.inv_outdeg, out=self._c)
        return self._c

    def _dangling(self) -> float:
        return float(self.r[self._dangling_idx].sum()) if self.n_local else 0.0

    def _packed_all(self, c: np.ndarray) -> np.ndarray:
        """One packed array, destination-major; each destination segment
        is [regular contribs | hub partials] when hub splitting is on."""
        if not self.hub_split:
            return np.take(c, self.send_cat, out=self._send_buf)
        buf, off = self._send_buf, 0
        for p, ix in enumerate(self.send_idx):
            seg = len(ix) + int(self.hub_counts[p])
            self._pack_segment(c, p, buf[off:off + seg])
            off += seg
        return buf

    def contribs(self):
        """Phase 1: packed contribution array (all destinations, segment
        layout shipped at build time) + local dangling mass (for
        dangling='redistribute'). Call with num_returns=2."""
        c = self._contrib_vec()
        return (self._dangling(), self._packed_all(c))

    def step(
        self,
        C0: float,
        damping: float,
        use_affected: bool,
        frontier: bool,
        prune: bool,
        frontier_tol: float,
        prune_tol: float,
        dangling_mass: float,
        *packed: np.ndarray,
    ):
        """Phase 2: apply one synchronous pull update over owned rows.

        ``packed`` is every source shard's packed contribution array
        (passed as direct ObjectRef args so Ray pre-resolves them before
        scheduling; zero-copy shared memory on a node); this shard
        slices its segment per ``gather_layout``.

        Returns ``stats`` alone when ``frontier`` is False (call with
        num_returns=1), else (stats, packed_marks, mark_offsets) where
        ``packed_marks`` holds local dst indices destination-major and
        ``mark_offsets[p]`` delimits destination p's segment. Semantics
        per variant:
          static/nd: use_affected=False — update all rows
            (pagerank.hxx:155-174 sync sweep);
          dt: use_affected=True, frontier=False — fixed affected set
            (pagerank.hxx:595-628);
          df: +frontier — expand out-neighbors of rows whose relative
            delta exceeds frontier_tol (pagerank.hxx:700, 726);
          dfp: +prune — DF-P closed-form update, prune rows whose
            relative delta falls below prune_tol, expansion excludes
            self (pagerankPrune.hxx:57-126).
        """
        slices = [pk[int(s):int(e)] for pk, (s, e) in zip(packed, self.gather_layout)]
        return self._step_core(
            slices, C0, damping, use_affected, frontier, prune,
            frontier_tol, prune_tol, dangling_mass,
        )

    def _step_core(
        self, slices, C0, damping, use_affected, frontier, prune,
        frontier_tol, prune_tol, dangling_mass,
    ):
        t0 = time.perf_counter()
        d = damping
        r, n = self.r, self.n_local
        # restart + dangling teleport term per owned row. Uniform: the
        # scalar C0 + d*M/N (reference pagerank.hxx:155-174). With a
        # personalization vector installed, both the (1-d) restart and
        # the redistributed dangling mass teleport proportionally to
        # tele_v instead of uniformly — same kernel, vector base.
        if self.tele is None:
            base = C0 + d * dangling_mass / self.N
        else:
            base = ((1.0 - d) + d * dangling_mass) * self.tele
        nh = int(self.hub_counts[self.p]) if self.hub_split else 0
        if not use_affected:
            # fast full-sweep path: read each producer's segment directly
            # (zero-copy shared-memory view) through the rebased key
            # stream into the persistent per-edge buffer — no gathered
            # concatenation, no fresh allocations
            pe, cuts, keys = self._per_edge, self._edge_cuts, self._key_adj
            for q, sl in enumerate(slices):
                lo, hi = cuts[q], cuts[q + 1]
                if hi > lo:
                    np.take(sl, keys[lo:hi], out=pe[lo:hi])
            if self._w_sweep is not None:
                # weighted pull: per-edge value = (r_u / W_u) * w_uv
                np.multiply(pe, self._w_sweep, out=pe)
            sums = np.bincount(self.in_rows_sweep, weights=pe, minlength=n)
            np.multiply(sums, d, out=sums)
            sums += base
            a = sums
            if nh:
                # hub rows: combine the per-source partial sums riding
                # each slice's tail (the distributed block-reduce)
                hub_sum = np.zeros(nh, dtype=np.float64)
                for sl in slices:
                    hub_sum += sl[len(sl) - nh:]
                bh = base if self.tele is None else base[self.hub_rows]
                a[self.hub_rows] = bh + d * hub_sum
            rows = None
        else:
            regs = [sl[: len(sl) - nh] for sl in slices] if nh else slices
            gathered = (
                np.concatenate(regs) if len(regs) > 1
                else (regs[0] if regs else np.empty(0))
            )
            a = r.copy()
            rows = np.flatnonzero(self.vaff)
            if rows.size:
                edge_idx, bounds = K.gather_subset_edges(self.in_offsets, rows)
                per_edge = gathered[self.in_key[edge_idx]]
                if self.in_w is not None:
                    per_edge = per_edge * self.in_w[edge_idx]
                sums = K.segment_sums(per_edge, bounds)
                br = base if self.tele is None else base[rows]
                if prune:
                    # closed-form self-loop fixpoint (pagerankPrune.hxx:38-39);
                    # deg >= 1 guaranteed by the self-loop transform, which
                    # pagerank() enforces for dfp (base == C0 there: the
                    # self-loop graph has no dangling mass). Weighted
                    # graphs factor the self-loop's WEIGHT w_vv out of
                    # the weighted out-degree: a_v = (b + d(s − r_v·w_vv/W_v))
                    # / (1 − d·w_vv/W_v) — reduces to the unit form when
                    # w_vv == 1 and W_v == outdeg
                    if self.outw is not None:
                        W = self.outw[rows]
                        lw = self._loop_w[rows] / W
                        a[rows] = (br + d * (sums - r[rows] * lw)) / (1.0 - d * lw)
                    else:
                        deg = self.outdeg[rows]
                        a[rows] = (br + d * (sums - r[rows] / deg)) / (1.0 - d / deg)
                else:
                    a[rows] = br + d * sums
        delta = self._delta
        np.subtract(a, r, out=delta)
        np.abs(delta, out=delta)
        linf = float(delta.max()) if n else 0.0

        packed_marks = np.empty(0, dtype=np.int64)
        mark_offsets = np.zeros(self.P + 1, dtype=np.int64)
        if frontier:
            cand = rows if rows is not None else np.arange(n, dtype=np.int64)
            if cand.size:
                rel = delta[cand] / np.maximum(np.maximum(r[cand], a[cand]), 1e-300)
                if prune:
                    pruned = cand[rel <= prune_tol]
                    self.vaff[pruned] = False
                expand = cand[rel > frontier_tol]
                if expand.size:
                    edge_idx, bounds = K.gather_subset_edges(self.out_offsets, expand)
                    dsts = self.out_dst[edge_idx]
                    if prune:
                        # DF-P expansion excludes self (pagerankPrune.hxx:64: v != u)
                        own = np.repeat(expand * self.P + self.p, np.diff(bounds))
                        dsts = dsts[dsts != own]
                    order, cuts = K.owner_split(dsts, self.P)
                    dsts = dsts[order]
                    segs = [np.unique(dsts[cuts[q]:cuts[q + 1]] // self.P) for q in range(self.P)]
                    packed_marks = np.concatenate(segs)
                    mark_offsets[1:] = np.cumsum([len(s) for s in segs])
        self.r, self.a = a, r  # swap: final ranks live in r (pagerank.hxx:434)
        stats = {
            "part": self.p,
            "linf": linf,
            "affected": int(rows.size) if rows is not None else n,
            "gathered": int(sum(len(s) for s in slices)),
            "step_s": time.perf_counter() - t0,
        }
        if frontier:
            return (stats, packed_marks, mark_offsets)
        return stats

    def apply_marks_packed(self, *flat: np.ndarray) -> int:
        """OR in the frontier marks destined to this shard. ``flat`` is
        the interleaved (packed_marks_0, offsets_0, packed_marks_1,
        offsets_1, ...) from every source shard's step output. Returns
        newly-marked count."""
        newly = 0
        for q in range(0, len(flat), 2):
            m, off = flat[q], flat[q + 1]
            seg = m[off[self.p]:off[self.p + 1]]
            if len(seg):
                fresh = seg[~self.vaff[seg]]
                self.vaff[fresh] = True
                newly += len(fresh)
        return newly

    def apply_marks(self, *mark_arrays: np.ndarray) -> int:
        """OR incoming frontier marks into vaff; returns newly-marked count."""
        newly = 0
        for m in mark_arrays:
            if m is not None and len(m):
                fresh = m[~self.vaff[m]]
                self.vaff[fresh] = True
                newly += len(fresh)
        return newly

    def apply_marks_frontier(self, *mark_arrays: np.ndarray) -> np.ndarray:
        """Like apply_marks but returns the newly-marked local ids (BFS frontier)."""
        fresh_all = []
        for m in mark_arrays:
            if m is not None and len(m):
                fresh = m[~self.vaff[m]]
                self.vaff[fresh] = True
                fresh_all.append(fresh)
        return np.unique(np.concatenate(fresh_all)) if fresh_all else np.empty(0, dtype=np.int64)

    def expand_out_neighbors(self, src_locals: np.ndarray) -> list[np.ndarray]:
        """Out-neighbor local-ids per owner for the given owned sources —
        one hop of DF marking (pagerank.hxx:645-676) / DT BFS
        (pagerank.hxx:543-578, bfs.hxx:22-55)."""
        out: list[np.ndarray] = [np.empty(0, dtype=np.int64) for _ in range(self.P)]
        if src_locals.size:
            edge_idx, _ = K.gather_subset_edges(self.out_offsets, src_locals)
            dsts = self.out_dst[edge_idx]
            if dsts.size:
                order, cuts = K.owner_split(dsts, self.P)
                dsts = dsts[order]
                out = [np.unique(dsts[cuts[q]:cuts[q + 1]] // self.P) for q in range(self.P)]
        return (sum(len(o) for o in out), *out)

    # ------------------------------------------------------------------
    # p2p bulk-synchronous iteration (the scale path)
    #
    # The driver-coordinated loop above dispatches O(P) actor calls per
    # iteration, which becomes the bottleneck long before compute does
    # (and on a real multi-node cluster would make the driver the
    # scaling wall). run_iterations() instead runs the whole power-
    # iteration loop inside the actor pool: each shard pushes its packed
    # contribution object to every peer (P control messages per shard,
    # one shared-memory object), an L∞ allreduce doubles as the
    # iteration barrier and convergence vote, and frontier marks ride a
    # third message type. The driver dispatches ONE call per shard per
    # PageRank run. Math is identical to the driver loop (same segment
    # order, same kernels) — results are bit-equal.
    # ------------------------------------------------------------------

    async def recv_contribs(self, it: int, q: int, dangling: float, packed: np.ndarray) -> None:
        cv = self._ensure_cv()
        async with cv:
            self._contrib_inbox.setdefault(it, {})[q] = (dangling, packed)
            cv.notify_all()

    async def recv_marks(self, it: int, q: int, marks: np.ndarray, offs: np.ndarray) -> None:
        cv = self._ensure_cv()
        async with cv:
            self._marks_inbox.setdefault(it, {})[q] = (marks, offs)
            cv.notify_all()

    async def recv_linf(self, it: int, q: int, v: float) -> None:
        cv = self._ensure_cv()
        async with cv:
            self._linf_inbox.setdefault(it, {})[q] = v
            cv.notify_all()

    async def recv_iter_bundle(self, it: int, q: int, dangling: float,
                               packed: np.ndarray, linf_prev,
                               marks, offs) -> None:
        """Pipelined p2p message: contribs for iteration ``it`` plus the
        sender's L∞ of iteration ``it-1`` and its DF marks from step
        ``it-1`` — one barrier per iteration instead of 2-3."""
        cv = self._ensure_cv()
        async with cv:
            self._bundle_inbox.setdefault(it, {})[q] = (
                dangling, packed, linf_prev, marks, offs)
            cv.notify_all()

    def _ensure_cv(self) -> asyncio.Condition:
        if self._cv is None:
            self._cv = asyncio.Condition()
        return self._cv

    async def recv_labelmsg(self, it: int, q: int, payload: np.ndarray,
                            changed_prev: int = -1) -> None:
        """Pipelined label-round message: the sender's per-peer slice for
        round ``it`` plus its changed-count from round ``it-1`` (-1 on
        the first round) — one barrier per round instead of two."""
        cv = self._ensure_cv()
        async with cv:
            self._labelmsg_inbox.setdefault(it, {})[q] = (payload, changed_prev)
            cv.notify_all()

    async def run_label_iterations(
        self, peers: list, algo: str, max_rounds: int, source_vid: int = 0,
        warm: bool = False,
    ) -> int:
        """Run a whole label fixpoint (cc / lp / bfs) inside the pool —
        the label-algorithm analogue of :meth:`run_iterations`. ONE driver
        dispatch per shard per run; each round ships per-peer slices
        directly (no broadcast). Pipelined protocol (same trick as
        :meth:`_run_iterations_pipelined`): the changed-count vote for
        round ``it-1`` piggybacks on the label message for round ``it``,
        so each round costs ONE P² message barrier instead of two. Every
        shard votes on the identical global count before applying round
        ``it``, so all break at the same round with bit-identical labels
        (the apply order is unchanged; the final extra emit is consumed
        by every peer symmetrically). Returns rounds applied — the same
        count the two-barrier protocol reported.
        """
        import ray

        cv = self._ensure_cv()
        P, me = self.P, self.p
        frontier = None
        if algo == "cc":
            if not warm:  # warm: frontier pre-seeded via cc_seed_warm
                self.cc_init()
        elif algo == "lp":
            if not warm:
                self.lp_init()
            else:
                self.lp_assert_warm()
        elif algo == "bfs":
            frontier = self.bfs_init(source_vid)
        else:
            raise ValueError(f"unknown label algo {algo!r}")
        rounds = 0
        changed_prev = -1  # no vote piggybacked on the first round
        it = 0
        while True:
            if algo == "cc":
                _, *out = self.cc_push()
            elif algo == "lp":
                _, *out = self.lp_emit()
            else:
                _, *out = self.expand_sym_neighbors(frontier)
            if P > 1:
                for p, h in enumerate(peers):
                    if p != me:
                        h.recv_labelmsg.remote(it, me, out[p], changed_prev)
            async with cv:
                self._labelmsg_inbox.setdefault(it, {})[me] = (out[me], changed_prev)
                cv.notify_all()
                await cv.wait_for(lambda: len(self._labelmsg_inbox.get(it, {})) == P)
                inbox = self._labelmsg_inbox.pop(it)
            if changed_prev >= 0:
                # stop vote for round it-1 — the same global sum the
                # two-barrier protocol voted on after applying it-1
                if sum(v[1] for v in inbox.values()) == 0:
                    break
            if it >= max_rounds:
                break
            msgs = [inbox[q][0] for q in range(P)]
            if algo == "cc":
                changed = self.cc_apply(*msgs)
            elif algo == "lp":
                changed = self.lp_apply(*msgs)
                self.lp_swap()
            else:
                frontier = self.bfs_apply(it + 1, *msgs)
                changed = int(frontier.size)
            changed_prev = changed
            rounds = it + 1
            it += 1
        return rounds

    async def run_iterations(
        self,
        peers: list,
        start_iter: int,
        max_iterations: int,
        C0: float,
        damping: float,
        use_affected: bool,
        frontier: bool,
        prune: bool,
        frontier_tol: float,
        prune_tol: float,
        tolerance: float,
        redistribute: bool,
        checkpoint_every: int = 0,
        ckpt_dir: str | None = None,
        run_id: str | None = None,
        batch_idx: int = 0,
    ) -> list[dict]:
        """Run power iterations to convergence inside the pool; returns
        this shard's per-iteration stats (identical stopping iteration on
        every shard — the allreduce makes the decision data-identical).

        ``peers`` arrives per call so actor handles are never stored in
        actor state (a stored all-to-all handle mesh is a reference
        cycle that leaks the pool).

        Two protocols, identical math and identical stopping decisions:

        * **pipelined** (default): ONE message barrier per iteration —
          the L∞ vote for iteration ``it-1`` and the DF marks produced
          by step ``it-1`` piggyback on the contribution message for
          ``it`` (contribs depend only on ranks, not on vaff, so marks
          may be applied any time before step ``it``). Each shard
          decides convergence on the piggybacked votes BEFORE stepping
          ``it`` — the same global L∞ the barriered protocol votes on
          after stepping ``it-1``, so iteration counts and every rank
          bit are unchanged; only 2 of 3 per-iteration P² message
          rounds disappear (the round-4 8v32 scaling read straddled
          0.8 purely on this control-plane cost).
        * **barriered** (used when checkpointing): the original
          3-round protocol, kept because a checkpoint taken at end of
          iteration ``it`` must contain fully-applied marks — in the
          pipelined protocol marks for ``it`` are still in flight.
        """
        if not checkpoint_every:
            return await self._run_iterations_pipelined(
                peers, start_iter, max_iterations, C0, damping,
                use_affected, frontier, prune, frontier_tol, prune_tol,
                tolerance, redistribute,
            )
        return await self._run_iterations_barriered(
            peers, start_iter, max_iterations, C0, damping, use_affected,
            frontier, prune, frontier_tol, prune_tol, tolerance,
            redistribute, checkpoint_every, ckpt_dir, run_id, batch_idx,
        )

    async def _run_iterations_pipelined(
        self, peers, start_iter, max_iterations, C0, damping,
        use_affected, frontier, prune, frontier_tol, prune_tol,
        tolerance, redistribute,
    ) -> list[dict]:
        import ray

        cv = self._ensure_cv()
        P, me = self.P, self.p
        out: list[dict] = []
        it = start_iter
        prev_linf: float | None = None
        prev_marks: tuple | None = None  # (packed_marks, offsets)
        t_step = time.perf_counter()
        while True:
            # send bundle for `it`: contribs(it) + linf/marks of it-1
            c = self._contrib_vec()
            dangling = self._dangling() if redistribute else 0.0
            packed = self._packed_all(c)
            pm, po = prev_marks if prev_marks is not None else (None, None)
            if P > 1:
                pref = ray.put(packed)
                mref = ray.put(pm) if pm is not None else None
                for p, h in enumerate(peers):
                    if p != me:
                        h.recv_iter_bundle.remote(
                            it, me, dangling, pref, prev_linf, mref, po)
            async with cv:
                self._bundle_inbox.setdefault(it, {})[me] = (
                    dangling, packed, prev_linf, pm, po)
                cv.notify_all()
                await cv.wait_for(
                    lambda: len(self._bundle_inbox.get(it, {})) == P)
                inbox = self._bundle_inbox.pop(it)
            if prev_linf is not None:
                # convergence vote for iteration it-1 (piggybacked) —
                # the same max-of-locals the barriered allreduce takes
                linf_g = max(v[2] for v in inbox.values())
                out[-1]["linf_global"] = linf_g
                out[-1]["iter_s"] = time.perf_counter() - t_step
                if linf_g < tolerance:
                    break
            if it >= max_iterations:
                break
            t_step = time.perf_counter()
            # apply piggybacked DF marks (produced by step it-1) before
            # stepping it — exactly when the barriered protocol applies
            # them, relative to the kernels that read vaff
            if frontier:
                for q in range(P):
                    m, off = inbox[q][3], inbox[q][4]
                    if m is not None:
                        seg = m[off[me]:off[me + 1]]
                        if len(seg):
                            self.vaff[seg[~self.vaff[seg]]] = True
            dangling_mass = (
                sum(v[0] for v in inbox.values()) if redistribute else 0.0)
            res = self.step(
                C0, damping, use_affected, frontier, prune,
                frontier_tol, prune_tol, dangling_mass,
                *[inbox[q][1] for q in range(P)],
            )
            stats = res[0] if frontier else res
            prev_linf = stats["linf"]
            prev_marks = (res[1], res[2]) if frontier else None
            out.append(stats)
            it += 1
        return out

    async def _run_iterations_barriered(
        self, peers, start_iter, max_iterations, C0, damping,
        use_affected, frontier, prune, frontier_tol, prune_tol,
        tolerance, redistribute, checkpoint_every=0, ckpt_dir=None,
        run_id=None, batch_idx=0,
    ) -> list[dict]:
        import ray

        cv = self._ensure_cv()
        P, me = self.P, self.p
        out: list[dict] = []
        it = start_iter
        while it < max_iterations:
            t0 = time.perf_counter()
            # 1. broadcast packed contributions for iteration `it`
            c = self._contrib_vec()
            dangling = self._dangling() if redistribute else 0.0
            packed = self._packed_all(c)
            if P > 1:
                pref = ray.put(packed)
                for p, h in enumerate(peers):
                    if p != me:
                        h.recv_contribs.remote(it, me, dangling, pref)
            async with cv:
                self._contrib_inbox.setdefault(it, {})[me] = (dangling, packed)
                cv.notify_all()
                await cv.wait_for(lambda: len(self._contrib_inbox.get(it, {})) == P)
                inbox = self._contrib_inbox.pop(it)
            dangling_mass = sum(v[0] for v in inbox.values()) if redistribute else 0.0
            # 3. local step (same kernel as the driver loop)
            res = self.step(
                C0, damping, use_affected, frontier, prune,
                frontier_tol, prune_tol, dangling_mass,
                *[inbox[q][1] for q in range(P)],
            )
            stats = res[0] if frontier else res
            # 4. L∞ allreduce = barrier + convergence vote
            if P > 1:
                for p, h in enumerate(peers):
                    if p != me:
                        h.recv_linf.remote(it, me, stats["linf"])
            async with cv:
                self._linf_inbox.setdefault(it, {})[me] = stats["linf"]
                cv.notify_all()
                await cv.wait_for(lambda: len(self._linf_inbox.get(it, {})) == P)
                linfs = self._linf_inbox.pop(it)
            linf_g = max(linfs.values())
            stats["linf_global"] = linf_g
            stats["iter_s"] = time.perf_counter() - t0
            out.append(stats)
            done = (linf_g < tolerance) or (it + 1 >= max_iterations)
            # 5. marks ship only if another iteration will consume them;
            # they are exchanged AND applied before this iteration ends so
            # checkpointed vaff state is complete (a resume would otherwise
            # lose in-flight marks and under-mark the frontier)
            if frontier and not done:
                _, packed_marks, mark_offsets = res
                if P > 1:
                    mref = ray.put(packed_marks)
                    for p, h in enumerate(peers):
                        if p != me:
                            h.recv_marks.remote(it, me, mref, mark_offsets)
                async with cv:
                    self._marks_inbox.setdefault(it, {})[me] = (packed_marks, mark_offsets)
                    cv.notify_all()
                    await cv.wait_for(lambda: len(self._marks_inbox.get(it, {})) == P)
                    marks_in = self._marks_inbox.pop(it)
                for q in range(P):
                    m, off = marks_in[q]
                    seg = m[off[me]:off[me + 1]]
                    if len(seg):
                        self.vaff[seg[~self.vaff[seg]]] = True
            it += 1
            if checkpoint_every and ckpt_dir and it % checkpoint_every == 0:
                self.checkpoint(ckpt_dir, run_id, batch_idx, it)
            if linf_g < tolerance:
                break
        return out

    # ------------------------------------------------------------------
    # compiled-graph iteration (ray.dag)
    #
    # The third loop mode: the per-iteration dataflow (P contribs ->
    # all-to-all -> P steps) is compiled ONCE into a Ray compiled graph
    # whose actor tasks communicate over pre-allocated shared-memory
    # channels — per-iteration overhead drops from ~1.5ms×P (driver
    # dispatch) to tens of µs per task. The driver executes the graph
    # once per iteration and reads back only the P stats dicts; frontier
    # marks round-trip through the (tiny) input channel.
    # ------------------------------------------------------------------

    def contribs_dag(self, inp) -> tuple:
        """Per-destination contribution slices for one compiled-graph
        iteration (bound with num_returns=P so each destination's channel
        carries ONLY its segment — an all-to-all that ships exactly the
        needed bytes, not a P× broadcast of the full packed array).
        In dangling='redistribute' mode (params[7]) the local dangling
        mass rides each slice as one appended element."""
        c = self._contrib_vec()
        if self.hub_split:
            for p, buf in enumerate(self._send_bufs):
                self._pack_segment(c, p, buf)
            if inp[0][7]:
                dang = self._dangling()
                return tuple(np.append(b, dang) for b in self._send_bufs)
            return tuple(self._send_bufs)
        if inp[0][7]:  # redistribute: append the local dangling scalar
            dang = self._dangling()
            return tuple(np.append(c[idx], dang) for idx in self.send_idx)
        return tuple(
            np.take(c, idx, out=buf) for idx, buf in zip(self.send_idx, self._send_bufs)
        )

    def contribs_packed_dag(self, inp) -> np.ndarray:
        """Broadcast-layout variant of ``contribs_dag``: ONE packed
        contribution array per iteration (single compiled-graph channel,
        P consumers read it zero-copy from shared memory and slice their
        segment). P channels total instead of P² — the single-node fast
        path for large pools. Dangling mass rides as one appended tail
        element in redistribute mode."""
        c = self._contrib_vec()
        if inp[0][7]:
            return np.append(self._packed_all(c), self._dangling())
        return self._packed_all(c)

    def step_packed_dag(self, inp, *packed):
        """Broadcast-layout step: ``packed`` is every producer's full
        packed array; slice this shard's segment via ``gather_layout``
        (same consumption as the driver-mode ``step``)."""
        params, marks = inp
        C0, damping, use_affected, frontier, prune, ftol, ptol, redistribute = params
        if marks is not None:
            for m, off in marks:
                seg = m[off[self.p]:off[self.p + 1]]
                if len(seg):
                    self.vaff[seg[~self.vaff[seg]]] = True
        dangling_mass = sum(float(pk[-1]) for pk in packed) if redistribute else 0.0
        slices = [pk[int(s):int(e)] for pk, (s, e) in zip(packed, self.gather_layout)]
        return self._step_core(
            slices, C0, damping, use_affected, frontier, prune, ftol, ptol, dangling_mass
        )

    def step_dag(self, inp, *segs):
        """One compiled-graph step over pre-sliced per-source segments.
        ``inp`` = ((C0, damping, use_affected, frontier, prune,
        frontier_tol, prune_tol, redistribute), marks) with ``marks`` the
        previous iteration's per-source (packed_marks, offsets) list
        (applied before stepping), or None."""
        params, marks = inp
        C0, damping, use_affected, frontier, prune, ftol, ptol, redistribute = params
        if len(segs) == 1 and isinstance(segs[0], tuple):
            segs = segs[0]  # P=1: num_returns=1 delivers the tuple whole
        if marks is not None:
            for m, off in marks:
                seg = m[off[self.p]:off[self.p + 1]]
                if len(seg):
                    self.vaff[seg[~self.vaff[seg]]] = True
        segs = list(segs)
        dangling_mass = 0.0
        if redistribute:
            dangling_mass = sum(float(s[-1]) for s in segs)
            segs = [s[:-1] for s in segs]
        return self._step_core(
            segs, C0, damping, use_affected, frontier, prune, ftol, ptol, dangling_mass
        )

    # ------------------------------------------------------------------
    # checkpointing (mandated: per-iteration per-partition lineage)
    # ------------------------------------------------------------------

    def checkpoint(self, ckpt_dir: str, run_id: str, batch_idx: int, iteration: int) -> str:
        """Write this partition's ranks+flags as Parquet under the lineage
        path {dir}/{run}/batch={b}/iter={i}/part-{p}.parquet (atomic)."""
        d = os.path.join(ckpt_dir, run_id, f"batch={batch_idx}", f"iter={iteration}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"part-{self.p}.parquet")
        tbl = pa.table(
            {
                "vid": pa.array(self.owned_vids()),
                "rank": pa.array(self.r),
                "affected": pa.array(self.vaff),
            }
        )
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return path

    def restore(self, ckpt_dir: str, run_id: str, batch_idx: int, iteration: int) -> None:
        d = os.path.join(ckpt_dir, run_id, f"batch={batch_idx}", f"iter={iteration}")
        tbl = pq.read_table(os.path.join(d, f"part-{self.p}.parquet"))
        self.r = _np(tbl["rank"]).astype(np.float64)
        self.a = self.r.copy()
        self.vaff = _np(tbl["affected"]).astype(bool)

    # ------------------------------------------------------------------
    # symmetrized view + connected components + label propagation
    # ------------------------------------------------------------------

    def build_symmetric(self) -> None:
        """Per-owned-vertex undirected adjacency = out_dst ∪ in_src minus
        self — symmetrizeW (/root/reference/inc/symmetrize.hxx:14-82) as a
        local merge (both directions of every incident edge are already
        routed here)."""
        n, N = self.n_local, self.N
        o_local, o_dst = self.out_keys // N, self.out_keys % N
        i_local, i_src = self.in_keys // N, self.in_keys % N
        local = np.concatenate([o_local, i_local])
        other = np.concatenate([o_dst, i_src])
        own = local * self.P + self.p
        keep = other != own
        self.sym_offsets, self.sym_adj = K.build_csr(local[keep], other[keep], n, dedup=True)

    def cc_init(self) -> None:
        """Min-label CC init: label[v] = vid; whole shard is the frontier."""
        self.labels = self.owned_vids().copy()
        self._label_frontier = np.arange(self.n_local, dtype=np.int64)
        self._labels_kind = "cc"

    def cc_seed_warm(self, seeds_local: np.ndarray) -> None:
        """Incremental CC: keep the converged labels, seed the frontier
        with just the given rows (endpoints of inserted edges). Insertions
        can only MERGE components, and min-label propagation from the new
        edges' endpoints reaches exactly the vertices whose label must
        shrink — so a warm fixpoint equals a cold recompute bit-for-bit."""
        if getattr(self, "_labels_kind", None) != "cc":
            raise ValueError("warm CC needs converged CC labels on the shards "
                             "(run connected_components cold first)")
        self._label_frontier = np.unique(np.asarray(seeds_local, dtype=np.int64))

    def cc_push(self) -> list[np.ndarray]:
        """Push current labels of frontier vertices to neighbors, min-combined
        per (owner, dst): returns (k, pairs_for_0, ..., pairs_for_{P-1}),
        each a (2,k) array [dst_local, label]."""
        out: list[np.ndarray] = [np.empty((2, 0), dtype=np.int64) for _ in range(self.P)]
        fr = self._label_frontier
        if fr.size:
            edge_idx, bounds = K.gather_subset_edges(self.sym_offsets, fr)
            dsts = self.sym_adj[edge_idx]
            labs = np.repeat(self.labels[fr], np.diff(bounds))
            if dsts.size:
                # min label per destination (combiner before the exchange)
                dsts, labs = K.pair_sort(dsts, labs)
                first = np.empty(len(dsts), dtype=bool)
                first[0] = True
                first[1:] = dsts[1:] != dsts[:-1]
                dsts, labs = dsts[first], labs[first]
                by_owner, cuts = K.owner_split(dsts, self.P)
                dsts, labs = dsts[by_owner], labs[by_owner]
                out = [np.stack([dsts[cuts[q]:cuts[q + 1]] // self.P, labs[cuts[q]:cuts[q + 1]]]) for q in range(self.P)]
        return (sum(o.shape[1] for o in out), *out)

    def cc_apply(self, *pair_arrays: np.ndarray) -> int:
        """Apply min-label candidates; new frontier = vertices whose label
        shrank. Returns the change count (global fixpoint = sum == 0)."""
        dsts = [p[0] for p in pair_arrays if p is not None and p.shape[1]]
        labs = [p[1] for p in pair_arrays if p is not None and p.shape[1]]
        if not dsts:
            self._label_frontier = np.empty(0, dtype=np.int64)
            return 0
        dst = np.concatenate(dsts)
        lab = np.concatenate(labs)
        dst, lab = K.pair_sort(dst, lab)
        first = np.empty(len(dst), dtype=bool)
        first[0] = True
        first[1:] = dst[1:] != dst[:-1]
        dst, lab = dst[first], lab[first]
        improved = lab < self.labels[dst]
        self.labels[dst[improved]] = lab[improved]
        self._label_frontier = dst[improved]
        return int(improved.sum())

    def labels_table(self, colname: str = "component") -> pa.Table:
        return pa.table({"vid": pa.array(self.owned_vids()), colname: pa.array(self.labels)})

    # --- synchronous label propagation (community detection) ---

    def lp_init(self) -> None:
        self.labels = self.owned_vids().copy()
        self._labels_kind = "lp"

    def lp_emit(self) -> list[np.ndarray]:
        """Emit (dst_local, label, count) triples per owner: each owned v
        votes its current label to every undirected neighbor, pre-counted
        per shard (the combiner before the shuffle)."""
        out: list[np.ndarray] = [np.empty((3, 0), dtype=np.int64) for _ in range(self.P)]
        if self.sym_adj is None or self.sym_adj.size == 0:
            return (0, *out)
        lens = np.diff(self.sym_offsets)
        dsts = self.sym_adj
        labs = np.repeat(self.labels, lens)
        dsts, labs = K.pair_sort(dsts, labs)
        new = np.empty(len(dsts), dtype=bool)
        new[0] = True
        new[1:] = (dsts[1:] != dsts[:-1]) | (labs[1:] != labs[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(dsts)))
        dsts, labs = dsts[starts], labs[starts]
        by_owner, cuts = K.owner_split(dsts, self.P)
        dsts, labs, counts = dsts[by_owner], labs[by_owner], counts[by_owner]
        out = [
            np.stack([dsts[cuts[q]:cuts[q + 1]] // self.P, labs[cuts[q]:cuts[q + 1]], counts[cuts[q]:cuts[q + 1]]])
            for q in range(self.P)
        ]
        return (sum(o.shape[1] for o in out), *out)

    def lp_apply(self, *triples: np.ndarray) -> int:
        """Synchronous LP update: per owned vertex, the most frequent
        neighbor label, ties broken toward the lowest label; vertices with
        no neighbors keep their label. Returns changed count."""
        parts = [t for t in triples if t is not None and t.shape[1]]
        if not parts:
            return 0
        dst = np.concatenate([t[0] for t in parts])
        lab = np.concatenate([t[1] for t in parts])
        cnt = np.concatenate([t[2] for t in parts])
        order = K.pair_argsort(dst, lab)
        dst, lab, cnt = dst[order], lab[order], cnt[order]
        new = np.empty(len(dst), dtype=bool)
        new[0] = True
        new[1:] = (dst[1:] != dst[:-1]) | (lab[1:] != lab[:-1])
        grp = np.cumsum(new) - 1
        tot = np.zeros(grp[-1] + 1, dtype=np.int64)
        np.add.at(tot, grp, cnt)
        g_dst, g_lab = dst[new], lab[new]
        # winner per dst: max count, then min label (lexsort is stable)
        order2 = np.lexsort((g_lab, -tot, g_dst))
        g_dst, g_lab = g_dst[order2], g_lab[order2]
        first = np.empty(len(g_dst), dtype=bool)
        first[0] = True
        first[1:] = g_dst[1:] != g_dst[:-1]
        w_dst, w_lab = g_dst[first], g_lab[first]
        changed = int((self.labels[w_dst] != w_lab).sum())
        new_labels = self.labels.copy()
        new_labels[w_dst] = w_lab
        self._next_labels = new_labels
        return changed

    def lp_assert_warm(self) -> None:
        """Warm LP restart precondition: converged LP labels from a prior
        cold run must still be installed (a CC/BFS run in between would
        have overwritten them with different semantics)."""
        kind = getattr(self, "_labels_kind", None)
        if self.labels is None or kind != "lp":
            raise ValueError(
                "label_propagation_incremental needs converged LP labels "
                f"(run label_propagation first; labels kind is {kind!r})")

    def lp_swap(self) -> None:
        """Install the synchronously-computed labels (all shards barrier)."""
        if self._next_labels is not None:
            self.labels = self._next_labels
            self._next_labels = None

    # --- maximal independent set (Luby rounds, fixed hash priorities) ---

    def mis_init(self) -> int:
        """Status 0=active, 1=in MIS, 2=excluded; priority =
        splitmix64(vid). The finalizer is bijective on uint64, so
        distinct vertices never tie and the parallel rounds converge to
        the unique greedy MIS in increasing-hash order — the property
        the SQL oracle replays. Returns the shard's active count."""
        from ..functions.hashing import splitmix64 as _sm
        self._mis_status = np.zeros(self.n_local, dtype=np.int8)
        self._mis_prio = _sm(self.owned_vids().astype(np.uint64))
        self._mis_new = np.empty(0, dtype=np.int64)
        return self.n_local

    def mis_push_prio(self) -> list[np.ndarray]:
        """Push each ACTIVE owned vertex's priority to its undirected
        neighbors, min-combined per (owner, dst) before the exchange.
        Returns (k, pairs_0..pairs_{P-1}); each (2,k) int64 array is
        [dst_local, priority-bits] (uint64 priorities shipped as int64
        bit patterns — combined BEFORE the view, compared after)."""
        out: list[np.ndarray] = [np.empty((2, 0), dtype=np.int64) for _ in range(self.P)]
        act = np.flatnonzero(self._mis_status == 0)
        if act.size:
            edge_idx, bounds = K.gather_subset_edges(self.sym_offsets, act)
            dsts = self.sym_adj[edge_idx]
            prio = np.repeat(self._mis_prio[act], np.diff(bounds))
            if dsts.size:
                order = np.lexsort((prio, dsts))
                dsts, prio = dsts[order], prio[order]
                first = np.empty(len(dsts), dtype=bool)
                first[0] = True
                first[1:] = dsts[1:] != dsts[:-1]
                dsts, prio = dsts[first], prio[first]
                by_owner, cuts = K.owner_split(dsts, self.P)
                dsts, prio = dsts[by_owner], prio[by_owner].view(np.int64)
                out = [np.stack([dsts[cuts[q]:cuts[q + 1]] // self.P,
                                 prio[cuts[q]:cuts[q + 1]]]) for q in range(self.P)]
        return (sum(o.shape[1] for o in out), *out)

    def mis_decide(self, *pairs: np.ndarray) -> int:
        """An active owned vertex joins the MIS iff its priority is a
        strict minimum over its ACTIVE neighbors' (no candidate received
        means every neighbor is decided — join). Returns new members."""
        mn = np.full(self.n_local, np.iinfo(np.uint64).max, dtype=np.uint64)
        rec = np.zeros(self.n_local, dtype=bool)
        for pr in pairs:
            if pr is not None and pr.shape[1]:
                d = pr[0]
                np.minimum.at(mn, d, pr[1].view(np.uint64))
                rec[d] = True
        join = (self._mis_status == 0) & (~rec | (self._mis_prio < mn))
        self._mis_new = np.flatnonzero(join)
        self._mis_status[self._mis_new] = 1
        return int(self._mis_new.size)

    def mis_push_excl(self) -> list[np.ndarray]:
        """Push exclusion marks from this round's new members to their
        neighbors (deduped local rows per owner)."""
        out: list[np.ndarray] = [np.empty(0, dtype=np.int64) for _ in range(self.P)]
        if self._mis_new.size:
            edge_idx, _ = K.gather_subset_edges(self.sym_offsets, self._mis_new)
            dsts = np.unique(self.sym_adj[edge_idx])
            by_owner, cuts = K.owner_split(dsts, self.P)
            dsts = dsts[by_owner]
            out = [dsts[cuts[q]:cuts[q + 1]] // self.P for q in range(self.P)]
        return (sum(len(o) for o in out), *out)

    def mis_apply_excl(self, *arrs: np.ndarray) -> int:
        """Exclude still-active neighbors of new members; returns the
        shard's remaining active count (global fixpoint = sum == 0)."""
        for a in arrs:
            if a is not None and a.size:
                sel = a[self._mis_status[a] == 0]
                self._mis_status[sel] = 2
        return int((self._mis_status == 0).sum())

    def mis_table(self) -> pa.Table:
        return pa.table({"vid": pa.array(self.owned_vids()),
                         "in_mis": pa.array((self._mis_status == 1).astype(np.int64))})

    # --- walk-count centrality (exact-integer truncated Katz) ---

    def wc_init(self) -> None:
        """w_0 = 1 per vertex; running total starts at w_0. All
        arithmetic is int64 — walk counts are exact and associative,
        so shard order / exchange grouping cannot change the result
        (the float-free analogue of the Katz recurrence with alpha=1
        truncated at a fixed length)."""
        self._wc = np.ones(self.n_local, dtype=np.int64)
        self._wc_total = np.ones(self.n_local, dtype=np.int64)

    def wc_push(self) -> list[np.ndarray]:
        """Push every owned vertex's walk count along its out-edges,
        sum-combined per (owner, dst) via an exact integer segment sum
        (np.add.reduceat — never bincount's float weights). Guards the
        next level's partial sums against int64 overflow BEFORE they
        can wrap."""
        out: list[np.ndarray] = [np.empty((2, 0), dtype=np.int64) for _ in range(self.P)]
        if self.out_dst is not None and len(self.out_dst):
            e_shard = len(self.out_dst)
            if int(self._wc.max(initial=0)) > (2 ** 62) // max(1, e_shard):
                raise OverflowError(
                    "walk counts would overflow int64; reduce the walk length")
            w_edge = np.repeat(self._wc, np.diff(self.out_offsets))
            order = np.argsort(self.out_dst, kind="stable")
            dsts, w_edge = self.out_dst[order], w_edge[order]
            starts = np.flatnonzero(np.r_[True, dsts[1:] != dsts[:-1]])
            sums = np.add.reduceat(w_edge, starts)
            dsts = dsts[starts]
            by_owner, cuts = K.owner_split(dsts, self.P)
            dsts, sums = dsts[by_owner], sums[by_owner]
            out = [np.stack([dsts[cuts[q]:cuts[q + 1]] // self.P,
                             sums[cuts[q]:cuts[q + 1]]]) for q in range(self.P)]
        return (sum(o.shape[1] for o in out), *out)

    def wc_apply(self, *pairs: np.ndarray) -> None:
        """Sum incoming per-shard partials into the next level's counts
        and fold them into the running total."""
        s = np.zeros(self.n_local, dtype=np.int64)
        for pr in pairs:
            if pr is not None and pr.shape[1]:
                np.add.at(s, pr[0], pr[1])
        self._wc = s
        self._wc_total += s

    def wc_table(self) -> pa.Table:
        return pa.table({"vid": pa.array(self.owned_vids()),
                         "walks": pa.array(self._wc_total)})

    # --- temporal earliest arrival (time-respecting directed reachability) ---

    def ta_reset(self) -> None:
        self._ta_chunks: list[np.ndarray] = []

    def ta_ingest(self, tbl: pa.Table) -> int:
        """Accumulate routed (src_local, dst_vid, ts_us) triples for the
        temporal adjacency (src-owner routed; per-edge timestamps kept —
        the one graph view where the CSR carries edge payloads)."""
        self._ta_chunks.append(np.stack([
            tbl["src"].to_numpy() // self.P,
            tbl["dst"].to_numpy(),
            tbl["t"].to_numpy(),
        ]))
        return tbl.num_rows

    def ta_finalize(self) -> int:
        """Build the per-shard temporal CSR: edges sorted by
        (src_local, ts, dst) with offsets over owned rows."""
        if self._ta_chunks:
            all_ = np.concatenate(self._ta_chunks, axis=1)
        else:
            all_ = np.empty((3, 0), dtype=np.int64)
        self._ta_chunks = []
        s, d, t = all_[0], all_[1], all_[2]
        order = np.lexsort((d, t, s))
        s, self.ta_dst, self.ta_ts = s[order], d[order], t[order]
        self.ta_off = np.zeros(self.n_local + 1, dtype=np.int64)
        np.cumsum(np.bincount(s, minlength=self.n_local), out=self.ta_off[1:])
        return int(len(s))

    def ta_init(self, source_vid: int) -> int:
        """arrival = +inf; the source (if owned) starts at epoch 0 (all
        real timestamps are positive, so its full out-timeline is
        usable)."""
        self._ta_inf = np.iinfo(np.int64).max
        self.ta_arr = np.full(self.n_local, self._ta_inf, dtype=np.int64)
        self._ta_active = np.empty(0, dtype=np.int64)
        if source_vid % self.P == self.p:
            loc = source_vid // self.P
            self.ta_arr[loc] = 0
            self._ta_active = np.array([loc], dtype=np.int64)
        return int(self._ta_active.size)

    def ta_push(self) -> list[np.ndarray]:
        """Time-respecting relaxation of the rows improved last round:
        an edge (u, v, t) is usable iff t >= arrival(u) and delivers
        candidate arrival t + 1; candidates min-combine per (owner, dst)
        before the exchange. Lowering an arrival only ENLARGES the
        usable timeline, so the BSP min-fixpoint is the exact earliest
        arrival."""
        out: list[np.ndarray] = [np.empty((2, 0), dtype=np.int64) for _ in range(self.P)]
        act = self._ta_active
        if act.size and self.ta_off[-1]:
            edge_idx, bounds = K.gather_subset_edges(self.ta_off, act)
            if edge_idx.size:
                usable = self.ta_ts[edge_idx] >= np.repeat(self.ta_arr[act], np.diff(bounds))
                sel = edge_idx[usable]
                if sel.size:
                    dsts = self.ta_dst[sel]
                    cand = self.ta_ts[sel] + 1
                    order = np.lexsort((cand, dsts))
                    dsts, cand = dsts[order], cand[order]
                    first = np.empty(len(dsts), dtype=bool)
                    first[0] = True
                    first[1:] = dsts[1:] != dsts[:-1]
                    dsts, cand = dsts[first], cand[first]
                    by_owner, cuts = K.owner_split(dsts, self.P)
                    dsts, cand = dsts[by_owner], cand[by_owner]
                    out = [np.stack([dsts[cuts[q]:cuts[q + 1]] // self.P,
                                     cand[cuts[q]:cuts[q + 1]]]) for q in range(self.P)]
        return (sum(o.shape[1] for o in out), *out)

    def ta_apply(self, *pairs: np.ndarray) -> int:
        """Min-fold incoming arrival candidates; improved rows become
        the next active set."""
        mn = np.full(self.n_local, self._ta_inf, dtype=np.int64)
        for pr in pairs:
            if pr is not None and pr.shape[1]:
                np.minimum.at(mn, pr[0], pr[1])
        imp = mn < self.ta_arr
        self.ta_arr[imp] = mn[imp]
        self._ta_active = np.flatnonzero(imp)
        return int(self._ta_active.size)

    def ta_table(self) -> pa.Table:
        a = np.where(self.ta_arr == self._ta_inf, np.int64(-1), self.ta_arr)
        return pa.table({"vid": pa.array(self.owned_vids()), "arrival": pa.array(a)})

    # --- greedy coloring (Jones-Plassmann rounds, fixed hash priorities) ---

    def col_init(self) -> int:
        """color = -1 (uncolored); priority = splitmix64(vid), bijective
        so distinct vertices never tie. A vertex colors itself the round
        every smaller-hash neighbor is colored, with the mex of its
        colored neighbors' colors — at that moment exactly its
        smaller-hash neighbors (a larger-hash neighbor cannot be colored
        first: this vertex blocks its readiness), so the fixpoint IS the
        sequential greedy coloring in increasing-hash order —
        schedule/partition invariant, replayed by the SQL oracle."""
        from ..functions.hashing import splitmix64 as _sm
        self._col = np.full(self.n_local, -1, dtype=np.int64)
        self._col_prio = _sm(self.owned_vids().astype(np.uint64))
        # neighbor-color marks accumulated from rounds' exchanges
        self._col_nv = [np.empty(0, dtype=np.int64)]   # owned local rows
        self._col_nc = [np.empty(0, dtype=np.int64)]   # their nbr colors
        self._col_new = np.empty(0, dtype=np.int64)
        return self.n_local

    def col_push_prio(self) -> list[np.ndarray]:
        """Push each UNCOLORED owned vertex's priority to its undirected
        neighbors, min-combined per (owner, dst) — same exchange shape
        as mis_push_prio."""
        out: list[np.ndarray] = [np.empty((2, 0), dtype=np.int64) for _ in range(self.P)]
        act = np.flatnonzero(self._col == -1)
        if act.size:
            edge_idx, bounds = K.gather_subset_edges(self.sym_offsets, act)
            dsts = self.sym_adj[edge_idx]
            prio = np.repeat(self._col_prio[act], np.diff(bounds))
            if dsts.size:
                order = np.lexsort((prio, dsts))
                dsts, prio = dsts[order], prio[order]
                first = np.empty(len(dsts), dtype=bool)
                first[0] = True
                first[1:] = dsts[1:] != dsts[:-1]
                dsts, prio = dsts[first], prio[first]
                by_owner, cuts = K.owner_split(dsts, self.P)
                dsts, prio = dsts[by_owner], prio[by_owner].view(np.int64)
                out = [np.stack([dsts[cuts[q]:cuts[q + 1]] // self.P,
                                 prio[cuts[q]:cuts[q + 1]]]) for q in range(self.P)]
        return (sum(o.shape[1] for o in out), *out)

    def col_decide(self, *pairs: np.ndarray) -> int:
        """Ready = uncolored with a strict priority minimum over its
        UNCOLORED neighbors; color = mex over the accumulated neighbor
        colors (exactly the smaller-hash neighbors at readiness).
        Vectorized mex: sort the ready rows' (row, color) marks, dedupe,
        compare each color to its within-segment rank — the mex is the
        first mismatch (else the segment length)."""
        mn = np.full(self.n_local, np.iinfo(np.uint64).max, dtype=np.uint64)
        rec = np.zeros(self.n_local, dtype=bool)
        for pr in pairs:
            if pr is not None and pr.shape[1]:
                d = pr[0]
                np.minimum.at(mn, d, pr[1].view(np.uint64))
                rec[d] = True
        ready = np.flatnonzero((self._col == -1) & (~rec | (self._col_prio < mn)))
        self._col_new = ready
        if not ready.size:
            return 0
        mex = np.zeros(len(ready), dtype=np.int64)
        nv = np.concatenate(self._col_nv)
        if nv.size:
            nc = np.concatenate(self._col_nc)
            self._col_nv, self._col_nc = [nv], [nc]
            is_ready = np.zeros(self.n_local, dtype=bool)
            is_ready[ready] = True
            sel = is_ready[nv]
            v, c = nv[sel], nc[sel]
            if v.size:
                uniq = np.unique(np.stack([v, c]), axis=1)
                v, c = uniq[0], uniq[1]
                starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
                seg_id = np.cumsum(np.r_[False, v[1:] != v[:-1]])
                rank = np.arange(len(v)) - starts[seg_id]
                seg_len = np.diff(np.r_[starts, len(v)])
                # first in-segment rank where color != rank, else seg len
                miss = np.where(c != rank, rank, np.int64(1) << 60)
                seg_mex = np.minimum(np.minimum.reduceat(miss, starts), seg_len)
                rows = np.searchsorted(ready, v[starts])
                mex[rows] = seg_mex
        self._col[ready] = mex
        return int(ready.size)

    def col_push_colors(self) -> list[np.ndarray]:
        """Push this round's new (neighbor_local, color) marks to the
        owners of the new members' neighbors."""
        out: list[np.ndarray] = [np.empty((2, 0), dtype=np.int64) for _ in range(self.P)]
        if self._col_new.size:
            edge_idx, bounds = K.gather_subset_edges(self.sym_offsets, self._col_new)
            dsts = self.sym_adj[edge_idx]
            cols = np.repeat(self._col[self._col_new], np.diff(bounds))
            if dsts.size:
                uniq = np.unique(np.stack([dsts, cols]), axis=1)
                dsts, cols = uniq[0], uniq[1]
                by_owner, cuts = K.owner_split(dsts, self.P)
                dsts, cols = dsts[by_owner], cols[by_owner]
                out = [np.stack([dsts[cuts[q]:cuts[q + 1]] // self.P,
                                 cols[cuts[q]:cuts[q + 1]]]) for q in range(self.P)]
        return (sum(o.shape[1] for o in out), *out)

    def col_apply_colors(self, *pairs: np.ndarray) -> int:
        """Append incoming neighbor-color marks for still-uncolored
        owned rows; returns the shard's remaining uncolored count."""
        for pr in pairs:
            if pr is not None and pr.shape[1]:
                keep = self._col[pr[0]] == -1
                self._col_nv.append(pr[0][keep])
                self._col_nc.append(pr[1][keep])
        return int((self._col == -1).sum())

    def col_table(self) -> pa.Table:
        return pa.table({"vid": pa.array(self.owned_vids()),
                         "color": pa.array(self._col)})

    # --- weighted SSSP (Bellman-Ford BSP, deterministic hash weights) ---

    def sssp_init(self, source_vid: int, wmod: int) -> int:
        """dist = +inf sentinel everywhere; the source (if owned) seeds
        the active set. Edge weights are never stored or shipped:
        w(u, v) = 1 + mix2(min(u,v), max(u,v)) % wmod is a pure
        symmetric function of the endpoint vids, recomputed wherever
        the edge is relaxed (and replayed bit-equal by the SQL oracle)."""
        self._sssp_inf = np.iinfo(np.int64).max
        self.sdist = np.full(self.n_local, self._sssp_inf, dtype=np.int64)
        self._sssp_wmod = np.uint64(wmod)
        self._sssp_active = np.empty(0, dtype=np.int64)
        if source_vid % self.P == self.p:
            loc = source_vid // self.P
            self.sdist[loc] = 0
            self._sssp_active = np.array([loc], dtype=np.int64)
        return int(self._sssp_active.size)

    def sssp_push(self) -> list[np.ndarray]:
        """Relax the undirected edges of the rows improved last round
        (frontier-restricted like the DF sweep's affected-only work
        skip, /root/reference/inc/pagerankCuda.hxx:94-97): candidates
        dist(u) + w(u, v), min-combined per (owner, dst) BEFORE the
        exchange. Returns (k, pairs_0..pairs_{P-1}); each (2, k) int64
        array is [dst_local, candidate_dist]."""
        from ..functions.hashing import mix2 as _mix2
        out: list[np.ndarray] = [np.empty((2, 0), dtype=np.int64) for _ in range(self.P)]
        act = self._sssp_active
        if act.size and self.sym_adj is not None and self.sym_adj.size:
            edge_idx, bounds = K.gather_subset_edges(self.sym_offsets, act)
            dsts = self.sym_adj[edge_idx]
            if dsts.size:
                lens = np.diff(bounds)
                srcs = np.repeat(self.owned_vids()[act], lens)
                lo = np.minimum(srcs, dsts).astype(np.uint64)
                hi = np.maximum(srcs, dsts).astype(np.uint64)
                w = 1 + (_mix2(lo, hi) % self._sssp_wmod).astype(np.int64)
                cand = np.repeat(self.sdist[act], lens) + w
                order = np.lexsort((cand, dsts))
                dsts, cand = dsts[order], cand[order]
                first = np.empty(len(dsts), dtype=bool)
                first[0] = True
                first[1:] = dsts[1:] != dsts[:-1]
                dsts, cand = dsts[first], cand[first]
                by_owner, cuts = K.owner_split(dsts, self.P)
                dsts, cand = dsts[by_owner], cand[by_owner]
                out = [np.stack([dsts[cuts[q]:cuts[q + 1]] // self.P,
                                 cand[cuts[q]:cuts[q + 1]]]) for q in range(self.P)]
        return (sum(o.shape[1] for o in out), *out)

    def sssp_apply(self, *pairs: np.ndarray) -> int:
        """Min-fold incoming candidates into the owned distances; the
        strictly-improved rows become the next active set. Returns the
        shard's improved count (global fixpoint = sum == 0)."""
        mn = np.full(self.n_local, self._sssp_inf, dtype=np.int64)
        for pr in pairs:
            if pr is not None and pr.shape[1]:
                np.minimum.at(mn, pr[0], pr[1])
        imp = mn < self.sdist
        self.sdist[imp] = mn[imp]
        self._sssp_active = np.flatnonzero(imp)
        return int(self._sssp_active.size)

    def sssp_table(self) -> pa.Table:
        d = np.where(self.sdist == self._sssp_inf, np.int64(-1), self.sdist)
        return pa.table({"vid": pa.array(self.owned_vids()), "sdist": pa.array(d)})

    # --- level-synchronous BFS (bfs.hxx:22-55 as frontier rounds) ---

    def bfs_init(self, source_vid: int) -> np.ndarray:
        """dist = -1 everywhere; the source (if owned) seeds the frontier."""
        self.dist = np.full(self.n_local, -1, dtype=np.int64)
        if source_vid % self.P == self.p:
            loc = source_vid // self.P
            self.dist[loc] = 0
            return np.array([loc], dtype=np.int64)
        return np.empty(0, dtype=np.int64)

    def expand_sym_neighbors(self, src_locals: np.ndarray):
        """Undirected-neighbor expansion of a frontier, per-owner split."""
        out: list[np.ndarray] = [np.empty(0, dtype=np.int64) for _ in range(self.P)]
        if src_locals.size and self.sym_adj is not None and self.sym_adj.size:
            edge_idx, _ = K.gather_subset_edges(self.sym_offsets, src_locals)
            dsts = self.sym_adj[edge_idx]
            if dsts.size:
                order, cuts = K.owner_split(dsts, self.P)
                dsts = dsts[order]
                out = [np.unique(dsts[cuts[q]:cuts[q + 1]] // self.P) for q in range(self.P)]
        return (sum(len(o) for o in out), *out)

    def expand_in_neighbors(self, src_locals: np.ndarray):
        """In-neighbor (transpose) expansion of a frontier, per-owner
        split — the backward hop of directed reachability (same contract
        as expand_out_neighbors / expand_sym_neighbors)."""
        out: list[np.ndarray] = [np.empty(0, dtype=np.int64) for _ in range(self.P)]
        if src_locals.size and self.in_src is not None and len(self.in_src):
            edge_idx, _ = K.gather_subset_edges(self.in_offsets, src_locals)
            srcs = self.in_src[edge_idx]
            if srcs.size:
                order, cuts = K.owner_split(srcs, self.P)
                srcs = srcs[order]
                out = [np.unique(srcs[cuts[q]:cuts[q + 1]] // self.P) for q in range(self.P)]
        return (sum(len(o) for o in out), *out)

    def reach_snapshot(self) -> None:
        """Save the current BFS visited set (dist >= 0) so a second
        (backward) sweep can reuse the dist machinery."""
        self._reach_fwd = self.dist >= 0

    def scc_member_table(self, seed_vid: int) -> pa.Table:
        """Owned members of the seed's SCC = forward-visited (snapshot)
        ∩ backward-visited (current dist)."""
        m = self._reach_fwd & (self.dist >= 0)
        vids = self.owned_vids()[m]
        return pa.table({
            "seed_vid": pa.array(np.full(len(vids), seed_vid, dtype=np.int64)),
            "vid": pa.array(vids),
        })

    def bfs_apply(self, level: int, *mark_arrays: np.ndarray) -> np.ndarray:
        """Set dist=level on unvisited marked vertices; returns new frontier."""
        fresh_all = []
        for m in mark_arrays:
            if m is not None and len(m):
                fresh = m[self.dist[m] < 0]
                self.dist[fresh] = level
                fresh_all.append(fresh)
        return np.unique(np.concatenate(fresh_all)) if fresh_all else np.empty(0, dtype=np.int64)

    def dist_table(self) -> pa.Table:
        return pa.table({"vid": pa.array(self.owned_vids()), "distance": pa.array(self.dist)})

    # --- Brandes passes (shortest-path counts + dependency sweep) on
    # the symmetric view: forward = level-synchronous BFS carrying
    # integer path counts; backward = per-level dependency exchange ---

    def sp_init(self, source_vid: int) -> np.ndarray:
        self.dist = np.full(self.n_local, -1, dtype=np.int64)
        self.sigma = np.zeros(self.n_local, dtype=np.int64)
        self._delta_bt = np.zeros(self.n_local, dtype=np.float64)
        if source_vid % self.P == self.p:
            loc = source_vid // self.P
            self.dist[loc] = 0
            self.sigma[loc] = 1
            return np.array([loc], dtype=np.int64)
        return np.empty(0, dtype=np.int64)

    def _sym_emit(self, locals_: np.ndarray, values: np.ndarray):
        """Per-owner (local_id, value-sum) packs for the given owned
        rows' symmetric neighbors, value replicated per edge and
        combined per destination BEFORE shipping (int64 and float64
        values both supported)."""
        out = [np.empty((2, 0), dtype=np.float64) for _ in range(self.P)]
        if locals_.size and self.sym_adj is not None and self.sym_adj.size:
            edge_idx, bounds = K.gather_subset_edges(self.sym_offsets, locals_)
            dsts = self.sym_adj[edge_idx]
            vals = np.repeat(values, np.diff(bounds))
            if dsts.size:
                order, cuts = K.owner_split(dsts, self.P)
                dsts, vals = dsts[order], vals[order]
                for q in range(self.P):
                    d = dsts[cuts[q]:cuts[q + 1]] // self.P
                    v = vals[cuts[q]:cuts[q + 1]]
                    u, inv = np.unique(d, return_inverse=True)
                    s = np.bincount(inv, weights=v.astype(np.float64))
                    out[q] = np.stack([u.astype(np.float64), s])
        return (sum(o.shape[1] for o in out), *out)

    def sp_expand(self, frontier_locals: np.ndarray):
        """Forward hop: ship σ sums to the next level's vertices."""
        return self._sym_emit(frontier_locals,
                              self.sigma[frontier_locals].astype(np.float64))

    def sp_apply(self, level: int, *packs) -> np.ndarray:
        """Install dist=level on first touch; σ += incoming for vertices
        AT this level (σ counts stay exact: they are integer-valued
        floats well below 2^53 at any tested depth); drop contributions
        to already-settled vertices."""
        fresh_all = []
        for pk in packs:
            if pk is None or pk.shape[1] == 0:
                continue
            loc = pk[0].astype(np.int64)
            fresh = loc[self.dist[loc] < 0]
            self.dist[fresh] = level
            at_level = self.dist[loc] == level
            touched = loc[at_level]
            np.add.at(self.sigma, touched, pk[1][at_level].astype(np.int64))
            # σ travels as float64 sums: AT 2^53 an incoming 2^53+1 has
            # already rounded to 2^53 (indistinguishable), so exactness
            # requires strictly < 2^53 — fail loudly otherwise. Checked
            # per pack over the touched entries only (O(frontier), not
            # an O(n) scan per level).
            if touched.size and self.sigma[touched].max() >= 2 ** 53:
                raise OverflowError(
                    "shortest-path count reaches 2^53; sigma is no longer exact")
            fresh_all.append(fresh)
        return np.unique(np.concatenate(fresh_all)) if fresh_all else \
            np.empty(0, dtype=np.int64)

    def sp_table(self) -> pa.Table:
        return pa.table({"vid": pa.array(self.owned_vids()),
                         "distance": pa.array(self.dist),
                         "sigma": pa.array(self.sigma)})

    def bt_levels(self) -> int:
        return int(self.dist.max(initial=0)) if self.n_local else 0

    def bt_emit(self, level: int):
        """Backward hop: vertices at ``level`` ship (1+δ)/σ to their
        neighbors (only dist==level-1 receivers will accumulate)."""
        locs = np.flatnonzero(self.dist == level)
        if not locs.size:
            return (0, *[np.empty((2, 0), dtype=np.float64) for _ in range(self.P)])
        w = (1.0 + self._delta_bt[locs]) / self.sigma[locs]
        return self._sym_emit(locs, w)

    def bt_apply(self, level: int, *packs) -> None:
        """δ(u) += σ(u) · incoming for owned u at dist == level-1 —
        multiplied HERE so δ is final before u's own emit at the next
        (lower) level. Packs apply in the fixed q=0..P-1 order, so the
        float accumulation order is deterministic for any partitioning."""
        for pk in packs:
            if pk is None or pk.shape[1] == 0:
                continue
            loc = pk[0].astype(np.int64)
            m = self.dist[loc] == level - 1
            sel = loc[m]
            np.add.at(self._delta_bt, sel, self.sigma[sel] * pk[1][m])

    def bt_accum(self) -> None:
        """Fold this seed's dependencies into the running betweenness
        accumulator (source excluded per Brandes)."""
        if not hasattr(self, "_btw") or self._btw is None or \
                len(self._btw) != self.n_local:
            self._btw = np.zeros(self.n_local, dtype=np.float64)
        self._btw += np.where(self.dist > 0, self._delta_bt, 0.0)

    def bt_reset(self) -> None:
        self._btw = np.zeros(self.n_local, dtype=np.float64)

    def bt_table(self) -> pa.Table:
        return pa.table({"vid": pa.array(self.owned_vids()),
                         "betweenness": pa.array(self._btw)})

    def dist_max(self) -> int:
        """Max BFS distance among reached owned vertices (-1 if none)."""
        return int(self.dist.max(initial=-1)) if self.n_local else -1

    # --- truncated harmonic centrality accumulator (multi-source BFS
    # reuses bfs_init/expand/apply; scores are exact integers
    # Σ floor(LCM/d) so no float summation order can differ) ---

    def harm_init(self) -> None:
        self._harm = np.zeros(self.n_local, dtype=np.int64)

    def harm_seed_candidates(self, k: int, off: int) -> np.ndarray:
        """This shard's k best seed candidates: owned vids with the
        smallest (splitmix64(vid + off), vid). The driver merges P·k
        candidates — never an N-sized array."""
        from ..functions.hashing import splitmix64

        vids = self.owned_vids()
        with np.errstate(over="ignore"):
            h = splitmix64(vids.astype(np.uint64) + np.uint64(off))
        sel = np.lexsort((vids, h))[:k]
        # h stays uint64 (an int64 cast would wrap the top half negative
        # and corrupt the driver-side merge order)
        return h[sel], vids[sel]

    def harm_accum(self, lcm: int, max_depth: int) -> None:
        m = (self.dist > 0) & (self.dist <= max_depth)
        self._harm[m] += lcm // self.dist[m]

    def harm_table(self) -> pa.Table:
        return pa.table({"vid": pa.array(self.owned_vids()), "harmonic": pa.array(self._harm)})

    # --- sampled closeness: integer sufficient statistics (reached
    # seed count + distance sum) over the same per-seed BFS distances ---

    def clo_init(self) -> None:
        self._clo_sum = np.zeros(self.n_local, dtype=np.int64)
        self._clo_n = np.zeros(self.n_local, dtype=np.int64)

    def clo_accum(self, max_depth: int) -> None:
        m = (self.dist > 0) & (self.dist <= max_depth)
        self._clo_sum[m] += self.dist[m]
        self._clo_n[m] += 1

    def clo_table(self) -> pa.Table:
        return pa.table({"vid": pa.array(self.owned_vids()),
                         "n_reached": pa.array(self._clo_n),
                         "sum_dist": pa.array(self._clo_sum)})

    # --- k-core decomposition (parallel peel over the symmetric CSR;
    # same frontier-exchange shape as BFS but decrements carry
    # multiplicity: each removed vertex costs every alive neighbor one
    # degree unit) ---

    def core_init(self) -> None:
        """deg = undirected degree, everyone alive, core = 0."""
        n = self.n_local
        self._core_deg = (
            np.diff(self.sym_offsets).astype(np.int64)
            if self.sym_offsets is not None and n
            else np.zeros(n, dtype=np.int64)
        )
        self._core_alive = np.ones(n, dtype=bool)
        self._core = np.zeros(n, dtype=np.int64)

    def core_min_alive_deg(self) -> int:
        """Shard's min degree among alive vertices (-1 = none alive)."""
        d = self._core_deg[self._core_alive]
        return int(d.min()) if d.size else -1

    def core_peel(self, k: int) -> np.ndarray:
        """Remove every alive vertex with deg <= k at core number k;
        returns the removed local rows (the decrement frontier)."""
        fr = np.flatnonzero(self._core_alive & (self._core_deg <= k))
        self._core[fr] = k
        self._core_alive[fr] = False
        return fr

    def core_emit(self, fr: np.ndarray):
        """Decrement counts per owner for the removed frontier's
        undirected neighbors: (total, (2,m) [dst_local, count] per owner).
        Counts pre-combined per destination (the combiner before the
        exchange — many removals sharing a neighbor ship one row)."""
        out: list[np.ndarray] = [np.empty((2, 0), dtype=np.int64) for _ in range(self.P)]
        if fr.size and self.sym_adj is not None and self.sym_adj.size:
            edge_idx, _ = K.gather_subset_edges(self.sym_offsets, fr)
            dsts = self.sym_adj[edge_idx]
            if dsts.size:
                uniq, counts = np.unique(dsts, return_counts=True)
                order, cuts = K.owner_split(uniq, self.P)
                u, c = uniq[order], counts[order]
                out = [
                    np.stack([u[cuts[q]:cuts[q + 1]] // self.P, c[cuts[q]:cuts[q + 1]]])
                    for q in range(self.P)
                ]
        return (sum(o.shape[1] for o in out), *out)

    def core_apply(self, k: int, *pair_arrays: np.ndarray) -> np.ndarray:
        """Apply incoming decrements (dead rows absorb them harmlessly —
        their degree is never read again) and peel the next cascade wave
        at the same watermark k. Returns the new frontier."""
        ds = [p[0] for p in pair_arrays if p is not None and p.shape[1]]
        if ds:
            d = np.concatenate(ds)
            c = np.concatenate([p[1] for p in pair_arrays if p is not None and p.shape[1]])
            self._core_deg -= np.bincount(
                d, weights=c, minlength=self.n_local
            ).astype(np.int64)
        return self.core_peel(k)

    def core_table(self) -> pa.Table:
        return pa.table({"vid": pa.array(self.owned_vids()), "core": pa.array(self._core)})

    # --- deterministic random walks over the out-CSR (walk state is
    # shard-resident, routed to the owner of its current vertex each
    # step; the step choice idx = mix2(mix2(walk, cur), seed·2^60+step)
    # % outdeg is a pure function of (walk, cur, step), so any engine —
    # including a SQL oracle — replays identical paths) ---

    def walks_init(self) -> None:
        """One walk per owned vertex: walk_id = start vid, logged at
        step 0. Walk residency starts at the owner of the start."""
        vids = self.owned_vids()
        self._wk_walk = vids.copy()
        self._wk_cur = vids.copy()
        self._wk_log = [pa.table({
            "walk": pa.array(vids), "step": pa.array(np.zeros(len(vids), np.int64)),
            "vid": pa.array(vids),
        })]

    def walk_round(self, step_off: int):
        """Advance resident walks one step and emit (walk, next) per new
        owner. Walks at out-degree-0 vertices terminate (cannot happen
        after finalize's universal self-loops, kept for generality)."""
        from ..functions.hashing import mix2

        out: list[np.ndarray] = [np.empty((2, 0), dtype=np.int64) for _ in range(self.P)]
        w, cur = self._wk_walk, self._wk_cur
        self._wk_walk = self._wk_cur = None
        if w is not None and w.size:
            local = cur // self.P
            deg = (self.out_offsets[local + 1] - self.out_offsets[local])
            alive = deg > 0
            w, cur, local, deg = w[alive], cur[alive], local[alive], deg[alive]
            if w.size:
                r = mix2(mix2(w.astype(np.uint64), cur.astype(np.uint64)),
                         np.uint64(step_off))
                idx = (r % deg.astype(np.uint64)).astype(np.int64)
                nxt = self.out_dst[self.out_offsets[local] + idx]
                order, cuts = K.owner_split(nxt, self.P)
                wn, nn = w[order], nxt[order]
                out = [np.stack([wn[cuts[q]:cuts[q + 1]], nn[cuts[q]:cuts[q + 1]]])
                       for q in range(self.P)]
        return (sum(o.shape[1] for o in out), *out)

    def walk_recv(self, step: int, *pair_arrays: np.ndarray) -> int:
        """Adopt incoming walks as resident and log their new position."""
        ws = [p[0] for p in pair_arrays if p is not None and p.shape[1]]
        if ws:
            self._wk_walk = np.concatenate(ws)
            self._wk_cur = np.concatenate(
                [p[1] for p in pair_arrays if p is not None and p.shape[1]])
        else:
            self._wk_walk = np.empty(0, dtype=np.int64)
            self._wk_cur = np.empty(0, dtype=np.int64)
        if self._wk_walk.size:
            self._wk_log.append(pa.table({
                "walk": pa.array(self._wk_walk),
                "step": pa.array(np.full(len(self._wk_walk), step, np.int64)),
                "vid": pa.array(self._wk_cur),
            }))
        return int(self._wk_walk.size)

    def walk_log_table(self) -> pa.Table:
        t = pa.concat_tables(self._wk_log)
        self._wk_log = []
        self._wk_walk = self._wk_cur = None
        return t

    # --- modularity (properties.hxx:123-256 grouped sums, distributed) ---

    def mod_needed_neighbors(self):
        """Unique undirected neighbors per owner (to fetch their labels)."""
        uniq = np.unique(self.sym_adj) if self.sym_adj is not None else np.empty(0, np.int64)
        order, cuts = K.owner_split(uniq, self.P)
        srt = uniq[order]
        self._mod_uniq = uniq
        return (len(uniq), *[srt[cuts[q]:cuts[q + 1]] // self.P for q in range(self.P)])

    def labels_for(self, locals_: np.ndarray) -> np.ndarray:
        return self.labels[locals_]

    def install_labels(self, labels: np.ndarray) -> None:
        self.labels = np.asarray(labels, dtype=np.int64).copy()
        self._labels_kind = "installed"

    # --- distributed label install: the external-Dataset path routes
    # (vid, label) slices to owner shards (state/partitioner.route_labels)
    # instead of materializing a vertex-scale vector on the driver ---

    def begin_label_install(self) -> None:
        self._li_vals = np.zeros(self.n_local, dtype=np.int64)
        self._li_seen = np.zeros(self.n_local, dtype=bool)
        self._li_dups = 0

    def ingest_labels(self, locals_: np.ndarray, vals: np.ndarray) -> None:
        if len(locals_) and (locals_.min() < 0 or locals_.max() >= self.n_local):
            raise ValueError("label vid outside [0, N)")
        # cross-batch dups counted on within-batch-UNIQUE vids only — a
        # row that is both repeated in this batch and seen before must
        # not be counted by both terms
        u, c = np.unique(locals_, return_counts=True)
        self._li_dups += int(self._li_seen[u].sum()) + int((c - 1).sum())
        self._li_seen[locals_] = True
        self._li_vals[locals_] = vals

    def label_install_stats(self) -> tuple[int, int]:
        """(slots written, duplicate rows seen) — lets the driver verify
        exact coverage with O(P) scalars BEFORE committing, instead of a
        vertex-scale pull."""
        return int(self._li_seen.sum()), self._li_dups

    def finish_label_install(self) -> None:
        self.labels = self._li_vals
        self._labels_kind = "installed"
        self.abort_label_install()

    def abort_label_install(self) -> None:
        self._li_vals = self._li_seen = None
        self._li_dups = 0

    def has_labels(self) -> bool:
        return self.labels is not None

    def modularity_terms(self, *label_slices: np.ndarray):
        """Per-community (within-community edge-endpoint count, degree sum)
        for owned vertices: returns (labels, within, degsum) arrays."""
        uniq = self._mod_uniq
        order, _ = K.owner_split(uniq, self.P)
        aligned = np.empty(len(uniq), dtype=np.int64)
        aligned[order] = np.concatenate(label_slices) if label_slices else np.empty(0, np.int64)
        deg = np.diff(self.sym_offsets)
        own_lab = np.repeat(self.labels, deg)
        nb_lab = aligned[np.searchsorted(uniq, self.sym_adj)]
        within_mask = (own_lab == nb_lab).astype(np.int64)
        # per-community sums over owned vertices
        labs, inv = np.unique(self.labels, return_inverse=True)
        degsum = np.bincount(inv, weights=deg, minlength=len(labs)).astype(np.int64)
        row_within = K.segment_sums(within_mask.astype(np.float64), self.sym_offsets).astype(np.int64)
        within = np.bincount(inv, weights=row_within, minlength=len(labs)).astype(np.int64)
        return labs, within, degsum

    # ------------------------------------------------------------------
    # triangle counting (degree-ordered orientation)
    # ------------------------------------------------------------------

    def sym_degree_table(self) -> np.ndarray:
        """Undirected degree of owned vertices (aligned to local index)."""
        return np.diff(self.sym_offsets)

    def tri_needed_neighbors(self) -> list[np.ndarray]:
        """Unique undirected neighbors per owner (to fetch their degrees)."""
        uniq = np.unique(self.sym_adj)
        order, cuts = K.owner_split(uniq, self.P)
        srt = uniq[order]
        self._tri_uniq = uniq
        return (len(uniq), *[srt[cuts[q]:cuts[q + 1]] // self.P for q in range(self.P)])

    def degrees_for(self, locals_: np.ndarray) -> np.ndarray:
        deg = np.diff(self.sym_offsets)
        return deg[locals_]

    def tri_orient(self, *deg_slices: np.ndarray) -> None:
        """Build the degree-ordered oriented adjacency N>(v): keep neighbor
        w iff (deg(w), w) > (deg(v), v) — the standard skew-bounding
        orientation (wedge work per vertex is O(oriented-degree²), hubs
        end up on the 'high' side). Stored vid-sorted for membership
        queries; neighbor degrees cached for rank-sorted wedge emission."""
        uniq = self._tri_uniq
        deg_map = np.concatenate(deg_slices) if deg_slices else np.empty(0, dtype=np.int64)
        # deg_map aligned with uniq (owner-grouped order == uniq sorted order
        # grouped by owner; uniq sorted ascending groups owners arbitrarily —
        # rebuild alignment explicitly)
        order, _ = K.owner_split(uniq, self.P)
        aligned = np.empty(len(uniq), dtype=np.int64)
        aligned[order] = deg_map
        pos = np.searchsorted(uniq, self.sym_adj)
        nb_deg = aligned[pos]
        own_deg = np.repeat(np.diff(self.sym_offsets), np.diff(self.sym_offsets))
        own_vid = np.repeat(self.owned_vids(), np.diff(self.sym_offsets))
        keep = (nb_deg > own_deg) | ((nb_deg == own_deg) & (self.sym_adj > own_vid))
        rows = np.repeat(np.arange(self.n_local, dtype=np.int64), np.diff(self.sym_offsets))[keep]
        adj, adeg = self.sym_adj[keep], nb_deg[keep]
        order2 = np.lexsort((adj, rows))
        self.ori_offsets = np.zeros(self.n_local + 1, dtype=np.int64)
        np.cumsum(np.bincount(rows, minlength=self.n_local), out=self.ori_offsets[1:])
        self.ori_adj = adj[order2]
        self.ori_adj_deg = adeg[order2]

    def tri_plan_chunks(self, max_wedges: int = 4_000_000) -> int:
        """Plan chunked wedge emission: split the owned rows so each
        round materializes at most ~``max_wedges`` wedge pairs — bounds
        the O(Σ deg_ori²) peak memory that a single-shot emission would
        need. Also precomputes the rank-sorted adjacency. Returns this
        shard's chunk count."""
        lens = np.diff(self.ori_offsets)
        rows_all = np.repeat(np.arange(self.n_local, dtype=np.int64), lens)
        order = np.lexsort((self.ori_adj, self.ori_adj_deg, rows_all))
        self._ori_adj_rank = self.ori_adj[order]
        w = (lens * (lens - 1)) // 2
        cum = np.cumsum(w) if len(w) else np.zeros(0, dtype=np.int64)
        total = int(cum[-1]) if len(cum) else 0
        if total == 0:
            self._tri_chunk_rows = np.array([0, self.n_local], dtype=np.int64)
            return 1
        nch = int(total // max_wedges) + 1
        cutrows = np.searchsorted(cum, np.arange(1, nch) * max_wedges) + 1
        self._tri_chunk_rows = np.unique(
            np.concatenate([[0], cutrows, [self.n_local]])
        )
        return len(self._tri_chunk_rows) - 1

    def tri_wedges_chunk(self, k: int) -> list[np.ndarray]:
        """Emit wedge queries for chunk ``k``: for each apex v in the
        chunk's row range and rank-ordered pair (lo, hi) in N>(v), ask
        owner(lo) whether edge lo->hi exists. Returns per-owner (3,n)
        arrays [lo_local, hi_vid, apex_vid]."""
        out: list[np.ndarray] = [np.empty((3, 0), dtype=np.int64) for _ in range(self.P)]
        if k >= len(self._tri_chunk_rows) - 1:
            return (0, *out)
        rlo, rhi = int(self._tri_chunk_rows[k]), int(self._tri_chunk_rows[k + 1])
        lens = np.diff(self.ori_offsets)[rlo:rhi]
        if len(lens) == 0 or lens.max(initial=0) < 2:
            return (0, *out)
        adj_r = self._ori_adj_rank
        # expand rows to (row, j) for j in 1..len-1, then (i, j) with i<j
        jl = np.maximum(lens - 1, 0)
        row_j = np.repeat(np.arange(rlo, rhi, dtype=np.int64), jl)
        j = K.ranges_from_lengths(jl) + 1
        lo_i = K.ranges_from_lengths(j)
        row_ij = np.repeat(row_j, j)
        j_ij = np.repeat(j, j)
        base = self.ori_offsets[row_ij]
        lo = adj_r[base + lo_i]
        hi = adj_r[base + j_ij]
        apex = row_ij * self.P + self.p
        order3, cuts = K.owner_split(lo, self.P)
        lo, hi, apex = lo[order3], hi[order3], apex[order3]
        out = [
            np.stack([lo[cuts[q]:cuts[q + 1]] // self.P, hi[cuts[q]:cuts[q + 1]], apex[cuts[q]:cuts[q + 1]]])
            for q in range(self.P)
        ]
        return (sum(o.shape[1] for o in out), *out)

    # --- neighborhood-Jaccard wedges (link prediction): all unordered
    # neighbor pairs per apex over the FULL symmetric adjacency (no
    # orientation — both endpoints need credit), chunked like the
    # triangle path to bound peak memory, partial-combined per chunk ---

    def jac_plan_chunks(self, max_pairs: int = 4_000_000) -> int:
        lens = np.diff(self.sym_offsets)
        w = (lens * (lens - 1)) // 2
        cum = np.cumsum(w) if len(w) else np.zeros(0, dtype=np.int64)
        total = int(cum[-1]) if len(cum) else 0
        if total == 0:
            self._jac_chunk_rows = np.array([0, self.n_local], dtype=np.int64)
            return 1
        nch = int(total // max_pairs) + 1
        cutrows = np.searchsorted(cum, np.arange(1, nch) * max_pairs) + 1
        self._jac_chunk_rows = np.unique(np.concatenate([[0], cutrows, [self.n_local]]))
        return len(self._jac_chunk_rows) - 1

    def jac_pairs_chunk(self, k: int) -> pa.Table:
        """(lo, hi, c) partial common-neighbor counts for chunk k: the
        sym adjacency is vid-ascending, so (i<j) pairs are (lo<hi)
        already; duplicates within the chunk combine via one packed-key
        unique before leaving the shard."""
        empty = pa.table({"lo": pa.array([], type=pa.int64()),
                          "hi": pa.array([], type=pa.int64()),
                          "c": pa.array([], type=pa.int64())})
        if k >= len(self._jac_chunk_rows) - 1:
            return empty
        rlo, rhi = int(self._jac_chunk_rows[k]), int(self._jac_chunk_rows[k + 1])
        lens = np.diff(self.sym_offsets)[rlo:rhi]
        if len(lens) == 0 or lens.max(initial=0) < 2:
            return empty
        jl = np.maximum(lens - 1, 0)
        row_j = np.repeat(np.arange(rlo, rhi, dtype=np.int64), jl)
        j = K.ranges_from_lengths(jl) + 1
        lo_i = K.ranges_from_lengths(j)
        row_ij = np.repeat(row_j, j)
        j_ij = np.repeat(j, j)
        base = self.sym_offsets[row_ij]
        lo = self.sym_adj[base + lo_i]
        hi = self.sym_adj[base + j_ij]
        packed = lo * np.int64(self.N) + hi
        if getattr(self, "_jac_ra_scale", 0):
            deg_apex = np.diff(self.sym_offsets)[row_ij]
            if getattr(self, "_jac_weight_mode", "ra") == "aa_log2":
                # Adamic-Adar (log2-floor variant): scale // floor(log2(deg)).
                # frexp exponents are exact for int-valued doubles, and a
                # wedge apex always has deg >= 2, so the divisor is >= 1 —
                # integer-honest hub discounting, SQL-replayable via
                # floor(log2(deg)) (log2 of a non-power-of-2 int sits
                # >= ~log2(1+1/deg) from any integer, far above 1 ulp)
                div = (np.frexp(deg_apex.astype(np.float64))[1] - 1).astype(np.int64)
                w = np.int64(self._jac_ra_scale) // div
            else:
                # resource-allocation: Σ over apexes z of scale // deg(z),
                # exact int64 (np.add.at, not float bincount)
                w = np.int64(self._jac_ra_scale) // deg_apex
            key, inv = np.unique(packed, return_inverse=True)
            c = np.zeros(len(key), dtype=np.int64)
            np.add.at(c, inv, w)
        else:
            key, c = np.unique(packed, return_counts=True)
        return pa.table({"lo": pa.array(key // self.N), "hi": pa.array(key % self.N),
                         "c": pa.array(c.astype(np.int64))})

    def jac_pairs_chunk_routed(self, k: int):
        """jac_pairs_chunk split by owner(lo): (total, (2,m) [key, c]
        per owner) with key = lo·N + hi packed (keys are unique within
        the chunk, so the receiving combine is a pure sorted merge)."""
        out: list[np.ndarray] = [np.empty((2, 0), dtype=np.int64) for _ in range(self.P)]
        t = self.jac_pairs_chunk(k)
        if t.num_rows:
            lo = t["lo"].to_numpy()
            key = lo * np.int64(self.N) + t["hi"].to_numpy()
            c = t["c"].to_numpy()
            order, cuts = K.owner_split(lo, self.P)
            key, c = key[order], c[order]
            out = [np.stack([key[cuts[q]:cuts[q + 1]], c[cuts[q]:cuts[q + 1]]])
                   for q in range(self.P)]
        return (sum(o.shape[1] for o in out), *out)

    def jac_reset(self, ra_scale: int = 0, weight_mode: str = "ra") -> None:
        """ra_scale=0: wedge COUNTS (Jaccard / support / common
        neighbors). ra_scale>0: each wedge carries an exact-int64 apex
        weight instead — ra_scale // deg(apex) (resource allocation,
        weight_mode='ra') or ra_scale // floor(log2(deg(apex)))
        (Adamic-Adar log2-floor variant, weight_mode='aa_log2')."""
        self._jac_keys = np.empty(0, dtype=np.int64)
        self._jac_counts = np.empty(0, dtype=np.int64)
        self._jac_ra_scale = int(ra_scale)
        self._jac_weight_mode = weight_mode

    def jac_accept(self, *pair_arrays: np.ndarray) -> None:
        """Merge incoming (key, c) partials into the running combine —
        one np.unique(inverse) fold per round, no per-pair Python."""
        ks = [self._jac_keys] + [p[0] for p in pair_arrays if p is not None and p.shape[1]]
        cs = [self._jac_counts] + [p[1] for p in pair_arrays if p is not None and p.shape[1]]
        key = np.concatenate(ks)
        if not key.size:
            return
        c = np.concatenate(cs)
        uniq, inv = np.unique(key, return_inverse=True)
        self._jac_keys = uniq
        # float64 bincount is exact while per-pair totals stay < 2^53:
        # counts are bounded by N; RA weights by ra_scale/2 per wedge —
        # both orders of magnitude inside the window at any planned scale
        self._jac_counts = np.bincount(inv, weights=c).astype(np.int64)

    def jac_hi_needs(self):
        """Unique hi endpoints per owner (to fetch their degrees)."""
        hi = self._jac_keys % self.N
        uniq = np.unique(hi)
        order, cuts = K.owner_split(uniq, self.P)
        srt = uniq[order]
        self._jac_hi_uniq = uniq
        return (len(uniq), *[srt[cuts[q]:cuts[q + 1]] // self.P for q in range(self.P)])

    def degs_for(self, locals_: np.ndarray) -> np.ndarray:
        return np.diff(self.sym_offsets)[locals_]

    def jac_topk(self, min_common: int, top: int, *deg_slices: np.ndarray) -> pa.Table:
        """Score owned pairs and return the shard's local top rows —
        the driver merges P·top rows, never the pair set."""
        lo = self._jac_keys // self.N
        hi = self._jac_keys % self.N
        c = self._jac_counts
        keep = c >= min_common
        lo, hi, c = lo[keep], hi[keep], c[keep]
        deg_lo = np.diff(self.sym_offsets)[lo // self.P]
        uniq = self._jac_hi_uniq
        order, _ = K.owner_split(uniq, self.P)
        aligned = np.empty(len(uniq), dtype=np.int64)
        aligned[order] = np.concatenate([np.asarray(s) for s in deg_slices]) if len(uniq) else np.empty(0, np.int64)
        deg_hi = aligned[np.searchsorted(uniq, hi)]
        score = c * np.int64(1_000_000) // (deg_lo + deg_hi - c)
        sel = np.lexsort((hi, lo, -score))[:top]
        return pa.table({"a": pa.array(lo[sel]), "b": pa.array(hi[sel]),
                         "common": pa.array(c[sel]), "jaccard_e6": pa.array(score[sel])})

    def ra_topk(self, top: int, col: str = "ra_e9") -> pa.Table:
        """Local top rows by accumulated wedge weight (RA / AA / raw
        common-neighbor counts — whatever jac_reset configured); no
        degree exchange needed. Tie-inclusive is unnecessary: the cut
        orders by the full (score desc, a, b) triple, so the shard-local
        top `top` is exactly the global order's prefix restricted to
        owned pairs — partitioning-invariant by construction."""
        lo = self._jac_keys // self.N
        hi = self._jac_keys % self.N
        score = self._jac_counts
        sel = np.lexsort((hi, lo, -score))[:top]
        return pa.table({"a": pa.array(lo[sel]), "b": pa.array(hi[sel]),
                         col: pa.array(score[sel])})

    def tri_answer(self, *query_arrays: np.ndarray):
        """Answer wedge queries: edge lo->hi present in the oriented CSR?
        Credits the lo corner into local state; returns
        (n_found, found_hi_vids, found_apex_vids) so the driver can route
        the other two corners' credits to their owners."""
        qs = [q for q in query_arrays if q is not None and q.shape[1]]
        if not qs:
            return 0, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        lo = np.concatenate([q[0] for q in qs])
        hi = np.concatenate([q[1] for q in qs])
        apex = np.concatenate([q[2] for q in qs])
        if len(self.ori_adj) == 0:
            # every owned vertex is a local rank-maximum: oriented
            # adjacency is empty, so no queried edge can exist (indexing
            # an empty array below would IndexError)
            return 0, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        pos = K.segmented_searchsorted(self.ori_adj, self.ori_offsets[lo], self.ori_offsets[lo + 1], hi)
        found = (pos < self.ori_offsets[lo + 1]) & (
            self.ori_adj[np.minimum(pos, len(self.ori_adj) - 1)] == hi
        )
        np.add.at(self._tri_counts, lo[found], 1)
        return int(found.sum()), hi[found], apex[found]

    def tri_reset_counts(self) -> None:
        self._tri_counts = np.zeros(self.n_local, dtype=np.int64)

    def tri_credit(self, counts_inc: np.ndarray) -> None:
        """Add per-owned-vertex triangle-corner credits (dense aligned array)."""
        self._tri_counts += counts_inc

    def tri_accumulate(self, locals_: np.ndarray) -> None:
        """Add +1 credits for a (possibly repeated) list of owned local ids."""
        if locals_.size:
            np.add.at(self._tri_counts, locals_, 1)

    def tri_counts_table(self) -> pa.Table:
        return pa.table(
            {"vid": pa.array(self.owned_vids()), "triangles": pa.array(self._tri_counts)}
        )

    def tri_cc_table(self, scale: int = 1_000_000) -> pa.Table:
        """Local clustering coefficient from the settled triangle
        credits: (2·tri·scale) // (d·(d−1)) over the symmetric view —
        exact integers; degree < 2 means coefficient 0."""
        d = np.diff(self.sym_offsets)
        tri = self._tri_counts
        denom = d * (d - 1)
        cc = np.zeros(self.n_local, dtype=np.int64)
        m = denom > 0
        cc[m] = (2 * tri[m] * np.int64(scale)) // denom[m]
        return pa.table({"vid": pa.array(self.owned_vids()),
                         "triangles": pa.array(tri), "cc_e6": pa.array(cc)})

    # ------------------------------------------------------------------
    # HITS hubs & authorities
    #
    # authority a = A^T h (pull h of in-edge sources — the EXISTING
    # contribution exchange, value = h instead of r/W) and hub h = A a
    # (pull a of out-edge destinations — a TRANSPOSE exchange built
    # lazily by hits_prepare, mirroring _rebuild's in-direction pull
    # index over the out-CSR).
    # ------------------------------------------------------------------

    def hits_prepare(self) -> dict[int, np.ndarray]:
        """Build the transpose pull index + sweep arrays (out-CSR edges
        reordered by needed-destination key). Returns `needs` with the
        same contract as ``build`` so the driver can run the same
        send/gather layout exchange for the reverse direction."""
        n = self.n_local
        uniq = np.unique(self.out_dst) if self.out_dst is not None else np.empty(0, np.int64)
        owner, local = uniq % self.P, uniq // self.P
        order = np.lexsort((local, owner))
        t_gather = uniq[order]
        inv = np.empty(len(uniq), dtype=np.int64)
        inv[order] = np.arange(len(uniq))
        t_key = inv[np.searchsorted(uniq, self.out_dst)]
        sweep = np.argsort(t_key, kind="stable")
        tks = t_key[sweep].astype(np.int32)
        self._t_rows_sweep = np.repeat(
            np.arange(n, dtype=np.int64), np.diff(self.out_offsets)
        )[sweep].astype(np.int32)
        self._t_w_sweep = self.out_w[sweep] if self.out_w is not None else None
        counts = np.bincount(t_gather % self.P, minlength=self.P)
        gpref = np.zeros(self.P + 1, dtype=np.int64)
        np.cumsum(counts, out=gpref[1:])
        self._t_edge_cuts = np.searchsorted(tks, gpref)
        self._t_key_adj = tks - np.repeat(
            gpref[:-1], np.diff(self._t_edge_cuts)
        ).astype(np.int32)
        self._t_per_edge = np.empty(len(tks), dtype=np.float64)
        return {q: (t_gather[t_gather % self.P == q] // self.P) for q in range(self.P)}

    def set_t_send_index(self, send_idx: list[np.ndarray]) -> None:
        self._t_send_cat = (
            np.concatenate(send_idx) if send_idx else np.empty(0, dtype=np.int64)
        )
        self._t_send_buf = np.empty(len(self._t_send_cat), dtype=np.float64)

    def set_t_gather_layout(self, layout: np.ndarray) -> None:
        self._t_gather_layout = layout

    def hits_init(self) -> None:
        """h^0 = 1 on every vertex (standard HITS seed)."""
        self.hits_h = np.ones(self.n_local)
        self.hits_a = np.zeros(self.n_local)
        # dedicated send buffer for the forward direction: _send_buf may
        # carry hub-partial tails (PR hub splitting), which HITS neither
        # produces nor expects
        self._h_send_buf = np.empty(len(self.send_cat), dtype=np.float64)

    def hits_pack_h(self) -> np.ndarray:
        return np.take(self.hits_h, self.send_cat, out=self._h_send_buf)

    def hits_pack_a(self) -> np.ndarray:
        return np.take(self.hits_a, self._t_send_cat, out=self._t_send_buf)

    def hits_authority(self, *packed: np.ndarray) -> float:
        """a(v) = Σ_{u→v} w_uv · h(u) over the in-CSR sweep; returns the
        shard's Σ a² partial for the global L2 normalization."""
        slices = [pk[int(s):int(e)] for pk, (s, e) in zip(packed, self.gather_layout)]
        pe, cuts, keys = self._per_edge, self._edge_cuts, self._key_adj
        for q, sl in enumerate(slices):
            lo, hi = cuts[q], cuts[q + 1]
            if hi > lo:
                np.take(sl, keys[lo:hi], out=pe[lo:hi])
        if self._w_sweep is not None:
            np.multiply(pe, self._w_sweep, out=pe)
        self.hits_a = np.bincount(self.in_rows_sweep, weights=pe, minlength=self.n_local)
        return float(np.dot(self.hits_a, self.hits_a))

    def hits_hub(self, *packed: np.ndarray) -> float:
        """h(u) = Σ_{u→v} w_uv · a(v) over the transpose sweep; returns
        the shard's Σ h² partial."""
        slices = [pk[int(s):int(e)] for pk, (s, e) in zip(packed, self._t_gather_layout)]
        pe, cuts, keys = self._t_per_edge, self._t_edge_cuts, self._t_key_adj
        for q, sl in enumerate(slices):
            lo, hi = cuts[q], cuts[q + 1]
            if hi > lo:
                np.take(sl, keys[lo:hi], out=pe[lo:hi])
        if self._t_w_sweep is not None:
            np.multiply(pe, self._t_w_sweep, out=pe)
        self.hits_h = np.bincount(self._t_rows_sweep, weights=pe, minlength=self.n_local)
        return float(np.dot(self.hits_h, self.hits_h))

    def hits_scale(self, fa: float, fh: float) -> None:
        if fa != 1.0:
            self.hits_a *= fa
        if fh != 1.0:
            self.hits_h *= fh

    def hits_result(self) -> tuple[np.ndarray, np.ndarray]:
        return self.hits_a, self.hits_h

    # ------------------------------------------------------------------
    # incremental triangle counting (batch-delta primitives over the
    # symmetric CSR — the dynamic analogue of the tri_* family)
    # ------------------------------------------------------------------

    def edge_support_table(self) -> pa.Table:
        """Per-edge triangle support for owned undirected edges (a, b)
        with a < b: the combined wedge-pair counts (jac_accept state)
        looked up per edge, 0 when the pair closed no wedge — the
        static heart of k-truss. One row per owned und edge."""
        offs, adj = self.sym_offsets, self.sym_adj
        if adj is None or not len(adj):
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "support": pa.array([], pa.int64())})
        a = np.repeat(self.owned_vids(), np.diff(offs))
        b = adj
        m = b > a
        a, b = a[m], b[m]
        key = a * self.N + b
        keys, counts = self._jac_keys, self._jac_counts
        if len(keys):
            pos = np.searchsorted(keys, key)
            posc = np.minimum(pos, len(keys) - 1)
            has = keys[posc] == key
            support = np.where(has, counts[posc], 0).astype(np.int64)
        else:
            support = np.zeros(len(a), dtype=np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "support": pa.array(support)})

    def sym_member(self, pairs: np.ndarray) -> np.ndarray:
        """Undirected-edge membership: for each column (a, b) with a
        owned here, is b ∈ N(a) in the symmetric CSR? Vectorized
        segmented binary search (same ``hasEdge`` analogue as
        tri_answer, /root/reference/inc/_bitset.hxx:165-194)."""
        k = pairs.shape[1] if pairs is not None and pairs.ndim == 2 else 0
        if not k:
            return np.empty(0, dtype=bool)
        if self.sym_adj is None or not len(self.sym_adj):
            return np.zeros(k, dtype=bool)
        a_local = pairs[0] // self.P
        b = pairs[1]
        pos = K.segmented_searchsorted(
            self.sym_adj, self.sym_offsets[a_local], self.sym_offsets[a_local + 1], b
        )
        return (pos < self.sym_offsets[a_local + 1]) & (
            self.sym_adj[np.minimum(pos, len(self.sym_adj) - 1)] == b
        )

    def pair_wedge_queries(self, pairs: np.ndarray):
        """For each new edge (s, o) with s owned here, emit one
        membership query (lo=min(w,o), hi=max(w,o)) per old neighbor
        w ∈ N(s) — the candidate third corners of triangles closed by
        the new edge. Queries are grouped by owner(lo); call with
        num_returns=P+1 (leading element = total query count)."""
        out = [np.empty((2, 0), dtype=np.int64) for _ in range(self.P)]
        k = pairs.shape[1] if pairs is not None and pairs.ndim == 2 else 0
        if k and self.sym_adj is not None and len(self.sym_adj):
            s_local = pairs[0] // self.P
            edge_idx, bounds = K.gather_subset_edges(self.sym_offsets, s_local)
            w = self.sym_adj[edge_idx]
            o = np.repeat(pairs[1], np.diff(bounds))
            keep = w != o  # defensive: o ∉ N(s) for genuinely-new edges
            w, o = w[keep], o[keep]
            lo = np.minimum(w, o)
            hi = np.maximum(w, o)
            order, cuts = K.owner_split(lo, self.P)
            lo, hi = lo[order], hi[order]
            out = [
                np.stack([lo[cuts[q]:cuts[q + 1]], hi[cuts[q]:cuts[q + 1]]])
                for q in range(self.P)
            ]
        return (sum(o_.shape[1] for o_ in out), *out)

    def sym_answer_count(self, *query_arrays: np.ndarray) -> int:
        """Count how many queried (lo, hi) pairs are present undirected
        edges (lo owned here)."""
        qs = [q for q in query_arrays if q is not None and q.shape[1]]
        if not qs:
            return 0
        cat = np.concatenate(qs, axis=1)
        return int(self.sym_member(cat).sum())

    # ------------------------------------------------------------------
    # truncated Katz centrality (the alpha<1 sibling of the wc_* family)
    # ------------------------------------------------------------------

    def kz_init(self) -> None:
        """x_0 = 1 per vertex, accumulator 0. The damped recurrence
        acc_l = mul*acc_{l-1} + x_l after L levels equals
        sum_{l=1..L} mul^(L-l) * walks_l — exact truncated Katz with
        alpha = 1/mul, pre-scaled by mul^L so everything stays int64
        and associative (the damped analogue of wc_init; reference
        contribution push pagerankCuda.hxx:88-217 without the degree
        normalization)."""
        self._wc = np.ones(self.n_local, dtype=np.int64)
        self._wc_total = np.zeros(self.n_local, dtype=np.int64)

    def kz_apply(self, mul: int, *pairs: np.ndarray) -> None:
        """Fold incoming level partials: x_l from the exchange, then
        acc = mul*acc + x_l, with the wrap guarded BEFORE it happens."""
        s = np.zeros(self.n_local, dtype=np.int64)
        for pr in pairs:
            if pr is not None and pr.shape[1]:
                np.add.at(s, pr[0], pr[1])
        top = int(self._wc_total.max(initial=0))
        if top and top > ((2 ** 62) - int(s.max(initial=0))) // max(int(mul), 1):
            raise OverflowError(
                "katz accumulator would overflow int64; reduce length or mul")
        self._wc = s
        self._wc_total = np.int64(mul) * self._wc_total + s

    def kz_table(self) -> pa.Table:
        return pa.table({"vid": pa.array(self.owned_vids()),
                         "katz": pa.array(self._wc_total)})

    # ------------------------------------------------------------------
    # reciprocity (directed-edge mutuality over the deduped edge set)
    # ------------------------------------------------------------------

    def recip_queries(self):
        """Reversed membership queries for every owned NON-LOOP directed
        edge (u, v): does v->u exist? Grouped by owner(v); call with
        num_returns=P+1 (leading element = this shard's non-loop edge
        count, the reciprocity denominator partial)."""
        out = [np.empty((2, 0), dtype=np.int64) for _ in range(self.P)]
        n_nonloop = 0
        if self.out_dst is not None and len(self.out_dst):
            src = np.repeat(self.owned_vids(), np.diff(self.out_offsets))
            dst = self.out_dst
            m = src != dst
            src, dst = src[m], dst[m]
            n_nonloop = len(src)
            order, cuts = K.owner_split(dst, self.P)
            src, dst = src[order], dst[order]
            out = [np.stack([dst[cuts[q]:cuts[q + 1]], src[cuts[q]:cuts[q + 1]]])
                   for q in range(self.P)]
        return (n_nonloop, *out)

    def dir_member_count(self, *query_arrays: np.ndarray) -> int:
        """Count queried (a, b) pairs (a owned here) present in the
        directed out-CSR — vectorized segmented binary search, the
        directed twin of sym_answer_count."""
        qs = [q for q in query_arrays if q is not None and q.shape[1]]
        if not qs or self.out_dst is None or not len(self.out_dst):
            return 0
        cat = np.concatenate(qs, axis=1)
        a_local = cat[0] // self.P
        b = cat[1]
        offs = self.out_offsets
        pos = K.segmented_searchsorted(self.out_dst, offs[a_local], offs[a_local + 1], b)
        found = (pos < offs[a_local + 1]) & (
            self.out_dst[np.minimum(pos, len(self.out_dst) - 1)] == b
        )
        return int(found.sum())

    # ------------------------------------------------------------------
    # average neighbor degree (degree-degree correlation, undirected)
    # ------------------------------------------------------------------

    def annd_needs(self):
        """Unique symmetric-adjacency neighbors per owner (local ids on
        the owner) — the degree-fetch plan, same shape as jac_hi_needs."""
        if self.sym_adj is None or not len(self.sym_adj):
            self._annd_uniq = np.empty(0, dtype=np.int64)
            return (0, *[np.empty(0, dtype=np.int64) for _ in range(self.P)])
        uniq = np.unique(self.sym_adj)
        self._annd_uniq = uniq
        order, cuts = K.owner_split(uniq, self.P)
        srt = uniq[order]
        return (len(uniq), *[srt[cuts[q]:cuts[q + 1]] // self.P for q in range(self.P)])

    def annd_partial(self, *deg_slices: np.ndarray) -> pa.Table:
        """Per-degree-class partials (degree, n_vertices, sum_nbr_deg)
        over owned vertices with symmetric degree >= 1: neighbor degrees
        arrive via the annd_needs exchange, per-vertex sums are one
        np.add.reduceat, and only one row per distinct degree class ever
        leaves the shard (the degree_hist_table discipline)."""
        empty = pa.table({"degree": pa.array([], pa.int64()),
                          "n_vertices": pa.array([], pa.int64()),
                          "sum_nbr_deg": pa.array([], pa.int64())})
        uniq = self._annd_uniq
        if not len(uniq):
            return empty
        order, _ = K.owner_split(uniq, self.P)
        aligned = np.empty(len(uniq), dtype=np.int64)
        aligned[order] = np.concatenate([np.asarray(s) for s in deg_slices])
        ndeg_edge = aligned[np.searchsorted(uniq, self.sym_adj)]
        deg = np.diff(self.sym_offsets)
        nz = deg > 0
        if not nz.any():
            return empty
        starts = self.sym_offsets[:-1][nz]
        per_vertex = np.add.reduceat(ndeg_edge, starts)
        d = deg[nz]
        vals, inv, cnt = np.unique(d, return_inverse=True, return_counts=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, per_vertex)
        return pa.table({"degree": pa.array(vals.astype(np.int64)),
                         "n_vertices": pa.array(cnt.astype(np.int64)),
                         "sum_nbr_deg": pa.array(sums)})

    def summary_partial(self) -> np.ndarray:
        """Scalar graph-property partials [n_owned, m_directed,
        self_loops, und_half_edges, max_outdeg, max_indeg, isolated]
        (und_half_edges counts each undirected edge twice; isolated =
        symmetric degree 0). One 7-int row per shard — the graph-
        properties probe (reference properties.hxx:14-55) as a
        tree-foldable partial."""
        m_dir = len(self.out_keys) if self.out_keys is not None else 0
        outdeg = (np.diff(self.out_offsets) if self.out_offsets is not None
                  else np.zeros(self.n_local, dtype=np.int64))
        indeg = (np.diff(self.in_offsets) if self.in_offsets is not None
                 else np.zeros(self.n_local, dtype=np.int64))
        sdeg = (np.diff(self.sym_offsets) if getattr(self, "sym_offsets", None)
                is not None else np.zeros(self.n_local, dtype=np.int64))
        return np.array([
            self.n_local, m_dir, self.count_self_loops(),
            int(sdeg.sum()), int(outdeg.max(initial=0)),
            int(indeg.max(initial=0)), int(np.count_nonzero(sdeg == 0)),
        ], dtype=np.int64)
