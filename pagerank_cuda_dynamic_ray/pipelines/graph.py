"""GraphContext — driver-side orchestration of the shard actor pool.

Re-expresses the reference's engine entry points
(/root/reference/inc/pagerank.hxx:371-440 ``pagerankInvoke``,
/root/reference/inc/pagerankPrune.hxx:176-263,
/root/reference/inc/batch.hxx:201-248 batch machinery) as a Ray driver
loop over the fixed shard actor pool:

* one **synchronous power iteration** = contribution slicing on every
  shard -> per-destination-shard exchange through the object store ->
  per-shard pull update + local L∞ delta -> **global tree-reduce** of the
  deltas (and dangling mass in ``dangling='redistribute'`` mode) -> an
  optional frontier-mark exchange (DF/DF-P). Exactly two exchanges per
  iteration, as designed in SURVEY.md §4.
* the five public variants {static, nd, dt, df, dfp} are policy
  instances over the same loop — mirroring the reference's lambda-
  injection seam (fi/fm/fa/fu, pagerank.hxx:371) and its five CUDA
  entries (/root/reference/inc/pagerankCuda.hxx:865-988).
* per-iteration per-partition rank checkpoints with lineage
  (run_id/batch/iter/part) + metrics, resumable mid-convergence.
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..options import PagerankOptions, PagerankResult
from ..state import kernels as K
from ..state.partitioner import route_edges, split_pairs_by_owner
from ..state.shard import GraphShard

VARIANTS = ("static", "nd", "dt", "df", "dfp")
MODES = ("auto", "compiled", "p2p", "driver")

# random_batch counter-domain offsets: the three draw streams live 2^60
# apart so they are disjoint for any realistic sample count and ANY seed
# (seed only shifts within a domain). Mirrored verbatim by the SQL
# oracle (__ray_entry__._sql_random_batch).
RB_STREAM_INS = np.uint64(1 << 60)
RB_STREAM_DEL = np.uint64(2 << 60)
RB_STREAM_PICK = np.uint64(3 << 60)


class GraphContext:
    """A graph snapshot distributed over a fixed pool of GraphShard actors."""

    def __init__(self, num_vertices: int, num_parts: int = 8, dictionary: np.ndarray | None = None,
                 add_self_loops: bool = True, num_cpus_per_shard: float = 0.5,
                 hub_split_threshold: int | None = None,
                 dictionary_ds: "rd.Dataset | None" = None,
                 weighted: bool = False):
        # num_cpus_per_shard defaults to 0.5 so a pool of P shards reserves
        # P/2 CPU slots, leaving headroom for the Ray Data ingest/derive
        # tasks that feed the pool — a pool reserving every CPU deadlocks
        # the routing map_batches stage (its tasks can never schedule).
        self.N = int(num_vertices)
        self.P = int(num_parts)
        self.dictionary = dictionary
        # distributed-dictionary mode: (id, vid) as a Dataset; conv_id
        # attachment becomes a hash join instead of a driver gather
        self.dictionary_ds = dictionary_ds
        self.self_loops = add_self_loops
        # explicit skew splitting: vertices with in-degree above this
        # threshold get their in-edge sums computed as per-source-shard
        # partials combined at the owner (None = off). SURVEY.md §4 /
        # reference pagerankCuda.hxx:470-481 degree-64 two-kernel split.
        self.hub_split_threshold = hub_split_threshold
        # weighted=True: edge weight = ingest multiplicity (mention count
        # for the transcript graph). Static-only: apply_update and hub
        # splitting refuse on weighted graphs (see GraphShard.build).
        self.weighted = bool(weighted)
        if self.weighted and hub_split_threshold is not None:
            raise ValueError("hub splitting is unsupported on weighted graphs")
        actor_cls = ray.remote(num_cpus=num_cpus_per_shard)(GraphShard)
        self.shards = [actor_cls.remote(p, self.P, self.N) for p in range(self.P)]
        self._sym_built = False
        self._cdag = None

    def shutdown(self) -> None:
        """Release the actor pool (free its CPU reservations immediately).

        Call when done with a context — actor handles are otherwise only
        released on GC, and a session can starve if stale pools linger.
        """
        self._teardown_cdag()
        for s in self.shards:
            ray.kill(s)
        self.shards = []

    def _teardown_cdag(self) -> None:
        if self._cdag is not None:
            try:
                self._cdag.teardown()
            except Exception:
                pass
            self._cdag = None

    def __del__(self):
        # a compiled DAG pins its actor handles in Ray's global compiled-
        # graph registry, so plain handle GC never releases the pool —
        # kill it explicitly when the context is dropped
        try:
            self.shutdown()
        except Exception:
            pass

    # with P producers × P consumers the per-destination-sliced layout
    # opens P² compiled-graph channels; the broadcast layout opens only P
    # (consumers slice their segment zero-copy from shared memory).
    # Measured on this node the sliced layout stays ahead through P=30
    # (706 vs 550 M edge-iter/s at 42.5M edges — producer-side slicing
    # parallelizes the copy), so the crossover is set above the local
    # core count; pools larger than this (or a future multi-node port
    # where channel setup is costlier) take the broadcast path.
    DAG_SLICED_MAX_PARTS = 48

    def _compiled_dag(self):
        """Compile (once) the per-iteration dataflow: P contribs_dag ->
        shared-memory channels -> P step_dag. One graph serves every
        variant — the variant flags travel in the input channel.

        Channel layout: per-destination slices (``num_returns=P``, P²
        channels carrying exactly the needed bytes) for small pools;
        one packed broadcast per producer (P channels, zero-copy reads,
        consumers slice via ``gather_layout``) for large pools.
        """
        if self._cdag is None:
            from ray.dag import InputNode, MultiOutputNode

            P = self.P
            with InputNode() as inp:
                if P == 1:
                    prods = [self.shards[0].contribs_dag.bind(inp)]
                    steps = [self.shards[0].step_dag.bind(inp, prods[0])]
                elif P <= self.DAG_SLICED_MAX_PARTS:
                    prods = [
                        s.contribs_dag.options(num_returns=P).bind(inp) for s in self.shards
                    ]
                    steps = [
                        self.shards[p].step_dag.bind(inp, *[prods[q][p] for q in range(P)])
                        for p in range(P)
                    ]
                else:
                    prods = [s.contribs_packed_dag.bind(inp) for s in self.shards]
                    steps = [
                        self.shards[p].step_packed_dag.bind(inp, *prods) for p in range(P)
                    ]
                self._cdag = MultiOutputNode(steps).experimental_compile()
        return self._cdag

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def from_edges(cls, encoded_edges: rd.Dataset, num_vertices: int, num_parts: int = 8,
                   dictionary: np.ndarray | None = None, add_self_loops: bool = True,
                   num_cpus_per_shard: float = 0.5,
                   hub_split_threshold: int | None = None,
                   dictionary_ds: "rd.Dataset | None" = None,
                   weighted: bool = False) -> "GraphContext":
        ctx = cls(num_vertices, num_parts, dictionary, add_self_loops, num_cpus_per_shard,
                  hub_split_threshold=hub_split_threshold, dictionary_ds=dictionary_ds,
                  weighted=weighted)
        route_edges(encoded_edges, ctx.shards)
        ctx.finalize()
        return ctx

    def ingest_pairs(self, src: np.ndarray, dst: np.ndarray) -> None:
        """Driver-side ingest of small edge arrays (tests / tiny graphs)."""
        outs = split_pairs_by_owner(src, dst, self.P, "src")
        ins = split_pairs_by_owner(src, dst, self.P, "dst")
        refs = []
        for p in range(self.P):
            o = pa.table({"src": outs[p][0], "dst": outs[p][1]})
            i = pa.table({"src": ins[p][0], "dst": ins[p][1]})
            refs.append(self.shards[p].ingest.remote(o, i))
        ray.get(refs)

    def finalize(self) -> None:
        """Build CSRs on every shard and exchange the pull/send indices —
        the distributed analogue of csrCreate* (/root/reference/inc/
        csr.hxx:100-287) + the H2D transfer (pagerankCuda.hxx:797-805)."""
        needs = ray.get([
            s.build.remote(add_self_loops=self.self_loops, weighted=self.weighted)
            for s in self.shards
        ])
        self._setup_hubs()
        self._exchange(needs)
        self._sym_built = False

    def _setup_hubs(self) -> None:
        """Collect the global hub list (in-degree over threshold) and
        install the split structures on every shard. Must precede
        ``_exchange`` (segment sizes include per-destination hub tails)."""
        self._hub_counts = np.zeros(self.P, dtype=np.int64)
        if self.hub_split_threshold is None:
            return
        hubs = ray.get([
            s.local_hubs.remote(self.hub_split_threshold) for s in self.shards
        ])
        all_hubs = np.sort(np.concatenate(hubs)) if hubs else np.empty(0, np.int64)
        if all_hubs.size == 0:
            return
        href = ray.put(all_hubs)
        ray.get([s.configure_hub_split.remote(href) for s in self.shards])
        self._hub_counts = np.bincount(all_hubs % self.P, minlength=self.P)

    def _exchange(self, needs: list[dict[int, np.ndarray]]) -> None:
        """needs[p][q] = locals p needs from q  ->  send_idx[q][p], plus the
        packed-exchange layout: each source shard q emits ONE packed
        contribution array per iteration laid out destination-major, and
        destination p slices segment [cum[p][q], cum[p+1][q]) from it.
        With hub splitting, destination p's segment in every producer is
        extended by |hubs(p)| partial-sum slots."""
        refs = [
            self.shards[q].set_send_index.remote([needs[p][q] for p in range(self.P)])
            for q in range(self.P)
        ]
        hc = getattr(self, "_hub_counts", np.zeros(self.P, dtype=np.int64))
        sizes = np.array(
            [[len(needs[p][q]) + hc[p] for q in range(self.P)] for p in range(self.P)],
            dtype=np.int64,
        )
        cum = np.vstack([np.zeros((1, self.P), dtype=np.int64), np.cumsum(sizes, axis=0)])
        refs += [
            self.shards[p].set_gather_layout.remote(np.stack([cum[p], cum[p + 1]], axis=1))
            for p in range(self.P)
        ]
        ray.get(refs)

    # ------------------------------------------------------------------
    # graph snapshots (persist the built graph; skip re-derivation)
    # ------------------------------------------------------------------

    def save_graph(self, snap_dir: str) -> None:
        """Persist the built graph (per-shard sorted edge-key sets +
        metadata) so later sessions can ``load_graph`` instead of
        re-deriving from transcripts — the graph-build stage's resume
        path (per-partition files, failed saves re-run per shard)."""
        os.makedirs(snap_dir, exist_ok=True)
        ray.get([s.save_keys.remote(snap_dir) for s in self.shards])
        with open(os.path.join(snap_dir, "meta.json"), "w") as f:
            json.dump(
                {"num_vertices": self.N, "num_parts": self.P,
                 "self_loops": self.self_loops, "weighted": self.weighted}, f,
            )

    @classmethod
    def load_graph(cls, snap_dir: str, num_cpus_per_shard: float = 0.5,
                   hub_split_threshold: int | None = None,
                   dictionary: np.ndarray | None = None) -> "GraphContext":
        with open(os.path.join(snap_dir, "meta.json")) as f:
            meta = json.load(f)
        ctx = cls(meta["num_vertices"], meta["num_parts"], dictionary,
                  meta["self_loops"], num_cpus_per_shard,
                  hub_split_threshold=hub_split_threshold,
                  weighted=meta.get("weighted", False))
        needs = ray.get([s.load_keys.remote(snap_dir) for s in ctx.shards])
        ctx._setup_hubs()
        ctx._exchange(needs)
        ctx._sym_built = False
        return ctx

    def num_edges(self) -> int:
        return int(sum(o for o, _ in ray.get([s.num_edges.remote() for s in self.shards])))

    def count_self_loops(self) -> int:
        return int(sum(ray.get([s.count_self_loops.remote() for s in self.shards])))

    def out_degrees(self) -> rd.Dataset:
        tables = ray.get([s.out_degree_table.remote() for s in self.shards])
        return tables_dataset(tables)

    def in_degrees(self) -> rd.Dataset:
        tables = ray.get([s.in_degree_table.remote() for s in self.shards])
        return tables_dataset(tables)

    def export_edges_parquet(self, dir_path: str) -> int:
        """Dump the live directed edge set as hash-partitioned Parquet
        (one file per shard, written in parallel by the owners — the
        driver never holds an edge). Returns the edge count written.
        Read back with ``ray.data.read_parquet(dir_path)`` or rebuild a
        context via ``GraphContext.from_edges``."""
        os.makedirs(dir_path, exist_ok=True)
        # clear stale exports: a previous dump with MORE shards leaves
        # part files this run would not overwrite (and a crashed one can
        # leave part-*.parquet.tmp); read_parquet reads EVERY file in
        # the dir and would silently merge old and new edges
        for old in glob.glob(os.path.join(dir_path, "part-*.parquet")) + \
                glob.glob(os.path.join(dir_path, "part-*.parquet.tmp")):
            os.unlink(old)
        return int(sum(ray.get([
            s.write_edges_parquet.remote(dir_path) for s in self.shards
        ])))

    # ------------------------------------------------------------------
    # batch updates (temporal protocol, main.cu:79-147)
    # ------------------------------------------------------------------

    def _shard_gather(self, vids: np.ndarray, method: str,
                      extra: np.ndarray | None = None) -> np.ndarray:
        """Call ``method`` on each vid's owner shard with the owned
        local ids (one call per shard, not per vid) and return results
        re-aligned to the input order."""
        P = self.P
        order, cuts = K.owner_split(vids, P)
        sv = vids[order]
        se = extra[order] if extra is not None else None
        refs = []
        for p in range(P):
            a, b = int(cuts[p]), int(cuts[p + 1])
            if a == b:
                continue
            args = (sv[a:b] // P,) + ((se[a:b],) if se is not None else ())
            refs.append(getattr(self.shards[p], method).remote(*args))
        parts = ray.get(refs)
        flat = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        out = np.empty_like(flat)
        out[order] = flat
        return out

    def random_batch(self, num_deletions: int, num_insertions: int, seed: int = 0,
                     undirected: bool = False, retries: int = 5,
                     return_indices: bool = False):
        """Seeded random batch: ``num_deletions`` edge deletions sampled
        from the CURRENT graph (uniform vertex, then uniform DATA
        out-edge of it — structural self-loops are never deleted, they
        are the dead-end transform, not data; up to ``retries`` fresh
        vertex draws when data out-degree is 0, then the sample is
        dropped) plus ``num_insertions`` uniform
        vertex-pair insertions — generateEdgeDeletions / generateEdgeInsertions
        (/root/reference/inc/batch.hxx:100-139, retry: _utility.hxx:199).

        The reference's sequential stream RNG is re-expressed as
        COUNTER-MODE splitmix64: every draw is a pure function of
        (seed, sample index), so the batch is deterministic under any
        partitioning/parallelism, resumable, and SQL-replicable (the
        driver oracle recomputes it exactly). The three draw streams
        (insertion endpoints, deletion candidates, edge picks) occupy
        disjoint ADDITIVE counter domains (offsets 2^60 apart) so they
        stay independent for every seed — a seed-multiplied separator
        would collapse all streams onto one domain at seed=0. Degree
        probes and edge picks run one vectorized call per owner shard —
        no adjacency ever ships to the driver.

        Returns ((2,kd) deletions, (2,ki) insertions) vid arrays in
        sample order, duplicates allowed — feed through tidy_batch, as
        the reference feeds tidyBatchUpdateU. ``undirected=True`` emits
        both directions of every sampled edge (batch.hxx:105,130).
        ``retries <= 1`` means a single candidate draw, no retry."""
        from ..functions.hashing import splitmix64

        N, R = np.uint64(self.N), max(1, int(retries))
        s = np.uint64(seed) * np.uint64(1000003)
        li = np.arange(num_insertions, dtype=np.uint64)
        ins_u = (splitmix64(s + RB_STREAM_INS + 2 * li) % N).astype(np.int64)
        ins_v = (splitmix64(s + RB_STREAM_INS + 2 * li + np.uint64(1)) % N).astype(np.int64)

        ld = np.arange(num_deletions, dtype=np.uint64)
        att = np.arange(R, dtype=np.uint64)
        cand = (splitmix64(s + RB_STREAM_DEL + ld[:, None] * np.uint64(R) + att) % N
                ).astype(np.int64)                               # (num_deletions, R)
        deg = self._shard_gather(cand.ravel(), "out_degrees_of").reshape(num_deletions, R)
        ok = deg > 0
        first = np.argmax(ok, axis=1)
        rows = np.arange(num_deletions)
        has = ok[rows, first]
        del_l = ld[has]
        del_u = cand[rows, first][has]
        hvi = splitmix64(s + RB_STREAM_PICK + del_l)
        del_v = self._shard_gather(del_u, "sample_out_edges", hvi)

        def pack(u: np.ndarray, v: np.ndarray) -> np.ndarray:
            if undirected:
                u, v = (np.column_stack([u, v]).reshape(-1),
                        np.column_stack([v, u]).reshape(-1))
            return np.stack([u, v]).astype(np.int64)

        dels, inss = pack(del_u, del_v), pack(ins_u, ins_v)
        if return_indices:
            rep = 2 if undirected else 1
            return dels, inss, np.repeat(del_l.astype(np.int64), rep), np.repeat(
                li.astype(np.int64), rep)
        return dels, inss

    def tidy_batch(self, deletions: np.ndarray, insertions: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Canonicalize a batch: existence filter + sort + exact dedup —
        tidyBatchUpdateU (/root/reference/inc/batch.hxx:201-208).
        Inputs/outputs are (2,k) [src,dst] vid arrays; the existence
        check runs against each src-owner shard's current edge set.

        Weighted graphs tidy differently: insertions keep their full
        instance multiplicity (dedup or an existence filter would lose
        the +1-weight-per-mention meaning), deletions filter per
        instance to currently-present edges. Replaying a temporal split
        therefore reproduces a one-shot weighted build's exact weights."""
        if self.weighted:
            def wtidy(pairs: np.ndarray, kind: str) -> np.ndarray:
                pairs = np.asarray(pairs).reshape(2, -1)
                if pairs.shape[1] == 0:
                    return pairs
                order = np.lexsort((pairs[1], pairs[0]))
                pairs = pairs[:, order]
                if kind == "insertions":
                    return pairs
                parts = split_pairs_by_owner(pairs[0], pairs[1], self.P, "src")
                masks = ray.get([
                    self.shards[p].filter_batch_by_existence.remote(
                        parts[p][0], parts[p][1], kind)
                    for p in range(self.P)
                ])
                kept = [parts[p][:, masks[p]] for p in range(self.P)]
                merged = np.concatenate(kept, axis=1)
                order = np.lexsort((merged[1], merged[0]))
                return merged[:, order]

            return (wtidy(np.asarray(deletions), "deletions"),
                    wtidy(np.asarray(insertions), "insertions"))

        def tidy(pairs: np.ndarray, kind: str) -> np.ndarray:
            if pairs.size == 0:
                return pairs.reshape(2, 0)
            # sort + unique (batch.hxx:168-191)
            keys = np.unique(pairs[0] * np.int64(self.N) + pairs[1])
            src, dst = keys // self.N, keys % self.N
            parts = split_pairs_by_owner(src, dst, self.P, "src")
            masks = ray.get([
                self.shards[p].filter_batch_by_existence.remote(parts[p][0], parts[p][1], kind)
                for p in range(self.P)
            ])
            kept = [parts[p][:, masks[p]] for p in range(self.P)]
            merged = np.concatenate(kept, axis=1)
            order = np.lexsort((merged[1], merged[0]))
            return merged[:, order]

        return tidy(np.asarray(deletions), "deletions"), tidy(np.asarray(insertions), "insertions")

    def apply_batch(self, deletions: np.ndarray, insertions: np.ndarray) -> None:
        """Fold a (tidied) batch into every shard and re-exchange pull
        indices — applyBatchUpdateU + update (/root/reference/inc/
        batch.hxx:222-248, inc/update.hxx:130-150)."""
        d = np.asarray(deletions).reshape(2, -1)
        i = np.asarray(insertions).reshape(2, -1)
        del_out = split_pairs_by_owner(d[0], d[1], self.P, "src")
        ins_out = split_pairs_by_owner(i[0], i[1], self.P, "src")
        del_in = split_pairs_by_owner(d[0], d[1], self.P, "dst")
        ins_in = split_pairs_by_owner(i[0], i[1], self.P, "dst")
        needs = ray.get([
            self.shards[p].apply_update.remote(del_out[p], ins_out[p], del_in[p], ins_in[p])
            for p in range(self.P)
        ])
        self._setup_hubs()
        self._exchange(needs)
        self._sym_built = False
        self._hits_ready = False  # transpose pull index is CSR-derived

    # ------------------------------------------------------------------
    # HITS hubs & authorities
    # ------------------------------------------------------------------

    def hits(self, iterations: int = 20, normalize: str = "iter"):
        """HITS (Kleinberg): authority a = A^T h, hub h = A a, iterated
        ``iterations`` times from h⁰ = 1; weighted graphs use w_uv in
        both pulls. The authority phase rides the existing contribution
        exchange (same packed layout, value = h); the hub phase pulls
        through a transpose exchange built lazily on first call (and
        invalidated by batch updates).

        ``normalize``: "iter" rescales a and h to unit L2 after each
        phase (numerically safe default); "end" normalizes only the
        final vectors — the variant the SQL oracle replicates (a
        recursive CTE cannot renormalize per step). Directions are
        identical; only float magnitudes differ mid-run.

        Returns (authority, hub): dense vid-indexed unit-L2 float64
        arrays. Driver-coordinated loop only — 2P objects per phase;
        HITS runs are short (tens of iterations) so the compiled-dag
        treatment PageRank gets is not worth a second channel graph.
        """
        assert normalize in ("iter", "end"), normalize
        assert iterations >= 1, "HITS needs at least one iteration"
        if self.hub_split_threshold is not None:
            raise ValueError(
                "HITS does not support hub-split contexts: the PR hub "
                "partial-sum tails change the packed-exchange layout"
            )
        shards, P = self.shards, self.P
        if not getattr(self, "_hits_ready", False):
            needs = ray.get([s.hits_prepare.remote() for s in shards])
            refs = [
                shards[q].set_t_send_index.remote([needs[p][q] for p in range(P)])
                for q in range(P)
            ]
            sizes = np.array(
                [[len(needs[p][q]) for q in range(P)] for p in range(P)], dtype=np.int64
            )
            cum = np.vstack([np.zeros((1, P), dtype=np.int64), np.cumsum(sizes, axis=0)])
            refs += [
                shards[p].set_t_gather_layout.remote(np.stack([cum[p], cum[p + 1]], axis=1))
                for p in range(P)
            ]
            ray.get(refs)
            self._hits_ready = True
        ray.get([s.hits_init.remote() for s in shards])
        for _ in range(int(iterations)):
            packed_h = [s.hits_pack_h.remote() for s in shards]
            ssq_a = ray.get([shards[p].hits_authority.remote(*packed_h) for p in range(P)])
            if normalize == "iter":
                na = float(np.sqrt(sum(ssq_a)))
                if na > 0.0:
                    ray.get([s.hits_scale.remote(1.0 / na, 1.0) for s in shards])
            packed_a = [s.hits_pack_a.remote() for s in shards]
            ssq_h = ray.get([shards[p].hits_hub.remote(*packed_a) for p in range(P)])
            if normalize == "iter":
                nh = float(np.sqrt(sum(ssq_h)))
                if nh > 0.0:
                    ray.get([s.hits_scale.remote(1.0, 1.0 / nh) for s in shards])
        if normalize == "end":
            na = float(np.sqrt(sum(ssq_a)))
            nh = float(np.sqrt(sum(ssq_h)))
            ray.get([
                s.hits_scale.remote(1.0 / na if na > 0 else 1.0, 1.0 / nh if nh > 0 else 1.0)
                for s in shards
            ])
        parts = ray.get([s.hits_result.remote() for s in shards])
        a = np.zeros(self.N)
        h = np.zeros(self.N)
        for p, (ap, hp) in enumerate(parts):
            a[p::P] = ap
            h[p::P] = hp
        return a, h

    # ------------------------------------------------------------------
    # affected-vertex marking
    # ------------------------------------------------------------------

    def compute_frontier_marks(self, deletions: np.ndarray, insertions: np.ndarray,
                               x_ctx: "GraphContext | None" = None) -> list[np.ndarray]:
        """One-hop DF marking (/root/reference/inc/pagerank.hxx:645-676):
        out-neighbors of each deletion source in the OLD graph (x_ctx)
        plus out-neighbors of each insertion source in this (updated)
        graph. Returns per-shard local-id arrays (not yet applied)."""
        acc: list[list[np.ndarray]] = [[] for _ in range(self.P)]

        def expand(ctx: "GraphContext", sources: np.ndarray):
            if sources.size == 0:
                return
            uniq = np.unique(sources)
            owners = uniq % self.P
            refs = []
            for q in range(self.P):
                loc = uniq[owners == q] // self.P
                refs.append(
                    ctx.shards[q].expand_out_neighbors.options(num_returns=self.P + 1).remote(loc)
                )
            for q in range(self.P):
                outs = ray.get(list(refs[q][1:]))
                for p in range(self.P):
                    if len(outs[p]):
                        acc[p].append(outs[p])

        d = np.asarray(deletions).reshape(2, -1)
        i = np.asarray(insertions).reshape(2, -1)
        expand(x_ctx if x_ctx is not None else self, d[0])
        expand(self, i[0])
        return [
            np.unique(np.concatenate(a)) if a else np.empty(0, dtype=np.int64) for a in acc
        ]

    def _apply_initial_marks(self, marks: list[np.ndarray], traversal: bool) -> None:
        """Install initial marks; for DT, close them under reachability in
        this graph — the BFS fixpoint of pagerankAffectedTraversalW
        (/root/reference/inc/pagerank.hxx:543-578) run as bulk-synchronous
        frontier rounds (the reference's CUDA variant does the same
        count-fixpoint loop, pagerankCuda.hxx:439-456)."""
        ray.get([s.clear_flags.remote() for s in self.shards])
        frontier = ray.get([
            self.shards[p].apply_marks_frontier.remote(marks[p]) for p in range(self.P)
        ])
        if not traversal:
            return
        while any(f.size for f in frontier):
            refs = [
                self.shards[p].expand_out_neighbors.options(num_returns=self.P + 1).remote(frontier[p])
                for p in range(self.P)
            ]
            incoming: list[list] = [[refs[q][1 + p] for q in range(self.P)] for p in range(self.P)]
            frontier = ray.get([
                self.shards[p].apply_marks_frontier.remote(*incoming[p]) for p in range(self.P)
            ])

    # ------------------------------------------------------------------
    # PageRank (all five variants)
    # ------------------------------------------------------------------

    def pagerank(
        self,
        variant: str = "static",
        warm: list[np.ndarray] | None = None,
        options: PagerankOptions | None = None,
        initial_marks: list[np.ndarray] | None = None,
        resume: bool = False,
        batch_idx: int = 0,
        mode: str = "auto",
        personalization: np.ndarray | None = None,
    ) -> PagerankResult:
        """Run one PageRank computation to convergence.

        variant: static | nd (warm start) | dt (fixed affected set) |
        df (frontier) | dfp (frontier + pruning). ``warm`` is the
        per-shard rank list from a previous result (required for the
        dynamic variants). ``initial_marks`` comes from
        ``compute_frontier_marks`` (required for dt/df/dfp).

        mode: "compiled" (the "auto" default) executes one pre-compiled
        Ray dataflow graph per iteration (shared-memory channels, lowest
        per-iteration overhead — the single-node fast path); "p2p" runs
        the whole loop inside the actor pool with direct peer exchange
        (one driver dispatch per run — the multi-node scale path);
        "driver" coordinates every iteration from the client (debugging
        reference). All three are bit-equal. dangling="redistribute" is
        wired through every mode: the compiled loop ships each shard's
        dangling mass as one appended element per contribution channel,
        p2p piggybacks it on the contribution message.
        """
        o = options or PagerankOptions()
        assert variant in VARIANTS, variant
        assert mode in MODES, f"mode must be one of {MODES}, got {mode!r}"
        if variant == "dfp" and not self.self_loops:
            raise ValueError(
                "dfp requires the self-loop graph transform "
                "(add_self_loops=True): the DF-P closed-form update "
                "(pagerankPrune.hxx:38-39) solves the self-loop fixpoint "
                "and divides by out-degree, which a dangling vertex makes "
                "undefined"
            )
        # personalized PageRank (§2.10 extension seam): an optional dense
        # vid-indexed teleport vector; normalized here, sliced per owner
        # (vid i lives at shard i%P, row i//P) and installed as shard
        # state so every loop mode reads it. None clears any previous
        # run's vector (teleport must not leak across runs on a shared
        # GraphContext).
        pers = None
        if personalization is not None:
            pers = np.asarray(personalization, dtype=np.float64)
            if pers.shape != (self.N,):
                raise ValueError(f"personalization shape {pers.shape} != ({self.N},)")
            mass = float(pers.sum())
            if not mass > 0.0 or not np.all(pers >= 0.0):
                raise ValueError("personalization must be nonnegative with positive mass")
            pers = pers / mass
        ray.get([
            sh.set_teleport.remote(None if pers is None else pers[p::self.P])
            for p, sh in enumerate(self.shards)
        ])
        if o.repeat > 1 and not resume:
            # reference REPEAT_METHOD semantics (_utility.hxx:113-119):
            # run the whole computation `repeat` times, report the result
            # of the last run with phase timings averaged over all runs
            import dataclasses

            runs = [
                self.pagerank(
                    variant, warm=warm,
                    options=dataclasses.replace(o, repeat=1),
                    initial_marks=initial_marks, batch_idx=batch_idx, mode=mode,
                    personalization=personalization,
                )
                for _ in range(o.repeat)
            ]
            last = runs[-1]
            k = float(len(runs))
            return PagerankResult(
                ranks=last.ranks, iterations=last.iterations,
                time=sum(r.time for r in runs) / k,
                initialization_time=sum(r.initialization_time for r in runs) / k,
                marking_time=sum(r.marking_time for r in runs) / k,
                computation_time=sum(r.computation_time for r in runs) / k,
                linf_delta=last.linf_delta, metrics=last.metrics,
            )
        use_affected = variant in ("dt", "df", "dfp")
        frontier = variant in ("df", "dfp")
        prune = variant == "dfp"
        shards, P = self.shards, self.P
        C0 = (1.0 - o.damping) / self.N
        redistribute = not self.self_loops and o.dangling == "redistribute"
        metrics: list[dict] = []
        t_total0 = time.perf_counter()
        l = 0
        ti = tm = 0.0

        resumed = False
        if resume and o.checkpoint_dir:
            it = _latest_complete_iteration(o.checkpoint_dir, o.run_id, batch_idx)
            if it is not None:
                ray.get([s.restore.remote(o.checkpoint_dir, o.run_id, batch_idx, it) for s in shards])
                l = it
                resumed = True

        if not resumed:
            t0 = time.perf_counter()
            if variant == "static" or warm is None:
                ray.get([s.init_ranks.remote(None) for s in shards])
            else:
                ray.get([s.init_ranks.remote(warm[p]) for p, s in enumerate(shards)])
            ti = time.perf_counter() - t0
            t0 = time.perf_counter()
            if use_affected:
                marks = initial_marks or [np.empty(0, dtype=np.int64) for _ in range(P)]
                self._apply_initial_marks(marks, traversal=(variant == "dt"))
            tm = time.perf_counter() - t0

        t0 = time.perf_counter()
        linf = float("inf")
        if mode == "auto":
            mode = "compiled"

        if mode == "compiled":
            cdag = self._compiled_dag()
            params = (
                C0, o.damping, use_affected, frontier, prune,
                o.frontier_tolerance, o.prune_tolerance, redistribute,
            )
            marks_fb = None
            # Fixed-iteration runs with no driver-side feedback (no
            # frontier marks, no early stop) admit a depth-2 submission
            # pipeline: iteration l+1 is submitted before l's stats are
            # retrieved, hiding the driver round trip behind compute.
            # Bit-identical to the serial loop — actors execute their
            # nodes in order, so the iteration math is unchanged and
            # exactly max_iterations iterations run either way.
            if not frontier and o.tolerance <= 0.0 and not o.checkpoint_every:
                pending = []
                while l + len(pending) < o.max_iterations or pending:
                    if l + len(pending) < o.max_iterations and len(pending) < 2:
                        pending.append(cdag.execute((params, None)))
                        continue
                    stats = list(ray.get(pending.pop(0)))
                    l += 1
                    linf = max(s["linf"] for s in stats)
                    metrics.append({"iteration": l, "linf": linf, "parts": stats})
                tc = time.perf_counter() - t0
                ranks = ray.get([s.get_ranks.remote() for s in shards])
                return PagerankResult(
                    ranks=ranks, iterations=l, time=time.perf_counter() - t_total0,
                    initialization_time=ti, marking_time=tm, computation_time=tc,
                    linf_delta=linf, metrics=metrics,
                )
            while l < o.max_iterations:
                out = ray.get(cdag.execute((params, marks_fb)))
                if frontier:
                    stats = [t[0] for t in out]
                    marks_fb = [(t[1], t[2]) for t in out]
                else:
                    stats = list(out)
                l += 1
                linf = max(s["linf"] for s in stats)
                metrics.append({"iteration": l, "linf": linf, "parts": stats})
                if o.checkpoint_every and o.checkpoint_dir and l % o.checkpoint_every == 0:
                    # flush the pending frontier marks into shard state BEFORE
                    # checkpointing: the checkpoint saves vaff, and a resume
                    # resets the driver-held marks_fb — unflushed marks would
                    # be lost and the resumed run would under-mark (converging
                    # to different ranks than an uninterrupted run)
                    if marks_fb is not None:
                        flat = [r for m_off in marks_fb for r in m_off]
                        ray.get([
                            s.apply_marks_packed.remote(*flat) for s in self.shards
                        ])
                        marks_fb = None
                    self._checkpoint(o, batch_idx, l, linf, metrics[-1])
                if linf < o.tolerance:
                    break
            tc = time.perf_counter() - t0
            ranks = ray.get([s.get_ranks.remote() for s in shards])
            return PagerankResult(
                ranks=ranks, iterations=l, time=time.perf_counter() - t_total0,
                initialization_time=ti, marking_time=tm, computation_time=tc,
                linf_delta=linf, metrics=metrics,
            )

        if mode == "p2p":
            start = l
            # peers are passed per-run (NOT stored in actor state): shards
            # holding each other's handles permanently would form a
            # reference cycle that keeps the whole pool alive after the
            # driver drops its handles
            refs = [
                s.run_iterations.remote(
                    shards, l, o.max_iterations, C0, o.damping, use_affected, frontier, prune,
                    o.frontier_tolerance, o.prune_tolerance, o.tolerance, redistribute,
                    o.checkpoint_every or 0, o.checkpoint_dir, o.run_id, batch_idx,
                )
                for s in shards
            ]
            # fail-fast collective get: a dead shard must raise, not
            # leave the driver blocked behind its hung peers
            per_shard = get_all_fail_fast(refs)
            n_it = len(per_shard[0])
            for k in range(n_it):
                linf = per_shard[0][k]["linf_global"]
                metrics.append(
                    {"iteration": start + k + 1, "linf": linf, "parts": [ps[k] for ps in per_shard]}
                )
            l = start + n_it
            if o.checkpoint_every and o.checkpoint_dir:
                for m in metrics[-n_it:]:
                    if m["iteration"] % o.checkpoint_every == 0:
                        self._finish_checkpoint(o, batch_idx, m["iteration"], m["linf"], m)
            tc = time.perf_counter() - t0
            ranks = ray.get([s.get_ranks.remote() for s in shards])
            return PagerankResult(
                ranks=ranks, iterations=l, time=time.perf_counter() - t_total0,
                initialization_time=ti, marking_time=tm, computation_time=tc,
                linf_delta=linf, metrics=metrics,
            )

        nret = 3 if frontier else 1
        while l < o.max_iterations:
            contrib_refs = [
                shards[q].contribs.options(num_returns=2).remote() for q in range(P)
            ]
            dangling_mass = (
                float(sum(ray.get([contrib_refs[q][0] for q in range(P)]))) if redistribute else 0.0
            )
            packed = [contrib_refs[q][1] for q in range(P)]
            step_refs = [
                shards[p].step.options(num_returns=nret).remote(
                    C0, o.damping, use_affected, frontier, prune,
                    o.frontier_tolerance, o.prune_tolerance, dangling_mass,
                    *packed,
                )
                for p in range(P)
            ]
            stats = ray.get([step_refs[p][0] if frontier else step_refs[p] for p in range(P)])
            if frontier:
                flat = [r for q in range(P) for r in (step_refs[q][1], step_refs[q][2])]
                ray.get([shards[p].apply_marks_packed.remote(*flat) for p in range(P)])
            l += 1
            linf = max(s["linf"] for s in stats)  # global L∞ tree-reduce (pagerank.hxx:433)
            metrics.append({"iteration": l, "linf": linf, "parts": stats})
            if o.checkpoint_every and o.checkpoint_dir and l % o.checkpoint_every == 0:
                self._checkpoint(o, batch_idx, l, linf, metrics[-1])
            if linf < o.tolerance:
                break
        tc = time.perf_counter() - t0
        ranks = ray.get([s.get_ranks.remote() for s in shards])
        return PagerankResult(
            ranks=ranks, iterations=l, time=time.perf_counter() - t_total0,
            initialization_time=ti, marking_time=tm, computation_time=tc,
            linf_delta=linf, metrics=metrics,
        )

    def _checkpoint(self, o: PagerankOptions, batch_idx: int, iteration: int, linf: float, metric: dict) -> None:
        ray.get([
            s.checkpoint.remote(o.checkpoint_dir, o.run_id, batch_idx, iteration) for s in self.shards
        ])
        self._finish_checkpoint(o, batch_idx, iteration, linf, metric)

    def _finish_checkpoint(self, o: PagerankOptions, batch_idx: int, iteration: int, linf: float, metric: dict) -> None:
        """Publish the completeness marker + metrics line for an iteration
        whose per-partition parquet files are already on disk (written by
        the shards themselves in p2p mode)."""
        d = os.path.join(o.checkpoint_dir, o.run_id, f"batch={batch_idx}", f"iter={iteration}")
        with open(os.path.join(d, "_COMPLETE.json"), "w") as f:
            json.dump({"iteration": iteration, "linf": linf, "num_parts": self.P}, f)
        with open(os.path.join(o.checkpoint_dir, o.run_id, "metrics.jsonl"), "a") as f:
            f.write(json.dumps({"batch": batch_idx, **_light(metric)}) + "\n")

    def norm_delta(self, parts: list[np.ndarray], ord: int | float = 1) -> float:
        """Distributed ||ranks - parts||_ord across the shard pool (per-
        shard partials + tree-reduce) — l1/l2/liNormDelta
        (/root/reference/inc/_vector.hxx:776-1284). ``parts`` is a
        per-shard rank list (e.g. a previous PagerankResult.ranks)."""
        partials = ray.get([
            s.rank_norm_partial.remote(parts[p], ord)
            for p, s in enumerate(self.shards)
        ])
        if ord == float("inf"):
            return float(max(partials))
        total = float(sum(partials))
        return float(np.sqrt(total)) if ord == 2 else total

    # ------------------------------------------------------------------
    # result access
    # ------------------------------------------------------------------

    def assemble(self, parts: list[np.ndarray]) -> np.ndarray:
        """Per-shard arrays -> dense vid-indexed vector (scatterValuesW,
        /root/reference/inc/_vector.hxx:155-272)."""
        full = np.zeros(self.N, dtype=parts[0].dtype if parts else np.float64)
        for p, arr in enumerate(parts):
            full[p::self.P] = arr
        return full

    def split(self, full: np.ndarray) -> list[np.ndarray]:
        """Dense vid-indexed vector -> per-shard arrays (gatherValuesW)."""
        return [full[p::self.P] for p in range(self.P)]

    def ranks_dataset_live(self) -> rd.Dataset:
        """The pool's LIVE ranks as a Dataset assembled from SHARD-built
        Arrow tables (ObjectRefs via ``from_arrow_refs``) — the driver
        never concatenates rank vectors (8 GB at 10⁹ vertices), it holds
        P table refs. The cluster-scale counterpart of
        :meth:`ranks_dataset` (which takes a driver-held parts list);
        conv ids resolve from one broadcast dictionary ref, or through
        the distributed dictionary join when the universe outgrew a
        broadcastable array."""
        dict_ref = ray.put(self.dictionary) if self.dictionary is not None else None
        ds = rd.from_arrow_refs([s.ranks_table.remote(dict_ref) for s in self.shards])
        if self.dictionary is None and self.dictionary_ds is not None:
            ds = ds.join(
                self.dictionary_ds, "inner", self.P, on=("vid",)
            ).rename_columns({"id": "conv_id"})
        return ds

    def ranks_dataset(self, parts: list[np.ndarray]) -> rd.Dataset:
        """Ranks as a Ray Data Dataset (vid, rank[, conv_id])."""
        tables = []
        for p, arr in enumerate(parts):
            vids = np.arange(len(arr), dtype=np.int64) * self.P + p
            cols = {"vid": pa.array(vids), "rank": pa.array(arr)}
            if self.dictionary is not None:
                cols["conv_id"] = pa.array(self.dictionary[vids])
            tables.append(pa.table(cols))
        ds = tables_dataset(tables)
        if self.dictionary is None and self.dictionary_ds is not None:
            # fractional-CPU aggregators: the shard pool holds CPU slots
            ds = ds.join(
                self.dictionary_ds, "inner", self.P, on=("vid",)
            ).rename_columns({"id": "conv_id"})
        return ds


def tables_dataset(tables) -> rd.Dataset:
    """Dataset from driver-held Arrow tables WITHOUT cluster CPU:
    ``rd.from_arrow`` submits one default-1-CPU metadata task per table
    and ray.get-blocks on it, which deadlocks forever when long-lived
    shard actor pools have every CPU slot reserved (two pools open at
    once is enough on a small node). ``from_blocks`` computes the block
    metadata driver-side — no task, no scheduling dependency."""
    tables = list(tables)
    if not tables:
        return rd.from_blocks([pa.table({})])
    return rd.from_blocks(tables)


def get_all_fail_fast(refs: list) -> list:
    """``ray.get`` for in-pool (p2p) collective runs that surfaces a
    member's death IMMEDIATELY. A plain ``ray.get(list)`` fetches refs
    in order, so if shard 0 is alive-but-hung (awaiting a message from a
    shard that died) the driver blocks on shard 0 forever and never sees
    the dead shard's error. Completing refs one at a time raises the
    dead member's RayActorError as soon as it lands; the caller's
    recovery path (``pagerank_recoverable``) then tears down the hung
    peers."""
    import ray as _ray

    results: dict[int, object] = {}
    by_ref = {r: i for i, r in enumerate(refs)}
    pending = list(refs)
    while pending:
        done, pending = _ray.wait(pending, num_returns=1)
        results[by_ref[done[0]]] = _ray.get(done[0])  # raises on member death
    return [results[i] for i in range(len(refs))]


def pagerank_recoverable(
    snap_dir: str,
    variant: str = "static",
    warm: list[np.ndarray] | None = None,
    options: PagerankOptions | None = None,
    initial_marks: list[np.ndarray] | None = None,
    mode: str = "auto",
    batch_idx: int = 0,
    max_attempts: int = 3,
    ctx: "GraphContext | None" = None,
    num_cpus_per_shard: float = 0.5,
    hub_split_threshold: int | None = None,
    dictionary: np.ndarray | None = None,
) -> "tuple[GraphContext, PagerankResult]":
    """Worker-loss-tolerant PageRank: survive shard-actor death mid-run.

    The reference is a single process with no fault story; on a
    multi-node cluster any worker can die mid-convergence. This wrapper
    composes the engine's two durable artifacts — the graph snapshot
    (``save_graph``: per-partition edge-key parquet) and the rank
    checkpoint lineage (``checkpoint_dir``: per-partition ranks + vaff
    per ``checkpoint_every`` iterations) — into an at-least-once run:
    each attempt (re)builds the actor pool from the snapshot and resumes
    from the newest COMPLETE checkpoint, so a crash costs at most
    ``checkpoint_every`` iterations of recompute. Resumed runs are
    bit-equal to uninterrupted ones (the resume path restores ranks,
    both buffers and vaff — see test_resume).

    Pass ``ctx`` to reuse an already-built pool for the first attempt
    (it is shut down and rebuilt from ``snap_dir`` if its actors die).
    Retryable failures are Ray delivery/actor faults (actor death,
    unavailability, channel teardown, preempted nodes) — application
    errors raised *inside* a kernel (``RayTaskError`` wrapping a Python
    exception) are re-raised immediately: retrying a deterministic bug
    cannot succeed and would mask it. Returns ``(ctx, result)``; the
    caller owns ``ctx.shutdown()``.
    """
    import ray.exceptions as rex

    retryable: tuple = (rex.RayActorError, rex.ActorUnavailableError,
                        rex.RaySystemError, rex.GetTimeoutError)
    try:  # compiled-graph channels raise their own error family
        retryable = retryable + (rex.RayChannelError,)
    except AttributeError:
        pass
    o = options or PagerankOptions()
    last_err: BaseException | None = None
    for attempt in range(max_attempts):
        if ctx is None:
            ctx = GraphContext.load_graph(
                snap_dir, num_cpus_per_shard=num_cpus_per_shard,
                hub_split_threshold=hub_split_threshold, dictionary=dictionary,
            )
        try:
            # resume=True is a no-op when no checkpoint exists yet
            res = ctx.pagerank(
                variant, warm=warm, options=o, initial_marks=initial_marks,
                resume=bool(o.checkpoint_dir), batch_idx=batch_idx, mode=mode,
            )
            return ctx, res
        except retryable as e:
            if isinstance(e, rex.RayTaskError):
                raise  # application error inside a kernel — not a fault
            last_err = e
            try:
                ctx.shutdown()
            except Exception:
                pass
            ctx = None
    raise RuntimeError(
        f"pagerank_recoverable: {max_attempts} attempts exhausted"
    ) from last_err


def _light(metric: dict) -> dict:
    return {
        "iteration": metric["iteration"],
        "linf": metric["linf"],
        "parts": [
            {k: v for k, v in p.items() if k in ("part", "affected", "gathered", "step_s")}
            for p in metric["parts"]
        ],
    }


def _latest_complete_iteration(ckpt_dir: str, run_id: str, batch_idx: int) -> int | None:
    pat = os.path.join(ckpt_dir, run_id, f"batch={batch_idx}", "iter=*", "_COMPLETE.json")
    its = []
    for m in glob.glob(pat):
        its.append(int(os.path.basename(os.path.dirname(m)).split("=")[1]))
    return max(its) if its else None
