"""Connected components, label propagation, triangle counting.

These run on the same shard actor pool as PageRank, over the
symmetrized (undirected) view of the graph — symmetrize is the
reference's prerequisite for its community/traversal machinery
(/root/reference/inc/symmetrize.hxx:14-82, inc/bfs.hxx:22-55,
inc/properties.hxx:123-401). All three reuse the engine's
mark-shuffle / convergence-tree-reduce machinery (SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .graph import GraphContext, get_all_fail_fast, tables_dataset


def _ensure_symmetric(ctx: GraphContext) -> None:
    if not ctx._sym_built:
        ray.get([s.build_symmetric.remote() for s in ctx.shards])
        ctx._sym_built = True


def _label_mode(mode: str) -> str:
    """Resolve ``mode="auto"`` for the label fixpoint loops.

    Single node: the driver-coordinated loop wins — its barriers are
    local RPCs (~1 ms), while the in-pool p2p loop pays P² actor
    messages per round. Multi-node: every driver barrier is a network
    round trip × rounds × 2-3 barriers, the classic BSP scaling wall,
    so the in-pool loop (one dispatch per shard per RUN) wins. Measured
    locally (sf0.1, P=24): cc driver 0.5 s vs p2p 0.9 s — dispatch is
    not the wall until the network is in the loop.
    """
    if mode != "auto":
        return mode
    try:
        nodes = [n for n in ray.nodes() if n.get("Alive", False)]
    except Exception:
        nodes = []
    return "p2p" if len(nodes) > 1 else "driver"


def _driver_label_fixpoint(shards, push: str, apply_: str, max_rounds: int,
                           post_round: str | None = None) -> None:
    """Driver-coordinated label round loop shared by cc / warm-cc / lp:
    each round every shard pushes per-owner slices (num_returns = P+1),
    owners apply them and report a changed count, and the loop stops
    when the global count reaches zero. The in-pool twin of this loop is
    GraphShard.run_label_iterations — keep their round structure in
    sync (results are bit-identical across the two)."""
    P = len(shards)
    for _ in range(max_rounds):
        refs = [getattr(s, push).options(num_returns=P + 1).remote() for s in shards]
        changed = ray.get([
            getattr(shards[p], apply_).remote(*[refs[q][1 + p] for q in range(P)])
            for p in range(P)
        ])
        if post_round is not None:
            ray.get([getattr(s, post_round).remote() for s in shards])
        if sum(changed) == 0:
            break


def connected_components_incremental(ctx: GraphContext, inserted_edges: np.ndarray,
                                     max_rounds: int = 10_000,
                                     mode: str = "auto") -> rd.Dataset:
    """Warm CC restart after an INSERTION-ONLY batch update — the CC
    analogue of the engine's dynamic PageRank variants.

    Requires converged CC labels on the shards (a prior cold
    :func:`connected_components` run; the shards reject LP/installed
    labels). Insertions can only merge components, so min-label
    propagation seeded at just the inserted edges' endpoints
    (``inserted_edges``: (2,k) global vid pairs, the array
    ``ctx.apply_batch`` consumed) reaches exactly the vertices whose
    label must shrink — the warm fixpoint equals a cold recompute
    bit-for-bit, in rounds bounded by the merged components' diameter.
    Deletions can SPLIT components: run the cold function instead.
    """
    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    from ..state import kernels as K

    ends = np.unique(np.asarray(inserted_edges, dtype=np.int64).reshape(-1))
    order, cuts = K.owner_split(ends, P)
    ends = ends[order]
    ray.get([
        shards[p].cc_seed_warm.remote(ends[cuts[p]:cuts[p + 1]] // P)
        for p in range(P)
    ])
    if _label_mode(mode) == "p2p":
        get_all_fail_fast([
            s.run_label_iterations.remote(shards, "cc", max_rounds, warm=True)
            for s in shards
        ])
    else:
        _driver_label_fixpoint(shards, "cc_push", "cc_apply", max_rounds)
    tables = ray.get([s.labels_table.remote("component") for s in shards])
    return _with_conv(ctx, tables)


def _pa_col(x: np.ndarray) -> "pa.Array":
    """Typed Arrow column even when empty: an empty object array must
    become string, never null — mixed null/string block schemas fail
    unification downstream (the pseudo_diameter lesson)."""
    import pyarrow as pa

    if getattr(x, "dtype", None) == object:
        return pa.array(x, pa.string())
    return pa.array(x)


def _run_split(a: np.ndarray) -> tuple[int, int, np.ndarray]:
    """Split a run-contiguous key column into its complete interior
    segment and its boundary rows: returns ``(s, e, bnd_idx)`` where
    ``a[s:e]`` holds only runs that start AND end inside this block and
    ``bnd_idx`` indexes the first and last runs (which may continue in
    an adjacent block — Ray slices oversized map/sort outputs at
    target_max_block_size, so even a 'one run per output' stage can see
    its runs split). A block with <= 2 runs is all boundary."""
    runs = np.flatnonzero(a[1:] != a[:-1]) + 1 if len(a) else np.array([])
    if len(runs) == 0:
        return 0, 0, np.arange(len(a))
    s, e = int(runs[0]), int(runs[-1])
    bnd = np.concatenate([np.arange(s), np.arange(e, len(a))])
    if e <= s:  # exactly two runs: no interior
        return 0, 0, np.arange(len(a))
    return s, e, bnd


def _seg_cap(a: np.ndarray, b: np.ndarray, ov: np.ndarray, cap: int):
    """Vectorized per-vertex cap over rows SORTED by (a, b):
    adjacent-dedup, rank-within-run < cap keep mask, and per-run
    over = any block-overflow bit OR distinct count > cap. Safe on
    empty input. Returns (kept a, kept b, kept over-per-row)."""
    if len(a) == 0:
        return a, b, np.empty(0, dtype=np.int64)
    first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    # a run's over bit must see every duplicate row's ov, so fold ov
    # over the ORIGINAL rows per a-run before deduping
    astart = np.concatenate([[True], a[1:] != a[:-1]])
    rid = np.cumsum(astart) - 1
    ov_any = np.zeros(int(rid[-1]) + 1, dtype=np.int64)
    np.maximum.at(ov_any, rid, ov)
    ad, bd, rd_ = a[first], b[first], rid[first]
    dstart = np.concatenate([[True], ad[1:] != ad[:-1]])
    starts = np.flatnonzero(dstart)
    cnt = np.diff(np.append(starts, len(ad)))
    rank = np.arange(len(ad)) - np.repeat(starts, cnt)
    over = (ov_any[rd_[starts]] | (cnt > cap)).astype(np.int64)
    keep = rank < cap
    return ad[keep], bd[keep], np.repeat(over, np.minimum(cnt, cap))


def _cap_adjacency(sym: rd.Dataset, cap: int, num_partitions: int,
                   flag_broadcast_bytes: int = 64 << 20):
    """Truncate every vertex's neighbor list to its ``cap`` smallest
    distinct neighbors and derive per-vertex truncation flags — the
    graceful-hub path of :func:`two_hop_counts`.

    Combiner + sorted-segment plan (the exact_dedup shape — NO
    per-vertex map_groups, which would cost one Python call per vertex):
    each block ships at most ``cap`` smallest distinct (a, b) rows per
    vertex plus a block-overflow bit; one sort on (a, b) makes each
    vertex's candidates adjacent, and a vectorized segment pass dedups,
    ranks and truncates. Each per-block smallest-cap list is a lossless
    prefix filter for the global smallest-cap, and deg(a) > cap ⇔ any
    block overflowed OR the union exceeds cap — no exact-degree pass
    anywhere. Runs straddling a block edge merge driver-side as
    O(blocks × cap) already-capped rows (the exact_dedup boundary
    contract).

    Returns (capped (a, b) Dataset, flags Dataset(a, truncated:int64))
    with truncated(a) = own overflow OR any KEPT neighbor's overflow
    (the vertices whose capped 2-hop count can undercount)."""

    def cap_partial(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return pa.table({"a": t["a"], "b": t["b"],
                             "ov": pa.array([], pa.int64())})
        order = np.lexsort((b, a))
        aa, bb = a[order], b[order]
        starts = np.concatenate([[0], np.flatnonzero(aa[1:] != aa[:-1]) + 1])
        cnt = np.diff(np.append(starts, len(aa)))
        rank = np.arange(len(aa)) - np.repeat(starts, cnt)
        keep = rank < cap
        ov = np.repeat((cnt > cap).astype(np.int64), np.minimum(cnt, cap))
        return pa.table({"a": pa.array(aa[keep]), "b": pa.array(bb[keep]),
                         "ov": pa.array(ov)})

    srt = (sym.map_batches(cap_partial, batch_format="pyarrow")
           .sort(["a", "b"]).materialize())

    def block_capped(df: pd.DataFrame) -> pa.Table:
        a = df["a"].to_numpy()
        s, e, _ = _run_split(a)
        # s == e (a block with <= 2 runs) yields empty slices; _seg_cap
        # and _pa_col keep the schema typed either way
        ka, kb, kov = _seg_cap(a[s:e], df["b"].to_numpy()[s:e],
                               df["ov"].to_numpy()[s:e], cap)
        return pa.table({"a": _pa_col(ka), "b": _pa_col(kb),
                         "ov": pa.array(kov)})

    def block_edge(df: pd.DataFrame) -> pa.Table:
        a = df["a"].to_numpy()
        _, _, idx = _run_split(a)
        return pa.table({"a": _pa_col(a[idx]),
                         "b": _pa_col(df["b"].to_numpy()[idx]),
                         "ov": pa.array(df["ov"].to_numpy()[idx].astype(np.int64))})

    interior = srt.map_batches(block_capped, batch_format="pandas",
                               batch_size=None)
    # boundary runs: <= 2 per block, each already capped to <= cap rows
    # per (block, vertex) by cap_partial — O(blocks x cap) driver rows
    edge = (srt.map_batches(block_edge, batch_format="pandas",
                            batch_size=None).to_pandas())
    parts = [interior]
    if len(edge):
        ea = edge["a"].to_numpy()
        eb = edge["b"].to_numpy()
        eo = edge["ov"].to_numpy()
        order = np.lexsort((eb, ea))
        ka, kb, kov = _seg_cap(ea[order], eb[order], eo[order], cap)
        if len(ka):
            parts.append(rd.from_arrow(pa.table({
                "a": _pa_col(ka), "b": _pa_col(kb), "ov": pa.array(kov)})))
    capped = (parts[0].union(*parts[1:]) if len(parts) > 1
              else parts[0]).materialize()

    def vf(t: pa.Table) -> pa.Table:
        u = pd.DataFrame({"m": t["a"].to_numpy(zero_copy_only=False),
                          "ovm": t["ov"].to_numpy()}).drop_duplicates("m")
        # typed columns even on an EMPTY capped block (<=2-run input):
        # from_pandas would infer an empty object column as type null,
        # which fails schema unification in the join shuffle (the
        # pseudo_diameter lesson _pa_col exists for)
        return pa.table({"m": _pa_col(u["m"].to_numpy()),
                         "ovm": pa.array(u["ovm"].to_numpy()
                                         .astype(np.int64))})

    # truncated(a) = ov(a) OR any kept neighbor's ov — computed over the
    # capped pair stream (≤ cap rows per vertex), so every plan below
    # stays bounded regardless of hub degree.
    vfm = capped.map_batches(vf, batch_format="pyarrow").materialize()

    if vfm.size_bytes() <= flag_broadcast_bytes:
        # broadcast plan (the _attach_payload size-gate posture): ship
        # the per-vertex overflow map once via ray.put and compute each
        # vertex's max INSIDE its capped block. Runs are contiguous
        # within every block, but Ray slices oversized map outputs at
        # target_max_block_size, so a run CAN straddle two adjacent
        # blocks — each block therefore folds only its complete
        # interior runs and ships its (pre-maxed) first/last runs as
        # one boundary row each, merged driver-side: O(blocks) rows.
        pdf = vfm.to_pandas().drop_duplicates("m")
        mk = pdf["m"].to_numpy()
        if mk.dtype == object:
            mk = mk.astype("U")
        forder = np.argsort(mk, kind="stable")
        fref = ray.put((mk[forder], pdf["ovm"].to_numpy(np.int64)[forder]))

        def _row_flags(a, b, ov):
            keys, vals = ray.get(fref)
            bl = b.astype(keys.dtype) if keys.dtype.kind == "U" else b
            pos = np.searchsorted(keys, bl).clip(0, len(keys) - 1)
            if not (keys[pos] == bl).all():
                raise ValueError("capped neighbor missing from the vertex "
                                 "flag map — input not symmetric")
            return ov | vals[pos]

        def _fold_runs(a, tr):
            starts = np.flatnonzero(
                np.concatenate([[True], a[1:] != a[:-1]]))
            return a[starts], np.maximum.reduceat(tr, starts).astype(np.int64)

        def flags_interior(df: pd.DataFrame) -> pa.Table:
            a = df["a"].to_numpy()
            s, e, _ = _run_split(a)
            if e <= s:
                return pa.table({"a": _pa_col(a[:0]),
                                 "truncated": pa.array([], pa.int64())})
            tr = _row_flags(a[s:e], df["b"].to_numpy()[s:e],
                            df["ov"].to_numpy()[s:e])
            ka, mx = _fold_runs(a[s:e], tr)
            return pa.table({"a": _pa_col(ka), "truncated": pa.array(mx)})

        def flags_boundary(df: pd.DataFrame) -> pa.Table:
            a = df["a"].to_numpy()
            _, _, idx = _run_split(a)
            if not len(idx):
                return pa.table({"a": _pa_col(a[:0]),
                                 "truncated": pa.array([], pa.int64())})
            ab = a[idx]
            tr = _row_flags(ab, df["b"].to_numpy()[idx],
                            df["ov"].to_numpy()[idx])
            ka, mx = _fold_runs(ab, tr)  # pre-max: <= 2 rows ship per block
            return pa.table({"a": _pa_col(ka), "truncated": pa.array(mx)})

        interior_fl = capped.map_batches(flags_interior,
                                         batch_format="pandas",
                                         batch_size=None)
        bnd_fl = (capped.map_batches(flags_boundary, batch_format="pandas",
                                     batch_size=None).to_pandas())
        flag_parts = [interior_fl]
        if len(bnd_fl):
            g = (bnd_fl.groupby("a", sort=False)["truncated"].max()
                 .reset_index())
            flag_parts.append(rd.from_arrow(pa.table({
                "a": _pa_col(g["a"].to_numpy()),
                "truncated": pa.array(g["truncated"].to_numpy()
                                      .astype(np.int64))})))
        flags = (flag_parts[0].union(*flag_parts[1:])
                 if len(flag_parts) > 1 else flag_parts[0])
        sym2 = capped.map_batches(lambda t: t.select(["a", "b"]),
                                  batch_format="pyarrow")
        return sym2, flags

    # distributed fallback past the gate (vertex-scale flag map): hash
    # join the flags onto the pair stream, then the sorted-segment max.
    # _join_safe: block_capped legitimately emits EMPTY blocks (≤2-run
    # inputs), and Ray 2.49's join chokes on an empty leading block
    # (dedup.py repro)
    from ..stages.dedup import _join_safe

    j = _join_safe(capped, num_partitions).join(
        _join_safe(vfm, num_partitions), "inner", num_partitions,
        on=("b",), right_on=("m",))

    def orf(t: pa.Table) -> pa.Table:
        tr = t["ov"].to_numpy() | t["ovm"].to_numpy()
        return pa.table({"a": t["a"], "truncated": pa.array(tr)})

    # per-vertex max via sort + vectorized segment pass with O(blocks·cap)
    # boundary fix-up (the exact_dedup shape) — Ray's groupby().max folds
    # per ROW in Python and measured 7.8 s on this 572k-row string-keyed
    # stream vs ~1 s for the sort; every vertex has <= cap rows here, so
    # the first/last-run boundary shipment is tiny by construction
    fsrt = (j.map_batches(orf, batch_format="pyarrow")
            .sort("a").materialize())

    def fmax_interior(df: pd.DataFrame) -> pa.Table:
        a = df["a"].to_numpy()
        tr = df["truncated"].to_numpy()
        s, e, _ = _run_split(a)
        if e <= s:
            return pa.table({"a": _pa_col(a[:0]),
                             "truncated": pa.array(np.empty(0, np.int64))})
        aa, tt = a[s:e], tr[s:e]
        starts = np.flatnonzero(np.concatenate([[True], aa[1:] != aa[:-1]]))
        mx = np.maximum.reduceat(tt, starts)
        return pa.table({"a": _pa_col(aa[starts]),
                         "truncated": pa.array(mx.astype(np.int64))})

    def fmax_edge(df: pd.DataFrame) -> pa.Table:
        a = df["a"].to_numpy()
        tr = df["truncated"].to_numpy()
        _, _, idx = _run_split(a)
        return pa.table({"a": _pa_col(a[idx]),
                         "truncated": pa.array(tr[idx].astype(np.int64))})

    interior_f = fsrt.map_batches(fmax_interior, batch_format="pandas",
                                  batch_size=None)
    edge_f = (fsrt.map_batches(fmax_edge, batch_format="pandas",
                               batch_size=None).to_pandas())
    fparts = [interior_f]
    if len(edge_f):
        g = (edge_f.groupby("a", sort=False)["truncated"].max()
             .reset_index())
        g["truncated"] = g["truncated"].astype(np.int64)
        fparts.append(rd.from_arrow(pa.table({
            "a": _pa_col(g["a"].to_numpy()),
            "truncated": pa.array(g["truncated"].to_numpy())})))
    flags = fparts[0].union(*fparts[1:]) if len(fparts) > 1 else fparts[0]
    sym2 = capped.map_batches(lambda t: t.select(["a", "b"]),
                              batch_format="pyarrow")
    return sym2, flags


def two_hop_counts(edges: rd.Dataset, ids: rd.Dataset,
                   num_partitions: int = 8,
                   max_boundary_rows: int = 20_000_000,
                   cap: int | None = None,
                   flag_broadcast_bytes: int = 64 << 20) -> rd.Dataset:
    """Per-vertex 2-hop neighborhood size (friend-of-friend count, the
    classic feature-engineering primitive): distinct vertices within
    undirected distance <= 2, self excluded. Pure Ray-Data-native plan —
    no actor pool: one ``Dataset.join`` of the symmetrized edge set with
    itself fans out the 2-hop candidate pairs, then a sort on (a, c)
    makes duplicate pairs ADJACENT so the distinct-per-vertex count is
    a sorted-segment pass (complete vertex runs aggregate in their
    block; runs touching a block edge ship per-block DEDUPED partials,
    refused past ``max_boundary_rows`` — a mega-hub straddling a block
    edge is the same hazard copair_counts documents).

    ``edges``: directed (src, dst) mention rows (dups fine);
    ``ids``: one ``conv_id`` row per vertex (isolated vertices get 0).
    Returns Dataset(conv_id, n_two_hop). Scale note: the join fan-out
    is Σ deg² — inherent to the exact operator (the SQL self-join pays
    the same); for power-law graphs pass ``cap``.

    ``cap``: capped-exact mode for hub-heavy graphs. Every vertex's
    neighbor list is truncated to its ``cap`` SMALLEST distinct
    neighbors (deterministic, partitioning-invariant), both as source
    and as mid-hop, bounding the join fan-out at cap² per vertex; the
    result gains a ``truncated`` column, true iff the vertex's own
    degree exceeded the cap or any KEPT mid-neighbor's did — i.e.
    exactly the vertices whose ``n_two_hop`` is a lower bound of the
    uncapped count. Vertices with ``truncated == false`` carry the
    exact uncapped value."""

    def symx(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        a = np.concatenate([s[keep], d[keep]])
        b = np.concatenate([d[keep], s[keep]])
        u = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
        return pa.Table.from_pandas(u, preserve_index=False)

    sym = edges.map_batches(symx, batch_format="pyarrow").materialize()
    flags = None
    if cap is not None:
        sym, flags = _cap_adjacency(sym, cap, num_partitions,
                                    flag_broadcast_bytes)

    def ren(t: pa.Table) -> pa.Table:
        return pa.table({"m": t["a"], "c": t["b"]})

    # _join_safe both inputs: in capped mode _cap_adjacency's
    # block_capped legitimately emits empty blocks (a <=2-run block is
    # all boundary), and a lexicographically-first mega-hub can make
    # the leading block empty (identity under ray_join_patch; the
    # legacy-fallback guard is what matters here)
    from ..stages.dedup import _join_safe

    two = _join_safe(sym, num_partitions).join(
        _join_safe(sym.map_batches(ren, batch_format="pyarrow"),
                   num_partitions),
        "inner", num_partitions, on=("b",), right_on=("m",))

    def hop2_pairs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        keep = a != c
        u = pd.DataFrame({"a": a[keep], "c": c[keep]}).drop_duplicates()
        return pa.Table.from_pandas(u, preserve_index=False)

    def hop1_pairs(t: pa.Table) -> pa.Table:
        return pa.table({"a": t["a"], "c": t["b"]})

    pairs = (two.map_batches(hop2_pairs, batch_format="pyarrow")
             .union(sym.map_batches(hop1_pairs, batch_format="pyarrow")))
    srt = pairs.sort(["a", "c"]).materialize()

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy()
        c = df["c"].to_numpy()
        abrk = np.flatnonzero(np.concatenate([[True], a[1:] != a[:-1]]))
        if len(abrk) <= 1:  # single vertex run: all boundary
            return pd.DataFrame({"a": a[:0], "n": np.empty(0, np.int64)})
        s, e = int(abrk[1]), int(abrk[-1])
        if e <= s:  # exactly two runs: no interior segment
            return pd.DataFrame({"a": a[:0], "n": np.empty(0, np.int64)})
        aa, cc = a[s:e], c[s:e]
        newp = np.concatenate([[True], (aa[1:] != aa[:-1]) | (cc[1:] != cc[:-1])])
        runs = np.flatnonzero(np.concatenate([[True], aa[1:] != aa[:-1]]))
        tot = np.cumsum(newp)
        ends = np.concatenate([runs[1:], [len(aa)]])
        n = tot[ends - 1] - np.concatenate([[0], tot[ends[:-1] - 1]])
        return pd.DataFrame({"a": aa[runs], "n": n.astype(np.int64)})

    def block_boundary(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy()
        c = df["c"].to_numpy()
        abrk = np.flatnonzero(np.concatenate([[True], a[1:] != a[:-1]]))
        if len(abrk) <= 1:
            idx = np.arange(len(a))
        else:
            idx = np.concatenate([np.arange(abrk[1]),
                                  np.arange(abrk[-1], len(a))])
        u = pd.DataFrame({"a": a[idx], "c": c[idx]}).drop_duplicates()
        return u

    complete = srt.map_batches(block_counts, batch_format="pandas", batch_size=None)
    bnd_ds = (srt.map_batches(block_boundary, batch_format="pandas", batch_size=None)
              .materialize())
    # refuse on the DISTRIBUTED count BEFORE any driver materialization —
    # the guard must fire before the memory hazard it protects against
    n_bnd = bnd_ds.count()
    if n_bnd > max_boundary_rows:
        raise ValueError(
            f"two_hop_counts: {n_bnd} boundary pair rows exceed "
            f"max_boundary_rows={max_boundary_rows}; a mega-hub's 2-hop set "
            "straddles a block edge — cap hub degree upstream")
    bnd = bnd_ds.to_pandas()
    parts = [complete]
    if len(bnd):
        g = (bnd.drop_duplicates(["a", "c"]).groupby("a").size()
             .reset_index(name="n"))
        g["n"] = g["n"].astype(np.int64)
        parts.append(rd.from_pandas(g))
    counts = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    # counts is one row per vertex: an a-run is contiguous after the
    # global sort, so it lands either wholly in a block's interior
    # (complete) or wholly in boundary partials — never both. The
    # left_outer join below relies on this uniqueness (two rows for one
    # vertex would duplicate output rows, not sum).
    joined = ids.join(
        counts.map_batches(lambda t: t.rename_columns(["conv_id", "n"]),
                           batch_format="pyarrow"),
        "left_outer", num_partitions, on=("conv_id",)
    )
    if flags is not None:
        from ..stages.dedup import _join_safe

        # barrier between the two joins: one aggregator pool at a time
        # (see _cap_adjacency's materialize note); _join_safe also
        # covers empty leading blocks in either join input
        joined = _join_safe(joined, num_partitions).join(
            _join_safe(
                flags.map_batches(
                    lambda t: t.rename_columns(["conv_id", "truncated"]),
                    batch_format="pyarrow"),
                num_partitions),
            "left_outer", num_partitions, on=("conv_id",)
        )

    def fin(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = pc.coalesce(t["n"], pa.scalar(0, pa.int64()))
        cols = {"conv_id": t["conv_id"], "n_two_hop": n}
        if "truncated" in t.column_names:
            cols["truncated"] = pc.coalesce(t["truncated"],
                                            pa.scalar(0, pa.int64()))
        return pa.table(cols)

    return joined.map_batches(fin, batch_format="pyarrow")


def label_propagation_incremental(ctx: GraphContext, max_iterations: int = 10,
                                  mode: str = "auto") -> rd.Dataset:
    """Warm LP restart after a batch update — the LP analogue of the
    engine's dynamic PageRank variants. Keeps each shard's installed
    labels from the prior converged :func:`label_propagation` run and
    executes up to ``max_iterations`` further synchronous rounds over
    the UPDATED undirected view.

    Unlike incremental CC (where warm min-label merging provably equals
    a cold recompute for insertions), warm LP is a protocol of its own:
    label propagation is not confluent, so the result is defined by the
    exact two-phase schedule (cold rounds on the base graph, then warm
    rounds on the updated graph) — which is what the SQL oracle replays
    phase by phase. Shards refuse if non-LP labels are installed."""
    _ensure_symmetric(ctx)
    shards = ctx.shards
    if _label_mode(mode) == "p2p":
        get_all_fail_fast([
            s.run_label_iterations.remote(shards, "lp", max_iterations, warm=True)
            for s in shards
        ])
    else:
        ray.get([s.lp_assert_warm.remote() for s in shards])
        _driver_label_fixpoint(shards, "lp_emit", "lp_apply", max_iterations,
                               post_round="lp_swap")
    tables = ray.get([s.labels_table.remote("label") for s in shards])
    return _with_conv(ctx, tables)


def connected_components(ctx: GraphContext, max_rounds: int = 10_000,
                         mode: str = "auto") -> rd.Dataset:
    """Weakly-connected components as min-vid labels.

    Frontier-optimized min-label propagation: each round, vertices whose
    label shrank push it to their undirected neighbors (per-shard
    min-combined before the exchange); fixpoint when the global changed
    count tree-reduces to zero — the same convergence pattern as the
    reference's DT mark fixpoint (/root/reference/inc/pagerankCuda.hxx:
    439-456), here replacing its level-synchronous BFS substrate
    (/root/reference/inc/bfs.hxx:22-55).

    ``mode="p2p"`` runs the whole fixpoint inside the actor pool (one
    driver dispatch per shard, peers exchange slices directly — the
    multi-node path); ``mode="driver"`` coordinates every round from
    the client. ``"auto"`` picks by cluster node count (see
    :func:`_label_mode`). Bit-identical results.

    Returns a Dataset (vid:int64, component:int64[, conv_id]).
    """
    _ensure_symmetric(ctx)
    shards = ctx.shards
    if _label_mode(mode) == "p2p":
        get_all_fail_fast([
            s.run_label_iterations.remote(shards, "cc", max_rounds) for s in shards
        ])
    else:
        ray.get([s.cc_init.remote() for s in shards])
        _driver_label_fixpoint(shards, "cc_push", "cc_apply", max_rounds)
    tables = ray.get([s.labels_table.remote("component") for s in shards])
    return _with_conv(ctx, tables)


def label_propagation(ctx: GraphContext, max_iterations: int = 10,
                      mode: str = "auto") -> rd.Dataset:
    """Synchronous label propagation (community detection).

    Init label = vid; each round every vertex adopts the most frequent
    label among its undirected neighbors, ties broken toward the lowest
    label; all updates install simultaneously (sync barrier), stopping at
    ``max_iterations`` or when no label changes. Deterministic by
    construction. The grouped-count substrate mirrors communitySize /
    communityVertices (/root/reference/inc/properties.hxx:262-364).

    ``mode="p2p"`` runs the loop inside the actor pool; the sync
    barrier is the changed-count allreduce, and each shard installs
    its next labels locally after its apply (emit only ever reads the
    shard's OWN labels, so local install preserves the synchronous
    dataflow exactly). ``mode="driver"``: per-round driver barriers.
    ``"auto"``: by cluster node count (see :func:`_label_mode`).
    """
    _ensure_symmetric(ctx)
    shards = ctx.shards
    if _label_mode(mode) == "p2p":
        get_all_fail_fast([
            s.run_label_iterations.remote(shards, "lp", max_iterations)
            for s in shards
        ])
    else:
        ray.get([s.lp_init.remote() for s in shards])
        _driver_label_fixpoint(shards, "lp_emit", "lp_apply", max_iterations,
                               post_round="lp_swap")
    tables = ray.get([s.labels_table.remote("label") for s in shards])
    return _with_conv(ctx, tables)


def triangle_count(ctx: GraphContext, max_wedges: int = 4_000_000) -> tuple[int, rd.Dataset]:
    """Exact triangle counting via degree-ordered orientation + wedge checks.

    1. symmetrize; fetch neighbor degrees (one exchange) and orient every
       undirected edge from lower (degree, vid) rank to higher — the
       standard skew bound: a hub's wedges are generated at its low-rank
       neighbors, so per-vertex wedge work is O(oriented-degree²) with
       oriented degree O(sqrt(M)) — the engine's analogue of the
       reference's degree-split hub handling (pagerankCuda.hxx:470-481).
    2. each apex emits rank-ordered wedge pairs (lo, hi); owner(lo)
       answers membership hi ∈ N>(lo) with a vectorized segmented binary
       search (the distributed form of the reference's sorted-adjacency
       ``hasEdge`` check, /root/reference/inc/_bitset.hxx:165-194).
    3. corner credits: lo at the answering shard, apex/hi routed back —
       per-vertex counts sum to 3 × the global count.

    Returns (global_count, Dataset(vid, triangles[, conv_id])).
    """
    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    need_refs = [s.tri_needed_neighbors.options(num_returns=P + 1).remote() for s in shards]
    deg_refs = [
        [shards[q].degrees_for.remote(need_refs[p][1 + q]) for q in range(P)]
        for p in range(P)
    ]
    ray.get([shards[p].tri_orient.remote(*deg_refs[p]) for p in range(P)])
    nchunks = max(ray.get([s.tri_plan_chunks.remote(max_wedges) for s in shards]))
    ray.get([s.tri_reset_counts.remote() for s in shards])
    total = 0
    # chunked wedge rounds: each round materializes a bounded number of
    # wedge pairs per shard (tri_plan_chunks), so peak memory stays flat
    # regardless of Σ deg_ori² — shards past their last chunk emit empty
    for k in range(nchunks):
        wedge_refs = [
            s.tri_wedges_chunk.options(num_returns=P + 1).remote(k) for s in shards
        ]
        answers = ray.get([
            shards[q].tri_answer.remote(*[wedge_refs[p][1 + q] for p in range(P)])
            for q in range(P)
        ])
        total += sum(a[0] for a in answers)
        # route apex/hi corner credits to their owners
        credits = np.concatenate(
            [np.concatenate([a[1], a[2]]) for a in answers]
        ) if answers else np.empty(0, np.int64)
        owners = credits % P
        order = np.argsort(owners, kind="stable")
        credits, owners = credits[order], owners[order]
        cuts = np.searchsorted(owners, np.arange(P + 1))
        ray.get([
            shards[p].tri_accumulate.remote(credits[cuts[p]:cuts[p + 1]] // P)
            for p in range(P)
        ])
    tables = ray.get([s.tri_counts_table.remote() for s in shards])
    return int(total), _with_conv(ctx, tables)


def clustering_coefficient(ctx: GraphContext, scale: int = 1_000_000,
                           max_wedges: int = 4_000_000) -> rd.Dataset:
    """Per-vertex local clustering coefficient as exact scaled integers
    (2·tri·scale) // (d·(d−1)): runs the oriented triangle machinery
    (which leaves per-vertex corner credits resident on the shards),
    then each shard pairs its credits with its own symmetric degrees —
    zero extra exchange. Returns Dataset(vid, triangles, cc_e6[, conv_id])."""
    triangle_count(ctx, max_wedges)  # settles _tri_counts shard-side
    tables = ray.get([s.tri_cc_table.remote(scale) for s in ctx.shards])
    return _with_conv(ctx, tables)


def _route_by_owner(ctx: GraphContext, key_vids: np.ndarray):
    """Owner grouping of driver-held vids: returns (order, cuts) such
    that order[cuts[p]:cuts[p+1]] indexes owner p's slice."""
    from ..state import kernels as K

    return K.owner_split(key_vids, ctx.P)


def _sym_member_mask(ctx: GraphContext, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distributed undirected-membership test for (a, b) vid pairs,
    routed to owner(a); returns a bool mask aligned with the input."""
    order, cuts = _route_by_owner(ctx, a)
    refs = {}
    for p in range(ctx.P):
        seg = order[cuts[p]:cuts[p + 1]]
        if len(seg):
            refs[p] = ctx.shards[p].sym_member.remote(np.stack([a[seg], b[seg]]))
    mask = np.zeros(len(a), dtype=bool)
    for p, ref in refs.items():
        mask[order[cuts[p]:cuts[p + 1]]] = ray.get(ref)
    return mask


def _sym_degrees(ctx: GraphContext, v: np.ndarray) -> np.ndarray:
    """Symmetric-view degrees of driver-held vids (one routed exchange)."""
    order, cuts = _route_by_owner(ctx, v)
    refs = {}
    for p in range(ctx.P):
        seg = order[cuts[p]:cuts[p + 1]]
        if len(seg):
            refs[p] = ctx.shards[p].degrees_for.remote(v[seg] // ctx.P)
    deg = np.zeros(len(v), dtype=np.int64)
    for p, ref in refs.items():
        deg[order[cuts[p]:cuts[p + 1]]] = ray.get(ref)
    return deg


def _batch_local_terms(a: np.ndarray, b: np.ndarray, n: int) -> tuple[int, np.ndarray, np.ndarray]:
    """Triangles/wedges entirely inside the batch's own (tiny) edge set.

    Returns (t3, wedge_lo, wedge_hi): t3 = triangles whose three edges
    are all new; (wedge_lo, wedge_hi) = for every wedge formed by two
    new edges sharing a vertex, the normalized third pair to test
    against the OLD graph (each exactly-2-new triangle has exactly one
    such apex, so membership hits count it once). Pure numpy over the
    batch arrays — batches ride the driver as (2, k) arrays throughout
    the engine's update protocol (api.build_graph, tidy/apply), so this
    term lives where the batch lives."""
    # batch adjacency via both directions sorted by source
    s = np.concatenate([a, b])
    t = np.concatenate([b, a])
    order = np.lexsort((t, s))
    s, t = s[order], t[order]
    # wedges at each apex: pairs of distinct neighbors (j1 < j2)
    uniq, counts = np.unique(s, return_counts=True)
    lo_list, hi_list = [], []
    offs = np.concatenate([[0], np.cumsum(counts)])
    for i in range(len(uniq)):
        nb = t[offs[i]:offs[i + 1]]
        if len(nb) < 2:
            continue
        iu, ju = np.triu_indices(len(nb), k=1)
        x, y = nb[iu], nb[ju]
        lo_list.append(np.minimum(x, y))
        hi_list.append(np.maximum(x, y))
    if lo_list:
        wlo = np.concatenate(lo_list)
        whi = np.concatenate(hi_list)
    else:
        wlo = whi = np.empty(0, dtype=np.int64)
    # t3: wedge third-pair ∈ batch edge set; each all-new triangle has
    # 3 apexes, so it closes 3 wedges — divide by 3
    keys = np.sort(a * np.int64(n) + b)
    wkeys = wlo * np.int64(n) + whi
    pos = np.searchsorted(keys, wkeys)
    inbatch = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == wkeys)
    t3 = int(inbatch.sum()) // 3
    return t3, wlo[~inbatch], whi[~inbatch]


def triangle_count_incremental(
    ctx: GraphContext, insertions: np.ndarray, total_before: int
) -> int:
    """Delta triangle counting for an insertion batch — the dynamic-
    batch analogue (reference batch.hxx insertion protocol) of
    ``triangle_count``. Call BEFORE ``ctx.apply_batch``; returns the
    exact post-batch global count without re-scanning the graph.

    New triangles are partitioned by how many batch edges they contain,
    each counted exactly once (batch edges are first reduced to
    undirected pairs NOT already present, so the three classes are
    disjoint):
      T1 (one new edge): for each new edge, common OLD neighbors of its
         endpoints — wedge queries emitted at the lower-degree endpoint
         (work ∝ Σ min-deg, the standard intersection bound) and
         answered by owner(lo) against the symmetric CSR;
      T2 (two new edges): batch wedges whose third pair is an OLD edge
         (one distributed membership round);
      T3 (three new edges): closed entirely within the batch (local).
    """
    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    ins = np.asarray(insertions).reshape(2, -1).astype(np.int64)
    lo = np.minimum(ins[0], ins[1])
    hi = np.maximum(ins[0], ins[1])
    keep = lo != hi  # self-loops never form triangles
    ab = np.unique(lo[keep] * np.int64(ctx.N) + hi[keep])
    a, b = ab // ctx.N, ab % ctx.N
    if not len(a):
        return int(total_before)
    # only genuinely-new undirected pairs change the count
    fresh = ~_sym_member_mask(ctx, a, b)
    a, b = a[fresh], b[fresh]
    if not len(a):
        return int(total_before)
    t3, wlo, whi = _batch_local_terms(a, b, ctx.N)
    t2 = int(_sym_member_mask(ctx, wlo, whi).sum()) if len(wlo) else 0
    # T1: emit wedge queries from the lower-(degree, vid) endpoint
    dega = _sym_degrees(ctx, a)
    degb = _sym_degrees(ctx, b)
    b_first = (degb < dega) | ((degb == dega) & (b < a))
    src = np.where(b_first, b, a)
    oth = np.where(b_first, a, b)
    order, cuts = _route_by_owner(ctx, src)
    wq = {}
    for p in range(P):
        seg = order[cuts[p]:cuts[p + 1]]
        if len(seg):
            wq[p] = shards[p].pair_wedge_queries.options(num_returns=P + 1).remote(
                np.stack([src[seg], oth[seg]])
            )
    t1 = 0
    if wq:
        answers = [
            shards[q].sym_answer_count.remote(*[wq[p][1 + q] for p in wq])
            for q in range(P)
        ]
        t1 = int(sum(ray.get(answers)))
    return int(total_before) + t1 + t2 + t3


def bfs_distances(ctx: GraphContext, source_vid: int, max_rounds: int = 100_000,
                  mode: str = "auto") -> rd.Dataset:
    """Level-synchronous BFS hop distances from a source on the undirected
    view — the reference's frontier BFS (/root/reference/inc/bfs.hxx:22-55)
    as bulk-synchronous expansion rounds over the shard pool. Unreached
    vertices get distance -1. ``mode="p2p"`` runs the level loop inside
    the pool (multi-node path); ``mode="driver"`` coordinates each level
    from the client; ``"auto"`` picks by cluster node count.
    Returns Dataset(vid, distance[, conv_id])."""
    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    if _label_mode(mode) == "p2p":
        get_all_fail_fast([
            s.run_label_iterations.remote(shards, "bfs", max_rounds, source_vid)
            for s in shards
        ])
    else:
        frontier = ray.get([s.bfs_init.remote(source_vid) for s in shards])
        level = 0
        while any(f.size for f in frontier) and level < max_rounds:
            level += 1
            refs = [
                shards[p].expand_sym_neighbors.options(num_returns=P + 1).remote(frontier[p])
                for p in range(P)
            ]
            frontier = ray.get([
                shards[p].bfs_apply.remote(level, *[refs[q][1 + p] for q in range(P)])
                for p in range(P)
            ])
    tables = ray.get([s.dist_table.remote() for s in shards])
    return _with_conv(ctx, tables)


def pseudo_diameter(ctx: GraphContext, max_rounds: int = 100_000) -> "pa.Table":
    """Double-sweep BFS pseudo-diameter (the classic lower bound that is
    exact on trees and near-exact on small-world graphs): BFS from the
    lexicographic-min vertex, re-BFS from its farthest reached vertex
    (ties toward the smaller conv_id), report that eccentricity. Two
    :func:`bfs_distances` sweeps; the argmax folds as ONE candidate row
    per block on the driver — O(blocks), never the vertex table.
    Returns a 1-row table (far_conv, pseudo_diameter)."""
    import pyarrow as pa

    def far_partial(t: pa.Table) -> pa.Table:
        # tie-break key = conv_id when the context carries a dictionary,
        # else the vid itself (dictionaryless test graphs)
        d = t["distance"].to_numpy()
        ok = d >= 0
        if not ok.any():
            # keep the 4-column schema identical to the reached branch so
            # wholly-unreached blocks never break schema unification
            return pa.table({"vid": pa.array([], pa.int64()),
                             "distance": pa.array([], pa.int64()),
                             "key": pa.array([], pa.string()),
                             "disp": pa.array([], pa.string())})
        dd = d[ok]
        m = dd.max()
        sel = np.flatnonzero(ok)[dd == m]
        # dictionaryless graphs tie-break on the NUMERIC vid (zero-padded
        # so the driver's string sort preserves numeric order; a bare
        # str(vid) would pick 10 over 9)
        has_conv = "conv_id" in t.column_names
        keys = (t["conv_id"].to_pylist() if has_conv
                else [f"{v:020d}" for v in t["vid"].to_pylist()])
        j = min(sel, key=lambda i: keys[i])
        return pa.table({"vid": pa.array([int(t["vid"][j].as_py())]),
                         "distance": pa.array([int(m)]),
                         "key": pa.array([keys[j]]),
                         "disp": pa.array([t["conv_id"][j].as_py() if has_conv
                                           else str(t["vid"][j].as_py())])})

    d1 = bfs_distances(ctx, 0, max_rounds)
    cand = d1.map_batches(far_partial, batch_format="pyarrow").to_pandas()
    best = cand.sort_values(["distance", "key"],
                            ascending=[False, True]).iloc[0]
    d2 = bfs_distances(ctx, int(best["vid"]), max_rounds)
    diam = int(d2.max("distance"))
    return pa.table({"far_conv": pa.array([best["disp"]]),
                     "pseudo_diameter": pa.array([diam], pa.int64())})


def core_numbers(ctx: GraphContext) -> rd.Dataset:
    """k-core decomposition of the undirected view by parallel peeling:
    watermark k = max(k, global min alive degree); every alive vertex
    with deg <= k is removed at core number k, decrements cascade at the
    same watermark until stable, then the watermark advances. Bulk
    simultaneous removal yields the same (schedule-invariant) core
    numbers as the sequential min-degree peel. Isolated vertices get
    core 0. Driver-coordinated rounds (one emit + one apply exchange per
    cascade wave — round count is the peel depth, tens not thousands, so
    the in-pool p2p loop that PageRank/CC use is not worth a third
    collective here). Returns Dataset(vid, core[, conv_id])."""
    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    ray.get([s.core_init.remote() for s in shards])
    k = 0
    while True:
        mins = [m for m in ray.get([s.core_min_alive_deg.remote() for s in shards]) if m >= 0]
        if not mins:
            break
        k = max(k, min(mins))
        frontier = ray.get([s.core_peel.remote(k) for s in shards])
        while any(f.size for f in frontier):
            refs = [
                shards[p].core_emit.options(num_returns=P + 1).remote(frontier[p])
                for p in range(P)
            ]
            frontier = ray.get([
                shards[p].core_apply.remote(k, *[refs[q][1 + p] for q in range(P)])
                for p in range(P)
            ])
    tables = ray.get([s.core_table.remote() for s in shards])
    return _with_conv(ctx, tables)


def neighborhood_jaccard(
    ctx: GraphContext,
    min_common: int = 2,
    top: int = 100,
    max_pairs: int = 4_000_000,
) -> rd.Dataset:
    """Link-prediction scores: top pairs by neighborhood Jaccard
    |N(a)∩N(b)| / |N(a)∪N(b)| over the undirected view. Common-neighbor
    counts come from chunked per-apex wedge emission (partial-combined
    per shard chunk) into a (lo, hi) groupby — the shuffle carries
    combiner-reduced wedge pairs, never raw wedges; degrees ride a
    broadcast lookup. Scores are exact integers (c·10^6) // (da+db-c),
    so ordering and the top cut are integer-deterministic. Returns
    Dataset(a, b, common, jaccard_e6) sorted by (score desc, a, b).

    Combine path: wedge partials route by owner(lo) and fold into a
    shard-resident sorted merge (a Ray Data groupby over millions of
    2-row pair groups measured 20+ s of fixed shuffle overhead at
    sf0.01 and was replaced, same call as minhash_dedup's); degrees of
    remote hi endpoints arrive via one needed-neighbor exchange; each
    shard emits only its local top rows and the driver merges P·top."""
    import numpy as np
    import pyarrow as pa

    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    nch = max(ray.get([s.jac_plan_chunks.remote(max_pairs) for s in shards]))
    ray.get([s.jac_reset.remote() for s in shards])
    for k in range(nch):
        refs = [
            shards[p].jac_pairs_chunk_routed.options(num_returns=P + 1).remote(k)
            for p in range(P)
        ]
        ray.get([
            shards[p].jac_accept.remote(*[refs[q][1 + p] for q in range(P)])
            for p in range(P)
        ])
    need_refs = [s.jac_hi_needs.options(num_returns=P + 1).remote() for s in shards]
    deg_refs = [
        [shards[q].degs_for.remote(need_refs[p][1 + q]) for q in range(P)]
        for p in range(P)
    ]
    tops = ray.get([
        shards[p].jac_topk.remote(min_common, top, *deg_refs[p]) for p in range(P)
    ])
    merged = pa.concat_tables(tops)
    score = merged["jaccard_e6"].to_numpy()
    sel = np.lexsort((merged["b"].to_numpy(), merged["a"].to_numpy(), -score))[:top]
    return tables_dataset([merged.take(pa.array(np.sort(sel))).sort_by(
        [("jaccard_e6", "descending"), ("a", "ascending"), ("b", "ascending")]
    )])


RA_SCALE = 1_000_000_000


def resource_allocation(ctx: GraphContext, top: int = 100,
                        max_pairs: int = 4_000_000,
                        scale: int = RA_SCALE) -> rd.Dataset:
    """Link-prediction by the resource-allocation index: for each
    vertex pair, Σ over common neighbors z of ``scale // deg(z)`` —
    exact integers, so ordering and the top cut are deterministic and
    SQL-replayable (Adamic-Adar's 1/log d is irrational; RA is its
    integer-honest sibling with the same hub-discounting intent).

    Rides the same chunked per-apex wedge combine as
    ``neighborhood_jaccard`` — the only difference is each wedge
    carries weight scale // deg(apex) folded shard-side (jac_reset
    ra_scale) — and skips the degree exchange entirely since the apex
    degree is already folded in. Returns Dataset(a, b, ra_e9) sorted by
    (score desc, a, b), top rows only (driver merges P·top)."""
    import pyarrow as pa

    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    nch = max(ray.get([s.jac_plan_chunks.remote(max_pairs) for s in shards]))
    ray.get([s.jac_reset.remote(scale) for s in shards])
    for k in range(nch):
        refs = [
            shards[p].jac_pairs_chunk_routed.options(num_returns=P + 1).remote(k)
            for p in range(P)
        ]
        ray.get([
            shards[p].jac_accept.remote(*[refs[q][1 + p] for q in range(P)])
            for p in range(P)
        ])
    tops = ray.get([s.ra_topk.remote(top) for s in shards])
    merged = pa.concat_tables(tops)
    score = merged["ra_e9"].to_numpy()
    sel = np.lexsort((merged["b"].to_numpy(), merged["a"].to_numpy(), -score))[:top]
    return tables_dataset([merged.take(pa.array(np.sort(sel))).sort_by(
        [("ra_e9", "descending"), ("a", "ascending"), ("b", "ascending")]
    )])


def _run_wedge_combine(ctx: GraphContext, scale: int = 0, mode: str = "ra",
                       max_pairs: int = 4_000_000) -> None:
    """Run the chunked per-apex wedge emission + owner(lo)-routed
    sorted-merge fold shared by the whole link-prediction family
    (jaccard / RA / AA / common-neighbors / edge support). Leaves the
    combined (pair -> weight) state shard-resident."""
    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    nch = max(ray.get([s.jac_plan_chunks.remote(max_pairs) for s in shards]))
    ray.get([s.jac_reset.remote(scale, mode) for s in shards])
    for k in range(nch):
        refs = [
            shards[p].jac_pairs_chunk_routed.options(num_returns=P + 1).remote(k)
            for p in range(P)
        ]
        ray.get([
            shards[p].jac_accept.remote(*[refs[q][1 + p] for q in range(P)])
            for p in range(P)
        ])


def _pair_topk_merge(ctx: GraphContext, top: int, col: str) -> rd.Dataset:
    """Merge per-shard local-top tables into the global (score desc, a,
    b) top cut — P·top rows driver-side, never the pair set."""
    import pyarrow as pa

    tops = ray.get([s.ra_topk.remote(top, col) for s in ctx.shards])
    merged = pa.concat_tables(tops)
    score = merged[col].to_numpy()
    sel = np.lexsort((merged["b"].to_numpy(), merged["a"].to_numpy(), -score))[:top]
    return tables_dataset([merged.take(pa.array(np.sort(sel))).sort_by(
        [(col, "descending"), ("a", "ascending"), ("b", "ascending")]
    )])


def common_neighbors(ctx: GraphContext, top: int = 100,
                     max_pairs: int = 4_000_000) -> rd.Dataset:
    """Link prediction by raw common-neighbor count — the unweighted
    member of the wedge family (weight 1 per apex). Returns
    Dataset(a, b, common), top rows by (common desc, a, b)."""
    _run_wedge_combine(ctx, 0, "ra", max_pairs)
    return _pair_topk_merge(ctx, top, "common")


AA_SCALE = 1_000_000_000


def adamic_adar(ctx: GraphContext, top: int = 100,
                max_pairs: int = 4_000_000, scale: int = AA_SCALE) -> rd.Dataset:
    """Link prediction by the Adamic-Adar index in its integer-honest
    log2-floor form: Σ over common neighbors z of
    ``scale // floor(log2(deg(z)))`` (deg(z) >= 2 for any wedge apex, so
    the divisor is >= 1). Same hub-discounting intent as 1/ln(deg) with
    exact-int scores a SQL oracle replays bit-for-bit. Returns
    Dataset(a, b, aa_e9), top rows by (score desc, a, b)."""
    _run_wedge_combine(ctx, scale, "aa_log2", max_pairs)
    return _pair_topk_merge(ctx, top, "aa_e9")


def edge_triangle_support(ctx: GraphContext,
                          max_pairs: int = 4_000_000) -> rd.Dataset:
    """Per-edge triangle support |N(a)∩N(b)| for every undirected edge
    (a < b) — the static heart of k-truss. Reuses the link-prediction
    wedge combine (chunked per-apex emission, owner(lo)-routed
    sorted-merge fold), then each shard looks its OWN edges up in the
    combined counts (edges in no triangle get 0) — no extra exchange.
    Identity: Σ support = 3·triangles. Returns Dataset(a, b, support)."""
    import numpy as np

    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    nch = max(ray.get([s.jac_plan_chunks.remote(max_pairs) for s in shards]))
    ray.get([s.jac_reset.remote() for s in shards])
    for k in range(nch):
        refs = [
            shards[p].jac_pairs_chunk_routed.options(num_returns=P + 1).remote(k)
            for p in range(P)
        ]
        ray.get([
            shards[p].jac_accept.remote(*[refs[q][1 + p] for q in range(P)])
            for p in range(P)
        ])
    tables = ray.get([s.edge_support_table.remote() for s in shards])
    return tables_dataset(tables)


_TRUSS_EDGE_TAG = np.int64(1) << 40  # > any wedge count; marks "edge exists"


def _wedge_pairs(nbrs: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                 N: int) -> np.ndarray:
    """Encoded (p<q) neighbor-pair keys for each center segment.
    Neighbors within one center are distinct (simple a<b edge set), so
    the emission is exact — no cap, unlike the LSH ``_segment_pairs``."""
    out: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        if e - s >= 2:
            nb = np.sort(nbrs[s:e])
            iu, ju = np.triu_indices(len(nb), k=1)
            out.append(nb[iu] * np.int64(N) + nb[ju])
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(out)


def _truss_round(E: rd.Dataset, N: int, P: int, k: int) -> rd.Dataset:
    """One k-truss peel round over an edge Dataset (a < b): recompute
    per-edge support WITHIN the surviving subgraph and keep support
    >= k-2. Pure Ray Data, and deliberately JOIN-FREE: Ray 2.49's hash
    join crashes on hash partitions that receive zero blocks (empty
    schema on one acero side), which sparse survivor sets hit readily.

    Shape: sort directed copies by the wedge center, emit neighbor-pair
    counts per in-block segment (the ``bucket_pairs`` sorted-segment
    pattern from stages/dedup.py), fix up the <=2 boundary segments per
    block driver-side, then one groupby("key") SUM where every real
    edge also contributes a sentinel _TRUSS_EDGE_TAG — an edge survives
    iff its key sums to >= TAG + (k-2), i.e. the semi-join is a sum.
    Driver-side state is O(blocks x straddle width); survivor sets
    shrink monotonically, so later rounds run on small inputs."""
    import pyarrow as pa

    def dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"c": pa.array(np.concatenate([a, b])),
                         "n": pa.array(np.concatenate([b, a]))})

    srt = E.map_batches(dirs, batch_format="pyarrow").sort("c").materialize()

    def block_wedges(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        nn = t["n"].to_numpy(zero_copy_only=False)
        if len(c) == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        bounds = np.flatnonzero(np.diff(c)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(c)]])
        # first/last segment may continue in a neighboring block — the
        # boundary pass owns those
        key = _wedge_pairs(nn, starts[1:-1], ends[1:-1], N)
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    def block_boundaries(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch["c"].to_numpy()
        nn = batch["n"].to_numpy()
        empty = pd.DataFrame({"c": np.empty(0, np.int64),
                              "n": np.empty(0, np.int64)})
        if len(c) == 0:
            return empty
        bounds = np.flatnonzero(np.diff(c)) + 1
        if len(bounds) == 0:  # single segment: emit ONCE (it is both
            return pd.DataFrame({"c": c, "n": nn})  # first and last)
        sel = np.concatenate([np.arange(0, bounds[0]),
                              np.arange(bounds[-1], len(c))])
        return pd.DataFrame({"c": c[sel], "n": nn[sel]})

    wedge_counts = srt.map_batches(block_wedges, batch_format="pyarrow",
                                   batch_size=None)
    bnd = srt.map_batches(block_boundaries, batch_format="pandas",
                          batch_size=None).to_pandas()
    extras = []
    if len(bnd):
        bnd = bnd.sort_values(["c", "n"])
        c = bnd["c"].to_numpy()
        nn = bnd["n"].to_numpy()
        bounds = np.flatnonzero(np.diff(c)) + 1
        key = _wedge_pairs(nn, np.concatenate([[0], bounds]),
                           np.concatenate([bounds, [len(c)]]), N)
        if len(key):
            u, cnt = np.unique(key, return_counts=True)
            extras.append(pa.table({"key": pa.array(u),
                                    "cnt": pa.array(cnt.astype(np.int64))}))

    def edge_rows(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"key": pa.array(a * np.int64(N) + b),
                         "cnt": pa.array(np.full(len(a), _TRUSS_EDGE_TAG))})

    tagged = wedge_counts.union(E.map_batches(edge_rows, batch_format="pyarrow"))
    if extras:
        tagged = tagged.union(tables_dataset(extras))
    summed = tagged.groupby("key").sum("cnt")

    def decode(t: pa.Table) -> pa.Table:
        if "key" not in t.column_names:  # typed-empty aggregate block
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        key = t["key"].to_numpy(zero_copy_only=False)
        tot = t["sum(cnt)"].to_numpy(zero_copy_only=False)
        keep = key[tot >= _TRUSS_EDGE_TAG + (k - 2)]
        return pa.table({"a": pa.array(keep // N), "b": pa.array(keep % N)})

    return summed.map_batches(decode, batch_format="pyarrow")


def ktruss_edges(ctx: GraphContext, k: int = 4, rounds: int = 8) -> rd.Dataset:
    """k-truss subgraph: the surviving undirected edges after iterated
    support peeling (every kept edge closes >= k-2 triangles among kept
    edges). Round 1 rides the shard-resident wedge combine
    (edge_triangle_support); later rounds recompute support over the
    shrinking survivor Dataset with pure Ray Data joins (_truss_round).
    ``rounds`` bounds the peel; after the fixpoint extra rounds no-op,
    and the SQL oracle unrolls the SAME bound, so both sides agree even
    if the bound binds. Returns Dataset(a, b) with a < b."""
    import pyarrow as pa

    E = (edge_triangle_support(ctx)
         .filter(expr=f"support >= {k - 2}")
         .select_columns(["a", "b"]))
    n_alive = E.count()
    for _ in range(1, rounds):
        if n_alive == 0:
            break
        E = _truss_round(E, ctx.N, ctx.P, k).materialize()
        n_next = E.count()
        if n_next == n_alive:
            break
        n_alive = n_next
    if n_alive == 0:
        # a fully-peeled graph must still carry the (a, b) schema —
        # Ray drops empty blocks through the aggregate, losing it
        return tables_dataset([pa.table({"a": pa.array([], pa.int64()),
                                         "b": pa.array([], pa.int64())})])
    return E


HARM_LCM_12 = 27720  # lcm(1..12): 1/d sums become exact integers


def harmonic_centrality(
    ctx: GraphContext,
    num_seeds: int = 8,
    max_depth: int = 12,
    seed: int = 0,
) -> rd.Dataset:
    """Truncated harmonic centrality from a deterministic seed panel:
    H(v) = Σ_s floor(LCM/d_s(v)) over hash-chosen seeds s with
    0 < d_s(v) <= max_depth on the undirected view — the sampled-BFS
    estimator (Eppstein-Wang style), made exactly reproducible: seeds
    are the num_seeds smallest splitmix64(vid + seed·2^60) (ties by
    vid) and scores are integer LCM-scaled reciprocals, so no float
    summation order exists to disagree about. One level-synchronous
    BFS per seed over the existing frontier machinery; the accumulator
    lives on the shards. Returns Dataset(vid, harmonic[, conv_id])."""
    import numpy as np

    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    seeds = _elect_seeds(ctx, num_seeds, seed)
    if max_depth > 12:
        raise ValueError("max_depth > 12 breaks the exact lcm(1..12) scaling")
    ray.get([s.harm_init.remote() for s in shards])
    for sv in seeds:
        frontier = ray.get([s.bfs_init.remote(int(sv)) for s in shards])
        level = 0
        while any(f.size for f in frontier) and level < max_depth:
            level += 1
            refs = [
                shards[p].expand_sym_neighbors.options(num_returns=P + 1).remote(frontier[p])
                for p in range(P)
            ]
            frontier = ray.get([
                shards[p].bfs_apply.remote(level, *[refs[q][1 + p] for q in range(P)])
                for p in range(P)
            ])
        ray.get([s.harm_accum.remote(HARM_LCM_12, max_depth) for s in shards])
    tables = ray.get([s.harm_table.remote() for s in shards])
    return _with_conv(ctx, tables)


def closeness_centrality(
    ctx: GraphContext,
    num_seeds: int = 8,
    max_depth: int = 12,
    seed: int = 0,
) -> rd.Dataset:
    """Sampled closeness centrality sufficient statistics: for each
    vertex v, over the same deterministic seed panel as
    ``harmonic_centrality`` (shared `_elect_seeds` election), the count
    of seeds reached within ``max_depth`` and the INTEGER sum of BFS
    distances — closeness(v) ≈ n_reached / sum_dist is left to the
    caller so the engine output stays pure-integer (no float summation
    order to disagree about; the Eppstein-Wang estimator shape). One
    level-synchronous BFS per seed on the undirected view; accumulators
    live on the shards. Returns Dataset(vid, n_reached, sum_dist
    [, conv_id])."""
    import numpy as np  # noqa: F401  (parity with sibling pipelines)

    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    seeds = _elect_seeds(ctx, num_seeds, seed)
    ray.get([s.clo_init.remote() for s in shards])
    for sv in seeds:
        frontier = ray.get([s.bfs_init.remote(int(sv)) for s in shards])
        level = 0
        while any(f.size for f in frontier) and level < max_depth:
            level += 1
            refs = [
                shards[p].expand_sym_neighbors.options(num_returns=P + 1).remote(frontier[p])
                for p in range(P)
            ]
            frontier = ray.get([
                shards[p].bfs_apply.remote(level, *[refs[q][1 + p] for q in range(P)])
                for p in range(P)
            ])
        ray.get([s.clo_accum.remote(max_depth) for s in shards])
    tables = ray.get([s.clo_table.remote() for s in shards])
    return _with_conv(ctx, tables)


def _elect_seeds(ctx: GraphContext, num_seeds: int, seed: int) -> np.ndarray:
    """The engine's ONE deterministic seed panel (shared by harmonic /
    eccentricity / SCC / betweenness and replayed by their SQL oracles
    — keep in lockstep with the ranked-CTE election in __ray_entry__):
    the num_seeds smallest splitmix64(vid + seed·2^60), ties by vid.
    Each shard nominates its own best k; the driver merges P·k rows,
    never an N-sized array."""
    off = (int(seed) << 60) % (1 << 64)
    cands = ray.get([
        s.harm_seed_candidates.remote(int(num_seeds), off) for s in ctx.shards
    ])
    h = np.concatenate([c[0] for c in cands])
    vids = np.concatenate([c[1] for c in cands])
    return vids[np.lexsort((vids, h))[: int(num_seeds)]]


def _sp_forward(ctx: GraphContext, source_vid: int, max_depth: int) -> None:
    """Brandes forward pass (dist + exact σ) left resident on the
    shards — shared by shortest_path_counts and betweenness_sample."""
    P, shards = ctx.P, ctx.shards
    frontier = ray.get([s.sp_init.remote(int(source_vid)) for s in shards])
    level = 0
    while any(f.size for f in frontier) and level < max_depth:
        level += 1
        refs = [
            shards[p].sp_expand.options(num_returns=P + 1).remote(frontier[p])
            for p in range(P)
        ]
        frontier = ray.get([
            shards[p].sp_apply.remote(level, *[refs[q][1 + p] for q in range(P)])
            for p in range(P)
        ])


def shortest_path_counts(ctx: GraphContext, source_vid: int,
                         max_depth: int = 64) -> rd.Dataset:
    """Brandes forward pass from one source on the undirected view:
    hop distance + the EXACT number of shortest paths σ(v) per vertex
    (level-synchronous BFS whose frontier carries per-destination
    σ sums, combined inside each shard before the exchange). σ values
    are integers (shipped as exact integer-valued floats ≪ 2^53), so
    the output is hash-comparable across engines.
    Returns Dataset(vid, distance, sigma[, conv_id]); unreached rows
    have distance -1, sigma 0."""
    _ensure_symmetric(ctx)
    _sp_forward(ctx, source_vid, max_depth)
    tables = ray.get([s.sp_table.remote() for s in ctx.shards])
    return _with_conv(ctx, tables)


def betweenness_sample(
    ctx: GraphContext,
    num_seeds: int = 4,
    seed: int = 0,
    max_depth: int = 64,
    seeds: "np.ndarray | None" = None,
) -> rd.Dataset:
    """Sampled betweenness centrality (Brandes, undirected, unweighted):
    for each hash-elected seed, the forward σ pass above, then the
    backward dependency sweep — per level L (descending), dist==L
    vertices ship (1+δ)/σ to their neighbors and dist==L-1 owners
    accumulate δ += σ·incoming, packs applied in fixed shard order so
    repeat runs at a given partitioning are bit-identical (across
    partitionings the per-shard partial-sum order differs: allclose,
    like any float reduction).
    Scores are the sampled sums Σ_s δ_s(v) (source excluded); divide by
    num_seeds/N for the usual estimator scaling. Returns
    Dataset(vid, betweenness[, conv_id])."""
    import numpy as np

    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    if seeds is None:
        seeds = _elect_seeds(ctx, num_seeds, seed)
    ray.get([s.bt_reset.remote() for s in shards])
    for sv in seeds:
        _sp_forward(ctx, int(sv), max_depth)
        top = max(ray.get([s.bt_levels.remote() for s in shards]))
        for lv in range(top, 0, -1):
            refs = [
                shards[p].bt_emit.options(num_returns=P + 1).remote(lv)
                for p in range(P)
            ]
            ray.get([
                shards[p].bt_apply.remote(lv, *[refs[q][1 + p] for q in range(P)])
                for p in range(P)
            ])
        ray.get([s.bt_accum.remote() for s in shards])
    tables = ray.get([s.bt_table.remote() for s in shards])
    return _with_conv(ctx, tables)


def eccentricity_sample(
    ctx: GraphContext,
    num_seeds: int = 4,
    seed: int = 0,
    max_depth: int = 64,
    seeds: "np.ndarray | None" = None,
):
    """Sampled eccentricities on the undirected view: per hash-elected
    seed, the max BFS hop distance among reached vertices — max over
    seeds is the standard diameter lower bound. One level-synchronous
    BFS per seed over the existing frontier machinery; the only driver
    state is the P per-shard max-reduce per seed. ``max_depth`` bounds
    the rounds for oracle parity (any value ≥ the true eccentricity is
    exact). Returns a small Arrow table (seed_vid, eccentricity)."""
    import numpy as np
    import pyarrow as pa

    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    if seeds is None:
        seeds = _elect_seeds(ctx, num_seeds, seed)
    out_s, out_e = [], []
    for sv in seeds:
        frontier = ray.get([s.bfs_init.remote(int(sv)) for s in shards])
        level = 0
        while any(f.size for f in frontier) and level < max_depth:
            level += 1
            refs = [
                shards[p].expand_sym_neighbors.options(num_returns=P + 1).remote(frontier[p])
                for p in range(P)
            ]
            frontier = ray.get([
                shards[p].bfs_apply.remote(level, *[refs[q][1 + p] for q in range(P)])
                for p in range(P)
            ])
        out_s.append(int(sv))
        out_e.append(max(ray.get([s.dist_max.remote() for s in shards])))
    return pa.table({"seed_vid": pa.array(np.array(out_s, np.int64)),
                     "eccentricity": pa.array(np.array(out_e, np.int64))})


def scc_of_seeds(
    ctx: GraphContext,
    num_seeds: int = 4,
    seed: int = 0,
    max_rounds: int = 100_000,
    seeds: "np.ndarray | None" = None,
) -> rd.Dataset:
    """Strongly-connected-component membership for a deterministic seed
    panel on the DIRECTED graph: SCC(s) = forward-reachable(s) ∩
    backward-reachable(s) — the FW-BW carve step, run as two
    level-synchronous frontier sweeps per seed (out-CSR hop, then the
    transpose in-CSR hop) over the existing BFS machinery. Seeds are
    the ``num_seeds`` smallest splitmix64(vid + seed·2^60) (ties by
    vid), elected by per-shard candidate merge — the driver never holds
    an N-sized array, and membership leaves as a Dataset.

    Returns Dataset(seed_vid, vid[, conv_id])."""
    import numpy as np

    P, shards = ctx.P, ctx.shards
    if seeds is None:
        seeds = _elect_seeds(ctx, num_seeds, seed)
    tables = []
    for sv in seeds:
        for expander, snapshot in (("expand_out_neighbors", True),
                                   ("expand_in_neighbors", False)):
            frontier = ray.get([s.bfs_init.remote(int(sv)) for s in shards])
            level = 0
            while any(f.size for f in frontier) and level < max_rounds:
                level += 1
                refs = [
                    getattr(shards[p], expander)
                    .options(num_returns=P + 1).remote(frontier[p])
                    for p in range(P)
                ]
                frontier = ray.get([
                    shards[p].bfs_apply.remote(level, *[refs[q][1 + p] for q in range(P)])
                    for p in range(P)
                ])
            if snapshot:
                ray.get([s.reach_snapshot.remote() for s in shards])
        tables.extend(ray.get([s.scc_member_table.remote(int(sv)) for s in shards]))
    return _with_conv(ctx, tables)


def maximal_independent_set(ctx: GraphContext,
                            max_rounds: int = 100_000) -> rd.Dataset:
    """Luby-style maximal independent set with FIXED splitmix64
    priorities over the undirected graph (self-loops excluded by the
    symmetric view).

    Each round runs two bulk-synchronous exchanges: (1) every active
    vertex min-combines its hash priority into its neighbors and a
    strict local minimum joins the set, (2) new members exclude their
    still-active neighbors; fixpoint when no vertex is active. Fixed
    priorities make the result the UNIQUE greedy MIS in increasing-hash
    order — independent of round grouping, shard count or scheduling —
    which is what the driver's SQL oracle replays. Same BSP skeleton as
    the engine's CC/LP fixpoints (DT mark fixpoint analogue,
    /root/reference/inc/pagerankCuda.hxx:439-456).

    Returns Dataset (vid:int64, in_mis:int64[, conv_id])."""
    _ensure_symmetric(ctx)
    shards = ctx.shards
    P = len(shards)
    active = sum(ray.get([s.mis_init.remote() for s in shards]))
    rounds = 0
    while active and rounds < max_rounds:
        refs = [s.mis_push_prio.options(num_returns=P + 1).remote() for s in shards]
        ray.get([
            shards[p].mis_decide.remote(*[refs[q][1 + p] for q in range(P)])
            for p in range(P)
        ])
        refs2 = [s.mis_push_excl.options(num_returns=P + 1).remote() for s in shards]
        active = sum(ray.get([
            shards[p].mis_apply_excl.remote(*[refs2[q][1 + p] for q in range(P)])
            for p in range(P)
        ]))
        rounds += 1
    return _with_conv(ctx, ray.get([s.mis_table.remote() for s in shards]))


def greedy_coloring(ctx: GraphContext, max_rounds: int = 100_000) -> rd.Dataset:
    """Greedy graph coloring by Jones-Plassmann rounds over the
    undirected view, with FIXED splitmix64(vid) priorities.

    A round: (1) uncolored vertices push their priorities (min-combined
    per (owner, dst)); a strict local minimum among uncolored neighbors
    becomes ready and takes the mex of its accumulated neighbor colors;
    (2) new colors propagate to still-uncolored neighbors. Since a
    larger-hash neighbor can never be colored before this vertex, the
    mex at readiness ranges over exactly the smaller-hash neighbors —
    so the fixpoint equals the SEQUENTIAL greedy coloring in
    increasing-hash order: deterministic, schedule- and partition-
    invariant, and replayable by the driver's SQL oracle. Progress is
    guaranteed (the globally smallest-hash uncolored vertex is always
    ready). Same BSP skeleton as the MIS/CC fixpoints. Round count is
    left on ``ctx.last_coloring_rounds``. Returns Dataset
    (vid, color[, conv_id])."""
    _ensure_symmetric(ctx)
    shards = ctx.shards
    P = len(shards)
    remaining = sum(ray.get([s.col_init.remote() for s in shards]))
    rounds = 0
    while remaining and rounds < max_rounds:
        refs = [s.col_push_prio.options(num_returns=P + 1).remote() for s in shards]
        ray.get([
            shards[p].col_decide.remote(*[refs[q][1 + p] for q in range(P)])
            for p in range(P)
        ])
        refs2 = [s.col_push_colors.options(num_returns=P + 1).remote() for s in shards]
        remaining = sum(ray.get([
            shards[p].col_apply_colors.remote(*[refs2[q][1 + p] for q in range(P)])
            for p in range(P)
        ]))
        rounds += 1
    ctx.last_coloring_rounds = rounds
    return _with_conv(ctx, ray.get([s.col_table.remote() for s in shards]))


def sssp_weighted(ctx: GraphContext, seed: int = 0, wmod: int = 8,
                  max_rounds: int = 100_000) -> rd.Dataset:
    """Weighted single-source shortest paths — Bellman-Ford as BSP
    relaxation rounds over the undirected view, from the hash-elected
    seed (the engine's shared ``_elect_seeds`` panel, k=1).

    Edge weights 1 + mix2(min(u,v), max(u,v)) % wmod are a pure
    symmetric function of the endpoint vids: deterministic across
    shards/runs, recomputed at relax time (never stored, never
    shipped), and replayed bit-equal by the driver's SQL oracle. Each
    round relaxes only the edges of the vertices improved last round
    (the DF-style affected-only frontier), min-combines candidates per
    (owner, dst) before the exchange, and min-folds at the owner;
    fixpoint when no distance improves — the weighted generalization
    of the level-synchronous BFS rounds (bfs.hxx:22-55). Unreached
    vertices report -1. The fixpoint round count is left on
    ``ctx.last_sssp_rounds`` (the SQL oracle's unroll bound must
    exceed it). Returns Dataset (vid, sdist[, conv_id])."""
    _ensure_symmetric(ctx)
    shards = ctx.shards
    P = len(shards)
    src = int(_elect_seeds(ctx, 1, seed)[0])
    active = sum(ray.get([s.sssp_init.remote(src, wmod) for s in shards]))
    rounds = 0
    while active and rounds < max_rounds:
        refs = [s.sssp_push.options(num_returns=P + 1).remote() for s in shards]
        active = sum(ray.get([
            shards[p].sssp_apply.remote(*[refs[q][1 + p] for q in range(P)])
            for p in range(P)
        ]))
        rounds += 1
    ctx.last_sssp_rounds = rounds
    return _with_conv(ctx, ray.get([s.sssp_table.remote() for s in shards]))


def walk_count_centrality(ctx: GraphContext, length: int = 4) -> rd.Dataset:
    """Exact-integer walk-count centrality: for each vertex, the number
    of directed walks of length <= ``length`` ENDING there (the
    truncated Katz series sum_{t<=L} (A^T)^t 1 with alpha = 1, over the
    deduped directed edge set incl. structural self-loops). All
    arithmetic is int64 and associative, so the result is exact and
    partitioning-invariant — and replayed term-for-term by the SQL
    oracle as L unrolled join+sum levels. One sum-combined BSP exchange
    per level (the PageRank contribution push without the degree
    normalization, /root/reference/inc/pagerankCuda.hxx:88-217 family).
    Returns Dataset (vid, walks[, conv_id])."""
    shards = ctx.shards
    P = len(shards)
    ray.get([s.wc_init.remote() for s in shards])
    for _ in range(length):
        refs = [s.wc_push.options(num_returns=P + 1).remote() for s in shards]
        ray.get([
            shards[p].wc_apply.remote(*[refs[q][1 + p] for q in range(P)])
            for p in range(P)
        ])
    return _with_conv(ctx, ray.get([s.wc_table.remote() for s in shards]))


def katz_centrality(ctx: GraphContext, length: int = 4, mul: int = 4) -> rd.Dataset:
    """Exact-integer truncated Katz centrality with damping alpha =
    1/mul, pre-scaled by mul^length: katz(v) = Σ_{l=1..L} mul^(L-l) ·
    walks_l(v) over the deduped directed edge set (incl. structural
    self-loops). The damped sibling of walk_count_centrality: same
    one-exchange-per-level BSP push (wc_push), a damped accumulator
    fold per level (kz_apply: acc = mul·acc + x_l) — all int64 and
    associative, so partitioning cannot change a single count and the
    SQL oracle replays the L unrolled levels term-for-term. Returns
    Dataset (vid, katz[, conv_id])."""
    shards = ctx.shards
    P = len(shards)
    ray.get([s.kz_init.remote() for s in shards])
    for _ in range(int(length)):
        refs = [s.wc_push.options(num_returns=P + 1).remote() for s in shards]
        ray.get([
            shards[p].kz_apply.remote(int(mul), *[refs[q][1 + p] for q in range(P)])
            for p in range(P)
        ])
    return _with_conv(ctx, ray.get([s.kz_table.remote() for s in shards]))


def reciprocity(ctx: GraphContext) -> rd.Dataset:
    """Directed-edge reciprocity over the deduped edge set, structural
    self-loops excluded: n_mutual = |{(u,v): u≠v, v→u also present}|,
    plus the exact-integer ratio ``recip_e6 = n_mutual·10^6 //
    n_edges``. One reversed-membership exchange (owner(v) answers
    v→u via segmented binary search over its out-CSR — the hasEdge
    probe, /root/reference/inc/Graph.hxx:165-194 analogue), scalar
    tree-fold, single-row Dataset(n_edges, n_mutual, recip_e6)."""
    import pyarrow as pa

    P, shards = ctx.P, ctx.shards
    refs = [s.recip_queries.options(num_returns=P + 1).remote() for s in shards]
    n_edges = sum(ray.get([refs[p][0] for p in range(P)]))
    n_mutual = sum(ray.get([
        shards[p].dir_member_count.remote(*[refs[q][1 + p] for q in range(P)])
        for p in range(P)
    ]))
    ratio = (np.int64(n_mutual) * 1_000_000 // n_edges) if n_edges else np.int64(0)
    return tables_dataset([pa.table({
        "n_edges": pa.array([int(n_edges)], pa.int64()),
        "n_mutual": pa.array([int(n_mutual)], pa.int64()),
        "recip_e6": pa.array([int(ratio)], pa.int64()),
    })])


def avg_neighbor_degree(ctx: GraphContext) -> rd.Dataset:
    """Degree-degree correlation profile over the undirected view: for
    each symmetric-degree class k, how many vertices have degree k and
    the exact-integer total of their neighbors' degrees (so mean
    neighbor degree = sum_nbr_deg / (k·n_vertices) is reproducible
    without float reduction). One degree-fetch exchange (annd_needs →
    degs_for, the jac_hi_needs plan), per-shard reduceat, and only one
    row per distinct degree class per shard reaches the merge.
    Returns Dataset(degree, n_vertices, sum_nbr_deg)."""
    import pyarrow as pa

    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    need_refs = [s.annd_needs.options(num_returns=P + 1).remote() for s in shards]
    deg_refs = [
        [shards[q].degs_for.remote(need_refs[p][1 + q]) for q in range(P)]
        for p in range(P)
    ]
    parts = ray.get([
        shards[p].annd_partial.remote(*deg_refs[p]) for p in range(P)
    ])
    merged = pa.concat_tables(parts)
    if not merged.num_rows:
        return tables_dataset([merged])
    deg = merged["degree"].to_numpy()
    vals, inv = np.unique(deg, return_inverse=True)
    nv = np.zeros(len(vals), dtype=np.int64)
    sm = np.zeros(len(vals), dtype=np.int64)
    np.add.at(nv, inv, merged["n_vertices"].to_numpy())
    np.add.at(sm, inv, merged["sum_nbr_deg"].to_numpy())
    return tables_dataset([pa.table({
        "degree": pa.array(vals.astype(np.int64)),
        "n_vertices": pa.array(nv), "sum_nbr_deg": pa.array(sm),
    })])


def graph_summary(ctx: GraphContext) -> rd.Dataset:
    """One-row structural profile of the live graph — order, directed
    size (deduped, incl. structural self-loops), self-loop count,
    undirected size, max out/in degree, isolated-vertex count (symmetric
    degree 0). Per-shard 7-int partials, scalar tree-fold (max for the
    degree fields) — the graph-properties probe
    (/root/reference/inc/properties.hxx:14-55) at cluster shape."""
    import pyarrow as pa

    _ensure_symmetric(ctx)
    parts = np.stack(ray.get([s.summary_partial.remote() for s in ctx.shards]))
    sums = parts.sum(axis=0)
    maxs = parts.max(axis=0)
    return tables_dataset([pa.table({
        "n_vertices": pa.array([int(sums[0])], pa.int64()),
        "n_edges_directed": pa.array([int(sums[1])], pa.int64()),
        "n_self_loops": pa.array([int(sums[2])], pa.int64()),
        "n_edges_undirected": pa.array([int(sums[3]) // 2], pa.int64()),
        "max_outdeg": pa.array([int(maxs[4])], pa.int64()),
        "max_indeg": pa.array([int(maxs[5])], pa.int64()),
        "n_isolated": pa.array([int(sums[6])], pa.int64()),
    })])


def component_sizes(ctx: GraphContext, max_rounds: int = 10_000) -> rd.Dataset:
    """Connected-component size histogram (size, n_components): the CC
    label Dataset reduced twice — label → size, size → count — both
    Ray Data groupby aggregates over combiner-sized rows. Returns
    Dataset(size, n_components)."""
    labels = connected_components(ctx, max_rounds=max_rounds)
    sizes = (labels.groupby("component").count()
             .rename_columns({"count()": "size"}))
    return (sizes.groupby("size").count()
            .rename_columns({"count()": "n_components"}))


def temporal_earliest_arrival(ctx: GraphContext, encoded_log: rd.Dataset,
                              seed: int = 0, max_rounds: int = 100_000) -> rd.Dataset:
    """Time-respecting directed reachability: the earliest arrival time
    at every vertex from the hash-elected seed, where an edge
    (u, v, ts) is traversable only when ts >= arrival(u) and delivers
    arrival ts + 1 (strictly after its own use). The temporal analogue
    of the reference's ordered edge replay (readTemporalDo,
    /root/reference/main.cu:100-139): the full per-edge timeline stays
    shard-resident (the one CSR that keeps an edge payload), and the
    BSP rounds relax only the rows improved last round. Lowering an
    arrival only enlarges the usable timeline, so the min-fixpoint is
    exact. Arrival units are int64 epoch-microseconds; the seed starts
    at 0; unreached vertices report -1.

    ``encoded_log`` is a Dataset with int64 vid columns (src, dst) and
    a timestamp ``ts`` (the output of sources.edges.encode_edges) —
    streamed into the pool via the backpressured route_temporal, never
    driver-materialized. Returns Dataset (vid, arrival[, conv_id])."""
    from ..state.partitioner import route_temporal

    shards = ctx.shards
    P = len(shards)
    ray.get([s.ta_reset.remote() for s in shards])
    route_temporal(encoded_log, shards)
    ray.get([s.ta_finalize.remote() for s in shards])
    src = int(_elect_seeds(ctx, 1, seed)[0])
    active = sum(ray.get([s.ta_init.remote(src) for s in shards]))
    rounds = 0
    while active and rounds < max_rounds:
        refs = [s.ta_push.options(num_returns=P + 1).remote() for s in shards]
        active = sum(ray.get([
            shards[p].ta_apply.remote(*[refs[q][1 + p] for q in range(P)])
            for p in range(P)
        ]))
        rounds += 1
    ctx.last_ta_rounds = rounds
    return _with_conv(ctx, ray.get([s.ta_table.remote() for s in shards]))


def random_walks(ctx: GraphContext, length: int = 8, seed: int = 0) -> rd.Dataset:
    """Deterministic random walks over the directed out-CSR, one walk
    per vertex: the step choice idx = mix2(mix2(walk, cur), seed·2^60
    + t) % outdeg(cur) is a pure function of (walk, cur, t), so paths
    are independent of partitioning/cluster size and exactly
    replayable (incl. by a SQL oracle over a rank-ordered adjacency:
    out-neighbors are stored dst-ascending and deduped, so idx indexes
    the same neighbor everywhere). node2vec-style corpus generation
    for embedding pipelines.

    Walk state lives on the owner shard of its current vertex and is
    re-routed per step (the frontier-exchange shape); each shard logs
    positions locally and the path log leaves as one Dataset — the
    driver never holds per-walk state. Walks at out-degree-0 vertices
    terminate (after finalize's universal self-loops there are none).
    Returns Dataset(walk, step, vid): (start vid, 0..length, position).
    """
    P, shards = ctx.P, ctx.shards
    off = (int(seed) << 60) % (1 << 64)
    ray.get([s.walks_init.remote() for s in shards])
    for step in range(1, int(length) + 1):
        refs = [
            shards[p].walk_round.options(num_returns=P + 1).remote(off + step - 1)
            for p in range(P)
        ]
        alive = ray.get([
            shards[p].walk_recv.remote(step, *[refs[q][1 + p] for q in range(P)])
            for p in range(P)
        ])
        if not sum(alive):
            break
    tables = ray.get([s.walk_log_table.remote() for s in shards])
    return tables_dataset(tables)


def degree_distribution(ctx: GraphContext) -> rd.Dataset:
    """Degree histogram of the directed deduped graph (incl. structural
    self-loops): (kind 'out'|'in', degree, n_vertices). Histogram
    partials are computed ON the shards (one row per distinct degree
    per shard — the driver never gathers a per-vertex table); the merge
    groupby touches at most P rows per (kind, degree)."""
    import pandas as pd

    def merge(g: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        return pa.table({"kind": pa.array([g["kind"].iloc[0]], pa.string()),
                         "degree": pa.array([int(g["degree"].iloc[0])], pa.int64()),
                         "n_vertices": pa.array([int(g["n_vertices"].sum())], pa.int64())})

    tables = ray.get([s.degree_hist_table.remote() for s in ctx.shards])
    both = tables_dataset(tables)

    def gk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__gk"] = df["kind"] + "|" + df["degree"].astype(str)
        return df

    return (both.map_batches(gk, batch_format="pandas")
            .groupby("__gk").map_groups(merge, batch_format="pandas"))


def assortativity_sums(ctx: GraphContext) -> dict[str, int]:
    """Exact integer sufficient statistics for directed degree
    assortativity over every edge (u,v) of the deduped graph incl.
    self-loops: x = outdeg(u), y = indeg(v); returns m, Σx, Σy, Σxy,
    Σx², Σy².

    One dedicated degree exchange: each shard's pull index (restricted
    per owner, shipped actor-to-actor as ObjectRefs — the driver holds
    only P² refs, never the cut) fetches integer out-degrees from the
    owners, then the per-edge products reduce shard-side through the
    same gather layout the rank exchange uses. Driver folds P small
    int64 vectors in Python ints (no overflow at any scale)."""
    P = ctx.P
    need = {(p, q): ctx.shards[p].assort_needs.remote(q)
            for p in range(P) for q in range(P)}
    # barriers between layers (no fetch — data stays in the object
    # store): assort_partial blocks its actor in ray.get, so every
    # upstream task must be COMPLETE before any partial is submitted,
    # or a deferred-arg degree task behind a blocked actor deadlocks
    # the pool.
    ray.wait(list(need.values()), num_returns=P * P, fetch_local=False)
    deg = {(p, q): ctx.shards[q].outdeg_int_for.remote(need[(p, q)])
           for p in range(P) for q in range(P)}
    ray.wait(list(deg.values()), num_returns=P * P, fetch_local=False)
    parts = get_all_fail_fast(
        [ctx.shards[p].assort_partial.remote([deg[(p, q)] for q in range(P)])
         for p in range(P)])
    tot = [sum(int(part[i]) for part in parts) for i in range(6)]
    return dict(zip(["m", "sx", "sy", "sxy", "sxx", "syy"], tot))


def degree_assortativity(ctx: GraphContext) -> float:
    """Directed degree assortativity coefficient (Pearson r of
    (outdeg(u), indeg(v)) over edges — Newman 2002/2003 sense, computed
    from the exact integer sums of ``assortativity_sums``)."""
    s = assortativity_sums(ctx)
    m, sx, sy, sxy, sxx, syy = (s[k] for k in ("m", "sx", "sy", "sxy", "sxx", "syy"))
    if m == 0:
        return float("nan")
    num = m * sxy - sx * sy
    den2 = (m * sxx - sx * sx) * (m * syy - sy * sy)
    if den2 <= 0:
        return float("nan")
    return float(num / np.sqrt(float(den2)))


def modularity(ctx: GraphContext, labels: rd.Dataset | None = None) -> float:
    """Modularity Q of the current shard labels (run connected_components
    or label_propagation first; or pass a (vid,label) Dataset to install).

    Q = Σ_c [ within_c/(2m) − (deg_c/(2m))² ] on the undirected view —
    the distributed form of the reference's grouped community sums
    (/root/reference/inc/properties.hxx:123-256)."""
    import numpy as np

    _ensure_symmetric(ctx)
    P, shards = ctx.P, ctx.shards
    if labels is None and not ray.get(shards[0].has_labels.remote()):
        raise ValueError(
            "no labels installed — run connected_components()/label_propagation() "
            "first, or pass labels=Dataset(vid, label)"
        )
    if labels is not None:
        from ..state.partitioner import route_labels

        # pick the label column by NAME, not position: engine outputs
        # carry (vid, component|label[, conv_id]) and column order is
        # not contractual after joins
        cols = labels.schema().names
        named = [c for c in ("label", "component") if c in cols]
        others = [c for c in cols if c not in ("vid", "conv_id")]
        if named:
            col = named[0]
        elif len(others) == 1:
            col = others[0]
        else:
            raise ValueError(
                f"ambiguous label column among {cols} — "
                "name it 'label' or 'component'"
            )
        # distributed install: stream (vid, label) to owner shards —
        # the driver never holds a vertex-scale vector; coverage and
        # duplicate checks fold as O(P) scalars from the shards
        ray.get([s.begin_label_install.remote() for s in shards])
        try:
            route_labels(labels.select_columns(["vid", col]), shards, col)
        except Exception as e:
            # routing failure (e.g. a vid outside [0, N)) must release
            # the shards' install buffers and surface the contract error
            ray.get([s.abort_label_install.remote() for s in shards])
            raise ValueError(f"label install failed during routing: {e}") from e
        res = ray.get([s.label_install_stats.remote() for s in shards])
        n_written = sum(r[0] for r in res)
        n_dups = sum(r[1] for r in res)
        if n_dups or n_written != ctx.N:
            ray.get([s.abort_label_install.remote() for s in shards])
            raise ValueError(
                f"labels must cover every vertex exactly once "
                f"({n_written} unique vids, {n_dups} duplicates for "
                f"N={ctx.N}) — a partial install would silently merge "
                "missing vertices into community 0"
            )
        ray.get([s.finish_label_install.remote() for s in shards])
    need_refs = [s.mod_needed_neighbors.options(num_returns=P + 1).remote() for s in shards]
    lab_refs = [
        [shards[q].labels_for.remote(need_refs[p][1 + q]) for q in range(P)]
        for p in range(P)
    ]
    terms = ray.get([
        shards[p].modularity_terms.remote(*lab_refs[p]) for p in range(P)
    ])
    # vectorized cross-shard combine: concatenate per-shard community
    # terms, re-key with np.unique, sum with bincount (no per-community
    # Python loop — community count can be O(N))
    labs = np.concatenate([t[0] for t in terms])
    w = np.concatenate([t[1] for t in terms])
    d = np.concatenate([t[2] for t in terms])
    _, inv = np.unique(labs, return_inverse=True)
    within = np.bincount(inv, weights=w)
    degsum = np.bincount(inv, weights=d)
    two_m = float(degsum.sum())
    if two_m == 0:
        return 0.0
    return float(np.sum(within / two_m - (degsum / two_m) ** 2))


def _with_conv(ctx: GraphContext, tables) -> rd.Dataset:
    if ctx.dictionary is not None:
        import pyarrow as pa

        out = []
        for t in tables:
            vids = t["vid"].to_numpy()
            out.append(t.append_column("conv_id", pa.array(ctx.dictionary[vids])))
        tables = out
        return tables_dataset(tables)
    ds = tables_dataset(tables)
    if ctx.dictionary_ds is not None:
        # distributed-dictionary mode: conv_id via hash join, no driver
        # gather; fractional-CPU aggregators so the join can schedule
        # while the shard actor pool holds CPU slots
        ds = ds.join(
            ctx.dictionary_ds, "inner", ctx.P, on=("vid",)
        ).rename_columns({"id": "conv_id"})
    return ds
