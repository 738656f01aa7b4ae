"""Named relational scale patterns.

Two patterns the 100 TB playbook mandates, packaged as first-class
operators instead of ad-hoc inline code:

* ``broadcast_join`` — the small side ships ONCE through the object
  store (``ray.put``) and every block merges against it zero-shuffle;
  the alternative (``Dataset.join``) hash-shuffles BOTH sides. Use it
  whenever one side is dimension-table sized.
* ``salted_groupby_count`` — two-phase aggregation for skewed keys: a
  per-block combiner already collapses each block to one row per key,
  and an explicit salt splits a hot key's merge work across ``salt``
  reducers before a second (tiny) merge. With a handful of hot keys a
  plain groupby funnels every partial into one reducer; salting keeps
  the reduce fan-in balanced.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def profile_table(
    ds: rd.Dataset,
    int_cols: list[str] = (),
    float_cols: list[str] = (),
    str_cols: list[str] = (),
) -> rd.Dataset:
    """Data-profiling pass: per column, row count, null count, min and
    max — one streaming scan, per-block partials (one row per column
    per block) merged by a tiny groupby. Numeric extremes are exact;
    float min/max are reported as integer cents (the engine's money
    convention) so the result is hash-deterministic; string min/max are
    lexicographic. Returns Dataset(column, n_rows, n_null, min_v,
    max_v) with min/max rendered as strings for a uniform schema."""

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        n = len(t)
        for c in int_cols:
            v = t[c].to_numpy(zero_copy_only=False)
            null = int(pd.isna(v).sum())
            ok = v[~pd.isna(v)].astype(np.int64) if null else v.astype(np.int64)
            rows.append((c, n, null,
                         str(int(ok.min())) if len(ok) else "",
                         str(int(ok.max())) if len(ok) else ""))
        for c in float_cols:
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            m = np.isnan(v)
            ok = np.floor(v[~m] * 100 + 0.5).astype(np.int64)
            rows.append((c, n, int(m.sum()),
                         str(int(ok.min())) if len(ok) else "",
                         str(int(ok.max())) if len(ok) else ""))
        for c in str_cols:
            s = pd.Series(t[c].to_pandas())
            null = int(s.isna().sum())
            ok = s.dropna()
            rows.append((c, n, null,
                         ok.min() if len(ok) else "", ok.max() if len(ok) else ""))
        df_ = pd.DataFrame(rows, columns=["column", "n_rows", "n_null",
                                          "min_v", "max_v"])
        return pa.Table.from_pandas(df_, preserve_index=False)

    def merge(df_: pd.DataFrame) -> pa.Table:
        ok_min = df_["min_v"][df_["min_v"] != ""]
        ok_max = df_["max_v"][df_["max_v"] != ""]
        col = df_["column"].iloc[0]
        numeric = col not in str_cols
        if numeric:
            mn = str(min(int(x) for x in ok_min)) if len(ok_min) else ""
            mx = str(max(int(x) for x in ok_max)) if len(ok_max) else ""
        else:
            mn = ok_min.min() if len(ok_min) else ""
            mx = ok_max.max() if len(ok_max) else ""
        return pa.table({
            "column": pa.array([col], pa.string()),
            "n_rows": pa.array([int(df_["n_rows"].sum())], pa.int64()),
            "n_null": pa.array([int(df_["n_null"].sum())], pa.int64()),
            "min_v": pa.array([mn], pa.string()),
            "max_v": pa.array([mx], pa.string()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("column")
        .map_groups(merge, batch_format="pandas")
    )


def broadcast_join(
    ds: rd.Dataset,
    small: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
    suffix: str = "_r",
) -> rd.Dataset:
    """Join a Dataset against a driver-resident small table. The small
    side is broadcast once via ``ray.put`` and fetched zero-copy in
    every map task — no shuffle of the big side at all. ``how`` is
    'inner' or 'left' (the broadcast side is always the right side)."""
    assert how in ("inner", "left"), how
    ref = ray.put(small)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return batch.merge(rhs, on=on, how=how, suffixes=("", suffix))

    return ds.map_batches(merge, batch_format="pandas")


def grouped_stats_cents(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
) -> rd.Dataset:
    """Exact grouped numeric statistics sufficient for mean/variance:
    n, Σv, Σv² per key with v quantized to integer cents
    (``floor(v·100 + 0.5)``, the engine's money convention) — so the
    sums are exact int64 and hash-match any engine regardless of fold
    order. Per-block combiner ships one row per key per block.
    Returns Dataset(key, n, sum_c, sum_sq_c)."""

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        c = np.floor(t[value_col].to_numpy().astype(np.float64) * 100 + 0.5).astype(np.int64)
        df_ = pd.DataFrame({key_col: keys, "n": np.int64(1),
                            "sum_c": c, "sum_sq_c": c * c})
        g = df_.groupby(key_col, sort=True, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({key_col: t[key_col], "n": t["sum(n)"],
                         "sum_c": t["sum(sum_c)"], "sum_sq_c": t["sum(sum_sq_c)"]})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .sum(["n", "sum_c", "sum_sq_c"])
        .map_batches(fin, batch_format="pyarrow")
    )


def distinct_count_by_key(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
) -> rd.Dataset:
    """EXACT distinct-value count per key (the sketch-free complement
    of hll_distinct_by_key): per-block unique (key, value) pairs — the
    combiner that collapses duplicate mass before any exchange — then
    one pair-keyed dedup groupby and a per-key count. Shuffle rows ∝
    distinct pairs, never raw rows. Returns Dataset(key, n_distinct)."""

    def pairs(t: pa.Table) -> pa.Table:
        df_ = pd.DataFrame({key_col: t[key_col].to_numpy(zero_copy_only=False),
                            value_col: t[value_col].to_numpy(zero_copy_only=False)})
        u = df_.drop_duplicates()
        return pa.Table.from_pandas(u, preserve_index=False)

    def per_key(t: pa.Table) -> pa.Table:
        df_ = t.to_pandas()
        g = df_.groupby(key_col, sort=True).size().reset_index(name="n_distinct")
        g["n_distinct"] = g["n_distinct"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    dedup = (ds.map_batches(pairs, batch_format="pyarrow")
             .groupby([key_col, value_col]).count()
             .drop_columns(["count()"]))
    # second combiner: per-block per-key partial counts -> tiny merge
    return (
        dedup.map_batches(per_key, batch_format="pyarrow")
        .groupby(key_col).sum("n_distinct")
        .map_batches(lambda t: t.rename_columns([key_col, "n_distinct"]),
                     batch_format="pyarrow")
    )


def salted_groupby_count(
    ds: rd.Dataset,
    key_col: str,
    salt: int = 8,
    weight_col: str | None = None,
) -> rd.Dataset:
    """Grouped count (or weighted sum) with explicit hot-key salting:
    phase 1 combines per block and routes each (key, block) partial to
    one of ``salt`` reducers by a per-block deterministic salt; phase 2
    merges the <= salt partials per key. Both phases' groupby inputs
    are (key-cardinality x salt)-bounded — raw rows never shuffle.
    Returns Dataset(key, n)."""

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        w = (t[weight_col].to_numpy().astype(np.int64)
             if weight_col else np.ones(len(keys), dtype=np.int64))
        df_ = pd.DataFrame({key_col: keys, "n": w})
        g = df_.groupby(key_col, sort=True)["n"].sum().reset_index()
        # deterministic per-partial salt: spread a hot key's partials
        # over `salt` reducers without any row-level randomness
        h = pd.util.hash_pandas_object(g[key_col], index=False).to_numpy()
        blk = np.int64(len(t))  # varies per block: decorrelates salts
        g["s"] = ((h + np.arange(len(g)) + blk) % salt).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def unsalt(t: pa.Table) -> pa.Table:
        return t.select([key_col, "sum(n)"]).rename_columns([key_col, "n"])

    phase1 = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "s"])
        .sum("n")
        .map_batches(unsalt, batch_format="pyarrow")
    )
    return (
        phase1.groupby(key_col).sum("n")
        .map_batches(lambda t: t.rename_columns([key_col, "n"]),
                     batch_format="pyarrow")
    )


def copair_counts(
    ds: rd.Dataset,
    group_col: str,
    member_col: str,
    top: int = 100,
    max_edge_pairs: int = 20_000_000,
    edge_chunk_rows: int = 2_000_000,
    cap: int | None = None,
) -> "pa.Table":
    """EXACT bipartite projection (co-occurrence join): for every
    unordered pair of members sharing a group, the number of groups
    they co-occur in — the co-purchase / co-citation workload.

    No pair-key Ray groupby anywhere (the round-2 shape paid 20+ s for
    the ~100k-group ``groupby(["a","b"])`` at sf0.01 — the repo's own
    neighborhood-jaccard measurement): ONE sort on (group, member)
    feeds a sorted-segment pass that dedups and pairs interior groups
    vectorized, then ONE sort on (a, b) feeds a sorted-segment pair-sum
    with per-block tie-ordered top cuts. Segments straddling a block
    edge ship O(blocks)-bounded partials to the driver (the exact_dedup
    boundary contract), so the driver never holds corpus-scale state.

    Scale note: a group with M members emits M(M-1)/2 pairs — inherent
    to the exact projection (the SQL self-join pays the same). Interior
    groups emit distributed; a hot group straddling a block edge pairs
    driver-side in ``edge_chunk_rows`` chunks (bounded peak memory) and
    the run REFUSES past ``max_edge_pairs`` total boundary pairs rather
    than quietly attempting an O(M²) driver materialization — or pass
    ``cap`` for the graceful degradation below.

    ``cap``: capped-exact mode for power-law group sizes. Groups larger
    than ``cap`` members are truncated to their ``cap`` SMALLEST
    distinct members (deterministic, partitioning-invariant), bounding
    the fan-out at cap·(cap−1)/2 pairs per group; the result gains a
    ``truncated`` column, 1 iff any group contributing to the pair's
    count was truncated (those counts are lower bounds of the uncapped
    projection; untruncated pairs may still be lower bounds if a
    DROPPED membership would have linked them — the flag is per
    surviving pair, not a global completeness certificate).

    Returns a pa.Table of (a, b, shared[, truncated]) in
    (shared desc, a, b) order.
    """
    def dedup_part(t: pa.Table) -> pa.Table:
        df_ = pd.DataFrame({group_col: t[group_col].to_numpy(zero_copy_only=False),
                            member_col: t[member_col].to_numpy(zero_copy_only=False)})
        u = df_.drop_duplicates()
        return pa.Table.from_pandas(u, preserve_index=False)

    srt = (ds.map_batches(dedup_part, batch_format="pyarrow")
           .sort([group_col, member_col]).materialize())

    def seg_pairs(g: np.ndarray, m: np.ndarray):
        """All unordered member pairs within each group run of (g, m);
        in capped mode each run truncates to its cap smallest members
        and every emitted pair carries the run's truncation flag."""
        out_a, out_b, out_t = [], [], []
        bounds = np.concatenate([[0], np.flatnonzero(np.diff(g)) + 1, [len(g)]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            k = e - s
            if k < 2:
                continue
            mem = np.sort(m[s:e])
            fl = 0
            if cap is not None and k > cap:
                mem, fl = mem[:cap], 1
                k = cap
            if k < 2:
                continue
            iu = np.triu_indices(k, 1)
            out_a.append(mem[iu[0]])
            out_b.append(mem[iu[1]])
            out_t.append(np.full(len(iu[0]), fl, dtype=np.int64))
        if not out_a:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        return (np.concatenate(out_a), np.concatenate(out_b),
                np.concatenate(out_t))

    def block_pairs(batch: pd.DataFrame) -> pa.Table:
        g = batch[group_col].to_numpy()
        m = batch[member_col].to_numpy()
        bounds = np.flatnonzero(np.diff(g)) + 1
        if len(bounds) == 0:  # single run: all boundary
            a = b = tfl = np.empty(0, dtype=np.int64)
        else:
            gg = g[bounds[0]:bounds[-1]]
            mm = m[bounds[0]:bounds[-1]]
            # global (g, m) duplicates are adjacent after the sort; one
            # interior to the block drops here, one straddling a block
            # edge lives in an edge run and dedups driver-side
            keep = np.ones(len(gg), dtype=bool)
            if len(gg) > 1:
                keep[1:] = (np.diff(gg) != 0) | (mm[1:] != mm[:-1])
            a, b, tfl = seg_pairs(gg[keep], mm[keep])
        cols = {"a": pa.array(a.astype(np.int64)),
                "b": pa.array(b.astype(np.int64))}
        if cap is not None:
            cols["t"] = pa.array(tfl if len(a) else np.empty(0, np.int64))
        return pa.table(cols)

    def block_edge_runs(batch: pd.DataFrame) -> pa.Table:
        g = batch[group_col].to_numpy()
        m = batch[member_col].to_numpy()
        bounds = np.flatnonzero(np.diff(g)) + 1
        if len(bounds) == 0:
            idx = np.arange(len(g))
        else:
            idx = np.concatenate([np.arange(bounds[0]),
                                  np.arange(bounds[-1], len(g))])
        return pa.table({group_col: pa.array(g[idx]),
                         member_col: pa.array(m[idx].astype(np.int64))})

    pairs = srt.map_batches(block_pairs, batch_format="pandas", batch_size=None)
    edge = (srt.map_batches(block_edge_runs, batch_format="pandas", batch_size=None)
            .to_pandas())
    if len(edge):
        eg = edge[group_col].to_numpy()
        em = edge[member_col].to_numpy()
        order = np.lexsort((em, eg))
        eg, em = eg[order], em[order]
        keep = np.ones(len(eg), dtype=bool)
        if len(eg) > 1:
            keep[1:] = (eg[1:] != eg[:-1]) | (em[1:] != em[:-1])
        eg, em = eg[keep], em[keep]
        run_bounds = np.concatenate([[0], np.flatnonzero(eg[1:] != eg[:-1]) + 1, [len(eg)]]) \
            if len(eg) else np.array([0, 0])
        run_len = np.diff(run_bounds).astype(np.int64)
        # capped mode truncates each run to <= cap members BEFORE
        # pairing, so the refusal bound must use the capped lengths —
        # an uncapped bound would spuriously abort the exact run cap
        # was passed to survive
        eff_len = np.minimum(run_len, cap) if cap is not None else run_len
        n_pairs = int((eff_len * (eff_len - 1) // 2).sum())
        if n_pairs > max_edge_pairs:
            raise ValueError(
                f"copair_counts: {n_pairs} boundary pairs exceed "
                f"max_edge_pairs={max_edge_pairs} (a hot group straddles a "
                "block edge); cap the group fan-out upstream or raise the "
                "limit deliberately")
        chunk_tables: list = []
        buf_a: list = []
        buf_b: list = []
        buf_t: list = []
        buf_n = 0

        def _flush():
            cols = {"a": pa.array(np.concatenate(buf_a)),
                    "b": pa.array(np.concatenate(buf_b))}
            if cap is not None:
                cols["t"] = pa.array(np.concatenate(buf_t))
            chunk_tables.append(pa.table(cols))

        for s, e in zip(run_bounds[:-1], run_bounds[1:]):
            k = int(e - s)
            if k < 2:
                continue
            mem = np.sort(em[s:e])
            fl = 0
            if cap is not None and k > cap:
                mem, fl, k = mem[:cap], 1, cap
            for i in range(k - 1):
                buf_a.append(np.full(k - 1 - i, mem[i], dtype=np.int64))
                buf_b.append(mem[i + 1:].astype(np.int64))
                buf_t.append(np.full(k - 1 - i, fl, dtype=np.int64))
                buf_n += k - 1 - i
                if buf_n >= edge_chunk_rows:
                    _flush()
                    buf_a, buf_b, buf_t, buf_n = [], [], [], 0
        if buf_n:
            _flush()
        if chunk_tables:
            pairs = pairs.union(rd.from_arrow(chunk_tables))

    # pair-weight merge: sorted-segment sum + per-block tie-ordered top
    # cut (total order (shared desc, a, b) — partitioning-invariant
    # because each pair key totals in exactly one place)
    psrt = pairs.sort(["a", "b"]).materialize()

    def _run_totals(a: np.ndarray, b: np.ndarray, t: np.ndarray | None):
        if len(a) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z, z, z
        chg = np.flatnonzero((np.diff(a) != 0) | (np.diff(b) != 0)) + 1
        starts = np.concatenate([[0], chg])
        cnt = np.diff(np.concatenate([starts, [len(a)]]))
        tm = (np.maximum.reduceat(t, starts) if t is not None
              else np.empty(0, np.int64))
        return a[starts], b[starts], cnt.astype(np.int64), tm

    def block_tot(batch: pd.DataFrame) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        t = batch["t"].to_numpy() if cap is not None else None
        chg = np.flatnonzero((np.diff(a) != 0) | (np.diff(b) != 0)) + 1
        if len(chg) == 0:
            z = np.empty(0, dtype=np.int64)
            cols = {"a": pa.array(z), "b": pa.array(z), "shared": pa.array(z)}
            if cap is not None:
                cols["truncated"] = pa.array(z)
            return pa.table(cols)
        s, e = chg[0], chg[-1]
        ua, ub, cnt, tm = _run_totals(a[s:e], b[s:e],
                                      t[s:e] if t is not None else None)
        sel = np.lexsort((ub, ua, -cnt))[:top]
        cols = {"a": pa.array(ua[sel].astype(np.int64)),
                "b": pa.array(ub[sel].astype(np.int64)),
                "shared": pa.array(cnt[sel])}
        if cap is not None:
            cols["truncated"] = pa.array(tm[sel])
        return pa.table(cols)

    def block_tot_bnd(batch: pd.DataFrame) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        t = batch["t"].to_numpy() if cap is not None else None
        chg = np.flatnonzero((np.diff(a) != 0) | (np.diff(b) != 0)) + 1
        if len(chg) == 0:
            idx = np.arange(len(a))
        else:
            idx = np.concatenate([np.arange(chg[0]), np.arange(chg[-1], len(a))])
        ua, ub, cnt, tm = _run_totals(a[idx], b[idx],
                                      t[idx] if t is not None else None)
        cols = {"a": pa.array(ua.astype(np.int64)),
                "b": pa.array(ub.astype(np.int64)),
                "cnt": pa.array(cnt)}
        if cap is not None:
            cols["tm"] = pa.array(tm)
        return pa.table(cols)

    tops = psrt.map_batches(block_tot, batch_format="pandas", batch_size=None).to_pandas()
    bnd = psrt.map_batches(block_tot_bnd, batch_format="pandas", batch_size=None).to_pandas()
    if len(bnd):
        if cap is not None:
            g = (bnd.groupby(["a", "b"], sort=False)
                 .agg(shared=("cnt", "sum"), truncated=("tm", "max"))
                 .reset_index())
        else:
            g = (bnd.groupby(["a", "b"], sort=False)["cnt"].sum().reset_index()
                 .rename(columns={"cnt": "shared"}))
        tops = pd.concat([tops, g], ignore_index=True)
    if len(tops) == 0:
        cols = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                "shared": pa.array([], pa.int64())}
        if cap is not None:
            cols["truncated"] = pa.array([], pa.int64())
        return pa.table(cols)
    av = tops["a"].to_numpy(np.int64)
    bv = tops["b"].to_numpy(np.int64)
    sv = tops["shared"].to_numpy(np.int64)
    sel = np.lexsort((bv, av, -sv))[:top]
    cols = {"a": pa.array(av[sel]), "b": pa.array(bv[sel]),
            "shared": pa.array(sv[sel])}
    if cap is not None:
        cols["truncated"] = pa.array(tops["truncated"].to_numpy(np.int64)[sel])
    return pa.table(cols)
