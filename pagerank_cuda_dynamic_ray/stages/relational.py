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

    def merge(df_: pd.DataFrame) -> pd.DataFrame:
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
        return pd.DataFrame({
            "column": [col],
            "n_rows": np.array([df_["n_rows"].sum()], dtype=np.int64),
            "n_null": np.array([df_["n_null"].sum()], dtype=np.int64),
            "min_v": [mn], "max_v": [mx],
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
) -> "pa.Table":
    """EXACT bipartite projection (co-occurrence join): for every
    unordered pair of members sharing a group, the number of groups
    they co-occur in — the co-purchase / co-citation workload.

    Input rows are (group, member); duplicates collapse first (per-block
    combiner + pair-dedup groupby), then the deduped rows SORT by group
    and a sorted-segment pass emits each intra-block group's pairs
    vectorized; groups straddling a block edge ship their (small)
    edge-run members to the driver, which pairs them exactly — the same
    O(blocks·run) boundary contract as exact_dedup. Pair weights merge
    in one (a, b) groupby; the top cut is deterministic
    (weight desc, a, b). Returns a pa.Table of (a, b, shared).

    Scale note: a group with M members emits M(M-1)/2 pairs — this is
    inherent to the exact projection (the SQL self-join pays the same);
    cap the group fan-out upstream for power-law group sizes.
    """
    def dedup_part(t: pa.Table) -> pa.Table:
        df_ = pd.DataFrame({group_col: t[group_col].to_numpy(zero_copy_only=False),
                            member_col: t[member_col].to_numpy(zero_copy_only=False)})
        u = df_.drop_duplicates()
        return pa.Table.from_pandas(u, preserve_index=False)

    distinct = (ds.map_batches(dedup_part, batch_format="pyarrow")
                .groupby([group_col, member_col]).count()
                .drop_columns(["count()"]))
    srt = distinct.sort(group_col).materialize()

    def seg_pairs(g: np.ndarray, m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All unordered member pairs within each group run of (g, m)."""
        out_a, out_b = [], []
        bounds = np.concatenate([[0], np.flatnonzero(np.diff(g)) + 1, [len(g)]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            k = e - s
            if k < 2:
                continue
            mem = np.sort(m[s:e])
            iu = np.triu_indices(k, 1)
            out_a.append(mem[iu[0]])
            out_b.append(mem[iu[1]])
        if not out_a:
            z = np.empty(0, dtype=np.int64)
            return z, z
        return np.concatenate(out_a), np.concatenate(out_b)

    def block_pairs(batch: pd.DataFrame) -> pa.Table:
        g = batch[group_col].to_numpy()
        m = batch[member_col].to_numpy()
        bounds = np.flatnonzero(np.diff(g)) + 1
        if len(bounds) == 0:  # single run: all boundary
            a = b = np.empty(0, dtype=np.int64)
        else:
            a, b = seg_pairs(g[bounds[0]:bounds[-1]], m[bounds[0]:bounds[-1]])
        return pa.table({"a": pa.array(a.astype(np.int64)),
                         "b": pa.array(b.astype(np.int64))})

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
        order = np.argsort(eg, kind="stable")
        a, b = seg_pairs(eg[order], edge[member_col].to_numpy()[order])
        if len(a):
            pairs = pairs.union(rd.from_arrow(pa.table({
                "a": pa.array(a.astype(np.int64)), "b": pa.array(b.astype(np.int64)),
            })))
    agg = (pairs.map_batches(
               lambda t: pa.table({"a": t["a"], "b": t["b"],
                                   "shared": pa.array(np.ones(len(t), np.int64))}),
               batch_format="pyarrow")
           .groupby(["a", "b"]).sum("shared"))
    top_pdf = (agg.map_batches(
                   lambda t: pa.table({"a": t["a"], "b": t["b"],
                                       "shared": t["sum(shared)"]}),
                   batch_format="pyarrow")
               .sort(["shared", "a", "b"], descending=[True, False, False])
               .limit(top).to_pandas())
    return pa.Table.from_pandas(top_pdf, preserve_index=False)
