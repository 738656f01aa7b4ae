"""Event-time operators Ray Data lacks natively: tumbling-window
aggregates, as-of joins, interval (range-join) window aggregates and
gap-based sessionization.

All four are expressed Ray-Data-first. The two-sided operators (as-of
join, interval aggregate) co-partition both inputs with ONE hash
shuffle — a tagged union bucketed by ``hash(key) % num_buckets``
feeding ``groupby(bucket).map_groups`` — and every per-bucket kernel
is fully vectorized: a single lexsort of ``(key, ts, side)`` plus
cumulative-prefix passes answers, for every probe row at once,
"which right row is the latest at-or-before me" (as-of) and "how many
right rows fall inside my window" (interval), with zero per-key
Python work.  The partitioning assumption each relies on: rows
co-located by ``hash(key)``; bucket count is the concurrency knob and
a bucket only ever holds its own rows, so the kernels stream at
100 TB the same way they run here.

Determinism: ties at equal ``(key, ts)`` break on an explicit
``tiebreak`` column (as-of picks the max), so outputs are stable
under any repartitioning — the property the driver's hash-compare
gate requires.

Keys must be integer-castable (string keys: pre-encode through the
engine's vertex-dictionary path first).  ``num_buckets`` is the
shuffle-parallelism knob: size it so one bucket's rows fit a worker's
heap (≈ total_rows / target_bucket_rows on a real cluster); the
kernels are O(bucket log bucket) and independent of key cardinality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import splitmix64

_US_HOUR = 3_600_000_000
_US_DAY = 86_400_000_000


# ----------------------------------------------------------------------
# tumbling-window aggregate
# ----------------------------------------------------------------------

def _ts_us(col) -> pa.Array | pa.ChunkedArray:
    """Timestamp column -> int64 MICROSECONDS regardless of the source
    unit. A bare ``pc.cast(ts, int64)`` preserves the storage unit — a
    timestamp[ns] input (the pandas / pd.to_datetime default) would leak
    nanosecond integers into µs-denominated gap/offset arithmetic and
    into timestamp("us") reinterpretation of the outputs."""
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())


def windowed_aggregate(events: rd.Dataset, ts: str = "ts", key: str = "event_type",
                       value: str = "value", width_us: int = _US_DAY,
                       hop_us: int | None = None) -> rd.Dataset:
    """Tumbling or hopping (sliding) event-time windows: per
    (window, key) count / min / max.

    ``hop_us=None`` (or ``hop_us == width_us``) gives tumbling windows.
    With ``hop_us < width_us`` every event lands in exactly
    ``width_us // hop_us`` overlapping hop-aligned windows (the
    replication happens INSIDE the per-batch combiner, before the
    shuffle — the exchange still moves one row per (window, key) per
    block, never per event).

    The wide step is pushed partial: each batch pre-aggregates its own
    (window, key) groups inside ``map_batches`` (the combiner), so the
    global shuffle only moves one row per (window, key) per block —
    at 100 TB the exchange is proportional to the number of distinct
    windows, not the number of events.

    Output: (window_start: timestamp[us], <key>, n_events: int64,
    min_value, max_value: float64).
    """
    hop = width_us if hop_us is None else int(hop_us)
    if hop <= 0 or width_us % hop != 0:
        raise ValueError(
            f"hop_us must divide width_us exactly (got width={width_us}, hop={hop})")
    k = width_us // hop

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = (t // hop) * hop
        if k > 1:
            # replicate each event into its k overlapping windows —
            # flat numpy layout, no per-row Python
            win = (base[:, None]
                   - (np.arange(k, dtype=np.int64) * hop)[None, :]).ravel()
            idx = np.repeat(np.arange(len(df)), k)
            df = pd.DataFrame({key: df[key].to_numpy()[idx],
                               value: df[value].to_numpy()[idx]})
        else:
            win = base
        g = (
            df.assign(__win=win)
            .groupby(["__win", key], sort=False)[value]
            .agg(n_events="size", min_value="min", max_value="max")
            .reset_index()
        )
        g["n_events"] = g["n_events"].astype(np.int64)
        # one shuffle key (Ray groupby is single-column): window|key packed
        g["__gk"] = g["__win"].astype(str) + "|" + g[key].astype(str)
        return g

    def merge(g: pd.DataFrame) -> pa.Table:
        return pa.table({
            "window_start": pa.array(
                np.array([g["__win"].iloc[0]], "datetime64[us]")),
            key: pa.array([g[key].iloc[0]]),
            "n_events": pa.array([int(g["n_events"].sum())], pa.int64()),
            "min_value": pa.array([g["min_value"].min()]),
            "max_value": pa.array([g["max_value"].max()]),
        })

    partials = events.map_batches(partial, batch_format="pandas")
    return partials.groupby("__gk").map_groups(merge, batch_format="pandas")


# ----------------------------------------------------------------------
# shared co-partition machinery (as-of / interval joins)
# ----------------------------------------------------------------------

def _pa_types(ds: rd.Dataset) -> dict[str, pa.DataType]:
    """Column name -> Arrow type, tolerating pandas-block schemas
    (``from_pandas`` inputs) alongside Arrow-block ones."""
    sch = ds.schema()
    out: dict[str, pa.DataType] = {}
    for name, t in zip(sch.names, sch.types):
        if not isinstance(t, pa.DataType):
            dt = np.dtype(t)
            if dt == np.dtype("O"):
                # pandas blocks report strings as object dtype
                t = pa.string()
            else:
                t = pa.from_numpy_dtype(dt)
        out[name] = t
    return out


def _tagged_union(left: rd.Dataset, right: rd.Dataset, key: str, ts: str,
                  lcols: list[str], rcols: list[str],
                  num_buckets: int) -> tuple[rd.Dataset, pa.Schema, pa.Schema]:
    """ONE Dataset carrying both sides: (__key, __ts int64-µs, __side
    int8 [0=right, 1=left], __bucket, <lcols>, r__<rcols>), the other
    side's payload null-padded with *typed* Arrow nulls (no pandas
    int→float pollution). This is the single all-to-all exchange both
    join kernels share."""
    lsch = _pa_types(left)
    rsch = _pa_types(right)

    def make(side: int, own: list[str], own_sch: dict,
             other: list[str], other_sch: dict, other_prefix: str):
        own_prefix = "r__" if side == 0 else ""

        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            k = pc.cast(t[key], pa.int64())
            cols: dict[str, pa.Array | pa.ChunkedArray] = {
                "__key": k,
                "__ts": _ts_us(t[ts]),
                "__side": pa.array(np.full(n, side, np.int8)),
                "__bucket": pa.array(
                    (splitmix64(k.to_numpy().astype(np.uint64))
                     % np.uint64(num_buckets)).astype(np.int64)
                ),
            }
            for c in own:
                cols[own_prefix + c] = t[c]
            for c in other:
                cols[other_prefix + c] = pa.nulls(n, other_sch[c])
            return pa.table(cols)

        return f

    l2 = left.map_batches(make(1, lcols, lsch, rcols, rsch, "r__"),
                          batch_format="pyarrow")
    r2 = right.map_batches(make(0, rcols, rsch, lcols, lsch, ""),
                           batch_format="pyarrow")
    return l2.union(r2), lsch, rsch


def asof_join(left: rd.Dataset, right: rd.Dataset, key: str, ts: str,
              lcols: list[str], rcols: list[str],
              right_tiebreak: str | None = None, strict: bool = False,
              how: str = "inner", num_buckets: int = 32) -> rd.Dataset:
    """As-of join: each left row matches the LATEST right row with the
    same ``key`` and ``right.ts <= left.ts`` (``<`` when ``strict``).
    Right payload columns come back prefixed ``r__``; ``how="inner"``
    drops unmatched left rows, ``how="left"`` keeps them with typed
    nulls.  Ties at equal (key, ts) pick the max ``right_tiebreak``.

    Kernel: within each hash bucket, ONE lexsort of the tagged union by
    (key, ts, tiebreak, side) with rights ordered before lefts at equal
    ts, then ``cumsum(side==right)`` gives, for every left row, the
    rank of the nearest preceding right row — O(n log n), no per-key
    loop, independent of key cardinality.
    """
    assert how in ("inner", "left"), how
    if ts not in lcols:
        lcols = [ts] + lcols
    if key not in lcols:
        lcols = [key] + lcols
    rcols = list(rcols)
    if right_tiebreak is not None and right_tiebreak not in rcols:
        rcols.append(right_tiebreak)
    u, lsch, rsch = _tagged_union(left, right, key, ts, lcols, rcols, num_buckets)
    tb = ("r__" + right_tiebreak) if right_tiebreak is not None else None

    def kernel(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        side = g["__side"].to_numpy(zero_copy_only=False)
        keyv = g["__key"].to_numpy(zero_copy_only=False)
        tsv = g["__ts"].to_numpy(zero_copy_only=False)
        if strict:
            # rights at equal ts must NOT match: order lefts first there
            eff_side = 1 - side
        else:
            eff_side = side
        if tb is not None:
            # tiebreak orders rights among themselves at equal (key, ts)
            # — SUBORDINATE to side (lexsort keys innermost-first).
            # Integer tiebreaks stay int64: a float64 round-trip folds
            # values above 2^53 (64-bit hashed ids!) and would break the
            # repartition-invariant determinism the hash-compare gate
            # needs. Nulls sort BELOW every real value (they lose the
            # max-tiebreak race, even against negatives).
            tb_col = g[tb]
            if pa.types.is_integer(tb_col.type):
                tbv = pc.fill_null(
                    pc.cast(tb_col, pa.int64()), np.iinfo(np.int64).min
                ).to_numpy(zero_copy_only=False)
                tbv = np.where(side == 0, tbv, np.int64(0))
            else:
                tbv = tb_col.to_numpy(zero_copy_only=False).astype(np.float64)
                tbv = np.where(np.isnan(tbv), -np.inf, tbv)
                tbv = np.where(side == 0, tbv, 0.0)
            perm = np.lexsort((tbv, eff_side, tsv, keyv))
        else:
            perm = np.lexsort((eff_side, tsv, keyv))
        sside = side[perm]
        nright = np.cumsum(sside == 0)
        lpos = np.flatnonzero(sside == 1)          # lefts, sorted order
        l_orig = perm[lpos]
        rpos = np.flatnonzero(sside == 0)          # rights, sorted order
        if len(rpos) == 0:
            r_orig = np.zeros(len(l_orig), np.int64)
            valid = np.zeros(len(l_orig), bool)
        else:
            k = nright[lpos]                       # rights at-or-before
            match_sorted = rpos[np.maximum(k - 1, 0)]
            r_orig = perm[match_sorted]
            valid = (k > 0) & (keyv[r_orig] == keyv[l_orig])
        if how == "inner":
            l_orig, r_orig = l_orig[valid], r_orig[valid]
            valid = np.ones(len(l_orig), bool)
        out: dict[str, pa.Array] = {}
        lt = g.take(pa.array(l_orig))
        rt = g.take(pa.array(r_orig))
        for c in lcols:
            out[c] = lt[c].combine_chunks()
        for c in rcols:
            col = rt["r__" + c].combine_chunks()
            if not valid.all():
                col = pc.if_else(pa.array(valid), col,
                                 pa.nulls(len(valid), col.type))
            out["r__" + c] = col
        return pa.table(out)

    return u.groupby("__bucket").map_groups(kernel, batch_format="pyarrow")


def interval_join_agg(left: rd.Dataset, right: rd.Dataset, key: str, ts: str,
                      lcols: list[str], lo_offset_us: int, hi_offset_us: int = 0,
                      num_buckets: int = 32) -> rd.Dataset:
    """Range/interval join reduced at the join site: for every left row,
    the COUNT of right rows with the same ``key`` and
    ``left.ts + lo_offset <= right.ts <= left.ts + hi_offset``
    (both inclusive) — the attribution-window / band-join pattern,
    without ever materializing the joined pairs.

    Kernel: each left row contributes two probes (window lo / window
    hi) to the bucket's single lexsort — tie order lo-probe < right <
    hi-probe so both window edges are inclusive — and the count is a
    difference of two ``cumsum(side==right)`` reads.  Cross-key prefix
    mass cancels in the subtraction, so no per-key bookkeeping exists
    at all.  Output: <lcols> + n_matches:int64.
    """
    if key not in lcols:
        lcols = [key] + lcols
    u, _, _ = _tagged_union(left, right, key, ts, lcols, [], num_buckets)

    def kernel(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        side = g["__side"].to_numpy(zero_copy_only=False)
        keyv = g["__key"].to_numpy(zero_copy_only=False)
        tsv = g["__ts"].to_numpy(zero_copy_only=False)
        l_idx = np.flatnonzero(side == 1)
        r_idx = np.flatnonzero(side == 0)
        nl, nr = len(l_idx), len(r_idx)
        # probes: lo edges (order 0), rights (order 1), hi edges (order 2)
        pk = np.concatenate([keyv[r_idx], keyv[l_idx], keyv[l_idx]])
        pt = np.concatenate([
            tsv[r_idx],
            tsv[l_idx] + np.int64(lo_offset_us),
            tsv[l_idx] + np.int64(hi_offset_us),
        ])
        po = np.concatenate([
            np.ones(nr, np.int8),
            np.zeros(nl, np.int8),
            np.full(nl, 2, np.int8),
        ])
        perm = np.lexsort((po, pt, pk))
        rank = np.empty(len(perm), np.int64)
        rank[perm] = np.arange(len(perm))
        nright = np.cumsum(po[perm] == 1)
        lo_rank = rank[nr:nr + nl]
        hi_rank = rank[nr + nl:]
        counts = nright[hi_rank] - nright[lo_rank]
        lt = g.take(pa.array(l_idx))
        out = {c: lt[c].combine_chunks() for c in lcols}
        out["n_matches"] = pa.array(counts.astype(np.int64))
        return pa.table(out)

    return u.groupby("__bucket").map_groups(kernel, batch_format="pyarrow")


# ----------------------------------------------------------------------
# gap-based sessionization
# ----------------------------------------------------------------------

def sessionize(events: rd.Dataset, key: str = "user_id", ts: str = "ts",
               tiebreak: str = "event_id", gap_us: int = 30 * 60_000_000,
               num_buckets: int = 32) -> rd.Dataset:
    """Split each key's event stream into sessions at inactivity gaps
    STRICTLY longer than ``gap_us``.  One hash shuffle co-locates each
    key's events; the per-bucket kernel is a lexsort (key, ts, tiebreak)
    + diff + cumsum — every session of every key in the bucket in one
    vectorized pass.

    Output: (<key>, session_seq: int64 1-based per key,
    session_start/session_end: timestamp[us], n_events: int64).
    """
    def route(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key], pa.int64()).to_numpy()
        b = (splitmix64(k.astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({
            "__bucket": pa.array(b),
            key: t[key],
            "__ts": _ts_us(t[ts]),
            "__tb": pc.cast(t[tiebreak], pa.int64()),
        })

    def kernel(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        k = g[key].to_numpy(zero_copy_only=False)
        tsv = g["__ts"].to_numpy(zero_copy_only=False)
        tbv = g["__tb"].to_numpy(zero_copy_only=False)
        perm = np.lexsort((tbv, tsv, k))
        ks, tss = k[perm], tsv[perm]
        n = len(ks)
        if n == 0:
            return pa.table({
                key: pa.array([], pa.int64()),
                "session_seq": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.timestamp("us")),
                "session_end": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
            })
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = ks[1:] != ks[:-1]
        brk = new_key.copy()
        brk[1:] |= (tss[1:] - tss[:-1]) > gap_us
        sid = np.cumsum(brk) - 1                      # global session id
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n) - 1
        # 1-based session_seq per key: sid minus sid at the key's first
        # session (forward-filled via maximum.accumulate on starts)
        key_first_sid = np.maximum.accumulate(
            np.where(new_key, sid, -1)
        )
        seq_all = sid - key_first_sid + 1
        return pa.table({
            key: pa.array(ks[starts]),
            "session_seq": pa.array(seq_all[starts].astype(np.int64)),
            "session_start": pc.cast(pa.array(tss[starts]), pa.timestamp("us")),
            "session_end": pc.cast(pa.array(tss[ends]), pa.timestamp("us")),
            "n_events": pa.array((ends - starts + 1).astype(np.int64)),
        })

    routed = events.map_batches(route, batch_format="pyarrow")
    return routed.groupby("__bucket").map_groups(kernel, batch_format="pyarrow")


def rolling_sum(events: rd.Dataset, key: str = "user_id", ts: str = "ts",
                order2: str = "event_id", value: str = "value",
                preceding: int = 3, cents: bool = True) -> rd.Dataset:
    """Per-key rolling window sum — SQL's ``SUM(v) OVER (PARTITION BY
    key ORDER BY ts, id ROWS BETWEEN p PRECEDING AND CURRENT ROW)`` —
    as a distributed sort + sorted-segment pass.

    Values are quantized to exact integers (``floor(v*100 + 0.5)``, the
    same IEEE-double ops numpy and DuckDB run) so block boundaries and
    summation order cannot perturb the sums. Each block computes every
    row whose full window is provably in-block with one vectorized
    cumsum difference; only the first ``preceding`` rows of each
    block's FIRST key segment are uncertain (their window may reach
    into a neighboring block). Every block also emits its last
    segment's ≤``preceding``-row tail; heads recompute driver-side over
    the merged head∪tail sliver set — correct because a head's full
    window is always contained in (its block's earlier heads) ∪ (the
    previous blocks' tails), and O(blocks × preceding) driver state
    regardless of data size.

    Returns Dataset(order2, key, roll_sum_c) — one row per input row."""
    cols = [key, ts, order2, value]
    srt = events.select_columns(cols).sort([key, ts, order2]).materialize()

    def quant(v: np.ndarray) -> np.ndarray:
        return np.floor(v * 100.0 + 0.5).astype(np.int64) if cents else v.astype(np.int64)

    def roll(k: np.ndarray, vc: np.ndarray) -> np.ndarray:
        """Rolling sum with per-key resets: cumsum difference with the
        window start clamped at each key-segment start. Vectorized."""
        cs = np.concatenate([[0], np.cumsum(vc)])
        n = len(vc)
        idx = np.arange(n)
        seg_start = np.zeros(n, dtype=np.int64)
        new = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        seg_start[new] = new
        seg_start = np.maximum.accumulate(seg_start)
        lo = np.maximum(idx - preceding, seg_start)
        return cs[idx + 1] - cs[lo]

    def _first_end(k: np.ndarray) -> int:
        brk = np.flatnonzero(k[1:] != k[:-1])
        return int(brk[0] + 1) if len(brk) else len(k)

    def _last_start(k: np.ndarray) -> int:
        brk = np.flatnonzero(k[1:] != k[:-1])
        return int(brk[-1] + 1) if len(brk) else 0

    def block_certain(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({order2: np.empty(0, np.int64),
                                 key: np.empty(0, np.int64),
                                 "roll_sum_c": np.empty(0, np.int64)})
        k = df[key].to_numpy()
        out = roll(k, quant(df[value].to_numpy()))
        certain = np.ones(len(k), dtype=bool)
        certain[:min(preceding, _first_end(k))] = False
        return pd.DataFrame({order2: df[order2].to_numpy()[certain],
                             key: k[certain], "roll_sum_c": out[certain]})

    def block_slivers(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key: np.empty(0, np.int64),
                              ts: np.empty(0, "datetime64[us]"),
                              order2: np.empty(0, np.int64),
                              "vc": np.empty(0, np.int64),
                              "is_head": np.empty(0, bool)})
        if not len(df):
            return empty
        k = df[key].to_numpy()
        vc = quant(df[value].to_numpy())
        head = np.arange(0, min(preceding, _first_end(k)))
        tail = np.arange(max(_last_start(k), len(k) - preceding), len(k))
        sel = np.unique(np.concatenate([head, tail]))
        return pd.DataFrame({key: k[sel], ts: df[ts].to_numpy()[sel],
                             order2: df[order2].to_numpy()[sel], "vc": vc[sel],
                             "is_head": np.isin(sel, head)})

    certain = srt.map_batches(block_certain, batch_format="pandas",
                              batch_size=None)
    sl = srt.map_batches(block_slivers, batch_format="pandas",
                         batch_size=None).to_pandas()
    if len(sl):
        # a row can be both a head and a tail (single-segment block):
        # keep the head flag when collapsing duplicates
        sl = (sl.sort_values([key, ts, order2, "is_head"])
                .groupby([key, ts, order2], as_index=False, sort=True)
                .agg(vc=("vc", "first"), is_head=("is_head", "any")))
        out = roll(sl[key].to_numpy(), sl["vc"].to_numpy())
        fix = sl[sl["is_head"].to_numpy()].copy()
        fix["roll_sum_c"] = out[sl["is_head"].to_numpy()]
        if len(fix):
            import pyarrow as _pa

            from ..pipelines.graph import tables_dataset
            ft = _pa.Table.from_pandas(
                fix[[order2, key, "roll_sum_c"]].reset_index(drop=True),
                preserve_index=False)
            certain = certain.union(tables_dataset([ft]))
    return certain


def running_total(events: rd.Dataset, key: str = "user_id", ts: str = "ts",
                  order2: str = "event_id", value: str = "value",
                  cents: bool = True) -> rd.Dataset:
    """Per-key cumulative sum — SQL's ``SUM(v) OVER (PARTITION BY key
    ORDER BY ts, id ROWS UNBOUNDED PRECEDING)`` — as two passes over
    the distributed sort, exact in quantized integers.

    Pass 1 emits one tiny *carry* row per block boundary segment (the
    block's first and last key runs — the only runs that can span
    blocks); the driver exclusive-prefix-sums carries per key in block
    order, an O(blocks) state independent of data size. Pass 2 redoes
    the in-block segmented cumsum and adds the block's first-segment
    offset. Rows of segments that start mid-block need no offset (the
    sort makes every key run contiguous).

    Returns Dataset(order2, key, run_sum_c) — one row per input row."""
    cols = [key, ts, order2, value]
    srt = events.select_columns(cols).sort([key, ts, order2]).materialize()

    def quant(v: np.ndarray) -> np.ndarray:
        return np.floor(v * 100.0 + 0.5).astype(np.int64) if cents else v.astype(np.int64)

    def _breaks(k: np.ndarray) -> np.ndarray:
        return np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))

    def carries(df: pd.DataFrame) -> pd.DataFrame:
        """One carry row per boundary segment: (key, segment-first-row
        for per-key ordering, block-first-row as the block id, total)."""
        empty = pd.DataFrame({"k": np.empty(0, np.int64), "sts": np.empty(0, np.int64),
                              "sord": np.empty(0, np.int64), "bts": np.empty(0, np.int64),
                              "bord": np.empty(0, np.int64), "tot": np.empty(0, np.int64),
                              "is_first": np.empty(0, bool)})
        if not len(df):
            return empty
        k = df[key].to_numpy()
        vc = quant(df[value].to_numpy())
        t = df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        o = df[order2].to_numpy()
        bts, bord = int(t[0]), int(o[0])
        brk = _breaks(k)
        fe = int(brk[1]) if len(brk) > 1 else len(k)       # first segment end
        ls = int(brk[-1])                                   # last segment start
        rows = {"k": [int(k[0])], "sts": [bts], "sord": [bord],
                "bts": [bts], "bord": [bord],
                "tot": [int(vc[:fe].sum())], "is_first": [True]}
        if ls >= fe:  # distinct last segment also spans the boundary
            rows["k"].append(int(k[ls]))
            rows["sts"].append(int(t[ls])); rows["sord"].append(int(o[ls]))
            rows["bts"].append(bts); rows["bord"].append(bord)
            rows["tot"].append(int(vc[ls:].sum()))
            rows["is_first"].append(False)
        return pd.DataFrame(rows)

    cr = srt.map_batches(carries, batch_format="pandas", batch_size=None).to_pandas()
    offsets: dict[tuple[int, int, int], int] = {}
    if len(cr):
        # per-key block order = order of each segment's own first row
        # (the block's first row may belong to a different key entirely)
        cr = cr.sort_values(["k", "sts", "sord"]).reset_index(drop=True)
        off = cr.groupby("k")["tot"].cumsum().to_numpy() - cr["tot"].to_numpy()
        fo = cr[cr["is_first"].to_numpy()]
        offsets = {(int(r.k), int(r.bts), int(r.bord)): int(o)
                   for r, o in zip(fo.itertuples(), off[cr["is_first"].to_numpy()]) if o}

    def add_offsets(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({order2: np.empty(0, np.int64),
                                 key: np.empty(0, np.int64),
                                 "run_sum_c": np.empty(0, np.int64)})
        k = df[key].to_numpy()
        vc = quant(df[value].to_numpy())
        cs = np.cumsum(vc)
        brk = _breaks(k)
        lens = np.diff(np.append(brk, len(k)))
        base = np.repeat(cs[brk] - vc[brk], lens)
        cum = cs - base
        bts = int(df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)[0])
        bord = int(df[order2].to_numpy()[0])
        o = offsets.get((int(k[0]), bts, bord), 0)
        if o:
            fe = int(brk[1]) if len(brk) > 1 else len(k)
            cum[:fe] += o
        return pd.DataFrame({order2: df[order2].to_numpy(), key: k, "run_sum_c": cum})

    return srt.map_batches(add_offsets, batch_format="pandas", batch_size=None)


def lag_gap(events: rd.Dataset, key: str = "user_id", ts: str = "ts",
            order2: str = "event_id") -> rd.Dataset:
    """Per-key gap to the previous event in exact integer microseconds —
    SQL's ``epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY key
    ORDER BY ts, id))`` with ``-1`` for each key's first event (kept
    non-null so the int64 column hash-compares cleanly).

    Distributed sort + in-block vectorized diff; only each block's
    FIRST row can need the previous block's last row, so the sliver
    exchange is exactly two rows per block — O(blocks) driver state."""
    cols = [key, ts, order2]
    srt = events.select_columns(cols).sort([key, ts, order2]).materialize()

    def _gaps(k: np.ndarray, t: np.ndarray) -> np.ndarray:
        g = np.empty(len(k), dtype=np.int64)
        g[0] = -1
        if len(k) > 1:
            same = k[1:] == k[:-1]
            g[1:] = np.where(same, t[1:] - t[:-1], -1)
        return g

    def block_certain(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({order2: np.empty(0, np.int64),
                                 key: np.empty(0, np.int64),
                                 "gap_us": np.empty(0, np.int64)})
        k = df[key].to_numpy()
        t = df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = _gaps(k, t)
        return pd.DataFrame({order2: df[order2].to_numpy()[1:], key: k[1:],
                             "gap_us": g[1:]})

    def block_slivers(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key: np.empty(0, np.int64),
                              "t": np.empty(0, np.int64),
                              order2: np.empty(0, np.int64),
                              "is_head": np.empty(0, bool)})
        if not len(df):
            return empty
        k = df[key].to_numpy()
        t = df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        o = df[order2].to_numpy()
        sel = np.unique([0, len(k) - 1])
        return pd.DataFrame({key: k[sel], "t": t[sel], order2: o[sel],
                             "is_head": sel == 0})

    certain = srt.map_batches(block_certain, batch_format="pandas",
                              batch_size=None)
    sl = srt.map_batches(block_slivers, batch_format="pandas",
                         batch_size=None).to_pandas()
    if len(sl):
        sl = (sl.sort_values([key, "t", order2, "is_head"])
                .groupby([key, "t", order2], as_index=False, sort=True)
                .agg(is_head=("is_head", "any")))
        g = _gaps(sl[key].to_numpy(), sl["t"].to_numpy())
        mask = sl["is_head"].to_numpy()
        fix = pd.DataFrame({order2: sl[order2].to_numpy()[mask],
                            key: sl[key].to_numpy()[mask], "gap_us": g[mask]})
        if len(fix):
            import pyarrow as _pa

            from ..pipelines.graph import tables_dataset
            certain = certain.union(tables_dataset(
                [_pa.Table.from_pandas(fix, preserve_index=False)]))
    return certain


_TS_MISSING = np.int64(-1)


def funnel(events: rd.Dataset, stages: list[str], key: str = "user_id",
           ts: str = "ts", type_col: str = "event_type",
           num_buckets: int = 32) -> rd.Dataset:
    """Ordered funnel analysis: per key, the FIRST completion time of
    each stage STRICTLY after the previous stage's completion (greedy
    min-time semantics — the standard funnel definition, exactly
    replayable as chained min() SQL subqueries).

    One hash shuffle co-locates each key's events; the per-bucket
    kernel is one lexsort-free vectorized pass per stage: qualifying
    rows are masked against the previous stage's per-key time (mapped
    back to rows through np.unique's inverse) and folded with
    np.minimum.at — no per-key Python. Missing stages report -1, so
    the output is pure-integer deterministic. Returns
    Dataset(key, stages_completed, t_<stage>_us ...).
    """
    def route(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key], pa.int64()).to_numpy()
        b = (splitmix64(k.astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({
            "__bucket": pa.array(b),
            key: t[key],
            "__ts": _ts_us(t[ts]),
            "__type": t[type_col],
        })

    int64_max = np.iinfo(np.int64).max

    def kernel(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        k = g[key].to_numpy(zero_copy_only=False)
        tsv = g["__ts"].to_numpy(zero_copy_only=False)
        tyv = g["__type"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        cols: dict[str, np.ndarray] = {}
        prev = None
        done = np.zeros(len(uk), dtype=np.int64)
        for j, st in enumerate(stages):
            m = tyv == st
            if j > 0:
                pr = prev[inv]
                m &= (pr != _TS_MISSING) & (tsv > pr)
            cur = np.full(len(uk), int64_max, dtype=np.int64)
            if m.any():
                np.minimum.at(cur, inv[m], tsv[m])
            cur = np.where(cur == int64_max, _TS_MISSING, cur)
            done += (cur != _TS_MISSING).astype(np.int64)
            cols[f"t_{st}_us"] = cur
            prev = cur
        out = {key: pa.array(uk.astype(np.int64)),
               "stages_completed": pa.array(done)}
        out.update({c: pa.array(v) for c, v in cols.items()})
        return pa.table(out)

    routed = events.map_batches(route, batch_format="pyarrow")
    return routed.groupby("__bucket").map_groups(kernel, batch_format="pyarrow")
