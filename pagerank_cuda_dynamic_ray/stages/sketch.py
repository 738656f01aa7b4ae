"""Distributed sketches over Dataset columns.

Unlike library HLLs these are bit-deterministic BY CONSTRUCTION — the
hash is the engine's splitmix64 stream, the register estimate is
computed from an exact integer register sum, and every step is simple
enough to replay in SQL — so a DuckDB oracle can verify the sketch
hash-exactly (estimate AND register digests), not just approximately.

Scale shape: one streaming pass; each block ships at most m register
rows (bucket, rho) — the combiner — into a tiny m-row groupby; the
estimate folds <= m rows on the driver. No full-column shuffle ever.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import splitmix64

_SEED_STRIDE = np.uint64(1) << np.uint64(60)


def _hll_rho(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho): bucket = top p bits, rho = 1 + leading zeros of
    the remaining (64-p)-bit word (= 64-p+1 when the word is 0).
    bit_length via np.frexp — exact for ints < 2^53, hence p >= 11."""
    w = 64 - p
    assert w <= 52, "remainder must fit float64's exact-integer range"
    bucket = (h >> np.uint64(w)).astype(np.int64)
    rem = h & np.uint64((1 << w) - 1)
    _, exp = np.frexp(rem.astype(np.float64))
    rho = np.where(rem == 0, w + 1, w - exp + 1).astype(np.int64)
    return bucket, rho


def hll_registers(
    ds: rd.Dataset, col: str, p: int = 12, seed: int = 0
) -> rd.Dataset:
    """Distributed HLL register build over an integer column: per-block
    np.maximum.at into m registers, emit the hit ones, merge with a
    <= m-row groupby max. Returns Dataset(bucket, rho)."""
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy()
        with np.errstate(over="ignore"):
            h = splitmix64(vals.astype(np.uint64) + np.uint64(seed) * _SEED_STRIDE)
        bucket, rho = _hll_rho(h, p)
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        hit = np.flatnonzero(regs)
        return pa.table({"bucket": pa.array(hit), "rho": pa.array(regs[hit])})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .max("rho")
        .rename_columns({"max(rho)": "rho"})
    )


def hll_estimate(rho_by_bucket: np.ndarray, p: int = 12) -> dict:
    """Estimate from merged registers (rho values of HIT buckets only).

    The register sum is exact-integer (S = V·2^w' + Σ 2^(w'-rho), with
    w' = 64-p+1 so every term is a positive int), then one float
    division — so two engines with equal registers produce the SAME
    double. Small-range linear counting when E <= 2.5m and V > 0;
    the 64-bit large-range correction is unnecessary and omitted."""
    m = 1 << p
    wmax = 64 - p + 1
    rho = np.asarray(rho_by_bucket, dtype=np.int64)
    v_zero = m - len(rho)
    # Python ints: with near-full registers the term sum approaches
    # m·2^(wmax-1)/3 ≈ 2^63.4 and would overflow int64
    s_int = v_zero * (1 << wmax) + sum(1 << int(x) for x in (wmax - rho))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * float(m * m * (1 << wmax)) / float(s_int)
    if e <= 2.5 * m and v_zero > 0:
        e = m * math.log(m / v_zero)
    return {
        "distinct_est": int(round(e)),
        "n_zero_regs": int(v_zero),
        "reg_sum_rho": int(rho.sum()),
    }


def hll_distinct(ds: rd.Dataset, col: str, p: int = 12, seed: int = 0) -> dict:
    """End-to-end distributed distinct-count sketch for one column."""
    regs = hll_registers(ds, col, p, seed).to_pandas()
    # an all-empty input loses the aggregate schema entirely
    rho = regs["rho"].to_numpy() if "rho" in regs.columns else np.empty(0, np.int64)
    return hll_estimate(rho, p)


def hll_distinct_by_key(
    ds: rd.Dataset, key_col: str, col: str, p: int = 12, seed: int = 0
) -> rd.Dataset:
    """GROUPED HyperLogLog: one distinct-count sketch per key (the
    "distinct users per segment" query at sketch cost).

    Scale shape: each block folds its rows into per-(key, bucket)
    register maxima BEFORE the exchange — a block ships at most
    |keys in block| × m rows however many raw rows it holds — and the
    per-key estimate is read off inside ``map_groups`` (merge-group
    rows ∝ m × blocks), never on the driver. Same bit-deterministic
    construction as :func:`hll_distinct`, so a SQL replay of the
    sketch verifies estimates AND integer register digests per key.

    Returns Dataset(key, distinct_est, n_zero_regs, reg_sum_rho).
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy()
        with np.errstate(over="ignore"):
            h = splitmix64(vals.astype(np.uint64) + np.uint64(seed) * _SEED_STRIDE)
        bucket, rho = _hll_rho(h, p)
        df_ = pd.DataFrame({
            key_col: t[key_col].to_numpy(zero_copy_only=False),
            "bucket": bucket, "rho": rho,
        })
        g = df_.groupby([key_col, "bucket"], sort=True)["rho"].max().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def readoff(df_: pd.DataFrame) -> pa.Table:
        rho = df_.groupby("bucket")["rho"].max().to_numpy()
        est = hll_estimate(rho, p)
        return pa.table({
            key_col: pa.array([df_[key_col].iloc[0]]),
            "distinct_est": pa.array([int(est["distinct_est"])], pa.int64()),
            "n_zero_regs": pa.array([int(est["n_zero_regs"])], pa.int64()),
            "reg_sum_rho": pa.array([int(est["reg_sum_rho"])], pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(readoff, batch_format="pandas")
    )


def countmin_registers(
    ds: rd.Dataset,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 0,
    weight_col: str | None = None,
) -> np.ndarray:
    """Count-Min sketch of an integer column: depth x width counters,
    row r bucket = splitmix64(value + (seed·depth + r)·2^60) % width.
    Per-block partial sketches (a (depth·width)-cell bincount) sum into
    the final array on the driver — each block ships depth·width int64s
    regardless of row count. Returns the (depth, width) counter array."""
    cells = depth * width

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy().astype(np.uint64)
        w = (t[weight_col].to_numpy().astype(np.int64)
             if weight_col else np.ones(len(vals), dtype=np.int64))
        flat = np.zeros(cells, dtype=np.int64)
        for r in range(depth):
            with np.errstate(over="ignore"):
                h = splitmix64(vals + np.uint64(seed * depth + r) * _SEED_STRIDE)
            b = (h % np.uint64(width)).astype(np.int64)
            flat[r * width:(r + 1) * width] = np.bincount(b, weights=w, minlength=width)
        idx = np.flatnonzero(flat)
        return pa.table({"cell": pa.array(idx), "n": pa.array(flat[idx])})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .sum("n")
        .rename_columns({"sum(n)": "n"})
        .to_pandas()
    )
    out = np.zeros(cells, dtype=np.int64)
    if "cell" in merged.columns and len(merged):
        out[merged["cell"].to_numpy()] = merged["n"].to_numpy()
    return out.reshape(depth, width)


def countmin_query(
    regs: np.ndarray, values: np.ndarray, seed: int = 0
) -> np.ndarray:
    """Point estimates: min over rows of the value's counter (classic
    CM upper bound — exact when no collision in some row)."""
    depth, width = regs.shape
    est = np.full(len(values), np.iinfo(np.int64).max, dtype=np.int64)
    vals = np.asarray(values).astype(np.uint64)
    for r in range(depth):
        with np.errstate(over="ignore"):
            h = splitmix64(vals + np.uint64(seed * depth + r) * _SEED_STRIDE)
        est = np.minimum(est, regs[r, (h % np.uint64(width)).astype(np.int64)])
    return est


def bloom_build(
    ds: rd.Dataset,
    col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
    seed: int = 0,
) -> np.ndarray:
    """Bloom filter over an integer key column: bit j set iff some row's
    splitmix64(value + (seed·K + j)·2^60) % num_bits hits it. Per-block
    partial bitmaps OR together (boolean max via the same cell-groupby
    combine as Count-Min). Returns a packed uint8 bitmap."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy().astype(np.uint64)
        bits = np.zeros(num_bits, dtype=bool)
        for j in range(num_hashes):
            with np.errstate(over="ignore"):
                h = splitmix64(vals + np.uint64(seed * num_hashes + j) * _SEED_STRIDE)
            bits[(h % np.uint64(num_bits)).astype(np.int64)] = True
        idx = np.flatnonzero(bits)
        return pa.table({"bit": pa.array(idx)})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bit")
        .count()
        .to_pandas()
    )
    bits = np.zeros(num_bits, dtype=bool)
    if "bit" in merged.columns and len(merged):
        bits[merged["bit"].to_numpy()] = True
    return np.packbits(bits)


def bloom_probe(
    ds: rd.Dataset,
    col: str,
    bitmap: np.ndarray,
    num_bits: int,
    num_hashes: int = 4,
    seed: int = 0,
) -> rd.Dataset:
    """Filter rows whose key is (probably) in the filter — the classic
    pre-join pruning stage: the bitmap ships ONCE via the object store
    and every block probes it vectorized. No false negatives."""
    import ray

    bm_ref = ray.put(bitmap)

    def probe(t: pa.Table) -> pa.Table:
        bits = np.unpackbits(ray.get(bm_ref)).view(bool)
        vals = t[col].to_numpy().astype(np.uint64)
        ok = np.ones(len(vals), dtype=bool)
        for j in range(num_hashes):
            with np.errstate(over="ignore"):
                h = splitmix64(vals + np.uint64(seed * num_hashes + j) * _SEED_STRIDE)
            ok &= bits[(h % np.uint64(num_bits)).astype(np.int64)]
        return t.filter(pa.array(ok))

    return ds.map_batches(probe, batch_format="pyarrow")


def grouped_quantiles_hist(
    ds: rd.Dataset, key_col: str, col: str, qs: dict[str, float]
) -> rd.Dataset:
    """Exact per-group quantiles of a bounded-cardinality integer
    column: per-block (key, value, count) partials -> per-key merge
    groups (rows ∝ distinct values × blocks, never raw rows) -> the
    zero-indexed order statistic floor((n-1)·q) read off inside
    map_groups — fully distributed, the driver never folds a histogram.
    Returns Dataset(key, q, value), one row per (key, quantile)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        df_ = pd.DataFrame({key_col: t[key_col].to_numpy(zero_copy_only=False),
                            "value": t[col].to_numpy().astype(np.int64)})
        g = df_.groupby([key_col, "value"], sort=True).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def readoff(df_: pd.DataFrame) -> pa.Table:
        h = df_.groupby("value", sort=True)["cnt"].sum()
        n = int(h.sum())
        cum = h.cumsum().to_numpy()
        values = h.index.to_numpy()
        picks = [int(values[np.searchsorted(cum, int(np.floor((n - 1) * p)) + 1)])
                 for p in qs.values()]
        return pa.table({key_col: pa.array([df_[key_col].iloc[0]] * len(qs)),
                         "q": pa.array(list(qs.keys()), pa.string()),
                         "value": pa.array(np.array(picks, dtype=np.int64))})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(readoff, batch_format="pandas")
    )


def binned_quantiles(
    ds: rd.Dataset,
    col: str,
    qs: dict[str, float],
    lo: float,
    hi: float,
    nbins: int = 1000,
) -> "pa.Table":
    """Approximate quantiles for an UNBOUNDED double column via a
    fixed-width histogram sketch (the deterministic, SQL-replayable
    stand-in for a t-digest): bin = clip(floor((v-lo)/w), 0, nbins-1),
    per-block bincount partials -> groupby sum (<= nbins rows per
    block, ever), order-statistic read-off per quantile. Out-of-range
    values clip into the edge bins. Error <= one bin width; both edges
    of the winning bin are reported. Bin arithmetic is the same double
    expression on both engines, so results hash-match exactly."""
    w = (hi - lo) / nbins

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy().astype(np.float64)
        v = v[~np.isnan(v)]  # NaN would floor/clip into an arbitrary bin; SQL drops NULLs
        b = np.clip(np.floor((v - lo) / w), 0, nbins - 1).astype(np.int64)
        bins, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(bins), "cnt": pa.array(cnt.astype(np.int64))})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin").sum("cnt").rename_columns({"sum(cnt)": "cnt"})
        .to_pandas().sort_values("bin")
    )
    n = int(hist["cnt"].sum())
    if n == 0:
        # empty (or all-NaN) input: cum is empty and searchsorted would
        # IndexError on bins[0] — report no rows instead of crashing
        return pa.table({
            "q": pa.array([], type=pa.string()),
            "bin": pa.array([], type=pa.int64()),
            "lo_edge": pa.array([], type=pa.float64()),
            "hi_edge": pa.array([], type=pa.float64()),
            "rank": pa.array([], type=pa.int64()),
        })
    cum = hist["cnt"].cumsum().to_numpy()
    bins = hist["bin"].to_numpy()
    out_q, out_b, out_lo, out_hi, out_rank = [], [], [], [], []
    for label, q in qs.items():
        rank = int(np.floor((n - 1) * float(q)))
        b = int(bins[np.searchsorted(cum, rank + 1)])
        out_q.append(label)
        out_b.append(b)
        out_lo.append(lo + b * w)
        out_hi.append(lo + (b + 1) * w)
        out_rank.append(rank)
    return pa.table({
        "q": pa.array(out_q, type=pa.string()),
        "bin": pa.array(out_b, type=pa.int64()),
        "lo_edge": pa.array(out_lo, type=pa.float64()),
        "hi_edge": pa.array(out_hi, type=pa.float64()),
        "rank": pa.array(out_rank, type=pa.int64()),
    })


def exact_quantiles_hist(
    ds: rd.Dataset, col: str, qs: dict[str, float]
) -> rd.Dataset:
    """Exact quantiles of a bounded-cardinality integer column via a
    distributed histogram: per-block (value, count) partials -> groupby
    sum (rows ∝ distinct values, not rows) -> the quantile read-off
    folds the tiny histogram on the driver. The quantile convention is
    the zero-indexed order statistic floor((n-1)·q) — SQL-replayable
    with one row_number. Returns Dataset(q, value) in qs-label order.

    Assumes |distinct(col)| is small enough for one worker (true for
    char/token-length style columns at any corpus size); for unbounded
    doubles use a t-digest-style bucketer instead."""

    def partial(t: pa.Table) -> pa.Table:
        vals, cnt = np.unique(t[col].to_numpy(), return_counts=True)
        return pa.table({"value": pa.array(vals.astype(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("value")
        .sum("cnt")
        .rename_columns({"sum(cnt)": "cnt"})
        .to_pandas()
        .sort_values("value")
    )
    n = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum().to_numpy()
    values = hist["value"].to_numpy()
    out_q, out_v = [], []
    for label, q in qs.items():
        rank = int(np.floor((n - 1) * float(q)))
        out_q.append(label)
        out_v.append(int(values[np.searchsorted(cum, rank + 1)]))
    from ..pipelines.graph import tables_dataset
    return tables_dataset([pa.table({"q": pa.array(out_q, type=pa.string()),
                                     "value": pa.array(out_v, type=pa.int64())})])


# ----------------------------------------------------------------------
# exact heavy hitters (sharded candidate generation + exact verify)
# ----------------------------------------------------------------------

def heavy_hitter_tokens(docs: rd.Dataset, k: int = 100,
                        text_col: str = "text",
                        candidate_limit: int = 1_000_000) -> rd.Dataset:
    """Exact frequent tokens: every whitespace token whose global count
    STRICTLY exceeds ``n_tokens / k`` (the classic hot-term /
    boilerplate-marker detector), with its exact count.

    Two tokenize passes, no corpus-scale shuffle — the point of the
    operator vs :func:`~..sampling.vocabulary`'s full distinct-token
    groupby (at 100 TB the distinct-token space is billions of keys;
    this op's only exchange is bounded by ``blocks x k``):

    * **Pass 1 (candidates)**: per block, exact token counts
      (``np.unique``); keep tokens with ``count * k > block_n``. By
      pigeonhole a token above the global rate must be above the
      per-block rate in at least one block, so the union of per-block
      survivors (< k each) is a lossless candidate superset under ANY
      partitioning. Each block also ships its token total (one scalar
      row). The union reaches the driver gated by ``candidate_limit``
      and is broadcast back sorted via ``ray.put``.
    * **Pass 2 (verify)**: per block, exact counts of candidate tokens
      only (vectorized ``searchsorted`` membership), folded by a tiny
      groupby over <= blocks x |candidates| partial rows; the final
      filter keeps ``count * k > n``.

    Deterministic and partition-invariant: the output depends only on
    exact global counts and n. Returns Dataset(token, cnt), count
    descending then token ascending."""
    import pandas as pd

    import ray

    def pass1(t: pa.Table) -> pa.Table:
        texts = pd.Series(t[text_col].to_pandas()).fillna("")
        flat = texts.str.findall(r"\S+").explode().dropna()
        bn = len(flat)
        if not bn:
            return pa.table({"token": pa.array([], pa.string()),
                             "bn": pa.array([], pa.int64())})
        tok, cnt = np.unique(flat.to_numpy(), return_counts=True)
        keep = cnt * k > bn
        # survivors + one null-token row carrying the block's token total
        return pa.table({
            "token": pa.array(tok[keep].tolist() + [None], pa.string()),
            "bn": pa.array(np.concatenate([np.zeros(int(keep.sum()), np.int64),
                                           [np.int64(bn)]])),
        })

    part = docs.map_batches(pass1, batch_format="pyarrow").materialize()
    n_cand = part.count()
    if n_cand > candidate_limit:
        raise ValueError(
            f"heavy_hitter_tokens: {n_cand} candidate rows exceed "
            f"candidate_limit={candidate_limit}; raise k or the limit")
    pdf = part.to_pandas()
    n_tokens = int(pdf["bn"].sum())
    cands = np.sort(pdf["token"].dropna().unique().astype("U"))
    if n_tokens == 0 or len(cands) == 0:
        return rd.from_arrow(pa.table({"token": pa.array([], pa.string()),
                                       "cnt": pa.array([], pa.int64())}))
    cref = ray.put(cands)

    def pass2(t: pa.Table) -> pa.Table:
        texts = pd.Series(t[text_col].to_pandas()).fillna("")
        flat = texts.str.findall(r"\S+").explode().dropna()
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        cs = ray.get(cref)
        tok, cnt = np.unique(flat.to_numpy().astype("U"), return_counts=True)
        pos = np.searchsorted(cs, tok).clip(0, len(cs) - 1)
        hit = cs[pos] == tok
        return pa.table({"token": pa.array(tok[hit]),
                         "cnt": pa.array(cnt[hit].astype(np.int64))})

    totals = (docs.map_batches(pass2, batch_format="pyarrow")
              .groupby("token").sum("cnt")
              .rename_columns({"sum(cnt)": "cnt"}))

    def fin(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater(pc.multiply(t["cnt"], k), n_tokens))

    return (totals.map_batches(fin, batch_format="pyarrow")
            .sort(["cnt", "token"], descending=[True, False]))
