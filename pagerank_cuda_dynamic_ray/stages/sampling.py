"""Deterministic sampling / splitting stages for training-data curation.

Every operator keys its randomness on ``splitmix64(id + seed·2^60)`` —
a pure function of the row, so results are independent of partitioning,
block order and cluster size, and a DuckDB oracle can replay them
exactly (the engine's seed-offset convention: additive 2^60 stream
offsets keep distinct seeds in distinct splitmix streams).

All stages are stateless ``map_batches`` transforms over pyarrow
batches (zero-copy from the object store); the only shuffle in the
family is ``sample_per_key``'s per-key merge, whose input is already
combiner-reduced to <= k rows per (key, block).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import splitmix64

_SEED_STRIDE = np.uint64(1) << np.uint64(60)
_TWO64 = float(2**64)


def _row_hash(ids: np.ndarray, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return splitmix64(
            ids.astype(np.uint64) + np.uint64(seed) * _SEED_STRIDE
        )


def hash_split(
    ds: rd.Dataset,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
) -> rd.Dataset:
    """Add a ``split`` column assigning each row to a named fraction
    (e.g. train/val/test) by hash threshold: row r lands in the bucket
    whose cumulative-weight interval contains splitmix64(r.id)/2^64.
    Deterministic per row — re-runs, re-partitions and late-arriving
    shards all agree, which is what makes the split safe to recompute
    instead of persist at 100 TB."""
    total = float(sum(weights.values()))
    names = list(weights)
    # integer thresholds: cum_i * 2^64, clamped to the uint64 domain in
    # PYTHON ints — float(2^64) - 1 == 2^64, so a float-domain clamp
    # would overflow the uint64 cast for the last bucket
    edges = np.cumsum([weights[k] / total for k in names])
    thresholds = np.array(
        [min(int(round(float(e) * _TWO64)), 2**64 - 1) for e in edges], dtype=np.uint64
    )
    names_arr = np.asarray(names, dtype=object)

    def assign(t: pa.Table) -> pa.Table:
        h = _row_hash(t[id_col].to_numpy(), seed)
        idx = np.searchsorted(thresholds, h, side="right")
        # h == max threshold lands in the last bucket
        idx = np.minimum(idx, len(names_arr) - 1)
        return t.append_column("split", pa.array(names_arr[idx], type=pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def stratified_sample(
    ds: rd.Dataset,
    rates: dict[str, float],
    key_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 1,
    default_rate: float = 0.0,
) -> rd.Dataset:
    """Per-stratum Bernoulli sampling at exact deterministic rates:
    keep row r of stratum s iff splitmix64(r.id) < rates[s]·2^64.
    A pure filter — no shuffle, no state; rebalancing a skewed corpus
    (e.g. downsample the dominant language) costs one streaming pass."""
    def _thr(rate: float) -> int:
        # clamp in PYTHON ints (float 2^64 - 1 == 2^64 would overflow)
        return min(int(round(max(0.0, min(1.0, rate)) * _TWO64)), 2**64 - 1)

    keys = np.asarray(list(rates), dtype=object)
    thr = np.array([_thr(rates[k]) for k in keys], dtype=np.uint64)
    dflt = np.uint64(_thr(default_rate))
    order = np.argsort(keys)
    keys_sorted, thr_sorted = keys[order], thr[order]

    def keep(t: pa.Table) -> pa.Table:
        h = _row_hash(t[id_col].to_numpy(), seed)
        k = t[key_col].to_numpy(zero_copy_only=False).astype(object)
        pos = np.searchsorted(keys_sorted, k)
        pos = np.minimum(pos, len(keys_sorted) - 1)
        known = keys_sorted[pos] == k
        row_thr = np.where(known, thr_sorted[pos], dflt)
        return t.filter(pa.array(h < row_thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def temperature_resample(
    ds: rd.Dataset,
    alpha: float = 0.5,
    key_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 7,
) -> rd.Dataset:
    """Temperature-flattening resample (the multilingual-pretraining
    head-downsampler, Devlin et al. 2019 §A / XLM-R style): per-key
    keep rate ``(c_min / c_key)^(1-alpha)`` — the rarest key keeps
    everything, heads are Bernoulli-downsampled toward a flattened
    distribution; ``alpha=1`` keeps all rows, ``alpha→0`` flattens to
    the rarest key's size. Pass 1 is a distinct-key-sized distributed
    count (O(keys) driver state); pass 2 is a pure deterministic hash
    filter — no shuffle, partitioning-invariant, SQL-replayable.
    Thresholds use floor (not round) so the SQL oracle's
    ``floor(pow(...)*2^64)`` computes the identical integer."""
    cnt = ds.groupby(key_col).count().to_pandas()
    if not len(cnt):
        return ds  # empty corpus: nothing to resample
    keys = cnt[key_col].to_numpy().astype(object)
    c = cnt["count()"].to_numpy(np.float64)
    cmin = float(c.min())
    thr = np.array(
        [min(int(np.floor((cmin / x) ** (1.0 - alpha) * 2.0**64)), 2**64 - 1)
         for x in c], dtype=np.uint64)
    order = np.argsort(keys)
    keys_sorted, thr_sorted = keys[order], thr[order]

    def keep(t: pa.Table) -> pa.Table:
        h = _row_hash(t[id_col].to_numpy(), seed)
        k = t[key_col].to_numpy(zero_copy_only=False).astype(object)
        pos = np.minimum(np.searchsorted(keys_sorted, k),
                         len(keys_sorted) - 1)
        known = keys_sorted[pos] == k
        row_thr = np.where(known, thr_sorted[pos], np.uint64(0))
        return t.filter(pa.array(h < row_thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def _topk_by_hash(t: pa.Table, key_col: str, k: int, h: np.ndarray,
                  ids: np.ndarray) -> pa.Table:
    """Rows with the k smallest (hash, id) per key value — one lexsort,
    no per-key Python loop. Ties break by id, never by block position,
    so the result is partitioning-invariant."""
    keyv = t[key_col].to_numpy(zero_copy_only=False)
    codes, inv = np.unique(keyv.astype(object), return_inverse=True)
    order = np.lexsort((ids, h, inv))
    seg_starts = np.searchsorted(inv[order], np.arange(len(codes)))
    rank = np.arange(len(order)) - np.repeat(seg_starts, np.diff(np.append(seg_starts, len(order))))
    return t.take(pa.array(np.sort(order[rank < k])))


def sample_per_key(
    ds: rd.Dataset,
    k: int,
    key_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 2,
) -> rd.Dataset:
    """Uniform-without-replacement sample of exactly min(k, |stratum|)
    rows per key: the k smallest splitmix64(id) per key (a deterministic
    reservoir). Two phases: a per-block partial top-k combiner (<= k
    rows per (key, block) ever leave a block), then a per-key merge —
    the shuffle moves O(keys · k · blocks), never the corpus."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        return _topk_by_hash(t, key_col, k, _row_hash(ids, seed), ids)

    merge = partial

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge, batch_format="pyarrow")
    )


def topk_per_key(
    ds: rd.Dataset,
    k: int,
    key_col: str,
    val_col: str,
    id_col: str,
    descending: bool = True,
) -> rd.Dataset:
    """Top-k rows per key by (value, id) — the windowed
    ``row_number() OVER (PARTITION BY key ORDER BY val)`` filter as a
    two-phase combine, same shape as sample_per_key: a per-block
    partial top-k (<= k rows per (key, block) ever leave a block),
    then a per-key merge. Ties break by id, so the cut is
    partitioning-invariant. Float negation is exact, so descending
    order via ``-val`` matches SQL's DESC bit-for-bit."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        vals = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return _topk_by_hash(t, key_col, k, -vals if descending else vals, ids)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(partial, batch_format="pyarrow")
    )


def mode_per_key(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
) -> rd.Dataset:
    """Per-key mode: the most frequent value per key with its count
    (ties break to the SMALLEST value, so the result is deterministic
    and partitioning-invariant). Combiner shape: each block ships one
    (key, val, n) partial per distinct pair — never raw rows — then a
    per-key merge sums partials and takes the argmax (merge groups are
    bounded by distinct-values × blocks)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        df_ = pd.DataFrame({key_col: t[key_col].to_numpy(zero_copy_only=False),
                            val_col: t[val_col].to_numpy(zero_copy_only=False)})
        g = df_.groupby([key_col, val_col], sort=True).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(df_: pd.DataFrame) -> pa.Table:
        s = df_.groupby(val_col, sort=True)["n"].sum()
        arr = s.to_numpy()
        i = int(np.argmax(arr))  # values sorted ascending: first max = smallest
        return pa.table({key_col: pa.array([df_[key_col].iloc[0]]),
                         val_col: pa.array([s.index[i]]),
                         "n": pa.array([int(arr[i])], pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge, batch_format="pandas")
    )


def vocabulary(
    ds: rd.Dataset,
    top_n: int = 100,
    text_col: str = "text",
) -> rd.Dataset:
    """Global top-N whitespace tokens by frequency (ties broken by token
    ascending). Per-block partial counts (np.unique — the combiner: a
    block ships its distinct tokens, not its token stream) -> small
    groupby sum -> global sort + limit. Returns Dataset(token, n)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        texts = pd.Series(t[text_col].to_pandas()).fillna("")
        flat = texts.str.findall(r"\S+").explode().dropna()
        if not len(flat):
            return pa.table({"token": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        tok, cnt = np.unique(flat.to_numpy(), return_counts=True)
        return pa.table({"token": pa.array(tok), "n": pa.array(cnt.astype(np.int64))})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )
    return counts.sort(["n", "token"], descending=[True, False]).limit(top_n)


def tfidf_top_terms(
    ds: rd.Dataset,
    k: int = 5,
    n_docs: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
) -> rd.Dataset:
    """Top-k whitespace terms per document by tf·idf, idf = ln(N/df).

    Shape: explode to (doc, token, tf) -> per-block df partials + small
    groupby (the document-frequency side — ships distinct tokens, not
    the token stream) -> distributed hash join back on token -> per-doc
    top-k (groupby doc_id, one lexsort per group batch). The exploded
    stream is recomputed for the join rather than cached: at corpus
    scale a cheap second tokenize pass beats pinning the exploded
    corpus in the object store.

    Scores are quantized to round(tf·ln(N/df)·1e6) int64 so results are
    exactly comparable (and hash-verifiable) across engines; ties break
    by token ascending. Returns Dataset(doc_id, token, tfidf_e6)."""
    import pandas as pd

    if n_docs is None:
        n_docs = ds.count()
    n_f = float(n_docs)

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        texts = pd.Series(t[text_col].to_pandas()).fillna("")
        toks = texts.str.findall(r"\S+")
        lens = toks.str.len().to_numpy().astype(np.int64)
        if not lens.sum():
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "token": pa.array([], type=pa.string()),
                             "tf": pa.array([], type=pa.int64())})
        grp = (
            pd.DataFrame({id_col: np.repeat(ids, lens),
                          "token": toks.explode().dropna().to_numpy()})
            .groupby([id_col, "token"], sort=True).size().reset_index(name="tf")
        )
        return pa.table({id_col: pa.array(grp[id_col].to_numpy()),
                         "token": pa.array(grp["token"].to_numpy(dtype=object)),
                         "tf": pa.array(grp["tf"].to_numpy(dtype=np.int64))})

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    # document frequency: each (doc, token) row is globally unique (a doc
    # lives in exactly one batch), so df = row count per token
    def df_partial(t: pa.Table) -> pa.Table:
        tok, cnt = np.unique(t["token"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"token": pa.array(tok, type=pa.string()),
                         "df": pa.array(cnt.astype(np.int64))})

    dft = (
        exploded.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .sum("df")
        .rename_columns({"sum(df)": "df"})
        .materialize()
    )

    # Broadcast-df fast path (size-gated): the document-frequency table
    # is O(distinct tokens) — when it fits a broadcast budget, ship it
    # once via ray.put and finish per-doc top-k INSIDE one map_batches
    # pass (a doc's exploded rows never leave their block), skipping
    # both the token hash join and the per-doc map_groups whose per-
    # group pandas construction dominates at many small groups. Past
    # the gate (corpus-scale vocabularies), the distributed join plan
    # below is the 100-TB path.
    if dft.size_bytes() <= (64 << 20):
        vocab_pdf = dft.to_pandas()
        vtok = vocab_pdf["token"].to_numpy(dtype="U")
        vorder = np.argsort(vtok, kind="stable")
        vref = ray.put((vtok[vorder], vocab_pdf["df"].to_numpy(np.int64)[vorder]))

        def topk_local(t: pa.Table) -> pa.Table:
            grp = explode(t)
            ids = grp[id_col].to_numpy()
            toks = grp["token"].to_numpy(zero_copy_only=False).astype("U")
            tf = grp["tf"].to_numpy().astype(np.float64)
            vt, vdf = ray.get(vref)
            dfv = vdf[np.searchsorted(vt, toks)].astype(np.float64)
            score = np.round(tf * np.log(n_f / dfv) * 1e6).astype(np.int64)
            order = np.lexsort((toks, -score, ids))
            ids_o = ids[order]
            # first k rows of each doc segment, vectorized
            _, starts, cnts = np.unique(ids_o, return_index=True, return_counts=True)
            take = np.minimum(cnts, k)
            offs = (np.repeat(starts, take)
                    + np.arange(int(take.sum()))
                    - np.repeat(np.cumsum(take) - take, take))
            sel = order[offs]
            return pa.table({
                id_col: grp[id_col].take(pa.array(sel)),
                "token": grp["token"].take(pa.array(sel)),
                "tfidf_e6": pa.array(score[sel]),
            })

        return ds.map_batches(topk_local, batch_format="pyarrow")

    joined = exploded.join(
        dft, "inner", num_partitions, on=("token",)
    )

    def topk(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy().astype(np.float64)
        df = t["df"].to_numpy().astype(np.float64)
        score = np.round(tf * np.log(n_f / df) * 1e6).astype(np.int64)
        toks = t["token"].to_numpy(zero_copy_only=False)
        order = np.lexsort((toks, -score))[:k]
        return pa.table({
            id_col: t[id_col].take(pa.array(order)),
            "token": t["token"].take(pa.array(order)),
            "tfidf_e6": pa.array(score[order]),
        })

    return joined.groupby(id_col).map_groups(topk, batch_format="pyarrow")


def inverted_index(
    ds: rd.Dataset,
    k: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Capped inverted index: per whitespace token, its document
    frequency and the ``k`` smallest doc ids containing it (CSV string,
    ascending — a string so the driver's hash-compare gate covers the
    posting values directly).

    Combiner shape: each block ships, per distinct token, ONE row
    carrying (partial df, per-block smallest-k postings list) — never
    the raw (token, doc) pair stream — so the shuffle is bounded by
    distinct-tokens-per-block × k. The global smallest-k is a subset of
    the union of per-block smallest-k, so the merge is exact. Assumes
    one row per document (the documents-table contract); the per-token
    merge groups are tiny (≤ blocks rows each).
    """
    import pandas as pd

    def partial(df_: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        empty = pa.table({"token": pa.array([], pa.string()),
                          "pdf": pa.array([], pa.int64()),
                          "ids": pa.array([], pa.binary())})
        texts = df_[text_col].fillna("")
        s = pd.Series(texts.str.findall(r"\S+").to_numpy(),
                      index=df_[id_col].to_numpy(np.int64)).explode().dropna()
        if not len(s):
            return empty
        pairs = (pd.DataFrame({"doc": s.index.to_numpy(np.int64),
                               "token": s.to_numpy()})
                 .drop_duplicates().sort_values(["token", "doc"]))
        tok = pairs["token"].to_numpy()
        doc = pairs["doc"].to_numpy(np.int64)
        u, start, cnt = np.unique(tok, return_index=True, return_counts=True)
        take = np.minimum(cnt, k)
        # flat positions of each token's first `take` docs — no per-token loop
        offs = (np.repeat(start, take)
                + np.arange(int(take.sum())) - np.repeat(np.cumsum(take) - take, take))
        ids_flat = doc[offs]
        bounds = np.concatenate([[0], np.cumsum(take)])
        # Arrow block with postings packed as binary (int64 LE): pandas
        # object-column blocks through a groupby shuffle are ~12× slower
        return pa.table({
            "token": pa.array(u, pa.string()),
            "pdf": pa.array(cnt.astype(np.int64)),
            "ids": pa.array([ids_flat[bounds[i]:bounds[i + 1]].tobytes()
                             for i in range(len(u))], pa.binary()),
        })

    def merge(g: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        ids = np.sort(np.concatenate(
            [np.frombuffer(x, dtype=np.int64) for x in g["ids"]]))[:k]
        return pa.table({
            "token": pa.array([g["token"].iloc[0]], pa.string()),
            "df": pa.array([int(g["pdf"].sum())], pa.int64()),
            "postings": pa.array([",".join(map(str, ids.tolist()))], pa.string()),
        })

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("token").map_groups(merge, batch_format="pandas")


def global_rank_ntile(
    ds: rd.Dataset,
    value_col: str,
    id_col: str,
    tiles: int = 10,
    out_cols: tuple[str, str] = ("rn", "tile"),
) -> rd.Dataset:
    """Exact GLOBAL window functions ``row_number() OVER (ORDER BY
    value, id)`` and ``NTILE(k)`` over the same order — without a
    global sort-then-sequential-number pass.

    Two-level design (the reference's scan pattern, `_vector.hxx:
    1364-1538`, lifted to a cluster): (1) a per-block (value, count)
    combiner builds the tiny distinct-value histogram whose exclusive
    cumsum gives every value's global base rank — broadcast once via
    ``ray.put``; (2) rows shuffle ONCE keyed by value and each
    ``map_groups`` group ranks its ids locally (argsort) on top of the
    broadcast base. Shuffle bytes ∝ rows (same as any global sort) but
    the only sequential state — the offset table — is O(distinct
    values), so the numbering itself never serializes. NTILE uses the
    SQL split: with n rows and k tiles the first n%k tiles take
    ceil(n/k) rows (1-based tile ids).

    Requires unique ids within a value group for a deterministic
    total order (true for primary-key id columns). Returns
    Dataset(id, value, rn [1-based], tile).
    """
    import pandas as pd
    import ray

    rn_col, tile_col = out_cols

    def hist_partial(t: pa.Table) -> pa.Table:
        vals, cnt = np.unique(t[value_col].to_numpy(), return_counts=True)
        return pa.table({"value": pa.array(vals.astype(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("value").sum("cnt").rename_columns({"sum(cnt)": "cnt"})
        .to_pandas().sort_values("value")
    )
    values = hist["value"].to_numpy(np.int64)
    counts = hist["cnt"].to_numpy(np.int64)
    n_total = int(counts.sum())
    base = np.concatenate([[0], np.cumsum(counts)[:-1]])
    base_ref = ray.put((values, base))
    q, r = divmod(n_total, max(tiles, 1))
    cut = r * (q + 1)

    def rank_group(df_: pd.DataFrame) -> "pa.Table":
        vals_b, base_b = ray.get(base_ref)
        v = np.int64(df_[value_col].iloc[0])
        b = int(base_b[np.searchsorted(vals_b, v)])
        order = np.argsort(df_[id_col].to_numpy(), kind="stable")
        rk = np.empty(len(df_), dtype=np.int64)
        rk[order] = b + np.arange(len(df_), dtype=np.int64)
        if q == 0:
            tile = rk + 1  # more tiles than rows: SQL gives 1 row/tile
        else:
            tile = np.where(rk < cut, rk // (q + 1), r + (rk - cut) // q) + 1
        return pa.table({
            id_col: pa.array(df_[id_col].to_numpy()),
            value_col: pa.array(df_[value_col].to_numpy()),
            rn_col: pa.array(rk + 1),
            tile_col: pa.array(tile.astype(np.int64)),
        })

    return ds.groupby(value_col).map_groups(rank_group, batch_format="pandas")


def token_counts(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Global whitespace-token occurrence counts (the un-limited form of
    ``vocabulary``): per-block np.unique combiner -> groupby sum.
    Returns Dataset(token, n)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        texts = pd.Series(t[text_col].to_pandas()).fillna("")
        flat = texts.str.findall(r"\S+").explode().dropna()
        if not len(flat):
            return pa.table({"token": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        tok, cnt = np.unique(flat.to_numpy(), return_counts=True)
        return pa.table({"token": pa.array(tok), "n": pa.array(cnt.astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("token").sum("n").rename_columns({"sum(n)": "n"}))


def cooccurrence_pmi(
    ds: rd.Dataset,
    window: int = 4,
    top_k: int = 50,
    text_col: str = "text",
) -> "pa.Table":
    """Top-k token co-occurrence pairs by count, with pointwise mutual
    information.

    A pair = two tokens at positions (i, j) of the same document with
    1 <= j - i <= window, unordered (lexicographic (lo, hi)); every
    occurrence counts. Per-block combiner ships (pair, count) uniques;
    one groupby-sum shuffle; selection is pure-integer (count desc, pair
    asc) BEFORE any float math, so the winner set is exactly
    reproducible. PMI then derives from integer sufficient statistics
    (pair count, unigram counts, corpus totals):
    pmi = ln(n·T_u·T_u / (c_a·c_b·T_p)), quantized to 1e-6.

    The driver touches only O(top_k) rows — pair counts, unigram counts
    and both totals stay distributed.
    """
    import pandas as pd

    def pair_partial(t: pa.Table) -> pa.Table:
        texts = pd.Series(t[text_col].to_pandas()).fillna("")
        lists = texts.str.findall(r"\S+").to_numpy()
        empty = pa.table({"pair": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if not len(lists):
            return empty
        lens = np.fromiter((len(x) for x in lists), np.int64, len(lists))
        if lens.sum() == 0:
            return empty
        flat = np.concatenate([np.asarray(x, object) for x in lists if len(x)])
        docidx = np.repeat(np.arange(len(lists)), lens)
        # block-local token dictionary: ids are order-isomorphic to the
        # strings (np.unique sorts), so min/max by id == lexicographic
        # min/max by token — the pair key becomes ONE int64 and the
        # hot counting path never touches Python string concatenation
        toks_u, inv = np.unique(flat, return_inverse=True)
        kcard = np.int64(len(toks_u))
        keys = []
        for d in range(1, window + 1):
            if len(flat) <= d:
                break
            m = docidx[:-d] == docidx[d:]
            a, b = inv[:-d][m], inv[d:][m]
            keys.append(np.minimum(a, b) * kcard + np.maximum(a, b))
        if not keys:
            return empty
        u, c = np.unique(np.concatenate(keys), return_counts=True)
        pair = toks_u[u // kcard] + " " + toks_u[u % kcard]
        return pa.table({"pair": pa.array(pair.astype(str)),
                         "n": pa.array(c.astype(np.int64))})

    pairs = (ds.map_batches(pair_partial, batch_format="pyarrow")
             .groupby("pair").sum("n").rename_columns({"sum(n)": "n"})
             .materialize())
    t_p = int(pairs.sum("n") or 0)
    top = pairs.sort(["n", "pair"], descending=[True, False]).limit(top_k).to_pandas()

    uni = token_counts(ds, text_col).materialize()
    t_u = int(uni.sum("n") or 0)
    toks_a = top["pair"].str.split(" ", n=1).str[0]
    toks_b = top["pair"].str.split(" ", n=1).str[1]
    need = set(toks_a) | set(toks_b)

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_in(t["token"], pa.array(sorted(need), pa.string())))

    cnt = uni.map_batches(keep, batch_format="pyarrow").to_pandas()
    lut = dict(zip(cnt["token"], cnt["n"].astype(int)))
    n = top["n"].astype(int)
    c_a = toks_a.map(lut).astype(int)
    c_b = toks_b.map(lut).astype(int)
    import math
    pmi = [int(round(math.log((float(nn) * t_u * t_u) / (float(ca) * cb * t_p)) * 1e6))
           for nn, ca, cb in zip(n, c_a, c_b)]
    return pa.table({
        "pair": pa.array(top["pair"], pa.string()),
        "n": pa.array(n.to_numpy(np.int64)),
        "c_a": pa.array(c_a.to_numpy(np.int64)),
        "c_b": pa.array(c_b.to_numpy(np.int64)),
        # integer corpus totals: with (n, c_a, c_b, t_u, t_p) the PMI is
        # fully determined, so cross-engine checks can stay pure-integer
        # (ln/round are NOT bit-portable across libm builds)
        "t_u": pa.array(np.full(len(n), t_u, np.int64)),
        "t_p": pa.array(np.full(len(n), t_p, np.int64)),
        "pmi_e6": pa.array(np.array(pmi, np.int64)),
    })
