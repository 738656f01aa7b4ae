"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the exact baseline: the query matrix is
broadcast once (``ray.put``), each batch computes one matmul block and
emits per-batch top-k partials (combiner), and a final tiny groupby
merges partials — no full materialization of the score matrix.
The LSH-bucketed variant prunes candidates with random-hyperplane
buckets (the 100 TB path: only matching buckets are scanned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import splitmix64
from ..state import kernels as K


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _matrix(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    return pdf["vec_id"].to_numpy(), _normalize(np.stack(pdf["embedding"].to_list()).astype(np.float64))


def _embed_matrix(tbl: pa.Table, col: str = "embedding") -> np.ndarray:
    """Arrow ``list<float>`` column -> (n, d) float64 matrix WITHOUT the
    pandas hop — ``to_list + np.stack`` builds n Python lists per batch;
    this reads the flattened value buffer in one shot (VERDICT r4 #6)."""
    arr = tbl[col].combine_chunks()
    n = len(arr)
    t = arr.type
    if (pa.types.is_fixed_size_list(t) or pa.types.is_list(t)
            or pa.types.is_large_list(t)):
        if n == 0:
            d = t.list_size if pa.types.is_fixed_size_list(t) else 0
            return np.empty((0, d), np.float64)
        if arr.null_count:
            # flatten() silently DROPS null cells, and the reshape would
            # then smear the remaining values across all n rows — raise
            # like the old np.stack(to_list()) path did
            raise ValueError(
                f"embedding column has {arr.null_count} null cells; "
                "drop or impute them before the vector stage")
        if not pa.types.is_fixed_size_list(t):
            # ragged rows whose total happens to divide n would reshape
            # into silently-misaligned rows — validate uniform lengths
            import pyarrow.compute as pc
            lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
            if len(lens) and (lens != lens[0]).any():
                raise ValueError("embedding column has ragged row lengths; "
                                 "vectors must share one dimension")
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(n, -1)
    # Ray's tensor extension type (ndarray cells via from_pandas) or any
    # other representation: to_numpy gives (n, d) directly, or an object
    # vector of rows to stack
    m = arr.to_numpy(zero_copy_only=False)
    if getattr(m, "dtype", None) == object:
        m = np.stack(m.tolist()) if n else np.empty((0, 0))
    return np.asarray(m, dtype=np.float64).reshape(n, -1)


def _matrix_tbl(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    return (tbl["vec_id"].to_numpy(zero_copy_only=False),
            _normalize(_embed_matrix(tbl)))


_EMPTY_PARTIAL = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                               "neighbor_id": pd.Series([], dtype=np.int64),
                               "cosine": pd.Series([], dtype=np.float64)})


def _topk_merge(group: pd.DataFrame, k: int, dedup: bool = False) -> pa.Table:
    """Per-query merge of block partials (Arrow out — this runs right
    after the groupby shuffle, so its output format is the one blocks
    downstream see)."""
    g_ = group.drop_duplicates("neighbor_id") if dedup else group
    g, s, p, r = K.topk_per_group(
        g_["query_id"].to_numpy(), g_["cosine"].to_numpy(),
        g_["neighbor_id"].to_numpy(), k)
    return pa.table({"query_id": pa.array(g), "neighbor_id": pa.array(p),
                     "cosine": pa.array(s), "rank": pa.array(r)})


def knn_bruteforce(embeddings: rd.Dataset, queries: pd.DataFrame, k: int = 10,
                   exclude_self: bool = True) -> pd.DataFrame:
    """Exact cosine top-k of every query vector against the dataset.

    queries: DataFrame (vec_id, embedding). Returns
    (query_id, neighbor_id, cosine, rank) with rank 0..k-1, deterministic
    (score desc, neighbor_id asc tie-break).
    """
    q_ids, q_mat = _matrix(queries)
    ref = ray.put((q_ids, q_mat))

    def block_topk(batch: pa.Table) -> pd.DataFrame:
        qi, qm = ray.get(ref)
        ids, m = _matrix_tbl(batch)
        if len(ids) == 0:
            return _EMPTY_PARTIAL
        sims = qm @ m.T                             # (Q, batch)
        if exclude_self:
            self_mask = qi[:, None] == ids[None, :]
            sims[self_mask] = -np.inf
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        # tie-inclusive selection: keep EVERYTHING at or above the k-th
        # score, so exact float ties at the boundary all survive to the
        # merge (which breaks them deterministically by neighbor_id) —
        # a bare argpartition keeps an arbitrary, partitioning-dependent
        # subset of tied candidates
        thresh = np.take_along_axis(sims, part, axis=1).min(axis=1, keepdims=True)
        rows_i, cols_i = np.nonzero(sims >= thresh)
        vals = sims[rows_i, cols_i]
        keep = vals > -np.inf
        return pd.DataFrame({"query_id": qi[rows_i[keep]],
                             "neighbor_id": ids[cols_i[keep]],
                             "cosine": vals[keep]})

    partials = embeddings.map_batches(block_topk, batch_format="pyarrow", batch_size=4096)

    out = (partials.groupby("query_id")
           .map_groups(lambda g: _topk_merge(g, k), batch_format="pandas")
           .to_pandas())
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def train_ivf_centroids(embeddings: rd.Dataset, n_centroids: int = 16,
                        target_sample: int = 4096, iters: int = 10,
                        seed: int = 5) -> np.ndarray:
    """Spherical k-means on a streamed hash-threshold sample (IVF coarse
    quantizer). Row selection is a pure function of vec_id (keep iff
    splitmix64(vec_id) below the sampling threshold), so the sample —
    and hence the centroids — is identical under any repartitioning or
    cluster size; only the (small) sample reaches the driver."""
    total = max(embeddings.count(), 1)
    frac = min(1.0, target_sample / total)
    cut = np.uint64(int(frac * 2**64)) if frac < 1.0 else np.uint64(2**64 - 1)

    def samp(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(ids + np.uint64(seed * 0xA11CE))
        return t.filter(pa.array(h <= cut))

    sample = embeddings.map_batches(samp, batch_format="pyarrow").to_pandas()
    sample = sample.sort_values("vec_id")
    _, mat = _matrix(sample)
    k = min(n_centroids, len(mat))
    # seeded init: k distinct sample rows
    init = splitmix64(np.arange(len(mat), dtype=np.uint64) + np.uint64(seed)).argsort()[:k]
    cents = mat[np.sort(init)].copy()
    for _ in range(iters):
        assign = (mat @ cents.T).argmax(axis=1)
        for c in range(k):  # k is small (coarse quantizer)
            rows = assign == c
            if rows.any():
                v = mat[rows].mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents


def knn_ivf(embeddings: rd.Dataset, queries: pd.DataFrame, k: int = 10,
            n_centroids: int = 16, nprobe: int = 4, seed: int = 5) -> pd.DataFrame:
    """IVF approximate top-k: scan only vectors whose nearest coarse
    centroid is among each query's ``nprobe`` closest centroids. Same
    output schema as knn_bruteforce; recall measured in tests. The
    centroid table is broadcast once; each batch does one matmul per
    probed centroid cell (same bucket-grouped scan as knn_lsh)."""
    cents = train_ivf_centroids(embeddings, n_centroids, seed=seed)
    q_ids, q_mat = _matrix(queries)
    q_probe = np.argsort(-(q_mat @ cents.T), axis=1)[:, :nprobe]
    probe_map: dict[int, list[int]] = {}
    for qi, cells in enumerate(q_probe):
        for c in cells:
            probe_map.setdefault(int(c), []).append(qi)
    ref = ray.put((q_ids, q_mat, cents, probe_map))

    def block_topk(batch: pa.Table) -> pd.DataFrame:
        qi_ids, qm, cc, pmap = ray.get(ref)
        ids, m = _matrix_tbl(batch)
        if len(ids) == 0:
            return _EMPTY_PARTIAL
        cells = (m @ cc.T).argmax(axis=1)
        order = np.argsort(cells, kind="stable")
        csort = cells[order]
        cuts = np.flatnonzero(np.diff(csort)) + 1
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [len(csort)]])
        out_q, out_n, out_s = [], [], []
        for s, e in zip(starts, ends):
            qrows = pmap.get(int(csort[s]))
            if not qrows:
                continue
            cols = order[s:e]
            sims = qm[qrows] @ m[cols].T
            qa = np.repeat(qi_ids[qrows], e - s)
            na = np.tile(ids[cols], len(qrows))
            keep = qa != na
            out_q.append(qa[keep])
            out_n.append(na[keep])
            out_s.append(sims.reshape(-1)[keep])
        if not out_q:
            return _EMPTY_PARTIAL
        return _block_partial_topk(
            np.concatenate(out_q), np.concatenate(out_n), np.concatenate(out_s), k
        )

    partials = embeddings.map_batches(block_topk, batch_format="pyarrow", batch_size=4096)

    out = (partials.groupby("query_id")
           .map_groups(lambda g: _topk_merge(g, k, dedup=True),
                       batch_format="pandas")
           .to_pandas())
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _block_partial_topk(q: np.ndarray, n: np.ndarray, s: np.ndarray, k: int) -> pd.DataFrame:
    """Per-block top-k COMBINER for the bucketed scans: truncate each
    query's scanned candidates to its k best (score desc, neighbor asc —
    a strict total order, so the truncation is lossless for the merged
    global top-k) before the groupby shuffle. Without this the exchange
    scales with the scanned volume, not with queries x k."""
    g, s_, p_, _ = K.topk_per_group(q, s, n, k)
    return pd.DataFrame({"query_id": g, "neighbor_id": p_, "cosine": s_})


class HyperplaneLSH:
    """Seeded random-hyperplane bucketer: embedding -> nbits-bit bucket id."""

    def __init__(self, dim: int, nbits: int = 8, seed: int = 5):
        raw = splitmix64(np.arange(dim * nbits, dtype=np.uint64) + np.uint64(seed * 0x777))
        # uniform(-1,1) from the hash bits — deterministic across processes
        self.planes = (raw.astype(np.float64) / 2**63 - 1.0).reshape(nbits, dim)

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes.T) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)


def knn_lsh(embeddings: rd.Dataset, queries: pd.DataFrame, k: int = 10,
            nbits: int = 8, probes: int = 2, seed: int = 5) -> pd.DataFrame:
    """Approximate top-k: scan only vectors whose hyperplane bucket is
    within Hamming distance ``probes-1`` of the query's bucket
    (multi-probe; probes=2 = home bucket + all single-bit flips).
    Same output schema as knn_bruteforce; recall measured in tests."""
    q_ids, q_mat = _matrix(queries)
    dim = q_mat.shape[1]
    lsh = HyperplaneLSH(dim, nbits, seed)
    q_buckets = lsh.bucket(q_mat)
    # multi-probe: every bucket within Hamming radius probes-1 of the
    # query's bucket (probes=2, the default and the oracle's pinned
    # setting, is home + all single-bit flips; larger radii add
    # C(nbits, r) flip masks per level)
    from itertools import combinations

    probe_sets = [q_buckets]
    for r in range(1, probes):
        for bits_subset in combinations(range(nbits), r):
            mask = 0
            for b in bits_subset:
                mask |= 1 << b
            probe_sets.append(q_buckets ^ mask)
    probe_map: dict[int, list[int]] = {}
    for qi, buckets in enumerate(zip(*[p.tolist() for p in probe_sets])):
        for b in buckets:
            probe_map.setdefault(b, []).append(qi)
    ref = ray.put((q_ids, q_mat, probe_map))

    def block_topk(batch: pa.Table) -> pd.DataFrame:
        qi_ids, qm, pmap = ray.get(ref)
        ids, m = _matrix_tbl(batch)
        if len(ids) == 0:
            return _EMPTY_PARTIAL
        buckets = lsh.bucket(m)
        # group batch rows by bucket with one argsort; ONE matmul per
        # populated bucket, outputs assembled with numpy (no per-row
        # Python loop — the bucket loop is bounded by 2^nbits)
        order = np.argsort(buckets, kind="stable")
        bsort = buckets[order]
        cuts = np.flatnonzero(np.diff(bsort)) + 1
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [len(bsort)]])
        out_q, out_n, out_s = [], [], []
        for s, e in zip(starts, ends):
            qrows = pmap.get(int(bsort[s]))
            if not qrows:
                continue
            cols = order[s:e]
            sims = qm[qrows] @ m[cols].T            # (len(qrows), e-s)
            qa = np.repeat(qi_ids[qrows], e - s)
            na = np.tile(ids[cols], len(qrows))
            keep = qa != na
            out_q.append(qa[keep])
            out_n.append(na[keep])
            out_s.append(sims.reshape(-1)[keep])
        if not out_q:
            return _EMPTY_PARTIAL
        return _block_partial_topk(
            np.concatenate(out_q), np.concatenate(out_n), np.concatenate(out_s), k
        )

    partials = embeddings.map_batches(block_topk, batch_format="pyarrow", batch_size=4096)

    out = (partials.groupby("query_id")
           .map_groups(lambda g: _topk_merge(g, k, dedup=True),
                       batch_format="pandas")
           .to_pandas())
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


# ----------------------------------------------------------------------
# PCA over the embedding column (exact-integer distributed covariance)
# ----------------------------------------------------------------------

PCA_SCALE = 10_000  # quantization for the integer sufficient statistics


def embedding_covariance_sums(embeddings: rd.Dataset, scale: int = PCA_SCALE,
                              col: str = "embedding"):
    """Exact integer covariance sufficient statistics of an embedding
    column: n, S = Σ q, C = Σ q qᵀ with q = round(x·scale) per
    component (float32 -> float64 first, so any engine quantizes the
    identical doubles).

    Each block ships ONE row (n, S d-vector, C d² flat) — the combiner
    shape; the driver folds block partials in Python ints, so the fold
    itself can never overflow. Per-block int64 bound: rows_per_block ·
    (scale·max|x|)² must stay < 2^63 (~10^9 rows/block at unit-norm
    embeddings with scale 10^4). Returns (n:int, S, C) with S, C
    object-dtype (arbitrary-precision) arrays."""
    def part(t: pa.Table) -> pd.DataFrame:
        q = np.round(_embed_matrix(t, col) * scale).astype(np.int64)
        # empty batch: a ZERO partial with the dimension when known —
        # an empty object column would be typed null and fail schema
        # unification against the non-empty partials (the
        # pseudo_diameter lesson)
        if not len(q):
            d = q.shape[1]
            if d == 0:
                raise ValueError(
                    "empty embedding batch with unknown dimension")
            q = np.zeros((0, d), np.int64)
        return pd.DataFrame({"n": [np.int64(len(q))],
                             "s": [q.sum(0, dtype=np.int64)],
                             "c": [(q.T @ q).ravel()]})

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        # intermediate combiner: ~256 block partials -> 1 row, so the
        # driver fetches O(blocks/256) rows instead of one per block
        # (at 10^6 blocks the unfolded fetch is tens of GB of d² rows).
        # int64 is safe: |C_ij| per block < rows_block·(scale·|x|)²,
        # and one fold sums ≤ 256 of them.
        return pd.DataFrame({
            "n": [np.int64(pdf["n"].sum())],
            "s": [np.sum(np.stack(pdf["s"].to_list()), axis=0, dtype=np.int64)],
            "c": [np.sum(np.stack(pdf["c"].to_list()), axis=0, dtype=np.int64)],
        })

    parts = (embeddings.map_batches(part, batch_format="pyarrow")
             .map_batches(fold, batch_format="pandas", batch_size=256)
             .take_all())
    if not parts:
        raise ValueError("empty embeddings dataset")
    d = len(parts[0]["s"])
    n = 0
    S = np.zeros(d, dtype=object)
    C = np.zeros(d * d, dtype=object)
    for r in parts:
        n += int(r["n"])
        S = S + np.asarray(r["s"], dtype=object)
        C = C + np.asarray(r["c"], dtype=object)
    return n, S, C.reshape(d, d)


def embedding_covariance(embeddings: rd.Dataset, scale: int = PCA_SCALE,
                         col: str = "embedding"):
    """Upper-triangle integer covariance numerators: rows (i, j,
    cov_num) with cov_num = n·C_ij − S_i·S_j (the covariance times
    n², exact — cov_ij = cov_num / (n²·scale²)). All values are pure
    integer functions of the quantized inputs, so any engine reproduces
    them bit-for-bit."""
    import pyarrow as pa

    n, S, C = embedding_covariance_sums(embeddings, scale, col)
    d = len(S)
    iu, ju = np.triu_indices(d)
    vals = [int(n) * int(C[i, j]) - int(S[i]) * int(S[j]) for i, j in zip(iu, ju)]
    hi = max((abs(v) for v in vals), default=0)
    if hi >= 2 ** 63:
        raise OverflowError("covariance numerator exceeds int64; lower scale")
    return pa.table({"i": pa.array(iu.astype(np.int64)),
                     "j": pa.array(ju.astype(np.int64)),
                     "cov_num": pa.array(np.array(vals, dtype=np.int64))})


def embedding_pca(embeddings: rd.Dataset, n_components: int = 2,
                  scale: int = PCA_SCALE, col: str = "embedding",
                  id_col: str = "vec_id") -> rd.Dataset:
    """PCA projection: top principal components of the exact-integer
    covariance (eigendecomposition of the small d×d matrix on the
    driver — d² floats, never the data), then a streaming map_batches
    projection of every row onto the components.

    Deterministic across partitionings: the covariance is exact-integer
    (summation-order-free) and each eigenvector's sign is fixed by
    making its largest-|coefficient| entry positive (first index wins
    ties). Output: (<id_col>, pc0..pc{k-1} float64)."""
    n, S, C = embedding_covariance_sums(embeddings, scale, col)
    d = len(S)
    mean = np.array([float(s) / (n * scale) for s in S])
    cov = np.empty((d, d), dtype=np.float64)
    for i in range(d):
        for j in range(d):
            cov[i, j] = float(int(n) * int(C[i, j]) - int(S[i]) * int(S[j])) \
                / (float(n) * n * scale * scale)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order]
    for k in range(comps.shape[1]):
        a = np.abs(comps[:, k])
        lead = np.flatnonzero(a == a.max())[0]
        if comps[lead, k] < 0:
            comps[:, k] = -comps[:, k]
    mean_ref = ray.put(mean)
    comps_ref = ray.put(comps)

    def proj(t: pa.Table) -> pa.Table:
        m = _embed_matrix(t, col)
        p = (m - ray.get(mean_ref)) @ ray.get(comps_ref)
        cols = {id_col: t[id_col]}
        for k in range(p.shape[1]):
            cols[f"pc{k}"] = pa.array(p[:, k])
        return pa.table(cols)

    return embeddings.map_batches(proj, batch_format="pyarrow")


def grouped_centroid_sums(embeddings: rd.Dataset, key_col: str = "label",
                          scale: int = PCA_SCALE,
                          col: str = "embedding") -> rd.Dataset:
    """Per-key embedding centroid sufficient statistics — the grouped
    vector-pooling operator (cluster centroids, per-language means):
    q = round(float64(x)·scale) per component (the same quantization as
    embedding_covariance_sums, so any engine quantizes identical
    doubles), per-block per-key int64 component sums via np.add.at, a
    (key, dim)-keyed combiner merge. The centroid is s/(n·scale) in
    exact rationals — left to the caller so the engine output stays
    pure-integer. Each block ships |keys in block|·d rows regardless of
    row count. Returns Dataset(key, dim, s, n)."""
    import pyarrow as pa

    def part(t: "pa.Table") -> "pa.Table":
        if not t.num_rows:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        q = np.round(_embed_matrix(t, col) * scale).astype(np.int64)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(keys, return_inverse=True)
        d = q.shape[1]
        sums = np.zeros((len(uk), d), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table({
            key_col: pa.array(np.repeat(uk.astype(np.int64), d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uk))),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(cnt, d)),
        })

    def fin(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        return pa.table({key_col: t[key_col], "dim": t["dim"],
                         "s": t["sum(s)"], "n": t["sum(n)"]})

    return (
        embeddings.map_batches(part, batch_format="pyarrow")
        .groupby([key_col, "dim"])
        .sum(["s", "n"])
        .map_batches(fin, batch_format="pyarrow")
    )
