"""Deterministic vectorized hashing primitives (numpy, uint64).

Used by the synthetic transcript generator, MinHash/SimHash dedup and
document fingerprinting. All public functions are pure and seeded —
rerunning with the same inputs yields identical bits on any platform.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_C1 = _U64(0x9E3779B97F4A7C15)
_C2 = _U64(0xBF58476D1CE4E5B9)
_C3 = _U64(0x94D049BB133111EB)

# numpy intentionally warns on uint64 overflow in some paths; modular
# wraparound is exactly what a mixer wants. Each with-block constructs a
# FRESH errstate: np.errstate instances are not re-entrant — nested
# re-entry of a shared instance overwrites its saved state and leaks
# over='ignore' into the process's global numpy error state forever.
def _err():
    return np.errstate(over="ignore")


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    x = x.astype(np.uint64, copy=True)
    with _err():
        x += _C1
        z = x
        z ^= z >> _U64(30)
        z *= _C2
        z ^= z >> _U64(27)
        z *= _C3
        z ^= z >> _U64(31)
    return z


def mix2(a: np.ndarray, b) -> np.ndarray:
    """Hash-combine two uint64 streams."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    with _err():
        return splitmix64(a ^ (splitmix64(b) + _C1))


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hash of a sequence of strings.

    Vectorized end-to-end: pandas' cython siphash over the object array
    (keyed by ``seed``), finalized with splitmix64. ~100M strings/s vs
    the naive per-byte Python loop this replaces.
    """
    import pandas as pd

    if len(values) == 0:
        return np.empty(0, dtype=np.uint64)
    arr = np.asarray(values, dtype=object)
    key = f"{seed & 0xFFFFFFFFFFFFFFFF:016x}"  # hash_key must be 16 chars
    h = pd.util.hash_array(arr, hash_key=key, categorize=False)
    return splitmix64(h)


def rolling_kgram_hashes(
    flat_token_hashes: np.ndarray, doc_offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc hashed word-k-gram sets from a FLAT token-hash array.

    flat_token_hashes: concatenated token hashes of all docs;
    doc_offsets: (n_docs+1,) token offsets. Returns (flat unique shingle
    hashes, (n_docs+1,) shingle offsets). Docs shorter than ``k`` tokens
    contribute a single all-token combined hash (mirroring the join-all
    fallback of string shingling); empty docs contribute nothing.
    """
    th, offs = flat_token_hashes, doc_offsets
    n = len(th)
    if k > 1 and n >= k:
        acc = th[: n - k + 1].copy()
        for j in range(1, k):
            acc = mix2(acc, th[j : j + n - k + 1])
    else:
        acc = th.copy()
    out_chunks: list[np.ndarray] = []
    out_offs = np.zeros(len(offs), dtype=np.int64)
    for d in range(len(offs) - 1):
        lo, hi = int(offs[d]), int(offs[d + 1])
        ln = hi - lo
        if ln == 0:
            sh = np.empty(0, dtype=np.uint64)
        elif ln < k:
            sh = th[lo:hi]
            while len(sh) > 1:  # combine-all fallback, O(log ln)
                m = len(sh) // 2
                sh = np.concatenate([mix2(sh[:m], sh[m : 2 * m]), sh[2 * m :]])
        else:
            sh = np.unique(acc[lo : hi - k + 1])
        out_chunks.append(sh)
        out_offs[d + 1] = out_offs[d] + len(sh)
    flat = np.concatenate(out_chunks) if out_chunks else np.empty(0, dtype=np.uint64)
    return flat, out_offs


def minhash_signatures_flat(
    flat_hashes: np.ndarray, offsets: np.ndarray, num_perm: int, seed: int = 7
) -> np.ndarray:
    """MinHash signatures over flat per-doc hash sets — one vectorized
    pass for the whole batch (no per-doc Python matrices)."""
    n_docs = len(offsets) - 1
    out = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat_hashes) == 0:
        return out
    salts = splitmix64(np.arange(num_perm, dtype=np.uint64) + _U64(seed * 0x51ED))
    lens = np.diff(offsets)
    nonempty = np.flatnonzero(lens > 0)
    starts = offsets[nonempty]
    with _err():
        for j in range(num_perm):
            m = splitmix64(flat_hashes ^ salts[j])
            out[nonempty, j] = np.minimum.reduceat(m, starts)
    return out


def simhash64_flat(flat_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SimHash per doc over flat token hashes: 64 vectorized bit-vote
    reduceats instead of a per-doc Python loop."""
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(flat_hashes) == 0:
        return out
    lens = np.diff(offsets)
    nonempty = np.flatnonzero(lens > 0)
    starts = offsets[nonempty]
    ln = lens[nonempty]
    with _err():
        for b in range(64):
            ones = np.add.reduceat((flat_hashes >> _U64(b)) & _U64(1), starts)
            # votes = 2*ones - n > 0  <=>  ones > n/2
            out[nonempty] |= (2 * ones > ln).astype(np.uint64) << _U64(b)
    return out


POLY_BASE = np.int64(131)
POLY_MOD = np.int64(2147483647)  # 2^31 - 1 (products stay inside int64)
TOKEN_HASH_BYTES = 16  # tokens hash over their first 16 bytes


def poly_token_hash64(tokens) -> np.ndarray:
    """SQL-replicable 64-bit token hash: a base-131 byte fold mod 2^31-1
    over the token's first 16 bytes, finalized with splitmix64.

    Fully vectorized: the token list becomes a fixed-width ``S16`` byte
    matrix (numpy truncates/NUL-pads), the fold is 16 masked
    multiply-adds across the whole batch. Every step is expressible in
    ANSI SQL over BIGINTs (the fold) + emulated uint64 ops (the
    finalizer), which is what makes SimHash oracle-checkable in DuckDB.
    ASCII-only inputs assumed (byte == character); non-ASCII tokens fall
    back to a per-token encode."""
    if len(tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    try:
        mat = np.asarray(tokens, dtype=f"S{TOKEN_HASH_BYTES}")
    except UnicodeEncodeError:
        mat = np.asarray(
            [t.encode("utf-8")[:TOKEN_HASH_BYTES] for t in tokens],
            dtype=f"S{TOKEN_HASH_BYTES}",
        )
    b = np.frombuffer(mat.tobytes(), dtype=np.uint8).reshape(-1, TOKEN_HASH_BYTES).astype(np.int64)
    h = np.zeros(len(b), dtype=np.int64)
    for k in range(TOKEN_HASH_BYTES):
        col = b[:, k]
        step = (h * POLY_BASE + col) % POLY_MOD
        h = np.where(col > 0, step, h)  # NUL padding = past end (no NULs in ASCII text)
    return splitmix64(h.astype(np.uint64))


def poly_window_hashes_flat(
    flat_bytes: np.ndarray, doc_offsets: np.ndarray, window: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc Rabin-style window hashes over a FLAT byte array:
    ``h_i = sum_j b[i+j] * 131^j  mod 2^31-1`` for every in-doc window.

    Docs shorter than ``window`` contribute one hash over all their
    bytes (empty docs: the single hash 0). Vectorized: one
    sliding-window dot across the whole flat array, invalid
    (boundary-crossing) windows masked out. Returns (flat hashes,
    (n_docs+1,) per-doc hash-count offsets)."""
    offs = doc_offsets.astype(np.int64)
    lens = np.diff(offs)
    n_docs = len(lens)
    b = flat_bytes.astype(np.int64)
    pows = np.empty(window, dtype=np.int64)
    pows[0] = 1
    for j in range(1, window):
        pows[j] = (pows[j - 1] * POLY_BASE) % POLY_MOD
    counts = np.maximum(lens - window + 1, 1).astype(np.int64)
    out_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offs[1:])
    out = np.empty(int(out_offs[-1]), dtype=np.int64)
    long_docs = np.flatnonzero(lens >= window)
    if len(b) >= window and long_docs.size:
        # shifted accumulation: window sums of 8 strided adds on 1-D
        # slices — no (N, window) temporary (18x faster than the
        # sliding_window_view matmul at corpus scale, same values)
        nall = len(b) - window + 1
        h_all = np.zeros(nall, dtype=np.int64)
        for j in range(window):
            h_all += b[j:j + nall] * pows[j]
        h_all %= POLY_MOD
        cnt = lens[long_docs] - window + 1
        within = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        src = np.repeat(offs[long_docs], cnt) + within
        dst = np.repeat(out_offs[long_docs], cnt) + within
        out[dst] = h_all[src]
    short_docs = np.flatnonzero(lens < window)
    for d in short_docs:  # rare tail (docs shorter than the window)
        lo, hi = int(offs[d]), int(offs[d + 1])
        out[out_offs[d]] = int((b[lo:hi] * pows[: hi - lo]).sum() % POLY_MOD) if hi > lo else 0
    return out, out_offs


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-element Hamming distance between two uint64 arrays."""
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
