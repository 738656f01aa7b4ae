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
# wraparound is exactly what a mixer wants.
_err = np.errstate(over="ignore")


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    x = x.astype(np.uint64, copy=True)
    with _err:
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
    with _err:
        return splitmix64(a ^ (splitmix64(b) + _C1))


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hash of a sequence of strings (FNV-1a + mix).

    Vectorized over fixed-width view when lengths are uniform; falls back
    to a per-item loop (only used on small/driver-side data).
    """
    out = np.empty(len(values), dtype=np.uint64)
    fnv_offset = 0xCBF29CE484222325
    fnv_prime = 0x100000001B3
    mask = (1 << 64) - 1
    for i, s in enumerate(values):
        h = fnv_offset ^ seed
        for byte in s.encode("utf-8"):
            h = ((h ^ byte) * fnv_prime) & mask
        out[i] = h
    return splitmix64(out)


def minhash_signatures(token_hashes: list[np.ndarray], num_perm: int, seed: int = 7) -> np.ndarray:
    """MinHash signatures from per-doc token-hash arrays.

    Universal-hash permutations h_i(x) = splitmix64(x ^ salt_i); signature
    is the per-permutation min. Shape: (len(docs), num_perm), uint64.
    Empty docs get all-max signatures.
    """
    salts = splitmix64(np.arange(num_perm, dtype=np.uint64) + _U64(seed * 0x51ED))
    out = np.full((len(token_hashes), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, th in enumerate(token_hashes):
        if len(th) == 0:
            continue
        # (num_perm, n_tokens) mix, min over tokens — vectorized per doc
        with _err:
            m = splitmix64(th[None, :] ^ salts[:, None])
        out[i] = m.min(axis=1)
    return out


def simhash64(token_hashes: list[np.ndarray]) -> np.ndarray:
    """64-bit SimHash per doc: sign of per-bit vote sums over token hashes."""
    out = np.zeros(len(token_hashes), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, th in enumerate(token_hashes):
        if len(th) == 0:
            continue
        votes = (((th[:, None] >> bits[None, :]) & _U64(1)).astype(np.int64) * 2 - 1).sum(axis=0)
        sig = np.uint64(0)
        with _err:
            sig = (np.where(votes > 0, _U64(1), _U64(0)) << bits).sum(dtype=np.uint64)
        out[i] = sig
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-element Hamming distance between two uint64 arrays."""
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
