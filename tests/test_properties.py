"""Property-based tests (hypothesis) over the pure numpy kernels.

The reference keeps property-style fuzzing hooks (randomized batch
generators with retry, /root/reference/inc/batch.hxx:100-139) but no
framework; this is the engine's version of that strategy (SURVEY §5):
every vectorized kernel is checked against a brute-force oracle on
arbitrary inputs, including the boundary regimes (empty arrays, empty
segments, values at the packed-key fallback threshold) that fixed
fixtures miss. Pure numpy — no Ray session needed."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pagerank_cuda_dynamic_ray.functions import hashing as H
from pagerank_cuda_dynamic_ray.state import kernels as K

settings.register_profile("kernels", deadline=None, max_examples=60)
settings.load_profile("kernels")


def _int_arrays(max_val: int):
    """Paired same-length int64 arrays in [0, max_val]."""
    return st.integers(1, 200).flatmap(
        lambda n: st.tuples(
            st.lists(st.integers(0, max_val), min_size=n, max_size=n),
            st.lists(st.integers(0, max_val), min_size=n, max_size=n),
        )
    ).map(lambda t: (np.array(t[0], dtype=np.int64), np.array(t[1], dtype=np.int64)))


# covers both the packed-int64 fast path and the lexsort fallback
# (max product near/over 2^62)
pair_inputs = st.one_of(
    _int_arrays(50), _int_arrays(2**31), _int_arrays(2**62 - 1)
)


@given(pair_inputs)
def test_pair_sort_matches_lexsort(ab):
    a, b = ab
    order = np.lexsort((b, a))
    sa, sb = K.pair_sort(a, b)
    assert np.array_equal(sa, a[order])
    assert np.array_equal(sb, b[order])


@given(pair_inputs)
def test_pair_argsort_is_sorting_permutation(ab):
    a, b = ab
    order = K.pair_argsort(a, b)
    assert np.array_equal(np.sort(order), np.arange(len(a)))
    sa, sb = a[order], b[order]
    # (a, b) rows ascending
    assert np.all((sa[1:] > sa[:-1]) | ((sa[1:] == sa[:-1]) & (sb[1:] >= sb[:-1])))


@given(
    st.lists(st.integers(0, 100), max_size=60),
    st.lists(st.integers(0, 100), max_size=30),
    st.lists(st.integers(0, 100), max_size=30),
)
def test_set_minus_union_matches_numpy(cur, dels, ins):
    cur = np.unique(np.array(cur, dtype=np.int64))
    dels = np.unique(np.array(dels, dtype=np.int64))
    ins = np.unique(np.array(ins, dtype=np.int64))
    got = K.set_minus_union(cur, dels, ins)
    want = np.union1d(np.setdiff1d(cur, dels), ins)
    assert np.array_equal(got, want)


@given(
    st.lists(st.floats(-1e6, 1e6), max_size=80),
    st.data(),
)
def test_segment_sums_matches_bruteforce(vals, data):
    values = np.array(vals, dtype=np.float64)
    cuts = data.draw(st.lists(st.integers(0, len(values)), max_size=10))
    boundaries = np.array(sorted([0] + cuts + [len(values)]), dtype=np.int64)
    got = K.segment_sums(values, boundaries)
    want = np.array([
        values[boundaries[i]:boundaries[i + 1]].sum()
        for i in range(len(boundaries) - 1)
    ])
    np.testing.assert_allclose(got, want, atol=1e-6)


@given(st.integers(1, 20).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(st.tuples(st.integers(0, 19), st.integers(0, 99)), max_size=120),
    )
))
def test_build_csr_is_sorted_set_adjacency(args):
    n, pairs = args
    pairs = [(l, o) for l, o in pairs if l < n]
    lk = np.array([p[0] for p in pairs], dtype=np.int64)
    ot = np.array([p[1] for p in pairs], dtype=np.int64)
    offsets, nbrs = K.build_csr(lk, ot, n, dedup=True)
    assert offsets[0] == 0 and offsets[-1] == len(nbrs)
    assert np.all(np.diff(offsets) >= 0)
    for row in range(n):
        want = sorted(set(o for l, o in pairs if l == row))
        got = nbrs[offsets[row]:offsets[row + 1]].tolist()
        assert got == want


@given(st.data())
def test_segmented_searchsorted_matches_per_segment(data):
    nseg = data.draw(st.integers(1, 6))
    segs = [
        np.sort(np.array(
            data.draw(st.lists(st.integers(0, 100), max_size=20)), dtype=np.int64
        ))
        for _ in range(nseg)
    ]
    values = np.concatenate(segs) if segs else np.empty(0, dtype=np.int64)
    bounds = np.zeros(nseg + 1, dtype=np.int64)
    np.cumsum([len(s) for s in segs], out=bounds[1:])
    qseg = data.draw(st.lists(st.integers(0, nseg - 1), min_size=1, max_size=30))
    qval = data.draw(st.lists(st.integers(-5, 105), min_size=len(qseg), max_size=len(qseg)))
    lo = bounds[np.array(qseg)]
    hi = bounds[np.array(qseg) + 1]
    q = np.array(qval, dtype=np.int64)
    got = K.segmented_searchsorted(values, lo, hi, q)
    for i, (s, v) in enumerate(zip(qseg, qval)):
        assert got[i] == bounds[s] + np.searchsorted(segs[s], v)


@given(st.data())
def test_topk_per_group_matches_bruteforce(data):
    n = data.draw(st.integers(0, 80))
    group = np.array(data.draw(st.lists(st.integers(0, 5), min_size=n, max_size=n)), dtype=np.int64)
    score = np.array(data.draw(st.lists(st.integers(-50, 50), min_size=n, max_size=n)), dtype=np.float64)
    payload = np.array(data.draw(st.lists(st.integers(0, 30), min_size=n, max_size=n)), dtype=np.int64)
    k = data.draw(st.integers(1, 5))
    g, s, p, r = K.topk_per_group(group, score, payload, k)
    for grp in np.unique(group):
        idx = np.flatnonzero(group == grp)
        want = sorted(zip(-score[idx], payload[idx]))[:k]
        sel = np.flatnonzero(g == grp)
        got = list(zip(-s[sel], p[sel]))
        assert got == want
        assert r[sel].tolist() == list(range(len(want)))


@given(st.lists(st.integers(0, 2**64 - 1), max_size=50))
def test_splitmix64_matches_scalar_reference(xs):
    """Vectorized mixer == the public-domain scalar algorithm."""
    def scalar(x: int) -> int:
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return z ^ (z >> 31)

    arr = np.array(xs, dtype=np.uint64)
    got = H.splitmix64(arr)
    assert got.tolist() == [scalar(x) for x in xs]


@given(st.lists(st.tuples(st.integers(0, 2**64 - 1), st.integers(0, 2**64 - 1)),
                max_size=40))
def test_hamming64_is_xor_popcount(pairs):
    a = np.array([p[0] for p in pairs], dtype=np.uint64)
    b = np.array([p[1] for p in pairs], dtype=np.uint64)
    got = H.hamming64(a, b)
    assert got.tolist() == [bin(x ^ y).count("1") for x, y in pairs]


@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                        max_size=30), max_size=12),
       st.integers(2, 10))
def test_poly_window_hashes_match_direct(docs, window):
    """Shifted-accumulation rolling hash == direct per-window sum."""
    flat = np.frombuffer("".join(docs).encode("ascii"), dtype=np.uint8)
    offs = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=offs[1:])
    got, got_offs = H.poly_window_hashes_flat(flat, offs, window=window)
    for i, d in enumerate(docs):
        b = d.encode("ascii")
        if len(b) >= window:
            want = [
                sum(b[j + t] * pow(int(H.POLY_BASE), t, int(H.POLY_MOD)) for t in range(window))
                % int(H.POLY_MOD)
                for j in range(len(b) - window + 1)
            ]
        elif len(b):
            want = [sum(b[t] * pow(int(H.POLY_BASE), t, int(H.POLY_MOD)) for t in range(len(b)))
                    % int(H.POLY_MOD)]
        else:
            want = [0]
        assert got[got_offs[i]:got_offs[i + 1]].tolist() == want


@given(st.lists(st.integers(0, 8), max_size=15))
def test_gather_subset_edges_consistent(lens_list):
    lens = np.array(lens_list, dtype=np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    rows = np.arange(len(lens), dtype=np.int64)
    edge_idx, bounds = K.gather_subset_edges(offsets, rows)
    # selecting every row reproduces the identity edge enumeration
    assert edge_idx.tolist() == list(range(int(lens.sum())))
    assert np.array_equal(bounds, offsets)
