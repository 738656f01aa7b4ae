"""HLL distinct sketch + exact histogram quantiles."""

import numpy as np
import pandas as pd
import ray.data as rd

from pagerank_cuda_dynamic_ray.functions.hashing import splitmix64
from pagerank_cuda_dynamic_ray.stages import sketch


def test_hll_rho_matches_python_bit_length():
    rng = np.random.RandomState(3)
    h = rng.randint(0, 2**63, 5000).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    h = splitmix64(h)
    bucket, rho = sketch._hll_rho(h, 12)
    for i in range(0, 5000, 37):
        hv = int(h[i])
        assert bucket[i] == hv >> 52
        rem = hv & ((1 << 52) - 1)
        want = 53 if rem == 0 else 52 - rem.bit_length() + 1
        assert rho[i] == want, (hv, rho[i], want)


def test_hll_accuracy_and_partition_invariance():
    for true_n, seed in ((150, 0), (10_000, 1)):
        ids = np.arange(true_n, dtype=np.int64)
        vals = np.concatenate([ids, ids[: true_n // 2]])  # duplicates
        df = pd.DataFrame({"v": vals})
        got = {}
        for parts in (1, 8):
            ds = rd.from_pandas(df).repartition(parts)
            got[parts] = sketch.hll_distinct(ds, "v", p=12, seed=seed)
        # registers are a pure fold -> partitioning cannot change anything
        assert got[1] == got[8]
        est = got[1]["distinct_est"]
        # m=4096 linear-counting/HLL error at these cardinalities is ~1-2%
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_grouped_matches_per_key_filter():
    """hll_distinct_by_key(k) must equal hll_distinct run on each key's
    filtered subset (same seed ⇒ identical registers), and be
    partition-invariant (registers are a pure max-fold)."""
    rng = np.random.RandomState(7)
    keys = rng.choice(["a", "b", "c"], 6000)
    vals = rng.randint(0, 900, 6000).astype(np.int64)
    df = pd.DataFrame({"k": keys, "v": vals})
    got = {}
    for parts in (1, 7):
        ds = rd.from_pandas(df).repartition(parts)
        out = sketch.hll_distinct_by_key(ds, "k", "v", p=12, seed=3).to_pandas()
        got[parts] = out.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[1], got[7])
    for k in ("a", "b", "c"):
        sub = rd.from_pandas(df[df["k"] == k][["v"]])
        want = sketch.hll_distinct(sub, "v", p=12, seed=3)
        row = got[1][got[1]["k"] == k].iloc[0]
        assert row["distinct_est"] == want["distinct_est"]
        assert row["n_zero_regs"] == want["n_zero_regs"]
        assert row["reg_sum_rho"] == want["reg_sum_rho"]
        true_n = df[df["k"] == k]["v"].nunique()
        assert abs(row["distinct_est"] - true_n) / true_n < 0.05


def test_hll_empty_and_single():
    assert sketch.hll_distinct(
        rd.from_pandas(pd.DataFrame({"v": np.array([], dtype=np.int64)})), "v"
    )["distinct_est"] == 0
    one = sketch.hll_distinct(
        rd.from_pandas(pd.DataFrame({"v": np.array([42, 42, 42], dtype=np.int64)})), "v"
    )
    assert one["distinct_est"] == 1 and one["n_zero_regs"] == 4095


def test_exact_quantiles_hist():
    rng = np.random.RandomState(9)
    vals = rng.randint(0, 600, 4000).astype(np.int64)
    qs = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p90": 0.9, "p99": 0.99}
    for parts in (1, 6):
        out = sketch.exact_quantiles_hist(
            rd.from_pandas(pd.DataFrame({"x": vals})).repartition(parts), "x", qs
        ).to_pandas()
        s = np.sort(vals)
        for label, q in qs.items():
            want = int(s[int(np.floor((len(s) - 1) * q))])
            assert int(out.loc[out["q"] == label, "value"].iloc[0]) == want, label


def test_countmin_upper_bound_and_exactness():
    rng = np.random.RandomState(12)
    vals = rng.zipf(1.5, 20000)
    vals = vals[vals < 500].astype(np.int64)
    df = pd.DataFrame({"v": vals})
    for parts in (1, 6):
        regs = sketch.countmin_registers(
            rd.from_pandas(df).repartition(parts), "v", depth=4, width=1024, seed=3
        )
        uniq, true = np.unique(vals, return_counts=True)
        est = sketch.countmin_query(regs, uniq, seed=3)
        assert (est >= true).all()                     # CM never undercounts
        assert regs.sum() == 4 * len(vals)             # mass conservation per row
        # few distinct keys vs width -> most estimates exact
        assert (est == true).mean() > 0.95
        # partition invariance
        regs2 = sketch.countmin_registers(rd.from_pandas(df), "v", depth=4, width=1024, seed=3)
        np.testing.assert_array_equal(regs, regs2)


def test_bloom_no_false_negatives_and_low_fp():
    keys = pd.DataFrame({"k": np.arange(0, 3000, 3, dtype=np.int64)})   # 1000 members
    probe_df = pd.DataFrame({"k": np.arange(5000, dtype=np.int64)})
    bm = sketch.bloom_build(rd.from_pandas(keys).repartition(4), "k",
                            num_bits=1 << 16, num_hashes=4, seed=5)
    kept = sketch.bloom_probe(rd.from_pandas(probe_df).repartition(3), "k",
                              bm, 1 << 16, num_hashes=4, seed=5).to_pandas()
    member = set(keys["k"])
    kept_set = set(kept["k"])
    assert member <= kept_set                          # no false negatives
    fp = len(kept_set - member) / (len(probe_df) - len(member))
    assert fp < 0.02, fp                               # m/n=65 bits/key, k=4


def test_grouped_quantiles_match_order_statistics():
    import pandas as pd
    import ray.data as rd
    from pagerank_cuda_dynamic_ray.stages import sketch

    rng = np.random.RandomState(21)
    df = pd.DataFrame({
        "lang": rng.choice(["en", "de", "fr"], 400),
        "n": rng.randint(10, 200, 400).astype(np.int64),
    })
    qs = {"p25": 0.25, "p50": 0.5, "p90": 0.9}
    for parts in (1, 5):
        got = (sketch.grouped_quantiles_hist(
                   rd.from_pandas(df).repartition(parts), "lang", "n", qs)
               .to_pandas().sort_values(["lang", "q"]).reset_index(drop=True))
        rows = []
        for lang, sub in df.groupby("lang"):
            v = np.sort(sub["n"].to_numpy())
            for label, p in qs.items():
                rows.append((lang, label, int(v[int(np.floor((len(v) - 1) * p))])))
        want = (pd.DataFrame(rows, columns=["lang", "q", "value"])
                .sort_values(["lang", "q"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["lang", "q", "value"]].astype({"value": np.int64}), want)


def test_binned_quantiles_bracket_and_partition_invariance():
    rng = np.random.RandomState(21)
    vals = np.concatenate([
        rng.exponential(40.0, 5000),
        np.array([-5.0, 1e9]),          # out-of-range -> edge bins
    ])
    qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    got = {}
    for parts in (1, 7):
        ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(parts)
        got[parts] = sketch.binned_quantiles(ds, "v", qs, 0.0, 200.0, 400).to_pandas()
    pd.testing.assert_frame_equal(got[1], got[7])
    s = np.sort(vals)
    for row in got[1].itertuples():
        true_q = s[int(np.floor((len(s) - 1) * qs[row.q]))]
        # true order statistic lies in (or clips into) the reported bin
        assert row.lo_edge <= max(min(true_q, 200.0 - 1e-9), 0.0) <= row.hi_edge + 1e-9
    assert (got[1]["hi_edge"] - got[1]["lo_edge"]).max() <= 0.5 + 1e-12


def test_heavy_hitter_tokens_exact_and_partition_invariant():
    # skewed corpus: "hot" dominates, "warm" sits near the threshold,
    # everything else is cold
    rng = np.random.default_rng(3)
    cold = [f"w{i:03d}" for i in range(200)]
    docs = []
    for i in range(60):
        toks = (["hot"] * 10 + ["warm"] * (3 if i % 2 else 2)
                + list(rng.choice(cold, 30)))
        rng.shuffle(toks)
        docs.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": docs})
    # brute force
    from collections import Counter
    c = Counter(t for d in docs for t in d.split())
    n = sum(c.values())
    k = 30
    want = sorted(((t, m) for t, m in c.items() if m * k > n),
                  key=lambda x: (-x[1], x[0]))
    assert want, "fixture must produce at least one heavy hitter"
    for parts in (1, 6):
        got = (sketch.heavy_hitter_tokens(
                   rd.from_pandas(df).repartition(parts), k=k)
               .to_pandas())
        assert list(zip(got["token"], got["cnt"])) == want, parts
    # candidate-limit gate refuses loudly instead of silently truncating
    import pytest

    with pytest.raises(ValueError, match="candidate_limit"):
        sketch.heavy_hitter_tokens(rd.from_pandas(df).repartition(6),
                                   k=k, candidate_limit=1)
