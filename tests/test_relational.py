"""Broadcast join + salted two-phase groupby."""

import numpy as np
import pandas as pd
import ray.data as rd

from pagerank_cuda_dynamic_ray.stages import relational


def test_broadcast_join_inner_and_left():
    big = pd.DataFrame({"k": np.array([1, 2, 3, 4, 2], dtype=np.int64),
                        "x": np.arange(5, dtype=np.int64)})
    small = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64),
                          "name": ["a", "b"]})
    for parts in (1, 3):
        ds = rd.from_pandas(big).repartition(parts)
        inner = (relational.broadcast_join(ds, small, on="k", how="inner")
                 .to_pandas().sort_values("x").reset_index(drop=True))
        want = (big.merge(small, on="k", how="inner")
                .sort_values("x").reset_index(drop=True))
        pd.testing.assert_frame_equal(inner, want)
        left = (relational.broadcast_join(ds, small, on="k", how="left")
                .to_pandas().sort_values("x").reset_index(drop=True))
        wantl = (big.merge(small, on="k", how="left")
                 .sort_values("x").reset_index(drop=True))
        pd.testing.assert_frame_equal(left, wantl)


def test_salted_groupby_count_matches_plain_count():
    rng = np.random.RandomState(3)
    # two hot keys + a long tail — the skew shape salting exists for
    keys = np.concatenate([
        np.repeat(["hot_a", "hot_b"], 3000),
        rng.choice([f"t{i}" for i in range(40)], 800),
    ])
    rng.shuffle(keys)
    df = pd.DataFrame({"k": keys})
    want = df.groupby("k").size()
    for parts in (1, 7):
        for salt in (1, 8):
            got = (relational.salted_groupby_count(
                       rd.from_pandas(df).repartition(parts), "k", salt=salt)
                   .to_pandas().set_index("k")["n"])
            assert (got.sort_index() == want.sort_index()).all(), (parts, salt)


def test_salted_groupby_weighted():
    df = pd.DataFrame({"k": ["a", "a", "b"], "w": np.array([2, 3, 5], dtype=np.int64)})
    got = (relational.salted_groupby_count(rd.from_pandas(df), "k",
                                           salt=4, weight_col="w")
           .to_pandas().set_index("k")["n"])
    assert got["a"] == 5 and got["b"] == 5


def test_grouped_stats_cents_exact():
    rng = np.random.RandomState(8)
    df = pd.DataFrame({"k": rng.choice(["a", "b"], 500),
                       "v": rng.rand(500) * 200})
    c = np.floor(df["v"].to_numpy() * 100 + 0.5).astype(np.int64)
    for parts in (1, 6):
        got = (relational.grouped_stats_cents(
                   rd.from_pandas(df).repartition(parts), "k", "v")
               .to_pandas().set_index("k"))
        for k in ("a", "b"):
            m = (df["k"] == k).to_numpy()
            assert got.loc[k, "n"] == m.sum()
            assert got.loc[k, "sum_c"] == c[m].sum()
            assert got.loc[k, "sum_sq_c"] == (c[m] * c[m]).sum()


def test_distinct_count_by_key_exact():
    rng = np.random.RandomState(2)
    df = pd.DataFrame({"k": rng.choice(["x", "y", "z"], 2000),
                       "v": rng.randint(0, 50, 2000).astype(np.int64)})
    want = df.groupby("k")["v"].nunique()
    for parts in (1, 7):
        got = (relational.distinct_count_by_key(
                   rd.from_pandas(df).repartition(parts), "k", "v")
               .to_pandas().set_index("k")["n_distinct"])
        assert (got.sort_index() == want.sort_index()).all()


def test_profile_table_with_nulls():
    df = pd.DataFrame({
        "i": pd.array([5, None, 2, 9], dtype="Int64"),
        "f": [1.25, np.nan, -3.5, 0.0],
        "s": ["b", None, "a", "c"],
    })
    for parts in (1, 3):
        got = (relational.profile_table(
                   rd.from_pandas(df).repartition(parts),
                   int_cols=["i"], float_cols=["f"], str_cols=["s"])
               .to_pandas().set_index("column"))
        assert (got["n_rows"] == 4).all()
        assert got.loc["i", "n_null"] == 1 and got.loc["i", "min_v"] == "2" and got.loc["i", "max_v"] == "9"
        assert got.loc["f", "n_null"] == 1 and got.loc["f", "min_v"] == "-350" and got.loc["f", "max_v"] == "125"
        assert got.loc["s", "n_null"] == 1 and got.loc["s", "min_v"] == "a" and got.loc["s", "max_v"] == "c"


def test_copair_counts_vs_bruteforce():
    rng = np.random.RandomState(6)
    n = 4000
    df = pd.DataFrame({"g": rng.randint(0, 60, n).astype(np.int64),
                       "m": rng.randint(0, 40, n).astype(np.int64)})
    cp = df.drop_duplicates()
    want = {}
    for _, grp in cp.groupby("g"):
        mem = np.sort(grp["m"].unique())
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                want[(mem[i], mem[j])] = want.get((mem[i], mem[j]), 0) + 1
    wdf = (pd.DataFrame([(a, b, c) for (a, b), c in want.items()],
                        columns=["a", "b", "shared"])
           .sort_values(["shared", "a", "b"], ascending=[False, True, True])
           .head(50).reset_index(drop=True))
    for parts in (1, 9):
        got = (relational.copair_counts(
                   rd.from_pandas(df).repartition(parts), "g", "m", top=50)
               .to_pandas())
        got = got.astype({"a": np.int64, "b": np.int64, "shared": np.int64})
        pd.testing.assert_frame_equal(got, wdf.astype({"shared": np.int64}))


def test_copair_counts_capped_flag_semantics():
    rng = np.random.RandomState(8)
    n = 3000
    cap = 5
    df = pd.DataFrame({"g": rng.randint(0, 50, n).astype(np.int64),
                       "m": rng.randint(0, 40, n).astype(np.int64)})
    cp = df.drop_duplicates()
    # brute force the capped semantics: each group truncated to its cap
    # smallest members; pair flag = any contributing group truncated
    want_cnt, want_tr = {}, {}
    for _, grp in cp.groupby("g"):
        mem = np.sort(grp["m"].unique())
        fl = int(len(mem) > cap)
        mem = mem[:cap]
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                k = (mem[i], mem[j])
                want_cnt[k] = want_cnt.get(k, 0) + 1
                want_tr[k] = max(want_tr.get(k, 0), fl)
    wdf = (pd.DataFrame([(a, b, c, want_tr[(a, b)])
                         for (a, b), c in want_cnt.items()],
                        columns=["a", "b", "shared", "truncated"])
           .sort_values(["shared", "a", "b"], ascending=[False, True, True])
           .head(50).reset_index(drop=True))
    assert wdf["truncated"].max() == 1  # the fixture does truncate
    for parts in (1, 9):
        got = (relational.copair_counts(
                   rd.from_pandas(df).repartition(parts), "g", "m",
                   top=50, cap=cap)
               .to_pandas()
               .astype({"a": np.int64, "b": np.int64, "shared": np.int64,
                        "truncated": np.int64}))
        pd.testing.assert_frame_equal(
            got, wdf.astype({"shared": np.int64, "truncated": np.int64}))
    # a cap no group reaches reproduces the exact projection, unflagged
    loose = (relational.copair_counts(rd.from_pandas(df), "g", "m",
                                      top=50, cap=1000).to_pandas())
    exact = (relational.copair_counts(rd.from_pandas(df), "g", "m",
                                      top=50).to_pandas())
    assert (loose["truncated"] == 0).all()
    assert (loose[["a", "b", "shared"]].to_numpy()
            == exact.to_numpy()).all()
