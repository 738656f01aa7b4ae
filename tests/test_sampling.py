"""Deterministic sampling stages: hash split, stratified rates, per-key
reservoir, vocabulary — partitioning-invariance is the core contract."""

import numpy as np
import pandas as pd
import ray.data as rd

from pagerank_cuda_dynamic_ray.functions.hashing import splitmix64
from pagerank_cuda_dynamic_ray.stages import sampling


def _docs(n=3000, seed=4):
    rng = np.random.RandomState(seed)
    langs = np.array(["en", "de", "fr", "es"])[rng.randint(0, 4, n)]
    words = np.array(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])
    texts = [" ".join(words[rng.randint(0, 6, rng.randint(1, 12))]) for _ in range(n)]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": langs,
    })


def _h(ids, seed):
    with np.errstate(over="ignore"):
        return splitmix64(ids.astype(np.uint64) + np.uint64(seed) * (np.uint64(1) << np.uint64(60)))


def test_hash_split_deterministic_and_proportional():
    df = _docs()
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = sampling.hash_split(rd.from_pandas(df), w, seed=0).to_pandas()
    assert len(out) == len(df)
    frac = out["split"].value_counts(normalize=True)
    for k, v in w.items():
        assert abs(frac.get(k, 0.0) - v) < 0.03, (k, frac.get(k, 0.0))
    # partitioning-invariant: same assignment at any block size
    out9 = sampling.hash_split(rd.from_pandas(df).repartition(9), w, seed=0).to_pandas()
    merged = out.merge(out9, on="doc_id", suffixes=("", "_9"))
    assert (merged["split"] == merged["split_9"]).all()
    # exact formula: split boundary = cumulative threshold on splitmix64
    h = _h(df["doc_id"].to_numpy(), 0)
    want = np.where(h < np.uint64(round(0.8 * 2**64)), "train",
                    np.where(h < np.uint64(round(0.9 * 2**64)), "val", "test"))
    got = out.sort_values("doc_id")["split"].to_numpy()
    assert (got == want).all()


def test_stratified_sample_rates_and_determinism():
    df = _docs()
    rates = {"en": 1.0, "de": 0.5, "fr": 0.0}
    out = sampling.stratified_sample(
        rd.from_pandas(df), rates, seed=1, default_rate=0.25
    ).to_pandas()
    by = out["lang"].value_counts()
    n_by = df["lang"].value_counts()
    assert by.get("en", 0) == n_by["en"]          # rate 1.0 keeps everything
    assert by.get("fr", 0) == 0                   # rate 0.0 drops everything
    assert abs(by.get("de", 0) / n_by["de"] - 0.5) < 0.08
    assert abs(by.get("es", 0) / n_by["es"] - 0.25) < 0.08  # default rate
    # exact membership: hash threshold per row
    h = _h(df["doc_id"].to_numpy(), 1)
    thr = {"en": 2**64 - 1, "de": round(0.5 * 2**64), "fr": 0, "es": round(0.25 * 2**64)}
    want = {int(i) for i, lang, hv in zip(df["doc_id"], df["lang"], h)
            if hv < np.uint64(thr[lang])}
    assert set(out["doc_id"]) == want


def test_sample_per_key_is_global_topk_and_partition_invariant():
    df = _docs()
    k = 25
    for parts in (1, 7):
        out = sampling.sample_per_key(
            rd.from_pandas(df).repartition(parts), k, seed=2
        ).to_pandas()
        h = _h(df["doc_id"].to_numpy(), 2)
        want_ids = []
        for lang, grp in pd.DataFrame({"lang": df["lang"], "doc_id": df["doc_id"], "h": h}).groupby("lang"):
            want_ids += grp.sort_values(["h", "doc_id"]).head(k)["doc_id"].tolist()
        assert sorted(out["doc_id"]) == sorted(want_ids), parts
        assert (out["lang"].value_counts() == k).all()


def test_sample_per_key_small_stratum_returns_all():
    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "lang": ["en"] * 8 + ["de"] * 2,
    })
    out = sampling.sample_per_key(rd.from_pandas(df), 5, seed=2).to_pandas()
    assert out["lang"].value_counts().to_dict() == {"en": 5, "de": 2}


def test_vocabulary_counts_and_ties():
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b b c", "b c   c", None, "d a"],
    })
    out = sampling.vocabulary(rd.from_pandas(df).repartition(3), top_n=3).to_pandas()
    # counts: b=3, c=3, a=2, d=1; ties by token asc -> b before c
    assert list(out["token"]) == ["b", "c", "a"]
    assert list(out["n"]) == [3, 3, 2]


def test_tfidf_top_terms_matches_pandas_oracle():
    df = _docs(400, seed=11)
    for parts in (1, 5):
        out = sampling.tfidf_top_terms(
            rd.from_pandas(df).repartition(parts), k=3
        ).to_pandas().sort_values(["doc_id", "tfidf_e6", "token"],
                                  ascending=[True, False, True]).reset_index(drop=True)
        # oracle: exact same quantized formula in pandas
        rows = []
        n = len(df)
        tok = df.set_index("doc_id")["text"].str.findall(r"\S+")
        tf = (
            pd.DataFrame({"doc_id": np.repeat(tok.index, tok.str.len()),
                          "token": tok.explode().dropna().to_numpy()})
            .groupby(["doc_id", "token"]).size().reset_index(name="tf")
        )
        dft = tf.groupby("token").size().rename("df").reset_index()
        m = tf.merge(dft, on="token")
        m["tfidf_e6"] = np.round(
            m["tf"].to_numpy() * np.log(n / m["df"].to_numpy(dtype=float)) * 1e6
        ).astype(np.int64)
        want = (
            m.sort_values(["doc_id", "tfidf_e6", "token"], ascending=[True, False, True])
            .groupby("doc_id").head(3).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            out[["doc_id", "token", "tfidf_e6"]],
            want[["doc_id", "token", "tfidf_e6"]].reset_index(drop=True),
        )


def test_tfidf_handles_empty_and_null_text():
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a a b", "", None, "b c"],
    })
    out = sampling.tfidf_top_terms(rd.from_pandas(df), k=2).to_pandas()
    assert set(out["doc_id"]) == {0, 3}  # token-free docs emit nothing
    d0 = out[out["doc_id"] == 0].sort_values("tfidf_e6", ascending=False)
    # 'a' (tf=2, df=1) outranks 'b' (tf=1, df=2)
    assert list(d0["token"]) == ["a", "b"]


# ----------------------------------------------------------------------
# inverted index
# ----------------------------------------------------------------------

def test_inverted_index_exact_and_capped():
    texts = ["a b c", "b c", "c", None, "a a a", ""]
    df = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64), "text": texts})
    for parts in (1, 3):
        out = (sampling.inverted_index(rd.from_pandas(df).repartition(parts), k=2)
               .to_pandas().sort_values("token").reset_index(drop=True))
        assert out["token"].tolist() == ["a", "b", "c"]
        assert out["df"].tolist() == [2, 2, 3]          # per-doc DISTINCT tokens
        assert out["postings"].tolist() == ["0,4", "0,1", "0,1"]  # capped at k=2


def test_inverted_index_global_topk_crosses_blocks():
    # token 'z' appears in docs 10..19; with one doc per block the global
    # smallest-k must merge across every block's partial list
    df = pd.DataFrame({"doc_id": np.arange(10, 20, dtype=np.int64)[::-1].copy(),
                       "text": ["z"] * 10})
    out = (sampling.inverted_index(rd.from_pandas(df).repartition(10), k=3)
           .to_pandas())
    assert out["df"].tolist() == [10]
    assert out["postings"].tolist() == ["10,11,12"]


def test_cooccurrence_pmi_bruteforce_and_partition_invariance():
    import itertools, math
    rng = np.random.RandomState(7)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, rng.randint(0, 9))) for _ in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": texts})
    W, K = 3, 8
    # brute force
    from collections import Counter
    pc_, uc = Counter(), Counter()
    for t in texts:
        toks = t.split()
        uc.update(toks)
        for i, j in itertools.combinations(range(len(toks)), 2):
            if j - i <= W:
                lo, hi = sorted((toks[i], toks[j]))
                pc_[f"{lo} {hi}"] += 1
    tp, tu = sum(pc_.values()), sum(uc.values())
    want = sorted(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    outs = []
    for parts in (1, 5):
        got = (sampling.cooccurrence_pmi(rd.from_pandas(df).repartition(parts),
                                         window=W, top_k=K).to_pandas())
        outs.append(got)
        assert list(zip(got["pair"], got["n"])) == want
        for _, r in got.iterrows():
            a, b = r["pair"].split(" ")
            assert r["c_a"] == uc[a] and r["c_b"] == uc[b]
            pmi = math.log((float(r["n"]) * tu * tu) / (float(uc[a]) * uc[b] * tp))
            assert r["pmi_e6"] == int(round(pmi * 1e6))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_topk_per_key_matches_window_rank_and_partition_invariant():
    rng = np.random.RandomState(5)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 20, n).astype(np.int64),
        "value": np.round(rng.uniform(0, 100, n), 2),
    })
    # brute-force window rank: top 3 per user by (value desc, event_id)
    want = (df.sort_values(["user_id", "value", "event_id"],
                           ascending=[True, False, True])
              .groupby("user_id").head(3)
              .sort_values("event_id").reset_index(drop=True))
    outs = []
    for parts in (1, 7):
        got = (sampling.topk_per_key(rd.from_pandas(df).repartition(parts),
                                     3, "user_id", "value", "event_id")
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        outs.append(got)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_mode_per_key_deterministic_ties_and_partition_invariant():
    rng = np.random.RandomState(9)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.randint(0, 15, n).astype(np.int64),
        "event_type": rng.choice(list("abcd"), n),
    })
    counts = df.groupby(["user_id", "event_type"]).size().reset_index(name="n")
    want = (counts.sort_values(["user_id", "n", "event_type"],
                               ascending=[True, False, True])
                  .groupby("user_id").head(1).reset_index(drop=True))
    for parts in (1, 6):
        got = (sampling.mode_per_key(rd.from_pandas(df).repartition(parts),
                                     "user_id", "event_type")
               .to_pandas().sort_values("user_id").reset_index(drop=True))
        got["n"] = got["n"].astype(np.int64)
        pd.testing.assert_frame_equal(got[want.columns.tolist()],
                                      want.astype({"n": np.int64}))


def _ntile_oracle(n: int, k: int) -> np.ndarray:
    """SQL NTILE over ranks 0..n-1: first n%k tiles take ceil(n/k)."""
    q, r = divmod(n, k)
    out = np.empty(n, dtype=np.int64)
    pos = 0
    for t in range(k):
        size = q + 1 if t < r else q
        out[pos:pos + size] = t + 1
        pos += size
    return out[:pos]


def test_global_rank_ntile_matches_sql_semantics():
    rng = np.random.RandomState(11)
    n = 997  # deliberately not divisible by 10
    df = pd.DataFrame({
        "doc_id": rng.permutation(n).astype(np.int64),
        "n_chars": rng.randint(0, 40, n).astype(np.int64),  # heavy ties
    })
    order = df.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    want_rn = pd.Series(np.arange(1, n + 1, dtype=np.int64), index=order["doc_id"])
    want_tile = pd.Series(_ntile_oracle(n, 10), index=order["doc_id"])
    for parts in (1, 8):
        got = (sampling.global_rank_ntile(
                   rd.from_pandas(df).repartition(parts), "n_chars", "doc_id", tiles=10)
               .to_pandas().set_index("doc_id"))
        assert (got["rn"] == want_rn.reindex(got.index)).all()
        assert (got["tile"] == want_tile.reindex(got.index)).all()


def test_global_rank_ntile_more_tiles_than_rows():
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "n_chars": np.array([5, 5, 1], dtype=np.int64)})
    got = (sampling.global_rank_ntile(rd.from_pandas(df), "n_chars", "doc_id", tiles=10)
           .to_pandas().sort_values("rn").reset_index(drop=True))
    # order: (1,2), (5,0), (5,1); NTILE(10) over 3 rows = 1 row per tile
    assert got["doc_id"].tolist() == [2, 0, 1]
    assert got["tile"].tolist() == [1, 2, 3]


def test_temperature_resample_flattens_heads_only():
    rng = np.random.default_rng(3)
    langs = np.array(["en"] * 800 + ["de"] * 200 + ["fr"] * 50)
    df = pd.DataFrame({"doc_id": np.arange(len(langs), dtype=np.int64),
                       "lang": langs})
    from pagerank_cuda_dynamic_ray.stages.sampling import _row_hash

    alpha = 0.5
    for parts in (1, 7):
        got = (sampling.temperature_resample(
                   rd.from_pandas(df).repartition(parts), alpha=alpha, seed=7)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # brute force: identical threshold formula per row
        cmin = 50.0
        thr = {k: min(int(np.floor((cmin / c) ** (1.0 - alpha) * 2.0**64)),
                      2**64 - 1)
               for k, c in (("en", 800.0), ("de", 200.0), ("fr", 50.0))}
        h = _row_hash(df["doc_id"].to_numpy(), 7)
        keep = np.array([h[i] < thr[l] for i, l in enumerate(langs)])
        assert got["doc_id"].tolist() == df["doc_id"].to_numpy()[keep].tolist()
        # the rarest key keeps EVERYTHING; heads are downsampled toward it
        kept = got.groupby("lang").size()
        assert kept.get("fr", 0) == 50
        assert kept["en"] < 800 and kept["de"] < 200
        # flattening: head/tail ratio shrinks from 16x toward ~sqrt(16)=4x
        assert kept["en"] / kept.get("fr", 1) < 8


def test_temperature_alpha_one_keeps_all():
    df = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                       "lang": np.array(["en"] * 90 + ["fr"] * 10)})
    got = sampling.temperature_resample(rd.from_pandas(df), alpha=1.0).to_pandas()
    assert len(got) == 100
