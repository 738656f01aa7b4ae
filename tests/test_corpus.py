"""Corpus-preparation stages (stages/corpus.py): chunking, packing,
BM25-lite, contamination screen, prefix-dup grouping — brute-force
oracles on tiny synthetic docs plus partitioning-invariance checks
(the engine's O(blocks) carries must not depend on block layout)."""

import numpy as np
import pandas as pd
import ray.data as rd

from pagerank_cuda_dynamic_ray.stages import corpus


def _docs() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "eta", "theta"])
    texts = [" ".join(rng.choice(vocab, size=int(n)))
             for n in rng.integers(0, 90, size=40)]
    texts[3] = ""                      # empty doc
    texts[5] = texts[4]                # exact dup
    texts[9] = texts[8] + " coda"      # shared prefix
    texts[6] = "solo"                  # shorter than any k-gram
    texts[7] = "duo coda"              # shorter than k=3 grams
    return pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": texts})


def test_chunk_documents_windows_and_tail():
    df = _docs()
    out = corpus.chunk_documents(rd.from_pandas(df), size=10, stride=7).to_pandas()
    for _, row in df.iterrows():
        ws = row["text"].split()
        got = out[out["doc_id"] == row["doc_id"]].sort_values("chunk_idx")
        if not ws:
            assert len(got) == 0
            continue
        n = len(ws)
        want_n = 1 + max(0, -(-(n - 10) // 7)) if n > 10 else 1
        assert len(got) == want_n, (row["doc_id"], n)
        # every chunk is the exact token window, re-joined
        for ci, ctext, ctok in zip(got["chunk_idx"], got["chunk_text"], got["n_tokens"]):
            s = ci * 7
            e = min(s + 10, n)
            assert ctext == " ".join(ws[s:e])
            assert ctok == e - s
        # overlap invariant: consecutive chunks share size-stride tokens
        txts = got["chunk_text"].tolist()
        for a, b in zip(txts, txts[1:]):
            assert a.split()[7:] == b.split()[: len(a.split()) - 7]


def test_chunk_documents_stride_gt_size_drops_phantom_windows():
    # stride > size (sampled windows): no chunk may start at/past the
    # last token — n=10, size=2, stride=7 used to emit a start-14 chunk
    # with n_tokens == -4 and empty text
    df = pd.DataFrame({"doc_id": np.array([1, 2], dtype=np.int64),
                       "text": [" ".join(f"w{i}" for i in range(10)), "a b"]})
    out = corpus.chunk_documents(
        rd.from_pandas(df), size=2, stride=7).to_pandas()
    d1 = out[out["doc_id"] == 1].sort_values("chunk_idx")
    assert d1["chunk_idx"].tolist() == [0, 1]
    assert d1["chunk_text"].tolist() == ["w0 w1", "w7 w8"]
    assert d1["n_tokens"].tolist() == [2, 2]
    assert (out["n_tokens"] > 0).all()
    d2 = out[out["doc_id"] == 2]
    assert d2["chunk_text"].tolist() == ["a b"]


def test_pack_token_bins_rejects_duplicate_doc_ids():
    import pytest
    import ray

    # duplicate doc_id ⇒ nondeterministic packing order / carry-dict
    # collision; the guard fires whether the run lands in one block
    # (sorted-adjacent check) or straddles (carry first_id collision)
    df = pd.DataFrame({"doc_id": np.array([7, 7], dtype=np.int64),
                       "text": ["a b c", "d e"]})
    ds = rd.from_pandas(df).repartition(2)
    with pytest.raises((ValueError, ray.exceptions.RayTaskError),
                       match="duplicate doc_id"):
        corpus.pack_token_bins(ds, budget=4).to_pandas()


def test_bm25_all_empty_corpus_scores_zero():
    df = pd.DataFrame({"doc_id": np.array([1, 2], dtype=np.int64),
                       "text": ["", "   "]})
    out = corpus.bm25_scores(rd.from_pandas(df), ["alpha"]).to_pandas()
    assert (out["score_e6"] == 0).all() and len(out) == 2


def test_contamination_refuses_before_driver_pull():
    import pytest

    df = _docs()
    with pytest.raises(ValueError, match="max_bench_shingles"):
        corpus.contamination_screen(
            rd.from_pandas(df), bench_mod=2, shingle_k=3,
            max_bench_shingles=1).to_pandas()


def test_pack_token_bins_is_exclusive_prefix_and_partition_invariant():
    df = _docs()
    out = corpus.pack_token_bins(rd.from_pandas(df), budget=64).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    n = df["text"].str.split().str.len().fillna(0).astype(np.int64).to_numpy()
    prev = np.cumsum(n) - n
    assert (out["n_tokens"].to_numpy() == n).all()
    assert (out["bin"].to_numpy() == prev // 64).all()
    assert (out["bin_offset"].to_numpy() == prev % 64).all()
    # block-layout invariance of the carry pass
    out9 = corpus.pack_token_bins(rd.from_pandas(df).repartition(9), budget=64).to_pandas()
    m = out.merge(out9, on="doc_id", suffixes=("", "_9"))
    assert (m["bin"] == m["bin_9"]).all() and (m["bin_offset"] == m["bin_offset_9"]).all()


def test_bm25_scores_match_bruteforce():
    df = _docs()
    terms = ["alpha", "theta"]
    k1, b = 1.2, 0.75
    out = corpus.bm25_scores(rd.from_pandas(df), terms, k1, b).to_pandas()
    toks = [t.split() for t in df["text"]]
    N = len(toks)
    totlen = sum(len(w) for w in toks)
    lens = np.array([len(w) for w in toks], dtype=np.int64)
    want = np.zeros(N, dtype=np.int64)
    for term in terms:
        dfv = sum(term in set(w) for w in toks)
        tf = np.array([w.count(term) for w in toks], dtype=np.int64)
        idf = (N - dfv + 0.5) / (dfv + 0.5)
        contrib = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (lens * N) / totlen))
        want += np.floor(contrib * 1e6).astype(np.int64)
    got = out.sort_values("doc_id")["score_e6"].to_numpy()
    assert (got == want).all()
    # empty doc scores 0; docs with the term outscore those without (same length)
    assert got[3] == 0


def test_contamination_screen_counts_shared_grams():
    df = _docs()
    out = corpus.contamination_screen(
        rd.from_pandas(df), bench_mod=10, shingle_k=3).to_pandas()
    # brute force on gram STRINGS
    def grams(t):
        ws = t.split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
    bench = set()
    for _, r in df.iterrows():
        if r["doc_id"] % 10 == 0:
            bench |= grams(r["text"])
    assert set(out["doc_id"]) == set(df[df["doc_id"] % 10 != 0]["doc_id"])
    for _, r in out.iterrows():
        g = grams(df.loc[df["doc_id"] == r["doc_id"], "text"].iloc[0])
        assert r["n_grams"] == len(g)
        assert r["n_contaminated"] == len(g & bench)
    # partitioning-invariance of the broadcast set
    out9 = corpus.contamination_screen(
        rd.from_pandas(df).repartition(9), bench_mod=10, shingle_k=3).to_pandas()
    m = out.merge(out9, on="doc_id", suffixes=("", "_9"))
    assert (m["n_contaminated"] == m["n_contaminated_9"]).all()


def test_doc_repetition_total_vs_distinct():
    df = _docs()
    out = corpus.doc_repetition(rd.from_pandas(df), shingle_k=3).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    for _, r in df.iterrows():
        ws = r["text"].split()
        total = max(len(ws) - 2, 0)
        distinct = len({tuple(ws[i:i + 3]) for i in range(total)})
        got = out[out["doc_id"] == r["doc_id"]].iloc[0]
        assert got["n_grams_total"] == total
        assert got["n_grams_distinct"] == distinct
    # repetition mass is nonneg and the duplicated doc pair agrees
    assert (out["n_grams_total"] >= out["n_grams_distinct"]).all()
    assert (out.loc[4, ["n_grams_total", "n_grams_distinct"]].to_numpy()
            == out.loc[5, ["n_grams_total", "n_grams_distinct"]].to_numpy()).all()


def test_prefix_dup_groups():
    df = _docs()
    out = corpus.prefix_dup_groups(rd.from_pandas(df), k=5).to_pandas()
    pref = df["text"].str.split().str[:5].str.join(" ")
    want = (pd.DataFrame({"doc_id": df["doc_id"], "p": pref})
            .groupby("p")["doc_id"].agg(["min", "count"]))
    assert len(out) == len(want)
    m = dict(zip(want["min"].astype(np.int64), want["count"].astype(np.int64)))
    for _, r in out.iterrows():
        assert m[int(r["doc_id"])] == int(r["n_dups"])
    # the deliberate dup pair (4,5) groups; (8,9) groups iff doc 8 has
    # >= k tokens (otherwise doc 9's extra token changes its prefix)
    assert m[4] == 2
    if len(df.loc[8, "text"].split()) >= 5:
        assert m[8] == 2


def test_crossdoc_dup_mass_bruteforce():
    df = _docs()
    k = 3
    grams = {}
    for _, r in df.iterrows():
        ws = r["text"].split()
        gs = {tuple(ws[i:i + k]) for i in range(len(ws) - k + 1)} if len(ws) >= k else set()
        grams[int(r["doc_id"])] = gs
    dfreq = {}
    for gs in grams.values():
        for g in gs:
            dfreq[g] = dfreq.get(g, 0) + 1
    for parts in (1, 6):
        got = (corpus.crossdoc_dup_mass(
                   rd.from_pandas(df).repartition(parts), shingle_k=k)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert len(got) == len(df)
        for _, r in got.iterrows():
            gs = grams[int(r["doc_id"])]
            assert r["n_grams_distinct"] == len(gs)
            assert r["n_dup_grams"] == sum(1 for g in gs if dfreq[g] >= 2)
    # the deliberate dup pair (4,5): every gram of doc 4 is duplicated
    g4 = got[got["doc_id"] == 4].iloc[0]
    if len(grams[4]):
        assert g4["n_dup_grams"] == g4["n_grams_distinct"]
    # the distributed-join fallback (broadcast_dup_limit=0 forces it)
    # must agree exactly with the broadcast path
    jo = (corpus.crossdoc_dup_mass(rd.from_pandas(df).repartition(6),
                                   shingle_k=k, broadcast_dup_limit=0)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(jo, got)


def test_crossdoc_dup_mass_all_unique_corpus():
    # no gram occurs in 2+ docs: the df>=2 set is EMPTY and the operator
    # must short-circuit to all-zero dup counts, not crash joining an
    # empty dataset (Ray 2.49 empty-side join bug)
    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["aa bb cc dd", "ee ff gg hh", "ii jj kk ll"],
    })
    got = (corpus.crossdoc_dup_mass(rd.from_pandas(df), shingle_k=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["n_grams_distinct"].tolist() == [2, 2, 2]
    assert (got["n_dup_grams"] == 0).all()
    # short docs (no grams at all) keep their zero rows
    df2 = pd.DataFrame({"doc_id": np.array([0, 1], dtype=np.int64),
                        "text": ["one two", "x y z x y z"]})
    got2 = (corpus.crossdoc_dup_mass(rd.from_pandas(df2), shingle_k=3)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # "x y z x y z": 4 gram instances but only 3 DISTINCT
    assert got2["n_grams_distinct"].tolist() == [0, 3]
