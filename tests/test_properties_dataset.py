"""Property-based tests over DATASET-level corpus operators.

Complement to test_properties.py (pure kernels): these drive the
round-3 corpus stages through real Ray Datasets under hypothesis-drawn
inputs AND hypothesis-drawn block layouts — the invariant a distributed
operator must hold is that the answer never depends on how rows are
split into blocks (the O(blocks) carry/boundary contracts). Examples
are kept small and few: each one runs Ray Data stages."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings, strategies as st

from pagerank_cuda_dynamic_ray.stages import corpus

settings.register_profile("dataset", deadline=None, max_examples=8)
settings.load_profile("dataset")

_WORDS = ["ga", "bu", "zo", "meu", "ka", "ra"]


def _docs_strategy():
    return st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30).map(" ".join),
        min_size=1, max_size=25,
    )


@given(_docs_strategy(), st.integers(1, 6), st.integers(2, 12), st.integers(1, 5))
def test_chunk_concat_reconstructs_tokens(texts, nblocks, size, stride):
    # with stride <= size, dropping each chunk's first (size - stride)
    # overlap tokens and concatenating reconstructs the token stream
    stride = min(stride, size)
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = corpus.chunk_documents(
        rd.from_pandas(df).repartition(nblocks), size=size, stride=stride
    ).to_pandas()
    if len(out) == 0:  # all-empty corpus: no chunks, nothing to rebuild
        assert all(not t.split() for t in texts)
        return
    for did, text in zip(df["doc_id"], df["text"]):
        ws = text.split()
        got = out[out["doc_id"] == did].sort_values("chunk_idx")
        rebuilt: list[str] = []
        for ci, ctext in zip(got["chunk_idx"], got["chunk_text"]):
            toks = ctext.split()
            rebuilt.extend(toks if ci == 0 else toks[size - stride:])
        # trailing chunks may re-cover already-seen tokens; the rebuilt
        # stream must START with the token stream and never diverge
        assert rebuilt[: len(ws)] == ws
        assert len(got) == (0 if not ws else
                            1 + max(0, -(-(len(ws) - size) // stride))
                            if len(ws) > size else (1 if ws else 0))


@given(_docs_strategy(), st.integers(1, 6), st.integers(1, 6), st.integers(4, 64))
def test_pack_bins_block_layout_invariant(texts, na, nb, budget):
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    a = (corpus.pack_token_bins(rd.from_pandas(df).repartition(na), budget)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (corpus.pack_token_bins(rd.from_pandas(df).repartition(nb), budget)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    n = df["text"].str.split().str.len().fillna(0).astype(np.int64).to_numpy()
    prev = np.cumsum(n) - n
    assert (a["bin"].to_numpy() == prev // budget).all()


@given(_docs_strategy(), st.integers(1, 6), st.integers(1, 4))
def test_prefix_dup_groups_block_layout_invariant(texts, nblocks, k):
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = (corpus.prefix_dup_groups(rd.from_pandas(df).repartition(nblocks), k=k)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pref = df["text"].str.split().str[:k].str.join(" ")
    want = (pd.DataFrame({"doc_id": df["doc_id"], "p": pref})
            .groupby("p")["doc_id"].agg(["min", "count"])
            .sort_values("min").reset_index(drop=True))
    assert (out["doc_id"].to_numpy() == want["min"].to_numpy()).all()
    assert (out["n_dups"].to_numpy() == want["count"].to_numpy()).all()
