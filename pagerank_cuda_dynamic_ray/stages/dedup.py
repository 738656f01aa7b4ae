"""Deduplication stages for the documents table (Ray Data pipelines).

Exact dedup, MinHash+LSH, SimHash, n-gram Jaccard and embedding-cosine
near-dup — the training-data-pipeline operators a 100 TB corpus needs.
Patterns per the Ray Data guide: content-hash in a vectorized
``map_batches`` then ``groupby(hash)`` for exact; shingle→minhash→band
explode → band-key ``groupby`` → candidate pairs → verify for near-dup.
Candidate-pair clustering runs driver-side ONLY on the (tiny) verified
pair set; at larger scale the same pairs feed the engine's distributed
min-label CC (pipelines/analytics.py) — documented scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions import hashing as H

MAX_BUCKET = 64  # candidate-pair cap per LSH bucket (quadratic guard; logged)


# ----------------------------------------------------------------------
# exact dedup
# ----------------------------------------------------------------------

def exact_dedup(docs: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Exact dedup: hash-partition on content hash, keep min id per
    distinct text. Returns (doc_id, n_dups) — one row per distinct text.
    """

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[id_col, text_col]].copy()
        batch["h"] = H.hash_strings(batch[text_col].tolist()).astype(np.int64)
        return batch

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        # within a hash bucket, dedup by exact text (collision-safe)
        agg = group.groupby(text_col, sort=True)[id_col].agg(["min", "count"]).reset_index(drop=True)
        return pd.DataFrame({"doc_id": agg["min"].astype(np.int64), "n_dups": agg["count"].astype(np.int64)})

    return (
        docs.map_batches(add_hash, batch_format="pandas")
        .groupby("h")
        .map_groups(keep_first, batch_format="pandas")
    )


# ----------------------------------------------------------------------
# shingling helpers (shared by minhash / jaccard)
# ----------------------------------------------------------------------

def _word_shingles(texts: list[str], k: int = 3) -> list[np.ndarray]:
    """Per-doc array of hashed word k-gram shingles (unique, uint64)."""
    out = []
    for t in texts:
        ws = t.split()
        if len(ws) < k:
            grams = [" ".join(ws)] if ws else []
        else:
            grams = [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]
        out.append(np.unique(H.hash_strings(grams)) if grams else np.empty(0, dtype=np.uint64))
    return out


class MinHashStage:
    """Actor-pool stage: text -> (band, band_hash, doc_id) rows.

    Permutation salts are built once per actor in ``__init__`` (stateful
    stage pattern); each batch is shingled, minhashed and exploded into
    one row per LSH band.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 7):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.k, self.seed = num_perm, bands, shingle_k, seed
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = _word_shingles(batch["text"].tolist(), self.k)
        sigs = H.minhash_signatures(sh, self.num_perm, self.seed)
        band_hashes = np.empty((len(sh), self.bands), dtype=np.int64)
        for b in range(self.bands):
            chunk = sigs[:, b * self.rows_per_band:(b + 1) * self.rows_per_band]
            acc = np.zeros(len(sh), dtype=np.uint64)
            for c in range(chunk.shape[1]):
                acc = H.mix2(acc, chunk[:, c])
            band_hashes[:, b] = acc.astype(np.int64)
        n = len(batch)
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(self.bands), n),
                "band_hash": band_hashes.reshape(-1),
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), self.bands),
            }
        )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs (a<b) within one LSH bucket, capped at MAX_BUCKET ids."""
    ids = np.unique(group["doc_id"].to_numpy())[:MAX_BUCKET]
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
    iu, ju = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[iu], "b": ids[ju]})


def minhash_candidates(docs: rd.Dataset, num_perm: int = 64, bands: int = 16,
                       shingle_k: int = 3) -> rd.Dataset:
    """documents -> distinct candidate near-dup pairs via MinHash LSH."""
    bands_ds = docs.map_batches(
        MinHashStage, batch_format="pandas", batch_size=2048,
        concurrency=2, fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
    )
    pairs = bands_ds.groupby(["band", "band_hash"]).map_groups(_bucket_pairs, batch_format="pandas")
    # distinct pairs (a,b)
    return pairs.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


def verify_jaccard(pairs: rd.Dataset, docs: rd.Dataset, threshold: float = 0.7,
                   shingle_k: int = 3) -> rd.Dataset:
    """Exact shingle-set Jaccard for candidate pairs.

    The doc texts are broadcast once via ``ray.put`` (small side) and
    looked up per batch — no shuffle join. Returns (a, b, jaccard) for
    pairs meeting the threshold.
    """
    texts_ref = ray.put(dict(zip(
        docs.to_pandas()["doc_id"].tolist(), docs.to_pandas()["text"].tolist()
    )))

    class Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            a_sh = _word_shingles([self.texts[i] for i in batch["a"]], shingle_k)
            b_sh = _word_shingles([self.texts[i] for i in batch["b"]], shingle_k)
            jac = np.array([
                len(np.intersect1d(x, y)) / max(1, len(np.union1d(x, y)))
                for x, y in zip(a_sh, b_sh)
            ])
            out = batch.copy()
            out["jaccard"] = jac
            return out[out["jaccard"] >= threshold]

    return pairs.map_batches(Verify, batch_format="pandas", batch_size=4096, concurrency=2)


def cluster_pairs(pairs_df: pd.DataFrame, all_ids: np.ndarray) -> pd.DataFrame:
    """Union-find over the verified pair set -> (doc_id, cluster_id, keep).

    Driver-side: the verified near-dup pair set is orders of magnitude
    smaller than the corpus. At scale, feed the pairs into the engine's
    distributed min-label CC instead (same semantics).
    """
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs_df.get("a", []), pairs_df.get("b", [])):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    cluster = np.array([find(int(i)) for i in all_ids], dtype=np.int64)
    return pd.DataFrame({
        "doc_id": all_ids.astype(np.int64),
        "cluster_id": cluster,
        "keep": cluster == all_ids,
    })


def minhash_dedup(docs: rd.Dataset, threshold: float = 0.7, num_perm: int = 64,
                  bands: int = 16, shingle_k: int = 3) -> pd.DataFrame:
    """Full MinHash-LSH near-dup pipeline -> (doc_id, cluster_id, keep)."""
    cands = minhash_candidates(docs, num_perm, bands, shingle_k)
    verified = verify_jaccard(cands, docs, threshold, shingle_k).to_pandas()
    ids = np.sort(docs.to_pandas()["doc_id"].to_numpy())
    return cluster_pairs(verified, ids)


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------

class SimHashStage:
    """Actor-pool stage: text -> (doc_id, simhash, chunk0..chunk3)."""

    def __init__(self, seed: int = 7):
        self.seed = seed

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        tokens = [
            H.hash_strings(t.split(), seed=self.seed) if t else np.empty(0, dtype=np.uint64)
            for t in batch["text"]
        ]
        sig = H.simhash64(tokens)
        out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "simhash": sig.astype(np.int64)})
        for c in range(4):
            out[f"chunk{c}"] = ((sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
        return out


def simhash_dedup(docs: rd.Dataset, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup: 4×16-bit chunk blocking (pigeonhole: hamming≤3
    guarantees one identical chunk), verify hamming, cluster."""
    sigs = docs.map_batches(SimHashStage, batch_format="pandas", batch_size=4096, concurrency=2)
    sig_pdf = sigs.to_pandas()
    cand = []
    for c in range(4):
        p = (
            rd.from_pandas(sig_pdf[["doc_id", f"chunk{c}"]].rename(columns={f"chunk{c}": "band_hash"}))
            .groupby("band_hash")
            .map_groups(lambda g: _bucket_pairs(g), batch_format="pandas")
        )
        cand.append(p.to_pandas())
    pairs = pd.concat(cand).drop_duplicates(["a", "b"]) if cand else pd.DataFrame({"a": [], "b": []})
    sig_map = dict(zip(sig_pdf["doc_id"], sig_pdf["simhash"].astype(np.uint64)))
    if len(pairs):
        av = np.array([sig_map[i] for i in pairs["a"]], dtype=np.uint64)
        bv = np.array([sig_map[i] for i in pairs["b"]], dtype=np.uint64)
        ham = H.hamming64(av, bv)
        pairs = pairs[ham <= max_hamming]
    ids = np.sort(sig_pdf["doc_id"].to_numpy())
    return cluster_pairs(pairs, ids)


# ----------------------------------------------------------------------
# embedding cosine near-dup
# ----------------------------------------------------------------------

def embedding_neardup_pairs(embeddings: rd.Dataset, threshold: float = 0.95) -> pd.DataFrame:
    """Cosine-similar (a<b) pairs above threshold.

    Blocked brute force: the normalized matrix is broadcast once
    (``ray.put``); each batch computes its block row of the similarity
    matrix with one matmul. O(n²·d) flops but streaming memory — the
    correct baseline at verification scale; the LSH-bucketed variant in
    stages/similarity.py is the scale path.
    """
    pdf = embeddings.to_pandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_list()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, m = ray.get(ref)
        q = np.stack(batch["embedding"].to_list()).astype(np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ m.T
        qa = batch["vec_id"].to_numpy()
        ai, bj = np.nonzero(sims >= threshold)
        a, b = qa[ai], all_ids[bj]
        keep = a < b
        return pd.DataFrame({"a": a[keep], "b": b[keep],
                             "cosine": sims[ai, bj][keep]})

    out = embeddings.map_batches(block, batch_format="pandas", batch_size=1024).to_pandas()
    if "a" not in out.columns:  # every block empty -> schema-less result
        out = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                            "b": pd.Series([], dtype=np.int64),
                            "cosine": pd.Series([], dtype=np.float64)})
    return out.sort_values(["a", "b"]).reset_index(drop=True)
