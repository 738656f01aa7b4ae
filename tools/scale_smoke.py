"""Order-of-magnitude scale smoke for the join/dedup-heavy keys
(VERDICT r4 #5): run crossdoc_dup_mass, minhash_dedup, ngram_exact_dedup
and the curation chain on a deterministically synthesized documents
table at 1x and 10x rows, and report wall time + driver peak RSS so the
"O(rows) design" claims get a measured point instead of an argument.

The corpus is synthesized (seeded, reproducible) rather than replicated
from sf0.1: naive 10x replication would make EVERY doc a 10-way
near-dup, exploding candidate-pair volume and measuring the caps rather
than row scaling. Generator: word sampling from the real sf0.1
vocabulary with a Zipf-ish rank skew, doc lengths resampled from the
real length distribution, plus 1% planted near-dup pairs (one word
substituted) so the dedup paths stay non-trivial.

Usage:  python tools/scale_smoke.py [--cpus 32]
Prints one JSON line per scale level; record results in BASELINE.md.
"""
from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = "/tmp/graft_scale_smoke"
BASE_ROWS = 5_000


from pagerank_cuda_dynamic_ray.functions.hashing import (  # noqa: E402
    splitmix64 as _splitmix64)


def synth_documents(n_rows: int, seed: int = 42) -> pa.Table:
    real = pq.read_table(os.path.join(SF01, "documents.parquet"),
                         columns=["text", "lang"])
    texts = real["text"].to_pylist()
    langs = [l for l in real["lang"].to_pylist() if l]
    vocab: list[str] = []
    seen = set()
    for t in texts:
        for w in t.split():
            if w not in seen:
                seen.add(w)
                vocab.append(w)
    vocab = np.array(vocab)
    lens = np.array([len(t.split()) for t in texts], dtype=np.int64)
    rng_l = _splitmix64(np.arange(n_rows, dtype=np.uint64) + np.uint64(seed))
    doc_lens = lens[(rng_l % np.uint64(len(lens))).astype(np.int64)]
    total = int(doc_lens.sum())
    # Zipf-ish skew: square a uniform hash so low ranks dominate
    h = _splitmix64(np.arange(total, dtype=np.uint64) + np.uint64(seed * 7919))
    u = (h.astype(np.float64) / 2**64)
    ranks = (u * u * len(vocab)).astype(np.int64).clip(0, len(vocab) - 1)
    words = vocab[ranks]
    offs = np.concatenate([[0], np.cumsum(doc_lens)])
    docs = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_rows)]
    # plant 1% near-dup pairs: doc i copies doc i-1 with one word swapped
    n_pairs = n_rows // 100
    tgt = np.arange(1, n_rows, max(2, n_rows // max(n_pairs, 1)))[:n_pairs]
    for i in tgt:
        ws = docs[i - 1].split()
        if len(ws) > 3:
            ws[len(ws) // 2] = "nearduptoken%d" % i
            docs[i] = " ".join(ws)
    lang_pool = np.array(sorted(set(langs)))
    lr = _splitmix64(np.arange(n_rows, dtype=np.uint64) + np.uint64(seed * 31))
    lang_col = lang_pool[(lr % np.uint64(len(lang_pool))).astype(np.int64)]
    return pa.table({
        "doc_id": pa.array(np.arange(n_rows, dtype=np.int64)),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(lang_col.tolist(), pa.string()),
        "source": pa.array(["synth"] * n_rows, pa.string()),
        "n_chars": pa.array(np.array([len(d) for d in docs], np.int64)),
    })


def run_level(mult: int, num_cpus: int) -> dict:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from pagerank_cuda_dynamic_ray.stages import corpus as CO
    from pagerank_cuda_dynamic_ray.stages import dedup as D
    from pagerank_cuda_dynamic_ray.stages import sampling as SP
    from pagerank_cuda_dynamic_ray.stages import text_stage as TS

    n = BASE_ROWS * mult
    path = os.path.join(OUT_DIR, f"documents_x{mult}.parquet")
    if not os.path.exists(path):
        os.makedirs(OUT_DIR, exist_ok=True)
        pq.write_table(synth_documents(n), path)
    docs = rd.read_parquet(path, columns=["doc_id", "text"],
                           override_num_blocks=num_cpus)
    out: dict = {"rows": n, "mult": mult, "num_cpus": num_cpus}

    t0 = time.perf_counter()
    CO.crossdoc_dup_mass(docs, 3).materialize()
    out["crossdoc_dup_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    D.minhash_dedup(docs).materialize()
    out["minhash_dedup_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    D.ngram_exact_dedup(docs, k=3).materialize()
    out["ngram_exact_dedup_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    kept = TS.quality_filter(docs, min_quality=0.2, min_tokens=5) \
        .select_columns(["doc_id", "lang"])
    kd = docs.join(kept, "inner", 8, on=("doc_id",))
    reps = D.exact_dedup(kd)
    reps_lang = reps.join(kept, "inner", 8, on=("doc_id",))
    SP.hash_split(reps_lang, {"train": 0.9, "val": 0.1}, seed=0).materialize()
    out["curation_chain_s"] = round(time.perf_counter() - t0, 3)

    out["driver_peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
    ray.shutdown()
    return out


def main() -> None:
    cpus = 32
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
    for mult in (1, 10):
        print(json.dumps(run_level(mult, cpus)))


if __name__ == "__main__":
    main()
