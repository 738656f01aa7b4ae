"""Corpus-preparation stages for LLM training-data pipelines.

Document chunking, token-budget sequence packing, BM25-lite relevance
scoring, benchmark-contamination screening and prefix-duplicate
grouping over the ``documents`` table — the curation steps that sit
between dedup/quality filtering (stages/dedup.py, stages/text_stage.py)
and tokenizer hand-off in a 100 TB pipeline.

Scale contracts mirror the rest of the engine:

* chunking / scoring are row-local ``map_batches`` — no shuffle at all;
* packing ships only (doc_id, n_tokens) through one sort and carries
  O(blocks) scalars through the driver (the running_total pattern,
  stages/temporal.py:499);
* contamination broadcasts the (small) benchmark shingle set once via
  ``ray.put`` and scans the corpus distributed — the corpus side never
  shuffles;
* prefix grouping reuses :func:`stages.dedup.exact_dedup`'s 128-bit
  hash sort, shipping 24 bytes/row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .dedup import _shingles_flat, exact_dedup


def _tok(text: str) -> list[str]:
    return text.split() if text else []


def _strict_shingles(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc unique word-k-gram hashes with STRICT semantics: a doc
    shorter than ``k`` tokens contributes NO shingles — matching the
    SQL oracles' ``generate_series(1, len(ws) - k + 1)`` bound. (The
    near-dup family deliberately uses rolling_kgram_hashes' combine-all
    fallback instead, so a 2-token doc can still minhash-match its
    duplicate; here the fallback would fabricate a phantom k-gram.)"""
    flat, offs = _shingles_flat(texts, k)
    lens = np.fromiter((len(_tok(t)) for t in texts), dtype=np.int64,
                       count=len(texts))
    counts = np.diff(offs)
    keep_doc = lens >= k
    flat = flat[np.repeat(keep_doc, counts)]
    counts = np.where(keep_doc, counts, 0)
    return flat, np.concatenate([[0], np.cumsum(counts)])


# ----------------------------------------------------------------------
# chunking
# ----------------------------------------------------------------------

def chunk_documents(docs: rd.Dataset, size: int = 32, stride: int = 24,
                    text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Split every document into fixed-size token windows with overlap
    (stride < size ⇒ size−stride tokens shared between neighbours) —
    the context-window pre-chunking step of an embedding / pretraining
    pipeline. A document with n tokens emits ``1 + ceil(max(0, n−size)
    / stride)`` chunks (0 when n == 0); the final chunk is the tail
    remainder, never padded.

    Row-local and shuffle-free: chunk text is re-joined with single
    spaces so the DuckDB oracle (array_to_string over list slices)
    replays it byte-for-byte. Windows whose start would fall past the
    last token (possible only when stride > size) are dropped, so every
    emitted chunk is non-empty. Returns Dataset(doc_id, chunk_idx,
    n_tokens, chunk_text)."""
    if stride < 1 or size < 1:
        raise ValueError("size and stride must be >= 1")

    def chunks(batch: pd.DataFrame) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "chunk_idx": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "chunk_text": pa.array([], pa.string())})
        toks = batch[text_col].fillna("").str.split()  # == _tok per row
        lens = toks.str.len().to_numpy(np.int64)
        keep = lens > 0
        if not keep.any():
            return empty
        ids = batch[id_col].to_numpy(np.int64)[keep]
        toks = toks[keep]
        lens = lens[keep]
        joined = toks.str.join(" ").to_numpy()
        # chunk count: 1 + ceil(max(0, n-size)/stride), minus any window
        # starting at or past n (stride > size regime)
        nch = np.where(lens > size, 1 + -(-(lens - size) // stride), 1)
        nch = np.minimum(nch, -(-lens // stride)).astype(np.int64)
        total = int(nch.sum())
        docrep = np.repeat(np.arange(len(ids)), nch)
        cidx = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(nch) - nch, nch)
        tstart = cidx * stride
        tend = np.minimum(tstart + size, lens[docrep])
        # char offset of each token inside its re-joined doc: exclusive
        # within-doc cumsum of (token_len + 1)
        tlen = toks.explode().str.len().to_numpy(np.int64)
        bounds = np.concatenate([[0], np.cumsum(lens)])
        g = tlen + 1
        excl = np.cumsum(g) - g
        tok_cs = excl - np.repeat(excl[bounds[:-1]], lens)
        tok_ce = tok_cs + tlen
        cs = tok_cs[bounds[docrep] + tstart]
        ce = tok_ce[bounds[docrep] + tend - 1]
        return pa.table({
            id_col: pa.array(ids[docrep]),
            "chunk_idx": pa.array(cidx),
            "n_tokens": pa.array(tend - tstart),
            "chunk_text": pa.array(
                [joined[d][s:e] for d, s, e in zip(docrep, cs, ce)],
                pa.string()),
        })

    return docs.map_batches(chunks, batch_format="pandas")


# ----------------------------------------------------------------------
# token-budget sequence packing
# ----------------------------------------------------------------------

def pack_token_bins(docs: rd.Dataset, budget: int = 256,
                    text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Contiguous token-budget packing: documents in ``doc_id`` order
    are laid head-to-tail into a token stream; doc i's bin is
    ``prefix_tokens(i) // budget`` (where it STARTS) and ``bin_offset``
    its token offset within that bin — SQL's exclusive running-sum
    window, the deterministic stand-in for greedy sequence packing
    (deterministic ⇒ resumable: a re-run assigns identical bins).

    One all-to-all sort of (doc_id, n_tokens) — 16 bytes/row, never
    text — then the O(blocks) carry contract of running_total
    (stages/temporal.py:499): pass 1 ships one (first_doc_id, total)
    scalar pair per block to the driver, pass 2 adds the exclusive
    block prefix. Returns Dataset(doc_id, n_tokens, bin, bin_offset)."""

    def counts(batch: pd.DataFrame) -> pa.Table:
        n = np.fromiter((len(_tok(t)) for t in batch[text_col].tolist()),
                        dtype=np.int64, count=len(batch))
        return pa.table({id_col: pa.array(batch[id_col].to_numpy(np.int64)),
                         "n_tokens": pa.array(n)})

    srt = docs.map_batches(counts, batch_format="pandas").sort(id_col).materialize()

    def carry(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"first_id": np.empty(0, np.int64),
                                 "last_id": np.empty(0, np.int64),
                                 "tot": np.empty(0, np.int64)})
        return pd.DataFrame({"first_id": [int(df[id_col].iloc[0])],
                             "last_id": [int(df[id_col].iloc[-1])],
                             "tot": [int(df["n_tokens"].sum())]})

    cr = srt.map_batches(carry, batch_format="pandas", batch_size=None).to_pandas()
    bases: dict[int, int] = {}
    if len(cr):
        cr = cr.sort_values("first_id").reset_index(drop=True)
        excl = cr["tot"].cumsum().to_numpy() - cr["tot"].to_numpy()
        bases = dict(zip(cr["first_id"].astype(np.int64), excl.astype(np.int64)))
        # a duplicate-id run straddling a block boundary shows up as
        # consecutive blocks whose id ranges OVERLAP (prev last >= next
        # first) — the carry would silently misassign its rows; ids are
        # sorted, so strict inter-block ordering is the full check
        # (in-block duplicates are caught in assign below)
        lasts = cr["last_id"].to_numpy(np.int64)
        firsts = cr["first_id"].to_numpy(np.int64)
        if len(bases) != len(cr) or (len(cr) > 1
                                     and (lasts[:-1] >= firsts[1:]).any()):
            raise ValueError(
                "pack_token_bins: duplicate doc_id spans a block boundary; "
                "doc ids must be unique for deterministic packing")

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: np.empty(0, np.int64),
                                 "n_tokens": np.empty(0, np.int64),
                                 "bin": np.empty(0, np.int64),
                                 "bin_offset": np.empty(0, np.int64)})
        n = df["n_tokens"].to_numpy(np.int64)
        ids = df[id_col].to_numpy(np.int64)
        # ids are sorted within a post-sort block, so adjacent equality
        # is a full in-block duplicate check; cross-block duplicates are
        # caught by the carry pass's inter-block range-overlap check
        if len(ids) > 1 and (ids[1:] == ids[:-1]).any():
            raise ValueError(
                "pack_token_bins: duplicate doc_id; doc ids must be "
                "unique for deterministic packing")
        prev = np.cumsum(n) - n + bases.get(int(ids[0]), 0)
        return pd.DataFrame({id_col: ids,
                             "n_tokens": n,
                             "bin": prev // budget,
                             "bin_offset": prev % budget})

    return srt.map_batches(assign, batch_format="pandas", batch_size=None)


# ----------------------------------------------------------------------
# BM25-lite scoring
# ----------------------------------------------------------------------

def bm25_scores(docs: rd.Dataset, terms: list[str], k1: float = 1.2,
                b: float = 0.75, text_col: str = "text",
                id_col: str = "doc_id") -> rd.Dataset:
    """BM25-lite relevance of every document against a fixed query term
    set — the retrieval-style quality signal over a corpus. "lite": the
    idf factor is the rational (N − df + 0.5)/(df + 0.5) WITHOUT the
    log, keeping every per-term contribution a fixed IEEE-double
    expression over exact integers (N, df, tf, len, totlen) so the
    DuckDB oracle evaluates the identical parse tree bit-for-bit; each
    contribution is quantized to 1e-6 before the (integer) sum, so
    summation order can never flip a hash.

    Two passes, both shuffle-free: pass 1 folds per-block (n_docs,
    total_len, df[term]) partials — O(blocks × terms) scalars — on the
    driver; pass 2 broadcasts the stats and scores each block
    vectorized. avg doclen enters as len·N/totlen (integer products
    inside one double division), never a pre-divided float.

    Returns Dataset(doc_id, score_e6:int64)."""
    terms = list(terms)

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].tolist()
        toks = [_tok(t) for t in texts]
        sets = [set(w) for w in toks]  # once per doc, not once per (term, doc)
        row = {"n_docs": [len(texts)],
               "total_len": [int(sum(len(w) for w in toks))]}
        for i, term in enumerate(terms):
            row[f"df{i}"] = [int(sum(term in s for s in sets))]
        return pd.DataFrame(row)

    st = docs.map_batches(stats, batch_format="pandas").to_pandas().sum()
    N = int(st["n_docs"])
    totlen = int(st["total_len"])
    dfs = [int(st[f"df{i}"]) for i in range(len(terms))]
    if totlen == 0:
        # all-empty corpus: every tf is 0 so every score is exactly 0;
        # substitute 1 to keep (lens*N)/totlen from producing 0/0 NaN
        totlen = 1

    def score(batch: pd.DataFrame) -> pa.Table:
        texts = batch[text_col].tolist()
        toks = [np.array(_tok(t), dtype=object) for t in texts]
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                           count=len(toks))
        total = np.zeros(len(texts), dtype=np.int64)
        for term, df_t in zip(terms, dfs):
            tf = np.fromiter((int((w == term).sum()) if len(w) else 0 for w in toks),
                             dtype=np.int64, count=len(toks))
            idf = (N - df_t + 0.5) / (df_t + 0.5)
            denom = tf + k1 * (1.0 - b + b * (lens * N) / totlen)
            contrib = idf * (tf * (k1 + 1.0)) / denom
            total += np.floor(contrib * 1000000.0).astype(np.int64)
        return pa.table({id_col: pa.array(batch[id_col].to_numpy(np.int64)),
                         "score_e6": pa.array(total)})

    return docs.map_batches(score, batch_format="pandas")


# ----------------------------------------------------------------------
# benchmark-contamination screen
# ----------------------------------------------------------------------

def contamination_screen(docs: rd.Dataset, bench_mod: int = 20,
                         shingle_k: int = 5, text_col: str = "text",
                         id_col: str = "doc_id",
                         max_bench_shingles: int = 50_000_000) -> rd.Dataset:
    """Benchmark-contamination screen (the eval-leakage check every
    pretraining pipeline runs): the 'benchmark' is the deterministic
    subset ``doc_id % bench_mod == 0``; for every OTHER document,
    count how many of its DISTINCT word-``shingle_k``-grams occur in
    any benchmark document.

    The benchmark side is the small side by construction — its unique
    shingle-hash set is folded per block, union-reduced on the driver
    (refusing past ``max_bench_shingles`` rather than silently holding
    corpus-scale state) and broadcast ONCE via ``ray.put``; the corpus
    side then scans embarrassingly parallel with a searchsorted
    membership test. No shuffle anywhere.

    Returns Dataset(doc_id, n_grams, n_contaminated) over non-benchmark
    docs (zero-overlap rows included — the screen's full verdict)."""

    def bench_shingles(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(np.int64)
        sel = ids % bench_mod == 0
        flat, _ = _strict_shingles(
            batch.loc[sel, text_col].tolist(), shingle_k)
        return pd.DataFrame({"sh": np.unique(flat)})

    parts_ds = docs.map_batches(bench_shingles,
                                batch_format="pandas").materialize()
    # two-tier guard BEFORE the driver pull: the per-block-unique
    # partial row count upper-bounds the union, so when it passes the
    # pull is safe with zero extra work; when it exceeds the limit
    # (the bound is loose by up to the block count), fall back to an
    # EXACT distributed distinct count and refuse only on that — a
    # spurious refusal would otherwise scale with block count
    n_partial = parts_ds.count()
    if n_partial > max_bench_shingles:
        n_exact = parts_ds.groupby("sh").count().count()
        if n_exact > max_bench_shingles:
            raise ValueError(
                f"contamination_screen: benchmark shingle set ({n_exact}) "
                f"exceeds max_bench_shingles={max_bench_shingles}; shrink "
                "the benchmark subset or raise the limit deliberately")
    parts = parts_ds.to_pandas()
    bench = np.unique(parts["sh"].to_numpy(np.uint64))
    bench_ref = ray.put(bench)

    def screen(batch: pd.DataFrame) -> pa.Table:
        want = ray.get(bench_ref)
        ids = batch[id_col].to_numpy(np.int64)
        keep = ids % bench_mod != 0
        flat, offs = _strict_shingles(batch.loc[keep, text_col].tolist(), shingle_k)
        if len(want) and len(flat):
            pos = np.searchsorted(want, flat).clip(0, len(want) - 1)
            hit = (want[pos] == flat).astype(np.int64)
        else:
            hit = np.zeros(len(flat), dtype=np.int64)
        csum = np.concatenate([[0], np.cumsum(hit)])
        return pa.table({
            id_col: pa.array(ids[keep]),
            "n_grams": pa.array(np.diff(offs)),
            "n_contaminated": pa.array(csum[offs[1:]] - csum[offs[:-1]]),
        })

    return docs.map_batches(screen, batch_format="pandas")


# ----------------------------------------------------------------------
# within-document repetition profile
# ----------------------------------------------------------------------

def doc_repetition(docs: rd.Dataset, shingle_k: int = 3,
                   text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Within-document duplicate-k-gram profile — the Gopher-style
    repetition quality rule (Rae et al. 2021 §A1.1): per document, the
    total word-k-gram count vs the DISTINCT count; their gap is the
    repeated mass a quality filter thresholds on. Row-local, exact
    integers, no shuffle. Returns Dataset(doc_id, n_grams_total,
    n_grams_distinct)."""

    def profile(batch: pd.DataFrame) -> pa.Table:
        texts = batch[text_col].tolist()
        total = np.fromiter(
            (max(len(_tok(t)) - shingle_k + 1, 0) for t in texts),
            dtype=np.int64, count=len(texts))
        _, offs = _strict_shingles(texts, shingle_k)  # unique per doc, no <k fallback
        return pa.table({
            id_col: pa.array(batch[id_col].to_numpy(np.int64)),
            "n_grams_total": pa.array(total),
            "n_grams_distinct": pa.array(np.diff(offs)),
        })

    return docs.map_batches(profile, batch_format="pandas")


# ----------------------------------------------------------------------
# cross-document duplicate-gram mass
# ----------------------------------------------------------------------

def crossdoc_dup_mass(docs: rd.Dataset, shingle_k: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_partitions: int = 8,
                      broadcast_dup_limit: int = 2_000_000) -> rd.Dataset:
    """Cross-document duplicate-gram mass — the Lee et al. 2021
    (arXiv:2107.06499) span-dedup signal: per document, its distinct
    word-``shingle_k``-gram count and how many of those grams occur in
    at least one OTHER document. A span-level dedup pass thresholds on
    the ratio; unlike :func:`doc_repetition` (within-doc) this measures
    corpus-wide duplication.

    Two bounded exchanges, never text — and the corpus is tokenized
    exactly ONCE. The (gram-hash, doc) pair stream carries one SENTINEL
    gram per document (``h = INT64_MIN``; a real gram collides with it
    only when its 64-bit hash is exactly 2^63 — probability 2^-64 per
    distinct gram, the same collision class the gram hashing itself
    already accepts), so every doc_id — including
    zero-gram short docs — appears in the stream and the per-doc answer
    needs NO join-back with the doc table. The gram doc-frequency
    groupby yields the df>=2 set; marking the pair stream against it is
    size-gated: a set under ``broadcast_dup_limit`` ships once via
    ``ray.put`` and marks with a vectorized ``searchsorted`` (zero join
    ops in the hot path), a larger one falls back to one distributed
    left_outer hash join (which STREAMS — state/ray_join_patch fixes
    Ray 2.49's empty-leading-block join crash at the source). One final
    per-doc groupby folds distinct-count and dup-count together; the
    sentinel's own contribution (+1 distinct; +1 dup iff the corpus has
    >=2 docs, since its df is exactly n_docs) is subtracted exactly.
    The pair stream is materialized once as a deliberate fan-out
    barrier (two consumers; recomputing would re-tokenize the corpus).
    Returns Dataset(doc_id, n_grams_distinct, n_dup_grams) including
    zero rows."""
    import pyarrow.compute as pc

    SENT = np.int64(-2**63)  # reserved sentinel gram hash

    def pairs(batch: pd.DataFrame) -> pa.Table:
        flat, offs = _strict_shingles(batch[text_col].tolist(), shingle_k)
        dids = batch[id_col].to_numpy(np.int64)
        ids = np.repeat(dids, np.diff(offs))
        return pa.table({
            "h": pa.array(np.concatenate([flat.astype(np.int64),
                                          np.full(len(dids), SENT)])),
            id_col: pa.array(np.concatenate([ids, dids])),
        })

    # broadcast_dup_limit default: 2M hashes = 16 MB shipped once
    # materialize = deliberate fan-out barrier: two consumers (df
    # groupby, dup marking) read this stream, and without the barrier
    # each would re-tokenize the corpus
    prs = docs.map_batches(pairs, batch_format="pandas").materialize()
    dup = (prs.groupby("h").count()
           .map_batches(lambda t: t.filter(
               pc.greater_equal(t["count()"], 2)).select(["h"]),
               batch_format="pyarrow")
           .materialize())
    n_dup_grams_total = dup.count()
    # the sentinel's df is exactly n_docs, so it is itself a "dup" gram
    # iff the corpus has >= 2 docs — subtract its contribution per doc
    if n_dup_grams_total <= broadcast_dup_limit:
        dupset = np.sort(dup.to_pandas()["h"].to_numpy(np.int64))
        sent_dup = bool(len(dupset) and dupset[0] == SENT)
        ref = ray.put(dupset)

        def mark(t: pa.Table) -> pa.Table:
            ds_ = ray.get(ref)
            h = t["h"].to_numpy(zero_copy_only=False)
            if len(ds_):
                pos = np.searchsorted(ds_, h).clip(0, len(ds_) - 1)
                isd = (ds_[pos] == h).astype(np.int64)
            else:
                isd = np.zeros(len(h), np.int64)
            return pa.table({id_col: t[id_col], "is_dup": pa.array(isd)})

        marked = prs.map_batches(mark, batch_format="pyarrow")
    else:  # corpus-scale dup set: one distributed hash join (streams)
        from .dedup import _join_safe

        sent_dup = dup.map_batches(
            lambda t: t.filter(pc.equal(t["h"], SENT)),
            batch_format="pyarrow").count() > 0
        flag = dup.map_batches(
            lambda t: t.append_column("is_dup",
                                      pa.array(np.ones(t.num_rows, np.int64))),
            batch_format="pyarrow")
        # _join_safe = identity under ray_join_patch; on a future Ray
        # where the patch doesn't apply it restores the materialize
        # workaround for empty leading blocks (a block of only-short
        # docs emits a zero-row pairs block)
        marked = (_join_safe(prs, num_partitions)
                  .join(_join_safe(flag, num_partitions), "left_outer",
                        num_partitions, on=("h",))
                  .map_batches(lambda t: pa.table({
                      id_col: t[id_col],
                      "is_dup": pc.coalesce(t["is_dup"],
                                            pa.scalar(0, pa.int64()))}),
                      batch_format="pyarrow"))

    from ray.data.aggregate import Count, Sum

    per_doc = marked.groupby(id_col).aggregate(Count(), Sum("is_dup"))
    sent_adj = 1 if sent_dup else 0

    def fin(t: pa.Table) -> pa.Table:
        cnt = t["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
        sd = t["sum(is_dup)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_grams_distinct": pa.array(cnt - 1),  # minus the sentinel
            "n_dup_grams": pa.array(sd - sent_adj),
        })

    return per_doc.map_batches(fin, batch_format="pyarrow")


# ----------------------------------------------------------------------
# prefix-duplicate grouping
# ----------------------------------------------------------------------

def prefix_dup_groups(docs: rd.Dataset, k: int = 8, text_col: str = "text",
                      id_col: str = "doc_id") -> rd.Dataset:
    """Group documents by their first-``k``-token prefix (the
    boilerplate / mirrored-header detector): one row per distinct
    prefix, ``(doc_id = min id in group, n_dups = group size)``.
    Documents shorter than ``k`` tokens group by their full text.

    Pure reuse of :func:`stages.dedup.exact_dedup` — prefixes are
    derived row-locally and the sort ships only the 128-bit prefix
    hash, so the shuffle cost is identical to exact dedup regardless
    of document length."""

    def prefix(batch: pd.DataFrame) -> pd.DataFrame:
        texts = [" ".join(_tok(t)[:k]) for t in batch[text_col].tolist()]
        return pd.DataFrame({id_col: batch[id_col].to_numpy(np.int64),
                             "prefix": texts})

    return exact_dedup(docs.map_batches(prefix, batch_format="pandas"),
                       text_col="prefix", id_col=id_col)
