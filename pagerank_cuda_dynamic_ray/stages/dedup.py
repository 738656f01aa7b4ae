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
    """Exact dedup: distributed sort on a 128-bit content hash (two
    independent splitmix64 lanes), keep min id per distinct hash pair.
    Returns (doc_id, n_dups) — one row per distinct text.

    The all-to-all sort ships only (doc_id, h, h2) — 24 bytes/row —
    never the text payload, so at 100 TB the shuffle moves ~0.1% of the
    corpus instead of all of it. Collision risk for the 128-bit pair is
    n²/2¹²⁹ — far below hardware error rates at any feasible corpus.

    A sorted-segment pass instead of groupby().map_groups: every hash
    segment fully inside a block aggregates with one vectorized pandas
    groupby per block; only segments straddling block boundaries (≤ 2
    per block) merge driver-side as per-block partials."""

    def add_hash(batch: pd.DataFrame) -> pa.Table:
        # Arrow output: Ray's sort on pandas blocks is several times
        # slower than on Arrow blocks (same finding as ngram_exact_dedup)
        txts = batch[text_col].tolist()
        return pa.table({
            id_col: pa.array(batch[id_col].to_numpy(np.int64)),
            "h": pa.array(H.hash_strings(txts, seed=0).astype(np.int64)),
            "h2": pa.array(H.hash_strings(txts, seed=1).astype(np.int64)),
        })

    srt = docs.map_batches(add_hash, batch_format="pandas").sort("h").materialize()

    def agg_keys(pdf: pd.DataFrame) -> pd.DataFrame:
        agg = pdf.groupby(["h", "h2"], sort=True)[id_col].agg(["min", "count"]).reset_index(drop=True)
        return pd.DataFrame({"doc_id": agg["min"].astype(np.int64),
                             "n_dups": agg["count"].astype(np.int64)})

    def block_complete(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["h"].to_numpy()
        bounds = np.flatnonzero(np.diff(k)) + 1
        if len(bounds) == 0:  # single segment: all boundary
            return agg_keys(batch.iloc[0:0])
        return agg_keys(batch.iloc[bounds[0]:bounds[-1]])

    def block_boundary(batch: pd.DataFrame) -> pd.DataFrame:
        # PARTIAL-AGGREGATE the boundary slice before it leaves the
        # block: one (h, h2, min_id, cnt) row per distinct boundary key,
        # NOT the raw rows — a hash run spanning many blocks (a text
        # duplicated across most of the corpus) would otherwise ship an
        # unbounded number of rows to the driver
        k = batch["h"].to_numpy()
        bounds = np.flatnonzero(np.diff(k)) + 1
        first_end = bounds[0] if len(bounds) else len(k)
        last_start = bounds[-1] if len(bounds) else 0
        idx = np.unique(np.concatenate([np.arange(first_end), np.arange(last_start, len(k))]))
        part = batch.iloc[idx]
        g = part.groupby(["h", "h2"], sort=True)[id_col].agg(["min", "count"]).reset_index()
        return pd.DataFrame({
            "h": g["h"].astype(np.int64),
            "h2": g["h2"].astype(np.int64),
            "min_id": g["min"].astype(np.int64),
            "cnt": g["count"].astype(np.int64),
        })

    # complete segments stay a DISTRIBUTED Dataset; the boundary set
    # merges driver-side as per-block PARTIALS (one row per distinct
    # boundary key per block — bounded by block count, never by corpus
    # skew) and is unioned back in
    complete = srt.map_batches(block_complete, batch_format="pandas", batch_size=None)
    bnd = srt.map_batches(block_boundary, batch_format="pandas", batch_size=None).to_pandas()
    if len(bnd):
        g = (bnd.groupby(["h", "h2"], sort=True)
             .agg(min_id=("min_id", "min"), cnt=("cnt", "sum")).reset_index())
        fixup = pd.DataFrame({"doc_id": g["min_id"].astype(np.int64),
                              "n_dups": g["cnt"].astype(np.int64)})
    else:
        fixup = pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64), "n_dups": pd.Series([], dtype=np.int64)}
        )
    if len(fixup):
        return complete.union(rd.from_pandas(fixup))
    return complete


def ngram_exact_dedup(docs: rd.Dataset, k: int = 3, text_col: str = "text",
                      id_col: str = "doc_id") -> rd.Dataset:
    """Exact n-gram duplication profile (the doc-level form of
    exact-substring dedup a la Lee et al., "Deduplicating Training Data
    Makes Language Models Better"): for every document, how many of its
    DISTINCT word k-grams also occur in at least one other document.

    Shape: shingle-hash rows (sh, doc_id) -> distributed sort on sh ->
    sorted-segment pass (the exact_dedup machinery): a k-gram shared
    within one block credits its docs locally; only runs touching a
    block edge defer to a driver fix-up, and those ship ONE partial row
    per (block, edge run) — (sh, local count, the doc id only when the
    local count is 1) — so a k-gram duplicated across the whole corpus
    still costs O(blocks), never O(occurrences). Per-doc totals merge
    through one combiner groupby, not a join. Returns
    Dataset(doc_id, n_ngrams, dup_ngrams), one row per document.
    """

    def emit(batch: pd.DataFrame) -> "pa.Table":
        # Arrow outputs everywhere below: Ray's sort/groupby on pandas
        # blocks is ~12x slower than on Arrow blocks (measured sf0.1)
        flat, offs = _shingles_flat(batch[text_col].tolist(), k)
        ids = np.repeat(batch[id_col].to_numpy(), np.diff(offs))
        return pa.table({"sh": pa.array(flat.astype(np.int64)),
                         id_col: pa.array(ids.astype(np.int64))})

    def totals(batch: pd.DataFrame) -> "pa.Table":
        _, offs = _shingles_flat(batch[text_col].tolist(), k)
        return pa.table({
            id_col: pa.array(batch[id_col].to_numpy().astype(np.int64)),
            "n_ngrams": pa.array(np.diff(offs).astype(np.int64)),
            "dup_ngrams": pa.array(np.zeros(len(batch), dtype=np.int64)),
        })

    srt = docs.map_batches(emit, batch_format="pandas").sort("sh").materialize()

    def credit(part: pd.DataFrame) -> "pa.Table":
        """Per-block dup credits for rows whose run qualifies locally."""
        g = part.groupby(id_col).size().reset_index(name="dup_ngrams")
        return pa.table({
            id_col: pa.array(g[id_col].to_numpy(np.int64)),
            "n_ngrams": pa.array(np.zeros(len(g), dtype=np.int64)),
            "dup_ngrams": pa.array(g["dup_ngrams"].to_numpy(np.int64)),
        })

    def block_complete(batch: pd.DataFrame) -> pd.DataFrame:
        sh = batch["sh"].to_numpy()
        bounds = np.flatnonzero(np.diff(sh)) + 1
        if len(bounds) == 0:
            # single run spanning the whole block: an edge run, but a
            # local count >= 2 already qualifies — credit here
            return credit(batch if len(batch) >= 2 else batch.iloc[0:0])
        inner = batch.iloc[bounds[0]:bounds[-1]]
        ish = inner["sh"].to_numpy()
        _, inv, cnt = np.unique(ish, return_inverse=True, return_counts=True)
        qual = inner[cnt[inv] >= 2]
        # edge runs with local count >= 2 also qualify regardless of
        # what neighboring blocks hold — credit them here, not driver-side
        first = batch.iloc[:bounds[0]]
        last = batch.iloc[bounds[-1]:]
        edges = [e for e in (first, last) if len(e) >= 2]
        return credit(pd.concat([qual] + edges) if edges else qual)

    def block_boundary(batch: pd.DataFrame) -> pd.DataFrame:
        sh = batch["sh"].to_numpy()
        bounds = np.flatnonzero(np.diff(sh)) + 1
        if len(bounds) == 0:
            runs = [batch]
        else:
            runs = [batch.iloc[:bounds[0]], batch.iloc[bounds[-1]:]]
        rows = []
        for run in runs:
            if not len(run):
                continue
            rows.append({
                "sh": np.int64(run["sh"].iloc[0]),
                "cnt": np.int64(len(run)),
                # only a locally-single doc still needs the global verdict
                id_col: np.int64(run[id_col].iloc[0]) if len(run) == 1 else np.int64(-1),
            })
        return pd.DataFrame(rows, columns=["sh", "cnt", id_col]).astype(np.int64)

    # materialize the two combiner branches (rows ∝ documents, the same
    # magnitude as the final result): a union of LAZY branches schedules
    # pathologically under the downstream groupby (measured 17s vs 2.4s
    # at sf0.1 — both branches re-execute with task-pool contention)
    complete = srt.map_batches(block_complete, batch_format="pandas",
                               batch_size=None).materialize()
    bnd = srt.map_batches(block_boundary, batch_format="pandas", batch_size=None).to_pandas()
    parts = [docs.map_batches(totals, batch_format="pandas").materialize(), complete]
    if len(bnd):
        tot = bnd.groupby("sh")["cnt"].transform("sum")
        fix = bnd[(bnd[id_col] >= 0) & (tot >= 2)]
        if len(fix):
            g = fix.groupby(id_col).size().reset_index(name="dup_ngrams")
            parts.append(rd.from_arrow(pa.table({
                id_col: pa.array(g[id_col].to_numpy(np.int64)),
                "n_ngrams": pa.array(np.zeros(len(g), dtype=np.int64)),
                "dup_ngrams": pa.array(g["dup_ngrams"].to_numpy(np.int64)),
            })))
    out = parts[0].union(*parts[1:])

    def fin(t: pa.Table) -> pa.Table:
        # format-agnostic rename: rename_columns breaks on pandas-format
        # blocks (which a from_pandas input propagates into the groupby)
        return pa.table({id_col: t[id_col],
                         "n_ngrams": t["sum(n_ngrams)"],
                         "dup_ngrams": t["sum(dup_ngrams)"]})

    return (
        out.groupby(id_col)
        .sum(["n_ngrams", "dup_ngrams"])
        .map_batches(fin, batch_format="pyarrow")
    )


# ----------------------------------------------------------------------
# shingling helpers (shared by minhash / jaccard)
# ----------------------------------------------------------------------

def _shingles_flat(texts: list[str], k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Hashed word-k-gram shingle sets for a batch of texts, flat layout.

    One vectorized hash pass over ALL tokens of the batch
    (poly_token_hash64 — base-131 byte fold + splitmix64, the same
    SQL-replicable hash SimHash uses, which is what lets the DuckDB
    oracle recompute the whole MinHash pipeline), then a rolling
    k-combine (functions/hashing.rolling_kgram_hashes) — no per-shingle
    string joins. Returns (flat unique shingle hashes, (n+1,) offsets).
    """
    toks: list[str] = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        ws = t.split() if t else []     # null/empty text -> empty set
        toks.extend(ws)
        lens[i] = len(ws)
    offs = np.concatenate([[0], np.cumsum(lens)])
    th = H.poly_token_hash64(toks)
    return H.rolling_kgram_hashes(th, offs, k)


def _word_shingles(texts: list[str], k: int = 3) -> list[np.ndarray]:
    """Per-doc array of hashed word k-gram shingles (unique, uint64)."""
    flat, offs = _shingles_flat(texts, k)
    return [flat[offs[i]:offs[i + 1]] for i in range(len(texts))]


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
        flat, offs = _shingles_flat(batch["text"].tolist(), self.k)
        n = len(batch)
        sigs = H.minhash_signatures_flat(flat, offs, self.num_perm, self.seed)
        band_hashes = np.empty((n, self.bands), dtype=np.int64)
        for b in range(self.bands):
            chunk = sigs[:, b * self.rows_per_band:(b + 1) * self.rows_per_band]
            acc = np.zeros(n, dtype=np.uint64)
            for c in range(chunk.shape[1]):
                acc = H.mix2(acc, chunk[:, c])
            band_hashes[:, b] = acc.astype(np.int64)
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(self.bands), n),
                "band_hash": band_hashes.reshape(-1),
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), self.bands),
            }
        )


def _segment_pairs(ids: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                   cap: int = MAX_BUCKET):
    """Vectorized (a<b) pair emission for id segments with >= 2 members.

    Buckets larger than ``cap`` keep only their ``cap`` smallest unique
    ids (the quadratic-pair guard — NOT silent: overflow is warned with
    the dropped count). A doc beyond the cap in EVERY bucket it lands in
    escapes candidate pairing, so run ``exact_dedup`` first — exact
    duplicates are the one input class that overflows every bucket."""
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    overflow = dropped = 0
    for s, e in zip(starts, ends):
        if e - s >= 2:
            uniq = np.unique(ids[s:e])
            if len(uniq) > cap:
                overflow += 1
                dropped += len(uniq) - cap
                uniq = uniq[:cap]
            if len(uniq) >= 2:
                iu, ju = np.triu_indices(len(uniq), k=1)
                out_a.append(uniq[iu])
                out_b.append(uniq[ju])
    if overflow:
        import warnings

        warnings.warn(
            f"LSH bucket cap {cap} exceeded in {overflow} bucket(s); "
            f"{dropped} doc-slots not paired in those buckets — run "
            "exact_dedup first or raise max_bucket",
            stacklevel=2,
        )
    if not out_a:
        return (np.empty(0, dtype=np.int64),) * 2
    return np.concatenate(out_a), np.concatenate(out_b)


def bucket_pairs(keyed: rd.Dataset, max_bucket: int = MAX_BUCKET) -> rd.Dataset:
    """(bkey, doc_id) rows -> candidate pairs Dataset (a, b), deduped
    per block.

    Bucket grouping = a distributed ``sort`` on the bucket key followed
    by a vectorized sort-segment pairing pass per block (Ray Data's
    groupby-aggregate pays per-group Python cost — ruinous when nearly
    every LSH bucket is a singleton, and equally ruinous for the pair
    dedup itself: 100k+ groups take minutes). Buckets that straddle
    block boundaries (at most 2 per block) are collected and paired
    driver-side — a tiny, block-count-bounded set at any scale.

    Pairs are exactly deduped WITHIN each block; a pair surfacing from
    buckets in different blocks can appear a few times (bounded by its
    bucket count, e.g. bands/chunks). That is deliberate: downstream
    verification and union-find clustering are idempotent, so a global
    all-to-all distinct would buy nothing but a shuffle.
    Shared by MinHash-LSH and SimHash blocking."""
    def to_arrow(b: pd.DataFrame) -> pa.Table:
        # normalize to Arrow blocks before the shuffle: Ray's sort over
        # pandas blocks is several times slower (measured sf0.1)
        return pa.table({"bkey": pa.array(b["bkey"].to_numpy(np.int64)),
                         "doc_id": pa.array(b["doc_id"].to_numpy(np.int64))})

    srt = (keyed.map_batches(to_arrow, batch_format="pandas")
           .sort("bkey").materialize())

    def block_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["bkey"].to_numpy()
        ids = batch["doc_id"].to_numpy()
        bounds = np.flatnonzero(np.diff(k)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(k)]])
        # first/last segment may continue in a neighboring block — handled
        # by the boundary pass
        a, b = _segment_pairs(ids, starts[1:-1], ends[1:-1], max_bucket)
        out = pd.DataFrame({"a": a.astype(np.int64), "b": b.astype(np.int64)})
        return out.drop_duplicates(["a", "b"])

    def block_boundaries(batch: pd.DataFrame) -> pd.DataFrame:
        # each boundary segment is truncated to its max_bucket SMALLEST
        # unique ids before leaving the block: any id in the merged
        # segment's cap-smallest set is necessarily among its own
        # block's cap smallest, so the truncation is lossless w.r.t.
        # the capped pairing — and the driver-side set stays
        # O(blocks x cap) even when one bucket spans the whole dataset
        k = batch["bkey"].to_numpy()
        ids = batch["doc_id"].to_numpy()
        bounds = np.flatnonzero(np.diff(k)) + 1
        first_end = bounds[0] if len(bounds) else len(k)
        last_start = bounds[-1] if len(bounds) else 0
        outs = []
        for seg in ({0: first_end}, {last_start: len(k)}):
            (s, e), = seg.items()
            if e > s:
                outs.append(pd.DataFrame({
                    "bkey": k[s], "doc_id": np.unique(ids[s:e])[:max_bucket],
                }))
        out = pd.concat(outs) if outs else batch.iloc[0:0][["bkey", "doc_id"]]
        return out.drop_duplicates(["bkey", "doc_id"])

    pairs = srt.map_batches(block_pairs, batch_format="pandas", batch_size=None)
    bnd = srt.map_batches(block_boundaries, batch_format="pandas", batch_size=None).to_pandas()
    if len(bnd):
        bnd = bnd.sort_values(["bkey", "doc_id"])
        k = bnd["bkey"].to_numpy()
        ids = bnd["doc_id"].to_numpy()
        bounds = np.flatnonzero(np.diff(k)) + 1
        a, b = _segment_pairs(ids, np.concatenate([[0], bounds]),
                              np.concatenate([bounds, [len(k)]]), max_bucket)
        if len(a):
            pairs = pairs.union(rd.from_pandas(pd.DataFrame(
                {"a": a.astype(np.int64), "b": b.astype(np.int64)}
            ).drop_duplicates(["a", "b"])))
    return pairs


def minhash_candidates(docs: rd.Dataset, num_perm: int = 64, bands: int = 16,
                       shingle_k: int = 3) -> rd.Dataset:
    """documents -> distinct candidate near-dup pairs via MinHash LSH."""
    # a pre-built instance runs as a TASK pool (construction cost is one
    # pickle, no actor spin-up latency); pass the CLASS + concurrency to
    # get a long-lived actor pool instead when feeding a large corpus
    bands_ds = docs.map_batches(
        MinHashStage(num_perm=num_perm, bands=bands, shingle_k=shingle_k),
        batch_format="pandas", batch_size=1024,
    )

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            bkey = batch["band_hash"].to_numpy() * np.int64(bands) + batch["band"].to_numpy()
        return pd.DataFrame({"bkey": bkey, "doc_id": batch["doc_id"].to_numpy()})

    return bucket_pairs(bands_ds.map_batches(add_key, batch_format="pandas"))


def doc_shingle_blobs(docs: rd.Dataset, shingle_k: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      out_col: str = "sh") -> rd.Dataset:
    """Per-doc unique shingle-hash set, packed as ONE binary blob per
    doc (uint64 little-endian) — the verification payload that replaces
    shipping raw text. Blob, not list<uint64>: Acero hash joins carry
    binary non-key fields but reject list columns."""

    def f(batch: pd.DataFrame) -> pa.Table:
        flat, offs = _shingles_flat(batch[text_col].tolist(), shingle_k)
        blobs = [flat[offs[i]:offs[i + 1]].tobytes() for i in range(len(offs) - 1)]
        return pa.table({
            id_col: pa.array(batch[id_col].to_numpy(np.int64)),
            out_col: pa.array(blobs, pa.binary()),
        })

    return docs.map_batches(f, batch_format="pandas")


def _endpoint_ids(pairs: rd.Dataset, limit: int = 1_000_000):
    """Distinct endpoint ids of a (small, materialized) pair Dataset —
    an ids-only driver pull (16 B/pair) gated by ``limit``; returns
    None past the gate so callers fall back to fully-distributed
    plans."""
    if pairs.count() > limit:
        return None
    ab = pairs.select_columns(["a", "b"]).to_pandas()
    return np.unique(np.concatenate([ab["a"].to_numpy(np.int64),
                                     ab["b"].to_numpy(np.int64)]))


def _semi_filter(ds: rd.Dataset, col: str, uids: np.ndarray) -> rd.Dataset:
    """Broadcast semi-join: keep rows whose ``col`` is in the sorted id
    array ``uids`` (one ``ray.put``, ``searchsorted`` per batch)."""
    uids_ref = ray.put(uids)

    def semi(t: pa.Table) -> pa.Table:
        want = ray.get(uids_ref)
        ids = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(want) == 0:
            return t.slice(0, 0)
        pos = np.searchsorted(want, ids).clip(0, len(want) - 1)
        return t.filter(pa.array(want[pos] == ids))

    return ds.map_batches(semi, batch_format="pyarrow")


def normalized_exact_dedup(docs: rd.Dataset, text_col: str = "text",
                           id_col: str = "doc_id") -> rd.Dataset:
    """Exact dedup after canonical text normalization — lowercase, strip
    non-alphanumerics, collapse whitespace — the cheap first rung of the
    near-dup ladder that catches casing/punctuation mirror variants
    plain :func:`exact_dedup` misses. Normalization is row-local
    (vectorized pandas str ops, patterns in the RE2 ∩ Python-re
    agreement subset so a SQL oracle replays it byte-for-byte); the
    dedup then reuses exact_dedup's 24 B/row hash sort unchanged.
    Returns (doc_id, n_dups), one row per distinct normalized text."""

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").str.lower()
        s = s.str.replace(r"[^a-z0-9\s]", " ", regex=True)
        s = s.str.replace(r"\s+", " ", regex=True).str.strip()
        return pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                             "norm_text": s})

    return exact_dedup(docs.map_batches(norm, batch_format="pandas"),
                       text_col="norm_text", id_col=id_col)


def _join_safe(ds: rd.Dataset, num_partitions: int) -> rd.Dataset:
    """Ray 2.49's hash-shuffle ``Dataset.join`` loses a side's schema
    when that side's FIRST block is empty and raises ``ArrowInvalid:
    No match ... FieldRef`` (minimal repro in
    tests/test_stages.py::test_join_empty_leading_block). Rounds 2-4
    worked around it here by materializing every join input and
    repartitioning rows into block 0 — correct but it broke streaming
    at every join and serialized multi-join pipelines. Round 5 fixes
    the bug at its source (``state/ray_join_patch.py`` patches the
    shuffle's schema broadcast, applied at package import), so this is
    now an identity pass-through; the legacy materialize path survives
    only as the fallback for a future Ray where the patch no longer
    applies."""
    from ..state import ray_join_patch

    if ray_join_patch.apply():
        return ds
    ds = ds.materialize()
    for bundle in ds.iter_internal_ref_bundles():
        for _, md in bundle.blocks:
            if md.num_rows and md.num_rows > 0:
                return ds
            return ds.repartition(num_partitions).materialize()
    return ds  # no blocks at all — caller guards the fully-empty case


def _attach_payload(pairs: rd.Dataset, payload: rd.Dataset, out_a: str, out_b: str,
                    num_partitions: int = 8, id_col: str = "doc_id",
                    broadcast_pairs_limit: int = 1_000_000,
                    broadcast_bytes_limit: int = 256 << 20) -> rd.Dataset:
    """Attach a per-doc payload column (the payload Dataset's second
    column) to BOTH endpoints of a candidate-pair Dataset.
    (a, b) -> (a, b, out_a, out_b), inner-join semantics on the id.

    Two size-gated physical plans for one logical op (the Ray guide's
    broadcast-small-side rule, measured here: two Acero hash joins cost
    ~3 s of fixed overhead at sf0.1 for a 1,130-pair candidate set):

    * **broadcast** (small candidate sets): pull only the pair ids
      (16 B/pair, gated by ``broadcast_pairs_limit``), semi-join-filter
      the payload down to candidate endpoints DISTRIBUTED, and — only
      if the filtered payload metadata stays under
      ``broadcast_bytes_limit`` — ``ray.put`` it once and fetch both
      endpoints inside ``map_batches`` over the pair Dataset. Driver
      traffic is bounded by the candidate set, never the corpus.
    * **hash join** (everything else): two distributed hash joins on
      the id — nothing candidate- or corpus-cardinality-dependent ever
      routes through the driver.
    """
    pairs = pairs.materialize()
    uids = _endpoint_ids(pairs, broadcast_pairs_limit)
    if uids is not None:
        flt = _semi_filter(payload, id_col, uids).materialize()
        if flt.size_bytes() <= broadcast_bytes_limit:
            pdf = flt.to_pandas()
            src_col = [c for c in pdf.columns if c != id_col][0]
            order = np.argsort(pdf[id_col].to_numpy(np.int64), kind="stable")
            bids = pdf[id_col].to_numpy(np.int64)[order]
            bvals = pdf[src_col].to_numpy()[order]
            val_type = (pa.binary() if (len(bvals) and isinstance(bvals[0], bytes))
                        else pa.from_numpy_dtype(bvals.dtype)
                        if bvals.dtype != object else pa.binary())
            ref = ray.put((bids, bvals))

            def fetch(t: pa.Table) -> pa.Table:
                ids_b, vals_b = ray.get(ref)
                a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
                b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
                if len(ids_b) == 0:
                    a = a[:0]
                    b = b[:0]
                    ids_b = np.zeros(1, np.int64)
                    vals_b = np.zeros(1, np.int64)
                pa_pos = np.searchsorted(ids_b, a).clip(0, len(ids_b) - 1)
                pb_pos = np.searchsorted(ids_b, b).clip(0, len(ids_b) - 1)
                ok = (ids_b[pa_pos] == a) & (ids_b[pb_pos] == b)
                cols = {"a": pa.array(a[ok]), "b": pa.array(b[ok])}
                for name, pos in ((out_a, pa_pos[ok]), (out_b, pb_pos[ok])):
                    cols[name] = pa.array(vals_b[pos], val_type)
                return pa.table(cols)

            return pairs.map_batches(fetch, batch_format="pyarrow")
    # materialize = deliberate fan-out barrier: ren() consumes the
    # payload TWICE (out_a and out_b joins); without it each join would
    # recompute the payload lineage — for embedding_neardup_lsh past the
    # broadcast gate that is the read+semi-filter+normalize+pack pass,
    # the most expensive stage of the large-candidate regime
    payload = payload.materialize()
    src_col = [c for c in payload.columns() if c != id_col][0]

    def ren(name):
        def f(t: pa.Table, name=name) -> pa.Table:
            return pa.table({id_col: t[id_col], name: t[src_col]})
        return payload.map_batches(f, batch_format="pyarrow")

    j = _join_safe(pairs, num_partitions).join(
        ren(out_a), "inner", num_partitions, on=("a",), right_on=(id_col,))
    return _join_safe(j, num_partitions).join(
        ren(out_b), "inner", num_partitions, on=("b",), right_on=(id_col,))


def verify_jaccard(pairs: rd.Dataset, docs: rd.Dataset, threshold: float = 0.7,
                   shingle_k: int = 3, num_partitions: int = 8) -> rd.Dataset:
    """Exact shingle-set Jaccard for candidate pairs — fully distributed.

    Candidate pairs STAY a Dataset end-to-end: each endpoint's unique
    shingle-hash set arrives via a distributed hash join on doc_id
    (:func:`_attach_payload`), and the exact Jaccard evaluates inside
    ``map_batches``. Nothing corpus- or candidate-cardinality-dependent
    ever routes through the driver — the round-2 design collected the
    pair set and broadcast a driver-built candidate-text dict, which
    breaks when a 100 TB corpus is 1% near-dup.

    Returns Dataset(a, b, jaccard) for pairs meeting the threshold. A
    pair surfacing from LSH buckets in different blocks may appear once
    per bucket (bucket_pairs dedups per block only); downstream
    clustering is idempotent and exact-pair-set consumers dedup the
    (small) verified output.
    """
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return rd.from_pandas(pd.DataFrame({
            "a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64),
            "jaccard": pd.Series([], dtype=np.float64),
        }))
    # prune the corpus to candidate endpoints BEFORE shingling when the
    # pair set is small (ids-only driver pull, same gate as
    # _attach_payload's broadcast plan) — shingling is the expensive
    # pass and non-candidate docs never need it
    uids = _endpoint_ids(pairs)
    src = _semi_filter(docs, "doc_id", uids) if uids is not None else docs
    sh = doc_shingle_blobs(src, shingle_k).materialize()
    j = _attach_payload(pairs, sh, "sh_a", "sh_b", num_partitions)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        a_sh = [np.frombuffer(x, dtype=np.uint64) for x in batch["sh_a"]]
        b_sh = [np.frombuffer(x, dtype=np.uint64) for x in batch["sh_b"]]
        jac = np.array([
            len(np.intersect1d(x, y)) / max(1, len(np.union1d(x, y)))
            for x, y in zip(a_sh, b_sh)
        ]) if len(batch) else np.empty(0, dtype=np.float64)
        out = pd.DataFrame({
            "a": batch["a"].to_numpy(np.int64), "b": batch["b"].to_numpy(np.int64),
            "jaccard": jac,
        })
        return out[out["jaccard"] >= threshold]

    return j.map_batches(verify, batch_format="pandas", batch_size=4096)


def ngram_jaccard_candidates(docs: rd.Dataset, threshold: float = 0.7,
                             shingle_k: int = 3,
                             max_bucket: int = 4096) -> rd.Dataset:
    """Exact n-gram-Jaccard candidate pairs via PREFIX FILTERING — the
    classic lossless similarity-join reduction (prefix-filtering
    principle, Chaudhuri/Ganti/Kaushik ICDE'06; Bayardo WWW'07): under
    any fixed global shingle order, two sets with Jaccard >= t must
    share a shingle within each set's first ``|S| - ceil(t*|S|) + 1``
    shingles. Only those prefix shingles are emitted as bucket keys, so
    the shuffle carries O((1-t)·corpus shingles), not all of them, and
    no all-pairs comparison ever happens.

    Global order = ascending shingle hash (random w.r.t. frequency;
    a frequency-ascending order would shrink candidates further at the
    cost of a frequency-count pre-pass — documented scale knob).
    ``max_bucket`` caps pathological buckets (a shingle shared by more
    docs than the cap drops pairs — exactness holds whenever no bucket
    overflows, which the synthetic corpora never approach)."""

    def prefix_keys(batch: pd.DataFrame) -> pd.DataFrame:
        flat, offs = _shingles_flat(batch["text"].tolist(), shingle_k)
        lens = np.diff(offs)
        p = lens - np.ceil(threshold * lens).astype(np.int64) + 1
        p = np.clip(p, 0, lens)
        tot = int(p.sum())
        starts = np.repeat(offs[:-1], p)
        within = np.arange(tot) - np.repeat(np.cumsum(p) - p, p)
        return pd.DataFrame({
            # int64 VIEW of the uint64 hash: bucketing needs equality
            # only; prefix selection above used true uint64 ascending
            # order (np.unique inside the shingler)
            "bkey": flat[starts + within].view(np.int64),
            "doc_id": np.repeat(batch["doc_id"].to_numpy(np.int64), p),
        })

    return bucket_pairs(
        docs.map_batches(prefix_keys, batch_format="pandas"), max_bucket
    )


def ngram_jaccard_pairs(docs: rd.Dataset, threshold: float = 0.7,
                        shingle_k: int = 3) -> pd.DataFrame:
    """Exact word-k-gram Jaccard near-dup pairs: prefix-filter candidate
    generation (lossless) + exact shingle-set verification. Returns the
    complete (a, b, jaccard) pair set with jaccard >= threshold — unlike
    minhash_dedup this is EXACT, at the cost of shipping the (1-t)
    prefix fraction of every doc's shingles through one shuffle."""
    cands = ngram_jaccard_candidates(docs, threshold, shingle_k)
    out = verify_jaccard(cands, docs, threshold, shingle_k).to_pandas()
    # verify no longer pre-dedups candidates (it keeps them a Dataset);
    # cross-bucket duplicates carry identical jaccard, drop here
    out = out.drop_duplicates(["a", "b"])
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _uf_roots(pairs_df: pd.DataFrame) -> dict[int, int]:
    """Union-find over the (tiny) verified pair set -> {id: min-root}."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs_df.get("a", []), pairs_df.get("b", [])):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def cluster_pairs_cc(pairs, num_parts: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """Distributed min-label clustering of a verified pair set via the
    engine's connected-components machinery — the scale path when the
    pair set outgrows the driver's sequential union-find.

    Pair endpoints are dictionary-encoded (order-insensitive
    ``np.unique`` merge of per-block uniques, the same construction as
    the graph dictionary), ingested as an undirected graph into a
    GraphContext, and clustered with the frontier-optimized min-label
    CC. The dictionary is sorted, so vid order == id order and the
    min-vid component label decodes to the min-id root — EXACTLY the
    union-find contract, so both paths are interchangeable. Returns the
    (sorted keys, roots) mapping arrays ``assign_clusters`` broadcasts
    (one entry per id occurring in any pair — same size either way).
    """
    from ..pipelines import analytics as _A
    from ..pipelines.graph import GraphContext

    if isinstance(pairs, pd.DataFrame):
        pairs = rd.from_arrow(pa.table({
            "a": pa.array(pairs["a"].to_numpy(np.int64)),
            "b": pa.array(pairs["b"].to_numpy(np.int64)),
        })) if len(pairs) else None
    if pairs is None:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    def uniq(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t["a"].to_numpy().astype(np.int64), t["b"].to_numpy().astype(np.int64)
        ]))
        return pa.table({"id": pa.array(u)})

    chunks = [b["id"].to_numpy() for b in
              pairs.map_batches(uniq, batch_format="pyarrow")
                   .iter_batches(batch_format="pyarrow")]
    ids = (np.unique(np.concatenate(chunks)) if chunks
           else np.empty(0, dtype=np.int64))
    if ids.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    ctx = GraphContext(int(ids.size), num_parts)
    try:
        for b in pairs.iter_batches(batch_format="pyarrow"):
            a = np.searchsorted(ids, b["a"].to_numpy().astype(np.int64))
            c = np.searchsorted(ids, b["b"].to_numpy().astype(np.int64))
            ctx.ingest_pairs(a, c)
        ctx.finalize()
        cc = _A.connected_components(ctx).to_pandas()
    finally:
        ctx.shutdown()
    vid = cc["vid"].to_numpy(np.int64)
    comp = cc["component"].to_numpy(np.int64)
    order = np.argsort(vid)
    keys, vals = ids[vid[order]], ids[comp[order]]
    keep = keys != vals  # identity entries add nothing to the broadcast
    return keys[keep], vals[keep]


def assign_clusters(docs: rd.Dataset, pairs_df: pd.DataFrame,
                    id_col: str = "doc_id",
                    mapping: tuple[np.ndarray, np.ndarray] | None = None) -> rd.Dataset:
    """Distributed cluster assignment: union-find runs driver-side over
    the tiny verified pair set only; the root map is broadcast (sorted
    key/value arrays) and every doc maps itself in a streaming
    ``map_batches`` — the corpus is never collected. Pass ``mapping``
    (from :func:`cluster_pairs_cc`) to skip the union-find — the
    distributed-CC scale path for huge pair sets."""
    if mapping is not None:
        keys, vals = mapping
    else:
        roots = _uf_roots(pairs_df)
        keys = np.array(sorted(roots), dtype=np.int64)
        vals = np.array([roots[k] for k in keys], dtype=np.int64)
    mref = ray.put((keys, vals))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        k, v = ray.get(mref)
        ids = batch[id_col].to_numpy(np.int64)
        cluster = ids.copy()
        if len(k):
            pos = np.searchsorted(k, ids)
            pos_c = np.minimum(pos, len(k) - 1)
            hit = k[pos_c] == ids
            cluster[hit] = v[pos_c[hit]]
        return pd.DataFrame({
            "doc_id": ids, "cluster_id": cluster, "keep": cluster == ids,
        })

    return docs.map_batches(assign, batch_format="pandas")


def minhash_dedup(docs: rd.Dataset, threshold: float = 0.7, num_perm: int = 64,
                  bands: int = 16, shingle_k: int = 3,
                  cluster_pairs_limit: int = 200_000) -> rd.Dataset:
    """Full MinHash-LSH near-dup pipeline -> Dataset(doc_id, cluster_id,
    keep). Candidate generation, verification input fetch and the final
    cluster assignment are all distributed; only the verified pair set
    touches the driver, and only when it fits under
    ``cluster_pairs_limit`` — past that, clustering routes through the
    engine's distributed CC (:func:`cluster_pairs_cc` — identical
    min-id roots) with the pair set staying a Dataset end-to-end."""
    cands = minhash_candidates(docs, num_perm, bands, shingle_k)
    verified = verify_jaccard(cands, docs, threshold, shingle_k).materialize()
    if verified.count() > cluster_pairs_limit:
        mapping = cluster_pairs_cc(verified.select_columns(["a", "b"]))
        return assign_clusters(docs.select_columns(["doc_id"]),
                               pd.DataFrame({"a": [], "b": []}), mapping=mapping)
    pairs_df = verified.to_pandas().drop_duplicates(["a", "b"])
    return assign_clusters(docs.select_columns(["doc_id"]), pairs_df)


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------

class SimHashStage:
    """Actor-pool stage: text -> (doc_id, simhash, chunk0..chunk3).

    Token hash = poly_token_hash64 (base-131 byte fold + splitmix64) —
    deterministic AND DuckDB-replicable, so the whole SimHash pipeline
    is verified hash-exactly against a SQL oracle."""

    def __init__(self):
        pass

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        lens = np.empty(len(batch), dtype=np.int64)
        for i, t in enumerate(batch["text"]):
            ws = t.split() if t else []
            toks.extend(ws)
            lens[i] = len(ws)
        offs = np.concatenate([[0], np.cumsum(lens)])
        sig = H.simhash64_flat(H.poly_token_hash64(toks), offs)
        out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "simhash": sig.astype(np.int64)})
        for c in range(4):
            out[f"chunk{c}"] = ((sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
        return out


def simhash_dedup(docs: rd.Dataset, max_hamming: int = 3,
                  cluster_pairs_limit: int = 200_000,
                  num_partitions: int = 8) -> rd.Dataset:
    """SimHash near-dup: 4×16-bit chunk blocking (pigeonhole: hamming≤3
    guarantees one identical chunk), verify hamming, cluster.

    Fully distributed shape: signatures are an actor-pool stage, chunk
    blocking reuses the MinHash sorted-segment ``bucket_pairs`` pass,
    hamming verification joins each endpoint's signature onto the pair
    Dataset (distributed hash join — the candidate set never routes
    through the driver), and cluster assignment streams over the
    corpus. Only the VERIFIED pair set may touch the driver, and only
    under ``cluster_pairs_limit`` — past that, the distributed-CC
    clustering path takes over."""
    sigs = docs.map_batches(
        SimHashStage, batch_format="pandas", batch_size=4096, concurrency=2
    ).materialize()

    def chunk_keys(batch: pd.DataFrame) -> pd.DataFrame:
        ck = np.concatenate([
            batch[f"chunk{c}"].to_numpy(np.int64) * 4 + c for c in range(4)
        ])
        return pd.DataFrame({
            "bkey": ck, "doc_id": np.tile(batch["doc_id"].to_numpy(np.int64), 4),
        })

    cand = bucket_pairs(
        sigs.map_batches(chunk_keys, batch_format="pandas")
    ).materialize()
    if cand.count() == 0:
        return assign_clusters(docs.select_columns(["doc_id"]),
                               pd.DataFrame({"a": [], "b": []}))

    def sig_only(pdf: pd.DataFrame) -> pa.Table:
        return pa.table({"doc_id": pa.array(pdf["doc_id"].to_numpy(np.int64)),
                         "sig": pa.array(pdf["simhash"].to_numpy(np.int64))})

    sig_ds = sigs.map_batches(sig_only, batch_format="pandas")
    j = _attach_payload(cand, sig_ds, "sig_a", "sig_b", num_partitions)

    def ham(batch: pd.DataFrame) -> pd.DataFrame:
        av = batch["sig_a"].to_numpy(np.int64).view(np.uint64)
        bv = batch["sig_b"].to_numpy(np.int64).view(np.uint64)
        keep = H.hamming64(av, bv) <= max_hamming
        return pd.DataFrame({"a": batch["a"].to_numpy(np.int64)[keep],
                             "b": batch["b"].to_numpy(np.int64)[keep]})

    verified = j.map_batches(ham, batch_format="pandas").materialize()
    if verified.count() > cluster_pairs_limit:
        mapping = cluster_pairs_cc(verified)
        return assign_clusters(docs.select_columns(["doc_id"]),
                               pd.DataFrame({"a": [], "b": []}), mapping=mapping)
    return assign_clusters(docs.select_columns(["doc_id"]),
                           verified.to_pandas().drop_duplicates(["a", "b"]))


# ----------------------------------------------------------------------
# embedding cosine near-dup
# ----------------------------------------------------------------------

def embedding_neardup_lsh(embeddings: rd.Dataset, threshold: float = 0.95,
                          nbits: int = 8, bands: int = 4, seed: int = 5) -> pd.DataFrame:
    """Cosine near-dup pairs via hyperplane-LSH blocking — the 100 TB
    path: candidate pairs come from ``bands`` independent hyperplane
    bucketings (sorted-segment pass, no all-pairs), then ONLY candidate
    vectors are fetched and verified with exact cosine. Recall < 1 by
    construction (LSH); the brute-force ``embedding_neardup_pairs`` is
    the exact verification-scale baseline."""
    from .similarity import HyperplaneLSH

    def bucket_keys(t: pa.Table) -> pd.DataFrame:
        from .similarity import _embed_matrix

        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _embed_matrix(t)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        out_k, out_i = [], []
        for b in range(bands):
            lsh = HyperplaneLSH(mat.shape[1], nbits, seed + b)
            out_k.append(lsh.bucket(mat) * bands + b)
            out_i.append(ids)
        return pd.DataFrame({"bkey": np.concatenate(out_k), "doc_id": np.concatenate(out_i)})

    cand = bucket_pairs(
        embeddings.map_batches(bucket_keys, batch_format="pyarrow")
    ).materialize()
    if cand.count() == 0:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64),
                             "cosine": pd.Series([], dtype=np.float64)})

    def vec_blob(t: pa.Table) -> pa.Table:
        # normalized float64 vectors packed as binary blobs: the
        # candidate-pair join carries them without a driver fetch
        # (Acero joins reject list columns, binary is fine)
        from .similarity import _embed_matrix

        mat = _embed_matrix(t)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pa.table({
            "doc_id": pa.array(t["vec_id"].to_numpy(zero_copy_only=False)
                               .astype(np.int64)),
            "vec": pa.array([row.tobytes() for row in mat], pa.binary()),
        })

    uids = _endpoint_ids(cand)
    src = _semi_filter(embeddings, "vec_id", uids) if uids is not None else embeddings
    vecs = src.map_batches(vec_blob, batch_format="pyarrow")
    j = _attach_payload(cand, vecs, "vec_a", "vec_b")

    def cos_verify(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        av = np.stack([np.frombuffer(x, dtype=np.float64) for x in batch["vec_a"]])
        bv = np.stack([np.frombuffer(x, dtype=np.float64) for x in batch["vec_b"]])
        cos = (av * bv).sum(axis=1)
        out = pd.DataFrame({"a": batch["a"].to_numpy(np.int64),
                            "b": batch["b"].to_numpy(np.int64), "cosine": cos})
        return out[out["cosine"] >= threshold]

    # only the VERIFIED (post-threshold) pairs reach the driver — this
    # function's contract returns the exact near-dup pair DataFrame
    out = j.map_batches(cos_verify, batch_format="pandas").to_pandas()
    out = out.drop_duplicates(["a", "b"])
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def embedding_neardup_pairs(embeddings: rd.Dataset, threshold: float = 0.95,
                            max_rows: int = 200_000) -> pd.DataFrame:
    """Cosine-similar (a<b) pairs above threshold.

    Blocked brute force: the normalized matrix is broadcast once
    (``ray.put``); each batch computes its block row of the similarity
    matrix with one matmul. O(n²·d) flops but streaming memory — the
    correct baseline at verification scale; ``embedding_neardup_lsh``
    is the bucketed 100 TB path. Corpora above ``max_rows`` are
    REFUSED (explicitly, per the no-silent-scale-cliff rule): the
    broadcast matrix and O(n²) flops grow without bound, and quietly
    attempting them would look like a hang — route large corpora to
    ``embedding_neardup_lsh`` or raise ``max_rows`` deliberately.
    """
    n_rows = embeddings.count()
    if n_rows > max_rows:
        raise ValueError(
            f"embedding_neardup_pairs is the O(n²) verification-scale "
            f"baseline ({n_rows} rows > max_rows={max_rows}); use "
            "embedding_neardup_lsh for large corpora or raise max_rows"
        )
    pdf = embeddings.to_pandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_list()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def block(batch: pa.Table) -> pd.DataFrame:
        from .similarity import _embed_matrix

        all_ids, m = ray.get(ref)
        q = _embed_matrix(batch)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ m.T
        qa = batch["vec_id"].to_numpy(zero_copy_only=False)
        ai, bj = np.nonzero(sims >= threshold)
        a, b = qa[ai], all_ids[bj]
        keep = a < b
        return pd.DataFrame({"a": a[keep], "b": b[keep],
                             "cosine": sims[ai, bj][keep]})

    out = embeddings.map_batches(block, batch_format="pyarrow", batch_size=1024).to_pandas()
    if "a" not in out.columns:  # every block empty -> schema-less result
        out = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                            "b": pd.Series([], dtype=np.int64),
                            "cosine": pd.Series([], dtype=np.float64)})
    return out.sort_values(["a", "b"]).reset_index(drop=True)
