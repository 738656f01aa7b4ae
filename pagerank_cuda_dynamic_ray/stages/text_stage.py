"""Text-analysis stage over the documents table.

Vectorized pandas/numpy kernels per batch, producing language id, quality
features, token counts and a rolling-hash fingerprint per document.

Two execution shapes, picked by per-actor setup cost — the Ray Data rule
of thumb is actor pools ONLY when ``__init__`` does real work (model
load, index build):

- default (``concurrency=None``): plain-function ``map_batches`` tasks.
  All stage state (compiled regexes, stopword set) is module-level in
  ``functions.text`` — setup is microseconds, so tasks reuse the
  session's already-warm workers with zero pool spin-up.
- ``concurrency=N``: the ``TextAnalysis`` actor-pool variant, the shape
  to reach for when the stage grows expensive state (e.g. a model). Both
  produce identical outputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions import text as X


def _analyze_batch(batch: pd.DataFrame, with_fingerprint: bool = True) -> pd.DataFrame:
    texts = batch["text"].fillna("")
    feats = X.quality_features(texts)
    out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()})
    out["n_chars"] = feats["n_chars"]
    out["n_tokens_ws"] = feats["n_tokens"]
    out["n_tokens_bpe"] = X.bpe_token_count(texts)
    out["punct_ratio"] = feats["punct_ratio"]
    out["upper_ratio"] = feats["upper_ratio"]
    out["stop_ratio"] = feats["stop_ratio"]
    out["quality"] = feats["quality"]
    out["lang"] = X.lang_id(texts).to_numpy()
    if with_fingerprint:
        out["fingerprint"] = X.fingerprint(texts).astype(np.int64)
    return out


class TextAnalysis:
    """Actor-pool variant — the shape for when the stage grows expensive
    per-actor state (a model, a big lexicon). Today all stage state
    (compiled regexes, stopword set) lives at module level in
    ``functions.text``, so ``__init__`` is trivially cheap; it exists as
    the seam where real setup would go."""

    def __init__(self, with_fingerprint: bool = True):
        self.with_fingerprint = with_fingerprint

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return _analyze_batch(batch, self.with_fingerprint)


def analyze_documents(docs: rd.Dataset, concurrency: int | None = None,
                      batch_size: int = 1024,
                      with_fingerprint: bool = True) -> rd.Dataset:
    if concurrency is None:
        return docs.map_batches(
            _analyze_batch, batch_format="pandas", batch_size=batch_size,
            fn_kwargs={"with_fingerprint": with_fingerprint},
        )
    return docs.map_batches(
        TextAnalysis, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency, fn_constructor_kwargs={"with_fingerprint": with_fingerprint},
    )


def quality_filter(docs: rd.Dataset, min_quality: float = 0.2,
                   min_tokens: int = 5) -> rd.Dataset:
    """Filter stage a training-data pipeline chains after scoring.

    Fingerprinting (the stage's most expensive kernel) is skipped — the
    filter reads only quality and token count. Output carries doc_id +
    features; join on doc_id to recover kept documents' text."""
    scored = analyze_documents(docs, with_fingerprint=False)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[(batch["quality"] >= min_quality) & (batch["n_tokens_ws"] >= min_tokens)]

    return scored.map_batches(keep, batch_format="pandas")


# ----------------------------------------------------------------------
# PII scrubbing (training-data redaction stage)
# ----------------------------------------------------------------------

# (name, pattern, replacement) — applied SEQUENTIALLY, each pattern
# counting + replacing over the text as left by the previous one. The
# patterns deliberately stay inside the regex subset where Python `re`
# and DuckDB's RE2 agree (char classes, bounded repeats, \b, \d), so the
# whole stage replays as nested regexp_replace in the SQL oracle.
# Compiled with re.ASCII: Python's \d/\b are Unicode-aware by default
# while RE2's are ASCII-only — without the flag, a digit run adjacent to
# an accented letter (\b) or a non-ASCII digit (\d) matches differently
# in the two engines and the hash gate diverges.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phones", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


class PIIScrub:
    """Actor-pool redaction stage: compiled patterns once per actor in
    ``__init__``, vectorized pandas ``.str`` kernels per batch. Purely
    row-local (no shuffle, partitioning-invariant at any scale)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        import re
        self.text_col, self.id_col = text_col, id_col
        self.pats = [(name, re.compile(rx, re.ASCII), repl)
                     for name, rx, repl in PII_PATTERNS]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        out = pd.DataFrame({self.id_col: batch[self.id_col].to_numpy()})
        for name, rx, repl in self.pats:
            out[f"n_{name}"] = texts.str.count(rx).to_numpy(np.int64)
            texts = texts.str.replace(rx, repl, regex=True)
        out["clean_text"] = texts.to_numpy()
        return out


def scrub_pii(docs: rd.Dataset, text_col: str = "text", id_col: str = "doc_id",
              concurrency: int | None = None, batch_size: int = 1024) -> rd.Dataset:
    """Redact emails / phone numbers / IPv4 addresses from a text
    column. Output: (<id_col>, n_emails, n_phones, n_ips, clean_text).
    Counts are measured against the text state each pattern sees
    (sequential application), so counts + cleaned text are exactly
    reproducible by any engine applying the same chain."""
    if concurrency is None:
        return docs.map_batches(
            PIIScrub(text_col, id_col), batch_format="pandas", batch_size=batch_size)
    return docs.map_batches(
        PIIScrub, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col})
