"""Vectorized text-analysis kernels for the documents pipeline.

Language-ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), rolling-hash fingerprints. All operate on
pandas Series / numpy arrays inside ``map_batches`` stages; compiled
regexes live in actor ``__init__`` (see stages/text_stage.py).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# whitespace tokens: str.split() semantics (any-whitespace, no empties)
WS_RE = re.compile(r"\S+")
# BPE-ish pre-tokenizer: words / numbers / punctuation runs (GPT-2-style shape)
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")
PUNCT_RE = re.compile(r"[.,!?;:]")

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que", "pas"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "para", "que", "no", "con"},
}


def ws_token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace token count — exactly len(text.split())."""
    return texts.str.count(WS_RE).fillna(0).to_numpy(dtype=np.int64)


def bpe_token_count(texts: pd.Series) -> np.ndarray:
    """BPE-ish token count via the pre-tokenizer regex."""
    return texts.str.count(BPE_RE).fillna(0).to_numpy(dtype=np.int64)


def _stop_hits(lower_words: pd.Series, stopset: set[str]) -> np.ndarray:
    """Per-doc stopword hit counts — vectorized (explode + isin + groupby
    sum in pandas C kernels; no per-doc Python lambda)."""
    flat = lower_words.explode()
    hits = flat.isin(stopset).groupby(level=0).sum()
    return hits.reindex(lower_words.index, fill_value=0).to_numpy(dtype=np.int64)


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Deterministic per-doc quality features:

    n_chars, n_tokens (whitespace), punct_ratio (punct chars / chars),
    upper_ratio, stop_ratio (English stopword share), mean_token_len,
    quality = clamp(0.3 + 0.5*stop_ratio - punct_ratio
                    - max(mean_token_len - 12, 0)*0.02, 0, 1)
    — a simple, auditable heuristic (not a learned model); the DuckDB
    oracle reproduces this formula bitwise.
    """
    n_chars = texts.str.len().fillna(0).to_numpy(dtype=np.int64)
    n_tok = ws_token_count(texts)
    punct = texts.str.count(PUNCT_RE).fillna(0).to_numpy(dtype=np.int64)
    upper = texts.str.count(r"[A-Z]").fillna(0).to_numpy(dtype=np.int64)
    lower_words = texts.str.lower().str.findall(r"[a-zà-ÿ]+")
    stop_hits = _stop_hits(lower_words, STOPWORDS["en"])
    denom = np.maximum(n_chars, 1)
    tok_denom = np.maximum(n_tok, 1)
    punct_ratio = punct / denom
    upper_ratio = upper / denom
    stop_ratio = stop_hits / tok_denom
    mean_token_len = (n_chars - (n_tok - 1).clip(min=0)) / tok_denom
    quality = np.clip(0.3 + 0.5 * stop_ratio - punct_ratio - np.maximum(mean_token_len - 12, 0) * 0.02, 0.0, 1.0)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tok,
            "punct_ratio": punct_ratio,
            "upper_ratio": upper_ratio,
            "stop_ratio": stop_ratio,
            "quality": quality,
        }
    )


def lang_id(texts: pd.Series) -> pd.Series:
    """Heuristic language ID: per-language stopword hit rate, argmax with
    deterministic tie-break (language code order); 'und' when no hits."""
    words = texts.str.lower().str.findall(r"[a-zà-ÿ]+")
    langs = sorted(STOPWORDS)
    scores = np.zeros((len(texts), len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):  # 4 languages; each count is vectorized
        scores[:, j] = _stop_hits(words, STOPWORDS[lang])
    best = np.asarray(langs)[scores.argmax(axis=1)]
    best = np.where(scores.max(axis=1) == 0, "und", best)
    return pd.Series(best, index=texts.index)


def fingerprint(texts: pd.Series, window: int = 8, keep: int = 4) -> np.ndarray:
    """Document fingerprint: sum of the ``keep`` smallest base-131
    rolling hashes (mod 2^31-1) of ``window``-byte windows.

    Vectorized across the whole batch (one flat byte array, one
    sliding-window pass, segment-sorted min-k — no per-doc Python loop)
    and arithmetic chosen to be replicable in ANSI SQL over BIGINTs, so
    the DuckDB oracle can verify it hash-exactly."""
    from .hashing import poly_window_hashes_flat

    encoded = [t.encode("utf-8") for t in texts.fillna("")]
    lens = np.fromiter((len(e) for e in encoded), dtype=np.int64, count=len(encoded))
    offs = np.zeros(len(encoded) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    hashes, h_offs = poly_window_hashes_flat(flat, offs, window)
    # min-k per doc: sort (hash within doc), take the first `keep` ranks
    seg = np.repeat(np.arange(len(encoded), dtype=np.int64), np.diff(h_offs))
    order = np.lexsort((hashes, seg))
    h_sorted, seg_sorted = hashes[order], seg[order]
    rank = np.arange(len(h_sorted), dtype=np.int64) - np.repeat(h_offs[:-1], np.diff(h_offs))
    sel = rank < keep
    return np.bincount(seg_sorted[sel], weights=h_sorted[sel], minlength=len(encoded)).astype(np.int64)
