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


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Deterministic per-doc quality features:

    n_chars, n_tokens (whitespace), punct_ratio (punct chars / chars),
    upper_ratio, stop_ratio (English stopword share), mean_token_len,
    quality score = clamp(0.3 + 0.4*stop - punct - max(0, 12-mean_len)*0... )
    — a simple, auditable heuristic (not a learned model).
    """
    n_chars = texts.str.len().fillna(0).to_numpy(dtype=np.int64)
    n_tok = ws_token_count(texts)
    punct = texts.str.count(PUNCT_RE).fillna(0).to_numpy(dtype=np.int64)
    upper = texts.str.count(r"[A-Z]").fillna(0).to_numpy(dtype=np.int64)
    lower_words = texts.str.lower().str.findall(r"[a-zà-ÿ]+")
    en = STOPWORDS["en"]
    stop_hits = lower_words.map(lambda ws: sum(w in en for w in ws)).to_numpy(dtype=np.int64)
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
    for j, lang in enumerate(langs):
        sw = STOPWORDS[lang]
        scores[:, j] = words.map(lambda ws: sum(w in sw for w in ws)).to_numpy()
    best = np.asarray(langs)[scores.argmax(axis=1)]
    best = np.where(scores.max(axis=1) == 0, "und", best)
    return pd.Series(best, index=texts.index)


def fingerprint(texts: pd.Series, window: int = 8, keep: int = 4) -> np.ndarray:
    """Document fingerprint: min-k of Rabin-Karp rolling hashes of
    ``window``-byte windows, combined into one uint64."""
    from .hashing import splitmix64

    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts.fillna("")):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < window:
            h = splitmix64(np.frombuffer(b.tobytes().ljust(8, b"\0"), dtype=np.uint64))
            out[i] = h[0]
            continue
        base = np.uint64(1099511628211)
        pows = base ** np.arange(window, dtype=np.uint64)
        with np.errstate(over="ignore"):
            strided = np.lib.stride_tricks.sliding_window_view(b, window).astype(np.uint64)
            hashes = (strided * pows[None, :]).sum(axis=1, dtype=np.uint64)
            mins = np.sort(splitmix64(hashes))[:keep]
            out[i] = splitmix64(np.array([mins.sum(dtype=np.uint64)], dtype=np.uint64))[0]
    return out
