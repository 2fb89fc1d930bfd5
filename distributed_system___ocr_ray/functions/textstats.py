"""Text-analysis kernels for training-data pipelines (driver-mandated extras):
language-ID, quality scoring, token counting, document fingerprinting.

All kernels are vectorized batch transforms (pandas str ops / numpy) intended
for ``map_batches``; none touch Ray. The regex set is compiled once at module
import (per worker process), mirroring the load-once-per-worker discipline of
the reference's Tesseract init (Worker.java:47-48).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

# whitespace tokens: SQL-checkable via duckdb regexp_extract_all(text, '\S+')
_WS_TOKEN = re.compile(r"\S+")
# BPE-ish tokens: word pieces + standalone punctuation
_BPE_TOKEN = re.compile(r"\w+|[^\w\s]")
_WORD = re.compile(r"[a-zA-Z]+")
_PUNCT = re.compile(r"[^\w\s]")
_CJK = re.compile(r"[一-鿿぀-ヿ]")

STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "you", "that", "it", "for", "a", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den", "von"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "que", "une", "des", "dans"},
    "es": {"el", "los", "las", "es", "no", "por", "que", "una", "del", "con", "para"},
}


def token_counts(texts: pd.Series) -> pd.DataFrame:
    """Whitespace + BPE-ish token counts per text (vectorized)."""
    s = texts.fillna("")
    return pd.DataFrame(
        {
            "n_ws_tokens": s.str.count(_WS_TOKEN).astype("int64"),
            "n_bpe_tokens": s.str.count(_BPE_TOKEN).astype("int64"),
        }
    )


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Length / punctuation / stopword-ratio quality features + one score.

    Score in [0,1]: penalizes very short docs, punctuation soup, and texts
    with no common function words (boilerplate / non-linguistic content).
    """
    s = texts.fillna("")
    n_chars = s.str.len().astype("int64")
    n_tokens = s.str.count(_WS_TOKEN).astype("int64")
    n_punct = s.str.count(_PUNCT).astype("int64")
    words = s.str.lower().str.findall(_WORD)
    all_stop = set().union(*STOPWORDS.values())
    stop_ratio = words.map(lambda ws: sum(w in all_stop for w in ws) / len(ws) if ws else 0.0)
    punct_ratio = (n_punct / n_chars.clip(lower=1)).astype("float64")
    len_score = np.clip(n_chars / 500.0, 0.0, 1.0)
    score = len_score * (1.0 - punct_ratio.clip(0, 1)) * (0.5 + 0.5 * np.clip(stop_ratio * 5, 0, 1))
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_ws_tokens": n_tokens,
            "punct_ratio": punct_ratio.round(6),
            "stop_ratio": stop_ratio.astype("float64").round(6),
            "quality_score": pd.Series(score, index=s.index).round(6),
        }
    )


def lang_id(texts: pd.Series) -> pd.Series:
    """n-gram/stopword-heuristic language ID over {en,de,fr,es,zh,unknown}."""
    s = texts.fillna("")

    def _one(t: str) -> str:
        if not t:
            return "unknown"
        cjk = len(_CJK.findall(t))
        if cjk and cjk / max(len(t), 1) > 0.05:
            return "zh"
        toks = [w.lower() for w in _WORD.findall(t)]
        if not toks:
            return "unknown"
        best, best_hits = "unknown", 0
        for lang, stops in STOPWORDS.items():
            hits = sum(1 for w in toks if w in stops)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    return s.map(_one)


def fingerprint64(texts: pd.Series) -> pd.Series:
    """64-bit rolling polynomial hash of whitespace-normalized text, as
    fixed-width hex (deterministic document fingerprint)."""
    s = texts.fillna("").str.split().str.join(" ")

    def _one(t: str) -> str:
        h = np.uint64(1469598103934665603)  # FNV-1a 64 offset basis
        prime = np.uint64(1099511628211)
        for b in t.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * int(prime) & 0xFFFFFFFFFFFFFFFF)
        return f"{int(h):016x}"

    return s.map(_one)


def crc32_series(texts: pd.Series) -> pd.Series:
    return texts.fillna("").map(lambda t: zlib.crc32(t.encode("utf-8"))).astype("int64")
