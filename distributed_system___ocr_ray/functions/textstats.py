"""Text-analysis kernels for training-data pipelines (driver-mandated extras):
language-ID, quality scoring, token counting, document fingerprinting.

All kernels are vectorized batch transforms (pandas str ops / numpy / hashlib
C digests); none touch Ray and none loop Python per character. The regex set
is compiled once at module import (per worker process), mirroring the
load-once-per-worker discipline of the reference's Tesseract init
(Worker.java:47-48).

Every kernel is exactly SQL-expressible so the DuckDB driver oracle can check
it end-to-end:

- ratios are emitted as integer parts-per-million (``floor(x*1e6 + 0.5)``)
  computed from identical float64 operations on both sides, so the compare
  is exact rather than float-fuzzy;
- character classes are explicit ASCII ranges (``[\\x21-\\x2f...]``) shared
  verbatim with the RE2 patterns in ``__ray_entry__.oracle_sql``;
- the fingerprint is an md5 prefix (hashlib C speed; DuckDB's ``md5`` of the
  same normalized string matches byte-for-byte).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

# whitespace tokens: SQL-checkable via duckdb regexp_extract_all(text, '\S+').
# RE2's \S means exactly [^ \t\n\f\r] (ASCII, no \v, no unicode spaces) while
# Python's \S is unicode-aware -- spell the RE2 class out so a document
# containing U+00A0 / U+000B tokenizes identically on both sides.
_WS_TOKEN = re.compile(r"[^ \t\n\f\r]+")
# BPE-ish tokens: word pieces + standalone punctuation
_BPE_TOKEN = re.compile(r"\w+|[^\w\s]")
_WORD = re.compile(r"[a-zA-Z]+")
# ASCII punctuation, explicit ranges (same pattern string used in the SQL
# oracle -- RE2 has no unicode \w, so the class must be spelled out)
PUNCT_PATTERN = r"[\x21-\x2f\x3a-\x40\x5b-\x60\x7b-\x7e]"
_PUNCT = re.compile(PUNCT_PATTERN)
_CJK = re.compile(r"[一-鿿぀-ヿ]")
# explicit whitespace class for fingerprint normalization (kept ASCII so the
# DuckDB regexp_replace mirror is exact)
WS_PATTERN = r"[ \t\n\r\f\v]+"
_WS_RUN = re.compile(WS_PATTERN)

STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "you", "that", "it", "for", "a", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den", "von"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "que", "une", "des", "dans"},
    "es": {"el", "los", "las", "es", "no", "por", "que", "una", "del", "con", "para"},
}

# language order matters: ties keep the EARLIER language (argmax-first)
LANG_ORDER = ["en", "de", "fr", "es"]


def _stop_regex(words) -> re.Pattern:
    """Whole-token stopword matcher over lowercased text: a match is a
    maximal [a-z]+ run equal to a stopword (lookarounds pin the run edges),
    so one vectorized ``str.count`` equals per-token set membership."""
    alt = "|".join(sorted(words, key=len, reverse=True))
    return re.compile(rf"(?<![a-z])(?:{alt})(?![a-z])")


_ALL_STOP_RE = _stop_regex(set().union(*STOPWORDS.values()))
_LANG_STOP_RE = {lang: _stop_regex(STOPWORDS[lang]) for lang in LANG_ORDER}


def token_counts(texts: pd.Series) -> pd.DataFrame:
    """Whitespace + BPE-ish token counts per text (vectorized)."""
    s = texts.fillna("")
    return pd.DataFrame(
        {
            "n_ws_tokens": s.str.count(_WS_TOKEN).astype("int64"),
            "n_bpe_tokens": s.str.count(_BPE_TOKEN).astype("int64"),
        }
    )


def _ppm(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1e6 + 0.5).astype(np.int64)


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Length / punctuation / stopword-ratio quality features + one score.

    Score in [0,1]: penalizes very short docs, punctuation soup, and texts
    with no common function words (boilerplate / non-linguistic content).
    Ratios are returned as integer parts-per-million so the DuckDB oracle
    compares exactly (identical float64 ops on both sides, then floor)."""
    s = texts.fillna("")
    n_chars = s.str.len().to_numpy(np.int64)
    n_tokens = s.str.count(_WS_TOKEN).to_numpy(np.int64)
    n_punct = s.str.count(_PUNCT).to_numpy(np.int64)
    n_words = s.str.lower().str.count(_WORD).to_numpy(np.int64)
    stop_hits = s.str.lower().str.count(_ALL_STOP_RE).to_numpy(np.int64)
    punct_ratio = n_punct / np.maximum(n_chars, 1)
    stop_ratio = np.where(n_words > 0, stop_hits / np.maximum(n_words, 1), 0.0)
    len_score = np.clip(n_chars / 500.0, 0.0, 1.0)
    score = (len_score * (1.0 - np.clip(punct_ratio, 0.0, 1.0))) * (
        0.5 + 0.5 * np.clip(stop_ratio * 5, 0.0, 1.0)
    )
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_ws_tokens": n_tokens,
            "punct_ppm": _ppm(punct_ratio),
            "stop_ppm": _ppm(stop_ratio),
            "quality_ppm": _ppm(score),
        },
        index=s.index,
    )


def lang_id(texts: pd.Series) -> pd.Series:
    """n-gram/stopword-heuristic language ID over {en,de,fr,es,zh,unknown}.

    Fully vectorized: one regex count per language + a CJK-density check;
    ties keep the earlier language in ``LANG_ORDER`` (numpy argmax-first,
    matching the SQL oracle's cascaded CASE)."""
    s = texts.fillna("")
    lower = s.str.lower()
    hits = np.stack(
        [lower.str.count(_LANG_STOP_RE[lang]).to_numpy(np.int64) for lang in LANG_ORDER], axis=1
    )
    n_chars = s.str.len().to_numpy(np.int64)
    cjk = s.str.count(_CJK).to_numpy(np.int64)
    is_cjk = (cjk > 0) & (cjk / np.maximum(n_chars, 1) > 0.05)
    best = hits.argmax(axis=1)  # first max wins
    pred = np.array(LANG_ORDER, dtype=object)[best]
    pred[hits.max(axis=1) == 0] = "unknown"
    pred[is_cjk] = "zh"
    return pd.Series(pred, index=s.index, dtype=object)


def _norm_one(t: str) -> str:
    # a text needs the rewrite only if it contains non-space whitespace or a
    # double space; `in` is a memchr-speed scan, far cheaper than the regex
    if (
        "  " not in t and "\t" not in t and "\n" not in t
        and "\r" not in t and "\f" not in t and "\v" not in t
    ):
        return t.strip(" ")
    return " ".join(p for p in _WS_RUN.split(t) if p)


def normalize_ws(texts: pd.Series) -> pd.Series:
    """Collapse ASCII whitespace runs to single spaces and trim (the
    fingerprint's canonical form; mirrored by regexp_replace + trim in SQL)."""
    return texts.fillna("").map(_norm_one)


def fingerprint64(texts: pd.Series) -> pd.Series:
    """64-bit document fingerprint: first 16 hex chars of the md5 of the
    whitespace-normalized text. hashlib digests run at C speed (no per-byte
    Python loop); DuckDB's ``substr(md5(...), 1, 16)`` of the same
    normalization matches byte-for-byte, giving the oracle for free."""
    return normalize_ws(texts).map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()[:16])


def repetition_features(ids: np.ndarray, texts: pd.Series) -> pd.DataFrame:
    """Gopher-style repetition signals per document (quality-filter inputs):

    - ``top_token_ppm``  -- most-frequent-token share of all tokens;
    - ``dup_2gram_ppm`` -- share of bigram OCCURRENCES that are repeats
      (``1 - distinct/total``), 0 when a doc has < 2 tokens.

    Fully vectorized despite being per-doc set statistics: tokens explode to
    one flat (doc, token) frame (``np.repeat`` carries row indices), bigrams
    are the flat series + its shift(-1) masked at doc boundaries, and every
    count/nunique/max is a pandas C groupby. Ratios are integer ppm with the
    house floor(x*1e6+0.5) so the DuckDB unnest/generate_subscripts replay
    compares exactly. Zero-token docs report 0 for both signals."""
    toks = texts.fillna("").str.lower().str.findall(_WS_TOKEN)
    lens = toks.map(len).to_numpy(dtype=np.int64)
    top_ppm = np.zeros(len(ids), dtype=np.int64)
    dup_ppm = np.zeros(len(ids), dtype=np.int64)
    if lens.sum() > 0:
        d = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        flat = pd.Series(
            np.concatenate([np.asarray(t, dtype=object) for t in toks if t]),
            dtype=object,
        )
        fr = pd.DataFrame({"d": d, "tok": flat.values})
        cnt = fr.groupby(["d", "tok"], sort=False).size().rename("c").reset_index()
        top = cnt.groupby("d", sort=False)["c"].agg(["max", "sum"])
        top_ppm[top.index.to_numpy()] = np.floor(
            top["max"] * 1e6 / top["sum"] + 0.5
        ).astype("int64")

        same = np.roll(d, -1) == d
        if len(same):
            same[-1] = False
        if same.any():
            bigrams = (fr["tok"] + " " + fr["tok"].shift(-1))[same]
            b = pd.DataFrame({"d": d[same], "bg": bigrams.values})
            agg = b.groupby("d", sort=False)["bg"].agg(["count", "nunique"])
            dup_ppm[agg.index.to_numpy()] = np.floor(
                (agg["count"] - agg["nunique"]) * 1e6 / agg["count"] + 0.5
            ).astype("int64")
    return pd.DataFrame(
        {"doc_id": ids, "top_token_ppm": top_ppm, "dup_2gram_ppm": dup_ppm}
    )
