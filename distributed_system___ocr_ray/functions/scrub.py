"""Corpus-hygiene kernels for training-data prep: PII redaction and
eval-set decontamination.

Both are vectorized batch transforms (pandas str ops over compiled regexes /
pyarrow substring kernels); neither touches Ray. Like ``textstats``, every
kernel is exactly SQL-expressible: the pattern STRINGS below are shared
verbatim with the RE2 calls in ``__ray_entry__.oracle_sql`` (RE2 has no
unicode-aware ``\\d``/``\\S``, so classes are spelled out as ASCII ranges),
and replacement order is fixed (URL -> EMAIL -> PHONE) so sequential
``regexp_replace`` chains produce byte-identical text on both sides.

Reference analogue: the worker's per-record normalize step
(``Worker.java:87-95`` error-sentinel discipline -- scrubbing failures never
fail a block; an un-matchable text simply passes through unchanged).
"""

from __future__ import annotations

import re

import pandas as pd

# --- PII patterns (RE2-parity: ASCII classes only, no backrefs/lookarounds).
# URL first: a URL may contain '@' or digit runs that the later EMAIL/PHONE
# patterns would otherwise chew on. RE2 and Python re agree on these
# patterns (greedy quantifiers, no alternation ambiguity).
URL_PATTERN = r"https?://[^ \t\n\f\r]+"
EMAIL_PATTERN = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+"
PHONE_PATTERN = r"\+?\(?[0-9][0-9()\-]{5,}[0-9]"

URL_TOKEN = "<URL>"
EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"

_REDACTIONS: list[tuple[re.Pattern, str]] = [
    (re.compile(URL_PATTERN), URL_TOKEN),
    (re.compile(EMAIL_PATTERN), EMAIL_TOKEN),
    (re.compile(PHONE_PATTERN), PHONE_TOKEN),
]


def redact_pii(texts: pd.Series) -> pd.Series:
    """Replace URLs, then emails, then phone numbers with placeholder
    tokens. One vectorized ``str.replace`` per pattern; the fixed order is
    part of the contract (the SQL oracle nests its ``regexp_replace`` calls
    in the same order)."""
    s = texts.fillna("")
    for pat, token in _REDACTIONS:
        s = s.str.replace(pat, token, regex=True)
    return s


# --- decontamination -------------------------------------------------------

# normalization shared with the SQL side: collapse ASCII whitespace runs to
# one space, lowercase. Tokens of the NORMALIZED text are '[^ ]+' runs --
# spelled that way (not \S+) because normalization already folded every
# other whitespace char into ' '.
NORM_WS_PATTERN = r"[ \t\n\r\f\v]+"
_NORM_WS = re.compile(NORM_WS_PATTERN)
NORM_TOKEN_PATTERN = r"[^ ]+"
_NORM_TOKEN = re.compile(NORM_TOKEN_PATTERN)


def normalize_for_contamination(texts: pd.Series) -> pd.Series:
    """Lowercase + whitespace-collapsed text (the matching canvas)."""
    return texts.fillna("").str.replace(_NORM_WS, " ", regex=True).str.lower()


def leading_shingle(texts: pd.Series, k: int = 8) -> pd.Series:
    """First-``k``-token shingle of each ALREADY-NORMALIZED text, or None
    when the text has fewer than ``k`` tokens (such rows contribute no
    probe). This is the eval-set fingerprint used for contamination
    checks."""

    def one(t: str):
        toks = _NORM_TOKEN.findall(t)
        return " ".join(toks[:k]) if len(toks) >= k else None

    return texts.map(one)


def contamination_hits(texts: pd.Series, shingles: list[str]) -> pd.Series:
    """For each normalized text, how many of the (distinct) eval shingles it
    CONTAINS as a plain substring.

    Two-stage so cost scales with the HIT rate, not |probes| x |corpus|:
    one alternation-regex pass flags candidate docs (contamination is rare
    by construction -- most docs match nothing), then only candidates pay
    the exact per-probe count. The per-probe loop stays the semantic ground
    truth: an alternation ``findall`` alone would undercount probes that
    overlap another match, so it is only ever used as a conservative
    PREFILTER (a doc containing any probe always matches the
    alternation)."""
    import numpy as np

    hits = np.zeros(len(texts), dtype="int64")
    if not shingles:
        return pd.Series(hits, index=texts.index)
    alt = re.compile("|".join(re.escape(s) for s in shingles))
    candidates = texts.str.contains(alt, regex=True)
    cand_texts = texts[candidates]
    if len(cand_texts):
        cand_hits = np.zeros(len(cand_texts), dtype="int64")
        for sh in shingles:
            cand_hits += cand_texts.str.contains(sh, regex=False).to_numpy(dtype="int64")
        hits[candidates.to_numpy()] = cand_hits
    return pd.Series(hits, index=texts.index)
