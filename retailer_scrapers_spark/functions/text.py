"""Text scalar functions.

Two families:

1. Reference parity: filename sanitization F7 (NFKD → ascii →
   ``[^\\w.-] → _``, scrape_shoprite.py:284-288) — needs unicodedata, so
   it is an Arrow-vectorized pandas UDF (pandas ``.str`` ops, no per-row
   Python loops).
2. Training-data pipeline ops (task brief): language-ID heuristic,
   quality scoring, token counting, document fingerprinting — all as
   built-in column expressions so they stay inside whole-stage codegen
   and are ANSI-SQL-oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# F7 — filename sanitization (pandas UDF: unicodedata has no Spark builtin)
# ---------------------------------------------------------------------------

def sanitize_name_py(name: str) -> str:
    """Pure-Python twin (golden-trace executor parity)."""
    import re
    import unicodedata

    ascii_ = unicodedata.normalize("NFKD", name).encode("ascii", "ignore").decode("ascii")
    return re.sub(r"[^\w.\-]", "_", ascii_)


@F.pandas_udf(T.StringType())
def sanitize_name(names: pd.Series) -> pd.Series:
    """NFKD-normalize → ascii-strip → non-word chars to ``_`` (vectorized)."""
    normalized = (
        names.fillna("")
        .str.normalize("NFKD")
        .str.encode("ascii", "ignore")
        .str.decode("ascii")
    )
    return normalized.str.replace(r"[^\w.\-]", "_", regex=True)


def image_filename(retailer: Column, sanitized: Column, ext: Column) -> Column:
    """``"{retailer}_image_{sanitized}{ext}"`` (scrape_shoprite.py:288)."""
    return F.concat(retailer, F.lit("_image_"), sanitized, ext)


# ---------------------------------------------------------------------------
# Language-ID heuristic (stopword-hit ratio over a tiny per-language lexicon)
# ---------------------------------------------------------------------------

# Minimal, public stopword lists; enough for a deterministic heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on", "with", "as"),
    "af": ("die", "en", "van", "het", "nie", "is", "vir", "met", "aan", "om", "dat", "wat"),
    "fr": ("le", "la", "et", "de", "un", "une", "est", "pour", "dans", "que", "les", "des"),
}


def _words(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def lang_hits(text: Column, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang`` (codegen'd filter)."""
    words = LANG_STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(_words(text), lambda t: F.array_contains(arr, t)))


def detect_language(text: Column) -> Column:
    """Best-scoring language, ``'und'`` when no stopword hits at all."""
    hits = {lg: lang_hits(text, lg) for lg in LANG_STOPWORDS}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # deterministic tie-break: reverse-alphabetical chain so the first
    # WHEN that fires (alphabetical) wins ties
    for lg in sorted(hits, reverse=True):
        out = F.when((hits[lg] > 0) & (hits[lg] == best), F.lit(lg)).otherwise(out)
    return out


# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword / word-length signals)
# ---------------------------------------------------------------------------

def quality_features(text: Column) -> dict[str, Column]:
    n_chars = F.length(text)
    words = _words(text)
    n_words = F.size(words)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_stop = lang_hits(text, "en")
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "punct_ratio": (n_punct.cast("double") / F.greatest(n_chars, F.lit(1))),
        "stopword_ratio": (n_stop.cast("double") / F.greatest(n_words, F.lit(1))),
        "mean_word_len": ((n_chars - n_words + 1).cast("double") / F.greatest(n_words, F.lit(1))),
    }


def quality_score(text: Column) -> Column:
    """0..1 heuristic: long-enough, low punctuation, natural stopword rate.

    score = min(n_words/50, 1)·0.4 + (1 − min(punct_ratio·5, 1))·0.3
          + min(stopword_ratio·4, 1)·0.3
    """
    f = quality_features(text)
    len_term = F.least(f["n_words"].cast("double") / 50.0, F.lit(1.0))
    punct_term = 1.0 - F.least(f["punct_ratio"] * 5.0, F.lit(1.0))
    stop_term = F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
    return F.round(len_term * 0.4 + punct_term * 0.3 + stop_term * 0.3, 6)


# ---------------------------------------------------------------------------
# Token counting (whitespace + a BPE-ish regex pre-tokenizer)
# ---------------------------------------------------------------------------

# GPT-2-style pre-tokenizer shape, ASCII-safe subset (public pattern).
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column) -> Column:
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(_words(text))).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_ISH_RE)).cast("long")


# ---------------------------------------------------------------------------
# Document fingerprinting (rolling polynomial hash, winnowing-style min)
# ---------------------------------------------------------------------------

def fingerprint(text: Column, ngram: int = 8) -> Column:
    """64-bit document fingerprint: min of xxhash64 over character
    ``ngram``-shingles of the lowercased text (winnowing's min-sampling
    over a rolling window, built-in ops only — no UDF).

    Shape: the obvious ``transform(sequence(...), i ->
    substring(lowered, i, n))`` form lets CollapseProject inline the
    ``lower(text)`` INTO the per-position lambda — O(len²) work per
    document (same pathology as dedup._shingles, bench r3). Instead the
    char array is zip-folded across ``ngram`` shifted copies: zip_with
    evaluates its array arguments once per row, so lowering costs O(k)
    evaluations. ``concat_ws('')`` skips zip_with's null padding, which
    reproduces the truncated tail shingle of short texts exactly."""
    chars = F.split(F.lower(text), "")
    big = 1 << 30
    acc = chars
    for j in range(1, ngram):
        acc = F.zip_with(acc, F.slice(chars, j + 1, big), lambda a, b: F.concat_ws("", a, b))
    n = F.greatest(F.size(chars) - (ngram - 1), F.lit(1))
    shingles = F.slice(acc, 1, n)
    return F.array_min(F.transform(shingles, lambda s: F.xxhash64(s))).cast("long")
