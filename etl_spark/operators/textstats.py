"""Text analysis for training-data curation: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Everything here is a pure Catalyst expression (whole-stage codegen; no
Python in the path) except the rolling-hash fingerprint, which is an
Arrow pandas UDF. Each operator has an exact DuckDB-SQL mirror used by
the driver's oracle harness (__spark_entry__.py) — formulas are chosen
to be bit-reproducible across both engines (integer arithmetic, or
rounded floats).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# word-token regex shared with the SQL mirrors. BPE-ish: letter runs,
# digit runs, or single punctuation marks.
TOKEN_RE = r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "zu", "ist", "ein", "nicht", "mit", "auf"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "pour", "dans"],
}


def ws_tokens(col: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace, drop empties)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda x: x != "")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(col))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + punctuation marks."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), 1))


def stopword_hits(col: Column, lang: str) -> Column:
    words = F.lit(STOPWORDS[lang]).cast("array<string>")
    return F.size(
        F.filter(ws_tokens(F.lower(col)), lambda x: F.array_contains(words, x))
    )


def quality_score(col: Column) -> Column:
    """Deterministic quality heuristic in [0,1]:
        0.4 * min(1, tokens/100)            (length signal)
        + 0.3 * (1 - punct_ratio)           (symbol noise)
        + 0.3 * min(1, 5*stop_ratio)        (natural-language signal)
    Rounded to 6 dp so Spark and DuckDB agree bit-for-bit.
    """
    n_tok = token_count(col).cast("double")
    n_chars = F.length(col).cast("double")
    n_punct = F.size(F.regexp_extract_all(col, F.lit(r"([^A-Za-z0-9\s])"), 1)).cast("double")
    stop = stopword_hits(col, "en").cast("double")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0))
    score = (
        0.4 * F.least(F.lit(1.0), n_tok / 100.0)
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * F.least(F.lit(1.0), 5.0 * stop_ratio)
    )
    return F.round(score, 6)


def lang_id(col: Column) -> Column:
    """N-gram/stopword language guess: argmax of per-language stopword hit
    counts, 'und' (undetermined) when all are zero. Ties break by the
    fixed language order en > es > de > fr (strictly-greater comparison).
    """
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in ["fr", "de", "es", "en"]:  # reversed so earlier wins ties
        h = stopword_hits(col, lang)
        best_lang = F.when(h >= F.greatest(best_hits, F.lit(1)), F.lit(lang)).otherwise(best_lang)
        best_hits = F.greatest(best_hits, h)
    return best_lang


def fingerprint_md5(col: Column) -> Column:
    """Document fingerprint: md5 of case-folded, whitespace-collapsed text
    (the SQL-expressible identity; reference analog D1 identity hashing,
    thehive_to_dwh/transform_load.py:176-194)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))


@F.pandas_udf(T.LongType())
def rolling_fingerprint(s: pd.Series) -> pd.Series:
    """Winnowing-style rolling-hash fingerprint (Karp-Rabin over bytes,
    window 8, keep the min hash — a locality-robust document id).
    Arrow-batched, numpy per document: every window's hash is the dot
    of a stride-tricks sliding view with the power vector, reduced mod
    2^61-1 — no per-byte Python (the former rolling loop was the
    corpus bottleneck class at 100 TB). Identical values to the naive
    per-offset polynomial (the DuckDB oracle computes it that way).
    """
    B, MOD, W = 257, (1 << 61) - 1, 8
    POW = np.array([B ** (W - 1 - j) for j in range(W)], dtype=np.uint64)
    P7 = B ** (W - 1)  # 257^7 < 2^57, but byte*P7 can exceed 2^64:
    CARRY_AT = -(-(1 << 64) // P7)  # smallest byte whose product wraps
    WRAP = np.uint64((1 << 64) % MOD)  # 2^64 mod p, the wrap correction

    def fp(text):
        if text is None:
            return None
        data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        n = len(data)
        if n < W:
            # short doc: one polynomial over all bytes (< 255*sum(B^j),
            # fits). Modulus as np.uint64: a python-int rhs would
            # silently promote the uint64 dot to float64
            return int((data @ POW[W - n:]) % np.uint64(MOD)) if n else 0
        win = np.lib.stride_tricks.sliding_window_view(data, W)
        # tail dot (7 low-order terms) <= 255*(B^6+..+1) ~ 7.4e16: exact
        tail = win[:, 1:] @ POW[1:]
        # head term byte*B^7 may wrap uint64 exactly once (byte >= 250);
        # add back 2^64 mod p where it did — all sums stay < 2^63
        head = win[:, 0] * np.uint64(P7)
        carry = (win[:, 0] >= CARRY_AT).astype(np.uint64)
        h = (head % np.uint64(MOD) + carry * WRAP + tail) % np.uint64(MOD)
        return int(h.min())

    return s.map(fp)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All stats in one projection (single pass, codegen'd)."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "n_bpe_tokens": bpe_token_count(c),
            "quality": quality_score(c),
            "lang_guess": lang_id(c),
            "fingerprint": fingerprint_md5(c),
        }
    )
