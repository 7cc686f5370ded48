"""Text-analysis Column builders for the LLM-data-pipeline surface
(training-data ops): tokenization, quality scoring, language-ID
heuristic, shingling, fingerprinting.

All pure Catalyst higher-order functions — no Python UDFs — so they run
JVM-side at 100 TB. The `documents.text` column is whitespace-separated.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny stopword list for quality/lang heuristics (matches the synthetic
# vocabulary of the test corpus; swap for a real list in production).
STOPWORDS_EN = ("the", "a", "of", "to", "and", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped (trailing-space safe)."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def token_count(toks: Column) -> Column:
    return F.size(toks)


def unique_token_count(toks: Column) -> Column:
    return F.size(F.array_distinct(toks))


def total_chars(toks: Column) -> Column:
    """Sum of token lengths via left-fold (matches DuckDB list_reduce order)."""
    return F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))


def stopword_count(toks: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*stopwords)))


def shingles(toks: Column, n: int = 3) -> Column:
    """n-gram shingles as space-joined strings. Caller must guard
    ``size(toks) >= n`` (Spark sequence() is descending for stop<start)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + off) for off in range(n)]
        ),
    )


def shingles_zip(toks: Column, n: int = 3) -> Column:
    """n-gram shingles via a zip_with sliding window.

    Same output as ``shingles`` but each input-array reference is one
    slice — O(n) passes over the array instead of O(n·len) element_at
    probes, and safe against Catalyst inlining the token expression
    into every lambda (the 100× recompute trap). ``toks`` should be a
    materialized column, not an inline expression. Safe for len < n
    (slice length clamps to 0 → empty result).
    """
    win = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    out = F.slice(toks, 1, win)
    for off in range(1, n):
        out = F.zip_with(out, F.slice(toks, off + 1, win), lambda a, b: F.concat_ws(" ", a, b))
    return out


def min_shingle_fingerprint(toks: Column, n: int = 3) -> Column:
    """Deterministic doc fingerprint: min md5 over n-gram shingles —
    a 1-permutation MinHash usable for exact-duplicate and
    high-overlap detection. Oracle-checkable (md5 is engine-portable)."""
    return F.array_min(F.transform(shingles(toks, n), F.md5))


def quality_score(n_toks: Column, stop_ratio: Column, avg_token_len: Column) -> Column:
    """Heuristic quality in [0,1]: length coverage + non-stopword mass +
    token-length sanity. Weights arbitrary but fixed (documented).

    Uses portable floor-rounding (plans.money.fround) so the DuckDB
    oracle matches bit-for-bit.
    """
    from ..plans.money import fround

    return fround(
        0.4 * F.least(n_toks / 20.0, F.lit(1.0))
        + 0.4 * (1.0 - stop_ratio)
        + 0.2 * F.least(avg_token_len / 8.0, F.lit(1.0)),
        4,
    )


def predict_lang(toks: Column) -> Column:
    """Stopword-presence language-ID heuristic (deterministic, SQL-portable).

    The synthetic corpus shares one vocabulary, so this exercises the
    *plumbing* (per-doc classification at scale); swap the rule table
    for real per-language n-gram stats in production.
    """
    return (
        F.when(F.array_contains(toks, "the") & F.array_contains(toks, "data"), "en")
        .when(F.array_contains(toks, "the"), "en_weak")
        .otherwise("unknown")
    )
