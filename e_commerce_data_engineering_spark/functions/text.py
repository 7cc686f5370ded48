"""Text-analysis Column builders for the LLM-data-pipeline surface
(training-data ops): tokenization, quality scoring, language-ID
heuristic, shingling, fingerprinting.

All pure Catalyst higher-order functions — no Python UDFs — so they run
JVM-side at 100 TB. The `documents.text` column is whitespace-separated.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Snowball (Porter) English stopword list — the standard public list
# shipped with Snowball/Lucene/NLTK (public-domain word list). Used by
# the quality score's stopword-mass term; the DuckDB oracles generate
# their IN-lists from this same tuple (sql_word_list), so both engines
# always agree.
STOPWORDS_EN = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "your", "yours", "yourself", "yourselves",
    "he", "him", "his", "himself", "she", "her", "hers", "herself",
    "it", "its", "itself", "they", "them", "their", "theirs", "themselves",
    "what", "which", "who", "whom", "this", "that", "these", "those",
    "am", "is", "are", "was", "were", "be", "been", "being",
    "have", "has", "had", "having", "do", "does", "did", "doing",
    "a", "an", "the", "and", "but", "if", "or", "because", "as",
    "until", "while", "of", "at", "by", "for", "with", "about",
    "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in",
    "out", "on", "off", "over", "under", "again", "further", "then",
    "once", "here", "there", "when", "where", "why", "how", "all",
    "any", "both", "each", "few", "more", "most", "other", "some",
    "such", "no", "nor", "not", "only", "own", "same", "so", "than",
    "too", "very", "s", "t", "can", "will", "just", "don", "should",
    "now",
)

# Per-language high-frequency marker words for the lang-ID heuristic —
# the classic function-word profile approach (stopword-list language
# identification). Tuple order = tie-break precedence.
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and", "of", "to", "in", "is", "you", "that", "it", "for")),
    ("fr", ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour")),
    ("de", ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu")),
    ("es", ("el", "los", "las", "y", "en", "un", "una", "es", "que", "para")),
)


def sql_word_list(words: tuple[str, ...]) -> str:
    """SQL IN-list literal for a word tuple (single source of truth for
    the DuckDB oracle strings)."""
    return ", ".join("'" + w.replace("'", "''") + "'" for w in words)


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
    high-overlap detection. Oracle-checkable (md5 is engine-portable).

    r12: built on ``shingles_zip`` (O(n) slice passes) instead of
    ``shingles`` (O(n·len) element_at probes) — min over the same
    element set, so values are identical, but an INLINE ``toks``
    expression is no longer re-evaluated per element_at probe
    (Catalyst's projection collapse made that the d19 10x trap)."""
    return F.array_min(F.transform(shingles_zip(toks, n), F.md5))


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
    """Function-word-profile language ID (deterministic, SQL-portable):
    count marker-word hits per language (LANG_MARKERS), predict the
    argmax — ties broken by table order, zero hits everywhere →
    'unknown'. Pure integer comparisons, so the DuckDB oracle
    (sql_predict_lang) matches exactly.
    """
    hits = [
        (lang, F.size(F.filter(toks, lambda x: x.isin(*words))))
        for lang, words in LANG_MARKERS
    ]
    mx = F.greatest(*[h for _, h in hits]) if len(hits) > 1 else hits[0][1]
    out = F.lit("unknown")
    # build the when-chain in REVERSE so earlier languages win ties
    for lang, h in reversed(hits):
        out = F.when((mx > 0) & (h == mx), lang).otherwise(out)
    return out


def sql_predict_lang(toks_expr: str) -> str:
    """DuckDB mirror of predict_lang over a list expression."""
    hit = {
        lang: f"len(list_filter({toks_expr}, x -> x IN ({sql_word_list(words)})))"
        for lang, words in LANG_MARKERS
    }
    mx = "greatest(" + ", ".join(hit.values()) + ")"
    branches = " ".join(
        f"WHEN {mx} > 0 AND {hit[lang]} = {mx} THEN '{lang}'" for lang, _ in LANG_MARKERS
    )
    return f"CASE {branches} ELSE 'unknown' END"
