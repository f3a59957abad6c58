"""Text-analysis column expressions for the ``documents`` table.

The reference has no text operators (SURVEY.md §2.A.1); these are the
north-star LLM-pipeline extensions (language-ID heuristic, quality scoring,
token counting, fingerprinting). Everything here is a native column
expression — no Python UDFs — so the hot path stays in whole-stage codegen
at 100 TB.

Determinism contract shared with the DuckDB oracles in ``__spark_entry__``:
same tokenizer regex (``\\s+`` split on lowercased text), same stopword
lists, same punctuation class, same rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tokenizer shared with oracle SQL: lowercase, split on runs of whitespace.
TOKEN_SPLIT_RE = r"\s+"

# Explicit punctuation class (identical regex in Spark & DuckDB — avoid
# locale-dependent [[:punct:]]).
PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}-]"

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Deterministic, mirrored verbatim into oracle SQL.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "est"],
}

STOPWORDS_EN = LANG_PROFILES["en"] + ["it", "for", "on", "with", "as"]


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def punct_count(col: Column) -> Column:
    """Number of punctuation characters (length delta after removal)."""
    return (
        F.length(col) - F.length(F.regexp_replace(col, PUNCT_CLASS, ""))
    ).cast("long")


def punct_ratio(col: Column) -> Column:
    return punct_count(col) / F.greatest(F.length(col).cast("double"), F.lit(1.0))


def stopword_count(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = [F.lit(s) for s in (stopwords or STOPWORDS_EN)]
    return F.size(
        F.filter(tokens(col), lambda t: t.isin(*(stopwords or STOPWORDS_EN)))
    ).cast("long")


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    return stopword_count(col, stopwords) / F.greatest(
        token_count(col).cast("double"), F.lit(1.0)
    )


def avg_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    return total / F.greatest(F.size(toks).cast("double"), F.lit(1.0))


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic (mirrored in oracle SQL):
    0.4·min(1, tokens/100) + 0.3·(1 − punct_ratio) + 0.3·stopword_presence,
    where stopword_presence = min(1, 4·stopword_ratio) rewards natural-
    language stopword density."""
    tok_term = F.least(F.lit(1.0), token_count(col) / F.lit(100.0))
    sw_term = F.least(F.lit(1.0), F.lit(4.0) * stopword_ratio(col))
    return (
        F.lit(0.4) * tok_term
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(col))
        + F.lit(0.3) * sw_term
    )


def lang_id(col: Column) -> Column:
    """Stopword-profile language-ID heuristic: argmax of per-language
    stopword hit counts (ties → lexicographically smallest language code;
    all-zero → 'und')."""
    toks = tokens(col)

    def hits(words: list[str]) -> Column:
        # NB: a 2-arg lambda (even via default args) would be treated as an
        # (element, index) filter lambda by PySpark — close over `words`.
        return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")

    scores = [(lang, hits(words)) for lang, words in sorted(LANG_PROFILES.items())]
    # argmax with deterministic tie-break: iterate langs in sorted order,
    # keep first strict maximum.
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang, score in scores:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint64(col: Column) -> Column:
    """Content fingerprint: first 60 bits of md5(normalized text) as a
    non-negative BIGINT. Robust to whitespace/case jitter; identical
    arithmetic is expressible in DuckDB (md5 + hex cast)."""
    return F.conv(F.substring(F.md5(normalize_text(col)), 1, 15), 16, 10).cast(
        "long"
    )


def token_hash60(tok: Column) -> Column:
    """60-bit token hash used by SimHash (md5-based, engine-portable)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


# PII patterns shared verbatim with the DuckDB oracle SQL. Both engines'
# regex dialects (Java util.regex / RE2) agree on these constructs:
# character classes, bounded repetition, \d and ASCII \b only — no
# lookarounds, no backreferences (RE2 has neither).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{4}\b"


def pii_email_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(EMAIL_RE)).cast("long")


def pii_phone_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(PHONE_RE)).cast("long")


def redact_pii(col: Column) -> Column:
    """Replace emails then phone numbers with typed placeholder tags.

    Order matters and is part of the contract (emails first — an email's
    digits can never re-match the phone pattern afterwards because the
    replacement introduces no digits). Pure codegen ``regexp_replace``:
    the 100 TB scrub is a single scan, no shuffle, no Python."""
    emails_gone = F.regexp_replace(col, EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(emails_gone, PHONE_RE, "[PHONE]")


def repetition_ratio(col: Column, n: int = 3) -> Column:
    """Within-document duplicate n-gram fraction — the Gopher-style
    repetitiousness quality signal: 1 − distinct_ngrams / total_ngrams
    (0.0 for docs shorter than n tokens). High values flag boilerplate /
    template spam that exact and near dedup both miss (the duplication is
    *inside* one document). Pure column expressions, single scan."""
    from vector_lake_spark.operators.dedup import shingles

    toks = tokens(col)
    total = F.greatest(F.size(toks) - (n - 1), F.lit(0)).cast("long")
    distinct = F.size(shingles(col, n)).cast("long")
    return F.when(total > 0, F.round(
        F.lit(1.0) - distinct.cast("double") / total.cast("double"), 6
    )).otherwise(F.lit(0.0))


def normalize_url(col: Column) -> Column:
    """Crawl-style URL canonicalization (the RefinedWeb/C4 URL-dedup
    prep): lowercase, strip scheme, strip a leading ``www.``, drop
    query string and fragment, drop one trailing slash. Pure codegen
    regexps — mirrored verbatim in ``oracles.sql_normalize_url``."""
    u = F.lower(col)
    u = F.regexp_replace(u, "^https?://", "")
    u = F.regexp_replace(u, "^www\\.", "")
    u = F.regexp_replace(u, "[?#].*$", "")
    return F.regexp_replace(u, "/$", "")


def url_domain(col: Column) -> Column:
    """Host part of a normalized URL (everything before the first /)."""
    return F.regexp_extract(col, "^([^/]+)", 1)
