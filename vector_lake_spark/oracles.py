"""DuckDB oracle-SQL generators mirroring the engine's deterministic formulas.

Every Spark-side formula in ``functions/text.py`` / ``operators/*`` that
participates in the driver's correctness gate has a generator here emitting
the *identical* arithmetic as ANSI-ish DuckDB SQL — same tokenizer regex,
same stopword lists, same md5-based hashes, same rounding — so value-hash
comparison succeeds despite the two engines.

Conventions shared with the Spark side:
- floats: round(…, 6) before output (2 decimals for money sums);
- counts: CAST(… AS BIGINT) — DuckDB sums of integers are HUGEINT otherwise;
- timestamps in outputs: formatted strings 'YYYY-MM-DD HH:MM:SS';
- LIMIT queries order by (rounded score, unique id) for deterministic sets.
"""

from __future__ import annotations

from vector_lake_spark.functions.text import LANG_PROFILES, STOPWORDS_EN

# Mirrors functions/text.py PUNCT_CLASS (single quote doubled for SQL).
SQL_PUNCT_CLASS = "[.,!?;:''\"()\\[\\]{}-]"


def sql_str_list(words: list[str]) -> str:
    return "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in words) + "]"


def sql_tokens(col: str) -> str:
    r"""lowercase → split on \s+ → drop empties (== functions.text.tokens)."""
    return (
        f"list_filter(regexp_split_to_array(lower({col}), '\\s+'), t -> t <> '')"
    )


def sql_token_count(col: str) -> str:
    return f"CAST(len({sql_tokens(col)}) AS BIGINT)"


def sql_punct_count(col: str) -> str:
    return (
        f"CAST(length({col}) - length(regexp_replace({col}, "
        f"'{SQL_PUNCT_CLASS}', '', 'g')) AS BIGINT)"
    )


def sql_punct_ratio(col: str) -> str:
    return (
        f"({sql_punct_count(col)} / "
        f"greatest(CAST(length({col}) AS DOUBLE), 1.0))"
    )


def sql_stopword_count(col: str, words: list[str] | None = None) -> str:
    lst = sql_str_list(words or STOPWORDS_EN)
    return (
        f"CAST(len(list_filter({sql_tokens(col)}, "
        f"t -> list_contains({lst}, t))) AS BIGINT)"
    )


def sql_stopword_ratio(col: str) -> str:
    return (
        f"({sql_stopword_count(col)} / "
        f"greatest(CAST({sql_token_count(col)} AS DOUBLE), 1.0))"
    )


def sql_avg_token_len(col: str) -> str:
    toks = sql_tokens(col)
    return (
        f"(CAST(list_sum(list_transform({toks}, t -> length(t))) AS DOUBLE) / "
        f"greatest(CAST(len({toks}) AS DOUBLE), 1.0))"
    )


def sql_quality_score(col: str) -> str:
    """Mirrors functions.text.quality_score term-for-term (same op order →
    bit-identical IEEE doubles)."""
    tok_term = f"least(1.0, {sql_token_count(col)} / 100.0)"
    sw_term = f"least(1.0, 4.0 * {sql_stopword_ratio(col)})"
    return (
        f"(0.4 * {tok_term} + 0.3 * (1.0 - {sql_punct_ratio(col)}) "
        f"+ 0.3 * {sw_term})"
    )


def sql_lang_scores(col: str) -> list[tuple[str, str]]:
    """(lang, score-expr) in the same sorted order the Spark fold uses."""
    out = []
    for lang, words in sorted(LANG_PROFILES.items()):
        lst = sql_str_list(words)
        out.append(
            (
                lang,
                f"CAST(len(list_filter({sql_tokens(col)}, "
                f"t -> list_contains({lst}, t))) AS BIGINT)",
            )
        )
    return out


def sql_lang_id(score_cols: list[tuple[str, str]]) -> str:
    """CASE chain equivalent to the Spark sequential-fold argmax: first
    language (in sorted order) achieving the strict maximum; all-zero →
    'und'. ``score_cols`` are (lang, column-name) of precomputed scores."""
    names = [c for _, c in score_cols]
    mx = f"greatest({', '.join(names)})"
    branches = "".join(
        f" WHEN {c} = {mx} THEN '{lang}'" for lang, c in score_cols
    )
    return f"CASE WHEN {mx} = 0 THEN 'und'{branches} END"


def sql_normalize_text(col: str) -> str:
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


def sql_fingerprint64(col: str) -> str:
    """== functions.text.fingerprint64: first 15 md5 hex chars → BIGINT."""
    return (
        f"CAST(concat('0x', substring(md5({sql_normalize_text(col)}), 1, 15)) "
        f"AS BIGINT)"
    )


def sql_token_hash60(tok_col: str) -> str:
    return f"CAST(concat('0x', substring(md5({tok_col}), 1, 15)) AS BIGINT)"


def sql_shingles(col: str, n: int = 3) -> str:
    """Distinct word n-grams (== operators.dedup.shingles)."""
    toks = sql_tokens(col)
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')))"
    )


def sql_epoch_day(col: str) -> str:
    """Day number since 1970-01-01 — floors the DIVISION (a floor around
    the epoch alone, then CAST, would round the day for non-midnight
    timestamps and diverge from Spark's datediff truncation)."""
    return f"CAST(floor(date_part('epoch', {col}) / 86400) AS BIGINT)"


# Mirrors functions/text.py EMAIL_RE / PHONE_RE verbatim (constructs common
# to Java regex and RE2: classes, bounded repetition, \d, ASCII \b).
SQL_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
SQL_PHONE_RE = "\\b\\d{3}-\\d{4}\\b"


def sql_pii_email_count(col: str) -> str:
    return f"CAST(len(regexp_extract_all({col}, '{SQL_EMAIL_RE}')) AS BIGINT)"


def sql_pii_phone_count(col: str) -> str:
    return f"CAST(len(regexp_extract_all({col}, '{SQL_PHONE_RE}')) AS BIGINT)"


def sql_redact_pii(col: str) -> str:
    """Emails first, then phones — same order as functions.text.redact_pii
    (DuckDB regexp_replace needs the 'g' flag; Spark's is global already)."""
    emails_gone = f"regexp_replace({col}, '{SQL_EMAIL_RE}', '[EMAIL]', 'g')"
    return f"regexp_replace({emails_gone}, '{SQL_PHONE_RE}', '[PHONE]', 'g')"


def sql_repetition_ratio(col: str, n: int = 3) -> str:
    """== functions.text.repetition_ratio (same op order → identical
    IEEE doubles)."""
    toks = sql_tokens(col)
    total = f"greatest(len({toks}) - {n - 1}, 0)"
    distinct = f"len({sql_shingles(col, n)})"
    return (
        f"CASE WHEN {total} > 0 THEN "
        f"round(1.0 - CAST({distinct} AS DOUBLE) / CAST({total} AS DOUBLE), 6) "
        f"ELSE 0.0 END"
    )


def sql_normalize_url(col: str) -> str:
    """== functions.text.normalize_url (same regexps, same order)."""
    u = f"lower({col})"
    u = f"regexp_replace({u}, '^https?://', '')"
    u = f"regexp_replace({u}, '^www\\.', '')"
    u = f"regexp_replace({u}, '[?#].*$', '')"
    return f"regexp_replace({u}, '/$', '')"


def sql_url_domain(col: str) -> str:
    return f"regexp_extract({col}, '^([^/]+)', 1)"
