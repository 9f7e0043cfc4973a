"""Text-analysis functions (net-new scale surface): tokenization,
shingling, language-ID heuristic, quality scoring, fingerprinting.

All native column expressions with exact DuckDB SQL twins — the dedup
and text queries are oracle-verified, so every formula here is defined
engine-neutrally (no locale/regex-dialect dependence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------

#: BPE-ish word/number/symbol token pattern (letters run | digits run |
#: single non-alphanumeric non-space)
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def tokens(col: Column) -> Column:
    """Whitespace tokens of the trimmed text (empty string -> [])."""
    return F.split(F.trim(col), " +")


def tokens_sql(expr: str) -> str:
    return f"regexp_split_to_array(trim({expr}), ' +')"


def token_count(col: Column) -> Column:
    return F.when(F.trim(col) == "", 0).otherwise(F.size(tokens(col))).cast("int")


def token_count_sql(expr: str) -> str:
    return f"CAST(CASE WHEN trim({expr}) = '' THEN 0 ELSE len({tokens_sql(expr)}) END AS INT)"


def regex_token_count(col: Column) -> Column:
    """Regex token count (the BPE-ish alternative counter)."""
    return F.regexp_count(col, F.lit(TOKEN_RE)).cast("int")


def regex_token_count_sql(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{TOKEN_RE}')) AS INT)"


def shingles_from_tokens(toks: Column, n: int) -> Column:
    """array<string> of n-word shingles from a **materialized** token
    array column; fewer than n tokens -> empty array.

    ``toks`` must be a plain column reference, not an expression: it is
    referenced n times per output element inside the lambda, and Spark
    re-evaluates expressions (no common-subexpression elimination inside
    higher-order functions) — an inline ``split()`` there costs n
    re-tokenizations per shingle.
    """
    count = F.size(toks) - (n - 1)
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + k) for k in range(n)]
            ),
        )
    )


def word_shingles(col: Column, n: int) -> Column:
    """array<string> of n-word shingles (space-joined); fewer than n
    tokens -> empty array. Prefer staging ``tokens()`` into a column and
    calling :func:`shingles_from_tokens` on the hot path."""
    return shingles_from_tokens(tokens(col), n)


def shingles_from_tokens_sql(toks: str, n: int) -> str:
    """DuckDB twin of :func:`shingles_from_tokens` — ``toks`` is an
    already-tokenized VARCHAR[] expression (inlined n+1 times, so pass
    a plain column reference)."""
    joined = " || ' ' || ".join(f"{toks}[i + {k}]" for k in range(n))
    return (
        f"(CASE WHEN len({toks}) - {n - 1} <= 0 THEN CAST([] AS VARCHAR[]) "
        f"ELSE [{joined} FOR i IN range(1, len({toks}) - {n - 1} + 1)] END)"
    )


def word_shingles_sql(expr: str, n: int) -> str:
    """DuckDB list-comprehension twin of :func:`word_shingles`. ``expr``
    should be a plain column reference (it is inlined n+1 times)."""
    return shingles_from_tokens_sql(tokens_sql(expr), n)


# ---------------------------------------------------------------------------
# language ID (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

#: tiny per-language stopword profiles; scoring = count of token hits,
#: argmax with ties broken by profile order
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "et", "les", "des", "une"),
    "es": ("el", "los", "y", "que", "una"),
}


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*words))
    )


def lang_id(col: Column) -> Column:
    """Predicted language code; 'und' when no profile scores > 0."""
    toks = tokens(col)
    scores = {lang: _stopword_hits(toks, words) for lang, words in LANG_PROFILES.items()}
    best = F.greatest(*scores.values())
    # priority chain: the first profile (declaration order) reaching the
    # max score wins ties — mirrored in lang_id_sql
    chain = F.when(best <= 0, F.lit("und"))
    for lang in LANG_PROFILES:
        chain = chain.when(scores[lang] == best, F.lit(lang))
    return chain.otherwise(F.lit("und"))


def _stopword_hits_sql(toks: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks}, t -> list_contains([{lst}], lower(t))))"


def lang_id_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    scores = {
        lang: _stopword_hits_sql(toks, words) for lang, words in LANG_PROFILES.items()
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    whens = "".join(
        f" WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in LANG_PROFILES
    )
    return f"(CASE WHEN {best} <= 0 THEN 'und'{whens} ELSE 'und' END)"


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

def quality_features(col: Column) -> dict[str, Column]:
    """Deterministic quality features: lengths + punctuation/stopword
    ratios. Ratios are rounded to 6dp at the call site for hashing."""
    n_chars = F.length(col).cast("int")
    n_toks = token_count(col)
    toks = tokens(col)
    n_punct = (F.length(col) - F.length(F.regexp_replace(col, r"[^A-Za-z0-9 ]", ""))).cast("int")
    all_stop = tuple(w for ws in LANG_PROFILES.values() for w in ws)
    n_stop = _stopword_hits(toks, all_stop)
    return {
        "n_chars": n_chars,
        "n_tokens": n_toks,
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        "stop_ratio": F.when(n_toks > 0, n_stop / n_toks).otherwise(F.lit(0.0)),
        "avg_token_len": F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0)),
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] score: enough tokens, low punctuation, some
    stopwords. Formula mirrored exactly in :func:`quality_score_sql`."""
    f = quality_features(col)
    length_term = F.least(F.lit(1.0), f["n_tokens"] / F.lit(50.0))
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), f["punct_ratio"] * 4)
    stop_term = F.least(F.lit(1.0), f["stop_ratio"] * 5)
    return F.round(0.4 * length_term + 0.3 * punct_term + 0.3 * stop_term, 6)


def quality_score_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    n_chars = f"length({expr})"
    n_toks = token_count_sql(expr)
    n_punct = f"(length({expr}) - length(regexp_replace({expr}, '[^A-Za-z0-9 ]', '', 'g')))"
    all_stop = tuple(w for ws in LANG_PROFILES.values() for w in ws)
    n_stop = _stopword_hits_sql(toks, all_stop)
    punct_ratio = f"(CASE WHEN {n_chars} > 0 THEN CAST({n_punct} AS DOUBLE) / {n_chars} ELSE 0.0 END)"
    stop_ratio = f"(CASE WHEN {n_toks} > 0 THEN CAST({n_stop} AS DOUBLE) / {n_toks} ELSE 0.0 END)"
    return (
        f"round(0.4 * least(1.0, CAST({n_toks} AS DOUBLE) / 50.0) "
        f"+ 0.3 * (1.0 - least(1.0, {punct_ratio} * 4)) "
        f"+ 0.3 * least(1.0, {stop_ratio} * 5), 6)"
    )


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------

def normalize_text(col: Column) -> Column:
    """lowercase, strip non-alphanumerics to spaces, collapse runs."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "), " +", " ")
    )


def normalize_text_sql(expr: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g'),"
        f" ' +', ' ', 'g'))"
    )


def fingerprint_md5(col: Column) -> Column:
    """Whole-document fingerprint of the normalized text."""
    return F.md5(normalize_text(col))


def fingerprint_md5_sql(expr: str) -> str:
    return f"md5({normalize_text_sql(expr)})"


# ---------------------------------------------------------------------------
# PII redaction (emails / phone numbers)
# ---------------------------------------------------------------------------

#: regex dialect restricted to the Java-regex / RE2 common subset so the
#: Spark expression and the DuckDB oracle match byte-for-byte
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{4}\b"
EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def redact_pii(col: Column) -> Column:
    """Replace every email address and phone-shaped number with typed
    placeholder tokens (emails first, so a digits-only phone pattern
    can never bite into an address). Native regexp_replace — JVM-side,
    replaces all occurrences."""
    return F.regexp_replace(
        F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN), PHONE_RE, PHONE_TOKEN
    )


def redact_pii_sql(expr: str) -> str:
    return (
        f"regexp_replace(regexp_replace({expr}, '{EMAIL_RE}', "
        f"'{EMAIL_TOKEN}', 'g'), '{PHONE_RE}', '{PHONE_TOKEN}', 'g')"
    )
