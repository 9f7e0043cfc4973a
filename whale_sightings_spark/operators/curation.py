"""Corpus-curation operators (net-new scale surface): PII scrubbing,
deterministic hash sampling, and row-local repetition/quality signals.

These are the remaining table-stakes ops of a training-data pipeline
beyond dedup/similarity (operators/dedup, operators/similarity):

- **PII redaction**: regex scrub of emails / URLs / phone numbers with
  per-class match counts. Pure per-row ``regexp_replace`` — stays in
  whole-stage codegen, zero shuffles, embarrassingly parallel at any
  scale. Patterns are written in the RE2 ∩ Java-regex dialect so the
  DuckDB oracle applies the identical automaton.
- **deterministic sampling**: keep a row iff ``hash60(key) % 1e6`` is
  under the rate. Unlike ``df.sample``/``TABLESAMPLE`` the decision is
  a pure function of the key — reruns, retries, and both oracle engines
  select the identical rows, and per-stratum rates are just a rate
  lookup keyed by the stratum column.
- **repetition signals** (quality filters in the Gopher/C4 family):
  duplicate-shingle fraction and top-token fraction. Both are
  *row-local* array expressions — no explode, no shuffle — because the
  statistic only needs the row's own token multiset.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from whale_sightings_spark.functions.hashing import hash60, hash60_sql

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: match-class -> (pattern, replacement token). Order matters: URLs are
#: scrubbed before emails so a mailto-ish tail inside a URL is consumed
#: as URL, identically in both engines.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^ ]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{2}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-class match counts on the ORIGINAL text (before any
    replacement, so classes never steal each other's counts)."""
    return {
        name: F.regexp_count(col, F.lit(pat)).cast("int")
        for name, pat, _ in PII_PATTERNS
    }


def pii_counts_sql(expr: str) -> dict[str, str]:
    return {
        name: f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS INT)"
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(col: Column) -> Column:
    """Text with every PII match replaced by its class token."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def redact_pii_sql(expr: str) -> str:
    out = expr
    for _, pat, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


# ---------------------------------------------------------------------------
# deterministic hash sampling
# ---------------------------------------------------------------------------

#: sampling-rate denominator — rates are expressed in parts-per-million
SAMPLE_DENOM = 1_000_000


def sample_keep(key: Column, rate_ppm: Column | int) -> Column:
    """True iff the row survives sampling at ``rate_ppm`` / 1e6.

    The hash is over the key's string form; a salt can be concatenated
    by the caller to draw an independent sample."""
    return (hash60(key.cast("string")) % SAMPLE_DENOM) < rate_ppm


def sample_keep_sql(key_expr: str, rate_ppm_expr: str) -> str:
    h = hash60_sql(f"CAST({key_expr} AS VARCHAR)")
    return f"(({h}) % {SAMPLE_DENOM}) < ({rate_ppm_expr})"


def stratified_sample_keep(
    key: Column, stratum: Column, rates_ppm: dict[str, int], default_ppm: int = 0
) -> Column:
    """Per-stratum deterministic sampling: the rate is looked up from
    the stratum value (a broadcast-free literal map — the rate table is
    part of the plan)."""
    pairs = []
    for k, v in rates_ppm.items():
        pairs.extend([F.lit(k), F.lit(v)])
    rate = F.coalesce(
        F.create_map(*pairs)[stratum], F.lit(default_ppm)
    )
    return sample_keep(key, rate)


def stratified_sample_keep_sql(
    key_expr: str, stratum_expr: str, rates_ppm: dict[str, int], default_ppm: int = 0
) -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in rates_ppm.items()
    )
    rate = f"(CASE {stratum_expr} {whens} ELSE {default_ppm} END)"
    return sample_keep_sql(key_expr, rate)


# ---------------------------------------------------------------------------
# row-local repetition signals
# ---------------------------------------------------------------------------

def dup_shingle_ratio(shingles: Column) -> Column:
    """Fraction of shingle occurrences that are repeats of an earlier
    shingle in the same document: ``1 - distinct/total`` (0 for empty).
    ``shingles`` must be a materialized array column."""
    total = F.size(shingles)
    return F.when(total > 0, F.round(
        1.0 - F.size(F.array_distinct(shingles)) / total, 6
    )).otherwise(F.lit(0.0))


def dup_shingle_ratio_sql(shingles_expr: str) -> str:
    return (
        f"(CASE WHEN len({shingles_expr}) > 0 THEN "
        f"round(1.0 - CAST(len(list_distinct({shingles_expr})) AS DOUBLE)"
        f" / len({shingles_expr}), 6) ELSE 0.0 END)"
    )


def top_token_ratio(toks: Column) -> Column:
    """Highest single-token share of the document's tokens (the Gopher
    'mostly one word repeated' signal). Row-local O(d x n) over the
    distinct-token list; document token counts are bounded, so this
    trades a shuffle for per-row arithmetic. ``toks`` must be a
    materialized array column."""
    total = F.size(toks)
    top = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    return F.when(total > 0, F.round(top / total, 6)).otherwise(F.lit(0.0))


def top_token_ratio_sql(toks_expr: str) -> str:
    # lambda params named to never collide with caller column names
    top = (
        f"list_max(list_transform(list_distinct({toks_expr}),"
        f" __u -> len(list_filter({toks_expr}, __v -> __v = __u))))"
    )
    return (
        f"(CASE WHEN len({toks_expr}) > 0 THEN "
        f"round(CAST({top} AS DOUBLE) / len({toks_expr}), 6) ELSE 0.0 END)"
    )
