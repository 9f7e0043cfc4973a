"""Registered queries: corpus-quality statistics and dataset splitting
(q88-q90, q93).

Operations a training-data pipeline runs between curation and
export:

- **token entropy** (q88): Shannon entropy of each document's token
  distribution — the standard lexical-diversity / degenerate-text
  signal (low entropy = repetitive or boilerplate text). Computed as
  the distributed two-stage shape: explode -> per-(doc, token) count ->
  per-doc fold. Both shuffles key on doc_id, so the operator is one
  hash family end-to-end and AQE coalesces the tiny tail.
- **winsorized statistics** (q89): robust per-group moments after
  clipping to the group's [p05, p95]. The exact-percentile boundary
  table is group-cardinality-sized, so it broadcasts back onto the
  fact side; the fact table is scanned twice but never shuffled beyond
  the two keyed aggregations. (percentile() with linear interpolation
  == DuckDB quantile_cont, the q39 parity contract.)
- **train/val/test split assignment** (q90): the deterministic
  80/10/10 bucket split every dataset export needs. The decision is a
  pure function of the key (hash60 % 100), so retries, reruns, and
  both oracle engines assign identical rows — the same property the
  q49 sampler relies on. Pure map + one aggregation; no state, no
  sampling seed to lose.

No reference counterpart (the reference stops at per-row validation);
net-new scale surface like operators/curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whale_sightings_spark.functions import text as TX
from whale_sightings_spark.functions.hashing import hash60, hash60_sql
from whale_sightings_spark.plans.queries import register
from whale_sightings_spark.schemas import load_table

# ---------------------------------------------------------------------------
# q88 — per-document token entropy + type-token ratio.
# entropy = ln(N) - sum(c * ln(c)) / N over per-token counts c.
# ---------------------------------------------------------------------------

@register(
    "q88_token_entropy",
    f"""
    WITH tf AS (
        SELECT doc_id, tok, count(*) AS c
        FROM (
            SELECT doc_id, unnest({TX.tokens_sql('text')}) AS tok
            FROM documents
        )
        WHERE tok <> ''
        GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy,
           round(count(*) * 1.0 / sum(c), 6) AS ttr
    FROM tf
    GROUP BY doc_id
    """,
)
def q88_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c")
    return tf.groupBy("doc_id").agg(
        n.cast("bigint").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.round(F.log(n) - F.sum(F.col("c") * F.log("c")) / n, 6).alias("entropy"),
        F.round(F.count("*") / n, 6).alias("ttr"),
    )


# ---------------------------------------------------------------------------
# q89 — winsorized per-group statistics over orders: exact [p05, p95]
# boundaries, broadcast back, clip, re-aggregate.
# ---------------------------------------------------------------------------

@register(
    "q89_winsorized_stats",
    """
    WITH o AS (
        SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS price
        FROM orders
    ),
    b AS (
        SELECT o_orderpriority,
               quantile_cont(price, 0.05) AS lo,
               quantile_cont(price, 0.95) AS hi
        FROM o
        GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(least(greatest(price, lo), hi)), 2) AS wins_mean,
           round(stddev_samp(least(greatest(price, lo), hi)), 2) AS wins_sd,
           round(avg(price), 2) AS raw_mean,
           round(min(lo), 2) AS p05,
           round(min(hi), 2) AS p95
    FROM o JOIN b USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
)
def q89_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.col("o_totalprice").cast("double").alias("price")
    )
    bounds = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(price, 0.05D)").alias("lo"),
        F.expr("percentile(price, 0.95D)").alias("hi"),
    )
    joined = o.join(F.broadcast(bounds), "o_orderpriority")
    clipped = F.least(F.greatest(F.col("price"), F.col("lo")), F.col("hi"))
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n"),
        F.round(F.avg(clipped), 2).alias("wins_mean"),
        F.round(F.stddev_samp(clipped), 2).alias("wins_sd"),
        F.round(F.avg("price"), 2).alias("raw_mean"),
        F.round(F.min("lo"), 2).alias("p05"),
        F.round(F.min("hi"), 2).alias("p95"),
    )


# ---------------------------------------------------------------------------
# q90 — deterministic train/val/test split: hash60(key) % 100 into
# 80/10/10, audited per (lang, split).
# ---------------------------------------------------------------------------

#: bucket boundaries: [0, TRAIN) train, [TRAIN, VAL) val, rest test
SPLIT_TRAIN_UPTO = 80
SPLIT_VAL_UPTO = 90

_SPLIT_KEY_SQL = hash60_sql("CAST(doc_id AS VARCHAR) || ':split'")


@register(
    "q90_split_assign",
    f"""
    WITH s AS (
        SELECT doc_id, lang,
               CASE WHEN ({_SPLIT_KEY_SQL}) % 100 < {SPLIT_TRAIN_UPTO} THEN 'train'
                    WHEN ({_SPLIT_KEY_SQL}) % 100 < {SPLIT_VAL_UPTO} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT lang, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids,
           min(doc_id) AS min_id,
           max(doc_id) AS max_id
    FROM s
    GROUP BY lang, split
    """,
)
def q90_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":split"))
    ) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_UPTO, "train")
        .when(bucket < SPLIT_VAL_UPTO, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", "lang", split.alias("split")).groupBy(
        "lang", "split"
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("sum_ids"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# q93 — MAD-based outlier screen: per-group median and median absolute
# deviation (both exact percentile_cont parity), flag |x - med| >
# 3 * MAD. The robust complement to q89's winsorization: two
# group-cardinality-sized aggregate tables broadcast back onto the fact
# side, which is scanned three times but never shuffled beyond the
# keyed aggregations. MAD==0 groups (constant-valued) flag nothing —
# the `> 0` guard is part of the contract in both engines.
# ---------------------------------------------------------------------------

MAD_K = 3.0


@register(
    "q93_mad_outliers",
    f"""
    WITH o AS (
        SELECT o_orderpriority AS grp, CAST(o_totalprice AS DOUBLE) AS x
        FROM orders
    ),
    med AS (
        SELECT grp, quantile_cont(x, 0.5) AS med FROM o GROUP BY grp
    ),
    mad AS (
        SELECT o.grp, quantile_cont(abs(x - med), 0.5) AS mad
        FROM o JOIN med USING (grp)
        GROUP BY o.grp
    )
    SELECT o.grp AS priority,
           CAST(count(*) AS BIGINT) AS n,
           round(min(med), 2) AS med,
           round(min(mad), 2) AS mad,
           CAST(sum(CASE WHEN mad > 0 AND abs(x - med) > {MAD_K} * mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           coalesce(min(CASE WHEN mad > 0 AND abs(x - med) > {MAD_K} * mad
                             THEN x END), 0.0) AS min_outlier
    FROM o JOIN med USING (grp) JOIN mad USING (grp)
    GROUP BY o.grp
    """,
)
def q93_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").cast("double").alias("x"),
    )
    med = o.groupBy("grp").agg(F.expr("percentile(x, 0.5D)").alias("med"))
    with_med = o.join(F.broadcast(med), "grp")
    mad = with_med.groupBy("grp").agg(
        F.expr("percentile(abs(x - med), 0.5D)").alias("mad")
    )
    joined = with_med.join(F.broadcast(mad), "grp")
    is_out = (F.col("mad") > 0) & (
        F.abs(F.col("x") - F.col("med")) > MAD_K * F.col("mad")
    )
    return joined.groupBy(F.col("grp").alias("priority")).agg(
        F.count("*").alias("n"),
        F.round(F.min("med"), 2).alias("med"),
        F.round(F.min("mad"), 2).alias("mad"),
        F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
        F.coalesce(F.min(F.when(is_out, F.col("x"))), F.lit(0.0)).alias("min_outlier"),
    )


# ---------------------------------------------------------------------------
# q125 — quality-signal ensemble: several row-local signals combined on
# a COMMON scale by decile-rank normalization. Naive rank-normalization
# is a global window (percent_rank over the whole corpus) — the q105
# disease; here each signal's decile boundaries come from one exact
# percentile_cont scalar aggregate (single-row, broadcast), and every
# row is scored with a row-local array probe (1 + #bounds below) / 10 —
# the q72 equi-depth shape applied per signal. Signals: token count,
# unique-token ratio, chars-per-token. Ensemble = mean decile score;
# final cut is TakeOrdered top-20. Corpus is scanned twice (boundary
# pass + scoring pass), shuffled never.
# ---------------------------------------------------------------------------

_ENS_DECILES = [i / 10 for i in range(1, 10)]
_ENS_TOP = 20

_ENS_SIGNALS_SQL = f"""
        SELECT doc_id,
               CAST(len(toks) AS DOUBLE) AS s_ntok,
               CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS s_uniq,
               CAST(n_chars AS DOUBLE) / len(toks) AS s_cpt
        FROM (SELECT doc_id, n_chars, {TX.tokens_sql('text')} AS toks
              FROM documents)
        WHERE len(toks) > 0
"""


def _ens_decile_sql(col: str) -> str:
    return (
        f"round(CAST(1 + len(list_filter(b.b_{col}, x -> s.{col} > x)) AS DOUBLE)"
        " / 10, 1)"
    )


@register(
    "q125_quality_ensemble",
    f"""
    WITH s AS ({_ENS_SIGNALS_SQL}),
    b AS (
        SELECT quantile_cont(s_ntok, {_ENS_DECILES}) AS b_s_ntok,
               quantile_cont(s_uniq, {_ENS_DECILES}) AS b_s_uniq,
               quantile_cont(s_cpt, {_ENS_DECILES}) AS b_s_cpt
        FROM s
    ),
    scored AS (
        SELECT s.doc_id,
               {_ens_decile_sql('s_ntok')} AS d_ntok,
               {_ens_decile_sql('s_uniq')} AS d_uniq,
               {_ens_decile_sql('s_cpt')} AS d_cpt
        FROM s CROSS JOIN b
    )
    SELECT doc_id, d_ntok, d_uniq, d_cpt,
           round((d_ntok + d_uniq + d_cpt) / 3, 4) AS ensemble
    FROM scored
    ORDER BY ensemble DESC, doc_id
    LIMIT {_ENS_TOP}
    """,
)
def q125_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = (
        docs.select("doc_id", "n_chars", TX.tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            "doc_id",
            F.size("toks").cast("double").alias("s_ntok"),
            (F.size(F.array_distinct("toks")).cast("double") / F.size("toks"))
            .alias("s_uniq"),
            (F.col("n_chars").cast("double") / F.size("toks")).alias("s_cpt"),
        )
    )
    b = s.agg(
        *[
            F.percentile(c, F.lit(_ENS_DECILES)).alias(f"b_{c}")
            for c in ("s_ntok", "s_uniq", "s_cpt")
        ]
    )

    def decile(c: str) -> F.Column:
        probe = F.filter(f"b_{c}", lambda x: F.col(c) > x)
        return F.round((1 + F.size(probe)).cast("double") / 10, 1)

    scored = s.crossJoin(F.broadcast(b)).select(
        "doc_id",
        decile("s_ntok").alias("d_ntok"),
        decile("s_uniq").alias("d_uniq"),
        decile("s_cpt").alias("d_cpt"),
    )
    return (
        scored.withColumn(
            "ensemble",
            F.round((F.col("d_ntok") + F.col("d_uniq") + F.col("d_cpt")) / 3, 4),
        )
        .orderBy(F.desc("ensemble"), "doc_id")
        .limit(_ENS_TOP)
    )


# ---------------------------------------------------------------------------
# q164 — filter-attribution ablation: for each screen in a quality
# ensemble, how many documents it flags and how many ONLY it flags
# (its unique kills) — the table a curation team reads before tuning
# thresholds: a filter with many flags but no unique kills is redundant
# with the rest of the ensemble; one with many unique kills carries
# real signal. All four screens are row-local (codegen); the whole
# report is ONE scalar aggregate exploded to four rows — no per-filter
# rescans, no shuffle beyond the single reduce.
# ---------------------------------------------------------------------------

_FA_MIN_TOK = 20
_FA_MIN_SCORE = 0.55
_FA_MAX_TOPTOK = 0.125
_FA_MAX_CPT = 5.68

from whale_sightings_spark.operators.curation import (
    top_token_ratio_sql as _ttr_sql,
)

_FA_TOPTOK_SQL = _ttr_sql(f"({TX.tokens_sql('text')})")


@register(
    "q164_filter_attribution",
    f"""
    WITH flags AS (
        SELECT ({TX.token_count_sql('text')} < {_FA_MIN_TOK}) AS f_short,
               ({TX.quality_score_sql('text')} < {_FA_MIN_SCORE}) AS f_lowq,
               ({_FA_TOPTOK_SQL} > {_FA_MAX_TOPTOK}) AS f_toptok,
               (n_chars * 1.0 / {TX.token_count_sql('text')}
                   > {_FA_MAX_CPT}) AS f_cpt
        FROM documents
        WHERE {TX.token_count_sql('text')} > 0
    ),
    nf AS (
        SELECT *, CAST(f_short AS INT) + CAST(f_lowq AS INT)
                  + CAST(f_toptok AS INT) + CAST(f_cpt AS INT) AS n_flags
        FROM flags
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CAST(f_short AS INT)) AS BIGINT) AS a_short,
               CAST(sum(CASE WHEN f_short AND n_flags = 1 THEN 1 ELSE 0 END) AS BIGINT) AS u_short,
               CAST(sum(CAST(f_lowq AS INT)) AS BIGINT) AS a_lowq,
               CAST(sum(CASE WHEN f_lowq AND n_flags = 1 THEN 1 ELSE 0 END) AS BIGINT) AS u_lowq,
               CAST(sum(CAST(f_toptok AS INT)) AS BIGINT) AS a_toptok,
               CAST(sum(CASE WHEN f_toptok AND n_flags = 1 THEN 1 ELSE 0 END) AS BIGINT) AS u_toptok,
               CAST(sum(CAST(f_cpt AS INT)) AS BIGINT) AS a_cpt,
               CAST(sum(CASE WHEN f_cpt AND n_flags = 1 THEN 1 ELSE 0 END) AS BIGINT) AS u_cpt
        FROM nf
    )
    SELECT 'short' AS filter, a_short AS n_flagged, u_short AS n_unique,
           round(a_short * 1.0 / n_docs, 6) AS flag_rate FROM agg
    UNION ALL
    SELECT 'lowq', a_lowq, u_lowq, round(a_lowq * 1.0 / n_docs, 6) FROM agg
    UNION ALL
    SELECT 'toptok', a_toptok, u_toptok, round(a_toptok * 1.0 / n_docs, 6) FROM agg
    UNION ALL
    SELECT 'cpt', a_cpt, u_cpt, round(a_cpt * 1.0 / n_docs, 6) FROM agg
    """,
)
def q164_filter_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whale_sightings_spark.operators import curation as CU

    docs = load_table(spark, sf_dir, "documents")
    ntok = TX.token_count(F.col("text"))
    staged = docs.filter(ntok > 0).select(
        (ntok < _FA_MIN_TOK).alias("f_short"),
        (TX.quality_score(F.col("text")) < _FA_MIN_SCORE).alias("f_lowq"),
        (
            CU.top_token_ratio(TX.tokens(F.col("text"))) > _FA_MAX_TOPTOK
        ).alias("f_toptok"),
        (F.col("n_chars") * 1.0 / ntok > _FA_MAX_CPT).alias("f_cpt"),
    )
    names = ("short", "lowq", "toptok", "cpt")
    nf = staged.withColumn(
        "n_flags",
        sum(
            (F.col(f"f_{n}").cast("int") for n in names), F.lit(0)
        ),
    )
    agg = nf.agg(
        F.count("*").alias("n_docs"),
        *[
            a
            for n in names
            for a in (
                F.sum(F.col(f"f_{n}").cast("int")).cast("bigint").alias(f"a_{n}"),
                F.sum(
                    F.when(F.col(f"f_{n}") & (F.col("n_flags") == 1), 1).otherwise(0)
                )
                .cast("bigint")
                .alias(f"u_{n}"),
            )
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(n).alias("filter"),
                F.col(f"a_{n}").alias("n_flagged"),
                F.col(f"u_{n}").alias("n_unique"),
                F.round(F.col(f"a_{n}") * 1.0 / F.col("n_docs"), 6).alias(
                    "flag_rate"
                ),
            )
            for n in names
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.filter", "r.n_flagged", "r.n_unique", "r.flag_rate"
    )
