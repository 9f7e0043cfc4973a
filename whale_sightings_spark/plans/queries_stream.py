"""Registered queries: streaming-equivalent window aggregations (batch
semantics of window()/session_window() are identical to the streaming
versions — the oracle checks the shared transformation), multimodal
feature extraction, and JSON property extraction (F14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whale_sightings_spark.functions import text as TX
from whale_sightings_spark.operators.multimodal import attach_fake_media, extract_features
from whale_sightings_spark.plans.queries import register
from whale_sightings_spark.schemas import load_table
from whale_sightings_spark.streaming.events import (
    session_windows,
    sliding_window_counts,
    tumbling_window_counts,
)

# ---------------------------------------------------------------------------
# q23 — multimodal: binary payload feature extraction via mapInPandas
# ---------------------------------------------------------------------------

_KIND_SQL = "(['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]"
_NIBBLE_HIST_SQL = (
    "array_to_string(list_transform(range(1, 17), i -> "
    "CAST(32 - length(replace(md5(text), substr('0123456789abcdef', i, 1), '')) AS VARCHAR)"
    "), ',')"
)


@register(
    "q23_multimodal_features",
    f"""
    SELECT doc_id AS media_id,
           {_KIND_SQL} AS kind,
           {_NIBBLE_HIST_SQL} AS feature
    FROM documents
    """,
)
def q23_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media, decoder="fake")


# ---------------------------------------------------------------------------
# q24 — tumbling window aggregation (streaming-equivalent batch check)
# ---------------------------------------------------------------------------

@register(
    "q24_tumbling_windows",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q24_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_window_counts(load_table(spark, sf_dir, "events"), "1 hour")


# ---------------------------------------------------------------------------
# q25 — sliding windows (1h window every 30min: each event in 2 windows)
# ---------------------------------------------------------------------------

@register(
    "q25_sliding_windows",
    """
    WITH w AS (
        -- each event belongs to the two 1h windows sliding every 30min:
        -- starts floor30(ts) and floor30(ts) - 30min (epoch-aligned)
        SELECT ts, event_type,
               unnest([
                 make_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 * 1000000),
                 make_timestamp((CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - 1800) * 1000000)
               ]) AS ws
        FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n
    FROM w
    GROUP BY 1, 2
    """,
)
def q25_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_window_counts(load_table(spark, sf_dir, "events"), "1 hour", "30 minutes")


# ---------------------------------------------------------------------------
# q26 — session windows (gap-based sessionization; streaming-equivalent)
# ---------------------------------------------------------------------------

@register(
    "q26_session_windows",
    """
    WITH o AS (
        SELECT user_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events
    ),
    m AS (
        SELECT *, CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS new_s
        FROM o
    ),
    s AS (
        SELECT *, sum(new_s) OVER (
            PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        FROM m
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM s
    GROUP BY user_id, sid
    """,
)
def q26_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_windows(load_table(spark, sf_dir, "events"), "30 minutes")


# ---------------------------------------------------------------------------
# q27 — JSON property extraction (F14 json surface)
# ---------------------------------------------------------------------------

@register(
    "q27_json_props",
    """
    SELECT event_type,
           sum(CAST(json_extract_string(props, '$.k') AS INT)) AS sum_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q27_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# q32 — per-label embedding centroids: posexplode -> (label, dim) partial
# aggregation. The classic distributed centroid shape — map-side partial
# sums per (label, dim), one shuffle keyed (label, dim); no driver-side
# vector math at any scale. Values cast to double before averaging so
# both engines accumulate at the same precision.
# ---------------------------------------------------------------------------

@register(
    "q32_embedding_centroids",
    """
    SELECT label,
           CAST(pos AS INT) AS dim,
           round(avg(val), 6) AS centroid,
           count(*) AS n
    FROM (
        SELECT label,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS val,
               unnest(range(0, len(embedding))) AS pos
        FROM embeddings
    )
    GROUP BY label, pos
    """,
)
def q32_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        .groupBy("label", F.col("pos").cast("int").alias("dim"))
        .agg(F.round(F.avg("col"), 6).alias("centroid"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# q33 — curation funnel: per language, how many documents survive each
# quality gate (min tokens, quality score, both). One pass, one shuffle:
# conditional sums over the staged per-doc features.
# ---------------------------------------------------------------------------

_MIN_TOKENS = 20
_MIN_QUALITY = 0.5


@register(
    "q33_curation_funnel",
    f"""
    WITH scored AS (
        SELECT lang,
               {TX.token_count_sql('text')} AS n_tokens,
               {TX.quality_score_sql('text')} AS quality
        FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           sum(CASE WHEN n_tokens >= {_MIN_TOKENS} THEN 1 ELSE 0 END) AS pass_length,
           sum(CASE WHEN quality >= {_MIN_QUALITY} THEN 1 ELSE 0 END) AS pass_quality,
           sum(CASE WHEN n_tokens >= {_MIN_TOKENS} AND quality >= {_MIN_QUALITY}
                    THEN 1 ELSE 0 END) AS pass_both
    FROM scored
    GROUP BY lang
    """,
)
def q33_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.quality_score(F.col("text")).alias("quality"),
    )
    ok_len = (F.col("n_tokens") >= _MIN_TOKENS).cast("long")
    ok_q = (F.col("quality") >= _MIN_QUALITY).cast("long")
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(ok_len).alias("pass_length"),
        F.sum(ok_q).alias("pass_quality"),
        F.sum(ok_len * ok_q).alias("pass_both"),
    )
