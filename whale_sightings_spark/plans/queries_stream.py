"""Registered queries: streaming-equivalent window aggregations (batch
semantics of window()/session_window() are identical to the streaming
versions — the oracle checks the shared transformation), multimodal
feature extraction, and JSON property extraction (F14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whale_sightings_spark.functions import text as TX
from whale_sightings_spark.operators.multimodal import (
    attach_fake_media,
    attach_text_media,
    extract_features,
)
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
# q114 — multimodal REAL decode path: payloads are the documents' own
# UTF-8 bytes and decoder="utf8" genuinely decodes them (bytes -> str
# in the Arrow-batched mapInPandas contract every codec decoder
# inherits). The oracle recomputes every feature from the source text —
# including the md5 of the re-encoded string, which pins the
# bytes -> str -> bytes round trip, not just a length count.
# ---------------------------------------------------------------------------


@register(
    "q114_media_utf8_decode",
    """
    SELECT doc_id AS media_id,
           'text' AS kind,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(length(text) AS INT) AS n_chars,
           octet_length(encode(text)) = length(text) AS is_ascii,
           md5(text) AS text_md5
    FROM documents
    """,
)
def q114_media_utf8_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_text_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media, decoder="utf8")


# ---------------------------------------------------------------------------
# q130 — REAL byte-level frame extraction (operators/multimodal.
# slice_frames): payloads demuxed into fixed-stride 64-byte frames,
# every 2nd frame emitted via native binary substring — no UDF, zero
# shuffles. Frame identity is pinned by md5 over the frame's hex
# rendering (DuckDB lacks blob substring, so the oracle slices the hex
# string — 2 hex chars per byte — and hashes the identical rendering).
# ---------------------------------------------------------------------------

_FRAME_B = 64
_FRAME_EVERY = 2


@register(
    "q130_frame_slices",
    f"""
    WITH m AS (
        SELECT doc_id AS media_id, hex(encode(text)) AS ph
        FROM documents WHERE octet_length(encode(text)) > 0
    ),
    f AS (
        SELECT media_id, ph,
               unnest(range(0,
                   CAST(ceil(len(ph) / 2.0 / {_FRAME_B}) AS BIGINT),
                   {_FRAME_EVERY})) AS fi
        FROM m
    )
    SELECT media_id,
           CAST(fi AS INT) AS frame_idx,
           CAST(len(substr(ph, CAST(fi * {2 * _FRAME_B} + 1 AS BIGINT),
                           {2 * _FRAME_B})) / 2 AS INT) AS n_frame_bytes,
           md5(substr(ph, CAST(fi * {2 * _FRAME_B} + 1 AS BIGINT),
                      {2 * _FRAME_B})) AS frame_md5
    FROM f
    """,
)
def q130_frame_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whale_sightings_spark.operators.multimodal import slice_frames

    media = attach_text_media(load_table(spark, sf_dir, "documents"))
    return slice_frames(media, frame_bytes=_FRAME_B, every_k=_FRAME_EVERY).select(
        "media_id", "frame_idx", "n_frame_bytes", "frame_md5"
    )


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
           -- BIGINT cast: DuckDB's sum(INT) widens to HUGEINT, which its
           -- driver renders as a float; Spark's sum(int) is BIGINT.
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
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
           -- BIGINT casts: DuckDB widens sum(INT) to HUGEINT (rendered as
           -- float); Spark's conditional sums are BIGINT.
           CAST(sum(CASE WHEN n_tokens >= {_MIN_TOKENS} THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_length,
           CAST(sum(CASE WHEN quality >= {_MIN_QUALITY} THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_quality,
           CAST(sum(CASE WHEN n_tokens >= {_MIN_TOKENS} AND quality >= {_MIN_QUALITY}
                    THEN 1 ELSE 0 END) AS BIGINT) AS pass_both
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


# ---------------------------------------------------------------------------
# q34 — interval (range) join: purchases within 1 hour after a click by
# the same user. Equi-key on user_id (one shuffle) + time-range
# residual — the canonical event-correlation shape; the streaming twin
# (streaming/events.streaming_interval_join) adds watermarks to bound
# state.
# ---------------------------------------------------------------------------

_TS_FMT_US = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "q34_interval_join",
    f"""
    SELECT l.event_id AS click_id, r.event_id AS purchase_id, l.user_id,
           strftime(l.ts, '{_TS_FMT_US}') AS click_ts,
           strftime(r.ts, '{_TS_FMT_US}') AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
    """,
)
def q34_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    l = events.filter(F.col("event_type") == "click").alias("l")
    r = events.filter(F.col("event_type") == "purchase").alias("r")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        l.join(
            r,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            F.col("l.event_id").alias("click_id"),
            F.col("r.event_id").alias("purchase_id"),
            F.col("l.user_id").alias("user_id"),
            F.date_format("l.ts", fmt).alias("click_ts"),
            F.date_format("r.ts", fmt).alias("purchase_ts"),
        )
    )


# ---------------------------------------------------------------------------
# q35 — as-of join (operators/asof): each purchase matched to the most
# recent prior-or-same click of the same user. Union + running-last:
# one shuffle on user_id; the oracle is DuckDB's native ASOF JOIN.
# Clicks are pre-aggregated to one row per (user, ts) — ties would be
# ambiguous in any engine.
# ---------------------------------------------------------------------------

@register(
    "q35_asof_join",
    f"""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           strftime(p.ts, '{_TS_FMT_US}') AS purchase_ts,
           coalesce(c.click_id, -1) AS click_id_asof,
           coalesce(strftime(c.ts, '{_TS_FMT_US}'), '') AS click_ts_asof
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def q35_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whale_sightings_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts", F.date_format("ts", fmt))
    )
    joined = asof_join(
        purchases, clicks, on="user_id", ts_col="ts",
        right_cols=["click_id", "click_ts"],
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.date_format("ts", fmt).alias("purchase_ts"),
        F.coalesce(F.col("click_id_asof"), F.lit(-1)).alias("click_id_asof"),
        F.coalesce(F.col("click_ts_asof"), F.lit("")).alias("click_ts_asof"),
    )


# ---------------------------------------------------------------------------
# q152 — NEAREST-match as-of join (operators/asof.asof_join_nearest,
# pandas merge_asof(direction='nearest')): each purchase matched to
# the click whose timestamp is closest in EITHER direction; exact
# equidistance resolves backward (explicit contract). Oracle: two
# DuckDB ASOF joins (<= and >=) combined by a row-local distance CASE.
# Same single-shuffle union shape as q35 — two window frames over one
# sort order.
# ---------------------------------------------------------------------------

@register(
    "q152_asof_nearest",
    f"""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    b AS (
        SELECT p.event_id AS purchase_id, p.user_id, p.ts AS pts,
               c.ts AS bts, c.click_id AS bid
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    ),
    f AS (
        SELECT p.event_id AS purchase_id, c.ts AS fts, c.click_id AS fid
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND c.ts >= p.ts
    )
    SELECT b.purchase_id, b.user_id,
           strftime(b.pts, '{_TS_FMT_US}') AS purchase_ts,
           coalesce(CASE
               WHEN bts IS NULL AND fts IS NULL THEN NULL
               WHEN fts IS NULL THEN bid
               WHEN bts IS NULL THEN fid
               WHEN date_diff('microseconds', bts, pts)
                    <= date_diff('microseconds', pts, fts) THEN bid
               ELSE fid END, -1) AS click_id_near,
           coalesce(CASE
               WHEN bts IS NULL AND fts IS NULL THEN NULL
               WHEN fts IS NULL THEN strftime(bts, '{_TS_FMT_US}')
               WHEN bts IS NULL THEN strftime(fts, '{_TS_FMT_US}')
               WHEN date_diff('microseconds', bts, pts)
                    <= date_diff('microseconds', pts, fts)
                 THEN strftime(bts, '{_TS_FMT_US}')
               ELSE strftime(fts, '{_TS_FMT_US}') END, '') AS click_ts_near
    FROM b JOIN f USING (purchase_id)
    """,
)
def q152_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whale_sightings_spark.operators.asof import asof_join_nearest

    events = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts", F.date_format("ts", fmt))
    )
    joined = asof_join_nearest(
        purchases, clicks, on="user_id", ts_col="ts",
        right_cols=["click_id", "click_ts"],
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.date_format("ts", fmt).alias("purchase_ts"),
        F.coalesce(F.col("click_id_near"), F.lit(-1)).alias("click_id_near"),
        F.coalesce(F.col("click_ts_near"), F.lit("")).alias("click_ts_near"),
    )


# ---------------------------------------------------------------------------
# q202 — REAL audio codec round trip, oracle-checked: per document a
# genuine RIFF/WAVE PCM payload is SYNTHESIZED (real 44-byte header +
# struct-packed 16-bit LE samples derived from doc_id), then DECODED
# by the pure-Python RIFF chunk walker (operators/multimodal.parse_wav
# — the narrow real codec that replaced the r6 stub). The oracle never
# sees bytes: it recomputes every decoded stat closed-form from the
# same modular-arithmetic samples — encode -> container bytes ->
# decode must land exactly on the closed form, which pins header
# layout, sample packing, normalization, and stats in one check.
# Sample geometry keeps all sums exact in double (see
# multimodal.WAV_SYNTH_N), so rms/peak are bit-identical across
# engines before rounding. Row-local end to end; Arrow-batched both
# ways; zero shuffles before the final projection.
# ---------------------------------------------------------------------------

from whale_sightings_spark.operators.multimodal import (  # noqa: E402
    WAV_SYNTH_A,
    WAV_SYNTH_B,
    WAV_SYNTH_N,
    WAV_SYNTH_RATE,
    attach_wav_media,
    extract_wav_features,
)


@register(
    "q202_wav_decode_audit",
    f"""
    WITH s AS (
        SELECT doc_id,
               (((doc_id * {WAV_SYNTH_A} + j.j * {WAV_SYNTH_B}) % 65536)
                - 32768) / 32768.0 AS x
        FROM documents,
             LATERAL (SELECT unnest(range(0, {WAV_SYNTH_N})) AS j) j
    )
    SELECT doc_id AS media_id,
           'audio' AS kind,
           true AS ok,
           CAST({WAV_SYNTH_RATE} AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(16 AS INT) AS bits,
           CAST({WAV_SYNTH_N} AS BIGINT) AS n_samples,
           1000.0 * {WAV_SYNTH_N} / {WAV_SYNTH_RATE} AS duration_ms,
           round(sqrt(avg(x * x)), 6) AS rms,
           round(max(abs(x)), 6) AS peak
    FROM s
    GROUP BY doc_id
    """,
)
def q202_wav_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_wav_media(load_table(spark, sf_dir, "documents"))
    return extract_wav_features(media).select(
        "media_id",
        "kind",
        "ok",
        "sample_rate",
        "n_channels",
        "bits",
        "n_samples",
        "duration_ms",
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
    )


# ---------------------------------------------------------------------------
# q204 — REAL image codec round trip + transform, oracle-checked: per
# document a genuine binary PGM (P5) payload is synthesized (real
# header + row-major pixels from doc_id), DECODED by the pure-Python
# header-walking parser, nearest-neighbor RESIZED to 8x6, and
# featurized — the decode -> transform -> stats chain an image
# pipeline runs, on actual container bytes. The oracle recomputes the
# resized frame closed-form: NN at a 2x integer scale picks pixel
# (2r, 2c), so checksum/mean are exact integer sums both engines
# agree on bit-for-bit. Companion to q202's audio path; row-local,
# Arrow-batched, zero shuffles.
# ---------------------------------------------------------------------------

from whale_sightings_spark.operators.multimodal import (  # noqa: E402
    PGM_SYNTH_A,
    PGM_SYNTH_B,
    PGM_SYNTH_C,
    PGM_SYNTH_H,
    PGM_SYNTH_W,
    attach_pgm_media,
    resize_pgm_features,
)

_PGM_DST_W = PGM_SYNTH_W // 2
_PGM_DST_H = PGM_SYNTH_H // 2


@register(
    "q204_pgm_resize_audit",
    f"""
    WITH px AS (
        SELECT doc_id,
               ((doc_id * {PGM_SYNTH_A} + (2 * r.r) * {PGM_SYNTH_B}
                 + (2 * c.c) * {PGM_SYNTH_C}) % 256) AS p
        FROM documents,
             LATERAL (SELECT unnest(range(0, {_PGM_DST_H})) AS r) r,
             LATERAL (SELECT unnest(range(0, {_PGM_DST_W})) AS c) c
    )
    SELECT doc_id AS media_id,
           'image' AS kind,
           true AS ok,
           CAST({PGM_SYNTH_W} AS INT) AS src_w,
           CAST({PGM_SYNTH_H} AS INT) AS src_h,
           CAST({_PGM_DST_W} AS INT) AS dst_w,
           CAST({_PGM_DST_H} AS INT) AS dst_h,
           CAST(sum(p) AS BIGINT) AS checksum,
           CAST(sum(p) AS DOUBLE) / {_PGM_DST_W * _PGM_DST_H} AS mean_px
    FROM px
    GROUP BY doc_id
    """,
)
def q204_pgm_resize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_pgm_media(load_table(spark, sf_dir, "documents"))
    return resize_pgm_features(media, _PGM_DST_W, _PGM_DST_H)
