"""Text/web corpus operators, family 2 (net-new training-data surface
beyond the q20-q22/q48-q51 curation set):

- q69 URL parsing + per-domain aggregation (web-corpus provenance audit)
- q70 blocked fuzzy join (edit-distance near-match with prefix blocking)
- q74 token co-occurrence PMI over a bounded vocabulary

Scale notes inline; the dedup-family guard conventions (bounded
dictionaries, blocking keys, caps mirrored in the oracle) apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from whale_sightings_spark.functions import text as TX
from whale_sightings_spark.plans.queries import register
from whale_sightings_spark.schemas import load_table


# ---------------------------------------------------------------------------
# q69 — URL parsing + domain aggregation: the provenance audit every web
# corpus needs (which hosts contributed how many documents). URLs are
# derived deterministically from the documents table (no URL column in
# the testdata), parsed with Spark's native parse_url — JVM-side, no
# UDF — and aggregated per host. Row-local parse + one small-group
# shuffle; at 100 TB the group count is the number of distinct hosts.
# ---------------------------------------------------------------------------

@register(
    "q69_url_domains",
    """
    WITH urls AS (
        SELECT 'https://' || source || '.example.com/docs/' || doc_id
                 || '?ref=' || lang AS url,
               lang
        FROM documents
    )
    SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           min(regexp_extract(url, 'https://[^/]+(/[^?]*)', 1)) AS first_path
    FROM urls
    GROUP BY 1
    """,
)
def q69_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id"),
            F.lit("?ref="),
            F.col("lang"),
        ).alias("url"),
        "lang",
    )
    return (
        urls.select(
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            "lang",
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("path").alias("first_path"),
        )
    )


# ---------------------------------------------------------------------------
# q70 — blocked fuzzy join: edit-distance near-matching made scalable by
# prefix blocking. All-pairs Levenshtein is quadratic and unrunnable at
# corpus scale; blocking on (lang, first 8 chars) turns it into an
# equi-join whose pair space is sum of block^2 — linear when blocks are
# bounded. Hot blocks above MAX_BLOCK rows are dropped on BOTH sides
# (mirrored in the oracle), the same guard contract as the dedup
# family's MAX_BAND_BUCKET. The distance probe runs on a fixed 40-char
# prefix so per-pair cost is O(40^2) regardless of document length.
# ---------------------------------------------------------------------------

_MAX_BLOCK = 200
_FUZZY_MAX_DIST = 20


@register(
    "q70_fuzzy_blocked_join",
    f"""
    WITH d AS (
        SELECT doc_id, lang,
               substr(text, 1, 8) AS pfx,
               substr(text, 1, 40) AS probe
        FROM documents
    ),
    sized AS (
        SELECT *, count(*) OVER (PARTITION BY lang, pfx) AS block_n FROM d
    ),
    kept AS (
        SELECT * FROM sized WHERE block_n <= {_MAX_BLOCK}
    )
    SELECT a.doc_id AS doc_a,
           b.doc_id AS doc_b,
           levenshtein(a.probe, b.probe) AS dist
    FROM kept a JOIN kept b
      ON a.lang = b.lang AND a.pfx = b.pfx AND a.doc_id < b.doc_id
    WHERE levenshtein(a.probe, b.probe) <= {_FUZZY_MAX_DIST}
    """,
)
def q70_fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.substring("text", 1, 8).alias("pfx"),
        F.substring("text", 1, 40).alias("probe"),
    )
    sized = d.withColumn("block_n", F.count("*").over(W.partitionBy("lang", "pfx")))
    kept = sized.filter(F.col("block_n") <= _MAX_BLOCK)
    a = kept.alias("a")
    b = kept.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.pfx") == F.col("b.pfx"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    dist = F.levenshtein(F.col("a.probe"), F.col("b.probe"))
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        dist.alias("dist"),
    ).filter(F.col("dist") <= _FUZZY_MAX_DIST)


# ---------------------------------------------------------------------------
# q74 — pointwise mutual information over token co-occurrence, the
# classic collocation / embedding-prep statistic. The pair space is
# bounded by restricting to the top-VOCAB_K tokens by document
# frequency (deterministic tie-break), so the within-doc self-join
# expands at most VOCAB_K^2/2 pairs per document regardless of corpus
# size. Doc count N is a broadcast single-row aggregate (no driver
# count()). Three bounded shuffles: doc-frequency agg, pair-count agg,
# top-k window over the pair table.
# ---------------------------------------------------------------------------

_VOCAB_K = 50
_TOP_PAIRS = 25


@register(
    "q74_pmi_pairs",
    f"""
    WITH dt AS (
        SELECT DISTINCT doc_id, unnest({TX.tokens_sql("text")}) AS tok
        FROM documents
        WHERE trim(text) <> ''
    ),
    df AS (
        SELECT tok, count(*) AS n_docs FROM dt GROUP BY tok
    ),
    vocab AS (
        SELECT tok, n_docs FROM df
        ORDER BY n_docs DESC, tok LIMIT {_VOCAB_K}
    ),
    vt AS (
        SELECT dt.doc_id, dt.tok, v.n_docs
        FROM dt JOIN vocab v ON dt.tok = v.tok
    ),
    pairs AS (
        SELECT a.tok AS t1, b.tok AS t2,
               count(*) AS n_ab,
               max(a.n_docs) AS n_a,
               max(b.n_docs) AS n_b
        FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY a.tok, b.tok
    ),
    total AS (SELECT count(DISTINCT doc_id) AS n FROM dt)
    SELECT t1, t2, n_ab,
           round(ln(CAST(n_ab * total.n AS DOUBLE) / (n_a * n_b)), 6) AS pmi
    FROM pairs CROSS JOIN total
    ORDER BY n_ab DESC, t1, t2 LIMIT {_TOP_PAIRS}
    """,
)
def q74_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dt = (
        docs.filter(F.trim("text") != "")
        .select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
        .distinct()
    )
    df = dt.groupBy("tok").agg(F.count("*").alias("n_docs"))
    vocab = df.orderBy(F.col("n_docs").desc(), "tok").limit(_VOCAB_K)
    vt = dt.join(F.broadcast(vocab), "tok").select("doc_id", "tok", "n_docs")
    a = vt.alias("a")
    b = vt.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(F.col("a.tok").alias("t1"), F.col("b.tok").alias("t2"))
        .agg(
            F.count("*").alias("n_ab"),
            F.max("a.n_docs").alias("n_a"),
            F.max("b.n_docs").alias("n_b"),
        )
    )
    total = dt.agg(F.countDistinct("doc_id").alias("n"))
    return (
        pairs.crossJoin(F.broadcast(total))
        .select(
            "t1",
            "t2",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") * F.col("n")).cast("double")
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("n_ab").desc(), "t1", "t2")
        .limit(_TOP_PAIRS)
    )


# ---------------------------------------------------------------------------
# q103 — BM25 full-text ranking: top-k documents for a bounded query
# term set. The retrieval scorer behind every lexical search / RAG
# recall stage. Plan shape: explode -> filter to the (tiny, broadcast-
# literal) query terms BEFORE any aggregation, so the tf table is
# bounded by |docs matching| x |terms|, never the token stream; df and
# the N/avgdl scalars are broadcast single-digit-row aggregates; the
# per-doc score sum is one keyed shuffle; top-k via TakeOrdered.
# k1=1.2, b=0.75 (the standard Robertson parameters); idf is the
# Lucene-style ln(1 + (N - df + 0.5)/(df + 0.5)) which is always
# positive.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("join", "vector", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 15


@register(
    "q103_bm25_search",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({TX.tokens_sql('text')}) AS tok FROM documents
    ),
    dl AS (
        SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id
    ),
    stats AS (
        SELECT count(*) AS n_docs, avg(len) AS avgdl FROM dl
    ),
    tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM toks
        WHERE tok IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
        GROUP BY doc_id, tok
    ),
    df AS (
        SELECT tok, count(*) AS df FROM tf GROUP BY tok
    ),
    scored AS (
        SELECT tf.doc_id,
               sum(
                   ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * ({_BM25_K1} + 1)
                   / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                        + {_BM25_B} * dl.len / stats.avgdl))
               ) AS score
        FROM tf
        JOIN df ON df.tok = tf.tok
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {_BM25_TOP}
    """,
)
def q103_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("len"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("len").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_score",
            F.log(
                1
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * F.col("tf")
            * (_BM25_K1 + 1)
            / (
                F.col("tf")
                + _BM25_K1
                * (1 - _BM25_B + _BM25_B * F.col("len") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(_BM25_TOP)
    )
