"""Registered queries: incremental / re-aggregatable corpus operations
and graph analytics over the near-dup pair graph (q94-q112).

The round-3 family: operations a continuously-ingesting training-data
pipeline runs *between* full rebuilds — merging new data against
existing state without rescanning history, and producing deterministic
derived artifacts (samples, LM tables, neighbor maps) that are stable
across retries and engines.

- **q94 mergeable HLL rollup**: per-group DataSketches HLL sketches
  re-aggregated to a grand total with ``hll_union_agg`` — the proof
  that distinct-count rollups can be maintained incrementally (merge
  yesterday's sketches with today's partials) instead of rescanning
  100 TB. Like q56, the estimate is pinned to a 5% contract *inside
  the oracle-checked result*.
- **q95 incremental dedup**: a new batch deduped against the
  historical fingerprint index with an anti-join — the O(batch) shape
  (history is never rescanned, only probed) every daily-ingest dedup
  needs. Within-batch keep-min survivor first, then the history probe.
- **q96 kNN self-join**: every vector's nearest neighbor within its
  IVF cell — the all-corpus variant of q18's query-set probe. Cell
  equi-join bounds the pair space to sum(cell^2); both shuffles hash
  real keys (cell, then vec_id).
- **q97 bigram LM table**: conditional bigram probabilities
  P(w2 | w1) — the n-gram language-model statistic used for perplexity
  filtering. Adjacency via posexplode + element_at (row-local), counts
  via one keyed agg, denominators via a w1-partitioned window.
- **q98 time-bucket dedup**: keep-first dedup within 5-minute buckets
  per (user, event_type) — the batch twin of streaming
  ``dropDuplicatesWithinWatermark`` (streaming/events.py), expressed so
  the bucket key is engine-portable (no epoch/timezone arithmetic).
- **q99 stratified top-k sample**: k deterministic docs per language
  ordered by the cross-engine hash60 — reproducible eval-set carving
  (same rows on rerun, retry, or engine swap; the q49/q90 property).
- **q100-q112** (below): convergence-mode components, as-of
  tolerance, weighted sampling, PageRank (fixed-round q106 and
  convergence-mode q112), degree-oriented triangle census, curation
  capstone, budget allocation, cluster cohesion, group mode.

No reference counterpart (the reference rebuilds from scratch per
run, `whalefinder/cleaner.py` operates on full snapshots); net-new
scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from whale_sightings_spark.functions.hashing import hash60, hash60_sql
from whale_sightings_spark.functions import text as TX
from whale_sightings_spark.operators import dedup as DD
from whale_sightings_spark.operators import drift as DR
from whale_sightings_spark.operators import graphs as GR
from whale_sightings_spark.operators.similarity import (
    _dot,
    _norm,
    cosine,
    cosine_sql,
)
from whale_sightings_spark.plans.queries import register
from whale_sightings_spark.schemas import load_table

# ---------------------------------------------------------------------------
# q94 — mergeable distinct-count rollup via DataSketches HLL.
# Per-year sketches of o_custkey re-aggregate to the grand total by
# sketch union — the algebraic-merge property that makes incremental /
# hierarchical distinct counts affordable (q73's partial-merge story,
# but for the non-algebraic COUNT DISTINCT). Estimates are pinned to a
# 5% contract beside the exact counts (q56 pattern): the oracle emits
# literal TRUE, so sketch drift past the contract fails the hash gate.
# One fact shuffle for the group agg; the union runs over |groups| rows.
# ---------------------------------------------------------------------------

@register(
    "q94_hll_rollup",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           count(DISTINCT o_custkey) AS n_exact,
           TRUE AS approx_ok
    FROM orders
    GROUP BY 1
    UNION ALL
    SELECT -1 AS yr, count(DISTINCT o_custkey) AS n_exact, TRUE AS approx_ok
    FROM orders
    """,
)
def q94_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"), "o_custkey"
    )
    per = o.groupBy("yr").agg(
        F.count_distinct("o_custkey").alias("n_exact"),
        F.hll_sketch_agg("o_custkey").alias("sk"),
    )
    per_rows = per.select(
        "yr",
        "n_exact",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("approx_ok"),
    )
    # grand total by sketch UNION (no rescan of the fact table for the
    # estimate); the exact total is recomputed only to verify the merge
    merged = per.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.hll_sketch_estimate("sk").alias("est")
    )
    exact_total = o.agg(F.count_distinct("o_custkey").alias("n_exact"))
    total_row = exact_total.crossJoin(F.broadcast(merged)).select(
        F.lit(-1).alias("yr"),
        "n_exact",
        (F.abs(F.col("est") - F.col("n_exact")) <= 0.05 * F.col("n_exact")).alias(
            "approx_ok"
        ),
    )
    return per_rows.unionByName(total_row)


# ---------------------------------------------------------------------------
# q95 — incremental dedup: new batch (doc_id >= 400) against the
# historical fingerprint index (doc_id < 400). Within-batch keep-min
# survivor, then LEFT ANTI probe of history — history is probed, never
# rescanned or rewritten. At 100 TB the history index is a bucketed
# fingerprint table, making the anti-join exchange-free on the history
# side; a small daily batch side broadcasts instead.
# ---------------------------------------------------------------------------

@register(
    "q95_incremental_dedup",
    """
    WITH f AS (
        SELECT doc_id, md5(lower(text)) AS fingerprint FROM documents
    ),
    hist AS (SELECT DISTINCT fingerprint FROM f WHERE doc_id < 400),
    batch AS (SELECT doc_id, fingerprint FROM f WHERE doc_id >= 400),
    keep AS (
        SELECT fingerprint, min(doc_id) AS doc_id FROM batch GROUP BY fingerprint
    )
    SELECT k.doc_id, k.fingerprint
    FROM keep k
    WHERE NOT EXISTS (
        SELECT 1 FROM hist h WHERE h.fingerprint = k.fingerprint
    )
    """,
)
def q95_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "doc_id",
        F.md5(F.encode(F.lower(F.col("text")), "UTF-8")).alias("fingerprint"),
    )
    hist = f.filter(F.col("doc_id") < 400).select("fingerprint").distinct()
    batch = f.filter(F.col("doc_id") >= 400)
    keep = batch.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    return keep.join(hist, "fingerprint", "left_anti").select("doc_id", "fingerprint")


# ---------------------------------------------------------------------------
# q96 — kNN SELF-join: nearest neighbor for EVERY vector, restricted to
# its IVF cell (label = coarse quantizer, as in q18). The all-corpus
# sibling of q18's bounded query set: pair space is sum over cells of
# |cell|^2 — linear in corpus size when cells are balanced (a trained
# quantizer's job). Cells larger than _KNN_MAX_CELL are dropped before
# pair expansion — the same quadratic hot-bucket guard as the LSH
# paths (operators/similarity.MAX_SIG_BUCKET, dedup.MAX_BAND_BUCKET),
# mirrored in the oracle so the cap is part of the operator contract
# (a degenerate quantizer cell would otherwise expand quadratically;
# the production response is re-training / sub-splitting the cell, and
# the cap makes the failure explicit instead of a hung stage). Shuffle
# 1 hashes the cell key for the equi-join (the cell-size guard
# broadcasts); shuffle 2 hashes vec_id for the per-vector top-1 window
# (only candidate pairs cross the wire, never raw vectors twice).
# ---------------------------------------------------------------------------

#: cells larger than this are excluded from the q96 self-join pair
#: expansion (quadratic guard; mirrored in the DuckDB oracle)
_KNN_MAX_CELL = 1000

@register(
    "q96_knn_self_join",
    f"""
    WITH ok AS (
        SELECT label AS cell FROM embeddings
        GROUP BY label
        HAVING count(*) > 1 AND count(*) <= {_KNN_MAX_CELL}
    ),
    pairs AS (
        SELECT a.vec_id AS vec_id,
               a.label AS cell,
               b.vec_id AS neighbor_id,
               round({cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos
        FROM embeddings a
        JOIN ok ON ok.cell = a.label
        JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY cos DESC, neighbor_id
        ) AS rn
        FROM pairs
    )
    SELECT vec_id, cell, neighbor_id, cos FROM ranked WHERE rn = 1
    """,
)
def q96_knn_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ok = (
        emb.groupBy(F.col("label").alias("cell"))
        .agg(F.count("*").alias("cn"))
        .filter((F.col("cn") > 1) & (F.col("cn") <= _KNN_MAX_CELL))
        .select("cell")
    )
    a = emb.select(
        F.col("vec_id"), F.col("label").alias("cell"), F.col("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("vb"),
    )
    pairs = (
        a.join(F.broadcast(ok), "cell")
        .join(b, "cell")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell", "neighbor_id", "cos")
    )


# ---------------------------------------------------------------------------
# q97 — bigram language-model table: P(w2 | w1) with counts. Adjacent
# pairs come from posexplode + element_at(i+2) — row-local, no
# self-join on position. One keyed agg for pair counts; denominators
# (count of w1 as a bigram head) via a w1-partitioned window over the
# already-aggregated pair table (group-cardinality-sized, not row-
# sized). Top-25 by TakeOrdered — never a global single-partition
# window. The n-gram LM feeds perplexity-based quality filtering.
# ---------------------------------------------------------------------------

_BIGRAM_TOP = 25


@register(
    "q97_bigram_condprob",
    f"""
    WITH toks AS (
        SELECT doc_id, {TX.tokens_sql('text')} AS w FROM documents
    ),
    e AS (
        SELECT w[i] AS w1, w[i + 1] AS w2
        FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
    ),
    pc AS (
        SELECT w1, w2, count(*) AS pair_n
        FROM e
        WHERE w1 <> '' AND w2 <> ''
        GROUP BY w1, w2
    ),
    tot AS (
        SELECT w1, w2, pair_n,
               sum(pair_n) OVER (PARTITION BY w1) AS first_n
        FROM pc
    )
    SELECT w1, w2,
           CAST(pair_n AS BIGINT) AS pair_n,
           CAST(first_n AS BIGINT) AS first_n,
           round(pair_n * 1.0 / first_n, 6) AS p
    FROM tot
    ORDER BY pair_n DESC, w1, w2
    LIMIT {_BIGRAM_TOP}
    """,
)
def q97_bigram_condprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 8: the LM table serves from the persisted n-gram store —
    # no tokenize pass in this DAG (plans/lm_store.py)
    from whale_sightings_spark.operators import ngram_lm as LM
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    tot = LM.stored_pairs(spark, lm_artifact_dir(spark, sf_dir))
    return (
        tot.select(
            "w1",
            "w2",
            "pair_n",
            "first_n",
            F.round(F.col("pair_n") * 1.0 / F.col("first_n"), 6).alias("p"),
        )
        .orderBy(F.desc("pair_n"), "w1", "w2")
        .limit(_BIGRAM_TOP)
    )


# ---------------------------------------------------------------------------
# q98 — time-bucket dedup: keep-first per (user, event_type, 5-minute
# bucket) — the batch twin of streaming dropDuplicatesWithinWatermark
# (streaming/events.py). The bucket key is built from calendar parts
# (date_format + minute/5), identical in both engines with no
# epoch/timezone arithmetic on the NTZ timestamps. One shuffle,
# partitioned by the dedup key.
# ---------------------------------------------------------------------------

_TS_FMT_US = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "q98_time_bucket_dedup",
    f"""
    WITH b AS (
        SELECT event_id, user_id, event_type, ts,
               strftime(ts, '%Y-%m-%d %H') || ':'
                 || CAST(CAST(floor(minute(ts) / 5) AS INT) AS VARCHAR) AS bucket
        FROM events
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type, bucket
            ORDER BY ts, event_id
        ) AS rn
        FROM b
    )
    SELECT event_id, user_id, event_type, bucket,
           strftime(ts, '{_TS_FMT_US}') AS ts
    FROM r WHERE rn = 1
    """,
)
def q98_time_bucket_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.withColumn(
        "bucket",
        F.concat(
            F.date_format("ts", "yyyy-MM-dd HH"),
            F.lit(":"),
            F.floor(F.minute("ts") / 5).cast("int").cast("string"),
        ),
    )
    w = W.partitionBy("user_id", "event_type", "bucket").orderBy("ts", "event_id")
    return (
        b.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            "bucket",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        )
    )


# ---------------------------------------------------------------------------
# q99 — deterministic stratified top-k sample: k docs per language in
# hash60 order — reproducible eval-set carving. The order key is a pure
# function of doc_id (q49/q90 property): reruns, retries, and both
# oracle engines pick identical rows. Window partitions by lang (a real
# key); WindowGroupLimit keeps only k rows per group ahead of the final
# exchange.
# ---------------------------------------------------------------------------

_STRATA_K = 3


@register(
    "q99_stratified_topk_sample",
    f"""
    WITH h AS (
        SELECT lang, doc_id,
               {hash60_sql("'sample:' || CAST(doc_id AS VARCHAR)")} AS hkey
        FROM documents
    ),
    r AS (
        SELECT lang, doc_id, hkey, CAST(row_number() OVER (
            PARTITION BY lang ORDER BY hkey, doc_id
        ) AS INT) AS rank
        FROM h
    )
    SELECT lang, rank, doc_id, hkey FROM r WHERE rank <= {_STRATA_K}
    """,
)
def q99_stratified_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "lang",
        "doc_id",
        hash60(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))).alias(
            "hkey"
        ),
    )
    w = W.partitionBy("lang").orderBy("hkey", "doc_id")
    return (
        h.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _STRATA_K)
        .select("lang", "rank", "doc_id", "hkey")
    )


# ---------------------------------------------------------------------------
# q100 — connected components run to CONVERGENCE: the fixpoint sibling
# of q29's fixed-k contract (k-hop leaves diameter > k components
# split). Driver-side loop with an early stop: each round is the same
# one-join+one-min-agg over the persisted edge set, plus one scalar
# probe — labels only ever decrease, so an unchanged sum(label)
# (decimal-summed, overflow-proof) IS the fixpoint;
# localCheckpoint truncates lineage per round
# (operators/dedup.dedup_components_converged). The oracle is DuckDB's
# WITH RECURSIVE transitive closure — true components, no round count
# in the contract at all.
# ---------------------------------------------------------------------------

def _components_converged_sql(pairs_sql: str) -> str:
    from whale_sightings_spark.plans.queries_llm import _converged_labels_ctes

    return (
        _converged_labels_ctes(pairs_sql)
        + """
    SELECT label AS component, count(*) AS n_docs, min(doc_id) AS rep
    FROM labels
    GROUP BY 1
    """
    )


def _simhash_pairs_sql() -> str:
    from whale_sightings_spark.plans.queries_llm import _SIMHASH_PAIRS_SQL

    return _SIMHASH_PAIRS_SQL


@register(
    "q100_components_converged",
    _components_converged_sql(_simhash_pairs_sql()),
)
def q100_components_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 8: q100 is now the BUILD sign-off of the persisted cluster
    # artifact (the q176/q229 convention) — build-if-absent, then the
    # rollup reads the STORED labels back (training is deterministic,
    # so the stored table equals a fresh convergence run).
    from whale_sightings_spark.plans.cluster_store import text_cluster_dir

    labels = DD.stored_cluster_labels(
        spark, text_cluster_dir(spark, sf_dir)
    )
    return labels.groupBy(F.col("label").alias("component")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("rep")
    )


# ---------------------------------------------------------------------------
# q101 — as-of join with a staleness tolerance: q35's match, but a
# click older than 30 minutes before the purchase no longer counts
# (pandas merge_asof(tolerance=...) semantics). The tolerance is a
# row-local predicate on the carried match's timestamp — the plan keeps
# the as-of union's single shuffle. Oracle: DuckDB ASOF LEFT JOIN with
# the same staleness CASE applied after the match.
# ---------------------------------------------------------------------------

_ASOF_TOL = "30 minutes"
_TOL_FMT_US = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "q101_asof_tolerance",
    f"""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    m AS (
        SELECT p.event_id AS purchase_id, p.user_id, p.ts AS pts,
               c.ts AS cts, c.click_id
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    SELECT purchase_id, user_id,
           strftime(pts, '{_TOL_FMT_US}') AS purchase_ts,
           coalesce(CASE WHEN cts >= pts - INTERVAL '{_ASOF_TOL}'
                         THEN click_id END, -1) AS click_id_asof,
           coalesce(CASE WHEN cts >= pts - INTERVAL '{_ASOF_TOL}'
                         THEN strftime(cts, '{_TOL_FMT_US}') END, '') AS click_ts_asof
    FROM m
    """,
)
def q101_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        tolerance=_ASOF_TOL,
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.date_format("ts", fmt).alias("purchase_ts"),
        F.coalesce(F.col("click_id_asof"), F.lit(-1)).alias("click_id_asof"),
        F.coalesce(F.col("click_ts_asof"), F.lit("")).alias("click_ts_asof"),
    )


# ---------------------------------------------------------------------------
# q102 — deterministic WEIGHTED sampling (Efraimidis-Spirakis
# exponential keys): each doc gets key = -ln(u)/w with u a pure hash of
# doc_id and w = n_chars; the k smallest keys are a weighted sample
# without replacement. No RNG state — reruns, retries, and both engines
# draw the same sample (the q49/q99 determinism property, but
# size-biased). Keys are rounded to 10dp before ordering so a 1-ulp
# ln() difference between engines can't flip the order; ties break by
# doc_id. Top-k via TakeOrdered — row-local key, no window at all.
# ---------------------------------------------------------------------------

_WSAMPLE_K = 20
_TWO60 = 1 << 60


@register(
    "q102_weighted_sample",
    f"""
    WITH keyed AS (
        SELECT doc_id, lang, n_chars,
               round(-ln(({hash60_sql("'wsample:' || CAST(doc_id AS VARCHAR)")} + 1)
                         / {_TWO60}.0) / n_chars, 10) AS skey
        FROM documents
    )
    SELECT doc_id, lang, n_chars, round(skey, 6) AS skey
    FROM keyed
    ORDER BY skey, doc_id
    LIMIT {_WSAMPLE_K}
    """,
)
def q102_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = (
        hash60(F.concat(F.lit("wsample:"), F.col("doc_id").cast("string"))) + 1
    ) / F.lit(float(_TWO60))
    keyed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(-F.log(u) / F.col("n_chars"), 10).alias("skey"),
    )
    return (
        keyed.orderBy("skey", "doc_id")
        .limit(_WSAMPLE_K)
        .select("doc_id", "lang", "n_chars", F.round("skey", 6).alias("skey"))
    )


# ---------------------------------------------------------------------------
# q106 — PageRank, 3 unrolled iterations (damping 0.85) over the
# undirected near-dup pair graph: centrality = which documents sit in
# the middle of a duplication cluster (useful for picking cluster
# representatives by connectivity rather than min-id). Fixed iteration
# count keeps the plan static and the oracle expressible as chained
# CTEs (q112 below is the convergence-mode sibling). Per iteration:
# one join edges⋈ranks (hash on src) + one dst-keyed agg — the edge
# set never grows, ranks are node-sized. The undirected graph has no
# dangling nodes, so no redistribution term is needed. The pair
# generator materializes ONCE (eager localCheckpoint in
# operators.graphs.symmetric_edges) before edges branch into degrees
# and the iteration — round 3's 5x cold-start multiplier came from
# branching a lazily-persisted edge set.
# ---------------------------------------------------------------------------

_PR_ITERS = 3


def _pagerank_cte_chain(
    pairs_sql: str, iters: int, damp: float, prefix: str = ""
) -> str:
    """Unrolled-PageRank CTE chain (no leading WITH) ending in
    ``{prefix}pr{iters}(v, pr)`` — prefixed (the `_simhash_pairs_sql_p`
    convention) so the rebuild-drift oracle can run the history and
    full chains in one statement, and the serve twins can splice the
    labels chain beside it without CTE-name collisions."""
    body = pairs_sql.strip()
    assert body.upper().startswith("WITH")
    head, final = body[4:].rsplit("SELECT", 1)
    p = prefix
    out = f"""{head}, {p}pairs AS (SELECT {final}),
    {p}edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM {p}pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM {p}pairs
    ),
    {p}nodes AS (SELECT DISTINCT src AS v FROM {p}edges),
    {p}nn AS (SELECT count(*) AS n FROM {p}nodes),
    {p}deg AS (SELECT src AS v, count(*) AS d FROM {p}edges GROUP BY src),
    {p}pr0 AS (SELECT v, 1.0 / {p}nn.n AS pr FROM {p}nodes, {p}nn)
    """
    for k in range(1, iters + 1):
        out += f"""
    , {p}pr{k} AS (
        SELECT e.dst AS v,
               {1 - damp} / any_value(nn.n) + {damp} * sum(p.pr / deg.d) AS pr
        FROM {p}edges e
        JOIN {p}pr{k-1} p ON p.v = e.src
        JOIN {p}deg deg ON deg.v = e.src
        CROSS JOIN {p}nn nn
        GROUP BY e.dst
    )"""
    return out


def _pagerank_sql(pairs_sql: str, iters: int, damp: float) -> str:
    return (
        "\n    WITH "
        + _pagerank_cte_chain(pairs_sql, iters, damp)
        + f"""
    SELECT v AS doc_id, round(pr, 6) AS pagerank FROM pr{iters}
    """
    )


@register(
    "q106_pagerank",
    _pagerank_sql(_simhash_pairs_sql(), _PR_ITERS, GR.DAMPING),
)
def q106_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 9: edges served from the persisted cluster artifact's pair
    # table (build is deterministic — row-equal to the inline derive)
    from whale_sightings_spark.plans.cluster_store import stored_text_pairs

    pairs = stored_text_pairs(spark, sf_dir)
    pr = GR.pagerank_fixed(pairs, _PR_ITERS, GR.DAMPING)
    return pr.select(F.col("v").alias("doc_id"), F.round("pr", 6).alias("pagerank"))


# ---------------------------------------------------------------------------
# q112 — convergence-mode PageRank: run to an L1 fixpoint instead of a
# fixed round count (the q100 pattern applied to q106 — scalar delta
# probe per round, localCheckpoint lineage truncation). Damping 0.5
# (operators.graphs.DAMPING_FAST) bounds the round count: the L1 error
# contracts by d per round, so tol=1e-10 converges in ~34 rounds and
# the oracle unrolls to a FIXED 40 rounds. Error budget for the hash
# gate: |converged - round40| <= tol/(1-d) + d^40/(1-d) ~ 2.2e-10,
# four orders below the 5dp output rounding, so both engines round
# identically except with negligible boundary probability.
# ---------------------------------------------------------------------------


def _pagerank_converged_sql(pairs_sql: str) -> str:
    import re

    base = _pagerank_sql(pairs_sql, GR.PR_ORACLE_ROUNDS, GR.DAMPING_FAST)
    base = base.replace(
        f"SELECT v AS doc_id, round(pr, 6) AS pagerank FROM pr{GR.PR_ORACLE_ROUNDS}",
        f"SELECT v AS doc_id, round(pr, 5) AS pagerank FROM pr{GR.PR_ORACLE_ROUNDS}",
    )
    # DuckDB's default CTE inlining replays the whole upstream chain
    # per reference — super-linear past ~10 unrolled rounds (188 s at
    # 15 rounds vs 0.3 s materialized at 40). Forcing materialization
    # makes each round one aggregation over the cached edge set, which
    # is also exactly what the Spark side does.
    return re.sub(r"AS \(", "AS MATERIALIZED (", base)


@register(
    "q112_pagerank_converged",
    _pagerank_converged_sql(_simhash_pairs_sql()),
)
def q112_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 10: q112 is the BUILD sign-off of the persisted pagerank
    # derived table (the q100/q176 convention) — build-if-absent runs
    # `GR.pagerank_converged` over the stored pairs exactly once per
    # corpus fingerprint, then the query reads the STORED scores back
    # (convergence is deterministic, so stored == a fresh run).
    from whale_sightings_spark.plans.cluster_store import stored_pagerank

    pr = stored_pagerank(spark, sf_dir)
    return pr.select(F.col("v").alias("doc_id"), F.round("pr", 5).alias("pagerank"))


# ---------------------------------------------------------------------------
# q107 — triangle census of the near-dup graph: triangles measure how
# clique-like duplication clusters are (chains vs boilerplate blobs).
# Edges are oriented LOW-degree -> HIGH-degree (ties by id,
# operators.graphs.orient_by_degree) before the two-join edge-iterator:
# wedge a->b->c closed by a->c. Any acyclic orientation counts each
# triangle exactly once, so the census is orientation-invariant — the
# oracle keeps the simpler id-orientation (doc_a < doc_b as generated)
# — but degree orientation bounds every node's wedge fan-out by
# O(sqrt(m)), where id-orientation lets a low-id hub fan out by its
# full degree (the 100 TB failure mode).
# ---------------------------------------------------------------------------

def _triangles_sql(pairs_sql: str) -> str:
    body = pairs_sql.strip()
    head, final = body[4:].rsplit("SELECT", 1)
    return f"""
    WITH {head}, pairs AS (SELECT {final}),
    e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
    tri AS (
        SELECT e1.a, e1.b, e2.b AS c
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT (SELECT count(DISTINCT a) FROM (
                SELECT a FROM e UNION ALL SELECT b FROM e)) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges,
           (SELECT count(*) FROM tri) AS n_triangles
    """


@register(
    "q107_triangles",
    _triangles_sql(_simhash_pairs_sql()),
)
def q107_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 10: BUILD sign-off of the persisted census derived table
    # (the q112/q194 convention) — the wedge-closure joins run once
    # per corpus fingerprint; the query reads the stored row back.
    from whale_sightings_spark.plans.cluster_store import (
        stored_triangle_census,
    )

    return stored_triangle_census(spark, sf_dir)


# ---------------------------------------------------------------------------
# q108 — the curation pipeline CAPSTONE: quality filter + exact dedup +
# near-dup representative selection composed into ONE oracle-checked
# plan, reporting the per-language survivor funnel. The three screens
# are evaluated independently over the corpus (a deliberate contract —
# it keeps every stage deterministic and engine-portable; a sequenced
# variant only changes which doc represents a cluster, not the set
# structure):
#   quality   — non-empty text and >= 5 tokens
#   exact     — doc is the min-id holder of its md5 fingerprint
#   near-dup  — doc is outside the SimHash pair graph, or is the min-id
#               representative of its propagated label (q29's fixed-k
#               rounds, identical in the oracle)
# Everything reuses the registered building blocks: one corpus scan
# feeds row-local screens, the dedup joins are the q13/q29 shapes, and
# the output is language-cardinality-sized.
# ---------------------------------------------------------------------------

def _curation_pipeline_sql() -> str:
    from whale_sightings_spark.plans.queries_llm import (
        _SIMHASH_PAIRS_SQL,
        _converged_labels_ctes,
    )

    out = _converged_labels_ctes(_SIMHASH_PAIRS_SQL)
    out += """
    , reps AS (
        SELECT label, min(doc_id) AS rep FROM labels GROUP BY label
    ),
    near_keep AS (
        SELECT labels.doc_id FROM labels JOIN reps ON reps.label = labels.label
        WHERE labels.doc_id = reps.rep
    ),
    screened AS (
        SELECT d.doc_id, d.lang,
               (trim(d.text) <> ''
                AND len(regexp_split_to_array(trim(d.text), ' +')) >= 5)
                   AS q_ok,
               d.doc_id = min(d.doc_id) OVER (
                   PARTITION BY md5(lower(d.text))) AS e_ok,
               (lbl.doc_id IS NULL OR nk.doc_id IS NOT NULL) AS n_ok
        FROM documents d
        LEFT JOIN labels lbl ON lbl.doc_id = d.doc_id
        LEFT JOIN near_keep nk ON nk.doc_id = d.doc_id
    )
    SELECT lang,
           count(*) AS n_in,
           CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN q_ok AND e_ok THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact,
           CAST(sum(CASE WHEN q_ok AND e_ok AND n_ok THEN 1 ELSE 0 END)
               AS BIGINT) AS n_survivors
    FROM screened
    GROUP BY lang
    """
    return out


@register("q108_curation_pipeline", _curation_pipeline_sql())
def q108_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 8: near-dup stage served from the persisted cluster labels
    from whale_sightings_spark.plans.cluster_store import text_cluster_dir

    docs = load_table(spark, sf_dir, "documents")
    labels = DD.stored_cluster_labels(spark, text_cluster_dir(spark, sf_dir))
    reps = labels.groupBy("label").agg(F.min("doc_id").alias("rep"))
    near_keep = (
        labels.join(reps, "label")
        .filter(F.col("doc_id") == F.col("rep"))
        .select("doc_id")
        .withColumn("nk", F.lit(True))
    )
    in_graph = labels.select("doc_id").withColumn("ig", F.lit(True))
    screened = (
        docs.select(
            "doc_id",
            "lang",
            (
                (F.trim("text") != "")
                & (F.size(TX.tokens(F.col("text"))) >= 5)
            ).alias("q_ok"),
            (
                F.col("doc_id")
                == F.min("doc_id").over(
                    W.partitionBy(F.md5(F.encode(F.lower(F.col("text")), "UTF-8")))
                )
            ).alias("e_ok"),
        )
        .join(in_graph, "doc_id", "left")
        .join(near_keep, "doc_id", "left")
        .withColumn("n_ok", F.col("ig").isNull() | F.col("nk").isNotNull())
    )
    return screened.groupBy("lang").agg(
        F.count("*").alias("n_in"),
        F.sum(F.when(F.col("q_ok"), 1).otherwise(0)).alias("n_quality"),
        F.sum(F.when(F.col("q_ok") & F.col("e_ok"), 1).otherwise(0)).alias(
            "n_exact"
        ),
        F.sum(
            F.when(F.col("q_ok") & F.col("e_ok") & F.col("n_ok"), 1).otherwise(0)
        ).alias("n_survivors"),
    )


# ---------------------------------------------------------------------------
# q109 — exact token-budget allocation across sources: distribute a
# fixed training-token budget proportionally to temperature-flattened
# source sizes (w = tokens^0.7, the q59 mixing family) using the
# LARGEST-REMAINDER method so the integer allocations sum to the
# budget EXACTLY — the deterministic arithmetic every "fill a 1B-token
# mixture" export needs (plain rounding over- or under-shoots).
# Everything after the per-source token aggregate runs on a
# source-cardinality-sized table: one fact shuffle total. Fractional
# parts are rounded to 9dp before ranking and the shares to 6dp before
# floor so a 1-ulp pow/sum difference between engines cannot flip an
# allocation.
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 100_000
_BUDGET_TEMP = 0.7


def _alloc_sql(tc_cte: str) -> str:
    """Largest-remainder allocation oracle over a (source, n_tokens)
    CTE — shared by q109 (raw counts) and q147 (survivor counts)."""
    return f"""
    WITH tc AS ({tc_cte}),
    w AS (
        SELECT source, n_tokens,
               pow(n_tokens, {_BUDGET_TEMP}) AS wt,
               sum(pow(n_tokens, {_BUDGET_TEMP})) OVER () AS wsum
        FROM tc
    ),
    shares AS (
        SELECT source, n_tokens,
               round({_BUDGET_TOKENS} * wt / wsum, 6) AS share
        FROM w
    ),
    parts AS (
        SELECT source, n_tokens,
               CAST(floor(share) AS BIGINT) AS base,
               round(share - floor(share), 9) AS frac
        FROM shares
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (ORDER BY frac DESC, source) AS rk,
               {_BUDGET_TOKENS} - sum(base) OVER () AS leftover
        FROM parts
    )
    SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
           base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc_tokens
    FROM ranked
    """


def _largest_remainder_alloc(tc: DataFrame) -> DataFrame:
    """Exact largest-remainder split of _BUDGET_TOKENS over a
    (source, n_tokens) table. Everything operates on the
    source-cardinality table; the two global sums are broadcast
    single-row aggregates (the q36 pattern) and the one global ranking
    window is bounded by |sources| — the q07 post-distinct dictionary
    class, allow-listed in the plan sweep.

    The input lineage (a corpus-scale scan + aggregation for both
    callers) is referenced four times downstream (w, wsum, parts,
    leftover); the lazy localCheckpoint barrier materializes the
    source-cardinality table once so those references replay a tiny
    local table, not the corpus scan. Lineage ends in a shuffle
    aggregation, so the lazy form is race-safe."""
    tc = tc.localCheckpoint(eager=False)
    wcol = F.pow(F.col("n_tokens").cast("double"), _BUDGET_TEMP)
    w = tc.select("source", "n_tokens", wcol.alias("wt"))
    wsum = w.agg(F.sum("wt").alias("wsum"))
    parts = (
        w.crossJoin(F.broadcast(wsum))
        .select(
            "source",
            "n_tokens",
            F.round(_BUDGET_TOKENS * F.col("wt") / F.col("wsum"), 6).alias("share"),
        )
        .select(
            "source",
            "n_tokens",
            F.floor("share").cast("bigint").alias("base"),
            F.round(F.col("share") - F.floor("share"), 9).alias("frac"),
        )
    )
    leftover = parts.agg(
        (F.lit(_BUDGET_TOKENS) - F.sum("base")).alias("leftover")
    )
    ranked = parts.withColumn(
        "rk", F.row_number().over(W.partitionBy().orderBy(F.desc("frac"), "source"))
    ).crossJoin(F.broadcast(leftover))
    return ranked.select(
        "source",
        "n_tokens",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc_tokens"),
    )


@register(
    "q109_budget_allocation",
    _alloc_sql(
        f"""
        SELECT source, sum({TX.token_count_sql('text')}) AS n_tokens
        FROM documents GROUP BY source
    """
    ),
)
def q109_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tc = docs.groupBy("source").agg(
        F.sum(TX.token_count(F.col("text"))).alias("n_tokens")
    )
    return _largest_remainder_alloc(tc)


# ---------------------------------------------------------------------------
# q110 — embedding cluster-cohesion audit: each vector's cosine to its
# own cell centroid, aggregated per cell — the quality metric that
# decides whether an IVF quantizer (q18/q96's cell structure) is worth
# probing or needs retraining. Centroids are the q32 (label, dim)
# partial-agg shape, folded back to arrays via an ordered collect;
# the centroid table is cell-cardinality-sized and broadcasts onto the
# corpus scan — one fact shuffle (the centroid agg), then row-local
# cosine, then a cell-sized agg.
# ---------------------------------------------------------------------------

@register(
    "q110_cluster_cohesion",
    f"""
    WITH c AS (
        SELECT label, list(avgv ORDER BY dim) AS centroid
        FROM (
            SELECT label, d.i AS dim,
                   avg(CAST(embedding[d.i] AS DOUBLE)) AS avgv
            FROM embeddings,
                 LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) d
            GROUP BY label, d.i
        )
        GROUP BY label
    ),
    s AS (
        SELECT e.label,
               round({cosine_sql('e.embedding', 'c.centroid')}, 6) AS cos
        FROM embeddings e JOIN c ON c.label = e.label
    )
    SELECT label,
           count(*) AS n_vecs,
           round(avg(cos), 4) AS avg_cohesion,
           round(min(cos), 6) AS min_cohesion
    FROM s
    GROUP BY label
    """,
)
def q110_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    )
    cent = ex.groupBy("label", "dim").agg(
        F.avg(F.col("val").cast("double")).alias("avgv")
    )
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "avgv"))),
            lambda s: s.avgv,
        ).alias("centroid")
    )
    s = emb.join(F.broadcast(carr), "label").withColumn(
        "cos", F.round(cosine(F.col("embedding"), F.col("centroid")), 6)
    )
    return s.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg("cos"), 4).alias("avg_cohesion"),
        F.round(F.min("cos"), 6).alias("min_cohesion"),
    )


# ---------------------------------------------------------------------------
# q111 — per-group statistical mode with a deterministic tie-break
# (most frequent value, smallest value wins ties). Built from counts +
# one group-keyed window rather than the engines' mode() aggregates,
# whose tie behavior is implementation-defined — determinism is the
# contract here (both engines MUST return the same row). Two shuffles:
# the (group, value) count and the group-keyed top-1 window
# (WindowGroupLimit passes one row per group).
# ---------------------------------------------------------------------------

@register(
    "q111_group_mode",
    """
    WITH counts AS (
        SELECT l_returnflag AS flag, l_quantity AS qty, count(*) AS n
        FROM lineitem
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY flag ORDER BY n DESC, qty ASC
        ) AS rk
        FROM counts
    )
    SELECT flag, qty AS mode_qty, n AS mode_n
    FROM ranked WHERE rk = 1
    """,
)
def q111_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_quantity").alias("qty")
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("flag").orderBy(F.desc("n"), F.asc("qty"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("flag", F.col("qty").alias("mode_qty"), F.col("n").alias("mode_n"))
    )


# ---------------------------------------------------------------------------
# q113 — per-group weighted sampling: q102's Efraimidis-Spirakis
# exponential keys (key = -ln(u)/w, u a pure hash of doc_id, w =
# n_chars) drawn PER LANGUAGE — the k smallest keys within each stratum
# are a size-biased sample without replacement per group, the carve a
# mixture-balancing pipeline actually wants (q102 samples globally, so
# a dominant language swallows the budget). Same determinism contract
# (pure-hash u, 10dp key rounding, doc_id tie-break) composed with
# q99's scale shape: the window partitions by lang — a real key — and
# WindowGroupLimit caps each stratum to k rows ahead of the final
# exchange, so only |langs| x k rows cross the wire.
# ---------------------------------------------------------------------------

_WSTRATA_K = 4


@register(
    "q113_stratified_weighted_sample",
    f"""
    WITH keyed AS (
        SELECT doc_id, lang, n_chars,
               round(-ln(({hash60_sql("'wsample:' || CAST(doc_id AS VARCHAR)")} + 1)
                         / {_TWO60}.0) / n_chars, 10) AS skey
        FROM documents
    ),
    r AS (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY lang ORDER BY skey, doc_id
        ) AS INT) AS rank
        FROM keyed
    )
    SELECT lang, rank, doc_id, n_chars, round(skey, 6) AS skey
    FROM r WHERE rank <= {_WSTRATA_K}
    """,
)
def q113_stratified_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = (
        hash60(F.concat(F.lit("wsample:"), F.col("doc_id").cast("string"))) + 1
    ) / F.lit(float(_TWO60))
    keyed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(-F.log(u) / F.col("n_chars"), 10).alias("skey"),
    )
    w = W.partitionBy("lang").orderBy("skey", "doc_id")
    return (
        keyed.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _WSTRATA_K)
        .select("lang", "rank", "doc_id", "n_chars", F.round("skey", 6).alias("skey"))
    )


# ---------------------------------------------------------------------------
# q120 — perplexity-based quality filtering: the actual CONSUMER of the
# q97 bigram LM. Each document is scored by the corpus-trained model —
# ppl(d) = exp(-mean ln P(w2|w1)) over the doc's bigrams — and docs in
# the high-perplexity tail are flagged (the filter every LLM corpus
# runs to drop text the in-domain LM finds surprising). Shapes: the LM
# is the q97 pair-count table + w1-partitioned window over the
# AGGREGATED pairs (vocab-sized, never the token stream); the doc
# bigram stream joins the LM on the (w1, w2) key — row-scale,
# high-cardinality, shuffle-parallel — and folds per doc in one keyed
# agg. Every bigram is in-vocabulary by construction (the LM is trained
# on the same corpus), so no smoothing term is needed for the join to
# be total — the inner join is exactly row-preserving.
# ---------------------------------------------------------------------------

_PPL_FLAG_T = 31.0


@register(
    "q120_perplexity_filter",
    f"""
    WITH toks AS (
        SELECT doc_id, {TX.tokens_sql('text')} AS w FROM documents
    ),
    e AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
    ),
    b AS (
        SELECT doc_id, w1, w2 FROM e WHERE w1 <> '' AND w2 <> ''
    ),
    pc AS (
        SELECT w1, w2, count(*) AS pair_n FROM b GROUP BY w1, w2
    ),
    lm AS (
        SELECT w1, w2, pair_n,
               sum(pair_n) OVER (PARTITION BY w1) AS first_n
        FROM pc
    ),
    s AS (
        SELECT b.doc_id,
               count(*) AS n_bigrams,
               sum(ln(lm.pair_n * 1.0 / lm.first_n)) AS lp
        FROM b JOIN lm USING (w1, w2)
        GROUP BY b.doc_id
    )
    SELECT doc_id,
           CAST(n_bigrams AS INT) AS n_bigrams,
           round(exp(-lp / n_bigrams), 4) AS ppl,
           exp(-lp / n_bigrams) > {_PPL_FLAG_T} AS flag_high_ppl
    FROM s
    """,
)
def q120_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 8: served from the persisted n-gram LM store — the scoring
    # stream is the stored per-doc bigram COUNT table (lp folds as
    # n * ln p, count(*) as sum(n)); the LM side is the stored
    # aggregated pair table. No tokenize pass in this DAG.
    from whale_sightings_spark.operators import ngram_lm as LM
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    art = lm_artifact_dir(spark, sf_dir)
    b = LM.stored_doc_big(spark, art).select("doc_id", "w1", "w2", "n")
    lm = LM.stored_pairs(spark, art)
    s = (
        b.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.sum(
                F.col("n") * F.log(F.col("pair_n") * 1.0 / F.col("first_n"))
            ).alias("lp"),
        )
    )
    ppl = F.exp(-F.col("lp") / F.col("n_bigrams"))
    return s.select(
        "doc_id",
        F.col("n_bigrams").cast("int").alias("n_bigrams"),
        F.round(ppl, 4).alias("ppl"),
        (ppl > _PPL_FLAG_T).alias("flag_high_ppl"),
    )


# ---------------------------------------------------------------------------
# q121 — tokenizer vocabulary coverage / OOV rate: per-document
# fraction of tokens outside the top-K corpus vocabulary — the
# pre-tokenizer audit that decides whether a corpus matches a
# tokenizer's training distribution (high OOV = byte-fallback blowup in
# sequence length). The vocabulary is a deterministic top-K by corpus
# frequency (ties by token) — a BOUNDED dictionary by construction —
# and broadcasts onto the token stream; the per-doc fold is one keyed
# agg. Docs whose every token is in-vocab report 0.0, empty docs have
# no tokens and drop out (identical in both engines).
# ---------------------------------------------------------------------------

_OOV_VOCAB_K = 20
_OOV_FLAG_T = 0.4


@register(
    "q121_oov_rate",
    f"""
    WITH t AS (
        SELECT doc_id, unnest({TX.tokens_sql('text')}) AS tok FROM documents
        WHERE trim(text) <> ''
    ),
    f AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
    v AS (SELECT tok FROM f ORDER BY n DESC, tok LIMIT {_OOV_VOCAB_K}),
    s AS (
        SELECT doc_id,
               count(*) AS n_tokens,
               sum(CASE WHEN tok IN (SELECT tok FROM v) THEN 0 ELSE 1 END)
                   AS n_oov
        FROM t GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(n_oov AS INT) AS n_oov,
           round(n_oov * 1.0 / n_tokens, 6) AS oov_frac,
           n_oov * 1.0 / n_tokens > {_OOV_FLAG_T} AS flag_oov
    FROM s
    """,
)
def q121_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 8: served from the persisted n-gram LM store. A non-empty
    # trimmed doc has only non-empty tokens, so the stored tok<>''
    # per-doc counts reproduce the inline stream exactly, and empty
    # docs are absent from both (the oracle's trim(text)<>'' filter).
    from whale_sightings_spark.operators import ngram_lm as LM
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    art = lm_artifact_dir(spark, sf_dir)
    t = LM.stored_doc_uni(spark, art).select("doc_id", "tok", "n")
    f = LM.stored_uni(spark, art)
    v = f.orderBy(F.desc("n"), "tok").limit(_OOV_VOCAB_K).select("tok")
    marked = t.join(
        F.broadcast(v.withColumn("in_vocab", F.lit(1))), "tok", "left"
    )
    s = marked.groupBy("doc_id").agg(
        F.sum("n").alias("n_tokens"),
        F.sum(
            F.when(F.col("in_vocab").isNull(), F.col("n")).otherwise(0)
        ).alias("n_oov"),
    )
    frac = F.col("n_oov") * 1.0 / F.col("n_tokens")
    return s.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("n_oov").cast("int").alias("n_oov"),
        F.round(frac, 6).alias("oov_frac"),
        (frac > _OOV_FLAG_T).alias("flag_oov"),
    )


# ---------------------------------------------------------------------------
# q136 — interpolated-backoff perplexity: q120's bigram LM smoothed
# with the unigram distribution, P(w2|w1) = λ·P_bi + (1−λ)·P_uni —
# the smoothing that lets a perplexity filter score text containing
# bigrams the LM never saw (on an external corpus the raw ML estimate
# is zero and q120's score would be undefined). Shapes are q120's plus
# one vocab-sized unigram table: the (w1,w2)-keyed scoring join and
# the w2-keyed unigram join both ride the token stream's hash family;
# the unigram total is a broadcast single-row agg.
# ---------------------------------------------------------------------------

_INTERP_LAMBDA = 0.7


@register(
    "q136_ppl_interpolated",
    f"""
    WITH toks AS (
        SELECT doc_id, {TX.tokens_sql('text')} AS w FROM documents
    ),
    e AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
    ),
    b AS (
        SELECT doc_id, w1, w2 FROM e WHERE w1 <> '' AND w2 <> ''
    ),
    pc AS (
        SELECT w1, w2, count(*) AS pair_n FROM b GROUP BY w1, w2
    ),
    lm AS (
        SELECT w1, w2, pair_n,
               sum(pair_n) OVER (PARTITION BY w1) AS first_n
        FROM pc
    ),
    un AS (
        SELECT tok, count(*) AS u_n
        FROM (SELECT unnest({TX.tokens_sql('text')}) AS tok FROM documents)
        WHERE tok <> '' GROUP BY tok
    ),
    ut AS (SELECT sum(u_n) AS tot FROM un),
    s AS (
        SELECT b.doc_id,
               count(*) AS n_bigrams,
               sum(ln(CAST({_INTERP_LAMBDA} AS DOUBLE)
                        * (lm.pair_n * 1.0 / lm.first_n)
                      + CAST({1 - _INTERP_LAMBDA} AS DOUBLE)
                        * (un.u_n * 1.0 / ut.tot))) AS lp
        FROM b
        JOIN lm USING (w1, w2)
        JOIN un ON un.tok = b.w2
        CROSS JOIN ut
        GROUP BY b.doc_id
    )
    SELECT doc_id,
           CAST(n_bigrams AS INT) AS n_bigrams,
           round(exp(-lp / n_bigrams), 4) AS ppl_interp
    FROM s
    """,
)
def q136_ppl_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 8: served from the persisted n-gram LM store — stored
    # per-doc bigram counts as the scoring stream (weighted folds),
    # stored pair/unigram tables as the LM sides.
    from whale_sightings_spark.operators import ngram_lm as LM
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    art = lm_artifact_dir(spark, sf_dir)
    b = LM.stored_doc_big(spark, art).select("doc_id", "w1", "w2", "n")
    lm = LM.stored_pairs(spark, art)
    un = LM.stored_uni(spark, art).select("tok", F.col("n").alias("u_n"))
    ut = un.agg(F.sum("u_n").alias("tot"))
    lam = F.lit(_INTERP_LAMBDA).cast("double")
    p = lam * (F.col("pair_n") * F.lit(1.0) / F.col("first_n")) + (
        F.lit(1 - _INTERP_LAMBDA).cast("double")
    ) * (F.col("u_n") * F.lit(1.0) / F.col("tot"))
    s = (
        b.join(lm, ["w1", "w2"])
        .join(un, b["w2"] == un["tok"])
        .crossJoin(F.broadcast(ut))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.sum(F.col("n") * F.log(p)).alias("lp"),
        )
    )
    return s.select(
        "doc_id",
        F.col("n_bigrams").cast("int").alias("n_bigrams"),
        F.round(F.exp(-F.col("lp") / F.col("n_bigrams")), 4).alias("ppl_interp"),
    )


# ---------------------------------------------------------------------------
# q147 — dedup-aware budget allocation: q109's largest-remainder split
# computed over SURVIVOR token counts only (the min-doc_id row of each
# exact-dup fingerprint group) — the correction that stops a source
# full of duplicates from buying budget with tokens that dedup will
# delete anyway. One extra fingerprint agg + survivor semi-join ahead
# of q109's source-cardinality machinery.
# ---------------------------------------------------------------------------


@register(
    "q147_dedup_aware_budget",
    _alloc_sql(
        f"""
        SELECT d.source, sum({TX.token_count_sql('d.text')}) AS n_tokens
        FROM documents d
        JOIN (
            SELECT min(doc_id) AS doc_id
            FROM (SELECT doc_id, {TX.fingerprint_md5_sql('text')} AS fp
                  FROM documents)
            GROUP BY fp
        ) s ON s.doc_id = d.doc_id
        GROUP BY d.source
    """
    ),
)
def q147_dedup_aware_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One corpus pass instead of dedup_exact + semi-join back (which
    # scanned documents twice): fingerprint, source and token count are
    # all computed in a single projection, the survivor row per
    # fingerprint is picked with min_by (doc_id is unique, so the pick
    # is deterministic and identical to the min(doc_id) semi-join), and
    # the survivor token counts roll up per source.
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            TX.fingerprint_md5(F.col("text")).alias("fp"),
            F.col("doc_id"),
            F.struct(
                F.col("source"), TX.token_count(F.col("text")).alias("tok")
            ).alias("row"),
        )
        .groupBy("fp")
        .agg(F.min_by("row", "doc_id").alias("row"))
        .groupBy(F.col("row.source").alias("source"))
        .agg(F.sum("row.tok").alias("n_tokens"))
    )
    return _largest_remainder_alloc(tc)


# ---------------------------------------------------------------------------
# q169 — contrastive-pair mining: the training-pair table an embedding
# model is fine-tuned on — per anchor, one POSITIVE (its most-similar
# in-cell neighbor at cosine >= the q19 near-dup threshold) and up to
# two HARD NEGATIVES (the most-similar neighbors strictly below the
# negative margin — close enough to be informative, dissimilar enough
# to be wrong). q96's capped within-cell self-join supplies the
# candidates (same _KNN_MAX_CELL quadratic guard, mirrored in the
# oracle); positives and negatives are two rank windows over the SAME
# pair table keyed by the corpus-cardinality anchor id. Anchors with no
# qualifying positive contribute nothing (an anchor without a known
# duplicate has no supervised pair).
# ---------------------------------------------------------------------------

_CONTRAST_POS = 0.2   # the q19 near-dup threshold
_CONTRAST_NEG = 0.1   # hard negatives live strictly below this margin
_CONTRAST_NEGS = 2


@register(
    "q169_contrastive_pairs",
    f"""
    WITH ok AS (
        SELECT label AS cell FROM embeddings
        GROUP BY label
        HAVING count(*) > 1 AND count(*) <= {_KNN_MAX_CELL}
    ),
    pairs AS (
        SELECT a.vec_id AS anchor_id,
               b.vec_id AS neighbor_id,
               round({cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos
        FROM embeddings a
        JOIN ok ON ok.cell = a.label
        JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    pos AS (
        SELECT anchor_id, neighbor_id, cos FROM (
            SELECT *, row_number() OVER (
                PARTITION BY anchor_id ORDER BY cos DESC, neighbor_id
            ) AS rn
            FROM pairs WHERE cos >= {_CONTRAST_POS}
        ) WHERE rn = 1
    ),
    neg AS (
        SELECT anchor_id, neighbor_id, cos, rn FROM (
            SELECT *, row_number() OVER (
                PARTITION BY anchor_id ORDER BY cos DESC, neighbor_id
            ) AS rn
            FROM pairs WHERE cos < {_CONTRAST_NEG}
        ) WHERE rn <= {_CONTRAST_NEGS}
    )
    SELECT p.anchor_id, 'pos' AS kind, CAST(1 AS INT) AS rank,
           p.neighbor_id, p.cos
    FROM pos p
    UNION ALL
    SELECT n.anchor_id, 'neg' AS kind, CAST(n.rn AS INT) AS rank,
           n.neighbor_id, n.cos
    FROM neg n JOIN pos p ON p.anchor_id = n.anchor_id
    """,
)
def q169_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ok = (
        emb.groupBy(F.col("label").alias("cell"))
        .agg(F.count("*").alias("cn"))
        .filter((F.col("cn") > 1) & (F.col("cn") <= _KNN_MAX_CELL))
        .select("cell")
    )
    # round 12 (guide §1.2 "the distributed algorithm" + §2.3 "shuffle
    # fewer bytes"): cosine is symmetric, so generate each unordered
    # pair ONCE (id_lo < id_hi) and mirror the scored half-pair table
    # afterwards — half the join output and half the cosine work. Each
    # side pre-computes its own norm (sqrt(dot(v, v)) — the exact
    # subexpression the inline cosine evaluated per PAIR), so the
    # per-pair work drops from three 64-dim folds to one:
    # cos = dot(va, vb) / (na * nb) is the same double arithmetic in
    # the same order, just factored out of the quadratic loop.
    sides = emb.select(
        "vec_id",
        F.col("label").alias("cell"),
        F.col("embedding").alias("v"),
        _norm(F.col("embedding")).alias("nrm"),
    )
    a = sides.select(
        F.col("vec_id").alias("anchor_id"),
        "cell",
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = sides.select(
        F.col("vec_id").alias("neighbor_id"),
        "cell",
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    half = (
        a.join(F.broadcast(ok), "cell")
        .join(b, "cell")
        .filter(F.col("anchor_id") < F.col("neighbor_id"))
        .select(
            "anchor_id",
            "neighbor_id",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos"),
        )
        # the pos and neg windows both consume the pair table —
        # checkpoint so the capped self-join + cosine runs once, not
        # twice (the q191 convention; eager=False r13 — the join
        # shuffle behind it is stage-shared, so the lazy fill races
        # only over the bounded pair table)
        .localCheckpoint(eager=False)
    )
    pairs = half.unionByName(
        half.select(
            F.col("neighbor_id").alias("anchor_id"),
            F.col("anchor_id").alias("neighbor_id"),
            "cos",
        )
    )
    w = W.partitionBy("anchor_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    pos = (
        pairs.filter(F.col("cos") >= _CONTRAST_POS)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    neg = (
        pairs.filter(F.col("cos") < _CONTRAST_NEG)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CONTRAST_NEGS)
    )
    pos_rows = pos.select(
        "anchor_id",
        F.lit("pos").alias("kind"),
        F.lit(1).cast("int").alias("rank"),
        "neighbor_id",
        "cos",
    )
    neg_rows = neg.join(pos.select("anchor_id"), "anchor_id").select(
        "anchor_id",
        F.lit("neg").alias("kind"),
        F.col("rn").cast("int").alias("rank"),
        "neighbor_id",
        "cos",
    )
    return pos_rows.unionByName(neg_rows)


# ---------------------------------------------------------------------------
# q185 — trigram stupid-backoff perplexity on a HELD-OUT split: the
# q120/q136 LM family extended one order, with the backoff cascade a
# production perplexity filter actually exercises (train on 90% of
# docs, score the held-out 10%, so unseen trigrams/bigrams genuinely
# fall back). S(w3|w1w2) = c123/c12 if seen, else α·c23/c2 if the
# bigram is seen, else α²·(c3+1)/(N+V) (add-one floor so OOV tokens
# score finite). Context counts are KenLM-style sums over the n-gram
# tables themselves (c12 = Σ_w3 c123, c2 = Σ_w3 c23) so every branch
# is a keyed window over the LM TABLE, not the corpus. Scale shape:
# the scoring stream joins three vocab-bounded LM tables on their
# n-gram keys (the LM tables shuffle once at build; the held-out
# stream rides the same hash family); per-doc report is one keyed
# agg. The audit columns (n_bo2/n_bo1) price how often the filter is
# trusting backed-off estimates.
# ---------------------------------------------------------------------------

_SB_ALPHA = 0.4
# the held-out split modulus is part of the persisted LM-store format
# (its train tables are materialized under it) — single-source it
from whale_sightings_spark.operators.ngram_lm import HOLD_MOD as _SB_HOLD_MOD


@register(
    "q185_ppl_stupid_backoff",
    f"""
    WITH toks AS (
        SELECT doc_id, {TX.tokens_sql('text')} AS w FROM documents
    ),
    ev AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3
        FROM toks, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
        WHERE w[i] <> '' AND w[i + 1] <> '' AND w[i + 2] <> ''
    ),
    bev AS (
        SELECT doc_id, w[i] AS wa, w[i + 1] AS wb
        FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
        WHERE w[i] <> '' AND w[i + 1] <> ''
    ),
    tri AS (
        SELECT w1, w2, w3, count(*) AS c123,
               sum(count(*)) OVER (PARTITION BY w1, w2) AS c12
        FROM ev WHERE doc_id % {_SB_HOLD_MOD} <> 0
        GROUP BY w1, w2, w3
    ),
    big AS (
        SELECT wa, wb, count(*) AS c23,
               sum(count(*)) OVER (PARTITION BY wa) AS c2
        FROM bev WHERE doc_id % {_SB_HOLD_MOD} <> 0
        GROUP BY wa, wb
    ),
    uni AS (
        SELECT tok, count(*) AS c3
        FROM (SELECT doc_id, unnest({TX.tokens_sql('text')}) AS tok
              FROM documents)
        WHERE tok <> '' AND doc_id % {_SB_HOLD_MOD} <> 0
        GROUP BY tok
    ),
    tot AS (SELECT sum(c3) AS n, count(*) AS v FROM uni),
    scored AS (
        SELECT e.doc_id,
               CASE WHEN t.c123 IS NOT NULL THEN t.c123 * 1.0 / t.c12
                    WHEN b.c23 IS NOT NULL
                        THEN {_SB_ALPHA} * b.c23 / b.c2
                    ELSE {_SB_ALPHA} * {_SB_ALPHA}
                         * (coalesce(u.c3, 0) + 1.0) / (tot.n + tot.v)
               END AS p,
               CASE WHEN t.c123 IS NULL AND b.c23 IS NOT NULL THEN 1
                    ELSE 0 END AS bo2,
               CASE WHEN t.c123 IS NULL AND b.c23 IS NULL THEN 1
                    ELSE 0 END AS bo1
        FROM ev e
        LEFT JOIN tri t ON t.w1 = e.w1 AND t.w2 = e.w2 AND t.w3 = e.w3
        LEFT JOIN big b ON b.wa = e.w2 AND b.wb = e.w3
        LEFT JOIN uni u ON u.tok = e.w3
        CROSS JOIN tot
        WHERE e.doc_id % {_SB_HOLD_MOD} = 0
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(bo2) AS BIGINT) AS n_bo2,
           CAST(sum(bo1) AS BIGINT) AS n_bo1,
           round(exp(-sum(ln(p)) / count(*)), 4) AS ppl_sb
    FROM scored
    GROUP BY doc_id
    """,
)
def q185_ppl_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 8: served from the persisted n-gram LM store. The three
    # train-split LM tables are the stored vocab-bounded aggregates;
    # the held-out scoring stream is the stored per-doc trigram COUNT
    # table (every fold weighted by n). No tokenize pass in this DAG.
    from whale_sightings_spark.operators import ngram_lm as LM
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    art = lm_artifact_dir(spark, sf_dir)
    held = F.col("doc_id") % _SB_HOLD_MOD == 0
    ev_held = LM.stored_doc_tri(spark, art).filter(held).select(
        "doc_id", "w1", "w2", "w3", "n"
    )
    tri = LM.stored_tri_train(spark, art).withColumn(
        "c12", F.sum("c123").over(W.partitionBy("w1", "w2"))
    )
    big = (
        LM.stored_pairs_train(spark, art)
        .select(
            F.col("w1").alias("wa"),
            F.col("w2").alias("wb"),
            F.col("c12").alias("c23"),
        )
        .withColumn("c2", F.sum("c23").over(W.partitionBy("wa")))
    )
    uni = LM.stored_uni_train(spark, art).select(
        "tok", F.col("n").alias("c3")
    )
    tot = uni.agg(F.sum("c3").alias("n_tot"), F.count("*").alias("v"))
    a = F.lit(_SB_ALPHA)
    p = (
        F.when(F.col("c123").isNotNull(), F.col("c123") * F.lit(1.0) / F.col("c12"))
        .when(F.col("c23").isNotNull(), a * F.col("c23") / F.col("c2"))
        .otherwise(
            a * a * (F.coalesce("c3", F.lit(0)) + F.lit(1.0))
            / (F.col("n_tot") + F.col("v"))
        )
    )
    scored = (
        ev_held.join(tri, ["w1", "w2", "w3"], "left")
        .join(
            big,
            (F.col("wa") == F.col("w2")) & (F.col("wb") == F.col("w3")),
            "left",
        )
        .join(uni, F.col("tok") == F.col("w3"), "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.col("n").alias("wt"),
            p.alias("p"),
            (F.col("c123").isNull() & F.col("c23").isNotNull())
            .cast("int")
            .alias("bo2"),
            (F.col("c123").isNull() & F.col("c23").isNull())
            .cast("int")
            .alias("bo1"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("wt").alias("n_trigrams"),
        F.sum(F.col("wt") * F.col("bo2")).cast("long").alias("n_bo2"),
        F.sum(F.col("wt") * F.col("bo1")).cast("long").alias("n_bo1"),
        F.round(
            F.exp(-F.sum(F.col("wt") * F.log("p")) / F.sum("wt")), 4
        ).alias("ppl_sb"),
    )


# ---------------------------------------------------------------------------
# q194 — k-core density profile of the near-dup graph: fixed-round
# peeling (remove degree < 2 among still-alive nodes, 4 rounds) over
# the SimHash pair graph. PageRank (q106) finds central docs and the
# triangle census (q107) counts local density; the k-core profile
# says how much of the graph survives once the leaf fringe peels —
# a deep 2-core is a tangled template family that min-id dedup
# handles badly. Edge set materializes once; per round two alive
# semi-joins + one degree agg; sizes are scalar probes.
# ---------------------------------------------------------------------------


@register(
    "q194_kcore_profile",
    GR.kcore_sql(_simhash_pairs_sql()),
)
def q194_kcore_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 10: BUILD sign-off of the persisted k-core derived table
    # (the q112 convention) — the fixed-round peel runs once per
    # corpus fingerprint; the query reads the stored profile back.
    from whale_sightings_spark.plans.cluster_store import (
        stored_kcore_profile,
    )

    return stored_kcore_profile(spark, sf_dir)


# ---------------------------------------------------------------------------
# q207 — n-gram novelty by ingestion order: for every document, the
# share of its distinct 5-gram shingles that are seen for the FIRST
# time at that document (global first-occurrence = min doc_id over the
# shingle), rolled up per source. This is the freshness/memorization
# readout a training-data pipeline tracks while ingesting: a source
# whose novelty collapses is re-crawling content the corpus already
# has (q170's Heaps law measures vocab growth; this measures n-gram
# growth attributed back to the contributing source). Shape: one
# explode -> distinct (the q14/q15 shingle spine), one unbounded-key
# window for the per-shingle first doc (no self-join needed), one
# per-doc agg, one per-source agg. Integer counts all the way; the
# single division happens once per source row. Docs shorter than 5
# tokens contribute no shingles and are excluded from n_docs.
# ---------------------------------------------------------------------------

def _q207_sql() -> str:
    toks = TX.tokens_sql("text")
    sh = TX.shingles_from_tokens_sql("toks", 5)
    return f"""
    WITH t AS (SELECT doc_id, source, {toks} AS toks FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, source, u.s AS shingle
        FROM t, UNNEST({sh}) AS u(s)
    ),
    fs AS (
        SELECT source, doc_id, shingle,
               min(doc_id) OVER (PARTITION BY shingle) AS first_doc
        FROM sh
    ),
    pd AS (
        SELECT source, doc_id,
               count(*) AS total,
               sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS new
        FROM fs GROUP BY source, doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(total) AS BIGINT) AS n_shingles,
           CAST(sum(new) AS BIGINT) AS n_first_seen,
           round(CAST(sum(new) AS DOUBLE) / CAST(sum(total) AS DOUBLE), 6)
               AS novelty
    FROM pd GROUP BY source
    """


@register("q207_ngram_novelty", _q207_sql())
def q207_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", TX.tokens(F.col("text")).alias("toks")
    )
    sh = t.select(
        "doc_id",
        "source",
        F.explode(TX.shingles_from_tokens(F.col("toks"), 5)).alias("shingle"),
    ).distinct()
    fs = sh.withColumn(
        "first_doc", F.min("doc_id").over(W.partitionBy("shingle"))
    )
    pd = fs.groupBy("source", "doc_id").agg(
        F.count("*").alias("total"),
        F.sum(
            F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
        ).alias("new"),
    )
    return pd.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("total").cast("bigint").alias("n_shingles"),
        F.sum("new").cast("bigint").alias("n_first_seen"),
        F.round(
            F.sum("new").cast("double") / F.sum("total").cast("double"), 6
        ).alias("novelty"),
    )


# ---------------------------------------------------------------------------
# q216 — Kneser-Ney smoothed bigram perplexity on the held-out split:
# the third LM-smoothing family next to q136 (interpolated) and q185
# (stupid backoff), and the one production filters actually prefer —
# absolute discounting with CONTINUATION-count backoff (how many
# distinct contexts a word completes, not how often it occurs).
# P(w2|w1) = (max(c12-D,0) + D*nr(w1)*Pcont(w2)) / c1 when w1 has
# train followers, else Pcont(w2); Pcont(w2) = (nl(w2)+1)/(Nbig+V)
# with an add-one floor (the q185 convention) so unseen words score
# finite. All LM tables are vocab-bounded aggregates of the TRAIN
# bigram table (c1/nr/nl are one-pass marginals); the held-out stream
# joins them on their keys; per-doc report is one keyed agg. ln-sum
# rounded at 4dp (order error ~1e-14 at doc scale, the q185 band).
# ---------------------------------------------------------------------------

_KN_D = 0.75


@register(
    "q216_ppl_kneser_ney",
    f"""
    WITH toks AS (
        SELECT doc_id, {TX.tokens_sql('text')} AS w FROM documents
    ),
    bev AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
        WHERE w[i] <> '' AND w[i + 1] <> ''
    ),
    big AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM bev WHERE doc_id % {_SB_HOLD_MOD} <> 0
        GROUP BY w1, w2
    ),
    marg1 AS (
        SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS nr
        FROM big GROUP BY w1
    ),
    margl AS (
        SELECT w2, CAST(count(*) AS BIGINT) AS nl FROM big GROUP BY w2
    ),
    uni AS (
        SELECT tok FROM (
            SELECT doc_id, unnest({TX.tokens_sql('text')}) AS tok
            FROM documents)
        WHERE tok <> '' AND doc_id % {_SB_HOLD_MOD} <> 0
        GROUP BY tok
    ),
    tot AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM big) AS nbig,
               (SELECT CAST(count(*) AS BIGINT) FROM uni) AS v
    ),
    scored AS (
        SELECT e.doc_id,
               CASE WHEN m1.c1 IS NOT NULL THEN
                   (CASE WHEN b.c12 IS NULL THEN 0.0
                         ELSE greatest(CAST(b.c12 AS DOUBLE) - {_KN_D}, 0.0)
                    END
                    + {_KN_D} * CAST(m1.nr AS DOUBLE)
                      * ((CAST(coalesce(ml.nl, 0) AS DOUBLE) + 1.0)
                         / (CAST(tot.nbig AS DOUBLE)
                            + CAST(tot.v AS DOUBLE))))
                   / CAST(m1.c1 AS DOUBLE)
               ELSE (CAST(coalesce(ml.nl, 0) AS DOUBLE) + 1.0)
                    / (CAST(tot.nbig AS DOUBLE) + CAST(tot.v AS DOUBLE))
               END AS p,
               CASE WHEN m1.c1 IS NULL THEN 1 ELSE 0 END AS bo,
               CASE WHEN m1.c1 IS NOT NULL AND b.c12 IS NULL THEN 1
                    ELSE 0 END AS disc
        FROM bev e
        LEFT JOIN big b ON b.w1 = e.w1 AND b.w2 = e.w2
        LEFT JOIN marg1 m1 ON m1.w1 = e.w1
        LEFT JOIN margl ml ON ml.w2 = e.w2
        CROSS JOIN tot
        WHERE e.doc_id % {_SB_HOLD_MOD} = 0
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(bo) AS BIGINT) AS n_ctx_backoff,
           CAST(sum(disc) AS BIGINT) AS n_unseen_bigram,
           round(exp(-sum(ln(p)) / count(*)), 4) AS ppl_kn
    FROM scored
    GROUP BY doc_id
    """,
)
def q216_ppl_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 8: served from the persisted n-gram LM store. The train
    # bigram table and its KN marginals (c1/nr/nl) come from the
    # stored vocab-bounded aggregate; the held-out scoring stream is
    # the stored per-doc bigram COUNT table (folds weighted by n).
    from whale_sightings_spark.operators import ngram_lm as LM
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    art = lm_artifact_dir(spark, sf_dir)
    held = F.col("doc_id") % _SB_HOLD_MOD == 0
    bev_held = LM.stored_doc_big(spark, art).filter(held).select(
        "doc_id", "w1", "w2", "n"
    )
    big = LM.stored_pairs_train(spark, art)
    marg1 = big.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count("*").cast("bigint").alias("nr"),
    )
    margl = big.groupBy("w2").agg(
        F.count("*").cast("bigint").alias("nl")
    )
    uni = LM.stored_uni_train(spark, art).select("tok")
    tot = big.agg(F.count("*").cast("bigint").alias("nbig")).crossJoin(
        uni.agg(F.count("*").cast("bigint").alias("v"))
    )
    e = (
        bev_held.join(big, ["w1", "w2"], "left")
        .join(marg1, "w1", "left")
        .join(margl, "w2", "left")
        .crossJoin(F.broadcast(tot))
    )
    denom = F.col("nbig").cast("double") + F.col("v").cast("double")
    pcont = (F.coalesce(F.col("nl"), F.lit(0)).cast("double") + 1.0) / denom
    cnum = F.when(F.col("c12").isNull(), 0.0).otherwise(
        F.greatest(F.col("c12").cast("double") - _KN_D, F.lit(0.0))
    )
    p = F.when(
        F.col("c1").isNotNull(),
        (cnum + _KN_D * F.col("nr").cast("double") * pcont)
        / F.col("c1").cast("double"),
    ).otherwise(pcont)
    scored = e.select(
        "doc_id",
        F.col("n").alias("wt"),
        p.alias("p"),
        F.when(F.col("c1").isNull(), 1).otherwise(0).alias("bo"),
        F.when(F.col("c1").isNotNull() & F.col("c12").isNull(), 1)
        .otherwise(0)
        .alias("disc"),
    )
    return scored.groupBy("doc_id").agg(
        F.sum("wt").cast("bigint").alias("n_bigrams"),
        F.sum(F.col("wt") * F.col("bo")).cast("bigint").alias("n_ctx_backoff"),
        F.sum(F.col("wt") * F.col("disc"))
        .cast("bigint")
        .alias("n_unseen_bigram"),
        F.round(
            F.exp(-F.sum(F.col("wt") * F.log("p")) / F.sum("wt")), 4
        ).alias("ppl_kn"),
    )


# ---------------------------------------------------------------------------
# q220 — source-ablation data valuation (leave-one-source-out): what
# the corpus loses if a source is dropped, computed EXACTLY from one
# pass of per-source partials rather than |sources| recomputations —
# token share, the shift in mean document length, and the share of
# distinct 5-gram shingles EXCLUSIVE to the source (vocabulary the
# ablation deletes outright). This is the cheap end of data
# valuation: before influence functions, a pipeline prices sources by
# what they uniquely contribute (q207 prices novelty by ingestion
# order; this prices it by counterfactual removal). Shapes: the
# shingle spine (explode -> distinct -> per-shingle source count) and
# integer corpus totals broadcast from 1-row aggs; every reported
# ratio is a single division of exact integers.
# ---------------------------------------------------------------------------

@register(
    "q220_source_ablation",
    f"""
    WITH t AS (
        SELECT doc_id, source, {TX.token_count_sql('text')} AS ntok
        FROM documents
    ),
    per_src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(ntok) AS BIGINT) AS toks
        FROM t GROUP BY source
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                   CAST(sum(ntok) AS BIGINT) AS nt FROM t),
    tk AS (SELECT doc_id, source, {TX.tokens_sql('text')} AS toks
           FROM documents),
    sh AS (
        SELECT DISTINCT source, u.s AS shingle
        FROM tk, UNNEST({TX.shingles_from_tokens_sql('toks', 5)}) AS u(s)
    ),
    shs AS (
        SELECT shingle, count(*) AS n_sources,
               min(source) AS only_source
        FROM sh GROUP BY shingle
    ),
    excl AS (
        SELECT only_source AS source,
               CAST(count(*) AS BIGINT) AS excl_shingles
        FROM shs WHERE n_sources = 1 GROUP BY only_source
    ),
    shtot AS (SELECT CAST(count(*) AS BIGINT) AS n_shingles FROM shs)
    SELECT p.source, p.n_docs, p.toks,
           round(CAST(p.toks AS DOUBLE) / CAST(tot.nt AS DOUBLE), 6)
               AS token_share,
           round(round(CAST(tot.nt AS DOUBLE)
                       / CAST(tot.nd AS DOUBLE), 6)
                 - round(CAST(tot.nt - p.toks AS DOUBLE)
                         / CAST(tot.nd - p.n_docs AS DOUBLE), 6), 6)
               AS mean_len_shift,
           CAST(coalesce(e.excl_shingles, 0) AS BIGINT) AS excl_shingles,
           round(CAST(coalesce(e.excl_shingles, 0) AS DOUBLE)
                 / CAST(st.n_shingles AS DOUBLE), 6) AS excl_share
    FROM per_src p
    LEFT JOIN excl e ON e.source = p.source
    CROSS JOIN tot CROSS JOIN shtot st
    """,
)
def q220_source_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", TX.token_count(F.col("text")).alias("ntok")
    )
    # source-cardinality; feeds the totals roll-up, the join and the
    # ablation arithmetic — barrier so they replay a tiny local table
    # instead of the corpus token_count scan (race-safe: shuffle agg)
    per_src = (
        t.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("toks"),
        )
        .localCheckpoint(eager=False)
    )
    # corpus totals are the integer roll-up of the per-source sums —
    # exact, and one corpus scan fewer than aggregating t again
    tot = per_src.agg(
        F.sum("n_docs").cast("bigint").alias("nd"),
        F.sum("toks").cast("bigint").alias("nt"),
    )
    tk = docs.select(
        "source", TX.tokens(F.col("text")).alias("toks")
    )
    sh = tk.select(
        "source",
        F.explode(TX.shingles_from_tokens(F.col("toks"), 5)).alias(
            "shingle"
        ),
    ).distinct()
    # shingle-dictionary-scale, referenced by the exclusivity agg AND
    # the global count — each would replay the corpus shingle explode
    # + distinct (race-safe lazy barrier: lineage ends in the agg)
    shs = (
        sh.groupBy("shingle")
        .agg(
            F.count("*").alias("n_sources"),
            F.min("source").alias("only_source"),
        )
        .localCheckpoint(eager=False)
    )
    excl = (
        shs.filter(F.col("n_sources") == 1)
        .groupBy(F.col("only_source").alias("source"))
        .agg(F.count("*").cast("bigint").alias("excl_shingles"))
    )
    shtot = shs.agg(
        F.count("*").cast("bigint").alias("n_shingles")
    )
    j = (
        per_src.join(F.broadcast(excl), "source", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(shtot))
    )
    return j.select(
        "source",
        "n_docs",
        "toks",
        F.round(
            F.col("toks").cast("double") / F.col("nt").cast("double"), 6
        ).alias("token_share"),
        F.round(
            F.round(
                F.col("nt").cast("double") / F.col("nd").cast("double"), 6
            )
            - F.round(
                (F.col("nt") - F.col("toks")).cast("double")
                / (F.col("nd") - F.col("n_docs")).cast("double"),
                6,
            ),
            6,
        ).alias("mean_len_shift"),
        F.coalesce(F.col("excl_shingles"), F.lit(0))
        .cast("bigint")
        .alias("excl_shingles"),
        F.round(
            F.coalesce(F.col("excl_shingles"), F.lit(0)).cast("double")
            / F.col("n_shingles").cast("double"),
            6,
        ).alias("excl_share"),
    )


# ---------------------------------------------------------------------------
# q247 — bigram Zipf coverage curve from the stored LM: for each k in
# a fixed grid, the share of ALL corpus bigram occurrences covered by
# the top-k most frequent bigrams (ties broken by w1, w2). The
# cache-/vocab-sizing audit a pipeline runs before committing a
# tokenizer or LM table budget: a steep curve means a tiny hot set
# serves most of the stream (broadcastable), a flat one means the
# long tail dominates and per-key state must shard. Spark serves from
# the persisted n-gram store (plans/lm_store.py) and computes each
# top-k by distributed TakeOrdered (orderBy + limit — never a
# single-partition global window); the oracle recomputes the pair
# table from text and ranks it.
# ---------------------------------------------------------------------------

_ZIPF_KS = (10, 100, 1000)


def _q247_sql() -> str:
    toks = TX.tokens_sql("text")
    ks = ", ".join(f"({k})" for k in _ZIPF_KS)
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS w FROM documents),
    e AS (
        SELECT w[i] AS w1, w[i + 1] AS w2
        FROM t, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
    ),
    pc AS (
        SELECT w1, w2, count(*) AS pair_n FROM e
        WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2
    ),
    ranked AS (
        SELECT pair_n,
               row_number() OVER (ORDER BY pair_n DESC, w1, w2) AS rn
        FROM pc
    ),
    tot AS (SELECT sum(pair_n) AS t_occ, count(*) AS v FROM pc)
    SELECT k,
           CAST(least(k, tot.v) AS BIGINT) AS n_top_pairs,
           CAST((SELECT sum(pair_n) FROM ranked WHERE rn <= k) AS BIGINT)
               AS top_mass,
           round(CAST((SELECT sum(pair_n) FROM ranked WHERE rn <= k)
                      AS DOUBLE) / tot.t_occ, 6) AS coverage
    FROM (VALUES {ks}) ks(k) CROSS JOIN tot
    ORDER BY k
    """


@register("q247_lm_zipf_coverage", _q247_sql())
def q247_lm_zipf_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whale_sightings_spark.operators import ngram_lm as LM
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    pairs = LM.stored_pairs(spark, lm_artifact_dir(spark, sf_dir)).select(
        "w1", "w2", "pair_n"
    )
    tot = pairs.agg(
        F.sum("pair_n").alias("t_occ"), F.count("*").alias("v")
    )
    per_k = []
    for k in _ZIPF_KS:
        topk = (
            pairs.orderBy(F.desc("pair_n"), "w1", "w2")
            .limit(k)
            .agg(
                F.count("*").alias("n_top"),
                F.sum("pair_n").alias("top_mass"),
            )
            .withColumn("k", F.lit(k))
        )
        per_k.append(topk)
    curve = per_k[0]
    for nxt in per_k[1:]:
        curve = curve.unionByName(nxt)
    return (
        curve.crossJoin(F.broadcast(tot))
        .select(
            "k",
            F.least(F.col("k").cast("bigint"), F.col("v").cast("bigint"))
            .alias("n_top_pairs"),
            F.col("top_mass").cast("bigint").alias("top_mass"),
            F.round(
                F.col("top_mass").cast("double") / F.col("t_occ"), 6
            ).alias("coverage"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# q248 — per-source unigram KL divergence from the corpus: how far
# each source's token distribution sits from the corpus-wide one,
# KL(P_src || P_corpus) in nats. The source-drift audit that catches
# a feed going off-domain (machine text, template spam, language
# shift) BEFORE it moves downstream models — q240 prices train/val
# splits against each other; this prices every source against the
# pooled corpus. No smoothing is needed: every source token is by
# construction in the corpus, so p_corpus > 0 wherever p_src > 0.
# Scale shape: (source, tok) and (tok) aggregates of the STORED
# per-doc unigram counts (vocab-bounded join, never the corpus), one
# source-sized final agg. The oracle recomputes both from text.
# ---------------------------------------------------------------------------


def _q248_sql() -> str:
    toks = TX.tokens_sql("text")
    return f"""
    WITH t AS (
        SELECT source, unnest({toks}) AS tok FROM documents
    ),
    st AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        FROM t WHERE tok <> '' GROUP BY source, tok
    ),
    stot AS (SELECT source, sum(c) AS sn FROM st GROUP BY source),
    ct AS (SELECT tok, sum(c) AS cc FROM st GROUP BY tok),
    ctot AS (SELECT sum(cc) AS cn FROM ct)
    SELECT st.source,
           CAST(stot.sn AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           round(sum((st.c * 1.0 / stot.sn)
                     * ln((st.c * 1.0 / stot.sn)
                          / (ct.cc * 1.0 / ctot.cn))), 6) AS kl_nats
    FROM st
    JOIN stot USING (source)
    JOIN ct USING (tok)
    CROSS JOIN ctot
    GROUP BY st.source, stot.sn
    """


@register("q248_source_unigram_kl", _q248_sql())
def q248_source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whale_sightings_spark.operators import ngram_lm as LM
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    art = lm_artifact_dir(spark, sf_dir)
    st = (
        LM.stored_doc_uni(spark, art)
        .groupBy("source", "tok")
        .agg(F.sum("n").cast("bigint").alias("c"))
    )
    stot = st.groupBy("source").agg(F.sum("c").alias("sn"))
    ct = LM.stored_uni(spark, art).select("tok", F.col("n").alias("cc"))
    ctot = ct.agg(F.sum("cc").alias("cn"))
    ps = F.col("c") * 1.0 / F.col("sn")
    pc = F.col("cc") * 1.0 / F.col("cn")
    return (
        st.join(stot, "source")
        .join(ct, "tok")
        .crossJoin(F.broadcast(ctot))
        .groupBy("source", "sn")
        .agg(
            F.count("*").cast("bigint").alias("n_types"),
            F.round(F.sum(ps * F.log(ps / pc)), 6).alias("kl_nats"),
        )
        .select(
            "source",
            F.col("sn").cast("bigint").alias("n_tokens"),
            "n_types",
            "kl_nats",
        )
    )


# ---------------------------------------------------------------------------
# q249 — signal-agreement audit: does the trained LM agree with the
# heuristic quality score? Per source, the Pearson correlation between
# each document's corpus-LM perplexity (q120's statistic, served from
# the stored n-gram LM) and its row-local heuristic quality score. A
# healthy corpus shows NEGATIVE correlation (surprising text scores
# low on the heuristic too); a source where the signals decouple is
# where exactly one of the two filters is wrong — the first thing a
# curation owner triages. Inputs are pinned identically in both
# engines BEFORE the moments (ppl rounded 4dp — q120's own output
# contract — and quality rounded 6dp), so cross-engine drift is only
# summation order on identical finite values. Scale shape: q120's
# store-served scoring join + one 2-column corpus scan for the
# quality side + a source-sized moment agg.
# ---------------------------------------------------------------------------


def _q249_sql() -> str:
    q = TX.quality_score_sql("d.text")
    return f"""
    WITH toks AS (
        SELECT doc_id, {TX.tokens_sql('text')} AS w FROM documents
    ),
    e AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
    ),
    b AS (SELECT doc_id, w1, w2 FROM e WHERE w1 <> '' AND w2 <> ''),
    pc AS (SELECT w1, w2, count(*) AS pair_n FROM b GROUP BY w1, w2),
    lm AS (
        SELECT w1, w2, pair_n,
               sum(pair_n) OVER (PARTITION BY w1) AS first_n
        FROM pc
    ),
    s AS (
        SELECT b.doc_id,
               round(exp(-sum(ln(lm.pair_n * 1.0 / lm.first_n))
                         / count(*)), 4) AS x
        FROM b JOIN lm USING (w1, w2)
        GROUP BY b.doc_id
    ),
    xy AS (
        SELECT d.source, s.x, {q} AS y
        FROM s JOIN documents d USING (doc_id)
    ),
    m AS (
        SELECT source,
               count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy,
               sum(x * y) AS sxy
        FROM xy GROUP BY source
    )
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <= 0
                THEN NULL
                ELSE round((n * sxy - sx * sy)
                           / sqrt((n * sxx - sx * sx)
                                  * (n * syy - sy * sy)), 6)
           END AS r_ppl_quality
    FROM m
    """


@register("q249_ppl_quality_agreement", _q249_sql())
def q249_ppl_quality_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whale_sightings_spark.operators import ngram_lm as LM
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    art = lm_artifact_dir(spark, sf_dir)
    b = LM.stored_doc_big(spark, art).select("doc_id", "w1", "w2", "n")
    lm = LM.stored_pairs(spark, art)
    s = (
        b.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.round(
                F.exp(
                    -F.sum(
                        F.col("n")
                        * F.log(F.col("pair_n") * 1.0 / F.col("first_n"))
                    )
                    / F.sum("n")
                ),
                4,
            ).alias("x")
        )
    )
    docs = load_table(spark, sf_dir, "documents")
    xy = s.join(
        docs.select(
            "doc_id",
            "source",
            TX.quality_score(F.col("text")).alias("y"),
        ),
        "doc_id",
    )
    m = xy.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.when(varx * vary <= 0, F.lit(None).cast("double"))
        .otherwise(F.round(num / F.sqrt(varx * vary), 6))
        .alias("r_ppl_quality"),
    )


# ---------------------------------------------------------------------------
# q250 — PARTITION-PRUNED eval-set probe of the stored n-gram LM: the
# q244 pattern applied to the sixth artifact. A small eval set's
# bigrams (docs < 5 here) collapse to their ≤N_LM_BUCKETS distinct
# bucket ids (one bounded collect, the BPE-argmax class); the
# contamination probe over the stored per-doc bigram table then
# carries a literal PartitionFilter on those buckets, so at 100 TB it
# reads |eval buckets| / N_LM_BUCKETS of the store at rest. Source
# attribution joins a 2-column pruned documents read (the q184
# convention — never the text column). Both TYPE hits (distinct
# shared bigrams) and OCCURRENCE hits (the stored counts) reported.
# ---------------------------------------------------------------------------


@register(
    "q250_pruned_lm_eval_probe",
    f"""
    WITH toks AS (
        SELECT doc_id, {TX.tokens_sql('text')} AS w FROM documents
    ),
    e AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
    ),
    b AS (
        SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS n
        FROM e WHERE w1 <> '' AND w2 <> ''
        GROUP BY doc_id, w1, w2
    ),
    ev AS (SELECT DISTINCT w1, w2 FROM b WHERE doc_id < 5),
    hits AS (
        SELECT d.source, b.doc_id,
               count(*) AS n_types,
               sum(b.n) AS n_occ
        FROM b
        JOIN ev USING (w1, w2)
        JOIN documents d USING (doc_id)
        WHERE b.doc_id >= 10
        GROUP BY d.source, b.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs_hit,
           CAST(sum(n_types) AS BIGINT) AS n_type_hits,
           CAST(sum(n_occ) AS BIGINT) AS n_occ_hits,
           CAST(max(n_types) AS BIGINT) AS max_types_one_doc
    FROM hits
    GROUP BY source
    """,
)
def q250_pruned_lm_eval_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whale_sightings_spark.operators import ngram_lm as LM
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    art = lm_artifact_dir(spark, sf_dir)
    big = LM.stored_doc_big(spark, art)
    ev = (
        big.filter(F.col("doc_id") < 5)
        .select("w1", "w2", "bucket")
        .distinct()
        .localCheckpoint(eager=False)  # eval-set-bounded; buckets collect fills it
    )
    # bounded collect: the DISTINCT bucket ids the eval set occupies
    # (≤ N_LM_BUCKETS scalars) become a literal IN-filter — the only
    # form a static partition prune can reach the scan in
    buckets = [r["bucket"] for r in ev.select("bucket").distinct().collect()]
    probe = big.filter(
        (F.col("doc_id") >= 10) & F.col("bucket").isin(buckets)
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    hits = (
        probe.join(F.broadcast(ev.select("w1", "w2").distinct()), ["w1", "w2"])
        .join(docs, "doc_id")
        .groupBy("source", "doc_id")
        .agg(
            F.count("*").alias("n_types"),
            F.sum("n").alias("n_occ"),
        )
    )
    return hits.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs_hit"),
        F.sum("n_types").cast("bigint").alias("n_type_hits"),
        F.sum("n_occ").cast("bigint").alias("n_occ_hits"),
        F.max("n_types").cast("bigint").alias("max_types_one_doc"),
    )


# ---------------------------------------------------------------------------
# q256/q257 — graph-analytics SERVE twins (round 10): q112/q194 are
# the oracle-paired BUILD sign-offs of the persisted converged
# pagerank/k-core tables; these two are the dashboard reads that
# consume the stored scores WITHOUT re-running any damping round —
# top-central docs with their component (q256) and the per-component
# centrality rollup (q257). Serving DAG = two store scans + one join
# (+ one component-keyed window for q257); the plan sweep asserts no
# iterative loop and no corpus rescan. The oracles recompute the
# whole chain from first principles — unrolled 40-round PageRank
# (materialized CTEs, the q112 budget: |converged - round40| ~
# 2.2e-10 per node, four orders below the 5dp output rounding) plus
# the recursive-closure labels, so the stored tables are checked
# against ground truth, not against themselves.
# ---------------------------------------------------------------------------


def _mat(chain: str) -> str:
    """Force DuckDB CTE materialization for an unrolled-PageRank chain
    (default inlining replays the upstream chain per reference —
    super-linear past ~10 rounds; see q112's header)."""
    import re

    return re.sub(r"AS \(", "AS MATERIALIZED (", chain)


def _labels_chain_l() -> str:
    from whale_sightings_spark.plans.queries_llm import (
        _converged_labels_chain,
        _simhash_pairs_sql_p,
    )

    return _converged_labels_chain(_simhash_pairs_sql_p("l_"), "l_")


_CENTRAL_K = 20


@register(
    "q256_central_docs_serve",
    "WITH RECURSIVE "
    + _mat(
        _pagerank_cte_chain(
            _simhash_pairs_sql(), GR.PR_ORACLE_ROUNDS, GR.DAMPING_FAST
        )
    )
    + ",\n    "
    + _labels_chain_l()
    + f"""
    SELECT p.v AS doc_id, round(p.pr, 5) AS pagerank,
           coalesce(l.label, p.v) AS component
    FROM pr{GR.PR_ORACLE_ROUNDS} p
    LEFT JOIN l_labels l ON l.doc_id = p.v
    ORDER BY pagerank DESC, doc_id
    LIMIT {_CENTRAL_K}
    """,
)
def q256_central_docs_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whale_sightings_spark.plans.cluster_store import (
        stored_pagerank,
        text_cluster_dir,
    )

    pr = stored_pagerank(spark, sf_dir).select(
        F.col("v").alias("doc_id"), F.round("pr", 5).alias("pagerank")
    )
    labels = DD.stored_cluster_labels(spark, text_cluster_dir(spark, sf_dir))
    return (
        pr.join(labels, "doc_id", "left")
        .select(
            "doc_id",
            "pagerank",
            F.coalesce("label", F.col("doc_id")).alias("component"),
        )
        .orderBy(F.desc("pagerank"), "doc_id")
        .limit(_CENTRAL_K)
    )


@register(
    "q257_component_centrality_serve",
    "WITH RECURSIVE "
    + _mat(
        _pagerank_cte_chain(
            _simhash_pairs_sql(), GR.PR_ORACLE_ROUNDS, GR.DAMPING_FAST
        )
    )
    + ",\n    "
    + _labels_chain_l()
    + f"""
    , scored AS (
        SELECT coalesce(l.label, p.v) AS component, p.v AS doc_id,
               round(p.pr, 5) AS pr5
        FROM pr{GR.PR_ORACLE_ROUNDS} p
        LEFT JOIN l_labels l ON l.doc_id = p.v
    ),
    ranked AS (
        SELECT component, doc_id,
               row_number() OVER (
                   PARTITION BY component ORDER BY pr5 DESC, doc_id
               ) AS rn,
               count(*) OVER (PARTITION BY component) AS n_docs
        FROM scored
    )
    SELECT component, CAST(n_docs AS BIGINT) AS n_docs,
           doc_id AS rep_doc
    FROM ranked WHERE rn = 1
    """,
)
def q257_component_centrality_serve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-component size + most-central representative doc off the
    stored pagerank + labels tables. Integer-safe gate (ADVICE r10):
    a summed-pagerank column would hash-gate on Spark-window-sum vs
    DuckDB-aggregate summation ORDER at a round() boundary, so the
    output carries only (component, n_docs, rep_doc) — the rank key
    stays round(pr, 5), the q256-established safe rounding."""
    from whale_sightings_spark.plans.cluster_store import (
        stored_pagerank,
        text_cluster_dir,
    )

    pr = stored_pagerank(spark, sf_dir)
    labels = DD.stored_cluster_labels(spark, text_cluster_dir(spark, sf_dir))
    scored = (
        pr.select(F.col("v").alias("doc_id"), "pr")
        .join(labels, "doc_id", "left")
        .select(
            F.coalesce("label", F.col("doc_id")).alias("component"),
            "doc_id",
            F.round("pr", 5).alias("pr5"),
        )
    )
    w = W.partitionBy("component")
    ranked = scored.select(
        "component",
        "doc_id",
        F.row_number()
        .over(w.orderBy(F.desc("pr5"), "doc_id"))
        .alias("rn"),
        F.count("*").over(w).alias("n_docs"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "component",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("doc_id").alias("rep_doc"),
    )


# ---------------------------------------------------------------------------
# q258 — pagerank rebuild-drift audit (the q243/q251 pattern applied
# to the derived pagerank table): recompute PageRank from first
# principles over the 80% history slice (doc_id % 5 != 4 — the
# recompute IS the audit, so the re-derivation is the query's
# subject), then compare node coverage and top-K central-doc overlap
# against the STORED full-graph scores restricted to the held slice.
# Set arithmetic on ids only — integer outputs, no float boundary in
# the hash gate. A collapsing overlap means banding/cap interactions
# make centrality unstable under re-ingest and the artifact needs a
# rebuild cadence review.
#
# Round 11: the history recompute starts from the STORED per-doc
# signatures filtered to the slice instead of re-tokenizing the
# corpus — per-doc SimHash signatures are row-local and deterministic
# (slice-independent), so `stored_cluster_sigs % slice` is value-
# equal to `simhash_signatures(docs.filter(slice))`, while banding,
# hot-bucket caps, pair verify, and the PageRank rounds — where the
# drift this audit exists to catch actually lives — are still
# re-derived from first principles. The plan sweep asserts the
# no-retokenize shape (no documents.parquet scan in the DAG).
# ---------------------------------------------------------------------------

_PRDRIFT_K = 50
_PRDRIFT_HOLD = "doc_id % 5 <> 4"


def _prdrift_oracle() -> str:
    from whale_sightings_spark.plans.queries_llm import _simhash_pairs_sql_p

    return (
        "WITH "
        + _mat(
            _pagerank_cte_chain(
                _simhash_pairs_sql_p("h_", _PRDRIFT_HOLD),
                GR.PR_ORACLE_ROUNDS,
                GR.DAMPING_FAST,
                "h_",
            )
        )
        + ",\n    "
        + _mat(
            _pagerank_cte_chain(
                _simhash_pairs_sql_p(), GR.PR_ORACLE_ROUNDS, GR.DAMPING_FAST
            )
        )
        + f"""
    , f_held AS (
        SELECT v, pr FROM pr{GR.PR_ORACLE_ROUNDS} WHERE v % 5 <> 4
    ),
    h_top AS (
        SELECT v FROM h_pr{GR.PR_ORACLE_ROUNDS}
        ORDER BY round(pr, 5) DESC, v LIMIT {_PRDRIFT_K}
    ),
    f_top AS (
        SELECT v FROM f_held ORDER BY round(pr, 5) DESC, v LIMIT {_PRDRIFT_K}
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM h_pr{GR.PR_ORACLE_ROUNDS})
               AS n_hist_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM f_held)
               AS n_full_held_nodes,
           (SELECT CAST(count(*) AS BIGINT)
            FROM h_pr{GR.PR_ORACLE_ROUNDS} h JOIN f_held f ON f.v = h.v)
               AS n_common_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM h_top JOIN f_top USING (v))
               AS topk_overlap
    """
    )


@register("q258_pagerank_rebuild_drift", _prdrift_oracle())
def q258_pagerank_rebuild_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from whale_sightings_spark.plans.cluster_store import (
        stored_hist_pagerank,
        stored_pagerank,
    )

    # round 12: the whole history side — pair derivation and the
    # PageRank fixpoint over `stored_cluster_sigs % hold` — is a chain
    # of generation-keyed derived tables (`derived_histpairs` ->
    # `derived_histpagerank`, shared with q243/q251): re-derived from
    # first principles whenever the sig table's generation moves
    # (every append/rebuild — exactly when centrality drift can
    # change), served between generations
    hist_pr = stored_hist_pagerank(spark, sf_dir)
    full_held = stored_pagerank(spark, sf_dir).filter(
        (F.col("v") % 5) != 4
    )

    def _top(pr):
        return (
            pr.orderBy(F.desc(F.round("pr", 5)), "v")
            .limit(_PRDRIFT_K)
            .select("v")
        )

    core = DR.rebuild_drift(
        hist_pr.select("v"), full_held.select("v"), ["v"]
    ).select(
        F.col("n_hist").alias("n_hist_nodes"),
        F.col("n_stored").alias("n_full_held_nodes"),
        F.col("n_stable").alias("n_common_nodes"),
    )
    d = _top(hist_pr).join(_top(full_held), "v").agg(
        F.count("*").cast("bigint").alias("topk_overlap")
    )
    return core.crossJoin(F.broadcast(d))


# ---------------------------------------------------------------------------
# q259 — n-gram LM store rebuild-drift audit (round 11, VERDICT r10
# #4: the SIXTH persisted artifact gets the drift audit the other five
# already have — q243 cluster labels, q251 pairs, q258 pagerank, q188
# tokenizer, q238 classifier). A stale LM store silently skews every
# retrieval/perplexity consumer (q103/q120/q136/q185/q216/q250), so a
# maintenance job recomputes the per-doc unigram counts from first
# principles over the history slice (doc_id % 5 <> 4 — the family
# hold; the tokenize pass IS the audit's subject) and full-outer-joins
# them against the STORED doc_uni table restricted to the same slice
# (`operators/drift.rebuild_drift` on key (doc_id, tok), value n).
# n_changed > 0 means counts drifted (tokenizer change, torn append);
# n_gained/n_lost mean whole postings appeared/vanished (append
# replay, eviction). Token-mass totals ride along as integers. Scale
# shape: one corpus tokenize pass over the slice (intentional), one
# posting-bucketed store scan, one (doc_id, tok)-keyed full-outer
# join — never corpus x corpus. All outputs integer: no float
# boundary in the hash gate (the q258 convention).
# ---------------------------------------------------------------------------

_LMDRIFT_HOLD = "doc_id % 5 <> 4"


def _lmdrift_oracle() -> str:
    # sentinel replacement, not str.format: tokens_sql's output is
    # interpolated into `uni` first, and a brace it might ever carry
    # (e.g. a regex quantifier like '{2,}') would make a later
    # .format pass raise or corrupt the SQL (ADVICE r11)
    uni = (
        "SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n\n"
        f"        FROM (SELECT doc_id, unnest({TX.tokens_sql('text')}) AS tok\n"
        "              FROM documents__WHERE__)\n"
        "        WHERE tok <> '' GROUP BY doc_id, tok"
    )
    return f"""
    WITH h AS (
        {uni.replace("__WHERE__", " WHERE " + _LMDRIFT_HOLD)}
    ),
    s AS (
        SELECT * FROM (
        {uni.replace("__WHERE__", "")}
        ) WHERE {_LMDRIFT_HOLD}
    ),
    j AS (
        SELECT h.doc_id IS NOT NULL AS in_hist,
               s.doc_id IS NOT NULL AS in_stored,
               h.n AS hn, s.n AS sn
        FROM h FULL OUTER JOIN s
          ON s.doc_id = h.doc_id AND s.tok = h.tok
    )
    SELECT CAST(sum(CASE WHEN in_hist THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hist,
           CAST(sum(CASE WHEN in_stored THEN 1 ELSE 0 END) AS BIGINT)
               AS n_stored,
           CAST(sum(CASE WHEN in_hist AND in_stored AND hn = sn
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_stable,
           CAST(sum(CASE WHEN in_hist AND in_stored AND hn <> sn
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(sum(CASE WHEN in_stored AND NOT in_hist THEN 1 ELSE 0 END)
                AS BIGINT) AS n_gained,
           CAST(sum(CASE WHEN in_hist AND NOT in_stored THEN 1 ELSE 0 END)
                AS BIGINT) AS n_lost,
           CAST(coalesce(sum(CASE WHEN in_hist THEN hn END), 0) AS BIGINT)
               AS hist_tokens,
           CAST(coalesce(sum(CASE WHEN in_stored THEN sn END), 0) AS BIGINT)
               AS stored_tokens
    FROM j
    """


def lm_hist_uni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok, n) — q259's history side: per-doc unigram counts
    over the hold slice, a pure function of documents.parquet,
    persisted as a derived table of the corpus-fingerprint-keyed LM
    artifact (one tokenize per corpus generation; the stored doc_uni
    table the audit prices is never an input to this side)."""
    from whale_sightings_spark.operators import ngram_lm as LM
    from whale_sightings_spark.plans.cluster_store import _derived_table
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    docs = load_table(spark, sf_dir, "documents")
    hold = (F.col("doc_id") % 5) != 4
    return _derived_table(
        spark,
        lm_artifact_dir(spark, sf_dir),
        "histuni",
        lambda: LM.doc_unigram_counts(docs.filter(hold))
        .select("doc_id", "tok", "n")
        .coalesce(2),
    )


@register("q259_lm_rebuild_drift", _lmdrift_oracle())
def q259_lm_rebuild_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whale_sightings_spark.operators import ngram_lm as LM
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    hold = (F.col("doc_id") % 5) != 4
    hist = lm_hist_uni(spark, sf_dir).select("doc_id", "tok", "n")
    stored = (
        LM.stored_doc_uni(spark, lm_artifact_dir(spark, sf_dir))
        .filter(hold)
        .select("doc_id", "tok", "n")
    )
    core = DR.rebuild_drift(hist, stored, ["doc_id", "tok"], value_col="n")
    mass = hist.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("hist_tokens")
    ).crossJoin(
        F.broadcast(
            stored.agg(
                F.coalesce(F.sum("n"), F.lit(0))
                .cast("bigint")
                .alias("stored_tokens")
            )
        )
    )
    return core.crossJoin(F.broadcast(mass))


# ---------------------------------------------------------------------------
# q263 — signature-table coverage audit (round 12, ADVICE r11: the
# drift family's own blind spot). q243/q251/q258 derive their
# history side from the STORED per-doc signature table — sound while
# that table is complete and current, but ingest damage that drops,
# duplicates, or orphans per-doc signatures (exactly what torn or
# replayed appends produce) propagates to BOTH sides of those drift
# joins and reads as zero drift. This audit closes the loop at ids
# only — no tokenize pass: the corpus doc_id set vs the stored sig
# doc_id set through `drift.key_coverage` (one distinct + one
# key-grouped count + one full-outer join). n_missing > 0 = dropped
# append, n_orphan > 0 = ghost signatures, n_dup_keys > 0 = append
# replay; any nonzero means the other three audits' zero-drift
# verdicts are untrustworthy and the artifact needs a rebuild.
#
# Oracle note (the q253/q261 convention): an intact signature table
# is BY CONSTRUCTION one row per corpus doc, so the oracle derives
# every output from `documents` alone; the Spark side reads the REAL
# stored table, so any coverage damage shows up as a value mismatch
# against this structurally-clean oracle. The nonzero-damage paths of
# `key_coverage` are unit-pinned in tests/test_drift.py.
# ---------------------------------------------------------------------------


@register(
    "q263_sig_coverage_audit",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_expected,
           CAST(count(*) AS BIGINT) AS n_stored_keys,
           CAST(count(*) AS BIGINT) AS n_covered,
           CAST(0 AS BIGINT) AS n_missing,
           CAST(0 AS BIGINT) AS n_orphan,
           CAST(0 AS BIGINT) AS n_dup_keys,
           CAST(count(*) AS BIGINT) AS n_stored_rows
    FROM documents
    """,
)
def q263_sig_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whale_sightings_spark.plans.cluster_store import text_cluster_dir

    art = text_cluster_dir(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    sigs = DD.stored_cluster_sigs(spark, art).select("doc_id")
    return DR.key_coverage(docs, sigs, ["doc_id"])
