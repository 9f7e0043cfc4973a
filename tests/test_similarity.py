"""Semantic tests for the ANN index-quality audit (operators/similarity).

The oracle-differential suite checks q116 against DuckDB on the real
testdata; this file pins the *semantics* on a hand-built corpus where
the true recall is known by construction: one query whose cell holds
both of its true neighbors (recall 1.0) and one whose nearest neighbor
sits in the wrong cell (recall 0.5).
"""

from __future__ import annotations

from whale_sightings_spark.operators.similarity import ann_recall


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], c) for i, v, c in rows],
        "vec_id long, embedding array<float>, label string",
    )


def test_ann_recall_perfect_and_split_cells(spark):
    rows = [
        (0, [1.0, 0.0], "A"),   # query 0, cell A
        (1, [0.0, 1.0], "B"),   # query 1, cell B
        (10, [1.0, 0.1], "A"),  # q0's best neighbor, right cell
        (11, [1.0, 0.2], "A"),  # q0's 2nd neighbor, right cell
        (12, [0.1, 1.0], "A"),  # q1's best neighbor, WRONG cell
        (13, [0.2, 1.0], "B"),  # q1's 2nd neighbor, right cell
        (14, [-1.0, 0.0], "B"), # filler so cell B has >= k non-self rows
    ]
    out = {
        r["query_id"]: r
        for r in ann_recall(_emb(spark, rows), n_queries=2, k=2).collect()
    }
    assert out[0]["n_exact"] == 2 and out[0]["n_hit"] == 2
    assert out[0]["recall"] == 1.0
    # q1's true top-2 is {12, 13} but the probe only sees cell B -> one hit
    assert out[1]["n_exact"] == 2 and out[1]["n_hit"] == 1
    assert out[1]["recall"] == 0.5


def test_ann_recall_bounds_on_testdata(spark, sf_dir):
    from whale_sightings_spark.schemas import load_table

    rows = ann_recall(load_table(spark, sf_dir, "embeddings")).collect()
    assert len(rows) == 5
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    assert all(r["n_exact"] == 5 for r in rows)


def test_q126_no_cluster_spans_splits(spark, sf_dir):
    # the leakage guard: every near-dup cluster maps to exactly one split
    from pyspark.sql import functions as F

    from whale_sightings_spark.functions.hashing import hash60
    from whale_sightings_spark.operators import dedup as DD
    from whale_sightings_spark.plans.queries_quality import (
        SPLIT_TRAIN_UPTO,
        SPLIT_VAL_UPTO,
    )
    from whale_sightings_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    labels = DD.dedup_components(DD.simhash_pairs(docs))
    clusters = docs.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("label", "doc_id").alias("cluster")
    )
    bucket = hash60(F.concat(F.col("cluster").cast("string"), F.lit(":csplit"))) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_UPTO, "train")
        .when(bucket < SPLIT_VAL_UPTO, "val")
        .otherwise("test")
    )
    spans = (
        clusters.withColumn("split", split)
        .groupBy("cluster")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert spans == 0


def test_pq_trained_codebook_beats_seed(spark, sf_dir):
    """The Lloyd-trained codebook must strictly reduce total squared
    quantization error vs the first-PQ_K seed stand-in (k-means
    monotonically improves its objective; training on the 1-in-10
    sample still wins on the full corpus)."""
    from pyspark.sql import functions as F

    from whale_sightings_spark.operators import similarity as SIM
    from whale_sightings_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sub = SIM._pq_subvectors(emb)

    def total_err(cb):
        return (
            SIM._pq_assign_to(sub, cb).agg(F.sum("d2").alias("e")).collect()[0]["e"]
        )

    seed_err = total_err(SIM._pq_seed_codebook(sub))
    trained_err = total_err(SIM._pq_codebook(sub))
    assert trained_err < seed_err, (trained_err, seed_err)


def test_trained_cells_beat_label_cells_on_recall(spark, sf_dir):
    """The trained coarse quantizer must beat the label-as-cell
    stand-in on single-probe recall@5 (labels are uncorrelated with
    embedding geometry in the testdata, so Lloyd-trained cells win by a
    wide margin — 0.44 vs 0.0 at sf0.001)."""
    from pyspark.sql import functions as F

    from whale_sightings_spark.operators import similarity as SIM
    from whale_sightings_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    label_recall = SIM.ann_recall(emb).agg(F.avg("recall")).collect()[0][0]
    trained_recall = SIM.ivf_trained_recall(emb).agg(F.avg("recall")).collect()[0][0]
    assert trained_recall > label_recall, (trained_recall, label_recall)


def test_residual_pq_beats_raw_pq_on_recon(spark, sf_dir):
    """IVF-PQ's reason to exist: encoding residuals (vector - assigned
    coarse centroid) with the same PQ budget must reconstruct tighter
    than encoding raw vectors."""
    from pyspark.sql import functions as F

    from whale_sightings_spark.operators import similarity as SIM
    from whale_sightings_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    raw = SIM.pq_encode(emb).agg(F.sum(F.col("recon") ** 2)).collect()[0][0]
    res = (
        SIM.pq_residual_encode(emb).agg(F.sum(F.col("recon") ** 2)).collect()[0][0]
    )
    assert res < raw, (res, raw)


def test_lloyd_training_error_is_monotone_in_rounds(spark, sf_dir):
    """k-means guarantee worth pinning: total quantization error on the
    TRAINING sample never increases with more Lloyd rounds (assignment
    and mean-update steps each only decrease the objective; the 6dp
    centroid rounding both engines share is far below the per-round
    improvements here)."""
    from pyspark.sql import functions as F

    from whale_sightings_spark.operators import similarity as SIM
    from whale_sightings_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sub = SIM._pq_subvectors(emb)
    train = sub.filter(F.col("vec_id") % SIM.PQ_TRAIN_MOD == 0)

    def train_err(rounds):
        cb = SIM._lloyd_codebook(sub, SIM.PQ_K, rounds, SIM.PQ_TRAIN_MOD)
        return (
            SIM._pq_assign_to(train, cb).agg(F.sum("d2").alias("e")).collect()[0]["e"]
        )

    errs = [train_err(r) for r in range(4)]
    assert all(b <= a + 1e-6 for a, b in zip(errs, errs[1:])), errs


def test_stored_index_serve_equals_inline(spark, sf_dir, tmp_path_factory):
    """Build-once/serve-many contract: serving from the persisted
    artifact (codebooks + cell-partitioned code table on disk) must
    reproduce the inline ``ivfpq_topk`` result exactly — training is
    deterministic, so the store is a cache of the same math, and a
    rebuild into a second directory produces an identical code table."""
    from pyspark.sql import functions as F

    from whale_sightings_spark.operators import similarity as SIM
    from whale_sightings_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = tmp_path_factory.mktemp("ivfpq_store")
    idx1 = str(base / "idx1")
    SIM.build_ivfpq_index(emb, idx1)
    stored = sorted(
        tuple(r)
        for r in SIM.ivfpq_topk_from_index(spark, emb, idx1).collect()
    )
    inline = sorted(tuple(r) for r in SIM.ivfpq_topk(emb).collect())
    assert stored == inline and len(stored) > 0

    idx2 = str(base / "idx2")
    SIM.build_ivfpq_index(emb, idx2)
    read = lambda d: sorted(  # noqa: E731
        tuple(r)
        for r in spark.read.parquet(SIM.ivfpq_index_paths(d)[2])
        .select("vec_id", "s", "cid", F.col("cell").cast("long"))
        .collect()
    )
    assert read(idx1) == read(idx2), "rebuild must be deterministic"


def test_incremental_encode_history_prefix_matches_full_build(spark, sf_dir):
    """Ingest-path consistency: for HISTORY vectors (vec_id < split),
    the incremental encode (codebooks trained on history only) must
    equal a full ``pq_residual_encode`` over the history corpus alone —
    the delta's arrival cannot silently re-encode what's already
    stored."""
    from pyspark.sql import functions as F

    from whale_sightings_spark.operators import similarity as SIM
    from whale_sightings_spark.schemas import load_table

    split = 400
    emb = load_table(spark, sf_dir, "embeddings")
    inc = sorted(
        tuple(r)
        for r in SIM.ivfpq_incremental_encode(emb, split)
        .filter(F.col("vec_id") < split)
        .collect()
    )
    full_hist = sorted(
        tuple(r)
        for r in SIM.pq_residual_encode(emb.filter(F.col("vec_id") < split))
        .collect()
    )
    assert inc == full_hist and len(inc) == split


# ---------------------------------------------------------------------------
# embedquant family (q181-q183)
# ---------------------------------------------------------------------------


def test_int8_quant_error_bounded_by_half_step(spark, sf_dir):
    """Affine int8 round-trip contract: for every dimension the max
    reconstruction error of an IN-RANGE value is half a quantization
    step (clamping can't bite because lo/hi come from the same data)."""
    from whale_sightings_spark.operators import embedquant as EQ
    from whale_sightings_spark.schemas import load_table

    rows = EQ.int8_quantization_audit(
        load_table(spark, sf_dir, "embeddings")
    ).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.max_abs_err <= r.scale / 2 + 1e-6, r
        assert r.rmse <= r.max_abs_err + 1e-9, r
        assert r.lo <= r.hi, r


def test_matryoshka_recall_full_prefix_orders_mean(spark, sf_dir):
    """Wider prefixes can't be systematically worse: mean recall@5 at
    32 dims >= mean recall at 8 dims (the curve the audit exists to
    draw), and every recall sits in [0, 1]."""
    from whale_sightings_spark.operators import embedquant as EQ
    from whale_sightings_spark.schemas import load_table

    rows = EQ.truncated_dim_recall(
        load_table(spark, sf_dir, "embeddings")
    ).collect()
    assert {r.trunc_dim for r in rows} == set(EQ.TRUNC_DIMS)
    by_dim = {}
    for r in rows:
        assert 0.0 <= r.recall <= 1.0
        by_dim.setdefault(r.trunc_dim, []).append(r.recall)
    mean = {d: sum(v) / len(v) for d, v in by_dim.items()}
    assert mean[32] >= mean[8] - 1e-9, mean


def test_semantic_contamination_probe_exclusion(spark, sf_dir):
    """The probe set itself never appears on the train side (a probe
    scoring itself at cos=1 would fake a contamination hit), and label
    group sizes add up to the non-probe corpus."""
    from whale_sightings_spark.operators import embedquant as EQ
    from whale_sightings_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = EQ.semantic_contamination_audit(emb).collect()
    n_total = emb.count()
    n_probe = emb.filter(
        f"vec_id % {EQ.PROBE_MOD} = {EQ.PROBE_REM}"
    ).count()
    assert sum(r.n_train for r in out) == n_total - n_probe
    for r in out:
        assert -1.0 <= r.avg_max_cos <= 1.0
        assert r.n_contaminated <= r.n_train


def test_pca_top_component_dominates_and_is_unit(spark, sf_dir):
    """Rayleigh-quotient contracts: the returned loading is unit-norm,
    and the eigenvalue estimate is >= the variance captured by any
    single axis-aligned direction (lambda_max >= max diagonal entry of
    a symmetric covariance; power iteration after 8 rounds should be
    at least that far along)."""
    from whale_sightings_spark.operators import embedquant as EQ
    from whale_sightings_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = EQ.pca_top_component(emb).collect()
    assert len(rows) == 64
    norm = sum(r.loading**2 for r in rows) ** 0.5
    assert abs(norm - 1.0) < 1e-3, norm
    eig = rows[0].eigval
    assert all(r.eigval == eig for r in rows)
    # per-dim variances from the int8 audit bounds pass would do, but
    # recompute directly: eig must beat the best single dimension
    import numpy as np

    X = np.array(emb.select("embedding").toPandas()["embedding"].tolist(), dtype=float)
    assert eig >= X.var(axis=0).max() - 1e-4
    assert 0.0 < rows[0].var_share < 1.0


def test_mmr_rerank_diversifies_vs_plain_topk(spark, sf_dir):
    """MMR's reason to exist: the selected set's mean pairwise cosine
    must not exceed plain top-k's (λ<1 trades relevance for
    diversity), while pick 1 equals plain top-1 (no diversity term
    yet). Also pins the greedy invariants: k picks per query, ranks
    1..k, no duplicates."""
    from pyspark.sql import functions as F

    from whale_sightings_spark.operators.similarity import (
        MMR_K,
        ann_bruteforce_topk,
        cosine,
        mmr_topk,
    )
    from whale_sightings_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    mmr = mmr_topk(emb).collect()
    plain = ann_bruteforce_topk(emb, n_queries=3, k=MMR_K).collect()

    by_q = {}
    for r in mmr:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, rows in by_q.items():
        assert sorted(x["rank"] for x in rows) == list(range(1, MMR_K + 1))
        ids = [x["neighbor_id"] for x in rows]
        assert len(set(ids)) == MMR_K
        top1 = min(
            (p for p in plain if p["query_id"] == qid), key=lambda p: p["rank"]
        )
        first = min(rows, key=lambda x: x["rank"])
        assert first["neighbor_id"] == top1["neighbor_id"]
        # relevance of pick r is <= pick 1 (greedy starts at argmax rel)
        assert all(x["relevance"] <= first["relevance"] + 1e-9 for x in rows)

    def mean_pairwise(ids):
        sub = emb.filter(F.col("vec_id").isin(ids)).select(
            "vec_id", "embedding"
        )
        a = sub.select(
            F.col("vec_id").alias("ia"), F.col("embedding").alias("ea")
        )
        b = sub.select(
            F.col("vec_id").alias("ib"), F.col("embedding").alias("eb")
        )
        rows = (
            a.join(b, F.col("ia") < F.col("ib"))
            .select(cosine(F.col("ea"), F.col("eb")).alias("c"))
            .collect()
        )
        return sum(r["c"] for r in rows) / len(rows)

    for qid in by_q:
        m_ids = [x["neighbor_id"] for x in by_q[qid]]
        p_ids = [p["neighbor_id"] for p in plain if p["query_id"] == qid]
        assert mean_pairwise(m_ids) <= mean_pairwise(p_ids) + 1e-9
