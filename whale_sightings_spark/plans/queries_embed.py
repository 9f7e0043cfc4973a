"""Embedding storage/serving economics queries (q181-q183): the
audits a large embedding store runs before sealing a layout —
semantic eval contamination, int8 quantization loss, and the
Matryoshka dimension-budget recall curve. Operators live in
``operators/embedquant.py``; each query pairs with a DuckDB oracle
built from the SAME Python constants (one spec, two engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from whale_sightings_spark.operators import embedquant as EQ
from whale_sightings_spark.plans.queries import register
from whale_sightings_spark.schemas import load_table


# ---------------------------------------------------------------------------
# q181 — semantic eval-contamination screen: embedding-space twin of
# the lexical q119. A paraphrased benchmark answer shares no 3-grams
# with its source but sits next to it in embedding space; this flags
# train vectors whose max cosine against the broadcast held-out probe
# set crosses the threshold, reported per label cell. One corpus
# scan; probe set broadcast; report is label-cardinality-sized.
# ---------------------------------------------------------------------------


@register("q181_semantic_contamination", EQ.semantic_contamination_sql())
def q181_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return EQ.semantic_contamination_audit(
        load_table(spark, sf_dir, "embeddings")
    )


# ---------------------------------------------------------------------------
# q182 — int8 affine quantization audit: per-dimension bounds, scale,
# and round-trip reconstruction error (RMSE + max |err|). The go/no-go
# report before swapping the float32 embedding store for a 4x-smaller
# int8 layout — run it per corpus snapshot, gate on max_abs_err
# against the ANN margin q183 measures. Two passes, nothing row-scale
# shuffles (per-dim partial aggs only).
# ---------------------------------------------------------------------------


@register("q182_int8_quant_audit", EQ.int8_quantization_sql())
def q182_int8_quant_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return EQ.int8_quantization_audit(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# q183 — Matryoshka truncated-dimension recall: recall@5 when search
# is served from the first 8/16/32 of 64 dims vs the full-dimension
# exact top-k. The dim-budget tuning curve for MRL-style embeddings:
# halving served dims halves scan bytes AND memory bandwidth, and this
# query prices the recall cost. Same broadcast-query / WindowGroupLimit
# harness as q116.
# ---------------------------------------------------------------------------


@register("q183_matryoshka_recall", EQ.truncated_dim_recall_sql())
def q183_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return EQ.truncated_dim_recall(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# q187 — PCA top principal component by fixed-round power iteration:
# one d^2-per-row covariance pass (partial-aggregated to 4096 cells —
# the only corpus-scale work), then 8 deterministic iteration rounds
# over the collected d x d matrix, 12-dp rounded per round so the
# driver math and the SQL-unrolled oracle agree exactly. The fit step
# for whitening / dimensionality reduction / embedding-drift
# monitoring; q183 prices serving fewer dims, this computes the basis
# you'd actually project onto.
# ---------------------------------------------------------------------------


@register("q187_pca_top_component", EQ.pca_top_component_sql())
def q187_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    return EQ.pca_top_component(load_table(spark, sf_dir, "embeddings"))
