"""Persisted shingle inverted index (operators/shingles.py): build
equivalence vs the inline shapes it replaces, derived-table
consistency, and the build-if-absent cache contract (fingerprint key,
torn-write heal). The end-to-end value checks live in the oracle
suite (q51/q119/q139/q141/q184/q191/q234 twins); this file pins the
artifact's own invariants."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from whale_sightings_spark.operators import shingles as SH
from whale_sightings_spark.schemas import load_table


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_path_factory):
    art = str(tmp_path_factory.mktemp("shingle_art"))
    docs = load_table(spark, sf_dir, "documents")
    SH.build_shingle_artifact(docs, art)
    return art


def test_postings_match_inline_distinct_pairs(spark, sf_dir, built):
    docs = load_table(spark, sf_dir, "documents")
    inline = sorted(
        (r["doc_id"], r["source"], r["shingle"])
        for r in SH._distinct_postings(docs, SH.SHINGLE_N).collect()
    )
    stored = sorted(
        (r["doc_id"], r["source"], r["shingle"])
        for r in SH.stored_postings(spark, built).collect()
    )
    assert stored == inline and len(stored) > 0


def test_derived_tables_are_consistent_with_postings(spark, built):
    post = SH.stored_postings(spark, built)
    # df table == per-shingle distinct-doc counts of the postings
    recomputed = {
        r["shingle"]: r["n"]
        for r in post.groupBy("shingle").agg(F.count("*").alias("n")).collect()
    }
    stored = {r["shingle"]: r["df"] for r in SH.stored_df(spark, built).collect()}
    assert stored == recomputed
    # doc_stats == per-doc counts
    rec_docs = {
        r["doc_id"]: r["n"]
        for r in post.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    st_docs = {
        r["doc_id"]: r["n_shingles"]
        for r in SH.stored_doc_stats(spark, built).collect()
    }
    assert st_docs == rec_docs


def test_src5_matches_inline_width5(spark, sf_dir, built):
    docs = load_table(spark, sf_dir, "documents")
    inline = sorted(
        (r["source"], r["shingle"])
        for r in SH._distinct_postings(docs, SH.SRC_SHINGLE_N)
        .select("source", "shingle")
        .distinct()
        .collect()
    )
    stored = sorted(
        (r["source"], r["shingle"])
        for r in SH.stored_src5(spark, built).collect()
    )
    assert stored == inline and len(stored) > 0


def test_capped_postings_match_shingle_docs(spark, sf_dir, built):
    """`capped_postings` serves exactly dedup._shingle_docs's contract
    (distinct pairs, hot shingles dropped) — the q141 equivalence."""
    from whale_sightings_spark.operators import dedup as DD

    docs = load_table(spark, sf_dir, "documents")
    inline = sorted(
        (r["doc_id"], r["shingle"])
        for r in DD._shingle_docs(docs).collect()
    )
    served = sorted(
        (r["doc_id"], r["shingle"])
        for r in SH.capped_postings(spark, built, DD.MAX_SHINGLE_DF)
        .select("doc_id", "shingle")
        .collect()
    )
    assert served == inline


def test_torn_build_is_invisible(spark, sf_dir, tmp_path, monkeypatch):
    """A build torn before the LAST table (src5) must look absent to
    the build-if-absent helper and be rebuilt on next access."""
    from whale_sightings_spark.plans import shingle_store as SS

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    art1 = SS.shingle_artifact_dir(spark, sf_dir)
    _, _, _, src5_dir = SH.shingle_artifact_paths(art1)
    marker = os.path.join(src5_dir, "_SUCCESS")
    assert os.path.exists(marker)
    os.remove(marker)  # simulate the torn write
    art2 = SS.shingle_artifact_dir(spark, sf_dir)
    assert art2 == art1 and os.path.exists(marker)
    # and a healthy artifact is a cache hit (marker untouched)
    mt0 = os.path.getmtime(marker)
    SS.shingle_artifact_dir(spark, sf_dir)
    assert os.path.getmtime(marker) == mt0
