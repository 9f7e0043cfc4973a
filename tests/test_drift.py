"""Unit tests for the shared rebuild-drift core (`operators/drift.py`).

The oracle-gated drift audits (q243/q251/q258/q259) only ever see the
QUIET path on a freshly-built artifact (stored == rebuild, all drift
counts 0); these tests craft nonzero drift in every direction so the
counting logic itself is pinned."""

from __future__ import annotations

from whale_sightings_spark.operators.drift import rebuild_drift


def _row(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_rebuild_drift_presence_only(spark):
    """No value column: presence is stability, n_changed is 0."""
    hist = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "doc_a long, doc_b long"
    )
    stored = spark.createDataFrame(
        [(1, 2), (7, 8)], "doc_a long, doc_b long"
    )
    got = _row(rebuild_drift(hist, stored, ["doc_a", "doc_b"]))
    assert got == {
        "n_hist": 3,
        "n_stored": 2,
        "n_stable": 1,
        "n_changed": 0,
        "n_gained": 1,  # (7,8) stored-only
        "n_lost": 2,  # (3,4),(5,6) hist-only
    }


def test_rebuild_drift_with_value_column(spark):
    """With a value column a shared key only counts stable when the
    values agree; disagreement lands in n_changed, and null values
    compare null-safe."""
    hist = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 40)],
        "doc_id long, label long",
    )
    stored = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None), (5, 50)],
        "doc_id long, label long",
    )
    got = _row(rebuild_drift(hist, stored, ["doc_id"], value_col="label"))
    assert got == {
        "n_hist": 4,
        "n_stored": 4,
        "n_stable": 2,  # key 1 (equal), key 3 (null == null null-safe)
        "n_changed": 1,  # key 2
        "n_gained": 1,  # key 5
        "n_lost": 1,  # key 4
    }


def test_rebuild_drift_empty_sides(spark):
    """Empty inputs yield all-zero counts, never NULLs (the sum-over-
    no-rows class the r8 sf0.1 sweep caught elsewhere)."""
    empty = spark.createDataFrame([], "doc_id long, label long")
    full = spark.createDataFrame([(1, 1)], "doc_id long, label long")
    got = _row(rebuild_drift(empty, full, ["doc_id"], value_col="label"))
    assert got == {
        "n_hist": 0,
        "n_stored": 1,
        "n_stable": 0,
        "n_changed": 0,
        "n_gained": 1,
        "n_lost": 0,
    }
    got = _row(rebuild_drift(empty, empty, ["doc_id"], value_col="label"))
    assert all(v == 0 for v in got.values())


def test_key_coverage_prices_every_damage_direction(spark):
    """Round 12 (ADVICE r11): the q263 coverage core must price
    dropped appends (missing), ghost rows (orphan), and append
    replays (dup keys) — the damage classes that read as ZERO drift
    in the sig-derived rebuild audits."""
    from whale_sightings_spark.operators.drift import key_coverage

    expected = spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], "doc_id long"
    )
    # 1 covered once, 2 covered twice (replay), 5 orphan, 3+4 missing
    stored = spark.createDataFrame(
        [(1,), (2,), (2,), (5,)], "doc_id long"
    )
    got = key_coverage(expected, stored, ["doc_id"]).collect()[0].asDict()
    assert got == {
        "n_expected": 4,
        "n_stored_keys": 3,
        "n_covered": 2,
        "n_missing": 2,
        "n_orphan": 1,
        "n_dup_keys": 1,
        "n_stored_rows": 4,
    }


def test_key_coverage_clean_and_empty(spark):
    """Intact store: covered == expected, all damage counts 0 — the
    exact shape the q263 oracle asserts. Empty store: all-zero, never
    NULL."""
    from whale_sightings_spark.operators.drift import key_coverage

    e = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = key_coverage(e, e, ["doc_id"]).collect()[0].asDict()
    assert got == {
        "n_expected": 2,
        "n_stored_keys": 2,
        "n_covered": 2,
        "n_missing": 0,
        "n_orphan": 0,
        "n_dup_keys": 0,
        "n_stored_rows": 2,
    }
    empty = spark.createDataFrame([], "doc_id long")
    got = key_coverage(empty, empty, ["doc_id"]).collect()[0].asDict()
    assert all(v == 0 for v in got.values())


def test_sig_coverage_audit_detects_torn_sig_table(spark, sf_dir, tmp_path):
    """End-to-end: q263 against a CRAFTED damaged sig table — one doc's
    signature dropped, another's duplicated — reports exactly that
    damage, while the intact artifact reports clean coverage. (The
    oracle-gated run only ever sees the clean path; this pins the
    detection path on a real stored artifact.)"""
    import pyspark.sql.functions as F

    from whale_sightings_spark.operators import dedup as DD
    from whale_sightings_spark.operators.drift import key_coverage
    from whale_sightings_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    sigs = DD.simhash_signatures(docs)
    art = str(tmp_path / "art")
    # drop doc 0's signature, replay doc 1's
    damaged = sigs.filter(F.col("doc_id") != 0).unionByName(
        sigs.filter(F.col("doc_id") == 1)
    )
    DD.build_cluster_artifact(None, art, sigs=damaged)
    got = (
        key_coverage(
            docs.select("doc_id"),
            DD.stored_cluster_sigs(spark, art).select("doc_id"),
            ["doc_id"],
        )
        .collect()[0]
        .asDict()
    )
    n = docs.count()
    assert got["n_expected"] == n
    assert got["n_missing"] == 1
    assert got["n_dup_keys"] == 1
    assert got["n_orphan"] == 0
    assert got["n_stored_rows"] == n  # -1 dropped +1 replayed


def test_evec_coverage_audit_detects_torn_vector_table(
    spark, sf_dir, tmp_path
):
    """q265's detection path on a real stored embed artifact: one
    vector dropped, one replayed — the coverage core prices exactly
    that (the streaming assign probe reads these stored vectors, so
    silent damage here distorts every assign it serves)."""
    import pyspark.sql.functions as F

    from whale_sightings_spark.operators import dedup as DD
    from whale_sightings_spark.operators.drift import key_coverage
    from whale_sightings_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    damaged = emb.filter(F.col("vec_id") != 0).unionByName(
        emb.filter(F.col("vec_id") == 1)
    )
    art = str(tmp_path / "art")
    pairs = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    DD.build_cluster_artifact(pairs, art, evecs=damaged)
    got = (
        key_coverage(
            emb.select("vec_id"),
            spark.read.parquet(DD.cluster_evecs_path(art)).select(
                "vec_id"
            ),
            ["vec_id"],
        )
        .collect()[0]
        .asDict()
    )
    n = emb.count()
    assert got["n_expected"] == n
    assert got["n_missing"] == 1
    assert got["n_dup_keys"] == 1
    assert got["n_orphan"] == 0
    assert got["n_stored_rows"] == n
