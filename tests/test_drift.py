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
