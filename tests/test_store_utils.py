"""Cache-root maintenance: dead-builder staging reap (ADVICE r8 —
failed/killed builds must not accumulate near-full-size partial stores
under `.index_cache/`)."""
from __future__ import annotations

import os

from whale_sightings_spark.plans.store_utils import reap_dead_staging


def test_reap_removes_dead_pid_staging_only(tmp_path):
    live = tmp_path / f"ivfpq_v2_123.tmp.{os.getpid()}"
    dead = tmp_path / "ivfpq_v2_123.tmp.999999999"
    published = tmp_path / "ivfpq_v2_123"
    notpid = tmp_path / "shingle_v3_9.tmp.abc"
    for d in (live, dead, published, notpid):
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
    reaped = reap_dead_staging(str(tmp_path))
    assert reaped == [dead.name]
    assert live.is_dir() and published.is_dir() and notpid.is_dir()
    assert not dead.exists()


def test_reap_missing_root_is_noop(tmp_path):
    assert reap_dead_staging(str(tmp_path / "absent")) == []


def test_failed_build_cleans_its_staging(spark, sf_dir, tmp_path, monkeypatch):
    """An in-process build failure must rmtree its own staging dir (the
    try/except guard on every builder), leaving the cache root free of
    `.tmp.` debris."""
    from whale_sightings_spark.operators import dedup as DD
    from whale_sightings_spark.plans import cluster_store as CS

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))

    def boom(pairs, artifact_dir, **kwargs):
        # simulate an OOM mid-build AFTER the staging dir exists
        os.makedirs(artifact_dir, exist_ok=True)
        raise RuntimeError("simulated build crash")

    monkeypatch.setattr(DD, "build_cluster_artifact", boom)
    try:
        CS.text_cluster_dir(spark, sf_dir)
    except RuntimeError:
        pass
    else:  # pragma: no cover
        raise AssertionError("build was expected to raise")
    sf_root = os.path.join(str(tmp_path), os.path.basename(sf_dir.rstrip("/")))
    leftovers = [
        d for d in os.listdir(sf_root) if ".tmp." in d
    ] if os.path.isdir(sf_root) else []
    assert leftovers == []


def test_derived_table_reaps_dead_staging_and_publishes(spark, tmp_path):
    """ADVICE r10: dead builders' derived_*.tmp.<pid> leftovers live
    INSIDE the artifact dir (the sf_root sweep never visits there) —
    `_derived_table` must reap them on rebuild, then publish via
    atomic rename with a _SUCCESS completeness marker."""
    from whale_sightings_spark.plans import cluster_store as CS

    art = tmp_path / "clusters_text_v5_x"
    art.mkdir()
    dead = art / "derived_foo.tmp.999999999"
    dead.mkdir()
    (dead / "junk.parquet").write_bytes(b"x")

    def build():
        return spark.createDataFrame([(1, 2.0)], "v long, pr double")

    df = CS._derived_table(spark, str(art), "foo", build)
    assert df.count() == 1
    assert not dead.exists()
    assert (art / "derived_foo" / "_SUCCESS").exists()
    # second call serves the published table without rebuilding
    mt0 = os.path.getmtime(art / "derived_foo" / "_SUCCESS")
    assert CS._derived_table(spark, str(art), "foo", build).count() == 1
    assert os.path.getmtime(art / "derived_foo" / "_SUCCESS") == mt0


def test_read_artifact_table_memoizes_and_rekeys(spark, tmp_path):
    """Round 11: repeated reads of a published table serve the SAME
    DataFrame object (the per-query fixed overhead is DataFrame
    construction, not the scan); any publish that moves _SUCCESS
    (append, compaction, rebuild) re-keys; a markerless dir is read
    uncached."""
    import time as _time

    from whale_sightings_spark.plans.store_utils import read_artifact_table

    p = str(tmp_path / "tbl")
    spark.createDataFrame([(1,)], "a long").write.parquet(p)
    d1 = read_artifact_table(spark, p, "a long")
    assert read_artifact_table(spark, p, "a long") is d1
    assert d1.count() == 1
    # append rewrites _SUCCESS -> re-key, new rows visible
    _time.sleep(0.01)
    spark.createDataFrame([(2,)], "a long").write.mode("append").parquet(p)
    d2 = read_artifact_table(spark, p, "a long")
    assert d2 is not d1
    assert d2.count() == 2
    # markerless dir: read uncached every time
    q = str(tmp_path / "bare")
    spark.createDataFrame([(3,)], "a long").write.parquet(q)
    os.remove(os.path.join(q, "_SUCCESS"))
    b1 = read_artifact_table(spark, q, "a long")
    assert read_artifact_table(spark, q, "a long") is not b1


def test_derived_table_generation_gate_rebuilds_on_source_change(
    spark, tmp_path
):
    """ADVICE r11: a derived table stamps the source table's _SUCCESS
    generation into `_GEN` at build time; the reader treats a
    generation mismatch as absent. This closes the append-races-
    builder window by generation instead of deletion order: a builder
    that read pre-append source and published AFTER the ingest sweep
    deleted derived tables carries a stale `_GEN` and is rebuilt on
    the next read, never served."""
    import time as _time

    from whale_sightings_spark.plans import cluster_store as CS

    art = tmp_path / "clusters_text_v5_y"
    art.mkdir()
    src = art / "pairs"
    spark.createDataFrame([(1, 2)], "doc_a long, doc_b long").write.parquet(
        str(src)
    )
    src_marker = str(src / "_SUCCESS")
    calls = []

    def build():
        calls.append(1)
        return spark.createDataFrame([(len(calls),)], "n long")

    CS._derived_table(spark, str(art), "gen", build, src_marker=src_marker)
    assert calls == [1]
    assert (art / "derived_gen" / "_GEN").read_text().strip() != ""
    # unchanged source: served, not rebuilt
    CS._derived_table(spark, str(art), "gen", build, src_marker=src_marker)
    assert calls == [1]
    # source append moves its _SUCCESS -> stale by generation -> rebuild
    _time.sleep(0.01)
    spark.createDataFrame([(3, 4)], "doc_a long, doc_b long").write.mode(
        "append"
    ).parquet(str(src))
    df = CS._derived_table(
        spark, str(art), "gen", build, src_marker=src_marker
    )
    assert calls == [1, 1]
    assert df.collect()[0][0] == 2
    # a pre-round-12 table (no _GEN) reads as stale once and heals
    os.remove(art / "derived_gen" / "_GEN")
    CS._derived_table(spark, str(art), "gen", build, src_marker=src_marker)
    assert calls == [1, 1, 1]
    assert (art / "derived_gen" / "_GEN").exists()


def test_ingest_invalidation_skips_live_staging(spark, tmp_path):
    """ADVICE r11: the streaming ingest's derived-table sweep must
    delete only PUBLISHED derived_<name> dirs — a LIVE builder's
    derived_*.tmp.<pid> staging is never raced (the repo-wide .tmp.
    convention); dead builders' leftovers go through the pid-liveness
    reap."""
    import glob
    import shutil

    from whale_sightings_spark.plans.store_utils import reap_dead_staging

    art = tmp_path / "clusters_text_v5_z"
    art.mkdir()
    live = art / f"derived_pagerank.tmp.{os.getpid()}"
    dead = art / "derived_pagerank.tmp.999999999"
    published = art / "derived_pagerank"
    for d in (live, dead, published):
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
    # the exact sweep the ingest path runs (streaming/events.py)
    reap_dead_staging(str(art))
    for d in glob.glob(os.path.join(str(art), "derived_*")):
        if ".tmp." in os.path.basename(d):
            continue
        shutil.rmtree(d, ignore_errors=True)
    assert live.is_dir()
    assert not dead.exists()
    assert not published.exists()


def test_load_table_memoizes_and_rekeys(spark, sf_dir, tmp_path):
    """Round 12 (optimization): base testdata tables serve the SAME
    lazy DataFrame object per (file stat signature, session) — the
    per-query fixed overhead was footer read + schema inference + the
    _fan_out directory walk, repeated ~265x per bench run. A rewritten
    (touched) table must re-key; the plan itself stays lazy, so every
    action still computes from the parquet input."""
    import shutil
    import time as _time

    from whale_sightings_spark import schemas as S

    d1 = S.load_table(spark, sf_dir, "nation")
    assert S.load_table(spark, sf_dir, "nation") is d1
    n = d1.count()
    assert n > 0
    # a table whose file signature moves is re-read, not served stale
    p = tmp_path / "nation.parquet"
    shutil.copy(os.path.join(sf_dir, "nation.parquet"), p)
    m1 = S.load_table(spark, str(tmp_path), "nation")
    assert m1.count() == n
    _time.sleep(0.01)
    os.utime(p)
    m2 = S.load_table(spark, str(tmp_path), "nation")
    assert m2 is not m1
    # events keeps its nanos->micros cast through the memo
    e1 = S.load_table(spark, sf_dir, "events")
    assert S.load_table(spark, sf_dir, "events") is e1
    assert dict(e1.dtypes)["ts"] == "timestamp_ntz"
