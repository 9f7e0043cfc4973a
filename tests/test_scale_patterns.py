"""Cluster-scale execution patterns exercised end-to-end on local[*]:
bucketed co-located joins (the zero-shuffle fact⋈fact strategy),
streaming foreachBatch into the idempotent upsert sink (exactly-once
delivery under batch replay), and a Python UDTF checked against the
native q57 plan (the extension surface for table-generating logic).
"""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from whale_sightings_spark.plans.queries import queries
from whale_sightings_spark.schemas import load_table
from whale_sightings_spark.sources.jdbc import upsert_via_foreach_partition
from whale_sightings_spark.streaming.events import stage_event_replay

from tests.test_plans import explain_str


# ---------------------------------------------------------------------------
# Bucketed co-located join: both sides pre-bucketed on the join key ->
# the SortMergeJoin consumes bucketed scans directly, with NO exchange
# on either side. At 100 TB this is the difference between a join that
# reshuffles both fact tables every run and one that never does.
# ---------------------------------------------------------------------------


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    for name, df, key in (
        ("orders_bkt", orders, "o_custkey"),
        ("customer_bkt", customer, "c_custkey"),
    ):
        (
            df.write.mode("overwrite")
            .option("path", str(base / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("orders_bkt")
            .join(
                spark.table("customer_bkt"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("o_orderkey", "c_name", "o_totalprice")
        )
        plan = explain_str(joined, "simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it still computes the same answer as the plain join
        expected = orders.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")


# ---------------------------------------------------------------------------
# Streaming -> idempotent upsert sink. foreachBatch re-delivers whole
# micro-batches on failure/restart; a keyed upsert makes redelivery a
# no-op, which is the exactly-once recipe for non-transactional stores.
# Replaying the entire stream into the same database must leave it
# byte-identical.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def replay_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fb_events"))
    return stage_event_replay(spark, sf_dir, out, n_files=3)


def _run_stream_into_sqlite(spark, replay_dir, db_path, checkpoint) -> None:
    schema = spark.read.parquet(replay_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay_dir)
        .select("event_id", "user_id", "event_type")
    )

    def sink(batch_df, batch_id) -> None:
        upsert_via_foreach_partition(
            batch_df,
            "INSERT INTO sink_events (event_id, user_id, event_type) "
            "VALUES (?, ?, ?) ON CONFLICT(event_id) DO UPDATE SET "
            "user_id = excluded.user_id, event_type = excluded.event_type",
            lambda: sqlite3.connect(db_path, timeout=60),
            batch_size=500,
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_foreach_batch_upsert_is_replay_idempotent(
    spark, replay_dir, tmp_path_factory
):
    base = tmp_path_factory.mktemp("fb_sink")
    db_path = str(base / "sink.db")
    with sqlite3.connect(db_path) as conn:
        conn.execute(
            "CREATE TABLE sink_events ("
            "event_id INTEGER PRIMARY KEY, user_id INTEGER, event_type TEXT)"
        )

    _run_stream_into_sqlite(spark, replay_dir, db_path, str(base / "cp1"))
    with sqlite3.connect(db_path) as conn:
        first = sorted(conn.execute("SELECT * FROM sink_events").fetchall())
    n_src = spark.read.parquet(replay_dir).select("event_id").distinct().count()
    assert len(first) == n_src

    # full replay with a fresh checkpoint = every batch redelivered
    _run_stream_into_sqlite(spark, replay_dir, db_path, str(base / "cp2"))
    with sqlite3.connect(db_path) as conn:
        second = sorted(conn.execute("SELECT * FROM sink_events").fetchall())
    assert second == first


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4 extension surface for table-generating logic),
# pinned against the native q57 sentence plan: same rows, so the
# imperative escape hatch and the codegen path agree. The native
# explode remains the production path (the sweep in test_plans bans
# BatchEvalPython from registered queries); the UDTF is the documented
# pattern for logic that genuinely can't be expressed natively.
# ---------------------------------------------------------------------------


def test_udtf_sentences_match_native_plan(spark, sf_dir):
    from pyspark.sql.functions import udtf

    from whale_sightings_spark.plans.queries_stats import _SENT_RE  # noqa: PLC2701

    import re as _re

    @udtf(
        returnType=StructType(
            [
                StructField("sent_idx", IntegerType()),
                StructField("sent", StringType()),
            ]
        )
    )
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, raw in enumerate(_re.findall(_SENT_RE, text), start=1):
                if raw.strip():
                    yield i, raw.strip()

    spark.udtf.register("sentence_split", SentenceSplit)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    got = spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, md5(s.sent) AS sent_md5
        FROM docs_udtf d, LATERAL sentence_split(d.text) s
        """
    ).collect()
    expected = {
        (r["doc_id"], r["sent_idx"], r["sent_md5"])
        for r in queries()["q57_sentences"](spark, sf_dir).collect()
    }
    assert {(r["doc_id"], r["sent_idx"], r["sent_md5"]) for r in got} == expected
    assert len(got) == len(expected)


# ---------------------------------------------------------------------------
# Runtime bloom-filter join injection: the optimizer's automatic
# counterpart of q71's manual bitmap prefilter. When a selective
# filter sits on one side of a shuffle join, Spark injects a bloom
# filter built from that side and pushes a might-contain probe onto
# the other side's scan — at 100 TB this prunes the fact shuffle
# before it happens. Pin the capability so a config regression (the
# feature silently off) is caught.
# ---------------------------------------------------------------------------


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    confs = {
        # force a shuffle join (broadcast would bypass the bloom path)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.adaptive.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_orderpriority"
        )
        plan = explain_str(joined)
        assert "bloom_filter" in plan or "BloomFilter" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# AQE skew-join splitting: the runtime answer to hot keys (SCALE.md's
# "skewed keys -> salting or AQE skew-join"). One reducer owning a
# 2000x-hot key must be split into advisory-sized reads at runtime —
# the final adaptive plan marks the join skew=true. Salting
# (operators/skew.py) remains the deterministic-contract path; this
# pins the zero-code-change one.
# ---------------------------------------------------------------------------


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(200000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        ).union(
            spark.range(100).select(
                (F.col("id") % 99 + 1).alias("k"), F.col("id").alias("v")
            )
        )
        right = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        j = left.join(right, "k")
        assert len(j.collect()) == 200100
        # same QueryExecution the collect ran: now the FINAL adaptive plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ivfpq_hot_cell_splits_files_and_probe_still_prunes(
    spark, sf_dir, tmp_path_factory
):
    """Round-7 (VERDICT r6 #5): demonstrate the hot-inverted-list claim
    in build_ivfpq_index's docstring — with
    spark.sql.files.maxRecordsPerFile set, a hot cell's code rows split
    into MULTIPLE part-files inside its partition directory (so one
    hot cell never becomes one giant file/task at 100 TB), while the
    serve path still reads the code table through a cell partition
    filter (pruning is directory-level, unaffected by the split)."""
    import glob
    import os
    import re

    from whale_sightings_spark.operators.similarity import (
        PQ_M,
        build_ivfpq_index,
        ivfpq_index_paths,
        ivfpq_topk_from_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    index_dir = str(tmp_path_factory.mktemp("ivfpq_split") / "index")
    old = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    try:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "100")
        build_ivfpq_index(emb, index_dir)
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", old)

    _c, _r, codes_dir = ivfpq_index_paths(index_dir)
    cell_dirs = glob.glob(os.path.join(codes_dir, "cell=*"))
    assert cell_dirs, codes_dir
    files_per_cell = {
        d: len(glob.glob(os.path.join(d, "*.parquet"))) for d in cell_dirs
    }
    # at least one hot cell (> 100 code rows) must have split
    assert max(files_per_cell.values()) >= 2, files_per_cell

    # the store is complete (no rows lost to the split) ...
    stored = spark.read.parquet(codes_dir)
    assert stored.count() == n * PQ_M

    # ... and the probe is still a partition-pruned scan
    served = ivfpq_topk_from_index(spark, emb, index_dir)
    plan = explain_str(served)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan
    assert served.count() > 0
