"""Physical-plan assertions: the scale properties every query must keep.

Correctness is the oracle suite's job; this file pins the *plan shapes*
that make the same queries viable at 100 TB — filters and projections
reaching the parquet scan, dim joins broadcast instead of shuffled,
aggregates map-side-partial, and two global invariants swept across the
entire registered surface: no CartesianProduct and no row-at-a-time
Python evaluation (BatchEvalPython) anywhere. A regression that flips
any of these would still pass the value oracles at sf0.01 while dying
at cluster scale — these tests are the guard.
"""

from __future__ import annotations

import re

import pytest

from __spark_entry__ import queries


def explain_str(df, mode: str = "formatted") -> str:
    """The string `df.explain(mode)` prints, returned instead of printed."""
    qe = df._jdf.queryExecution()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(qe, mode)


# ---------------------------------------------------------------------------
# Scan pushdown: filter + projection must reach the parquet reader.
# ---------------------------------------------------------------------------


def test_q01_filter_and_projection_pushdown(spark, sf_dir):
    plan = explain_str(queries()["q01_filter_project"](spark, sf_dir))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, f"no PushedFilters in scan:\n{plan}"
    pushed = m.group(1)
    assert "l_returnflag" in pushed and "l_quantity" in pushed, pushed
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_shipdate",
        "l_returnflag",
        "l_quantity",
    }, f"scan reads more than the query needs: {sorted(read_cols)}"


def test_q03_year_filter_pushes_to_scan(spark, sf_dir):
    # year(o_orderdate) BETWEEN ... can't push as-is, but the planner
    # must still prune the read to the single column used.
    plan = explain_str(queries()["q03_orders_per_year"](spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and m.group(1).split(":")[0] == "o_orderdate", plan


# ---------------------------------------------------------------------------
# Join strategy: dim joins broadcast; the fact side never shuffles for
# a dimension lookup.
# ---------------------------------------------------------------------------


def test_q02_dim_joins_are_broadcast(spark, sf_dir):
    plan = explain_str(queries()["q02_join_filter"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, f"dim join degraded to shuffle:\n{plan}"
    assert "Exchange hashpartitioning" not in plan.split("BroadcastHashJoin")[0], (
        "fact side shuffled before a broadcast join"
    )


def test_q28_spatial_predicate_is_arrow_batched(spark, sf_dir):
    # The polygon dim ships to executors inside the UDF closure (it is
    # bounded, SURVEY §1.4) — so there must be no join node at all, and
    # the predicate must evaluate via Arrow batches, never pickled rows.
    plan = explain_str(queries()["q28_spatial_join"](spark, sf_dir), "simple")
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "partial_count" in plan, plan  # agg still map-side partial


# ---------------------------------------------------------------------------
# Aggregation: group-bys must be partial (map-side combine) + final,
# never a single global pass over raw rows.
# ---------------------------------------------------------------------------


def test_q03_aggregate_is_partial_then_final(spark, sf_dir):
    plan = explain_str(queries()["q03_orders_per_year"](spark, sf_dir), "simple")
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial_count" in plan, plan


# ---------------------------------------------------------------------------
# Global invariants, swept across the whole registered surface.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def all_plans(spark, sf_dir):
    out = {}
    for name, fn in queries().items():
        out[name] = explain_str(fn(spark, sf_dir), "simple")
    return out


def test_no_cartesian_product_anywhere(all_plans):
    offenders = [n for n, p in all_plans.items() if "CartesianProduct" in p]
    assert not offenders, f"cartesian products in: {offenders}"


def test_no_row_at_a_time_python_anywhere(all_plans):
    # Arrow-batched Python (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
    # is the sanctioned slow path; BatchEvalPython (pickled row loop) is not.
    offenders = [n for n, p in all_plans.items() if "BatchEvalPython" in p]
    assert not offenders, f"row-at-a-time Python UDFs in: {offenders}"


def _has_global_window(plan: str) -> bool:
    """True if a Window node's input chain is a single-partition exchange.

    Tree-structural, not substring: a scalar aggregate's SinglePartition
    exchange elsewhere in the same plan (e.g. q36's corpus count) must
    not flag the properly hash-partitioned top-k window beside it. A
    global window prints as Window -> [Sort ->] Exchange SinglePartition
    within its own child chain (strictly deeper indentation).
    """
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        m = re.search(r"[+:]- (Window|WindowGroupLimit) ", line)
        if not m:
            continue
        depth = m.start()
        for nxt in lines[i + 1 :]:
            node = re.search(r"[+:]- ", nxt)
            if not node or node.start() <= depth:
                break  # left the Window's subtree
            if "Exchange SinglePartition" in nxt:
                return True
            if not re.search(r"[+:]- (Sort|WindowGroupLimit|Window) ", nxt):
                break  # chain reached a differently-partitioned input
    return False


def test_no_single_partition_global_window_anywhere(all_plans):
    # A window over an empty partitionBy() plans as a single-partition
    # exchange — fatal at scale. The sanctioned dim-encoder uses run
    # over post-distinct bounded dictionaries (SURVEY §1.4); anything
    # else must justify itself here.
    offenders = [
        n
        for n, p in all_plans.items()
        if _has_global_window(p)
        # q109/q147's ranking window runs over the post-aggregate source
        # dictionary (|sources| rows) — the same bounded class as q07/q08
        and n not in {"q07_surrogate_keys", "q08_nullsafe_lookup",
                      "q109_budget_allocation", "q147_dedup_aware_budget"}
    ]
    assert not offenders, f"global single-partition windows in: {offenders}"


#: Categorical columns whose cardinality does NOT grow with the data:
#: a Window partitioned only by these over row-scale input funnels the
#: whole fact through |values| sort tasks — invisible to the
#: SinglePartition sweep above (3 partitions != 1) but the same disease
#: at 100 TB (the round-3 q105 lesson).
_BOUNDED_KEYS = {
    "l_returnflag",
    "l_linestatus",
    "o_orderstatus",
    "o_orderpriority",
    "flag",
    "status",
    "lang",
    "label",
}


def _bounded_key_raw_windows(plan: str) -> bool:
    """True if a Window node partitions ONLY by bounded-cardinality keys
    and its input chain reaches a scan without an intervening
    aggregation or group-limit.

    Windows over *aggregated* tables (HashAggregate below them) are the
    sanctioned q111 group-mode shape: their input is distinct-value- or
    group-cardinality-sized. WindowGroupLimit chains are also safe —
    the partial limit caps rows per key before the exchange. Only a
    bounded-key Window fed directly by row-scale data is flagged.
    """
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        m = re.search(r"[+:]- Window (\[.*)", line)
        if not m:
            continue
        # partition spec = 2nd bracketed list on the Window line
        parts = re.findall(r"\[([^\[\]]*)\]", m.group(1))
        if len(parts) < 2 or not parts[1].strip():
            continue
        keys = {re.sub(r"#\d+L?$", "", c.strip()) for c in parts[1].split(",")}
        if not keys <= _BOUNDED_KEYS:
            continue
        depth = re.search(r"[+:]- ", line).start()
        for nxt in lines[i + 1 :]:
            node = re.search(r"[+:]- ", nxt)
            if not node or node.start() <= depth:
                break  # left the Window's subtree
            if re.search(r"[+:]- (HashAggregate|SortAggregate|ObjectHashAggregate|WindowGroupLimit)", nxt):
                break  # bounded input: aggregated or group-limited below
            if re.search(r"[+:]- .*(FileScan|Scan parquet|Relation)", nxt):
                return True
    return False


def test_no_bounded_key_window_over_raw_fact_anywhere(all_plans):
    # q105's round-3 regression class: rank windows partitioned by the
    # 3-value returnflag over raw lineitem. Any window keyed only by a
    # bounded categorical must run over an aggregated (q111-shape) or
    # group-limited input.
    offenders = [n for n, p in all_plans.items() if _bounded_key_raw_windows(p)]
    assert not offenders, f"bounded-key windows over raw facts in: {offenders}"


def test_no_complex_typed_output_columns_anywhere(spark, sf_dir):
    # The driver's pandas canonicalizer sorts output columns by value
    # and cannot hash list/map/struct cells (r04's q127 red row). Every
    # registered query must render complex values (arrays of codes,
    # doc-id manifests, …) as delimited strings in its final projection.
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, fn in queries().items():
        for field in fn(spark, sf_dir).schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}:{field.dataType.simpleString()}")
    assert not offenders, f"complex-typed output columns: {offenders}"


# ---------------------------------------------------------------------------
# Round-3 operator plan shapes: the claims SCALE.md makes for the
# incremental/graph/search family, asserted structurally.
# ---------------------------------------------------------------------------


def test_q95_incremental_dedup_probes_history_with_anti_join(spark, sf_dir):
    plan = explain_str(queries()["q95_incremental_dedup"](spark, sf_dir))
    assert "LeftAnti" in plan, plan


def test_q99_stratified_sample_uses_window_group_limit(spark, sf_dir):
    # only k rows per stratum may cross the final exchange
    plan = explain_str(queries()["q99_stratified_topk_sample"](spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


def test_q113_stratified_weighted_sample_uses_window_group_limit(spark, sf_dir):
    # the per-group Efraimidis-Spirakis draw must keep q99's shape:
    # k rows per language ahead of the final exchange
    plan = explain_str(queries()["q113_stratified_weighted_sample"](spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


def test_q103_bm25_broadcasts_df_and_stats(spark, sf_dir):
    # df and N/avgdl are dimension-sized: the tf side must never
    # shuffle for them
    plan = explain_str(queries()["q103_bm25_search"](spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_q96_cell_join_has_hot_cell_guard(spark, sf_dir):
    # the kNN self-join's per-cell pair expansion is quadratic in cell
    # size; the _KNN_MAX_CELL guard must gate the join via a broadcast
    # cell filter so a degenerate quantizer cell cannot explode a stage
    from whale_sightings_spark.plans.queries_corpus import _KNN_MAX_CELL

    plan = explain_str(queries()["q96_knn_self_join"](spark, sf_dir), "simple")
    assert re.search(rf"Filter \(+\w+#\d+L? > 1\) AND \(\w+#\d+L? <= {_KNN_MAX_CELL}\)", plan), plan
    assert "BroadcastHashJoin" in plan, plan


def test_q102_weighted_sample_is_take_ordered(spark, sf_dir):
    # global top-k must be TakeOrdered, not sort-all + limit
    plan = explain_str(queries()["q102_weighted_sample"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_q122_multiprobe_keeps_topk_mapside(spark, sf_dir):
    # both the probe-selection window and the final per-query top-k
    # must pass WindowGroupLimit so only k rows per query cross any
    # exchange; the probe table reaches the corpus scan as a broadcast
    plan = explain_str(queries()["q122_ann_multiprobe"](spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q123_hybrid_rrf_final_topk_is_take_ordered(spark, sf_dir):
    # fusion of two k-sized lists: the final cut must be TakeOrdered,
    # and no stage may fall back to a row-at-a-time python eval
    plan = explain_str(queries()["q123_hybrid_rrf"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_q137_adc_luts_are_broadcast(spark, sf_dir):
    # the per-query distance LUT and codebook must reach the corpus
    # code table as broadcasts — the corpus side never shuffles for them
    plan = explain_str(queries()["q137_pq_adc_search"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_q153_ivf_adc_probe_and_lut_are_broadcast(spark, sf_dir):
    # the composed serving path: probe table and ADC LUT broadcast to
    # the cell-keyed code table; top-k per query stays map-side
    plan = explain_str(queries()["q153_ivf_adc_search"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_q161_ivfpq_lut_broadcast_and_mapside_topk(spark, sf_dir):
    # the full serving path: per-probed-cell residual LUT broadcasts to
    # the cell-keyed residual code table; top-k per query stays map-side
    plan = explain_str(queries()["q161_ivfpq_search"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_q125_rank_normalization_is_window_free(spark, sf_dir):
    # decile-rank normalization must come from broadcast percentile
    # boundaries, never a percent_rank-style window over the corpus
    plan = explain_str(queries()["q125_quality_ensemble"](spark, sf_dir))
    assert "Window " not in plan and "WindowExec" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q173_stored_index_probe_is_partition_pruned(spark, sf_dir):
    """The serve-from-store path must hit the cell-partitioned code
    table with a partition filter (the probed cells), so the scan reads
    only n_probe of the IVF_K inverted lists — the on-disk layout claim
    SCALE.md makes for 100 TB, asserted on the actual plan. Also: no
    Lloyd training in this DAG means no createDataFrame-backed codebook
    (LocalTableScan/scan over ExistingRDD) — the codebooks come from
    parquet scans of the stored artifact."""
    plan = explain_str(queries()["q173_ivfpq_search_stored"](spark, sf_dir))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, f"no PartitionFilters on the code-table scan:\n{plan}"
    assert "cell" in m.group(1) and "IN" in m.group(1).upper(), m.group(1)
    # serve-many: the trained codebooks are parquet artifacts, not
    # freshly-collected local relations
    assert "LocalTableScan" not in plan, "a codebook was retrained inline"


def test_ann_family_serves_from_stored_index(spark, sf_dir):
    """Round-9 (VERDICT r8 #1): the IVF/PQ search-and-recall family
    serves codebooks, code tables, and trained-cell assignments off
    the persisted q172 artifact — no Lloyd training (which would show
    as a createDataFrame-backed LocalTableScan codebook and an
    ExistingRDD training sample) and no encode pass in any serving
    DAG. q155/q172 remain the inline build/audit queries."""
    from whale_sightings_spark.plans.queries_llm import _ivfpq_index_dir

    _ivfpq_index_dir(spark, sf_dir)  # build once if absent
    for name in (
        "q127_pq_encode",
        "q137_pq_adc_search",
        "q153_ivf_adc_search",
        "q154_ivf_adc_recall",
        "q156_ivf_trained_recall",
        "q161_ivfpq_search",
        "q165_probe_recall_curve",
    ):
        plan = explain_str(queries()[name](spark, sf_dir))
        assert "LocalTableScan" not in plan, (
            f"{name} retrained a codebook inline:\n{plan}"
        )
        assert "ExistingRDD" not in plan, (
            f"{name} materialized a training sample inline:\n{plan}"
        )
    # the pure code-table reads scan the stored artifact directly
    for name in ("q127_pq_encode", "q137_pq_adc_search", "q153_ivf_adc_search"):
        plan = explain_str(queries()[name](spark, sf_dir))
        assert "pq_code" in plan, f"{name} does not scan the store:\n{plan}"
    # q153's probe of the label-cell inverted lists is partition-pruned
    plan = explain_str(queries()["q153_ivf_adc_search"](spark, sf_dir))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan


def test_bpe_serving_queries_read_stored_artifact(spark, sf_dir):
    """Round-7 (VERDICT r6 #2): q177-q180 + q188 SERVE from the
    persisted tokenizer artifact — their DAGs scan the stored parquet
    tables and contain no createDataFrame-backed merge table
    (LocalTableScan = a driver-side retrain happened in this plan).
    q176 stays the build sign-off (build-if-absent then read-back)."""
    from whale_sightings_spark.plans.queries_textops import _bpe_artifact_dir

    artifact = _bpe_artifact_dir(spark, sf_dir)  # build once if absent
    for name in (
        "q177_bpe_fertility",
        "q178_bpe_vocab",
        "q179_bpe_segmentations",
        "q180_bpe_packing",
        "q188_bpe_drift",
    ):
        plan = explain_str(queries()[name](spark, sf_dir))
        assert "LocalTableScan" not in plan, f"{name} retrained inline:\n{plan}"
    # the pure store-served plans scan the artifact, not the corpus
    for name in ("q178_bpe_vocab", "q179_bpe_segmentations"):
        plan = explain_str(queries()[name](spark, sf_dir))
        assert "symbols" in plan, f"{name} does not scan the store:\n{plan}"
        assert "documents.parquet" not in plan, f"{name} rescans the corpus"
    # build-if-absent is a cache: a second call must not rebuild
    import os

    _syms, merges_dir = __import__(
        "whale_sightings_spark.operators.bpe", fromlist=["bpe_artifact_paths"]
    ).bpe_artifact_paths(artifact)
    mt0 = os.path.getmtime(os.path.join(merges_dir, "_SUCCESS"))
    queries()["q176_bpe_merge_table"](spark, sf_dir).collect()
    assert os.path.getmtime(os.path.join(merges_dir, "_SUCCESS")) == mt0


def test_shingle_family_serves_from_stored_index(spark, sf_dir):
    """Round-8 (VERDICT r7 #3): the contamination/overlap/novelty
    family serves from the persisted shingle inverted index — their
    DAGs contain no Generate node (no explode-of-shingles, i.e. no
    re-tokenization of the corpus), and apart from q184's 2-column
    (doc_id, source) rollup join they never rescan documents at all.
    Build-if-absent must also behave as a cache (no rebuild on the
    second call)."""
    import os

    from whale_sightings_spark.operators.shingles import (
        shingle_artifact_paths,
    )
    from whale_sightings_spark.plans.shingle_store import shingle_artifact_dir

    art = shingle_artifact_dir(spark, sf_dir)  # build once if absent
    served = (
        "q14_dedup_ngram_jaccard",
        "q51_contamination",
        "q119_contamination_screen",
        "q134_neardup_precision_recall",
        "q139_source_overlap",
        "q141_jaccard_histogram",
        "q184_bloom_prescreen",
        "q191_prefix_jaccard_join",
        "q234_source_overlap_matrix",
    )
    for name in served:
        plan = explain_str(queries()[name](spark, sf_dir))
        # q14/q141's one Generate is the band-bucket pair expansion
        # over STORED postings (dedup._bucket_candidate_pairs) and
        # q184's is the 3-element bloom-position explode per stored
        # gram — row-local fan-outs of store rows, not re-shingles
        # (and all three plans are corpus-text-free per the scan
        # asserts below); every other plan must be Generate-free
        if name not in (
            "q14_dedup_ngram_jaccard",
            "q134_neardup_precision_recall",
            "q141_jaccard_histogram",
            "q184_bloom_prescreen",
        ):
            assert "Generate" not in plan, f"{name} re-shingled inline:\n{plan}"
        assert "postings" in plan or "src5" in plan, (
            f"{name} does not scan the store:\n{plan}"
        )
        if name != "q184_bloom_prescreen":
            assert "documents.parquet" not in plan, (
                f"{name} rescans the corpus:\n{plan}"
            )
    # q184's one remaining corpus scan must be pruned to the 2 rollup
    # columns — tokenizing `text` again would defeat the artifact
    q184_plan = explain_str(
        queries()["q184_bloom_prescreen"](spark, sf_dir)
    )
    m = re.search(r"documents\.parquet.*?ReadSchema: ([^\n]*)", q184_plan, re.S)
    assert m and "text" not in m.group(1), m.group(1) if m else q184_plan
    # r9: the MinHash audit/incremental probes keep their signature
    # derivation inline (it is the mechanism under test) but their
    # exact-Jaccard verify side must come off the stored postings.
    # r13: the verify-side tables sit behind localCheckpoint barriers
    # (the replay fix), which hide their lineage as ExistingRDD in the
    # executed plan — assert the LOGICAL shape with barriers disabled,
    # which is exactly the store-served invariant under test.
    from unittest.mock import patch

    # Spark 4: pyspark.sql.DataFrame is the abstract base; the barrier
    # calls dispatch to the classic concrete class — patch THAT
    from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF

    with patch.object(
        _ClassicDF, "localCheckpoint", lambda self, *a, **kw: self
    ):
        for name in ("q129_minhash_estimate_audit", "q138_incremental_neardup"):
            plan = explain_str(queries()[name](spark, sf_dir))
            assert "postings" in plan, (
                f"{name} verify side does not scan the store:\n{plan}"
            )
    # build-if-absent is a cache: a second call must not rebuild
    _, _, _, src5_dir = shingle_artifact_paths(art)
    mt0 = os.path.getmtime(os.path.join(src5_dir, "_SUCCESS"))
    queries()["q51_contamination"](spark, sf_dir).collect()
    assert os.path.getmtime(os.path.join(src5_dir, "_SUCCESS")) == mt0


def test_shingle_postings_probe_is_bucket_partitioned(spark, sf_dir):
    """The stored posting table is laid out by shingle-hash bucket —
    the partition column must be visible to the scan so a
    known-shingle probe can prune (the q173 partition-layout claim,
    asserted for the text index)."""
    from whale_sightings_spark.operators.shingles import (
        N_POSTING_BUCKETS,
        stored_postings,
    )
    from whale_sightings_spark.plans.shingle_store import shingle_artifact_dir

    from pyspark.sql import functions as F

    art = shingle_artifact_dir(spark, sf_dir)
    pruned = stored_postings(spark, art).filter(F.col("bucket").isin([0, 1]))
    plan = explain_str(pruned)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan
    # and the layout actually has the declared bucket count on disk
    import os

    postings_dir = art.rstrip("/") + "/postings"
    n_parts = len(
        [d for d in os.listdir(postings_dir) if d.startswith("bucket=")]
    )
    assert 0 < n_parts <= N_POSTING_BUCKETS


def test_cluster_family_serves_from_stored_labels(spark, sf_dir):
    """Round-8 (VERDICT r7 #7): the cluster consumers serve converged
    component labels off the persisted cluster artifact — no pair
    generation and no propagation loop in their DAGs. The inline loop
    would show as Scan ExistingRDD (localCheckpoint rounds); the
    store-served plans must scan the labels parquet instead. q243 is
    the drift audit and legitimately runs the history convergence
    inline, so it is excluded."""
    import os

    from whale_sightings_spark.operators.dedup import cluster_artifact_paths
    from whale_sightings_spark.plans.cluster_store import (
        embed_cluster_dir,
        text_cluster_dir,
    )

    text_art = text_cluster_dir(spark, sf_dir)  # build once if absent
    embed_cluster_dir(spark, sf_dir)
    for name in (
        "q100_components_converged",
        "q126_leakage_safe_split",
        "q186_quality_survivors",
        "q132_semantic_dedup",
        "q175_semantic_dedup_stored",
        "q246_embed_leakage_split",
    ):
        plan = explain_str(queries()[name](spark, sf_dir))
        assert "ExistingRDD" not in plan, (
            f"{name} ran the propagation loop inline:\n{plan}"
        )
        assert "labels" in plan, f"{name} does not scan the store:\n{plan}"
    # q100 is the pure build sign-off: labels only, no corpus rescan
    plan = explain_str(queries()["q100_components_converged"](spark, sf_dir))
    assert "documents.parquet" not in plan, plan
    # build-if-absent is a cache: a second call must not rebuild
    marker = os.path.join(cluster_artifact_paths(text_art), "_SUCCESS")
    mt0 = os.path.getmtime(marker)
    queries()["q126_leakage_safe_split"](spark, sf_dir).collect()
    assert os.path.getmtime(marker) == mt0


def test_graph_family_serves_from_stored_pairs(spark, sf_dir):
    """Round-9 (VERDICT r8 #2): the near-dup graph family (PageRank,
    triangles, k-core, components, the pair query itself, q134's pred
    side) serves the SimHash edge table off the persisted cluster
    artifact's pair table — no shingle/band Generate and no
    documents.parquet rescans anywhere in their DAGs. The iterative
    members checkpoint rounds (ExistingRDD is expected); the claim
    here is that the corpus is never re-tokenized. Build-if-absent
    must behave as a cache (no rebuild on a second call)."""
    import os

    from whale_sightings_spark.operators.dedup import (
        N_PAIR_BUCKETS,
        cluster_artifact_paths,
        cluster_pairs_path,
    )
    from whale_sightings_spark.plans.cluster_store import text_cluster_dir

    art = text_cluster_dir(spark, sf_dir)  # build once if absent
    for name in (
        "q16_dedup_simhash",
        "q29_dedup_components",
        "q106_pagerank",
        "q107_triangles",
        "q112_pagerank_converged",
        "q194_kcore_profile",
        "q252_neardup_degree_profile",
        "q253_cluster_merge_pressure",
    ):
        plan = explain_str(queries()[name](spark, sf_dir))
        assert "Generate" not in plan, f"{name} re-shingled inline:\n{plan}"
        assert "documents.parquet" not in plan, (
            f"{name} rescans the corpus:\n{plan}"
        )
    # the non-iterative members must visibly scan the stored pair table
    for name in (
        "q16_dedup_simhash",
        "q134_neardup_precision_recall",
        "q252_neardup_degree_profile",
        "q253_cluster_merge_pressure",
    ):
        plan = explain_str(queries()[name](spark, sf_dir))
        assert "pairs" in plan, f"{name} does not scan the store:\n{plan}"
    # the pair table is laid out by hash(doc_a) bucket so keyed edge
    # probes prune (the posting-table layout claim, for the edge table)
    pairs_dir = cluster_pairs_path(art)
    n_parts = len(
        [d for d in os.listdir(pairs_dir) if d.startswith("pbucket=")]
    )
    assert 0 < n_parts <= N_PAIR_BUCKETS
    # build-if-absent is a cache: a second call must not rebuild
    marker = os.path.join(cluster_artifact_paths(art), "_SUCCESS")
    mt0 = os.path.getmtime(marker)
    queries()["q107_triangles"](spark, sf_dir).collect()
    assert os.path.getmtime(marker) == mt0


def test_graph_analytics_serve_from_derived_tables(spark, sf_dir):
    """Round-10 (VERDICT r9 #2): converged graph analytics persist as
    DERIVED tables of the text cluster artifact — q112/q194 are the
    BUILD sign-offs that read the stored scores back, q256/q257 are
    the serve twins. None of their serving DAGs may contain an
    iterative loop (ExistingRDD = a checkpointed damping/peel round)
    or a corpus rescan; the stored table must be visibly scanned."""
    import os

    from whale_sightings_spark.plans.cluster_store import (
        stored_kcore_profile,
        stored_pagerank,
        text_cluster_dir,
    )

    from whale_sightings_spark.plans.cluster_store import (
        stored_triangle_census,
    )

    stored_pagerank(spark, sf_dir)  # build once if absent
    stored_kcore_profile(spark, sf_dir)
    stored_triangle_census(spark, sf_dir)
    expect_scan = {
        "q112_pagerank_converged": "derived_pagerank",
        "q194_kcore_profile": "derived_kcore",
        "q107_triangles": "derived_census",
        "q256_central_docs_serve": "derived_pagerank",
        "q257_component_centrality_serve": "derived_pagerank",
    }
    for name, table in expect_scan.items():
        plan = explain_str(queries()[name](spark, sf_dir))
        assert "ExistingRDD" not in plan, (
            f"{name} ran the iterative loop inline:\n{plan}"
        )
        assert "documents.parquet" not in plan, (
            f"{name} rescans the corpus:\n{plan}"
        )
        assert table in plan, f"{name} does not scan {table}:\n{plan}"
    # the serve twins consume the labels store too
    for name in ("q256_central_docs_serve", "q257_component_centrality_serve"):
        plan = explain_str(queries()[name](spark, sf_dir))
        assert "labels" in plan, f"{name} does not scan labels:\n{plan}"
    # build-if-absent is a cache: a second call must not rebuild
    art = text_cluster_dir(spark, sf_dir)
    marker = os.path.join(art, "derived_pagerank", "_SUCCESS")
    mt0 = os.path.getmtime(marker)
    queries()["q256_central_docs_serve"](spark, sf_dir).collect()
    assert os.path.getmtime(marker) == mt0


def test_rebuild_drift_audits_do_not_retokenize(spark, sf_dir):
    """Round-12 (VERDICT r11 #1): the text-graph rebuild-drift audits
    (q243 labels, q251 pairs, q258 pagerank) consume the SHARED
    persisted history pair set (`derived_histpairs` — banding,
    hot-bucket caps and Hamming verify over the stored sigs sliced to
    the hold, derived once per artifact generation) instead of each
    re-deriving it per query; the iterative rounds (label convergence,
    PageRank fixpoint — where rebuild drift actually lives) still
    re-derive from first principles. The claim: no documents.parquet
    scan anywhere in their DAGs, and the histpairs table visibly
    scanned. (ExistingRDD is expected — q243/q258 checkpoint their
    convergence rounds.)"""
    from whale_sightings_spark.plans.cluster_store import text_cluster_dir

    text_cluster_dir(spark, sf_dir)  # build once if absent
    for name in (
        "q243_cluster_rebuild_drift",
        "q251_pair_rebuild_drift",
        "q258_pagerank_rebuild_drift",
    ):
        plan = explain_str(queries()[name](spark, sf_dir))
        assert "documents.parquet" not in plan, (
            f"{name} re-tokenizes the corpus:\n{plan}"
        )
        assert (
            "histpairs" in plan
            or "histlabels" in plan
            or "histpagerank" in plan
            or "ExistingRDD" in plan
        ), (
            f"{name} does not serve from the stored history tables:"
            f"\n{plan}"
        )


def test_q15_q19_serve_from_stored_pairs(spark, sf_dir):
    """Round-10 (VERDICT r9 #1): the two family-origin near-dup
    queries — q15 (MinHash-LSH over documents) and q19 (hyperplane-LSH
    + cosine over embeddings) — serve from their persisted artifacts'
    weighted pair tables instead of re-running the full-corpus
    shingle+sign / sign+verify passes per refresh. At 100 TB those
    were the last two avoidable corpus passes per dedup refresh."""
    import os

    from whale_sightings_spark.operators.dedup import (
        cluster_artifact_paths,
    )
    from whale_sightings_spark.plans.cluster_store import (
        embed_cluster_dir,
        minhash_cluster_dir,
    )

    mh_art = minhash_cluster_dir(spark, sf_dir)  # build once if absent
    embed_cluster_dir(spark, sf_dir)
    plan = explain_str(queries()["q15_dedup_minhash_lsh"](spark, sf_dir))
    assert "Generate" not in plan, f"q15 re-shingled inline:\n{plan}"
    assert "documents.parquet" not in plan, f"q15 rescans the corpus:\n{plan}"
    assert "pairs" in plan, f"q15 does not scan the store:\n{plan}"
    plan = explain_str(queries()["q19_embedding_neardup"](spark, sf_dir))
    assert "embeddings.parquet" not in plan, (
        f"q19 rescans the vectors:\n{plan}"
    )
    assert "pairs" in plan, f"q19 does not scan the store:\n{plan}"
    # build-if-absent is a cache: a second call must not rebuild
    marker = os.path.join(cluster_artifact_paths(mh_art), "_SUCCESS")
    mt0 = os.path.getmtime(marker)
    queries()["q15_dedup_minhash_lsh"](spark, sf_dir).collect()
    assert os.path.getmtime(marker) == mt0


def test_q255_assign_serves_from_stored_embed_artifact(spark, sf_dir):
    """q255's assignment must probe the STORED history artifact
    (band index, frozen bucket stats, vectors, labels) — the only
    corpus scan is the arriving 2% slice of embeddings; no label
    propagation loop and no pair generation appear in the serving
    DAG (convergence happened once, at build)."""
    plan = explain_str(
        queries()["q255_embed_incremental_assign"](spark, sf_dir)
    )
    for table in ("ebands", "eband_stats", "evecs", "labels"):
        assert table in plan, f"assign does not scan {table}:\n{plan}"
    assert "documents.parquet" not in plan, plan


def test_q244_eval_probe_is_partition_pruned(spark, sf_dir):
    """q244's probe of the stored posting table must carry a
    PartitionFilter on the eval set's bucket ids — the index is read
    |eval buckets|/N_POSTING_BUCKETS at rest, never fully (the q173
    pruned-probe pattern on the text index)."""
    plan = explain_str(queries()["q244_pruned_eval_probe"](spark, sf_dir))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan
    assert "Generate" not in plan, f"re-shingled inline:\n{plan}"
    assert "documents.parquet" not in plan, plan


def test_q211_markov_model_join_is_broadcast(spark, sf_dir):
    # the trained transition model is |types|^2-bounded: the held-out
    # transition stream must probe it via BroadcastHashJoin, never a
    # shuffled join keyed on the raw fact
    plan = explain_str(queries()["q211_markov_backtest"](spark, sf_dir))
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q236_star_join_pushes_date_range_and_broadcasts_dims(spark, sf_dir):
    # the Q5-shape star join must (a) push the o_orderdate range to the
    # parquet scan (the reason it is written in range form, not
    # year()=), and (b) never fall back to a cartesian; dims ride
    # broadcasts (at bench SF AQE folds every join to BHJ)
    plan = explain_str(
        queries()["q236_local_supplier_revenue"](spark, sf_dir)
    )
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(o_orderdate", plan), plan
    assert re.search(r"PushedFilters:.*LessThan\(o_orderdate", plan), plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q214_wordpiece_vocab_rides_as_broadcast_list(spark, sf_dir):
    # the greedy fold's vocabulary is a 1-row collected list crossed
    # onto the dictionary — it must be a broadcast, and the fold must
    # stay native (no Python eval nodes anywhere in the plan)
    plan = explain_str(queries()["q214_wordpiece_audit"](spark, sf_dir))
    assert "BroadcastExchange" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_lm_family_serves_from_stored_ngram_store(spark, sf_dir):
    """Round-8: the perplexity/LM family serves from the persisted
    n-gram LM store — their DAGs contain no Generate node (no
    posexplode-of-tokens, i.e. no re-tokenization of the corpus) and
    never rescan documents at all. Build-if-absent must also behave
    as a cache (no rebuild on the second call)."""
    import os

    from whale_sightings_spark.operators.ngram_lm import lm_artifact_paths
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    art = lm_artifact_dir(spark, sf_dir)  # build once if absent
    served = (
        "q97_bigram_condprob",
        "q120_perplexity_filter",
        "q121_oov_rate",
        "q136_ppl_interpolated",
        "q185_ppl_stupid_backoff",
        "q216_ppl_kneser_ney",
        "q241_good_turing_mass",
    )
    for name in served:
        plan = explain_str(queries()[name](spark, sf_dir))
        assert "Generate" not in plan, f"{name} re-tokenized inline:\n{plan}"
        assert "documents.parquet" not in plan, (
            f"{name} rescans the corpus:\n{plan}"
        )
        assert "doc_uni" in plan or "doc_big" in plan or "doc_tri" in plan or (
            "pairs" in plan
        ), f"{name} does not scan the store:\n{plan}"
    # build-if-absent is a cache: a second call must not rebuild
    marker = os.path.join(lm_artifact_paths(art)["pairs"], "_SUCCESS")
    mt0 = os.path.getmtime(marker)
    queries()["q97_bigram_condprob"](spark, sf_dir).collect()
    assert os.path.getmtime(marker) == mt0


def test_lm_doc_tables_probe_is_bucket_partitioned(spark, sf_dir):
    """The stored per-doc bigram table is laid out by n-gram-hash
    bucket — the partition column must be visible to the scan so a
    known-bigram probe can prune (the shingle-postings layout claim,
    asserted for the LM store)."""
    import os

    from pyspark.sql import functions as F

    from whale_sightings_spark.operators.ngram_lm import (
        N_LM_BUCKETS,
        stored_doc_big,
    )
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    art = lm_artifact_dir(spark, sf_dir)
    pruned = stored_doc_big(spark, art).filter(F.col("bucket").isin([0, 1]))
    plan = explain_str(pruned)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan
    big_dir = art.rstrip("/") + "/doc_big"
    n_parts = len(
        [d for d in os.listdir(big_dir) if d.startswith("bucket=")]
    )
    assert 0 < n_parts <= N_LM_BUCKETS


def test_q250_lm_eval_probe_is_partition_pruned(spark, sf_dir):
    """q250's probe of the stored per-doc bigram table must carry a
    PartitionFilter on the eval set's bucket ids (the q244 pattern on
    the LM store), never re-tokenize, and touch documents only for
    the 2-column source rollup (no text)."""
    plan = explain_str(queries()["q250_pruned_lm_eval_probe"](spark, sf_dir))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan
    assert "Generate" not in plan, f"re-tokenized inline:\n{plan}"
    m2 = re.search(r"documents\.parquet.*?ReadSchema: ([^\n]*)", plan, re.S)
    assert m2 and "text" not in m2.group(1), m2.group(1) if m2 else plan


def test_q249_agreement_serves_ppl_from_store(spark, sf_dir):
    """q249's perplexity side must come from the stored LM (no
    Generate — the one corpus scan is the row-local quality side,
    which needs text but never explodes it)."""
    plan = explain_str(
        queries()["q249_ppl_quality_agreement"](spark, sf_dir)
    )
    assert "Generate" not in plan, f"re-tokenized inline:\n{plan}"
    assert "doc_big" in plan or "pairs" in plan, (
        f"ppl side does not scan the store:\n{plan}"
    )


def test_retrieval_family_serves_from_lm_store(spark, sf_dir):
    """Round-9: the lexical-retrieval family (BM25, its nDCG
    evaluation, Dirichlet QL) and the vocab-statistics family (top-k
    wordcount, coverage curve, Zipf fit, token histogram) serve from
    the persisted LM store — no Generate (no tokenize) and no
    documents.parquet anywhere in their serving DAGs; the tf probes
    carry a PartitionFilter on the query terms' buckets so the stored
    postings are read |term buckets|/N_LM_BUCKETS at rest."""
    from whale_sightings_spark.plans.lm_store import lm_artifact_dir

    lm_artifact_dir(spark, sf_dir)  # build once if absent
    no_generate = (
        "q103_bm25_search",
        "q190_query_likelihood",
        "q30_vocab_topk",
        "q55_token_histogram",
        "q254_index_stats",
    )
    # q140/q128/q142 posexplode a COLLECTED k-row list (the sanctioned
    # rank-via-collect shape) — their Generate is k-sized, not a
    # corpus tokenize, so only the no-corpus-scan claim applies
    k_row_explode = (
        "q140_bm25_ndcg",
        "q128_vocab_coverage",
        "q142_zipf_fit",
    )
    # q74's PMI stream is doc_uni's (doc_id, tok) projection
    plan74 = explain_str(queries()["q74_pmi_pairs"](spark, sf_dir))
    assert "Generate" not in plan74, f"q74 re-tokenized inline:\n{plan74}"
    assert "documents.parquet" not in plan74, plan74
    assert "doc_uni" in plan74, plan74
    for name in no_generate + k_row_explode:
        plan = explain_str(queries()[name](spark, sf_dir))
        if name in no_generate:
            assert "Generate" not in plan, (
                f"{name} re-tokenized inline:\n{plan}"
            )
        assert "documents.parquet" not in plan, (
            f"{name} rescans the corpus:\n{plan}"
        )
        assert "doc_uni" in plan or "doc_len" in plan or "/uni" in plan, (
            f"{name} does not scan the store:\n{plan}"
        )
    # the term probes prune: every doc_uni scan in the BM25/QL plans
    # must carry a bucket PartitionFilter
    for name in ("q103_bm25_search", "q190_query_likelihood"):
        plan = explain_str(queries()[name](spark, sf_dir))
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "bucket" in m.group(1), f"{name} probe unpruned:\n{plan}"
    # q123's hybrid fusion: lexical side from the store (its rank list
    # is a k-row collect-posexplode, so Generate is expected), semantic
    # side reads embeddings only — documents never scanned
    plan = explain_str(queries()["q123_hybrid_rrf"](spark, sf_dir))
    assert "documents.parquet" not in plan, plan
    assert "doc_uni" in plan and "doc_len" in plan, plan
