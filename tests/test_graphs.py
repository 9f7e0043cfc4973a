"""Unit tests for operators.graphs: degree orientation, triangle
census, fixed-round vs converged PageRank, and the no-dangling-node
invariant the PageRank algebra relies on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from whale_sightings_spark.operators import graphs as GR


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_symmetric_edges_have_no_dangling_nodes(spark):
    # the PageRank algebra omits the dangling-mass term because every
    # node of the symmetrized pair graph has out-degree >= 1 — both
    # endpoints of every pair appear as src. Assert the invariant.
    pairs = _pairs(spark, [(1, 2), (2, 3), (7, 9)])
    edges = GR.symmetric_edges(pairs)
    nodes = (
        pairs.select(F.col("doc_a").alias("v"))
        .unionByName(pairs.select(F.col("doc_b").alias("v")))
        .distinct()
    )
    out_deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    dangling = nodes.join(out_deg, nodes.v == out_deg.src, "left_anti")
    assert dangling.count() == 0
    assert out_deg.agg(F.min("d")).collect()[0][0] >= 1


def test_orient_by_degree_bounds_star_hub_fanout(spark):
    # star graph, hub = 0 (degree 8, lowest id): id-orientation would
    # give the hub out-degree 8; degree orientation points every edge
    # leaf -> hub, so max out-degree is 1 — the wedge-join fan-out
    # bound that matters on hub nodes at scale.
    pairs = _pairs(spark, [(0, i) for i in range(1, 9)])
    e = GR.orient_by_degree(pairs)
    max_out = e.groupBy("a").agg(F.count("*").alias("d")).agg(F.max("d")).collect()[0][0]
    assert max_out == 1
    # hub receives every edge
    assert e.filter(F.col("b") == 0).count() == 8


def test_triangle_census_counts_known_graphs(spark):
    # K4: 4 triangles, 6 edges, 4 nodes
    k4 = _pairs(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    row = GR.triangle_census(k4).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 6, 4)
    # star: no triangles
    star = _pairs(spark, [(0, i) for i in range(1, 6)])
    row = GR.triangle_census(star).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (6, 5, 0)


def test_triangle_census_is_orientation_invariant(spark):
    # triangle + pendant, ids chosen so degree order != id order:
    # node 9 has the highest degree but also the highest id.
    pairs = _pairs(spark, [(1, 9), (2, 9), (1, 2), (0, 9)])
    row = GR.triangle_census(pairs).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 4, 1)


def test_pagerank_converged_matches_deep_fixed_iteration(spark):
    # a path graph 0-1-2-3: asymmetric degrees, so ranks differ by
    # node. The converged ranks must agree with a deep fixed-round
    # unroll to well below the tolerance's error bound tol/(1-d).
    pairs = _pairs(spark, [(0, 1), (1, 2), (2, 3)])
    conv = {
        r.v: r.pr for r in GR.pagerank_converged(pairs, tol=1e-10).collect()
    }
    deep = {
        r.v: r.pr
        for r in GR.pagerank_fixed(pairs, 60, damp=GR.DAMPING_FAST).collect()
    }
    assert set(conv) == set(deep)
    for v in conv:
        assert math.isclose(conv[v], deep[v], abs_tol=1e-9), (v, conv[v], deep[v])
    # ranks sum to 1 (no dangling leakage)
    assert math.isclose(sum(conv.values()), 1.0, abs_tol=1e-9)


def test_pagerank_fixed_uniform_on_regular_graph(spark):
    # on a cycle (2-regular), PageRank is exactly uniform at every
    # round — a closed-form the implementation must reproduce.
    n = 6
    pairs = _pairs(spark, [(i, (i + 1) % n) for i in range(n)])
    pr = GR.pagerank_fixed(pairs, 3).collect()
    assert len(pr) == n
    for r in pr:
        assert math.isclose(r.pr, 1.0 / n, abs_tol=1e-12), r


def test_orient_by_degree_sqrt_m_bound_on_hub_heavy_graph(spark):
    """Pin the wedge-fanout property, not just the pure-star case: on a
    hub-heavy composite (one 60-leaf hub + a 12-clique + bridges), the
    low->high orientation must keep EVERY node's out-degree within the
    theoretical sqrt(2m) bound (out-neighbors of v all have degree >=
    deg(v) >= out(v), so 2m >= out(v)^2) — the invariant that makes the
    q107 wedge join hub-safe at any scale."""
    edges = [(0, i) for i in range(1, 61)]                       # hub 0
    clique = list(range(100, 112))
    edges += [(a, b) for a in clique for b in clique if a < b]   # 12-clique
    edges += [(i, 100 + i) for i in range(1, 9)]                 # bridges
    pairs = _pairs(spark, edges)
    e = GR.orient_by_degree(pairs)
    m = e.count()
    assert m == len(edges)  # each undirected edge oriented exactly once
    out = e.groupBy("a").agg(F.count("*").alias("d"))
    max_out = out.agg(F.max("d")).collect()[0][0]
    assert max_out <= math.isqrt(2 * m) + 1, (max_out, m)
    # the hub absorbs its star edges: they all point INTO node 0
    assert e.filter((F.col("a") == 0)).count() == 0


def test_cluster_pair_table_matches_fresh_derive(spark, sf_dir):
    """Round-9 seventh-artifact contract: the persisted pair/edge table
    is row-equal to re-running the SimHash pair generator on the same
    corpus (the build is deterministic), and the stored labels are
    exactly the convergence of the stored pairs — so every graph-family
    query served from the store returns what the inline derive would."""
    from whale_sightings_spark.operators import dedup as DD
    from whale_sightings_spark.plans.cluster_store import (
        stored_text_pairs,
        text_cluster_dir,
    )
    from whale_sightings_spark.schemas import load_table

    art = text_cluster_dir(spark, sf_dir)
    stored = stored_text_pairs(spark, sf_dir)
    fresh = DD.simhash_pairs(load_table(spark, sf_dir, "documents"))
    key = lambda r: (r["doc_a"], r["doc_b"], r["hamming"])  # noqa: E731
    assert sorted(map(key, stored.collect())) == sorted(
        map(key, fresh.collect())
    )
    labels_stored = {
        (r["doc_id"], r["label"])
        for r in DD.stored_cluster_labels(spark, art).collect()
    }
    labels_fresh = {
        (r["doc_id"], r["label"])
        for r in DD.dedup_components_converged(stored).collect()
    }
    assert labels_stored == labels_fresh


def test_cluster_artifact_torn_build_reads_as_absent(spark, sf_dir, monkeypatch, tmp_path):
    """Crash contract: pairs are written FIRST, labels (the _SUCCESS
    carrier) LAST — an artifact torn between the two tables must read
    as absent and trigger a full rebuild, never serve pairs without
    labels."""
    import os
    import shutil

    from whale_sightings_spark.operators.dedup import (
        cluster_artifact_paths,
        cluster_pairs_path,
    )
    from whale_sightings_spark.plans.cluster_store import text_cluster_dir

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    art = text_cluster_dir(spark, sf_dir)
    marker = os.path.join(cluster_artifact_paths(art), "_SUCCESS")
    assert os.path.exists(marker)
    assert os.path.exists(os.path.join(cluster_pairs_path(art), "_SUCCESS"))
    # tear the build: pairs present, labels missing
    shutil.rmtree(cluster_artifact_paths(art))
    art2 = text_cluster_dir(spark, sf_dir)
    assert art2 == art
    assert os.path.exists(marker)
