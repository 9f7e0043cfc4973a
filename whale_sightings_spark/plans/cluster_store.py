"""Build-if-absent caches of the persisted near-dup cluster artifact
(`operators/dedup.py: build_cluster_artifact`) — one per pair graph:
``text`` (SimHash near-dup pairs over documents, keyed by the
documents fingerprint) and ``embed`` (LSH+cosine embedding near-dup
pairs, keyed by the embeddings fingerprint). The `shingle_store`
convention: fingerprint + format-version key, prefix-scoped eviction,
pid staging + atomic rename with torn-remain clearing."""
from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from whale_sightings_spark.operators import dedup as DD
from whale_sightings_spark.schemas import load_table


def _dir_for(
    spark: SparkSession, sf_dir: str, kind: str, src_file: str, build
) -> str:
    st = os.stat(os.path.join(sf_dir, src_file))
    fp = f"{st.st_size}_{int(st.st_mtime)}"
    root = os.environ.get(
        "SPARK_GRAFT_INDEX_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".index_cache",
        ),
    )
    sf_root = os.path.join(root, os.path.basename(os.path.normpath(sf_dir)))
    prefix = f"clusters_{kind}_"
    leaf = f"{prefix}v{DD.CLUSTER_FORMAT_VERSION}_{fp}"
    artifact_dir = os.path.join(sf_root, leaf)
    labels_dir = DD.cluster_artifact_paths(artifact_dir)
    marker = os.path.join(labels_dir, "_SUCCESS")

    def _incomplete() -> bool:
        # a crashed compaction's sentinel reads as absent (rebuild)
        return not os.path.exists(marker) or os.path.exists(
            DD.cluster_compacting_sentinel(artifact_dir)
        )

    if _incomplete():
        from whale_sightings_spark.plans.store_utils import reap_dead_staging

        reap_dead_staging(sf_root)  # dead builders' .tmp leftovers
        if os.path.isdir(sf_root):
            for d in os.listdir(sf_root):
                if d != leaf and d.startswith(prefix) and ".tmp." not in d:
                    shutil.rmtree(os.path.join(sf_root, d), ignore_errors=True)
        staging = f"{artifact_dir}.tmp.{os.getpid()}"
        try:
            built = build(spark, sf_dir)
            pairs, sigs = built[0], built[1]
            evecs = built[2] if len(built) > 2 else None
            DD.build_cluster_artifact(pairs, staging, sigs=sigs, evecs=evecs)
        except BaseException:
            # a failed build must not leak a near-full-size staging dir
            # under the cache root (the eviction sweep skips .tmp.)
            shutil.rmtree(staging, ignore_errors=True)
            raise
        if _incomplete():
            shutil.rmtree(artifact_dir, ignore_errors=True)
        try:
            os.rename(staging, artifact_dir)
        except OSError:
            # a racing builder's completed artifact wins and we just
            # lose our staging; but a NON-race failure (EXDEV, perms)
            # must surface as itself, not as a confusing path-not-found
            # from the reader downstream (ADVICE r10)
            shutil.rmtree(staging, ignore_errors=True)
            if _incomplete():
                raise
    return artifact_dir


def text_cluster_dir(spark: SparkSession, sf_dir: str) -> str:
    """Converged components over SimHash near-dup pairs of documents.
    v3: signatures computed once feed BOTH the stored sig/band probe
    index and the pair generator (one tokenize pass per build)."""

    def _build(s, d):
        # pairs=None: build derives them from the WRITTEN sig table
        return None, DD.simhash_signatures(load_table(s, d, "documents"))

    return _dir_for(spark, sf_dir, "text", "documents.parquet", _build)


def stored_text_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, hamming) — the SimHash near-dup edge table off
    the persisted text-cluster artifact (round 9: the graph family's
    serve path — PageRank/triangles/k-core/components read this table
    instead of re-deriving pairs from the raw corpus per query)."""
    return DD.stored_cluster_pairs(spark, text_cluster_dir(spark, sf_dir))


def minhash_cluster_dir(spark: SparkSession, sf_dir: str) -> str:
    """Near-dup artifact over the MinHash-LSH pair graph of documents
    (round 10): the pair table keeps the verified ``jaccard`` weight,
    so q15 — the family-origin dedup query — serves from the store
    instead of re-running the full-corpus shingle+sign pass per
    refresh. Build is deterministic (hash-seeded signatures), so the
    stored table is row-equal to re-deriving on the same corpus
    fingerprint; staleness re-keys on the fingerprint."""

    def _build(s, d):
        return DD.minhash_lsh_pairs(load_table(s, d, "documents")), None

    return _dir_for(spark, sf_dir, "minhash", "documents.parquet", _build)


def stored_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, jaccard) — q15's serve path."""
    return DD.stored_cluster_pairs(spark, minhash_cluster_dir(spark, sf_dir))


def _derived_table(
    spark: SparkSession,
    artifact_dir: str,
    name: str,
    build,
    src_marker: str | None = None,
) -> DataFrame:
    """Build-if-absent DERIVED table of a cluster artifact (round 10):
    converged graph analytics (PageRank scores, k-core profile) live
    BESIDE the pairs/labels they were computed from, so they inherit
    the artifact's corpus-fingerprint staleness key — a corpus change
    re-keys the whole artifact directory and every derived table with
    it. pid staging + atomic rename (the `_dir_for` convention); the
    parquet ``_SUCCESS`` is the completeness marker, so a torn write
    reads as absent and rebuilds. Tables are node-sized or
    profile-sized (edge-set-bounded), never corpus-scale.

    Round 12 (ADVICE r11): ``src_marker`` — the ``_SUCCESS`` of the
    source table this derivation reads — closes the concurrent-append
    race by generation, not by deletion order: the builder stamps the
    source generation it read into a ``_GEN`` file inside the staging
    dir BEFORE computing, and the reader treats a published derived
    table whose ``_GEN`` disagrees with the source's current marker as
    absent. A builder that raced a streaming append and published
    stale scores is therefore never served — its ``_GEN`` is already
    behind. Missing ``_GEN`` (pre-round-12 artifacts) reads as stale
    once and rebuilds."""
    from whale_sightings_spark.plans.store_utils import marker_sig

    path = os.path.join(artifact_dir, "derived_" + name)
    marker = os.path.join(path, "_SUCCESS")
    gen_file = os.path.join(path, "_GEN")

    def _stale() -> bool:
        if not os.path.exists(marker):
            return True
        if src_marker is None:
            return False
        try:
            with open(gen_file) as fh:
                seen = fh.read().strip()
        except OSError:
            return True
        return seen != (marker_sig(src_marker) or "")

    if _stale():
        from whale_sightings_spark.plans.store_utils import (
            reap_dead_staging,
        )

        # dead builders' derived_*.tmp.<pid> leftovers live INSIDE the
        # artifact dir, which the sf_root sweep never visits (ADVICE
        # r10) — reap them here, where the rebuild happens
        reap_dead_staging(artifact_dir)
        staging = f"{path}.tmp.{os.getpid()}"
        try:
            # stamp the source generation BEFORE computing: if an
            # append lands mid-build, the published _GEN is already
            # behind the moved marker and the next read rebuilds
            gen = (
                (marker_sig(src_marker) or "")
                if src_marker is not None
                else None
            )
            build().write.mode("overwrite").parquet(staging)
            if gen is not None:
                with open(os.path.join(staging, "_GEN"), "w") as fh:
                    fh.write(gen)
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        shutil.rmtree(path, ignore_errors=True)
        try:
            os.rename(staging, path)
        except OSError:
            # racing builder completed -> fine; a non-race rename
            # failure must re-raise as itself, not surface later as
            # the reader's path-not-found (ADVICE r10)
            shutil.rmtree(staging, ignore_errors=True)
            if not os.path.exists(marker):
                raise
    from whale_sightings_spark.plans.store_utils import read_artifact_table

    return read_artifact_table(spark, path)


def stored_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, pr) — PageRank run to the L1 fixpoint (damping
    `graphs.DAMPING_FAST`, tol `graphs.PR_TOL`) over the stored
    SimHash pair table, persisted as a derived table of the text
    cluster artifact. q112 is the oracle-paired BUILD sign-off; the
    serve twins (q256/q257) and dashboards read this table without
    re-running the ~34 damping rounds per query. Stored UNROUNDED;
    consumers round at their output contract."""
    from whale_sightings_spark.operators import graphs as GR

    art = text_cluster_dir(spark, sf_dir)

    def _build():
        return GR.pagerank_converged(
            DD.stored_cluster_pairs(spark, art)
        ).coalesce(1)  # node-sized, edge-set-bounded

    return _derived_table(
        spark,
        art,
        "pagerank",
        _build,
        src_marker=os.path.join(DD.cluster_pairs_path(art), "_SUCCESS"),
    )


def stored_kcore_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(round, n_removed, n_alive) — the fixed-round k-core peel
    profile over the stored pair table, persisted beside the labels
    (q194 is the BUILD sign-off; rounds+1 rows)."""
    from whale_sightings_spark.operators import graphs as GR

    art = text_cluster_dir(spark, sf_dir)

    def _build():
        return GR.kcore_peel(
            DD.stored_cluster_pairs(spark, art)
        ).coalesce(1)

    return _derived_table(
        spark,
        art,
        "kcore",
        _build,
        src_marker=os.path.join(DD.cluster_pairs_path(art), "_SUCCESS"),
    )


def stored_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_nodes, n_edges, n_triangles) — the degree-oriented triangle
    census over the stored pair table, persisted beside pagerank/kcore
    (q107 is the BUILD sign-off; one row). The wedge-closure joins run
    once per corpus fingerprint instead of per dashboard read."""
    from whale_sightings_spark.operators import graphs as GR

    art = text_cluster_dir(spark, sf_dir)

    def _build():
        return GR.triangle_census(
            DD.stored_cluster_pairs(spark, art)
        ).coalesce(1)

    return _derived_table(
        spark,
        art,
        "census",
        _build,
        src_marker=os.path.join(DD.cluster_pairs_path(art), "_SUCCESS"),
    )


#: the drift-audit family's shared history hold: doc_id % HIST_MOD !=
#: HIST_REM is "history", the rest is the held-out ingest slice
#: (q243/q251/q258 all audit against this slice)
HIST_MOD = 5
HIST_REM = 4


def stored_hist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, hamming) — the SimHash near-dup pair set derived
    from first principles over the HISTORY slice (doc_id % 5 != 4) of
    the stored signature table, persisted as a derived table of the
    text cluster artifact (round 12, VERDICT r11 #1).

    The three rebuild-drift audits (q243 labels, q251 pairs, q258
    pagerank) all need this identical pair set — banding, hot-bucket
    caps and Hamming verify re-run over `stored_cluster_sigs % hold` —
    and previously each re-derived it per query (together the #1 and
    #3 steady costs). One derivation now runs per artifact generation;
    the audits consume the persisted result. Freshness: keyed on the
    SIG table's `_SUCCESS` generation (`_GEN`), so a streaming append
    that adds signatures both deletes the table (ingest invalidation)
    and ages its generation — either alone forces the rebuild. The
    derivation is deterministic, so the stored rows are value-equal to
    re-deriving inline and every audit oracle is unchanged."""
    from pyspark.sql import functions as F

    art = text_cluster_dir(spark, sf_dir)

    def _build():
        # edge-set-sized (verified near-dup pairs only), never
        # corpus-scale — small enough to compact to a few files
        return DD.simhash_pairs_from_sigs(
            DD.stored_cluster_sigs(spark, art).filter(
                (F.col("doc_id") % HIST_MOD) != HIST_REM
            )
        ).coalesce(4)

    return _derived_table(
        spark,
        art,
        "histpairs",
        _build,
        src_marker=os.path.join(DD.cluster_sigs_path(art), "_SUCCESS"),
    )


def stored_hist_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, label) — connected components converged over the
    history pair set, persisted as a derived table chained on
    `derived_histpairs` (round 12). q243's history side: the label
    convergence re-runs whenever the signature table's generation
    moves (every streaming append, every rebuild) and is served
    otherwise — recomputing an unchanged deterministic derivation per
    query run prices nothing the generation-keyed rebuild doesn't."""
    art = text_cluster_dir(spark, sf_dir)
    hp = stored_hist_pairs(spark, sf_dir)  # ensure built + fresh

    def _build():
        return DD.dedup_components_converged(
            hp.select("doc_a", "doc_b")
        ).coalesce(1)  # node-sized

    return _derived_table(
        spark,
        art,
        "histlabels",
        _build,
        src_marker=os.path.join(art, "derived_histpairs", "_SUCCESS"),
    )


def stored_hist_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, pr) — PageRank to the L1 fixpoint over the history pair
    set, persisted as a derived table chained on `derived_histpairs`
    (round 12). q258's history side; same generation contract as
    :func:`stored_hist_labels`."""
    from whale_sightings_spark.operators import graphs as GR

    art = text_cluster_dir(spark, sf_dir)
    hp = stored_hist_pairs(spark, sf_dir)

    def _build():
        return GR.pagerank_converged(
            hp.select("doc_a", "doc_b")
        ).coalesce(1)  # node-sized

    return _derived_table(
        spark,
        art,
        "histpagerank",
        _build,
        src_marker=os.path.join(art, "derived_histpairs", "_SUCCESS"),
    )


def embed_cluster_dir(spark: SparkSession, sf_dir: str) -> str:
    """Converged components over embedding near-dup pairs (vec ids)."""
    from pyspark.sql import functions as F

    from whale_sightings_spark.operators import similarity as SIM

    def _pairs(s, d):
        emb = load_table(s, d, "embeddings")
        # v5: the verified cos weight rides the pair table so q19
        # serves pairs+weights straight off the store
        pairs = SIM.embedding_neardup_pairs(emb).select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"),
            "cos",
        )
        # v4: persist the vectors + hyperplane band index beside the
        # labels, enabling the read-only streaming assign probe
        return pairs, None, emb.select("vec_id", "embedding")

    return _dir_for(spark, sf_dir, "embed", "embeddings.parquet", _pairs)


def stored_embed_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, cos) — the embedding near-dup edge table off the
    persisted embed-cluster artifact (q19's serve path)."""
    return DD.stored_cluster_pairs(spark, embed_cluster_dir(spark, sf_dir))


#: q255's arriving-vector slice: vec_id % MOD == REM arrives, the rest
#: is the indexed history — scale-proportional at every SF (2%)
EASSIGN_MOD = 50
EASSIGN_REM = 7


def embed_hist_cluster_dir(spark: SparkSession, sf_dir: str) -> str:
    """History-slice embed artifact for the q255 incremental-assign
    audit: the v4 embed store (vectors + band index + frozen bucket
    stats + converged labels) built over the vec_id % EASSIGN_MOD !=
    EASSIGN_REM slice, so the held-out 2% can be assigned against it
    exactly as arriving data would be."""
    from pyspark.sql import functions as F

    from whale_sightings_spark.operators import similarity as SIM

    def _pairs(s, d):
        emb = load_table(s, d, "embeddings").filter(
            (F.col("vec_id") % EASSIGN_MOD) != EASSIGN_REM
        )
        pairs = SIM.embedding_neardup_pairs(emb).select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"),
            "cos",
        )
        return pairs, None, emb.select("vec_id", "embedding")

    return _dir_for(spark, sf_dir, "embedhist", "embeddings.parquet", _pairs)
