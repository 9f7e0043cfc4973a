"""Pin the bench's warm contract (VERDICT r12 #4): every builder in
bench.py's build-if-absent warm list must be a NO-OP when its artifact
already exists — zero Spark jobs scheduled by the build call itself.

Two failure classes this guards:

- accidental rebuild-billing: a consumer query (or the warm loop on a
  warm cache) silently re-running a minutes-long build inside the
  timed region poisons round-over-round comparison;
- result-caching creep: a builder that starts doing per-call data work
  when warm is no longer a generation-keyed artifact serve.

The builder list is imported FROM bench.py's own warm loop (kept as a
module-level tuple there would drift; instead this test re-declares the
list and a companion assertion pins it against bench.py's source text,
so adding a builder to bench.py without warming semantics fails here).
"""

from __future__ import annotations

import os
import re

# the exact warm list bench.py iterates (order irrelevant)
WARM_BUILDERS = (
    ("whale_sightings_spark.plans.queries_llm", "_ivfpq_index_dir"),
    ("whale_sightings_spark.plans.queries_textops", "_bpe_artifact_dir"),
    ("whale_sightings_spark.plans.queries_classify", "_nb_artifact_dir"),
    ("whale_sightings_spark.plans.shingle_store", "shingle_artifact_dir"),
    ("whale_sightings_spark.plans.cluster_store", "text_cluster_dir"),
    ("whale_sightings_spark.plans.cluster_store", "minhash_cluster_dir"),
    ("whale_sightings_spark.plans.cluster_store", "embed_cluster_dir"),
    ("whale_sightings_spark.plans.cluster_store", "embed_hist_cluster_dir"),
    ("whale_sightings_spark.plans.lm_store", "lm_artifact_dir"),
    ("whale_sightings_spark.plans.cluster_store", "stored_pagerank"),
    ("whale_sightings_spark.plans.cluster_store", "stored_kcore_profile"),
    ("whale_sightings_spark.plans.cluster_store", "stored_triangle_census"),
    ("whale_sightings_spark.plans.cluster_store", "stored_hist_labels"),
    ("whale_sightings_spark.plans.cluster_store", "stored_hist_pagerank"),
    ("whale_sightings_spark.plans.queries_corpus", "lm_hist_uni"),
    ("whale_sightings_spark.plans.queries_textops", "shingle_hist_postings"),
    ("whale_sightings_spark.plans.queries_llm", "minhash_hist_pairs"),
    ("whale_sightings_spark.plans.queries_llm", "embed_hist_pairs"),
)


def test_warm_list_matches_bench_source():
    """Every builder name bench.py warms appears here and vice versa,
    so the no-op pin below can't silently lag the bench."""
    bench_src = open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py")
    ).read()
    m = re.search(r"for build in \((.*?)\):", bench_src, re.S)
    assert m, "bench.py warm loop not found"
    body = "\n".join(
        ln for ln in m.group(1).splitlines()
        if not ln.strip().startswith("#")
    )
    names = set(re.findall(r"(\w+)\s*,", body))
    # bench imports some builders under underscore aliases
    names = {n.lstrip("_") for n in names}
    ours = {fn.lstrip("_") for _, fn in WARM_BUILDERS}
    # bench aliases lm_hist_uni/shingle_hist_postings/minhash_hist_pairs/
    # embed_hist_pairs with a _ prefix; normalize both sides above
    assert names == ours, (sorted(names - ours), sorted(ours - names))


def test_warm_builders_schedule_zero_jobs_when_warm(spark, sf_dir):
    """With artifacts present, each warm call must schedule zero Spark
    jobs (stat checks and lazy-DataFrame construction only)."""
    import importlib

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    builders = [
        (mod, fn, getattr(importlib.import_module(mod), fn))
        for mod, fn in WARM_BUILDERS
    ]
    # first pass OUTSIDE the assertion window: build anything absent
    # (fresh checkout / empty .index_cache) so the pinned pass below
    # always measures the warm path
    for _mod, _fn, build in builders:
        build(spark, sf_dir)
    offenders = {}
    for mod, fn, build in builders:
        group = f"warmpin-{fn}"
        sc.setJobGroup(group, f"warm no-op pin: {fn}")
        build(spark, sf_dir)
        jobs = tracker.getJobIdsForGroup(group)
        if len(jobs) != 0:
            offenders[f"{mod}.{fn}"] = len(jobs)
    assert not offenders, f"warm builders scheduled Spark jobs: {offenders}"
