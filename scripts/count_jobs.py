"""Count Spark JOBS per query invocation (plus cold/steady wall) —
the instrument for the per-query fixed-floor work (VERDICT r12 #2):
every eager localCheckpoint / collect / count a query runs at
DAG-BUILD time is one extra blocking job of pure scheduling overhead
per invocation, invisible in the plan but visible here.

Usage: python scripts/count_jobs.py <qname> [<qname> ...]
       python scripts/count_jobs.py --top N     (N heaviest from bench_detail.json)
       python scripts/count_jobs.py --all
Prints one JSON object {name: {"jobs": n, "cold": s, "steady": s}}.
(sf_dir from $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1;
 master local[$SPARK_GRAFT_CPUS])
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whale_sightings_spark.plans.queries import queries
from whale_sightings_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    names = sys.argv[1:]
    Q = queries()
    if names and names[0] == "--top":
        n = int(names[1])
        det = json.load(open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_detail.json")))
        names = [k for k, _ in sorted(det["steady_queries"].items(),
                                      key=lambda kv: -kv[1])[:n] if k in Q]
    elif names == ["--all"]:
        names = sorted(Q)
    spark = get_spark(app_name="count-jobs", master=f"local[{cpus}]")
    sc = spark.sparkContext
    # same warmups as bench.py so numbers are comparable
    Q["q01_filter_project"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(int(cpus)).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    tracker = sc.statusTracker()
    out: dict = {}
    for name in names:
        fn = Q[name]
        # cold pass inside its own job group: every job the invocation
        # schedules (build-time checkpoints/collects AND the noop sink)
        # lands in the group, so len(jobs) is the action count
        sc.setJobGroup(f"cj-{name}", name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        jobs = len(tracker.getJobIdsForGroup(f"cj-{name}"))
        sc.setJobGroup(f"cj2-{name}", name)
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        out[name] = {
            "jobs": jobs,
            "cold": round(cold, 3),
            "steady": round(min(reps), 3),
        }
        spark.catalog.clearCache()
        gc.collect()
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
