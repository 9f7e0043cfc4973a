"""Time a subset of registered queries through the noop sink
(guide §1.4) — the iteration harness for the optimization round.
Prints one JSON object {name: {"cold": s, "steady": s}}.

Usage: python scripts/time_queries.py <qname> [<qname> ...]
       python scripts/time_queries.py --top N   (N heaviest from bench_detail.json)
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
    spark = get_spark(app_name="time-queries", master=f"local[{cpus}]")
    # same warmups as bench.py so numbers are comparable
    Q["q01_filter_project"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(int(cpus)).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    out: dict = {}
    for name in names:
        fn = Q[name]
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        out[name] = {"cold": round(cold, 3), "steady": round(min(reps), 3)}
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        gc.collect()
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
