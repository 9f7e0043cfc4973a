"""SparkSession factory with scale-minded defaults.

Local runs use ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the same
conf applies minus the master override. Settings chosen for the 100 TB
design point:

- AQE on (runtime partition coalescing + skew-join splitting);
- shuffle partitions sized to cores locally (the 200 default is wrong
  in both directions — override per-deploy on a cluster);
- Arrow enabled for every pandas interchange (vectorized UDF path);
- session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle and are deploy-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "whale_sightings_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    ``master=None`` defers to an existing session / spark-submit conf,
    falling back to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python Data Source filter pushdown (R2: the obis source
        # absorbs eventDate/species predicates into request params)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        # single-JVM local mode: driver heap IS the executor heap; 32
        # concurrent tasks shuffling sf0.1 in 16g spends visible time in
        # GC (observed as multi-second per-query jitter), 48g doesn't
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # long sessions run hundreds of plans: reclaim shuffle files,
        # broadcasts, and accumulators continuously instead of at the
        # 30-min default, so late queries aren't billed for early ones
        .config("spark.cleaner.periodicGC.interval", "2min")
    )
    if master:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from whale_sightings_spark.deploy import ship_package

    ship_package(spark)
    return spark
