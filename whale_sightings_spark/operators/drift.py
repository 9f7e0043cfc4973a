"""Distribution-drift operators shared by the batch query surface and
the streaming twins (q205 / streaming_ks_ingest)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def ks_report(d: DataFrame) -> DataFrame:
    """Per-source two-sample Kolmogorov-Smirnov report over a
    (source, n_chars) frame: each source's length distribution vs the
    rest of the corpus. Integer arithmetic until the single final
    division — the KS numerator |cum_c*(N-ns) - (cum_g-cum_c)*ns| and
    its argmax are exact, so the ks_at_len tie-break (min length at
    the sup) is engine-deterministic. Shape: per-(source,len) counts,
    a sources x distinct-lengths grid (bounded), one cumulative window
    per source over the aggregated grid; output |sources| rows. At
    N ~ 1e9+ docs the BIGINT products need DECIMAL(38). Columns:
    (source, n_source, ks_stat, ks_at_len) — the q205 contract."""
    tot = d.groupBy("source").agg(F.count("*").alias("ns"))
    grand = d.agg(F.count("*").alias("n"))
    gc = d.groupBy("n_chars").agg(F.count("*").alias("gc"))
    cnt = d.groupBy("source", "n_chars").agg(F.count("*").alias("c"))
    grid = (
        tot.crossJoin(F.broadcast(gc))
        .join(cnt, ["source", "n_chars"], "left")
        .select(
            "source",
            "ns",
            "n_chars",
            "gc",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    w = W.partitionBy("source").orderBy("n_chars")
    cum = grid.select(
        "source",
        "ns",
        "n_chars",
        F.sum("c").over(w).alias("cum_c"),
        F.sum("gc").over(w).alias("cum_g"),
    )
    j = cum.crossJoin(F.broadcast(grand)).select(
        "source",
        "ns",
        "n_chars",
        F.abs(
            F.col("cum_c") * (F.col("n") - F.col("ns"))
            - (F.col("cum_g") - F.col("cum_c")) * F.col("ns")
        ).alias("num"),
        (F.col("ns") * (F.col("n") - F.col("ns"))).alias("den"),
    )
    k = j.withColumn("mx", F.max("num").over(W.partitionBy("source")))
    return k.groupBy("source").agg(
        F.first("ns").cast("bigint").alias("n_source"),
        F.round(
            F.first("mx").cast("double") / F.first("den").cast("double"), 6
        ).alias("ks_stat"),
        F.min(F.when(F.col("num") == F.col("mx"), F.col("n_chars")))
        .cast("bigint")
        .alias("ks_at_len"),
    )
