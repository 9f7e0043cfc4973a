"""Relational / warehouse-maintenance operator family (net-new beyond the
reference's star-schema load, extending `db/storage.py`-style upsert
semantics to the shapes a warehouse actually runs at scale):

- q65 unpivot (wide->long melt)
- q66 time-series gap fill over a generated calendar spine
- q67 SCD type-2 dimension versioning
- q68 MERGE-action classification (insert/update/noop/delete)
- q71 bitmap-prefiltered semi-join (bloom-style pruning, exact verify)
- q72 exact equi-depth binning from percentile boundaries
- q73 incremental rollup via re-aggregatable partials

Reference parity anchors: the reference's upsert writer
(`db/storage.py:71-116`) is INSERT ... ON DUPLICATE KEY UPDATE — q67/q68
are the distributed generalizations of that merge contract; everything
else is net-new OLAP breadth.

Scale notes are inline per query; every plan is 0-2 shuffles and every
small side is broadcast explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whale_sightings_spark.plans.queries import register
from whale_sightings_spark.schemas import load_table


# ---------------------------------------------------------------------------
# q65 — unpivot / melt: wide measure columns -> (measure, value) long form.
# Spark: DataFrame.unpivot is a row-local Expand (no shuffle); the single
# shuffle is the 4-group final agg. At 100 TB the Expand multiplies rows
# 4x *before* partial agg, which collapses per measure locally — shuffle
# bytes are O(#measures), not O(rows).
# ---------------------------------------------------------------------------

@register(
    "q65_unpivot",
    """
    SELECT measure,
           round(sum(val), 2) AS total,
           count(*) AS n
    FROM (
        SELECT 'quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL SELECT 'price', l_extendedprice FROM lineitem
        UNION ALL SELECT 'discount', l_discount FROM lineitem
        UNION ALL SELECT 'tax', l_tax FROM lineitem
    )
    GROUP BY measure
    """,
)
def q65_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    )
    long = li.unpivot([], ["quantity", "price", "discount", "tax"], "measure", "val")
    return long.groupBy("measure").agg(
        F.round(F.sum("val"), 2).alias("total"), F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# q66 — time-series gap fill: 15-minute activity counts per event_type with
# missing buckets materialized as zero. The spine is sequence(min, max)
# exploded from a SINGLE-ROW bounds agg cross-joined with the distinct
# type dictionary — both sides are broadcastable by construction (bounds
# is 1 row; the type dictionary is bounded). The fact is aggregated
# BEFORE the spine join, so the left join runs at bucket granularity
# (spine_rows x 1), never against raw events. 2 shuffles total (fact agg,
# spine join), both over bucket-count-sized data.
# ---------------------------------------------------------------------------

@register(
    "q66_gapfill_resample",
    """
    WITH counts AS (
        SELECT event_type,
               time_bucket(INTERVAL 15 MINUTE, ts) AS bucket,
               count(*) AS n_events
        FROM events
        GROUP BY 1, 2
    ),
    bounds AS (
        SELECT min(bucket) AS lo, max(bucket) AS hi FROM counts
    ),
    spine AS (
        SELECT t.event_type, g.bucket
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS bucket
            FROM bounds
        ) g
    )
    SELECT s.event_type,
           strftime(s.bucket, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           coalesce(c.n_events, 0) AS n_events
    FROM spine s
    LEFT JOIN counts c
      ON c.event_type = s.event_type AND c.bucket = s.bucket
    """,
)
def q66_gapfill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("ts") / 900).cast("long") * 900
    ).alias("bucket")
    counts = ev.select("event_type", bucket).groupBy("event_type", "bucket").agg(
        F.count("*").alias("n_events")
    )
    bounds = counts.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    types = ev.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 15 MINUTES"))
            ).alias("bucket"),
        )
    )
    return (
        spine.join(counts, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# q67 — SCD type-2 dimension versioning: apply a change batch to a current
# dimension snapshot, closing changed rows (valid_to set, is_current
# false) and appending the new versions. The change source is derived
# deterministically from the dim itself (every 7th customer gets a new
# balance) so both engines see identical inputs. One join shuffle on the
# business key; at 100 TB both sides hash-partition on c_custkey and the
# unchanged majority streams through the left join untouched.
# ---------------------------------------------------------------------------

_SCD_EPOCH = "1996-01-01"
_SCD_NOW = "1996-06-01"


@register(
    "q67_scd2_dim",
    f"""
    WITH updates AS (
        SELECT c_custkey, round(c_acctbal + 100.0, 2) AS new_bal
        FROM customer WHERE c_custkey % 7 = 0
    ),
    closed AS (
        SELECT c.c_custkey AS custkey, round(c.c_acctbal, 2) AS balance,
               '{_SCD_EPOCH}' AS valid_from, '{_SCD_NOW}' AS valid_to,
               false AS is_current
        FROM customer c JOIN updates u ON c.c_custkey = u.c_custkey
    ),
    fresh AS (
        SELECT c_custkey AS custkey, new_bal AS balance,
               '{_SCD_NOW}' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
               true AS is_current
        FROM updates
    ),
    unchanged AS (
        SELECT c.c_custkey AS custkey, round(c.c_acctbal, 2) AS balance,
               '{_SCD_EPOCH}' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
               true AS is_current
        FROM customer c LEFT JOIN updates u ON c.c_custkey = u.c_custkey
        WHERE u.c_custkey IS NULL
    )
    SELECT * FROM closed UNION ALL SELECT * FROM fresh
    UNION ALL SELECT * FROM unchanged
    """,
)
def q67_scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", F.round(F.col("c_acctbal") + 100.0, 2).alias("new_bal")
    )
    joined = cust.join(updates, "c_custkey", "left")
    changed = F.col("new_bal").isNotNull()

    def version(balance, valid_from, valid_to, is_current):
        return F.struct(
            balance.alias("balance"),
            valid_from.alias("valid_from"),
            valid_to.alias("valid_to"),
            is_current.alias("is_current"),
        )

    null_s = F.lit(None).cast("string")
    # one pass: each joined row expands row-locally to its version rows
    # (changed -> closed old + open new; unchanged -> passthrough),
    # instead of scanning the join three times for a 3-way union
    versions = F.when(
        changed,
        F.array(
            version(F.round("c_acctbal", 2), F.lit(_SCD_EPOCH), F.lit(_SCD_NOW), F.lit(False)),
            version(F.col("new_bal"), F.lit(_SCD_NOW), null_s, F.lit(True)),
        ),
    ).otherwise(
        F.array(version(F.round("c_acctbal", 2), F.lit(_SCD_EPOCH), null_s, F.lit(True)))
    )
    return joined.select(
        F.col("c_custkey").alias("custkey"), F.explode(versions).alias("v")
    ).select("custkey", "v.balance", "v.valid_from", "v.valid_to", "v.is_current")


# ---------------------------------------------------------------------------
# q68 — MERGE-action classification: the distributed form of the
# reference's INSERT ... ON DUPLICATE KEY UPDATE sink
# (`db/storage.py:71-76`), extended with the "not matched by source"
# branch. Target and source are full-outer joined on the key and every
# row is classified insert/update/noop/delete; output is the per-action
# audit count a MERGE would report. One shuffle (the FOJ); classification
# is row-local.
# ---------------------------------------------------------------------------

@register(
    "q68_merge_actions",
    """
    WITH source AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0
                    THEN round(c_acctbal + 50.0, 2)
                    ELSE round(c_acctbal, 2) END AS bal
        FROM customer WHERE c_custkey % 2 = 0
        UNION ALL
        -- brand-new keys (beyond any existing custkey) exercise 'insert'
        SELECT c_custkey + 10000000, round(c_acctbal, 2)
        FROM customer WHERE c_custkey % 500 = 0
    ),
    target AS (
        SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer
    )
    SELECT CASE
             WHEN t.c_custkey IS NULL THEN 'insert'
             WHEN s.c_custkey IS NULL THEN 'delete'
             WHEN s.bal <> t.bal THEN 'update'
             ELSE 'noop'
           END AS action,
           count(*) AS n
    FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
    GROUP BY 1
    """,
)
def q68_merge_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    target = cust.select("c_custkey", F.round("c_acctbal", 2).alias("bal"))
    source = (
        cust.filter(F.col("c_custkey") % 2 == 0)
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 3 == 0, F.round(F.col("c_acctbal") + 50.0, 2)
            )
            .otherwise(F.round("c_acctbal", 2))
            .alias("bal"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 500 == 0).select(
                (F.col("c_custkey") + 10000000).alias("c_custkey"),
                F.round("c_acctbal", 2).alias("bal"),
            )
        )
    )
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col("t.c_custkey") == F.col("s.c_custkey"), "full_outer")
    action = (
        F.when(F.col("t.c_custkey").isNull(), "insert")
        .when(F.col("s.c_custkey").isNull(), "delete")
        .when(F.col("s.bal") != F.col("t.bal"), "update")
        .otherwise("noop")
    )
    return joined.select(action.alias("action")).groupBy("action").agg(
        F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# q71 — bitmap-prefiltered semi-join (bloom-style pruning with an exact
# verify). The build side's key set is compressed to `hash(key) mod M`
# bucket ids (M = 8192 -> at most 8192 distinct values regardless of
# corpus size), broadcast as an isin prefilter on the probe side, and the
# exact semi-join runs only over the pre-filtered remainder. The result
# is provably identical to the plain semi-join (the prefilter admits a
# superset), which is exactly what the oracle computes. At 100 TB this is
# the manual form of Spark's runtime bloom-filter join: the probe scan
# drops most rows before the shuffle.
# ---------------------------------------------------------------------------

_BITMAP_M = 8192


@register(
    "q71_bitmap_semijoin",
    """
    SELECT o.o_orderstatus AS status,
           count(*) AS n,
           round(sum(o.o_totalprice), 2) AS total
    FROM orders o
    WHERE o.o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    GROUP BY 1
    """,
)
def q71_bitmap_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    build = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    # bounded broadcast state: <= M distinct bucket ids whatever the
    # build-side cardinality; a broadcast semi-join beats a giant IN
    # list (thousands of literals stall Catalyst planning)
    buckets = (
        build.select((F.xxhash64("c_custkey") % _BITMAP_M).alias("b")).distinct()
    )
    pre = orders.withColumn("b", F.xxhash64("o_custkey") % _BITMAP_M).join(
        F.broadcast(buckets), "b", "left_semi"
    )
    exact = pre.join(F.broadcast(build), pre.o_custkey == build.c_custkey, "left_semi")
    return exact.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


# ---------------------------------------------------------------------------
# q72 — exact equi-depth binning: deciles of l_extendedprice computed with
# exact percentile_cont, broadcast as a single-row boundary array, each
# row assigned bin = 1 + #(boundaries < value) via a row-local array
# predicate. One pass for boundaries (single-row agg), one pass + one
# 10-group shuffle for the profile. Both engines interpolate linearly so
# the boundary doubles are bit-identical.
# ---------------------------------------------------------------------------

_DECILES = [i / 10 for i in range(1, 10)]


#: below this much input parquet, the single-task sorted-array decile
#: path is used; above it, the distributed rank-selection path. 256 MiB
#: of parquet is ~10M doubles — an ~80 MB sort in one task, well inside
#: an executor; past that the per-task state must stay bounded.
_DECILE_LOCAL_BYTES = 256 * 1024 * 1024


def _exact_deciles(df: DataFrame, col: str) -> DataFrame:
    """One-row (bounds array<double>) frame: exact interpolated deciles
    of ``col``, bit-identical to ``F.percentile(col, _DECILES)``.

    r12 (guide §5 — bound per-task state): the builtin exact percentile
    is a TypedImperativeAggregate that builds a value->count hash map
    per partition and merges all of them single-threaded in the final
    task — ~3 s over 600 k near-distinct doubles locally, and a
    single-task memory wall at scale. Two replacements, switched on
    input size (scale-adaptive, not tuned to either deploy shape):

    - small inputs: one collect_list + array_sort aggregation — the
      same one-task reduction the builtin already implies, minus its
      per-value hash-map bookkeeping, and a 2-stage plan;
    - large inputs: distributed rank selection — range-repartition the
      values, rank within each partition (parallel local sorts), turn
      per-partition counts into global offsets (a partition-count-sized
      window), and select the floor/ceil ranks of each decile position
      with one slim aggregation. No task ever holds the column.

    Both interpolate with the same (1-frac)*lo + frac*hi arithmetic as
    the builtin and are verified bit-equal on the bench data and on
    tie/edge fixtures (tests/test_ranks.py)."""
    from pyspark.sql import Window as W

    v = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    try:
        import os

        in_bytes = sum(
            os.path.getsize(f[5:] if f.startswith("file:") else f)
            for f in df.inputFiles()
        )
    except Exception:
        in_bytes = _DECILE_LOCAL_BYTES + 1
    if in_bytes <= _DECILE_LOCAL_BYTES:
        one = v.agg(F.array_sort(F.collect_list("v")).alias("vs"))
        n = F.size("vs").cast("long")
        bounds = []
        for p in _DECILES:
            pos = F.lit(p) * (n - 1)
            lo = F.element_at("vs", (F.floor(pos) + 1).cast("int"))
            hi = F.element_at("vs", (F.ceil(pos) + 1).cast("int"))
            frac = pos - F.floor(pos)
            bounds.append((F.lit(1.0) - frac) * lo + frac * hi)
        return one.select(F.array(*bounds).alias("bounds"))
    rv = v.repartitionByRange("v").select(
        "v", F.spark_partition_id().alias("pid")
    )
    loc = rv.withColumn(
        "lr", F.row_number().over(W.partitionBy("pid").orderBy("v"))
    )
    cnts = loc.groupBy("pid").agg(F.count("*").alias("c"))
    offs = cnts.select(
        "pid",
        F.coalesce(
            F.sum("c").over(
                W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )
    n = v.agg(F.count("*").alias("n"))
    g = (
        loc.join(F.broadcast(offs), "pid")
        .select("v", (F.col("off") + F.col("lr") - 1).alias("gr"))
        .crossJoin(F.broadcast(n))
    )
    conds = None
    for p in _DECILES:
        pos = F.lit(p) * (F.col("n") - 1)
        c = (F.col("gr") == F.floor(pos)) | (F.col("gr") == F.ceil(pos))
        conds = c if conds is None else (conds | c)
    aggs = [F.max("n").alias("n")]
    for i, p in enumerate(_DECILES):
        pos = F.lit(p) * (F.col("n") - 1)
        aggs.append(
            F.max(F.when(F.col("gr") == F.floor(pos), F.col("v"))).alias(
                f"lo{i}"
            )
        )
        aggs.append(
            F.max(F.when(F.col("gr") == F.ceil(pos), F.col("v"))).alias(
                f"hi{i}"
            )
        )
    one = g.filter(conds).agg(*aggs)
    bounds = []
    for i, p in enumerate(_DECILES):
        frac = F.lit(p) * (F.col("n") - 1) - F.floor(
            F.lit(p) * (F.col("n") - 1)
        )
        bounds.append(
            (F.lit(1.0) - frac) * F.col(f"lo{i}") + frac * F.col(f"hi{i}")
        )
    return one.select(F.array(*bounds).alias("bounds"))


@register(
    "q72_equidepth_bins",
    f"""
    WITH b AS (
        SELECT quantile_cont(l_extendedprice,
                             {_DECILES}) AS bounds
        FROM lineitem
    )
    SELECT CAST(1 + len(list_filter(b.bounds, x -> l.l_extendedprice > x)) AS INT)
               AS bin,
           count(*) AS n,
           round(min(l.l_extendedprice), 2) AS lo,
           round(max(l.l_extendedprice), 2) AS hi
    FROM lineitem l CROSS JOIN b
    GROUP BY 1
    """,
)
def q72_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bounds = _exact_deciles(li, "l_extendedprice")
    binned = li.crossJoin(F.broadcast(bounds)).select(
        (
            1
            + F.size(
                F.filter("bounds", lambda x: F.col("l_extendedprice") > x)
            )
        )
        .cast("int")
        .alias("bin"),
        "l_extendedprice",
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("lo"),
        F.round(F.max("l_extendedprice"), 2).alias("hi"),
    )


# ---------------------------------------------------------------------------
# q73 — incremental rollup via re-aggregatable partials: the maintenance
# path of a materialized aggregate. The "base" partial (events before the
# split) and the "delta" partial (events after) are merged by summing
# partial sums/counts — never rescanning base data — and the merged
# result provably equals the direct full aggregate, which is what the
# oracle computes. avg is derived from merged sum/count (algebraic, not
# distributive, so it must be re-derived — the classic partial-agg
# contract).
# ---------------------------------------------------------------------------

_SPLIT_TS = "2024-01-20 00:00:00"


@register(
    "q73_incremental_rollup",
    """
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 2) AS total,
           round(sum(value) / count(*), 6) AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def q73_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("p_n"), F.sum("value").alias("p_sum")
        )

    base = partial(ev.filter(F.col("ts") < _SPLIT_TS))
    delta = partial(ev.filter(F.col("ts") >= _SPLIT_TS))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("p_n").alias("n"), F.sum("p_sum").alias("total_raw"))
    )
    return merged.select(
        "event_type",
        "n",
        F.round("total_raw", 2).alias("total"),
        F.round(F.col("total_raw") / F.col("n"), 6).alias("avg_value"),
    )
