"""Join- and set-operation breadth: gap sessionization (lag),
CUBE over a dim join, INTERSECT/EXCEPT cohorts, semi/anti-join
cohorts, and a full-outer dim reconciliation.

The reference's join surface stops at inner/left equi-joins and one
anti pattern (SURVEY §2.3: "Not present: ... semi-joins, cross joins,
full-outer"); its only window-like ops are W1-W4. These queries close
those gaps as first-class, oracle-checked operators. Conventions
(identical aliases both sides, decimal sums, UTC timestamp strings)
follow plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from whale_sightings_spark.operators import ranks as RK
from whale_sightings_spark.plans.queries import register
from whale_sightings_spark.schemas import load_table

# ---------------------------------------------------------------------------
# q41 — gap-based sessionization via lag(): a session ends after a
# 30-minute silence. ONE shuffle on user_id; the follow-up group-by on
# (user_id, sess_id) reuses the same hash partitioning (user_id alone
# clusters every (user_id, sess_id) group), so Spark plans no second
# exchange. Ties broken by event_id so both engines see one order.
# ---------------------------------------------------------------------------


@register(
    "q41_sessionize_gaps",
    """
    WITH seq AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR datediff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WHERE user_id % 20 = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tagged AS (
        SELECT user_id, ts, value,
               sum(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM seq
    )
    SELECT user_id,
           CAST(sess_id AS BIGINT) AS sess_id,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts
    FROM tagged
    GROUP BY 1, 2
    """,
)
def q41_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("long")
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            F.lag(sec).over(w).isNull() | (sec - F.lag(sec).over(w) > 1800),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    tagged = seq.select(
        "user_id",
        "ts",
        "value",
        F.sum("new_sess")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("sess_id"),
    )
    return tagged.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
    )


# ---------------------------------------------------------------------------
# q42 — CUBE (nation, order-year) revenue over a two-hop dim join.
# orders⋈customer shuffles once on custkey; nation is broadcast (25
# rows — the fact side never moves for it). The cube itself is one
# expand + partial/final hash aggregate; decimal sums keep the answer
# independent of shuffle order at any executor count.
# ---------------------------------------------------------------------------


@register(
    "q42_cube_nation_year",
    """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(GROUPING(n_name) * 2
                + GROUPING(year(o_orderdate)) AS BIGINT) AS gid,
           count(*) AS n_orders,
           -- VARCHAR render: fixed-scale string avoids the decimal-vs-double
           -- rendering drift between the two drivers (see q37).
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS VARCHAR) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY CUBE (n_name, year(o_orderdate))
    """,
)
def q42_cube_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("yr"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .cube("nation", "yr")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum("price").alias("revenue"),
        )
        .select(
            "nation",
            "yr",
            "gid",
            "n_orders",
            F.col("revenue").cast("decimal(18,2)").cast("string").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q43 — INTERSECT / EXCEPT cohorts: customers active in both 1994 and
# 1995 vs 1994-only. Spark plans both set ops as aggregate-based
# semi/anti forms over the two distinct sets — each side is pre-shrunk
# by a year filter pushed to the parquet scan before any shuffle.
# ---------------------------------------------------------------------------


@register(
    "q43_set_ops",
    """
    WITH y95 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                 WHERE year(o_orderdate) = 1995),
         y96 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                 WHERE year(o_orderdate) = 1996)
    SELECT custkey, 'both' AS cohort
    FROM (SELECT custkey FROM y95 INTERSECT SELECT custkey FROM y96)
    UNION ALL
    SELECT custkey, 'only_1995' AS cohort
    FROM (SELECT custkey FROM y95 EXCEPT SELECT custkey FROM y96)
    """,
)
def q43_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def cohort(year: int) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .select(F.col("o_custkey").alias("custkey"))
            .distinct()
        )

    # 1995/1996: inside the testdata's 1995-2001 order-date range so both
    # set operations verify against real rows (a 0=0 match checks nothing).
    y95, y96 = cohort(1995), cohort(1996)
    both = y95.intersect(y96).withColumn("cohort", F.lit("both"))
    only95 = y95.subtract(y96).withColumn("cohort", F.lit("only_1995"))
    return both.unionByName(only95)


# ---------------------------------------------------------------------------
# q44 — semi/anti-join cohorts (EXISTS / NOT EXISTS): per-nation counts
# of customers with vs without an urgent order. The urgent-custkey set
# is derived once (filter pushed to the orders scan, then distinct);
# left_semi/left_anti never widen customer rows — no payload shuffle,
# and the two passes share the cached probe side.
# ---------------------------------------------------------------------------


@register(
    "q44_exists_cohorts",
    """
    WITH urgent AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderpriority = '1-URGENT')
    SELECT c_nationkey AS nationkey, 'has_urgent' AS cohort,
           count(*) AS n_customers
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM urgent)
    GROUP BY 1
    UNION ALL
    SELECT c_nationkey AS nationkey, 'no_urgent' AS cohort,
           count(*) AS n_customers
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM urgent)
    GROUP BY 1
    """,
)
def q44_exists_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    on = customer.c_custkey == urgent.o_custkey

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
            F.count("*").alias("n_customers")
        ).select("nationkey", F.lit(tag).alias("cohort"), "n_customers")

    has = agg(customer.join(urgent, on, "left_semi"), "has_urgent")
    without = agg(customer.join(urgent, on, "left_anti"), "no_urgent")
    return has.unionByName(without)


# ---------------------------------------------------------------------------
# q45 — full-outer reconciliation of two aggregates: per-nation
# customer counts vs supplier counts. Each side pre-aggregates to at
# most 25 rows BEFORE the join — the full-outer join runs on two
# dim-sized inputs instead of two fact tables, the shape that survives
# a 100× scale-up.
# ---------------------------------------------------------------------------


@register(
    "q45_full_outer_recon",
    """
    WITH c AS (SELECT c_nationkey AS k, count(*) AS n_cust
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS k, count(*) AS n_supp
               FROM supplier GROUP BY 1)
    SELECT coalesce(c.k, s.k) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.k = s.k
    """,
)
def q45_full_outer_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cust.join(supp, cust.ck == supp.sk, "full_outer").select(
        F.coalesce("ck", "sk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# ---------------------------------------------------------------------------
# q46 — ranking-function suite: row_number / ntile / percent_rank /
# cume_dist / lag delta under ONE total order (o_totalprice DESC,
# o_orderkey — unique, so every function is deterministic on both
# engines). The priority partition key is a bounded categorical (5
# values), so a direct rank window would funnel the fact through a
# handful of sort tasks; instead the global row number comes from
# operators.ranks.segmented_total_order (range-bucketed parallel
# ranking, one composite-key window) and every other rank function is
# algebra over (rn, n_part): rank == rn (no peers under a total
# order), percent_rank = (rn-1)/(n-1), cume_dist = rn/n, ntile via the
# integer tile formula, lag via the segment-carried prev_val. The
# oracle keeps the plain window form — same values, different physical
# strategy.
# ---------------------------------------------------------------------------


@register(
    "q46_rank_suite",
    """
    SELECT o_orderkey AS order_id,
           o_orderpriority AS priority,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(ntile(10) OVER w AS INT) AS decile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           -- VARCHAR render of the exact decimal delta (see q37 note)
           CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                     - lag(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                AS DECIMAL(18,2)) AS VARCHAR) AS price_drop
    FROM orders
    WHERE year(o_orderdate) = 1995 AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q46_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1995: inside the testdata's 1995-2001 order-date range so every rank
    # function is exercised against real rows.
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == 1995)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    s = RK.segmented_total_order(
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        "o_orderpriority",
        "o_totalprice",
        "o_orderkey",
        bucket_width=10000.0,
        descending=True,
    )
    rn, n = F.col("rn"), F.col("n_part")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    prev_price = F.col("prev_val").cast("decimal(18,2)")
    return s.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderpriority").alias("priority"),
        rn.cast("long").alias("rn"),
        RK.ntile_from_rn(rn, n, 10).cast("int").alias("decile"),
        F.round(F.when(n == 1, 0.0).otherwise((rn - 1) / (n - 1)), 6).alias("pr"),
        F.round(rn / n, 6).alias("cd"),
        (price - prev_price).cast("decimal(18,2)").cast("string").alias("price_drop"),
    )


# ---------------------------------------------------------------------------
# q47 — conditional aggregation: FILTER-counts and CASE-sums fold into
# one partial/final hash aggregate — one scan, one shuffle of 4-row
# partials, however many predicates. The common anti-pattern (N
# filtered self-joins, one per condition) scans the fact N times.
# ---------------------------------------------------------------------------


@register(
    "q47_conditional_agg",
    """
    SELECT l_returnflag AS flag,
           count(*) AS n_rows,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           count(DISTINCT l_suppkey)
               FILTER (WHERE l_quantity >= 30) AS n_bulk_suppliers,
           sum(CASE WHEN l_tax > 0.04
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS taxed_revenue,
           round(avg(l_quantity) FILTER (WHERE l_linestatus = 'O'), 6)
               AS avg_open_qty
    FROM lineitem
    GROUP BY 1
    """,
)
def q47_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast("decimal(18,2)")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.count_distinct(
            F.when(F.col("l_quantity") >= 30, F.col("l_suppkey"))
        ).alias("n_bulk_suppliers"),
        F.sum(
            F.when(
                F.col("l_tax") > 0.04,
                F.col("l_extendedprice").cast("decimal(18,2)"),
            ).otherwise(zero)
        )
        .cast("decimal(18,2)")
        .alias("taxed_revenue"),
        F.round(
            F.avg(F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))), 6
        ).alias("avg_open_qty"),
    )


# ---------------------------------------------------------------------------
# q236 — TPC-H Q5-shape local-supplier revenue: the canonical 6-table
# star join (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈
# region with the local-supplier predicate s_nationkey = c_nationkey)
# — the join-ordering showcase the OLAP surface lacked. Plan shape at
# 100 TB: region/nation broadcast into customer (no fact shuffle for
# the dim cascade); orders is date-filtered AT THE SCAN (pushed
# predicate) before its custkey shuffle; lineitem shuffles once on
# orderkey and once on suppkey for the supplier probe — supplier
# scales with the corpus in TPC-H, so it is a real shuffle join, not
# a broadcast. Revenue uses the module's 2-decimal sum convention.
# ---------------------------------------------------------------------------

_Q5_REGION = "ASIA"
_Q5_YEAR = 1996


@register(
    "q236_local_supplier_revenue",
    f"""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = '{_Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '{_Q5_YEAR}-01-01'
      AND o.o_orderdate < TIMESTAMP '{_Q5_YEAR + 1}-01-01'
    GROUP BY n.n_name
    """,
)
def q236_local_supplier_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q5_REGION
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    customer = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_nationkey", "n_name")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate")
             >= F.to_timestamp(F.lit(f"{_Q5_YEAR}-01-01")))
            & (F.col("o_orderdate")
               < F.to_timestamp(F.lit(f"{_Q5_YEAR + 1}-01-01")))
        )  # range form (not year()=) so the predicate pushes to parquet
        .select("o_orderkey", "o_custkey")
    )
    co = orders.join(
        customer, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "c_nationkey", "n_name")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    col_ = lineitem.join(
        co, F.col("l_orderkey") == F.col("o_orderkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    j = col_.join(
        supplier,
        (F.col("s_suppkey") == F.col("l_suppkey"))
        & (F.col("s_nationkey") == F.col("c_nationkey")),
    )
    return j.groupBy("n_name").agg(
        F.count("*").cast("bigint").alias("n_lineitems"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )
