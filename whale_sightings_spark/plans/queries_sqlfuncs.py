"""SQL function breadth family (net-new completeness surface: the
scalar/window/array function classes a user migrating arbitrary SQL
onto this engine reaches for first — reference parity anchors are the
notebook's ad-hoc expressions, SURVEY §2.8):

- q80 ordered string aggregation (listagg / string_agg parity)
- q81 percent-of-total window distribution
- q82 window navigation (first/last/nth value over explicit frames)
- q83 array pipeline (transform / filter / aggregate / sort natively)
- q84 regexp extraction suite
- q85 ANSI try_* arithmetic (errors become NULLs, never job failures)

All row-local or single-shuffle; rendering rules (array_join, fixed
rounding, BIGINT casts) keep both engines hash-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from whale_sightings_spark.plans.queries import register
from whale_sightings_spark.schemas import load_table


# ---------------------------------------------------------------------------
# q80 — ordered string aggregation: the LISTAGG/STRING_AGG shape.
# Deterministic by construction: collect_list under a groupBy has no
# order contract, so the list is array_sort'ed before joining — the
# only portable way to make string aggregation reproducible on a
# distributed engine (same rule the oracle applies via ORDER BY).
# ---------------------------------------------------------------------------

@register(
    "q80_string_agg",
    """
    SELECT n_nationkey AS nation_id,
           string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segments,
           count(*) AS n
    FROM (
        SELECT DISTINCT c_nationkey AS n_nationkey, c_mktsegment FROM customer
    )
    GROUP BY 1
    """,
)
def q80_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(F.col("c_nationkey").alias("nation_id"), "c_mktsegment")
        .distinct()
        .groupBy("nation_id")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("c_mktsegment")), "|"
            ).alias("segments"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# q81 — percent-of-total distribution: each order's share of its
# customer's spend. One window shuffle partitioned by the real key;
# at scale this is the partial-agg-free form of "ratio to report".
# ---------------------------------------------------------------------------

@register(
    "q81_pct_of_total",
    """
    SELECT o_orderkey AS order_id,
           o_custkey AS cust_id,
           round(o_totalprice / sum(o_totalprice) OVER (PARTITION BY o_custkey), 6)
               AS share,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_custkey % 100 = 0
    """,
)
def q81_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = W.partitionBy("o_custkey")
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("cust_id"),
        F.round(F.col("o_totalprice") / F.sum("o_totalprice").over(w), 6).alias(
            "share"
        ),
        F.count("*").over(w).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# q82 — window navigation: first / last / nth value per user timeline
# with an explicit unbounded frame (last_value over the default frame
# is a classic wrong-answer trap — pinned here on both engines).
# ---------------------------------------------------------------------------

@register(
    "q82_window_nav",
    """
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type,
           nth_value(event_type, 3) OVER w AS third_type,
           CAST(count(*) OVER w AS BIGINT) AS n_events
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def q82_window_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 3).over(w).alias("third_type"),
        F.count("*").over(w).alias("n_events"),
    ).distinct()


# ---------------------------------------------------------------------------
# q83 — array pipeline entirely in native higher-order functions:
# build each order's quantity vector, filter/transform/aggregate it
# row-locally (zero Python, zero explode-regroup round trips).
# ---------------------------------------------------------------------------

@register(
    "q83_array_pipeline",
    """
    WITH lv AS (
        SELECT l_orderkey,
               list_sort(list(l_quantity ORDER BY l_linenumber)) AS qty_sorted
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey AS order_id,
           array_to_string(qty_sorted, ',') AS quantities,
           CAST(len(list_filter(qty_sorted, q -> q >= 25)) AS INT) AS n_large,
           round(list_sum(list_transform(qty_sorted, q -> q * 2.0)), 2)
               AS doubled_total
    FROM lv
    WHERE l_orderkey % 50 = 0
    """,
)
def q83_array_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    lv = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("qty_sorted")
    )
    return lv.select(
        F.col("l_orderkey").alias("order_id"),
        F.array_join(F.col("qty_sorted").cast("array<string>"), ",").alias(
            "quantities"
        ),
        F.size(F.filter("qty_sorted", lambda q: q >= 25)).alias("n_large"),
        F.round(
            F.aggregate(
                F.transform("qty_sorted", lambda q: q * 2.0),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            2,
        ).alias("doubled_total"),
    )


# ---------------------------------------------------------------------------
# q84 — regexp extraction suite over the JSON props strings: named
# field pulls + all-match counts, row-local.
# ---------------------------------------------------------------------------

@register(
    "q84_regex_suite",
    """
    SELECT event_type,
           CAST(sum(CASE WHEN regexp_matches(props, '"k":\\s*[0-9]+')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
           CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
               AS total_numbers,
           min(regexp_extract(props, '"tag":\\s*"([a-z]+)"', 1)) AS first_tag
    FROM events
    GROUP BY event_type
    """,
)
def q84_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(
            F.col("props").rlike('"k":\\s*[0-9]+').cast("long")
        ).alias("n_with_k"),
        F.sum(F.size(F.regexp_extract_all("props", F.lit("[0-9]+"), 0))).alias(
            "total_numbers"
        ),
        F.min(F.regexp_extract("props", '"tag":\\s*"([a-z]+)"', 1)).alias(
            "first_tag"
        ),
    )


# ---------------------------------------------------------------------------
# q85 — ANSI try_* arithmetic: Spark 4 runs ANSI mode ON, so division
# by zero / overflow / bad casts are runtime errors unless the try_*
# forms are used. This query feeds deliberately poisonous expressions
# through try_divide / try_cast and proves they degrade to NULL
# identically on both engines — the dirty-input contract every 100 TB
# ingest needs (one bad row must not kill a 10-hour job).
# ---------------------------------------------------------------------------

@register(
    "q85_try_arithmetic",
    """
    SELECT l_returnflag AS flag,
           CAST(sum(CASE WHEN q_div IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_div_null,
           round(sum(coalesce(q_div, 0)), 2) AS sum_div,
           CAST(sum(CASE WHEN bad_int IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cast_null
    FROM (
        SELECT l_returnflag,
               l_extendedprice / nullif(l_quantity - 25, 0) AS q_div,
               TRY_CAST(l_comment_like AS INTEGER) AS bad_int
        FROM (
            SELECT l_returnflag, l_extendedprice, l_quantity,
                   CASE WHEN l_linenumber = 1 THEN 'not-a-number'
                        ELSE CAST(l_linenumber AS VARCHAR) END AS l_comment_like
            FROM lineitem
        )
    )
    GROUP BY 1
    """,
)
def q85_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    staged = li.select(
        "l_returnflag",
        F.try_divide(
            F.col("l_extendedprice"), F.nullif(F.col("l_quantity") - 25, F.lit(0))
        ).alias("q_div"),
        F.when(F.col("l_linenumber") == 1, "not-a-number")
        .otherwise(F.col("l_linenumber").cast("string"))
        .try_cast("int")
        .alias("bad_int"),
    )
    return staged.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.sum(F.col("q_div").isNull().cast("long")).alias("n_div_null"),
        F.round(F.sum(F.coalesce("q_div", F.lit(0.0))), 2).alias("sum_div"),
        F.sum(F.col("bad_int").isNull().cast("long")).alias("n_cast_null"),
    )
