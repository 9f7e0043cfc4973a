"""Date/time function breadth (complements the messy-date cascade with
the calendar arithmetic a reporting workload uses daily — SURVEY §2.8
F10/F11 extensions):

- q86 calendar function suite (week/quarter truncation, month ends,
  month arithmetic, ISO weekday) — cross-engine semantics pinned where
  numbering conventions differ (Spark weekday is 0=Monday, DuckDB
  isodow is 1=Monday)
- q87 running extremes per key (cumulative max + drawdown) — the
  monotonic-frame window pattern (watermark-bounded in its streaming
  analog)

Both single-shuffle; all expressions native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from whale_sightings_spark.plans.queries import register
from whale_sightings_spark.schemas import load_table


@register(
    "q86_calendar_suite",
    """
    SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS wk,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qtr,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d')
               AS plus_3m,
           CAST(isodow(o_orderdate) AS INT) AS iso_weekday,
           count(*) AS n
    FROM orders
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def q86_calendar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("week", d), "yyyy-MM-dd").alias("wk"),
            F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias("qtr"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
            F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3m"),
            # Spark weekday: 0=Monday; ISO dow: 1=Monday
            (F.weekday(d) + 1).cast("int").alias("iso_weekday"),
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "q87_running_extremes",
    """
    SELECT user_id,
           event_id,
           round(value, 2) AS value,
           round(max(value) OVER w, 2) AS run_max,
           round(max(value) OVER w - value, 2) AS drawdown
    FROM events
    WHERE user_id % 20 = 0
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
    """,
)
def q87_running_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run_max = F.max("value").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value"),
        F.round(run_max, 2).alias("run_max"),
        F.round(run_max - F.col("value"), 2).alias("drawdown"),
    )


# ---------------------------------------------------------------------------
# q104 — trailing EWMA (exponentially-weighted moving average) per user:
# the time-series smoother behind anomaly baselines and rate limiting.
# True EWMA is a recursion windows can't express natively; the standard
# distributed form is the TRAILING-WINDOW approximation — weights decay
# (1-a)^k over the last 10 observations, renormalized by the closed-form
# weight sum (1-(1-a)^L)/a, so short heads are unbiased. collect_list
# over an ORDERED frame is deterministic (total order ts, event_id);
# the weighted fold is a native zip_with/aggregate — no UDF. One
# shuffle: the user_id window partition.
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_WINDOW = 10
_EWMA_FMT_US = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "q104_ewma",
    f"""
    WITH e AS (
        SELECT user_id, event_id, ts, value FROM events WHERE user_id < 50
    ),
    arr AS (
        SELECT user_id, event_id, ts,
               list(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_EWMA_WINDOW - 1} PRECEDING AND CURRENT ROW
               ) AS a
        FROM e
    )
    SELECT user_id, event_id,
           strftime(ts, '{_EWMA_FMT_US}') AS ts,
           round(
               list_sum(list_transform(
                   list_zip(a, generate_series(1, len(a))),
                   p -> p[1] * pow({1 - _EWMA_ALPHA}, len(a) - p[2])
               )) * {_EWMA_ALPHA} / (1 - pow({1 - _EWMA_ALPHA}, len(a))),
           6) AS ewma
    FROM arr
    """,
)
def q104_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select("user_id", "event_id", "ts", "value")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_WINDOW - 1), W.currentRow)
    )
    decay = F.lit(1 - _EWMA_ALPHA)
    arr = ev.withColumn("a", F.collect_list("value").over(w))
    num = F.aggregate(
        F.zip_with(
            F.col("a"),
            F.sequence(F.lit(1), F.size("a")),
            lambda x, i: x
            * F.pow(decay, (F.size(F.col("a")) - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return arr.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.round(
            num * _EWMA_ALPHA / (1 - F.pow(decay, F.size("a").cast("double"))), 6
        ).alias("ewma"),
    )
