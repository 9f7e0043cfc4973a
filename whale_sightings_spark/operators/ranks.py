"""Distributed ranking: window-function semantics without ever
partitioning a Window by a bounded-cardinality group key over row-scale
data.

A rank window `PARTITION BY g ORDER BY v` funnels each group through
ONE sort task; when |g| is a small constant (return flags, order
priorities, languages) the whole fact serializes through a handful of
cores — correct at sf0.1, dead at 100 TB. These operators compute the
same values with the classic range-partitioned ranking strategy
(repartitionByRange + sortWithinPartitions, spelled in DataFrame
algebra so Catalyst sees it):

1. range-bucket the order key: ``bucket = floor(v / width)`` — order-
   preserving, so bucket order == value order;
2. aggregate per-(group, bucket) row counts — a BOUNDED table (groups x
   buckets), whose exclusive prefix sums under the bucket order are the
   global rank offsets; tiny windows over that table are free and the
   result broadcasts;
3. one Window partitioned by the composite (group, bucket) key sorts
   each segment in parallel — the only row-scale exchange;
4. global rank = bucket offset + within-segment rank.

``bucket_width`` is the scale knob: pick it so groups x buckets is a
few times the cluster's parallelism (exactly what repartitionByRange's
sampler does). Cross-segment carries (partition sizes for
percent_rank/cume_dist/ntile, the previous bucket's last row for lag)
all live in the bounded bucket table and broadcast.

No analogue exists in the reference (its pandas `rank()` sorts on one
core by construction — reference ``cleaner.py`` has no ranking at all);
this module is the 100 TB-shape for the q46/q105 analytics the
notebook-style surface exposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def freq_avg_ranks(df: DataFrame, group: str, val: str) -> DataFrame:
    """(group, val, avg_rank) from the frequency table — for BOUNDED
    value domains (|group| x |values| rows), where both the window and
    the subsequent broadcast join back to the fact are trivially cheap.

    Average rank with the standard tie treatment:
    ``avg_rank(v) = (#rows < v) + (tie_count(v) + 1) / 2`` — exact
    halves, so downstream float comparisons are engine-stable.
    """
    counts = df.groupBy(group, val).agg(F.count("*").alias("c"))
    w = (
        W.partitionBy(group)
        .orderBy(val)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return counts.withColumn("cum", F.sum("c").over(w)).select(
        group,
        val,
        (F.col("cum") - F.col("c") + (F.col("c") + 1) / 2.0).alias("avg_rank"),
    )


def segmented_avg_rank(
    df: DataFrame, group: str, val: str, bucket_width: float, out: str
) -> DataFrame:
    """Append per-row average rank (ties averaged) of `val` within
    `group` — for HIGH-cardinality value domains, via the module-header
    strategy. Within a segment, min rank comes from ``rank()`` and max
    rank from a RANGE-framed count (peers included); their mean is the
    tie-averaged rank. `val` must be non-null.
    """
    seg = df.withColumn(
        "__b", F.floor(F.col(val) / F.lit(float(bucket_width))).cast("bigint")
    )
    btot = seg.groupBy(group, "__b").agg(F.count("*").alias("bn"))
    wb = (
        W.partitionBy(group)
        .orderBy("__b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    off = btot.select(
        group, "__b", (F.sum("bn").over(wb) - F.col("bn")).alias("__off")
    )
    wseg = W.partitionBy(group, "__b").orderBy(val)
    wpeers = wseg.rangeBetween(W.unboundedPreceding, W.currentRow)
    return (
        seg.join(F.broadcast(off), [group, "__b"])
        .withColumn("__minr", F.rank().over(wseg))
        .withColumn("__maxr", F.count("*").over(wpeers))
        .withColumn(
            out, F.col("__off") + (F.col("__minr") + F.col("__maxr")) / 2.0
        )
        .drop("__b", "__off", "__minr", "__maxr")
    )


def segmented_total_order(
    df: DataFrame,
    part: str,
    order_col: str,
    unique_col: str,
    bucket_width: float,
    descending: bool = False,
) -> DataFrame:
    """Append, under the total order ``(order_col [DESC], unique_col)``
    within each `part`:

    - ``rn``       — 1-based global row number,
    - ``n_part``   — partition row count,
    - ``prev_val`` — previous row's `order_col` (null for the first row).

    ``rn`` + ``n_part`` reconstruct every rank function over a total
    order (row_number == rank; percent_rank = (rn-1)/(n-1); cume_dist =
    rn/n; ntile via :func:`ntile_from_rn`), and ``prev_val`` gives
    lag(order_col). The cross-bucket lag carry is the previous bucket's
    last value, aggregated in the same bounded bucket table as the
    offsets. `order_col` must be non-null.
    """
    sign = F.lit(-1.0 if descending else 1.0)
    seg = df.withColumn(
        "__b",
        F.floor(F.col(order_col) * sign / F.lit(float(bucket_width))).cast(
            "bigint"
        ),
    )
    last_val = (F.min(order_col) if descending else F.max(order_col)).alias(
        "__last"
    )
    btot = seg.groupBy(part, "__b").agg(F.count("*").alias("bn"), last_val)
    wb = (
        W.partitionBy(part)
        .orderBy("__b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    off = btot.select(
        part,
        "__b",
        (F.sum("bn").over(wb) - F.col("bn")).alias("__off"),
        F.sum("bn").over(W.partitionBy(part)).alias("n_part"),
        F.lag("__last").over(W.partitionBy(part).orderBy("__b")).alias(
            "__prev_last"
        ),
    )
    order_exprs = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(unique_col).asc(),
    ]
    wseg = W.partitionBy(part, "__b").orderBy(*order_exprs)
    return (
        seg.join(F.broadcast(off), [part, "__b"])
        .withColumn("rn", F.col("__off") + F.row_number().over(wseg))
        .withColumn(
            "prev_val",
            F.coalesce(F.lag(order_col).over(wseg), F.col("__prev_last")),
        )
        .drop("__b", "__off", "__prev_last")
    )


def _idiv(a, b):
    """Exact integer division on long columns: (a - a % b) / b keeps the
    double division remainder-free, so the result is exact for any
    |a| < 2^53 (float `/` alone can round at floor boundaries)."""
    return ((a - (a % b)) / b).cast("long")


def ntile_from_rn(rn, n, k: int):
    """NTILE(k) reconstructed from a global row number `rn` and the
    partition size `n` — the first ``n % k`` tiles get ``n div k + 1``
    rows, the rest ``n div k`` (the semantics both Spark and DuckDB
    implement). Pure integer algebra, so it composes with
    :func:`segmented_total_order` without another window pass. When
    ``n < k`` the `rest` branch divides by zero, which Spark's non-ANSI
    mode nulls out — unreachable there because ``boundary == n``.
    """
    base = _idiv(n, F.lit(k))
    rem = n % k
    big = base + 1
    boundary = rem * big
    first = _idiv(rn - 1, big) + 1
    rest = rem + _idiv(rn - 1 - boundary, base) + 1
    return F.when(rn <= boundary, first).otherwise(rest)
