"""As-of (nearest-prior) join — a join class the reference lacks
(SURVEY §2.3 notes no range/as-of joins), first-class for event/
time-series work at scale.

Spark has no native as-of join; the naive formulation (inequality join
then per-left-row max) shuffles the cross-ish pair space and re-groups.
This implementation uses the union + running-last trick: tag and union
both inputs, one window per partition key ordered by time carries the
most recent right-side payload forward, then keep only left rows. ONE
shuffle on the partition key, state bounded by a single carried row —
the optimal distributed shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_cols: list[str],
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: each left row gains the ``right_cols`` of the
    most recent right row with ``right.ts <= left.ts`` and equal ``on``
    key (nulls when none precedes).

    ``right`` must be unique per (on, ts) — pre-aggregate ties upstream
    (the match would otherwise be ambiguous in any engine). At equal
    timestamps the right row matches (inclusive bound): right rows sort
    before left rows within a timestamp. The right payload is carried
    as ONE struct so a null payload *value* can never splice fields
    from different right rows.

    ``tolerance`` (an SQL interval string, e.g. ``"30 minutes"``)
    bounds how stale a match may be: a carried right row older than
    ``left.ts - tolerance`` is discarded (payload columns become NULL),
    the pandas ``merge_asof(tolerance=...)`` / kdb ``wj`` semantics.
    Implemented as a row-local predicate on the carried match's
    timestamp — the plan keeps its ONE shuffle.
    """
    # "__rts" is the reserved struct field carrying the matched right
    # row's timestamp; a caller column of that name would duplicate the
    # field and make the tolerance predicate ambiguous
    assert "__rts" not in right_cols and "__rts" not in left.columns, (
        "'__rts' is reserved by asof_join"
    )
    lcols = left.columns
    payload_fields = [
        f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in right_cols
    ] + [f"`__rts`:{right.schema[ts_col].dataType.simpleString()}"]

    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__payload",
        F.lit(None).cast("struct<" + ", ".join(payload_fields) + ">"),
    )
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c) for c in right_cols], F.col(ts_col).alias("__rts")
        ).alias("__payload"),
    )
    for c in lcols:
        if c not in (on, ts_col):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l.unionByName(r.select(*lcols, "__side", "__payload"))
    w = (
        W.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        F.last("__payload", ignorenulls=True).over(w).alias("__payload"),
    )
    if tolerance is not None:
        carried = carried.withColumn(
            "__payload",
            F.when(
                F.col(f"__payload.__rts")
                >= F.col(ts_col) - F.expr(f"INTERVAL {tolerance}"),
                F.col("__payload"),
            ),
        )
    return carried.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__payload.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_cols: list[str],
    suffix: str = "_near",
) -> DataFrame:
    """Nearest-match as-of join (pandas ``merge_asof(direction=
    'nearest')``): each left row gains the ``right_cols`` of the right
    row minimizing ``|right.ts - left.ts|`` over equal ``on`` keys;
    exactly-equidistant candidates resolve to the BACKWARD one (the
    contract is explicit because engines disagree here). Same
    uniqueness precondition as :func:`asof_join`.

    Shape: the same union + single shuffle, but TWO window passes over
    the one sort order — a running-last (backward candidate) and a
    running-first over the forward frame — then a row-local distance
    compare. No second exchange: both frames share the partitioning
    and ordering, so Catalyst plans them in one sorted pipeline.
    """
    assert "__rts" not in right_cols and "__rts" not in left.columns, (
        "'__rts' is reserved by asof_join_nearest"
    )
    lcols = left.columns
    payload_fields = [
        f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in right_cols
    ] + [f"`__rts`:{right.schema[ts_col].dataType.simpleString()}"]

    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__payload",
        F.lit(None).cast("struct<" + ", ".join(payload_fields) + ">"),
    )
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c) for c in right_cols], F.col(ts_col).alias("__rts")
        ).alias("__payload"),
    )
    for c in lcols:
        if c not in (on, ts_col):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l.unionByName(r.select(*lcols, "__side", "__payload"))
    order = [F.col(ts_col).asc(), F.col("__side").asc()]
    wb = (
        W.partitionBy(on).orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(on).orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        F.last("__payload", ignorenulls=True).over(wb).alias("__b"),
        F.first("__payload", ignorenulls=True).over(wf).alias("__f"),
    )
    # interval subtraction works for TIMESTAMP and TIMESTAMP_NTZ alike
    # (unix_micros rejects NTZ); day-time intervals compare directly
    bdist = F.col(ts_col) - F.col("__b.__rts")
    fdist = F.col("__f.__rts") - F.col(ts_col)
    picked = (
        F.when(F.col("__b").isNull() & F.col("__f").isNull(), F.lit(None))
        .when(F.col("__f").isNull(), F.col("__b"))
        .when(F.col("__b").isNull(), F.col("__f"))
        .when(bdist <= fdist, F.col("__b"))
        .otherwise(F.col("__f"))
    )
    return (
        carried.filter(F.col("__side") == 1)
        .withColumn("__payload", picked)
        .select(
            *lcols,
            *[F.col(f"__payload.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )
