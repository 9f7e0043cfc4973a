"""Skew-safe aggregation patterns (net-new scale surface).

Spark's hash aggregate already does map-side partial aggregation, so
plain sum/count need no manual salting. The case that genuinely skews
at 100 TB is *heavy per-key state*: COUNT(DISTINCT v) over a hot
grouping key concentrates that key's entire distinct-set on one
reducer. The fix is value-range salting — partition the DISTINCT state,
not the rows: bucket by a function of the *value*, count distinct per
(key, bucket), then sum the disjoint partial counts. Exact by
construction (buckets partition the value space), and the hot key's
state is spread across ``buckets`` reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default number of value buckets for salted distinct aggregation
DEFAULT_SALT_BUCKETS = 16


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
    salt: Column | None = None,
) -> DataFrame:
    """Exact COUNT(DISTINCT value_col) per key via value-partitioned
    two-stage aggregation.

    ``salt`` defaults to ``value % buckets`` (numeric values); any
    deterministic function of the value works — the result is
    independent of the salt function because buckets partition values.
    Output: (*keys, n_distinct).
    """
    if salt is None:
        salt = F.pmod(F.col(value_col), F.lit(buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count_distinct(F.col(value_col)).alias("__partial_distinct"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__partial_distinct").cast("bigint").alias("n_distinct")
    )
