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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_row_id: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Skew-safe equi-join: spread each hot join key across ``buckets``
    reducers.

    The fact side salts every row by a deterministic hash of its unique
    row id (NOT the join key — the salt must vary *within* a key to
    split it); the dim side replicates each row once per salt value.
    Joining on (key, salt) then yields exactly the plain join's rows —
    the replicated dim covers every salt — while a key that used to
    land on one reducer now lands on ``buckets`` of them.

    Use when the dim is too large to broadcast AND the fact's key
    distribution is heavy-tailed (AQE's skew-join split handles
    moderate skew on its own; salting is the explicit, plannable form).
    Cost: dim inflates ``buckets``×, so size buckets to the skew, not
    higher. Returns the joined frame with internal columns dropped.
    """
    salt_f = F.pmod(F.xxhash64(F.col(fact_row_id)), F.lit(buckets))
    salted_fact = fact.withColumn("__salt", salt_f)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    joined = salted_fact.join(
        salted_dim,
        (F.col(fact_key) == F.col(dim_key)) & (salted_fact["__salt"] == salted_dim["__salt"]),
    )
    return joined.drop("__salt")
