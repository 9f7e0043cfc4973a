"""Registered query surface (SURVEY.md §2 inventory -> driver contract).

Every operator class from the reference is exercised as a named query
over the driver's testdata tables, each paired with the ANSI-SQL
DuckDB oracle that computes the same answer. Conventions:

- every computed column is aliased identically in Spark and SQL
  (the driver's compare sorts columns by name before hashing);
- floating-point aggregates are rounded to 2 decimals on both sides so
  summation-order differences can't flip the hash;
- timestamps are emitted as formatted strings (session TZ pinned UTC);
- joins against dimension-sized tables are explicitly broadcast — at
  100 TB the fact side never shuffles for a dim lookup.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from whale_sightings_spark.functions.dates import (
    BAD_DATE_FORMATS,
    date_is_valid,
    is_bad_date_format,
    split_dates_duckdb_sql,
    with_date_parts,
)
from whale_sightings_spark.schemas import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # ship the package to executors once per context so queries
            # using pandas UDFs work whatever the driver's cwd is
            from whale_sightings_spark.deploy import ship_package

            ship_package(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# q01 — scan + equality filter + aliased projection (P1/P8/P10; reference
# notebook cell 9: SELECT ... AS ... WHERE speciesId = const).
# Filter + pruned 5-column read both push to the parquet scan.
# ---------------------------------------------------------------------------

@register(
    "q01_filter_project",
    """
    SELECT l_orderkey AS order_id,
           l_linenumber AS line_no,
           l_extendedprice AS price,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity < 10
    """,
)
def q01_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") < 10))
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_linenumber").alias("line_no"),
            F.col("l_extendedprice").alias("price"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — fact ⋈ dim equi-joins + filter (J2/J3; notebook cells 9-10).
# customer and nation are dim-sized -> broadcast, no fact shuffle.
# ---------------------------------------------------------------------------

@register(
    "q02_join_filter",
    """
    SELECT o.o_orderkey AS order_id,
           c.c_name AS customer,
           n.n_name AS nation,
           o.o_totalprice AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def q02_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            orders.o_custkey == customer.c_custkey,
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("c_name").alias("customer"),
            F.col("n_name").alias("nation"),
            F.col("o_totalprice").alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# q03 — sightings-per-year: group-by-year count + range filter + desc sort
# (A4/P9/O1/W4; the reference notebook cell-13 flagship query).
# ---------------------------------------------------------------------------

@register(
    "q03_orders_per_year",
    """
    SELECT CAST(date_part('year', o_orderdate) AS INT) AS yr,
           count(*) AS n
    FROM orders
    GROUP BY 1
    HAVING yr >= 1993 AND yr < 1998
    ORDER BY n DESC, yr
    """,
)
def q03_orders_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(F.count("*").alias("n"))
        .filter((F.col("yr") >= 1993) & (F.col("yr") < 1998))
        .orderBy(F.desc("n"), "yr")
    )


# ---------------------------------------------------------------------------
# q04 — min/max bounds after validity filter (A2/A3/P5; reference
# cleaner.py:170-192 get_start_and_end). String min/max on ISO dates.
# ---------------------------------------------------------------------------

@register(
    "q04_minmax_bounds",
    """
    SELECT min(strftime(o_orderdate, '%Y-%m-%d')) AS start_date,
           max(strftime(o_orderdate, '%Y-%m-%d')) AS end_date
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def q04_minmax_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg(F.min("d").alias("start_date"), F.max("d").alias("end_date"))
    )


# ---------------------------------------------------------------------------
# q05 — keep-first dedup as an explicit window (W2/U4; reference
# cleaner.py:353-354 drop_duplicates(keep='first')). Spark's bare
# dropDuplicates keeps an arbitrary row — parity needs the deterministic
# ingest ordinal (l_orderkey, l_linenumber) ordering.
# ---------------------------------------------------------------------------

@register(
    "q05_dedup_keep_first",
    """
    SELECT l_partkey, l_suppkey,
           l_orderkey AS first_order,
           l_linenumber AS first_line,
           l_quantity AS qty
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_partkey, l_suppkey
        ORDER BY l_orderkey, l_linenumber) = 1
    """,
)
def q05_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_partkey", "l_suppkey").orderBy("l_orderkey", "l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_partkey",
            "l_suppkey",
            F.col("l_orderkey").alias("first_order"),
            F.col("l_linenumber").alias("first_line"),
            F.col("l_quantity").alias("qty"),
        )
    )


# ---------------------------------------------------------------------------
# q06 — union + distinct (U1/U2/U3; reference cleaner.py:350-351 concat,
# 309 full-row dedup).
# ---------------------------------------------------------------------------

@register(
    "q06_union_distinct",
    """
    SELECT DISTINCT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
)
def q06_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .unionByName(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


# ---------------------------------------------------------------------------
# q07 — surrogate-key dim encoding: anti-join new names + max(id)+row_number
# (J5/S14/A6/A7; reference procedures.sql:4-28 insert_or_update_location).
# ---------------------------------------------------------------------------

@register(
    "q07_surrogate_keys",
    """
    WITH dim AS (
        SELECT n_nationkey AS id, n_name AS name FROM nation WHERE n_regionkey < 2
    ),
    incoming AS (
        SELECT DISTINCT n_name AS name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ),
    new_names AS (
        SELECT name FROM incoming WHERE name NOT IN (SELECT name FROM dim)
    ),
    mx AS (SELECT COALESCE(MAX(id), -1) AS mx FROM dim)
    SELECT CAST(mx + row_number() OVER (ORDER BY name) AS INT) AS id, name
    FROM new_names, mx
    UNION ALL
    SELECT id, name FROM dim
    """,
)
def q07_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    dim = nation.filter(F.col("n_regionkey") < 2).select(
        F.col("n_nationkey").alias("id"), F.col("n_name").alias("name")
    )
    incoming = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("name"))
        .distinct()
    )
    new_names = incoming.join(dim.select("name"), "name", "left_anti")
    mx = dim.agg(F.coalesce(F.max("id"), F.lit(-1)).alias("mx"))
    # global window over post-distinct dim names only (bounded
    # dictionary cardinality) — never over fact rows; see operators/
    # ordinal.py for the distributed numbering used when that bound
    # doesn't hold
    assigned = (
        new_names.crossJoin(F.broadcast(mx))
        .select(
            (F.col("mx") + F.row_number().over(W.orderBy("name"))).cast("int").alias("id"),
            "name",
        )
    )
    return dim.unionByName(assigned)


# ---------------------------------------------------------------------------
# q08 — null-safe dim lookup (J4; reference procedures.sql:12-17's
# NULL-aware name match). Spark `eqNullSafe` == SQL IS NOT DISTINCT FROM.
# ---------------------------------------------------------------------------

@register(
    "q08_nullsafe_lookup",
    """
    WITH facts AS (
        SELECT nullif(o_orderpriority, '3-MEDIUM') AS name FROM orders
    ),
    dim AS (
        SELECT name,
               CAST(row_number() OVER (ORDER BY name NULLS FIRST) AS INT) AS id
        FROM (SELECT DISTINCT name FROM facts)
    )
    SELECT d.id AS id, d.name AS name, count(*) AS n
    FROM facts f JOIN dim d ON f.name IS NOT DISTINCT FROM d.name
    GROUP BY 1, 2
    """,
)
def q08_nullsafe_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    facts = orders.select(
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("name")
    )
    # global window over the post-distinct name set (bounded dictionary
    # cardinality), not over fact rows
    dim = facts.distinct().select(
        "name",
        F.row_number().over(W.orderBy(F.col("name").asc_nulls_first())).cast("int").alias("id"),
    )
    return (
        facts.alias("f")
        .join(F.broadcast(dim).alias("d"), F.col("f.name").eqNullSafe(F.col("d.name")))
        .groupBy(F.col("d.id").alias("id"), F.col("d.name").alias("name"))
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# q09 — eventDate validity flags over fabricated messy dates (P2/P4/P6;
# reference validate.py:49-62 bad-format regexes + cleaner.py:160-168).
# ---------------------------------------------------------------------------

_DUCK_VARIANTS = """
    CASE l_orderkey % 5
      WHEN 0 THEN strftime(l_shipdate, '%Y-%m-%d')
      WHEN 1 THEN strftime(l_shipdate, '%Y-%m')
      WHEN 2 THEN strftime(l_shipdate, '%Y')
      WHEN 3 THEN strftime(l_shipdate, '%d/%m/%Y')
      ELSE strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')
    END
"""

_DUCK_BAD = " OR ".join(f"regexp_matches(raw, '{p}')" for p in BAD_DATE_FORMATS)


def _spark_messy(li: DataFrame) -> DataFrame:
    v = F.col("l_orderkey") % 5
    raw = (
        F.when(v == 0, F.date_format("l_shipdate", "yyyy-MM-dd"))
        .when(v == 1, F.date_format("l_shipdate", "yyyy-MM"))
        .when(v == 2, F.date_format("l_shipdate", "yyyy"))
        .when(v == 3, F.date_format("l_shipdate", "dd/MM/yyyy"))
        .otherwise(F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss"))
    )
    return li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_no"),
        raw.alias("raw"),
    )


@register(
    "q09_date_validity",
    f"""
    WITH messy AS (
        SELECT {_DUCK_VARIANTS} AS raw FROM lineitem
    )
    SELECT regexp_matches(raw, '^\\d{{4}}-\\d{{2}}-\\d{{2}}$') AS is_valid,
           ({_DUCK_BAD}) AS is_bad,
           count(*) AS n
    FROM messy GROUP BY 1, 2
    """,
)
def q09_date_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        _spark_messy(li)
        .select(
            date_is_valid(F.col("raw")).alias("is_valid"),
            is_bad_date_format(F.col("raw")).alias("is_bad"),
        )
        .groupBy("is_valid", "is_bad")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# q10 — split_dates normalization matrix (F3/F4/F5/F6; reference
# cleaner.py:76-158). Both engines run the identical cascade spec.
# ---------------------------------------------------------------------------

_DUCK_VARIANTS_7 = """
    CASE l_orderkey % 7
      WHEN 0 THEN strftime(l_shipdate, '%Y-%m-%d')
      WHEN 1 THEN strftime(l_shipdate, '%Y-%m')
      WHEN 2 THEN strftime(l_shipdate, '%Y')
      WHEN 3 THEN strftime(l_shipdate, '%d/%m/%Y')
      WHEN 4 THEN strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')
      WHEN 5 THEN strftime(l_shipdate, '%B %Y')
      ELSE strftime(l_shipdate, '%Y') || '/' ||
           CAST(date_part('year', l_shipdate) + 2 AS VARCHAR)
    END
"""

_SPLIT_SQL = split_dates_duckdb_sql("raw")
_SPLIT_SELECT = ",\n           ".join(
    f"{sql} AS {name}" for name, sql in _SPLIT_SQL.items()
)


@register(
    "q10_split_dates",
    f"""
    WITH messy AS (
        SELECT l_orderkey AS order_key, l_linenumber AS line_no,
               {_DUCK_VARIANTS_7} AS raw
        FROM lineitem
    )
    SELECT order_key, line_no, raw,
           {_SPLIT_SELECT}
    FROM messy
    """,
)
def q10_split_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The cascade is a pure function of (l_orderkey % 7, l_shipdate) —
    # a DATE-bounded key space (7 x distinct shipdates), not a
    # fact-bounded one. Run the ~40-regex normalization once per
    # distinct key and broadcast the decoded dim back onto the fact:
    # at 100 TB that is tens of thousands of cascade evaluations
    # instead of one per row, for one broadcast hash join.
    from whale_sightings_spark.schemas import DATE_PARTS_FIELDS

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_no"),
        (F.col("l_orderkey") % 7).alias("__v"),
        F.col("l_shipdate").alias("__d"),
    )
    dim = base.select("__v", "__d").distinct()
    v = F.col("__v")
    raw = (
        F.when(v == 0, F.date_format("__d", "yyyy-MM-dd"))
        .when(v == 1, F.date_format("__d", "yyyy-MM"))
        .when(v == 2, F.date_format("__d", "yyyy"))
        .when(v == 3, F.date_format("__d", "dd/MM/yyyy"))
        .when(v == 4, F.date_format("__d", "yyyy-MM-dd HH:mm:ss"))
        .when(v == 5, F.date_format("__d", "MMMM yyyy"))
        .otherwise(
            F.concat(
                F.date_format("__d", "yyyy"),
                F.lit("/"),
                (F.year("__d") + 2).cast("string"),
            )
        )
    )
    decoded = with_date_parts(
        dim.select("__v", "__d", raw.alias("raw")), src="raw"
    )
    return base.join(F.broadcast(decoded), ["__v", "__d"]).select(
        "order_key", "line_no", "raw", *DATE_PARTS_FIELDS
    )


# ---------------------------------------------------------------------------
# q11 — scalar + grouped aggregates (A1/A5/A6/A7; reference obis.py:92,
# cleaner.py:353-355, procedures.sql:21).
# ---------------------------------------------------------------------------

@register(
    "q11_aggregates",
    """
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n,
           count(DISTINCT l_orderkey) AS n_orders,
           max(l_partkey) AS max_part
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q11_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.max("l_partkey").alias("max_part"),
    )


# ---------------------------------------------------------------------------
# q12 — map-side literal lookup + Title-Case fill (J6/F7/F8; reference
# storage.py:92-93 reverse dict, cleaner.py:71-73 title-case fill).
# ---------------------------------------------------------------------------

_REGION_CODES = {
    "AFRICA": "AF",
    "AMERICA": "AM",
    "ASIA": "AS",
    "EUROPE": "EU",
    "MIDDLE EAST": "ME",
}

_DUCK_REGION_CASE = "CASE r_name " + " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in _REGION_CODES.items()
) + " ELSE NULL END"


@register(
    "q12_map_lookup",
    f"""
    SELECT r_regionkey AS id,
           r_name AS name,
           array_to_string(
             list_transform(str_split(lower(r_name), ' '),
                            x -> upper(x[1]) || x[2:]), ' ') AS title_name,
           {_DUCK_REGION_CASE} AS code
    FROM region
    """,
)
def q12_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    pairs = []
    for k, v in _REGION_CODES.items():
        pairs.extend([F.lit(k), F.lit(v)])
    code_map = F.create_map(*pairs)
    return region.select(
        F.col("r_regionkey").alias("id"),
        F.col("r_name").alias("name"),
        F.initcap(F.lower(F.col("r_name"))).alias("title_name"),
        code_map[F.col("r_name")].alias("code"),
    )


def queries() -> dict[str, QueryFn]:
    _load_extra_registries()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_extra_registries()
    return dict(ORACLE_SQL)


def _load_extra_registries() -> None:
    """Import side-effect registries (kept separate to bound module
    size); import at call time to avoid a cycle."""
    import whale_sightings_spark.plans.queries_analytics  # noqa: F401
    import whale_sightings_spark.plans.queries_behavior  # noqa: F401
    import whale_sightings_spark.plans.queries_classify  # noqa: F401
    import whale_sightings_spark.plans.queries_corpus  # noqa: F401
    import whale_sightings_spark.plans.queries_curation  # noqa: F401
    import whale_sightings_spark.plans.queries_datetime  # noqa: F401
    import whale_sightings_spark.plans.queries_embed  # noqa: F401
    import whale_sightings_spark.plans.queries_geo  # noqa: F401
    import whale_sightings_spark.plans.queries_llm  # noqa: F401
    import whale_sightings_spark.plans.queries_olap2  # noqa: F401
    import whale_sightings_spark.plans.queries_quality  # noqa: F401
    import whale_sightings_spark.plans.queries_relational  # noqa: F401
    import whale_sightings_spark.plans.queries_sqlfuncs  # noqa: F401
    import whale_sightings_spark.plans.queries_stats  # noqa: F401
    import whale_sightings_spark.plans.queries_stream  # noqa: F401
    import whale_sightings_spark.plans.queries_textops  # noqa: F401
