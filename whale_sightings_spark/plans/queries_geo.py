"""Registered queries: distributed-geometry breadth (q91-q92).

q28 (`operators/spatial.py`) is the *dimension-sized* spatial join: the
polygon table broadcasts and a vectorized predicate runs map-side. These
two queries are the shapes you switch to when neither side broadcasts —
the standard grid-bucketing family every distributed spatial engine
(and the reference's geopandas sjoin, at its single-node scale) sits on
top of:

- **q91 grid-rasterized polygon join**: rasterize each polygon's
  bounding box onto a fixed lon/lat grid (explode to one row per
  covering cell), map each point to its cell, **equi-join on the cell
  key**, then verify exact containment row-locally. The join is a
  plain hash join — it shuffles by cell, partition-prunes naturally,
  and no executor ever sees the whole polygon set. Pair duplication is
  impossible by construction (a point lives in exactly one cell).
- **q92 grid-neighborhood nearest join**: nearest-station assignment
  where the *station* side replicates into its 3x3 neighboring cells
  and points probe only their own cell — the smaller side pays the 9x
  expansion, the fact side never explodes. Contract: "nearest within
  the 3x3 cell neighborhood" (a station two cells away is out of
  range); ties break on station id via the same (d2, sid) ordering in
  both engines. Distances are planar squared-degree values — the
  fixture points sit on half-integer offsets so d2 is integer-valued
  and float summation is exact.

Both are rectangle fixtures so the DuckDB oracle is exact arithmetic,
while the Spark side runs the real cell machinery (sequence/explode,
hash join, window top-1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from whale_sightings_spark.plans.queries import register
from whale_sightings_spark.plans.queries_llm import _SPATIAL_RECTS
from whale_sightings_spark.schemas import load_table

#: grid cell size in degrees — the parallelism/selectivity knob: smaller
#: cells = more cells per polygon but fewer candidates per point
GRID_DEG = 20

_POLY_VALUES = ", ".join(
    f"('{nm}', {x1}, {y1}, {x2}, {y2})" for nm, x1, y1, x2, y2 in _SPATIAL_RECTS
)

_PTS_SQL = """
    SELECT c_custkey AS id,
           CAST((c_custkey * 7) % 360 - 180 AS DOUBLE) + 0.5 AS lon,
           CAST((c_custkey * 13) % 160 - 80 AS DOUBLE) + 0.5 AS lat
    FROM customer
"""


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        F.col("c_custkey").alias("id"),
        (((F.col("c_custkey") * 7) % 360 - 180).cast("double") + 0.5).alias("lon"),
        (((F.col("c_custkey") * 13) % 160 - 80).cast("double") + 0.5).alias("lat"),
    )


def _cell(col: Column) -> Column:
    return F.floor(col / GRID_DEG).cast("int")


# ---------------------------------------------------------------------------
# q91 — polygon join via bbox rasterization + cell equi-join + exact
# verify. Multi-match semantics (a point can land in several polygons),
# unlike q28's first-match overwrite.
# ---------------------------------------------------------------------------

@register(
    "q91_grid_spatial_join",
    f"""
    WITH polys(name, x1, y1, x2, y2) AS (VALUES {_POLY_VALUES}),
    cells0 AS (
        SELECT name, x1, y1, x2, y2,
               unnest(generate_series(CAST(floor(x1 / {GRID_DEG}) AS INT),
                                      CAST(floor(x2 / {GRID_DEG}) AS INT))) AS cx
        FROM polys
    ),
    cells AS (
        SELECT name, x1, y1, x2, y2, cx,
               unnest(generate_series(CAST(floor(y1 / {GRID_DEG}) AS INT),
                                      CAST(floor(y2 / {GRID_DEG}) AS INT))) AS cy
        FROM cells0
    ),
    pts AS (
        SELECT id, lon, lat,
               CAST(floor(lon / {GRID_DEG}) AS INT) AS cx,
               CAST(floor(lat / {GRID_DEG}) AS INT) AS cy
        FROM ({_PTS_SQL})
    )
    SELECT name,
           CAST(count(*) AS BIGINT) AS n_pts,
           min(id) AS min_id,
           max(id) AS max_id,
           CAST(sum(id) AS BIGINT) AS sum_ids
    FROM pts JOIN cells USING (cx, cy)
    WHERE lon BETWEEN x1 AND x2 AND lat BETWEEN y1 AND y2
    GROUP BY name
    """,
)
def q91_grid_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    polys = spark.createDataFrame(
        _SPATIAL_RECTS, "name string, x1 double, y1 double, x2 double, y2 double"
    )
    cells = polys.select(
        "name", "x1", "y1", "x2", "y2",
        F.explode(F.sequence(_cell(F.col("x1")), _cell(F.col("x2")))).alias("cx"),
    ).select(
        "name", "x1", "y1", "x2", "y2", "cx",
        F.explode(F.sequence(_cell(F.col("y1")), _cell(F.col("y2")))).alias("cy"),
    )
    pts = _pts(spark, sf_dir).select(
        "id", "lon", "lat", _cell(F.col("lon")).alias("cx"), _cell(F.col("lat")).alias("cy")
    )
    hit = pts.join(cells, ["cx", "cy"]).filter(
        F.col("lon").between(F.col("x1"), F.col("x2"))
        & F.col("lat").between(F.col("y1"), F.col("y2"))
    )
    return hit.groupBy("name").agg(
        F.count("*").alias("n_pts"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
        F.sum("id").alias("sum_ids"),
    )


# ---------------------------------------------------------------------------
# q92 — nearest station within the 3x3 cell neighborhood; stations
# (small side) replicate into neighbor cells, points probe their own.
# ---------------------------------------------------------------------------

_STATIONS_SQL = """
    SELECT s_suppkey AS sid,
           CAST((s_suppkey * 11) % 360 - 180 AS DOUBLE) + 0.5 AS slon,
           CAST((s_suppkey * 17) % 160 - 80 AS DOUBLE) + 0.5 AS slat
    FROM supplier
"""


@register(
    "q92_grid_nearest_station",
    f"""
    WITH pts AS (
        SELECT id, lon, lat,
               CAST(floor(lon / {GRID_DEG}) AS INT) AS cx,
               CAST(floor(lat / {GRID_DEG}) AS INT) AS cy
        FROM ({_PTS_SQL})
    ),
    st AS ({_STATIONS_SQL}),
    stc AS (
        SELECT sid, slon, slat,
               CAST(floor(slon / {GRID_DEG}) AS INT) + dx.v AS cx,
               CAST(floor(slat / {GRID_DEG}) AS INT) + dy.v AS cy
        FROM st, (VALUES (-1), (0), (1)) dx(v), (VALUES (-1), (0), (1)) dy(v)
    ),
    cand AS (
        SELECT id,
               sid,
               (lon - slon) * (lon - slon) + (lat - slat) * (lat - slat) AS d2,
               row_number() OVER (
                   PARTITION BY id
                   ORDER BY (lon - slon) * (lon - slon) + (lat - slat) * (lat - slat), sid
               ) AS rn
        FROM pts JOIN stc USING (cx, cy)
    )
    SELECT sid AS station,
           CAST(count(*) AS BIGINT) AS n_pts,
           min(id) AS min_id,
           max(id) AS max_id,
           round(sum(d2), 4) AS sum_d2
    FROM cand
    WHERE rn = 1
    GROUP BY sid
    """,
)
def q92_grid_nearest_station(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _pts(spark, sf_dir).select(
        "id", "lon", "lat", _cell(F.col("lon")).alias("cx"), _cell(F.col("lat")).alias("cy")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    st = supplier.select(
        F.col("s_suppkey").alias("sid"),
        (((F.col("s_suppkey") * 11) % 360 - 180).cast("double") + 0.5).alias("slon"),
        (((F.col("s_suppkey") * 17) % 160 - 80).cast("double") + 0.5).alias("slat"),
    )
    offsets = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    stc = (
        st.select("sid", "slon", "slat", offsets.alias("dx"))
        .select("sid", "slon", "slat", "dx", offsets.alias("dy"))
        .select(
            "sid", "slon", "slat",
            (_cell(F.col("slon")) + F.col("dx")).alias("cx"),
            (_cell(F.col("slat")) + F.col("dy")).alias("cy"),
        )
    )
    d2 = (F.col("lon") - F.col("slon")) * (F.col("lon") - F.col("slon")) + (
        F.col("lat") - F.col("slat")
    ) * (F.col("lat") - F.col("slat"))
    cand = pts.join(stc, ["cx", "cy"]).select("id", "sid", d2.alias("d2"))
    w = W.partitionBy("id").orderBy("d2", "sid")
    best = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.groupBy(F.col("sid").alias("station")).agg(
        F.count("*").alias("n_pts"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
        F.round(F.sum("d2"), 4).alias("sum_d2"),
    )
