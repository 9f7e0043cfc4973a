"""Spatial join J1 (SURVEY.md §2.3): point-in-polygon waterBody lookup.

The reference does ``gpd.sjoin(points, oceans, how='left',
predicate='intersects')`` then overwrites ``waterBody`` with the joined
ocean name (reference ``whalefinder/cleaner.py:194-212``).

Spark-first design: the ocean table is dimension-sized (GOaS v1 has 9
polygons), so this is a **broadcast nested-loop join with a vectorized
predicate** — the polygon rings ride to every executor as a broadcast
variable and an Arrow-batched pandas UDF ray-casts each batch of points
with numpy. The fact side never shuffles; cost is O(rows × vertices)
map-side, which holds at 100 TB. Shapely is used when importable
(identical semantics on convex fixture polygons), numpy otherwise —
both boundary behavior notes in SURVEY §7.3.5.

Multi-match policy: first polygon in table order wins (GOaS oceans are
non-overlapping, so at most one matches in practice).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whale_sightings_spark.schemas import OCEAN_POLYGON_SCHEMA

try:  # optional accelerator; container may not ship it
    import shapely  # type: ignore

    # only the shapely>=2 vectorized predicate is worth taking: the 1.x
    # API forces a per-point Python loop, slower than the numpy ray-cast
    _HAVE_SHAPELY = hasattr(shapely, "intersects_xy")
except Exception:  # pragma: no cover
    _HAVE_SHAPELY = False


def parse_wkt_polygon(wkt: str) -> list[tuple[float, float]]:
    """Parse a simple (hole-free) ``POLYGON ((x y, x y, ...))`` ring."""
    m = re.search(r"\(\(([^()]*)\)\)", wkt)
    if not m:
        raise ValueError(f"not a simple WKT polygon: {wkt[:80]}")
    return [
        (float(x), float(y))
        for x, y in (p.strip().split()[:2] for p in m.group(1).split(","))
    ]


def oceans_from_wkt(
    spark: SparkSession, named_wkt: list[tuple[str, str]]
) -> DataFrame:
    """Build the ocean polygon dim table from (name, WKT) pairs (S10 —
    the engine-native form of the reference's shapefile load,
    cleaner.py:18-27)."""
    rows = [
        (name, [{"lon": x, "lat": y} for x, y in parse_wkt_polygon(wkt)])
        for name, wkt in named_wkt
    ]
    return spark.createDataFrame(rows, OCEAN_POLYGON_SCHEMA)


def _ray_cast(lon: np.ndarray, lat: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: inside-test for all points at
    once against one polygon ring. Boundary points count as inside on
    the edge crossing rule's side — fixtures keep points off borders."""
    x, y = lon, lat
    inside = np.zeros(len(x), dtype=bool)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        crosses = ((y1 > y) != (y2 > y)) & (
            x < (x2 - x1) * (y - y1) / (y2 - y1 + 1e-300) + x1
        )
        inside ^= crosses
    return inside


def spatial_join_water_body(
    df: DataFrame,
    oceans: DataFrame | list[tuple[str, np.ndarray]],
    lon_col: str = "decimalLongitude",
    lat_col: str = "decimalLatitude",
) -> DataFrame:
    """Left point-in-polygon join; **overwrites** ``waterBody`` with the
    matched ocean name (NULL when no polygon matches) — even when the
    source supplied one (§1.4 parity trap, cleaner.py:209-211).

    ``oceans`` is either the S10 polygon dim DataFrame or a driver-side
    ``[(name, ring ndarray)]`` list. The polygon table is tiny (GOaS has
    9 rings, a few KB), so it rides to executors inside the serialized
    task closure — no ``sc.broadcast`` file round trip per Python
    worker, and callers holding literal polygons skip the
    createDataFrame→collect bounce entirely. A dim too big for a
    closure is past the broadcast-join threshold anyway and belongs in
    a real join, not this operator."""
    from whale_sightings_spark.deploy import ship_package

    ship_package(df.sparkSession)
    if isinstance(oceans, DataFrame):
        polys = [
            (r["name"], np.array([(p["lon"], p["lat"]) for p in r["ring"]], dtype="float64"))
            for r in oceans.collect()
        ]
    else:
        polys = [(name, np.asarray(ring, dtype="float64")) for name, ring in oceans]
    use_shapely = _HAVE_SHAPELY
    ray_cast = _ray_cast  # bind by value into the closure

    @F.pandas_udf(T.StringType())
    def ocean_name(lon: pd.Series, lat: pd.Series) -> pd.Series:
        lon_v = lon.to_numpy(dtype="float64", na_value=np.nan)
        lat_v = lat.to_numpy(dtype="float64", na_value=np.nan)
        out = np.full(len(lon_v), None, dtype=object)
        unassigned = ~(np.isnan(lon_v) | np.isnan(lat_v))
        for name, ring in polys:
            if not unassigned.any():
                break
            if use_shapely:
                import shapely  # type: ignore

                # vectorized boundary-inclusive predicate over the whole
                # Arrow batch — one C call per polygon, no Python loop
                poly = shapely.Polygon(ring)
                hit = unassigned & shapely.intersects_xy(poly, lon_v, lat_v)
            else:
                hit = unassigned & ray_cast(lon_v, lat_v, ring)
            out[hit] = name
            unassigned &= ~hit
        return pd.Series(out)

    return df.withColumn("waterBody", ocean_name(F.col(lon_col), F.col(lat_col)))
