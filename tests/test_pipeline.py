"""Golden end-to-end pipeline tests (SURVEY §5): OBIS-shaped JSON
fixtures -> full pipeline -> conservation invariants + star schema
goldens, mirroring the reference's logged accounting
(valid + errors = input; processed + exported = errors)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from whale_sightings_spark.operators.clean import dedup_keep_first
from whale_sightings_spark.operators.spatial import oceans_from_wkt
from whale_sightings_spark.operators.validate import validation_counts
from whale_sightings_spark.plans.pipeline import (
    PipelineContext,
    build_star_schema,
    clean_occurrences,
    run_pipeline,
)
from whale_sightings_spark.sources.files import match_raw_files, read_raw_occurrences

# 12 rows: 8 valid (1 dup pair), 3 repairable errors, 1 unrepairable
FIXTURE_ROWS = [
    # valid ISO
    {"occurrenceID": "a1", "eventDate": "1913-03-17", "decimalLatitude": 60.1,
     "decimalLongitude": -150.2, "species": "Delphinapterus leucas", "speciesid": 137115},
    # valid with time
    {"occurrenceID": "a2", "eventDate": "1849-12-04 23:12:00", "decimalLatitude": 61.0,
     "decimalLongitude": -151.0, "species": "Delphinapterus leucas", "speciesid": 137115,
     "vernacularName": "White whale", "waterBody": "Wrong Sea"},
    # valid ISO+T+Z
    {"occurrenceID": "a3", "eventDate": "1849-12-04T23:12:00Z", "decimalLatitude": 10.0,
     "decimalLongitude": 10.0, "species": "Delphinapterus leucas", "speciesid": 137115},
    # valid with offset
    {"occurrenceID": "a4", "eventDate": "1971-01-01 00:00:00+00", "decimalLatitude": 20.0,
     "decimalLongitude": 20.0, "species": "Delphinapterus leucas", "speciesid": 137115,
     "individualCount": 3},
    # duplicate of a1 on (eventDate, lat, lon) — must lose to a1
    {"occurrenceID": "dup", "eventDate": "1913-03-17", "decimalLatitude": 60.1,
     "decimalLongitude": -150.2, "species": "Delphinapterus leucas", "speciesid": 137115},
    # null occurrenceID #1 (gets -1)
    {"occurrenceID": None, "eventDate": "1910-12-24T02:00", "decimalLatitude": 62.5,
     "decimalLongitude": -149.9, "species": "Delphinapterus leucas", "speciesid": 137115},
    # null occurrenceID #2 (gets -2)
    {"occurrenceID": None, "eventDate": "1920-06-06", "decimalLatitude": 63.5,
     "decimalLongitude": -148.9, "species": "Delphinapterus leucas", "speciesid": 137115},
    # valid, extra unknown field dropped by schema projection
    {"occurrenceID": "a5", "eventDate": "1930-01-02", "decimalLatitude": 30.0,
     "decimalLongitude": 30.0, "species": "Delphinapterus leucas", "speciesid": 137115,
     "unknownField": "ignored"},
    # error: year-month (repairable)
    {"occurrenceID": "e1", "eventDate": "1925-11", "decimalLatitude": 40.0,
     "decimalLongitude": 40.0, "species": "Delphinapterus leucas", "speciesid": 137115},
    # error: range with slash (repairable)
    {"occurrenceID": "e2", "eventDate": "1800-01-01/1874-06-24", "decimalLatitude": 41.0,
     "decimalLongitude": 41.0, "species": "Delphinapterus leucas", "speciesid": 137115},
    # error: bare year (repairable)
    {"occurrenceID": "e3", "eventDate": "1985", "decimalLatitude": 42.0,
     "decimalLongitude": 42.0, "species": "Delphinapterus leucas", "speciesid": 137115},
    # error: unrepairable garbage date + missing latitude (2 details)
    {"occurrenceID": "e4", "eventDate": "unknown", "decimalLatitude": None,
     "decimalLongitude": 43.0, "species": "Delphinapterus leucas", "speciesid": 137115},
]

# two disjoint rectangles: north box covers the Alaska-ish points,
# east box covers the (10..45, 10..45) points
OCEANS_WKT = [
    ("North Box", "POLYGON ((-160 55, -140 55, -140 70, -160 70, -160 55))"),
    ("East Box", "POLYGON ((5 5, 50 5, 50 50, 5 50, 5 5))"),
]


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rawzone")
    whale_dir = d / "beluga_whale"
    whale_dir.mkdir()
    (whale_dir / "1900-01-01--1950-12-31.json").write_text(
        json.dumps({"results": FIXTURE_ROWS[:8]}, indent=4)
    )
    (whale_dir / "1951-01-01--1999-12-31.json").write_text(
        json.dumps({"results": FIXTURE_ROWS[8:]}, indent=4)
    )
    # a file that must be ignored by the range regex
    (whale_dir / "notes.json").write_text(json.dumps({"results": []}))
    return str(d)


@pytest.fixture(scope="module")
def result(spark, raw_dir):
    ctx = PipelineContext(whale="beluga_whale", data_dir=raw_dir)
    oceans = oceans_from_wkt(spark, OCEANS_WKT)
    return run_pipeline(spark, ctx, oceans)


def test_file_pruning(raw_dir):
    assert len(match_raw_files(raw_dir, "beluga_whale", None, None)) == 2
    assert len(match_raw_files(raw_dir, "beluga_whale", "1900-01-01", "1950-12-31")) == 1
    assert len(match_raw_files(raw_dir, "beluga_whale", "1951-01-01", None)) == 1
    assert len(match_raw_files(raw_dir, "beluga_whale", None, "1950-12-31")) == 1


def test_validation_accounting(spark, raw_dir):
    """Reference invariant: Validated N + error rows = input rows;
    e4 contributes 2 details (bad date + missing latitude)."""
    from whale_sightings_spark.operators.validate import validate_occurrences

    raw = read_raw_occurrences(
        spark, match_raw_files(raw_dir, "beluga_whale", None, None)
    )
    assert raw.count() == 12
    valid, errors = validate_occurrences(raw)
    n_valid, n_details = validation_counts(valid, errors)
    assert n_valid == 8
    assert errors.count() == 4
    assert n_details == 5  # e1,e2,e3 one each; e4 two


def test_clean_merge_dedup_and_fills(result):
    rows = {r["occurrenceID"]: r.asDict() for r in result.cleaned.collect()}
    # 8 valid + 3 repaired - 1 dup = 10 surviving rows
    assert len(rows) == 10
    assert "dup" not in rows  # a1 won keep-first
    assert "a1" in rows
    # null ids re-keyed in encounter order
    assert "-1" in rows and "-2" in rows
    assert rows["-1"]["eventDate"] == "1910-12-24"
    assert rows["-2"]["eventDate"] == "1920-06-06"
    # vernacular fill with Title Cased whale name
    assert rows["a1"]["vernacularName"] == "Beluga Whale"
    # supplied vernacular kept
    assert rows["a2"]["vernacularName"] == "White whale"
    # repaired error date parts
    assert rows["e1"]["start_year"] == 1925 and rows["e1"]["end_day"] == 30
    assert rows["e2"]["start_year"] == 1800 and rows["e2"]["end_year"] == 1874
    assert rows["e3"]["start_year"] == 1985 and rows["e3"]["end_month"] == 12
    # ISO normalization of a valid timestamped date (§1.4)
    assert rows["a2"]["eventDate"] == "1849-12-04"
    assert rows["a2"]["date_is_valid"] is True
    assert rows["e3"]["date_is_valid"] is False


def test_spatial_overwrite(result):
    rows = {r["occurrenceID"]: r.asDict() for r in result.cleaned.collect()}
    # waterBody always overwritten by the join (a2 supplied "Wrong Sea")
    assert rows["a2"]["waterBody"] == "North Box"
    assert rows["a1"]["waterBody"] == "North Box"
    assert rows["a3"]["waterBody"] == "East Box"
    assert rows["e1"]["waterBody"] == "East Box"


def test_unrepaired_export_shape(result):
    errs = result.unrepaired_errors.collect()
    assert len(errs) == 1
    e = errs[0].asDict()
    assert e["occurrenceID"] == "e4"
    locs = {d["loc"] for d in e["details"]}
    assert locs == {"eventDate", "decimalLatitude"}


def test_bounds_derivation(result):
    assert result.startdate == "1849-12-04"
    assert result.enddate == "1971-01-01"


def test_star_schema(result):
    star = build_star_schema(result.cleaned)
    locations = {r["waterBody"]: r["id"] for r in star["locations"].collect()}
    # ids assigned 0.. in first-encounter order; no-match rows -> NULL name row
    assert set(locations.values()) == set(range(len(locations)))
    species = star["species"].collect()
    assert len(species) == 1
    assert species[0]["vernacularName"] == "Beluga Whale"
    fact = star["occurrences"]
    assert fact.count() == 10
    fk_null = fact.filter(F.col("waterBodyId").isNull()).count()
    assert fk_null == 0  # every row got a location id (incl. NULL-name row)
    # conflict-update column subset is fixed (S12)
    from whale_sightings_spark.sources.jdbc import OCCURRENCES_UPDATE_COLS

    assert set(OCCURRENCES_UPDATE_COLS) < set(fact.columns) | {
        "latitude", "longitude"
    }


def test_cli_process_exports_unrepaired_errors(spark, raw_dir, tmp_path):
    """The CLI must not drop error records (reference cleaner.py:248-288):
    `process` writes the unrepaired rows as JSON whose nested details
    round-trip."""
    from whale_sightings_spark.cli import main
    from whale_sightings_spark.sources.files import read_error_json

    out = str(tmp_path / "curated")
    assert main(["process", "beluga_whale", "--data-dir", raw_dir, "--out", out]) == 0
    exported = read_error_json(spark, f"{raw_dir}/beluga_whale/errors").collect()
    assert len(exported) == 1
    doc = exported[0].asDict(recursive=True)
    assert doc["data"]["occurrenceID"] == "e4"
    assert {d["loc"] for d in doc["details"]} == {"eventDate", "decimalLatitude"}
    assert all({"type", "loc", "msg"} <= set(d) for d in doc["details"])


def test_cli_db_loads_star_schema_into_sqlite(spark, raw_dir, tmp_path):
    """End-to-end serving contract: `db --db-url sqlite:///...` emits
    the reference DDL (db.sql:5-44) and loads all three tables."""
    import sqlite3

    from whale_sightings_spark.cli import main

    db_path = str(tmp_path / "whales.db")
    rc = main(["db", "beluga_whale", "--data-dir", raw_dir,
               "--db-url", f"sqlite:///{db_path}"])
    assert rc == 0

    con = sqlite3.connect(db_path)
    n_occ = con.execute("SELECT count(*) FROM occurrences").fetchone()[0]
    assert n_occ == 10  # 8 valid + 3 repaired - 1 dup
    species = con.execute("SELECT speciesName, vernacularName FROM species").fetchall()
    assert species == [("Delphinapterus leucas", "Beluga Whale")]
    loc_ids = [r[0] for r in con.execute("SELECT id FROM locations ORDER BY id")]
    assert loc_ids == list(range(len(loc_ids)))  # 0.. surrogate sequence
    # FK integrity: every fact row resolves its location id
    dangling = con.execute(
        "SELECT count(*) FROM occurrences o LEFT JOIN locations l"
        " ON o.waterBodyId = l.id WHERE l.id IS NULL"
    ).fetchone()[0]
    assert dangling == 0
    # idempotent: a second load upserts, never duplicates
    main(["db", "beluga_whale", "--data-dir", raw_dir,
          "--db-url", f"sqlite:///{db_path}"])
    assert con.execute("SELECT count(*) FROM occurrences").fetchone()[0] == n_occ
    con.close()


def test_cli_db_loads_star_schema_into_mysql(spark, raw_dir):
    """The MySQL twin of the SQLite serving-contract test, gated on a
    live server: set SPARK_GRAFT_MYSQL_URL (e.g.
    ``mysql://root:pw@localhost/whales``) to run it; skipped where no
    MySQL service exists (this container). The dialect SQL itself is
    unit-tested unconditionally (test_sources.py)."""
    import os

    import pytest

    db_url = os.environ.get("SPARK_GRAFT_MYSQL_URL")
    if not db_url:
        pytest.skip("no MySQL service: set SPARK_GRAFT_MYSQL_URL to run")
    from whale_sightings_spark.cli import main
    from whale_sightings_spark.sources.ddl import connection_factory_for_url

    factory, dialect = connection_factory_for_url(db_url)
    assert dialect == "mysql"
    try:
        con = factory()
    except Exception as exc:  # driver missing or server unreachable
        pytest.skip(f"MySQL unreachable: {exc}")
    try:
        rc = main(["db", "beluga_whale", "--data-dir", raw_dir, "--db-url", db_url])
        assert rc == 0
        cur = con.cursor()
        cur.execute("SELECT count(*) FROM occurrences")
        n_occ = cur.fetchone()[0]
        assert n_occ == 10  # 8 valid + 3 repaired - 1 dup
        # idempotent: a second load upserts, never duplicates
        main(["db", "beluga_whale", "--data-dir", raw_dir, "--db-url", db_url])
        cur.execute("SELECT count(*) FROM occurrences")
        assert cur.fetchone()[0] == n_occ
    finally:
        con.close()


def test_notebook_parity_queries(result):
    """Notebook cells 9-14 queries over the star schema: species join,
    location merge, valid-date sightings-per-year."""
    from whale_sightings_spark.plans.notebook import (
        sightings_per_year,
        species_sightings,
    )

    star = build_star_schema(result.cleaned)
    joined = species_sightings(
        star["occurrences"], star["species"], star["locations"], 137115
    )
    rows = joined.collect()
    assert len(rows) == 10  # every fact row is this species
    assert all(r["speciesName"] == "Delphinapterus leucas" for r in rows)
    assert {"eventId", "date", "waterBody", "latitude", "longitude"} <= set(joined.columns)

    per_year = {r["date"]: r["num_sightings"] for r in sightings_per_year(joined).collect()}
    # valid ISO dates only: a1(1913), a2(1849), a3(1849), a4(1971),
    # a5(1930), -1(1910), -2(1920); repaired e1-e3 have non-ISO dates
    assert per_year == {1849: 2, 1913: 1, 1971: 1, 1930: 1, 1910: 1, 1920: 1}


def test_dedup_is_deterministic_across_runs(result):
    c1 = sorted(r["occurrenceID"] for r in result.cleaned.collect())
    c2 = sorted(r["occurrenceID"] for r in dedup_keep_first(result.cleaned).collect())
    assert c1 == c2


def test_spatial_join_accepts_driver_side_polygons(spark):
    """The list form (name, ring) must assign identically to the S10
    DataFrame form — q28 hands literal rings straight to the operator."""
    import numpy as np

    from whale_sightings_spark.operators.spatial import (
        parse_wkt_polygon,
        spatial_join_water_body,
    )

    wkt = [
        ("West Box", "POLYGON ((-10 -10, 0 -10, 0 10, -10 10, -10 -10))"),
        ("East Box", "POLYGON ((0 -10, 10 -10, 10 10, 0 10, 0 -10))"),
    ]
    pts = spark.createDataFrame(
        [(1, -5.0, 0.0), (2, 5.0, 0.0), (3, 55.0, 55.0), (4, None, 3.0)],
        "id int, lon double, lat double",
    )
    from_df = spatial_join_water_body(
        pts, oceans_from_wkt(spark, wkt), lon_col="lon", lat_col="lat"
    )
    from_list = spatial_join_water_body(
        pts,
        [(name, np.array(parse_wkt_polygon(w))) for name, w in wkt],
        lon_col="lon",
        lat_col="lat",
    )
    expect = {1: "West Box", 2: "East Box", 3: None, 4: None}
    got_df = {r["id"]: r["waterBody"] for r in from_df.collect()}
    got_list = {r["id"]: r["waterBody"] for r in from_list.collect()}
    assert got_df == expect
    assert got_list == expect


def test_sedona_st_intersects_parity_with_broadcast_path(spark):
    """Feature-flagged Sedona path (VERDICT r8 stretch #8): when the
    optional apache-sedona package is present, the ST_Intersects join
    must assign identically to the broadcast pandas-UDF path on the
    WKT fixture (left join, overwrite, first-polygon-order wins).
    Skips when sedona is absent (this sandbox); the gate itself —
    HAVE_SEDONA False -> RuntimeError — is always asserted."""
    import pytest

    from whale_sightings_spark.operators.spatial import (
        HAVE_SEDONA,
        spatial_join_water_body,
        spatial_join_water_body_sedona,
    )

    wkt = [
        ("West Box", "POLYGON ((-10 -10, 0 -10, 0 10, -10 10, -10 -10))"),
        ("East Box", "POLYGON ((0 -10, 10 -10, 10 10, 0 10, 0 -10))"),
    ]
    pts = spark.createDataFrame(
        [(1, -5.0, 0.0), (2, 5.0, 0.0), (3, 55.0, 55.0), (4, None, 3.0)],
        "id int, lon double, lat double",
    )
    if not HAVE_SEDONA:
        with pytest.raises(RuntimeError, match="sedona"):
            spatial_join_water_body_sedona(
                pts, wkt, lon_col="lon", lat_col="lat"
            )
        pytest.skip("apache-sedona not installed; gate verified")
    broadcast = {
        r["id"]: r["waterBody"]
        for r in spatial_join_water_body(
            pts, oceans_from_wkt(spark, wkt), lon_col="lon", lat_col="lat"
        ).collect()
    }
    sedona = {
        r["id"]: r["waterBody"]
        for r in spatial_join_water_body_sedona(
            pts, wkt, lon_col="lon", lat_col="lat"
        ).collect()
    }
    assert sedona == broadcast


def _shp_bytes(rings):
    """Synthesize a minimal polygon shapefile (one outer ring per
    record) — the fixture for the pure-Python .shp reader."""
    import struct

    recs = b""
    for i, ring in enumerate(rings):
        xs, ys = [p[0] for p in ring], [p[1] for p in ring]
        content = struct.pack("<i", 5)
        content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        content += struct.pack("<ii", 1, len(ring))  # 1 part
        content += struct.pack("<i", 0)  # part offset
        for x, y in ring:
            content += struct.pack("<2d", x, y)
        recs += struct.pack(">ii", i + 1, len(content) // 2) + content
    total_words = (100 + len(recs)) // 2
    hdr = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
    hdr += struct.pack("<ii", 1000, 5) + struct.pack("<8d", *([0.0] * 8))
    assert len(hdr) == 100
    return hdr + recs


def _dbf_bytes(names, field="NAME", width=32):
    import struct

    hdr_len = 32 + 32 + 1
    rec_len = 1 + width
    hdr = struct.pack(
        "<B3BIHH", 0x03, 26, 8, 15, len(names), hdr_len, rec_len
    ) + b"\x00" * 20
    fld = field.encode("ascii").ljust(11, b"\x00") + b"C" + b"\x00" * 4
    fld += struct.pack("<B", width) + b"\x00" * 15
    body = b""
    for n in names:
        body += b" " + n.encode("latin-1").ljust(width)
    return hdr + fld + b"\x0d" + body + b"\x1a"


def test_shp_reader_round_trips_against_wkt_twin(spark, tmp_path):
    """Round-8 (VERDICT r7 #6): S10 from the reference's actual on-disk
    format — a synthesized 2-polygon .shp (+ .dbf names) must load into
    the same dim table as the WKT form and drive an identical spatial
    join."""
    from whale_sightings_spark.operators.spatial import (
        oceans_from_shp,
        parse_wkt_polygon,
        read_dbf_strings,
        read_shp_polygons,
        spatial_join_water_body,
    )

    wkt = [
        ("West Box", "POLYGON ((-10 -10, 0 -10, 0 10, -10 10, -10 -10))"),
        ("East Box", "POLYGON ((0 -10, 10 -10, 10 10, 0 10, 0 -10))"),
    ]
    rings = [parse_wkt_polygon(w) for _n, w in wkt]
    shp = tmp_path / "oceans.shp"
    shp.write_bytes(_shp_bytes(rings))
    (tmp_path / "oceans.dbf").write_bytes(_dbf_bytes([n for n, _w in wkt]))

    assert read_shp_polygons(str(shp)) == rings
    assert read_dbf_strings(str(tmp_path / "oceans.dbf")) == [
        "West Box",
        "East Box",
    ]
    from_shp = oceans_from_shp(spark, str(shp))
    from_wkt = oceans_from_wkt(spark, wkt)
    assert sorted(map(tuple, from_shp.collect())) == sorted(
        map(tuple, from_wkt.collect())
    )
    pts = spark.createDataFrame(
        [(1, -5.0, 0.0), (2, 5.0, 0.0), (3, 55.0, 55.0)],
        "id int, lon double, lat double",
    )
    got = {
        r["id"]: r["waterBody"]
        for r in spatial_join_water_body(
            pts, from_shp, lon_col="lon", lat_col="lat"
        ).collect()
    }
    assert got == {1: "West Box", 2: "East Box", 3: None}
