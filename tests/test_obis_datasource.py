"""Python Data Source tests (S1-S4 as spark.read.format('obis')):
statistics-driven partition planning, per-partition reads, filter
pushdown into request params — all offline via the fixture transport.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from whale_sightings_spark.sources.obis_datasource import (
    FixtureTransport,
    ObisDataSource,
    ObisReader,
)
from whale_sightings_spark.schemas import OCCURRENCE_RAW_SCHEMA


def _write_fixture(tmp_path):
    stats = [
        {"year": 1990, "records": 6},
        {"year": 1991, "records": 6},
        {"year": 1992, "records": 6},
    ]
    results = []
    for y in (1990, 1991, 1992):
        for i in range(6):
            results.append(
                {
                    "occurrenceID": f"occ-{y}-{i}",
                    "eventDate": f"{y}-03-{10 + i:02d}",
                    "decimalLatitude": 10.5 + i,
                    "decimalLongitude": -20.5 - i,
                    "species": "Delphinapterus leucas",
                    "speciesid": 137115,
                    "extra_api_field": "dropped by projection",
                }
            )
    (tmp_path / "statistics_years.json").write_text(json.dumps(stats))
    (tmp_path / "occurrences.json").write_text(json.dumps({"results": results}))
    return tmp_path


def test_fixture_transport_range_filter(tmp_path):
    t = FixtureTransport(str(_write_fixture(tmp_path)))
    out = t.get(
        "/occurrence",
        {"startdate": "1991-01-01", "enddate": "1991-12-31", "size": 100},
    )
    assert len(out["results"]) == 6
    assert all(r["eventDate"].startswith("1991") for r in out["results"])


def test_datasource_reads_with_planned_partitions(spark, tmp_path):
    _write_fixture(tmp_path)
    spark.dataSource.register(ObisDataSource)
    df = (
        spark.read.format("obis")
        .option("fixture_dir", str(tmp_path))
        .option("scientificname", "Delphinapterus leucas")
        .option("size", 10)
        .load()
    )
    assert df.schema == OCCURRENCE_RAW_SCHEMA
    rows = df.collect()
    assert len(rows) == 18
    # size=10 forces the greedy planner to split {6,6,6}: each pair
    # overflows (12 > 10), so every year gets its own batch
    assert df.rdd.getNumPartitions() == 3
    # unknown API fields dropped; declared-but-absent fields null
    assert rows[0]["waterBody"] is None


def test_datasource_filter_pushdown_prunes_partitions(spark, tmp_path):
    _write_fixture(tmp_path)
    spark.dataSource.register(ObisDataSource)
    df = (
        spark.read.format("obis")
        .option("fixture_dir", str(tmp_path))
        .option("scientificname", "Delphinapterus leucas")
        .option("size", 10)
        .load()
        .filter((F.col("eventDate") >= "1992-01-01") & (F.col("eventDate") <= "1992-12-31"))
    )
    out = df.collect()
    assert len(out) == 6 and all(r["eventDate"].startswith("1992") for r in out)
    # pushed bounds shrink the statistics window -> planner emits fewer
    # batches: the scan itself is partition-pruned, not post-filtered
    assert df.rdd.getNumPartitions() == 1


def test_push_filters_absorbs_bounds():
    reader = ObisReader(OCCURRENCE_RAW_SCHEMA, {"scientificname": "x"})
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, IsNotNull

    leftover = list(
        reader.pushFilters(
            [
                GreaterThanOrEqual(("eventDate",), "1995-01-01"),
                EqualTo(("basisOfRecord",), "HumanObservation"),
                IsNotNull(("species",)),
            ]
        )
    )
    assert reader.startdate == "1995-01-01"
    # unsupported predicates returned to Spark
    assert len(leftover) == 2


def test_streaming_source_replays_planned_batches(spark, tmp_path):
    """spark.readStream.format('obis'): each planned year batch is one
    micro-batch; the streamed union equals the batch read."""
    _write_fixture(tmp_path)
    spark.dataSource.register(ObisDataSource)
    opts = {"fixture_dir": str(tmp_path), "size": "6"}

    stream = (
        spark.readStream.format("obis").options(**opts).load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("obis_stream_out")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    try:
        got = {
            r["occurrenceID"]
            for r in spark.sql("SELECT occurrenceID FROM obis_stream_out").collect()
        }
        n_batches = spark.sql(
            "SELECT count(DISTINCT occurrenceID) FROM obis_stream_out"
        ).collect()[0][0]
    finally:
        q.stop()

    batch = spark.read.format("obis").options(**opts).load()
    want = {r["occurrenceID"] for r in batch.select("occurrenceID").collect()}
    assert got == want
    assert n_batches == 18
