"""OBIS occurrence feed as a Spark 4 **Python Data Source** (SURVEY.md
§2.1 S1-S4 upgrade path, §4 R2/R3).

``spark.read.format("obis")`` with statistics-driven partition
planning: ``partitions()`` runs the reference's greedy year-range
packing (``whalefinder/obis.py:166-203``) over the ``/statistics/years``
response, emitting one :class:`InputPartition` per planned date batch —
executors fetch batches in parallel with Spark task retry replacing the
reference's manual Retry loop (R3). ``pushFilters`` absorbs
``eventDate`` range predicates and ``species`` equality into API query
params (R2 — the reference sends the same filters server-side,
``obis.py:85,135``).

Offline operation (tests / air-gapped clusters): the ``fixture_dir``
option swaps the HTTP transport for a directory of canned responses —
``statistics_years.json`` plus one ``occurrences.json`` whose
``results`` are range-filtered per request, mimicking the API contract.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThanOrEqual,
    InputPartition,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from whale_sightings_spark.schemas import OCCURRENCE_RAW_SCHEMA
from whale_sightings_spark.sources.obis import (
    DEFAULT_PAGE_SIZE,
    ObisClient,
    pad_date_format,
    plan_batches,
)

_FIELDS = [f.name for f in OCCURRENCE_RAW_SCHEMA.fields]


class FixtureTransport:
    """Offline stand-in for :class:`ObisClient` reading canned
    responses; occurrence requests filter the fixture's ``results`` by
    the requested date range (string-compare on ISO dates, exactly the
    server's inclusive semantics)."""

    def __init__(self, fixture_dir: str):
        self.dir = Path(fixture_dir)

    def get(self, endpoint: str, params: dict) -> dict | list:
        if endpoint == "/statistics/years":
            years = json.loads((self.dir / "statistics_years.json").read_text())
            start, end = params.get("startdate"), params.get("enddate")
            return [
                y
                for y in years
                if (not start or int(y["year"]) >= int(str(start)[:4]))
                and (not end or int(y["year"]) <= int(str(end)[:4]))
            ]
        if endpoint == "/occurrence":
            payload = json.loads((self.dir / "occurrences.json").read_text())
            start, end = params.get("startdate"), params.get("enddate")
            size = int(params.get("size", DEFAULT_PAGE_SIZE))
            rows = [
                r
                for r in payload.get("results", [])
                if (not start or str(r.get("eventDate", ""))[:10] >= start)
                and (not end or str(r.get("eventDate", ""))[:10] <= end)
            ]
            return {"results": rows[:size]}
        raise ValueError(f"unknown endpoint {endpoint}")


def _make_client(options: dict):
    fixture = options.get("fixture_dir")
    if fixture:
        return FixtureTransport(fixture)
    kwargs = {}
    if options.get("base_url"):
        kwargs["base_url"] = options["base_url"]
    return ObisClient(**kwargs)


class ObisBatchPartition(InputPartition):
    def __init__(self, start: str, end: str):
        self.start = start
        self.end = end


class ObisReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.options = dict(options)
        self.scientificname = self.options.get("scientificname", "")
        self.startdate = self.options.get("startdate") or None
        self.enddate = self.options.get("enddate") or None
        self.size = int(self.options.get("size", DEFAULT_PAGE_SIZE))

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """R2: absorb eventDate bounds + species equality into request
        params; everything else stays with Spark. The API's date params
        are inclusive exact filters, so consumed predicates are fully
        handled server-side."""
        for f in filters:
            if (
                isinstance(f, GreaterThanOrEqual)
                and f.attribute == ("eventDate",)
                and isinstance(f.value, str)
            ):
                self.startdate = max(self.startdate or f.value, f.value)
            elif (
                isinstance(f, LessThanOrEqual)
                and f.attribute == ("eventDate",)
                and isinstance(f.value, str)
            ):
                self.enddate = min(self.enddate or f.value, f.value)
            elif (
                isinstance(f, EqualTo)
                and f.attribute == ("species",)
                and isinstance(f.value, str)
                and not self.scientificname
            ):
                self.scientificname = f.value
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        """S4: one input partition per greedily-packed year batch."""
        client = _make_client(self.options)
        stats = client.get(
            "/statistics/years",
            {
                "scientificname": self.scientificname,
                "startdate": self.startdate,
                "enddate": self.enddate,
            },
        )
        batches, _, _ = plan_batches(stats, self.startdate, self.enddate, self.size)
        if not batches:
            return [ObisBatchPartition("", "")]
        return [ObisBatchPartition(b.start, b.end) for b in batches]

    def read(self, partition: ObisBatchPartition) -> Iterator[tuple]:
        if not partition.start and not partition.end:
            return
        client = _make_client(self.options)
        start, end = pad_date_format(partition.start, partition.end)
        # clamp the batch range to the (possibly pushed-down) bounds —
        # consumed filters must hold even if a planner batch straddles
        if self.startdate:
            start = max(start, pad_date_format(self.startdate, self.startdate)[0])
        if self.enddate:
            end = min(end, pad_date_format(self.enddate, self.enddate)[1])
        payload = client.get(
            "/occurrence",
            {
                "scientificname": self.scientificname,
                "startdate": start,
                "enddate": end,
                "size": self.size,
            },
        )
        for rec in payload.get("results", []):
            # P1 schema projection: declared fields only, stringified
            yield tuple(
                None if rec.get(name) is None else str(rec.get(name))
                for name in _FIELDS
            )


class ObisDataSource(DataSource):
    """``spark.read.format("obis")`` — register with
    ``spark.dataSource.register(ObisDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "obis"

    def schema(self) -> StructType:
        return OCCURRENCE_RAW_SCHEMA

    def reader(self, schema: StructType) -> ObisReader:
        return ObisReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> "ObisStreamReader":
        return ObisStreamReader(schema, self.options)


class ObisStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the OBIS source: continuous ingestion of
    occurrence records where each greedily-planned year-range batch
    becomes one micro-batch (``spark.readStream.format("obis")``).

    Offsets are the index into the planned batch list, so a restart
    from a checkpoint replays exactly the uncommitted batches —
    the planner is deterministic for a given statistics response,
    which is what makes the offset meaningful. When the plan is
    exhausted the reader reports no new data (same offset back);
    against the live API a fresh statistics scan could extend the
    plan as new years accrue — the offset contract is unchanged.
    """

    def __init__(self, schema: StructType, options: dict):
        self.options = dict(options)
        self.scientificname = self.options.get("scientificname", "")
        self.startdate = self.options.get("startdate") or None
        self.enddate = self.options.get("enddate") or None
        self.size = int(self.options.get("size", DEFAULT_PAGE_SIZE))
        client = _make_client(self.options)
        stats = client.get(
            "/statistics/years",
            {
                "scientificname": self.scientificname,
                "startdate": self.startdate,
                "enddate": self.enddate,
            },
        )
        batches, _, _ = plan_batches(stats, self.startdate, self.enddate, self.size)
        self.batches = [(b.start, b.end) for b in batches]

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        idx = int(start.get("batch", 0))
        if idx >= len(self.batches):
            return iter(()), dict(start)
        b_start, b_end = self.batches[idx]
        client = _make_client(self.options)
        lo, hi = pad_date_format(b_start, b_end)
        payload = client.get(
            "/occurrence",
            {
                "scientificname": self.scientificname,
                "startdate": lo,
                "enddate": hi,
                "size": self.size,
            },
        )
        rows = [
            tuple(
                None if rec.get(name) is None else str(rec.get(name))
                for name in _FIELDS
            )
            for rec in payload.get("results", [])
        ]
        return iter(rows), {"batch": idx + 1}

    def commit(self, end: dict) -> None:
        # nothing external to acknowledge: batches are immutable ranges
        pass
