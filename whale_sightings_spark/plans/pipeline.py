"""End-to-end whale pipeline (SURVEY.md §3.1): one lazy DataFrame
lineage from raw-zone JSON to the curated frame + star schema.

Reference lifecycle (``main.py:33-50``): fetch -> validate -> clean ->
load, eager and single-threaded with file checkpoints between stages.
Here stages 2-4 are one Catalyst plan; actions happen only at sinks.
The only wide operators are the dedup window and the dim aggregations —
every dim join broadcasts (SURVEY §7.0).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from whale_sightings_spark.functions.dates import with_date_parts
from whale_sightings_spark.operators.clean import (
    dedup_keep_first,
    explode_error_details,
    fill_in,
    get_start_and_end,
    merge_channels,
    process_error_data,
    regroup_error_details,
    with_date_validity,
)
from whale_sightings_spark.operators.dims import (
    build_occurrences_fact,
    derive_species_dim,
    encode_locations_dim,
    resolve_water_body_fk,
)
from whale_sightings_spark.operators.spatial import spatial_join_water_body
from whale_sightings_spark.operators.validate import validate_occurrences
from whale_sightings_spark.sources.files import match_raw_files, read_raw_occurrences
from whale_sightings_spark.whales import WHALE_NAMES


@dataclass
class PipelineContext:
    """Mirror of the reference's PipelineContext (main.py:12-30)."""

    whale: str
    startdate: str | None = None
    enddate: str | None = None
    data_dir: str = "data"
    scientificname: str = field(init=False)

    def __post_init__(self) -> None:
        if self.whale not in WHALE_NAMES:
            raise ValueError(
                f"{self.whale!r} is not a known whale; expected one of {sorted(WHALE_NAMES)}"
            )
        self.scientificname = WHALE_NAMES[self.whale]["scientificname"]


@dataclass
class PipelineResult:
    cleaned: DataFrame
    unrepaired_errors: DataFrame
    startdate: str | None
    enddate: str | None


def clean_occurrences(
    raw: DataFrame,
    ctx: PipelineContext,
    oceans: DataFrame | None = None,
) -> PipelineResult:
    """Stages 2-3 (validate + clean) as one lineage.

    raw -> validation split (P1-P3) -> error explode + repair (F12/P6)
    -> union (U1) -> date validity (P4) -> keep-first dedup (W2) ->
    fills (W1/F7/F8) -> spatial join (J1).
    """
    valid, errors = validate_occurrences(raw)
    valid = with_date_parts(valid, src="eventDate")

    exploded = explode_error_details(errors)
    repaired, unrepaired = process_error_data(exploded)

    merged = merge_channels(valid, repaired)
    merged = with_date_validity(merged)
    merged = dedup_keep_first(merged)
    merged = fill_in(merged, ctx.whale)
    if oceans is not None:
        merged = spatial_join_water_body(merged, oceans)

    start, end = get_start_and_end(merged, ctx.startdate, ctx.enddate)
    return PipelineResult(
        cleaned=merged,
        unrepaired_errors=regroup_error_details(unrepaired),
        startdate=start,
        enddate=end,
    )


def run_pipeline(
    spark: SparkSession,
    ctx: PipelineContext,
    oceans: DataFrame | None = None,
) -> PipelineResult:
    """Raw zone -> cleaned frame, with the reference's filename-range
    pruning at the file listing (S6)."""
    paths = match_raw_files(ctx.data_dir, ctx.whale, ctx.startdate, ctx.enddate)
    raw = read_raw_occurrences(spark, paths)
    return clean_occurrences(raw, ctx, oceans)


def build_star_schema(
    cleaned: DataFrame, existing_locations: DataFrame | None = None
) -> dict[str, DataFrame]:
    """Stage 4 dims + fact (S12-S14): locations surrogate encoding,
    species dim, FK-resolved fact."""
    locations = encode_locations_dim(cleaned, existing_locations)
    species = derive_species_dim(cleaned)
    fact = build_occurrences_fact(resolve_water_body_fk(cleaned, locations))
    return {"locations": locations, "species": species, "occurrences": fact}
