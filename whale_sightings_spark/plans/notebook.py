"""Notebook-parity analytics (reference ``notebooks/visualizations.ipynb``
cells 9-14): the queries behind the reference's two figures, as
DataFrame operators over the star schema, plus optional matplotlib
renderers.

Cells 9-10 join the ``occurrences`` fact to both dims for one species;
cell 13 derives valid-date sightings-per-year. Spark-first shape: both
dims are dictionary-sized and broadcast — the fact never shuffles for
the join, and the per-year count is one partial-aggregated shuffle of
year keys, so the "notebook" runs unchanged over a 100 TB fact table.

matplotlib is not shipped in this container, so the renderers are
import-gated: the query operators (the actual engine surface) are fully
testable without it, and the PNG step activates when the library
exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def species_sightings(
    occurrences: DataFrame,
    species: DataFrame,
    locations: DataFrame,
    species_id: int,
) -> DataFrame:
    """Cells 9-10: one species' sightings with species + location names.

    The speciesId filter is pushed to the fact scan; both dim joins are
    broadcast inner joins (the notebook's pandas ``merge`` twice).
    """
    fact = occurrences.filter(F.col("speciesId") == species_id).select(
        F.col("id").alias("eventId"),
        F.col("eventDate").alias("date"),
        "waterBodyId",
        "latitude",
        "longitude",
        "speciesId",
        "individualCount",
        "date_is_valid",
    )
    sp = F.broadcast(
        species.select(F.col("id").alias("speciesId"), "speciesName")
    )
    loc = F.broadcast(
        locations.select(F.col("id").alias("waterBodyId"), "waterBody")
    )
    return fact.join(sp, "speciesId").join(loc, "waterBodyId")


def sightings_per_year(sightings: DataFrame) -> DataFrame:
    """Cell 13: valid-date rows only, counted per event year, newest
    first (pandas ``value_counts`` ordering is by count desc; the chart
    consumes either — sort by count desc, year asc for determinism)."""
    return (
        sightings.filter(F.col("date_is_valid"))
        .select(F.substring("date", 1, 4).cast("int").alias("date"))
        .groupBy("date")
        .agg(F.count("*").alias("num_sightings"))
        .orderBy(F.desc("num_sightings"), F.asc("date"))
    )


def render_sightings_map(sightings: DataFrame, out_path: str) -> str:
    """Cell 12's scatter map. Requires matplotlib; the collect is the
    plot's own contract (a figure is driver-sized by definition) —
    aggregate or sample upstream for large inputs."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - not shipped here
        raise RuntimeError("matplotlib is required for render_sightings_map") from e
    rows = sightings.select("longitude", "latitude").collect()
    fig, ax = plt.subplots(figsize=(8, 7))
    ax.scatter([float(r[0]) for r in rows], [float(r[1]) for r in rows], c="blue", s=8)
    ax.set(xlabel="longitude", ylabel="latitude")
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def render_sightings_per_year(per_year: DataFrame, out_path: str, title: str) -> str:
    """Cell 14's bar chart (years on x, counts on y)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - not shipped here
        raise RuntimeError("matplotlib is required for render_sightings_per_year") from e
    rows = per_year.collect()
    fig, ax = plt.subplots()
    ax.bar([r["date"] for r in rows], [r["num_sightings"] for r in rows])
    ax.set(xlabel="Year", ylabel="Number of Sightings", title=title)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
