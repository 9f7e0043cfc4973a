"""whale_sightings_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first reimplementation of the query and
data-processing capabilities of the reference ETL/analytics pipeline
(jarretjeter/whale-sightings: OBIS REST -> validate -> clean -> star
schema -> SQL analytics), extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal columns) and a Structured Streaming surface.

Design stance (SURVEY.md §7.0):
- every operator is a pure ``DataFrame -> DataFrame`` function;
- fixed StructType schemas declared once (:mod:`.schemas`);
- native ``pyspark.sql.functions`` expressions first, Arrow-batched
  pandas UDFs only where built-ins genuinely can't express the
  semantics (messy-date parity, point-in-polygon);
- shuffle-light: dim joins broadcast, order-dependent ops keyed by an
  explicit deterministic ingest ordinal.
"""

from whale_sightings_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
