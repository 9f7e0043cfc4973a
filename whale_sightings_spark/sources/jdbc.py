"""JDBC source + batched upsert sink (SURVEY.md §2.1 S11-S15, §4 R8).

The reference loads MySQL with per-row upserts inside one transaction
(~160 rows/s, ``db/storage.py:137-146``). The Spark-first replacement
is a ``foreachPartition`` writer issuing batched ``executemany``
upserts over a DB-API connection — each executor partition writes
independently, so throughput scales with partitions instead of being
driver-bound. On MySQL add ``rewriteBatchedStatements=true`` to the
JDBC URL for server-side batching.

The writer is dialect-parameterized (MySQL ``ON DUPLICATE KEY UPDATE``;
SQLite ``ON CONFLICT DO UPDATE`` — used by the test suite since the
container has no MySQL) and takes a connection *factory* so no
connection object is pickled into the closure.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

#: S12: the exact ON DUPLICATE KEY UPDATE column subset for the fact
#: table — conflict updates touch measures + date parts but NOT the
#: waterBodyId/speciesId FKs (reference storage.py:71-76).
OCCURRENCES_UPDATE_COLS = (
    "eventDate",
    "latitude",
    "longitude",
    "individualCount",
    "start_year",
    "start_month",
    "start_day",
    "end_year",
    "end_month",
    "end_day",
    "date_is_valid",
)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    **options: str,
) -> DataFrame:
    """S11/S15: JDBC scan with schema reflection; raises fast when the
    table is missing (the reference's fail-fast check,
    storage.py:40-49). Predicates/projections on the result push down
    to the database via Catalyst."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in {**(properties or {}), **options}.items():
        reader = reader.option(k, v)
    return reader.load()


def mysql_upsert_sql(
    table: str, columns: Sequence[str], update_cols: Sequence[str]
) -> str:
    """INSERT ... ON DUPLICATE KEY UPDATE limited to ``update_cols``."""
    collist = ", ".join(columns)
    placeholders = ", ".join(["%s"] * len(columns))
    updates = ", ".join(f"{c}=VALUES({c})" for c in update_cols)
    return f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) ON DUPLICATE KEY UPDATE {updates}"


def sqlite_upsert_sql(
    table: str,
    columns: Sequence[str],
    update_cols: Sequence[str],
    key_cols: Sequence[str],
) -> str:
    """SQLite twin of :func:`mysql_upsert_sql` (test dialect)."""
    collist = ", ".join(columns)
    placeholders = ", ".join(["?"] * len(columns))
    keys = ", ".join(key_cols)
    updates = ", ".join(f"{c}=excluded.{c}" for c in update_cols)
    return f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) ON CONFLICT({keys}) DO UPDATE SET {updates}"


def upsert_via_foreach_partition(
    df: DataFrame,
    upsert_sql: str,
    connection_factory: Callable[[], object],
    batch_size: int = 1000,
) -> None:
    """R8: partition-parallel batched upserts.

    Each partition opens its own connection (factory runs on the
    executor), buffers ``batch_size`` rows, and ``executemany``s them in
    one transaction per batch. Deterministic per-key outcomes require
    the input to hold one row per key (dedup upstream) — cross-partition
    write order is not defined, matching MySQL semantics for
    last-writer-wins only *within* a partition.
    """
    columns = df.columns

    def write_partition(rows) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            batch = []
            for row in rows:
                batch.append(tuple(row[c] for c in columns))
                if len(batch) >= batch_size:
                    cur.executemany(upsert_sql, batch)
                    conn.commit()
                    batch = []
            if batch:
                cur.executemany(upsert_sql, batch)
                conn.commit()
        finally:
            conn.close()

    df.foreachPartition(write_partition)


def write_jdbc_append(df: DataFrame, url: str, table: str, **options: str) -> None:
    """Plain JDBC append for tables without conflict semantics."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode("append").save()
