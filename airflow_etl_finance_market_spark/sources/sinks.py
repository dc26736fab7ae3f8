"""Sinks (SURVEY.md §2.1 S4-S7).

- ``overwrite_parquet`` — the TRUNCATE-and-reload pattern
  (reference: dags/financial_pipeline.py:43,182): ``mode("overwrite")`` IS
  truncate+insert, and makes every pipeline stage idempotent/re-runnable.
- ``append_if_absent`` — ``INSERT ... ON CONFLICT (pk) DO NOTHING``
  (reference: dags/financial_pipeline.py:148-150,159-161) expressed as a
  left-anti join against the existing keys, then append. Single-writer
  semantics, same as the reference's LocalExecutor.

Scale notes: the anti-join's build side is the *incoming* batch (small) so
Spark broadcasts it when under the threshold; partition the target by a date
column (``partition_by``) so downstream scans get static/dynamic partition
pruning, and so overwrites of a daily run touch one partition, not 100 TB
(``spark.sql.sources.partitionOverwriteMode=dynamic`` on a real deployment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def overwrite_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
) -> None:
    """Truncate-and-reload sink (S4/S5/S7): full overwrite of `path`."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def append_if_absent(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    keys: list[str],
) -> int:
    """Upsert-lite sink (S6/J3): append rows whose `keys` are not yet present.

    Returns the number of appended rows. First write (no existing data)
    degrades to a plain create. The incoming batch is de-duplicated on the
    keys first, matching ``SELECT DISTINCT ... ON CONFLICT DO NOTHING``.
    """
    fresh = incoming.dropDuplicates(keys)
    try:
        existing = spark.read.parquet(path).select(*keys)
    except Exception:
        fresh.write.mode("overwrite").parquet(path)
        return fresh.count()
    to_insert = fresh.join(existing, on=keys, how="left_anti")
    n = to_insert.count()
    if n:
        to_insert.write.mode("append").parquet(path)
    return n
