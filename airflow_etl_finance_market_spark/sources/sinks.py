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

    Only a genuinely-missing path takes the create branch: any other read
    failure (permissions, corrupt footer, transient storage error) re-raises
    instead of silently overwriting a valid table — ON CONFLICT DO NOTHING
    must never destroy the conflict target.
    """
    from pyspark.errors import AnalysisException

    fresh = incoming.dropDuplicates(keys)
    try:
        existing = spark.read.parquet(path).select(*keys)
    except AnalysisException as e:
        if e.getCondition() != "PATH_NOT_FOUND":
            raise
        fresh.write.mode("overwrite").parquet(path)
        return fresh.count()
    to_insert = fresh.join(existing, on=keys, how="left_anti")
    n = to_insert.count()
    if n:
        to_insert.write.mode("append").parquet(path)
    return n


def write_bucketed_table(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
) -> None:
    """Bucketed managed table: pre-shuffle the data ONCE at write time so
    every later join/aggregation on the bucket key is exchange-free.

    This is the 100 TB answer to a fact⋈fact join that would otherwise
    shuffle both sides on every query: two tables bucketed identically on
    the join key co-locate bucket-for-bucket, and Catalyst plans the join
    with NO Exchange on either side (asserted in tests/test_plan_shapes).
    ``sort_by`` additionally pre-sorts within buckets, upgrading SMJ to a
    sort-free merge. Bucketing metadata lives in the session catalog —
    `saveAsTable`, not a bare path.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
