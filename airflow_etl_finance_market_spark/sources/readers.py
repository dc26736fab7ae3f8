"""Schema-first sources (SURVEY.md §2.1 S1-S3).

The reference bulk-loads a headered 750k-row CSV with ``COPY ... WITH CSV
HEADER`` (reference: dags/financial_pipeline.py:45-49) and reads back from
Postgres heap tables. Here the source formats are CSV (ingest boundary) and
Parquet (everything post-bronze); both always take an explicit schema so the
scan never pays an inference pass and Catalyst can prune columns/push filters
into the reader.

Scale note: a 100 TB ingest is just more files behind the same
``spark.read`` — the reader parallelizes per file-split
(``spark.sql.files.maxPartitionBytes``), so nothing here changes on a
1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schemas import FIXTURES, STAGING


def read_ohlcv_csv(
    spark: SparkSession,
    path: str,
    *,
    schema: StructType = STAGING,
    fail_fast_exists: bool = True,
) -> DataFrame:
    """CSV source for the raw quotes feed (S1 + S2).

    ``fail_fast_exists`` mirrors the reference's pre-load ``os.path.exists``
    check (reference: dags/financial_pipeline.py:25-27): a clean error before
    a job is launched. ``mode=FAILFAST`` mirrors COPY's abort-on-malformed-row
    behavior (Postgres semantics) instead of silently nulling bad rows.
    """
    if fail_fast_exists and not _path_exists_local(path):
        raise FileNotFoundError(f"input CSV not found: {path}")
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(path)
    )


def _path_exists_local(path: str) -> bool:
    # Only meaningful for local/file: paths; object-store URIs defer to the
    # reader's own AnalysisException.
    if "://" in path and not path.startswith("file://"):
        return True
    return os.path.exists(path.removeprefix("file://"))


def load_fixture(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver fixture table (region/nation/.../embeddings) as a DataFrame.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it as raw nanos via the
    legacy conf and truncate to microseconds with *integer* division (``div``,
    not ``/`` — double division would round the 19-digit nanos value). DuckDB
    truncates ns→µs on read the same way, so both engines agree to the µs.
    """
    if name not in FIXTURES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {sorted(FIXTURES)}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # TIMESTAMP_NTZ, built arithmetically from the epoch nanos: wall-clock
        # semantics identical to DuckDB's TIMESTAMP under ANY session timezone
        # (timestamp_micros() would yield an instant that renders shifted in
        # non-UTC sessions).
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df


def load_fixtures(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Several fixture tables at once: ``load_fixtures(spark, d, 'lineitem', 'orders')``."""
    return {n: load_fixture(spark, sf_dir, n) for n in (names or FIXTURES)}


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema,
    *,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Schema-first JSON-Lines corpus reader — the wire format text
    corpora actually ship in (one JSON document per line; The Pile,
    Dolma, Common Crawl derivatives all distribute this way).

    Same contract as the CSV reader: an EXPLICIT schema (never inferred —
    schema inference reads the data twice and silently widens types
    between crawls) and FAILFAST by default so a malformed line stops the
    load instead of nulling through the quality gate. Pass
    ``mode="PERMISSIVE"`` plus a ``_corrupt_record`` field in the schema
    to quarantine bad lines instead. JSONL splits by newline, so a single
    large file still parallelizes across executors — no fan_out needed
    for ingest itself.
    """
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .json(path)
    )


def write_jsonl_corpus(df: DataFrame, path: str) -> None:
    """JSONL sink (one JSON object per line, overwrite) — the export half
    of the corpus interchange contract; column order follows the schema
    so round-trips are stable."""
    df.write.mode("overwrite").json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema=None,
) -> DataFrame:
    """ORC reader — the other columnar interchange format a warehouse
    migration actually encounters (Hive/Trino estates ship ORC the way
    lakehouses ship parquet). Schema-first like every reader here when a
    schema is given (no inference pass, early type mismatch); ORC stripes
    split like parquet row groups, so a single large file parallelizes,
    and predicate pushdown reaches the stripe/row-group indexes the same
    way (`PushedFilters` in the scan — pinned in tests)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, *, partition_by: tuple[str, ...] = ()) -> None:
    """ORC sink (overwrite, snappy default) — the export half for
    Hive/Trino consumers; partition_by mirrors the parquet sink's layout
    contract."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
