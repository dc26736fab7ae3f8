"""SparkSession factory.

Centralizes the configuration the whole engine relies on:

- **AQE on** (adaptive query execution): runtime shuffle-partition coalescing,
  skew-join splitting, and broadcast-join conversion. At the 100 TB design
  point these replace hand-tuned partition counts (SURVEY.md §4.3).
- **UTC session timezone**: every date/timestamp function (``date_trunc``,
  ``dayofweek``…) must agree with the ANSI-SQL oracle; a non-UTC session TZ
  would silently shift week boundaries (SURVEY.md §7.6 risk register).
- **Explicit shuffle partitions** as the *upper bound* AQE coalesces from.
  Local runs default to the core count; on a real cluster pass
  ``shuffle_partitions≈2×total-cores`` (or leave AQE to coalesce from a high
  bound sized so one partition of the largest shuffle fits in executor
  memory: ~100 TB input / 128 MB ≈ 1M map partitions; reducers sized via
  ``spark.sql.adaptive.advisoryPartitionSizeInBytes``).

The factory is idempotent (``getOrCreate``) so library code, tests and the
driver harness can all call it; when the harness already owns a session
(the driver passes ``spark`` into ``queries()``) nothing here runs at all --
engine code never creates a session behind the caller's back.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Core count for local mode; honors the harness SPARK_GRAFT_CPUS knob."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "finmarket-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Parameters mirror what a cluster deployment would override via
    ``spark-submit --conf``; the defaults are the local[`ncpu`] test posture.
    """
    ncpu = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        # -- correctness-critical ------------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # -- adaptive execution (scale posture) ----------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- shuffle sizing -------------------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or ncpu))
        .config("spark.default.parallelism", str(ncpu))
        # -- I/O ------------------------------------------------------------
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # -- Python boundary: Arrow everywhere we cross it -------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- local-mode memory (ignored when a cluster master is set) --------
        # Measured on the local[32] bench at sf0.1: 8g → ~34 s total,
        # 16g → ~42 s, 48g → 120-145 s (2-25x per-query regressions).
        # Oversized heaps lose badly in this virtualized environment
        # (lazily-committed pages + larger GC regions), so keep the heap
        # small; the workload's working set fits comfortably.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" in os.environ:
        builder = builder.master(os.environ["SPARK_MASTER"])
    else:
        builder = builder.master(f"local[{ncpu}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
