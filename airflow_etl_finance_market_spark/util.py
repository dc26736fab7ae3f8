"""Small engine-wide utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, *keys: Column | str, partitions: int | None = None) -> DataFrame:
    """Spread CPU-bound per-row work across every core.

    Text/hash kernels (shingling, minhash, simhash, tokenization, vector
    math) are compute-bound, and a small single-file input otherwise pins
    the whole stage to ONE task — a 5k-doc corpus in one parquet file ran
    the entire dedup family on 1 of 32 cores. The shuffle this inserts
    moves only the small input once and unlocks N× the CPU; at 100 TB the
    input arrives in thousands of splits and `defaultParallelism`-sized
    repartitioning remains the standard fan-out for compute-heavy stages.

    Pass the downstream grouping key(s) so the exchange doubles as the
    aggregation's shuffle (hash-partitioning by key is reused by a later
    groupBy on the same key; keyless round-robin would shuffle twice).
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.repartition(n, *cols) if cols else df.repartition(n)
