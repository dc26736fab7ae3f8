"""Top-k patterns (SURVEY.md §2.6 O1-O3).

``orderBy(...).limit(k)`` plans as TakeOrderedAndProject — each partition
keeps a k-row heap and the driver merges heaps; nothing materializes a global
sort. That is the right physical shape at any scale, so the helper's only
job is to enforce a *deterministic* ordering (explicit tiebreak) so results
are stable and oracle-comparable.

``top_k_per_group`` is the grouped variant (dedup-by-latest, best-n-per-key —
a training-pipeline staple): a ranking window, one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k with caller-supplied total ordering (include a tiebreak!)."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column],
    k: int = 1,
    *,
    rank_col: str = "__rn",
) -> DataFrame:
    """k best rows per group via row_number (ties broken by order_by)."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .drop(rank_col)
    )
