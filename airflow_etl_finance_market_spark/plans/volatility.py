"""The flagship query chain: daily %-change → weekly volatility → top-k.

This is the reference's headline metric end-to-end
(reference: dags/financial_pipeline.py:184-209 fused with :58-67):

    fact:    LAG %-change per instrument          (W1, W2, F7)
    weekly:  STDDEV_SAMP by (instrument, Monday week)  (F1, A3, P3)
    report:  AVG(vol) per instrument, ORDER BY DESC LIMIT k  (A5, O1)

The functions are generic over any (key, timestamp, value) series so the same
plan runs on the OHLCV staging table and on the driver fixtures
(lineitem: key=l_partkey, ts=l_shipdate, value=l_extendedprice).

Physical shape (verified via .explain):
  one Exchange on the series key for the window, then the weekly groupBy is
  partial-aggregated map-side before its exchange on (key, week); the top-k
  plans as TakeOrderedAndProject — no global sort materialization. At 100 TB
  the only full shuffle is the window's hash-partition on the instrument key;
  that key space (instruments) is large and uniform, so no skew salting is
  needed — AQE handles stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.datetime import week_start
from ..functions.finance import pct_change, series_window


def daily_pct_change(
    series: DataFrame,
    *,
    key: str = "ticker",
    ts: str = "data_id",
    value: str = "close",
    order_tiebreak: tuple[str, ...] = (),
    out: str = "variacao_diaria",
) -> DataFrame:
    """Append the LAG-based %-change column to a (key, ts, value) series.

    ``order_tiebreak`` must make the per-key ordering total when ``ts`` can
    tie (e.g. several lineitems on one ship date) — otherwise LAG is
    nondeterministic.
    """
    w = series_window(key, ts, *order_tiebreak)
    return series.withColumn(out, pct_change(value, w))


def weekly_volatility(
    changes: DataFrame,
    *,
    key: str = "ticker",
    ts: str = "data_id",
    change: str = "variacao_diaria",
) -> DataFrame:
    """STDDEV_SAMP of the daily change per (key, Monday-truncated week).

    Mirrors the volatility_weekly materialized view
    (reference: dags/financial_pipeline.py:203-209): the IS NOT NULL filter
    drops each instrument's first row; singleton weeks yield NULL vol —
    same in PG, DuckDB and Spark (SURVEY.md App. A).
    """
    return (
        changes.filter(F.col(change).isNotNull())
        .groupBy(F.col(key).alias("ticker"), week_start(ts).alias("week"))
        .agg(F.stddev_samp(change).alias("vol"))
    )


def rolling_mean(
    series: DataFrame,
    *,
    key: str = "ticker",
    ts: str = "data_id",
    value: str = "close",
    n: int = 7,
    order_tiebreak: tuple[str, ...] = (),
    out: str = "rolling_avg",
) -> DataFrame:
    """n-row trailing moving average per key (frame-spec window, §2.5 class).

    ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW — row-based (not range-based)
    so partial leading windows average over however many rows exist, the
    standard SMA convention. Same shuffle shape as daily_pct_change: one
    exchange on the key, then a per-partition sort — windows over the same
    key reuse the partitioning, so chaining this after pct_change costs no
    extra shuffle.
    """
    w = series_window(key, ts, *order_tiebreak).rowsBetween(-(n - 1), 0)
    return series.withColumn(out, F.avg(value).over(w))


def top_avg_volatility(weekly: DataFrame, k: int = 1) -> DataFrame:
    """Most-volatile instruments: AVG(vol) per ticker, ORDER BY DESC LIMIT k.

    The report task (reference: dags/financial_pipeline.py:58-67). Ticker is
    the deterministic tiebreak so top-k is stable across engines. Plans as
    TakeOrderedAndProject (true top-k).
    """
    return (
        weekly.groupBy("ticker")
        .agg(F.avg("vol").alias("avg_volatility"))
        .orderBy(F.desc("avg_volatility"), F.asc("ticker"))
        .limit(k)
    )
