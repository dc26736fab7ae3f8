"""Driver-harness registry: named fixture queries + their DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 registers here twice:

- a PySpark implementation ``(spark, sf_dir) -> DataFrame`` built from the
  engine's modules, and
- the equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.

Contract notes (see /root/repo/__spark_entry__.py):
- the driver compares row-count + schema + ORDER-INSENSITIVE value hash, and
  sorts columns BY NAME — so every computed column is aliased identically on
  both sides;
- float results are rounded at the presentation edge (ROUND, F6 semantics) on
  BOTH sides so cross-engine last-ulp summation noise cannot flip the hash;
- any ORDER BY ... LIMIT k carries a deterministic tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.volatility import daily_pct_change, top_avg_volatility, weekly_volatility
from .sources.readers import load_fixture

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a harness query (and its oracle SQL, if any)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    return dict(_ORACLES)


# ---------------------------------------------------------------------------
# Shared fixture shapes
# ---------------------------------------------------------------------------

#: lineitem as an OHLCV-like series: instrument=l_partkey, ts=l_shipdate,
#: close=l_extendedprice. Several lineitems can share a ship date, so the
#: LAG ordering carries (l_orderkey, l_linenumber) to stay total/deterministic.
_SERIES_TIEBREAK = ("l_orderkey", "l_linenumber")

#: The same window, spelled once for the oracle side.
_SERIES_WINDOW_SQL = (
    "PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber"
)


def _lineitem_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_fixture(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("ticker"),
        F.col("l_shipdate").alias("ts"),
        F.col("l_extendedprice").alias("close"),
        "l_orderkey",
        "l_linenumber",
    )


def _lineitem_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_pct_change(
        _lineitem_series(spark, sf_dir),
        key="ticker",
        ts="ts",
        value="close",
        order_tiebreak=_SERIES_TIEBREAK,
    )


_CHANGES_CTE = f"""
WITH changes AS (
    SELECT
        l_partkey AS ticker,
        l_shipdate AS ts,
        (l_extendedprice - LAG(l_extendedprice) OVER w)
            / NULLIF(LAG(l_extendedprice) OVER w, 0) * 100 AS variacao_diaria
    FROM lineitem
    WINDOW w AS ({_SERIES_WINDOW_SQL})
)
"""

# ---------------------------------------------------------------------------
# Flagship chain (W1 W2 F1 F7 A3 P3 A5 O1)
# ---------------------------------------------------------------------------


@register(
    "weekly_volatility",
    _CHANGES_CTE
    + """
SELECT
    ticker,
    DATE_TRUNC('week', ts)::DATE AS week,
    ROUND(STDDEV_SAMP(variacao_diaria), 6) AS vol
FROM changes
WHERE variacao_diaria IS NOT NULL
GROUP BY 1, 2
""",
)
def q_weekly_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """volatility_weekly MV over the lineitem series (SURVEY §2: A3,F1,P3,W1,W2,F7)."""
    wv = weekly_volatility(
        _lineitem_changes(spark, sf_dir), key="ticker", ts="ts"
    )
    return wv.withColumn("vol", F.round("vol", 6))


@register(
    "top_avg_volatility",
    _CHANGES_CTE
    + """
, weekly AS (
    SELECT
        ticker,
        DATE_TRUNC('week', ts)::DATE AS week,
        STDDEV_SAMP(variacao_diaria) AS vol
    FROM changes
    WHERE variacao_diaria IS NOT NULL
    GROUP BY 1, 2
)
SELECT ticker, ROUND(AVG(vol), 6) AS avg_volatility
FROM weekly
GROUP BY ticker
ORDER BY AVG(vol) DESC, ticker ASC
LIMIT 5
""",
)
def q_top_avg_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Report task: most-volatile instruments, top-5 (SURVEY §2: A5, O1)."""
    wv = weekly_volatility(_lineitem_changes(spark, sf_dir), key="ticker", ts="ts")
    top = top_avg_volatility(wv, k=5)
    return top.withColumn("avg_volatility", F.round("avg_volatility", 6))


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entry() target: the weekly-volatility table at the given scale."""
    return q_weekly_volatility(spark, sf_dir)
