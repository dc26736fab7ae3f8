"""Market time-series operators (operators/markets.py) + per-group quota
(operators/sampling.py): functional replays against pandas/numpy and the
determinism contracts the docstrings promise."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airflow_etl_finance_market_spark.operators.markets import (
    market_beta,
    max_drawdown,
    ohlcv_resample,
)
from airflow_etl_finance_market_spark.operators.sampling import per_group_quota

ROWS = st.lists(
    st.tuples(
        st.integers(0, 3),  # ticker
        st.integers(0, 40),  # day offset
        st.integers(100, 99999),  # price cents
        st.integers(1, 50),  # qty
    ),
    min_size=1,
    max_size=60,
)


def _series_df(spark, rows):
    # unique (ts, seq) total order: seq is the row index
    data = [
        (
            t,
            (pd.Timestamp("2024-01-01") + pd.Timedelta(days=d)).to_pydatetime(),
            cents / 100.0,
            float(q),
            i,
            0,
        )
        for i, (t, d, cents, q) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "ticker int, ts timestamp, px double, qty double, ok long, ln int"
    )


@settings(max_examples=20, deadline=None)
@given(rows=ROWS)
def test_max_drawdown_matches_pandas_replay(spark, rows):
    df = _series_df(spark, rows)
    got = {
        r["ticker"]: r["max_drawdown"]
        for r in max_drawdown(
            df, key="ticker", ts="ts", price="px", tiebreak=("ok", "ln")
        ).collect()
    }
    pdf = df.toPandas().sort_values(["ticker", "ts", "ok", "ln"])
    for t, g in pdf.groupby("ticker"):
        peak = g["px"].cummax()
        want = round(float(((g["px"] - peak) / peak).min()), 6)
        assert got[t] == pytest.approx(want, abs=1e-9)


@settings(max_examples=20, deadline=None)
@given(rows=ROWS)
def test_ohlcv_bars_match_pandas_replay(spark, rows):
    df = _series_df(spark, rows)
    got = (
        ohlcv_resample(
            df,
            key="ticker",
            ts="ts",
            price="px",
            qty="qty",
            bucket="week",
            tiebreak=("ok", "ln"),
        )
        .toPandas()
        .set_index(["ticker", "week"])
        .sort_index()
    )
    pdf = df.toPandas().sort_values(["ticker", "ts", "ok", "ln"])
    pdf["week"] = pdf["ts"].dt.to_period("W-SUN").dt.start_time.dt.date
    for (t, w), g in pdf.groupby(["ticker", "week"]):
        row = got.loc[(t, w)]
        assert row["open"] == g["px"].iloc[0]
        assert row["close"] == g["px"].iloc[-1]
        assert row["high"] == g["px"].max()
        assert row["low"] == g["px"].min()
        assert row["volume"] == pytest.approx(g["qty"].sum())
        cents = (g["px"] * 100).round().astype("int64")
        units = g["qty"].round().astype("int64")
        want_micro = int(cents.mul(units).sum()) * 10000 // int(units.sum())
        assert int(row["vwap_micro"]) == want_micro


def test_market_beta_matches_numpy(spark):
    # deterministic small panel: 3 tickers x 30 days of returns
    rng = np.random.RandomState(7)
    days = pd.date_range("2024-01-01", periods=30)
    rows = []
    for tk in range(3):
        for i, d in enumerate(days):
            rows.append((tk, d.to_pydatetime(), float(rng.randn() * (tk + 1))))
    df = spark.createDataFrame(
        rows, "ticker int, ts timestamp, variacao_diaria double"
    )
    got = {
        r["ticker"]: (r["beta"], r["n_days"])
        for r in market_beta(
            df, key="ticker", ts="ts", ret="variacao_diaria"
        ).collect()
    }
    pdf = df.toPandas()
    pdf["d"] = pdf["ts"].dt.date
    daily = pdf.groupby(["ticker", "d"])["variacao_diaria"].mean().reset_index()
    market = daily.groupby("d")["variacao_diaria"].mean().rename("rm")
    for tk, g in daily.groupby("ticker"):
        m = g.join(market, on="d")
        cov = np.cov(m["variacao_diaria"], m["rm"], bias=True)[0, 1]
        var = np.var(m["rm"])
        assert got[tk][0] == pytest.approx(round(cov / var, 6), abs=1e-6)
        assert got[tk][1] == len(g)


def test_per_group_quota_cap_and_partition_invariance(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"),
    )
    out = per_group_quota(df, group="source", id_col="doc_id", quota=25)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 25 for n in counts.values())
    # membership is a pure function of (seed, id): physical layout must not
    # change the kept set
    out2 = per_group_quota(
        df.repartition(13), group="source", id_col="doc_id", quota=25
    )
    a = {(r["source"], r["doc_id"]) for r in out.collect()}
    b = {(r["source"], r["doc_id"]) for r in out2.collect()}
    assert a == b


def test_per_group_quota_keeps_small_groups_whole(spark):
    df = spark.createDataFrame(
        [(i, "tiny") for i in range(5)] + [(100 + i, "big") for i in range(80)],
        "doc_id long, source string",
    )
    out = per_group_quota(df, group="source", id_col="doc_id", quota=10)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"tiny": 5, "big": 10}


def test_per_group_quota_salted_two_level_identical(spark):
    """pre_salt changes only parallelism: the kept set and ranks must be
    byte-identical to the exact single-window form."""
    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("source"),
    )
    exact = per_group_quota(df, group="source", id_col="doc_id", quota=30)
    salted = per_group_quota(
        df, group="source", id_col="doc_id", quota=30, pre_salt=8
    )
    a = {(r["source"], r["doc_id"], r["sample_rank"]) for r in exact.collect()}
    b = {(r["source"], r["doc_id"], r["sample_rank"]) for r in salted.collect()}
    assert a == b


def test_rebalance_sample_uniformizes_and_is_deterministic(spark):
    from airflow_etl_finance_market_spark.operators.sampling import (
        rebalance_sample,
    )

    df = spark.range(0, 11000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 10000, "en").otherwise("zh").alias("lang"),
    )
    out = rebalance_sample(df, strata_col="lang", id_col="doc_id")
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # zh is the floor (1000 rows, threshold 10000 -> keep all); en
    # downsamples to ~1000 within the 1/scale + binomial tolerance
    assert counts["zh"] == 1000
    assert abs(counts["en"] - 1000) < 150
    # pure function of (seed, id): physical layout cannot change the set
    out2 = rebalance_sample(
        df.repartition(7), strata_col="lang", id_col="doc_id"
    )
    assert {r["doc_id"] for r in out.collect()} == {
        r["doc_id"] for r in out2.collect()
    }


def test_rebalance_sample_extreme_skew_never_drops_stratum(spark):
    """A stratum more than `scale`x larger than the smallest used to get
    threshold (min*scale) DIV cnt == 0 — silently dropped from the mix.
    The floor-at-1 keeps ~cnt/scale of it instead (ADVICE r04)."""
    from airflow_etl_finance_market_spark.operators.sampling import (
        rebalance_sample,
    )

    df = spark.range(0, 201).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1, "tiny").otherwise("huge").alias("lang"),
    )
    # huge/tiny = 200 > scale=10 -> un-floored threshold would be 0
    out = rebalance_sample(df, strata_col="lang", id_col="doc_id", scale=10)
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts["tiny"] == 1
    # threshold floors at 1 -> keeps bucket-0 rows, ~cnt/scale = ~20;
    # md5 buckets are deterministic, so the exact kept count is stable
    assert counts.get("huge", 0) == 13
