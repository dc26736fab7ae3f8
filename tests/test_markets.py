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


def test_pairwise_return_correlation_matches_python(spark):
    """Known 3-ticker fixture: Pearson replayed in Python, the min_days
    gate, the deterministic top-N cut, and a < b pair canonicalization."""
    import math
    from datetime import date

    from airflow_etl_finance_market_spark.operators.markets import (
        pairwise_return_correlation,
    )

    rows = []
    # tickers 1 and 2 trade 6 shared days; ticker 3 only 2 days (cut by
    # top_tickers=2) — returns chosen non-degenerate
    r1 = [1.0, 2.0, -1.0, 3.0, 0.5, -2.0]
    r2 = [0.5, 1.5, -0.5, 2.0, 1.0, -1.5]
    for i, (a, b) in enumerate(zip(r1, r2)):
        d = date(2024, 1, i + 1)
        rows += [(1, d, a), (2, d, b)]
    rows += [(3, date(2024, 1, 1), 9.0), (3, date(2024, 1, 2), -9.0)]
    changes = spark.createDataFrame(
        rows, "ticker long, ts date, variacao_diaria double"
    )
    got = pairwise_return_correlation(
        changes, top_tickers=2, min_days=3
    ).collect()
    assert len(got) == 1
    row = got[0]
    assert (row.ticker_a, row.ticker_b, row.n_days) == (1, 2, 6)
    n = len(r1)
    ma, mb = sum(r1) / n, sum(r2) / n
    cov = sum((x - ma) * (y - mb) for x, y in zip(r1, r2))
    va = sum((x - ma) ** 2 for x in r1)
    vb = sum((y - mb) ** 2 for y in r2)
    want = cov / math.sqrt(va * vb)
    assert abs(row.corr_returns - round(want, 6)) < 1e-9


def test_weighted_sample_replays_python_race_keys(spark):
    """A-ES selection replayed in Python from the identical md5-derived
    uniforms; k per group; determinism under repartitioning."""
    import hashlib
    import math

    from airflow_etl_finance_market_spark.operators.sampling import (
        weighted_sample,
    )

    data = [
        (i, "g1" if i < 40 else "g2", float(10 + (i * 37) % 90))
        for i in range(60)
    ]
    df = spark.createDataFrame(data, "doc_id long, lang string, w double")

    def race(doc_id, w):
        b = int(
            hashlib.md5(f"seed42:{doc_id}".encode()).hexdigest()[:8], 16
        )
        u = (b + 0.5) / 4294967296.0
        return -math.log(u) / w

    expect = {}
    for g in ("g1", "g2"):
        members = sorted(
            (r for r in data if r[1] == g),
            key=lambda r: (race(r[0], r[2]), r[0]),
        )
        expect[g] = [r[0] for r in members[:7]]

    for parts in (1, 8):
        out = weighted_sample(
            df.repartition(parts), key="doc_id", weight_col="w",
            group="lang", k=7,
        ).collect()
        got = {}
        for r in sorted(out, key=lambda r: (r.lang, r.sample_rank)):
            got.setdefault(r.lang, []).append(r.doc_id)
        assert got == expect


def test_weighted_sample_heavy_weight_dominates(spark):
    """P(first pick) = w/sum(w): a weight 10^9 above the field is chosen
    rank 1 for any seed that doesn't hit a ~1e-9 uniform."""
    from airflow_etl_finance_market_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(i, "g", 1.0 if i else 1e9) for i in range(50)],
        "doc_id long, lang string, w double",
    )
    top = weighted_sample(
        df, key="doc_id", weight_col="w", group="lang", k=1
    ).collect()
    assert [(r.doc_id, r.sample_rank) for r in top] == [(0, 1)]


def test_weighted_sample_excludes_null_and_nonpositive_weights(spark):
    """NULL race keys would sort FIRST in Spark and LAST in DuckDB — the
    operator must exclude undefined-weight rows up front rather than
    silently hand them rank 1."""
    from airflow_etl_finance_market_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, "g", None), (2, "g", 0.0), (3, "g", -4.0), (4, "g", 5.0),
         (5, "g", 1.0), (None, "g", 9.0)],
        "doc_id long, lang string, w double",
    )
    out = weighted_sample(
        df, key="doc_id", weight_col="w", group="lang", k=10
    ).collect()
    assert sorted(r.doc_id for r in out) == [4, 5]
