"""Salted-join equivalence and sketch-aggregate accuracy bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_etl_finance_market_spark.operators.skew import salted_join
from airflow_etl_finance_market_spark.plans.analytics import approx_event_stats
from airflow_etl_finance_market_spark.sources.readers import load_fixture


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_fixture(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = load_fixture(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").collect()
    salted = salted_join(
        li, orders, "l_orderkey", salt_factor=8, salt_by="l_linenumber"
    ).collect()
    key = lambda r: (r["l_orderkey"], r["l_linenumber"])
    assert sorted(map(key, plain)) == sorted(map(key, salted))
    # salted plan scatters the hot key: small side replicated 8x
    assert len(salted) == len(plain)


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    small = spark.createDataFrame([(1, 10.0)], "k long, w double")
    rows = {
        r["k"]: r["w"]
        for r in salted_join(big, small, "k", salt_factor=4, how="left", salt_by="v").collect()
    }
    assert rows == {1: 10.0, 2: None}


def test_sketches_within_tolerance(spark, sf_dir):
    events = load_fixture(spark, sf_dir, "events")
    approx = {r["event_type"]: r for r in approx_event_stats(events).collect()}
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("median"),
        )
        .collect()
    }
    for et, e in exact.items():
        a = approx[et]
        assert abs(a["approx_users"] - e["users"]) <= max(2, 0.05 * e["users"])
        # approx median within 15% of the exact median for this distribution
        assert abs(a["approx_median_value"] - e["median"]) <= 0.15 * max(abs(e["median"]), 1.0)


class TestHllMergeableSketches:
    def test_stored_sketches_survive_roundtrip_and_merge(
        self, spark, sf_dir, tmp_path
    ):
        """The scale claim: sketches written to parquet, read back in a
        separate frame, and MERGED must reproduce the union estimate —
        pre-aggregation for DISTINCT is sound only because union of
        sketches = sketch of the union."""
        from pyspark.sql import functions as F

        from airflow_etl_finance_market_spark.plans.analytics import (
            hll_daily_user_sketches,
            hll_rollup_estimate,
        )
        from airflow_etl_finance_market_spark.sources.readers import (
            load_fixture,
        )

        ev = load_fixture(spark, sf_dir, "events")
        sk = hll_daily_user_sketches(ev)
        path = str(tmp_path / "sketches")
        sk.write.parquet(path)  # the stored intermediate
        back = spark.read.parquet(path)
        merged = hll_rollup_estimate(back).first()["users_est"]
        exact = ev.select(F.countDistinct("user_id")).first()[0]
        assert abs(merged - exact) / exact <= 0.05
        # in-session merge agrees with the roundtripped one exactly
        assert hll_rollup_estimate(sk).first()["users_est"] == merged

    def test_weekly_rollup_from_daily_sketches(self, spark, sf_dir):
        """Coarser grains merge from the stored dailies without touching
        raw events; each weekly estimate stays within 5% of its exact."""
        from pyspark.sql import functions as F

        from airflow_etl_finance_market_spark.plans.analytics import (
            hll_daily_user_sketches,
            hll_rollup_estimate,
        )
        from airflow_etl_finance_market_spark.sources.readers import (
            load_fixture,
        )

        ev = load_fixture(spark, sf_dir, "events")
        daily = hll_daily_user_sketches(ev).withColumn(
            "wk", F.date_trunc("week", F.col("d")).cast("date")
        )
        weekly = {
            r["wk"]: r["users_est"]
            for r in hll_rollup_estimate(
                daily, group_cols=("wk",)
            ).collect()
        }
        exact = {
            r["wk"]: r["n"]
            for r in ev.groupBy(
                F.date_trunc("week", F.col("ts").cast("date"))
                .cast("date")
                .alias("wk")
            )
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert set(weekly) == set(exact) and len(weekly) >= 4
        for wk, est in weekly.items():
            assert abs(est - exact[wk]) / exact[wk] <= 0.05
