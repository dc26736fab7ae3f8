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
