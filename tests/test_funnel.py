"""Unit tests for the sequential-event operators (funnel, cohorts) and the
IQR outlier audit: semantics pinned on hand-built frames plus a numpy
replay, independent of the DuckDB oracle parity test."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from airflow_etl_finance_market_spark.operators.funnel import (
    event_funnel,
    retention_cohorts,
)
from airflow_etl_finance_market_spark.operators.quality import iqr_outliers


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


class TestEventFunnel:
    def test_strict_order_required(self, spark):
        rows = [
            # u1 converts in order: view d1 -> click d2 -> purchase d3
            (1, _ts(1), "view"),
            (1, _ts(2), "click"),
            (1, _ts(3), "purchase"),
            # u2 clicked BEFORE their first view: stops at step 1
            (2, _ts(2), "click"),
            (2, _ts(3), "view"),
            # u3 view+click but purchase precedes the click: stops at step 2
            (3, _ts(1), "view"),
            (3, _ts(2), "purchase"),
            (3, _ts(3), "click"),
            # u4 never views: not even step 1
            (4, _ts(1), "click"),
            (4, _ts(2), "purchase"),
        ]
        out = {
            r.step: r.n_users
            for r in event_funnel(
                _events(spark, rows), ["view", "click", "purchase"]
            ).collect()
        }
        assert out == {"view": 3, "click": 2, "purchase": 1}

    def test_same_timestamp_not_after(self, spark):
        # strict ">": a click at exactly the first view's instant doesn't count
        rows = [(1, _ts(1), "view"), (1, _ts(1), "click")]
        out = {
            r.step: r.n_users
            for r in event_funnel(
                _events(spark, rows), ["view", "click"]
            ).collect()
        }
        assert out == {"view": 1, "click": 0}

    def test_earliest_event_chaining(self, spark):
        # u1's FIRST view is d1; the d2 click counts even though a later
        # view (d5) would disqualify it
        rows = [
            (1, _ts(1), "view"),
            (1, _ts(2), "click"),
            (1, _ts(5), "view"),
        ]
        out = {
            r.step: r.n_users
            for r in event_funnel(
                _events(spark, rows), ["view", "click"]
            ).collect()
        }
        assert out == {"view": 1, "click": 1}


class TestRetentionCohorts:
    def test_offsets_exact_weeks(self, spark):
        # 2024-01-01 is a Monday. u1 first seen wk0, active wk0 + wk2;
        # u2 first seen wk1, active wk1 only.
        rows = [
            (1, _ts(2), "view"),   # wk of Jan 1
            (1, _ts(16), "view"),  # wk of Jan 15 -> offset 2
            (2, _ts(9), "view"),   # wk of Jan 8
        ]
        out = {
            (r.cohort_week.date(), r.week_offset): r.n_users
            for r in retention_cohorts(_events(spark, rows)).collect()
        }
        assert out == {
            (dt.date(2024, 1, 1), 0): 1,
            (dt.date(2024, 1, 1), 2): 1,
            (dt.date(2024, 1, 8), 0): 1,
        }

    def test_counts_users_not_events(self, spark):
        # many events in one week still count the user once
        rows = [(1, _ts(1 + i % 5, h), "view") for i, h in enumerate(range(10))]
        out = retention_cohorts(_events(spark, rows)).collect()
        assert len(out) == 1 and out[0].n_users == 1


class TestIqrOutliers:
    def test_replays_numpy(self, spark):
        rng = np.random.default_rng(7)
        vals = np.concatenate([rng.normal(0, 1, 500), [40.0, -35.0, 60.0]])
        df = spark.createDataFrame(
            [("a", float(v)) for v in vals], "event_type string, value double"
        )
        row = iqr_outliers(df).collect()[0]
        q1, q3 = np.quantile(vals, 0.25), np.quantile(vals, 0.75)
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        n_out = int(((vals < lo) | (vals > hi)).sum())
        assert row.n_rows == len(vals)
        assert row.n_outliers == n_out >= 3
        assert abs(row.q1 - q1) < 1e-6 and abs(row.q3 - q3) < 1e-6
        assert abs(row.outlier_frac - n_out / len(vals)) < 1e-6

    def test_per_group_fences(self, spark):
        # group b's scale is 100x — a value normal for b must not be an
        # outlier there even though it would be for a
        rows = [("a", float(v)) for v in range(100)] + [
            ("b", float(v * 100)) for v in range(100)
        ]
        out = {r.event_type: r.n_outliers for r in iqr_outliers(
            spark.createDataFrame(rows, "event_type string, value double")
        ).collect()}
        assert out == {"a": 0, "b": 0}


class TestEquiDepthHistogram:
    def test_depth_roughly_equal_and_total(self, spark):
        from airflow_etl_finance_market_spark.operators.quality import (
            equi_depth_histogram,
        )

        df = spark.createDataFrame(
            [(float(i),) for i in range(1000)], "n_chars double"
        )
        rows = {r.bucket: r for r in equi_depth_histogram(df).collect()}
        assert sorted(rows) == list(range(1, 11))
        assert sum(r.n_rows for r in rows.values()) == 1000
        assert all(90 <= r.n_rows <= 110 for r in rows.values())
        # bucket ranges are contiguous and ordered
        for b in range(1, 10):
            assert rows[b].hi <= rows[b + 1].lo
