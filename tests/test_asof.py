"""Edge semantics of the as-of join operator (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from airflow_etl_finance_market_spark.operators.asof import asof_join


def _d(day):
    return dt.date(2024, 1, day)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _d(5), "t5"), (1, _d(10), "t10"), (2, _d(3), "t3")],
        "k long, ts date, tag string",
    )
    right = spark.createDataFrame(
        # k=1: quotes on day 5 (tie with left) and day 8; k=2 has none
        # before day 3. The day-8 quote carries a NULL px (struct-carry
        # regression case: it must NOT inherit day-5's px).
        [(1, _d(5), 100.0, "a"), (1, _d(8), None, "b"), (3, _d(1), 7.0, "c")],
        "k long, ts date, px double, src string",
    )
    return left, right


def test_inclusive_matches_same_instant(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: (r["q_ts"], r["q_px"], r["q_src"])
        for r in asof_join(
            left, right, by="k", ts="ts",
            right_vals={"ts": "q_ts", "px": "q_px", "src": "q_src"},
        ).collect()
    }
    assert out["t5"] == (_d(5), 100.0, "a")  # tie matched (>= semantics)
    # latest right row wins even when its value is NULL — all attached
    # columns must come from that one row, not be stitched across rows
    assert out["t10"] == (_d(8), None, "b")
    assert out["t3"] == (None, None, None)  # no prior right row → NULLs


def test_tiebreak_picks_deterministic_right_row(spark):
    """Duplicate (by, right_ts) rows: the greatest tiebreak value must win,
    independent of input order / partitioning."""
    left = spark.createDataFrame(
        [(1, _d(6), "t6")], "k long, ts date, tag string"
    )
    dup_rows = [
        (1, _d(5), 10.0, 1),
        (1, _d(5), 30.0, 3),
        (1, _d(5), 20.0, 2),
    ]
    for rows in (dup_rows, list(reversed(dup_rows))):
        right = spark.createDataFrame(
            rows, "k long, ts date, px double, seq long"
        ).repartition(4)
        out = asof_join(
            left, right, by="k", ts="ts",
            right_vals={"px": "q_px", "seq": "q_seq"},
            tiebreak="seq",
        ).collect()
        assert [(r["q_px"], r["q_seq"]) for r in out] == [(30.0, 3)]


def test_exclusive_skips_same_instant(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: r["q_ts"]
        for r in asof_join(
            left, right, by="k", ts="ts", inclusive=False,
            right_vals={"ts": "q_ts"},
        ).collect()
    }
    assert out["t5"] is None  # the day-5 tie is excluded under strict <
    assert out["t10"] == _d(8)


def test_no_tiebreak_duplicates_resolve_by_payload(spark):
    """Without an explicit tiebreak, duplicate (by, right_ts) right rows
    must resolve deterministically: greatest payload struct wins, under
    any partitioning."""
    from airflow_etl_finance_market_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("A", 10)], "k string, ts int"
    )
    right = spark.createDataFrame(
        [("A", 5, 1.0), ("A", 5, 9.0), ("A", 5, 4.0)],
        "k string, ts int, px double",
    )
    outs = set()
    for parts in (1, 3, 7):
        out = asof_join(
            left,
            right.repartition(parts),
            by="k",
            ts="ts",
            right_vals={"px": "asof_px"},
        ).collect()
        outs.add(out[0]["asof_px"])
    assert outs == {9.0}


class TestResampleDailyFfill:
    def test_gaps_filled_per_key_span(self, spark):
        from airflow_etl_finance_market_spark.operators.asof import (
            resample_daily_ffill,
        )

        rows = [
            # user 1: days 1, 4 observed -> 2,3 carry day-1's avg
            (1, "2024-01-01 10:00:00", 10.0),
            (1, "2024-01-01 12:00:00", 20.0),  # day avg 15.0
            (1, "2024-01-04 09:00:00", 40.0),
            # user 2: single day -> single spine row, no fills
            (2, "2024-02-10 00:00:00", 7.0),
        ]
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            rows, "user_id long, ts_s string, value double"
        ).select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        )
        got = {
            (r.user_id, str(r.d)): (r.value_filled, r.is_observed)
            for r in resample_daily_ffill(df).collect()
        }
        assert got == {
            (1, "2024-01-01"): (15.0, True),
            (1, "2024-01-02"): (15.0, False),
            (1, "2024-01-03"): (15.0, False),
            (1, "2024-01-04"): (40.0, True),
            (2, "2024-02-10"): (7.0, True),
        }
        # per-key span: user 2 contributes exactly one row, not Jan-Feb
        assert len(got) == 5
