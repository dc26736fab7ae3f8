"""SCD2 emulation: version chaining, no-op filtering, idempotency."""

from __future__ import annotations

import datetime as dt

from airflow_etl_finance_market_spark.operators.scd import scd2_apply


def _d(day):
    return dt.date(2024, 1, day)


def _by_key(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["k"], []).append(
            (r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
        )
    for v in out.values():
        v.sort(key=lambda t: t[1])
    return out


def test_scd2_full_lifecycle(spark):
    initial = spark.createDataFrame(
        [(1, "gold", _d(1)), (2, "silver", _d(1))], "k long, seg string, ts date"
    )
    hist = scd2_apply(None, initial, key="k", ts="ts", attrs=["seg"])

    updates = spark.createDataFrame(
        [
            (1, "platinum", _d(5)),   # real change -> closes gold
            (2, "silver", _d(6)),     # no-op -> dropped
            (3, "bronze", _d(7)),     # brand-new key
        ],
        "k long, seg string, ts date",
    )
    hist2 = scd2_apply(hist, updates, key="k", ts="ts", attrs=["seg"])
    got = _by_key(hist2)

    assert got[1] == [
        ("gold", _d(1), _d(5), False),
        ("platinum", _d(5), None, True),
    ]
    assert got[2] == [("silver", _d(1), None, True)]  # no-op left untouched
    assert got[3] == [("bronze", _d(7), None, True)]

    # idempotent: re-applying the same batch changes nothing
    hist3 = scd2_apply(hist2, updates, key="k", ts="ts", attrs=["seg"])
    assert _by_key(hist3) == got


def test_scd2_reverting_value_is_a_new_version(spark):
    """gold -> platinum -> gold must be THREE versions (A,B,A), not a dedup."""
    batches = [
        spark.createDataFrame([(1, s, _d(d))], "k long, seg string, ts date")
        for s, d in (("gold", 1), ("platinum", 5), ("gold", 9))
    ]
    hist = None
    for b in batches:
        hist = scd2_apply(hist, b, key="k", ts="ts", attrs=["seg"])
    got = _by_key(hist)[1]
    assert got == [
        ("gold", _d(1), _d(5), False),
        ("platinum", _d(5), _d(9), False),
        ("gold", _d(9), None, True),
    ]
