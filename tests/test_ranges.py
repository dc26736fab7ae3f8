"""Range join (operators/ranges.py): exact BETWEEN semantics vs a naive
nested-loop replay, bin-width invariance, and the guard rails."""

from __future__ import annotations

import random

import pytest

from airflow_etl_finance_market_spark.operators.ranges import range_join


def _naive(points, intervals, *, by, inclusive_hi=True):
    out = []
    for p in points:
        for iv in intervals:
            if by and p["by"] != iv["by"]:
                continue
            hi_ok = p["p"] <= iv["hi"] if inclusive_hi else p["p"] < iv["hi"]
            if p["p"] >= iv["lo"] and hi_ok:
                out.append((p["pid"], iv["iid"]))
    return sorted(out)


def _frames(spark, n_points=120, n_intervals=60, seed=7):
    rng = random.Random(seed)
    pts = [
        {"pid": i, "by": rng.randrange(5), "p": rng.randrange(0, 400)}
        for i in range(n_points)
    ]
    ivs = []
    for i in range(n_intervals):
        lo = rng.randrange(0, 380)
        ivs.append(
            {"iid": i, "by": rng.randrange(5), "lo": lo, "hi": lo + rng.randrange(0, 60)}
        )
    pdf = spark.createDataFrame(
        [(p["pid"], p["by"], p["p"]) for p in pts], "pid long, by long, p long"
    )
    idf = spark.createDataFrame(
        [(v["iid"], v["by"], v["lo"], v["hi"]) for v in ivs],
        "iid long, by long, lo long, hi long",
    )
    return pts, ivs, pdf, idf


@pytest.mark.parametrize("bin_size", [1, 16, 64, 1000])
def test_matches_nested_loop_any_bin_size(spark, bin_size):
    """Result is bin-size independent — binning is a physical rewrite."""
    pts, ivs, pdf, idf = _frames(spark)
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            pdf, idf, point_col="p", lo_col="lo", hi_col="hi",
            by="by", bin_size=bin_size,
        ).collect()
    )
    assert got == _naive(pts, ivs, by=True)


def test_no_by_key_and_exclusive_hi(spark):
    pts, ivs, pdf, idf = _frames(spark, n_points=40, n_intervals=20)
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            pdf.drop("by"), idf.drop("by"),
            point_col="p", lo_col="lo", hi_col="hi",
            bin_size=32, inclusive_hi=False,
        ).collect()
    )
    assert got == _naive(pts, ivs, by=False, inclusive_hi=False)


def test_rejects_column_collision_and_bad_bin(spark):
    _, _, pdf, idf = _frames(spark)
    with pytest.raises(ValueError, match="bin_size"):
        range_join(
            pdf, idf, point_col="p", lo_col="lo", hi_col="hi", bin_size=0
        )
    with pytest.raises(ValueError, match="collision"):
        range_join(
            pdf.withColumnRenamed("pid", "iid"), idf,
            point_col="p", lo_col="lo", hi_col="hi", by="by", bin_size=8,
        )


def test_exact_binning_negatives_and_beyond_2_53(spark):
    """The bin key is exact long floor-division: negative values quantize
    to the FLOOR bin (truncating div alone would shift them one bin up),
    and epoch-nano-scale values beyond 2^53 — where double division loses
    ulps — still bin identically for points and interval endpoints."""
    base = 1_152_921_504_606_846_980  # multiple of 10 near 2^60
    pts = [(-25, -25), (-1, -1), (0, 0), (1, base - 1), (2, base + 7)]
    ivs = [
        (10, -30, -20),       # negative interval containing -25
        (11, -5, 3),          # straddles zero, contains -1, 0
        (12, base - 9, base - 1),   # just below the huge boundary
        (13, base + 1, base + 9),   # just above it
    ]
    pdf = spark.createDataFrame(pts, "pid long, p long")
    idf = spark.createDataFrame(ivs, "iid long, lo long, hi long")
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            pdf, idf, point_col="p", lo_col="lo", hi_col="hi", bin_size=10
        ).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, p in pts
        for iid, lo, hi in ivs
        if lo <= p <= hi
    )
    assert got == want
