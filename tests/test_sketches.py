"""Two-pass heavy hitters: exactness vs brute force, the averaging-
argument guarantee under adversarial partitioning, and bounded memory."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from airflow_etl_finance_market_spark.operators.sketches import (
    _mg_candidates_stage,
    heavy_hitters,
)


def test_heavy_hitters_equals_exact_topk(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = heavy_hitters(docs, k=20, capacity=4096).collect()
    exact = (
        docs.select(
            F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("term")
        )
        .filter(F.length("term") >= 1)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
        .collect()
    )
    assert [(r.term, r.n) for r in got] == [(r.term, r.n) for r in exact]


def test_mg_guarantee_survives_adversarial_stream(spark):
    """Averaging argument, pinned: with capacity c, any term with global
    count > N/c MUST survive pass 1 — even when a flood of distinct
    noise terms forces constant decrements. The heavy term here is ~N/8
    with capacity 16, and noise terms are all distinct singletons."""
    rows = []
    for i in range(2000):
        rows.append(Row(doc_id=i, text=f"noise{i} " + ("heavy" if i % 7 == 0 else f"junk{i}")))
    docs = spark.createDataFrame(rows).repartition(4)
    got = heavy_hitters(docs, k=1, capacity=16).collect()
    assert got[0].term == "heavy"
    assert got[0].n == len([i for i in range(2000) if i % 7 == 0])


def test_mg_kernel_is_bounded_and_superset(spark):
    """The pass-1 kernel never holds more than `capacity` terms and its
    candidate union is a superset of every term with count > N/capacity
    (checked directly in Python against a skewed stream)."""
    import pandas as pd

    stream = (["alpha"] * 300) + [f"x{i}" for i in range(900)] + (["beta"] * 200)
    stage = _mg_candidates_stage(capacity=8)
    out = list(stage(iter([pd.DataFrame({"term": stream})])))
    cands = set(out[0]["term"])
    assert len(cands) <= 8
    n = len(stream)
    for term, cnt in (("alpha", 300), ("beta", 200)):
        if cnt > n / 8:
            assert term in cands


def test_mg_kernel_merges_across_batches(spark):
    """The vectorized kernel merges per-batch exact counts as MG
    summaries (Agarwal et al. mergeable-summaries trim): a heavy term
    split across MANY batches, each flooded with distinct noise, must
    survive whenever its count clears n/(capacity+1)."""
    import pandas as pd

    batches = []
    noise_id = 0
    for b in range(10):
        terms = ["alpha"] * 40  # 400 total across batches
        for _ in range(100):  # 1000 distinct singletons total
            terms.append(f"noise{noise_id}")
            noise_id += 1
        batches.append(pd.DataFrame({"term": terms}))
    stage = _mg_candidates_stage(capacity=8)
    out = list(stage(iter(batches)))
    cands = set(out[0]["term"])
    assert len(cands) <= 8
    n = 400 + 1000
    assert 400 > n / 9  # the guarantee premise
    assert "alpha" in cands


def test_heavy_hitters_tie_break_deterministic(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="bb aa"), Row(doc_id=1, text="aa bb cc")]
    )
    got = heavy_hitters(docs, k=2, capacity=64).collect()
    assert [(r.term, r.n) for r in got] == [("aa", 2), ("bb", 2)]


# --- mergeable-histogram quantile rollup (same stored-sketch family) ---

from airflow_etl_finance_market_spark.plans.analytics import (  # noqa: E402
    histogram_rollup_quantiles,
    value_histogram_daily_sketches,
)


def test_quantile_rollup_within_one_bin_of_exact(spark, sf_dir):
    """The documented error bound: each weekly estimate sits within one
    bin width BELOW the exact percentile-disc value (lower-edge read)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = value_histogram_daily_sketches(ev)
    est = {r.week: r for r in histogram_rollup_quantiles(daily).collect()}
    exact = {
        r.week: r
        for r in ev.groupBy(
            F.date_trunc("week", F.col("ts").cast("date"))
            .cast("date")
            .alias("week")
        )
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert est.keys() == exact.keys()
    for wk, e in est.items():
        x = exact[wk]
        assert e.n_values == x.n
        for est_v, exact_v in ((e.p50_est, x.p50), (e.p95_est, x.p95)):
            assert est_v <= exact_v < est_v + 4.0, (wk, est_v, exact_v)


def test_daily_histograms_merge_associatively(spark, sf_dir):
    """Bin counts pre-aggregate: daily->weekly merge equals binning the
    raw week directly (the property exact quantiles lack)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = value_histogram_daily_sketches(ev)
    via_daily = (
        daily.groupBy(
            F.date_trunc("week", "d").cast("date").alias("week"), "b"
        )
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    direct = (
        ev.select(
            F.date_trunc("week", F.col("ts").cast("date"))
            .cast("date")
            .alias("week"),
            F.least(
                F.lit(255),
                F.greatest(F.lit(0), F.floor(F.col("value") / 4.0).cast("int")),
            ).alias("b"),
        )
        .groupBy("week", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    key = lambda r: (r.week, r.b, r.c)  # noqa: E731
    assert sorted(map(key, via_daily)) == sorted(map(key, direct))


def test_histogram_clamps_out_of_range_values(spark):
    docs = spark.createDataFrame(
        [
            Row(ts=__import__("datetime").datetime(2024, 1, 1 + i), value=v)
            for i, v in enumerate([-5.0, 0.0, 3.99, 4.0, 5000.0])
        ]
    )
    rows = {
        (r.d.isoformat(), r.b): r.c
        for r in value_histogram_daily_sketches(docs).collect()
    }
    assert rows[("2024-01-01", 0)] == 1  # negative clamps to bin 0
    assert rows[("2024-01-02", 0)] == 1
    assert rows[("2024-01-03", 0)] == 1  # 3.99 -> bin 0
    assert rows[("2024-01-04", 1)] == 1  # 4.0 -> bin 1
    assert rows[("2024-01-05", 255)] == 1  # overflow clamps to last bin


def test_histogram_excludes_null_values(spark):
    """NULL values carry no order statistic: they must not land in bin 0
    (Spark greatest() skips NULLs) nor inflate the rollup's rank
    denominator — the r07-advice contract, pinned."""
    import datetime

    docs = spark.createDataFrame(
        [
            Row(ts=datetime.datetime(2024, 1, 1), value=1.0),
            Row(ts=datetime.datetime(2024, 1, 1), value=None),
            Row(ts=datetime.datetime(2024, 1, 2), value=None),
        ]
    )
    daily = value_histogram_daily_sketches(docs).collect()
    assert {(r.d.isoformat(), r.b, r.c) for r in daily} == {
        ("2024-01-01", 0, 1)
    }
    roll = histogram_rollup_quantiles(
        value_histogram_daily_sketches(docs)
    ).collect()
    assert len(roll) == 1 and roll[0].n_values == 1
