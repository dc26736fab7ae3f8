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


# --- KMV bottom-k theta sketch (third stored-sketch family member) ---

from airflow_etl_finance_market_spark.plans.analytics import (  # noqa: E402
    kmv_daily_user_sketches,
    kmv_rollup_estimates,
)


def test_kmv_estimates_within_theory_bounds(spark, sf_dir):
    """KMV relative error is ~1/sqrt(k-2) (~13% at k=64): weekly
    distinct-user estimates must land within 4 standard errors of the
    exact counts, and the sub-k weeks must be EXACT (the sketch IS the
    distinct hash set below k)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = kmv_daily_user_sketches(ev, k=64)
    est = {r.week: r for r in kmv_rollup_estimates(daily, k=64).collect()}
    exact = {
        r.week: r.u
        for r in ev.groupBy(
            F.date_trunc("week", F.col("ts").cast("date"))
            .cast("date")
            .alias("week")
        )
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for wk, r in est.items():
        u = exact[wk]
        if r.kmv_size < 64:
            assert r.est_users == float(u), (wk, r.est_users, u)
        else:
            assert abs(r.est_users - u) / u < 4 / (62 ** 0.5), (
                wk, r.est_users, u,
            )


def test_kmv_daily_sketches_merge_to_direct_weekly(spark, sf_dir):
    """Mergeability: the weekly bottom-k read off merged DAILY sketches
    equals the bottom-k computed from the raw week directly — the
    property that lets rollups never rescan events. (Bottom-k is
    merge-closed: the k smallest of a union are always among the
    per-part k smallest.)"""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")

    def bottom_k(df, key):
        w = Window.partitionBy(key).orderBy("h")
        return (
            df.distinct()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 64)
            .groupBy(key)
            .agg(F.sort_array(F.collect_list("h")).alias("kmv"))
        )

    direct = bottom_k(
        ev.select(
            F.date_trunc("week", F.col("ts").cast("date"))
            .cast("date")
            .alias("week"),
            h.alias("h"),
        ),
        "week",
    )
    merged = bottom_k(
        kmv_daily_user_sketches(ev, k=64).select(
            F.date_trunc("week", "d").cast("date").alias("week"),
            F.explode("kmv").alias("h"),
        ),
        "week",
    )
    d = {r.week: r.kmv for r in direct.collect()}
    m = {r.week: r.kmv for r in merged.collect()}
    assert d == m


def test_kmv_intersection_estimate_tracks_exact_overlap(spark, sf_dir):
    """The set operation HLL can't answer: adjacent-week common-user
    estimates must track the exact |A ∩ B| within the combined-sketch
    error envelope (events fixture: weekly audiences overlap heavily,
    so J ~ 1 and the estimate should sit near the exact overlap)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    est_rows = sorted(
        kmv_rollup_estimates(
            kmv_daily_user_sketches(ev, k=64), k=64
        ).collect(),
        key=lambda r: r.week,
    )
    weeks = [r.week for r in est_rows]
    users = {
        wk: {
            r.user_id
            for r in ev.filter(
                F.date_trunc("week", F.col("ts").cast("date")).cast("date")
                == F.lit(wk)
            )
            .select("user_id")
            .distinct()
            .collect()
        }
        for wk in weeks
    }
    assert est_rows[0].prev_jaccard_est is None
    for prev_wk, r in zip(weeks, est_rows[1:]):
        exact_common = len(users[prev_wk] & users[r.week])
        assert r.prev_common_users_est is not None
        assert abs(r.prev_common_users_est - exact_common) / max(
            exact_common, 1
        ) < 0.5, (r.week, r.prev_common_users_est, exact_common)


def test_kmv_disjoint_sets_estimate_zero_overlap(spark):
    """Planted disjoint weeks: Jaccard and common-user estimates must be
    ~0 when audiences don't overlap at all."""
    import datetime

    rows = []
    for i in range(500):
        rows.append(
            Row(ts=datetime.datetime(2024, 1, 1, 9, 0, 0), user_id=i)
        )
        rows.append(
            Row(ts=datetime.datetime(2024, 1, 8, 9, 0, 0), user_id=10_000 + i)
        )
    ev = spark.createDataFrame(rows)
    out = sorted(
        kmv_rollup_estimates(
            kmv_daily_user_sketches(ev, k=64), k=64
        ).collect(),
        key=lambda r: r.week,
    )
    assert out[1].prev_jaccard_est == 0.0
    assert out[1].prev_common_users_est == 0.0


# --- composed-pipeline hash-seed independence (corpus_prep_pipeline) ---


def test_same_seed_composition_correlates_rebalance_and_split(spark):
    """The hazard corpus_prep_pipeline's distinct-seed contract guards
    against, pinned live: chaining rebalance and split on the SAME
    salted hash makes split membership a function of rebalance survival
    — with a keep threshold t < 80% of the bucket space, EVERY survivor
    lands in 'train' (b10000 < t <= 8000 implies b100 = b10000 mod 100
    only when t <= 100; the fully-degenerate case) while distinct seeds
    keep the stages independent."""
    from pyspark.sql import Row

    from airflow_etl_finance_market_spark.operators.sampling import (
        assign_split,
        hash_bucket,
    )

    df = spark.createDataFrame([Row(doc_id=i) for i in range(5000)])
    # a rebalance-style gate keeping bucket < 60 of 10000 — same seed
    survivors_same = df.filter(
        hash_bucket(F.col("doc_id").cast("string"), seed="seed42", buckets=10000)
        < 60
    )
    same = assign_split(survivors_same, "doc_id", seed="seed42")
    got_same = {r.split for r in same.select("split").distinct().collect()}
    assert got_same == {"train"}  # fully degenerate: t=60 <= 80
    # distinct seeds: the same gate, independent split assignment
    survivors_indep = df.filter(
        hash_bucket(
            F.col("doc_id").cast("string"), seed="rebalance42", buckets=10000
        )
        < 60
    )
    indep = assign_split(survivors_indep, "doc_id", seed="split42")
    got_indep = {r.split for r in indep.select("split").distinct().collect()}
    assert "train" in got_indep and len(got_indep) >= 2
