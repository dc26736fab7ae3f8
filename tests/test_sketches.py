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


def test_heavy_hitters_tie_break_deterministic(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="bb aa"), Row(doc_id=1, text="aa bb cc")]
    )
    got = heavy_hitters(docs, k=2, capacity=64).collect()
    assert [(r.term, r.n) for r in got] == [("aa", 2), ("bb", 2)]
