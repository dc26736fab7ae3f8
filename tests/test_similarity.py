"""Recall tests for the ANN scale path vs the exact brute-force kernel."""

from __future__ import annotations

from airflow_etl_finance_market_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from airflow_etl_finance_market_spark.sources.readers import load_fixture

QUERIES = [0, 1, 2, 3, 4]


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    emb = load_fixture(spark, sf_dir, "embeddings")
    exact = cosine_topk_bruteforce(emb, QUERIES, k=5).collect()
    approx = cosine_topk_lsh(emb, QUERIES, k=5, multiprobe=True).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # multiprobe hyperplane LSH on random data: expect moderate recall,
    # and the harness would flag a silent regression to ~0
    assert recall >= 0.3, f"LSH recall collapsed: {recall:.2f}"
    # scores must be true cosines: every overlapping pair agrees exactly
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["cosine_sim"] - exact_scores[key]) < 1e-9


def test_bruteforce_excludes_self_and_ranks(spark, sf_dir):
    emb = load_fixture(spark, sf_dir, "embeddings")
    rows = cosine_topk_bruteforce(emb, QUERIES, k=5).collect()
    per_q = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        sims = [x["cosine_sim"] for x in sorted(rs, key=lambda x: x["rank"])]
        assert sims == sorted(sims, reverse=True)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from airflow_etl_finance_market_spark.operators.similarity import cosine_topk_ivf

    emb = load_fixture(spark, sf_dir, "embeddings")
    exact = cosine_topk_bruteforce(emb, QUERIES, k=5).collect()
    approx = cosine_topk_ivf(emb, QUERIES, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, f"IVF recall collapsed: {recall:.2f}"
    # scores are true cosines: overlapping pairs agree exactly
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["cosine_sim"] - exact_scores[key]) < 1e-9
