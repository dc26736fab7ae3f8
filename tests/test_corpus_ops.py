"""Unit tests for the sampling / term-stats / centroid / grouped-top-k
operators, independent of the DuckDB oracle: property checks against
plain-Python recomputation on the small fixture."""

from __future__ import annotations

import collections
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from airflow_etl_finance_market_spark.operators.corpus import term_frequencies
from airflow_etl_finance_market_spark.operators.sampling import (
    assign_split,
    hash_bucket,
    split_summary,
)
from airflow_etl_finance_market_spark.operators.similarity import group_centroids
from airflow_etl_finance_market_spark.operators.topk import top_k_per_group
from airflow_etl_finance_market_spark.sources.readers import load_fixture


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_fixture(spark, sf_dir, "documents").cache()


class TestAssignSplit:
    def test_deterministic_and_total(self, docs):
        a = assign_split(docs, "doc_id").select("doc_id", "split")
        b = assign_split(docs, "doc_id").select("doc_id", "split")
        rows_a = {r.doc_id: r.split for r in a.collect()}
        rows_b = {r.doc_id: r.split for r in b.collect()}
        assert rows_a == rows_b
        assert set(rows_a.values()) <= {"train", "valid", "test"}
        assert len(rows_a) == docs.count()

    def test_roughly_80_10_10(self, docs):
        counts = {
            r.split: r.n_rows
            for r in split_summary(assign_split(docs, "doc_id")).collect()
        }
        n = sum(counts.values())
        assert counts["train"] / n == pytest.approx(0.80, abs=0.08)
        assert counts.get("valid", 0) / n == pytest.approx(0.10, abs=0.06)

    def test_seed_changes_assignment(self, docs):
        a = {r.doc_id: r.split for r in assign_split(docs, "doc_id").collect()}
        b = {
            r.doc_id: r.split
            for r in assign_split(docs, "doc_id", seed="other").collect()
        }
        assert a != b  # some doc moved buckets under a different salt

    def test_bucket_matches_python_md5(self, spark):
        import hashlib

        df = spark.range(50).select(
            F.col("id"), hash_bucket("id").alias("b")
        )
        for r in df.collect():
            expect = int(hashlib.md5(f"seed42:{r.id}".encode()).hexdigest()[:8], 16) % 100
            assert r.b == expect


class TestTermFrequencies:
    def test_matches_python_counter(self, docs):
        got = {
            r.term: (r.tf, r.df) for r in term_frequencies(docs).collect()
        }
        tf: collections.Counter = collections.Counter()
        df: collections.Counter = collections.Counter()
        for r in docs.select("doc_id", "text").collect():
            toks = re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")
            toks = [t for t in toks if t]
            tf.update(toks)
            df.update(set(toks))
        assert got == {t: (tf[t], df[t]) for t in tf}


class TestGroupCentroids:
    def test_matches_numpy_mean(self, spark, sf_dir):
        emb = load_fixture(spark, sf_dir, "embeddings")
        got = {
            r.label: (np.array(r.centroid), r.n_vectors)
            for r in group_centroids(emb).collect()
        }
        rows = emb.select("label", "embedding").collect()
        by_label: dict[int, list] = collections.defaultdict(list)
        for r in rows:
            by_label[r.label].append(np.array(r.embedding, dtype=np.float64))
        assert set(got) == set(by_label)
        for label, vecs in by_label.items():
            centroid, n = got[label]
            assert n == len(vecs)
            assert centroid.shape == vecs[0].shape
            np.testing.assert_allclose(centroid, np.mean(vecs, axis=0), rtol=1e-9)


class TestTopKPerGroup:
    def test_k_rows_per_group_with_tiebreak(self, spark):
        df = spark.createDataFrame(
            [("a", 3), ("a", 1), ("a", 2), ("a", 2), ("b", 9)],
            ["g", "v"],
        )
        out = top_k_per_group(df, ["g"], [F.desc("v"), F.asc("g")], 2)
        rows = sorted((r.g, r.v) for r in out.collect())
        assert rows == [("a", 2), ("a", 3), ("b", 9)]
