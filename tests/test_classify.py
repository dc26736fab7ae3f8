"""Unit tests for the aggregation-only Naive Bayes classifier and the
ORC interchange round-trip (oracle parity rides test_oracle_parity)."""

from __future__ import annotations

import math
import shutil
import tempfile

from pyspark.sql import Row

from airflow_etl_finance_market_spark.operators.classify import nb_label_classifier
from airflow_etl_finance_market_spark.sources.readers import read_orc, write_orc


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=l) for i, (t, l) in enumerate(rows)]
    )


def test_nb_separable_classes_classified_correctly(spark):
    """Two classes with disjoint vocabularies: resubstitution accuracy
    must be 100% — the class-conditional likelihoods dominate."""
    docs = _docs(
        spark,
        [
            ("apple banana apple", "fruit"),
            ("banana apple banana apple", "fruit"),
            ("bolt nut bolt", "tool"),
            ("nut bolt nut nut", "tool"),
        ],
    )
    out = {r.doc_id: r for r in nb_label_classifier(docs).collect()}
    assert len(out) == 4
    assert all(r.correct == 1 for r in out.values())
    assert out[0].predicted_lang == "fruit" and out[2].predicted_lang == "tool"


def test_nb_hand_computed_score(spark):
    """Pin the exact Laplace-smoothed log-posterior for one doc.

    Corpus: class a = "x x", class b = "y". Vocab V = 2.
    Doc 0 ("x x") under a: ln(1/2) + 2*ln((2+1)/(2+2));
    under b: ln(1/2) + 2*ln((0+1)/(1+2)).
    """
    docs = _docs(spark, [("x x", "a"), ("y", "b")])
    out = {r.doc_id: r for r in nb_label_classifier(docs).collect()}
    want_a = math.log(0.5) + 2 * math.log(3 / 4)
    assert out[0].predicted_lang == "a"
    assert abs(out[0].nb_score - round(want_a, 6)) < 1e-9
    # And the margin is the hand-computed one: b's score is lower.
    want_b = math.log(0.5) + 2 * math.log(1 / 3)
    assert want_b < want_a


def test_nb_tie_breaks_on_class_name_ascending(spark):
    """Perfectly symmetric classes score identically; the argmax must
    break ties deterministically on class name (cross-engine contract)."""
    docs = _docs(spark, [("same words here", "zz"), ("same words here", "aa")])
    out = nb_label_classifier(docs).collect()
    assert {r.predicted_lang for r in out} == {"aa"}


def test_nb_output_shape_and_self_consistency(spark, sf_dir):
    """On the fixture corpus: one row per doc, correct == (lang ==
    predicted_lang), scores are finite negatives."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = nb_label_classifier(docs).collect()
    assert len(out) == docs.count()
    for r in out:
        assert r.correct == int(r.lang == r.predicted_lang)
        assert r.nb_score < 0 and not math.isnan(r.nb_score)


def test_orc_roundtrip_preserves_rows_types_and_partition_column(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tmp = tempfile.mkdtemp(prefix="orc_rt_test_")
    try:
        write_orc(docs, f"{tmp}/docs", partition_by=("lang",))
        back = read_orc(spark, f"{tmp}/docs")
        assert back.count() == docs.count()
        # Partition column survives (string), payload types unchanged.
        got = dict(back.dtypes)
        want = dict(docs.dtypes)
        assert got == want
        # Values round-trip: anti-join both ways is empty.
        cols = docs.columns
        assert back.select(cols).exceptAll(docs.select(cols)).count() == 0
        assert docs.select(cols).exceptAll(back.select(cols)).count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_nb_excludes_zero_token_docs(spark):
    """Documented contract: a doc with no qualifying token has no
    likelihood under any class and is EXCLUDED (not given a prior-only
    guess) — route empties to a quality gate instead."""
    docs = _docs(spark, [("", "a"), ("hello world", "a"), ("ciao mondo", "b")])
    out = nb_label_classifier(docs).collect()
    assert {r.doc_id for r in out} == {1, 2}


def test_nb_null_label_scores_and_reads_incorrect(spark):
    """A NULL label participates as a scorable doc and reads correct=0
    (coalesced — Spark's NULL == x would otherwise diverge from the SQL
    oracle's CASE WHEN)."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="alpha beta alpha", lang="en"),
            Row(doc_id=1, text="gamma delta gamma", lang="fr"),
            Row(doc_id=2, text="alpha beta gamma", lang=None),
        ]
    )
    out = {r.doc_id: r for r in nb_label_classifier(docs).collect()}
    assert len(out) == 3
    assert out[2].lang is None
    assert out[2].predicted_lang in {"en", "fr"}
    assert out[2].correct == 0
