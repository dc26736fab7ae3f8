"""FK orphan audit (operators/quality.py) — SQL FOREIGN KEY semantics:
non-NULL orphan key tuples are counted, NULL keys never violate."""

from __future__ import annotations

from airflow_etl_finance_market_spark.operators.quality import fk_orphans


def test_clean_fk_passes(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b"), (1, "c")], "fk long, v string")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    row = fk_orphans(
        fact, dim, keys={"fk": "id"}, constraint="fk_test"
    ).collect()[0]
    assert (row["constraint_name"], row["orphan_rows"], row["passed"]) == (
        "fk_test", 0, True,
    )


def test_planted_orphans_counted(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (9, "x"), (9, "y"), (7, "z")], "fk long, v string"
    )
    dim = spark.createDataFrame([(1,), (2,)], "id long")
    row = fk_orphans(
        fact, dim, keys={"fk": "id"}, constraint="fk_test"
    ).collect()[0]
    assert row["orphan_rows"] == 3  # 9, 9, 7 — dup orphans each count
    assert row["passed"] is False


def test_null_keys_never_violate(spark):
    fact = spark.createDataFrame(
        [(None, "a"), (None, "b"), (2, "c")], "fk long, v string"
    )
    dim = spark.createDataFrame([(2,)], "id long")
    row = fk_orphans(
        fact, dim, keys={"fk": "id"}, constraint="fk_test"
    ).collect()[0]
    assert (row["orphan_rows"], row["passed"]) == (0, True)


def test_composite_key_partial_null_skipped(spark):
    """A composite FK with ANY NULL component is exempt (SQL MATCH SIMPLE)."""
    fact = spark.createDataFrame(
        [(1, 10), (1, None), (2, 20)], "a long, b long"
    )
    dim = spark.createDataFrame([(1, 10)], "x long, y long")
    row = fk_orphans(
        fact, dim, keys={"a": "x", "b": "y"}, constraint="fk_comp"
    ).collect()[0]
    assert row["orphan_rows"] == 1  # only (2, 20); (1, NULL) exempt
