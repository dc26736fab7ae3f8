"""Differential tests: every registered harness query vs its DuckDB oracle.

This is the local twin of the driver's correctness gate — it parametrizes
over the registry so new queries are covered the moment they register.
Queries without an oracle (non-SQL-expressible ops) get a rows-only check,
same as the driver.
"""

from __future__ import annotations

import pytest

from airflow_etl_finance_market_spark import harness
from tests.conftest import assert_query_matches_oracle

ALL = sorted(harness.queries())
WITH_ORACLE = sorted(harness.oracles())
ROWS_ONLY = sorted(set(ALL) - set(WITH_ORACLE))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_matches_oracle(spark, oracle, sf_dir, name):
    fn = harness.queries()[name]
    sql = harness.oracles()[name]
    assert_query_matches_oracle(spark, oracle, fn, sql, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, sf_dir, name):
    fn = harness.queries()[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert df.schema is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
