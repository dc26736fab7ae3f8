"""Date/time expression helpers (SURVEY.md §2.8 F1-F5).

All native Catalyst expressions — they stay inside WholeStageCodegen and cost
nothing at the Python boundary.

Semantic traps these encode (verified against PG/DuckDB, SURVEY.md App. A):

- ``EXTRACT(DOW)``: PG numbers Sunday=0..Saturday=6, Spark's ``dayofweek`` is
  Sunday=1..Saturday=7 → ``pg_dow`` subtracts 1.
- ``DATE_TRUNC('week')``: both engines truncate to Monday, but PG/DuckDB on a
  DATE returns a date while Spark always returns a timestamp → ``week_start``
  casts back to date (mirrors the reference's ``::date``,
  reference: README.md:67).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pg_dow(col: Column | str) -> Column:
    """Day-of-week with PG numbering: 0=Sunday .. 6=Saturday.

    Reference uses EXTRACT(DOW) for dim_tempo.dia_da_semana
    (reference: dags/financial_pipeline.py:160).
    """
    return (F.dayofweek(col) - F.lit(1)).cast("int")


def week_start(col: Column | str) -> Column:
    """Monday-truncated week bucket as a DATE (F1+F5).

    Reference: ``DATE_TRUNC('week', data_id)``
    (reference: dags/financial_pipeline.py:205; ::date cast README.md:67).
    """
    return F.date_trunc("week", col).cast("date")
