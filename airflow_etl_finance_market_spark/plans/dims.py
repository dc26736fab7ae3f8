"""Dimension derivations (SURVEY.md §2: A8, F2-F4, F8, F9, S6).

The reference derives both dimensions from staging with SELECT DISTINCT +
ON CONFLICT DO NOTHING (reference: dags/financial_pipeline.py:148-161).
Here each dim is a distinct-project (physically a hash aggregate with
map-side partials — the cheapest distributed dedup) and the conflict-free
append lives in sources.sinks.append_if_absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.datetime import pg_dow


def build_dim_instrumento(df: DataFrame, symbol_col: str = "symbol") -> DataFrame:
    """ticker + synthetic name/type (reference: dags/financial_pipeline.py:148-150).

    'Ativo ' || symbol (F8 concat) and the 'Acao' literal (F9) are applied
    AFTER the distinct so the hash-agg deduplicates narrow keys only.
    """
    return (
        df.select(F.col(symbol_col).alias("ticker"))
        .distinct()
        .select(
            "ticker",
            F.concat(F.lit("Ativo "), F.col("ticker")).alias("nome_ativo"),
            F.lit("Acao").alias("tipo_ativo"),
        )
    )


def build_dim_tempo(df: DataFrame, date_col: str = "date") -> DataFrame:
    """Calendar dimension (reference: dags/financial_pipeline.py:159-161).

    dia_da_semana keeps PG DOW numbering (0=Sunday) via pg_dow — the
    off-by-one trap in SURVEY.md §2.8-F4.
    """
    return (
        df.select(F.col(date_col).cast("date").alias("data_id"))
        .distinct()
        .select(
            "data_id",
            F.year("data_id").cast("int").alias("ano"),
            F.month("data_id").cast("int").alias("mes"),
            pg_dow("data_id").alias("dia_da_semana"),
        )
    )
