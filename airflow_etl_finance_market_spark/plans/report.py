"""Executive text report (SURVEY.md §2.1 S9).

The reference's exploratory notebook renders `relatorio_completo.txt`
(reference: analysis/análise_exploratória.ipynb → the `relatorio` cell and
its file-writing sibling): a header, a global summary, and three top-5
rankings — most volatile (stddev of daily change), best performance (mean
daily change), most traded (summed volume). The pandas version computes
three separate full-frame groupbys; here all three rankings come from ONE
``groupBy(ticker)`` multi-aggregate, so the whole report costs a single
shuffle on the instrument key plus one global aggregate.

Scale shape: `ticker_stats` is |tickers| rows after a map-side partial agg
— tiny at any data scale — and each ranking is a TakeOrderedAndProject over
it. Only the overview row and 3×k ranking rows ever reach the driver
(S8's ≤k-row extract discipline). The text rendering is pure driver-side
string work on those collected rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BAR = "═" * 83


def ticker_stats(
    fact: DataFrame,
    *,
    key: str = "ticker",
    change: str = "variacao_diaria",
    volume: str = "volume",
) -> DataFrame:
    """Per-instrument stats for every ranking in the report, one pass:
    volatility (stddev of daily change), mean daily change, total volume.
    """
    return fact.groupBy(F.col(key).alias("ticker")).agg(
        F.stddev_samp(change).alias("volatility"),
        F.avg(change).alias("mean_change"),
        F.sum(volume).cast("double").alias("total_volume"),
    )


def market_overview(
    fact: DataFrame,
    *,
    key: str = "ticker",
    ts: str = "data_id",
    close: str = "close",
    change: str = "variacao_diaria",
    volume: str = "volume",
) -> DataFrame:
    """One-row global summary: the notebook's "RESUMO GERAL" numbers.

    A single aggregate over a column-pruned scan; the two COUNT DISTINCTs
    plan as one Expand + hash aggregate, still a single pass over the data.
    """
    return fact.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct(key).alias("n_tickers"),
        F.countDistinct(ts).alias("n_days"),
        F.min(ts).alias("first_day"),
        F.max(ts).alias("last_day"),
        F.round(F.stddev_samp(change), 6).alias("market_volatility"),
        F.round(F.avg(change), 6).alias("mean_daily_change"),
        F.round(F.avg(volume), 2).alias("avg_volume"),
        F.round(F.avg(close), 2).alias("avg_close"),
    )


def _section(title: str, blurb: str) -> str:
    return f"\n{_BAR}\n{title}\n{_BAR}\n\n{blurb}\n"


def build_report(
    fact: DataFrame,
    *,
    k: int = 5,
    generated_at: str | None = None,
    change: str = "variacao_diaria",
    volume: str = "volume",
    close: str = "close",
    ts: str = "data_id",
) -> str:
    """Render the full text report from ≤(1 + 3k) collected rows.

    ``generated_at`` is caller-supplied (or omitted) so the output is a
    deterministic function of the data — the notebook's wall-clock
    timestamp line made its artifact unreproducible.
    """
    stats = ticker_stats(fact, change=change, volume=volume)
    stats.cache()
    try:
        ov = market_overview(
            fact, ts=ts, close=close, change=change, volume=volume
        ).collect()[0]
        top_vol = stats.orderBy(
            F.desc_nulls_last("volatility"), F.asc("ticker")
        ).limit(k).collect()
        top_perf = stats.orderBy(
            F.desc_nulls_last("mean_change"), F.asc("ticker")
        ).limit(k).collect()
        top_volume = stats.orderBy(
            F.desc_nulls_last("total_volume"), F.asc("ticker")
        ).limit(k).collect()
    finally:
        stats.unpersist()

    head = [
        "╔" + "═" * 80 + "╗",
        "║" + "RELATÓRIO EXECUTIVO".center(80) + "║",
        "║" + "ANÁLISE COMPLETA DE MERCADO FINANCEIRO".center(80) + "║",
        "╚" + "═" * 80 + "╝",
        "",
    ]
    if generated_at is not None:
        head.append(f"DATA DE GERAÇÃO: {generated_at}")
    head.append(f"PERÍODO ANALISADO: {ov['first_day']} até {ov['last_day']}")
    out = "\n".join(head)

    out += _section(
        "1. RESUMO GERAL DOS DADOS",
        "\n".join(
            [
                f"   • Total de registros analisados: {ov['total_rows']:,}",
                f"   • Número de ações diferentes: {ov['n_tickers']}",
                f"   • Dias de negociação: {ov['n_days']}",
                f"   • Volatilidade média do mercado: {ov['market_volatility']:.2f}%",
                f"   • Variação média diária geral: {ov['mean_daily_change']:.2f}%",
                f"   • Volume médio diário: {ov['avg_volume']:,.0f} ações",
                f"   • Preço médio de fechamento: R$ {ov['avg_close']:.2f}",
            ]
        ),
    )
    out += _section(
        f"2. TOP {k} AÇÕES MAIS VOLÁTEIS (MAIOR RISCO)",
        "\n".join(
            f"{i}. {r['ticker']}: {r['volatility']:.2f}% de volatilidade"
            for i, r in enumerate(top_vol, 1)
            if r["volatility"] is not None
        ),
    )
    out += _section(
        f"3. TOP {k} AÇÕES COM MELHOR PERFORMANCE (MAIOR RETORNO)",
        "\n".join(
            f"{i}. {r['ticker']}: {r['mean_change']:+.2f}% de variação média diária"
            for i, r in enumerate(top_perf, 1)
            if r["mean_change"] is not None
        ),
    )
    out += _section(
        f"4. TOP {k} AÇÕES MAIS NEGOCIADAS (MAIOR LIQUIDEZ)",
        "\n".join(
            f"{i}. {r['ticker']}: {r['total_volume']:,.0f} ações negociadas"
            for i, r in enumerate(top_volume, 1)
            if r["total_volume"] is not None
        ),
    )
    out += f"\n{_BAR}\nFIM DO RELATÓRIO\n{_BAR}\n"
    return out


def write_report(fact: DataFrame, path: str, **kwargs) -> str:
    """Write the rendered report to ``path`` (driver-local file, S9) and
    return the text."""
    text = build_report(fact, **kwargs)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(text)
    return text
