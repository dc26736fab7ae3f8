"""The reference's 9-task Airflow chain as ONE Spark driver program.

Reference chain (reference: dags/financial_pipeline.py:227):

    setup_staging → locate_csv → load_staging → quality_checks →
    create_dims → load_fact → volatility_view → report → log

Here the nine Postgres round-trips collapse into one SparkSession program
(SURVEY.md §3 entry point 1): stage boundaries become shuffle boundaries, the
only process boundary left is driver↔executors, and XCom scalars become plain
return values. Each stage writes Parquet with overwrite semantics, so a rerun
is idempotent exactly like the reference's TRUNCATE-reload (C5).

Orchestration note: this function IS the Airflow task body — a production
deployment wraps `run_pipeline` in a single SparkSubmitOperator (retries at
the orchestrator level, C2), rather than one task per stage; Spark's own DAG
scheduler parallelizes within.

Scale design (100 TB posture):
- the fact table is written partitioned by `ano`/`data_id` (year, day) →
  static/dynamic partition pruning for BI consumers, and the incremental
  daily run (`incremental_date=`) overwrites ONLY the touched day + week
  partitions under dynamic partitionOverwriteMode;
- the fact DataFrame is cached between its three consumers (fact write,
  weekly aggregate, report) so the window computation runs once;
- dims use the anti-join append sink (ON CONFLICT DO NOTHING, S6) — the
  incoming distinct keys are the broadcast side;
- nothing `.collect()`s except the one-row gate and the ≤k-row report.
"""

from __future__ import annotations

import datetime as dt
import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality import expect_passed, quality_summary
from ..sources.readers import read_ohlcv_csv
from ..sources.sinks import append_if_absent, overwrite_parquet, overwrite_partitions
from .dims import build_dim_instrumento, build_dim_tempo
from .volatility import daily_pct_change, top_avg_volatility, weekly_volatility

log = logging.getLogger(__name__)


@dataclass
class PipelineResult:
    """What the reference pushed through XCom, as plain values (C3)."""

    staged_rows: int
    fact_rows: int
    weekly_rows: int
    report_message: str


@dataclass
class ActivityRollupResult:
    """Row counts + the deterministic summary of ``run_activity_rollup``."""

    daily_panel_rows: int
    weekly_panel_rows: int
    weekly_user_rows: int
    users_alltime_est: int
    summary_text: str


def run_activity_rollup(
    spark: SparkSession,
    events: DataFrame,
    warehouse_dir: str,
    *,
    summary_path: str | None = None,
) -> ActivityRollupResult:
    """The event-side daily run composed from the oracle-green operators
    (r05 verdict #7): what a consumer of the reference's star actually
    reads — a GAP-FREE panel and distinct-user counts — wired E2E
    instead of existing only as registry entries.

    Four written tables, all overwrite-idempotent like the main chain:

    - ``activity_panel_daily``: resample_daily_ffill over events — one
      row per (user, day) of the user's own span, gap days carrying the
      last observed daily average;
    - ``activity_panel_weekly``: the daily panel rolled to Monday weeks
      (end-of-week carried value via max_by(value_filled, d), observed-
      day counts) — the gap-free WEEKLY panel; derived from the STORED
      daily panel, so the window fill never recomputes;
    - ``user_sketches_daily``: one DataSketches HLL binary per day (the
      mergeable intermediate, hll_daily_user_sketches);
    - ``user_counts_weekly``: weekly distinct-user estimates obtained by
      MERGING the STORED daily sketches (hll_rollup_estimate) — the
      100 TB point of the pattern: coarser rollups never rescan events.

    The returned ``summary_text`` (optionally written to
    ``summary_path``) is a pure function of the data — byte-stable
    across re-runs, like the executive report (S9 discipline).
    """
    from ..functions.datetime import week_start
    from ..operators.asof import resample_daily_ffill
    from .analytics import hll_daily_user_sketches, hll_rollup_estimate

    panel_path = f"{warehouse_dir}/activity_panel_daily"
    weekly_panel_path = f"{warehouse_dir}/activity_panel_weekly"
    sketch_path = f"{warehouse_dir}/user_sketches_daily"
    weekly_users_path = f"{warehouse_dir}/user_counts_weekly"

    panel = resample_daily_ffill(
        events, key="user_id", ts="ts", value="value"
    )
    overwrite_parquet(panel, panel_path)
    panel = spark.read.parquet(panel_path)  # stored panel feeds the rollup
    weekly_panel = (
        panel.groupBy("user_id", week_start("d").alias("week"))
        .agg(
            F.max_by("value_filled", "d").alias("eow_value"),
            F.sum(F.col("is_observed").cast("int")).alias("n_observed"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    overwrite_parquet(weekly_panel, weekly_panel_path)

    sketches = hll_daily_user_sketches(events)
    overwrite_parquet(sketches, sketch_path)
    stored = spark.read.parquet(sketch_path)  # rollup merges STORED sketches
    weekly_users = hll_rollup_estimate(
        stored.withColumn("week", week_start("d")), group_cols=("week",)
    )
    overwrite_parquet(weekly_users, weekly_users_path)

    daily_rows = spark.read.parquet(panel_path).count()
    weekly_rows = spark.read.parquet(weekly_panel_path).count()
    user_rows = spark.read.parquet(weekly_users_path).count()
    alltime = int(hll_rollup_estimate(stored).first()["users_est"])
    summary = "\n".join(
        [
            "ACTIVITY ROLLUP",
            f"daily panel rows: {daily_rows}",
            f"weekly panel rows: {weekly_rows}",
            f"weekly user-count rows: {user_rows}",
            f"all-time distinct users (sketch-merged): {alltime}",
            "",
        ]
    )
    if summary_path:
        with open(summary_path, "w", encoding="utf-8") as fh:
            fh.write(summary)
    log.info("activity rollup ok: %s/%s/%s rows", daily_rows, weekly_rows,
             user_rows)
    return ActivityRollupResult(
        daily_panel_rows=daily_rows,
        weekly_panel_rows=weekly_rows,
        weekly_user_rows=user_rows,
        users_alltime_est=alltime,
        summary_text=summary,
    )


def build_fact(staging: DataFrame) -> DataFrame:
    """staging → fact_movimentacao_diaria (P1, W1, W2, F7 + surrogate id).

    Projection/rename mirrors the INSERT..SELECT
    (reference: dags/financial_pipeline.py:184-194); the id is
    monotonically_increasing_id — non-contiguous, but nothing downstream
    consumes it (SURVEY.md §1.2) and it avoids the total-order shuffle a
    row_number surrogate would force.
    """
    changes = daily_pct_change(
        staging, key="symbol", ts="date", value="close"
    )
    return changes.select(
        F.monotonically_increasing_id().alias("id"),
        F.col("symbol").alias("ticker"),
        F.col("date").alias("data_id"),
        "open",
        "high",
        "low",
        "close",
        "volume",
        "variacao_diaria",
    )


def _incremental_fact(
    spark: SparkSession,
    staging: DataFrame,
    fact_path: str,
    day: dt.date,
    lookback_days: int,
) -> DataFrame:
    """One day's fact rows with variacao_diaria seeded from the EXISTING
    fact table instead of a full-history LAG window.

    The previous close per ticker comes from a partition-pruned scan of at
    most ``lookback_days`` day-partitions (max_by(close, data_id) — one
    small hash aggregate, |tickers| rows, broadcast into the day's join).
    Matches the full-reload LAG exactly whenever each ticker's previous
    trading day is within the lookback; a longer gap yields NULL, the same
    as a series' first-ever row.
    """
    lo = day - dt.timedelta(days=lookback_days)
    prev = (
        spark.read.parquet(fact_path)
        .filter((F.col("data_id") >= F.lit(lo)) & (F.col("data_id") < F.lit(day)))
        .groupBy("ticker")
        .agg(F.max_by("close", "data_id").alias("_prev_close"))
    )
    day_rows = staging.select(
        F.col("symbol").alias("ticker"),
        F.col("date").alias("data_id"),
        "open", "high", "low", "close", "volume",
    )
    # same formula as functions.finance.pct_change: NULLIF(prev, 0) guard
    variacao = (
        (F.col("close") - F.col("_prev_close"))
        / F.when(F.col("_prev_close") != 0, F.col("_prev_close"))
        * 100
    )
    return (
        day_rows.join(F.broadcast(prev), on="ticker", how="left")
        .withColumn("variacao_diaria", variacao)
        .select(
            F.monotonically_increasing_id().alias("id"),
            "ticker", "data_id", "open", "high", "low", "close", "volume",
            "variacao_diaria",
        )
    )


def run_pipeline(
    spark: SparkSession,
    csv_path: str,
    warehouse_dir: str,
    *,
    expected_count: int | None = None,
    top_k: int = 1,
    report_path: str | None = None,
    charts_dir: str | None = None,
    incremental_date: dt.date | None = None,
    lookback_days: int = 14,
) -> PipelineResult:
    """Execute the full daily run. Raises QualityGateError to halt (C4).

    ``report_path``: when set, write the executive text report (S9,
    the notebook's `relatorio_completo.txt`) there from the fact table.

    ``charts_dir``: when set, also render the notebook's four PNG figures
    there (S9 chart sinks, plans/charts.py).

    ``incremental_date``: when set, load ONLY that day — the CSV scan is
    filtered (predicate pushdown), the day's variacao_diaria is seeded from
    the existing fact (see ``_incremental_fact``), and both the fact and
    the weekly MV are refreshed via DYNAMIC partition overwrite: only the
    ``ano=/data_id=`` directory of that day and the ``week=`` directory of
    its week are rewritten; every other partition's files stay untouched.
    This is the reference's TRUNCATE-reload cadence upgraded to the 100 TB
    posture promised above: a daily run costs one day of I/O, not the
    table.
    """
    fact_path = f"{warehouse_dir}/fact_movimentacao_diaria"
    weekly_path = f"{warehouse_dir}/volatility_weekly"

    # -- 1-3: locate + load staging (S1, S2, S4) ---------------------------
    staging = read_ohlcv_csv(spark, csv_path)
    if incremental_date is not None:
        staging = staging.filter(F.col("date") == F.lit(incremental_date))
    staging_path = f"{warehouse_dir}/staging"
    overwrite_parquet(staging, staging_path)
    staging = spark.read.parquet(staging_path)  # re-read: columnar, pruned

    # -- 4: quality gate (A1, A2, P4, P5, C4) ------------------------------
    gate = quality_summary(
        staging, null_check_cols=["close", "date"], expected_count=expected_count
    )
    expect_passed(gate, gate_name="staging")
    staged_rows = gate.collect()[0]["total_rows"]

    # -- 5: dimensions (A8, F2-F4, F8, F9, S6/J3) --------------------------
    dim_inst = build_dim_instrumento(staging, symbol_col="symbol")
    dim_tempo = build_dim_tempo(staging, date_col="date")
    append_if_absent(spark, dim_inst, f"{warehouse_dir}/dim_instrumento", ["ticker"])
    append_if_absent(spark, dim_tempo, f"{warehouse_dir}/dim_tempo", ["data_id"])

    # -- 6: fact with %-change window (P1, W1, W2, F7) ---------------------
    if incremental_date is None:
        fact = build_fact(staging)
    else:
        fact = _incremental_fact(
            spark, staging, fact_path, incremental_date, lookback_days
        )
    fact = fact.withColumn("ano", F.year("data_id"))
    fact.cache()  # three consumers below (SURVEY.md §4.3)
    fact_rows = fact.count()
    if incremental_date is None:
        overwrite_parquet(fact, fact_path, partition_by=["ano", "data_id"])
    else:
        overwrite_partitions(fact, fact_path, partition_by=["ano", "data_id"])

    # -- 7: weekly volatility = MV refresh (F1, A3, S7) --------------------
    if incremental_date is None:
        weekly = weekly_volatility(fact, key="ticker", ts="data_id")
        overwrite_parquet(weekly, weekly_path, partition_by=["week"])
    else:
        # recompute ONLY the touched week from its (pruned) day-partitions
        wk0 = incremental_date - dt.timedelta(days=incremental_date.weekday())
        week_slice = spark.read.parquet(fact_path).filter(
            (F.col("data_id") >= F.lit(wk0))
            & (F.col("data_id") <= F.lit(wk0 + dt.timedelta(days=6)))
        )
        weekly_inc = weekly_volatility(week_slice, key="ticker", ts="data_id")
        overwrite_partitions(weekly_inc, weekly_path, partition_by=["week"])
    weekly = spark.read.parquet(weekly_path)
    weekly_rows = weekly.count()

    # -- 8-9: report + log (O1, S8, F12, S10) ------------------------------
    top = top_avg_volatility(weekly, k=top_k).collect()
    if not top:
        message = "Nenhum dado de volatilidade disponível."
    else:
        r = top[0]
        message = (
            f"Ativo mais volátil: {r['ticker']} "
            f"(volatilidade média semanal: {r['avg_volatility']:.2f}%)"
        )
    if report_path or charts_dir:
        # the report is global: in incremental mode the in-memory `fact`
        # is one day, so read the full (freshly updated) table back
        report_fact = (
            fact if incremental_date is None else spark.read.parquet(fact_path)
        )
        if report_path:
            from .report import write_report

            write_report(report_fact, report_path, k=5)
        if charts_dir:
            from .charts import write_report_charts

            write_report_charts(report_fact, charts_dir, k=5)
    log.info(
        "pipeline ok: staged=%s fact=%s weekly=%s | %s",
        staged_rows, fact_rows, weekly_rows, message,
    )
    fact.unpersist()
    return PipelineResult(
        staged_rows=staged_rows,
        fact_rows=fact_rows,
        weekly_rows=weekly_rows,
        report_message=message,
    )
