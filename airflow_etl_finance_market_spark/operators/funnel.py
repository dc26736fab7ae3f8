"""Sequential event analytics: ordered funnels and cohort retention.

The reference's event analysis stops at flat aggregates (its notebook KPIs;
reference: analysis/análise_exploratória.ipynb); product/market event data
additionally needs ORDER-aware rollups — "how many users did A, then B
after A, then C after B" (conversion funnels) and "of the users first seen
in week W, how many were active k weeks later" (retention cohorts). Both
are classic warehouse queries with well-defined ANSI-SQL semantics, so the
DuckDB oracle mirrors them exactly.

Scale shape: every join and aggregate here is keyed on the user id. The
event table is hash-partitioned once on that key (`fan_out`), and each
funnel step's frame is user-keyed and MONOTONICALLY SHRINKING (step k+1's
input is step k's survivors), so the per-step joins reuse the same
partitioning and the heaviest exchange is the first one. Nothing is
collected to the driver; the outputs are step-count / cohort-matrix sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import fan_out


def event_funnel(
    events: DataFrame,
    steps: list[str],
    *,
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, step_idx, n_users) — users reaching each funnel stage in order.

    A user reaches step k if they have an event of type ``steps[k]``
    STRICTLY AFTER their earliest qualifying time for step k-1 (earliest
    event chaining — the standard "first conversion" funnel). Step 1 is
    simply "has the event at all". Counts are monotonically non-increasing
    by construction.

    Physical shape: one user-keyed aggregate per step over a frame that
    only ever shrinks; each stage joins the (user, reached_at) survivors
    frame back to the (pre-partitioned) events on the user key, so the
    partitioning from the first exchange is reused throughout. The final
    per-step counts are one-row aggregates unioned together — k tiny
    frames, no full sort anywhere.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = fan_out(events.select(key, ts, type_col), key)
    # step 1: earliest occurrence of the first event type per user
    reached = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(key)
        .agg(F.min(ts).alias("_t"))
    )
    counts = [reached.agg(F.count(F.lit(1)).alias("n_users"))]
    for step in steps[1:]:
        reached = (
            ev.filter(F.col(type_col) == step)
            .join(reached, key)
            .filter(F.col(ts) > F.col("_t"))
            .groupBy(key)
            .agg(F.min(ts).alias("_t"))
        )
        counts.append(reached.agg(F.count(F.lit(1)).alias("n_users")))
    out = None
    for i, (step, c) in enumerate(zip(steps, counts), start=1):
        row = c.select(
            F.lit(step).alias("step"),
            F.lit(i).cast("long").alias("step_idx"),
            F.col("n_users"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def retention_cohorts(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_users) — weekly retention triangle.

    A user's cohort is the ISO week (Monday-truncated) of their FIRST
    event; they count as retained at offset k if they have any event in
    the week k weeks after their cohort week. Offsets are exact integer
    week differences (both engines truncate weeks to Mondays, so the day
    difference is always a multiple of 7).

    Physical shape: two user-keyed aggregates (first-seen, then distinct
    active weeks — both ride the fan_out exchange) and one final
    cohort-keyed aggregate over a frame bounded by |users| x |weeks|.
    """
    ev = fan_out(events.select(key, ts), key)
    cohort = ev.groupBy(key).agg(
        F.date_trunc("week", F.min(ts)).alias("cohort_week")
    )
    active = (
        ev.select(F.col(key), F.date_trunc("week", F.col(ts)).alias("_week"))
        .distinct()
    )
    return (
        active.join(cohort, key)
        .select(
            "cohort_week",
            (
                F.datediff(F.to_date("_week"), F.to_date("cohort_week"))
                / F.lit(7)
            )
            .cast("long")
            .alias("week_offset"),
            F.col(key),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def event_transition_matrix(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """(from_type, to_type, n_transitions, prob) — the first-order Markov
    transition matrix of per-user event sequences: how sessions actually
    flow (view→click vs view→error), the model behind next-event
    prediction baselines and funnel-drop diagnostics.

    Ordering is (ts, tiebreak) within each user so equal timestamps are
    deterministic. ``prob`` is row-normalized per from_type.

    Physical shape: one per-user LAG window (rides the fan_out's user
    partitioning — no extra exchange before the window sort), one
    (from, to) hash-aggregate, and the row normalization is a window over
    the |types|² matrix frame — negligible. At 100 TB the matrix frame is
    still |event types|² rows; only the LAG pass touches data.
    """
    from pyspark.sql import Window

    seq = fan_out(events.select(key, ts, type_col, tiebreak), key).select(
        F.col(type_col).alias("to_type"),
        F.lag(type_col)
        .over(Window.partitionBy(key).orderBy(ts, tiebreak))
        .alias("from_type"),
    )
    t = (
        seq.filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    row_w = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(row_w), 6
        ).alias("prob"),
    )
