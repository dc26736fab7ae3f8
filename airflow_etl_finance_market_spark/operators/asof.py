"""As-of (point-in-time) join — the finance-classic operator Spark lacks.

The reference never joins across time (its only window op is LAG,
reference: dags/financial_pipeline.py:192-193), but any consumer of its
star schema doing trade/quote or attribution analysis needs "the most
recent right-side row at or before each left timestamp".

Spark has no native ASOF JOIN, so per the build rules this is tier (a):
a composition of built-in ops. Union the two sides, tag provenance, and
carry right-side values forward with ``last(..., ignorenulls=True)`` over
a per-key event-time window. Cost: ONE shuffle on the key + a per-key
sort — the same price as a sort-merge join, with no range-explosion; at
100 TB this beats binning/IEJoin rewrites whenever both sides share the
partition key (DuckDB's own ASOF executes a comparable merge plan).

A `pd.merge_asof`-per-group applyInPandas variant would be ~equivalent
semantically but ships every row through Arrow; the pure-Catalyst form
stays in WholeStageCodegen (window functions codegen) end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    ts: str,
    right_ts: str | None = None,
    right_vals: dict[str, str],
    inclusive: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of left-join: attach, to every left row, `right_vals`
    from the latest right row with ``right.right_ts <= left.ts`` (``<``
    when ``inclusive=False``) and the same `by` key. ``right_ts`` defaults
    to ``ts`` when both sides name their event time the same way.

    ``right_vals`` maps right-column → output-name (output names must not
    collide with left columns). Left rows with no prior right row keep
    NULLs — left-outer semantics, mirroring DuckDB's ``ASOF LEFT JOIN``.

    ``tiebreak`` names a right-side column that deterministically orders
    right rows sharing the same ``(by, right_ts)``: the row with the
    GREATEST tiebreak value wins — e.g. a sequence number or source row
    id. When omitted, duplicates are broken by the PAYLOAD STRUCT itself
    (field-wise comparison, greatest wins), so the result is deterministic
    by construction either way — Spark's window sort is not stable, and
    without a total order the winner among exact duplicates would be
    partitioning-dependent. The payload fallback costs nothing (no extra
    pass); it only requires every ``right_vals`` column to be an orderable
    type (maps are not — pass an explicit ``tiebreak`` for those, or the
    analyzer rejects the sort).
    """
    collisions = set(right_vals.values()) & set(left.columns)
    if collisions:
        raise ValueError(f"right_vals output names collide with left: {collisions}")

    # One struct payload per right row (NOT per-column last(): independent
    # carries could stitch values from DIFFERENT right rows whenever a
    # right value is NULL).
    r = right.select(
        F.col(by),
        F.col(right_ts or ts).alias(ts),
        F.struct(
            *[F.col(src).alias(dst) for src, dst in right_vals.items()]
        ).alias("_asof_payload"),
        *([F.col(tiebreak).alias("_asof_tb")] if tiebreak else []),
    ).withColumn("_asof_src", F.lit(0))
    l = left.withColumn("_asof_src", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts iff the match is
    # inclusive (ties: the right row "has already happened"). Within the
    # right rows at one ts, the tiebreak ascends so last() carries the max.
    src_order = F.col("_asof_src").asc() if inclusive else F.col("_asof_src").desc()
    order = [F.col(ts).asc(), src_order]
    if tiebreak:
        order.append(F.col("_asof_tb").asc_nulls_first())
    else:
        # no tiebreak: total-order duplicate right rows by their payload so
        # the carried winner is deterministic (left rows' NULL payloads
        # sort among themselves — harmless, they are never carried FROM).
        order.append(F.col("_asof_payload").asc_nulls_first())
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col("_asof_payload"), ignorenulls=True).over(w)
    return (
        merged.withColumn("_asof_payload", carried)
        .filter(F.col("_asof_src") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[
                F.col(f"_asof_payload.{dst}").alias(dst)
                for dst in right_vals.values()
            ],
        )
    )


def resample_daily_ffill(
    df: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    filled_col: str = "value_filled",
) -> DataFrame:
    """Calendar resample with forward fill: one row per (key, day) over
    each key's OWN observed span, carrying the last observed daily value
    across gap days — the align-before-model step every time-series
    consumer needs (a price/metric panel with no holes), which the
    reference's daily feed sidesteps only because Postgres receives one
    row per day by construction.

    Output: (key, d, value_filled, is_observed); gap days carry the
    previous observed day's value, and the first day per key is always
    observed (the spine starts at the key's first event), so no leading
    NULLs exist. Daily value = AVG of the day's events, rounded at the
    presentation edge AFTER the fill so both engines round the same
    carried number.

    Physical shape: one (key, day)-keyed aggregate; one key-keyed
    min/max aggregate whose per-key calendar explodes from a sequence()
    — spine rows = Σ per-key span, never |keys| × global-span; one
    equi-join spine⋈daily on (key, day); and the fill itself is
    last_value(IGNORE NULLS) over the per-key date order — a window
    capability class (null-skipping frames) nothing else in the repo
    exercises. No driver-side state, no cross joins.
    """
    daily = (
        df.groupBy(
            F.col(key), F.col(ts).cast("date").alias("d")
        ).agg(F.avg(value).alias("_v"))
    )
    spine = (
        daily.groupBy(key)
        .agg(F.min("d").alias("_lo"), F.max("d").alias("_hi"))
        .select(
            key,
            F.explode(
                F.expr("sequence(_lo, _hi, interval 1 day)")
            ).alias("d"),
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, [key, "d"], "left")
        .select(
            key,
            "d",
            F.round(
                F.last("_v", ignorenulls=True).over(w), 6
            ).alias(filled_col),
            F.col("_v").isNotNull().alias("is_observed"),
        )
    )
