"""Custom stateful streaming operator: per-key pct-change (W1/W2, streamed).

The batch engine computes ``variacao_diaria`` with a LAG window
(reference: dags/financial_pipeline.py:192-193 → plans.volatility). A
stream cannot LAG across micro-batches, so the streaming twin keeps the
last observed value per key in the state store and splices it into the
front of each batch — ``applyInPandasWithState``, the (b)-tier custom
operator per the build rules (Arrow-batched, one state row per key).

Cross-batch semantics assume per-key event-time-ordered arrival (one
file/day cadence like the reference's daily feed). Out-of-order arrivals
within a batch are sorted; across batches they would need a
reorder-buffer variant (event-time timeout + buffer in state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pct_change_stateful(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """(key, ts, value, variacao_diaria) with pct-change carried across
    micro-batches via the state store.

    Batch frames take the LAG-window path (identical single-batch
    semantics, zero-state) — which doubles as the differential oracle for
    the streaming path in tests.
    """
    if not events.isStreaming:
        w = Window.partitionBy(key).orderBy(ts)
        prev = F.lag(value).over(w)
        return events.select(
            key,
            ts,
            value,
            (
                (F.col(value) - prev)
                / F.when(prev == 0, None).otherwise(prev)
                * 100
            ).alias("variacao_diaria"),
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{key} long, {ts} timestamp, {value} double, variacao_diaria double"
    )
    state_schema = "last_value double"
    # Rebind to locals: the closure below must be fully self-contained
    # (it is unpickled on Python workers without the repo on sys.path).
    k_col, ts_col, v_col = key, ts, value

    def fn(key_tuple, pdf_iter, state):
        import pandas as pd

        last = state.get[0] if state.exists else None
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(ts_col).reset_index(drop=True)
            prev = pdf[v_col].shift(1)
            if last is not None:
                prev.iloc[0] = last
            pct = (pdf[v_col] - prev) / prev.where(prev != 0) * 100.0
            last = float(pdf[v_col].iloc[-1])
            out = pd.DataFrame(
                {
                    k_col: key_tuple[0],
                    ts_col: pdf[ts_col],
                    v_col: pdf[v_col],
                    # nullable Float64 so first-row/zero-prev become real
                    # NULLs (plain float64 would ship NaN, not NULL)
                    "variacao_diaria": pd.array(pct, dtype="Float64"),
                }
            )
            yield out
        if last is not None:
            state.update((last,))

    return (
        events.select(key, ts, value)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
