"""Structured Streaming tier: streaming results differential-tested against
the batch twin (the same function body on a batch frame), plus watermark
append-mode semantics across micro-batches.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from airflow_etl_finance_market_spark.streaming import (
    pct_change_stateful,
    read_events_batch,
    read_events_stream,
    run_available_now,
    windowed_event_kpis,
)


def _rows(df):
    rows = [
        tuple(None if isinstance(v, float) and math.isnan(v) else v for v in r)
        for r in df.collect()
    ]
    rows.sort(key=lambda r: tuple((v is None, str(v)) for v in r))
    return rows


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    """The events fixture split into 3 ts-ordered parquet files so a file
    stream with maxFilesPerTrigger=1 yields 3 micro-batches with advancing
    watermark. ts stays raw epoch-nanos (the stream schema's wire format).

    Read with the stream's explicit LONG schema — relying on the
    nanosAsLong session conf is fragile (under Spark 4.1.2 a conf set
    mid-suite can be ignored and ts comes back as a timestamp, breaking
    the integer span arithmetic below)."""
    from airflow_etl_finance_market_spark.streaming.io import EVENTS_STREAM_SCHEMA

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.schema(EVENTS_STREAM_SCHEMA).parquet(
        f"{sf_dir}/events.parquet"
    )  # ts: bigint nanos
    lo, hi = raw.selectExpr("min(ts)", "max(ts)").first()
    span = (hi - lo) // 3 + 1
    out = str(tmp_path_factory.mktemp("events_stream"))
    for i in range(3):
        part = raw.filter(
            (raw.ts >= lo + i * span) & (raw.ts < lo + (i + 1) * span)
        )
        pdir = f"{out}/b{i}"
        part.coalesce(1).write.mode("overwrite").parquet(pdir)
        # file source orders by modification time: force batch order
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                os.utime(f"{pdir}/{f}", (1_700_000_000 + i, 1_700_000_000 + i))
    return out


def test_windowed_kpis_stream_equals_batch(spark, sf_dir, split_events_dir):
    batch = windowed_event_kpis(read_events_batch(spark, f"{sf_dir}/events.parquet"))
    stream = windowed_event_kpis(
        read_events_stream(spark, f"{split_events_dir}/b*"),
        watermark="1 hour",
    )
    got = run_available_now(stream, "kpis_complete", output_mode="complete")
    assert _rows(got) == _rows(batch)


def test_sliding_windowed_kpis_stream_equals_batch(spark, sf_dir, split_events_dir):
    """The SLIDING path (2-day window, 1-day slide — the
    sliding_window_kpis driver entry's configuration): each event lands
    in two overlapping windows, and the identical operator body must
    produce the same hopping aggregate in batch and as a real
    multi-micro-batch streaming query."""
    batch = windowed_event_kpis(
        read_events_batch(spark, f"{sf_dir}/events.parquet"),
        window="2 days",
        slide="1 day",
    )
    stream = windowed_event_kpis(
        read_events_stream(spark, f"{split_events_dir}/b*"),
        window="2 days",
        slide="1 day",
        watermark="1 hour",
    )
    got = run_available_now(stream, "kpis_sliding_complete", output_mode="complete")
    assert _rows(got) == _rows(batch)
    # the hopping property itself: total per-window event count sums to
    # exactly 2x the raw events (every event in exactly two windows)
    n_events = read_events_batch(spark, f"{sf_dir}/events.parquet").count()
    assert sum(r[3] for r in _rows(batch.select(
        "window_start", "window_end", "event_type", "n_events"
    ))) == 2 * n_events


def test_append_mode_emits_only_finalized_windows(spark, sf_dir, split_events_dir):
    """Append mode + watermark: emitted windows are exactly the ones the
    final watermark passed, and their values match the batch computation."""
    stream = windowed_event_kpis(
        read_events_stream(spark, f"{split_events_dir}/b*", max_files_per_trigger=1),
        window="1 day",
        watermark="1 hour",
    )
    got = run_available_now(stream, "kpis_append", output_mode="append")
    batch_rows = _rows(windowed_event_kpis(read_events_batch(spark, f"{sf_dir}/events.parquet")))
    got_rows = _rows(got)
    assert got_rows, "append mode emitted nothing — watermark never advanced"
    assert set(got_rows) <= set(batch_rows), "append emitted rows that disagree with batch"
    # windows still open at end-of-stream (end > final watermark) must NOT
    # have been emitted; every emitted window-end predates the global max ts
    max_end = max(r[1] for r in batch_rows)  # columns sorted: window_end idx 1
    assert all(r[1] < max_end for r in got_rows)


def test_pct_change_stateful_carries_state_across_batches(
    spark, sf_dir, split_events_dir
):
    """3 micro-batches: the first row of batch N+1 must diff against the last
    value of batch N from the state store — equal to the batch LAG twin."""
    stream = pct_change_stateful(
        read_events_stream(spark, f"{split_events_dir}/b*", max_files_per_trigger=1)
    )
    got = run_available_now(stream, "pct_stateful", output_mode="append")
    batch = pct_change_stateful(read_events_batch(spark, f"{sf_dir}/events.parquet"))
    g, b = _rows(got), _rows(batch)
    assert len(g) == len(b)
    for x, y in zip(g, b):
        assert x[:3] == y[:3]
        if x[3] is None or y[3] is None:
            assert x[3] == y[3]
        else:
            assert abs(x[3] - y[3]) < 1e-9


def test_streaming_volatility_chain(spark, sf_dir, split_events_dir):
    """The streaming flagship: stateful pct-change -> watermark -> 7-day
    windowed stddev, two chained stateful operators in ONE streaming query.
    Append mode withholds non-finalized windows; everything emitted must
    match the batch twin exactly."""
    from airflow_etl_finance_market_spark.streaming import windowed_volatility

    stream = windowed_volatility(
        pct_change_stateful(
            read_events_stream(spark, f"{split_events_dir}/b*")
        ).withWatermark("ts", "1 hour"),
        key="user_id",
        ts="ts",
        window="7 days",
    )
    got = run_available_now(stream, "vol_chain", output_mode="append")
    batch = windowed_volatility(
        pct_change_stateful(read_events_batch(spark, f"{sf_dir}/events.parquet")),
        key="user_id",
        ts="ts",
        window="7 days",
    )
    g = {(r["user_id"], r["week_start"]): r["vol"] for r in got.collect()}
    b = {(r["user_id"], r["week_start"]): r["vol"] for r in batch.collect()}
    assert g, "append emitted nothing"
    assert set(g) <= set(b)
    for k, gv in g.items():
        bv = b[k]
        if gv is None or bv is None:
            assert gv == bv
        else:
            assert abs(gv - bv) < 1e-9


def test_checkpoint_restart_restores_state_exactly_once(
    spark, sf_dir, split_events_dir, tmp_path
):
    """Kill-and-restart: run the stateful pct-change over the first two
    files, stop, then add the third and re-run with the SAME checkpoint.
    The restart must (a) process only the new file, (b) restore per-key
    state so the third file's first rows diff against the second file's
    last values, (c) never duplicate sink rows."""
    import shutil

    from airflow_etl_finance_market_spark.streaming.io import (
        run_available_now_to_parquet,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    for b in ("b0", "b1"):
        shutil.copytree(f"{split_events_dir}/{b}", f"{src}/{b}")

    stream = pct_change_stateful(read_events_stream(spark, f"{src}/b*"))
    run_available_now_to_parquet(stream, out, ckpt)
    rows_after_first = spark.read.parquet(out).count()

    shutil.copytree(f"{split_events_dir}/b2", f"{src}/b2")
    stream = pct_change_stateful(read_events_stream(spark, f"{src}/b*"))
    run_available_now_to_parquet(stream, out, ckpt)

    got = _rows(spark.read.parquet(out))
    batch = _rows(
        pct_change_stateful(read_events_batch(spark, f"{sf_dir}/events.parquet"))
    )
    assert rows_after_first < len(got) == len(batch)  # incremental, no dups
    for x, y in zip(got, batch):
        assert x[:3] == y[:3]
        if x[3] is None or y[3] is None:
            assert x[3] == y[3]
        else:
            assert abs(x[3] - y[3]) < 1e-9


def test_stream_dedup_within_watermark(spark, sf_dir, split_events_dir, tmp_path):
    """At-least-once delivery: every event duplicated within its micro-batch
    and re-delivered in the NEXT batch must still come out exactly once —
    dropDuplicatesWithinWatermark state covers the redelivery window, and
    eviction past the watermark keeps state bounded."""
    import os

    from airflow_etl_finance_market_spark.streaming import (
        dedup_events,
        read_events_batch,
        read_events_stream,
        run_available_now,
    )
    from airflow_etl_finance_market_spark.streaming.io import EVENTS_STREAM_SCHEMA

    # redeliver: each split file unioned with itself (in-batch dup), plus
    # the previous batch's rows appended again (cross-batch redelivery)
    dup_dir = str(tmp_path / "dup_stream")
    batches = sorted(os.listdir(split_events_dir))
    prev = None
    for i, b in enumerate(batches):
        cur = spark.read.schema(EVENTS_STREAM_SCHEMA).parquet(
            f"{split_events_dir}/{b}"
        )
        out = cur.union(cur) if prev is None else cur.union(cur).union(prev)
        pdir = f"{dup_dir}/b{i}"
        out.coalesce(1).write.mode("overwrite").parquet(pdir)
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                os.utime(f"{pdir}/{f}", (1_700_000_000 + i,) * 2)
        prev = cur
    stream = dedup_events(
        read_events_stream(spark, f"{dup_dir}/b*", max_files_per_trigger=1),
        watermark="25 hours",  # covers the one-batch redelivery lag
    )
    got = run_available_now(stream, "dedup_stream", output_mode="append")
    batch = dedup_events(read_events_batch(spark, f"{sf_dir}/events.parquet"))
    assert got.count() == batch.count()
    assert _rows(got.select("event_id")) == _rows(batch.select("event_id"))


def test_reorder_buffer_handles_out_of_order_arrival(spark, sf_dir, tmp_path):
    """Rows displaced into the NEXT micro-batch (late, but inside the
    watermark) must still produce the exact batch-LAG pct chain: the
    reorder buffer holds rows until the watermark passes them and emits in
    event-time order. Emitted set = precisely the rows the final watermark
    finalized."""
    import os

    from airflow_etl_finance_market_spark.streaming import (
        pct_change_reordered,
        read_events_batch,
        read_events_stream,
        run_available_now,
    )
    from airflow_etl_finance_market_spark.streaming.io import EVENTS_STREAM_SCHEMA

    raw = spark.read.schema(EVENTS_STREAM_SCHEMA).parquet(
        f"{sf_dir}/events.parquet"
    )
    lo, hi = raw.selectExpr("min(ts)", "max(ts)").first()
    unit = 1 if hi < 10**17 else 1000  # micros per ts-unit (see io.py)
    span_us = (hi - lo) // unit
    batch_us = span_us // 3 + 1
    delay_s = batch_us // 1_000_000 + 3600  # covers one-batch displacement
    out = str(tmp_path / "ooo_stream")
    for i in range(3):
        b_lo, b_hi = lo + i * batch_us * unit, lo + (i + 1) * batch_us * unit
        part = raw.filter((raw.ts >= b_lo) & (raw.ts < b_hi))
        # displace every 7th event into the NEXT batch's file (late arrival);
        # batch 0 additionally receives nothing from the past
        keep = part.filter((part.event_id % 7 != 0) | (F.lit(i) == 2))
        if i > 0:
            prev_lo = lo + (i - 1) * batch_us * unit
            late = raw.filter(
                (raw.ts >= prev_lo) & (raw.ts < b_lo) & (raw.event_id % 7 == 0)
            )
            keep = keep.unionByName(late)
        pdir = f"{out}/b{i}"
        keep.coalesce(1).write.mode("overwrite").parquet(pdir)
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                os.utime(f"{pdir}/{f}", (1_700_000_000 + i,) * 2)

    got = run_available_now(
        pct_change_reordered(
            read_events_stream(spark, f"{out}/b*", max_files_per_trigger=1),
            delay=f"{delay_s} seconds",
        ),
        "pct_reordered",
        output_mode="append",
    )
    batch = pct_change_reordered(
        read_events_batch(spark, f"{sf_dir}/events.parquet")
    )
    # Spark tracks watermarks in whole milliseconds — ms-floor the max
    # event time before subtracting the delay (verified against real
    # micro-batch runs; the unfloored value is up to 999us too high).
    wm_final_us = (hi // unit) // 1000 * 1000 - delay_s * 1_000_000
    expect = batch.filter(
        F.unix_micros(F.col("ts").cast("timestamp_ltz")) <= wm_final_us
    )
    g, b = _rows(got), _rows(expect)
    assert len(g) == len(b) and len(g) > 0
    for x, y in zip(g, b):
        assert x[:3] == y[:3]
        if x[3] is None or y[3] is None:
            assert x[3] == y[3]
        else:
            assert abs(x[3] - y[3]) < 1e-9


def test_reorder_buffer_retires_drained_keys(spark, tmp_path):
    """retire_after drops a key's state row once its buffer is drained and
    the watermark has passed its last emitted timestamp by the horizon —
    state is bounded by key LIVENESS, not all-time key cardinality. The
    event-time timeout doubles as the retirement alarm, so the key
    retires without ever receiving another row; emitted output is
    identical with and without retirement."""
    import os

    from airflow_etl_finance_market_spark.streaming.stateful import (
        pct_change_reordered,
    )

    out = str(tmp_path / "retire_src")
    # timestamps start well past epoch 0: a row AT the initial watermark
    # (0) is dropped by Spark's late filter before reaching the operator
    batches = [
        # key 1 lives only in batch 0, then goes silent forever
        [(1, 1000, 10.0), (1, 1010, 11.0), (2, 1060, 5.0)],
        [(2, 1200, 6.0)],
        [(2, 1400, 7.0)],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "user_id long, ts_s long, value double"
        ).select(
            "user_id", F.timestamp_seconds("ts_s").alias("ts"), "value"
        )
        pdir = f"{out}/b{i}"
        df.coalesce(1).write.parquet(pdir)
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                os.utime(f"{pdir}/{f}", (1_700_000_000 + i,) * 2)

    def drain(name, retire):
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{out}/b*")
        )
        q = (
            pct_change_reordered(
                stream, delay="60 seconds", retire_after=retire
            )
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            n_state = [
                p["stateOperators"][0]["numRowsTotal"]
                for p in q.recentProgress
                if p.get("stateOperators")
            ][-1]
        finally:
            q.stop()
        rows = sorted(
            (r["user_id"], r["ts"], r["value"], r["variacao_diaria"])
            for r in spark.table(name).collect()
        )
        return n_state, rows

    # final watermark = 1400s - 60s = 1340s: key 1 drained at ts=1010s,
    # horizon 120s long passed -> retired; key 2 still holds its 1400s row
    n_retire, rows_retire = drain("retire_on", "120 seconds")
    n_keep, rows_keep = drain("retire_off", None)
    assert n_retire == 1
    assert n_keep == 2  # both keys keep a state row forever without TTL
    assert rows_retire == rows_keep and len(rows_retire) == 4


def test_stream_stream_join_equals_batch(spark, sf_dir, split_events_dir):
    """Stream-stream interval join (click_attribution_join): two watermarked
    file streams over the same micro-batched fixture must emit exactly the
    batch twin's pairs — including pairs whose view and click arrive in
    DIFFERENT micro-batches (the buffered-state case the operator exists
    for)."""
    from airflow_etl_finance_market_spark.streaming.windows import (
        click_attribution_join,
    )

    ev_b = read_events_batch(spark, f"{sf_dir}/events.parquet")
    batch = click_attribution_join(
        ev_b.filter(F.col("event_type") == "view"),
        ev_b.filter(F.col("event_type") == "click"),
    )
    views_s = read_events_stream(
        spark, f"{split_events_dir}/b*", max_files_per_trigger=1
    ).filter(F.col("event_type") == "view")
    clicks_s = read_events_stream(
        spark, f"{split_events_dir}/b*", max_files_per_trigger=1
    ).filter(F.col("event_type") == "click")
    got = run_available_now(
        click_attribution_join(views_s, clicks_s),
        "ss_join",
        output_mode="append",
    )
    got_rows, batch_rows = _rows(got), _rows(batch)
    assert batch_rows, "fixture produced no view→click pairs at all"
    assert got_rows == batch_rows


def test_stream_stream_join_pairs_across_micro_batches(spark, tmp_path):
    """The buffered-state case the operator exists for, made deterministic:
    the view arrives in micro-batch 0, its click 5 minutes later in
    micro-batch 1 — the pair can only exist if batch 0's view was held in
    join state. A decoy click outside the horizon must not pair."""
    import datetime as dt
    import os

    from airflow_etl_finance_market_spark.streaming.io import (
        EVENTS_STREAM_SCHEMA,
        read_events_stream,
    )
    from airflow_etl_finance_market_spark.streaming.windows import (
        click_attribution_join,
    )

    t0 = 1_700_000_000_000_000_000  # epoch nanos
    MIN = 60 * 1_000_000_000
    batches = [
        [(1, t0, 7, "view", 1.0, "{}")],
        [
            (2, t0 + 5 * MIN, 7, "click", 1.0, "{}"),
            # same user, 2 h later: outside the 30-min horizon
            (3, t0 + 120 * MIN, 7, "click", 1.0, "{}"),
            # watermark pusher so the horizon closes
            (4, t0 + 300 * MIN, 8, "view", 1.0, "{}"),
        ],
    ]
    out = str(tmp_path / "ssj")
    for i, rows in enumerate(batches):
        bdir = f"{out}/b{i}"
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(bdir)
        for f in os.listdir(bdir):
            if f.endswith(".parquet"):
                os.utime(f"{bdir}/{f}", (1_700_000_000 + i, 1_700_000_000 + i))
    views = read_events_stream(
        spark, f"{out}/b*", max_files_per_trigger=1
    ).filter(F.col("event_type") == "view")
    clicks = read_events_stream(
        spark, f"{out}/b*", max_files_per_trigger=1
    ).filter(F.col("event_type") == "click")
    got = _rows(
        run_available_now(
            click_attribution_join(views, clicks, watermark="10 minutes"),
            "ssj_cross",
            output_mode="append",
        )
    )
    base = dt.datetime(2023, 11, 14, 22, 13, 20)
    assert got == [(7, base, base + dt.timedelta(minutes=5), 300)]


def test_stream_stream_left_outer_emits_unmatched_views(spark, tmp_path):
    """leftOuter stream-stream join: a view with no click in its horizon
    must be emitted NULL-padded once the watermark expires its state —
    not silently dropped (inner) and not emitted before it is provably
    unmatched."""
    import os

    from airflow_etl_finance_market_spark.streaming.io import (
        EVENTS_STREAM_SCHEMA,
        read_events_stream,
    )
    from airflow_etl_finance_market_spark.streaming.windows import (
        click_attribution_join,
    )

    t0 = 1_700_000_000_000_000_000
    MIN = 60 * 1_000_000_000
    batches = [
        [
            (1, t0, 7, "view", 1.0, "{}"),          # converts
            (2, t0, 9, "view", 1.0, "{}"),          # never converts
        ],
        [(3, t0 + 5 * MIN, 7, "click", 1.0, "{}")],
        # watermark pushers in BOTH streams (the global watermark is the
        # MIN across the two watermarked sources — a pusher in only one
        # leaves the other's watermark at its stale max and nothing ever
        # evicts), then one more batch: the watermark used by batch N is
        # computed from batches < N, so eviction (and the outer NULL
        # emission) happens one batch AFTER the pushers arrive. Pusher
        # users are all distinct so they add no pairs of their own.
        [
            (4, t0 + 600 * MIN, 10, "view", 1.0, "{}"),
            (5, t0 + 600 * MIN, 11, "click", 1.0, "{}"),
        ],
        [
            (6, t0 + 601 * MIN, 12, "view", 1.0, "{}"),
            (7, t0 + 601 * MIN, 13, "click", 1.0, "{}"),
        ],
    ]
    out = str(tmp_path / "ssj_outer")
    for i, rows in enumerate(batches):
        bdir = f"{out}/b{i}"
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(bdir)
        for f in os.listdir(bdir):
            if f.endswith(".parquet"):
                os.utime(f"{bdir}/{f}", (1_700_000_000 + i, 1_700_000_000 + i))
    views = read_events_stream(
        spark, f"{out}/b*", max_files_per_trigger=1
    ).filter(F.col("event_type") == "view")
    clicks = read_events_stream(
        spark, f"{out}/b*", max_files_per_trigger=1
    ).filter(F.col("event_type") == "click")
    got = _rows(
        run_available_now(
            click_attribution_join(
                views, clicks, watermark="10 minutes", how="leftOuter"
            ),
            "ssj_outer",
            output_mode="append",
        )
    )
    by_user = {r[0]: r for r in got}
    assert by_user[7][2] is not None and by_user[7][3] == 300
    assert by_user[9][2] is None and by_user[9][3] is None


def test_foreachbatch_upsert_is_idempotent_across_redelivery(
    spark, sf_dir, split_events_dir, tmp_path
):
    """foreachBatch + append_if_absent: every event lands exactly once even
    when the source redelivers (fresh checkpoint over already-landed
    files = worst-case full replay), and a normal incremental drain adds
    only the new batch."""
    from airflow_etl_finance_market_spark.streaming.io import (
        run_available_now_upsert,
    )
    import shutil

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    for b in ("b0", "b1"):
        shutil.copytree(f"{split_events_dir}/{b}", f"{src}/{b}")

    def drain(ckpt):
        run_available_now_upsert(
            read_events_stream(spark, f"{src}/b*"),
            out,
            str(tmp_path / ckpt),
            keys=["event_id"],
        )

    drain("ckpt1")
    n1 = spark.read.parquet(out).count()
    # full replay with a FRESH checkpoint: offset tracking is gone, the
    # key anti-join is the only thing standing between us and duplicates
    drain("ckpt2")
    assert spark.read.parquet(out).count() == n1
    # incremental: add b2, re-drain on the original checkpoint
    shutil.copytree(f"{split_events_dir}/b2", f"{src}/b2")
    drain("ckpt1")
    got = spark.read.parquet(out)
    batch = read_events_batch(spark, f"{sf_dir}/events.parquet")
    assert got.count() == batch.count()
    assert got.select("event_id").distinct().count() == batch.count()


def test_stream_static_enrichment_equals_batch(spark, sf_dir, split_events_dir):
    """Stream-static join: every micro-batch enriches against the static
    dim identically to the batch twin; events without a dim row survive
    (left join) with NULL attributes."""
    from airflow_etl_finance_market_spark.sources.readers import load_fixture
    from airflow_etl_finance_market_spark.streaming.windows import (
        enrich_with_dim,
    )

    dim = load_fixture(spark, sf_dir, "customer")
    batch = enrich_with_dim(
        read_events_batch(spark, f"{sf_dir}/events.parquet"), dim
    ).select("event_id", "user_id", "c_mktsegment")
    stream = enrich_with_dim(
        read_events_stream(spark, f"{split_events_dir}/b*", max_files_per_trigger=1),
        dim,
    ).select("event_id", "user_id", "c_mktsegment")
    got = run_available_now(stream, "enriched", output_mode="append")
    assert _rows(got) == _rows(batch)
    # the join is genuinely enriching: at least one non-NULL segment
    assert got.filter(F.col("c_mktsegment").isNotNull()).count() > 0


def test_funnel_stateful_batch_matches_python_replay(spark):
    """Earliest-event chaining incl. the strict-after equal-timestamp edge:
    a 'click' AT the view's exact reach time must NOT advance."""
    from airflow_etl_finance_market_spark.streaming.stateful import (
        funnel_stateful,
    )

    rows = [
        # user 1: clean view -> click -> purchase
        (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
        # user 2: click BEFORE view, then click again after -> reaches 2
        (2, 50, "click"), (2, 100, "view"), (2, 150, "click"),
        # user 3: click AT the same ts as view (strict > fails) -> only 1
        (3, 100, "view"), (3, 100, "click"),
        # user 4: never views -> no rows at all
        (4, 10, "click"), (4, 20, "purchase"),
        # noise types are ignored
        (1, 150, "error"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s long, event_type string"
    ).select("user_id", F.timestamp_seconds("ts_s").alias("ts"), "event_type")
    got = {
        (r.user_id, r.step_idx, r.step, int(r.reached_at.timestamp()))
        for r in funnel_stateful(df).collect()
    }
    assert got == {
        (1, 1, "view", 100), (1, 2, "click", 200), (1, 3, "purchase", 300),
        (2, 1, "view", 100), (2, 2, "click", 150),
        (3, 1, "view", 100),
    }


def test_funnel_stateful_stream_equals_batch_out_of_order(spark, tmp_path):
    """The streaming funnel over displaced (late-but-within-watermark)
    micro-batches must emit exactly the batch chain over the finalized
    prefix — the reorder-buffer contract applied to the step machine."""
    import os

    from airflow_etl_finance_market_spark.streaming.stateful import (
        funnel_stateful,
    )

    rng_rows = []
    # 30 users x 6 events across 3 'days'; types cycle so most users
    # produce partial funnels, some full
    types = ["view", "click", "purchase", "error", "view", "click"]
    for u in range(30):
        for i in range(6):
            t = 1000 + i * 500 + (u * 37 + i * 13) % 400
            rng_rows.append((u, t, types[(u + i) % len(types)]))
    df = spark.createDataFrame(
        rng_rows, "user_id long, ts_s long, event_type string"
    ).select("user_id", F.timestamp_seconds("ts_s").alias("ts"), "event_type")

    out = str(tmp_path / "funnel_src")
    lo, hi = 1000, 1000 + 5 * 500 + 400
    span = (hi - lo) // 3 + 1
    for i in range(3):
        b_lo, b_hi = lo + i * span, lo + (i + 1) * span
        part = df.filter(
            (F.unix_timestamp("ts") >= b_lo) & (F.unix_timestamp("ts") < b_hi)
        )
        keep = part.filter((F.col("user_id") % 5 != 0) | (F.lit(i) == 2))
        if i > 0:
            late = df.filter(
                (F.unix_timestamp("ts") >= lo + (i - 1) * span)
                & (F.unix_timestamp("ts") < b_lo)
                & (F.col("user_id") % 5 == 0)
            )
            keep = keep.unionByName(late)
        pdir = f"{out}/b{i}"
        keep.coalesce(1).write.mode("overwrite").parquet(pdir)
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                os.utime(f"{pdir}/{f}", (1_700_000_000 + i,) * 2)

    delay_s = span + 60
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{out}/b*")
    )
    q = (
        funnel_stateful(stream, delay=f"{delay_s} seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("funnel_ooo")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.step_idx, r.step, r.reached_at)
        for r in spark.table("funnel_ooo").collect()
    }
    wm_final_us = hi * 1_000_000 // 1000 * 1000 - delay_s * 1_000_000
    finalized = df.filter(
        F.unix_micros(F.col("ts").cast("timestamp_ltz")) <= wm_final_us
    )
    expect = {
        (r.user_id, r.step_idx, r.step, r.reached_at)
        for r in funnel_stateful(finalized).collect()
    }
    assert got == expect and len(got) > 10


def test_funnel_retires_completed_and_idle_keys(spark, tmp_path):
    """funnel_stateful(retire_after=...) drops a key's state row once its
    buffer is drained and the watermark has passed its last machine
    advance by the horizon — completed-user tombstones (and stalled
    mid-funnel positions) are bounded by key LIVENESS, not all-time user
    cardinality (the r05 verdict's structural streaming risk). The
    event-time timeout doubles as the retirement alarm; emitted output is
    identical with and without retirement."""
    import os

    from airflow_etl_finance_market_spark.streaming.stateful import (
        funnel_stateful,
    )

    out = str(tmp_path / "funnel_retire_src")
    # user 1 COMPLETES the funnel in batch 0 (last advance ts=1020s) and
    # then goes silent forever; user 2 stays live into batch 2 with an
    # unfinalized row that must keep its state
    # user 3 advances once (view@1050) then keeps sending NON-advancing
    # views — the machine never moves, but the user is LIVE: the
    # retirement clock must run on the last finalized event, not the
    # last machine advance (round-6 review finding)
    batches = [
        [
            (1, 1000, "view"), (1, 1010, "click"), (1, 1020, "purchase"),
            (2, 1060, "view"), (3, 1050, "view"),
        ],
        [(2, 1200, "click"), (3, 1150, "view")],
        [(2, 1400, "view"), (3, 1250, "view")],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "user_id long, ts_s long, event_type string"
        ).select(
            "user_id", F.timestamp_seconds("ts_s").alias("ts"), "event_type"
        )
        pdir = f"{out}/b{i}"
        df.coalesce(1).write.parquet(pdir)
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                os.utime(f"{pdir}/{f}", (1_700_000_000 + i,) * 2)

    def drain(name, retire):
        stream = (
            spark.readStream.schema(
                "user_id long, ts timestamp, event_type string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{out}/b*")
        )
        q = (
            funnel_stateful(
                stream, delay="60 seconds", retire_after=retire
            )
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            n_state = [
                p["stateOperators"][0]["numRowsTotal"]
                for p in q.recentProgress
                if p.get("stateOperators")
            ][-1]
        finally:
            q.stop()
        rows = sorted(
            (r["user_id"], r["step_idx"], r["step"], r["reached_at"])
            for r in spark.table(name).collect()
        )
        return n_state, rows

    # final watermark = 1400s - 60s = 1340s; user 1's last finalized
    # event 1020s + 100s horizon = 1120s long passed -> retired. user 2
    # still buffers its unfinalized 1400s view -> kept. user 3's last
    # FINALIZED (non-advancing) view is 1250s -> 1350s > 1340s -> kept,
    # even though its last machine ADVANCE was back at 1050s.
    n_retire, rows_retire = drain("funnel_retire_on", "100 seconds")
    n_keep, rows_keep = drain("funnel_retire_off", None)
    assert n_retire == 2
    assert n_keep == 3  # completed user 1 keeps a tombstone forever
    assert rows_retire == rows_keep
    # user 1's full funnel + user 2's finalized prefix (view@1060,
    # click@1200) + user 3's single advance; the 1400s view stays
    # buffered/unfinalized and duplicate views never re-emit
    assert [(u, i, s) for u, i, s, _ in rows_retire] == [
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        (2, 1, "view"), (2, 2, "click"),
        (3, 1, "view"),
    ]


def test_media_signature_dedup_stream_equals_batch(spark, tmp_path):
    """dedup_by_signature: byte-different re-encodes of the same audio
    collapse to one survivor at the stream edge (fingerprint-keyed
    dropDuplicatesWithinWatermark), and the batch twin agrees on the
    surviving signature set. Quarantined payloads never reach the
    dedup state."""
    import hashlib

    from airflow_etl_finance_market_spark.multimodal.audio import (
        _stdlib_wav_codec,
        audio_fingerprints,
    )
    from airflow_etl_finance_market_spark.streaming import dedup_by_signature

    _, _, enc, _ = _stdlib_wav_codec()

    def lattice(seed: bytes, n: int = 8000) -> bytes:
        out = bytearray()
        i = 0
        while len(out) < n:
            out += hashlib.md5(seed + bytes([i & 0xFF, i >> 8])).digest()
            i += 1
        return bytes(out[:n])

    rows = []
    for fam in range(3):
        x = [(v - 128) << 8 for v in lattice(bytes([fam]))]
        base_us = 1_700_000_000_000_000 + fam * 1_000_000
        rows.append((fam * 10, base_us, bytearray(enc(8000, [x]))))
        rows.append((fam * 10 + 1, base_us, bytearray(enc(8000, [x, x]))))
    rows.append((90, 1_700_000_000_000_000, bytearray(b"junk")))
    in_dir = str(tmp_path / "media_in")
    spark.createDataFrame(
        rows, "doc_id long, ts long, payload binary"
    ).coalesce(1).write.mode("overwrite").parquet(in_dir)

    def pipeline(media):
        fps = audio_fingerprints(
            media.withColumn("ts", F.expr("timestamp_micros(ts)")),
            passthrough=("ts",),
        )
        return dedup_by_signature(fps, sig_col="afp", ts="ts")

    batch = pipeline(
        spark.read.schema("doc_id long, ts long, payload binary").parquet(
            in_dir
        )
    )
    stream = pipeline(
        spark.readStream.schema(
            "doc_id long, ts long, payload binary"
        ).parquet(in_dir)
    )
    got = run_available_now(stream, "media_dedup_eq", output_mode="append")
    stream_sigs = sorted(r.afp for r in got.collect())
    batch_sigs = sorted(r.afp for r in batch.collect())
    assert stream_sigs == batch_sigs
    assert len(stream_sigs) == 3  # one per family; junk quarantined
    assert all(r.doc_id // 10 in (0, 1, 2) for r in got.collect())


def test_image_signature_dedup_stream_equals_batch(spark, tmp_path):
    """The image twin: dedup_by_signature(sig_col='dhash') over
    image_dhash(passthrough=('ts',)) — re-encodes (PNG vs GIF palette)
    of the same pixels collapse at the stream edge, stream ≡ batch."""
    import hashlib

    from airflow_etl_finance_market_spark.multimodal.binary import (
        _stdlib_png_codec,
    )
    from airflow_etl_finance_market_spark.multimodal.gif import (
        _stdlib_gif_codec,
    )
    from airflow_etl_finance_market_spark.multimodal.phash import image_dhash
    from airflow_etl_finance_market_spark.streaming import dedup_by_signature

    _, _, png_enc, _ = _stdlib_png_codec()
    _, _, gif_enc = _stdlib_gif_codec()
    gray_pal = [(i, i, i) for i in range(256)]
    rows = []
    for fam in range(3):
        pix = bytearray()
        i = 0
        while len(pix) < 32 * 32:
            pix += hashlib.md5(bytes([fam, i])).digest()
            i += 1
        pix = bytes(pix[: 32 * 32])
        base_us = 1_700_000_000_000_000 + fam * 1_000_000
        rows.append((fam * 10, base_us, bytearray(png_enc(32, 32, 1, pix))))
        rows.append(
            (fam * 10 + 1, base_us, bytearray(gif_enc(32, 32, pix, gray_pal)))
        )
    in_dir = str(tmp_path / "img_in")
    spark.createDataFrame(
        rows, "doc_id long, ts long, payload binary"
    ).coalesce(1).write.mode("overwrite").parquet(in_dir)

    def pipeline(media):
        sigs = image_dhash(
            media.withColumn("ts", F.expr("timestamp_micros(ts)")),
            passthrough=("ts",),
        )
        return dedup_by_signature(sigs, sig_col="dhash", ts="ts")

    schema = "doc_id long, ts long, payload binary"
    batch = pipeline(spark.read.schema(schema).parquet(in_dir))
    stream = pipeline(spark.readStream.schema(schema).parquet(in_dir))
    got = run_available_now(stream, "img_dedup_eq", output_mode="append")
    assert sorted(r.dhash for r in got.collect()) == sorted(
        r.dhash for r in batch.collect()
    )
    assert got.count() == 3


def test_media_signature_dedup_carries_state_across_batches(spark, tmp_path):
    """A re-encode arriving in a LATER micro-batch (same event time,
    inside the watermark) must still dedup — dropDuplicatesWithinWatermark
    state carries across batch boundaries until the watermark passes."""
    import hashlib
    import os

    from airflow_etl_finance_market_spark.multimodal.audio import (
        _stdlib_wav_codec,
        audio_fingerprints,
    )
    from airflow_etl_finance_market_spark.streaming import dedup_by_signature

    _, _, enc, _ = _stdlib_wav_codec()

    def lattice(seed: bytes, n: int = 8000) -> bytes:
        out = bytearray()
        i = 0
        while len(out) < n:
            out += hashlib.md5(seed + bytes([i & 0xFF, i >> 8])).digest()
            i += 1
        return bytes(out[:n])

    x = [(v - 128) << 8 for v in lattice(b"xbatch")]
    y = [(v - 128) << 8 for v in lattice(b"other")]
    t0 = 1_700_000_000_000_000
    in_dir = tmp_path / "in"
    # batch 0: original (mono) + an unrelated clip
    spark.createDataFrame(
        [(1, t0, bytearray(enc(8000, [x]))), (2, t0, bytearray(enc(8000, [y])))],
        "doc_id long, ts long, payload binary",
    ).coalesce(1).write.parquet(str(in_dir / "b0"))
    # batch 1: the stereo re-encode of clip 1, 1 s later (within watermark)
    spark.createDataFrame(
        [(3, t0 + 1_000_000, bytearray(enc(8000, [x, x])))],
        "doc_id long, ts long, payload binary",
    ).coalesce(1).write.parquet(str(in_dir / "b1"))
    for i in range(2):
        d = str(in_dir / f"b{i}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.utime(f"{d}/{f}", (1_700_000_000 + i,) * 2)
    stream = (
        spark.readStream.schema("doc_id long, ts long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "b*"))
        .withColumn("ts", F.expr("timestamp_micros(ts)"))
    )
    got = run_available_now(
        dedup_by_signature(
            audio_fingerprints(stream, passthrough=("ts",)),
            sig_col="afp",
            ts="ts",
            watermark="1 hour",
        ),
        "media_dedup_xbatch",
        output_mode="append",
    )
    rows = sorted((r.doc_id for r in got.collect()))
    assert rows == [1, 2]  # doc 3's re-encode deduped ACROSS the boundary


# ---------------------------------------------------------------------------
# windowed_signature_ownership / windowed_dedup_verdicts — the SET-overlap
# (trim/crop-robust) dedup tier at the ingest edge (r10 verdict, gap #6)
# ---------------------------------------------------------------------------

_WSD_T0 = 1_700_000_000_000_000  # epoch micros


def _wsd_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, tsu long, afp long"
    ).select("doc_id", F.expr("timestamp_micros(tsu)").alias("ts"), "afp")


def _wsd_plant(spark, tmp_path, batches, name):
    """Write one parquet file per micro-batch, mtime-ordered."""
    in_dir = tmp_path / name
    for i, rows in enumerate(batches):
        d = str(in_dir / f"b{i}")
        _wsd_df(spark, rows).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.utime(f"{d}/{f}", (1_700_000_000 + i,) * 2)
    return (
        spark.readStream.schema("doc_id long, ts timestamp, afp long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "b*"))
    )


def _wsd_verdicts(df):
    from airflow_etl_finance_market_spark.streaming import (
        windowed_dedup_verdicts,
        windowed_signature_ownership,
    )

    own = windowed_signature_ownership(
        df, delay="5 minutes", retain="1 hour", max_hamming=4
    )
    if own.isStreaming:
        own = run_available_now(
            own, "wsd_own_" + str(abs(hash(df)) % 10_000), output_mode="append"
        )
    return windowed_dedup_verdicts(
        own.filter("doc_id >= 0"), min_match_frac=0.8
    )


_H = [0x1111111111111111, 0x2222222222222222, -0x3333333333333334,
      0x4444444444444444]
_G = [0x5555555555555555, -0x6666666666666667, 0x0F0F0F0F0F0F0F0F]


def test_windowed_signature_dedup_stream_equals_batch(spark, tmp_path):
    """The full contract on synthetic window-hash sets: an exact-subset
    clip (window-aligned trim) and a within-Hamming-4 re-encode both
    dedup against the original ACROSS micro-batch boundaries; an
    unrelated clip survives; stream verdicts == batch-twin verdicts
    row for row (the reorder-buffer discipline makes ownership a pure
    function of event time)."""
    b0 = [(1, _WSD_T0, x) for x in _H]
    b1 = [(2, _WSD_T0 + 600_000_000, x) for x in _H[1:]] + [
        (3, _WSD_T0 + 600_000_000, x) for x in _G
    ]
    b2 = [(4, _WSD_T0 + 1_200_000_000, _H[1] ^ 0b11)] + [
        (4, _WSD_T0 + 1_200_000_000, x) for x in _H[2:]
    ]
    sentinel = [(-1, _WSD_T0 + 10_800_000_000, 0x7777777777777777)]
    all_rows = b0 + b1 + b2 + sentinel

    batch_v = _rows(_wsd_verdicts(_wsd_df(spark, all_rows)))
    stream = _wsd_plant(spark, tmp_path, [b0, b1, b2, sentinel], "wsd_eq")
    stream_v = _rows(_wsd_verdicts(stream))
    assert stream_v == batch_v
    got = {r[0]: (r[5], r[6]) for r in stream_v}  # doc -> (is_dup, dup_of)
    assert got[1] == (False, None)
    assert got[2] == (True, 1)  # subset of 1's windows
    assert got[3] == (False, None)  # unrelated
    assert got[4] == (True, 1)  # hamming-2 variant of 1's windows


def test_windowed_signature_dedup_out_of_order_arrival(spark, tmp_path):
    """Rows buffer until the watermark passes them and are processed in
    EVENT-TIME order, so a clip whose rows ARRIVE first but are stamped
    later still loses ownership to the earlier-stamped clip — within
    the delay horizon any arrival order yields the batch result."""
    late_arriving_original = [(1, _WSD_T0, x) for x in _H]
    early_arriving_copy = [(2, _WSD_T0 + 120_000_000, x) for x in _H]
    sentinel = [(-1, _WSD_T0 + 10_800_000_000, 0x7777777777777777)]

    batch_v = _rows(
        _wsd_verdicts(
            _wsd_df(
                spark,
                late_arriving_original + early_arriving_copy + sentinel,
            )
        )
    )
    # copy's file lands FIRST; original's event time is earlier
    stream = _wsd_plant(
        spark,
        tmp_path,
        [early_arriving_copy, late_arriving_original, sentinel],
        "wsd_ooo",
    )
    stream_v = _rows(_wsd_verdicts(stream))
    assert stream_v == batch_v
    got = {r[0]: (r[5], r[6]) for r in stream_v}
    assert got[1] == (False, None)  # earlier event time owns
    assert got[2] == (True, 1)


def test_windowed_signature_hamming_boundary(spark):
    """Exactly max_hamming matches; max_hamming+1 does not (the
    pigeonhole block filter is lossless at the configured radius) —
    pinned on the batch twin, which shares the radius semantics."""
    from airflow_etl_finance_market_spark.streaming import (
        windowed_dedup_verdicts,
        windowed_signature_ownership,
    )

    flip4 = _H[0] ^ 0b1111
    flip5 = _H[0] ^ 0b11111
    rows = [(1, _WSD_T0, _H[0]), (2, _WSD_T0 + 1_000_000, flip4),
            (3, _WSD_T0 + 2_000_000, flip5)]
    v = windowed_dedup_verdicts(
        windowed_signature_ownership(
            _wsd_df(spark, rows), delay="5 minutes", max_hamming=4
        ),
        min_match_frac=0.8,
    )
    got = {r.doc_id: (r.is_duplicate, r.dup_of) for r in v.collect()}
    assert got[2] == (True, 1)
    # doc 3 is hamming 5 from doc 1 but hamming 1 from doc 2's variant —
    # chained drift attributes to the nearest REGISTERED hash, which is
    # exactly the sequential first-writer contract
    assert got[3] == (True, 2)
    lone = windowed_dedup_verdicts(
        windowed_signature_ownership(
            _wsd_df(spark, [rows[0], (9, _WSD_T0 + 1_000_000, flip5)]),
            delay="5 minutes",
            max_hamming=4,
        ),
        min_match_frac=0.8,
    )
    got2 = {r.doc_id: r.is_duplicate for r in lone.collect()}
    assert got2[9] is False


def test_windowed_signature_self_repeat_and_frac(spark):
    """A clip repeating its own window hash never matches itself, and
    the verdict counts DISTINCT hashes: 1 shared window out of 4
    distinct (0.25 < 0.8) stays a survivor."""
    from airflow_etl_finance_market_spark.streaming import (
        windowed_dedup_verdicts,
        windowed_signature_ownership,
    )

    rows = (
        [(1, _WSD_T0, x) for x in _H]
        + [(1, _WSD_T0, _H[0])]  # repeated window within the same clip
        + [(2, _WSD_T0 + 1_000_000, _H[0])]
        + [(2, _WSD_T0 + 1_000_000, x) for x in _G]
    )
    v = windowed_dedup_verdicts(
        windowed_signature_ownership(_wsd_df(spark, rows), delay="5 minutes"),
        min_match_frac=0.8,
    )
    got = {r.doc_id: r for r in v.collect()}
    assert got[1].n_windows == 4 and got[1].n_matched == 0
    assert not got[1].is_duplicate
    assert got[2].n_windows == 4 and got[2].n_matched == 1
    assert not got[2].is_duplicate
    assert abs(got[2].match_frac - 0.25) < 1e-9


def test_windowed_signature_state_eviction_past_retain(spark, tmp_path):
    """Ownership EXPIRES at the retention horizon: an exact re-upload
    arriving later than ``retain`` after the original's last sighting
    is NOT deduped (it re-registers as the new owner) — the bound that
    keeps ingest state O(horizon), with years-old re-uploads left to
    the stored-table batch tier."""
    from airflow_etl_finance_market_spark.streaming import (
        windowed_dedup_verdicts,
        windowed_signature_ownership,
    )

    orig = [(1, _WSD_T0, x) for x in _H]
    # 3 minutes later: past retain=2 minutes
    reupload = [(2, _WSD_T0 + 180_000_000, x) for x in _H]
    sentinel = [(-1, _WSD_T0 + 10_800_000_000, 0x7777777777777777)]
    stream = _wsd_plant(
        spark, tmp_path, [orig, reupload, sentinel], "wsd_evict"
    )
    own = windowed_signature_ownership(
        stream, delay="1 minute", retain="2 minutes", max_hamming=4
    )
    tbl = run_available_now(own, "wsd_evict_own", output_mode="append")
    v = windowed_dedup_verdicts(tbl.filter("doc_id >= 0"))
    got = {r.doc_id: r.is_duplicate for r in v.collect()}
    assert got == {1: False, 2: False}


def test_audio_windowed_dedup_ingest_stream_equals_batch(spark, tmp_path):
    """End-to-end media shape (the gate's pipeline): WAV payloads →
    audio_window_fingerprints(passthrough=ts) → ownership → verdicts.
    A window-aligned trim and its stereo re-encode arriving in LATER
    micro-batches dedup against the original via state carried across
    batch boundaries; the unrelated family survives; stream == batch."""
    from airflow_etl_finance_market_spark.fixtures import (
        wav_trim_family_members,
    )
    from airflow_etl_finance_market_spark.multimodal.audio import (
        audio_window_fingerprints,
    )
    from airflow_etl_finance_market_spark.streaming import (
        windowed_dedup_verdicts,
        windowed_signature_ownership,
    )

    members = wav_trim_family_members()
    fams = {fam: members(f"wsd media {fam}") for fam in (1, 2)}
    batches = [
        [(fam * 10, _WSD_T0, bytearray(fams[fam][0])) for fam in fams],
        [(fam * 10 + 1, _WSD_T0 + 600_000_000, bytearray(fams[fam][1]))
         for fam in fams],
        [(fam * 10 + 2, _WSD_T0 + 1_200_000_000, bytearray(fams[fam][2]))
         for fam in fams],
        [(-1, _WSD_T0 + 10_800_000_000,
          bytearray(fams[1][0]))],  # sentinel: flushes the watermark
    ]
    in_dir = tmp_path / "wsd_audio"
    for i, rows in enumerate(batches):
        d = str(in_dir / f"b{i}")
        spark.createDataFrame(
            rows, "doc_id long, tsu long, payload binary"
        ).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.utime(f"{d}/{f}", (1_700_000_000 + i,) * 2)

    def pipeline(media):
        fps = audio_window_fingerprints(
            media.withColumn("ts", F.expr("timestamp_micros(tsu)")),
            passthrough=("ts",),
        )
        own = windowed_signature_ownership(
            fps, delay="5 minutes", retain="1 hour", max_hamming=4
        )
        if own.isStreaming:
            own = run_available_now(
                own, "wsd_audio_own", output_mode="append"
            )
        return windowed_dedup_verdicts(
            own.filter("doc_id >= 0"), min_match_frac=0.8
        )

    schema = "doc_id long, tsu long, payload binary"
    batch_v = _rows(pipeline(spark.read.schema(schema).parquet(
        str(in_dir / "b*"))))
    stream_v = _rows(pipeline(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "b*"))
    ))
    assert stream_v == batch_v
    got = {r[0]: (r[5], r[6]) for r in stream_v}
    for fam in (1, 2):
        assert got[fam * 10] == (False, None)  # the original survives
        assert got[fam * 10 + 1] == (True, fam * 10)  # aligned trim
        assert got[fam * 10 + 2] == (True, fam * 10)  # stereo re-encode


def test_windowed_dedup_checkpoint_restart_restores_registry(
    spark, tmp_path
):
    """Kill-and-restart for the windowed-signature tier: run availableNow
    over the original's batch with a checkpoint, stop, then deliver an
    exact copy in a NEW file and re-run with the SAME checkpoint. The
    restart must (a) process only the new file, (b) restore the
    per-block hash registry so the copy's windows match entries
    REGISTERED IN THE PREVIOUS RUN, (c) never duplicate sink rows —
    the restartable daily-ingest shape."""
    from airflow_etl_finance_market_spark.streaming import (
        windowed_dedup_verdicts,
        windowed_signature_ownership,
    )
    from airflow_etl_finance_market_spark.streaming.io import (
        run_available_now_to_parquet,
    )

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def plant(name, rows, mtime):
        d = str(src / name)
        _wsd_df(spark, rows).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.utime(f"{d}/{f}", (mtime,) * 2)

    # run 1: the original + a mid sentinel that advances the watermark
    # far enough for the original to emit and REGISTER before shutdown
    plant("b0", [(1, _WSD_T0, x) for x in _H], 1_700_000_000)
    plant("b1", [(-2, _WSD_T0 + 1_200_000_000, 0x7777777777777777)],
          1_700_000_001)

    def own_stream():
        stream = (
            spark.readStream.schema("doc_id long, ts timestamp, afp long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "b*"))
        )
        return windowed_signature_ownership(
            stream, delay="5 minutes", retain="1 hour", max_hamming=4
        )

    run_available_now_to_parquet(own_stream(), out, ckpt)
    rows_after_first = spark.read.parquet(out).count()
    assert rows_after_first == len(_H)  # original's presence rows only

    # run 2: an exact copy arrives in a new file; the final sentinel
    # flushes it. Same checkpoint -> offsets + state restored.
    plant("b2", [(2, _WSD_T0 + 1_500_000_000, x) for x in _H],
          1_700_000_002)
    plant("b3", [(-3, _WSD_T0 + 10_800_000_000, 0x0F0F0F0F0F0F0F0F)],
          1_700_000_003)
    run_available_now_to_parquet(own_stream(), out, ckpt)

    sink = spark.read.parquet(out)
    v = windowed_dedup_verdicts(sink.filter("doc_id >= 0"))
    got = {r.doc_id: (r.is_duplicate, r.dup_of) for r in v.collect()}
    assert got[1] == (False, None)
    assert got[2] == (True, 1)  # matched the RESTORED registry
    # exactly-once: the original's rows were not re-emitted on restart
    assert sink.filter("doc_id = 1").count() == len(_H)


def test_windowed_dedup_state_bounded_by_retention(spark, tmp_path):
    """The state-store row count must DROP once the watermark passes
    last_seen + retain — the mechanical form of the bounded-state
    claim (buckets are removed via event-time timeouts, not merely
    ignored). Peak state covers the original's 4 hashes x 5 blocks;
    after the horizon only the final flusher's held buckets remain."""
    from airflow_etl_finance_market_spark.streaming import (
        windowed_signature_ownership,
    )

    src = tmp_path / "evict_src"
    batches = [
        [(1, _WSD_T0, x) for x in _H],
        [(-2, _WSD_T0 + 180_000_000, 0x7777777777777777)],
        [(-3, _WSD_T0 + 1_800_000_000, 0x0F0F0F0F0F0F0F0F)],
    ]
    for i, rows in enumerate(batches):
        d = str(src / f"b{i}")
        _wsd_df(spark, rows).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.utime(f"{d}/{f}", (1_700_000_000 + i,) * 2)
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, afp long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    own = windowed_signature_ownership(
        stream, delay="1 minute", retain="2 minutes", max_hamming=4
    )
    q = (
        own.writeStream.outputMode("append")
        .format("memory")
        .queryName("wsd_state_bound")
        .start()
    )
    try:
        q.processAllAvailable()
        counts = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in q.recentProgress
            if p.get("stateOperators")
        ]
    finally:
        q.stop()
    peak, final = max(counts), counts[-1]
    # original: 4 hashes x 5 blocks = 20 buckets at peak (plus flusher
    # buckets); final: only the unflushed -3 row's 5 held buckets
    assert peak >= 20
    assert final <= 6
    assert final < peak


def test_windowed_dedup_foreachbatch_survivor_sink(spark, tmp_path):
    """run_windowed_dedup_to_parquet: the end-to-end ingest shape —
    ownership stream → per-micro-batch verdicts → only SURVIVORS reach
    the parquet table. Per-batch reduction is exact because a clip's
    ownership rows all flush in one trigger; the survivor set equals
    the whole-sink batch reduction."""
    from airflow_etl_finance_market_spark.streaming import (
        windowed_signature_ownership,
    )
    from airflow_etl_finance_market_spark.streaming.io import (
        run_windowed_dedup_to_parquet,
    )

    b0 = [(1, _WSD_T0, x) for x in _H]
    b1 = [(2, _WSD_T0 + 600_000_000, x) for x in _H[1:]] + [
        (3, _WSD_T0 + 600_000_000, x) for x in _G
    ]
    sentinel = [(-1, _WSD_T0 + 10_800_000_000, 0x7777777777777777)]
    stream = _wsd_plant(spark, tmp_path, [b0, b1, sentinel], "wsd_sink")
    own = windowed_signature_ownership(stream, delay="5 minutes")
    out = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "wsd_sink_ckpt")
    run_windowed_dedup_to_parquet(own, out, ckpt)
    got = spark.read.parquet(out).filter("doc_id >= 0")
    assert sorted(r.doc_id for r in got.collect()) == [1, 3]
    assert "is_duplicate" not in got.columns  # survivors-only projection


def test_windowed_dedup_is_modality_agnostic_image_tiles(spark, tmp_path):
    """The SAME ownership operator closes the CROP-robust image tier at
    the ingest edge: tile dHashes (image_tile_dhash with the event-time
    passthrough) through windowed_signature_ownership — a tile-aligned
    crop arriving in a LATER micro-batch dedups against its original;
    the unrelated image survives."""
    from airflow_etl_finance_market_spark.fixtures import (
        tile_crop_family_members,
    )
    from airflow_etl_finance_market_spark.multimodal.phash import (
        image_tile_dhash,
    )
    from airflow_etl_finance_market_spark.streaming import (
        windowed_dedup_verdicts,
        windowed_signature_ownership,
    )

    members = tile_crop_family_members()
    fam_a = members("wsd img A")  # full 128x128 / aligned crop / GIF crop
    fam_b = members("wsd img B")
    batches = [
        [(10, _WSD_T0, bytearray(fam_a[0])),
         (20, _WSD_T0, bytearray(fam_b[0]))],
        [(11, _WSD_T0 + 600_000_000, bytearray(fam_a[1]))],
        [(-1, _WSD_T0 + 10_800_000_000, bytearray(fam_b[0]))],
    ]
    src = tmp_path / "wsd_img"
    for i, rows in enumerate(batches):
        d = str(src / f"b{i}")
        spark.createDataFrame(
            rows, "doc_id long, tsu long, payload binary"
        ).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.utime(f"{d}/{f}", (1_700_000_000 + i,) * 2)
    stream = (
        spark.readStream.schema("doc_id long, tsu long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
        .withColumn("ts", F.expr("timestamp_micros(tsu)"))
    )
    sigs = image_tile_dhash(stream, passthrough=("ts",))
    own = windowed_signature_ownership(
        sigs, sig_col="dhash", delay="5 minutes", max_hamming=4
    )
    tbl = run_available_now(own, "wsd_img_own", output_mode="append")
    v = windowed_dedup_verdicts(
        tbl.filter("doc_id >= 0"), sig_col="dhash", min_match_frac=0.8
    )
    got = {r.doc_id: (r.is_duplicate, r.dup_of) for r in v.collect()}
    assert got[10] == (False, None)
    assert got[20] == (False, None)
    # the crop's 9 tiles are 9 of the original's 16 — overlap 1.0 on
    # the crop's side, cross-micro-batch via the restored registry
    assert got[11] == (True, 10)


class TestStreamingDecontamination:
    """Decontamination at the stream edge (r15): Bloom pre-gate in-plan
    (stateless, exactly-clean majority), exact n-gram verify per
    micro-batch — stream output must equal the batch contamination twin
    on a 3-micro-batch file replay."""

    DOCS = [
        # exact copy of benchmark doc -> contaminated, many overlaps
        (1, "held out test sentences must never leak into training data"),
        # shares exactly one trigram with the benchmark
        (2, "totally separate text but held out test material appears here"),
        (3, "an entirely unrelated training document about cooking pasta"),
        (4, None),  # NULL text: no grams, exactly clean
        (5, "another clean page describing bicycle repair techniques"),
        (6, "question answer pairs for the benchmark evaluation suite v1"),
    ]
    BENCH = [
        (100, "held out test sentences must never leak into training data"),
        (101, "question answer pairs for the benchmark evaluation suite v1"),
    ]

    def _frames(self, spark):
        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        # contamination_flags (the batch twin) fans the benchmark out on
        # its own id_col name, so the bench frame shares the column name
        bench = spark.createDataFrame(self.BENCH, "doc_id long, text string")
        return docs, bench

    def test_pregate_has_no_false_negatives(self, spark):
        from airflow_etl_finance_market_spark.functions.text import word_ngrams
        from airflow_etl_finance_market_spark.operators.bloom import bloom_build
        from airflow_etl_finance_market_spark.operators.corpus import (
            contamination_flags,
        )
        from airflow_etl_finance_market_spark.streaming import (
            contamination_pregate_flags,
        )

        docs, bench = self._frames(spark)
        grams = bench.select(
            F.explode(F.array_distinct(word_ngrams("text", 3))).alias("gram")
        ).distinct()
        bf = bloom_build(grams, "gram")
        flagged = {
            r.doc_id: r.maybe_contaminated
            for r in contamination_pregate_flags(docs, bf).collect()
        }
        truth = {
            r.doc_id: r.contaminated
            for r in contamination_flags(docs, bench).collect()
        }
        # Bloom contract: every truly contaminated doc is flagged
        for i, c in truth.items():
            if c:
                assert flagged[i], f"false negative on doc {i}"
        # NULL text is exactly clean
        assert flagged[4] is False

    def test_stream_equals_batch_contamination(self, spark, tmp_path):
        from airflow_etl_finance_market_spark.operators.corpus import (
            contamination_flags,
        )
        from airflow_etl_finance_market_spark.streaming import (
            run_decontaminate_to_parquet,
        )

        docs, bench = self._frames(spark)
        src = str(tmp_path / "docs")
        for i, chunk in enumerate(
            [self.DOCS[:2], self.DOCS[2:4], self.DOCS[4:]]
        ):
            spark.createDataFrame(
                chunk, "doc_id long, text string"
            ).coalesce(1).write.parquet(f"{src}/b{i}")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/b*")
        )
        clean_p = str(tmp_path / "clean")
        quar_p = str(tmp_path / "quarantine")
        run_decontaminate_to_parquet(
            stream, bench, clean_p, quar_p, str(tmp_path / "ckpt")
        )
        truth = {
            r.doc_id: (r.contaminated, r.n_overlap_grams)
            for r in contamination_flags(docs, bench).collect()
        }
        quarantined = {
            r.doc_id: r.n_overlap_grams
            for r in spark.read.parquet(quar_p).collect()
        }
        clean_ids = {
            r.doc_id for r in spark.read.parquet(clean_p).collect()
        }
        assert quarantined == {
            i: n for i, (c, n) in truth.items() if c
        }
        assert clean_ids == {i for i, (c, _) in truth.items() if not c}
        assert clean_ids | set(quarantined) == {i for i, _ in self.DOCS}
        # the one-trigram overlap is counted exactly
        assert quarantined[2] == 1

    def test_restart_with_checkpoint_is_incremental(self, spark, tmp_path):
        """The checkpoint contract the sink docstring claims: re-running
        with the same checkpoint after NEW files arrive processes only
        the new data — no duplicate rows in either sink."""
        from airflow_etl_finance_market_spark.streaming import (
            run_decontaminate_to_parquet,
        )

        docs, bench = self._frames(spark)
        src = str(tmp_path / "docs")
        spark.createDataFrame(
            self.DOCS[:4], "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{src}/b0")
        stream_args = dict(
            clean_path=str(tmp_path / "clean"),
            quarantine_path=str(tmp_path / "quarantine"),
            checkpoint=str(tmp_path / "ckpt"),
        )

        def run():
            s = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{src}/b*")
            )
            run_decontaminate_to_parquet(s, bench, **stream_args)

        run()
        first_clean = {
            r.doc_id
            for r in spark.read.parquet(stream_args["clean_path"]).collect()
        }
        # docs 1 (exact copy) and 2 (one shared trigram) quarantine
        assert first_clean == {3, 4}
        # new micro-batch arrives; SAME checkpoint
        spark.createDataFrame(
            self.DOCS[4:], "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{src}/b1")
        run()
        clean_ids = [
            r.doc_id
            for r in spark.read.parquet(stream_args["clean_path"]).collect()
        ]
        quar_ids = [
            r.doc_id
            for r in spark.read.parquet(
                stream_args["quarantine_path"]
            ).collect()
        ]
        # incremental: docs 1-4 processed exactly once, 5-6 appended once
        assert sorted(clean_ids) == [3, 4, 5]
        assert sorted(quar_ids) == [1, 2, 6]
