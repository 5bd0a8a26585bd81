"""Structured Streaming window/stateful operators.

The reference needs none of these (keyed upsert + full-doc recompute
makes late data a non-issue, ``index/Indices.java:210-213``) — they are
part of the beyond-reference surface: event-time windowed aggregation
with watermarks, and a custom stateful sessionizer via
``applyInPandasWithState`` (the Spark-native home for operators the
built-ins can't express, SURVEY task sheet)."""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time windows with a watermark bounding state:
    late rows beyond the watermark are dropped, everything else lands in
    its event-time window. Works identically on batch frames (no-op
    watermark) — the batch shape is oracle-checked as e01."""
    w = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        w.groupBy(F.window(F.col(ts_col), window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def ohlc_stream(
    events: DataFrame,
    key_cols: list[str],
    value_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    order_col: str | None = None,
) -> DataFrame:
    """Streaming twin of :func:`operators.temporal.ohlc` — candlestick
    bars over event-time tumbling windows: open/close via
    ``min_by``/``max_by`` on the event timestamp, high/low/count. Every
    aggregate is mergeable, so each window's state is one partial
    aggregate per (key, window) — constant memory per bar regardless of
    event rate — and the watermark bounds how many windows stay open.
    ``order_col`` breaks duplicate-timestamp ties exactly as in the
    batch operator: open/close order by the composite ``(ts,
    order_col)`` struct, keeping bars deterministic (and equal to the
    batch result) when two events share a timestamp. Works identically
    on batch frames (no-op watermark); the batch shape is
    oracle-checked as e12."""
    w = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    v, t = F.col(value_col), F.col(ts_col)
    order = t if order_col is None else F.struct(t, F.col(order_col))
    return (
        w.groupBy(F.window(t, window).alias("win"), *key_cols)
        .agg(
            F.min_by(v, order).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order).alias("close"),
            F.count(v).alias("n_events"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            *key_cols,
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


SESSION_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long"
)
SESSION_STATE_SCHEMA = "start long, last long, n long"


def _session_fn(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Gap-based sessionization: events for a user extend the open
    session; an event arriving > 30 min after the last closes and emits
    the previous session. The open session stays in state until gap
    evidence arrives (no processing-time timeout: timer wake-ups keep
    the stream permanently busy — they generate endless empty
    micro-batches and ``processAllAvailable`` never drains; an
    event-time watermark closing idle sessions is the scalable
    alternative)."""
    gap = 1800
    out = []
    rows = pd.concat(list(pdfs))
    secs = sorted(int(s) for s in rows["sec"])
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = None, None, 0
    for s in secs:
        if start is None:
            start, last, n = s, s, 1
        elif s - last > gap:
            out.append((key[0], start, last, n))
            start, last, n = s, s, 1
        else:
            last, n = max(last, s), n + 1
    state.update((start, last, n))
    yield pd.DataFrame(
        out, columns=["user_id", "session_start", "session_end", "n_events"]
    )


def sessionize_stream(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Custom stateful sessionizer over a stream of (user_id, ts ns):
    ``applyInPandasWithState`` keeps one open session per user and emits
    closed sessions. State is per-key and partitioned by user_id — the
    operator scales out with the key space."""
    prepared = events.select(
        "user_id", F.expr(f"{ts_col} div 1000000000").alias("sec")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key seen
    within the watermark horizon (``dropDuplicatesWithinWatermark``) —
    the streaming counterpart of the batch content-hash dedup (d01) for
    ingest pipelines fed by at-least-once sources.

    State size is bounded by keys-per-watermark-window (old key state is
    evicted as the watermark advances), so this runs indefinitely at any
    rate — unlike unbounded ``dropDuplicates`` whose state grows forever.
    A duplicate arriving later than the watermark may be re-emitted;
    that is the documented at-least-once tradeoff, and exactly why the
    downstream batch dedup (d01/d02) still runs.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


FUNNEL_SCHEMA = (
    "user_id long, view_ts long, click_ts long, purchase_ts long"
)
FUNNEL_STATE_SCHEMA = (
    "buf_ts array<long>, buf_stage array<int>, th array<long>"
)
_FUNNEL_STAGES = 3


def _funnel_fn(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Watermark-ordered fold: stage thresholds (first view, first click
    strictly after it, first purchase strictly after that) are only
    correct if events fold in EVENT-TIME order, but micro-batches are
    arrival-ordered. So events buffer in state until the watermark
    passes them — after which nothing earlier can arrive — then fold in
    sorted order, keeping thresholds monotone and exact under
    out-of-order delivery. An EVENT-TIME timeout re-invokes keys absent
    from later batches once the watermark passes their buffered events
    (data-driven — no processing-time timer churn); state is bounded by
    events inside the watermark horizon per user."""
    if state.exists:
        buf_ts, buf_stage, th = state.get
        buf_ts, buf_stage, th = list(buf_ts), list(buf_stage), list(th)
    else:
        buf_ts, buf_stage, th = [], [], [None] * _FUNNEL_STAGES
    if not state.hasTimedOut:
        for pdf in pdfs:
            for t, s in zip(pdf["ts_us"], pdf["stage"]):
                buf_ts.append(int(t))
                buf_stage.append(int(s))
    wm_ms = state.getCurrentWatermarkMs()
    wm_us = wm_ms * 1000
    ready = sorted(
        (t, s) for t, s in zip(buf_ts, buf_stage) if t <= wm_us
    )
    pending = [(t, s) for t, s in zip(buf_ts, buf_stage) if t > wm_us]
    changed = False
    for t, s in ready:
        if s == 0:
            if th[0] is None:
                th[0], changed = t, True
        elif th[s] is None and th[s - 1] is not None and t > th[s - 1]:
            th[s], changed = t, True
    state.update((
        [t for t, _ in pending], [s for _, s in pending], th,
    ))
    if pending:
        # wake when the watermark passes the earliest buffered event
        # (timeout timestamps must sit beyond the current watermark)
        state.setTimeoutTimestamp(
            max(min(t for t, _ in pending) // 1000, wm_ms + 1)
        )
    if changed:
        yield pd.DataFrame(
            [(key[0], th[0], th[1], th[2])],
            columns=["user_id", "view_ts", "click_ts", "purchase_ts"],
        )
    else:
        yield pd.DataFrame(
            columns=["user_id", "view_ts", "click_ts", "purchase_ts"]
        ).astype({"user_id": "int64", "view_ts": "float64",
                  "click_ts": "float64", "purchase_ts": "float64"})


def funnel_stream(
    events: DataFrame,
    stages: tuple = ("view", "click", "purchase"),
    ts_col: str = "ts_us",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming ordered-conversion funnel — the stateful counterpart of
    the batch e08 query (first view, first click strictly after it,
    first purchase strictly after that), exact under out-of-order
    arrival via the watermark-ordered fold in ``_funnel_fn``. Emits an
    updated (user, stage timestamps) row whenever a threshold advances;
    once the watermark passes a user's events, their row equals the
    batch semantics. ``ts_col`` is epoch MICROSECONDS."""
    if len(stages) != _FUNNEL_STAGES:
        raise ValueError("funnel_stream supports exactly 3 stages")
    mapping = F.create_map(
        *[x for i, s in enumerate(stages) for x in (F.lit(s), F.lit(i))]
    )
    prepared = (
        events.where(F.col("event_type").isin(*stages))
        .select(
            "user_id",
            F.col(ts_col).alias("ts_us"),
            mapping[F.col("event_type")].alias("stage"),
            F.timestamp_micros(F.col(ts_col)).alias("__et"),
        )
        .withWatermark("__et", watermark)
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
