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


def _make_funnel_fn(max_gap_us: int | None = None):
    """Build the funnel fold with an optional conversion window —
    stage s must land within ``max_gap_us`` of stage s−1 (the batch
    ``funnel(max_gap=...)`` rule)."""

    def fn(key, pdfs, state):
        return _funnel_fold(key, pdfs, state, max_gap_us)

    return fn


def _funnel_fn(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    return _funnel_fold(key, pdfs, state, None)


def _funnel_fold(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState,
    max_gap_us: int | None,
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
        elif (
            th[s] is None
            and th[s - 1] is not None
            and t > th[s - 1]
            and (max_gap_us is None or t <= th[s - 1] + max_gap_us)
        ):
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
    max_gap_us: int | None = None,
) -> DataFrame:
    """Streaming ordered-conversion funnel — the stateful counterpart of
    the batch e08 query (first view, first click strictly after it,
    first purchase strictly after that), exact under out-of-order
    arrival via the watermark-ordered fold in ``_funnel_fn``. Emits an
    updated (user, stage timestamps) row whenever a threshold advances;
    once the watermark passes a user's events, their row equals the
    batch semantics. ``ts_col`` is epoch MICROSECONDS. ``max_gap_us``
    adds the conversion window of the batch ``funnel(max_gap=...)``
    rule (stage s within ``max_gap_us`` of stage s−1); the aggregate
    counts/rates view over these per-user rows is the batch e13
    ``funnel`` operator."""
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
        _funnel_fn if max_gap_us is None else _make_funnel_fn(max_gap_us),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


GAPFILL_STATE_SCHEMA = (
    "open_buckets array<long>, open_sums array<long>, "
    "open_counts array<long>, prev_bucket long, prev_sum long, "
    "prev_count long"
)


def _spark_round(x: float, digits: int) -> float:
    """Replicate Spark's ``F.round`` on doubles (HALF_UP over the
    shortest-round-trip decimal repr, i.e. BigDecimal.valueOf) so the
    stream emits the batch operator's exact doubles."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(
        Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP)
    )


def gapfill_stream(
    events: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    stride: int = 3600,
    watermark: str = "2 hours",
    exact_decimals: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Streaming twin of :func:`operators.temporal.gapfill` (round-9
    verdict task 5 — e11's other TimescaleDB-family operator gets the
    ohlc_stream treatment): regularize per-key event series onto the
    fixed ``stride`` grid and fill holes with locf + linear
    interpolation, emitting each grid row exactly once.

    One ``applyInPandasWithState`` per key (EventTimeTimeout):

    * open buckets accumulate EXACT integer sums
      (``round(v·10^exact_decimals)`` as int64) — associative, so
      chunking/micro-batch boundaries cannot perturb a bucket average
      by an ulp; the float ops (one division, the interp formula,
      ``_spark_round``) replay the batch operator's expression tree
      bit-for-bit;
    * a bucket CLOSES when the watermark passes its end — late rows
      inside the watermark still land in their bucket first;
    * closing bucket ``b`` emits the gap rows since the previous
      closed bucket (``v_obs`` NULL, ``v_locf`` carried forward,
      ``v_interp`` linear between the bracketing observations) and
      then ``b`` itself — exactly the batch grid, which spans observed
      buckets only, so stream output CONVERGES to batch ``gapfill``
      row-for-row and double-for-double;
    * the event-time timer re-arms to the earliest open bucket's end,
      so an idle key's buckets flush when the GLOBAL watermark passes
      them — no sentinel-per-key needed (the sessionizer's
      processing-time-timeout trap doesn't apply: event-time timers
      fire off the watermark, not wall clock).

    State per key: the open buckets inside the watermark horizon plus
    one closed (bucket, sum, count) for locf continuation — O(horizon/
    stride) rows, watermark-bounded; the keeper row lives for the key's
    lifetime (TTL it in production if keys churn)."""
    from pyspark.sql import types as T

    if exact_decimals is None:
        raise ValueError(
            "gapfill_stream requires exact_decimals: chunked partial "
            "sums are only order-independent with integer accounting"
        )
    scale = 10 ** exact_decimals
    keys = list(key_cols)
    key_fields = [events.schema[k] for k in keys]
    out_schema = T.StructType(
        key_fields
        + [
            T.StructField("bucket", T.LongType()),
            T.StructField("v_obs", T.DoubleType()),
            T.StructField("v_locf", T.DoubleType()),
            T.StructField("v_interp", T.DoubleType()),
        ]
    )
    out_cols = keys + ["bucket", "v_obs", "v_locf", "v_interp"]

    def fill(key, pdfs, state):
        if state.exists:
            ob, osum, ocnt, pb, ps, pc = state.get
            open_ = {
                int(b): (int(s), int(n))
                for b, s, n in zip(ob, osum, ocnt)
            }
        else:
            open_, pb, ps, pc = {}, None, None, None
        for pdf in pdfs:
            for b, c in zip(pdf["__b"], pdf["__c"]):
                s0, n0 = open_.get(int(b), (0, 0))
                open_[int(b)] = (s0 + int(c), n0 + 1)
        wm_sec = state.getCurrentWatermarkMs() / 1000.0
        out = []
        for b in sorted(open_):
            if wm_sec < b + stride:
                break
            s, n = open_.pop(b)
            v = s / (n * float(scale))
            if pb is None:
                out.append(
                    key
                    + (
                        b,
                        _spark_round(v, round_to),
                        _spark_round(v, round_to),
                        _spark_round(v, round_to),
                    )
                )
            else:
                pv = ps / (pc * float(scale))
                for g in range(pb + stride, b, stride):
                    # batch expression tree: pv + ((v-pv)*(g-pb))/(b-pb)
                    interp = pv + (v - pv) * (g - pb) / (b - pb)
                    out.append(
                        key
                        + (
                            g,
                            None,
                            _spark_round(pv, round_to),
                            _spark_round(interp, round_to),
                        )
                    )
                out.append(
                    key
                    + (
                        b,
                        _spark_round(v, round_to),
                        _spark_round(v, round_to),
                        _spark_round(v, round_to),
                    )
                )
            pb, ps, pc = b, s, n
        remaining = sorted(open_)
        state.update(
            (
                remaining,
                [open_[b][0] for b in remaining],
                [open_[b][1] for b in remaining],
                pb,
                ps,
                pc,
            )
        )
        if remaining:
            # fire when the earliest open bucket becomes closable;
            # guaranteed > current watermark (we just closed the rest)
            state.setTimeoutTimestamp((remaining[0] + stride) * 1000)
        res = pd.DataFrame(out, columns=out_cols)
        if len(res):
            res["v_obs"] = pd.array(
                [r[len(keys) + 1] for r in out], dtype="Float64"
            )
        yield res

    prepared = events.withWatermark(ts_col, watermark).select(
        *keys,
        F.col(ts_col),  # the watermark attribute must reach the op
        (
            (F.floor(F.col(ts_col).cast("double") / F.lit(stride)) * stride)
            .cast("long")
        ).alias("__b"),
        F.round(F.col(value_col) * scale).cast("long").alias("__c"),
    )
    return prepared.groupBy(*keys).applyInPandasWithState(
        fill,
        out_schema,
        GAPFILL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
