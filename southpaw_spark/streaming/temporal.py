"""Streaming as-of join: a stream probing broadcast batch state.

The batch :func:`southpaw_spark.operators.temporal.asof_join` is a
union-and-window plan — correct and one-shuffle in batch, but a window
over an unbounded stream is not executable, and re-unioning the full
static side into every micro-batch would re-shuffle unchanged state per
trigger. The stream-batch formulation here is the plan you'd want at
100 TB of stream:

1. :func:`asof_state` — ONCE per state refresh, group the right side
   into one row per key holding its (ts, payload) entries time-sorted
   (``sort_array`` over structs → ties resolve to the max payload
   struct, the exact tie-break of the batch operator). Cache it.
2. :func:`asof_join_stream` — the stream left-joins the *broadcast*
   state (a stream-static join, fully supported by Structured
   Streaming) and each event picks its match from the key's sorted
   array with ``filter`` + ``try_element_at`` — pure JVM codegen
   projection, ZERO shuffles per micro-batch, watermarks pass through
   untouched, any sink/output-mode works.

Per-event cost is linear in that key's state entries — the right trade
when state is broadcast-sized (the reference's join state is an indexed
RocksDB the executor consults per record, ``index/Indices.java``; a
broadcast sorted array is the Spark-native equivalent).

The same functions run unchanged on a batch left side (they are plain
DataFrame ops), which is how the e04-parity tests pin the semantics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from southpaw_spark.operators.temporal import _orderable

_ARR = "__asof_state"
_TS = "__ts"
_ROW = "__row"


def asof_state(
    right: DataFrame,
    on: Sequence[str],
    right_ts: str,
    max_state_rows: int | None = 10_000_000,
) -> DataFrame:
    """Build broadcastable as-of state: one row per ``on`` key with all
    (timestamp, payload) entries sorted ascending by (ts, payload) —
    the deterministic duplicate-ts tie-break of the batch operator.
    Null-timestamp rows can never match; they are dropped here, exactly
    as in the batch plan. Call ``.cache()`` on the result so the
    groupBy runs once, not once per trigger.

    ``max_state_rows`` guards the broadcast assumption: the stream plan
    ships this whole table to every executor, so state past broadcast
    size is a silent executor-OOM footgun at scale. The build counts the
    right side (one job, once per state refresh — not per trigger) and
    fails loudly past the threshold, naming the non-broadcast fallbacks.
    Pass ``None`` to disable (e.g. state known-bounded upstream)."""
    on = list(on)
    if max_state_rows is not None:
        n = right.count()
        if n > max_state_rows:
            raise ValueError(
                f"asof_state: right side has {n:,} rows > max_state_rows="
                f"{max_state_rows:,} — broadcast state this large risks "
                "executor OOM. Raise max_state_rows only if every executor "
                "can hold it; otherwise use asof_join_auto (picks the "
                "non-broadcast fallback automatically) or wire one by hand: "
                "foreachBatch + operators.temporal.asof_join (per-batch "
                "union-and-window, shuffles the state each trigger) or "
                "asof_join_stream_stream (watermarked interval join, "
                "horizon-bounded state) for stream-stream."
            )
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    entry = F.struct(
        F.col(right_ts).alias(_TS),
        F.struct(*[F.col(c) for c in rcols]).alias(_ROW),
    )
    agg = F.collect_list(entry)
    if _orderable(right.schema[c].dataType for c in rcols):
        arr = F.sort_array(agg)
    else:
        # unorderable payload (e.g. a map): sort by ts alone; the winner
        # among exactly-tied right timestamps is then partition-order-
        # dependent — same documented caveat as the batch operator.
        arr = F.array_sort(
            agg,
            lambda a, b: F.when(a[_TS] < b[_TS], F.lit(-1))
            .when(a[_TS] > b[_TS], F.lit(1))
            .otherwise(F.lit(0)),
        )
    return (
        right.where(F.col(right_ts).isNotNull())
        .groupBy(*on)
        .agg(arr.alias(_ARR))
    )


def asof_join_stream(
    left: DataFrame,
    state: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance: int | None = None,
    direction: str = "backward",
    broadcast_state: bool = True,
) -> DataFrame:
    """As-of join a (streaming or batch) left side against prepared
    :func:`asof_state`. Output schema and semantics match the batch
    ``asof_join``: left columns + matched ``right_ts`` + matched payload
    columns; left rows with no match (or a null ``left_ts``) keep nulls.

    ``direction="backward"`` picks the latest entry with
    ``ts <= left_ts`` (inclusive); ``"forward"`` the earliest with
    ``ts >= left_ts``. ``tolerance`` (timestamp units) bounds the match
    distance. With ``broadcast_state=True`` (default) the state side is
    broadcast — the streaming plan is a stateless map-side probe, so
    watermarks and output modes behave as if this were a projection.
    ``broadcast_state=False`` is the past-broadcast-size fallback
    (:func:`asof_join_auto` picks it automatically): the stream-static
    join shuffles instead, trading per-trigger state reshuffle for
    unbounded state size — same rows either way.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    if right_ts in left.columns:
        raise ValueError(
            f"right_ts {right_ts!r} collides with a left column — rename "
            "one side first"
        )
    arr_field = state.schema[_ARR].dataType.elementType
    rcols = [f.name for f in arr_field[_ROW].dataType.fields]
    dup = set(rcols) & set(left.columns)
    if dup:
        raise ValueError(f"right columns collide with left: {sorted(dup)}")

    state_side = F.broadcast(state) if broadcast_state else state
    joined = left.join(state_side, on=on, how="left")
    lts = F.col(left_ts)

    def in_range(e):
        if direction == "backward":
            ok = e[_TS] <= lts
            if tolerance is not None:
                ok = ok & (e[_TS] >= lts - F.lit(tolerance))
        else:
            ok = e[_TS] >= lts
            if tolerance is not None:
                ok = ok & (e[_TS] <= lts + F.lit(tolerance))
        return ok

    cand = F.filter(F.col(_ARR), in_range)
    # sorted ascending → backward match is the last candidate, forward
    # the first; try_element_at → null on empty (no ANSI error)
    pick = F.try_element_at(cand, F.lit(-1 if direction == "backward" else 1))
    return joined.select(
        *[F.col(c) for c in left.columns],
        pick[_TS].alias(right_ts),
        *[pick[_ROW][c].alias(c) for c in rcols],
    )


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance: int | None = None,
    direction: str = "backward",
    max_broadcast_rows: int | None = 10_000_000,
) -> DataFrame:
    """As-of join that is TOTAL in the state size — the automatic
    switch the :func:`asof_state` guard's error message used to make
    the caller wire by hand (reference analogy: the index's LRU/size
    threshold picks its own storage strategy, ``index/Index.java:39-75``
    — callers never choose).

    One count job on the right side (once per plan build, never per
    trigger) picks the physical strategy; the ROWS are identical on
    every path:

    * right ≤ ``max_broadcast_rows`` → grouped broadcast state + the
      map-side probe of :func:`asof_join_stream` (zero shuffles per
      micro-batch — the 100 TB stream plan when state fits).
    * right larger, batch left → the batch union-and-window
      ``operators.temporal.asof_join`` (one shuffle, never groups a
      key's history into a single row, so a hot key cannot build a
      giant array row).
    * right larger, streaming left → the same grouped-state probe as a
      NON-broadcast stream-static join: Spark shuffles state per
      trigger (the documented cost of totality past broadcast size)
      but executor memory sees only its partition of state.

    ``max_broadcast_rows=None`` forces the broadcast path (caller
    asserts it fits)."""
    if right.isStreaming:
        raise ValueError(
            "asof_join_auto requires a STATIC right side (it sizes the "
            "state with a count() job); for a streaming right side use "
            "asof_join_stream_stream"
        )
    if max_broadcast_rows is None or right.count() <= max_broadcast_rows:
        state = asof_state(right, on, right_ts, max_state_rows=None)
        return asof_join_stream(
            left, state, on, left_ts, right_ts,
            tolerance=tolerance, direction=direction,
        )
    if not left.isStreaming:
        from southpaw_spark.operators.temporal import asof_join

        return asof_join(
            left, right, on, left_ts, right_ts,
            tolerance=tolerance, direction=direction,
        )
    state = asof_state(right, on, right_ts, max_state_rows=None)
    return asof_join_stream(
        left, state, on, left_ts, right_ts,
        tolerance=tolerance, direction=direction, broadcast_state=False,
    )


def asof_join_stream_stream(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    horizon_seconds: int,
    left_delay: str = "1 hour",
    right_delay: str = "1 hour",
    direction: str = "backward",
) -> DataFrame:
    """As-of join where BOTH sides are streams — the fully-streaming
    case :func:`asof_join_stream` (stream-vs-broadcast-state) cannot
    cover. Spark-native: a watermarked stream-stream interval join
    (state bounded by ``horizon_seconds`` — an unbounded as-of over two
    streams would need infinite state, so the bound is semantic, like
    the batch operator's ``tolerance``) followed by a per-left-event
    ``max(struct(right_ts, payload))`` aggregation. Both stateful
    operators chain in append mode (Spark ≥ 3.5); results for a left
    event emit once the watermark passes its horizon.

    Semantics match the batch ``asof_join(..., tolerance=horizon)``:
    inclusive bound (``right_ts <= left_ts`` backward, ``>=`` forward),
    matches further than ``horizon`` away dropped, duplicate right
    timestamps resolve to the max payload struct — the same
    deterministic winner as the batch operator in BOTH directions
    (forward picks the earliest ts via a negated-epoch ``max(struct)``
    so ties still go to the max payload). Left rows must be unique
    (they are the group keys; real event streams carry a unique event
    id). ``left_ts``/``right_ts`` must be TimestampType (watermarks
    require event time).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    if right_ts in left.columns:
        raise ValueError(
            f"right_ts {right_ts!r} collides with a left column — rename "
            "one side first"
        )
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    dup = set(rcols) & set(left.columns)
    if dup:
        raise ValueError(f"right columns collide with left: {sorted(dup)}")

    L = left.withWatermark(left_ts, left_delay)
    R = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in on],
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in rcols],
    ).withWatermark("__rts", right_delay)
    cond = F.lit(True)
    for c in on:
        cond = cond & (F.col(c) == F.col(f"__r_{c}"))
    iv = F.expr(f"INTERVAL {int(horizon_seconds)} SECONDS")
    if direction == "backward":
        cond = (
            cond
            & (F.col("__rts") <= F.col(left_ts))
            & (F.col("__rts") >= F.col(left_ts) - iv)
        )
        # max(struct(ts, row)): latest ts, ties to max payload
        sort_key = F.unix_micros(F.col("__rts"))
    else:
        cond = (
            cond
            & (F.col("__rts") >= F.col(left_ts))
            & (F.col("__rts") <= F.col(left_ts) + iv)
        )
        # earliest ts but STILL max payload among ties: negate the epoch
        # so one max(struct) does both
        sort_key = -F.unix_micros(F.col("__rts"))
    joined = L.join(R, cond, "leftOuter")
    entry = F.struct(
        sort_key.alias("__sk"),
        F.struct(*[F.col(c) for c in rcols]).alias(_ROW),
        F.col("__rts").alias(_TS),
    )
    left_cols = list(left.columns)
    agg = joined.groupBy(*[F.col(c) for c in left_cols]).agg(
        F.max(entry).alias("__m")
    )
    return agg.select(
        *left_cols,
        F.col("__m")[_TS].alias(right_ts),
        *[F.col("__m")[_ROW][c].alias(c) for c in rcols],
    )
