"""Temporal join operators: as-of join and bucketed range join.

Spark has no native ASOF JOIN (pandas ``merge_asof`` / DuckDB ``ASOF
JOIN`` / kdb ``aj``), and a naive inequality join is a
BroadcastNestedLoopJoin — quadratic and driver-memory-bound. These are
the scale-safe formulations:

- :func:`asof_join` — union-and-window: tag both sides, union, one
  window pass per key ordered by time carrying the last-seen right row
  forward. ONE shuffle (the window partition), zero joins, linear in
  |left|+|right|. The same plan shape works unchanged at 100 TB because
  the shuffle key is the equi-key, not time.
- :func:`range_join` — time-bucketed interval join: quantize the window
  span into buckets, explode the probe side into the (few) candidate
  buckets, hash-join on (key, bucket), then apply the exact interval
  predicate. Turns an inequality join into an equi-join whose fan-out is
  bounded by events-per-bucket, never |left|×|right|.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _orderable(dtypes) -> bool:
    """True when every datatype can participate in a sort (no MapType
    anywhere in the tree — Spark rejects maps in ORDER BY)."""
    from pyspark.sql import types as T

    def ok(dt) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return ok(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(ok(f.dataType) for f in dt.fields)
        return True

    return all(ok(dt) for dt in dtypes)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the adjacent right row per
    ``on`` key — ``direction="backward"`` (default) takes the most recent
    right row with ``right_ts <= left_ts`` (inclusive, matching DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts`` and pandas
    ``merge_asof(direction="backward")``); ``direction="forward"`` takes
    the earliest right row with ``right_ts >= left_ts``. Left rows with
    no match keep null right columns (left-outer semantics).

    ``left_ts``/``right_ts`` must be mutually comparable (same type).
    Right columns other than ``on``/``right_ts`` are carried through; a
    name-colliding right column must be renamed by the caller first.
    ``tolerance`` (same units as the timestamp columns) drops matches
    older than ``left_ts - tolerance``.

    Implementation: union both sides with a side tag, window per key
    ordered by (ts, side) — right rows sort before a left row with the
    identical timestamp, giving the inclusive bound — and carry the last
    non-null right-row *struct* forward (one struct, so all right columns
    come from the SAME matched row even when some of its fields are
    null). Requires timestamps to be totally ordered within a key; ties
    between right rows resolve to the one latest in (ts, struct) order —
    the struct is part of the window sort, so the choice is deterministic
    across runs and partitionings. (If a right payload column is
    unorderable — e.g. a map — the struct can't join the sort; the winner
    among exactly-tied right timestamps is then partition-order-dependent
    and duplicate right timestamps should be pre-deduped by the caller.)
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    if right_ts in left.columns:
        raise ValueError(
            f"right_ts {right_ts!r} collides with a left column — rename "
            "one side (the output carries both the left timestamp and the "
            "matched right timestamp)"
        )
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    dup = set(rcols) & set(left.columns)
    if dup:
        raise ValueError(f"right columns collide with left: {sorted(dup)}")
    # a right row with NULL timestamp can never be an as-of match; drop it
    # up front so its payload can't ride the struct carry while __m_ts
    # (ignorenulls) comes from a different row
    right = right.where(F.col(right_ts).isNotNull())

    lpart = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        F.when(
            F.lit(False),
            F.struct(
                *[
                    F.lit(None).cast(right.schema[c].dataType).alias(c)
                    for c in rcols
                ]
            ),
        ).alias("__rrow"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
    )
    rpart = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in on
            else F.col(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("__rts"),
        F.struct(*[F.col(c) for c in rcols]).alias("__rrow"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
    )
    # backward: ascending scan, carry the last-seen right row forward.
    # forward: the mirror image — descending scan carries the NEXT right
    # row backward. In both, a right row ties-first at equal timestamps
    # (side 0 sorts before the left row), giving the inclusive bound.
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    order_keys = [ts_order, F.col("__side").asc()]
    # Deterministic tie-break for duplicate right timestamps within a
    # key: the carried struct joins the sort (ascending → the LAST right
    # row the scan sees at an equal ts is the max struct, for both scan
    # directions), so F.last picks the same winner on every run. Maps
    # aren't orderable in Spark; skip the key then (documented caveat).
    if _orderable(right.schema[c].dataType for c in rcols):
        order_keys.append(F.col("__rrow").asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lpart.unionByName(rpart)
        .withColumn("__m_ts", F.last("__rts", ignorenulls=True).over(w))
        .withColumn("__m_row", F.last("__rrow", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if tolerance is not None:
        in_tol = (
            F.col("__m_ts") >= F.col("__ts") - F.lit(tolerance)
            if direction == "backward"
            else F.col("__m_ts") <= F.col("__ts") + F.lit(tolerance)
        )
        matched = matched.withColumn(
            "__m_ts", F.when(in_tol, F.col("__m_ts"))
        ).withColumn("__m_row", F.when(in_tol, F.col("__m_row")))
    # a left row with NULL timestamp matches nothing (it would otherwise
    # inherit whatever the null sort position carried — e.g. the earliest
    # right row under the forward/descending scan)
    has_ts = F.col("__ts").isNotNull()
    return matched.select(
        *[F.col(c) for c in left.columns],
        F.when(has_ts, F.col("__m_ts")).alias(right_ts),
        *[F.when(has_ts, F.col("__m_row")[c]).alias(c) for c in rcols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """Interval equi-join: pairs where ``left_ts + lower <= right_ts <
    left_ts + upper`` and the ``on`` keys match (timestamps must be
    numeric — epoch-quantized; ``lower``/``upper`` in the same units).

    The inequality is made hash-joinable by quantizing time into buckets
    of width ``upper - lower``: a right row can only satisfy the interval
    for left rows in one of TWO adjacent buckets, so the right side
    explodes ×2, joins on (key, bucket), and the exact predicate prunes
    the boundary spill. Shuffle volume is 2·|right| + |left| — never a
    cross product — and AQE's skew-join splitting handles hot keys.
    Returns all left columns plus the matching right columns (caller
    renames collisions beforehand).
    """
    on = list(on)
    width = upper - lower
    if width <= 0:
        raise ValueError("upper must exceed lower")
    rcols = [c for c in right.columns if c not in on]
    dup = set(rcols) & set(left.columns)
    if dup:
        raise ValueError(f"right columns collide with left: {sorted(dup)}")
    # left row in bucket floor((t+lower)/w); matching right rows lie in
    # [t+lower, t+lower+w) → right bucket floor(rt/w) ∈ {b, b+1} shifted
    # back, so explode right into both candidate buckets.
    lb = left.withColumn(
        "__bkt", F.floor((F.col(left_ts) + F.lit(lower)) / F.lit(width))
    )
    rb = right.withColumn(
        "__bkt",
        F.explode(
            F.array(
                F.floor(F.col(right_ts) / F.lit(width)) - 1,
                F.floor(F.col(right_ts) / F.lit(width)),
            )
        ),
    )
    cond = (F.col(right_ts) >= F.col(left_ts) + F.lit(lower)) & (
        F.col(right_ts) < F.col(left_ts) + F.lit(upper)
    )
    return (
        lb.join(rb, on + ["__bkt"])
        .where(cond)
        .drop("__bkt")
    )


def gapfill(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    stride: int = 3600,
    round_to: int | None = 6,
    exact_decimals: int | None = None,
) -> DataFrame:
    """Time-series gap filling: regularize an irregular event series
    onto a fixed per-key grid and fill the holes — the
    ``time_bucket_gapfill`` / ``date_bin`` + ``fill`` operator of the
    time-series engines (TimescaleDB gapfill, InfluxDB ``fill()``),
    absent from both Spark and the reference but table stakes for
    analytics over event data (ref query family: the windowed/hopping
    aggregates of `topic/KafkaTopic.java` consumers land here once the
    series must be dense for downstream models).

    ``ts_col`` is epoch SECONDS (long/double). Per key:

    1. bucket to ``floor(ts/stride)*stride`` and average ``value_col``
       per bucket (ONE shuffle, map-side combine);
    2. span the observed [min, max] bucket range with
       ``sequence(...)`` + ``explode`` — grid generation is distributed,
       per-key, no driver loop, and bounded by span/stride rows per key;
    3. left-join observations onto the grid (co-partitioned: the join
       key is the groupBy key, AQE coalesces);
    4. one window pass per key ordered by bucket derives both fill
       modes: ``v_locf`` (last observation carried forward) and
       ``v_interp`` (linear interpolation between the bracketing
       observations, TimescaleDB ``interpolate()`` semantics).

    The grid starts/ends AT observed buckets, so ``v_locf``/``v_interp``
    are never null (no leading-edge ambiguity).

    ``exact_decimals`` (e.g. 2 for cent-precision inputs) computes the
    per-bucket average from an EXACT integer sum (``round(v*10^d)`` as
    long, then one double division) instead of ``F.avg`` over doubles.
    Float summation is not associative, so plain ``avg`` is
    partitioning-dependent at the ulp level — and the fill values are
    small-denominator rationals (often with power-of-2 denominators
    from grid fractions), so those ulps routinely straddle exact
    rounding halves. The integer-sum path makes every downstream IEEE
    op bit-reproducible across runs, partitionings, and engines. At 100 TB the plan is
    two key-partitioned shuffles + one per-key sort — the inherent cost
    of a dense per-series pass; nothing is quadratic and no key ever
    sees more than span/stride rows.
    """
    keys = list(key_cols)
    bucket = (
        (F.floor(F.col(ts_col) / F.lit(stride)) * stride)
        .cast("long")
        .alias("bucket")
    )
    if exact_decimals is not None:
        scale = float(10 ** exact_decimals)
        obs = (
            df.select(
                *keys,
                bucket,
                F.round(F.col(value_col) * scale).cast("long").alias("__c"),
            )
            .groupBy(*keys, "bucket")
            .agg(F.sum("__c").alias("__s"), F.count("__c").alias("__n"))
            .select(
                *keys,
                "bucket",
                (F.col("__s") / (F.col("__n") * F.lit(scale))).alias("v"),
            )
        )
    else:
        obs = (
            df.select(
                *keys, bucket, F.col(value_col).cast("double").alias("__v")
            )
            .groupBy(*keys, "bucket")
            .agg(F.avg("__v").alias("v"))
        )
    spans = obs.groupBy(*keys).agg(
        F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx")
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.lit(stride))
        ).alias("bucket"),
    )
    g = grid.join(obs, keys + ["bucket"], "left")
    w = Window.partitionBy(*keys).orderBy("bucket")
    tagged = F.when(
        F.col("v").isNotNull(), F.struct(F.col("bucket").alias("b"), F.col("v"))
    )
    prev = F.last(tagged, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.first(tagged, ignorenulls=True).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            prev.isNotNull() & nxt.isNotNull(),
            prev["v"]
            + (nxt["v"] - prev["v"])
            * (F.col("bucket") - prev["b"])
            / (nxt["b"] - prev["b"]),
        )
        .otherwise(F.coalesce(prev["v"], nxt["v"]))
    )

    def r(c):
        return F.round(c, round_to) if round_to is not None else c

    return g.select(
        *keys,
        "bucket",
        r(F.col("v")).alias("v_obs"),
        r(prev["v"]).alias("v_locf"),
        r(interp).alias("v_interp"),
    )


def ohlc(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    stride: int = 3600,
    order_col: str | None = None,
) -> DataFrame:
    """Time-bucketed OHLC bars: per key and fixed ``stride``-second
    bucket, the first (open), max (high), min (low), and last (close)
    value plus the event count — the candlestick/downsampling operator
    of the time-series engines (TimescaleDB ``candlestick_agg``,
    InfluxDB ``FIRST/LAST``; ref query family: the per-topic
    aggregation consumers of `topic/KafkaTopic.java:400-403` land here
    once event streams feed dashboards).

    ``ts_col`` is epoch seconds (long/double). open/close are
    ``min_by``/``max_by`` on the timestamp — single-pass, mergeable
    aggregates, so the whole operator is ONE combiner-friendly shuffle
    (map-side partials; no window, no sort, no self-join). At 100 TB
    that is the minimal plan: the shuffle key is (key, bucket) and
    every aggregate is associative, so partial aggregation absorbs
    arbitrarily hot keys before the exchange.

    Values pass through untouched (no float arithmetic beyond
    comparison), so results are bit-reproducible across partitionings
    and engines. Ties on ``ts_col`` within a bucket make open/close
    ENGINE-ARBITRARY unless ``order_col`` breaks them: when given,
    open/close order by the composite ``(ts, order_col)`` (struct
    comparison — still a single-pass mergeable aggregate, no window),
    so a unique event id / sequence number makes the bars
    deterministic under duplicate timestamps. Default (``None``)
    orders by ``ts_col`` alone.
    """
    keys = list(key_cols)
    bucket = (
        (F.floor(F.col(ts_col) / F.lit(stride)) * stride)
        .cast("long")
        .alias("bucket")
    )
    v = F.col(value_col)
    sel = [*keys, bucket, F.col(ts_col).alias("__t"), v.alias("__v")]
    if order_col is not None:
        sel.append(F.col(order_col).alias("__o"))
        order = F.struct(F.col("__t"), F.col("__o"))
    else:
        order = F.col("__t")
    return (
        df.select(*sel)
        .groupBy(*keys, "bucket")
        .agg(
            F.min_by("__v", order).alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max_by("__v", order).alias("close"),
            F.count("__v").alias("n_events"),
        )
    )


def funnel(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
    max_gap: int | float | None = None,
) -> DataFrame:
    """Strict-order funnel analysis (e13) — the product-analytics
    staple: how many users performed step 1, then step 2 STRICTLY
    AFTER their first step 1, then step 3 after that, … (each step
    time is the earliest qualifying event after the previous step's
    time). Returns one row per step: ``(step, step_name, n_users,
    conversion_rate)`` with the rate against step 1, rounded 6.

    Plan: ONE shuffle — a per-user aggregate collecting the first
    step-1 time plus a sorted timestamp array per later step type
    (``collect_list`` under a ``when`` filter, so only funnel-relevant
    events survive the map side); step k's time is then
    ``array_min(filter(arr_k, t > t_{k-1}))`` over those per-user
    arrays (bounded by the user's own funnel events, not the corpus).
    The final counts are a single global aggregate exploded into K
    rows. No window functions, no self-joins, no per-pair work.

    ``max_gap`` adds the CONVERSION WINDOW every product funnel
    ships: step k must occur within ``max_gap`` time units of step
    k−1's time (strictly after, at most ``max_gap`` later) — without
    it a purchase three years after the click still "converts".

    Related: e08 (`suite.e08_funnel`) emits the PER-USER stage
    timestamps for the fixed 3-step funnel via staged min-joins, and
    `streaming.windows.funnel_stream` is its streaming twin
    (watermark-ordered fold, same ``max_gap_us`` window); this
    operator is the aggregate counts/conversion-rates view over
    arbitrary step lists."""
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"need >= 2 steps; got {steps!r}")
    u, t, ts = F.col(user_col), F.col(type_col), F.col(ts_col)
    aggs = [F.min(F.when(t == steps[0], ts)).alias("t1")]
    for k, s in enumerate(steps[1:], start=2):
        aggs.append(
            F.sort_array(
                F.collect_list(F.when(t == s, ts))
            ).alias(f"l{k}")
        )
    per_user = df.groupBy(u.alias("__u")).agg(*aggs)
    for k in range(2, len(steps) + 1):
        prev = F.col(f"t{k - 1}")
        in_window = (
            (lambda x: x > prev)
            if max_gap is None
            else (lambda x: (x > prev) & (x <= prev + F.lit(max_gap)))
        )
        per_user = per_user.withColumn(
            f"t{k}",
            F.when(
                prev.isNotNull(),
                F.array_min(F.filter(F.col(f"l{k}"), in_window)),
            ),
        )
    counts = per_user.agg(
        *[
            F.count(F.col(f"t{k}")).alias(f"n{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(k).alias("step"),
                F.lit(steps[k - 1]).alias("step_name"),
                F.col(f"n{k}").alias("n_users"),
            )
            for k in range(1, len(steps) + 1)
        ]
    )
    exploded = counts.select(
        F.explode(cells).alias("c"), F.col("n1").alias("__n1")
    )
    return exploded.select(
        F.col("c.step").alias("step"),
        F.col("c.step_name").alias("step_name"),
        F.col("c.n_users").alias("n_users"),
        F.when(
            F.col("__n1") > 0,
            F.round(F.col("c.n_users") / F.col("__n1").cast("double"), 6),
        ).otherwise(F.lit(None).cast("double")).alias("conversion_rate"),
    )
