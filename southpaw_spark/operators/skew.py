"""Skew mitigation for hot keys at scale.

AQE's skew-join splitting (enabled in session.py) handles moderate skew
automatically. These helpers cover the cases AQE can't: skewed
*aggregations* (one join/group key carrying a large share of rows — the
reference's production witness is 1000+ children per join key,
CHANGELOG §0.6.0) and broadcast-ineligible skewed joins.

Pattern: salt the hot side into N subkeys, do the heavy operation
per-subkey, then combine — two short shuffles instead of one stuck
straggler task.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_collect_list(
    df: DataFrame,
    group_cols: Sequence[str],
    payload: Column,
    n_salts: int = 16,
    sort: bool = True,
) -> DataFrame:
    """Two-phase collect_list for skewed group keys: phase 1 groups on
    (key, salt) — spreading a hot key over ``n_salts`` tasks — phase 2
    merges the partial arrays with flatten. With ``sort``, the final
    array is sort_array'd, preserving the denormalizer's child-ordering
    contract independent of salt routing."""
    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.collect_list(payload).alias("__part")
    )
    merged = partial.groupBy(*group_cols).agg(
        F.flatten(F.collect_list("__part")).alias("arr")
    )
    if sort:
        merged = merged.withColumn("arr", F.sort_array(F.col("arr")))
    return merged


def salted_join_left_skewed(
    skewed: DataFrame,
    small: DataFrame,
    on_left: str,
    on_right: str,
    n_salts: int = 16,
    how: str = "left",
) -> DataFrame:
    """Equi-join where the left side has hot keys and the right side is
    too large to broadcast: the left gets a random salt, the right is
    replicated ``n_salts`` times with every salt value, and the join key
    becomes (key, salt). Hot-key rows spread across n_salts tasks at the
    cost of replicating the right side — use when right ≪ left but above
    the broadcast threshold."""
    left = skewed.withColumn(
        "__salt",
        F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    right = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    cond = (F.col(on_left) == F.col(on_right)) & (
        left["__salt"] == right["__salt"]
    )
    return left.join(right, on=cond, how=how).drop("__salt")


def key_frequency_report(
    df: DataFrame, key_cols: Sequence[str], top: int = 20
) -> DataFrame:
    """Hot-key diagnostic: frequency of the heaviest keys and their share
    of total rows — run before choosing n_salts."""
    total = df.count()
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .withColumn("share", F.round(F.col("n") / F.lit(total), 6))
        .orderBy(F.col("n").desc())
        .limit(top)
    )


def bucket_prefix_join(
    df: DataFrame,
    bucket_col: str,
    weight_col: str | None = None,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """The shared bucketize → tiny-aggregate → prefix-sum → broadcast-
    join-back skeleton behind every "global order without a global
    sort" operator here (a09 :func:`global_rank`, t15
    ``text.token_budget_sample``, ``pipelines.write_corpus(order_by)``'s
    range layout): per-bucket totals (``count(*)`` or
    ``sum(weight_col)`` — combiner-friendly, output ≤ n_buckets rows
    per partition group), an EXCLUSIVE running sum over bucket order
    (a window over the tiny aggregate, never the corpus), broadcast
    back onto the rows. Adds ``__bt`` (own-bucket total) and
    ``__prefix`` (sum over all earlier buckets in the same
    ``partition_cols`` group)."""
    from pyspark.sql import Window

    agg = F.count("*") if weight_col is None else F.sum(weight_col)
    counts = df.groupBy(*partition_cols, bucket_col).agg(agg.alias("__bt"))
    pw = (
        Window.partitionBy(*partition_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pref = counts.withColumn(
        "__prefix", F.coalesce(F.sum("__bt").over(pw), F.lit(0))
    )
    return df.join(F.broadcast(pref), [*partition_cols, bucket_col])


def global_rank(
    df: DataFrame,
    order_col: str,
    id_col: str,
    n_buckets: int = 256,
    boundary_error: float = 0.01,
) -> DataFrame:
    """EXACT global row numbers (and percent rank) WITHOUT a global
    sort — corpus-wide ordering is the canonical single-straggler
    shape (one task sorts everything under a plain
    ``row_number() OVER (ORDER BY ...)``). TeraSort-style range
    partitioning instead: sample approximate quantile boundaries of
    ``order_col`` (``approxQuantile``, driver-bounded at ``n_buckets``
    doubles), assign each row a range bucket, count per bucket (tiny
    combiner aggregate), prefix-sum the counts on the driver-sized
    frame, and pay a window sort only WITHIN each bucket. Output is
    exact whatever the sample finds: boundaries only steer balance —
    a bucket is a deterministic function of the VALUE, so equal values
    land together and bucket order extends the value order.

    Returns the input rows plus ``global_row`` (1-based
    ``row_number`` by ``(order_col, id_col)`` — the id tiebreak makes
    it total and engine-reproducible) and ``pct_rank`` (=(row−1)/(N−1)
    rounded to 6 decimals; 0.0 for a single row). Nulls in
    ``order_col`` are excluded (rank over present values)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1; got {n_buckets}")
    from pyspark.sql import Window

    base = df.where(F.col(order_col).isNotNull())
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(
        base.approxQuantile(order_col, probs, boundary_error)
    )) if probs else []
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bkt = F.size(
            F.filter(barr, lambda b: b <= F.col(order_col).cast("double"))
        )
    else:
        bkt = F.lit(0)
    marked = base.withColumn("__bk", bkt)
    # the prefix window runs on the ≤ n_buckets-row aggregate only —
    # a driver-sized sort, not the corpus (bucket_prefix_join)
    joined = bucket_prefix_join(marked, "__bk")
    total = marked.agg(F.count("*").alias("__N"))
    ww = Window.partitionBy("__bk").orderBy(order_col, id_col)
    ranked = (
        joined
        .withColumn("__rn", F.row_number().over(ww))
        .crossJoin(F.broadcast(total))
        .select(
            *df.columns,
            (F.col("__prefix") + F.col("__rn")).alias("global_row"),
            F.round(
                F.when(F.col("__N") > 1,
                       (F.col("__prefix") + F.col("__rn") - 1)
                       / (F.col("__N") - 1).cast("double"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("pct_rank"),
        )
    )
    return ranked


def cohort_retention(
    df: DataFrame,
    user_col: str,
    period_col: str,
) -> DataFrame:
    """Cohort retention (a11) — the classic growth-analytics matrix:
    users are cohorted by their FIRST active period, and each
    (cohort, offset) cell counts how many of them were active
    ``offset`` periods later, with the retention rate against the
    cohort's size. ``period_col`` must be an integer period index
    (day/week/hour — the caller buckets timestamps).

    Plan (scale-shaped): ONE groupBy(user) pass produces each user's
    cohort (min period) AND their distinct active periods
    (``collect_set`` — bounded by the calendar, not the event count,
    so the per-user state is small regardless of activity volume);
    explode + a second combiner-friendly groupBy((cohort, offset))
    counts active users — rows are already one-per-(user, period), so
    the count IS a distinct-user count with no expensive
    count_distinct shuffle. Cohort size = the offset-0 cell (every
    user is active in their cohort period by construction), spread by
    a window over the TINY aggregated frame (cohorts × offsets rows).
    Two shuffles total, no global sort, no N×periods blow-up."""
    from pyspark.sql import Window

    per_user = (
        df.select(F.col(user_col).alias("__u"), F.col(period_col).alias("__p"))
        .groupBy("__u")
        .agg(
            F.min("__p").alias("cohort"),
            F.collect_set("__p").alias("__periods"),
        )
    )
    cells = (
        per_user.select(
            "cohort", F.explode("__periods").alias("__p")
        )
        .groupBy("cohort", (F.col("__p") - F.col("cohort")).alias("offset"))
        .agg(F.count("*").alias("n_active"))
    )
    w = Window.partitionBy("cohort")
    size = F.max(
        F.when(F.col("offset") == 0, F.col("n_active"))
    ).over(w)
    return cells.select(
        "cohort",
        "offset",
        "n_active",
        size.alias("cohort_size"),
        F.round(F.col("n_active") / size.cast("double"), 6).alias(
            "retention_rate"
        ),
    )


def rolling_active_users(
    df: DataFrame,
    user_col: str,
    period_col: str,
    window: int = 7,
) -> DataFrame:
    """Rolling active users (e14) — DAU/WAU-style engagement: for each
    OBSERVED period, the distinct users active that period (``dau``)
    and in the trailing ``window`` periods (``rolling_active``, e.g.
    WAU at window=7), plus their ratio (the stickiness metric).

    Plan (exact, no window functions): one distinct over
    (user, period); each such row FANS OUT to the ≤``window`` periods
    it keeps the user active in (``sequence`` + ``explode`` — bounded
    fan-out, no per-pair work); a second distinct absorbs multi-day
    contributions; combiner-friendly counts per period. Emitted
    periods are restricted to OBSERVED ones via a broadcast semi-join
    with the (tiny) distinct-period frame — no phantom trailing
    periods. The naive alternative — a range self-join of days ×
    activity — is quadratic in the calendar; this is linear with a
    ×window fan-out."""
    if window < 1:
        raise ValueError(f"window must be >= 1; got {window}")
    ud = (
        df.select(
            F.col(user_col).alias("__u"), F.col(period_col).alias("__p")
        )
        .distinct()
    )
    dau = ud.groupBy(F.col("__p").alias("period")).agg(
        F.count("*").alias("dau")
    )
    targets = (
        ud.select(
            "__u",
            F.explode(
                F.sequence(
                    F.col("__p"), F.col("__p") + F.lit(window - 1)
                )
            ).alias("period"),
        )
        .distinct()
    )
    observed = ud.select(F.col("__p").alias("period")).distinct()
    rolling = (
        targets.join(F.broadcast(observed), "period", "left_semi")
        .groupBy("period")
        .agg(F.count("*").alias("rolling_active"))
    )
    return (
        dau.join(rolling, "period")
        .select(
            "period",
            "dau",
            "rolling_active",
            F.round(
                F.col("dau") / F.col("rolling_active").cast("double"), 6
            ).alias("stickiness"),
        )
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: Sequence[float],
    n_buckets: int = 256,
) -> DataFrame:
    """EXACT quantiles without a global sort (a12): the value at rank
    ``max(1, ceil(q·N))`` (1-based, discrete-quantile semantics — an
    actual data value, never an interpolation) for each requested
    ``q``. ``approx_percentile`` trades error bounds for speed; this
    pays one :func:`global_rank` pass — TeraSort-style range buckets,
    window sort only WITHIN buckets — for the exact answer, the same
    no-straggler shape as a09. Nulls are excluded (quantiles over
    present values); N is one bounded count (a single driver scalar,
    the global_rank discipline). Output: ``(q, value)`` rows, one per
    requested quantile (duplicate target ranks map each q to the same
    value)."""
    import math

    qs = sorted(set(float(q) for q in quantiles))
    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(
            f"quantiles must be in (0, 1]; got {list(quantiles)!r}"
        )
    base = df.select(F.col(value_col).alias("__v")).where(
        F.col("__v").isNotNull()
    )
    n = base.count()
    if n == 0:
        return df.sparkSession.createDataFrame(
            [], f"q double, value {dict(df.dtypes)[value_col]}"
        )
    targets = [(q, max(1, math.ceil(q * n))) for q in qs]
    tdf = df.sparkSession.createDataFrame(
        targets, "q double, __rank long"
    )
    ranked = global_rank(base, "__v", "__v", n_buckets=n_buckets)
    return (
        ranked.join(
            F.broadcast(tdf), F.col("global_row") == F.col("__rank")
        )
        .select("q", F.col("__v").alias("value"))
    )
