"""As-of join and bucketed range join (operators/temporal.py).

Semantics pinned here: backward-inclusive as-of matching (DuckDB
``ASOF JOIN l.ts >= r.ts`` / pandas ``merge_asof(direction="backward")``),
left-outer nulls, tolerance cutoff, all right columns sourced from the
SAME matched row, and exact interval bounds across bucket boundaries for
range_join (equivalence vs a naive inequality join on random data).
"""

import random

import pytest
from pyspark.sql import functions as F

from southpaw_spark.operators.temporal import asof_join, range_join


def _left(spark, rows):
    return spark.createDataFrame(rows, "lid int, k int, ts long")


def _right(spark, rows):
    return spark.createDataFrame(rows, "k int, rts long, rv string, rn int")


def test_asof_backward_inclusive_and_outer(spark):
    left = _left(spark, [(1, 7, 100), (2, 7, 200), (3, 7, 50), (4, 8, 100)])
    right = _right(
        spark, [(7, 100, "a", 1), (7, 150, "b", 2), (9, 10, "z", 9)]
    )
    out = {
        r.lid: (r.rts, r.rv, r.rn)
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts"
        ).collect()
    }
    assert out[1] == (100, "a", 1)  # equal timestamp matches (inclusive)
    assert out[2] == (150, "b", 2)  # latest prior, not first
    assert out[3] == (None, None, None)  # nothing at-or-before
    assert out[4] == (None, None, None)  # key with no right rows at all


def test_asof_tolerance_drops_stale_matches(spark):
    left = _left(spark, [(1, 7, 1000), (2, 7, 1010)])
    right = _right(spark, [(7, 900, "old", 1)])
    out = {
        r.lid: r.rv
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts", tolerance=100
        ).collect()
    }
    assert out[1] == "old"  # exactly at the tolerance bound: kept
    assert out[2] is None  # 110 > 100: dropped


def test_asof_right_columns_from_same_row(spark):
    # A right row with a null field must NOT borrow that field from an
    # earlier right row (the struct-carry guarantee).
    left = _left(spark, [(1, 7, 300)])
    right = _right(spark, [(7, 100, "early", 5), (7, 200, None, None)])
    row = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts").first()
    assert row.rts == 200 and row.rv is None and row.rn is None


def test_asof_rejects_column_collision(spark):
    left = _left(spark, [(1, 7, 100)])
    right = left.select("k", F.col("ts").alias("rts"), F.col("lid"))
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts")


def test_range_join_exact_bounds_across_buckets(spark):
    # width = upper - lower = 100; right rows planted on every boundary.
    left = _left(spark, [(1, 7, 1000)])
    right = _right(
        spark,
        [
            (7, 899, "below", 0),
            (7, 900, "at_lower", 0),  # ts+lower inclusive
            (7, 950, "inside", 0),
            (7, 999, "edge", 0),
            (7, 1000, "at_upper", 0),  # ts+upper exclusive
        ],
    )
    got = sorted(
        r.rv
        for r in range_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            lower=-100, upper=0,
        ).collect()
    )
    assert got == ["at_lower", "edge", "inside"]


def test_range_join_matches_naive_inequality_join(spark):
    rng = random.Random(7)
    lrows = [(i, rng.randint(0, 3), rng.randint(0, 2000)) for i in range(80)]
    rrows = [
        (rng.randint(0, 3), rng.randint(0, 2000), f"v{i}", i)
        for i in range(120)
    ]
    left, right = _left(spark, lrows), _right(spark, rrows)
    lower, upper = -150, 70
    fast = sorted(
        (r.lid, r.rn)
        for r in range_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            lower=lower, upper=upper,
        ).collect()
    )
    naive = sorted(
        (r.lid, r.rn)
        for r in left.join(right, "k")
        .where(
            (F.col("rts") >= F.col("ts") + lower)
            & (F.col("rts") < F.col("ts") + upper)
        )
        .collect()
    )
    assert fast == naive and len(fast) > 0


def test_plans_are_shuffle_joins_not_nested_loop(spark):
    left = _left(spark, [(1, 7, 100)])
    right = _right(spark, [(7, 100, "a", 1)])
    a = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts")
    r = range_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", lower=-10, upper=10
    )
    for df in (a, r):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_forward_inclusive_and_tolerance(spark):
    left = _left(spark, [(1, 7, 100), (2, 7, 200), (3, 7, 500)])
    right = _right(spark, [(7, 100, "now", 1), (7, 300, "later", 2)])
    out = {
        r.lid: (r.rts, r.rv)
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            direction="forward",
        ).collect()
    }
    assert out[1] == (100, "now")      # equal timestamp matches (inclusive)
    assert out[2] == (300, "later")    # earliest following, not latest
    assert out[3] == (None, None)      # nothing at-or-after
    tol = {
        r.lid: r.rv
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            direction="forward", tolerance=100,
        ).collect()
    }
    assert tol[1] == "now" and tol[2] == "later"  # gaps 0 and 100: kept


def test_asof_both_directions_match_pandas_merge_asof(spark):
    import pandas as pd

    rng = random.Random(11)
    lrows = [(i, rng.randint(0, 2), rng.randint(0, 1000)) for i in range(60)]
    rrows = sorted(
        {(rng.randint(0, 2), rng.randint(0, 1000)) for _ in range(80)}
    )
    rrows = [(k, ts, f"v{i}", i) for i, (k, ts) in enumerate(rrows)]
    left, right = _left(spark, lrows), _right(spark, rrows)
    lpd = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["k", "rts", "rv", "rn"]).sort_values(
        "rts"
    )
    for direction in ("backward", "forward"):
        got = {
            r.lid: r.rn
            for r in asof_join(
                left, right, on=["k"], left_ts="ts", right_ts="rts",
                direction=direction,
            ).collect()
        }
        exp_df = pd.merge_asof(
            lpd, rpd, left_on="ts", right_on="rts", by="k",
            direction=direction,
        )
        exp = {
            int(r.lid): (None if pd.isna(r.rn) else int(r.rn))
            for r in exp_df.itertuples()
        }
        assert got == exp, direction


def test_asof_null_left_timestamp_matches_nothing(spark):
    left = _left(spark, [(1, 7, None), (2, 7, 200)])
    right = _right(spark, [(7, 100, "a", 1)])
    for direction in ("backward", "forward"):
        out = {
            r.lid: r.rv
            for r in asof_join(
                left, right, on=["k"], left_ts="ts", right_ts="rts",
                direction=direction,
            ).collect()
        }
        assert out[1] is None, direction  # null ts: no match either way
    # and the non-null row still matches backward
    back = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts")
    assert {r.lid: r.rv for r in back.collect()}[2] == "a"


def test_asof_null_right_timestamp_never_leaks_payload(spark):
    # a NULL-rts right row must not donate columns to unmatched left rows
    left = _left(spark, [(1, 7, 10)])
    right = _right(spark, [(7, None, "NULLTS", 9), (7, 100, "LATE", 1)])
    row = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts").first()
    assert row.rts is None and row.rv is None and row.rn is None


def test_asof_rejects_right_ts_name_collision(spark):
    left = _left(spark, [(1, 7, 100)])
    right = spark.createDataFrame([(7, 100, "a")], "k int, ts long, rv string")
    with pytest.raises(ValueError, match="right_ts"):
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts")


def test_asof_duplicate_right_ts_tie_break_is_deterministic(spark):
    """ADVICE r2: with duplicate right timestamps within a key the carried
    row must not depend on partition order. The struct joins the window
    sort, so the winner is the max (ts, struct) — stable across runs and
    partitionings."""
    left = _left(spark, [(1, 7, 100), (2, 7, 300)])
    dup_rows = [(7, 100, "a", 1), (7, 100, "z", 2), (7, 100, "m", 3)]
    expected = max((rv, rn) for _, _, rv, rn in dup_rows)  # ('z', 2)
    for nparts in (1, 3, 8):
        right = _right(spark, dup_rows).repartition(nparts)
        out = {
            r.lid: (r.rv, r.rn)
            for r in asof_join(
                left, right, on=["k"], left_ts="ts", right_ts="rts"
            ).collect()
        }
        assert out[1] == expected, nparts
        assert out[2] == expected, nparts
    # forward direction picks the same deterministic winner at the tie
    fwd = asof_join(
        _left(spark, [(1, 7, 100)]),
        _right(spark, dup_rows).repartition(5),
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        direction="forward",
    ).first()
    assert (fwd.rv, fwd.rn) == expected


def test_asof_map_payload_still_runs_without_struct_tiebreak(spark):
    # maps are unorderable: the struct must stay out of the sort, and the
    # join itself still works
    left = _left(spark, [(1, 7, 100)])
    right = spark.createDataFrame(
        [(7, 50, {"x": "1"})], "k int, rts long, rm map<string,string>"
    )
    row = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts").first()
    assert row.rm == {"x": "1"}


def test_gapfill_locf_and_linear_interp(spark):
    from southpaw_spark.operators.temporal import gapfill

    # key 1: observations at buckets 0 and 30 (stride 10) — two holes;
    # key 2: a single observation — a 1-row grid, all fills = itself.
    df = spark.createDataFrame(
        [(1, 0, 10.0), (1, 4, 20.0), (1, 31, 45.0), (2, 7, 5.0)],
        "k int, ts long, v double",
    )
    out = {
        (r["k"], r["bucket"]): (r["v_obs"], r["v_locf"], r["v_interp"])
        for r in gapfill(
            df, "ts", ["k"], "v", stride=10, exact_decimals=1
        ).collect()
    }
    assert out[(1, 0)] == (15.0, 15.0, 15.0)   # avg of 10, 20
    assert out[(1, 10)] == (None, 15.0, 25.0)  # 1/3 of the way to 45
    assert out[(1, 20)] == (None, 15.0, 35.0)
    assert out[(1, 30)] == (45.0, 45.0, 45.0)
    assert out[(2, 0)] == (5.0, 5.0, 5.0)
    assert len(out) == 5  # grid spans exactly [min, max] observed


def test_gapfill_exact_decimals_partition_invariant(spark):
    """The exact-integer average is bit-identical no matter how the
    input is partitioned (plain avg() over doubles is not, at the ulp
    level) — the property the DuckDB oracle compare relies on."""
    from southpaw_spark.operators.temporal import gapfill

    random.seed(11)
    rows = [
        (i % 5, random.randrange(0, 500), round(random.uniform(0, 99), 2))
        for i in range(400)
    ]
    frames = [
        spark.createDataFrame(rows, "k int, ts long, v double").repartition(n)
        for n in (1, 7)
    ]
    outs = [
        sorted(
            tuple(r)
            for r in gapfill(
                f, "ts", ["k"], "v", stride=50, exact_decimals=2,
                round_to=None,
            ).collect()
        )
        for f in frames
    ]
    assert outs[0] == outs[1]


def test_ohlc_bars(spark):
    from southpaw_spark.operators.temporal import ohlc

    # key "a", bucket 0: ts 1..3 → open=v(ts=1), close=v(ts=3);
    # bucket 10: single row; key "b": one bucket, two rows.
    df = spark.createDataFrame(
        [
            ("a", 1, 5.0), ("a", 3, 2.0), ("a", 2, 9.0),
            ("a", 13, 4.0),
            ("b", 5, 7.0), ("b", 6, 1.0),
        ],
        "k string, ts long, v double",
    )
    out = {
        (r["k"], r["bucket"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"]
        )
        for r in ohlc(df, "ts", ["k"], "v", stride=10).collect()
    }
    assert out == {
        ("a", 0): (5.0, 9.0, 2.0, 2.0, 3),
        ("a", 10): (4.0, 4.0, 4.0, 4.0, 1),
        ("b", 0): (7.0, 7.0, 1.0, 1.0, 2),
    }


def test_ohlc_single_shuffle_plan(spark):
    """The whole operator must stay ONE exchange with partial (map-side)
    min_by/max_by aggregation — the property that absorbs hot keys at
    100 TB."""
    from southpaw_spark.operators.temporal import ohlc

    df = spark.createDataFrame(
        [("a", 1, 5.0)], "k string, ts long, v double"
    )
    plan = (
        ohlc(df, "ts", ["k"], "v", stride=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "partial_min_by" in plan and "partial_max_by" in plan


def test_ohlc_duplicate_ts_order_col(spark):
    """Duplicate timestamps inside a bucket make open/close
    engine-arbitrary; order_col breaks the tie with a composite
    (ts, order) aggregate ordering — deterministic under any input
    order / partitioning (round-10 task: tie-break promoted from a
    docstring caveat to a parameter)."""
    from southpaw_spark.operators.temporal import ohlc

    rows = [
        ("a", 1, 2, 5.0), ("a", 1, 1, 8.0),  # tied open: seq 1 wins
        ("a", 3, 4, 7.0), ("a", 3, 3, 2.0),  # tied close: seq 4 wins
    ]
    df = spark.createDataFrame(rows, "k string, ts long, seq long, v double")
    for frame in (df, df.repartition(7), df.orderBy(F.col("seq").desc())):
        out = ohlc(
            frame, "ts", ["k"], "v", stride=10, order_col="seq"
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["open"], r["high"], r["low"], r["close"], r["n_events"]) \
            == (8.0, 8.0, 2.0, 7.0, 4)

    # still one exchange with map-side partials — the struct ordering
    # must not cost the single-shuffle plan
    plan = (
        ohlc(df, "ts", ["k"], "v", stride=10, order_col="seq")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "partial_min_by" in plan and "partial_max_by" in plan


def test_funnel_strict_ordering_hand_computed(spark):
    """e13: a hand-built event log where ordering matters — a user who
    clicked BEFORE their first view does not convert to step 2, a
    purchase between view and click does not count as step 3, and a
    user completing all steps in order counts everywhere; rates are
    vs step 1; <2 steps raises."""
    import pytest as _pytest

    from southpaw_spark.operators.temporal import funnel

    rows = [
        # u1: full in-order funnel
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: clicked before viewing -> stops at step 1
        (2, "click", 5), (2, "view", 10),
        # u3: purchase BETWEEN view and click -> stops at step 2
        (3, "view", 10), (3, "purchase", 15), (3, "click", 20),
        # u4: never viewed -> not in the funnel at all
        (4, "click", 1), (4, "purchase", 2),
        # u5: view then click at the SAME ts -> strict '>' rejects it
        (5, "view", 10), (5, "click", 10),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long"
    )
    out = {
        r["step"]: (r["step_name"], r["n_users"], r["conversion_rate"])
        for r in funnel(
            df, "user_id", "event_type", "ts",
            ["view", "click", "purchase"],
        ).collect()
    }
    assert out == {
        1: ("view", 4, 1.0),       # u1, u2, u3, u5
        2: ("click", 2, 0.5),      # u1, u3 (u5's same-ts click fails >)
        3: ("purchase", 1, 0.25),  # u1 only
    }
    with _pytest.raises(ValueError, match="steps"):
        funnel(df, "user_id", "event_type", "ts", ["view"])


def test_funnel_conversion_window(spark):
    """e13 max_gap: a step landing after the conversion window does not
    convert — and because each step time is the EARLIEST in-window
    event, a later in-window event cannot resurrect a user whose
    earliest qualifying event chain dies (deterministic greedy)."""
    from southpaw_spark.operators.temporal import funnel

    rows = [
        (1, "view", 0), (1, "click", 5),     # in window (gap 10)
        (2, "view", 0), (2, "click", 50),    # click too late
        (3, "view", 0), (3, "click", 10),    # boundary: exactly max_gap
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long"
    )
    out = {
        r["step"]: r["n_users"]
        for r in funnel(
            df, "user_id", "event_type", "ts",
            ["view", "click"], max_gap=10,
        ).collect()
    }
    assert out == {1: 3, 2: 2}  # users 1 and 3 (<=), not 2
    no_window = {
        r["step"]: r["n_users"]
        for r in funnel(
            df, "user_id", "event_type", "ts", ["view", "click"]
        ).collect()
    }
    assert no_window == {1: 3, 2: 3}
