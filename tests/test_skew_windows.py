"""Skew helpers and streaming window/stateful operators."""

import json
import time

from pyspark.sql import functions as F

from southpaw_spark.operators.skew import (
    key_frequency_report,
    salted_collect_list,
    salted_join_left_skewed,
)
from southpaw_spark.streaming.windows import sessionize_stream, windowed_event_counts


def test_salted_collect_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_linenumber")).alias("arr"))
    )
    salted = salted_collect_list(li, ["l_orderkey"], F.col("l_linenumber"))
    diff = plain.join(salted, "l_orderkey").where(
        F.col("plain.arr") != F.col("arr")
    ) if False else plain.alias("p").join(salted.alias("s"), "l_orderkey").where(
        F.expr("p.arr <> s.arr")
    )
    assert diff.count() == 0


def test_salted_join_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    plain = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "left"
    ).select("o_orderkey", "c_name")
    salted = salted_join_left_skewed(
        orders, customer, "o_custkey", "c_custkey"
    ).select("o_orderkey", "c_name")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_key_frequency_report(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rep = key_frequency_report(li, ["l_orderkey"], top=5).collect()
    assert len(rep) == 5
    assert rep[0]["n"] >= rep[-1]["n"]
    assert 0 < rep[0]["share"] < 1


def test_windowed_event_counts_batch_shape(spark, sf_dir):
    from southpaw_spark.suite import _events_ts

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = raw.withColumn("ts", _events_ts(raw))
    out = windowed_event_counts(ev)
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == ev.count()


def test_sessionize_stream_stateful(spark, tmp_path):
    """Drive applyInPandasWithState through a real stream: events for one
    user in two bursts 2h apart → the first session is emitted once the
    second burst arrives."""
    src = tmp_path / "in"
    src.mkdir()
    base = 1_700_000_000
    rows1 = [
        {"user_id": 1, "ts": (base + i * 60) * 1_000_000_000} for i in range(3)
    ]
    rows2 = [
        {"user_id": 1, "ts": (base + 7200 + i * 60) * 1_000_000_000}
        for i in range(2)
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows1))
    stream = (
        spark.readStream.schema("user_id long, ts long")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    sessions = sessionize_stream(stream)
    collected = []

    def sink(df, _):
        collected.extend(df.collect())

    q = (
        sessions.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows2))
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline and not collected:
            q.processAllAvailable()
            time.sleep(0.5)
    finally:
        q.stop()
    assert any(
        r["user_id"] == 1 and r["n_events"] == 3 and r["session_start"] == base
        for r in collected
    ), collected


def test_windowed_stream_drops_late_data_beyond_watermark(spark, tmp_path):
    """Streaming semantics the batch oracle can't see: an event older
    than the watermark must NOT land in its (already closed) window."""
    import json as _json
    import time as _time

    from southpaw_spark.streaming.windows import windowed_event_counts

    src = tmp_path / "ev"
    src.mkdir()
    schema = "ts timestamp, event_type string, value double"

    def write(name, rows):
        (src / name).write_text(
            "\n".join(
                _json.dumps({"ts": ts, "event_type": et, "value": v})
                for ts, et, v in rows
            )
        )

    # batch A: three rows in the 12:00 window, one at 14:05 that will
    # push the watermark (1h) past 13:00, closing the 12:00 window
    write("a.json", [
        ("2026-01-01 12:00:10", "view", 1.0),
        ("2026-01-01 12:10:00", "view", 1.0),
        ("2026-01-01 12:20:00", "view", 1.0),
        ("2026-01-01 14:05:00", "view", 1.0),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    out = windowed_event_counts(stream, ts_col="ts", window="1 hour",
                                watermark="1 hour")
    qname = f"wmtest{int(_time.time())}"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch B: a LATE row for the 12:00 window — the window has not
        # emitted yet (append mode flushes it during this batch), so if
        # the watermark drop were broken the row WOULD be counted and
        # the emitted window would read 4 events / 103.0
        write("b.json", [
            ("2026-01-01 12:55:00", "view", 100.0),   # before 13:05 wm → drop
            ("2026-01-01 14:10:00", "view", 1.0),
        ])
        deadline = _time.monotonic() + 60
        rows = []
        while _time.monotonic() < deadline:
            q.processAllAvailable()
            rows = spark.sql(f"select * from {qname}").collect()
            if any(str(r["window_start"]).startswith("2026-01-01 12:00") for r in rows):
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    win12 = [r for r in rows if str(r["window_start"]).startswith("2026-01-01 12:00")]
    assert win12, f"12:00 window never closed; got {rows}"
    # the late 11:55 row (value=100) must not have been counted
    assert win12[0]["n_events"] == 3 and win12[0]["sum_value"] == 3.0


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Re-delivered (key, ts) rows within the watermark horizon are
    emitted exactly once; a distinct key passes through."""
    import json as _json

    from southpaw_spark.streaming.windows import streaming_dedup

    src = tmp_path / "dd"
    src.mkdir()

    def write(name, rows):
        (src / name).write_text(
            "\n".join(
                _json.dumps({"event_id": e, "ts": ts, "value": v})
                for e, ts, v in rows
            )
        )

    # duplicate event_id=1 inside one batch AND re-delivered in the next
    write("a.json", [(1, "2024-01-01T12:00:00", 1.0),
                     (1, "2024-01-01T12:00:00", 1.0),
                     (2, "2024-01-01T12:01:00", 2.0)])
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    deduped = streaming_dedup(stream, ["event_id"], "ts", "1 hour")
    collected = []
    q = (
        deduped.writeStream.outputMode("append")
        .foreachBatch(lambda df, _: collected.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        write("b.json", [(1, "2024-01-01T12:00:00", 1.0),   # re-delivery
                         (3, "2024-01-01T12:05:00", 3.0)])  # new key
        q.processAllAvailable()
    finally:
        q.stop()
    seen = sorted(r["event_id"] for r in collected)
    assert seen == [1, 2, 3], collected


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream join with watermarks + time-range condition: a
    click joins views by the same user within the preceding 10 minutes.
    Both sides are unbounded streams; the range condition + watermarks
    bound the join state (Structured Streaming evicts view state once
    the click watermark passes view_ts + 10min)."""
    import json as _json

    from pyspark.sql import functions as F

    srcs = {}
    for side in ("clicks", "views"):
        d = tmp_path / side
        d.mkdir()
        srcs[side] = d

    def write(side, name, rows):
        (srcs[side] / name).write_text(
            "\n".join(
                _json.dumps({"event_id": e, "user_id": u, "ts": ts})
                for e, u, ts in rows
            )
        )

    write("clicks", "a.json", [(100, 1, "2024-01-01T12:10:00"),
                               (101, 1, "2024-01-01T13:30:00")])
    write("views", "a.json", [(200, 1, "2024-01-01T12:05:00"),   # in range of 100
                              (201, 1, "2024-01-01T11:00:00"),   # too old
                              (202, 2, "2024-01-01T12:08:00")])  # other user
    schema = "event_id long, user_id long, ts timestamp"
    clicks = (
        spark.readStream.schema(schema).json(str(srcs["clicks"]))
        .withWatermark("ts", "1 hour")
        .select(F.col("event_id").alias("click_id"), "user_id",
                F.col("ts").alias("click_ts"))
    )
    views = (
        spark.readStream.schema(schema).json(str(srcs["views"]))
        .withWatermark("ts", "1 hour")
        .select(F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user_id"),
                F.col("ts").alias("view_ts"))
    )
    joined = clicks.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("interval 10 minutes"))
        & (F.col("view_ts") < F.col("click_ts")),
    ).select("click_id", "view_id")
    collected = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda df, _: collected.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted((r.click_id, r.view_id) for r in collected) == [(100, 200)]


def test_funnel_stream_exact_under_out_of_order(spark, tmp_path):
    """Streaming funnel: out-of-order events across micro-batches must
    still produce the batch semantics (first view; first click strictly
    after it; first purchase after that) once the watermark passes —
    the watermark-ordered fold at work."""
    import json as _json

    from southpaw_spark.streaming.windows import funnel_stream

    base = 1_700_000_000_000_000  # epoch us
    m = 60_000_000
    # user 1: purchase arrives FIRST (batch a), the view that unlocks the
    # funnel arrives later (batch b) with an EARLIER timestamp
    batch_a = [
        (1, "purchase", base + 50 * m),
        (1, "click", base + 20 * m),
        (2, "view", base + 5 * m),
        (2, "click", base + 2 * m),   # click BEFORE first view: ignored
    ]
    batch_b = [
        (1, "view", base + 10 * m),
        (2, "click", base + 9 * m),
        (2, "error", base + 11 * m),  # non-stage event: filtered
    ]
    src = tmp_path / "ev"
    src.mkdir()

    def write(name, rows):
        (src / name).write_text("\n".join(
            _json.dumps({"user_id": u, "event_type": et, "ts_us": ts})
            for u, et, ts in rows
        ))

    write("a.json", batch_a)
    stream = (
        spark.readStream.schema("user_id long, event_type string, ts_us long")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    # delay must cover the cross-batch disorder (view@10m arrives after
    # purchase@50m has set the watermark) — rows older than the
    # watermark are dropped by Spark before the operator sees them
    out = funnel_stream(stream, watermark="2 hours")
    qname = f"funnel{int(time.time())}"
    q = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        write("b.json", batch_b)
        q.processAllAvailable()
        # advance the watermark past everything so buffers fold
        write("c.json", [(99, "view", base + 100_000 * m)])
        for _ in range(3):
            q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        f"SELECT * FROM {qname}"
    ).collect()
    latest = {}
    for r in rows:  # update mode: last emission per user wins
        latest[r["user_id"]] = (r["view_ts"], r["click_ts"], r["purchase_ts"])
    # user 1: view@10m unlocks click@20m then purchase@50m — even though
    # they arrived in reverse order across batches
    assert latest[1] == (base + 10 * m, base + 20 * m, base + 50 * m)
    # user 2: first view@5m, first click AFTER it is @9m, no purchase
    assert latest[2] == (base + 5 * m, base + 9 * m, None)


def test_global_rank_exact_at_every_bucket_count(spark, sf_dir):
    """a09: the no-global-sort rank equals a plain global window at
    n_buckets ∈ {1, 4, 256} (boundaries only steer balance), ties on
    the order column break by id, nulls are excluded, and the
    within-bucket window partitions by range bucket (no single-task
    global sort in the plan at n_buckets > 1)."""
    from pyspark.sql import Window

    from southpaw_spark.operators.skew import global_rank

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    w = Window.orderBy("o_totalprice", "o_orderkey")
    ref = sorted(
        (r["o_orderkey"], r["rn"])
        for r in orders.withColumn(
            "rn", F.row_number().over(w)
        ).collect()
    )
    for nb in (1, 4, 256):
        out = global_rank(
            orders, "o_totalprice", "o_orderkey", n_buckets=nb
        )
        got = sorted(
            (r["o_orderkey"], r["global_row"]) for r in out.collect()
        )
        assert got == ref, f"n_buckets={nb}"
    plan = global_rank(
        orders, "o_totalprice", "o_orderkey", n_buckets=256
    )._jdf.queryExecution().executedPlan().toString()
    # the corpus-side window must be partitioned (by __bk), never a
    # single global ORDER BY partition
    assert "row_number" in plan
    assert "Window [row_number()" not in plan.replace(
        "partitionBy", ""
    ) or "__bk" in plan

    # ties + nulls + pct_rank edges on a tiny frame
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 1.0), (4, None), (5, 9.0)],
        "id long, v double",
    )
    rows = {
        r["id"]: (r["global_row"], r["pct_rank"])
        for r in global_rank(df, "v", "id", n_buckets=4).collect()
    }
    assert 4 not in rows  # null excluded
    assert rows[3][0] == 1 and rows[1][0] == 2 and rows[2][0] == 3
    assert rows[5] == (4, 1.0)
    assert rows[3][1] == 0.0
    single = global_rank(
        spark.createDataFrame([(1, 2.0)], "id long, v double"),
        "v", "id",
    ).collect()
    assert single[0]["global_row"] == 1 and single[0]["pct_rank"] == 0.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_buckets"):
        global_rank(df, "v", "id", n_buckets=0)


def test_ohlc_stream_converges_to_batch(spark, tmp_path):
    """Drive ohlc_stream through a real two-file stream and assert the
    final bars equal the batch operator over the union — the same
    stream≡batch convergence contract the dedup streams pin. min_by/
    max_by must merge correctly across micro-batches (open from batch
    1, close from batch 2 within one window)."""
    import json as _json

    from southpaw_spark.streaming.windows import ohlc_stream

    src = tmp_path / "in"
    src.mkdir()
    base = 1_700_000_000
    # window 1: rows split across the two files (open in file a,
    # high+close in file b); window 2: single row in file b
    rows_a = [
        {"k": "x", "ts_s": base + 60, "v": 5.0},
        {"k": "x", "ts_s": base + 120, "v": 2.0},
    ]
    rows_b = [
        {"k": "x", "ts_s": base + 200, "v": 9.0},
        {"k": "x", "ts_s": base + 3700, "v": 4.0},
    ]
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows_a))
    (src / "b.json").write_text("\n".join(_json.dumps(r) for r in rows_b))
    stream = (
        spark.readStream.schema("k string, ts_s long, v double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    )
    bars = ohlc_stream(stream, ["k"], "v")
    latest: dict = {}

    def sink(df, _):
        for r in df.collect():
            latest[(r["window_start"], r["k"])] = (
                r["open"], r["high"], r["low"], r["close"], r["n_events"]
            )

    q = (
        bars.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch = spark.createDataFrame(
        [(r["k"], r["ts_s"], r["v"]) for r in rows_a + rows_b],
        "k string, ts_s long, v double",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    want = {
        (r["window_start"], r["k"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"]
        )
        for r in ohlc_stream(batch, ["k"], "v").collect()
    }
    assert latest == want
    # cross-file merge inside window 1: open came from file a, close
    # and high from file b
    w1 = [v for k, v in latest.items() if v[4] == 3]
    assert w1 == [(5.0, 9.0, 2.0, 9.0, 3)]


def test_ohlc_stream_duplicate_ts_order_col(spark, tmp_path):
    """Duplicate-timestamp ties across MICRO-BATCH boundaries: order_col
    must pin open/close deterministically in the stream and converge to
    the batch operator with the same tie-break (round-10 task: e12/ohlc
    tie-break parameter, stream twin)."""
    import json as _json

    from southpaw_spark.streaming.windows import ohlc_stream

    src = tmp_path / "in"
    src.mkdir()
    base = 1_700_000_000
    # window 1: four rows, two tied pairs — the later-SEQ member of the
    # open tie arrives in file a, the winning seq=1 row in file b, so
    # the merge across micro-batches must re-resolve the tie
    rows_a = [
        {"k": "x", "ts_s": base + 60, "seq": 2, "v": 5.0},
        {"k": "x", "ts_s": base + 200, "seq": 3, "v": 2.0},
    ]
    rows_b = [
        {"k": "x", "ts_s": base + 60, "seq": 1, "v": 8.0},
        {"k": "x", "ts_s": base + 200, "seq": 4, "v": 7.0},
    ]
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows_a))
    (src / "b.json").write_text("\n".join(_json.dumps(r) for r in rows_b))
    stream = (
        spark.readStream.schema("k string, ts_s long, seq long, v double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    )
    bars = ohlc_stream(stream, ["k"], "v", order_col="seq")
    latest: dict = {}

    def sink(df, _):
        for r in df.collect():
            latest[(r["window_start"], r["k"])] = (
                r["open"], r["high"], r["low"], r["close"], r["n_events"]
            )

    q = (
        bars.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert list(latest.values()) == [(8.0, 8.0, 2.0, 7.0, 4)]
    batch = spark.createDataFrame(
        [(r["k"], r["ts_s"], r["seq"], r["v"]) for r in rows_a + rows_b],
        "k string, ts_s long, seq long, v double",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    want = {
        (r["window_start"], r["k"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"]
        )
        for r in ohlc_stream(batch, ["k"], "v", order_col="seq").collect()
    }
    assert latest == want


def test_cohort_retention_matrix_and_plan(spark):
    """a11: hand-computed retention matrix on a planted cohort corpus
    (users joining on day 0 and day 1, churning at different offsets);
    offset-0 rate is exactly 1.0 for every cohort; repeated activity
    within a (user, day) does not double-count; the plan carries no
    global sort and only the two designed exchanges."""
    from southpaw_spark.operators.skew import cohort_retention

    rows = []
    # cohort day 10: users 1,2,3 — day 11 keeps {1,2}, day 12 keeps {1}
    for u, days in ((1, [10, 11, 12]), (2, [10, 11]), (3, [10])):
        rows += [(u, d) for d in days]
    # cohort day 11: users 4,5 — day 13 keeps {5}
    for u, days in ((4, [11]), (5, [11, 13])):
        rows += [(u, d) for d in days]
    rows.append((1, 10))  # duplicate activity, must not double-count
    df = spark.createDataFrame(rows, "user_id long, day long")
    out = cohort_retention(df, "user_id", "day")
    got = {
        (r["cohort"], r["offset"]): (
            r["n_active"], r["cohort_size"], r["retention_rate"]
        )
        for r in out.collect()
    }
    assert got == {
        (10, 0): (3, 3, 1.0),
        (10, 1): (2, 3, round(2 / 3, 6)),
        (10, 2): (1, 3, round(1 / 3, 6)),
        (11, 0): (2, 2, 1.0),
        (11, 2): (1, 2, 0.5),
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_rolling_active_users_hand_computed(spark):
    """e14: hand-computed DAU/rolling counts on a tiny activity log —
    a user active twice in one window counts once; observed-day
    restriction emits no phantom trailing days; window=1 degenerates
    to DAU (stickiness exactly 1.0); bad window raises."""
    import pytest as _pytest

    from southpaw_spark.operators.skew import rolling_active_users

    rows = [
        (1, 10), (2, 10),          # day 10: users {1,2}
        (1, 11),                   # day 11: {1}
        (1, 13), (3, 13), (1, 13)  # day 13: {1,3} (1 duplicated)
    ]
    df = spark.createDataFrame(rows, "user_id long, day long")
    got = {
        r["period"]: (r["dau"], r["rolling_active"], r["stickiness"])
        for r in rolling_active_users(df, "user_id", "day", window=3)
        .collect()
    }
    # window=3 ⇒ day d covers activity in [d-2, d]
    assert got == {
        10: (2, 2, 1.0),
        11: (1, 2, 0.5),            # {1,2} from days 9..11
        13: (2, 2, 1.0),  # days 11..13 active set is {1,3}
    }
    one = {
        r["period"]: (r["dau"], r["rolling_active"], r["stickiness"])
        for r in rolling_active_users(df, "user_id", "day", window=1)
        .collect()
    }
    assert all(d == w and s == 1.0 for d, w, s in one.values())
    with _pytest.raises(ValueError, match="window"):
        rolling_active_users(df, "user_id", "day", window=0)


def test_exact_quantiles_matches_sorted_ranks(spark):
    """a12: on a shuffled corpus with duplicate values the reported
    quantile values equal the Python sorted-rank answer at
    max(1, ceil(q*N)); q=1.0 is the max; bad q raises; empty input
    yields an empty frame."""
    import math
    import random

    import pytest as _pytest

    from southpaw_spark.operators.skew import exact_quantiles

    rng = random.Random(7)
    vals = [rng.randint(0, 50) for _ in range(500)]  # many duplicates
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    qs = [0.1, 0.5, 0.9, 1.0]
    got = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, "x", qs, n_buckets=8).collect()
    }
    s = sorted(vals)
    want = {q: s[max(1, math.ceil(q * len(s))) - 1] for q in qs}
    assert got == want
    assert got[1.0] == max(vals)
    with _pytest.raises(ValueError, match="quantiles"):
        exact_quantiles(df, "x", [0.0])
    empty = exact_quantiles(df.where("x < 0"), "x", [0.5])
    assert empty.count() == 0 and empty.columns == ["q", "value"]


def test_funnel_stream_conversion_window(spark, tmp_path):
    """Streaming funnel max_gap_us: a click beyond the conversion
    window never advances the threshold (the batch funnel(max_gap)
    rule); one inside it does."""
    import json as _json

    from pyspark.sql import functions as F  # noqa: F811

    from southpaw_spark.streaming.windows import funnel_stream

    base_us = 1_700_000_000 * 1_000_000
    rows = [
        # user 1: click 5s after view (inside the 10s window)
        {"user_id": 1, "event_type": "view", "ts_us": base_us},
        {"user_id": 1, "event_type": "click",
         "ts_us": base_us + 5_000_000},
        # user 2: click 50s after view (outside)
        {"user_id": 2, "event_type": "view", "ts_us": base_us},
        {"user_id": 2, "event_type": "click",
         "ts_us": base_us + 50_000_000},
        # sentinel pushes the watermark far past everything
        {"user_id": 99, "event_type": "view",
         "ts_us": base_us + 100_000_000_000},
    ]
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows))
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts_us long"
    ).json(str(src))
    latest: dict = {}

    def sink(df, _):
        for r in df.collect():
            latest[r["user_id"]] = (r["view_ts"], r["click_ts"])

    q = (
        funnel_stream(stream, watermark="1 hour", max_gap_us=10_000_000)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert latest[1] == (base_us, base_us + 5_000_000)
    assert latest[2] == (base_us, None)  # outside the window


def test_perplexity_buckets_hot_domain_range_rank_parity(spark):
    """Round-12 (VERDICT r11 item 3): a domain above hot_domain_rows is
    ranked through the a09/a12 range-bucket machinery instead of one
    window partition — output must be BIT-IDENTICAL to the window path
    on a 90%-one-domain corpus (ties included), and hot_domain_rows=None
    must keep the pure window path."""
    import random

    from southpaw_spark.operators.text import perplexity_buckets

    rng = random.Random(123)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for i in range(200):
        # 90% of docs in one hot domain; duplicate texts force score
        # TIES across the bucket boundary (the id tiebreak must agree)
        base = " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 8)))
        if i % 4 == 0 and i > 0:
            base = rows[i - 1][1]  # exact tie with the previous doc
        rows.append((i, base, "hot.example" if i % 10 else f"cold{i}"))
    df = spark.createDataFrame(rows, "doc_id long, text string, dom string")

    plain = {
        r["doc_id"]: (r["ppl_bucket"], r["avg_logprob"], r["n_bigrams"])
        for r in perplexity_buckets(
            df, "text", "doc_id", "dom", hot_domain_rows=None
        ).collect()
    }
    split = {
        r["doc_id"]: (r["ppl_bucket"], r["avg_logprob"], r["n_bigrams"])
        for r in perplexity_buckets(
            df, "text", "doc_id", "dom", hot_domain_rows=20
        ).collect()
    }
    assert split == plain
    # sanity: the hot domain actually took the range-bucket path
    # (> 20 rows) and produced every label
    hot_labels = {
        r["ppl_bucket"]
        for r in perplexity_buckets(
            df, "text", "doc_id", "dom", hot_domain_rows=20
        ).where(F.col("dom") == "hot.example").collect()
    }
    assert hot_labels == {"head", "middle", "tail"}


def test_centroid_outliers_hot_group_range_rank_parity(spark):
    """Round-13 (VERDICT r12 item 5): a group above hot_group_rows —
    or the whole corpus when group_col is None — ranks through the
    a09/t23 range-bucket machinery instead of one window partition;
    outlier_rank must be BIT-IDENTICAL to the window path, duplicate
    vectors (rounded-cosine ties crossing bucket boundaries) included."""
    from southpaw_spark.operators.similarity import centroid_outlier_scores

    def vec(i, dim=6):
        return [((i * 31 + j * 17) % 97 - 48) / 48.0 for j in range(dim)]

    rows = []
    for i in range(180):
        # 90% of vectors in one hot group; every 4th vector duplicates
        # the previous one so equal cosines must tie-break by id across
        # any bucket boundary; every 31st is the ZERO vector (NULL
        # cosine via try_divide — garbage embeddings must rank FIRST in
        # both paths, not crash under ANSI division-by-zero)
        if i % 31 == 30:
            v = [0.0] * 6
        elif i % 4 == 0 and i > 0:
            v = vec(i - 1)
        else:
            v = vec(i)
        rows.append((i, v, "hot" if i % 10 else f"cold{i}"))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, grp string"
    )

    import math

    def snap(out):
        return {
            r["vec_id"]: (
                "nan"
                if r["centroid_cosine"] is not None
                and math.isnan(r["centroid_cosine"])
                else r["centroid_cosine"],
                r["outlier_rank"],
            )
            for r in out.collect()
        }

    plain = snap(
        centroid_outlier_scores(
            df, "embedding", "vec_id", "grp", hot_group_rows=None
        )
    )
    split = snap(
        centroid_outlier_scores(
            df, "embedding", "vec_id", "grp", hot_group_rows=20
        )
    )
    assert split == plain

    # group_col=None: the single implicit group goes hot too (the
    # corpus-wide global-sort escape)
    plain_g = snap(
        centroid_outlier_scores(
            df, "embedding", "vec_id", hot_group_rows=None
        )
    )
    split_g = snap(
        centroid_outlier_scores(
            df, "embedding", "vec_id", hot_group_rows=20
        )
    )
    assert split_g == plain_g
    # ranks in the single group are a permutation of 1..N
    assert sorted(r for _, r in split_g.values()) == list(range(1, 181))
    # zero vectors: NULL cosine, ranked as the TOP outliers (nulls
    # first ascending) in both paths
    null_ranks = sorted(
        rank for vec_id, (c, rank) in split_g.items() if c is None
    )
    assert null_ranks and null_ranks == list(range(1, len(null_ranks) + 1))
