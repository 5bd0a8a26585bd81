"""Streaming as-of join (stream probing broadcast state): e04-parity on
batch data, plus a real watermarked micro-batch replay — the streaming
plan must produce exactly the batch ``asof_join`` rows."""

import json as _json
import time as _time

from pyspark.sql import functions as F

from southpaw_spark.operators.temporal import asof_join
from southpaw_spark.streaming.temporal import asof_join_stream, asof_state
from southpaw_spark.suite import _events_ts_us


def _clicks_views(spark, sf_dir):
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = raw.withColumn("ts_us", _events_ts_us(raw))
    clicks = ev.where("event_type = 'click'").select(
        "event_id", "user_id", "ts_us"
    )
    views = ev.where("event_type = 'view'").select(
        F.col("user_id"),
        F.col("ts_us").alias("view_ts_us"),
        F.col("event_id").alias("view_event_id"),
    )
    return clicks, views


def _rows(df):
    return sorted(
        (tuple(r[c] for c in sorted(df.columns)) for r in df.collect()),
        key=repr,
    )


def test_e04_parity_on_batch(spark, sf_dir):
    """Same inputs, same rows as the batch union-and-window operator."""
    clicks, views = _clicks_views(spark, sf_dir)
    batch = asof_join(
        clicks, views, on=["user_id"], left_ts="ts_us", right_ts="view_ts_us"
    )
    state = asof_state(views, on=["user_id"], right_ts="view_ts_us")
    probed = asof_join_stream(
        clicks, state, on=["user_id"], left_ts="ts_us", right_ts="view_ts_us"
    )
    assert sorted(probed.columns) == sorted(batch.columns)
    assert _rows(probed) == _rows(batch)


def test_forward_and_tolerance_parity(spark):
    left = spark.createDataFrame(
        [(1, 100), (1, 205), (2, 50), (3, None)],
        "k long, lts long",
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 100, "b"), (1, 300, "c"), (2, 500, "d")],
        "k long, rts long, tag string",
    )
    for direction, tol in [
        ("backward", None), ("forward", None),
        ("backward", 10), ("forward", 100),
    ]:
        batch = asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            tolerance=tol, direction=direction,
        )
        probed = asof_join_stream(
            left, asof_state(right, ["k"], "rts"),
            on=["k"], left_ts="lts", right_ts="rts",
            tolerance=tol, direction=direction,
        )
        assert _rows(probed) == _rows(batch), (direction, tol)


def test_asof_state_size_guard(spark):
    """asof_state must refuse to build broadcast state past
    max_state_rows (naming the non-broadcast fallbacks), pass under the
    threshold, and allow opting out with None."""
    import pytest

    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 30, "c")],
        "k long, rts long, tag string",
    )
    with pytest.raises(ValueError, match="max_state_rows.*fallback"):
        asof_state(right, ["k"], "rts", max_state_rows=2)
    assert asof_state(right, ["k"], "rts", max_state_rows=3).count() == 2
    assert asof_state(right, ["k"], "rts", max_state_rows=None).count() == 2


def test_duplicate_right_ts_tiebreak_matches_batch(spark):
    """Equal right timestamps must resolve to the same (max-struct)
    winner as the batch operator."""
    left = spark.createDataFrame([(1, 100)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 100, "x"), (1, 100, "z"), (1, 100, "y")],
        "k long, rts long, tag string",
    )
    batch = asof_join(left, right, ["k"], "lts", "rts")
    probed = asof_join_stream(
        left, asof_state(right, ["k"], "rts"), ["k"], "lts", "rts"
    )
    assert _rows(probed) == _rows(batch)
    assert probed.collect()[0]["tag"] == "z"


def test_streaming_replay_matches_batch(spark, sf_dir, tmp_path):
    """Replay sf clicks as a watermarked two-micro-batch stream against
    broadcast view state; the appended output must equal the batch
    as-of join row-for-row."""
    clicks, views = _clicks_views(spark, sf_dir)
    state = asof_state(views, on=["user_id"], right_ts="view_ts_us").cache()

    src = tmp_path / "clicks"
    src.mkdir()
    rows = clicks.collect()
    half = len(rows) // 2
    for name, chunk in [("a.json", rows[:half]), ("b.json", rows[half:])]:
        (src / name).write_text(
            "\n".join(
                _json.dumps(
                    {"event_id": r["event_id"], "user_id": r["user_id"],
                     "ts_us": r["ts_us"]}
                )
                for r in chunk
            )
        )
    stream = (
        spark.readStream.schema("event_id long, user_id long, ts_us long")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("ts", "1 hour")
    )
    out = asof_join_stream(
        stream, state, on=["user_id"], left_ts="ts_us",
        right_ts="view_ts_us",
    ).drop("ts")
    qname = f"asof{int(_time.time())}"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(f"SELECT * FROM {qname}")
    batch = asof_join(
        clicks, views, on=["user_id"], left_ts="ts_us", right_ts="view_ts_us"
    )
    try:
        assert _rows(got) == _rows(batch)
    finally:
        # don't leak the cached state lineage into later tests' plans
        state.unpersist()


def test_probe_plan_is_broadcast_zero_extra_shuffles(spark, sf_dir):
    """Scale contract: the probe side is a broadcast hash join — the
    only exchange in the plan is the one-time state groupBy, so each
    micro-batch adds ZERO shuffles."""
    from southpaw_spark.plans import join_strategies, num_exchanges

    clicks, views = _clicks_views(spark, sf_dir)
    state = asof_state(views, on=["user_id"], right_ts="view_ts_us")
    out = asof_join_stream(
        clicks, state, on=["user_id"], left_ts="ts_us", right_ts="view_ts_us"
    )
    strategies = join_strategies(out)
    assert strategies.get("BroadcastHashJoin", 0) >= 1, strategies
    assert "BroadcastNestedLoopJoin" not in strategies
    assert "CartesianProduct" not in strategies
    assert num_exchanges(out) <= 1, num_exchanges(out)


import pytest


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_stream_stream_asof_matches_batch_tolerance(spark, tmp_path, direction):
    """Both sides streaming: the chained interval-join + max aggregation
    must emit exactly the batch asof_join(tolerance=horizon) rows once
    the watermark closes them — in both directions, including the
    duplicate-timestamp tie-break."""
    import json

    from southpaw_spark.streaming.temporal import asof_join_stream_stream

    base = 1_700_000_000
    lrows = [
        {"eid": 1, "k": 1, "sec": base + 100},
        {"eid": 2, "k": 1, "sec": base + 300},
        {"eid": 3, "k": 2, "sec": base + 150},   # no right rows for k=2
        {"eid": 4, "k": 1, "sec": base + 5000},  # beyond horizon of all
    ]
    rrows = [
        {"rid": 10, "k": 1, "sec": base + 50},
        {"rid": 11, "k": 1, "sec": base + 250},
        {"rid": 12, "k": 1, "sec": base + 400},
        {"rid": 13, "k": 1, "sec": base + 300},  # exact tie with eid 2
    ]
    src_l = tmp_path / "l"; src_l.mkdir()
    src_r = tmp_path / "r"; src_r.mkdir()
    (src_l / "a.json").write_text("\n".join(json.dumps(r) for r in lrows))
    (src_r / "a.json").write_text("\n".join(json.dumps(r) for r in rrows))
    horizon = 600

    L = (
        spark.readStream.schema("eid long, k long, sec long").json(str(src_l))
        .select("eid", "k", F.timestamp_seconds("sec").alias("lts"))
    )
    R = (
        spark.readStream.schema("rid long, k long, sec long").json(str(src_r))
        .select("rid", "k", F.timestamp_seconds("sec").alias("rts"))
    )
    out = asof_join_stream_stream(
        L, R, on=["k"], left_ts="lts", right_ts="rts",
        horizon_seconds=horizon, left_delay="10 minutes",
        right_delay="10 minutes", direction=direction,
    )
    qname = f"ssasof{direction}{int(_time.time())}"
    q = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark only advances on new data: push a far-future row on
        # BOTH sides under a throwaway key, then let it flush
        (src_l / "b.json").write_text(
            json.dumps({"eid": 99, "k": 9, "sec": base + 10_000_000})
        )
        (src_r / "b.json").write_text(
            json.dumps({"rid": 99, "k": 9, "sec": base + 10_000_000})
        )
        for _ in range(3):
            q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["eid"]: (r["k"], r["rts"], r["rid"])
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
        if r["eid"] != 99
    }

    # batch oracle on epoch seconds with tolerance=horizon
    lb = spark.createDataFrame(
        [(r["eid"], r["k"], r["sec"]) for r in lrows],
        "eid long, k long, lsec long",
    )
    rb = spark.createDataFrame(
        [(r["rid"], r["k"], r["sec"]) for r in rrows],
        "rid long, k long, rsec long",
    )
    batch = asof_join(
        lb, rb, on=["k"], left_ts="lsec", right_ts="rsec",
        tolerance=horizon, direction=direction,
    )
    import datetime as _dt

    def ts(sec):
        return (
            None if sec is None
            else _dt.datetime.fromtimestamp(sec, _dt.timezone.utc)
            .replace(tzinfo=None)
        )

    expected = {
        r["eid"]: (r["k"], ts(r["rsec"]), r["rid"]) for r in batch.collect()
    }
    assert got == expected, (direction, got, expected)
    if direction == "backward":
        # tie at eid2 resolves to max rid; eid3 no match; eid4 expired
        assert got[2][2] == 13 and got[3][2] is None and got[4][2] is None
    else:
        # forward: eid2's earliest future is the base+300 tie -> max rid
        assert got[2][2] == 13 and got[3][2] is None


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_stream_stream_plan_randomized_batch_parity(spark, direction):
    """The chained-join+agg plan is plain DataFrame ops (watermarks are
    no-ops on batch), so randomized parity vs the batch operator is
    cheap: random keys/timestamps incl. duplicate ts must match
    asof_join(tolerance=horizon) exactly."""
    import random

    from southpaw_spark.streaming.temporal import asof_join_stream_stream

    base = 1_700_000_000
    horizon = 300
    for seed in (5, 42):
        rng = random.Random(seed)
        lrows = [
            (i, rng.randrange(6), base + rng.randrange(0, 2000))
            for i in range(40)
        ]
        rrows = [
            (100 + i, rng.randrange(6), base + rng.randrange(0, 2000))
            for i in range(60)
        ]
        L = spark.createDataFrame(lrows, "eid long, k long, lsec long")
        R = spark.createDataFrame(rrows, "rid long, k long, rsec long")
        got = asof_join_stream_stream(
            L.select("eid", "k", F.timestamp_seconds("lsec").alias("lts")),
            R.select("rid", "k", F.timestamp_seconds("rsec").alias("rts")),
            on=["k"], left_ts="lts", right_ts="rts",
            horizon_seconds=horizon, direction=direction,
        ).select(
            "eid", "k", F.unix_seconds("lts").alias("lsec"),
            F.unix_seconds("rts").alias("rsec"), "rid",
        )
        expected = asof_join(
            L, R, on=["k"], left_ts="lsec", right_ts="rsec",
            tolerance=horizon, direction=direction,
        ).select("eid", "k", "lsec", "rsec", "rid")
        assert _rows(got) == _rows(expected), (direction, seed)


def test_probe_with_empty_state_keeps_left_rows(spark):
    """Empty right side → every left row survives with null match
    columns (left-outer contract), matching the batch operator."""
    left = spark.createDataFrame([(1, 1, 100), (2, 2, 200)],
                                 "eid long, k long, lts long")
    right = spark.createDataFrame([], "k long, rts long, tag string")
    state = asof_state(right, ["k"], "rts")
    probed = asof_join_stream(left, state, ["k"], "lts", "rts")
    batch = asof_join(left, right, ["k"], "lts", "rts")
    assert _rows(probed) == _rows(batch)
    rows = probed.collect()
    assert len(rows) == 2 and all(r["rts"] is None and r["tag"] is None
                                  for r in rows)


def test_asof_join_auto_total_at_any_state_size(spark, sf_dir):
    """asof_join_auto must be TOTAL: where asof_state raises past the
    broadcast cap, auto silently switches strategy — and every arm
    (broadcast probe, batch union-window, non-broadcast probe) emits
    exactly the batch asof_join rows."""
    import pytest as _pytest

    from southpaw_spark.streaming.temporal import asof_join_auto

    clicks, views = _clicks_views(spark, sf_dir)
    batch = _rows(
        asof_join(
            clicks, views, on=["user_id"], left_ts="ts_us",
            right_ts="view_ts_us",
        )
    )
    # the raw guard still raises at this size...
    with _pytest.raises(ValueError, match="asof_join_auto"):
        asof_state(views, ["user_id"], "view_ts_us", max_state_rows=5)
    # ...auto does not: tiny cap -> batch union-window arm
    assert _rows(
        asof_join_auto(
            clicks, views, on=["user_id"], left_ts="ts_us",
            right_ts="view_ts_us", max_broadcast_rows=5,
        )
    ) == batch
    # big cap -> broadcast probe arm
    assert _rows(
        asof_join_auto(
            clicks, views, on=["user_id"], left_ts="ts_us",
            right_ts="view_ts_us", max_broadcast_rows=10_000_000,
        )
    ) == batch
    # None -> forced broadcast arm
    assert _rows(
        asof_join_auto(
            clicks, views, on=["user_id"], left_ts="ts_us",
            right_ts="view_ts_us", max_broadcast_rows=None,
        )
    ) == batch


def test_asof_join_auto_streaming_nonbroadcast_parity(spark, tmp_path):
    """Streaming left past the broadcast cap: the auto fallback is a
    NON-broadcast stream-static join — outputs must equal the batch
    operator, and the plan must not carry a BroadcastExchange for the
    state side."""
    from southpaw_spark.streaming.temporal import (
        asof_join_auto,
        asof_join_stream,
        asof_state,
    )

    left = spark.createDataFrame(
        [(1, 100), (1, 5), (2, 250), (3, 40)], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 90, "b"), (2, 200, "c"), (9, 1, "z")],
        "k long, rts long, tag string",
    )
    batch = _rows(asof_join(left, right, ["k"], "lts", "rts"))
    # plan shape on the batch-left equivalent of the streaming arm
    probe = asof_join_stream(
        left, asof_state(right, ["k"], "rts"), ["k"], "lts", "rts",
        broadcast_state=False,
    )
    assert "BroadcastExchange" not in (
        probe._jdf.queryExecution().executedPlan().toString()
    )
    assert _rows(probe) == batch

    # real micro-batch replay through the auto switch at a tiny cap
    src = str(tmp_path / "left_src")
    left.repartition(2).write.format("parquet").save(src)
    stream_left = (
        spark.readStream.schema("k long, lts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = asof_join_auto(
        stream_left, right, on=["k"], left_ts="lts", right_ts="rts",
        max_broadcast_rows=2,
    )
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rows(spark.read.parquet(sink)) == batch


def test_asof_join_auto_rejects_streaming_right(spark):
    """A streaming RIGHT side must fail with a clear ValueError (not an
    opaque AnalysisException from the sizing count()) pointing at
    asof_join_stream_stream (ADVICE r8)."""
    import pytest as _pytest

    from southpaw_spark.streaming.temporal import asof_join_auto

    left = spark.createDataFrame([(1, 100)], "k long, lts long")
    right = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .select(F.col("value").alias("k"), F.col("value").alias("rts"))
    )
    with _pytest.raises(ValueError, match="stream_stream"):
        asof_join_auto(left, right, on=["k"], left_ts="lts", right_ts="rts")


def test_gapfill_stream_converges_to_batch(spark, tmp_path):
    """gapfill_stream ≡ batch gapfill row-for-row and double-for-double
    on a real two-file stream whose gap SPANS the micro-batch boundary
    (prev observation in file a, next in file b); an idle key with data
    only in file a is flushed purely by the event-time timer when the
    other key's rows advance the global watermark — no sentinel for it.
    The sentinel key-x row only advances the watermark: its own bucket
    never closes, so it is absent from the output, and the batch oracle
    runs over the non-sentinel rows."""
    import json as _json

    from pyspark.sql import functions as F

    from southpaw_spark.operators.temporal import gapfill
    from southpaw_spark.streaming.windows import gapfill_stream

    base = 1_700_000_000
    real = [
        # key x bucket 0: two events -> exact cent average 2.0
        {"k": "x", "ts_s": base + 5, "v": 1.25},
        {"k": "x", "ts_s": base + 10, "v": 2.75},
        {"k": "x", "ts_s": base + 65, "v": 4.00},    # bucket 1
        {"k": "y", "ts_s": base + 7, "v": 10.10},    # idle key, file a only
    ]
    file_b = [
        {"k": "x", "ts_s": base + 245, "v": 8.00},   # bucket 4: gap 2,3
    ]
    sentinel = {"k": "x", "ts_s": base + 1000, "v": 0.0}
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(_json.dumps(r) for r in real)
    )
    (src / "b.json").write_text(
        "\n".join(_json.dumps(r) for r in file_b + [sentinel])
    )
    stream = (
        spark.readStream.schema("k string, ts_s long, v double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    )
    filled = gapfill_stream(
        stream, "ts", ["k"], "v",
        stride=60, watermark="10 seconds", exact_decimals=2,
    )
    got: dict = {}

    def sink(df, _):
        for r in df.collect():
            got[(r["k"], r["bucket"])] = (
                r["v_obs"], r["v_locf"], r["v_interp"]
            )

    q = (
        filled.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch_rows = spark.createDataFrame(
        [(r["k"], r["ts_s"], r["v"]) for r in real + file_b],
        "k string, ts_s long, v double",
    )
    want = {
        (r["k"], r["bucket"]): (r["v_obs"], r["v_locf"], r["v_interp"])
        for r in gapfill(
            batch_rows, "ts_s", ["k"], "v", stride=60, exact_decimals=2
        ).collect()
    }
    assert got == want
    # the gap buckets really were filled (not just observed rows)
    b1 = (base // 60) * 60
    assert got[("x", b1 + 120)][0] is None  # gap: no observation
    assert got[("x", b1 + 120)][1] == 4.0   # locf from bucket 1
    assert ("y", (base // 60) * 60) in got  # idle key flushed by timer


def test_gapfill_stream_checkpoint_restart(spark, tmp_path):
    """gapfill_stream survives a stop/restart on the same checkpoint:
    the open-bucket integer sums and the locf carry state recover from
    the state store, so a gap whose observations straddle the RESTART
    (not just a micro-batch boundary) still converges to batch gapfill
    exactly — and each grid row is emitted exactly once across both
    runs (append mode, no duplicates on replay)."""
    import json as _json

    from pyspark.sql import functions as F

    from southpaw_spark.operators.temporal import gapfill
    from southpaw_spark.streaming.windows import gapfill_stream

    base = 1_700_000_000
    real = [
        {"k": "x", "ts_s": base + 5, "v": 3.00},
        {"k": "x", "ts_s": base + 10, "v": 5.00},   # bucket 0 avg 4.0
        {"k": "x", "ts_s": base + 65, "v": 6.00},   # bucket 1
    ]
    file_b = [{"k": "x", "ts_s": base + 185, "v": 9.00}]  # bucket 3
    sentinel = {"k": "x", "ts_s": base + 900, "v": 0.0}
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in real))

    def make_stream():
        return (
            spark.readStream.schema("k string, ts_s long, v double")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
            .withColumn("ts", F.col("ts_s").cast("timestamp"))
        )

    got: list = []

    def sink(df, _):
        got.extend(
            (r["k"], r["bucket"], r["v_obs"], r["v_locf"], r["v_interp"])
            for r in df.collect()
        )

    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            gapfill_stream(
                make_stream(), "ts", ["k"], "v",
                stride=60, watermark="10 seconds", exact_decimals=2,
            )
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()  # run 1: file a only — bucket 0 closes, 1/3 stay open
    (src / "b.json").write_text(
        "\n".join(_json.dumps(r) for r in file_b + [sentinel])
    )
    run_once()  # run 2: recovered state closes 1 and 3, fills 2

    batch_rows = spark.createDataFrame(
        [(r["k"], r["ts_s"], r["v"]) for r in real + file_b],
        "k string, ts_s long, v double",
    )
    want = sorted(
        (r["k"], r["bucket"], r["v_obs"], r["v_locf"], r["v_interp"])
        for r in gapfill(
            batch_rows, "ts_s", ["k"], "v", stride=60, exact_decimals=2
        ).collect()
    )
    assert sorted(got) == want          # exact convergence
    assert len(got) == len(set(got))    # exactly-once emission


def test_gapfill_stream_chunking_invariance_fuzz(spark, tmp_path):
    """gapfill_stream emits the SAME rows for any ordered chunking of
    the same event log (2–4 files, random split points): random
    multi-key series with duplicate-bucket events and gaps, a final
    sentinel advancing the watermark past everything real; every
    chunking's output equals batch gapfill row-for-row."""
    import json as _json
    import random

    from pyspark.sql import functions as F

    from southpaw_spark.operators.temporal import gapfill
    from southpaw_spark.streaming.windows import gapfill_stream

    rng = random.Random(90921)
    base = 1_700_000_000
    events = []
    for key in ("a", "b"):
        t = 0
        for _ in range(rng.randint(4, 8)):
            t += rng.choice([5, 40, 70, 200])  # some gaps span buckets
            events.append(
                {
                    "k": key,
                    "ts_s": base + t,
                    "v": round(rng.uniform(1, 50), 2),
                }
            )
    events.sort(key=lambda e: e["ts_s"])  # in-order arrival
    sentinel = {"k": "a", "ts_s": base + 10_000, "v": 0.0}

    batch_rows = spark.createDataFrame(
        [(e["k"], e["ts_s"], e["v"]) for e in events],
        "k string, ts_s long, v double",
    )
    want = sorted(
        (r["k"], r["bucket"], r["v_obs"], r["v_locf"], r["v_interp"])
        for r in gapfill(
            batch_rows, "ts_s", ["k"], "v", stride=60, exact_decimals=2
        ).collect()
    )

    for trial in range(2):
        trng = random.Random(500 + trial)
        n_chunks = trng.randint(2, 4)
        cuts = sorted(
            trng.sample(range(1, len(events)), n_chunks - 1)
        )
        chunks = [
            events[i:j]
            for i, j in zip([0] + cuts, cuts + [len(events)])
        ]
        chunks[-1] = chunks[-1] + [sentinel]
        src = tmp_path / f"in{trial}"
        src.mkdir()
        for ci, chunk in enumerate(chunks):
            (src / f"{ci:02d}.json").write_text(
                "\n".join(_json.dumps(r) for r in chunk)
            )
        stream = (
            spark.readStream.schema("k string, ts_s long, v double")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
            .withColumn("ts", F.col("ts_s").cast("timestamp"))
        )
        got: list = []
        q = (
            gapfill_stream(
                stream, "ts", ["k"], "v",
                stride=60, watermark="10 seconds", exact_decimals=2,
            )
            .writeStream.outputMode("append")
            .foreachBatch(
                lambda df, _: got.extend(
                    (r["k"], r["bucket"], r["v_obs"], r["v_locf"],
                     r["v_interp"])
                    for r in df.collect()
                )
            )
            .option("checkpointLocation", str(tmp_path / f"ck{trial}"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert sorted(got) == want, (trial, cuts)
        assert len(got) == len(set(got))  # exactly-once per chunking
