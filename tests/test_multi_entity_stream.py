"""Multi-entity unified stream through attach_stream (entity projection)
and approx-distinct quality."""

import json
import time

from pyspark.sql import functions as F

from southpaw_spark.relations import load_relations
from southpaw_spark.streaming import IncrementalDenormalizer, ParquetStateStore
from southpaw_spark.testing import (
    CHANGELOG_EVENTS,
    ENTITY_SCHEMAS,
    RELATION_TREES,
    changelog_frames,
    entity_keys,
)


def test_attach_stream_multi_entity(spark, tmp_path):
    """player + user CDC events interleaved in ONE stream (union schema);
    entity_columns projects each slice back to its own changelog."""
    from southpaw_spark.streaming import Metrics, SouthpawStreamingListener

    rels = load_relations([RELATION_TREES[1]])  # DenormalizedPlayer
    keys = entity_keys()
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    metrics = Metrics()
    listener = SouthpawStreamingListener(metrics)
    spark.streams.addListener(listener)
    ivm = IncrementalDenormalizer(
        spark=spark,
        relations=rels,
        keys=keys,
        store=store,
        collect_metrics=True,
        metrics=metrics,
    )
    logs = changelog_frames(spark)
    ivm.bootstrap(
        {e: logs[e].where("seq < 0").drop("seq", "is_tombstone") for e in ("player", "user")}
    )

    user_cols = [c.split()[0] for c in ENTITY_SCHEMAS["user"][0].split(", ")]
    player_cols = [c.split()[0] for c in ENTITY_SCHEMAS["player"][0].split(", ")]
    union_cols = list(dict.fromkeys(user_cols + player_cols))

    def to_union(entity, cols, ev):
        d = dict(zip(cols, ev))
        return {c: d.get(c) for c in union_cols} | {"entity": entity}

    events = [to_union("user", user_cols, e) for e in CHANGELOG_EVENTS["user"]] + [
        to_union("player", player_cols, e) for e in CHANGELOG_EVENTS["player"]
    ]
    events.sort(key=lambda e: e["seq"])

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text("\n".join(json.dumps(e) for e in events))

    schema = (
        "seq long, user_id int, user_name string, email string, usage_type string,"
        " is_tombstone boolean, id int, name string, entity string"
    )
    results = {}

    def sink(name, df):
        for r in df.collect():
            results[(name, r["id"])] = r["value"]

    stream = spark.readStream.schema(schema).json(str(src))
    q = ivm.attach_stream(
        stream,
        entity_col="entity",
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink=sink,
        entity_columns={"user": user_cols, "player": player_cols},
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            q.processAllAvailable()
            if ("DenormalizedPlayer", 800) in results:
                break
            time.sleep(1)
    finally:
        q.stop()

    doc = json.loads(results[("DenormalizedPlayer", 800)])
    assert [u["Record"]["user_name"] for u in doc["Children"]["user"]] == ["alice2"]
    # player 802 has NULL user_id → absent key; must not have been
    # polluted by union-schema null columns
    doc802 = json.loads(results[("DenormalizedPlayer", 802)])
    assert "user" not in doc802["Children"]

    # metrics parity (reference metric/Metrics.java names): IVM counters …
    assert metrics.get("records.consumed.user", 0) > 0
    assert metrics.get("records.consumed.player", 0) > 0
    assert metrics.get("denormalized.records.created.DenormalizedPlayer", 0) > 0
    assert metrics.get("states.committed.count", 0) > 0
    # … and listener-pushed streaming progress (events are async)
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline and not metrics.get("batches.processed"):
        time.sleep(0.5)
    snap = metrics.snapshot()
    assert snap.get("batches.processed", 0) > 0
    assert snap.get("records.consumed.total", 0) > 0
    assert "batch.duration.ms" in snap
    spark.streams.removeListener(listener)


def test_approx_distinct_quality(spark, sf_dir):
    """e03 carries the sketch invariant in-row: exact_users must equal
    an independently computed exact count, and the HLL++ estimate must
    sit within the 3×rsd bound (the in-row boolean the driver oracle
    pins to TRUE)."""
    from southpaw_spark import suite

    rows = {
        r["event_type"]: r
        for r in suite.e03_approx_distinct(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for k, n in exact.items():
        assert rows[k]["exact_users"] == n
        assert rows[k]["hll_within_3rsd"] is True, (k, n)


def test_offset_total_parses_kafka_json_offsets():
    from southpaw_spark.streaming.metrics import _offset_total

    assert _offset_total("123") == 123
    assert _offset_total(456) == 456
    assert _offset_total('{"t": {"0": 100, "1": 20}}') == 120
    assert _offset_total('{"a": {"0": 1}, "b": {"0": 2, "1": 3}}') == 6
    assert _offset_total(None) is None
    assert _offset_total("not json") is None


def test_prometheus_exposition_and_http_exporter():
    """The reference ships metrics via JmxReporter
    (metric/Metrics.java:50,137); the Python-side deployable analog is
    a Prometheus scrape endpoint. prometheus_lines renders the registry
    losslessly (reference names in the 'name' label, dotted names
    untouched); MetricsHttpExporter serves it at GET /metrics and the
    snapshot is taken PER SCRAPE (time.since.last.backup ticks)."""
    import time
    import urllib.request

    from southpaw_spark.streaming import (
        Metrics,
        MetricsHttpExporter,
        prometheus_lines,
    )

    m = Metrics()
    m.mark("records.consumed.user", 7)
    m.mark("records.consumed.user", 3)
    m.gauge("topic.lag", 42)
    m.timer("states.committed", 1.5)
    m.gauge("build.version", "abc123")  # non-numeric: skipped
    m.mark_backup()

    text = prometheus_lines(m)
    assert "# TYPE southpaw_metric untyped" in text
    assert 'southpaw_metric{name="records.consumed.user"} 10' in text
    assert 'southpaw_metric{name="topic.lag"} 42' in text
    assert 'southpaw_metric{name="states.committed.count"} 1' in text
    assert 'southpaw_metric{name="states.committed.total_s"} 1.5' in text
    assert "abc123" not in text  # strings are not Prometheus samples
    assert "_last_backup_at" not in text  # internal key stays internal
    assert 'southpaw_metric{name="time.since.last.backup"} 0' in text

    with MetricsHttpExporter(m) as exp:
        url = f"http://{exp.host}:{exp.port}/metrics"
        body = urllib.request.urlopen(url, timeout=10).read().decode()
        assert 'southpaw_metric{name="records.consumed.user"} 10' in body
        # live registry: a later mark shows up on the next scrape
        m.mark("records.consumed.user", 5)
        time.sleep(1.1)  # let the backup gauge tick at least 1s
        body2 = urllib.request.urlopen(url, timeout=10).read().decode()
        assert 'southpaw_metric{name="records.consumed.user"} 15' in body2
        import re

        age = re.search(
            r'name="time\.since\.last\.backup"\} (\d+)', body2
        )
        assert age and int(age.group(1)) >= 1
        # non-/metrics paths 404
        import urllib.error

        try:
            urllib.request.urlopen(
                f"http://{exp.host}:{exp.port}/other", timeout=10
            )
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
