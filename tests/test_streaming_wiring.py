"""Real Structured Streaming wiring: a file-source stream drives
attach_stream → foreachBatch → IVM; plus verify-state and metrics."""

import json
import time

import pytest
from pyspark.sql import functions as F

from southpaw_spark.operators.cdc import current_state
from southpaw_spark.relations import load_relations
from southpaw_spark.streaming import IncrementalDenormalizer, ParquetStateStore
from southpaw_spark.testing import (
    CHANGELOG_EVENTS,
    ENTITY_SCHEMAS,
    RELATION_TREES,
    changelog_frames,
    entity_keys,
)
from southpaw_spark.verify import verify_store


def test_attach_stream_file_source(spark, tmp_path):
    """Stream the user changelog through a JSON file source; the player
    tree re-denormalizes incrementally via the foreachBatch hook."""
    rels = load_relations([RELATION_TREES[1]])  # DenormalizedPlayer
    keys = entity_keys()
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    ivm = IncrementalDenormalizer(
        spark=spark, relations=rels, keys=keys, store=store
    )
    logs = changelog_frames(spark)
    # bootstrap: players loaded, users empty
    ivm.bootstrap(
        {
            "player": logs["player"].where("seq <= 18").drop("seq", "is_tombstone"),
            "user": logs["user"].where("seq < 0").drop("seq", "is_tombstone"),
        }
    )

    src_dir = tmp_path / "stream_in"
    src_dir.mkdir()
    schema = ENTITY_SCHEMAS["user"][0] + ", entity string"

    results: dict = {}

    def sink(name, df):
        for r in df.collect():
            results[(name, r["id"])] = r["value"]

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src_dir))
    )
    query = ivm.attach_stream(
        stream,
        entity_col="entity",
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink=sink,
    )
    try:
        # drip-feed user events as two files (micro-batches)
        cols = [c.split()[0] for c in ENTITY_SCHEMAS["user"][0].split(", ")]
        events = [dict(zip(cols, ev), entity="user") for ev in CHANGELOG_EVENTS["user"]]
        (src_dir / "a.json").write_text(
            "\n".join(json.dumps(e) for e in events[:4])
        )
        (src_dir / "b.json").write_text(
            "\n".join(json.dumps(e) for e in events[4:])
        )
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            query.processAllAvailable()
            if ("DenormalizedPlayer", 800) in results:
                break
            time.sleep(1)
    finally:
        query.stop()

    doc = json.loads(results[("DenormalizedPlayer", 800)])
    # player 800 → user 10, whose latest event is alice2
    assert [u["Record"]["user_name"] for u in doc["Children"]["user"]] == ["alice2"]


def test_verify_store_consistency(spark, tmp_path):
    logs = changelog_frames(spark)
    keys = entity_keys()
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    rels = load_relations([RELATION_TREES[1]])
    ivm = IncrementalDenormalizer(spark=spark, relations=rels, keys=keys, store=store)
    ivm.bootstrap(
        {e: logs[e].where("seq < 0").drop("seq", "is_tombstone") for e in ("player", "user")}
    )
    for lo, hi in [(0, 20), (20, 70)]:
        ivm.process_batch(
            {
                e: logs[e].where(f"seq > {lo} and seq <= {hi}")
                for e in ("player", "user")
            }
        )
    reports = verify_store(
        store, {e: logs[e] for e in ("player", "user")}, keys
    )
    for entity, report in reports.items():
        assert report.count() == 0, f"{entity}: {report.collect()}"
    # corrupt the state → verification must catch it
    bad = store.read("user").withColumn(
        "user_name", F.lit("corrupted")
    )
    store.init("user", bad, keys["user"])
    reports = verify_store(store, {"user": logs["user"]}, keys)
    assert reports["user"].count() > 0


def test_metrics_counters(spark, tmp_path):
    logs = changelog_frames(spark)
    keys = entity_keys()
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    rels = load_relations([RELATION_TREES[1]])
    ivm = IncrementalDenormalizer(
        spark=spark, relations=rels, keys=keys, store=store, collect_metrics=True
    )
    ivm.bootstrap(
        {e: logs[e].where("seq < 0").drop("seq", "is_tombstone") for e in ("player", "user")}
    )
    ivm.process_batch({"player": logs["player"]})
    assert ivm.metrics["records.consumed.player"] == len(CHANGELOG_EVENTS["player"])
    assert ivm.metrics["denormalized.records.created.DenormalizedPlayer"] == 3
    assert ivm.metrics["denormalized.records.tombstoned.DenormalizedPlayer"] == 0
