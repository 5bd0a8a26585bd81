"""Checkpoint restart semantics + declared child-ordering divergence."""

import json
import time

from pyspark.sql import functions as F

from southpaw_spark.functions import key_bytes
from southpaw_spark.operators.cdc import current_state
from southpaw_spark.operators.denormalize import denormalize
from southpaw_spark.relations import load_relations
from southpaw_spark.streaming import IncrementalDenormalizer, ParquetStateStore
from southpaw_spark.testing import (
    CHANGELOG_EVENTS,
    ENTITY_SCHEMAS,
    RELATION_TREES,
    changelog_frames,
    entity_keys,
)


def test_checkpoint_restart_resumes_not_replays(spark, tmp_path):
    """Kill the stream after batch 1; a NEW query over the same
    checkpoint must process only the new file — offsets came from the
    checkpoint, state from the store (reference O17 semantics)."""
    keys = entity_keys()
    logs = changelog_frames(spark)
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    ivm = IncrementalDenormalizer(
        spark=spark, relations=load_relations([RELATION_TREES[1]]), keys=keys, store=store
    )
    ivm.bootstrap(
        {
            "player": logs["player"].where("seq <= 18").drop("seq", "is_tombstone"),
            "user": logs["user"].where("seq < 0").drop("seq", "is_tombstone"),
        }
    )
    src = tmp_path / "in"
    src.mkdir()
    schema = ENTITY_SCHEMAS["user"][0] + ", entity string"
    cols = [c.split()[0] for c in ENTITY_SCHEMAS["user"][0].split(", ")]
    events = [dict(zip(cols, e), entity="user") for e in CHANGELOG_EVENTS["user"]]

    emitted_per_run: list[list] = []

    def make_query():
        emitted: list = []
        emitted_per_run.append(emitted)

        def sink(name, df):
            emitted.extend(df.collect())

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        return ivm.attach_stream(
            stream, entity_col="entity",
            checkpoint_dir=str(tmp_path / "ckpt"), sink=sink,
        )

    (src / "a.json").write_text("\n".join(json.dumps(e) for e in events[:4]))
    q1 = make_query()
    q1.processAllAvailable()
    q1.stop()
    first_run = list(emitted_per_run[0])
    assert first_run, "first run must emit rebuilt docs"

    # restart: same checkpoint, new file carrying one event that touches
    # player 800 (user 10 renamed at seq 100) plus unrelated-user events
    b_events = events[4:] + [
        dict(zip(cols, (100, 10, "alice3", "a3@x.com", "pro", False)), entity="user")
    ]
    (src / "b.json").write_text("\n".join(json.dumps(e) for e in b_events))
    q2 = make_query()
    deadline = time.monotonic() + 90
    while time.monotonic() < deadline and not emitted_per_run[1]:
        q2.processAllAvailable()
        time.sleep(0.5)
    q2.stop()
    second_run = emitted_per_run[1]
    assert second_run, "restarted query must process the new file"
    # only player 800 references user 10 → exactly one doc re-emitted,
    # with state that proves batch-1 events were NOT replayed on top of
    # fresh offsets (alice3 from b.json wins over alice2 from a.json)
    assert {r["id"] for r in second_run} == {800}
    doc = json.loads([r for r in second_run if r["id"] == 800][0]["value"])
    assert [u["Record"]["user_name"] for u in doc["Children"]["user"]] == ["alice3"]


def test_child_ordering_declared_numeric(spark):
    """Declared divergence (SURVEY §1.6): children are ordered by numeric
    PK. The reference orders by stripped-big-endian bytes, where 256
    (0x0100) sorts before 2 (0x02). We assert numeric order AND that the
    drawer encoding reproduces the reference's byte order if parity on
    adversarial keys is ever required."""
    parent = spark.createDataFrame([(1,)], "id int")
    child = spark.createDataFrame(
        [(2, 1, "two"), (256, 1, "two-fifty-six")], "cid int, parent_id int, v string"
    )
    rel = load_relations(
        [{"DenormalizedName": "D", "Entity": "parent",
          "Children": [{"Entity": "child", "JoinKey": "parent_id", "ParentKey": "id"}]}]
    )[0]
    docs = denormalize(
        {"parent": parent, "child": child}, rel, {"parent": ["id"], "child": ["cid"]}
    )
    arr = docs.select(F.col("doc.Children.child").alias("c")).collect()[0]["c"]
    assert [x["Record"]["cid"] for x in arr] == [2, 256]  # numeric order

    enc = child.select(
        F.col("cid"), F.hex(key_bytes(F.col("cid"), "int")).alias("h")
    ).collect()
    by_bytes = sorted(enc, key=lambda r: bytes.fromhex(r["h"]))
    assert [r["cid"] for r in by_bytes] == [256, 2]  # reference byte order


def test_child_ordering_bytes_mode_matches_reference(spark):
    """With child_order="bytes" the declared divergence disappears:
    children sort in the reference's stripped-big-endian byte order
    (Southpaw.java:343-352 TreeMap over ByteArray keys), so 256 (0x0100)
    sorts before 2 (0x02)."""
    parent = spark.createDataFrame([(1,)], "id int")
    child = spark.createDataFrame(
        [(2, 1, "two"), (256, 1, "two-fifty-six")], "cid int, parent_id int, v string"
    )
    rel = load_relations(
        [{"DenormalizedName": "D", "Entity": "parent",
          "Children": [{"Entity": "child", "JoinKey": "parent_id", "ParentKey": "id"}]}]
    )[0]
    docs = denormalize(
        {"parent": parent, "child": child},
        rel,
        {"parent": ["id"], "child": ["cid"]},
        child_order="bytes",
    )
    arr = docs.select(F.col("doc.Children.child").alias("c")).collect()[0]["c"]
    assert [x["Record"]["cid"] for x in arr] == [256, 2]  # reference byte order


def test_child_ordering_bytes_composite_key(spark):
    """Composite PKs in bytes mode use the length-prefixed encoding
    (record/BaseRecord.java:59-75): fields sorted by name, each
    component length-prefixed — pinned against a hand-computed order."""
    parent = spark.createDataFrame([(1,)], "id int")
    # keys (a=256,b=1) -> 02 0100 01 01 ; (a=2,b=300) -> 01 02 02 012c
    # byte order: (256,1) < (2,300) because 0x02,0x01…  vs 0x01,0x02… →
    # wait: prefix is length byte: (256,1): 02|0100|01|01 ; (2,300): 01|02|02|012c
    # compare first byte: 02 > 01 → (2,300) sorts first.
    child = spark.createDataFrame(
        [(256, 1, 1, "x"), (2, 300, 1, "y")],
        "a int, b int, parent_id int, v string",
    )
    rel = load_relations(
        [{"DenormalizedName": "D", "Entity": "child2_parent",
          "Children": [{"Entity": "child2", "JoinKey": "parent_id", "ParentKey": "id"}]}]
    )[0]
    docs = denormalize(
        {"child2_parent": parent, "child2": child},
        rel,
        {"child2_parent": ["id"], "child2": ["a", "b"]},
        child_order="bytes",
    )
    arr = docs.select(F.col("doc.Children.child2").alias("c")).collect()[0]["c"]
    got = [(x["Record"]["a"], x["Record"]["b"]) for x in arr]
    assert got == [(2, 300), (256, 1)]
