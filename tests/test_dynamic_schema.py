"""Dynamic per-record schema mode (reference ``record/MapRecord.java:41-50``,
``record/BaseRecord.java:37-41``; SURVEY §1.2 "dynamic, per-record" schema
system): heterogeneous rows of ONE entity in ONE changelog must build
correct documents — each doc carries exactly the fields its row had.

Spark-first: rows become VARIANT (``parse_dynamic``); typed PK/FK columns
are extracted for upsert/join/ordering; ``to_json`` re-emits per-record
fields verbatim with deterministic sorted keys."""

import json

from pyspark.sql import functions as F

from southpaw_spark.operators.cdc import current_state, tombstoned_keys
from southpaw_spark.operators.denormalize import (
    denormalize,
    denormalize_to_json,
    parse_dynamic,
)
from southpaw_spark.relations import load_relations

TREE = [{
    "DenormalizedName": "DynMedia", "Entity": "media",
    "Children": [
        {"Entity": "track", "JoinKey": "media_id", "ParentKey": "id"},
    ],
}]

KEYS = {"media": ["id"], "track": ["tid"]}


def _media_changelog(spark):
    rows = [
        (1, '{"id":1,"title":"old","duration":120}', False),
        # same key, NEW shape — upsert must fully replace (no duration)
        (2, '{"id":1,"title":"movie","tags":["a","b"]}', False),
        # a second shape of the same entity in the same changelog
        (3, '{"id":2,"size":3.5,"nested":{"x":1}}', False),
        (4, '{"id":3,"title":"gone"}', False),
        (5, '{"id":3}', True),  # tombstone
    ]
    return spark.createDataFrame(
        rows, "seq long, value string, is_tombstone boolean"
    )


def _track_changelog(spark):
    rows = [
        # two shapes of "track" under the same parent; order by tid
        (1, '{"tid":11,"media_id":1,"lang":"en","bitrate":320}', False),
        (2, '{"tid":10,"media_id":1,"kind":"audio"}', False),
    ]
    return spark.createDataFrame(
        rows, "seq long, value string, is_tombstone boolean"
    )


def _states(spark):
    media = parse_dynamic(_media_changelog(spark), {"id": "bigint"})
    track = parse_dynamic(
        _track_changelog(spark), {"tid": "bigint", "media_id": "bigint"}
    )
    return {
        "media": current_state(media, ["id"]),
        "track": current_state(track, ["tid"]),
    }, media


def test_heterogeneous_rows_build_correct_docs(spark):
    states, media_log = _states(spark)
    rel = load_relations(TREE)[0]
    dead = tombstoned_keys(media_log, ["id"])
    out = denormalize_to_json(
        states, rel, KEYS, tombstoned_roots=dead,
        record_cols={"media": "__v", "track": "__v"},
    )
    docs = {r["id"]: r["value"] for r in out.collect()}
    assert set(docs) == {1, 2, 3}

    d1 = json.loads(docs[1])
    # upsert replaced the row wholesale: new shape only, no 'duration'
    assert d1["Record"] == {"id": 1, "title": "movie", "tags": ["a", "b"]}
    # children ordered by tid, each with exactly its own fields
    kids = d1["Children"]["track"]
    assert [k["Record"] for k in kids] == [
        {"tid": 10, "media_id": 1, "kind": "audio"},
        {"tid": 11, "media_id": 1, "lang": "en", "bitrate": 320},
    ]

    d2 = json.loads(docs[2])
    assert d2["Record"] == {"id": 2, "size": 3.5, "nested": {"x": 1}}
    assert d2["Children"]["track"] == []  # key present, no matches

    assert docs[3] is None  # tombstoned root → null doc

    # canonical serialized form: variant object keys sorted, stable
    assert docs[2].startswith(
        '{"Record":{"id":2,"nested":{"x":1},"size":3.5}'
    )


def test_static_parent_dynamic_child_mix(spark):
    """Static (typed-column) root with a dynamic child in one tree."""
    orders = spark.createDataFrame(
        [(1, "alice"), (2, None)], "oid long, who string"
    )
    items = parse_dynamic(
        spark.createDataFrame(
            [
                (1, '{"iid":2,"oid":1,"qty":5}', False),
                (2, '{"iid":1,"oid":1,"note":"gift","rush":true}', False),
            ],
            "seq long, value string, is_tombstone boolean",
        ),
        {"iid": "bigint", "oid": "bigint"},
    )
    tree = [{
        "DenormalizedName": "DynOrder", "Entity": "orders",
        "Children": [{"Entity": "items", "JoinKey": "oid", "ParentKey": "oid"}],
    }]
    rel = load_relations(tree)[0]
    states = {"orders": orders, "items": current_state(items, ["iid"])}
    docs = denormalize(
        states, rel, {"orders": ["oid"], "items": ["iid"]},
        record_cols={"items": "__v"},
    )
    rows = {r["oid"]: r for r in docs.collect()}
    doc1 = json.loads(
        docs.where(F.col("oid") == 1)
        .select(F.to_json("doc").alias("j"))
        .collect()[0]["j"]
    )
    assert doc1["Record"] == {"oid": 1, "who": "alice"}
    assert [k["Record"] for k in doc1["Children"]["items"]] == [
        {"iid": 1, "oid": 1, "note": "gift", "rush": True},
        {"iid": 2, "oid": 1, "qty": 5},
    ]
    assert 2 in rows


def test_randomized_heterogeneous_upsert_matches_python_oracle(spark):
    """Randomized shapes: a changelog whose rows draw random field
    subsets must upsert and serialize to exactly what a pure-Python
    latest-wins + per-record-fields oracle produces."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        fields = ["a", "b", "c", "d"]
        rows, py_state = [], {}
        for seq in range(60):
            key = rng.randrange(8)
            tomb = rng.random() < 0.15
            body = {"id": key}
            if not tomb:
                for f in fields:
                    if rng.random() < 0.5:
                        body[f] = (
                            rng.randrange(100)
                            if rng.random() < 0.5
                            else f"s{rng.randrange(10)}"
                        )
            rows.append((seq, json.dumps(body), tomb))
            # python oracle: latest event wins wholesale
            if tomb:
                py_state.pop(key, None)
            else:
                py_state[key] = body
        log = parse_dynamic(
            spark.createDataFrame(
                rows, "seq long, value string, is_tombstone boolean"
            ),
            {"id": "bigint"},
        )
        state = current_state(log, ["id"])
        out = state.select(
            "id", F.to_json(F.col("__v")).alias("doc")
        ).collect()
        got = {r["id"]: json.loads(r["doc"]) for r in out}
        assert got == py_state, f"seed {seed}"


def test_dynamic_entity_composes_with_ivm_state(spark, tmp_path):
    """Dynamic (VARIANT) entities ride the full IVM loop: variant state
    survives the parquet store + schema sidecar + merge, and the
    incremental rebuild emits per-record-schema docs (record_cols on the
    orchestrator) — MapRecord-style entities work in streaming, not
    just batch."""
    from southpaw_spark.streaming.ivm import IncrementalDenormalizer
    from southpaw_spark.streaming.state import ParquetStateStore

    rel = load_relations(TREE)  # media ← track
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    ivm = IncrementalDenormalizer(
        spark=spark, relations=rel, keys=KEYS, store=store,
        record_cols={"media": "__v", "track": "__v"},
    )
    media0 = parse_dynamic(
        spark.createDataFrame(
            [(1, '{"id":1,"title":"old"}', False)],
            "seq long, value string, is_tombstone boolean",
        ),
        {"id": "bigint"},
    )
    track0 = parse_dynamic(
        spark.createDataFrame([], "seq long, value string, is_tombstone boolean"),
        {"tid": "bigint", "media_id": "bigint"},
    )
    ivm.bootstrap({
        "media": current_state(media0, ["id"]),
        "track": current_state(track0, ["tid"]),
    })
    results = {}

    def sink(name, df):
        for r in df.collect():
            results[r["id"]] = r["value"]

    # heterogeneous media delta + first track rows (two shapes)
    media_delta = parse_dynamic(
        spark.createDataFrame(
            [(10, '{"id":1,"title":"new","tags":["x"]}', False),
             (11, '{"id":2,"size":9}', False)],
            "seq long, value string, is_tombstone boolean",
        ),
        {"id": "bigint"},
    )
    track_delta = parse_dynamic(
        spark.createDataFrame(
            [(12, '{"tid":7,"media_id":1,"kind":"a"}', False),
             (13, '{"tid":6,"media_id":1,"lang":"en"}', False)],
            "seq long, value string, is_tombstone boolean",
        ),
        {"tid": "bigint", "media_id": "bigint"},
    )
    ivm.process_batch(
        {"media": media_delta, "track": track_delta}, sink=sink
    )
    d1 = json.loads(results[1])
    assert d1["Record"] == {"id": 1, "title": "new", "tags": ["x"]}
    assert [t["Record"] for t in d1["Children"]["track"]] == [
        {"tid": 6, "media_id": 1, "lang": "en"},
        {"tid": 7, "media_id": 1, "kind": "a"},
    ]
    d2 = json.loads(results[2])
    assert d2["Record"] == {"id": 2, "size": 9}
    assert d2["Children"]["track"] == []


def test_null_value_tombstone_keys_from_key_frame(spark):
    """Kafka-shaped dynamic changelog: a tombstone is a NULL value with
    the PK only in the key frame — key_col extraction must route the
    delete to the right row (value-derived keys would be null)."""
    rows = [
        ('{"id":1}', '{"id":1,"name":"a"}', 1, False),
        ('{"id":2}', '{"id":2,"name":"b"}', 2, False),
        ('{"id":1}', None, 3, True),  # tombstone: null value
    ]
    log = parse_dynamic(
        spark.createDataFrame(
            rows, "key string, value string, seq long, is_tombstone boolean"
        ),
        {"id": "bigint"},
        key_col="key",
    )
    state = current_state(log, ["id"])
    got = {r["id"]: json.loads(r["j"])
           for r in state.select(
               "id", F.to_json(F.col("__v")).alias("j")).collect()}
    assert got == {2: {"id": 2, "name": "b"}}
