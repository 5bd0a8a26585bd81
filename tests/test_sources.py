import json

from pyspark.sql import functions as F, types as T

from southpaw_spark.sources.files import read_changelog_json
from southpaw_spark.sources.kafka import parse_cdc_json, to_kafka_sink_frame


def test_parse_cdc_json_roundtrip(spark):
    raw = spark.createDataFrame(
        [
            ("user", b'{"user_id": 10}', b'{"user_name": "alice"}', 0, 5),
            ("user", b'{"user_id": 10}', None, 0, 6),  # tombstone
            ("user", b'{"user_id": 20}', b'{"user_name": "bob"}', 1, 2),
        ],
        "topic string, key binary, value binary, partition int, offset long",
    )
    out = parse_cdc_json(
        raw,
        T.StructType([T.StructField("user_id", T.IntegerType())]),
        T.StructType([T.StructField("user_name", T.StringType())]),
        topic_to_entity={"user": "user"},
    )
    rows = sorted(out.collect(), key=lambda r: r["seq"])
    assert [r["user_id"] for r in rows] == [10, 10, 20]
    assert [r["is_tombstone"] for r in rows] == [False, True, False]
    # (partition, offset) ordering: partition 1 offset 2 sorts after
    # partition 0 entries — but seq need only order within a key
    assert rows[0]["seq"] < rows[1]["seq"]


def test_to_kafka_sink_frame_tombstones(spark):
    docs = spark.createDataFrame(
        [(1, '{"Record":{}}'), (2, None)], "id int, value string"
    )
    frame = to_kafka_sink_frame(docs, ["id"])
    rows = {bytes(r["key"]): r["value"] for r in frame.collect()}
    assert json.loads(rows[b'{"id":1}'].decode()) == {"Record": {}}
    assert rows[b'{"id":2}'] is None


def test_read_changelog_json_infers_tombstones(spark, tmp_path):
    p = tmp_path / "user.jsonl"
    p.write_text(
        "\n".join(
            [
                json.dumps({"seq": 1, "user_id": 10, "user_name": "alice"}),
                json.dumps({"seq": 2, "user_id": 10, "user_name": None}),
            ]
        )
    )
    df = read_changelog_json(
        spark, str(p), "seq long, user_id int, user_name string", key_cols=["user_id"]
    )
    rows = sorted(df.collect(), key=lambda r: r["seq"])
    # key column non-null but all payload columns null → tombstone
    assert rows[0]["is_tombstone"] is False
    assert rows[1]["is_tombstone"] is True
