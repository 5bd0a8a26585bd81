"""Synthetic CDC corpus for the test suite.

An original corpus (not copied from the reference's test resources) that
exercises every semantic the reference's end-to-end golden tests cover
(SURVEY §5, FIXTURES.md §1): insert→update, FK repointing, dangling FK
then fixed, tombstone→re-add, filter-DELETE, filter-SKIP, composite
primary keys, NULL parent keys, shared entities across multiple trees.

Schemas follow FIXTURES.md §1.2; every changelog is (seq, *key, *payload,
is_tombstone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# entity → (schema DDL, key columns)
ENTITY_SCHEMAS: dict[str, tuple[str, list[str]]] = {
    "user": (
        "seq long, user_id int, user_name string, email string, "
        "usage_type string, is_tombstone boolean",
        ["user_id"],
    ),
    "playlist": (
        "seq long, id int, active int, user_id int, type string, "
        "title string, is_tombstone boolean",
        ["id"],
    ),
    "playlist_tag": (
        "seq long, playlist_id int, user_tag_id int, tag_type string, "
        "is_tombstone boolean",
        ["playlist_id", "user_tag_id"],
    ),
    "user_tag": (
        "seq long, id int, user_id int, tag_name string, is_tombstone boolean",
        ["id"],
    ),
    "playlist_custom_params": (
        "seq long, id int, playlist_id int, name string, value string, "
        "is_tombstone boolean",
        ["id"],
    ),
    "playlist_media": (
        "seq long, id int, playlist_id int, pos int, media_id int, "
        "is_tombstone boolean",
        ["id"],
    ),
    "media": (
        "seq long, id int, status string, user_id int, title string, "
        "is_tombstone boolean",
        ["id"],
    ),
    "player": (
        "seq long, id int, user_id int, name string, is_tombstone boolean",
        ["id"],
    ),
}

# Changelog events. seq is global across all entities (interleaving is what
# the reference's drip-feed E2E test exercises; final state must not depend
# on it). Tuples follow the schemas above.
CHANGELOG_EVENTS: dict[str, list[tuple]] = {
    "user": [
        (1, 10, "alice", "a@x.com", "free", False),
        (2, 20, "bob", "b@x.com", "pro", False),
        (30, 10, "alice2", "a2@x.com", "pro", False),  # update
        (31, 30, "carol", "c@x.com", "free", False),
        (32, 30, "skip", "evil@x.com", "free", False),  # filter SKIP: must not win
        (60, 40, "dave", "d@x.com", "free", False),
        (61, 40, None, None, None, True),  # tombstone
        (62, 40, "dave2", "d2@x.com", "pro", False),  # re-add after tombstone
    ],
    "playlist": [
        (3, 100, 1, 10, "manual", "first", False),
        (4, 101, 1, 20, "dynamic", "second", False),
        (33, 102, 0, None, "manual", "null-user", False),  # NULL FK (Q09)
        (34, 103, 1, 30, "manual", "doomed", False),
        (63, 103, None, None, None, None, True),  # root tombstone (Q11)
        (64, 100, 1, 30, "manual", "first-v2", False),  # root FK repoint 10→30
    ],
    "playlist_tag": [
        (5, 100, 500, "auto", False),
        (6, 100, 501, "manual", False),
        (7, 101, 500, "auto", False),
        (35, 100, 501, None, True),  # composite-key tombstone
    ],
    "user_tag": [
        (8, 500, 10, "rock", False),
        (9, 501, 20, "jazz", False),
    ],
    "playlist_custom_params": [
        (10, 900, 100, "color", "blue", False),
        (11, 901, 100, "size", "INVALID", False),  # filter DELETE
        (36, 902, 101, "color", "red", False),
        (65, 902, 103, "color", "red", False),  # FK repoint 101→103 (dead root)
    ],
    "playlist_media": [
        (12, 700, 100, 0, 300, False),
        (13, 701, 100, 1, 100000, False),  # dangling media FK …
        (37, 701, 100, 1, 301, False),  # … then fixed (Q06 repointing)
        (14, 702, 101, 0, 300, False),
        (66, 702, 102, 0, 300, False),  # FK repoint 101→102: both docs change
    ],
    "media": [
        (15, 300, "active", 10, "vid-a", False),
        (16, 301, "active", 20, "vid-b", False),
        (38, 302, "deleted", 20, "vid-del", False),  # filter DELETE
        (39, 303, "active", None, "vid-nouser", False),  # NULL FK at media root
    ],
    "player": [
        (17, 800, 10, "player-a", False),
        (18, 801, 99, "player-dangling", False),  # dangling user FK
        (40, 802, None, "player-nullfk", False),  # NULL FK
    ],
}

# The three relation trees of the reference E2E test (FIXTURES.md §1.3).
RELATION_TREES: list[dict] = [
    {
        "DenormalizedName": "DenormalizedPlaylist",
        "Entity": "playlist",
        "Children": [
            {"Entity": "user", "JoinKey": "user_id", "ParentKey": "user_id"},
            {
                "Entity": "playlist_tag",
                "JoinKey": "playlist_id",
                "ParentKey": "id",
                "Children": [
                    {"Entity": "user_tag", "JoinKey": "id", "ParentKey": "user_tag_id"}
                ],
            },
            {
                "Entity": "playlist_custom_params",
                "JoinKey": "playlist_id",
                "ParentKey": "id",
            },
            {
                "Entity": "playlist_media",
                "JoinKey": "playlist_id",
                "ParentKey": "id",
                "Children": [
                    {"Entity": "media", "JoinKey": "id", "ParentKey": "media_id"}
                ],
            },
        ],
    },
    {
        "DenormalizedName": "DenormalizedPlayer",
        "Entity": "player",
        "Children": [
            {"Entity": "user", "JoinKey": "user_id", "ParentKey": "user_id"}
        ],
    },
    {
        "DenormalizedName": "DenormalizedMedia",
        "Entity": "media",
        "Children": [
            {"Entity": "user", "JoinKey": "user_id", "ParentKey": "user_id"},
            {
                "Entity": "playlist_media",
                "JoinKey": "media_id",
                "ParentKey": "id",
                "Children": [
                    {
                        "Entity": "playlist",
                        "JoinKey": "id",
                        "ParentKey": "playlist_id",
                    }
                ],
            },
        ],
    },
]

# Filter rules mirroring the reference's TestFilter semantics
# (FIXTURES.md §1.2 notes): entity → list of (predicate-sql, mode).
FILTER_RULES_SQL: dict[str, list[tuple[str, str]]] = {
    "user": [("user_name = 'skip'", "skip")],
    "media": [("status = 'deleted'", "delete")],
    "playlist_custom_params": [("value = 'INVALID'", "delete")],
}


def changelog_frames(spark: SparkSession) -> dict[str, DataFrame]:
    """The corpus as Spark DataFrames."""
    return {
        entity: spark.createDataFrame(
            CHANGELOG_EVENTS[entity], ENTITY_SCHEMAS[entity][0]
        )
        for entity in CHANGELOG_EVENTS
    }


def entity_keys() -> dict[str, list[str]]:
    return {e: ks for e, (_, ks) in ENTITY_SCHEMAS.items()}


def changelog_rows() -> dict[str, list[dict]]:
    """The corpus as plain dicts (for the pure-Python oracle)."""
    out: dict[str, list[dict]] = {}
    for entity, rows in CHANGELOG_EVENTS.items():
        cols = [c.split()[0] for c in ENTITY_SCHEMAS[entity][0].split(", ")]
        out[entity] = [dict(zip(cols, r)) for r in rows]
    return out
