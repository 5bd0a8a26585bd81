"""End-to-end golden test: the Spark engine vs the independent pure-Python
oracle over the full 3-tree CDC corpus — the analog of the reference's
SouthpawEndToEndTest (SURVEY §5)."""

import json

import pytest
from pyspark.sql import functions as F

import oracle as pyoracle
from southpaw_spark.operators.cdc import FilterMode, FilterRule, current_state, tombstoned_keys
from southpaw_spark.operators.denormalize import (
    affected_root_keys,
    denormalize,
    denormalize_to_json,
)
from southpaw_spark.relations import load_relations
from southpaw_spark.testing import (
    FILTER_RULES_SQL,
    RELATION_TREES,
    changelog_frames,
    changelog_rows,
    entity_keys,
)

PY_FILTER_RULES = {
    "user": [(lambda ev: ev.get("user_name") == "skip", "skip")],
    "media": [(lambda ev: ev.get("status") == "deleted", "delete")],
    "playlist_custom_params": [(lambda ev: ev.get("value") == "INVALID", "delete")],
}


def spark_filter_rules():
    return {
        entity: [
            FilterRule(F.expr(sql), FilterMode(mode)) for sql, mode in rules
        ]
        for entity, rules in FILTER_RULES_SQL.items()
    }


def build_spark_docs(spark, tree_name):
    logs = changelog_frames(spark)
    keys = entity_keys()
    rules = spark_filter_rules()
    trees = {t["DenormalizedName"]: t for t in RELATION_TREES}
    rel = load_relations([trees[tree_name]])[0]
    states = {
        e: current_state(logs[e], keys[e], rules=rules.get(e, ()))
        for e in rel.entities()
    }
    root = rel.entity
    dead = tombstoned_keys(logs[root], keys[root], rules=rules.get(root, ()))
    out = denormalize_to_json(states, rel, keys, tombstoned_roots=dead)
    pk_cols = keys[root]
    result = {}
    for r in out.collect():
        k = tuple(r[c] for c in pk_cols)
        result[k] = None if r["value"] is None else json.loads(r["value"])
    return result


def build_oracle_docs(tree_name):
    trees = {t["DenormalizedName"]: t for t in RELATION_TREES}
    return pyoracle.denormalize(
        changelog_rows(), entity_keys(), trees[tree_name], PY_FILTER_RULES
    )


@pytest.mark.parametrize(
    "tree", ["DenormalizedPlayer", "DenormalizedPlaylist", "DenormalizedMedia"]
)
def test_tree_matches_python_oracle(spark, tree):
    got = build_spark_docs(spark, tree)
    want = build_oracle_docs(tree)
    assert set(got) == set(want), f"root PK sets differ for {tree}"
    for k in sorted(want):
        assert got[k] == want[k], (
            f"{tree} doc mismatch for root {k}:\n"
            f"spark : {json.dumps(got[k], sort_keys=True)}\n"
            f"oracle: {json.dumps(want[k], sort_keys=True)}"
        )


def test_playlist_semantics_spotchecks(spark):
    docs = build_spark_docs(spark, "DenormalizedPlaylist")
    # Q11: tombstoned root emits null doc
    assert docs[(103,)] is None
    # Q09: NULL user_id → "user" key absent from Children
    assert "user" not in docs[(102,)]["Children"]
    # FK repoint (seq 64): playlist 100 now belongs to user 30 (carol —
    # and the SKIP event must not have replaced her)
    users = docs[(100,)]["Children"]["user"]
    assert [u["Record"]["user_name"] for u in users] == ["carol"]
    # filter DELETE: param 901 INVALID removed, 900 kept
    params = docs[(100,)]["Children"]["playlist_custom_params"]
    assert [p["Record"]["id"] for p in params] == [900]
    # Q06 repointing: playlist_media 701 fixed to media 301
    pm = docs[(100,)]["Children"]["playlist_media"]
    assert [m["Record"]["media_id"] for m in pm] == [300, 301]
    # child ordering by composite PK
    tags = docs[(100,)]["Children"]["playlist_tag"]
    assert [t["Record"]["user_tag_id"] for t in tags] == [500]


def test_media_tree_shares_entities(spark):
    docs = build_spark_docs(spark, "DenormalizedMedia")
    # media 302 was filter-DELETEd → tombstone doc in the media tree
    assert docs[(302,)] is None
    # media 300: playlist_media 702 repointed 101→102, so children show
    # playlists 100 (via pm 700) and 102 (via pm 702)
    pm = docs[(300,)]["Children"]["playlist_media"]
    nested_playlists = [
        p["Record"]["id"] for m in pm for p in m["Children"]["playlist"]
    ]
    assert nested_playlists == [100, 102]


def test_affected_roots_multihop(spark):
    logs = changelog_frames(spark)
    keys = entity_keys()
    rules = spark_filter_rules()
    rel = load_relations([RELATION_TREES[0]])[0]  # DenormalizedPlaylist
    states = {
        e: current_state(logs[e], keys[e], rules=rules.get(e, ()))
        for e in rel.entities()
    }
    # media 301 changes → via playlist_media(701: playlist 100) → root 100
    dirty = spark.createDataFrame([(301,)], "id int")
    roots = affected_root_keys(states, rel, "media", dirty, keys)
    assert {r.id for r in roots.collect()} == {100}
    # user_tag 500 changes → playlist_tag rows (100,500),(101,500) → roots 100,101
    dirty = spark.createDataFrame([(500,)], "id int")
    roots = affected_root_keys(states, rel, "user_tag", dirty, keys)
    assert {r.id for r in roots.collect()} == {100, 101}
    # root entity delta passes through
    dirty = spark.createDataFrame([(101,)], "id int")
    roots = affected_root_keys(states, rel, "playlist", dirty, keys)
    assert {r.id for r in roots.collect()} == {101}


def test_metamorphic_prefix_consistency(spark):
    """Incremental-equals-batch (SURVEY §5): recomputing from any prefix of
    the changelog equals the oracle on that prefix."""
    rows = changelog_rows()
    all_seqs = sorted(s["seq"] for evs in rows.values() for s in evs)
    cut = all_seqs[len(all_seqs) // 2]
    logs = changelog_frames(spark)
    keys = entity_keys()
    rel = load_relations([RELATION_TREES[1]])[0]  # DenormalizedPlayer
    states = {
        e: current_state(logs[e].where(F.col("seq") <= cut), keys[e])
        for e in rel.entities()
    }
    got = {
        (r["id"],): None if r["value"] is None else json.loads(r["value"])
        for r in denormalize_to_json(
            states,
            rel,
            keys,
            tombstoned_roots=tombstoned_keys(
                logs["player"].where(F.col("seq") <= cut), ["id"]
            ),
        ).collect()
    }
    prefix_rows = {
        e: [ev for ev in evs if ev["seq"] <= cut] for e, evs in rows.items()
    }
    trees = {t["DenormalizedName"]: t for t in RELATION_TREES}
    want = pyoracle.denormalize(
        prefix_rows, keys, trees["DenormalizedPlayer"], {}
    )
    assert got == want


def test_broadcast_hint_absolute_ceiling(spark):
    """r16 hardening (VERDICT r15 item 8): the grouped-children
    broadcast decision is capped by an ABSOLUTE ceiling on the scaled
    estimate, independent of the session threshold — a generously
    raised autoBroadcastJoinThreshold must never let a fact-sized
    child's grouped relation broadcast (Spark hard-fails broadcasts at
    8 GB / 512M rows)."""
    from types import SimpleNamespace

    from southpaw_spark.operators.denormalize import (
        _BROADCAST_DOC_CEILING,
        _BROADCAST_DOC_EXPANSION,
        _hinted,
        _subtree_scan_bytes,
    )

    node = SimpleNamespace(entity="child", children=[])
    grouped = spark.range(10)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # threshold far above the ceiling: only the ceiling can gate now
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(8 << 30))
    try:
        # small child: scaled estimate under the ceiling → broadcast
        # (returned unhinted so Catalyst picks BHJ)
        small = {"child": spark.range(1000)}
        assert (
            _subtree_scan_bytes(node, small) * _BROADCAST_DOC_EXPANSION
            < _BROADCAST_DOC_CEILING
        )
        assert _hinted(grouped, "merge", node, small) is grouped

        # huge child: scaled estimate over the ceiling → forced merge
        # even though it fits the (raised) session threshold
        big = {"child": spark.range(5_000_000)}
        scaled = _subtree_scan_bytes(node, big) * _BROADCAST_DOC_EXPANSION
        assert scaled > _BROADCAST_DOC_CEILING
        assert scaled <= 8 << 30  # under the session threshold on purpose
        hinted = _hinted(grouped, "merge", node, big)
        assert hinted is not grouped
        assert "merge" in hinted._jdf.queryExecution().logical().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
