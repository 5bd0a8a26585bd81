"""Incremental-equals-batch: the corpus changelog is split into
micro-batches and driven through the IVM orchestrator; the accumulated
output (latest value per root) must equal the pure-Python oracle's
full-recompute result — the generalization of the reference's drip-feed
end-to-end test (SURVEY §5)."""

import json

import pytest
from pyspark.sql import functions as F

import oracle as pyoracle
from southpaw_spark.relations import load_relations
from southpaw_spark.streaming import IncrementalDenormalizer, ParquetStateStore
from southpaw_spark.testing import (
    RELATION_TREES,
    changelog_frames,
    changelog_rows,
    entity_keys,
)
from test_denormalize import PY_FILTER_RULES, spark_filter_rules


@pytest.fixture
def denormalizer(spark, tmp_path):
    rels = load_relations(RELATION_TREES)
    keys = entity_keys()
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    d = IncrementalDenormalizer(
        spark=spark,
        relations=rels,
        keys=keys,
        store=store,
        filter_rules=spark_filter_rules(),
    )
    logs = changelog_frames(spark)
    d.bootstrap(
        {e: df.where("seq < 0").drop("seq", "is_tombstone") for e, df in logs.items()}
    )
    return d


def drive(spark, denormalizer, cuts):
    """Feed the corpus in seq-range batches; return accumulated outputs
    {tree: {pk_tuple: doc|None}} plus per-batch emission counts."""
    logs = changelog_frames(spark)
    keys = entity_keys()
    acc: dict[str, dict] = {}
    emitted: list[int] = []
    lo = -1
    for hi in cuts:
        deltas = {}
        for e, df in logs.items():
            d = df.where((F.col("seq") > lo) & (F.col("seq") <= hi))
            if d.count() > 0:
                deltas[e] = d
        outs = denormalizer.process_batch(deltas)
        n = 0
        for tree, out in outs.items():
            pk_cols = keys[load_relations(RELATION_TREES)[0].entity]  # per-tree below
            rows = out.collect()
            n += len(rows)
            tree_def = next(t for t in RELATION_TREES if t["DenormalizedName"] == tree)
            pk_cols = keys[tree_def["Entity"]]
            for r in rows:
                k = tuple(r[c] for c in pk_cols)
                acc.setdefault(tree, {})[k] = (
                    None if r["value"] is None else json.loads(r["value"])
                )
        emitted.append(n)
        lo = hi
    return acc, emitted


def oracle_docs(tree_name):
    trees = {t["DenormalizedName"]: t for t in RELATION_TREES}
    return pyoracle.denormalize(
        changelog_rows(), entity_keys(), trees[tree_name], PY_FILTER_RULES
    )


def test_incremental_equals_batch_three_batches(spark, denormalizer):
    acc, emitted = drive(spark, denormalizer, cuts=[20, 45, 70])
    for tree in ("DenormalizedPlaylist", "DenormalizedPlayer", "DenormalizedMedia"):
        want = oracle_docs(tree)
        got = acc.get(tree, {})
        # every oracle root must have been emitted at some point with the
        # right final value
        for k, doc in want.items():
            assert k in got, f"{tree} root {k} never emitted"
            assert got[k] == doc, (
                f"{tree} root {k} final value mismatch:\n"
                f"incremental: {json.dumps(got[k], sort_keys=True)}\n"
                f"oracle     : {json.dumps(doc, sort_keys=True)}"
            )
        # and nothing extra is live that the oracle doesn't know about
        for k, doc in got.items():
            if k not in want:
                assert doc is None, f"{tree} unexpected live root {k}"


def test_rebuilds_are_targeted(spark, denormalizer):
    # batch 1: everything (cold load). batch 2: a single user update must
    # NOT rebuild the world — only docs containing user 10.
    logs = changelog_frames(spark)
    denormalizer.process_batch(
        {e: df.where("seq <= 29") for e, df in logs.items()}
    )
    outs = denormalizer.process_batch(
        {"user": logs["user"].where("seq = 30")}  # alice → alice2
    )
    playlist_roots = {
        tuple(r[c] for c in ["id"]) for r in outs["DenormalizedPlaylist"].collect()
    }
    player_roots = {
        tuple(r[c] for c in ["id"]) for r in outs["DenormalizedPlayer"].collect()
    }
    # user 10 at seq<=29 is referenced by playlist 100 and player 800 only
    assert playlist_roots == {(100,)}
    assert player_roots == {(800,)}


def test_fk_repoint_dirties_old_and_new_parent(spark, denormalizer):
    logs = changelog_frames(spark)
    denormalizer.process_batch(
        {e: df.where("seq <= 65") for e, df in logs.items()}
    )
    # seq 66: playlist_media 702 repoints playlist 101 → 102
    outs = denormalizer.process_batch(
        {"playlist_media": logs["playlist_media"].where("seq = 66")}
    )
    dirty_playlists = {
        r["id"]: r["value"] for r in outs["DenormalizedPlaylist"].collect()
    }
    assert set(dirty_playlists) == {101, 102}, "both old and new parent rebuild"
    doc101 = json.loads(dirty_playlists[101])
    doc102 = json.loads(dirty_playlists[102])
    pm101 = [m["Record"]["id"] for m in doc101["Children"]["playlist_media"]]
    pm102 = [m["Record"]["id"] for m in doc102["Children"]["playlist_media"]]
    assert 702 not in pm101 and 702 in pm102


def test_root_tombstone_emits_null(spark, denormalizer):
    logs = changelog_frames(spark)
    denormalizer.process_batch(
        {e: df.where("seq <= 62") for e, df in logs.items()}
    )
    outs = denormalizer.process_batch(
        {"playlist": logs["playlist"].where("seq = 63")}  # playlist 103 dies
    )
    rows = {r["id"]: r["value"] for r in outs["DenormalizedPlaylist"].collect()}
    assert rows == {103: None}
