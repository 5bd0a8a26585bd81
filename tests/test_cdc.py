from pyspark.sql import functions as F

from southpaw_spark.operators.cdc import (
    FilterMode,
    FilterRule,
    apply_filter_rules,
    as_changelog,
    current_state,
    latest_by_key,
    tombstoned_keys,
)
from southpaw_spark.testing import changelog_frames, entity_keys


def test_latest_by_key_keeps_newest(spark):
    logs = changelog_frames(spark)
    latest = latest_by_key(logs["user"], ["user_id"])
    rows = {r.user_id: r for r in latest.collect()}
    assert rows[10].user_name == "alice2"
    assert rows[40].user_name == "dave2"  # re-add after tombstone wins


def test_current_state_drops_tombstones(spark):
    logs = changelog_frames(spark)
    state = current_state(logs["playlist"], ["id"])
    ids = {r.id for r in state.collect()}
    assert 103 not in ids  # latest event is a tombstone
    assert ids == {100, 101, 102}
    # bookkeeping columns removed
    assert set(state.columns) == {"id", "active", "user_id", "type", "title"}


def test_tombstoned_keys(spark):
    logs = changelog_frames(spark)
    dead = {r.id for r in tombstoned_keys(logs["playlist"], ["id"]).collect()}
    assert dead == {103}
    # 40 was tombstoned then re-added → not a final tombstone
    dead_users = {
        r.user_id for r in tombstoned_keys(logs["user"], ["user_id"]).collect()
    }
    assert dead_users == set()


def test_filter_skip_preserves_prior_state(spark):
    logs = changelog_frames(spark)
    rules = [FilterRule(F.expr("user_name = 'skip'"), FilterMode.SKIP)]
    state = current_state(logs["user"], ["user_id"], rules=rules)
    rows = {r.user_id: r for r in state.collect()}
    # seq 32 ("skip") must not overwrite seq 31 ("carol")
    assert rows[30].user_name == "carol"


def test_filter_delete_becomes_tombstone(spark):
    logs = changelog_frames(spark)
    rules = [FilterRule(F.expr("status = 'deleted'"), FilterMode.DELETE)]
    state = current_state(logs["media"], ["id"], rules=rules)
    ids = {r.id for r in state.collect()}
    assert 302 not in ids
    dead = {
        r.id for r in tombstoned_keys(logs["media"], ["id"], rules=rules).collect()
    }
    assert dead == {302}


def test_composite_key_upsert(spark):
    logs = changelog_frames(spark)
    state = current_state(logs["playlist_tag"], ["playlist_id", "user_tag_id"])
    keys = {(r.playlist_id, r.user_tag_id) for r in state.collect()}
    assert (100, 501) not in keys  # composite-key tombstone applied
    assert keys == {(100, 500), (101, 500)}


def test_apply_filter_rules_null_predicate_safe(spark):
    logs = changelog_frames(spark)
    # predicate over a column that is NULL on tombstones must not throw
    # away tombstones (coalesce to false)
    rules = [FilterRule(F.expr("user_name = 'nobody'"), FilterMode.SKIP)]
    out = apply_filter_rules(logs["user"], rules)
    assert out.where("is_tombstone").count() == 1


def test_as_changelog_lifts_snapshot(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    log = as_changelog(orders)
    assert "seq" in log.columns and "is_tombstone" in log.columns
    state = current_state(log, ["o_orderkey"])
    assert state.count() == orders.count()
