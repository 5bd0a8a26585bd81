"""O5 second half (old-row-aware filters) + state-store commit ordering.

Pins the reference behaviors:
* ``BaseFilter.isEqual(rec, oldRec, ignoredFields)`` — equality that
  ignores listed fields, false when exactly one side is null
  (``filter/BaseFilter.java:118-139``, ``filter/TestFilter.java:36-55``);
* output-before-flush commit ordering (``Southpaw.java:297-315``): a
  crash between output emission and state commit must replay against the
  PRE-merge state so FK pre-images are recomputed identically.
"""

import os

import pytest
from pyspark.sql import functions as F

from southpaw_spark.operators.cdc import (
    FilterMode,
    OldAwareFilterRule,
    apply_old_aware_rules,
    is_unchanged,
    unchanged_skip_rule,
)
from southpaw_spark.relations import load_relations
from southpaw_spark.streaming import IncrementalDenormalizer, ParquetStateStore

PAYLOAD = ["k", "a", "b"]


def _delta(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b long, seq long, is_tombstone boolean")


def _state(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b long")


# -- apply_old_aware_rules / is_unchanged --------------------------------


def test_unchanged_rows_are_skipped(spark):
    state = _state(spark, [(1, "x", 10), (2, "y", 20)])
    delta = _delta(
        spark,
        [
            (1, "x", 10, 5, False),  # identical → skip
            (2, "y", 99, 5, False),  # changed → keep
            (3, "z", 30, 5, False),  # new key → keep
        ],
    )
    out = apply_old_aware_rules(
        delta, state, [unchanged_skip_rule(["a", "b"])], ["k"]
    )
    assert sorted(r["k"] for r in out.collect()) == [2, 3]


def test_ignored_fields_are_not_compared(spark):
    state = _state(spark, [(1, "x", 10)])
    delta = _delta(spark, [(1, "x", 999, 5, False)])  # only b differs
    out = apply_old_aware_rules(
        delta,
        state,
        [unchanged_skip_rule(["a", "b"], ignored_fields=["b"])],
        ["k"],
    )
    assert out.count() == 0  # b ignored → equal → skipped


def test_tombstone_for_existing_key_is_never_unchanged(spark):
    state = _state(spark, [(1, "x", 10)])
    delta = _delta(spark, [(1, "x", 10, 5, True)])  # tombstone, same payload
    out = apply_old_aware_rules(
        delta, state, [unchanged_skip_rule(["a", "b"])], ["k"]
    )
    assert out.count() == 1  # deleting an existing row is a change


def test_no_prior_state_keeps_everything(spark):
    delta = _delta(spark, [(1, "x", 10, 5, False)])
    out = apply_old_aware_rules(
        delta, None, [unchanged_skip_rule(["a", "b"])], ["k"]
    )
    assert out.count() == 1


def test_null_safe_field_comparison(spark):
    state = spark.createDataFrame([(1, None, 10)], "k long, a string, b long")
    delta = _delta(spark, [(1, None, 10, 5, False)])
    out = apply_old_aware_rules(
        delta, state, [unchanged_skip_rule(["a", "b"])], ["k"]
    )
    assert out.count() == 0  # null == null per field (isEqual semantics)


def test_old_aware_delete_mode(spark):
    # a rule that DELETEs when the old row's a was 'x' (uses old.*)
    state = _state(spark, [(1, "x", 10), (2, "y", 20)])
    delta = _delta(spark, [(1, "q", 1, 5, False), (2, "q", 2, 5, False)])
    rule = OldAwareFilterRule(
        predicate=F.col("old.a") == "x", mode=FilterMode.DELETE
    )
    out = apply_old_aware_rules(delta, state, [rule], ["k"])
    got = {r["k"]: r["is_tombstone"] for r in out.collect()}
    assert got == {1: True, 2: False}


# -- IVM wiring -----------------------------------------------------------

TREE = """[{
  "DenormalizedName": "DenormalizedParent", "Entity": "parent",
  "Children": [{"Entity": "child", "JoinKey": "p_id", "ParentKey": "p_id"}]
}]"""

KEYS = {"parent": ["p_id"], "child": ["c_id"]}


def _denorm(spark, tmp_path, **kw):
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    d = IncrementalDenormalizer(
        spark=spark,
        relations=load_relations(TREE),
        keys=KEYS,
        store=store,
        **kw,
    )
    d.bootstrap(
        {
            "parent": spark.createDataFrame(
                [(1, "P1"), (2, "P2")], "p_id long, name string"
            ),
            "child": spark.createDataFrame(
                [(100, 1, "C1")], "c_id long, p_id long, val string"
            ),
        }
    )
    return d


def _child_delta(spark, rows):
    return spark.createDataFrame(
        rows, "c_id long, p_id long, val string, seq long, is_tombstone boolean"
    )


def test_noop_update_produces_no_output_and_no_state_change(spark, tmp_path):
    d = _denorm(
        spark,
        tmp_path,
        old_filter_rules={"child": [unchanged_skip_rule(["p_id", "val"])]},
    )
    before = sorted(d.store.read("child").collect())
    outs = d.process_batch(
        {"child": _child_delta(spark, [(100, 1, "C1", 5, False)])}
    )
    assert all(out.count() == 0 for out in outs.values())
    assert sorted(d.store.read("child").collect()) == before


def test_crash_before_commit_replays_with_pre_merge_preimages(spark, tmp_path):
    """The ADVICE-high scenario: child 100 repoints P1→P2; the sink dies
    before the state commit. On replay the pre-images must still be the
    PRE-merge row (p_id=1), so the OLD parent P1 is dirtied too."""
    d = _denorm(spark, tmp_path)
    delta = {"child": _child_delta(spark, [(100, 2, "C1v2", 5, False)])}

    class Boom(Exception):
        pass

    def bad_sink(name, df):
        df.count()  # consume like a real sink would …
        raise Boom()  # … then die before process_batch commits

    with pytest.raises(Boom):
        d.process_batch(delta, sink=bad_sink)
    # state must still be pre-merge (pointer never flipped)
    assert [r["p_id"] for r in d.store.read("child").collect()] == [1]

    # replay: both the old parent (1) and the new parent (2) are dirty
    got = {}
    outs = d.process_batch(delta)
    for out in outs.values():
        for r in out.collect():
            got[r["p_id"]] = r["value"]
    assert set(got) == {1, 2}
    assert '"C1v2"' in got[2] and "C1" not in (got[1] or "")
    # and the merge is now committed
    assert [r["p_id"] for r in d.store.read("child").collect()] == [2]


def test_vacuum_bounds_version_dirs(spark, tmp_path):
    d = _denorm(spark, tmp_path)
    for i in range(4):
        d.process_batch(
            {"child": _child_delta(spark, [(100, 1, f"v{i}", 10 + i, False)])}
        )
    child_dir = os.path.join(str(tmp_path / "state"), "child")
    listing = [n for n in os.listdir(child_dir) if n.startswith("v")]
    versions = [n for n in listing if "." not in n]
    mirrors = [n for n in listing if n.endswith(".bucketed")]
    assert len(versions) <= 2  # vacuum(keep=2)
    # bucketed read mirrors ride the same retention
    assert len(mirrors) <= 2 and all(
        m[: -len(".bucketed")] in versions for m in mirrors
    )
    assert d.store.read("child").collect()[0]["val"] == "v3"


def test_merge_hardlinks_untouched_buckets(spark, tmp_path):
    store = ParquetStateStore(spark, str(tmp_path / "s"), n_buckets=8)
    rows = spark.createDataFrame(
        [(i, f"r{i}") for i in range(64)], "k long, v string"
    )
    store.init("e", rows, ["k"])
    store.merge(
        "e",
        spark.createDataFrame([(1, "new")], "k long, v string"),
        None,
        ["k"],
    )
    v2 = os.path.join(str(tmp_path / "s"), "e", "v2")
    linked = 0
    for bucket in os.listdir(v2):
        bdir = os.path.join(v2, bucket)
        if not os.path.isdir(bdir):
            continue
        for fn in os.listdir(bdir):
            if fn.endswith(".parquet") and os.stat(
                os.path.join(bdir, fn)
            ).st_nlink >= 2:
                linked += 1
    assert linked > 0  # untouched buckets are hardlinked, not copied
    # content intact after linking
    assert store.read("e").count() == 64
    assert store.read("e").where("k = 1").collect()[0]["v"] == "new"


def test_bootstrap_schemas_initializes_empty_entities(spark, tmp_path):
    from pyspark.sql import types as T

    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    d = IncrementalDenormalizer(
        spark=spark, relations=load_relations(TREE), keys=KEYS, store=store
    )
    child_schema = T.StructType(
        [
            T.StructField("c_id", T.LongType()),
            T.StructField("p_id", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    d.bootstrap(
        {
            "parent": spark.createDataFrame(
                [(1, "P1")], "p_id long, name string"
            )
        },
        schemas={"child": child_schema},
    )
    # a parent-only delta must not crash on the (empty) child state
    outs = d.process_batch(
        {
            "parent": spark.createDataFrame(
                [(1, "P1x", 5, False)],
                "p_id long, name string, seq long, is_tombstone boolean",
            )
        }
    )
    (out,) = outs.values()
    rows = out.collect()
    assert len(rows) == 1 and '"P1x"' in rows[0]["value"]


# -- backup retention + rollback across corrupt backups -------------------


def _mini_store(spark, tmp_path):
    store = ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=2)
    store.init(
        "e",
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        ["k"],
    )
    return store


def test_backup_retention_prunes_oldest(spark, tmp_path):
    import time

    store = _mini_store(spark, tmp_path)
    bdir = str(tmp_path / "bk")
    for _ in range(3):
        store.backup(bdir, retention=2)
        time.sleep(0.01)
    assert len(os.listdir(bdir)) == 2


def test_restore_latest_rolls_back_across_corrupt_backup(spark, tmp_path):
    """Reference RocksDBState.java:639-708: a corrupted newest backup is
    discarded and the restore falls back to the prior one."""
    import shutil
    import time

    store = _mini_store(spark, tmp_path)
    bdir = str(tmp_path / "bk")
    good = store.backup(bdir)
    time.sleep(0.02)
    store.merge(
        "e",
        spark.createDataFrame([(3, "c")], "k long, v string"),
        None,
        ["k"],
    )
    newest = store.backup(bdir)
    # corrupt the newest backup: REPLACE every parquet file (a new inode,
    # like a corrupt object-store object — backups share unchanged files
    # by hardlink, the same dedup RocksDB's BackupEngine does, so an
    # in-place write would corrupt sibling snapshots too)
    for dirpath, _dn, fns in os.walk(newest):
        for fn in fns:
            if fn.endswith(".parquet"):
                p = os.path.join(dirpath, fn)
                os.remove(p)
                with open(p, "wb") as f:
                    f.write(b"corrupt")
    store.delete_state()
    restored = store.restore_latest(bdir)
    assert restored == good
    assert sorted(r["k"] for r in store.read("e").collect()) == [1, 2]
    # the corrupt newest backup was rolled back (deleted)
    assert not os.path.exists(newest)


def test_restore_latest_raises_when_all_corrupt(spark, tmp_path):
    store = _mini_store(spark, tmp_path)
    bdir = str(tmp_path / "bk")
    b = store.backup(bdir)
    os.remove(os.path.join(b, "e", "_SCHEMA"))
    with pytest.raises(FileNotFoundError):
        store.restore_latest(bdir)


def test_long_stream_no_cache_or_disk_leak(spark, tmp_path):
    """20+ micro-batches: per-batch caches must be unpersisted (no RDD
    accumulation in storage memory) and vacuum must bound the state-dir
    version count (no unbounded disk growth)."""
    d = _denorm(spark, tmp_path)
    jsc = spark.sparkContext._jsc.sc()
    for i in range(22):
        d.process_batch(
            {
                "child": _child_delta(
                    spark, [(100 + (i % 3), 1 + (i % 2), f"v{i}", 50 + i, False)]
                )
            }
        )
    # all per-batch caches released
    assert jsc.getRDDStorageInfo() == () or len(jsc.getRDDStorageInfo()) == 0
    # version dirs bounded by vacuum, not 22-deep
    for entity in ("parent", "child"):
        edir = os.path.join(str(tmp_path / "state"), entity)
        versions = [
            n for n in os.listdir(edir) if n.startswith("v") and "." not in n
        ]
        assert len(versions) <= 2, f"{entity}: {sorted(versions)}"


# -- O12 drain ordering + O21 time-boxed rebuild batching -----------------


def _many_children(spark, tmp_path):
    """parent 1..6 each with one child; children dirty all six parents."""
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    d = IncrementalDenormalizer(
        spark=spark,
        relations=load_relations(TREE),
        keys=KEYS,
        store=store,
        max_roots_per_batch=2,
        queueing_strategy=lambda tree, entity: (
            "low" if entity == "child" else "high"
        ),
    )
    d.bootstrap(
        {
            "parent": spark.createDataFrame(
                [(i, f"P{i}") for i in range(1, 7)], "p_id long, name string"
            ),
            "child": spark.createDataFrame(
                [(100 + i, i, f"C{i}") for i in range(1, 7)],
                "c_id long, p_id long, val string",
            ),
        }
    )
    return d


def test_root_cap_defers_to_pending_queue_and_drains(spark, tmp_path):
    d = _many_children(spark, tmp_path)
    delta = {
        "child": _child_delta(
            spark, [(100 + i, i, f"C{i}x", 5, False) for i in range(1, 7)]
        )
    }
    emitted = []
    outs = d.process_batch(delta)
    for out in outs.values():
        emitted.append(sorted(r["p_id"] for r in out.collect()))
    assert emitted == [[1, 2]]  # cap=2, deterministic PK order
    # drain: three more batches of nothing clear the queue 2-at-a-time
    seen = [1, 2]
    for _ in range(2):
        outs = d.process_batch({})
        for out in outs.values():
            seen += sorted(r["p_id"] for r in out.collect())
    assert seen == [1, 2, 3, 4, 5, 6]
    # queue empty → an empty batch produces no output rows
    outs = d.process_batch({})
    assert all(o.count() == 0 for o in outs.values()) or outs == {}


def test_priority_order_high_before_low(spark, tmp_path):
    d = _many_children(spark, tmp_path)
    # parent 5 dirtied directly (high); children dirty 1..3 (low)
    delta = {
        "parent": spark.createDataFrame(
            [(5, "P5x", 9, False)],
            "p_id long, name string, seq long, is_tombstone boolean",
        ),
        "child": _child_delta(
            spark, [(100 + i, i, f"C{i}y", 9, False) for i in range(1, 4)]
        ),
    }
    outs = d.process_batch(delta)
    got = []
    for out in outs.values():
        got = sorted(r["p_id"] for r in out.collect())
    # cap=2: the high-priority root 5 must be in the first drain
    assert 5 in got and len(got) == 2
    # deferred low roots emitted with the FRESH child payloads later
    import json as _json

    outs = d.process_batch({})
    for out in outs.values():
        for r in out.collect():
            if r["p_id"] in (1, 2, 3):
                doc = _json.loads(r["value"])
                vals = [c["Record"]["val"] for c in doc["Children"]["child"]]
                assert vals == [f"C{r['p_id']}y"]


def test_backup_sync_roundtrip_via_hadoop_fs(spark, tmp_path):
    """Object-store mirror of a backup snapshot through Hadoop's
    FileSystem API (s3a/hdfs/gs on a cluster; file:// here) and restore
    from the fetched copy."""
    store = _mini_store(spark, tmp_path)
    b = store.backup(str(tmp_path / "bk"))
    remote = f"file://{tmp_path}/remote"
    dest = store.sync_backup_to(b, remote)
    assert dest.startswith("file://")
    fetched = store.fetch_backup_from(dest, str(tmp_path / "fetched"))
    store.delete_state()
    assert store.restore(fetched) is True
    assert sorted(r["k"] for r in store.read("e").collect()) == [1, 2]


def test_pending_queue_survives_engine_restart(spark, tmp_path):
    """The capped-batch carry-over queue is persisted in the state store,
    so a NEW engine instance over the same state dir (crash/restart)
    drains the deferred roots — with the fresh payloads, not stale
    ones."""
    d = _many_children(spark, tmp_path)
    delta = {
        "child": _child_delta(
            spark, [(100 + i, i, f"C{i}x", 5, False) for i in range(1, 7)]
        )
    }
    outs = d.process_batch(delta)
    seen = sorted(r["p_id"] for out in outs.values() for r in out.collect())
    assert seen == [1, 2]

    # simulate restart: fresh store + engine over the same directory,
    # NO bootstrap (state and pending queue come from disk)
    store2 = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    d2 = IncrementalDenormalizer(
        spark=spark,
        relations=load_relations(TREE),
        keys=KEYS,
        store=store2,
        max_roots_per_batch=2,
        queueing_strategy=lambda tree, entity: (
            "low" if entity == "child" else "high"
        ),
    )
    import json as _json

    payloads = {}
    for _ in range(2):
        outs = d2.process_batch({})
        for out in outs.values():
            for r in out.collect():
                seen.append(r["p_id"])
                doc = _json.loads(r["value"])
                payloads[r["p_id"]] = [
                    c["Record"]["val"] for c in doc["Children"]["child"]
                ]
    assert sorted(seen) == [1, 2, 3, 4, 5, 6]
    # deferred roots rebuilt from MERGED state (C{i}x), not bootstrap C{i}
    assert all(payloads[p] == [f"C{p}x"] for p in (3, 4, 5, 6)), payloads


def test_periodic_backup_every_n_batches(spark, tmp_path):
    """Reference auto-backup analog: after every N committed batches the
    store snapshots into backup_dir, honoring retention."""
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=2)
    d = IncrementalDenormalizer(
        spark=spark,
        relations=load_relations(TREE),
        keys=KEYS,
        store=store,
        backup_dir=str(tmp_path / "bk"),
        backup_every_n_batches=2,
        backup_retention=2,
    )
    d.bootstrap(
        {
            "parent": spark.createDataFrame([(1, "P1")], "p_id long, name string"),
            "child": spark.createDataFrame(
                [(101, 1, "C1")], "c_id long, p_id long, val string"
            ),
        }
    )
    def n_backups():
        p = tmp_path / "bk"
        return len(list(p.iterdir())) if p.exists() else 0

    for i in range(1, 7):
        d.process_batch(
            {"child": _child_delta(spark, [(101, 1, f"C1v{i}", i, False)])}
        )
        # batches 1..6 with N=2 → backups after 2,4,6; retention caps at 2
        assert n_backups() == min(i // 2, 2), i


def test_backup_names_sort_temporally_and_never_collide(spark, tmp_path):
    """Retention and restore_latest sort backup names lexicographically,
    so stamps must zero-pad millis and de-collide within a millisecond."""
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=2)
    store.init(
        "e",
        spark.createDataFrame([(1, "a")], "k long, v string"),
        ["k"],
    )
    dests = [store.backup(str(tmp_path / "bk")) for _ in range(4)]
    import os

    names = [os.path.basename(d) for d in dests]
    assert len(set(names)) == 4  # same-millisecond backups de-collide
    assert sorted(names) == names  # lexicographic == creation order
    # and retention must keep the NEWEST, not a lexicographic accident
    newest = store.backup(str(tmp_path / "bk"), retention=1)
    remaining = os.listdir(tmp_path / "bk")
    assert remaining == [os.path.basename(newest)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="retention"):
        store.backup(str(tmp_path / "bk"), retention=0)


def test_drained_queue_dropped_in_streaming_mode(spark, tmp_path):
    """Streaming path: once the carry-over queue fully drains, the
    __pending__ entity is dropped (not re-staged empty every batch)."""
    d = _many_children(spark, tmp_path)
    delta = {
        "child": _child_delta(
            spark, [(100 + i, i, f"C{i}x", 5, False) for i in range(1, 5)]
        )
    }
    sunk = []

    def sink(name, df):
        sunk.extend(df.collect())

    d.process_batch(delta, sink=sink)  # emits 2, defers 2
    pending = "__pending__Denorm"
    names = [e for e in __import__("os").listdir(tmp_path / "state")
             if e.startswith("__pending__")]
    assert names, "deferred roots must persist a queue"
    d.process_batch({}, sink=sink)  # drains the remaining 2
    names = [e for e in __import__("os").listdir(tmp_path / "state")
             if e.startswith("__pending__")]
    assert names == [], "fully drained queue must be dropped"
    assert sorted(r["p_id"] for r in sunk) == [1, 2, 3, 4]


def test_old_aware_rules_reject_old_payload_column(spark):
    from southpaw_spark.operators.cdc import (
        apply_old_aware_rules,
        unchanged_skip_rule,
    )
    import pytest as _pytest

    delta = spark.createDataFrame(
        [(1, "x", 1, False)], "k long, old string, seq long, is_tombstone boolean"
    )
    with _pytest.raises(ValueError, match="collides"):
        apply_old_aware_rules(
            delta, None, [unchanged_skip_rule(["k"])], ["k"]
        )


def test_capped_random_soak_converges_to_batch_recompute(spark, tmp_path):
    """Randomized soak of the round-2 machinery in combination: 12
    micro-batches of random parent/child churn (incl. tombstones) under
    max_roots_per_batch=3 with a streaming sink, then a full drain. The
    final per-root documents (latest emission per PK) must equal a
    from-scratch batch denormalize over the final merged state."""
    import json as _json
    import random as _random

    rng = _random.Random(123)
    n_parents, n_children = 8, 20
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    d = IncrementalDenormalizer(
        spark=spark,
        relations=load_relations(TREE),
        keys=KEYS,
        store=store,
        max_roots_per_batch=3,
    )
    d.bootstrap(
        {
            "parent": spark.createDataFrame(
                [(p, f"P{p}") for p in range(1, n_parents + 1)],
                "p_id long, name string",
            ),
            "child": spark.createDataFrame(
                [(100 + c, 1 + c % n_parents, f"C{c}") for c in range(n_children)],
                "c_id long, p_id long, val string",
            ),
        }
    )
    latest: dict = {}

    def sink(name, df):
        for r in df.collect():
            latest[r["p_id"]] = r["value"]

    seq = 100
    for _ in range(12):
        deltas = {}
        if rng.random() < 0.7:
            rows = []
            for _ in range(rng.randint(1, 5)):
                c = rng.randrange(n_children)
                rows.append(
                    (
                        100 + c,
                        rng.randint(1, n_parents),  # FK may repoint
                        f"v{seq}",
                        seq,
                        rng.random() < 0.15,  # tombstone
                    )
                )
                seq += 1
            deltas["child"] = _child_delta(spark, rows)
        if rng.random() < 0.4:
            p = rng.randint(1, n_parents)
            deltas["parent"] = spark.createDataFrame(
                [(p, f"P{p}v{seq}", seq, rng.random() < 0.1)],
                "p_id long, name string, seq long, is_tombstone boolean",
            )
            seq += 1
        d.process_batch(deltas, sink=sink)
    # drain whatever the cap deferred
    for _ in range(20):
        if not store.exists("__pending__DenormalizedParent"):
            break
        d.process_batch({}, sink=sink)
    assert not store.exists("__pending__DenormalizedParent")

    # ground truth: full rebuild from the final merged state
    from southpaw_spark.operators.denormalize import denormalize_to_json

    states = {e: store.read(e) for e in KEYS}
    full = {
        r["p_id"]: r["value"]
        for r in denormalize_to_json(
            states, load_relations(TREE)[0], KEYS
        ).collect()
    }
    live_latest = {
        p: v for p, v in latest.items() if v is not None and p in full
    }
    # every live root's latest emitted doc equals the batch recompute
    assert set(full) == set(live_latest), (
        sorted(set(full) ^ set(live_latest)),
        sorted(latest),
    )
    for p, v in full.items():
        assert _json.loads(live_latest[p]) == _json.loads(v), p
    # and parents tombstoned along the way ended as null emissions
    for p, v in latest.items():
        if p not in full:
            assert v is None, p


def test_n_buckets_persisted_and_mismatch_fails_loudly(spark, tmp_path):
    """ADVICE r2: n_buckets is a physical layout property — reopening the
    same state dir with a different count would silently break merge()'s
    bucket pruning. It is persisted on first use; a conflicting reopen
    raises, and an unspecified reopen inherits the persisted value."""
    import pytest as _pytest

    root = str(tmp_path / "state")
    store = ParquetStateStore(spark, root, n_buckets=4)
    store.init("e", spark.createDataFrame([(1, "a")], "k long, v string"), ["k"])

    with _pytest.raises(ValueError, match="n_buckets"):
        ParquetStateStore(spark, root, n_buckets=8)

    inherited = ParquetStateStore(spark, root)  # no explicit count
    assert inherited.n_buckets == 4
    # same explicit count is fine, and pruning still merges correctly
    same = ParquetStateStore(spark, root, n_buckets=4)
    same.merge(
        "e",
        spark.createDataFrame([(1, "b")], "k long, v string"),
        None,
        ["k"],
    )
    assert [(r.k, r.v) for r in same.read("e").collect()] == [(1, "b")]


def test_schema_sidecar_is_staged_with_the_version(spark, tmp_path):
    """ADVICE r2: the schema write must ride the staged-commit protocol.
    A staged (uncommitted) version with a DIFFERENT schema must not
    change what the still-current version reads back as."""
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=2)
    v1 = store.init(
        "e", spark.createDataFrame([(1, "a")], "k long, v string"), ["k"]
    )
    # stage a rebuild with an evolved schema; pointer still at v1
    v2 = store.init(
        "e",
        spark.createDataFrame([(1, "a", 9)], "k long, v string, extra long"),
        ["k"],
        commit=False,
    )
    cur = store.read("e")  # resolves the committed pointer → v1 schema
    assert cur.columns == ["k", "v"]
    assert [(r.k, r.v) for r in cur.collect()] == [(1, "a")]
    staged = store.read_version("e", v2)  # staged version → staged schema
    assert staged.columns == ["k", "v", "extra"]
    store.commit("e", v2)
    assert store.read("e").columns == ["k", "v", "extra"]
    # vacuum drops the per-version schema sidecar along with old versions
    import os as _os

    store.init(
        "e",
        spark.createDataFrame([(2, "c", 1)], "k long, v string, extra long"),
        ["k"],
    )
    store.vacuum(keep=1)
    names = set(_os.listdir(tmp_path / "state" / "e"))
    assert f"_SCHEMA.v{v1}" not in names and "v1" not in names
