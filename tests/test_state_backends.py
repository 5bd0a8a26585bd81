"""Storage-format seam: the state-store protocol (init/merge/staged
commit/bucket pruning/hardlinks/vacuum/backup/restore) must hold on a
second physical format, and a full IVM delta batch must run on it.
Delta-native backend tests skip where the delta jars are absent."""

import json

import pytest
from pyspark.sql import functions as F

from southpaw_spark.streaming.state import ParquetStateStore


@pytest.fixture(params=["parquet", "orc"])
def fmt(request):
    return request.param


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "id long, val string")


def test_init_read_roundtrip(spark, tmp_path, fmt):
    store = ParquetStateStore(
        spark, str(tmp_path / "s"), n_buckets=4, data_format=fmt
    )
    store.init("e", _rows(spark, [(1, "a"), (2, "b")]), ["id"])
    got = {r["id"]: r["val"] for r in store.read("e").collect()}
    assert got == {1: "a", 2: "b"}
    assert store.data_format == fmt


def test_merge_upsert_delete_and_staged_commit(spark, tmp_path, fmt):
    store = ParquetStateStore(
        spark, str(tmp_path / "s"), n_buckets=4, data_format=fmt
    )
    store.init("e", _rows(spark, [(1, "a"), (2, "b"), (3, "c")]), ["id"])
    v = store.merge(
        "e",
        _rows(spark, [(1, "a2"), (4, "d")]),
        delete_keys=spark.createDataFrame([(3,)], "id long"),
        key_cols=["id"],
        commit=False,
    )
    # staged: readers still see the pre-merge rows
    assert {r["id"] for r in store.read("e").collect()} == {1, 2, 3}
    store.commit("e", v)
    got = {r["id"]: r["val"] for r in store.read("e").collect()}
    assert got == {1: "a2", 2: "b", 4: "d"}


def test_untouched_buckets_hardlink_through(spark, tmp_path, fmt):
    import os

    store = ParquetStateStore(
        spark, str(tmp_path / "s"), n_buckets=8, data_format=fmt
    )
    big = _rows(spark, [(i, f"v{i}") for i in range(64)])
    v1 = store.init("e", big, ["id"])
    v2 = store.merge("e", _rows(spark, [(1, "X")]), None, ["id"])
    old_dir, new_dir = store._data_dir("e", v1), store._data_dir("e", v2)
    shared = 0
    for name in os.listdir(new_dir):
        if not name.startswith("__bucket="):
            continue
        src = os.path.join(old_dir, name)
        if not os.path.isdir(src):
            continue
        for fn in os.listdir(os.path.join(new_dir, name)):
            a = os.path.join(src, fn)
            b = os.path.join(new_dir, name, fn)
            if os.path.exists(a) and os.path.samefile(a, b):
                shared += 1
    assert shared > 0  # at least one untouched bucket linked, any format
    got = {r["id"]: r["val"] for r in store.read("e").collect()}
    assert got[1] == "X" and got[63] == "v63"


def test_vacuum_and_reopen_persist_format(spark, tmp_path, fmt):
    root = str(tmp_path / "s")
    store = ParquetStateStore(spark, root, n_buckets=4, data_format=fmt)
    store.init("e", _rows(spark, [(1, "a")]), ["id"])
    for i in range(3):
        store.merge("e", _rows(spark, [(1, f"v{i}")]), None, ["id"])
    store.vacuum(keep=2)
    # reopen with no args: format comes back from _META
    again = ParquetStateStore(spark, root)
    assert again.data_format == fmt
    assert again.read("e").collect()[0]["val"] == "v2"
    # conflicting explicit format fails loudly
    other = "orc" if fmt == "parquet" else "parquet"
    with pytest.raises(ValueError, match="written as"):
        ParquetStateStore(spark, root, data_format=other)


def test_backup_restore_roundtrip(spark, tmp_path, fmt):
    store = ParquetStateStore(
        spark, str(tmp_path / "s"), n_buckets=4, data_format=fmt
    )
    store.init("e", _rows(spark, [(1, "a"), (2, "b")]), ["id"])
    bpath = store.backup(str(tmp_path / "bk"))
    store.merge("e", _rows(spark, [(1, "BAD")]), None, ["id"])
    assert store.restore(bpath)
    got = {r["id"]: r["val"] for r in store.read("e").collect()}
    assert got == {1: "a", 2: "b"}


def test_ivm_delta_batch_runs_on_orc(spark, tmp_path):
    """A full incremental batch (state merge + targeted rebuild + doc
    output) on the non-default format — the 'existing matrix green on a
    second backend' gate."""
    from southpaw_spark.relations import load_relations
    from southpaw_spark.streaming.ivm import IncrementalDenormalizer
    from southpaw_spark.testing import (
        RELATION_TREES,
        changelog_frames,
        entity_keys,
    )

    rels = load_relations([RELATION_TREES[1]])  # DenormalizedPlayer
    keys = entity_keys()
    store = ParquetStateStore(
        spark, str(tmp_path / "state"), n_buckets=4, data_format="orc"
    )
    ivm = IncrementalDenormalizer(
        spark=spark, relations=rels, keys=keys, store=store
    )
    logs = changelog_frames(spark)
    ivm.bootstrap(
        {
            "player": logs["player"].drop("seq", "is_tombstone"),
            "user": logs["user"].where("seq < 0").drop("seq", "is_tombstone"),
        }
    )
    results = {}

    def sink(name, df):
        for r in df.collect():
            results[(name, r["id"])] = r["value"]

    ivm.process_batch({"user": logs["user"]}, sink=sink)
    doc = json.loads(results[("DenormalizedPlayer", 800)])
    assert [u["Record"]["user_name"] for u in doc["Children"]["user"]] == [
        "alice2"
    ]


# -- Delta-native backend (skips without the delta-spark jars) ----------


def test_delta_backend_protocol(tmp_path):
    pytest.importorskip("delta")
    from southpaw_spark.session import get_spark
    from southpaw_spark.streaming.delta_state import (
        DeltaStateStore,
        delta_available,
    )

    spark = get_spark("delta-state-test")
    if not delta_available():
        pytest.skip("delta python package present but jars missing")
    store = DeltaStateStore(spark, str(tmp_path / "ds"))
    store.init("e", _rows(spark, [(1, "a"), (2, "b")]), ["id"])
    v = store.merge(
        "e",
        _rows(spark, [(1, "a2"), (3, "c")]),
        delete_keys=spark.createDataFrame([(2,)], "id long"),
        key_cols=["id"],
        commit=False,
    )
    assert {r["id"] for r in store.read("e").collect()} == {1, 2}
    store.commit("e", v)
    got = {r["id"]: r["val"] for r in store.read("e").collect()}
    assert got == {1: "a2", 3: "c"}


def test_merge_schema_evolution_additive(spark, tmp_path, fmt):
    """A changelog gains a column (Avro field added; reference MapRecord
    absorbs this): evolution widens the schema by name, old rows read
    null, hardlinked untouched buckets read fine under the new sidecar."""
    store = ParquetStateStore(
        spark, str(tmp_path / "s"), n_buckets=8, data_format=fmt
    )
    store.init("e", _rows(spark, [(i, f"v{i}") for i in range(32)]), ["id"])
    wider = spark.createDataFrame(
        [(1, "X", "x@mail")], "id long, val string, email string"
    )
    with pytest.raises(Exception):
        store.merge("e", wider, None, ["id"])  # loud by default
    v = store.merge("e", wider, None, ["id"], allow_schema_evolution=True)
    store.commit("e", v)
    got = {r["id"]: (r["val"], r["email"]) for r in store.read("e").collect()}
    assert got[1] == ("X", "x@mail")
    assert got[31] == ("v31", None)  # untouched (hardlinked) bucket row
    assert len(got) == 32


def test_ivm_schema_evolution_end_to_end(spark, tmp_path):
    """Restart with a wider reader: the IVM merges the widened delta and
    rebuilds docs whose Record carries the new field (old rows: null)."""
    import json as _json

    from southpaw_spark.relations import load_relations
    from southpaw_spark.streaming.ivm import IncrementalDenormalizer

    rels = load_relations([{"DenormalizedName": "EvoUser", "Entity": "user"}])
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    ivm = IncrementalDenormalizer(
        spark=spark, relations=rels, keys={"user": ["id"]}, store=store,
        allow_schema_evolution=True,
    )
    ivm.bootstrap({"user": _rows(spark, [(1, "a"), (2, "b")])})
    results = {}

    def sink(name, df):
        for r in df.collect():
            results[r["id"]] = r["value"]

    delta = spark.createDataFrame(
        [(10, 1, "a2", "a@x", False)],
        "seq long, id long, val string, email string, is_tombstone boolean",
    )
    ivm.process_batch({"user": delta}, sink=sink)
    doc = _json.loads(results[1])
    assert doc["Record"] == {"id": 1, "val": "a2", "email": "a@x"}
    # untouched root keeps its doc shape on later rebuilds (null email)
    delta2 = spark.createDataFrame(
        [(11, 2, "b2", None, False)],
        "seq long, id long, val string, email string, is_tombstone boolean",
    )
    ivm.process_batch({"user": delta2}, sink=sink)
    doc2 = _json.loads(results[2])
    # null email serializes as ABSENT (documented canonicalization:
    # ignoreNullFields identifies null with absent)
    assert doc2["Record"] == {"id": 2, "val": "b2"}


# -- native bucketed reads (round 8: BASELINE §11 win without the
#    opt-in bucketize_states conversion pass) --------------------------


def _composite_rows(spark, n=64):
    return spark.createDataFrame(
        [(i % 8, i, f"r{i}") for i in range(n)], "a long, b long, val string"
    )


def test_read_bucketed_parity_and_zero_exchange(spark, tmp_path, fmt):
    """read_bucketed must return byte-identical rows to read(), and its
    scan must carry the bucket layout: groupBy(bucket col) and a
    self-equi-join on it plan with ZERO shuffle exchanges."""
    store = ParquetStateStore(
        spark, str(tmp_path / "s"), n_buckets=8, data_format=fmt
    )
    store.init(
        "e", _composite_rows(spark), ["a", "b"], bucket_cols=["a"]
    )
    plain, bucketed = store.read("e"), store.read_bucketed("e")
    assert bucketed.exceptAll(plain).count() == 0
    assert plain.exceptAll(bucketed).count() == 0
    g = bucketed.groupBy("a").agg(F.count("*").alias("n"))
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = store.read_bucketed("e").join(
            store.read_bucketed("e").groupBy("a").agg(F.max("b").alias("mx")),
            "a",
        )
        jplan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in jplan, jplan
        assert j.count() == 64
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_subset_merge_prunes_and_persists_layout(spark, tmp_path):
    """Bucketing by a PK SUBSET (the join key) must keep merge pruning
    exact — old rows located via the subset hash — and the layout must
    persist: a conflicting explicit bucket_cols on reopen fails, a
    non-key bucket column fails."""
    store = ParquetStateStore(spark, str(tmp_path / "s"), n_buckets=8)
    store.init("li", _composite_rows(spark), ["a", "b"], bucket_cols=["a"])
    store.merge(
        "li",
        spark.createDataFrame([(3, 27, "NEW")], "a long, b long, val string"),
        spark.createDataFrame([(5, 13)], "a long, b long"),
        ["a", "b"],
    )
    got = {(r["a"], r["b"]): r["val"] for r in store.read("li").collect()}
    assert got[(3, 27)] == "NEW"
    assert (5, 13) not in got
    assert len(got) == 63  # 64 - 1 delete (upsert replaced, not added)
    assert store.bucket_layout("li") == ["a"]
    with pytest.raises(ValueError, match="bucketed by"):
        store.merge(
            "li",
            spark.createDataFrame([(1, 1, "x")], "a long, b long, val string"),
            None,
            ["a", "b"],
            bucket_cols=["b"],
        )
    with pytest.raises(ValueError, match="subset"):
        store.init("bad", _composite_rows(spark), ["b"], bucket_cols=["val"])


def test_read_bucketed_legacy_layout_raises_and_ivm_falls_back(
    spark, tmp_path
):
    """Pre-sidecar state dirs keep working: read_bucketed refuses loudly
    and the IVM read helper falls back to the plain read."""
    import os

    from southpaw_spark.relations import load_relations
    from southpaw_spark.streaming.ivm import IncrementalDenormalizer

    store = ParquetStateStore(spark, str(tmp_path / "s"), n_buckets=4)
    store.init("e", _rows(spark, [(1, "a")]), ["id"])
    os.remove(os.path.join(str(tmp_path / "s"), "e", "_BUCKETCOLS"))
    with pytest.raises(ValueError, match="legacy"):
        store.read_bucketed("e")
    rel = load_relations(
        '[{"DenormalizedName":"D","Entity":"e","Children":[]}]'
    )[0]
    d = IncrementalDenormalizer(
        spark=spark, relations=[rel], keys={"e": ["id"]}, store=store
    )
    assert {r["id"]: r["val"] for r in d._state_read("e").collect()} == {1: "a"}


def test_ivm_bucketed_rebuild_parity(spark, tmp_path):
    """The default bucketed-read rebuild must emit byte-identical docs
    to the plain-read path across a batch sequence that exercises
    upserts, FK repointing, and tombstones."""
    from southpaw_spark.relations import load_relations
    from southpaw_spark.streaming.ivm import IncrementalDenormalizer

    rel_json = (
        '[{"DenormalizedName":"DParent","Entity":"parent","Children":['
        '{"Entity":"child","JoinKey":"pid","ParentKey":"id"}]}]'
    )
    keys = {"parent": ["id"], "child": ["pid", "cid"]}
    parents = spark.createDataFrame(
        [(1, "p1"), (2, "p2"), (3, "p3")], "id long, name string"
    )
    children = spark.createDataFrame(
        [(1, 10, "c10"), (1, 11, "c11"), (2, 20, "c20")],
        "pid long, cid long, cval string",
    )
    batches = [
        {  # child upsert + FK repoint of (1,11) -> parent 3
            "child": spark.createDataFrame(
                [(3, 11, "c11-moved", 1, False), (2, 21, "c21", 2, False)],
                "pid long, cid long, cval string, seq long, is_tombstone boolean",
            )
        },
        {  # parent tombstone
            "parent": spark.createDataFrame(
                [(2, None, 1, True)],
                "id long, name string, seq long, is_tombstone boolean",
            )
        },
    ]
    results = {}
    for mode in (True, False):
        store = ParquetStateStore(
            spark, str(tmp_path / f"s_{mode}"), n_buckets=4
        )
        d = IncrementalDenormalizer(
            spark=spark,
            relations=load_relations(rel_json),
            keys=keys,
            store=store,
            bucketed_reads=mode,
        )
        d.bootstrap({"parent": parents, "child": children})
        outs = []
        for b in batches:
            out = d.process_batch(b)
            outs.append(
                sorted(
                    (r["id"], r["value"])
                    for r in out["DParent"].collect()
                )
            )
        results[mode] = outs
        if mode:
            assert store.bucket_layout("child") == ["pid"]
            assert store.bucket_layout("parent") == ["id"]
    assert results[True] == results[False]


def test_full_rebuild_from_store_halves_exchanges(spark, tmp_path, sf_dir):
    """The round-8 headline: a FULL doc rebuild reading the store's
    native bucketed layout must carry at most half the shuffle
    exchanges of the plain-read plan (measured 8 -> 4 at sf0.1) with
    byte-identical output."""
    from pyspark.sql import functions as F

    from southpaw_spark.operators.denormalize import denormalize
    from southpaw_spark.relations import load_relations
    from southpaw_spark.streaming.ivm import IncrementalDenormalizer
    from southpaw_spark.suite import ORDER_TREE_JSON, ORDER_TREE_KEYS

    store = ParquetStateStore(spark, str(tmp_path / "s"), n_buckets=8)
    ivm = IncrementalDenormalizer(
        spark=spark,
        relations=load_relations(ORDER_TREE_JSON),
        keys=ORDER_TREE_KEYS,
        store=store,
    )
    ivm.bootstrap(
        {
            e: spark.read.parquet(f"{sf_dir}/{e}.parquet")
            for e in ORDER_TREE_KEYS
        }
    )
    rel = load_relations(ORDER_TREE_JSON)[0]

    def build(reader):
        states = {e: reader(e) for e in ORDER_TREE_KEYS}
        docs = denormalize(states, rel, ORDER_TREE_KEYS)
        return docs.select(
            "o_orderkey",
            F.to_json(F.col("doc"), {"ignoreNullFields": "true"}).alias(
                "value"
            ),
        )

    plain = build(store.read)
    native = build(store.read_bucketed)
    n_plain = plain._jdf.queryExecution().executedPlan().toString().count(
        "Exchange hashpartitioning"
    )
    n_native = native._jdf.queryExecution().executedPlan().toString().count(
        "Exchange hashpartitioning"
    )
    assert n_native <= n_plain // 2, (n_plain, n_native)
    assert native.exceptAll(plain).count() == 0
    assert plain.exceptAll(native).count() == 0


def test_one_data_file_per_bucket_per_version(spark, tmp_path):
    """Small-file guard (round 8): init and merge must leave exactly ONE
    data file per (touched) bucket per version — without the pre-write
    repartition each write task fans a file into every bucket dir it
    holds rows for (observed 3 files/bucket after one merge), the 100 TB
    small-file killer."""
    import os

    store = ParquetStateStore(spark, str(tmp_path / "s"), n_buckets=8)
    rows = spark.createDataFrame(
        [(i, f"r{i}") for i in range(400)], "k long, v string"
    ).repartition(8)  # multiple write tasks
    store.init("e", rows, ["k"])
    store.merge(
        "e",
        spark.createDataFrame(
            [(i, "new") for i in range(0, 400, 7)], "k long, v string"
        ).repartition(8),
        None,
        ["k"],
    )
    root = str(tmp_path / "s")
    for version in ("v1", "v2"):
        vdir = os.path.join(root, "e", version)
        for name in os.listdir(vdir):
            if not name.startswith("__bucket="):
                continue
            n = sum(
                1 for f in os.listdir(os.path.join(vdir, name))
                if f.endswith((".parquet", ".orc"))
            )
            assert n == 1, f"{version}/{name}: {n} files"
    got = {r["k"]: r["v"] for r in store.read("e").collect()}
    assert len(got) == 400 and got[7] == "new" and got[1] == "r1"


def test_vacuum_sweeps_abandoned_mirror_tmp_dirs(spark, tmp_path):
    """A crash mid-mirror-build leaves a v{N}.bucketed.tmp-* dir of
    hardlinks; vacuum must sweep it regardless of version recency."""
    import os

    store = ParquetStateStore(spark, str(tmp_path / "s"), n_buckets=4)
    store.init("e", _rows(spark, [(1, "a")]), ["id"])
    edir = os.path.join(str(tmp_path / "s"), "e")
    orphan = os.path.join(edir, "v1.bucketed.tmp-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "partial"), "w") as f:
        f.write("x")
    store.vacuum(keep=2)
    assert not os.path.exists(orphan)
    # the committed version itself survives
    assert {r["id"] for r in store.read("e").collect()} == {1}


def test_backup_restore_preserves_bucket_layout(spark, tmp_path):
    """The _BUCKETCOLS sidecar and the store-level _META must ride
    backups: restoring join-key-bucketed data without them would make
    later merges hash delta keys with the WRONG bucket function —
    pruned reads then skip the buckets holding the old rows and stale
    duplicates survive silently."""
    import os

    root = str(tmp_path / "s")
    store = ParquetStateStore(spark, root, n_buckets=8)
    store.init("li", _composite_rows(spark), ["a", "b"], bucket_cols=["a"])
    bdir = str(tmp_path / "bk")
    store.backup(bdir)
    snap = os.path.join(bdir, sorted(os.listdir(bdir))[0])
    # wipe the live entity (sidecar included), then restore
    import shutil

    shutil.rmtree(os.path.join(root, "li"))
    assert store.restore(snap)
    assert store.bucket_layout("li") == ["a"]
    # a merge after restore must still prune correctly (replaced row
    # gone, upsert present, everything else intact)
    store.merge(
        "li",
        spark.createDataFrame([(3, 27, "NEW")], "a long, b long, val string"),
        None,
        ["a", "b"],
    )
    got = {(r["a"], r["b"]): r["val"] for r in store.read("li").collect()}
    assert got[(3, 27)] == "NEW" and len(got) == 64

    # fresh store with a DIFFERENT default layout adopts the backup's
    root2 = str(tmp_path / "s2")
    store2 = ParquetStateStore(spark, root2, n_buckets=4)
    assert store2.restore(snap)
    assert store2.n_buckets == 8
    assert {r["a"] for r in store2.read("li").collect()} == set(range(8))

    # populated store with a conflicting layout refuses loudly
    root3 = str(tmp_path / "s3")
    store3 = ParquetStateStore(spark, root3, n_buckets=4)
    store3.init("other", _rows(spark, [(1, "x")]), ["id"])
    with pytest.raises(ValueError, match="conflicts"):
        store3.restore(snap)


def test_restore_rotates_incarnation_for_read_bucketed(spark, tmp_path):
    """A same-session read_bucketed AFTER restore must see the restored
    rows. restore() rmtree's entity dirs (unlinking any v*.bucketed
    mirror files) while the session catalog still holds bucketed-table
    entries for the same (store_id, entity, version) names with cached
    file indexes pointing at the dead mirrors — so restore() must rotate
    the _STORE_ID incarnation and drop the dead entries."""
    import os

    root = str(tmp_path / "s")
    store = ParquetStateStore(spark, root, n_buckets=4)
    store.init("e", _composite_rows(spark), ["a", "b"], bucket_cols=["a"])
    # register the bucketed table for (incarnation, e, v1) in-session
    before = {(r["a"], r["b"]): r["val"] for r in store.read_bucketed("e").collect()}
    old_id = store._store_id()
    bdir = str(tmp_path / "bk")
    snap = store.backup(bdir)
    # diverge: overwrite a row (bumps version), then restore the backup
    store.merge(
        "e",
        spark.createDataFrame([(3, 27, "BAD")], "a long, b long, val string"),
        None,
        ["a", "b"],
    )
    assert store.restore(snap)
    assert store._store_id() != old_id  # incarnation rotated
    # same session, same version number as the pre-restore read: must
    # resolve to a FRESH mirror + table, not the dead catalog entry
    after = {(r["a"], r["b"]): r["val"] for r in store.read_bucketed("e").collect()}
    assert after == before
    # the dead incarnation's catalog entries are gone
    dead = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith(f"southpaw_state_{old_id}_")
    ]
    assert dead == []


def test_suggest_n_buckets_scales_with_state_size():
    from southpaw_spark.streaming.state import suggest_n_buckets

    # small state: parallelism floor dominates
    assert suggest_n_buckets(10 * 1024 * 1024) == 16
    # 100 GB at 256 MB buckets -> 400
    assert suggest_n_buckets(100 * 1024**3) == 400
    # the BASELINE §15 shape: ~10 GB state on 32 cores
    assert suggest_n_buckets(10 * 1024**3, min_parallelism=32) == 40
    # monotone in size
    assert suggest_n_buckets(1024**4) > suggest_n_buckets(100 * 1024**3)


def test_rebucket_migrates_layout_and_merges_still_prune(spark, tmp_path):
    """Round-13 store resize: rebucket() rewrites every entity under
    the new hash (join-key bucket sidecars preserved), swaps
    atomically, and post-migration merges prune correctly (stale rows
    would survive if pruning hashed the wrong layout). Uncommitted
    staged versions and unknown legacy layouts fail loudly; the CLI
    exposes it as --rebucket N."""
    import pytest
    import yaml

    from southpaw_spark import cli
    from southpaw_spark.streaming import ParquetStateStore

    root = str(tmp_path / "state")
    store = ParquetStateStore(spark, root, n_buckets=4)
    rows = spark.createDataFrame(
        [(i, i % 7, f"v{i}") for i in range(200)],
        "ok long, fk long, val string",
    )
    store.init("orders", rows, ["ok"])
    # join-key-bucketed entity: sidecar must survive the migration
    store.init("lineitem", rows, ["ok", "fk"], bucket_cols=["fk"])
    store.merge(
        "orders",
        spark.createDataFrame([(1, 1, "v1b")], "ok long, fk long, val string"),
        None, ["ok"],
    )

    new = store.rebucket(16)
    assert new.n_buckets == 16
    assert new.bucket_layout("lineitem") == ["fk"]
    got = {r["ok"]: r["val"] for r in new.read("orders").collect()}
    assert len(got) == 200 and got[1] == "v1b"
    # fresh handle on the dir sees the new layout; the old count fails
    assert ParquetStateStore(spark, root).n_buckets == 16
    with pytest.raises(ValueError, match="n_buckets"):
        ParquetStateStore(spark, root, n_buckets=4)

    # merges under the new layout prune the RIGHT buckets (an old-hash
    # prune would leave a stale duplicate for the merged key)
    new.merge(
        "orders",
        spark.createDataFrame([(2, 2, "v2b")], "ok long, fk long, val string"),
        None, ["ok"],
    )
    cur = new.read("orders").where("ok = 2").collect()
    assert [r["val"] for r in cur] == ["v2b"]

    # staged (uncommitted) version blocks migration
    new.merge(
        "orders",
        spark.createDataFrame([(3, 3, "v3b")], "ok long, fk long, val string"),
        None, ["ok"], commit=False,
    )
    with pytest.raises(ValueError, match="staged uncommitted"):
        new.rebucket(8)

    # CLI surface (fresh store so no staged versions)
    root2 = str(tmp_path / "state2")
    s2 = ParquetStateStore(spark, root2, n_buckets=4)
    s2.init("e", rows, ["ok"])
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(yaml.safe_dump({"state.dir": root2}))
    assert cli.main(["--config", str(cfg), "--rebucket", "8"]) == 0
    assert ParquetStateStore(spark, root2).n_buckets == 8
    assert ParquetStateStore(spark, root2).read("e").count() == 200

    # legacy entity (no bucket-column sidecar) needs an explicit map
    import os

    os.remove(os.path.join(root2, "e", "_BUCKETCOLS"))
    s3 = ParquetStateStore(spark, root2)
    with pytest.raises(ValueError, match="predates"):
        s3.rebucket(16)
    s4 = s3.rebucket(16, bucket_cols={"e": ["ok"]})
    assert s4.read("e").count() == 200 and s4.bucket_layout("e") == ["ok"]


def test_rebucket_mid_lifecycle_ivm_converges(spark, tmp_path):
    """Resize during a live deployment's lifetime: bootstrap → deltas →
    QUIESCE → rebucket → more deltas on a fresh handle. The docs after
    the post-resize batch must equal a from-scratch batch denormalize
    of the final entity states (the IVM's convergence contract survives
    the layout migration — merge pruning and the bucketed-state reads
    both hash the NEW layout)."""
    import json

    from southpaw_spark.relations import load_relations
    from southpaw_spark.streaming import (
        IncrementalDenormalizer,
        ParquetStateStore,
    )
    from southpaw_spark.testing import (
        RELATION_TREES,
        changelog_frames,
        entity_keys,
    )

    rels = load_relations([RELATION_TREES[1]])  # DenormalizedPlayer
    keys = entity_keys()
    logs = changelog_frames(spark)
    tree_keys = {"player": keys["player"], "user": keys["user"]}

    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    ivm = IncrementalDenormalizer(
        spark=spark, relations=rels, keys=tree_keys, store=store
    )
    ivm.bootstrap(
        {e: logs[e].where("seq < 0").drop("seq", "is_tombstone")
         for e in tree_keys}
    )
    ivm.process_batch({e: logs[e].where("seq <= 18") for e in tree_keys})

    new_store = store.rebucket(16)
    ivm2 = IncrementalDenormalizer(
        spark=spark, relations=rels, keys=tree_keys, store=new_store
    )
    outs = ivm2.process_batch(
        {e: logs[e].where("seq > 18") for e in tree_keys}
    )
    docs = {
        r["id"]: r["value"]
        for r in outs["DenormalizedPlayer"].collect()
        if r["value"] is not None
    }
    # ground truth: batch denormalize of the post-resize entity states
    from southpaw_spark.operators.denormalize import denormalize_to_json

    truth = {
        r["id"]: r["value"]
        for r in denormalize_to_json(
            {e: new_store.read(e) for e in tree_keys}, rels[0], tree_keys
        ).collect()
    }
    assert docs  # the seq>18 batch really dirtied roots
    for pid, value in docs.items():
        assert json.loads(value) == json.loads(truth[pid]), pid
    # the seq-30 alice→alice2 rename flowed through the resized store
    blob = " ".join(docs.values())
    assert "alice2" in blob


def test_rebucket_staged_only_entity_fails_loudly(spark, tmp_path):
    """ADVICE r13 (medium): an entity dir holding ONLY staged
    uncommitted versions (crashed first bootstrap: v1 written, _CURRENT
    never published) used to be silently excluded from the migration
    plan, then destroyed by the directory swap. It must fail loudly
    like any other staged version; a truly empty shell dir (no
    versions) is simply skipped."""
    import os

    import pytest

    from southpaw_spark.streaming import ParquetStateStore

    root = str(tmp_path / "state")
    store = ParquetStateStore(spark, root, n_buckets=4)
    rows = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "ok long, val string"
    )
    store.init("orders", rows, ["ok"])

    # crashed bootstrap: staged v1 with data, no _CURRENT pointer
    crashed = os.path.join(root, "crashed")
    os.makedirs(os.path.join(crashed, "v1"))
    rows.limit(3).write.mode("overwrite").parquet(
        os.path.join(crashed, "v1", "bucket=0")
    )
    with pytest.raises(ValueError, match="no committed version"):
        store.rebucket(16)
    # nothing was swapped: the staged data still exists
    assert os.path.isdir(os.path.join(crashed, "v1"))
    assert store.read("orders").count() == 20

    # an empty shell (no v* at all) doesn't block the migration
    import shutil

    shutil.rmtree(crashed)
    os.makedirs(os.path.join(root, "shell"))
    new = store.rebucket(16)
    assert new.read("orders").count() == 20
    assert not new.exists("shell")


def test_cli_rebucket_zero_surfaces_validation_error(spark, tmp_path):
    """ADVICE r13 (low): `--rebucket 0` must reach store.rebucket's
    loud n_buckets validation instead of falling through argparse
    truthiness to a silent exit 2."""
    import pytest
    import yaml

    from southpaw_spark import cli
    from southpaw_spark.streaming import ParquetStateStore

    root = str(tmp_path / "state")
    ParquetStateStore(spark, root, n_buckets=4).init(
        "e",
        spark.createDataFrame([(1, "a")], "ok long, val string"),
        ["ok"],
    )
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(yaml.safe_dump({"state.dir": root}))
    with pytest.raises(ValueError, match="n_buckets must be >= 1"):
        cli.main(["--config", str(cfg), "--rebucket", "0"])


def test_ivm_incremental_batch_on_unbucketed_store(spark, tmp_path):
    """ADVICE r15 (high): the IVM's bucket-pruned pre-image read must be
    capability-gated — a store exposing only the documented drop-in
    surface (exists/read/read_version/init/merge/commit/vacuum, no
    physical __bucket layout: the DeltaStateStore shape) has to fall
    back to the plain key semi-join instead of crashing with
    AttributeError on every incremental batch."""
    import json

    from southpaw_spark.relations import load_relations
    from southpaw_spark.streaming.ivm import IncrementalDenormalizer
    from southpaw_spark.testing import (
        RELATION_TREES,
        changelog_frames,
        entity_keys,
    )

    class UnbucketedStore:
        """Protocol-surface-only facade over ParquetStateStore: hides
        the bucket capability methods and strips __bucket from reads —
        exactly what a Delta/Iceberg-style backend presents."""

        def __init__(self, inner):
            self._inner = inner

        def exists(self, entity):
            return self._inner.exists(entity)

        def read(self, entity):
            df = self._inner.read(entity)
            return df.drop("__bucket") if "__bucket" in df.columns else df

        def read_version(self, entity, version):
            return self._inner.read_version(entity, version)

        def init(self, entity, rows, key_cols, **kw):
            kw.pop("bucket_cols", None)
            return self._inner.init(entity, rows, key_cols, **kw)

        def merge(self, entity, upserts, delete_keys, key_cols, **kw):
            kw.pop("touched_ids", None)
            kw.pop("bucket_cols", None)
            return self._inner.merge(
                entity, upserts, delete_keys, key_cols, **kw
            )

        def commit(self, entity, version):
            return self._inner.commit(entity, version)

        def vacuum(self, *a, **kw):
            return self._inner.vacuum(*a, **kw)

    rels = load_relations([RELATION_TREES[1]])  # DenormalizedPlayer
    keys = entity_keys()
    store = UnbucketedStore(
        ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    )
    ivm = IncrementalDenormalizer(
        spark=spark, relations=rels, keys=keys, store=store,
        bucketed_reads=False,
    )
    logs = changelog_frames(spark)
    ivm.bootstrap(
        {
            "player": logs["player"].drop("seq", "is_tombstone"),
            "user": logs["user"].where("seq < 0").drop("seq", "is_tombstone"),
        }
    )
    results = {}

    def sink(name, df):
        for r in df.collect():
            results[(name, r["id"])] = r["value"]

    ivm.process_batch({"user": logs["user"]}, sink=sink)
    doc = json.loads(results[("DenormalizedPlayer", 800)])
    assert [u["Record"]["user_name"] for u in doc["Children"]["user"]] == [
        "alice2"
    ]
