"""Incremental deduper: cascade correctness, cross-batch state matching,
greedy chunking semantics, and restart-from-committed-state.

Corpus construction note: repeated-pattern docs ("x y z x y z …" with
different repeat counts) have IDENTICAL distinct word-3-gram sets but
different text — so their MinHash signatures agree exactly (similarity
1.0, no estimator noise) while the exact stage sees distinct content.
That makes near-dup expectations deterministic.
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from southpaw_spark.streaming import ParquetStateStore
from southpaw_spark.streaming.dedup_stream import IncrementalDeduper


@pytest.fixture(autouse=True)
def _no_block_leaks(spark):
    """Dedupers keep the last decision log persisted until close(); the
    shared-session leak test (test_old_filters_state) asserts zero
    storage blocks, so drop everything this module cached."""
    yield
    spark.catalog.clearCache()
    # clearCache covers DataFrame persist(); localCheckpoint blocks
    # (connected_components generations) live as plain persistent RDDs —
    # release them deterministically instead of waiting on the
    # ContextCleaner's async GC-driven sweep
    for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        jrdd.unpersist()


def _rep(words: str, k: int) -> str:
    return " ".join(words.split() * k)


DOCS = {
    # family P: mutual near-dups (equal shingle sets)
    1: _rep("p0 p1 p2", 10),
    2: _rep("p0 p1 p2", 12),
    3: _rep("p0 p1 p2", 14),
    # family Q
    11: _rep("q0 q1 q2", 10),
    12: _rep("q0 q1 q2", 12),
    # exact pair
    21: "u0 u1 u2 u3 u4 u5 u6 u7",
    22: "u0 u1 u2 u3 u4 u5 u6 u7",
    # unique
    31: "v0 v1 v2 v3 v4 v5 v6 v7",
    # shingle-less (shorter than n=3 words)
    41: "tiny doc"[:8],
}


def _df(spark, ids):
    return spark.createDataFrame(
        [(i, DOCS[i]) for i in ids], "doc_id long, text string"
    )


def _decisions(df):
    return {r["doc_id"]: (r["status"], r["keeper_id"]) for r in df.collect()}


def test_single_batch_matches_cascade(spark, tmp_path):
    store = ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=4)
    d = IncrementalDeduper(spark, store)
    out = _decisions(d.process_batch(_df(spark, sorted(DOCS))))
    assert out[1] == ("kept", 1)
    assert out[2] == ("near_dup", 1)
    assert out[3] == ("near_dup", 1)
    assert out[11] == ("kept", 11)
    assert out[12] == ("near_dup", 11)
    assert out[21] == ("kept", 21)
    assert out[22] == ("exact_dup", 21)
    assert out[31] == ("kept", 31)
    assert out[41] == ("kept", 41)  # shingle-less → fuzzy bypass
    assert len(out) == len(DOCS)
    assert d.metrics == {
        "dedup.docs": 9,
        "dedup.kept": 5,
        "dedup.exact_dups": 1,
        "dedup.near_dups": 3,
    }


def test_chunked_state_matching_and_greedy_semantics(spark, tmp_path):
    store = ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=4)
    d = IncrementalDeduper(spark, store)

    b1 = _decisions(d.process_batch(_df(spark, [1, 21, 31])))
    assert b1 == {1: ("kept", 1), 21: ("kept", 21), 31: ("kept", 31)}

    b2 = _decisions(d.process_batch(_df(spark, [2, 12, 22, 41])))
    # 2 matches kept 1 through the persisted LSH index; 22 matches kept
    # 21 through the pointer table; 12 is the first of its family → kept
    assert b2[2] == ("near_dup", 1)
    assert b2[22] == ("exact_dup", 21)
    assert b2[12] == ("kept", 12)
    assert b2[41] == ("kept", 41)

    b3 = _decisions(d.process_batch(_df(spark, [3, 11])))
    assert b3[3] == ("near_dup", 1)
    # greedy incremental semantics: 12 was kept first, so the
    # lower-id 11 arriving later is the one dropped
    assert b3[11] == ("near_dup", 12)

    # invariants: every dropped doc's keeper is a kept doc
    all_dec = {**b1, **b2, **b3}
    kept = {i for i, (s, _) in all_dec.items() if s == "kept"}
    for i, (status, keeper) in all_dec.items():
        if status != "kept":
            assert keeper in kept, (i, status, keeper)
    assert set(r["doc_id"] for r in d.kept_ids().collect()) == kept - {41}


def test_restart_resumes_from_committed_state(spark, tmp_path):
    path = str(tmp_path / "st")
    d1 = IncrementalDeduper(spark, ParquetStateStore(spark, path, n_buckets=4))
    d1.process_batch(_df(spark, [1, 21]))

    # a NEW deduper over the same directory sees the committed state
    d2 = IncrementalDeduper(spark, ParquetStateStore(spark, path))
    out = _decisions(d2.process_batch(_df(spark, [2, 22, 31])))
    assert out[2] == ("near_dup", 1)
    assert out[22] == ("exact_dup", 21)
    assert out[31] == ("kept", 31)


def test_auto_vacuum_bounds_state_versions(spark, tmp_path):
    """A long dedup stream must not grow one version dir per entity per
    batch: auto_vacuum (default on) keeps ≤2 committed versions, and
    auto_vacuum=False preserves the full history for callers managing
    retention themselves."""
    import os

    def n_versions(root):
        out = {}
        for ent in os.listdir(root):
            edir = os.path.join(root, ent)
            if os.path.isdir(edir):
                out[ent] = len(
                    [d for d in os.listdir(edir) if d.startswith("v")]
                )
        return out

    path = str(tmp_path / "st")
    d = IncrementalDeduper(spark, ParquetStateStore(spark, path, n_buckets=4))
    for ids in ([1, 21], [2, 22], [31], [11, 12]):
        d.process_batch(_df(spark, ids))
    assert all(v <= 2 for v in n_versions(path).values()), n_versions(path)
    d.close()

    path2 = str(tmp_path / "st2")
    d2 = IncrementalDeduper(
        spark, ParquetStateStore(spark, path2, n_buckets=4), auto_vacuum=False
    )
    for ids in ([1, 21], [2, 22], [31]):
        d2.process_batch(_df(spark, ids))
    assert max(n_versions(path2).values()) >= 3
    d2.close()


def test_reopen_with_conflicting_geometry_fails_loudly(spark, tmp_path):
    """State built with one (n, num_hashes, bands) must refuse to open
    under different geometry — mismatched band buckets would silently
    miss the persisted index and leak duplicates into the kept set."""
    path = str(tmp_path / "st")
    d1 = IncrementalDeduper(spark, ParquetStateStore(spark, path, n_buckets=4))
    d1.process_batch(_df(spark, [1, 21]))

    for kwargs in ({"bands": 2}, {"num_hashes": 4}, {"n": 2}):
        with pytest.raises(ValueError, match="geometry|built with"):
            IncrementalDeduper(
                spark, ParquetStateStore(spark, path), **kwargs
            )
    # sim_threshold is a scoring knob, not geometry — reopen is fine
    d2 = IncrementalDeduper(
        spark, ParquetStateStore(spark, path), sim_threshold=0.9
    )
    assert _decisions(d2.process_batch(_df(spark, [31])))[31] == ("kept", 31)


def test_exact_dup_pointer_resolves_through_dropped_keeper(spark, tmp_path):
    """A doc whose batch exact-keeper is itself dropped as a near-dup
    must point at the transitively-kept doc, never a dropped one."""
    store = ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=4)
    d = IncrementalDeduper(spark, store)
    d.process_batch(_df(spark, [1]))
    # 2 and its exact copy arrive together; 2 is near-dup of kept 1
    dup_of_2 = spark.createDataFrame(
        [(2, DOCS[2]), (5, DOCS[2])], "doc_id long, text string"
    )
    out = _decisions(d.process_batch(dup_of_2))
    assert out[2] == ("near_dup", 1)
    assert out[5] == ("exact_dup", 1)


def test_attach_dedup_stream_file_source(spark, tmp_path):
    """Real Structured Streaming wiring: documents drip-fed as file
    micro-batches; decisions accumulate via the sink; state matching
    works across micro-batches."""
    import json
    import time

    from southpaw_spark.streaming.dedup_stream import attach_dedup_stream

    store = ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=4)
    d = IncrementalDeduper(spark, store)

    src = tmp_path / "docs_in"
    src.mkdir()
    results: dict = {}

    def sink(decisions, batch_id):
        for r in decisions.collect():
            results[r["doc_id"]] = (r["status"], r["keeper_id"])

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    query = attach_dedup_stream(
        d, stream, checkpoint_dir=str(tmp_path / "ckpt"), sink=sink
    )
    try:
        (src / "a.json").write_text(
            "\n".join(
                json.dumps({"doc_id": i, "text": DOCS[i]}) for i in [1, 21]
            )
        )
        (src / "b.json").write_text(
            "\n".join(
                json.dumps({"doc_id": i, "text": DOCS[i]}) for i in [2, 22, 31]
            )
        )
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            query.processAllAvailable()
            if 31 in results:
                break
            time.sleep(1)
    finally:
        query.stop()

    assert results[1] == ("kept", 1)
    assert results[21] == ("kept", 21)
    assert results[2] == ("near_dup", 1)
    assert results[22] == ("exact_dup", 21)
    assert results[31] == ("kept", 31)


def test_randomized_chunking_invariants(spark, tmp_path):
    """Fuzz: a corpus of known duplicate families, shuffled and split
    into random chunks — however the docs arrive, exactly one member of
    each family survives, every drop points at a kept doc, and the
    decision log partitions the corpus."""
    import random

    rng = random.Random(20260814)
    docs = {}
    fam_of = {}
    next_id = 1
    for fam in range(6):
        words = f"f{fam}a f{fam}b f{fam}c"
        for _ in range(rng.randint(2, 4)):
            docs[next_id] = _rep(words, rng.randint(8, 15))
            fam_of[next_id] = ("fam", fam)
            next_id += 1
    # exact-copy family + uniques
    for _ in range(3):
        docs[next_id] = "e0 e1 e2 e3 e4 e5 e6"
        fam_of[next_id] = ("exact", 0)
        next_id += 1
    for u in range(4):
        docs[next_id] = f"u{u}0 u{u}1 u{u}2 u{u}3 u{u}4 u{u}5"
        fam_of[next_id] = ("uniq", u)
        next_id += 1

    ids = sorted(docs)
    rng.shuffle(ids)
    n_chunks = rng.randint(2, 4)
    chunks = [ids[i::n_chunks] for i in range(n_chunks)]

    store = ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=4)
    d = IncrementalDeduper(spark, store)
    all_dec = {}
    for chunk in chunks:
        batch = spark.createDataFrame(
            [(i, docs[i]) for i in chunk], "doc_id long, text string"
        )
        all_dec.update(_decisions(d.process_batch(batch)))

    assert set(all_dec) == set(docs)  # decision log partitions the corpus
    kept = {i for i, (s, _) in all_dec.items() if s == "kept"}
    # exactly one survivor per family (exact copies + near-dup families)
    by_family = {}
    for i in kept:
        by_family.setdefault(fam_of[i], []).append(i)
    for fam, members in by_family.items():
        assert len(members) == 1, (fam, members)
    assert len(by_family) == 6 + 1 + 4
    # every drop points at a kept doc of the same family
    for i, (status, keeper) in all_dec.items():
        if status != "kept":
            assert keeper in kept
            assert fam_of[keeper] == fam_of[i]


def test_pruned_state_read_carries_partition_filter(spark, tmp_path):
    """The lookup-side mirror of merge()'s touched-bucket pruning must
    show up in the physical plan: the state scan's PartitionFilters is
    a non-empty __bucket filter, so lookup I/O tracks the batch's hash
    buckets, not the state size."""
    store = ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=8)
    d = IncrementalDeduper(spark, store)
    d.process_batch(_df(spark, sorted(DOCS)))

    probe_keys = spark.createDataFrame(
        [("aaaa",), ("bbbb",)], "content_hash string"
    )
    pruned = d._pruned_read(
        "dedup_exact", "content_hash string, keep_id long",
        probe_keys, ["content_hash"],
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "__bucket" in ln
    ]
    assert scans, plan
    assert all("PartitionFilters: []" not in ln for ln in scans), "\n".join(scans)


def test_vector_deduper_cross_batch_and_restart(spark, sf_dir, tmp_path):
    """Embedding near-dups detected against state across batches; a
    reopened deduper resumes with the persisted hyperplanes; conflicting
    geometry fails loudly."""
    import pytest

    from southpaw_spark.streaming.dedup_stream import IncrementalVectorDeduper

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.where(F.col("vec_id") < 50)
    # near-identical copies of vectors 1 and 2 (cosine ≈ 1)
    copies = emb.where(F.col("vec_id").isin([1, 2])).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0001)).alias("embedding"),
    )

    path = str(tmp_path / "vst")
    d1 = IncrementalVectorDeduper(
        spark, ParquetStateStore(spark, path, n_buckets=4), threshold=0.999
    )
    b1 = {r["vec_id"]: r["status"] for r in d1.process_batch(base).collect()}
    assert b1[1] == "kept" and b1[2] == "kept"

    # reopen: planes come from the sidecar, state from the store
    d2 = IncrementalVectorDeduper(
        spark, ParquetStateStore(spark, path), threshold=0.999
    )
    b2 = {
        r["vec_id"]: (r["status"], r["keeper_id"])
        for r in d2.process_batch(copies).collect()
    }
    assert b2[1001] == ("near_dup", 1)
    assert b2[1002] == ("near_dup", 2)

    with pytest.raises(ValueError, match="geometry|persisted"):
        IncrementalVectorDeduper(
            spark, ParquetStateStore(spark, path), n_planes=5
        )


def test_vector_deduper_within_batch_cluster(spark, sf_dir, tmp_path):
    from southpaw_spark.streaming.dedup_stream import IncrementalVectorDeduper

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    one = emb.where(F.col("vec_id") == 7)
    batch = one.unionByName(
        one.select(
            (F.col("vec_id") + 100).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(1.0001)).alias(
                "embedding"
            ),
        )
    ).unionByName(emb.where(F.col("vec_id") == 8))
    d = IncrementalVectorDeduper(
        spark,
        ParquetStateStore(spark, str(tmp_path / "vst"), n_buckets=4),
        threshold=0.999,
    )
    out = {
        r["vec_id"]: (r["status"], r["keeper_id"])
        for r in d.process_batch(batch).collect()
    }
    assert out[7] == ("kept", 7)
    assert out[107] == ("near_dup", 7)
    assert out[8] == ("kept", 8)


def test_empty_batches_are_noops(spark, sf_dir, tmp_path):
    from southpaw_spark.streaming.dedup_stream import IncrementalVectorDeduper

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    d = IncrementalDeduper(
        spark, ParquetStateStore(spark, str(tmp_path / "t"), n_buckets=4)
    )
    assert d.process_batch(empty_docs).count() == 0
    assert not d.store.exists("dedup_exact")  # no empty state entities

    empty_vecs = spark.createDataFrame([], "vec_id long, embedding array<float>")
    vstore = ParquetStateStore(spark, str(tmp_path / "v"), n_buckets=4)
    vd = IncrementalVectorDeduper(spark, vstore)
    assert vd.process_batch(empty_vecs).count() == 0
    # geometry must NOT be pinned by an empty batch: the real first
    # batch still establishes the dimension
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).limit(20)
    out = vd.process_batch(emb)
    assert out.where("status = 'kept'").count() > 0


def test_replayed_batch_keeps_kept_set_stable(spark, tmp_path):
    """At-least-once replay: re-processing an already-committed batch
    re-reports its keepers as exact_dups of themselves — the kept-set
    contract (keeper_id == doc_id) is stable across replays."""
    store = ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=4)
    d = IncrementalDeduper(spark, store)
    first = _decisions(d.process_batch(_df(spark, [1, 2, 21])))
    replay = _decisions(d.process_batch(_df(spark, [1, 2, 21])))

    def kept_set(dec):
        return {i for i, (_, keeper) in dec.items() if keeper == i}

    assert kept_set(first) == kept_set(replay) == {1, 21}
    # and the dropped doc still points at the same keeper
    assert replay[2][1] == first[2][1] == 1


def test_best_quality_keeper_within_batch_and_retro_swap(spark, tmp_path):
    """fuzzy_keep='best_quality': a within-batch near-dup family keeps
    its highest-quality member (not the min id); dropped members point
    at it; and a LATER batch's higher-quality duplicate triggers a
    retroactive keeper SWAP — the new doc is kept and the dethroned
    keeper gets a re-emitted near_dup row (latest-decision-wins)."""
    store = ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=4)
    d = IncrementalDeduper(
        spark, store, fuzzy_keep="best_quality", score_col="q"
    )

    def scored(ids_scores):
        return spark.createDataFrame(
            [(i, DOCS[i], s) for i, s in ids_scores],
            "doc_id long, text string, q double",
        )

    # family P: doc 3 has the best score — min-id keeper would be 1
    dec = _decisions(d.process_batch(scored([(1, 0.2), (2, 0.5), (3, 0.9)])))
    assert dec[3] == ("kept", 3)
    assert dec[1] == ("near_dup", 3)
    assert dec[2] == ("near_dup", 3)
    # later batch: another P-family doc, even higher quality — SWAP:
    # the incoming doc is kept, the stored keeper is retroactively
    # re-emitted as a near_dup pointing at it
    later = spark.createDataFrame(
        [(4, _rep("p0 p1 p2", 13), 0.99)],
        "doc_id long, text string, q double",
    )
    dec2 = _decisions(d.process_batch(later))
    assert dec2[4] == ("kept", 4)
    assert dec2[3] == ("near_dup", 4)  # the retroactive row
    assert d.metrics["dedup.keeper_swaps"] == 1
    # live keeper state reflects the swap
    keepers = {
        r["rep_id"]: r["keeper_id"] for r in d.current_keepers().collect()
    }
    assert keepers[3] == 4
    assert set(r["doc_id"] for r in d.kept_ids().collect()) == {4}
    # a THIRD batch's weaker duplicate points at the live keeper, and
    # an exact copy of the dethroned doc resolves through the rep too
    b3 = spark.createDataFrame(
        [(5, _rep("p0 p1 p2", 11), 0.1), (6, DOCS[3], 0.0)],
        "doc_id long, text string, q double",
    )
    dec3 = _decisions(d.process_batch(b3))
    assert dec3[5] == ("near_dup", 4)
    assert dec3[6] == ("exact_dup", 4)
    d.close()


def test_best_quality_requires_score_column(spark, tmp_path):
    store = ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=4)
    d = IncrementalDeduper(spark, store, fuzzy_keep="best_quality")
    with pytest.raises(ValueError, match="quality_score"):
        # family docs WITHOUT a quality_score column -> loud error
        d.process_batch(_df(spark, [1, 2]))
    with pytest.raises(ValueError, match="fuzzy_keep"):
        IncrementalDeduper(spark, store, fuzzy_keep="bogus")
    d.close()


def test_vector_deduper_best_quality_keeper(spark, sf_dir, tmp_path):
    """Vector-modality best-quality keepers: a within-batch family of
    near-identical vectors keeps its highest-scoring member."""
    from southpaw_spark.streaming.dedup_stream import IncrementalVectorDeduper

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    fam = emb.where(F.col("vec_id") == 3)
    batch = (
        fam.select(F.lit(10).cast("long").alias("vec_id"), "embedding",
                   F.lit(0.1).alias("q"))
        .unionByName(
            fam.select(
                F.lit(11).cast("long").alias("vec_id"),
                F.transform("embedding", lambda x: x * F.lit(1.0001)).alias(
                    "embedding"
                ),
                F.lit(0.9).alias("q"),
            )
        )
        .unionByName(
            emb.where(F.col("vec_id") == 7).select(
                "vec_id", "embedding", F.lit(0.5).alias("q")
            )
        )
    )
    d = IncrementalVectorDeduper(
        spark,
        ParquetStateStore(spark, str(tmp_path / "vq"), n_buckets=4),
        threshold=0.999,
        fuzzy_keep="best_quality",
        score_col="q",
    )
    dec = {r["vec_id"]: (r["status"], r["keeper_id"])
           for r in d.process_batch(batch).collect()}
    assert dec[11] == ("kept", 11)       # higher quality wins
    assert dec[10] == ("near_dup", 11)   # min-id would have kept 10
    assert dec[7][0] == "kept"
    # round-9 cross-batch convergence: a LATER, higher-quality member of
    # the same vector family triggers a retroactive keeper swap
    later = fam.select(
        F.lit(12).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0002)).alias(
            "embedding"
        ),
        F.lit(0.95).alias("q"),
    )
    dec2 = {r["vec_id"]: (r["status"], r["keeper_id"])
            for r in d.process_batch(later).collect()}
    assert dec2[12] == ("kept", 12)
    assert dec2[11] == ("near_dup", 12)  # retroactive unkeep
    assert d.metrics["dedup.keeper_swaps"] == 1
    # and a weaker third-batch member points at the LIVE keeper
    b3 = fam.select(
        F.lit(13).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0003)).alias(
            "embedding"
        ),
        F.lit(0.2).alias("q"),
    )
    dec3 = {r["vec_id"]: (r["status"], r["keeper_id"])
            for r in d.process_batch(b3).collect()}
    assert dec3[13] == ("near_dup", 12)
    d.close()


def _spans_of(frame, id_col="doc_id"):
    return {
        r[id_col]: [(s["start"], s["end"]) for s in r["spans"]]
        for r in frame.collect()
    }


def test_span_deduper_chunking_parity_fuzz(spark, tmp_path):
    """Span evidence is monotone, so ANY batch partitioning of a corpus
    must converge to the batch d15 answer exactly — including
    retroactive flags for docs whose passage only became boilerplate
    after a later batch. Fuzz several chunkings of a corpus with
    planted copies, boilerplate, and self-repetition."""
    import random

    from southpaw_spark.operators.dedup import duplicate_spans
    from southpaw_spark.streaming.dedup_stream import IncrementalSpanDeduper

    rng = random.Random(63)
    vocab = [f"v{i}" for i in range(150)]
    boiler = " ".join(f"b{i}" for i in range(9))
    docs = []
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randrange(4, 25))]
        if rng.random() < 0.3:
            words = boiler.split() + words
        if docs and rng.random() < 0.3:
            src = docs[rng.randrange(len(docs))][1].split()
            lo = rng.randrange(max(1, len(src) - 8))
            words += src[lo: lo + rng.randrange(8, 13)]
        docs.append((i, " ".join(words)))
    df_all = spark.createDataFrame(docs, "doc_id long, text string")
    expected = _spans_of(
        duplicate_spans(df_all, "text", "doc_id", k=8, hash_grams=True)
    )

    for trial in range(2):
        shuffled = docs[:]
        rng.shuffle(shuffled)
        chunks, i = [], 0
        while i < len(shuffled):
            step = rng.randrange(3, 12)
            chunks.append(shuffled[i: i + step])
            i += step
        store = ParquetStateStore(
            spark, str(tmp_path / f"span{trial}"), n_buckets=4
        )
        d = IncrementalSpanDeduper(spark, store, k=8)
        last_update = {}
        for chunk in chunks:
            u = d.process_batch(
                spark.createDataFrame(chunk, "doc_id long, text string")
            )
            last_update.update(_spans_of(u))
        got = _spans_of(d.current_spans())
        d.close()
        assert got == expected, f"trial {trial}"
        # the final emission for every doc equals its final spans
        # (docs whose spans never changed after their last update)
        assert {
            i: s for i, s in last_update.items() if s
        } == expected, f"trial {trial} emissions"


def test_span_deduper_retro_flag_and_bounded_pending(spark, tmp_path):
    """A gram crossing min_count retroactively surfaces the EARLIER
    doc's span, and pending occurrence state stays < min_count per
    gram forever — a 10-doc boilerplate gram is a counter row with an
    empty pending list."""
    from southpaw_spark.streaming.dedup_stream import (
        IncrementalSpanDeduper,
        _SPAN_GRAMS,
    )

    boiler = " ".join(f"c{i}" for i in range(8))
    store = ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=4)
    d = IncrementalSpanDeduper(spark, store, k=8, min_count=3)
    u1 = d.process_batch(spark.createDataFrame(
        [(1, boiler + " tail one here")], "doc_id long, text string"
    ))
    assert u1.count() == 0  # count 1 < 3: nothing flagged yet
    u2 = d.process_batch(spark.createDataFrame(
        [(2, "pre " + boiler)], "doc_id long, text string"
    ))
    assert u2.count() == 0  # count 2 < 3: still pending
    u3 = _spans_of(d.process_batch(spark.createDataFrame(
        [(3, boiler + " zz yy xx ww")] + [
            (10 + i, boiler + f" extra{i} word{i} more{i}")
            for i in range(7)
        ],
        "doc_id long, text string",
    )))
    # crossing flags the new docs AND retro-flags docs 1 and 2
    assert u3[1] == [(0, 8)] and u3[2] == [(1, 9)] and u3[3] == [(0, 8)]
    state = store.read(_SPAN_GRAMS).collect()
    boiler_rows = [r for r in state if r["count"] >= 3]
    assert boiler_rows, "hot gram must persist a counter row"
    for r in state:
        assert len(r["pending"]) < 3  # bounded forever
        if r["count"] >= 3:
            assert r["pending"] == []  # cleared at the crossing
    d.close()


def test_span_deduper_restart_and_geometry_guard(spark, tmp_path):
    """Reopening on the committed store resumes (cross-restart retro
    flag works); conflicting k/min_count fail loudly; bad params
    raise."""
    from southpaw_spark.streaming.dedup_stream import IncrementalSpanDeduper

    path = str(tmp_path / "st")
    d1 = IncrementalSpanDeduper(
        spark, ParquetStateStore(spark, path, n_buckets=4), k=8
    )
    d1.process_batch(spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    ))
    d1.close()
    d2 = IncrementalSpanDeduper(spark, ParquetStateStore(spark, path))
    u = _spans_of(d2.process_batch(spark.createDataFrame(
        [(2, "x a b c d e f g h y")], "doc_id long, text string"
    )))
    d2.close()
    assert u[1] == [(0, 8)] and u[2] == [(1, 9)]  # retro across restart
    with pytest.raises(ValueError, match="k=8"):
        IncrementalSpanDeduper(spark, ParquetStateStore(spark, path), k=5)
    with pytest.raises(ValueError, match="min_count=2"):
        IncrementalSpanDeduper(
            spark, ParquetStateStore(spark, path), k=8, min_count=4
        )
    with pytest.raises(ValueError, match="min_count must be"):
        IncrementalSpanDeduper(
            spark, ParquetStateStore(spark, str(tmp_path / "x")),
            min_count=1,
        )
    # empty batch (all docs shorter than k) is a clean no-op
    d3 = IncrementalSpanDeduper(spark, ParquetStateStore(spark, path))
    assert d3.process_batch(spark.createDataFrame(
        [(9, "too short")], "doc_id long, text string"
    )).count() == 0
    d3.close()


def test_attach_span_deduper_file_source(spark, tmp_path):
    """attach_dedup_stream is protocol-generic: the span deduper rides
    the same foreachBatch wiring, and a later file micro-batch
    retro-surfaces the earlier batch's doc through the sink."""
    import json
    import time

    from southpaw_spark.streaming.dedup_stream import (
        IncrementalSpanDeduper,
        attach_dedup_stream,
    )

    store = ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=4)
    d = IncrementalSpanDeduper(spark, store, k=8)

    src = tmp_path / "docs_in"
    src.mkdir()
    results: dict = {}

    def sink(updates, batch_id):
        for r in updates.collect():
            results[r["doc_id"]] = [
                (s["start"], s["end"]) for s in r["spans"]
            ]

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    query = attach_dedup_stream(
        d, stream, checkpoint_dir=str(tmp_path / "ckpt"), sink=sink
    )
    try:
        (src / "a.json").write_text(json.dumps(
            {"doc_id": 1, "text": "a b c d e f g h i j"}
        ))
        (src / "b.json").write_text(json.dumps(
            {"doc_id": 2, "text": "x a b c d e f g h y z"}
        ))
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            query.processAllAvailable()
            if 2 in results:
                break
            time.sleep(1)
    finally:
        query.stop()
        d.close()

    assert results[1] == [(0, 8)]  # retro-flagged by batch b
    assert results[2] == [(1, 9)]


@pytest.mark.parametrize("swap_cap", [100_000, 0])
def test_best_quality_chunking_parity_fuzz(spark, tmp_path, swap_cap):
    """Shuffled-chunking fuzz pinning stream ≡ batch keeper SELECTION
    under fuzzy_keep='best_quality' (the round-9 convergence contract):
    for ANY batch partitioning of a corpus of mutually-similar families
    with distinct texts, the latest-decision-wins kept set equals the
    batch cluster_keepers quality argmax per family — retroactive
    keeper swaps make the stream converge however the docs arrive.
    (Exact-copy survival stays first-seen-wins — the documented exact-
    stage greedy — so the exact group asserts one-survivor only.)
    Parametrized over swap_driver_cap so BOTH keeper-swap arms — the
    bounded driver fast path (default) and the distributed plan
    (cap=0) — are pinned to the same batch expectation."""
    import random

    rng = random.Random(90914)
    docs, score, fam_of = {}, {}, {}
    nid = 1
    for fam in range(5):
        words = f"g{fam}a g{fam}b g{fam}c"
        for m in range(rng.randint(2, 4)):
            docs[nid] = _rep(words, 8 + m)  # distinct texts, same shingles
            score[nid] = round(rng.random(), 3)
            fam_of[nid] = ("fam", fam)
            nid += 1
    exact_ids = []
    for _ in range(3):  # exact copies; later ids carry HIGHER scores
        docs[nid] = "e0 e1 e2 e3 e4 e5 e6"
        score[nid] = 0.3 + 0.1 * len(exact_ids)
        fam_of[nid] = ("exact", 0)
        exact_ids.append(nid)
        nid += 1
    for u in range(3):
        docs[nid] = f"u{u}0 u{u}1 u{u}2 u{u}3 u{u}4 u{u}5"
        score[nid] = round(rng.random(), 3)
        fam_of[nid] = ("uniq", u)
        nid += 1

    # batch-path expectation for the distinct-text families: keeper =
    # quality argmax (ties -> min id) over the WHOLE family
    by_fam: dict = {}
    for i in sorted(docs):
        if fam_of[i][0] != "exact":
            by_fam.setdefault(fam_of[i], []).append(i)
    expected_fuzzy_kept = {
        min(members, key=lambda i: (-score[i], i))
        for members in by_fam.values()
    }

    for trial in range(3):
        trng = random.Random(1000 + trial)
        ids = sorted(docs)
        trng.shuffle(ids)
        n_chunks = trng.randint(2, 5)
        chunks = [c for c in (ids[i::n_chunks] for i in range(n_chunks)) if c]
        store = ParquetStateStore(
            spark, str(tmp_path / f"st{trial}"), n_buckets=4
        )
        d = IncrementalDeduper(
            spark, store, fuzzy_keep="best_quality", score_col="q",
            swap_driver_cap=swap_cap,
        )
        latest: dict = {}
        for chunk in chunks:
            batch = spark.createDataFrame(
                [(i, docs[i], score[i]) for i in chunk],
                "doc_id long, text string, q double",
            )
            latest.update(_decisions(d.process_batch(batch)))
        kept = {i for i, (_, keeper) in latest.items() if keeper == i}
        kept_exact = kept & set(exact_ids)
        assert len(kept_exact) == 1, (trial, kept_exact)
        assert kept - kept_exact == expected_fuzzy_kept, (trial, chunks)
        # live state agrees with the folded decision log
        assert set(
            r["doc_id"] for r in d.kept_ids().collect()
        ) == kept, trial
        # every dropped doc's family has its keeper kept
        for i, (status, keeper) in latest.items():
            if keeper != i:
                assert fam_of[keeper] == fam_of[i], (i, keeper)
        d.close()


def test_line_deduper_stream_equals_batch_any_chunking(spark, tmp_path):
    """Streaming d22 (IncrementalLineDeduper): cumulative line flags
    after ANY ordered chunking equal the batch remove_duplicate_lines
    output on the whole corpus — including retroactive flags for docs
    whose boilerplate line's second copy arrives in a LATER batch —
    and cut_lines applies the updates to the exact batch contract."""
    import random

    from southpaw_spark.operators.dedup import (
        cut_lines,
        remove_duplicate_lines,
    )
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalLineDeduper

    rng = random.Random(11)
    boilers = ["cookie banner line", "subscribe footer", "nav | home"]
    docs = []
    for i in range(24):
        lines = [f"unique opener {i} words here"]
        if i % 2 == 0:
            lines.append(boilers[i % 3])
        if i % 6 == 0:
            lines.append("")  # empty lines never flag
        lines.append(f"body text {i} tail")
        docs.append((i, "\n".join(lines)))
    docs.append((100, boilers[0]))          # whole doc = boilerplate
    full = spark.createDataFrame(docs, "doc_id long, text string")
    want = {
        r["doc_id"]: (r["text_clean"], r["n_lines_after"])
        for r in remove_duplicate_lines(full, "text", "doc_id").collect()
    }

    for trial in range(2):
        order = docs[:]  # ids ascending within chunks, random cuts
        cuts = sorted(rng.sample(range(1, len(order)), 3))
        chunks = [
            order[a:b]
            for a, b in zip([0] + cuts, cuts + [len(order)])
        ]
        led = IncrementalLineDeduper(
            spark,
            ParquetStateStore(
                spark, str(tmp_path / f"st{trial}"), n_buckets=4
            ),
        )
        saw_update = False
        for ch in chunks:
            ub = led.process_batch(
                spark.createDataFrame(ch, "doc_id long, text string")
            )
            saw_update = saw_update or ub.count() > 0
        got = {
            r["doc_id"]: (r["text_clean"], r["n_lines_after"])
            for r in cut_lines(
                full, led.current_spans(), "text", "doc_id"
            ).collect()
        }
        led.close()
        assert saw_update
        assert got == want, trial


def test_line_deduper_retroactive_update(spark, tmp_path):
    """A doc whose boilerplate line arrives alone in batch 1 is
    re-emitted when the second copy lands in batch 2, with its full
    line spans; docs with no duplicated line never appear."""
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalLineDeduper

    led = IncrementalLineDeduper(
        spark, ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=4)
    )
    u1 = led.process_batch(spark.createDataFrame(
        [(1, "keep\ncookie banner\nmore")], "doc_id long, text string"
    ))
    assert u1.count() == 0
    u2 = {
        r["doc_id"]: [(s["start"], s["end"]) for s in r["spans"]]
        for r in led.process_batch(spark.createDataFrame(
            [(2, "cookie banner\nfresh"), (3, "all clean here")],
            "doc_id long, text string",
        )).collect()
    }
    led.close()
    assert u2 == {1: [(1, 2)], 2: [(0, 1)]}   # retro + new, not doc 3


def test_attach_line_deduper_file_source(spark, tmp_path):
    """attach_dedup_stream rides the line deduper unchanged: a later
    file micro-batch retro-surfaces the earlier batch's doc with its
    duplicated-LINE spans through the sink."""
    import json
    import time

    from southpaw_spark.streaming.dedup_stream import (
        IncrementalLineDeduper,
        attach_dedup_stream,
    )

    store = ParquetStateStore(spark, str(tmp_path / "st"), n_buckets=4)
    d = IncrementalLineDeduper(spark, store)

    src = tmp_path / "docs_in"
    src.mkdir()
    results: dict = {}

    def sink(updates, batch_id):
        for r in updates.collect():
            results[r["doc_id"]] = [
                (s["start"], s["end"]) for s in r["spans"]
            ]

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    query = attach_dedup_stream(
        d, stream, checkpoint_dir=str(tmp_path / "ckpt"), sink=sink
    )
    try:
        (src / "a.json").write_text(json.dumps(
            {"doc_id": 1, "text": "keep\ncookie banner\nmore"}
        ))
        (src / "b.json").write_text(json.dumps(
            {"doc_id": 2, "text": "cookie banner\nfresh stuff"}
        ))
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            query.processAllAvailable()
            if 2 in results:
                break
            time.sleep(1)
    finally:
        query.stop()
        d.close()

    assert results[1] == [(1, 2)]  # retro-flagged by batch b
    assert results[2] == [(0, 1)]


def test_span_deduper_batch_id_replay_guard(spark, tmp_path):
    """Round 14: gram counts double on a re-sent doc, so foreachBatch's
    at-least-once replay could cross min_count spuriously. With
    batch_id armed, a replayed id is skipped (state unchanged, empty
    updates); the next id proceeds; the LINE deduper inherits it."""
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import (
        IncrementalLineDeduper,
        IncrementalSpanDeduper,
    )

    passage = "one two three four five six seven eight"
    d = IncrementalSpanDeduper(
        spark,
        ParquetStateStore(spark, str(tmp_path / "span"), n_buckets=4),
        k=8, min_count=2,
    )
    b1 = spark.createDataFrame(
        [(1, f"alpha beta {passage} gamma")], "doc_id long, text string"
    )
    assert d.process_batch(b1, batch_id=0).count() == 0
    # replay of batch 0 with the same doc: WITHOUT the guard the
    # passage would double-count to min_count and flag itself
    assert d.process_batch(b1, batch_id=0).count() == 0
    assert d.current_spans().count() == 0  # no spurious crossing
    # the real second copy (next batch id) triggers the retro flag
    b2 = spark.createDataFrame(
        [(2, f"omega psi {passage} chi")], "doc_id long, text string"
    )
    upd = d.process_batch(b2, batch_id=1)
    assert sorted(r["doc_id"] for r in upd.collect()) == [1, 2]
    d.close()

    line = IncrementalLineDeduper(
        spark,
        ParquetStateStore(spark, str(tmp_path / "line"), n_buckets=4),
        min_count=2,
    )
    lb = spark.createDataFrame(
        [(1, "shared line\nunique a")], "doc_id long, text string"
    )
    line.process_batch(lb, batch_id=0)
    line.process_batch(lb, batch_id=0)  # replay skipped
    assert line.current_spans().count() == 0
    line.process_batch(
        spark.createDataFrame(
            [(2, "shared line\nunique b")], "doc_id long, text string"
        ),
        batch_id=1,
    )
    assert sorted(
        r["doc_id"] for r in line.current_spans().collect()
    ) == [1, 2]
    line.close()
