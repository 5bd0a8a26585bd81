"""Round 15: the persistent ANN index family off POSIX + the vacuum
vs live-stream race + retrain.

1. Object-store seam (VERDICT r14 item 1): `operators/ann_index.py`
   was the last POSIX-bound durable artifact — sidecars, staging
   enumeration, and vacuum swaps went through `os`/`shutil`/`open()`.
   They now route through `streaming/fsio.py` exactly as the state
   store does, so the full index lifecycle (build / query /
   incremental add / streaming ingest / tombstone / vacuum, all three
   arms) runs on a ``scheme://`` root — exercised here with ``file://``
   (Hadoop LocalFileSystem), the same code path ``s3a://``/``gs://``
   take on a real cluster.

2. Concurrent-ingest vacuum (VERDICT r14 item 2): the vacuums fold
   and delete EXACTLY the staging batch dirs / tombstone files
   enumerated at scan time — a batch committed mid-vacuum by a live
   ``attach_*_index_stream`` survives staged and still answers
   queries (the old whole-tree ``rmtree(_STREAM)`` silently destroyed
   it while the stream checkpoint recorded it processed).

3. Retrain (VERDICT r14 item 5): ``retrain_pq_index`` /
   ``retrain_ivf_index`` act on the drift guards' ``retrain_
   recommended`` flag — re-train the quantizer on current survivors,
   re-encode, atomic swap, reset the drift baseline.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from southpaw_spark.operators import ann_index as ai
from southpaw_spark.operators.ann_index import (
    add_to_ann_index,
    add_to_pq_index,
    attach_index_stream,
    attach_ivf_index_stream,
    attach_pq_index_stream,
    build_ann_index,
    build_ivf_index,
    build_pq_index,
    index_tombstone_decisions_sink,
    ivf_index_drift,
    ivf_index_sink,
    pq_index_drift,
    query_ann_index,
    query_ivf_index,
    query_pq_index,
    remove_from_index,
    retrain_ivf_index,
    retrain_pq_index,
    vacuum_ann_index,
    vacuum_ivf_index,
    vacuum_pq_index,
)


def _vec(i, dim=8):
    return [((i * 37 + j * 11) % 101 - 50) / 50.0 for j in range(dim)]


def _corpus(spark, n=60):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def _queries(corpus):
    return corpus.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def _rows(df):
    out = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in df.collect()
    )
    # duplicate candidates would surface as the same neighbor at two
    # ranks for one query — assert the invariant everywhere we compare
    assert len({(q, n) for q, n, _, _ in out}) == len(out)
    return out


# ---------------------------------------------------------------------------
# 1. lifecycle matrix on a scheme:// root (mirrors test_state_fsio.py)
# ---------------------------------------------------------------------------


def test_lsh_index_lifecycle_on_scheme_root(spark, tmp_path):
    corpus = _corpus(spark)
    part_a = corpus.where(F.col("vec_id") % 3 == 0)
    part_b = corpus.where(F.col("vec_id") % 3 == 1)
    part_c = corpus.where(F.col("vec_id") % 3 == 2)
    queries = _queries(corpus)
    dead_id = 57  # % 3 == 0 → lives in A, tombstoned via the stream

    live = f"file://{tmp_path}/live"  # Hadoop arm
    twin = str(tmp_path / "twin")     # POSIX arm, same operations
    for d, a in ((live, part_a), (twin, part_a)):
        build_ann_index(a, d, "embedding", "vec_id", n_planes=6, seed=42)
        add_to_ann_index(part_b, d, "embedding", "vec_id")

    # streaming ingest with a tombstone, onto the scheme root
    src = str(tmp_path / "src")
    part_c.withColumn("is_tombstone", F.lit(False)).unionByName(
        corpus.where(F.col("vec_id") == dead_id).withColumn(
            "is_tombstone", F.lit(True)
        )
    ).write.parquet(src)
    q = attach_index_stream(
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(src),
        live, "embedding", "vec_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        tombstone_col="is_tombstone",
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    # twin gets the same rows through the batch paths
    add_to_ann_index(part_c, twin, "embedding", "vec_id")
    remove_from_index(
        corpus.where(F.col("vec_id") == dead_id).select("vec_id"),
        twin, "vec_id",
    )

    want = _rows(query_ann_index(spark, twin, queries, k=5))
    got = _rows(query_ann_index(spark, live, queries, k=5))
    assert got == want and want
    assert all(n != dead_id for _, n, _, _ in got)

    # vacuum on the scheme root: folds staging + tombstones via the
    # Hadoop rename/delete primitives; answers unchanged
    assert vacuum_ann_index(spark, live) == 1
    fs = ai._index_fs(live, spark)
    assert not fs.isdir(f"{live}/_stream")
    assert not fs.isdir(f"{live}/_deleted")
    assert _rows(query_ann_index(spark, live, queries, k=5)) == want


def test_pq_index_lifecycle_on_scheme_root(spark, tmp_path):
    corpus = _corpus(spark)
    part_a = corpus.where(F.col("vec_id") % 2 == 0)
    part_b = corpus.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 31))
    part_c = corpus.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") > 31))
    queries = _queries(corpus)
    dead_id = 58

    live = f"file://{tmp_path}/live"
    twin = str(tmp_path / "twin")
    build_pq_index(part_a, live, "embedding", "vec_id",
                   m_subspaces=4, n_codes=8)
    codebooks = spark.read.parquet(f"file://{tmp_path}/live/codebooks")
    build_pq_index(part_a, twin, "embedding", "vec_id",
                   m_subspaces=4, n_codes=8, codebooks=codebooks)
    for d in (live, twin):
        add_to_pq_index(part_b, d, "embedding", "vec_id")

    src = str(tmp_path / "src")
    part_c.withColumn("is_tombstone", F.lit(False)).unionByName(
        corpus.where(F.col("vec_id") == dead_id).withColumn(
            "is_tombstone", F.lit(True)
        )
    ).write.parquet(src)
    q = attach_pq_index_stream(
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(src),
        live, "embedding", "vec_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        tombstone_col="is_tombstone",
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    add_to_pq_index(part_c, twin, "embedding", "vec_id")
    remove_from_index(
        corpus.where(F.col("vec_id") == dead_id).select("vec_id"),
        twin, "vec_id",
    )

    def rows(d):
        return _rows(query_pq_index(
            spark, d, corpus, queries, "embedding", "vec_id", k=5
        ))

    want = rows(twin)
    assert rows(live) == want and want
    # drift sidecar landed on the scheme root
    drift = pq_index_drift(live)
    assert drift["batches"] and drift["retrain_recommended"] is False
    assert vacuum_pq_index(spark, live) == 1
    fs = ai._index_fs(live, spark)
    assert not fs.isdir(f"{live}/_stream")
    assert not fs.isdir(f"{live}/_deleted")
    assert rows(live) == want


def test_ivf_index_lifecycle_on_scheme_root(spark, tmp_path):
    corpus = _corpus(spark)
    part_a = corpus.where(F.col("vec_id") % 2 == 0)
    part_b = corpus.where(F.col("vec_id") % 2 == 1)
    queries = _queries(corpus)
    dead_id = 58

    live = f"file://{tmp_path}/live"
    twin = str(tmp_path / "twin")
    build_ivf_index(part_a, live, "embedding", "vec_id",
                    n_cells=4, seed=42)
    centroids = spark.read.parquet(f"file://{tmp_path}/live/centroids")
    build_ivf_index(part_a, twin, "embedding", "vec_id",
                    centroids=centroids)

    src = str(tmp_path / "src")
    part_b.withColumn("is_tombstone", F.lit(False)).unionByName(
        corpus.where(F.col("vec_id") == dead_id).withColumn(
            "is_tombstone", F.lit(True)
        )
    ).write.parquet(src)
    q = attach_ivf_index_stream(
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(src),
        live, "embedding", "vec_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        tombstone_col="is_tombstone",
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    # twin: same survivors folded at build time with the same quantizer
    twin2 = str(tmp_path / "twin2")
    build_ivf_index(
        corpus.where(F.col("vec_id") != dead_id), twin2,
        "embedding", "vec_id", centroids=centroids,
    )

    def rows(d):
        return _rows(query_ivf_index(spark, d, queries, k=5, n_probe=4))

    want = rows(twin2)
    assert rows(live) == want and want
    assert ivf_index_drift(live)["batches"]
    assert vacuum_ivf_index(spark, live) == 1
    fs = ai._index_fs(live, spark)
    assert not fs.isdir(f"{live}/_stream")
    assert not fs.isdir(f"{live}/_deleted")
    assert rows(live) == want


# ---------------------------------------------------------------------------
# 2. vacuum vs live streaming-ingest: the mid-vacuum batch survives
# ---------------------------------------------------------------------------


def _stage_lsh_batch(spark, index_dir, rows_df, batch_id):
    """Write a staged batch exactly as attach_index_stream's
    foreachBatch does — simulating a live stream commit."""
    meta = ai._read_json(
        ai._index_fs(index_dir, spark), os.path.join(index_dir, ai._META)
    )
    bits = ai._bucket_bits(F.col("embedding"), meta["planes"])
    rows_df.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        ai._bucket_str(bits).alias("bucket"),
        F.concat(
            F.lit("p"), ai._bucket_str(bits[: meta["prefix_bits"]])
        ).alias("bprefix"),
    ).write.partitionBy("bprefix").mode("overwrite").parquet(
        os.path.join(index_dir, ai._STREAM, f"batch={batch_id}")
    )


def test_lsh_vacuum_concurrent_staged_batch_survives(
    spark, tmp_path, monkeypatch
):
    """A staging batch committed BETWEEN the vacuum's scan and its
    cleanup (injected at the swap, the narrowest interposition point)
    is neither folded nor destroyed: it stays staged, answers queries
    immediately, and the NEXT vacuum folds it — the data-loss window
    VERDICT r14 flagged is closed."""
    corpus = _corpus(spark)
    early = corpus.where(F.col("vec_id") < 40)
    late = corpus.where(F.col("vec_id") >= 40)
    queries = _queries(corpus)

    live = str(tmp_path / "live")
    build_ann_index(
        corpus.where(F.col("vec_id") < 20), live,
        "embedding", "vec_id", n_planes=6, seed=42,
    )
    _stage_lsh_batch(spark, live, early.where(F.col("vec_id") >= 20), 0)
    remove_from_index(
        corpus.where(F.col("vec_id") == 0).select("vec_id"), live, "vec_id"
    )

    real_swap = ai._swap_data_dir
    injected = {"done": False}

    def swap_with_concurrent_commit(fs, live_dir, tmp_dir):
        if not injected["done"]:
            injected["done"] = True
            _stage_lsh_batch(spark, live, late, 1)  # the mid-vacuum commit
        return real_swap(fs, live_dir, tmp_dir)

    monkeypatch.setattr(ai, "_swap_data_dir", swap_with_concurrent_commit)
    assert vacuum_ann_index(spark, live) == 1
    monkeypatch.setattr(ai, "_swap_data_dir", real_swap)

    # the mid-vacuum batch survived staged …
    assert os.path.isdir(os.path.join(live, "_stream", "batch=1"))
    assert not os.path.isdir(os.path.join(live, "_stream", "batch=0"))
    # … and answers queries right now
    got = _rows(query_ann_index(spark, live, queries, k=5))
    truth = str(tmp_path / "truth")
    build_ann_index(
        corpus.where(F.col("vec_id") != 0), truth,
        "embedding", "vec_id", n_planes=6, seed=42,
    )
    want = _rows(query_ann_index(spark, truth, queries, k=5))
    assert got == want and any(n >= 40 for _, n, _, _ in got)

    # the next vacuum folds it; answers unchanged, no duplicates
    assert vacuum_ann_index(spark, live) == 0
    assert not os.path.isdir(os.path.join(live, "_stream"))
    assert _rows(query_ann_index(spark, live, queries, k=5)) == want


def test_ivf_vacuum_concurrent_staged_batch_survives(
    spark, tmp_path, monkeypatch
):
    corpus = _corpus(spark)
    queries = _queries(corpus)
    live = str(tmp_path / "live")
    build_ivf_index(
        corpus.where(F.col("vec_id") < 30), live,
        "embedding", "vec_id", n_cells=4, seed=42,
    )
    centroids = spark.read.parquet(os.path.join(live, "centroids"))

    def stage(rows_df, batch_id):
        ai._ivf_assign(rows_df, "embedding", "vec_id", centroids).write \
            .partitionBy("cell").mode("overwrite").parquet(
                os.path.join(live, ai._STREAM, f"batch={batch_id}")
            )

    stage(corpus.where(F.col("vec_id").between(30, 44)), 0)
    remove_from_index(
        corpus.where(F.col("vec_id") == 2).select("vec_id"), live, "vec_id"
    )

    real_swap = ai._swap_data_dir
    injected = {"done": False}

    def swap_with_commit(fs, live_dir, tmp_dir):
        if not injected["done"]:
            injected["done"] = True
            stage(corpus.where(F.col("vec_id") >= 45), 1)
        return real_swap(fs, live_dir, tmp_dir)

    monkeypatch.setattr(ai, "_swap_data_dir", swap_with_commit)
    assert vacuum_ivf_index(spark, live) == 1
    monkeypatch.setattr(ai, "_swap_data_dir", real_swap)

    assert os.path.isdir(os.path.join(live, "_stream", "batch=1"))
    truth = str(tmp_path / "truth")
    build_ivf_index(
        corpus.where(F.col("vec_id") != 2), truth,
        "embedding", "vec_id", centroids=centroids,
    )
    want = _rows(query_ivf_index(spark, truth, queries, k=5, n_probe=4))
    assert _rows(query_ivf_index(spark, live, queries, k=5, n_probe=4)) \
        == want
    assert vacuum_ivf_index(spark, live) == 0
    assert _rows(query_ivf_index(spark, live, queries, k=5, n_probe=4)) \
        == want


def test_mid_vacuum_tombstone_survives(spark, tmp_path, monkeypatch):
    """Same snapshot rule for the tombstone side: a delete committed
    mid-vacuum keeps masking its id afterwards (the old rmtree of
    ``_deleted`` silently resurrected it)."""
    corpus = _corpus(spark)
    queries = _queries(corpus)
    live = str(tmp_path / "live")
    build_ann_index(corpus, live, "embedding", "vec_id",
                    n_planes=6, seed=42)
    remove_from_index(
        corpus.where(F.col("vec_id") == 10).select("vec_id"), live, "vec_id"
    )

    real_swap = ai._swap_data_dir
    injected = {"done": False}

    def swap_with_tombstone(fs, live_dir, tmp_dir):
        if not injected["done"]:
            injected["done"] = True
            remove_from_index(
                corpus.where(F.col("vec_id") == 11).select("vec_id"),
                live, "vec_id",
            )
        return real_swap(fs, live_dir, tmp_dir)

    monkeypatch.setattr(ai, "_swap_data_dir", swap_with_tombstone)
    assert vacuum_ann_index(spark, live) == 1  # only the scanned one
    monkeypatch.setattr(ai, "_swap_data_dir", real_swap)

    # the late tombstone survived and still masks id 11
    assert os.path.isdir(os.path.join(live, "_deleted"))
    got = _rows(query_ann_index(spark, live, queries, k=50))
    assert all(n != 10 and n != 11 for _, n, _, _ in got)
    # the next vacuum folds it for real
    assert vacuum_ann_index(spark, live) == 1
    assert not os.path.isdir(os.path.join(live, "_deleted"))
    got = _rows(query_ann_index(spark, live, queries, k=50))
    assert all(n != 10 and n != 11 for _, n, _, _ in got)


def test_legacy_root_layout_reads_and_migrates(spark, tmp_path):
    """Pre-round-15 LSH indexes kept their bprefix partitions at the
    index root. They stay readable, and the first vacuum migrates them
    into ``data/`` (the swap-one-subdir layout)."""
    corpus = _corpus(spark)
    queries = _queries(corpus)
    legacy = str(tmp_path / "legacy")
    build_ann_index(corpus, legacy, "embedding", "vec_id",
                    n_planes=6, seed=42)
    # reshape to the legacy layout: partitions at the root
    data = os.path.join(legacy, "data")
    for name in os.listdir(data):
        os.rename(os.path.join(data, name), os.path.join(legacy, name))
    os.rmdir(data)

    want = _rows(query_ann_index(spark, legacy, queries, k=5))
    assert want  # legacy layout answers

    add_to_ann_index(  # appends land in the legacy layout
        corpus.select(
            (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
        ).where(F.col("vec_id") == 1000),
        legacy, "embedding", "vec_id",
    )
    remove_from_index(
        corpus.where(F.col("vec_id") == 3).select("vec_id"), legacy, "vec_id"
    )
    assert vacuum_ann_index(spark, legacy) == 1  # migrates
    assert os.path.isdir(data)
    assert not any(n.startswith("bprefix=") for n in os.listdir(legacy))
    got = _rows(query_ann_index(spark, legacy, queries, k=50))
    assert all(n != 3 for _, n, _, _ in got)
    assert any(n == 1000 for _, n, _, _ in got)


# ---------------------------------------------------------------------------
# 3. retrain — acting on the drift flag
# ---------------------------------------------------------------------------


def test_retrain_ivf_index_parity_and_drift_reset(spark, tmp_path):
    corpus = _corpus(spark)
    live = str(tmp_path / "live")
    build_ivf_index(
        corpus.where(F.col("vec_id") < 40), live,
        "embedding", "vec_id", n_cells=4, seed=42,
    )
    # shifted distribution arrives via the stream → drift flag trips
    shifted = corpus.where(F.col("vec_id") >= 40).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 100.0).alias("embedding"),
    )
    src = str(tmp_path / "src")
    shifted.write.parquet(src)
    q = attach_ivf_index_stream(
        spark.readStream.schema(shifted.schema).parquet(src),
        live, "embedding", "vec_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    remove_from_index(
        corpus.where(F.col("vec_id") == 5).select("vec_id"), live, "vec_id"
    )
    assert ivf_index_drift(live)["retrain_recommended"] is True

    meta = retrain_ivf_index(spark, live, n_cells=4, seed=42)
    # drift guard reset: new baseline, empty batch ledger, flag down
    drift = ivf_index_drift(live)
    assert drift["retrain_recommended"] is False and not drift["batches"]
    assert meta["baseline_residual"] >= 0.0
    # staging + tombstones were folded
    assert not os.path.isdir(os.path.join(live, "_stream"))
    assert not os.path.isdir(os.path.join(live, "_deleted"))

    # parity: retrained ≡ fresh build on the survivors with the
    # retrained quantizer (training itself IS the fresh-build code
    # path; this pins assignment, encode, swap, and cleanup)
    survivors = corpus.where(
        (F.col("vec_id") < 40) & (F.col("vec_id") != 5)
    ).unionByName(shifted)
    truth = str(tmp_path / "truth")
    build_ivf_index(
        survivors, truth, "embedding", "vec_id",
        centroids=spark.read.parquet(os.path.join(live, "centroids")),
    )
    queries = _queries(corpus)
    want = _rows(query_ivf_index(spark, truth, queries, k=5, n_probe=4))
    assert _rows(query_ivf_index(spark, live, queries, k=5, n_probe=4)) \
        == want and want


def test_retrain_pq_index_parity_and_drift_reset(spark, tmp_path):
    base = _corpus(spark)
    shifted = base.where(F.col("vec_id") >= 40).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 100.0).alias("embedding"),
    )
    corpus = base.where(F.col("vec_id") < 40).unionByName(shifted)

    live = str(tmp_path / "live")
    build_pq_index(
        base.where(F.col("vec_id") < 40), live, "embedding", "vec_id",
        m_subspaces=4, n_codes=8,
    )
    src = str(tmp_path / "src")
    shifted.write.parquet(src)
    q = attach_pq_index_stream(
        spark.readStream.schema(shifted.schema).parquet(src),
        live, "embedding", "vec_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    remove_from_index(
        base.where(F.col("vec_id") == 5).select("vec_id"), live, "vec_id"
    )
    assert pq_index_drift(live)["retrain_recommended"] is True

    meta = retrain_pq_index(spark, live, corpus, "embedding", "vec_id")
    assert meta["m_subspaces"] == 4 and meta["n_codes"] == 8  # live geometry
    drift = pq_index_drift(live)
    assert drift["retrain_recommended"] is False and not drift["batches"]
    assert not os.path.isdir(os.path.join(live, "_stream"))
    assert not os.path.isdir(os.path.join(live, "_deleted"))

    survivors = corpus.where(F.col("vec_id") != 5)
    truth = str(tmp_path / "truth")
    build_pq_index(
        survivors, truth, "embedding", "vec_id",
        m_subspaces=4, n_codes=8,
        codebooks=spark.read.parquet(os.path.join(live, "codebooks")),
    )
    queries = _queries(base)
    want = _rows(query_pq_index(
        spark, truth, corpus, queries, "embedding", "vec_id", k=5
    ))
    got = _rows(query_pq_index(
        spark, live, corpus, queries, "embedding", "vec_id", k=5
    ))
    assert got == want and want


# ---------------------------------------------------------------------------
# 4. corpus_stream → persistent IVF index, one run (VERDICT r14 item 7)
# ---------------------------------------------------------------------------


def test_corpus_stream_feeds_ivf_index_with_tombstones(spark, tmp_path):
    """End-to-end: the streaming corpus pipeline's KEPT embeddings feed
    a built IVF index's streaming staging (`ivf_index_sink`) while the
    dedup DECISIONS route drops to index tombstones
    (`index_tombstone_decisions_sink`) — including a retroactive
    best-quality keeper swap: the earlier keeper was already indexed
    when a later, better near-duplicate arrives, and it stops
    answering similarity queries in the same run. Final index ≡ batch
    build_corpus + build_ivf_index on the kept set."""
    import json as _json

    from southpaw_spark.pipelines import build_corpus, corpus_stream
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalDeduper

    base = ("the quick brown fox jumps over the lazy dog and then it "
            "runs to the old mill by the river where children play "
            "games all day long").split()
    uniq = [
        " ".join(f"w{i}x{j}" for j in range(25)) + " the and of is in"
        for i in range(12)
    ]

    def doc(i, text):
        return {"doc_id": i, "text": text, "embedding": _vec(i)}

    bootstrap = [doc(i, uniq[i]) for i in range(4)]
    file1 = [doc(20, " ".join(base))] + [
        doc(21 + i, uniq[4 + i]) for i in range(3)
    ]
    # doc 30: near-dup of doc 20 (3-gram Jaccard ≈ 0.93, comfortably
    # over the 0.7 threshold on BOTH the batch and minhash-estimate
    # arms) with extra stopwords appended → longer + stoppier →
    # strictly higher quality_score → best-quality keeper swap against
    # the already-indexed 20
    file2 = [doc(30, " ".join(base + "and the".split()))] + [
        doc(31 + i, uniq[7 + i]) for i in range(3)
    ]

    live = str(tmp_path / "live")
    boot_df = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["embedding"]) for d in bootstrap],
        "doc_id long, text string, embedding array<double>",
    )
    build_ivf_index(boot_df, live, "embedding", "doc_id",
                    n_cells=2, seed=42)

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text("\n".join(_json.dumps(d) for d in file1))
    (src / "b.json").write_text("\n".join(_json.dumps(d) for d in file2))
    schema = "doc_id long, text string, embedding array<double>"
    deduper = IncrementalDeduper(
        spark,
        ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4),
        sim_threshold=0.7,
        fuzzy_keep="best_quality",
    )
    q = corpus_stream(
        deduper,
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").json(str(src)),
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink=ivf_index_sink(live, "embedding", "doc_id"),
        decisions_sink=index_tombstone_decisions_sink(live, "doc_id"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)

    # the swap happened: 20 was kept+indexed in batch 0, unkept by 30
    streamed = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["embedding"]) for d in file1 + file2],
        schema,
    )
    kept, _stats = build_corpus(
        streamed, exact_dedup=True, fuzzy_threshold=0.7,
        fuzzy_keep="best_quality",
    )
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 30 in kept_ids and 20 not in kept_ids  # the swap premise
    assert os.path.isdir(os.path.join(live, "_deleted"))

    # final index ≡ batch pipeline + fresh build on bootstrap ∪ kept
    truth = str(tmp_path / "truth")
    truth_rows = boot_df.unionByName(
        streamed.join(
            kept.select("doc_id"), "doc_id", "left_semi"
        ).select("doc_id", "text", "embedding")
    )
    build_ivf_index(
        truth_rows, truth, "embedding", "doc_id",
        centroids=spark.read.parquet(os.path.join(live, "centroids")),
    )
    queries = spark.createDataFrame(
        [(i, _vec(i)) for i in (20, 30, 0)],
        "query_id long, query_vec array<double>",
    )
    want = _rows(query_ivf_index(spark, truth, queries, k=6, n_probe=2))
    got = _rows(query_ivf_index(spark, live, queries, k=6, n_probe=2))
    assert got == want and want
    assert all(n != 20 for _, n, _, _ in got)   # swapped-out keeper gone
    assert any(n == 30 for _, n, _, _ in got)   # its better twin answers

    # vacuum folds staging + tombstones; answers unchanged
    assert vacuum_ivf_index(spark, live) >= 1
    assert _rows(query_ivf_index(spark, live, queries, k=6, n_probe=2)) \
        == want


# ---------------------------------------------------------------------------
# 5. LSH guard + act: occupancy report → rebuild with re-sized planes
# ---------------------------------------------------------------------------


def test_ann_index_occupancy_and_rebuild(spark, tmp_path):
    """The LSH arm's guard+act pair (symmetric with PQ/IVF drift →
    retrain): occupancy reports mean rows per bucket vs target_bucket
    and flags rebuild_recommended; rebuild_ann_index re-derives planes
    scaled to the survivors, folds staging + tombstones, and ≡ a fresh
    build on the survivor set."""
    from southpaw_spark.operators.ann_index import (
        ann_index_occupancy,
        rebuild_ann_index,
    )

    corpus = _corpus(spark, n=80)
    live = str(tmp_path / "live")
    # tiny target_bucket with FEW planes → occupancy over 2× target
    build_ann_index(
        corpus.where(F.col("vec_id") < 40), live,
        "embedding", "vec_id", n_planes=2, target_bucket=3, seed=42,
    )
    # staged adds + a tombstone must enter both the report and rebuild
    _stage_lsh_batch(spark, live, corpus.where(F.col("vec_id") >= 40), 0)
    remove_from_index(
        corpus.where(F.col("vec_id") == 7).select("vec_id"), live, "vec_id"
    )
    occ = ann_index_occupancy(spark, live)
    assert occ["n_vectors"] == 79 and occ["n_planes"] == 2
    assert occ["rebuild_recommended"] is True  # ~20 rows/bucket >> 2*3

    meta = rebuild_ann_index(spark, live, target_bucket=3, seed=42)
    assert meta["n_planes"] > 2  # auto-sized up to the survivor count
    assert not os.path.isdir(os.path.join(live, "_stream"))
    assert not os.path.isdir(os.path.join(live, "_deleted"))
    occ2 = ann_index_occupancy(spark, live)
    assert occ2["n_planes"] == meta["n_planes"]
    assert occ2["mean_bucket_occupancy"] < occ["mean_bucket_occupancy"]

    truth = str(tmp_path / "truth")
    build_ann_index(
        corpus.where(F.col("vec_id") != 7), truth,
        "embedding", "vec_id", target_bucket=3, seed=42,
    )
    queries = _queries(corpus)
    want = _rows(query_ann_index(spark, truth, queries, k=5))
    assert _rows(query_ann_index(spark, live, queries, k=5)) == want and want


def test_cli_retrain_index_all_layouts(spark, tmp_path, capsys):
    """--retrain-index auto-detects the layout: IVF retrains centroids
    self-contained, LSH re-buckets, PQ demands --retrain-corpus."""
    import pytest

    from southpaw_spark import cli

    corpus = _corpus(spark, n=40)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"state.dir: {tmp_path / 'unused'}\n")

    ivf = str(tmp_path / "ivf")
    build_ivf_index(corpus, ivf, "embedding", "vec_id", n_cells=3, seed=42)
    assert cli.main(["--config", str(cfg), "--retrain-index", ivf]) == 0
    assert "index retrained" in capsys.readouterr().out
    assert _rows(query_ivf_index(spark, ivf, _queries(corpus), k=3))

    lsh = str(tmp_path / "lsh")
    build_ann_index(corpus, lsh, "embedding", "vec_id", n_planes=3, seed=42)
    assert cli.main(["--config", str(cfg), "--retrain-index", lsh]) == 0
    assert "n_planes" in capsys.readouterr().out
    assert _rows(query_ann_index(spark, lsh, _queries(corpus), k=3))

    pq = str(tmp_path / "pq")
    build_pq_index(corpus, pq, "embedding", "vec_id",
                   m_subspaces=4, n_codes=8)
    with pytest.raises(ValueError, match="retrain-corpus"):
        cli.main(["--config", str(cfg), "--retrain-index", pq])
    cpath = str(tmp_path / "corpus.parquet")
    corpus.write.parquet(cpath)
    assert cli.main([
        "--config", str(cfg), "--retrain-index", pq,
        "--retrain-corpus", cpath,
    ]) == 0
    assert "m_subspaces" in capsys.readouterr().out
    assert _rows(query_pq_index(
        spark, pq, corpus, _queries(corpus), "embedding", "vec_id", k=3
    ))


def test_corpus_stream_feeds_lsh_and_pq_indexes(spark, tmp_path):
    """The sink family is symmetric: the same corpus_stream wiring
    feeds an LSH index and a PQ index (kept embeddings staged
    exactly-once, drops tombstoned via the decisions sink), each ≡ the
    batch pipeline + fresh build on bootstrap ∪ kept."""
    import json as _json

    from southpaw_spark.operators.ann_index import (
        lsh_index_sink,
        pq_index_sink,
    )
    from southpaw_spark.pipelines import build_corpus, corpus_stream
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalDeduper

    uniq = [
        " ".join(f"w{i}x{j}" for j in range(25)) + " the and of is in"
        for i in range(10)
    ]

    def doc(i, text):
        return {"doc_id": i, "text": text, "embedding": _vec(i)}

    bootstrap = [doc(i, uniq[i]) for i in range(4)]
    file1 = [doc(20 + i, uniq[4 + i]) for i in range(3)]
    # doc 30 = exact dup of doc 20's text → dropped on arrival (never
    # indexed; tombstone is a no-op); 31/32 unique
    file2 = [doc(30, uniq[4])] + [doc(31 + i, uniq[7 + i]) for i in range(2)]
    schema = "doc_id long, text string, embedding array<double>"
    boot_df = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["embedding"]) for d in bootstrap], schema
    )

    lsh = str(tmp_path / "lsh")
    pq = str(tmp_path / "pq")
    build_ann_index(boot_df, lsh, "embedding", "doc_id",
                    n_planes=4, seed=42)
    build_pq_index(boot_df, pq, "embedding", "doc_id",
                   m_subspaces=4, n_codes=4)

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text("\n".join(_json.dumps(d) for d in file1))
    (src / "b.json").write_text("\n".join(_json.dumps(d) for d in file2))

    lsink, psink = (
        lsh_index_sink(lsh, "embedding", "doc_id"),
        pq_index_sink(pq, "embedding", "doc_id"),
    )
    ldec, pdec = (
        index_tombstone_decisions_sink(lsh, "doc_id"),
        index_tombstone_decisions_sink(pq, "doc_id"),
    )

    def fanout_sink(kept, batch_id):
        lsink(kept, batch_id), psink(kept, batch_id)

    def fanout_decisions(dec, batch_id):
        ldec(dec, batch_id), pdec(dec, batch_id)

    q = corpus_stream(
        IncrementalDeduper(
            spark, ParquetStateStore(spark, str(tmp_path / "state"),
                                     n_buckets=4),
            sim_threshold=1.01,  # exact-only
        ),
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").json(str(src)),
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink=fanout_sink,
        decisions_sink=fanout_decisions,
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)

    streamed = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["embedding"]) for d in file1 + file2],
        schema,
    )
    kept, _ = build_corpus(streamed, exact_dedup=True)
    survivors = boot_df.unionByName(
        streamed.join(kept.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "text", "embedding")
    )
    queries = spark.createDataFrame(
        [(i, _vec(i)) for i in (0, 20)],
        "query_id long, query_vec array<double>",
    )

    lsh_truth = str(tmp_path / "lsh_truth")
    build_ann_index(survivors, lsh_truth, "embedding", "doc_id",
                    n_planes=4, seed=42)
    want = _rows(query_ann_index(spark, lsh_truth, queries, k=6))
    got = _rows(query_ann_index(spark, lsh, queries, k=6))
    assert got == want and want
    assert all(n != 30 for _, n, _, _ in got)  # the dropped dup

    pq_truth = str(tmp_path / "pq_truth")
    build_pq_index(
        survivors, pq_truth, "embedding", "doc_id",
        m_subspaces=4, n_codes=4,
        codebooks=spark.read.parquet(os.path.join(pq, "codebooks")),
    )
    corpus_all = boot_df.unionByName(streamed)
    wantp = _rows(query_pq_index(
        spark, pq_truth, corpus_all, queries, "embedding", "doc_id", k=6
    ))
    gotp = _rows(query_pq_index(
        spark, pq, corpus_all, queries, "embedding", "doc_id", k=6
    ))
    assert gotp == wantp and wantp
    assert all(n != 30 for _, n, _, _ in gotp)
    # vacuums fold both; answers unchanged
    vacuum_ann_index(spark, lsh)
    vacuum_pq_index(spark, pq)
    assert _rows(query_ann_index(spark, lsh, queries, k=6)) == want
    assert _rows(query_pq_index(
        spark, pq, corpus_all, queries, "embedding", "doc_id", k=6
    )) == wantp


# ---------------------------------------------------------------------------
# 5. the mid-retrain staging race (round 15): a batch committed AFTER a
# retrain/rebuild enumerated the staging area carries no geometry at
# all (raw vectors) — it must answer queries and fold under the NEW
# quantizer, never under the retired one.
# ---------------------------------------------------------------------------


def _stage_raw(df, index_dir, batch_id=0):
    """Write a staged batch exactly as the streaming arms do (raw
    (neighbor_id, cv) rows), bypassing the stream machinery so the
    test controls WHEN the batch exists relative to the retrain."""
    df.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
    ).write.mode("overwrite").parquet(
        os.path.join(index_dir, "_stream", f"batch={batch_id}")
    )


def test_lsh_batch_staged_mid_rebuild_survives(spark, tmp_path, monkeypatch):
    corpus = _corpus(spark)
    part_a = corpus.where(F.col("vec_id") < 40)
    part_b = corpus.where(F.col("vec_id") >= 40)
    queries = _queries(corpus)

    idx = str(tmp_path / "lsh")
    build_ann_index(part_a, idx, "embedding", "vec_id", n_planes=4, seed=42)
    _stage_raw(part_b, idx)

    # the race: rebuild's scan-time enumeration ran BEFORE the batch
    # was committed — it re-derives planes without folding it
    monkeypatch.setattr(ai, "_list_stream_batches", lambda *a, **k: [])
    ai.rebuild_ann_index(spark, idx, n_planes=7)
    monkeypatch.undo()

    truth = str(tmp_path / "truth")
    build_ann_index(corpus, truth, "embedding", "vec_id",
                    n_planes=7, seed=42)
    want = _rows(query_ann_index(spark, truth, queries, k=5))
    # the staged batch answers under the NEW planes...
    assert _rows(query_ann_index(spark, idx, queries, k=5)) == want and want
    # ...and folds under them too
    vacuum_ann_index(spark, idx)
    assert not os.path.isdir(os.path.join(idx, "_stream"))
    assert _rows(query_ann_index(spark, idx, queries, k=5)) == want


def test_ivf_batch_staged_mid_retrain_survives(spark, tmp_path, monkeypatch):
    corpus = _corpus(spark)
    part_a = corpus.where(F.col("vec_id") < 40)
    part_b = corpus.where(F.col("vec_id") >= 40)
    queries = _queries(corpus)

    idx = str(tmp_path / "ivf")
    build_ivf_index(part_a, idx, "embedding", "vec_id", n_cells=3, seed=1)
    _stage_raw(part_b, idx)

    monkeypatch.setattr(ai, "_list_stream_batches", lambda *a, **k: [])
    retrain_ivf_index(spark, idx, n_cells=4, seed=2)
    monkeypatch.undo()

    truth = str(tmp_path / "truth")
    build_ivf_index(
        corpus, truth, "embedding", "vec_id",
        centroids=spark.read.parquet(os.path.join(idx, "centroids")),
    )
    want = _rows(query_ivf_index(spark, truth, queries, k=5, n_probe=2))
    got = _rows(query_ivf_index(spark, idx, queries, k=5, n_probe=2))
    assert got == want and want
    # deterministic staged-visibility probe: a query vector identical
    # to a staged vector must find it at rank 1 (cosine 1.0)
    probe = part_b.where(F.col("vec_id") == 45).select(
        F.lit(-1).cast("long").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    hit = query_ivf_index(spark, idx, probe, k=1, n_probe=2).collect()
    assert hit and hit[0]["neighbor_id"] == 45
    vacuum_ivf_index(spark, idx)
    assert _rows(query_ivf_index(spark, idx, queries, k=5, n_probe=2)) == want


def test_pq_batch_staged_mid_retrain_survives(spark, tmp_path, monkeypatch):
    corpus = _corpus(spark, n=40)
    part_a = corpus.where(F.col("vec_id") < 30)
    part_b = corpus.where(F.col("vec_id") >= 30)
    queries = _queries(corpus)

    idx = str(tmp_path / "pq")
    build_pq_index(part_a, idx, "embedding", "vec_id",
                   m_subspaces=4, n_codes=4)
    _stage_raw(part_b, idx)

    # codebooks swap while the batch sits staged: stored codes would
    # now decode to garbage — raw staging re-encodes at read time
    monkeypatch.setattr(ai, "_list_stream_batches", lambda *a, **k: [])
    retrain_pq_index(spark, idx, part_a, "embedding", "vec_id")
    monkeypatch.undo()

    truth = str(tmp_path / "truth")
    build_pq_index(
        corpus, truth, "embedding", "vec_id", m_subspaces=4, n_codes=4,
        codebooks=spark.read.parquet(os.path.join(idx, "codebooks")),
    )
    want = _rows(query_pq_index(
        spark, truth, corpus, queries, "embedding", "vec_id", k=5
    ))
    assert _rows(query_pq_index(
        spark, idx, corpus, queries, "embedding", "vec_id", k=5
    )) == want and want
    vacuum_pq_index(spark, idx)
    assert _rows(query_pq_index(
        spark, idx, corpus, queries, "embedding", "vec_id", k=5
    )) == want


def test_legacy_staged_assignments_are_rederived(spark, tmp_path):
    """Pre-round-15 staging stored bucket/bprefix (LSH) and cell (IVF)
    next to the vectors. Those stored assignments are deliberately
    IGNORED now — write a legacy-format batch with WRONG assignments
    and assert queries and vacuum still place every vector where the
    current geometry says, not where the stale columns do."""
    corpus = _corpus(spark)
    part_a = corpus.where(F.col("vec_id") < 40)
    part_b = corpus.where(F.col("vec_id") >= 40)
    queries = _queries(corpus)

    lsh = str(tmp_path / "lsh")
    build_ann_index(part_a, lsh, "embedding", "vec_id", n_planes=4, seed=42)
    part_b.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.lit("9999").alias("bucket"),       # deliberately wrong
        F.lit("p9999").alias("bprefix"),
    ).write.partitionBy("bprefix").mode("overwrite").parquet(
        os.path.join(lsh, "_stream", "batch=0")
    )
    truth = str(tmp_path / "lsh_truth")
    build_ann_index(corpus, truth, "embedding", "vec_id",
                    n_planes=4, seed=42)
    want = _rows(query_ann_index(spark, truth, queries, k=5))
    assert _rows(query_ann_index(spark, lsh, queries, k=5)) == want and want
    vacuum_ann_index(spark, lsh)
    assert _rows(query_ann_index(spark, lsh, queries, k=5)) == want

    ivf = str(tmp_path / "ivf")
    build_ivf_index(part_a, ivf, "embedding", "vec_id", n_cells=3, seed=1)
    part_b.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.lit(998877).alias("cell"),         # deliberately wrong
    ).write.partitionBy("cell").mode("overwrite").parquet(
        os.path.join(ivf, "_stream", "batch=0")
    )
    ivf_truth = str(tmp_path / "ivf_truth")
    build_ivf_index(
        corpus, ivf_truth, "embedding", "vec_id",
        centroids=spark.read.parquet(os.path.join(ivf, "centroids")),
    )
    wanti = _rows(query_ivf_index(spark, ivf_truth, queries, k=5, n_probe=2))
    assert _rows(
        query_ivf_index(spark, ivf, queries, k=5, n_probe=2)
    ) == wanti and wanti
    vacuum_ivf_index(spark, ivf)
    assert _rows(query_ivf_index(spark, ivf, queries, k=5, n_probe=2)) == wanti


# ---------------------------------------------------------------------------
# 6. the full loop (round 15): Kafka wire in → streaming corpus
# pipeline (dedup decisions included) → persistent IVF index + kept
# corpus, one run, ≡ the batch pipeline + fresh build. This is the
# production topology end-to-end: O1 source, incremental dedup state,
# index staging, tombstones — no file-source stand-in.
# ---------------------------------------------------------------------------


def test_kafka_to_corpus_to_ivf_index_full_loop(spark, tmp_path):
    import json as _json

    from southpaw_spark.pipelines import build_corpus, corpus_stream
    from southpaw_spark.sources.kafka_broker import EmbeddedKafkaBroker
    from southpaw_spark.sources.kafka_pyds import register_kafka_py
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalDeduper

    uniq = [
        " ".join(f"w{i}x{j}" for j in range(25)) + " the and of is in"
        for i in range(12)
    ]

    def doc(i, text):
        return {"doc_id": i, "text": text, "embedding": _vec(i)}

    bootstrap = [doc(i, uniq[i]) for i in range(4)]
    # doc 30 repeats doc 20's text → dropped on arrival, never indexed
    streamed = (
        [doc(20 + i, uniq[4 + i]) for i in range(4)]
        + [doc(30, uniq[4])]
        + [doc(31 + i, uniq[8 + i]) for i in range(3)]
    )
    schema = "doc_id long, text string, embedding array<double>"
    boot_df = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["embedding"]) for d in bootstrap], schema
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(boot_df, idx, "embedding", "doc_id", n_cells=3, seed=1)
    kept_dir = str(tmp_path / "kept")

    def corpus_and_index_sink(kept, batch_id):
        ivf_index_sink(idx, "embedding", "doc_id")(kept, batch_id)
        kept.select("doc_id", "text", "embedding").write.mode(
            "append"
        ).parquet(kept_dir)

    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("docs", partitions=2)
        for n, d in enumerate(streamed):
            broker.append(
                "docs", d["doc_id"] % 2,
                str(d["doc_id"]).encode(), _json.dumps(d).encode(),
                1_700_000_000_000 + n,
            )
        register_kafka_py(spark)
        raw = (
            spark.readStream.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "docs")
            .load()
        )
        parsed = raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("d")
        ).select("d.*")
        q = corpus_stream(
            IncrementalDeduper(
                spark,
                ParquetStateStore(spark, str(tmp_path / "state"),
                                  n_buckets=4),
                sim_threshold=1.01,  # exact-only
            ),
            parsed,
            checkpoint_dir=str(tmp_path / "ckpt"),
            sink=corpus_and_index_sink,
            decisions_sink=index_tombstone_decisions_sink(idx, "doc_id"),
            trigger={"availableNow": True},
        )
        q.awaitTermination(300)

    streamed_df = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["embedding"]) for d in streamed], schema
    )
    kept_truth, _ = build_corpus(streamed_df, exact_dedup=True)
    want_ids = {r["doc_id"] for r in kept_truth.select("doc_id").collect()}
    got_ids = {
        r["doc_id"]
        for r in spark.read.parquet(kept_dir).select("doc_id").collect()
    }
    assert got_ids == want_ids and 30 not in got_ids

    survivors = boot_df.unionByName(
        streamed_df.join(
            kept_truth.select("doc_id"), "doc_id", "left_semi"
        ).select("doc_id", "text", "embedding")
    )
    truth = str(tmp_path / "truth")
    build_ivf_index(
        survivors, truth, "embedding", "doc_id",
        centroids=spark.read.parquet(os.path.join(idx, "centroids")),
    )
    queries = spark.createDataFrame(
        [(i, _vec(i)) for i in (0, 20)],
        "query_id long, query_vec array<double>",
    )
    want = _rows(query_ivf_index(spark, truth, queries, k=6, n_probe=3))
    got = _rows(query_ivf_index(spark, idx, queries, k=6, n_probe=3))
    assert got == want and want
    assert all(n != 30 for _, n, _, _ in got)
    vacuum_ivf_index(spark, idx)
    assert _rows(query_ivf_index(spark, idx, queries, k=6, n_probe=3)) == want


def test_pq_legacy_code_staging_passthrough(spark, tmp_path):
    """Pre-round-15 PQ staging dirs hold (neighbor_id, m, code) rows.
    They must keep answering queries and folding at vacuum unchanged —
    the documented legacy contract (`_read_stream_codes`)."""
    from southpaw_spark.operators.similarity import _pq_encode

    corpus = _corpus(spark, n=40)
    part_a = corpus.where(F.col("vec_id") < 30)
    part_b = corpus.where(F.col("vec_id") >= 30)
    queries = _queries(corpus)

    idx = str(tmp_path / "pq")
    meta = build_pq_index(part_a, idx, "embedding", "vec_id",
                          m_subspaces=4, n_codes=4)
    sub = meta["dim"] // meta["m_subspaces"]
    ms = spark.range(meta["m_subspaces"]).select(
        F.col("id").cast("int").alias("m")
    )
    codebooks = spark.read.parquet(os.path.join(idx, "codebooks"))
    # a legacy arm staged CODES, not vectors
    _pq_encode(
        part_b.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("embedding").alias("cv")),
        "cv", "neighbor_id", codebooks, ms, sub,
    ).write.mode("overwrite").parquet(
        os.path.join(idx, "_stream", "batch=0")
    )

    truth = str(tmp_path / "truth")
    build_pq_index(corpus, truth, "embedding", "vec_id",
                   m_subspaces=4, n_codes=4, codebooks=codebooks)
    want = _rows(query_pq_index(
        spark, truth, corpus, queries, "embedding", "vec_id", k=5
    ))
    assert _rows(query_pq_index(
        spark, idx, corpus, queries, "embedding", "vec_id", k=5
    )) == want and want
    vacuum_pq_index(spark, idx)
    assert _rows(query_pq_index(
        spark, idx, corpus, queries, "embedding", "vec_id", k=5
    )) == want
