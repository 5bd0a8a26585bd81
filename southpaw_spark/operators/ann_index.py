"""Persistent ANN index: build-once / query-many similarity search.

``ivf_topk`` (operators/similarity.py) recomputes the corpus bucket
assignment on every call — right for one-shot queries, wasteful for the
serving shape a training pipeline actually runs ("index the corpus
nightly, answer query batches all day"). This module splits the two
phases FAISS-style, Spark-first:

* :func:`build_ann_index` — one pass over the corpus assigns every
  vector to its random-hyperplane LSH bucket and writes the index as
  parquet **partitioned by bucket prefix**, plus a tiny JSON sidecar
  pinning the hyperplanes. Build cost: one scan + one partitioned write.
* :func:`query_ann_index` — computes each query's probe buckets
  (multi-probe Hamming ring, as ``ivf_topk``), then reads ONLY the
  partitions holding probed prefixes: Catalyst turns the prefix
  ``isin`` into a partition filter, so query I/O is proportional to the
  probed buckets, never the corpus. Candidates are rescored with exact
  cosine and ranked per query.

Scale design (100 TB corpus): bucket count must grow with the corpus
(``auto_n_planes``), so the FULL bucket string cannot be the partition
key — 2^32 directories is a filesystem bug, not an index. The partition
key is the first ``prefix_bits`` bits (≤ 2^prefix_bits directories,
default ≤ 1024); the full bucket is an ordinary column whose residual
filter parquet row-group stats prune further. Probing flips ≤ 1 bit, so
a probe set of B buckets touches ≤ B distinct prefixes.

The hyperplanes are pinned in the sidecar (not re-derived from the
seed) so an index outlives library-version changes to RNG call order;
``seed``/``n_planes`` resolution matches ``ivf_topk`` exactly, and a
same-seed build answers queries identically to ``ivf_topk`` (pinned by
``tests/test_similarity_dedup.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from southpaw_spark.operators.similarity import _dot, _norm

_META = "_ANN_META.json"


def _index_fs(index_dir: str, spark: SparkSession | None = None):
    """Driver-side FS for the index root — the same seam the state
    store uses (`streaming/fsio.py`): plain paths keep the original
    POSIX code, any ``scheme://`` root goes through the JVM Hadoop
    FileSystem, so an index can live on ``s3a://``/``gs://``/``abfs://``
    (reference posture: `state/RocksDBState.java` URI surface +
    `util/S3Helper.java`). Spark's own readers/writers already handle
    the parquet halves on any scheme; this covers the sidecars,
    staging enumeration, and vacuum swaps."""
    from southpaw_spark.streaming.fsio import store_fs_for

    if "://" in index_dir and spark is None:
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"index root {index_dir!r} needs an active SparkSession "
                "to reach its filesystem"
            )
    return store_fs_for(spark, index_dir)


# shared sidecar convention — one implementation for the whole repo
from southpaw_spark.streaming.fsio import (  # noqa: E402
    read_json as _read_json,
    write_json_atomic as _write_json_atomic,
)


def _lsh_data_dir(fs, index_dir: str) -> str:
    """Where the LSH index's bprefix partitions live. Round 15 moves
    them under ``data/`` so vacuum swaps ONE data subdir (symmetric
    with PQ ``codes/`` and IVF ``cells/``) instead of renaming the
    whole index root — the root rename destroyed staging batches a
    live stream committed mid-vacuum. Legacy indexes (partitions at
    the root) stay readable; the first vacuum migrates them."""
    data = os.path.join(index_dir, "data")
    return data if fs.isdir(data) else index_dir


def _bucket_bits(col, planes):
    return [
        (
            F.aggregate(
                F.zip_with(
                    col,
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0
        ).cast("int")
        for p in planes
    ]


def _bucket_str(bits):
    return F.concat_ws("", *[b.cast("string") for b in bits])


def build_ann_index(
    corpus: DataFrame,
    index_dir: str,
    vec_col: str,
    id_col: str,
    n_planes: int | None = None,
    target_bucket: int = 200,
    prefix_bits: int = 10,
    seed: int = 42,
) -> dict:
    """Materialize the LSH index for ``corpus`` under ``index_dir``.

    Returns the sidecar metadata dict. ``n_planes=None`` scales the
    plane count to the corpus (expected bucket ≈ ``target_bucket``
    vectors — ``dedup.auto_n_planes``). Rebuild = overwrite (the build
    is idempotent for a given corpus + seed).
    """
    import numpy as np

    from southpaw_spark.operators.dedup import auto_n_planes

    if n_planes is None:
        n_planes = auto_n_planes(corpus.count(), target_bucket)
    prefix_bits = min(prefix_bits, n_planes)
    dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).tolist()

    bits = _bucket_bits(F.col(vec_col), planes)
    rows = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _bucket_str(bits).alias("bucket"),
        # leading "p" keeps partition-value inference from reading
        # "011" as integer 11 — the partition column stays a string
        F.concat(F.lit("p"), _bucket_str(bits[:prefix_bits])).alias("bprefix"),
    )
    rows.write.partitionBy("bprefix").mode("overwrite").parquet(
        os.path.join(index_dir, "data")
    )
    meta = {
        "dim": int(dim),
        "n_planes": int(n_planes),
        "prefix_bits": int(prefix_bits),
        "seed": int(seed),
        "target_bucket": int(target_bucket),
        "planes": planes,
    }
    _write_json_atomic(
        _index_fs(index_dir, corpus.sparkSession),
        os.path.join(index_dir, _META),
        meta,
    )
    return meta


def query_ann_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    multiprobe: int = 1,
) -> DataFrame:
    """Answer a query batch against a built index.

    ``queries`` must carry (query_id, query_vec). Output matches
    ``ivf_topk``: (query_id, neighbor_id, rank, cosine), rank 1..k,
    deterministic tie-break (rounded cosine desc, neighbor id asc).

    Plan shape: probe buckets are derived per query (1 + n_planes
    strings for ``multiprobe=1``); the index read carries a partition
    filter on the probed PREFIXES (only those directories are listed
    and scanned) plus a residual row filter on the full bucket; the
    candidate join is a broadcast of the (small) probe table. Exact
    cosine rescoring and the top-k window run on candidates only.
    """
    if multiprobe not in (0, 1):
        raise ValueError("multiprobe supports 0 or 1 bit flips")
    fs = _index_fs(index_dir, spark)
    meta = _read_json(fs, os.path.join(index_dir, _META))
    planes, pb = meta["planes"], meta["prefix_bits"]

    bits = _bucket_bits(F.col("query_vec"), planes)
    probes = [_bucket_str(bits)]
    if multiprobe >= 1:
        for flip in range(len(planes)):
            flipped = [(1 - b if i == flip else b) for i, b in enumerate(bits)]
            probes.append(_bucket_str(flipped))
    q = queries.select(
        "query_id",
        "query_vec",
        F.explode(F.array_distinct(F.array(*probes))).alias("bucket"),
    ).withColumn(
        "bprefix", F.concat(F.lit("p"), F.substring("bucket", 1, pb))
    )

    # Collecting the probed prefixes to the driver is bounded work
    # (≤ |queries| × (n_planes+1) short strings) and is what turns the
    # scan into a partition-pruned read instead of a full-index scan.
    prefixes = [r["bprefix"] for r in q.select("bprefix").distinct().collect()]
    base = spark.read.parquet(_lsh_data_dir(fs, index_dir)).where(
        F.col("bprefix").isin(prefixes)
    ).select("neighbor_id", "cv", "bucket", "bprefix")
    # Join each branch against the probes SEPARATELY rather than
    # unioning the scans first: the staged branch's bucket columns are
    # derived expressions over `cv` (current-planes assignment, see
    # `_bucket_staged`), and joining a union of {partitioned scan,
    # derived projection} on the partition column trips Spark's
    # dynamic-partition-pruning planner ("IN dynamicpruning#N has not
    # finished"). Per-branch joins keep the main scan's pruned shape
    # and give the staged scan nothing DPP could engage with.
    joined = base.join(F.broadcast(q), ["bprefix", "bucket"])
    streamed = _read_stream_rows(spark, index_dir)
    if streamed is not None:
        # staging rows answer immediately; their buckets derive from
        # the current planes HERE (staged sets are vacuum-bounded, so
        # the unpruned staged scan is small by construction)
        joined = joined.unionByName(
            _bucket_staged(streamed, meta)
            .where(F.col("bprefix").isin(prefixes))
            .join(F.broadcast(q), ["bprefix", "bucket"])
        )
    joined = _apply_deleted(spark, index_dir, joined).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.try_divide(
        _dot(F.col("query_vec"), F.col("cv")),
        _norm(F.col("query_vec")) * _norm(F.col("cv")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 8).desc(), F.col("neighbor_id")
    )
    return (
        joined.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where((F.col("rank") <= k) & F.col("cosine").isNotNull())
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def add_to_ann_index(
    new_vectors: DataFrame,
    index_dir: str,
    vec_col: str,
    id_col: str,
) -> None:
    """Incrementally add vectors to an existing index — the continuous-
    ingest path (nightly full rebuilds don't survive a corpus that grows
    hourly). The sidecar's pinned hyperplanes assign the new vectors to
    the SAME buckets a full rebuild would, and the write appends files
    into the matching prefix partitions: build(A) + add(B) answers
    queries identically to build(A ∪ B) (pinned by test).

    Callers own id uniqueness (appending an existing id duplicates it —
    run the dedup cascade upstream). Plane count is fixed at build time,
    so expected bucket occupancy grows with the corpus; rebuild with
    more planes when buckets outgrow ``target_bucket`` — the meta's
    ``n_planes`` vs current count tells you when.
    """
    fs = _index_fs(index_dir, new_vectors.sparkSession)
    meta = _read_json(fs, os.path.join(index_dir, _META))
    planes, pb = meta["planes"], meta["prefix_bits"]
    bits = _bucket_bits(F.col(vec_col), planes)
    rows = new_vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _bucket_str(bits).alias("bucket"),
        F.concat(F.lit("p"), _bucket_str(bits[:pb])).alias("bprefix"),
    )
    rows.write.partitionBy("bprefix").mode("append").parquet(
        _lsh_data_dir(fs, index_dir)
    )


#: tombstone subdirectory: underscore prefix keeps Spark's parquet
#: reader from treating it as index data (same rule as _SUCCESS)
_DELETED = "_deleted"

#: streaming-ingest staging area (same underscore rule): micro-batch
#: appends land under ``_stream/batch=<id>/`` as RAW (neighbor_id, cv)
#: rows so a replayed batch OVERWRITES its own directory instead of
#: duplicating rows — exactly-once without touching the main layout's
#: append files. Geometry (bucket/cell/code) is derived from the
#: CURRENT sidecar at query/fold time, never stored: a retrain or
#: rebuild swapping the quantizer mid-stream cannot strand a batch.
_STREAM = "_stream"


def _list_stream_batches(spark: SparkSession, index_dir: str) -> list[str]:
    """Names of the ``batch=<id>`` staging dirs present RIGHT NOW — the
    scan-time snapshot the vacuums fold and delete EXACTLY (a batch a
    live stream commits after this enumeration is neither folded nor
    destroyed; it stays staged and keeps answering queries)."""
    fs = _index_fs(index_dir, spark)
    path = os.path.join(index_dir, _STREAM)
    if not fs.isdir(path):
        return []
    return sorted(n for n in fs.listdir(path) if n.startswith("batch="))


def _list_deleted_files(spark: SparkSession, index_dir: str) -> list[str]:
    """Data files in the tombstone set RIGHT NOW (same snapshot rule:
    a tombstone appended mid-vacuum survives the vacuum and keeps
    masking its id via the query-side anti-join)."""
    fs = _index_fs(index_dir, spark)
    path = os.path.join(index_dir, _DELETED)
    if not fs.isdir(path):
        return []
    return sorted(
        n
        for n in fs.listdir(path)
        if not n.startswith((".", "_")) and not n.endswith((".crc", ".tmp"))
    )


def _read_stream_vectors(spark: SparkSession, index_dir: str,
                         batches: list[str] | None,
                         legacy_prefixes: tuple[str, ...]):
    """Staged streaming rows as RAW ``(neighbor_id, cv)`` vectors.
    Pre-round-15 staging dirs stored the assignment (bucket/bprefix or
    cell) as partition subdirs; those columns are deliberately dropped
    — every consumer derives the assignment from the CURRENT sidecar
    geometry, so staged rows survive a mid-stream retrain/rebuild
    quantizer swap correctly. New-format (flat) batch dirs read as ONE
    scan — the plan stays a single staging branch however many batches
    accumulate between vacuums; only legacy partitioned dirs (gone at
    first vacuum) fall back to per-batch reads, because mixed
    directory depths break partition inference."""
    path = os.path.join(index_dir, _STREAM)
    if batches is None:
        # enumerate rather than isdir: a crash between a vacuum's
        # batch-dir deletes and its parent cleanup can leave an empty
        # `_stream/`, and reading it would die in schema inference
        batches = _list_stream_batches(spark, index_dir)
    if not batches:
        return None
    fs = _index_fs(index_dir, spark)
    legacy = [
        b
        for b in batches
        if any(
            n.startswith(legacy_prefixes)
            for n in fs.listdir(os.path.join(path, b))
        )
    ]
    flat = [b for b in batches if b not in legacy]
    parts = []
    if flat:
        parts.append(
            spark.read.option("basePath", path)
            .parquet(*[os.path.join(path, b) for b in flat])
            .select("neighbor_id", "cv")
        )
    parts.extend(
        spark.read.parquet(os.path.join(path, b)).select(
            "neighbor_id", "cv"
        )
        for b in legacy
    )
    out = parts[0]
    for d in parts[1:]:
        out = out.unionByName(d)
    return out


def _read_stream_rows(spark: SparkSession, index_dir: str,
                      batches: list[str] | None = None):
    return _read_stream_vectors(spark, index_dir, batches, ("bprefix=",))


def _bucket_staged(streamed: DataFrame, meta: dict) -> DataFrame:
    """Assign staged raw vectors to buckets with the CURRENT sidecar
    planes — the one place staged-row geometry is derived, shared by
    query/vacuum/occupancy so a rebuild's plane swap can never leave a
    staged row stranded under a retired bucketing."""
    planes, pb = meta["planes"], meta["prefix_bits"]
    bits = _bucket_bits(F.col("cv"), planes)
    return streamed.select(
        "neighbor_id",
        "cv",
        _bucket_str(bits).alias("bucket"),
        F.concat(F.lit("p"), _bucket_str(bits[:pb])).alias("bprefix"),
    )


def attach_index_stream(
    vectors: DataFrame,
    index_dir: str,
    vec_col: str,
    id_col: str,
    checkpoint_dir: str,
    tombstone_col: str | None = None,
    trigger: dict | None = None,
):
    """Continuous LSH-index maintenance: stream ``(id, vector)`` rows
    into a built index (``build_ann_index`` first — the sidecar's
    pinned hyperplanes bucket streamed vectors exactly as a rebuild
    would, so ``build(A)`` + ``stream(B)`` answers queries identically
    to ``build(A ∪ B)``; pinned by parity test). The 100 TB ingest
    shape: embeddings arrive hourly, the index absorbs them per
    micro-batch, and queries see them immediately — no nightly rebuild.

    EXACTLY-ONCE adds: each micro-batch is written with overwrite to
    its own ``_stream/batch=<id>/`` directory (stable batch ids per
    checkpoint), so an at-least-once replay rewrites the same files
    instead of appending duplicates — duplicate candidates would
    silently skew every top-k rank. Staged rows are RAW
    ``(neighbor_id, cv)`` vectors: bucket/bprefix are derived at query
    and fold time from the CURRENT sidecar planes, so a batch staged
    concurrently with a :func:`rebuild_ann_index` plane swap can never
    be mis-bucketed (stored assignments would go permanently
    unreachable after the swap). The underscore prefix keeps the main
    index read from seeing the staging area; queries union it
    explicitly. Fold the staging batches into the main layout with
    :func:`vacuum_ann_index` once they accumulate.

    ``tombstone_col`` (nullable boolean) marks DELETE rows — their ids
    go to the tombstone set (``remove_from_index``; replay-safe: the
    anti-join is idempotent under duplicate tombstones). A tombstone is
    terminal for its id until a vacuum folds it: re-adding the same id
    later answers nothing, because tombstones are not versioned
    (latest-wins vector UPSERT belongs to
    ``streaming.dedup_stream.IncrementalVectorDeduper``, which owns
    per-key state). The PQ index has its own streaming arm
    (:func:`attach_pq_index_stream`, round 14) with a codebook-drift
    guard.

    Returns the started ``StreamingQuery``.
    """
    _read_json(  # existence/shape check before the stream starts
        _index_fs(index_dir, vectors.sparkSession),
        os.path.join(index_dir, _META),
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        adds = batch_df
        if tombstone_col is not None:
            dead = batch_df.where(
                F.coalesce(F.col(tombstone_col), F.lit(False))
            ).select(F.col(id_col))
            if dead.limit(1).count() > 0:
                remove_from_index(dead.distinct(), index_dir, id_col)
            adds = batch_df.where(
                ~F.coalesce(F.col(tombstone_col), F.lit(False))
            )
        rows = adds.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
        )
        # A tombstone-only (or empty) micro-batch must not leave a
        # batch=<id>/ dir holding just _SUCCESS: a staging area made
        # only of such dirs breaks spark.read.parquet ("Unable to infer
        # schema") for every query until real adds land. Skipping is
        # replay-safe — a replayed batch carries the same (empty) adds.
        if rows.limit(1).count() == 0:
            return
        rows.write.mode("overwrite").parquet(
            os.path.join(index_dir, _STREAM, f"batch={batch_id}")
        )

    writer = vectors.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def _read_deleted(spark: SparkSession, index_dir: str,
                  files: list[str] | None = None) -> DataFrame | None:
    path = os.path.join(index_dir, _DELETED)
    if files is None:
        # enumerate rather than isdir — same empty-dir schema-inference
        # hazard as `_read_stream_rows`
        files = _list_deleted_files(spark, index_dir)
    if not files:
        return None
    # scoped read: exactly the scan-time tombstone files, so the lazy
    # re-evaluations inside a vacuum never see (and never delete)
    # tombstones a live stream appends mid-vacuum
    return spark.read.parquet(*[os.path.join(path, f) for f in files])


def _apply_deleted(spark, index_dir, rows, key="neighbor_id"):
    dead = _read_deleted(spark, index_dir)
    if dead is None:
        return rows
    # tombstone set is small between vacuums — broadcast anti-join
    return rows.join(
        F.broadcast(dead.select(F.col("neighbor_id").alias(key))),
        key, "left_anti",
    )


def remove_from_index(ids: DataFrame, index_dir: str, id_col: str) -> None:
    """Delete vectors from a built index (LSH or PQ — both stores share
    the tombstone layout) — the corpus-dedup companion: when the dedup
    cascade drops documents, their vectors must stop answering queries
    WITHOUT a full index rebuild. Appends the ids to a ``_deleted/``
    tombstone set; queries anti-join it (broadcast — tombstones are
    small between vacuums) so ``build → remove → query`` answers
    exactly like ``rebuild on survivors`` (pinned by parity test).
    Run :func:`vacuum_ann_index` / :func:`vacuum_pq_index` when the
    tombstone set has grown enough to be worth rewriting the data
    files. Removing an id that was never indexed is a no-op."""
    ids.select(F.col(id_col).alias("neighbor_id")).write.mode(
        "append"
    ).parquet(os.path.join(index_dir, _DELETED))


def _swap_data_dir(fs, live: str, tmp: str) -> None:
    """Publish ``tmp`` at ``live`` with the state store's vacuum
    discipline: everything new is fully written before the two-rename
    window (live → .old, tmp → live), the only non-atomic step on a
    plain filesystem. Rollback on a failed second rename."""
    trash = live.rstrip("/") + ".vacuum.old"
    fs.delete(trash)
    if fs.exists(live) and not fs.rename_dir(live, trash):
        raise OSError(f"vacuum: could not retire {live}")
    if not fs.rename_dir(tmp, live):
        fs.rename_dir(trash, live)  # roll back
        raise OSError(f"vacuum: could not publish {tmp} at {live}")
    fs.delete(trash)


def _drop_scanned(
    fs, index_dir: str, batches: list[str], files: list[str]
) -> None:
    """Delete EXACTLY the staging batch dirs and tombstone files the
    vacuum enumerated at scan time — never the whole ``_stream``/
    ``_deleted`` trees. A batch a live ``attach_*_index_stream``
    commits between the scan and this cleanup is untouched: it stays
    staged, keeps answering queries, and the next vacuum folds it
    (the rebucket-style quiesce contract is thereby unnecessary).
    The now-possibly-empty parent dirs are removed only when a final
    re-listing shows nothing but bookkeeping files — racing with a
    concurrent commit just leaves the dir for the next vacuum."""
    sdir = os.path.join(index_dir, _STREAM)
    for b in batches:
        fs.delete(os.path.join(sdir, b))
    ddir = os.path.join(index_dir, _DELETED)
    for f in files:
        fs.delete(os.path.join(ddir, f))
    for parent, live_kind in ((sdir, "batch="), (ddir, None)):
        if not fs.isdir(parent):
            continue
        left = fs.listdir(parent)
        live = [
            n
            for n in left
            if (n.startswith(live_kind) if live_kind else
                not n.startswith((".", "_")) and not n.endswith(".crc"))
        ]
        if live:
            continue
        # Only bookkeeping remains. Clear the FILE leftovers
        # (_SUCCESS, .crc) — never dirs: an in-flight concurrent
        # commit stages under `_temporary/` and must survive — then
        # remove the parent NON-recursively, so a batch or tombstone
        # committed after the listing makes the rmdir fail and the
        # dir simply waits for the next vacuum (the old recursive
        # delete re-opened the exact scan-to-cleanup loss window
        # this function exists to close).
        for n in left:
            child = os.path.join(parent, n)
            if not fs.isdir(child):
                fs.delete(child)
        fs.delete_dir_if_empty(parent)


def vacuum_ann_index(spark: SparkSession, index_dir: str) -> int:
    """Fold the tombstone set AND any streaming-ingest staging batches
    (``attach_index_stream``) into the LSH index data files: rewrite
    the surviving rows (same bprefix partitioning) out-of-place, swap
    the ``data/`` subdir, then drop EXACTLY the staging batches and
    tombstone files enumerated at scan time. Returns the number of
    distinct ids removed.

    CONCURRENT-INGEST SAFE (round 15): the old implementation renamed
    the whole index root, which silently destroyed any ``_stream``
    batch a live stream committed between the fold's read and the
    rename — data loss the stream's checkpoint never replays. Now only
    the scan-time snapshot is folded and deleted; later commits stay
    staged and keep answering queries (pinned by the concurrent-vacuum
    test). Legacy indexes with partitions at the root are migrated
    into ``data/`` by their first vacuum."""
    fs = _index_fs(index_dir, spark)
    batches = _list_stream_batches(spark, index_dir)
    tomb_files = _list_deleted_files(spark, index_dir)
    if not batches and not tomb_files:
        return 0
    data_dir = _lsh_data_dir(fs, index_dir)
    legacy = data_dir == index_dir
    idx = spark.read.parquet(data_dir).select(
        "neighbor_id", "cv", "bucket", "bprefix"
    )
    streamed = _read_stream_rows(spark, index_dir, batches=batches)
    if streamed is not None:
        # staged rows fold under the CURRENT planes (staging stores
        # raw vectors — a batch staged mid-rebuild still lands in the
        # buckets queries will actually probe)
        meta = _read_json(fs, os.path.join(index_dir, _META))
        idx = idx.unionByName(_bucket_staged(streamed, meta))
    dead = _read_deleted(spark, index_dir, files=tomb_files)
    n_dead = 0
    survivors = idx
    if dead is not None:
        # distinct: replayed streaming deletes append duplicate ids
        dead_ids = dead.select("neighbor_id").distinct()
        n_dead = dead_ids.count()
        survivors = idx.join(
            F.broadcast(dead_ids), "neighbor_id", "left_anti"
        )
    live = os.path.join(index_dir, "data")
    # underscore prefix: legacy-layout readers scan the index ROOT, and
    # Spark's partition discovery dies on a visible sibling dir with a
    # different structure ("Conflicting directory structures") for the
    # whole rewrite — `_`-prefixed paths are invisible to it
    tmp = os.path.join(index_dir, "_data.vacuum.tmp")
    fs.delete(tmp)
    survivors.write.partitionBy("bprefix").mode("overwrite").parquet(tmp)
    if legacy:
        # migration publish: data/ did not exist, so the single rename
        # is the whole swap (readers prefer data/ the moment it lands);
        # the old root partitions are dropped after
        if not fs.rename_dir(tmp, live):
            raise OSError(f"vacuum: could not publish {tmp} at {live}")
        for name in fs.listdir(index_dir):
            if name.startswith("bprefix=") or name == "_SUCCESS":
                fs.delete(os.path.join(index_dir, name))
    else:
        _swap_data_dir(fs, live, tmp)
    _drop_scanned(fs, index_dir, batches, tomb_files)
    return int(n_dead)


def vacuum_pq_index(spark: SparkSession, index_dir: str) -> int:
    """PQ twin of :func:`vacuum_ann_index`: fold the staged streaming
    code batches and tombstone files ENUMERATED AT SCAN TIME into
    ``codes/`` (codebooks and meta are id-free and survive as-is),
    swap, then drop exactly that snapshot — a batch a live
    :func:`attach_pq_index_stream` commits mid-vacuum survives staged
    (same concurrent-ingest contract as the LSH vacuum). Returns the
    tombstone count."""
    fs = _index_fs(index_dir, spark)
    batches = _list_stream_batches(spark, index_dir)
    tomb_files = _list_deleted_files(spark, index_dir)
    if not batches and not tomb_files:
        return 0
    codes_dir = os.path.join(index_dir, "codes")
    codes = spark.read.parquet(codes_dir)
    # staged raw vectors encode under the CURRENT codebooks as they
    # fold (legacy code-only batches pass through)
    staged = _read_stream_codes(spark, index_dir, batches=batches)
    if staged is not None:
        codes = codes.unionByName(staged.select(*codes.columns))
    dead = _read_deleted(spark, index_dir, files=tomb_files)
    survivors, n_dead = codes, 0
    if dead is not None:
        # distinct: replayed streaming deletes append duplicate ids
        dead_ids = dead.select("neighbor_id").distinct()
        n_dead = dead_ids.count()
        survivors = codes.join(
            F.broadcast(dead_ids), "neighbor_id", "left_anti"
        )
    tmp = codes_dir.rstrip("/") + ".vacuum.tmp"
    fs.delete(tmp)
    survivors.write.mode("overwrite").parquet(tmp)
    _swap_data_dir(fs, codes_dir, tmp)
    _drop_scanned(fs, index_dir, batches, tomb_files)
    return int(n_dead)


_PQ_META = "_PQ_META.json"


def build_pq_index(
    corpus: DataFrame,
    index_dir: str,
    vec_col: str,
    id_col: str,
    m_subspaces: int = 4,
    n_codes: int = 16,
    codebooks: DataFrame | None = None,
) -> dict:
    """Materialize a product-quantization index (the s09 machinery,
    FAISS's `IndexPQ` shape) under ``index_dir`` — build-once /
    query-many for the codebook-compression arm, completing this
    module's persistence story (LSH buckets above, PQ codes here):

    * ``codes/`` — one parquet row per (neighbor_id, m, code): the
      whole corpus at ``m_subspaces`` small ints per vector, the
      memory shape billion-vector serving uses (the full-precision
      vectors stay in the corpus and are read only for the final
      shortlist rescore);
    * ``codebooks/`` — the ``m × n_codes`` centroids;
    * ``_PQ_META.json`` — geometry (dim, m_subspaces, n_codes), so a
      query session validates against the build.

    ``codebooks`` defaults to the deterministic smallest-id rule
    (shared helper with :func:`similarity.pq_topk`, so index answers
    are IDENTICAL to the one-shot operator — pinned by test); pass
    k-means-trained codebooks for production recall."""
    from southpaw_spark.operators.similarity import (
        _pq_default_codebooks,
        _pq_encode,
    )

    spark = corpus.sparkSession
    probe = corpus.select(F.col(vec_col)).first()
    if probe is None or probe[0] is None:
        raise ValueError(
            f"build_pq_index: corpus is empty or first {vec_col!r} is "
            "NULL — cannot infer the vector dimension"
        )
    dim = len(probe[0])
    if dim % m_subspaces:
        raise ValueError(
            f"dim {dim} not divisible by m_subspaces {m_subspaces}"
        )
    sub = dim // m_subspaces
    ms = spark.range(m_subspaces).select(F.col("id").cast("int").alias("m"))
    if codebooks is None:
        codebooks = _pq_default_codebooks(
            corpus, vec_col, id_col, n_codes, ms, sub
        )
    codebooks = codebooks.cache()
    codebooks.write.mode("overwrite").parquet(
        os.path.join(index_dir, "codebooks")
    )
    _pq_encode(corpus, vec_col, id_col, codebooks, ms, sub).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "codes"))
    # baseline quantization residual (mean over (vector, subspace) of
    # the squared distance to the chosen centroid): the drift guard's
    # reference — streamed batches whose residual grows past a factor
    # of this signal that the codebooks no longer fit the data and a
    # retrain/rebuild is due (attach_pq_index_stream)
    baseline = _pq_mean_residual(corpus, vec_col, id_col, codebooks, ms, sub)
    codebooks.unpersist()
    meta = {
        "dim": dim, "m_subspaces": m_subspaces, "n_codes": n_codes,
        "baseline_residual": baseline,
    }
    _write_json_atomic(
        _index_fs(index_dir, spark), os.path.join(index_dir, _PQ_META), meta
    )
    return meta


def _pq_mean_residual(
    df: DataFrame, vec_col: str, id_col: str, codebooks, ms, sub: int
) -> float:
    """Mean squared quantization error over (vector, subspace) pairs —
    the distance each subvector sits from its NEAREST centroid. Small
    when the codebooks fit the data; grows when the distribution
    drifts. One broadcast join + one agg, no shuffle of the vectors."""
    from southpaw_spark.operators.similarity import _l2sq, _pq_subvecs

    dist = _l2sq(F.col("__sv"), F.col("centroid"))
    row = (
        _pq_subvecs(df, id_col, vec_col, ms, sub)
        .join(F.broadcast(codebooks), "m")
        .groupBy(id_col, "m")
        .agg(F.min(F.round(dist, 8)).alias("r"))
        .agg(F.avg("r").alias("mean_r"))
        .first()
    )
    return float(row["mean_r"]) if row and row["mean_r"] is not None else 0.0


_PQ_DRIFT = "_PQ_DRIFT.json"
_IVF_DRIFT = "_IVF_DRIFT.json"


def _read_drift(index_dir: str, fname: str, spark=None) -> dict:
    try:
        return _read_json(
            _index_fs(index_dir, spark), os.path.join(index_dir, fname)
        )
    except (OSError, ValueError):
        return {"batches": {}, "retrain_recommended": False}


def _record_drift(
    index_dir: str, fname: str, batch_id: int, residual: float,
    baseline: float | None, drift_factor: float, spark=None,
) -> None:
    """Record a streamed batch's quantization residual against the
    build-time baseline (keyed by batch id, so replays are idempotent)
    and maintain the ``retrain_recommended`` flag."""
    drift = _read_drift(index_dir, fname, spark=spark)
    drift.setdefault("batches", {})[str(batch_id)] = residual
    drift["baseline_residual"] = baseline
    drift["drift_factor"] = drift_factor
    drift["retrain_recommended"] = bool(
        baseline is not None
        and any(
            r > drift_factor * max(baseline, 1e-12)
            for r in drift["batches"].values()
        )
    )
    _write_json_atomic(
        _index_fs(index_dir, spark), os.path.join(index_dir, fname), drift
    )


def pq_index_drift(index_dir: str) -> dict:
    """Read the drift sidecar maintained by
    :func:`attach_pq_index_stream`: per-batch residuals, the build
    baseline, and the ``retrain_recommended`` flag."""
    return _read_drift(index_dir, _PQ_DRIFT)


def ivf_index_drift(index_dir: str) -> dict:
    """Drift sidecar reader for :func:`attach_ivf_index_stream`."""
    return _read_drift(index_dir, _IVF_DRIFT)


def attach_pq_index_stream(
    vectors: DataFrame,
    index_dir: str,
    vec_col: str,
    id_col: str,
    checkpoint_dir: str,
    tombstone_col: str | None = None,
    trigger: dict | None = None,
    drift_factor: float = 4.0,
):
    """Continuous PQ-index maintenance — the streaming arm the LSH
    index got in round 13 (:func:`attach_index_stream`), closing the
    'PQ rebuilds on a cadence' gap: streamed vectors encode against
    the stored codebooks (never re-derived, the
    :func:`add_to_pq_index` invariant), so ``build(A)`` + ``stream(B)``
    answers queries identically to ``build(A ∪ B)`` with those
    codebooks — pinned by parity test.

    EXACTLY-ONCE adds: each micro-batch's RAW vectors land with
    overwrite in ``_stream/batch=<id>/`` (stable batch ids per
    checkpoint), so an at-least-once replay rewrites the same files;
    the encode happens at query/fold time against the codebooks
    current THEN (see :func:`_read_stream_codes` — this is what makes
    a mid-stream :func:`retrain_pq_index` safe). Queries union the
    staging area; :func:`vacuum_pq_index` folds it into ``codes/``.
    ``tombstone_col`` rows delete ids (shared tombstone layout).

    DRIFT GUARD — the honest limit of frozen codebooks: each batch's
    mean quantization residual (see :func:`_pq_mean_residual`) is
    recorded in ``_PQ_DRIFT.json`` keyed by batch id (replay-
    idempotent); when a batch's residual exceeds ``drift_factor`` × the
    build-time baseline, ``retrain_recommended`` flips true. Ingest
    continues (codes stay valid, recall degrades gracefully) — the flag
    is the retrain/rebuild trigger a scheduler polls via
    :func:`pq_index_drift`. Returns the started ``StreamingQuery``."""
    meta = _read_json(
        _index_fs(index_dir, vectors.sparkSession),
        os.path.join(index_dir, _PQ_META),
    )
    sub = meta["dim"] // meta["m_subspaces"]
    baseline = meta.get("baseline_residual")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        adds = batch_df
        if tombstone_col is not None:
            dead = batch_df.where(
                F.coalesce(F.col(tombstone_col), F.lit(False))
            ).select(F.col(id_col))
            if dead.limit(1).count() > 0:
                remove_from_index(dead.distinct(), index_dir, id_col)
            adds = batch_df.where(
                ~F.coalesce(F.col(tombstone_col), F.lit(False))
            )
        adds = adds.cache()
        try:
            # skip empty staging dirs (same schema-inference hazard as
            # the LSH arm); replay-safe — a replayed batch is identical
            if adds.limit(1).count() == 0:
                return
            # raw-vector staging: encoding happens at query/fold time
            # against the codebooks CURRENT then, so a concurrent
            # retrain's codebook swap cannot leave this batch's codes
            # undecodable (see `_read_stream_codes`)
            adds.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cv"),
            ).write.mode("overwrite").parquet(
                os.path.join(index_dir, _STREAM, f"batch={batch_id}")
            )
            ms = spark.range(meta["m_subspaces"]).select(
                F.col("id").cast("int").alias("m")
            )
            codebooks = spark.read.parquet(
                os.path.join(index_dir, "codebooks")
            )
            _record_drift(
                index_dir, _PQ_DRIFT, batch_id,
                _pq_mean_residual(adds, vec_col, id_col, codebooks, ms, sub),
                baseline, drift_factor, spark=spark,
            )
        finally:
            adds.unpersist()

    writer = vectors.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def _read_stream_codes(spark: SparkSession, index_dir: str,
                       batches: list[str] | None = None,
                       meta: dict | None = None):
    """Staged PQ rows in ``codes/`` shape ``(neighbor_id, m, code)``,
    or None when no staging batches exist.

    Round-15 staging stores RAW ``(neighbor_id, cv)`` vectors — they
    encode HERE against the codebooks CURRENT at read time, so a batch
    staged concurrently with a :func:`retrain_pq_index` codebook swap
    still produces codes the retrained ADC tables can decode (stored
    codes would silently compute garbage distances after the swap).
    Legacy code-only staging dirs pass through unchanged (correct as
    long as no retrain intervened — the pre-round-15 contract).
    ``batches`` scopes the read to a scan-time snapshot (vacuum)."""
    from southpaw_spark.operators.similarity import _pq_encode

    path = os.path.join(index_dir, _STREAM)
    if batches is None:
        batches = _list_stream_batches(spark, index_dir)
    if not batches:
        return None
    if meta is None:
        meta = _read_json(
            _index_fs(index_dir, spark), os.path.join(index_dir, _PQ_META)
        )
    sub = meta["dim"] // meta["m_subspaces"]
    ms = spark.range(meta["m_subspaces"]).select(
        F.col("id").cast("int").alias("m")
    )
    codebooks = None
    out = None
    for b in batches:
        df = spark.read.parquet(os.path.join(path, b))
        if "cv" in df.columns:
            if codebooks is None:
                codebooks = spark.read.parquet(
                    os.path.join(index_dir, "codebooks")
                )
            part = _pq_encode(
                df.select("neighbor_id", "cv"), "cv", "neighbor_id",
                codebooks, ms, sub,
            )
        else:
            part = df
        part = part.select("neighbor_id", "m", "code")
        out = part if out is None else out.unionByName(part)
    return out


def query_pq_index(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    oversample: int = 4,
) -> DataFrame:
    """Answer a query batch against a built PQ index: the stored codes
    replace the encode pass (``pq_topk``'s ``codes`` seam), so per
    query batch the work is the broadcast ADC scan over ``N·m`` small
    ints plus the shortlist's exact-cosine rescore against the corpus
    — identical output to running :func:`similarity.pq_topk` with the
    same geometry (pinned by test). ``queries`` carries
    (query_id, query_vec); output matches ``cosine_topk``."""
    from southpaw_spark.operators.similarity import pq_topk

    meta = _read_json(
        _index_fs(index_dir, spark), os.path.join(index_dir, _PQ_META)
    )
    codes = spark.read.parquet(os.path.join(index_dir, "codes"))
    staged = _read_stream_codes(spark, index_dir, meta=meta)
    if staged is not None:
        codes = codes.unionByName(staged.select(*codes.columns))
    codes = _apply_deleted(spark, index_dir, codes)
    codebooks = spark.read.parquet(os.path.join(index_dir, "codebooks"))
    return pq_topk(
        corpus, queries, vec_col, id_col, k=k,
        m_subspaces=meta["m_subspaces"], n_codes=meta["n_codes"],
        codebooks=codebooks, oversample=oversample, codes=codes,
    )


def add_to_pq_index(
    new_vectors: DataFrame,
    index_dir: str,
    vec_col: str,
    id_col: str,
) -> None:
    """Incrementally add vectors to a built PQ index — the continuous-
    ingest path, symmetric with :func:`add_to_ann_index`: the new
    vectors are encoded against the STORED codebooks (never re-derived,
    so ``build(A)`` + ``add(B)`` answers queries identically to
    ``build(A ∪ B)`` with those same codebooks — pinned by test) and
    their code rows append to ``codes/``. Callers own id uniqueness
    (appending an existing id duplicates it); codebook drift is the
    rebuild trigger — when new data's distribution outgrows the trained
    centroids, retrain via :func:`retrain_pq_index`."""
    from southpaw_spark.operators.similarity import _pq_encode

    spark = new_vectors.sparkSession
    meta = _read_json(
        _index_fs(index_dir, spark), os.path.join(index_dir, _PQ_META)
    )
    sub = meta["dim"] // meta["m_subspaces"]
    ms = spark.range(meta["m_subspaces"]).select(
        F.col("id").cast("int").alias("m")
    )
    codebooks = spark.read.parquet(os.path.join(index_dir, "codebooks"))
    _pq_encode(new_vectors, vec_col, id_col, codebooks, ms, sub).write.mode(
        "append"
    ).parquet(os.path.join(index_dir, "codes"))


# ---------------------------------------------------------------------------
# Persistent IVF index — the trained-coarse-quantizer arm (s03's
# machinery as a build-once / query-many store), completing the
# persistent family's symmetry: LSH buckets, PQ codes, IVF cells.
# ---------------------------------------------------------------------------

_IVF_META = "_IVF_META.json"


def _ivf_assign(df: DataFrame, vec_col: str, id_col: str, centroids):
    """Assign each vector to its nearest centroid (squared-L2 argmin,
    engine-exact ``min_by`` on ``(round(dist², 8), cell)`` — the same
    deterministic rule as PQ encoding, so streamed adds assign exactly
    like a rebuild). Returns (neighbor_id, cv, cell)."""
    from southpaw_spark.operators.similarity import _l2sq

    dist = _l2sq(F.col(vec_col).cast("array<double>"), F.col("centroid"))
    return (
        df.crossJoin(F.broadcast(centroids))
        .groupBy(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
        )
        .agg(
            F.min_by(
                "cell", F.struct(F.round(dist, 8).alias("d"), F.col("cell"))
            ).alias("cell")
        )
    )


def _ivf_mean_residual(
    df: DataFrame, vec_col: str, id_col: str, centroids
) -> float:
    """Mean squared distance to the NEAREST centroid — small when the
    cells fit the data, grows on distribution drift (the IVF drift
    guard's signal, symmetric with :func:`_pq_mean_residual`)."""
    from southpaw_spark.operators.similarity import _l2sq

    dist = _l2sq(F.col(vec_col).cast("array<double>"), F.col("centroid"))
    row = (
        df.crossJoin(F.broadcast(centroids))
        .groupBy(F.col(id_col))
        .agg(F.min(F.round(dist, 8)).alias("r"))
        .agg(F.avg("r").alias("mean_r"))
        .first()
    )
    return float(row["mean_r"]) if row and row["mean_r"] is not None else 0.0


def build_ivf_index(
    corpus: DataFrame,
    index_dir: str,
    vec_col: str,
    id_col: str,
    n_cells: int | None = None,
    train_cap: int = 100_000,
    seed: int = 42,
    centroids: DataFrame | None = None,
) -> dict:
    """Materialize an inverted-file ANN index (FAISS ``IndexIVFFlat``
    shape) under ``index_dir``:

    * ``cells/`` — corpus rows ``(neighbor_id, cv)`` PARTITIONED BY the
      assigned cell, so a query batch's probe set turns into a
      partition-pruned read (only the probed cell directories are
      listed and scanned — the 100 TB property);
    * ``centroids/`` — the trained coarse quantizer (``≈√N`` cells by
      default, k-means on a ``train_cap``-bounded sample — centroid
      quality needs a sample, not the corpus);
    * ``_IVF_META.json`` — geometry + the baseline quantization
      residual for the drift guard.

    Assignment is the deterministic squared-L2 argmin over the stored
    centroids (``_ivf_assign``), NOT ``model.transform`` — streamed
    adds must assign exactly like the build. Pass ``centroids`` to
    reuse a quantizer (the truth-side of the stream parity test does).
    """
    import math

    spark = corpus.sparkSession
    probe = corpus.select(F.col(vec_col)).first()
    if probe is None or probe[0] is None:
        raise ValueError(
            f"build_ivf_index: corpus is empty or first {vec_col!r} is "
            "NULL — cannot infer the vector dimension"
        )
    dim = len(probe[0])
    if centroids is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        n = corpus.count()
        if n_cells is None:
            n_cells = max(2, min(4096, int(math.sqrt(n))))
        train = corpus.select(
            array_to_vector(F.col(vec_col).cast("array<double>")).alias(
                "features"
            )
        )
        if n > train_cap:
            train = train.sample(fraction=min(1.0, train_cap / n), seed=seed)
        model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(train)
        centroids = spark.createDataFrame(
            [
                (i, [float(x) for x in c])
                for i, c in enumerate(model.clusterCenters())
            ],
            "cell int, centroid array<double>",
        )
    centroids = centroids.cache()
    n_cells = centroids.count()
    centroids.write.mode("overwrite").parquet(
        os.path.join(index_dir, "centroids")
    )
    _ivf_assign(corpus, vec_col, id_col, centroids).write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(os.path.join(index_dir, "cells"))
    baseline = _ivf_mean_residual(corpus, vec_col, id_col, centroids)
    centroids.unpersist()
    meta = {"dim": dim, "n_cells": int(n_cells),
            "baseline_residual": baseline}
    _write_json_atomic(
        _index_fs(index_dir, spark), os.path.join(index_dir, _IVF_META), meta
    )
    return meta


def _read_stream_cells(spark: SparkSession, index_dir: str,
                       batches: list[str] | None = None):
    """IVF staged rows as RAW ``(neighbor_id, cv)`` — see
    :func:`_read_stream_vectors` (legacy dirs carried a stored
    ``cell``; consumers re-assign against the CURRENT centroids, so a
    batch staged mid-:func:`retrain_ivf_index` can never be folded
    into cells the retrained quantizer will not probe)."""
    return _read_stream_vectors(spark, index_dir, batches, ("cell=",))


def query_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """Answer a query batch against a built IVF index. Output matches
    ``ivf_kmeans_topk`` run with the same centroids (pinned by test):
    (query_id, neighbor_id, rank, cosine).

    Plan shape: the (small) centroid table broadcasts for per-query
    probe ranking (cosine desc — the ``ivf_kmeans_topk`` rule); the
    probed cell ids collect to the driver (bounded by ``n_cells``) and
    become a PARTITION FILTER on ``cells/`` — only probed directories
    are scanned; candidates come from an equi-join on cell; exact
    cosine + the top-k window run on candidates only."""
    _read_json(  # existence/shape check
        _index_fs(index_dir, spark), os.path.join(index_dir, _IVF_META)
    )
    centroids = spark.read.parquet(os.path.join(index_dir, "centroids"))
    qcos = F.try_divide(
        _dot(F.col("query_vec"), F.col("centroid")),
        _norm(F.col("query_vec")) * _norm(F.col("centroid")),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.round(qcos, 8).desc(), F.col("cell")
    )
    probes = (
        queries.join(F.broadcast(centroids))
        .withColumn("__pr", F.row_number().over(wq))
        .where(F.col("__pr") <= n_probe)
        .select("query_id", "query_vec", "cell")
    )
    # bounded collect (≤ n_cells ints): the partition-prune lever
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    base = (
        spark.read.parquet(os.path.join(index_dir, "cells"))
        .where(F.col("cell").isin(cells))
        .select("neighbor_id", "cv", "cell")
    )
    # per-branch joins, same rationale as `query_ann_index`: the
    # staged branch's cell is a derived assignment, and joining a
    # union of {partitioned scan, derived projection} on the partition
    # column can trip Spark's dynamic-partition-pruning planner
    joined = base.join(F.broadcast(probes), "cell")
    staged = _read_stream_cells(spark, index_dir)
    if staged is not None:
        # staged raw vectors assign against the current centroids here
        # (vacuum-bounded set — the unpruned staged scan stays small)
        joined = joined.unionByName(
            _ivf_assign(staged, "cv", "neighbor_id", centroids)
            .where(F.col("cell").isin(cells))
            .select("neighbor_id", "cv", "cell")
            .join(F.broadcast(probes), "cell")
        )
    joined = _apply_deleted(spark, index_dir, joined).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.try_divide(
        _dot(F.col("query_vec"), F.col("cv")),
        _norm(F.col("query_vec")) * _norm(F.col("cv")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 8).desc(), F.col("neighbor_id")
    )
    return (
        joined.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where((F.col("rank") <= k) & F.col("cosine").isNotNull())
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def attach_ivf_index_stream(
    vectors: DataFrame,
    index_dir: str,
    vec_col: str,
    id_col: str,
    checkpoint_dir: str,
    tombstone_col: str | None = None,
    trigger: dict | None = None,
    drift_factor: float = 4.0,
):
    """Continuous IVF-index maintenance — the third streaming arm
    (LSH round 13, PQ + this round 14): streamed vectors stage RAW
    (``_stream/batch=<id>/``, overwrite absorbs replays) and assign
    against the centroids current at query/fold time (so
    ``build(A)`` + ``stream(B)`` ≡ rebuild-with-those-centroids —
    parity-pinned — and a mid-stream retrain cannot strand a batch),
    tombstones shared, staging folded by :func:`vacuum_ivf_index`.
    The drift guard mirrors the PQ arm: per-batch mean residual vs the
    build baseline, ``retrain_recommended`` past ``drift_factor``× —
    read it with :func:`ivf_index_drift`. Returns the started query."""
    meta = _read_json(
        _index_fs(index_dir, vectors.sparkSession),
        os.path.join(index_dir, _IVF_META),
    )
    baseline = meta.get("baseline_residual")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        adds = batch_df
        if tombstone_col is not None:
            dead = batch_df.where(
                F.coalesce(F.col(tombstone_col), F.lit(False))
            ).select(F.col(id_col))
            if dead.limit(1).count() > 0:
                remove_from_index(dead.distinct(), index_dir, id_col)
            adds = batch_df.where(
                ~F.coalesce(F.col(tombstone_col), F.lit(False))
            )
        adds = adds.cache()
        try:
            if adds.limit(1).count() == 0:
                return  # no empty staging dirs (schema-inference hazard)
            # raw-vector staging: cell assignment happens at query/fold
            # time against the centroids CURRENT then, so a concurrent
            # retrain's centroid swap cannot strand this batch
            adds.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cv"),
            ).write.mode("overwrite").parquet(
                os.path.join(index_dir, _STREAM, f"batch={batch_id}")
            )
            centroids = spark.read.parquet(
                os.path.join(index_dir, "centroids")
            )
            _record_drift(
                index_dir, _IVF_DRIFT, batch_id,
                _ivf_mean_residual(adds, vec_col, id_col, centroids),
                baseline, drift_factor, spark=spark,
            )
        finally:
            adds.unpersist()

    writer = vectors.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def vacuum_ivf_index(spark: SparkSession, index_dir: str) -> int:
    """IVF twin of :func:`vacuum_pq_index`: fold the scan-time snapshot
    of staged streaming cell batches and tombstone files into
    ``cells/`` (centroids and meta are id-free), swap, drop exactly
    that snapshot — a batch committed mid-vacuum by a live
    :func:`attach_ivf_index_stream` survives staged. Returns the
    distinct tombstoned-id count."""
    fs = _index_fs(index_dir, spark)
    batches = _list_stream_batches(spark, index_dir)
    tomb_files = _list_deleted_files(spark, index_dir)
    if not batches and not tomb_files:
        return 0
    cells_dir = os.path.join(index_dir, "cells")
    rows = spark.read.parquet(cells_dir).select("neighbor_id", "cv", "cell")
    staged = _read_stream_cells(spark, index_dir, batches=batches)
    if staged is not None:
        # staged raw vectors fold under the CURRENT centroids
        centroids = spark.read.parquet(os.path.join(index_dir, "centroids"))
        rows = rows.unionByName(
            _ivf_assign(staged, "cv", "neighbor_id", centroids).select(
                "neighbor_id", "cv", "cell"
            )
        )
    dead = _read_deleted(spark, index_dir, files=tomb_files)
    survivors, n_dead = rows, 0
    if dead is not None:
        dead_ids = dead.select("neighbor_id").distinct()
        n_dead = dead_ids.count()
        survivors = rows.join(
            F.broadcast(dead_ids), "neighbor_id", "left_anti"
        )
    tmp = cells_dir.rstrip("/") + ".vacuum.tmp"
    fs.delete(tmp)
    survivors.write.partitionBy("cell").mode("overwrite").parquet(tmp)
    _swap_data_dir(fs, cells_dir, tmp)
    _drop_scanned(fs, index_dir, batches, tomb_files)
    return int(n_dead)


# ---------------------------------------------------------------------------
# Retrain — acting on the drift guards. The streaming arms flag
# ``retrain_recommended`` when streamed batches' quantization residual
# outgrows the build baseline; these ops re-train the quantizer on the
# CURRENT survivors (main + staged − tombstones), re-encode, and swap
# atomically (the vacuum's out-of-place discipline): the old index
# answers queries until the swap, and the drift baseline resets.
# ---------------------------------------------------------------------------


def retrain_ivf_index(
    spark: SparkSession,
    index_dir: str,
    n_cells: int | None = None,
    train_cap: int = 100_000,
    seed: int = 42,
    centroids: DataFrame | None = None,
) -> dict:
    """Re-train a drifted IVF index in place: gather the survivors
    (``cells/`` ∪ scan-time staged batches − scan-time tombstones —
    the full vectors live in the index, so no corpus is needed), fit a
    fresh coarse quantizer on them, re-assign, and publish via the
    vacuum swap (``cells/`` then ``centroids/`` back-to-back; the old
    index answers until then). The folded staging batches / tombstone
    files are dropped exactly (concurrent-ingest safe, same contract
    as :func:`vacuum_ivf_index`; a batch staged mid-retrain survives
    as raw vectors and assigns against the NEW centroids at query/fold
    time). ``n_cells=None`` keeps the live meta's cell count — the
    operating point the index was built with — rather than silently
    re-auto-sizing; pass an explicit value to resize.
    The meta baseline resets to the retrained residual and the drift
    sidecar clears, so ``retrain_recommended`` starts FALSE again.
    Equivalent to :func:`build_ivf_index` on the survivor set (pinned
    by parity test). Returns the new meta dict."""
    fs = _index_fs(index_dir, spark)
    if n_cells is None and centroids is None:
        n_cells = int(
            _read_json(fs, os.path.join(index_dir, _IVF_META))["n_cells"]
        )
    batches = _list_stream_batches(spark, index_dir)
    tomb_files = _list_deleted_files(spark, index_dir)
    cells_dir = os.path.join(index_dir, "cells")
    rows = spark.read.parquet(cells_dir).select("neighbor_id", "cv")
    staged = _read_stream_cells(spark, index_dir, batches=batches)
    if staged is not None:
        rows = rows.unionByName(staged.select("neighbor_id", "cv"))
    dead = _read_deleted(spark, index_dir, files=tomb_files)
    if dead is not None:
        rows = rows.join(
            F.broadcast(dead.select("neighbor_id").distinct()),
            "neighbor_id", "left_anti",
        )
    tmp_index = index_dir.rstrip("/") + ".retrain.tmp"
    fs.delete(tmp_index)
    # a fresh build on the survivors IS the retrain (same training,
    # assignment, and baseline-residual code paths — no drift between
    # "retrained" and "rebuilt" semantics possible)
    meta = build_ivf_index(
        rows, tmp_index, "cv", "neighbor_id",
        n_cells=n_cells, train_cap=train_cap, seed=seed,
        centroids=centroids,
    )
    _swap_data_dir(fs, cells_dir, os.path.join(tmp_index, "cells"))
    _swap_data_dir(
        fs,
        os.path.join(index_dir, "centroids"),
        os.path.join(tmp_index, "centroids"),
    )
    _write_json_atomic(fs, os.path.join(index_dir, _IVF_META), meta)
    fs.delete(os.path.join(index_dir, _IVF_DRIFT))  # reset the guard
    fs.delete(tmp_index)
    _drop_scanned(fs, index_dir, batches, tomb_files)
    return meta


def retrain_pq_index(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    m_subspaces: int | None = None,
    n_codes: int | None = None,
    codebooks: DataFrame | None = None,
) -> dict:
    """PQ twin of :func:`retrain_ivf_index`. PQ codes are lossy, so the
    full-precision vectors come from ``corpus`` (which must carry every
    surviving indexed id — the same table the shortlist rescore reads):
    survivors = distinct ids in ``codes/`` ∪ scan-time staged batches −
    scan-time tombstones, semi-joined against ``corpus``. Codebooks are
    re-derived on those vectors (``codebooks=None`` → the deterministic
    default rule; pass k-means-trained ones for production recall),
    every survivor re-encodes, and ``codes/`` + ``codebooks/`` swap
    back-to-back. Geometry defaults to the live meta's. The drift
    sidecar clears and the baseline resets. Equivalent to
    :func:`build_pq_index` on the survivor vectors (parity-pinned).
    Returns the new meta dict."""
    fs = _index_fs(index_dir, spark)
    live_meta = _read_json(fs, os.path.join(index_dir, _PQ_META))
    m_subspaces = m_subspaces or live_meta["m_subspaces"]
    n_codes = n_codes or live_meta["n_codes"]
    batches = _list_stream_batches(spark, index_dir)
    tomb_files = _list_deleted_files(spark, index_dir)
    codes_dir = os.path.join(index_dir, "codes")
    ids = spark.read.parquet(codes_dir).select("neighbor_id")
    for b in batches:
        # ids only — both staging layouts carry neighbor_id, and the
        # re-encode `_read_stream_codes` would do is wasted work here
        ids = ids.unionByName(
            spark.read.parquet(
                os.path.join(index_dir, _STREAM, b)
            ).select("neighbor_id")
        )
    ids = ids.distinct()
    dead = _read_deleted(spark, index_dir, files=tomb_files)
    if dead is not None:
        ids = ids.join(
            F.broadcast(dead.select("neighbor_id").distinct()),
            "neighbor_id", "left_anti",
        )
    survivors = corpus.join(
        ids.withColumnRenamed("neighbor_id", id_col), id_col, "left_semi"
    )
    tmp_index = index_dir.rstrip("/") + ".retrain.tmp"
    fs.delete(tmp_index)
    meta = build_pq_index(
        survivors, tmp_index, vec_col, id_col,
        m_subspaces=m_subspaces, n_codes=n_codes, codebooks=codebooks,
    )
    _swap_data_dir(fs, codes_dir, os.path.join(tmp_index, "codes"))
    _swap_data_dir(
        fs,
        os.path.join(index_dir, "codebooks"),
        os.path.join(tmp_index, "codebooks"),
    )
    _write_json_atomic(fs, os.path.join(index_dir, _PQ_META), meta)
    fs.delete(os.path.join(index_dir, _PQ_DRIFT))  # reset the guard
    fs.delete(tmp_index)
    _drop_scanned(fs, index_dir, batches, tomb_files)
    return meta


def ivf_index_sink(
    index_dir: str,
    vec_col: str,
    id_col: str,
    drift_factor: float = 4.0,
):
    """Corpus-pipeline → persistent-index wiring: returns a
    ``sink(kept_df, batch_id)`` for :func:`pipelines.corpus_stream`
    that stages each micro-batch's KEPT embeddings into a built IVF
    index exactly as :func:`attach_ivf_index_stream`'s foreachBatch
    does — same frozen-centroid assignment, same exactly-once
    ``_stream/batch=<id>`` staging (the corpus stream's stable batch
    ids make replays overwrite), same drift ledger. Pair it with a
    ``decisions_sink`` that routes dedup drops to
    :func:`remove_from_index` for the full
    dedup-drops → index-tombstones loop: a document the deduper
    retroactively unkeeps (``fuzzy_keep='best_quality'`` keeper swap)
    stops answering similarity queries in the same run (pinned by the
    corpus→index integration test)."""
    def _sink(kept: DataFrame, batch_id: int) -> None:
        spark = kept.sparkSession
        meta = _read_json(
            _index_fs(index_dir, spark), os.path.join(index_dir, _IVF_META)
        )
        # cache: the kept-docs plan re-executes per action otherwise —
        # three actions here, each replaying the upstream dedup chain
        adds = kept.select(F.col(id_col), F.col(vec_col)).cache()
        try:
            if adds.limit(1).count() == 0:
                return  # no empty staging dirs (schema-inference hazard)
            adds.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cv"),
            ).write.mode("overwrite").parquet(
                os.path.join(index_dir, _STREAM, f"batch={batch_id}")
            )
            centroids = spark.read.parquet(
                os.path.join(index_dir, "centroids")
            )
            _record_drift(
                index_dir, _IVF_DRIFT, batch_id,
                _ivf_mean_residual(adds, vec_col, id_col, centroids),
                meta.get("baseline_residual"), drift_factor, spark=spark,
            )
        finally:
            adds.unpersist()

    return _sink


def index_tombstone_decisions_sink(index_dir: str, id_col: str):
    """The decisions half of the corpus→index wiring: returns a
    ``decisions_sink(decisions_df, batch_id)`` for
    :func:`pipelines.corpus_stream` that tombstones every doc the
    deduper decided AGAINST (``keeper_id != doc_id``) — covering both
    on-arrival drops (no-op if the doc was never indexed) and
    retroactive keeper swaps (the previously indexed loser stops
    answering). Tombstone appends are idempotent under replay (the
    query-side anti-join and the vacuums both distinct them)."""
    def _sink(decisions: DataFrame, batch_id: int) -> None:
        dropped = decisions.where(
            F.col("keeper_id") != F.col(id_col)
        ).select(F.col(id_col))
        if dropped.limit(1).count() == 0:
            return
        remove_from_index(dropped.distinct(), index_dir, id_col)

    return _sink


def ann_index_occupancy(spark: SparkSession, index_dir: str) -> dict:
    """LSH twin of the PQ/IVF drift guards: the LSH index has no
    trained quantizer to drift, but its plane count is fixed at build
    time, so expected bucket occupancy GROWS with the corpus — query
    cost per probe grows with it. Reports current survivor count, the
    plane count, the mean rows per non-empty bucket, and
    ``rebuild_recommended`` (occupancy past the ``target_bucket`` the
    auto-sizing would pick more planes for, same 2× slack
    ``dedup.auto_n_planes`` uses). Poll it like
    :func:`pq_index_drift`; act with :func:`rebuild_ann_index`."""
    fs = _index_fs(index_dir, spark)
    meta = _read_json(fs, os.path.join(index_dir, _META))
    rows = spark.read.parquet(_lsh_data_dir(fs, index_dir)).select(
        "neighbor_id", "bucket"
    )
    streamed = _read_stream_rows(spark, index_dir)
    if streamed is not None:
        rows = rows.unionByName(
            _bucket_staged(streamed, meta).select("neighbor_id", "bucket")
        )
    rows = _apply_deleted(spark, index_dir, rows)
    agg = rows.groupBy("bucket").count().agg(
        F.sum("count").alias("n"), F.avg("count").alias("mean_occ")
    ).first()
    n = int(agg["n"] or 0)
    mean_occ = float(agg["mean_occ"] or 0.0)
    target = int(meta.get("target_bucket", 200))
    return {
        "n_vectors": n,
        "n_planes": int(meta["n_planes"]),
        "target_bucket": target,
        "mean_bucket_occupancy": round(mean_occ, 3),
        "rebuild_recommended": bool(mean_occ > 2 * target),
    }


def rebuild_ann_index(
    spark: SparkSession,
    index_dir: str,
    n_planes: int | None = None,
    target_bucket: int | None = None,
    prefix_bits: int | None = None,
    seed: int | None = None,
) -> dict:
    """LSH act-on-the-guard op (symmetric with
    :func:`retrain_ivf_index`): re-derive the hyperplanes scaled to the
    CURRENT survivors (``data/`` ∪ scan-time staged batches − scan-time
    tombstones — the full vectors live in the index), re-bucket, and
    publish via the vacuum swap; the sidecar's pinned planes update
    atomically after the data lands, the old index answers until then,
    and the folded staging/tombstone snapshot is dropped exactly
    (concurrent-ingest safe — a batch staged mid-rebuild survives as
    raw vectors and buckets under the NEW planes at query/fold time).
    ``n_planes=None`` → auto-size to the survivor count;
    ``target_bucket``/``prefix_bits``/``seed`` default to the live
    meta's pinned values (the operating point the index was built
    with), so an unparameterized guard-triggered rebuild only grows
    the plane count. Equivalent to :func:`build_ann_index` on the
    survivor set (parity-pinned). Returns the new meta dict."""
    fs = _index_fs(index_dir, spark)
    live_meta = _read_json(fs, os.path.join(index_dir, _META))
    if target_bucket is None:
        target_bucket = int(live_meta.get("target_bucket", 200))
    if prefix_bits is None:
        prefix_bits = int(live_meta.get("prefix_bits", 10))
    if seed is None:
        seed = int(live_meta.get("seed", 42))
    batches = _list_stream_batches(spark, index_dir)
    tomb_files = _list_deleted_files(spark, index_dir)
    rows = spark.read.parquet(_lsh_data_dir(fs, index_dir)).select(
        "neighbor_id", "cv"
    )
    streamed = _read_stream_rows(spark, index_dir, batches=batches)
    if streamed is not None:
        rows = rows.unionByName(streamed.select("neighbor_id", "cv"))
    dead = _read_deleted(spark, index_dir, files=tomb_files)
    if dead is not None:
        rows = rows.join(
            F.broadcast(dead.select("neighbor_id").distinct()),
            "neighbor_id", "left_anti",
        )
    tmp_index = index_dir.rstrip("/") + ".rebuild.tmp"
    fs.delete(tmp_index)
    meta = build_ann_index(
        rows, tmp_index, "cv", "neighbor_id",
        n_planes=n_planes, target_bucket=target_bucket,
        prefix_bits=prefix_bits, seed=seed,
    )
    meta["target_bucket"] = int(target_bucket)
    _swap_data_dir(
        fs,
        os.path.join(index_dir, "data"),
        os.path.join(tmp_index, "data"),
    )
    _write_json_atomic(fs, os.path.join(index_dir, _META), meta)
    fs.delete(tmp_index)
    _drop_scanned(fs, index_dir, batches, tomb_files)
    # a migrated-from-legacy root may still carry old root partitions
    for name in fs.listdir(index_dir):
        if name.startswith("bprefix="):
            fs.delete(os.path.join(index_dir, name))
    return meta


def lsh_index_sink(index_dir: str, vec_col: str, id_col: str):
    """LSH twin of :func:`ivf_index_sink` — corpus_stream kept docs
    stage into a built LSH index as raw vectors in the exactly-once
    ``_stream/batch=<id>`` layout :func:`attach_index_stream` uses
    (buckets derive from the current planes at query/fold time)."""
    def _sink(kept: DataFrame, batch_id: int) -> None:
        _read_json(  # existence/shape check
            _index_fs(index_dir, kept.sparkSession),
            os.path.join(index_dir, _META),
        )
        rows = kept.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
        )
        if rows.limit(1).count() == 0:
            return
        rows.write.mode("overwrite").parquet(
            os.path.join(index_dir, _STREAM, f"batch={batch_id}")
        )

    return _sink


def pq_index_sink(
    index_dir: str,
    vec_col: str,
    id_col: str,
    drift_factor: float = 4.0,
):
    """PQ twin of :func:`ivf_index_sink` — kept docs encode against the
    STORED codebooks into the exactly-once staging layout, with the
    same drift ledger :func:`attach_pq_index_stream` maintains."""
    def _sink(kept: DataFrame, batch_id: int) -> None:
        spark = kept.sparkSession
        meta = _read_json(
            _index_fs(index_dir, spark), os.path.join(index_dir, _PQ_META)
        )
        sub = meta["dim"] // meta["m_subspaces"]
        adds = kept.select(F.col(id_col), F.col(vec_col)).cache()
        try:
            if adds.limit(1).count() == 0:
                return
            # raw-vector staging (see `_read_stream_codes`)
            adds.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cv"),
            ).write.mode("overwrite").parquet(
                os.path.join(index_dir, _STREAM, f"batch={batch_id}")
            )
            ms = spark.range(meta["m_subspaces"]).select(
                F.col("id").cast("int").alias("m")
            )
            codebooks = spark.read.parquet(
                os.path.join(index_dir, "codebooks")
            )
            _record_drift(
                index_dir, _PQ_DRIFT, batch_id,
                _pq_mean_residual(adds, vec_col, id_col, codebooks, ms, sub),
                meta.get("baseline_residual"), drift_factor, spark=spark,
            )
        finally:
            adds.unpersist()

    return _sink
