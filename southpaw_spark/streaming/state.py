"""Durable per-entity state tables (the Spark stand-in for the
reference's RocksDB ``<entity>-data`` keyspaces, SURVEY §1.1).

Design for scale: each entity's current state lives as parquet
hash-bucketed by key into ``bucket=N`` partitions. An upsert merge only
rewrites the buckets that contain delta keys — at 100 TB with a small
delta, that's a few partition rewrites, not a table rewrite (the same
copy-on-write contract Delta/Iceberg MERGE gives; those formats slot in
here unchanged when available).

Atomicity: buckets are written to a new versioned directory and the
``_CURRENT`` pointer file is flipped last, so readers never observe a
half-written merge and restarts resume from the last committed version
(the reference's flush-state-after-output ordering, ``Southpaw.java:297-315``).

Object stores: data files always go through Spark (Hadoop FS native);
the driver-side metadata ops route through ``fsio.store_fs_for`` —
plain paths keep the original POSIX code (hardlinks, ``os.replace``),
any ``scheme://`` root (``file``/``hdfs``/``s3a``/``gs``/``abfs``)
uses the JVM Hadoop FileSystem. Cost-model shifts are documented in
``fsio.py``; ``backup()``/``restore()`` stay local-by-design.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CURRENT = "_CURRENT"


def suggest_n_buckets(
    est_bytes: int,
    target_bucket_bytes: int = 256 * 1024 * 1024,
    min_parallelism: int = 16,
) -> int:
    """Size the state layout's bucket count from the estimated state
    size. Two forces (measured, BASELINE §15): a bucket must FIT an
    executor's working memory (co-located joins load one bucket per
    task — oversized buckets spill), and the bucket count IS the
    rebuild's parallelism (a bucketed scan cannot split a bucket: 16
    buckets capped a 10× rebuild at 16 tasks on 32 cores; 64 restored
    the ~6× co-located edge). So: enough buckets that each holds ≤
    ``target_bucket_bytes``, floored at ``min_parallelism`` (set it to
    ≥ the cluster's total cores). The count is a write-once layout
    property (persisted in ``_META``) — pick for the state size you
    expect, not the bootstrap size."""
    import math

    need = math.ceil(max(1, est_bytes) / target_bucket_bytes)
    return max(min_parallelism, need)


class ParquetStateStore:
    """Entity → current-rows table, hash-bucketed by primary key."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int | None = None,
        data_format: str | None = None,
    ) -> None:
        """``n_buckets`` is a physical property of the state layout:
        ``merge()`` prunes by ``bucket = hash(key) % n_buckets``, so
        reopening an existing store with a different count would silently
        break pruning (old rows for a delta key could sit outside the
        touched set and survive the anti-join as stale duplicates). The
        count is therefore persisted to a ``_META`` sidecar on first use;
        on reopen the persisted value wins, and an explicitly-passed
        conflicting value fails loudly. ``None`` means "persisted value,
        or 16 for a fresh store".

        ``data_format`` is the storage-format seam: any Spark batch
        file format ("parquet" default, "orc" tested in-repo; "delta"/
        "iceberg" slot in where their jars exist — see
        ``DeltaStateStore`` for the table-native variant). Everything
        above the physical read/write — bucket pruning, staged-version
        commit protocol, hardlinked untouched buckets, backup/restore —
        is format-agnostic. Persisted in ``_META`` like ``n_buckets``
        (reopening with a different format would misread the data
        files)."""
        self.spark = spark
        self.root = root
        from southpaw_spark.streaming.fsio import store_fs_for

        # driver-side metadata FS: plain paths run the original POSIX
        # code; scheme:// roots (file/hdfs/s3a/gs/abfs) go through the
        # Hadoop FileSystem (fsio.py documents the semantic shifts)
        self._fs = store_fs_for(spark, root)
        self._fs.mkdirs(root)
        meta = self._read_meta()
        if meta is None:
            self.n_buckets = 16 if n_buckets is None else n_buckets
            self.data_format = data_format or "parquet"
            self._write_meta(self.n_buckets, self.data_format)
        else:
            p_buckets, p_format = meta
            if n_buckets is not None and n_buckets != p_buckets:
                raise ValueError(
                    f"state dir {root!r} was laid out with n_buckets="
                    f"{p_buckets}, got n_buckets={n_buckets}; bucket "
                    "pruning would silently miss rows — delete the state "
                    "or open with the persisted count"
                )
            if data_format is not None and data_format != p_format:
                raise ValueError(
                    f"state dir {root!r} was written as {p_format!r}, "
                    f"got data_format={data_format!r} — delete the state "
                    "or open with the persisted format"
                )
            self.n_buckets = p_buckets
            self.data_format = p_format

    def _meta_path(self) -> str:
        return os.path.join(self.root, "_META")

    def _read_meta(self) -> tuple[int, str] | None:
        import json as _json

        try:
            meta = _json.loads(self._fs.read_text(self._meta_path()))
            return int(meta["n_buckets"]), str(meta.get("data_format", "parquet"))
        except (OSError, ValueError, KeyError):
            return None

    def _write_meta(self, n_buckets: int, data_format: str) -> None:
        import json as _json

        self._fs.write_text_atomic(
            self._meta_path(),
            _json.dumps({"n_buckets": n_buckets, "data_format": data_format}),
        )

    # -- paths ---------------------------------------------------------

    def _entity_dir(self, entity: str) -> str:
        return os.path.join(self.root, entity)

    def _version_of(self, entity: str) -> int | None:
        ptr = os.path.join(self._entity_dir(entity), _CURRENT)
        try:
            return int(self._fs.read_text(ptr).strip())
        except OSError:
            if not getattr(self._fs, "is_local", True) and self._fs.isdir(
                self._entity_dir(entity)
            ):
                # Off POSIX the pointer commit may fall back to
                # delete+rename (no FileContext binding for the
                # scheme) — a reader can land in that tiny no-pointer
                # window. One short retry distinguishes "mid-commit"
                # from "never committed"; data dirs are write-once so
                # whichever version we then read is consistent. The
                # entity-dir guard keeps the legitimate never-written
                # miss (every cold-start read of a fresh store) from
                # paying the sleep — only an entity with data on disk
                # can be mid-commit.
                import time

                time.sleep(0.05)
                try:
                    return int(self._fs.read_text(ptr).strip())
                except OSError:
                    return None
            return None

    def _data_dir(self, entity: str, version: int) -> str:
        return os.path.join(self._entity_dir(entity), f"v{version}")

    # -- read ----------------------------------------------------------

    def exists(self, entity: str) -> bool:
        return self._version_of(entity) is not None

    def read(self, entity: str) -> DataFrame:
        version = self._version_of(entity)
        if version is None:
            raise FileNotFoundError(f"no state for entity {entity!r}")
        return self.read_version(entity, version)

    def read_version(self, entity: str, version: int) -> DataFrame:
        """Read a specific version directory (committed or staged). Plans
        built from it pin concrete file paths, so they stay valid across a
        later commit — vacuum retention is what bounds their lifetime."""
        # explicit schema (sidecar) so empty state tables — zero parquet
        # files after an empty bootstrap — read back as empty DataFrames
        schema = self._read_schema(entity, version)
        return (
            self.spark.read.schema(schema)
            .format(self.data_format)
            .load(self._data_dir(entity, version))
            .drop("__bucket")
        )

    def read_bucketed(self, entity: str, version: int | None = None) -> DataFrame:
        """Read state as a Spark BUCKETED table scan — byte-identical
        rows to :meth:`read`, but the plan carries
        ``HashPartitioning(bucket_cols, n_buckets)``, so a downstream
        ``groupBy(bucket_cols)`` or equi-join on them runs with ZERO
        exchanges (the 8–12× co-located-flagship win of BASELINE.md §11,
        now native to the store instead of an opt-in conversion pass).

        Zero data movement: the store's physical layout already IS
        Spark's bucket function (``__bucket = pmod(hash(cols), n)`` is
        exactly ``HashPartitioning.partitionIdExpression``), so the
        version's files are HARDLINKED once into a ``v{N}.bucketed``
        mirror under Spark's bucket-encoded file naming and registered
        as an external ``CLUSTERED BY`` table (session-scoped catalog
        entry; the mirror itself is reused across sessions and vacuumed
        with its version). Requires the entity's ``_BUCKETCOLS`` sidecar
        (written by every post-round-8 init/merge); raises for legacy
        layouts — fall back to :meth:`read`."""
        if version is None:
            version = self._version_of(entity)
            if version is None:
                raise FileNotFoundError(f"no state for entity {entity!r}")
        bcols = self._read_bucket_cols(entity)
        if bcols is None:
            raise ValueError(
                f"entity {entity!r} has no _BUCKETCOLS sidecar (legacy "
                "layout) — re-init the state or use read()/read_version()"
            )
        mirror = self._ensure_bucket_mirror(entity, version)
        table = self._bucket_table_name(entity, version)
        spark = self.spark
        if not spark.catalog.tableExists(table):
            schema = self._read_schema(entity, version)
            cols_ddl = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in schema.fields
                if f.name != "__bucket"
            )
            clustered = ", ".join(f"`{c}`" for c in bcols)
            spark.sql(
                f"CREATE TABLE `{table}` ({cols_ddl}) "
                f"USING {self.data_format} "
                f"CLUSTERED BY ({clustered}) INTO {self.n_buckets} BUCKETS "
                f"LOCATION '{mirror}'"
            )
        return spark.table(table)

    def _store_id(self) -> str:
        """A random id minted once per state-root INCARNATION (persisted
        in ``_STORE_ID``): bucketed-table names embed it, so deleting a
        state dir and re-creating one at the same path can never collide
        with the session catalog's entries for the dead store (whose
        cached file listings would point at unlinked files). Within one
        incarnation, version dirs are write-once, so catalog reuse is
        safe without REFRESH."""
        path = os.path.join(self.root, "_STORE_ID")
        try:
            return self._fs.read_text(path).strip()
        except OSError:
            import uuid as _uuid

            # exclusive create: first writer wins
            self._fs.create_exclusive_text(path, _uuid.uuid4().hex[:12])
            return self._fs.read_text(path).strip()

    def _bucket_table_name(self, entity: str, version: int) -> str:
        import re

        safe = re.sub(r"[^0-9A-Za-z_]", "_", entity)
        return f"southpaw_state_{self._store_id()}_{safe}_v{version}"

    def _ensure_bucket_mirror(self, entity: str, version: int) -> str:
        """Hardlink a version's data files into Spark bucket-file naming
        (``part-<i>-<uuid>_<bucket05d>.c000...``). O(file count) metadata
        ops, idempotent, atomic publish via directory rename — safe
        against concurrent readers building the same mirror."""
        import uuid as _uuid

        src = self._data_dir(entity, version)
        dst = src + ".bucketed"
        if self._fs.isdir(dst):
            return dst
        tmp = f"{dst}.tmp-{_uuid.uuid4().hex[:8]}"
        self._fs.mkdirs(tmp)
        i = 0
        for name in sorted(self._fs.listdir(src)) if self._fs.isdir(src) else []:
            if not name.startswith("__bucket="):
                continue
            bucket_id = int(name.split("=", 1)[1])
            bdir = os.path.join(src, name)
            for fn in sorted(self._fs.listdir(bdir)):
                if fn.startswith((".", "_")) or fn.endswith((".crc", ".tmp")):
                    continue
                link = os.path.join(
                    tmp,
                    f"part-{i:05d}-{_uuid.uuid4()}_{bucket_id:05d}"
                    ".c000" + os.path.splitext(fn)[1],
                )
                self._fs.link_or_copy(os.path.join(bdir, fn), link)
                i += 1
        if not self._fs.rename_dir(tmp, dst):
            # concurrent builder published first — use theirs
            self._fs.delete(tmp)
            if not self._fs.isdir(dst):
                raise OSError(f"could not publish bucket mirror {dst}")
        return dst

    def _schema_path(self, entity: str, version: int | None = None) -> str:
        # Schemas are staged per version (``_SCHEMA.v{N}``) so a schema
        # change rides the same staged-commit protocol as the data: until
        # ``commit()`` flips ``_CURRENT``, readers resolve the pointer to
        # the pre-merge version AND its pre-merge schema. A crash between
        # staging and commit can no longer pair old data with a new
        # schema. ``_SCHEMA`` (unversioned) is the pre-round-3 legacy
        # fallback, also used as the canonical name inside backups.
        name = "_SCHEMA" if version is None else f"_SCHEMA.v{version}"
        return os.path.join(self._entity_dir(entity), name)

    def _write_schema(self, entity: str, df: DataFrame, version: int) -> None:
        from pyspark.sql import types as T

        schema = T.StructType(
            list(df.schema.fields)
            + ([] if "__bucket" in df.columns else [T.StructField("__bucket", T.IntegerType())])
        )
        self._fs.write_text_atomic(
            self._schema_path(entity, version), schema.json()
        )

    def _read_schema(self, entity: str, version: int | None = None):
        from pyspark.sql import types as T

        if version is None:
            version = self._version_of(entity)
        path = self._schema_path(entity, version)
        if not self._fs.exists(path):
            path = self._schema_path(entity)  # legacy / restored backup
        return T.StructType.fromJson(
            __import__("json").loads(self._fs.read_text(path))
        )

    # -- bucket-column layout sidecar ----------------------------------

    def _bucket_cols_path(self, entity: str) -> str:
        return os.path.join(self._entity_dir(entity), "_BUCKETCOLS")

    def _read_bucket_cols(self, entity: str) -> list[str] | None:
        import json as _json

        try:
            return [
                str(c)
                for c in _json.loads(
                    self._fs.read_text(self._bucket_cols_path(entity))
                )
            ]
        except (OSError, ValueError):
            return None

    def _write_bucket_cols(self, entity: str, cols: Sequence[str]) -> None:
        import json as _json

        self._fs.mkdirs(self._entity_dir(entity))
        self._fs.write_text_atomic(
            self._bucket_cols_path(entity), _json.dumps(list(cols))
        )

    def _resolve_bucket_cols(
        self,
        entity: str,
        key_cols: Sequence[str],
        bucket_cols: Sequence[str] | None,
    ) -> list[str]:
        """The bucket columns are a physical layout invariant like
        ``n_buckets`` (merge prunes by ``hash(bucket_cols) % n``): the
        persisted per-entity sidecar wins, a conflicting explicit value
        fails loudly, and entities laid out before the sidecar existed
        default to the full key (their historical bucket function)."""
        persisted = self._read_bucket_cols(entity)
        if persisted is not None:
            if bucket_cols is not None and list(bucket_cols) != persisted:
                raise ValueError(
                    f"entity {entity!r} state is bucketed by {persisted}, "
                    f"got bucket_cols={list(bucket_cols)}; bucket pruning "
                    "would silently miss rows — delete the state or open "
                    "with the persisted columns"
                )
            return persisted
        resolved = list(bucket_cols) if bucket_cols is not None else list(key_cols)
        if not set(resolved) <= set(key_cols):
            raise ValueError(
                f"bucket_cols {resolved} must be a subset of key_cols "
                f"{list(key_cols)} — merge computes delta buckets from "
                "the delta KEYS, so a non-key bucket column could not be "
                "pruned correctly"
            )
        return resolved

    def bucket_layout(self, entity: str) -> list[str] | None:
        """The persisted bucket columns for ``entity`` (None for a
        pre-sidecar legacy layout — such entities still bucket by their
        full key, but :meth:`read_bucketed` needs the sidecar to know
        which columns to declare)."""
        return self._read_bucket_cols(entity)

    # -- write ---------------------------------------------------------

    def _bucket_col(self, key_cols: Sequence[str]):
        return F.pmod(F.hash(*key_cols), F.lit(self.n_buckets))

    def init(
        self,
        entity: str,
        rows: DataFrame,
        key_cols: Sequence[str],
        commit: bool = True,
        bucket_cols: Sequence[str] | None = None,
    ) -> int:
        """Full (re)write of an entity's state. With ``commit=False`` the
        version is staged (files + schema written, pointer untouched) —
        readers keep seeing the prior version until ``commit()``.

        ``bucket_cols`` (subset of ``key_cols``, default the full key)
        picks the hash-layout columns. Bucketing by the column the
        entity is JOINED on (e.g. ``l_orderkey`` alone rather than the
        composite lineitem PK) lets :meth:`read_bucketed` expose the
        layout as a Spark bucketed table whose scans feed joins and
        aggregations with ZERO exchanges. Persisted per entity on first
        write; later writes must agree."""
        resolved = self._resolve_bucket_cols(entity, key_cols, bucket_cols)
        version = (self._version_of(entity) or 0) + 1
        out = rows.withColumn("__bucket", self._bucket_col(resolved))
        # One file per bucket: without the repartition every write task
        # fans a file into every bucket dir it holds rows for (observed:
        # tasks × buckets files per version — the 100 TB small-file
        # killer, and every file also becomes a mirror hardlink). Hash
        # repartition by __bucket puts each bucket's rows in exactly one
        # task → exactly one data file per bucket per version.
        out = out.repartition(self.n_buckets, "__bucket")
        out.write.partitionBy("__bucket").mode("overwrite").format(
            self.data_format
        ).save(self._data_dir(entity, version))
        self._write_schema(entity, rows, version)
        if self._read_bucket_cols(entity) is None:
            self._write_bucket_cols(entity, resolved)
        if commit:
            self._commit(entity, version)
        return version

    def merge(
        self,
        entity: str,
        upserts: DataFrame,
        delete_keys: DataFrame | None,
        key_cols: Sequence[str],
        commit: bool = True,
        allow_schema_evolution: bool = False,
        touched_ids: Sequence[int] | None = None,
        bucket_cols: Sequence[str] | None = None,
    ) -> int:
        """Upsert + delete merge. Work is proportional to the *touched*
        buckets, not the table: the anti-join scans only the bucket
        partitions containing delta keys (a pruned read — rows elsewhere
        cannot hold a delta key because bucket = hash(key)), and untouched
        buckets are carried into the new version as hardlinks (on object
        stores this becomes a metadata-only copy with Delta/Iceberg).

        ``commit=False`` stages the new version without flipping the
        ``_CURRENT`` pointer — the write-ahead half of the reference's
        output-before-flush commit ordering (``Southpaw.java:297-315``):
        the orchestrator emits batch outputs first, then calls
        ``commit()``. A crash in between replays against the old version.
        Returns the (possibly staged) new version number.

        ``allow_schema_evolution``: additive column evolution — an Avro
        changelog gains a field (the reference's schema-fluid MapRecord
        absorbs this silently; a restart here pins a newer reader with
        more fields). When set, the new version's schema is the
        by-name union: existing rows read the new columns as null. The
        schema sidecar is staged per version, so evolution rides the
        same commit protocol; untouched hardlinked buckets (old files,
        fewer columns) read correctly under the widened sidecar schema
        because reads are schema-first. Default off — a column mismatch
        then fails loudly, which is the right default for typo-shaped
        drift."""
        version = self._version_of(entity)
        if version is None:
            return self.init(
                entity, upserts, key_cols, commit=commit,
                bucket_cols=bucket_cols,
            )
        bcols = self._resolve_bucket_cols(entity, key_cols, bucket_cols)
        current = (
            self.spark.read.schema(self._read_schema(entity, version))
            .format(self.data_format)
            .load(self._data_dir(entity, version))
        )
        delta_keys = upserts.select(*key_cols)
        if delete_keys is not None:
            delta_keys = delta_keys.unionByName(delete_keys.select(*key_cols))
        if touched_ids is None:
            touched = (
                delta_keys.withColumn("__bucket", self._bucket_col(bcols))
                .select("__bucket")
                .distinct()
            )
            touched_ids = [r["__bucket"] for r in touched.collect()]
        else:
            # caller-supplied superset of the delta keys' bucket ids
            # (saves the collect job when the caller already holds them
            # from its own pruned lookups); extra ids only widen the
            # rewrite, never lose rows
            touched_ids = list(touched_ids)

        # Bucket-prune BEFORE the anti-join: only touched partitions are
        # scanned (partition filter on the __bucket directory column).
        kept = current.where(F.col("__bucket").isin(touched_ids)).join(
            F.broadcast(delta_keys.distinct()), on=list(key_cols), how="left_anti"
        )
        merged = kept.unionByName(
            upserts.withColumn("__bucket", self._bucket_col(bcols)),
            allowMissingColumns=allow_schema_evolution,
        )
        new_version = version + 1
        new_dir = self._data_dir(entity, new_version)
        # rewrite only touched buckets; hardlink untouched bucket dirs
        # through. Repartition by __bucket first (same rationale as
        # init): one data file per TOUCHED bucket per version instead of
        # one per (write task × bucket) — the shuffle moves only the
        # touched buckets' rows, which the write was reading anyway.
        merged = merged.repartition(max(1, len(touched_ids)), "__bucket")
        merged.write.partitionBy("__bucket").mode("overwrite").format(
            self.data_format
        ).save(new_dir)
        self._write_schema(entity, merged, new_version)
        if self._read_bucket_cols(entity) is None:
            self._write_bucket_cols(entity, bcols)
        self._link_untouched(entity, version, new_version, touched_ids)
        if commit:
            self._commit(entity, new_version)
        return new_version

    def _link_untouched(
        self, entity: str, old_version: int, new_version: int, touched: list[int]
    ) -> None:
        old_dir = self._data_dir(entity, old_version)
        new_dir = self._data_dir(entity, new_version)
        if not self._fs.isdir(old_dir):
            return
        for name in self._fs.listdir(old_dir):
            if not name.startswith("__bucket="):
                continue
            bucket_id = int(name.split("=", 1)[1])
            if bucket_id in touched:
                continue
            dst = os.path.join(new_dir, name)
            if self._fs.exists(dst):
                continue
            # Hardlink each file: per-batch cost is O(untouched bucket
            # count), not O(state bytes) — a full-state physical copy per
            # micro-batch would be a scale-killer at 100 TB. Off POSIX
            # (Hadoop FS) this is a real copy — server-side on S3; the
            # cost model is in fsio.py, and the Delta backend removes
            # the carry-over entirely where its jars exist.
            src = os.path.join(old_dir, name)
            self._fs.mkdirs(dst)
            for fn in self._fs.listdir(src):
                self._fs.link_or_copy(
                    os.path.join(src, fn), os.path.join(dst, fn)
                )

    def commit(self, entity: str, version: int) -> None:
        """Publish a staged version (flip the ``_CURRENT`` pointer)."""
        self._commit(entity, version)

    def _commit(self, entity: str, version: int) -> None:
        ptr = os.path.join(self._entity_dir(entity), _CURRENT)
        self._fs.write_text_atomic(ptr, str(version))

    def vacuum(self, keep: int = 2) -> None:
        """Drop version directories older than the newest ``keep``
        committed versions per entity. Versions newer than the pointer
        (staged, uncommitted) are never touched; keeping ≥2 lets lazy
        plans pinned to the previous version finish. Bounds state-dir
        growth on long-running streams."""
        for entity in self._fs.listdir(self.root):
            edir = self._entity_dir(entity)
            if not self._fs.isdir(edir):
                continue
            current = self._version_of(entity)
            if current is None:
                continue
            cutoff = current - keep + 1
            for name in self._fs.listdir(edir):
                if name.startswith("_SCHEMA.v"):
                    try:
                        v = int(name[len("_SCHEMA.v"):])
                    except ValueError:
                        continue
                    if v < cutoff:
                        self._fs.delete(os.path.join(edir, name))
                    continue
                if not name.startswith("v"):
                    continue
                base = name
                is_mirror = False
                if name.endswith(".bucketed"):
                    base, is_mirror = name[: -len(".bucketed")], True
                elif ".bucketed.tmp-" in name:
                    # abandoned mirror build (crash mid-hardlink)
                    base = name.split(".bucketed.tmp-", 1)[0]
                    is_mirror = True
                try:
                    v = int(base[1:])
                except ValueError:
                    continue
                if v < cutoff or (is_mirror and ".tmp-" in name):
                    self._fs.delete(os.path.join(edir, name))
                    if is_mirror:
                        try:
                            self.spark.sql(
                                "DROP TABLE IF EXISTS "
                                f"`{self._bucket_table_name(entity, v)}`"
                            )
                        except Exception:
                            pass

    def rebucket(
        self,
        n_buckets: int,
        bucket_cols: "dict[str, Sequence[str]] | None" = None,
    ) -> "ParquetStateStore":
        """Migrate the WHOLE store to a new bucket count — the resize a
        growing deployment eventually needs (SCALE.md: a bucketed
        scan's parallelism IS its bucket count, so 16 buckets that fit
        sf0.1 cap a 10× rebuild at 16 tasks). ``n_buckets`` is a
        physical layout invariant, so this is a full rewrite: every
        entity's CURRENT version is re-initialized under the new hash
        in an out-of-place store, then the directories swap atomically
        (the vacuum two-rename discipline — everything new exists
        before the swap window). Per-entity bucket-column sidecars are
        preserved, so join-key-bucketed entities keep their co-located
        layout. Version history does NOT migrate (numbering restarts at
        v1 per entity; the default retention keeps 2 versions anyway)
        and the store must be QUIESCED — staged uncommitted versions
        fail the migration loudly.

        ``bucket_cols`` maps LEGACY entities (laid out before the
        bucket-column sidecar existed) to their key columns; entities
        with a sidecar resolve automatically. Returns a fresh handle
        opened on the new layout — the receiving handle is stale after
        the swap and must be discarded."""
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1; got {n_buckets}")
        if n_buckets == self.n_buckets:
            return self
        entities = [
            e for e in sorted(self._fs.listdir(self.root))
            if self._fs.isdir(self._entity_dir(e))
        ]
        plans: list[tuple[str, list[str]]] = []
        for entity in entities:
            current = self._version_of(entity)
            staged = [
                name
                for name in self._fs.listdir(self._entity_dir(entity))
                if name.startswith("v") and name[1:].isdigit()
                and int(name[1:]) > (current if current is not None else 0)
            ]
            if current is None:
                # An entity dir whose only versions are staged (e.g. a
                # crashed first bootstrap: v1 exists but _CURRENT was never
                # written) must not be silently dropped and destroyed by
                # the directory swap below — that would lose the staged
                # data the docstring promises to protect.
                if staged:
                    raise ValueError(
                        f"entity {entity!r} has staged uncommitted versions "
                        f"{sorted(staged)} and no committed version — "
                        "quiesce the stream (commit or vacuum) before "
                        "rebucketing"
                    )
                # Empty shell (no versions at all): nothing to carry over.
                continue
            if staged:
                raise ValueError(
                    f"entity {entity!r} has staged uncommitted versions "
                    f"{sorted(staged)} — quiesce the stream (commit or "
                    "vacuum) before rebucketing"
                )
            cols = self._read_bucket_cols(entity)
            if cols is None:
                cols = list((bucket_cols or {}).get(entity, ()))
                if not cols:
                    raise ValueError(
                        f"entity {entity!r} predates the bucket-column "
                        f"sidecar; pass bucket_cols={{{entity!r}: [its "
                        "key columns]}} so the new layout hashes the "
                        "same columns"
                    )
            plans.append((entity, list(cols)))
        tmp_root = self.root.rstrip("/") + ".rebucket.tmp"
        self._fs.delete(tmp_root)
        new = ParquetStateStore(
            self.spark, tmp_root,
            n_buckets=n_buckets, data_format=self.data_format,
        )
        for entity, cols in plans:
            new.init(entity, self.read(entity), cols, bucket_cols=cols)
        trash = self.root.rstrip("/") + ".rebucket.old"
        self._fs.delete(trash)
        if not self._fs.rename_dir(self.root, trash):
            raise OSError(f"rebucket: could not move {self.root} aside")
        if not self._fs.rename_dir(tmp_root, self.root):
            # restore the original root before failing
            self._fs.rename_dir(trash, self.root)
            raise OSError(f"rebucket: could not publish {tmp_root}")
        self._fs.delete(trash)
        return ParquetStateStore(self.spark, self.root)

    # -- backup / restore (reference O18, state/RocksDBState.java:247-265,
    # 639-708: BackupEngine to local/S3 with restore modes + rollback) ----

    def backup(self, backup_dir: str, retention: int | None = None) -> str:
        """Snapshot every entity's current version into a timestamped
        backup (hardlinked where possible — version files are immutable,
        so links are safe and O(file count), and the backup keeps its
        data alive even after vacuum unlinks the live copy). On object
        stores this becomes a server-side copy. ``retention`` keeps only
        the newest N backups (reference ``backupsToKeep``,
        ``state/RocksDBState.java:247-265``)."""
        import shutil
        import time

        if not self._fs.is_local:
            raise NotImplementedError(
                "backup()/restore() snapshot a LOCAL store (hardlinked, "
                "then shipped with sync_backup_to); an object-store root "
                "is already durable remote storage — version retention "
                "(vacuum keep=) plus the bucket layout are its snapshot "
                "story, or use DeltaStateStore time travel where the "
                "Delta jars exist"
            )
        if retention is not None and retention < 1:
            raise ValueError("retention must be >= 1 (the new backup counts)")
        # zero-padded millis so lexicographic order == temporal order
        # (retention and restore_latest both sort names); collisions in
        # the same millisecond get a unique suffix instead of colliding.
        stamp = (
            time.strftime("%Y%m%dT%H%M%S")
            + f"-{int(time.time() * 1000) % 1000:03d}"
        )
        dest = os.path.join(backup_dir, stamp)
        n = 0
        while os.path.exists(dest):
            n += 1
            dest = os.path.join(backup_dir, f"{stamp}-{n}")
        os.makedirs(dest, exist_ok=True)
        for entity in os.listdir(self.root):
            version = self._version_of(entity)
            if version is None:
                continue
            edir = os.path.join(dest, entity)
            os.makedirs(edir)
            self._link_tree(
                self._data_dir(entity, version), os.path.join(edir, f"v{version}")
            )
            # canonical unversioned name inside the backup; restore's
            # reads resolve it via the legacy fallback
            src_schema = self._schema_path(entity, version)
            if not os.path.exists(src_schema):
                src_schema = self._schema_path(entity)
            shutil.copy(src_schema, os.path.join(edir, "_SCHEMA"))
            # the bucket-layout sidecar MUST ride the backup: restoring
            # join-key-bucketed data without it would make later merges
            # resolve bucket_cols back to the full key — a different
            # hash → pruned reads skip the buckets that actually hold
            # the old rows → silent stale duplicates
            bc = self._bucket_cols_path(entity)
            if os.path.exists(bc):
                shutil.copy(bc, os.path.join(edir, "_BUCKETCOLS"))
            with open(os.path.join(edir, _CURRENT), "w") as f:
                f.write(str(version))
        # the store-level layout sidecar rides along so restore can
        # validate/adopt it (a backup is meaningless under a different
        # bucket function)
        shutil.copy(self._meta_path(), os.path.join(dest, "_META"))
        if retention is not None:
            names = sorted(
                n
                for n in os.listdir(backup_dir)
                if os.path.isdir(os.path.join(backup_dir, n))
            )
            for old in names[:-retention]:
                shutil.rmtree(os.path.join(backup_dir, old), ignore_errors=True)
        return dest

    def drop_entity(self, entity: str) -> None:
        """Remove an entity's state entirely (versions, schema, pointer).
        Used for transient entities like drained ``__pending__`` queues —
        existence then doubles as the cheap non-emptiness test."""
        self._fs.delete(self._entity_dir(entity))

    @staticmethod
    def delete_backups(backup_dir: str) -> int:
        """Delete every backup snapshot under ``backup_dir`` (reference
        ``--delete-backup`` / ``deleteBackups()``,
        ``Southpaw.java:432-436,493,536``). Returns the number removed.
        Live state is untouched — backup files are hardlinks, so
        unlinking them never invalidates current versions."""
        import shutil

        if not os.path.isdir(backup_dir):
            return 0
        names = [
            n
            for n in os.listdir(backup_dir)
            if os.path.isdir(os.path.join(backup_dir, n))
        ]
        for n in names:
            shutil.rmtree(os.path.join(backup_dir, n), ignore_errors=True)
        return len(names)

    @staticmethod
    def _link_tree(src: str, dst: str) -> None:
        """Recursive hardlink copy with plain-copy fallback."""
        import shutil

        for dirpath, _dirnames, filenames in os.walk(src):
            rel = os.path.relpath(dirpath, src)
            out = dst if rel == "." else os.path.join(dst, rel)
            os.makedirs(out, exist_ok=True)
            for fn in filenames:
                s, d = os.path.join(dirpath, fn), os.path.join(out, fn)
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)

    def restore(self, backup_path: str, mode: str = "always") -> bool:
        """Restore from a backup snapshot. Modes follow the reference:
        ``always`` replaces current state; ``when_needed`` restores only
        when current state is missing/empty; ``never`` is a no-op."""
        import shutil

        if not self._fs.is_local:
            raise NotImplementedError(
                "restore() targets a LOCAL store — see backup() for the "
                "object-store posture"
            )
        if mode == "never":
            return False
        if mode == "when_needed" and any(
            self._version_of(e) is not None for e in os.listdir(self.root)
        ):
            return False
        if mode not in ("always", "when_needed"):
            raise ValueError(f"unknown restore mode {mode!r}")
        # layout compatibility: a backup made under a different
        # n_buckets/data_format cannot be merged into this store's
        # layout (pruning would hash to the wrong buckets). A FRESH
        # store (no entities yet) adopts the backup's layout; a
        # populated one fails loudly instead of corrupting silently.
        backup_meta = os.path.join(backup_path, "_META")
        if os.path.exists(backup_meta):
            import json as _json

            with open(backup_meta) as f:
                bm = _json.loads(f.read())
            b_buckets = int(bm["n_buckets"])
            b_format = str(bm.get("data_format", "parquet"))
            if (b_buckets, b_format) != (self.n_buckets, self.data_format):
                has_entities = any(
                    os.path.isdir(self._entity_dir(n))
                    for n in os.listdir(self.root)
                )
                if has_entities:
                    raise ValueError(
                        f"backup layout (n_buckets={b_buckets}, "
                        f"format={b_format!r}) conflicts with this "
                        f"store (n_buckets={self.n_buckets}, "
                        f"format={self.data_format!r}) — restore into "
                        "a fresh store root"
                    )
                self.n_buckets, self.data_format = b_buckets, b_format
                self._write_meta(b_buckets, b_format)
        for entity in os.listdir(backup_path):
            src = os.path.join(backup_path, entity)
            if not os.path.isdir(src):
                continue
            dst = self._entity_dir(entity)
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(src, dst)
        # rotate the store incarnation: restored entities reuse version
        # numbers the OLD incarnation may already have registered bucketed
        # tables for, and those catalog entries' cached file indexes point
        # at the just-unlinked pre-restore mirror files — a same-session
        # read_bucketed would resolve tableExists() to a dead table.
        # Minting a fresh _STORE_ID makes every future read_bucketed use
        # new names (version dirs are write-once only WITHIN one
        # incarnation); the dead incarnation's entries are also dropped.
        sid_path = os.path.join(self.root, "_STORE_ID")
        old_id = None
        if os.path.exists(sid_path):
            with open(sid_path) as f:
                old_id = f.read().strip()
            os.remove(sid_path)
        if old_id:
            try:
                prefix = f"southpaw_state_{old_id}_"
                for t in self.spark.catalog.listTables():
                    if t.name.startswith(prefix):
                        self.spark.sql(f"DROP TABLE IF EXISTS `{t.name}`")
            except Exception:
                pass
        return True

    # -- object-store sync (reference ``util/S3Helper.java``: backups are
    # mirrored to S3 and fetched back before restore). Implemented on
    # Hadoop's FileSystem API via the JVM, so the same code addresses
    # s3a://, hdfs://, gs://, abfs:// or file:// — whatever the cluster's
    # Hadoop conf has credentials for; no extra Python deps. -------------

    def _hadoop_fs(self, url: str):
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        uri = jvm.java.net.URI(url)
        return jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf), jvm

    def sync_backup_to(self, backup_path: str, target_url: str) -> str:
        """Mirror one local backup snapshot to an object-store URL
        (``<target_url>/<snapshot-name>``). Reference S3Helper.syncToS3."""
        fs, jvm = self._hadoop_fs(target_url)
        Path = jvm.org.apache.hadoop.fs.Path
        dest = target_url.rstrip("/") + "/" + os.path.basename(
            backup_path.rstrip("/")
        )
        fs.copyFromLocalFile(False, True, Path(backup_path), Path(dest))
        return dest

    def fetch_backup_from(self, source_url: str, local_dir: str) -> str:
        """Fetch a remote backup snapshot to a local directory (reference
        S3Helper.syncFromS3); pair with ``restore``/``restore_latest``."""
        fs, jvm = self._hadoop_fs(source_url)
        Path = jvm.org.apache.hadoop.fs.Path
        os.makedirs(local_dir, exist_ok=True)
        dest = os.path.join(
            local_dir, os.path.basename(source_url.rstrip("/"))
        )
        fs.copyToLocalFile(False, Path(source_url), Path(dest))
        return dest

    def _backup_ok(self, backup_path: str) -> bool:
        """Structural + read validation of one backup snapshot: every
        entity must have a parsable pointer, a parsable schema sidecar,
        the pointed-at version directory, and parquet that actually
        reads (catches truncated/corrupt files)."""
        import json as _json

        from pyspark.sql import types as T

        try:
            entities = [
                n for n in os.listdir(backup_path)
                if os.path.isdir(os.path.join(backup_path, n))
            ]
        except OSError:
            return False
        if not entities:
            return False
        for entity in entities:
            edir = os.path.join(backup_path, entity)
            try:
                with open(os.path.join(edir, _CURRENT)) as f:
                    version = int(f.read().strip())
                with open(os.path.join(edir, "_SCHEMA")) as f:
                    schema = T.StructType.fromJson(_json.loads(f.read()))
                vdir = os.path.join(edir, f"v{version}")
                if not os.path.isdir(vdir):
                    return False
                self.spark.read.schema(schema).format(self.data_format).load(
                    vdir
                ).count()
            except Exception:
                return False
        return True

    def restore_latest(self, backup_dir: str, mode: str = "always") -> str | None:
        """Restore from the newest *valid* backup under ``backup_dir``,
        rolling back across corrupted newer backups — each corrupt
        snapshot is deleted and the next-newest tried, mirroring the
        reference's auto-rollback restore
        (``state/RocksDBState.java:639-708``). Returns the restored
        backup path, or None if ``mode`` skipped the restore. Raises
        when no valid backup exists."""
        import shutil

        if mode == "never":
            return None
        names = sorted(
            (
                n
                for n in os.listdir(backup_dir)
                if os.path.isdir(os.path.join(backup_dir, n))
            ),
            reverse=True,
        )
        for name in names:
            path = os.path.join(backup_dir, name)
            if self._backup_ok(path):
                if self.restore(path, mode):
                    return path
                return None  # mode=when_needed decided state is fine
            shutil.rmtree(path, ignore_errors=True)  # corrupt → roll back
        raise FileNotFoundError(f"no valid backup under {backup_dir!r}")

    def delete_state(self) -> None:
        """Drop all entity state (reference ``--delete-state``)."""
        for entity in self._fs.listdir(self.root):
            self._fs.delete(os.path.join(self.root, entity))
