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
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CURRENT = "_CURRENT"


class ParquetStateStore:
    """Entity → current-rows table, hash-bucketed by primary key."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 16,
    ) -> None:
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)

    # -- paths ---------------------------------------------------------

    def _entity_dir(self, entity: str) -> str:
        return os.path.join(self.root, entity)

    def _version_of(self, entity: str) -> int | None:
        ptr = os.path.join(self._entity_dir(entity), _CURRENT)
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return int(f.read().strip())

    def _data_dir(self, entity: str, version: int) -> str:
        return os.path.join(self._entity_dir(entity), f"v{version}")

    # -- read ----------------------------------------------------------

    def exists(self, entity: str) -> bool:
        return self._version_of(entity) is not None

    def read(self, entity: str) -> DataFrame:
        version = self._version_of(entity)
        if version is None:
            raise FileNotFoundError(f"no state for entity {entity!r}")
        # explicit schema (sidecar) so empty state tables — zero parquet
        # files after an empty bootstrap — read back as empty DataFrames
        schema = self._read_schema(entity)
        return self.spark.read.schema(schema).parquet(
            self._data_dir(entity, version)
        ).drop("__bucket")

    def _schema_path(self, entity: str) -> str:
        return os.path.join(self._entity_dir(entity), "_SCHEMA")

    def _write_schema(self, entity: str, df: DataFrame) -> None:
        from pyspark.sql import types as T

        schema = T.StructType(
            list(df.schema.fields)
            + ([] if "__bucket" in df.columns else [T.StructField("__bucket", T.IntegerType())])
        )
        tmp = self._schema_path(entity) + ".tmp"
        with open(tmp, "w") as f:
            f.write(schema.json())
        os.replace(tmp, self._schema_path(entity))

    def _read_schema(self, entity: str):
        from pyspark.sql import types as T

        with open(self._schema_path(entity)) as f:
            return T.StructType.fromJson(__import__("json").loads(f.read()))

    # -- write ---------------------------------------------------------

    def _bucket_col(self, key_cols: Sequence[str]):
        return F.pmod(F.hash(*key_cols), F.lit(self.n_buckets))

    def init(self, entity: str, rows: DataFrame, key_cols: Sequence[str]) -> None:
        """Full (re)write of an entity's state."""
        version = (self._version_of(entity) or 0) + 1
        out = rows.withColumn("__bucket", self._bucket_col(key_cols))
        out.write.partitionBy("__bucket").mode("overwrite").parquet(
            self._data_dir(entity, version)
        )
        self._write_schema(entity, rows)
        self._commit(entity, version)

    def merge(
        self,
        entity: str,
        upserts: DataFrame,
        delete_keys: DataFrame | None,
        key_cols: Sequence[str],
    ) -> None:
        """Upsert + delete merge. Only buckets containing delta keys are
        rewritten; untouched buckets are carried into the new version as
        references (re-read, not recomputed — on object stores this
        becomes a metadata-only copy with Delta/Iceberg)."""
        version = self._version_of(entity)
        if version is None:
            self.init(entity, upserts, key_cols)
            return
        current = self.spark.read.schema(self._read_schema(entity)).parquet(
            self._data_dir(entity, version)
        )
        delta_keys = upserts.select(*key_cols)
        if delete_keys is not None:
            delta_keys = delta_keys.unionByName(delete_keys.select(*key_cols))
        touched = (
            delta_keys.withColumn("__bucket", self._bucket_col(key_cols))
            .select("__bucket")
            .distinct()
        )
        touched_ids = [r["__bucket"] for r in touched.collect()]

        kept = current.join(
            F.broadcast(delta_keys.distinct()), on=list(key_cols), how="left_anti"
        )
        merged = kept.unionByName(
            upserts.withColumn("__bucket", self._bucket_col(key_cols)),
            allowMissingColumns=False,
        )
        new_version = version + 1
        new_dir = self._data_dir(entity, new_version)
        # rewrite only touched buckets; copy untouched bucket dirs through
        merged.where(F.col("__bucket").isin(touched_ids)).write.partitionBy(
            "__bucket"
        ).mode("overwrite").parquet(new_dir)
        self._link_untouched(entity, version, new_version, touched_ids)
        self._commit(entity, new_version)

    def _link_untouched(
        self, entity: str, old_version: int, new_version: int, touched: list[int]
    ) -> None:
        import shutil

        old_dir = self._data_dir(entity, old_version)
        new_dir = self._data_dir(entity, new_version)
        if not os.path.isdir(old_dir):
            return
        for name in os.listdir(old_dir):
            if not name.startswith("__bucket="):
                continue
            bucket_id = int(name.split("=", 1)[1])
            if bucket_id in touched:
                continue
            dst = os.path.join(new_dir, name)
            if not os.path.exists(dst):
                # local fs: cheap copy; object store: server-side copy /
                # manifest reference
                shutil.copytree(os.path.join(old_dir, name), dst)

    def _commit(self, entity: str, version: int) -> None:
        ptr = os.path.join(self._entity_dir(entity), _CURRENT)
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, ptr)

    # -- backup / restore (reference O18, state/RocksDBState.java:247-265,
    # 639-708: BackupEngine to local/S3 with restore modes + rollback) ----

    def backup(self, backup_dir: str) -> str:
        """Snapshot every entity's current version into a timestamped
        backup. On object stores this is a server-side copy of the
        current version dirs + pointer files; locally a copytree."""
        import shutil
        import time

        stamp = time.strftime("%Y%m%dT%H%M%S") + f"-{int(time.time() * 1000) % 1000}"
        dest = os.path.join(backup_dir, stamp)
        os.makedirs(dest, exist_ok=True)
        for entity in os.listdir(self.root):
            version = self._version_of(entity)
            if version is None:
                continue
            edir = os.path.join(dest, entity)
            os.makedirs(edir)
            shutil.copytree(
                self._data_dir(entity, version), os.path.join(edir, f"v{version}")
            )
            shutil.copy(self._schema_path(entity), os.path.join(edir, "_SCHEMA"))
            with open(os.path.join(edir, _CURRENT), "w") as f:
                f.write(str(version))
        return dest

    def restore(self, backup_path: str, mode: str = "always") -> bool:
        """Restore from a backup snapshot. Modes follow the reference:
        ``always`` replaces current state; ``when_needed`` restores only
        when current state is missing/empty; ``never`` is a no-op."""
        import shutil

        if mode == "never":
            return False
        if mode == "when_needed" and any(
            self._version_of(e) is not None for e in os.listdir(self.root)
        ):
            return False
        if mode not in ("always", "when_needed"):
            raise ValueError(f"unknown restore mode {mode!r}")
        for entity in os.listdir(backup_path):
            src = os.path.join(backup_path, entity)
            dst = self._entity_dir(entity)
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(src, dst)
        return True

    def delete_state(self) -> None:
        """Drop all entity state (reference ``--delete-state``)."""
        import shutil

        for entity in os.listdir(self.root):
            shutil.rmtree(os.path.join(self.root, entity), ignore_errors=True)
