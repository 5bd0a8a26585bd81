"""Delta Lake state backend — the table-native variant of the
``ParquetStateStore`` seam (SURVEY §1.1; the reference's RocksDB
``<entity>-data`` keyspaces, ``state/RocksDBState.java``).

``ParquetStateStore`` hand-rolls what lakehouse table formats provide
natively: versioned snapshots (→ Delta transaction log), touched-bucket
copy-on-write (→ ``MERGE INTO`` rewrites only files containing matches),
atomic publish (→ Delta's atomic log commit), vacuum (→ ``VACUUM``),
and time-travel reads (→ ``versionAsOf``). This class maps the same
public protocol onto those primitives — one Delta table per entity,
Z-order-free (the merge key IS the clustering), with the engine's
output-before-state-commit crash ordering preserved by keeping the
published version in a ``_CURRENT`` pointer file: a Delta write creates
a new table version immediately, but readers of this store resolve
through the pointer, which flips only in ``commit()`` — exactly the
staged-commit contract of the parquet store.

Requires the ``delta-spark`` package + jars (not present in the CI
sandbox — tests skip without it; the parquet/orc backends cover the
protocol there). Construct the session with
``delta.pip_utils.configure_spark_with_delta_pip`` or equivalent.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - exercised only where the jar exists
    from delta.tables import DeltaTable

    HAVE_DELTA = True
except Exception:  # pragma: no cover
    DeltaTable = None
    HAVE_DELTA = False

_CURRENT = "_CURRENT"


class DeltaStateStore:
    """Entity → current-rows Delta table with pointer-gated publishing.

    Protocol-compatible with ``ParquetStateStore`` for the surface the
    IVM loop uses: ``exists`` / ``read`` / ``read_version`` / ``init`` /
    ``merge`` / ``commit`` / ``vacuum`` / ``drop_entity`` /
    ``delete_state``. Backup/restore delegates to Delta's own history —
    ``read_version`` time-travels, so a rollback is ``init(entity,
    read_version(entity, v), keys)``.
    """

    def __init__(self, spark: SparkSession, root: str) -> None:
        if not HAVE_DELTA:
            raise ImportError(
                "delta-spark is not installed — use ParquetStateStore "
                "(data_format='parquet'|'orc') in jar-less environments"
            )
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths / pointer ----------------------------------------------

    def _table_path(self, entity: str) -> str:
        return os.path.join(self.root, entity)

    def _ptr_path(self, entity: str) -> str:
        return os.path.join(self.root, f"{entity}.{_CURRENT}")

    def _version_of(self, entity: str) -> int | None:
        try:
            with open(self._ptr_path(entity)) as f:
                return int(f.read().strip())
        except OSError:
            return None

    def _latest_table_version(self, entity: str) -> int:
        dt = DeltaTable.forPath(self.spark, self._table_path(entity))
        return int(dt.history(1).collect()[0]["version"])

    # -- read ----------------------------------------------------------

    def exists(self, entity: str) -> bool:
        return self._version_of(entity) is not None

    def read(self, entity: str) -> DataFrame:
        version = self._version_of(entity)
        if version is None:
            raise FileNotFoundError(f"no state for entity {entity!r}")
        return self.read_version(entity, version)

    def read_version(self, entity: str, version: int) -> DataFrame:
        return (
            self.spark.read.format("delta")
            .option("versionAsOf", version)
            .load(self._table_path(entity))
        )

    # -- write ---------------------------------------------------------

    def init(
        self,
        entity: str,
        rows: DataFrame,
        key_cols: Sequence[str],
        commit: bool = True,
        bucket_cols: Sequence[str] | None = None,
    ) -> int:
        """Full (re)write. ``bucket_cols`` is accepted for interface
        parity with ``ParquetStateStore`` and ignored — Delta's file
        layout is managed by the Delta log, and co-located reads would
        come from liquid clustering / OPTIMIZE ZORDER instead.
        The Delta log records it immediately as a new
        table version; the store's readers only see it after
        ``commit()`` flips the pointer."""
        rows.write.format("delta").mode("overwrite").option(
            "overwriteSchema", "true"
        ).save(self._table_path(entity))
        version = self._latest_table_version(entity)
        if commit:
            self.commit(entity, version)
        return version

    def merge(
        self,
        entity: str,
        upserts: DataFrame,
        delete_keys: DataFrame | None,
        key_cols: Sequence[str],
        commit: bool = True,
        touched_ids: Sequence[int] | None = None,
        bucket_cols: Sequence[str] | None = None,
    ) -> int:
        """Upsert + delete via ``MERGE INTO`` — Delta rewrites only the
        files containing matched keys (its native copy-on-write), the
        table-format analog of the parquet store's touched-bucket merge
        + hardlinked untouched buckets. ``touched_ids`` is accepted for
        interface parity and ignored: MERGE INTO prunes natively."""
        if self._version_of(entity) is None:
            return self.init(entity, upserts, key_cols, commit=commit)
        path = self._table_path(entity)
        dt = DeltaTable.forPath(self.spark, path)
        cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in key_cols)
        (
            dt.alias("t")
            .merge(upserts.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        if delete_keys is not None:
            dk = delete_keys.select(*key_cols).distinct()
            (
                DeltaTable.forPath(self.spark, path)
                .alias("t")
                .merge(dk.alias("s"), cond)
                .whenMatchedDelete()
                .execute()
            )
        version = self._latest_table_version(entity)
        if commit:
            self.commit(entity, version)
        return version

    def commit(self, entity: str, version: int) -> None:
        """Publish: flip the pointer (atomic rename) — outputs flushed
        by the orchestrator before this call replay identically on
        crash, exactly as with the parquet store."""
        ptr = self._ptr_path(entity)
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, ptr)

    # -- maintenance ---------------------------------------------------

    def vacuum(self, keep_hours: float = 168.0) -> None:
        """Delegate to Delta VACUUM (time- rather than count-based
        retention — the table format's own contract)."""
        for entity in os.listdir(self.root):
            path = os.path.join(self.root, entity)
            if os.path.isdir(path) and os.path.isdir(
                os.path.join(path, "_delta_log")
            ):
                DeltaTable.forPath(self.spark, path).vacuum(keep_hours)

    def drop_entity(self, entity: str) -> None:
        import shutil

        shutil.rmtree(self._table_path(entity), ignore_errors=True)
        try:
            os.remove(self._ptr_path(entity))
        except OSError:
            pass

    def delete_state(self) -> None:
        import shutil

        shutil.rmtree(self.root, ignore_errors=True)


def delta_available() -> bool:
    """True when delta-spark (python + jars) can actually run here."""
    if not HAVE_DELTA:
        return False
    try:  # the python package may exist without the jars
        active = SparkSession.getActiveSession()
        if active is None:
            return True  # can't probe cheaply; let the caller try
        active._jvm.io.delta.tables.DeltaTable  # noqa: B018
        return True
    except Exception:
        return False
