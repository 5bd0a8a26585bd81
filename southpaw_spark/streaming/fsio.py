"""Driver-side filesystem seam for :class:`ParquetStateStore`.

The store's DATA files always go through Spark's own writers/readers,
which speak the Hadoop FileSystem API natively — `s3a://`, `gs://`,
`abfs://`, `hdfs://` roots already work for the parquet halves. What
was POSIX-bound was the driver-side METADATA layer: pointer files
(`_CURRENT`, `_META`, schema/bucket-column sidecars), the
hardlink-through of untouched buckets, and the directory publishes/
swaps (mirror builds, vacuum, rebucket). This module abstracts exactly
those primitives:

* :class:`LocalStoreFS` — the original `os`/`shutil` code paths,
  byte-for-byte semantics (hardlinks, `os.replace` atomicity). Chosen
  for plain paths, so existing deployments run the identical code.
* :class:`HadoopStoreFS` — the same primitives through the JVM Hadoop
  `FileSystem` (the pattern `sync_backup_to` already used), chosen for
  any `scheme://` root. Testable in-sandbox with `file://` URIs
  (Hadoop `LocalFileSystem`); on a real object store the documented
  semantic shifts apply and are called out per method below.

100 TB cost model (SCALE.md "state store object-store seam"): the two
primitives whose cost class CHANGES off POSIX are `link_or_copy`
(hardlink → server-side/stream copy: per-merge cost goes from
O(untouched-bucket count) metadata ops to O(untouched bytes) copy — on
S3 a server-side COPY, still no download, but no longer free; size
`n_buckets` so touched/untouched ratio keeps this acceptable, or use
the Delta backend where the transaction log replaces the carry-over
entirely) and `rename_dir` (HDFS: atomic O(1); S3A: copy+delete,
non-atomic — the store's pointer-LAST protocol keeps readers safe
because data dirs are write-once and `_CURRENT` is a small single
file, but the swap windows in vacuum/rebucket widen from milliseconds
to copy time).
"""

from __future__ import annotations

import os


class LocalStoreFS:
    """POSIX primitives — the store's original semantics."""

    is_local = True

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def create_exclusive_text(self, path: str, text: str) -> bool:
        """O_EXCL create; False if it already existed (first writer wins)."""
        try:
            with open(path, "x") as f:
                f.write(text)
            return True
        except FileExistsError:
            return False

    def link_or_copy(self, src: str, dst: str) -> None:
        import shutil

        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)  # cross-device fallback

    def rename_dir(self, src: str, dst: str) -> bool:
        """Publish a directory; False if the rename failed (typically a
        concurrent publisher already created dst — callers decide)."""
        try:
            os.rename(src, dst)
            return True
        except OSError:
            return False

    def delete(self, path: str) -> None:
        import shutil

        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.remove(path)
            except OSError:
                pass

    def delete_dir_if_empty(self, path: str) -> bool:
        """Non-recursive dir removal: fails (False) the moment the dir
        holds ANY entry — the race-safe way to garbage-collect a
        staging parent a concurrent writer may repopulate."""
        try:
            os.rmdir(path)
            return True
        except OSError:
            return False


class HadoopStoreFS:
    """The same primitives via the JVM Hadoop ``FileSystem`` — any
    scheme Spark's Hadoop conf can open (`file://`, `hdfs://`,
    `s3a://`, `gs://`, `abfs://`). Driver-side only; executors never
    see this class (Spark's own writers handle the data files).

    Semantics notes vs POSIX: no hardlinks exist, so
    :meth:`link_or_copy` is a real copy (server-side on S3);
    :meth:`rename_dir` is atomic on HDFS but copy+delete on S3A;
    :meth:`write_text_atomic` is create-temp + delete + rename (the
    tiny non-atomic window only affects the small pointer files, and a
    reader that loses the race re-reads — the data dirs they point at
    are write-once)."""

    is_local = False

    def __init__(self, spark, root_url: str) -> None:
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        self._jvm = jvm
        self._gateway = spark.sparkContext._gateway
        self._fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI(root_url), conf
        )
        self._conf = conf
        self._Path = jvm.org.apache.hadoop.fs.Path

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._Path(path))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._Path(path)))

    def isdir(self, path: str) -> bool:
        p = self._Path(path)
        return bool(self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        statuses = self._fs.listStatus(self._Path(path))
        return [st.getPath().getName() for st in statuses]

    def read_text(self, path: str) -> str:
        p = self._Path(path)
        if not self._fs.exists(p):
            raise FileNotFoundError(path)
        stream = self._fs.open(p)
        try:
            return str(
                self._jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8"
                )
            )
        finally:
            stream.close()

    def _write(self, path: str, text: str, overwrite: bool) -> None:
        out = self._fs.create(self._Path(path), overwrite)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        # Pointer commits must never leave a window with NO file at
        # `path`: a reader racing a delete-then-rename would map a
        # missing `_CURRENT` to "no committed version" and silently see
        # an empty store. Preferred path: `FileContext.rename(...,
        # Options.Rename.OVERWRITE)` — an atomic rename-over on HDFS
        # and ViewFS (and file:// via RawLocal FileContext). Fallback
        # for filesystems with no AbstractFileSystem binding (some
        # object-store configs): delete+rename, whose tiny window is
        # covered by the reader-side retry in the store's
        # ``_version_of`` (see `state.py`).
        tmp = path + ".tmp"
        self._write(tmp, text, True)
        dst = self._Path(path)
        src = self._Path(tmp)
        try:
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._jvm.java.net.URI(path), self._conf
            )
            rename_enum = self._jvm.org.apache.hadoop.fs.Options.Rename
            # rename(Path, Path, Options.Rename...) is varargs — py4j
            # needs the trailing parameter as an explicit Java array
            # (a bare enum raises Py4JError and would silently demote
            # every pointer commit to the non-atomic fallback)
            opts = self._gateway.new_array(rename_enum, 1)
            opts[0] = rename_enum.OVERWRITE
            fc.rename(src, dst, opts)
            return
        except Exception:
            pass  # no AbstractFileSystem for this scheme — fall back
        self._fallback_pointer_commit(src, dst, path, text)

    def _fallback_pointer_commit(self, src, dst, path: str, text: str) -> None:
        """delete+rename pointer commit for schemes with no FileContext
        binding. The rename result is CHECKED: a False (src consumed by
        a concurrent committer, or the FS refused) after the delete
        would otherwise leave NO pointer at all — and a missing pointer
        reads as 'no committed version' — so the pointer is re-created
        directly from ``text``."""
        if self._fs.exists(dst):
            self._fs.delete(dst, False)
        try:
            ok = bool(self._fs.rename(src, dst))
        except Exception:
            ok = False  # e.g. src already consumed — FNFE on some FSs
        if not ok:
            self._write(path, text, True)

    def create_exclusive_text(self, path: str, text: str) -> bool:
        try:
            self._write(path, text, False)  # create(overwrite=false)
            return True
        except Exception:
            return False

    def link_or_copy(self, src: str, dst: str) -> None:
        # no hardlinks off POSIX: FileUtil.copy (server-side where the
        # store supports it). The cost-class change is documented in
        # the module docstring.
        self._jvm.org.apache.hadoop.fs.FileUtil.copy(
            self._fs, self._Path(src), self._fs, self._Path(dst),
            False, True, self._conf,
        )

    def rename_dir(self, src: str, dst: str) -> bool:
        # Hadoop FileSystem.rename does NOT fail when dst is an
        # existing directory — HDFS/RawLocal move src INTO dst
        # (POSIX `mv` semantics), which would nest a losing concurrent
        # publisher's tmp dir inside the published mirror and corrupt
        # every later read. Mirror the POSIX os.rename contract the
        # store's callers rely on: an existing dst means the rename
        # "failed" and the caller discards its tmp dir. The exists
        # pre-check alone still races (two publishers can both see
        # absent; the loser's rename then nests), so after a rename
        # that "succeeded" we verify it did not land nested —
        # src basenames are uuid-suffixed tmp names, so a legitimate
        # child of dst can never collide with them.
        p_dst = self._Path(dst)
        if self._fs.exists(p_dst):
            return False
        if not bool(self._fs.rename(self._Path(src), p_dst)):
            return False
        nested = self._Path(
            dst.rstrip("/") + "/" + os.path.basename(src.rstrip("/"))
        )
        if self._fs.exists(nested):
            # Lost the race — un-nest by RESTORING src, never by
            # deleting: for mirror publishes src is a discardable tmp,
            # but for data-dir swaps (`_swap_data_dir` retiring a live
            # ``data``/``cells``/``codes`` dir) the nested dir may be
            # the only copy of the live index data.
            if self._fs.exists(self._Path(src)) or not bool(
                self._fs.rename(nested, self._Path(src))
            ):
                raise OSError(
                    f"rename_dir: {src} nested into concurrently "
                    f"created {dst} and could not be restored — "
                    f"recover it manually from {nested}"
                )
            return False
        return True

    def delete(self, path: str) -> None:
        p = self._Path(path)
        if self._fs.exists(p):
            self._fs.delete(p, True)

    def delete_dir_if_empty(self, path: str) -> bool:
        # FileSystem.delete(path, recursive=false) throws on a
        # non-empty directory on every mainstream FS — exactly the
        # race-safe contract we need (no list-then-delete window)
        try:
            return bool(self._fs.delete(self._Path(path), False))
        except Exception:
            return False


def write_json_atomic(fs, path: str, payload: dict) -> None:
    """Atomic JSON sidecar write through the FS seam (tmp + rename on
    POSIX, the Hadoop equivalent on ``scheme://`` roots) — a crash
    mid-write must never leave truncated JSON, and raw ``open()``
    would crash outright on object-store roots. The single shared
    implementation for every sidecar in the repo (state-store
    geometry, dedup-stream ledgers, ANN index meta/drift)."""
    import json

    fs.write_text_atomic(path, json.dumps(payload))


def read_json(fs, path: str) -> dict:
    """Read a JSON sidecar through the FS seam; raises OSError when
    absent (callers that want None use :func:`read_json_or_none`)."""
    import json

    return json.loads(fs.read_text(path))


def read_json_or_none(fs, path: str) -> dict | None:
    try:
        return read_json(fs, path)
    except OSError:
        return None


def store_fs_for(spark, root: str):
    """Pick the FS implementation from the root's scheme: plain paths
    keep the original POSIX code (zero behavior change), any
    ``scheme://`` root goes through Hadoop."""
    if "://" in root:
        return HadoopStoreFS(spark, root)
    return LocalStoreFS()
