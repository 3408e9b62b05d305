"""Filesystem seam for the incremental stores and the ANN index
lifecycle (VERDICT r11 item 5).

The store/ledger maintenance primitives (two-rename compaction swaps,
the applied-batch ledger's one-file-per-append text writes, the
parquet-part probes) were direct ``os.*`` calls — correct on the
single-node test host but unable to address an HDFS/S3 store path at
all on a cluster deployment. This module is the one seam they now go
through:

- ``fs_for(path)`` returns the POSIX implementation for plain local
  paths (the default everywhere in tests and the container — zero new
  overhead: same ``os``/``shutil`` calls as before), and a Hadoop
  FileSystem implementation (via the active SparkSession's JVM
  gateway) for scheme-qualified paths (``hdfs://...``, ``s3a://...``,
  ``file:/...``) — the exact FileSystem object Spark's own writers use
  for that path, so store data and store maintenance always agree on
  the filesystem.

Semantics note for object stores: HDFS ``rename`` is atomic;
S3A ``rename`` is a copy+delete (no atomicity). The store discipline
already assumes NO rename atomicity — every crash window of the
two-rename swap is covered by ``_recover_compact`` healing at the
next access, and the ledger's dot-tmp convention makes a torn write
invisible to readers (dot-prefixed names are skipped) rather than
relying on the rename being atomic. On S3 the windows are wider, the
healing is the same.
"""

from __future__ import annotations

import os
import shutil


class LocalStoreFS:
    """POSIX implementation — byte-for-byte the calls the stores made
    before the seam existed."""

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def remove(self, path: str) -> None:
        try:
            os.remove(path)
        except OSError:
            pass  # already gone; callers are superset-safe

    def listnames(self, path: str) -> list[str]:
        return os.listdir(path)

    def write_text_atomic(self, dirpath: str, name: str, text: str) -> None:
        """Write ``dirpath/name`` via a dot-tmp in the same directory +
        rename: a crash mid-write leaves only an invisible tmp (readers
        skip dot-prefixed names), never a torn visible entry."""
        tmp = os.path.join(dirpath, f".tmp-{name}")
        with open(tmp, "w") as f:
            f.write(text)
        os.rename(tmp, os.path.join(dirpath, name))

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def has_parquet(self, path: str) -> bool:
        if not os.path.isdir(path):
            return False
        for _root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    return True
        return False

    def count_parquet(self, path: str) -> int:
        n = 0
        if not os.path.isdir(path):
            return 0
        for _root, _dirs, files in os.walk(path):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n


class HadoopStoreFS:
    """Hadoop FileSystem implementation, resolved from the active
    SparkSession's JVM gateway for the store path's scheme — usable
    against hdfs://, s3a://, file:/ etc. Requires a live session
    (the stores always run inside one)."""

    def __init__(self, path: str):
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "HadoopStoreFS needs an active SparkSession to reach "
                f"the JVM Hadoop FileSystem for {path!r}"
            )
        self._jvm = spark._jvm
        self._HPath = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._HPath(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def _p(self, path: str):
        return self._HPath(path)

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def isdir(self, path: str) -> bool:
        p = self._p(path)
        return bool(
            self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory()
        )

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"rename failed: {src} -> {dst}")

    def rmtree(self, path: str) -> None:
        p = self._p(path)
        if self._fs.exists(p):
            self._fs.delete(p, True)

    def remove(self, path: str) -> None:
        p = self._p(path)
        if self._fs.exists(p):
            self._fs.delete(p, False)

    def listnames(self, path: str) -> list[str]:
        return [
            st.getPath().getName()
            for st in self._fs.listStatus(self._p(path))
        ]

    def write_text_atomic(self, dirpath: str, name: str, text: str) -> None:
        tmp = f"{dirpath.rstrip('/')}/.tmp-{name}"
        out = self._fs.create(self._p(tmp), True)
        out.write(bytearray(text, "utf-8"))
        out.close()
        self.rename(tmp, f"{dirpath.rstrip('/')}/{name}")

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def has_parquet(self, path: str) -> bool:
        if not self.isdir(path):
            return False
        it = self._fs.listFiles(self._p(path), True)
        while it.hasNext():
            if it.next().getPath().getName().endswith(".parquet"):
                return True
        return False

    def count_parquet(self, path: str) -> int:
        if not self.isdir(path):
            return 0
        n = 0
        it = self._fs.listFiles(self._p(path), True)
        while it.hasNext():
            if it.next().getPath().getName().endswith(".parquet"):
                n += 1
        return n


_LOCAL = LocalStoreFS()

# fs.defaultFS-is-local decision, cached per Spark application (a py4j
# round-trip per store op would add up; defaultFS cannot change inside
# an application).
_DEFAULT_FS_LOCAL_CACHE: dict[str, bool] = {}


def _default_fs_is_local() -> bool:
    """Whether the ACTIVE session resolves scheme-less paths to the
    local filesystem. No session (plain-python tooling) ⇒ local."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return True
    app = spark.sparkContext.applicationId
    cached = _DEFAULT_FS_LOCAL_CACHE.get(app)
    if cached is None:
        default = (
            spark._jsc.hadoopConfiguration().get("fs.defaultFS")
            or "file:///"
        )
        cached = default.startswith("file:")
        _DEFAULT_FS_LOCAL_CACHE[app] = cached
    return cached


def fs_for(path: str):
    """The filesystem for a store path: scheme-qualified paths go
    through Hadoop FileSystem (the same object Spark's writers use for
    them); plain paths stay on the zero-overhead POSIX implementation
    — UNLESS the active session's ``fs.defaultFS`` is non-local
    (cluster deployment), in which case Spark's own writers resolve
    the scheme-less store path against defaultFS and the maintenance
    side must follow them there (ADVICE r12: POSIX-side maintenance
    against HDFS-side data made ``applied_batch_key_set`` silently
    empty, breaking idempotent replay)."""
    if "://" in path or path.startswith("file:"):
        return HadoopStoreFS(path)
    if not _default_fs_is_local():
        return HadoopStoreFS(path)
    return _LOCAL
