"""Filesystem abstraction for index metadata and data files.

On a real cluster the index lives on HDFS/S3/ABFS; locally it is plain
files.  All metadata I/O goes through this module so the storage scheme
is swappable: local paths use ``os``; any other scheme is served through
Spark's Hadoop FileSystem via py4j (same facility the reference uses,
e.g. index/IndexLogManager.scala:178-194 for atomic-rename writes).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterable

if TYPE_CHECKING:
    from pyspark.sql import SparkSession


@dataclass(frozen=True)
class FileStat:
    path: str
    size: int
    mtime: int  # milliseconds, to match Hadoop FileStatus.getModificationTime


def _is_local(path: str) -> bool:
    if "://" not in path:
        return True
    return path.startswith("file:")


def _strip_scheme(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://"):]
    if path.startswith("file:"):
        return path[len("file:"):]
    return path


class FileSystem:
    """Local-filesystem implementation; subclass HadoopFileSystem for remote."""

    def __init__(self, spark: "SparkSession | None" = None):
        self._spark = spark

    # -- metadata I/O ----------------------------------------------------
    def read_text(self, path: str) -> str:
        with open(_strip_scheme(path), "r", encoding="utf-8") as f:
            return f.read()

    def write_text_atomic(self, path: str, content: str, overwrite: bool = False) -> bool:
        """Create-if-absent + atomic rename (optimistic concurrency).

        Returns False when the destination already exists and overwrite is
        False — the caller lost the race (reference: IndexLogManager.writeLog).
        """
        p = _strip_scheme(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        if not overwrite and os.path.exists(p):
            return False
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p), prefix=".hs_tmp_")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                f.write(content)
            if overwrite:
                os.replace(tmp, p)
                return True
            # link() fails if destination exists -> atomic create-if-absent.
            try:
                os.link(tmp, p)
                return True
            except FileExistsError:
                return False
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def exists(self, path: str) -> bool:
        return os.path.exists(_strip_scheme(path))

    def mkdirs(self, path: str) -> None:
        os.makedirs(_strip_scheme(path), exist_ok=True)

    def delete(self, path: str, recursive: bool = False) -> None:
        p = _strip_scheme(path)
        if not os.path.exists(p):
            return
        if os.path.isdir(p):
            if recursive:
                shutil.rmtree(p)
            else:
                os.rmdir(p)
        else:
            os.unlink(p)

    def list_dir(self, path: str) -> list[str]:
        p = _strip_scheme(path)
        if not os.path.isdir(p):
            return []
        return sorted(os.path.join(p, n) for n in os.listdir(p))

    def list_files_recursive(self, path: str) -> list[FileStat]:
        """All data files under path (hidden files/dirs skipped)."""
        p = _strip_scheme(path)
        out: list[FileStat] = []
        if os.path.isfile(p):
            st = os.stat(p)
            return [FileStat(p, st.st_size, int(st.st_mtime * 1000))]
        for root, dirs, files in os.walk(p):
            dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
            for name in files:
                if name.startswith((".", "_")):
                    continue
                fp = os.path.join(root, name)
                st = os.stat(fp)
                out.append(FileStat(fp, st.st_size, int(st.st_mtime * 1000)))
        return sorted(out, key=lambda f: f.path)

    def file_sizes(self, paths: Iterable[str]) -> int:
        return sum(os.stat(_strip_scheme(p)).st_size for p in paths)

    def link_or_copy(self, src: str, dst: str) -> None:
        """Carry an immutable data file into a new index version directory
        WITHOUT rewriting its bytes: hardlink where the filesystem supports
        it (O(1) metadata — both version dirs then reference the same
        inode, and vacuuming the old dir just drops one name), copy as the
        fallback (cross-device, FAT, ...).  This is what makes per-bucket
        optimize and append-only incremental refresh scale: at 100 TB the
        retained gigabytes move between versions for free.  On HDFS the
        equivalent O(1) primitive is FileContext rename-with-snapshot /
        hardlink-less retention via multi-dir content lists; the Hadoop
        subclass below conservatively copies."""
        s, d = _strip_scheme(src), _strip_scheme(dst)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        try:
            os.link(s, d)
        except OSError as exc:
            # Copy only when linking genuinely can't work (cross-device,
            # no-hardlink filesystem, link-count cap).  Anything else —
            # notably FileExistsError from a version-dir collision — must
            # stay loud: a silent copy-over-existing would mask the
            # collision with O(bytes) I/O, and would diverge from the
            # Hadoop override (FileUtil.copy overwrite=False throws).
            import errno

            if exc.errno in (
                errno.EXDEV,
                errno.EPERM,
                errno.EACCES,  # e.g. CIFS/NFS root-squash denying link(2)
                errno.ENOTSUP,
                errno.EMLINK,
                errno.ENOSYS,
            ):
                shutil.copy2(s, d)
            else:
                raise


class HadoopFileSystem(FileSystem):
    """Remote filesystems (hdfs://, s3a://, abfss://...) through the JVM.

    Used automatically when the system path has a non-file scheme and a
    SparkSession is available; keeps metadata semantics (atomic rename,
    create-if-absent) identical to the reference on real lakes.
    """

    def __init__(self, spark: "SparkSession", root: str):
        super().__init__(spark)
        jvm = spark._jvm
        self._jvm = jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = jvm.org.apache.hadoop.fs.Path(root).getFileSystem(self._conf)

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            reader = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            line = reader.readLine()
            while line is not None:
                lines.append(line)
                line = reader.readLine()
            return "\n".join(lines)
        finally:
            stream.close()

    def write_text_atomic(self, path: str, content: str, overwrite: bool = False) -> bool:
        dest = self._p(path)
        if not overwrite and self._fs.exists(dest):
            return False
        tmp = self._p(path + ".tmp-" + uuid.uuid4().hex)
        out = self._fs.create(tmp, True)
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()
        backup = None
        if overwrite and self._fs.exists(dest):
            # Hadoop rename refuses an existing destination, and a bare
            # delete-then-rename destroys the old value if the rename
            # then fails (and opens a window where readers see NO
            # pointer).  Park the old file under a backup name (rename is
            # atomic), swap in the new one, then drop the backup; restore
            # on failure.  Not a true atomic replace (HDFS lacks one
            # without FileContext), but failure-safe: some valid value
            # always survives.
            backup = self._p(path + ".bak-" + uuid.uuid4().hex)
            if not self._fs.rename(dest, backup):
                self._fs.delete(tmp, False)
                return False
        renamed = self._fs.rename(tmp, dest)
        if not renamed:
            self._fs.delete(tmp, False)
            if backup is not None:
                self._fs.rename(backup, dest)  # restore the old value
            return False
        if backup is not None:
            self._fs.delete(backup, False)
        return True

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def delete(self, path: str, recursive: bool = False) -> None:
        if self._fs.exists(self._p(path)):
            self._fs.delete(self._p(path), recursive)

    def list_dir(self, path: str) -> list[str]:
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        return sorted(
            s.getPath().toString() for s in self._fs.listStatus(p)
        )

    def list_files_recursive(self, path: str) -> list[FileStat]:
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        it = self._fs.listFiles(p, True)
        out = []
        while it.hasNext():
            s = it.next()
            name = s.getPath().getName()
            if name.startswith((".", "_")):
                continue
            out.append(
                FileStat(s.getPath().toString(), s.getLen(), s.getModificationTime())
            )
        return sorted(out, key=lambda f: f.path)

    def file_sizes(self, paths: Iterable[str]) -> int:
        return sum(self._fs.getFileStatus(self._p(p)).getLen() for p in paths)

    def link_or_copy(self, src: str, dst: str) -> None:
        # No hardlinks on HDFS/object stores: server-side copy (S3 COPY,
        # HDFS FileUtil.copy) is the conservative equivalent.  Callers
        # treating this as free should note it is O(bytes) here.
        FileUtil = self._jvm.org.apache.hadoop.fs.FileUtil
        FileUtil.copy(
            self._fs, self._p(src), self._fs, self._p(dst), False, False, self._conf
        )


def filesystem_for(path: str, spark: "SparkSession | None" = None) -> FileSystem:
    if _is_local(path) or spark is None or not hasattr(spark, "_jvm"):
        return FileSystem(spark)
    return HadoopFileSystem(spark, path)
