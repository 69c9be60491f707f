"""Storage abstraction for the ACID table layer.

Reference parity: the reference's object-store utilities are GCS-only
(``list_objects``/``get_partition_files``/``delete_bucket_objects``,
src/validation_suite.py:160-219) even though its README claims storage
agnosticism.  Ours goes through Hadoop's FileSystem API via the JVM gateway,
so the same code paths work on file://, hdfs://, gs://, s3a:// — whatever
connectors are on the cluster's classpath.

The one operation Hadoop can't give us portably is *atomic exclusive create*
(the commit primitive): RawLocalFileSystem's create(overwrite=false) is
check-then-act.  For local paths we use O_EXCL (POSIX-atomic); on HDFS,
create(overwrite=false) is atomic at the NameNode; on object stores you'd
back this with a conditional put (S3 If-None-Match / GCS precondition) — the
log protocol is unchanged, only this primitive swaps.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import SparkSession


def is_local(path: str) -> bool:
    scheme = urlparse(path).scheme
    return scheme in ("", "file")


def strip_scheme(path: str) -> str:
    p = urlparse(path)
    return p.path if p.scheme == "file" else path


class FileSystem:
    """Minimal FS facade: local fast-path via os, everything else via
    Hadoop FileSystem through the JVM gateway."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.local = is_local(root)

    # -- helpers -----------------------------------------------------------
    def _jfs(self, path: str):
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        conf = self.spark._jsc.hadoopConfiguration()
        return jpath.getFileSystem(conf), jpath

    # -- operations --------------------------------------------------------
    def list_files(self, prefix: str) -> list[str]:
        """Recursive file listing under prefix (ref: list_objects,
        src/validation_suite.py:160-195)."""
        if self.local:
            base = strip_scheme(prefix)
            out = []
            for dirpath, _dirs, files in os.walk(base):
                for f in files:
                    out.append(os.path.join(dirpath, f))
            return sorted(out)
        fs, jpath = self._jfs(prefix)
        if not fs.exists(jpath):
            return []
        it = fs.listFiles(jpath, True)
        out = []
        while it.hasNext():
            out.append(it.next().getPath().toString())
        return sorted(out)

    def list_files_with_size(self, prefix: str) -> list[tuple[str, int]]:
        """Recursive (path, size) listing — one pass, so a commit touching
        thousands of files costs one listing instead of one RPC per file."""
        if self.local:
            base = strip_scheme(prefix)
            out = []
            for dirpath, _dirs, files in os.walk(base):
                for f in files:
                    p = os.path.join(dirpath, f)
                    out.append((p, os.path.getsize(p)))
            return sorted(out)
        fs, jpath = self._jfs(prefix)
        if not fs.exists(jpath):
            return []
        it = fs.listFiles(jpath, True)
        out = []
        while it.hasNext():
            st = it.next()
            out.append((st.getPath().toString(), st.getLen()))
        return sorted(out)

    def exists(self, path: str) -> bool:
        if self.local:
            return os.path.exists(strip_scheme(path))
        fs, jpath = self._jfs(path)
        return fs.exists(jpath)

    def mkdirs(self, path: str) -> None:
        if self.local:
            os.makedirs(strip_scheme(path), exist_ok=True)
        else:
            fs, jpath = self._jfs(path)
            fs.mkdirs(jpath)

    def delete(self, path: str, recursive: bool = False) -> bool:
        """ref: delete_bucket_objects, src/validation_suite.py:207-219."""
        if self.local:
            p = strip_scheme(path)
            if not os.path.exists(p):
                return False
            if os.path.isdir(p):
                if not recursive:
                    raise ValueError(f"directory delete needs recursive=True: {p}")
                import shutil

                shutil.rmtree(p)
            else:
                os.remove(p)
            return True
        fs, jpath = self._jfs(path)
        return fs.delete(jpath, recursive)

    def rename(self, src: str, dst: str) -> None:
        if self.local:
            s, d = strip_scheme(src), strip_scheme(dst)
            os.makedirs(os.path.dirname(d), exist_ok=True)
            os.replace(s, d)
        else:
            fs, jsrc = self._jfs(src)
            _, jdst = self._jfs(dst)
            fs.mkdirs(jdst.getParent())
            if not fs.rename(jsrc, jdst):
                raise OSError(f"rename failed: {src} -> {dst}")

    def read_text(self, path: str) -> str:
        if self.local:
            with open(strip_scheme(path)) as f:
                return f.read()
        fs, jpath = self._jfs(path)
        stream = fs.open(jpath)
        try:
            jvm = self.spark._jvm
            return jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def read_bytes(
        self, path: str, offset: int = 0, length: int | None = None
    ) -> bytes:
        """Random-access binary read (deletion-vector files are read by
        offset/size per their add-action descriptor)."""
        if self.local:
            with open(strip_scheme(path), "rb") as f:
                f.seek(offset)
                return f.read() if length is None else f.read(length)
        fs, jpath = self._jfs(path)
        stream = fs.open(jpath)
        try:
            if offset:
                stream.seek(offset)
            jvm = self.spark._jvm
            if length is None:
                data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            else:
                data = jvm.org.apache.commons.io.IOUtils.toByteArray(
                    stream, length
                )
            return bytes(data)
        finally:
            stream.close()

    def write_bytes(self, path: str, data: bytes) -> None:
        """Overwriting binary write (used for deletion-vector sidecars)."""
        if self.local:
            p = strip_scheme(path)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "wb") as f:
                f.write(data)
            return
        fs, jpath = self._jfs(path)
        stream = fs.create(jpath, True)
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()

    def atomic_create(self, path: str, content: str) -> None:
        """Exclusive create: raises FileExistsError if path exists.
        This is the commit primitive for the transaction log."""
        if self.local:
            p = strip_scheme(path)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                os.write(fd, content.encode("utf-8"))
            finally:
                os.close(fd)
            return
        fs, jpath = self._jfs(path)
        try:
            stream = fs.create(jpath, False)  # overwrite=False
        except Exception as exc:  # Hadoop throws FileAlreadyExistsException
            raise FileExistsError(path) from exc
        try:
            stream.write(bytearray(content, "utf-8"))
        finally:
            stream.close()

    def file_size(self, path: str) -> int:
        if self.local:
            return os.path.getsize(strip_scheme(path))
        fs, jpath = self._jfs(path)
        return fs.getFileStatus(jpath).getLen()

    def mtime(self, path: str) -> float:
        """Modification time in epoch seconds — works on every Hadoop FS, so
        vacuum's retention check is uniform across file://, hdfs://, s3a://,
        gs:// (Hadoop reports milliseconds; local uses os.path.getmtime)."""
        if self.local:
            return os.path.getmtime(strip_scheme(path))
        fs, jpath = self._jfs(path)
        return fs.getFileStatus(jpath).getModificationTime() / 1000.0
