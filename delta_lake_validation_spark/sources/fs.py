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
    Hadoop FileSystem through the JVM gateway — or, when constructed
    WITHOUT a SparkSession (Python DataSource planning/scan workers,
    where no JVM gateway exists), read-only operations route through
    pyarrow for every scheme it speaks.  Mutations without a session
    raise: the commit primitive (atomic exclusive create) has no portable
    pyarrow equivalent, and readers never need them."""

    def __init__(self, spark: SparkSession | None, root: str):
        self.spark = spark
        self.root = root
        self.local = is_local(root)

    # -- helpers -----------------------------------------------------------
    def _jfs(self, path: str):
        if self.spark is None:
            raise RuntimeError(
                f"FileSystem: no SparkSession for non-local path {path!r}; "
                "only pyarrow-readable operations are available sparkless"
            )
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        conf = self.spark._jsc.hadoopConfiguration()
        return jpath.getFileSystem(conf), jpath

    @property
    def _sparkless(self) -> bool:
        return self.spark is None

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
        if self._sparkless:
            return sorted(p for p, _ in self._pa_list(prefix))
        fs, jpath = self._jfs(prefix)
        if not fs.exists(jpath):
            return []
        it = fs.listFiles(jpath, True)
        out = []
        while it.hasNext():
            out.append(it.next().getPath().toString())
        return sorted(out)

    def _pa_list(self, prefix: str) -> list[tuple[str, int]]:
        import pyarrow.fs as pafs

        fs, norm = pa_fs(prefix)
        sel = pafs.FileSelector(norm, recursive=True, allow_not_found=True)
        return [
            (i.path, int(i.size or 0))
            for i in fs.get_file_info(sel)
            if i.type == pafs.FileType.File
        ]

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
        if self._sparkless:
            return sorted(self._pa_list(prefix))
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
        if self._sparkless:
            import pyarrow.fs as pafs

            fs, norm = pa_fs(path)
            return fs.get_file_info(norm).type != pafs.FileType.NotFound
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
        if self._sparkless:
            fs, norm = pa_fs(path)
            with fs.open_input_stream(norm) as stream:
                return stream.read().decode("utf-8")
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
        if self._sparkless:
            fs, norm = pa_fs(path)
            with fs.open_input_file(norm) as f:
                if offset:
                    f.seek(offset)
                return f.read(length) if length is not None else f.read()
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
        if self._sparkless:
            fs, norm = pa_fs(path)
            return int(fs.get_file_info(norm).size or 0)
        fs, jpath = self._jfs(path)
        return fs.getFileStatus(jpath).getLen()

    def mtime(self, path: str) -> float:
        """Modification time in epoch seconds — works on every Hadoop FS, so
        vacuum's retention check is uniform across file://, hdfs://, s3a://,
        gs:// (Hadoop reports milliseconds; local uses os.path.getmtime)."""
        if self.local:
            return os.path.getmtime(strip_scheme(path))
        if self._sparkless:
            fs, norm = pa_fs(path)
            info = fs.get_file_info(norm)
            return info.mtime.timestamp() if info.mtime else 0.0
        fs, jpath = self._jfs(path)
        return fs.getFileStatus(jpath).getModificationTime() / 1000.0


def pa_fs(path: str):
    """(pyarrow FileSystem, normalized path) for ``path`` — the sparkless /
    executor-side twin of the Hadoop facade.  Raises when pyarrow has no
    driver for the scheme (callers fall back to the JVM path)."""
    import pyarrow.fs as pafs

    if is_local(path):
        return pafs.LocalFileSystem(), strip_scheme(path)
    return pafs.FileSystem.from_uri(path)


class PyArrowReadFS:
    """read_bytes-only FS adapter over :func:`pa_fs` — for executor and
    sparkless planning workers, where no JVM gateway exists.  Works for
    every scheme pyarrow speaks (file, s3, gcs, hdfs, ...).  The single
    canonical copy: DV sidecar fetches (sources/dv.py) and deltapy
    planning (sources/pydatasource.py) both import it from here."""

    def read_bytes(
        self, path: str, offset: int = 0, length: int | None = None
    ) -> bytes:
        fs, norm = pa_fs(path)
        with fs.open_input_file(norm) as f:
            if offset:
                f.seek(offset)
            return f.read(length) if length is not None else f.read()


def rel_under(root: str, path: str) -> str | None:
    """``path`` relative to ``root`` when ``path`` lives under it, else
    None.  Both arguments must come from the SAME normalization (both
    strip_scheme'd, or both pyarrow fs-normalized) — mixing forms is the
    live-data-deletion bug this helper exists to prevent."""
    base = root.rstrip("/")
    if path == base:
        return ""
    if path.startswith(base + "/"):
        return path[len(base) + 1 :]
    return None


def list_stale_distributed(
    spark: SparkSession,
    location: str,
    keep_rel: set[str],
    cutoff: float,
    skip_top,
    fs_factory=None,
) -> list[str] | None:
    """Vacuum candidate discovery as Spark jobs: recursive pyarrow listings
    per top-level directory fan out over executors (file mtimes ride each
    listing — no per-file stat RPCs), candidates anti-join the ``keep_rel``
    set in Catalyst, and only the doomed paths come back to the driver.

    ``keep_rel``: LOCATION-RELATIVE paths that must survive (live data
    files, live DV sidecars, committed CDF files).  Everything here is
    compared in location-relative space: pyarrow's FileInfo.path is
    fs-normalized ('bucket/tbl/...' on s3, '/tbl/...' on local) and does
    NOT match scheme-qualified URIs, so both the listings and the keep set
    are reduced to paths relative to the table root before the anti-join.
    ``skip_top(name)``: True for top-level entries vacuum never descends
    into (log/staging dirs).  Candidates are data parquet or DV sidecars
    modified at or before ``cutoff``; everything else is left alone,
    matching the driver-loop rules.  Returns doomed LOCATION-RELATIVE
    paths, or None when pyarrow can't open this filesystem.

    ``fs_factory`` (picklable, default ``pa_fs(location)``) supplies the
    (pyarrow FileSystem, normalized root) pair on driver and executors —
    the seam tests use to exercise non-file:// normalization."""
    from pyspark.sql import functions as F

    factory = fs_factory or (lambda: pa_fs(location))
    try:
        import pyarrow.fs as pafs

        fs, norm = factory()
        top = fs.get_file_info(pafs.FileSelector(norm, allow_not_found=True))
    except Exception:
        return None
    dirs: list[str] = []
    rows: list[tuple[str, float]] = []
    for info in top:
        name = info.path.rsplit("/", 1)[-1]
        if skip_top(name):
            continue
        if info.type == pafs.FileType.Directory:
            dirs.append(info.path)
        elif info.type == pafs.FileType.File:
            rel = rel_under(norm, info.path)
            if rel:
                ts = info.mtime.timestamp() if info.mtime else float("inf")
                rows.append((rel, ts))

    def _scan(paths):
        import pyarrow.fs as pafs2

        fs2, norm2 = factory()
        for d in paths:
            sel = pafs2.FileSelector(d, recursive=True, allow_not_found=True)
            for i in fs2.get_file_info(sel):
                if i.type == pafs2.FileType.File:
                    r = rel_under(norm2, i.path)
                    if r:
                        yield (
                            r,
                            i.mtime.timestamp() if i.mtime else float("inf"),
                        )

    listed = spark.createDataFrame(rows, "path string, mtime double")
    if dirs:
        rdd = spark.sparkContext.parallelize(
            dirs, min(len(dirs), 256)
        ).mapPartitions(_scan)
        listed = listed.unionByName(
            spark.createDataFrame(rdd, "path string, mtime double")
        )
    live = spark.createDataFrame(
        [(p,) for p in sorted(keep_rel)], "path string"
    )
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    is_dv = fname.startswith("deletion_vector_") & fname.endswith(".bin")
    doomed = (
        listed.filter(F.col("mtime") <= F.lit(cutoff))
        .filter(is_dv | F.col("path").endswith(".parquet"))
        .join(live, "path", "left_anti")
    )
    return [r.path for r in doomed.collect()]


def delete_files_distributed(
    spark: SparkSession,
    location: str,
    rel_paths: list[str],
    fs_factory=None,
) -> None:
    """foreachPartition deletes of LOCATION-RELATIVE paths — the parallel
    half of distributed vacuum.  Paths are re-anchored to the pyarrow
    fs-normalized root on each executor (same normalization the listing
    used), so the delete targets exactly what the anti-join doomed.
    Missing files are tolerated (racing vacuum)."""
    factory = fs_factory or (lambda: pa_fs(location))

    def _rm(chunk):
        fs, norm = factory()
        base = norm.rstrip("/")
        for p in chunk:
            try:
                fs.delete_file(f"{base}/{p}")
            except FileNotFoundError:
                pass

    spark.sparkContext.parallelize(
        rel_paths, max(1, min(len(rel_paths) // 64, 256))
    ).foreachPartition(_rm)
