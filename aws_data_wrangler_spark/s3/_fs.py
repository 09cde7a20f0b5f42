"""Object-store operations via the Hadoop FileSystem API.

The reference implements these with boto3 against S3
(/root/reference/awswrangler/s3/_list.py, _delete.py, _copy.py,
_describe.py, _wait.py). We go through Hadoop's FileSystem instead:
JVM-side, URI-scheme-agnostic — ``file://`` in tests, ``s3a://`` /
``hdfs://`` / ``abfs://`` on a cluster — and it inherits the
committer/credential config of the Spark session, so there is no
second credential path to manage.
"""

from __future__ import annotations

import posixpath
import re
import time
from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import SparkSession

from aws_data_wrangler_spark.exceptions import InvalidArgument


def _active_spark(spark: Optional[SparkSession] = None) -> SparkSession:
    if spark is not None:
        return spark
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from aws_data_wrangler_spark._session import get_spark

    return get_spark()


_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:/")


def normalize_path(path: str) -> str:
    """Qualify a bare local path with file:// so URIs are unambiguous.

    Accepts both URI spellings Hadoop produces (``file:/x`` and
    ``file:///x``) untouched.
    """
    if not _SCHEME_RE.match(path):
        return f"file://{posixpath.abspath(path)}"
    return path


def _fs_for(spark: SparkSession, path: str) -> Tuple[Any, Any]:
    """(FileSystem, jvm) for a URI, via the session's Hadoop conf."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    uri = jvm.java.net.URI.create(normalize_path(path))
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(uri, hconf)
    return fs, jvm


def _hpath(jvm: Any, path: str) -> Any:
    return jvm.org.apache.hadoop.fs.Path(normalize_path(path))


def _strip_scheme(uri: str) -> str:
    """Drop the scheme, tolerating both ``file:/x`` and ``file:///x``."""
    return re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?", "", uri)


# above this many immediate children, listing fans out as a Spark job
_PARALLEL_LIST_CHILD_THRESHOLD = 32


def _hidden_under_prefix(prefix_uri: str, file_uri: str) -> bool:
    """True when any path component BELOW the listed prefix is hidden.

    Mirrors Spark's ``InMemoryFileIndex.shouldFilterOutPathName`` so the
    driver walk and the distributed (file-index) route return the same
    object set: a directory segment is pruned iff it starts with ``.``,
    or starts with ``_`` and contains no ``=`` (partition dirs like
    ``_yr=2024`` survive); the file basename is hidden iff it starts
    with ``_`` or ``.`` (the stricter data-object rule both routes
    apply explicitly — ``_SUCCESS``, ``_metadata``, ``.crc``).
    The prefix's own name is never examined.
    """
    rel = _strip_scheme(file_uri)[len(_strip_scheme(normalize_path(prefix_uri))) :].lstrip("/")
    segments = rel.split("/")
    for seg in segments[:-1]:
        if seg.startswith(".") or (seg.startswith("_") and "=" not in seg):
            return True
    name = segments[-1]
    return name.startswith("_") or name.startswith(".")


def list_objects(
    path: str,
    suffix: Optional[str] = None,
    spark: Optional[SparkSession] = None,
    distributed: Optional[bool] = None,
) -> List[str]:
    """List file URIs under a prefix, recursively.

    ``distributed=None`` auto-routes: a prefix with more than
    ``_PARALLEL_LIST_CHILD_THRESHOLD`` immediate children is listed
    through Spark's file index (``binaryFile`` source — discovery runs
    as a distributed job across executors, the same parallel partition
    discovery a big scan uses), so a many-million-object prefix never
    serializes on one driver-side walk. Small prefixes keep the cheap
    single-RPC driver listing.

    Ref: /root/reference/awswrangler/s3/_list.py ``list_objects``.
    """
    spark = _active_spark(spark)
    fs, jvm = _fs_for(spark, path)
    hpath = _hpath(jvm, path)
    if not fs.exists(hpath):
        return []
    if distributed is None:
        try:
            distributed = len(fs.listStatus(hpath)) > _PARALLEL_LIST_CHILD_THRESHOLD
        except Exception:
            distributed = False
    if distributed:
        from pyspark.sql import functions as F

        listing = (
            spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true")
            .load(normalize_path(path))
            .select("path")
        )
        name = F.element_at(F.split(F.col("path"), "/"), -1)
        listing = listing.filter(~name.startswith("_") & ~name.startswith("."))
        if suffix is not None:
            listing = listing.filter(F.col("path").endswith(suffix))
        return sorted(r["path"] for r in listing.collect())
    out: List[str] = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        uri = status.getPath().toString()
        # same hidden rule as the distributed route (Spark's file index):
        # markers (_SUCCESS, .crc) and metadata dirs (_delta_log/…) out
        if _hidden_under_prefix(path, uri):
            continue
        if suffix is not None and not uri.endswith(suffix):
            continue
        out.append(uri)
    return sorted(out)


def list_directories(path: str, spark: Optional[SparkSession] = None) -> List[str]:
    """List immediate child directories (partition dirs) of a prefix.

    Ref: /root/reference/awswrangler/s3/_list.py ``list_directories``.
    """
    spark = _active_spark(spark)
    fs, jvm = _fs_for(spark, path)
    hpath = _hpath(jvm, path)
    if not fs.exists(hpath):
        return []
    out = []
    for status in fs.listStatus(hpath):
        if status.isDirectory():
            out.append(status.getPath().toString() + "/")
    return sorted(out)


def does_object_exist(path: str, spark: Optional[SparkSession] = None) -> bool:
    """Ref: /root/reference/awswrangler/s3/_list.py ``does_object_exist``."""
    spark = _active_spark(spark)
    fs, jvm = _fs_for(spark, path)
    return bool(fs.exists(_hpath(jvm, path)))


def size_objects(
    path: Any, spark: Optional[SparkSession] = None
) -> Dict[str, Optional[int]]:
    """Sizes in bytes, keyed by URI; prefix or explicit list.

    Ref: /root/reference/awswrangler/s3/_describe.py ``size_objects``.
    """
    return {
        uri: desc.get("ContentLength")
        for uri, desc in describe_objects(path, spark=spark).items()
    }


def describe_objects(
    path: Any, spark: Optional[SparkSession] = None
) -> Dict[str, Dict[str, Any]]:
    """Per-object metadata (size, mtime), keyed by URI.

    Ref: /root/reference/awswrangler/s3/_describe.py ``describe_objects``.
    """
    spark = _active_spark(spark)
    paths = [path] if isinstance(path, str) else list(path)
    expanded: List[str] = []
    for p in paths:
        if isinstance(path, str):
            expanded.extend(list_objects(p, spark=spark) or ([p] if does_object_exist(p, spark=spark) else []))
        else:
            expanded.append(p)
    out: Dict[str, Dict[str, Any]] = {}
    for p in expanded:
        fs, jvm = _fs_for(spark, p)
        hp = _hpath(jvm, p)
        if not fs.exists(hp):
            continue
        status = fs.getFileStatus(hp)
        out[status.getPath().toString()] = {
            "ContentLength": status.getLen(),
            "LastModified": status.getModificationTime() / 1000.0,
            "IsDirectory": status.isDirectory(),
        }
    return out


def delete_objects(path: Any, spark: Optional[SparkSession] = None) -> None:
    """Delete a prefix (recursive) or an explicit list of URIs.

    Ref: /root/reference/awswrangler/s3/_delete.py ``delete_objects``.
    """
    spark = _active_spark(spark)
    paths = [path] if isinstance(path, str) else list(path)
    for p in paths:
        fs, jvm = _fs_for(spark, p)
        hp = _hpath(jvm, p)
        if fs.exists(hp):
            fs.delete(hp, True)


def copy_objects(
    paths: List[str],
    source_path: str,
    target_path: str,
    spark: Optional[SparkSession] = None,
) -> List[str]:
    """Copy objects under source_path to target_path, preserving suffixes.

    Ref: /root/reference/awswrangler/s3/_copy.py ``copy_objects``.
    """
    spark = _active_spark(spark)
    source_path = normalize_path(source_path).rstrip("/")
    target_path = normalize_path(target_path).rstrip("/")
    out: List[str] = []
    for p in paths:
        p_norm = normalize_path(p)
        rel = _strip_scheme(p_norm)[len(_strip_scheme(source_path)):].lstrip("/")
        if not _strip_scheme(p_norm).startswith(_strip_scheme(source_path)):
            raise InvalidArgument(f"{p} is not under {source_path}")
        target = f"{target_path}/{rel}"
        fs_src, jvm = _fs_for(spark, p_norm)
        fs_dst, _ = _fs_for(spark, target)
        util = jvm.org.apache.hadoop.fs.FileUtil
        fs_dst.mkdirs(_hpath(jvm, posixpath.dirname(target)))
        util.copy(fs_src, _hpath(jvm, p_norm), fs_dst, _hpath(jvm, target), False, True, spark._jsc.hadoopConfiguration())
        out.append(target)
    return out


def merge_datasets(
    source_path: str,
    target_path: str,
    mode: str = "append",
    spark: Optional[SparkSession] = None,
) -> List[str]:
    """Merge one dataset prefix into another (append / overwrite /
    overwrite_partitions), preserving partition directory structure.

    Ref: /root/reference/awswrangler/s3/_copy.py ``merge_datasets``.
    """
    spark = _active_spark(spark)
    if mode not in ("append", "overwrite", "overwrite_partitions"):
        raise InvalidArgument(f"invalid mode {mode}")
    source_objects = list_objects(source_path, spark=spark)
    if mode == "overwrite":
        delete_objects(target_path, spark=spark)
    elif mode == "overwrite_partitions":
        src_root = _strip_scheme(normalize_path(source_path)).rstrip("/")
        partition_rels = {
            posixpath.dirname(_strip_scheme(normalize_path(p))[len(src_root):].lstrip("/"))
            for p in source_objects
        }
        for rel in partition_rels:
            if rel:
                delete_objects(f"{target_path.rstrip('/')}/{rel}", spark=spark)
    return copy_objects(source_objects, source_path, target_path, spark=spark)


def wait_objects_exist(
    paths: List[str],
    delay: float = 0.1,
    max_attempts: int = 10,
    spark: Optional[SparkSession] = None,
) -> None:
    """Ref: /root/reference/awswrangler/s3/_wait.py ``wait_objects_exist``."""
    _wait(paths, True, delay, max_attempts, spark)


def wait_objects_not_exist(
    paths: List[str],
    delay: float = 0.1,
    max_attempts: int = 10,
    spark: Optional[SparkSession] = None,
) -> None:
    """Ref: /root/reference/awswrangler/s3/_wait.py ``wait_objects_not_exist``."""
    _wait(paths, False, delay, max_attempts, spark)


def _wait(
    paths: List[str],
    want_exist: bool,
    delay: float,
    max_attempts: int,
    spark: Optional[SparkSession],
) -> None:
    spark = _active_spark(spark)
    for _ in range(max_attempts):
        states = [does_object_exist(p, spark=spark) for p in paths]
        if all(s == want_exist for s in states):
            return
        time.sleep(delay)
    raise TimeoutError(f"objects did not reach exist={want_exist}: {paths}")


class _HadoopFileLike:
    """Minimal file-like over a fully-buffered Hadoop FS object.

    Reads are one-shot (the reference's ``s3_block_size=-1`` mode:
    download once, serve from memory); writes buffer locally and flush
    to the FileSystem on close — the right unit of work for the
    driver-side helper this is (bulk data paths go through
    ``read_parquet``/``to_parquet``, never this).
    """

    def __init__(self, fs: Any, jvm: Any, path: str, mode: str):
        import io

        self._fs, self._jvm, self._path, self._mode = fs, jvm, path, mode
        self.closed = False
        if "r" in mode:
            stream = fs.open(_hpath(jvm, path))
            bos = jvm.java.io.ByteArrayOutputStream()
            jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, bos, 65536, True)
            self._buf = io.BytesIO(bytes(bos.toByteArray()))
        else:
            self._buf = io.BytesIO()

    def read(self, size: int = -1) -> bytes:
        return self._buf.read(size)

    def readline(self, size: int = -1) -> bytes:
        return self._buf.readline(size)

    def write(self, data: bytes) -> int:
        return self._buf.write(data)

    def seek(self, pos: int, whence: int = 0) -> int:
        return self._buf.seek(pos, whence)

    def tell(self) -> int:
        return self._buf.tell()

    def readable(self) -> bool:
        return "r" in self._mode

    def writable(self) -> bool:
        return "w" in self._mode or "a" in self._mode

    def seekable(self) -> bool:
        return True

    def flush(self) -> None:
        pass

    def __iter__(self):
        return iter(self._buf)

    def close(self) -> None:
        if self.closed:
            return
        if self.writable():
            out = self._fs.create(_hpath(self._jvm, self._path), True)
            out.write(self._buf.getvalue())
            out.close()
        self.closed = True


def open_s3_object(
    path: str,
    mode: str = "rb",
    encoding: str = "utf-8",
    newline: Optional[str] = "\n",
    spark: Optional[SparkSession] = None,
):
    """Context manager yielding a file-like for any Hadoop-FS URI
    (ref: ``awswrangler/s3/_fs.py:558`` ``open_s3_object``). Binary
    modes yield the raw buffer; text modes wrap it in a TextIOWrapper.
    """
    import contextlib
    import io

    if not any(c in mode for c in "rwa"):
        raise InvalidArgument(f"unsupported mode: {mode}")

    @contextlib.contextmanager
    def _cm():
        session = _active_spark(spark)
        fs, jvm = _fs_for(session, path)
        raw = _HadoopFileLike(fs, jvm, path, mode)
        text = None
        try:
            if "b" in mode:
                yield raw
            else:
                text = io.TextIOWrapper(raw, encoding=encoding, newline=newline)
                yield text
        finally:
            if text is not None:
                text.flush()
            raw.close()

    return _cm()
