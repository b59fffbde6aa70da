"""Filesystem-scheme-agnostic small-file IO for manifests & sidecars.

The reference engine is httpfs-first: every byte it writes or reads goes
through DuckDB's filesystem abstraction, so s3://, gcs:// and local paths
behave identically (/root/reference/README.md:99-110). The Spark twin of
that abstraction is the Hadoop FileSystem API, reachable from the driver
through the JVM gateway: any scheme Spark itself can read or write
(file://, hdfs://, s3a://, gs://) works for the engine's small control
files too — the manifest row, the JSON sidecar, per-chunk lineage.

Plain local paths (no ``://``) take a direct ``os``/``open`` fast path;
everything else routes through Hadoop. Writers never leave a torn file
visible: Hadoop writes go to a ``.tmp`` name then rename (rename is
atomic on HDFS and local; on S3 it's copy+delete, acceptable for these
1-row control files because readers key on the final name).
"""

from __future__ import annotations

import os
import threading


def is_remote(path: str) -> bool:
    return "://" in path


def _fs(spark, uri: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(uri)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, jpath


def write_bytes(spark, dir_uri: str, filename: str, data: bytes) -> str:
    """Write ``data`` as ``dir_uri/filename`` (atomic-rename publish)."""
    if not is_remote(dir_uri):
        os.makedirs(dir_uri, exist_ok=True)
        final = os.path.join(dir_uri, filename)
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, final)
        return final
    jvm, fs, jdir = _fs(spark, dir_uri)
    fs.mkdirs(jdir)
    final = dir_uri.rstrip("/") + "/" + filename
    tmp = final + ".tmp"
    out = fs.create(jvm.org.apache.hadoop.fs.Path(tmp), True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    jfinal = jvm.org.apache.hadoop.fs.Path(final)
    if fs.exists(jfinal):
        fs.delete(jfinal, False)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jfinal)
    return final


def read_bytes(spark, dir_uri: str, filename: str) -> bytes:
    uri = (
        os.path.join(dir_uri, filename)
        if not is_remote(dir_uri)
        else dir_uri.rstrip("/") + "/" + filename
    )
    if not is_remote(uri):
        with open(uri, "rb") as f:
            return f.read()
    jvm, fs, jpath = _fs(spark, uri)
    stream = fs.open(jpath)
    try:
        # py4j passes byte arrays BY VALUE — Java-side mutation of a
        # Python bytearray is lost — so copy JVM-side and ship the
        # finished byte[] back (converted to bytes by py4j)
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 1 << 16, False)
        return bytes(baos.toByteArray())
    finally:
        stream.close()


def exists(spark, dir_uri: str, filename: str) -> bool:
    if not is_remote(dir_uri):
        return os.path.exists(os.path.join(dir_uri, filename))
    jvm, fs, _ = _fs(spark, dir_uri)
    return fs.exists(
        jvm.org.apache.hadoop.fs.Path(dir_uri.rstrip("/") + "/" + filename)
    )


def delete_dir(spark, dir_uri: str) -> None:
    if not is_remote(dir_uri):
        import shutil

        shutil.rmtree(dir_uri, ignore_errors=True)
        return
    jvm, fs, jdir = _fs(spark, dir_uri)
    if fs.exists(jdir):
        fs.delete(jdir, True)


def write_bytes_exclusive(spark, dir_uri: str, filename: str, data: bytes) -> str:
    """Create ``dir_uri/filename`` only if it does not already exist —
    the optimistic-concurrency primitive (Iceberg's metadata CAS
    analog). Raises ``FileExistsError`` on collision.

    The name must appear with its FULL contents: a create-then-write
    ('xb' / create(overwrite=False)) publishes an empty file first, and
    a concurrent reader that lists the tip snapshot between the create
    and the write parses zero bytes (a real JSONDecodeError caught by
    the two-appender race test). So publish like Iceberg's
    HadoopTableOperations: write everything to a uniquely-named temp
    file, then atomically link/rename it to the final name, with the
    no-overwrite rename doubling as the CAS."""
    if not is_remote(dir_uri):
        os.makedirs(dir_uri, exist_ok=True)
        final = os.path.join(dir_uri, filename)
        # dot-prefixed (hidden) temp name: consumers list by exact
        # suffix (".json") so temps are already invisible to them, and
        # the Hadoop hidden-file convention also keeps naive "snap-*"
        # globs from ever seeing an in-flight write
        tmp = os.path.join(
            dir_uri,
            f".{filename}.tmp.{os.getpid()}.{threading.get_ident()}",
        )
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            # link(2) fails with EEXIST if final exists and otherwise
            # publishes the complete temp contents atomically
            os.link(tmp, final)
        except FileExistsError:
            raise FileExistsError(final) from None
        finally:
            os.unlink(tmp)
        return final
    jvm, fs, jdir = _fs(spark, dir_uri)
    fs.mkdirs(jdir)
    final = dir_uri.rstrip("/") + "/" + filename
    jfinal = jvm.org.apache.hadoop.fs.Path(final)
    tmp = (
        dir_uri.rstrip("/")
        + f"/.{filename}.tmp.{os.getpid()}.{threading.get_ident()}"
    )
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    out = fs.create(jtmp, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    # cheap pre-check keeps the common collision loud even on stores
    # whose rename overwrites; the rename result catches the race
    if fs.exists(jfinal) or not fs.rename(jtmp, jfinal):
        fs.delete(jtmp, False)
        raise FileExistsError(final)
    return final


def delete_file(spark, dir_uri: str, filename: str) -> None:
    if not is_remote(dir_uri):
        try:
            os.remove(os.path.join(dir_uri, filename))
        except FileNotFoundError:
            pass
        return
    jvm, fs, _ = _fs(spark, dir_uri)
    p = jvm.org.apache.hadoop.fs.Path(dir_uri.rstrip("/") + "/" + filename)
    if fs.exists(p):
        fs.delete(p, False)


def list_files(spark, dir_uri: str) -> list[str]:
    """Basenames of plain files directly under ``dir_uri`` (sorted)."""
    if not is_remote(dir_uri):
        if not os.path.isdir(dir_uri):
            return []
        return sorted(
            fn for fn in os.listdir(dir_uri)
            if os.path.isfile(os.path.join(dir_uri, fn))
        )
    jvm, fs, jdir = _fs(spark, dir_uri)
    if not fs.exists(jdir):
        return []
    out = []
    for st in fs.listStatus(jdir):
        if st.isFile():
            out.append(st.getPath().getName())
    return sorted(out)


def list_dirs(spark, dir_uri: str) -> list[str]:
    """Basenames of subdirectories directly under ``dir_uri`` (sorted)."""
    if not is_remote(dir_uri):
        if not os.path.isdir(dir_uri):
            return []
        return sorted(
            fn for fn in os.listdir(dir_uri)
            if os.path.isdir(os.path.join(dir_uri, fn))
        )
    jvm, fs, jdir = _fs(spark, dir_uri)
    if not fs.exists(jdir):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(jdir)
        if st.isDirectory()
    )
