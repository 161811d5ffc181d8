"""Small-file text I/O through the Hadoop FileSystem API.

Index sidecars (`_ann_meta.json`, `_ivf_meta.json`) and the resumable-sink
ledger/metrics files live NEXT TO data Spark writes through Hadoop — on a
cluster that is hdfs:// or s3a://, not the driver's local disk. Writing
them with local ``open()`` puts the metadata on the wrong filesystem for
every non-local deployment (ADVICE r4), so these helpers route the same
paths through ``Path.getFileSystem`` exactly like the data writes do.
Local paths keep working (Hadoop's LocalFileSystem), so tests and the
sandbox see no difference.

Only for config-sized payloads (sidecars are KBs, centroid tables at most
a few MB): the content crosses the py4j bridge in one call each way.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm  # noqa: SLF001
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    # Unwrap ChecksumFileSystem (LocalFileSystem): these sidecars are meant
    # to be hand-editable (a user forces a partial re-run by editing the
    # ledger), and a local edit would orphan the .crc shadow file, turning
    # the next read into a ChecksumException. Raw fs = no .crc clutter, no
    # stale-checksum trap; HDFS/S3A don't wrap and keep their own checksums.
    try:
        fs = fs.getRawFileSystem()
    except Exception:
        pass
    return fs, p


def write_text_file(spark: SparkSession, path: str, text: str) -> None:
    """Create/overwrite a single small text file at ``path`` (any scheme
    the job's Hadoop conf supports: file:, hdfs:, s3a:, ...)."""
    fs, p = _fs_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text_file(spark: SparkSession, path: str) -> str:
    """Read a small UTF-8 text file written by :func:`write_text_file`."""
    jvm = spark._jvm  # noqa: SLF001
    fs, p = _fs_path(spark, path)
    stream = fs.open(p)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        chunks: list[str] = []
        line = reader.readLine()
        while line is not None:
            chunks.append(line)
            line = reader.readLine()
        return "\n".join(chunks)
    finally:
        stream.close()


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def makedirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs_path(spark, path)
    fs.mkdirs(p)
