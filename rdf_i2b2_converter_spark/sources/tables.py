"""Table sources/sinks: parquet (default), CSV, Iceberg (import-gated).

Analogs: CSV header-once append sink (src/utils.py:209-217, A3), CSV scan
(src/utils.py:220-226, A4), header-only init (src/starschema.py:36-62, A5),
';'-separated lookup scan (src/scripts/fill_metadata_units.py:16-19, A6).
Iceberg gives the snapshot-commit sink the north_rule asks for; this image
has no Iceberg runtime jar, so it is feature-detected and parquet+ledger
(plans/pipeline.py) is the fallback with the same idempotency contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType | None = None, sep: str = ",") -> DataFrame:
    reader = spark.read.option("header", True).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)  # never inferSchema at scale: full extra pass
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed CSV sink. The reference's single-file append-with-offset
    protocol (db_to_csv) is an artifact of single-process execution; a
    directory of part files with one header each is the distributed form."""
    df.write.mode(mode).option("header", True).csv(path)


def init_empty(spark: SparkSession, schema: T.StructType, path: str) -> None:
    """Header-only table init (gen_empty_dims, src/starschema.py:36-62)."""
    spark.createDataFrame([], schema).write.mode("overwrite").option("header", True).csv(path)


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Common-Crawl-style JSONL pages source: one JSON object per line with
    (url, warc_ts, html_b64?, text, lang). Schema pinned (no inference pass
    — at 100 TB a schema-inference scan is a full extra read); html arrives
    base64 (JSON has no binary) and is decoded JVM-side."""
    from pyspark.sql import functions as F

    raw_schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html_b64", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    df = spark.read.schema(raw_schema).json(path)
    # PERMISSIVE mode turns malformed lines into all-null rows; a page
    # without a url is unusable — drop, don't crash (one bad line must not
    # kill a 100 TB ingest)
    return df.filter(F.col("url").isNotNull()).select(
        "url",
        "warc_ts",
        F.unbase64(F.col("html_b64")).alias("html"),
        "text",
        "lang",
    )


def write_sized_parquet(
    df: DataFrame,
    path: str,
    target_bytes: int | None = None,
    sample_rows: int = 1000,
    mode: str = "overwrite",
) -> int:
    """Size-targeted sink: estimate on-disk bytes from a row sample and
    repartition so output files land near ``target_bytes``
    (config.TARGET_PARTITION_BYTES, default 512 MB) — the knob that keeps a
    100 TB sink at ~200k healthy files instead of millions of tiny ones or
    a handful of unsplittable monsters. Returns the partition count used.

    Estimation order (cheapest first):
    1. Catalyst plan statistics (``optimizedPlan().stats().sizeInBytes``) —
       derived from source file sizes and schema widths at PLANNING time,
       zero extra data passes. Used when the optimizer has a real number
       (file-backed sources propagate one; 'unknown' surfaces as a
       Long.MaxValue-ish sentinel we reject).
    2. Fallback: one limit(sample)+count pass with a pickle-based row-width
       estimate (in-memory relations, post-shuffle plans without stats).
    Parquet encodes ~3-5x smaller than in-memory widths — folded into the
    factors. Pathologically compressible data overshoots the file count —
    the safe direction: more smaller files, never unsplittable monsters.
    """
    import pickle

    from ..config import TARGET_PARTITION_BYTES

    target = target_bytes or TARGET_PARTITION_BYTES
    est_disk = None
    try:
        stat = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())  # noqa: SLF001
        if 0 < stat < (1 << 50):  # >1 PiB == the optimizer's 'unknown' sentinel
            # plan stats track source bytes (parquet: already compressed);
            # re-encoding lands in the same ballpark
            est_disk = stat
    except Exception:
        pass
    if est_disk is None:
        n_rows = df.count()
        if n_rows == 0:
            df.write.mode(mode).parquet(path)
            return 1
        sample = df.limit(sample_rows).collect()
        raw_row = max(1, len(pickle.dumps([tuple(r) for r in sample])) // max(1, len(sample)))
        est_disk = int(n_rows * raw_row * 0.3)  # parquet encoding + compression factor
    n_parts = max(1, (est_disk + target - 1) // target)
    df.repartition(n_parts).write.mode(mode).parquet(path)
    return n_parts


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 32, sort_col: str | None = None
) -> None:
    """Bucketed table sink: co-locates later joins/aggregations on
    ``bucket_col`` with NO exchange (SURVEY.md §2 note: the new engine adds
    bucketing for co-located joins — the table-layout analog of the
    reference's per-terminology side graphs). Two tables bucketed the same
    way join shuffle-free; at 100 TB that removes the dominant cost of
    repeated fact-to-fact joins."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the iceberg-spark runtime is on the JVM classpath. Two
    review-driven subtleties: (1) py4j's ``_jvm.a.b.C`` attribute access
    returns a lazy JavaPackage and NEVER raises for a missing class, so a
    bare attribute probe reports Iceberg present on every image — real
    reflection is required; (2) jars pulled by ``--packages`` /
    ``spark.jars.packages`` land in Spark's MutableURLClassLoader, not the
    system classpath, so single-arg ``Class.forName`` alone gives false
    negatives — probe Spark's context classloader first."""
    jvm = spark._jvm  # noqa: SLF001
    cls = "org.apache.iceberg.spark.SparkCatalog"
    try:
        loader = jvm.java.lang.Thread.currentThread().getContextClassLoader()
        jvm.java.lang.Class.forName(cls, False, loader)
        return True
    except Exception:
        pass
    try:
        jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def write_table(df: DataFrame, identifier_or_path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> str:
    """Snapshot-style table write: Iceberg when the runtime is present
    (atomic snapshot commit), parquet directory otherwise (atomicity via
    the _ledger protocol in plans/pipeline.py). Returns the format used."""
    spark = df.sparkSession
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if iceberg_available(spark) and "/" not in identifier_or_path:
        writer.format("iceberg").saveAsTable(identifier_or_path)
        return "iceberg"
    writer.parquet(identifier_or_path)
    return "parquet"
