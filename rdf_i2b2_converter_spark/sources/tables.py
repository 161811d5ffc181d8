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
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: SLF001
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
