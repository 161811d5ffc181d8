"""Iceberg snapshot-commit gate (VERDICT r2 #8): exercised the moment an
iceberg-spark-runtime jar is on the classpath, collected-skipped otherwise
(the sandbox image ships no Iceberg jar and pip installs are off).

Run with the jar via:  make iceberg-test   (PYSPARK_SUBMIT_ARGS --packages)
"""

import pytest

from rdf_i2b2_converter_spark.sources.tables import iceberg_available, write_table


def _require_iceberg(spark):
    if not iceberg_available(spark):
        pytest.skip("iceberg runtime not on the JVM classpath in this image")


def test_write_table_iceberg_snapshot_commit(spark, tmp_path):
    """write_table routes catalog identifiers to Iceberg and every write is
    an atomic snapshot commit: appends add snapshots, reads see exactly the
    committed rows, time-travel to the first snapshot still works."""
    _require_iceberg(spark)
    spark.conf.set("spark.sql.catalog.itest", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.itest.type", "hadoop")
    spark.conf.set("spark.sql.catalog.itest.warehouse", str(tmp_path / "wh"))

    df = spark.range(10).withColumnRenamed("id", "v")
    fmt = write_table(df, "itest.db.t1")
    assert fmt == "iceberg"
    assert spark.table("itest.db.t1").count() == 10

    snaps = spark.sql("SELECT snapshot_id FROM itest.db.t1.snapshots").collect()
    assert len(snaps) >= 1
    first_snapshot = snaps[0]["snapshot_id"]

    write_table(df, "itest.db.t1", mode="append")
    assert spark.table("itest.db.t1").count() == 20
    assert spark.sql("SELECT * FROM itest.db.t1.snapshots").count() == len(snaps) + 1

    # time travel: the pre-append snapshot is intact (resume/rollback basis)
    old = spark.read.option("snapshot-id", first_snapshot).table("itest.db.t1")
    assert old.count() == 10


def test_write_table_partitioned_iceberg(spark, tmp_path):
    _require_iceberg(spark)
    spark.conf.set("spark.sql.catalog.itest2", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.itest2.type", "hadoop")
    spark.conf.set("spark.sql.catalog.itest2.warehouse", str(tmp_path / "wh2"))
    df = spark.range(100).selectExpr("id AS v", "id % 4 AS part")
    assert write_table(df, "itest2.db.p1", partition_by=["part"]) == "iceberg"
    # partition pruning: a part filter reads one partition's files
    assert spark.table("itest2.db.p1").filter("part = 2").count() == 25


def test_write_table_parquet_fallback(spark, tmp_path):
    """Without the runtime (or for path-like identifiers) write_table falls
    back to parquet — runs everywhere, including this image."""
    df = spark.range(5).withColumnRenamed("id", "v")
    out = str(tmp_path / "plain_tbl")
    assert write_table(df, out) == "parquet"
    assert spark.read.parquet(out).count() == 5
