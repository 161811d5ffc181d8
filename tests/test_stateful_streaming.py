"""applyInPandasWithState operators: cross-batch dedup + running counts."""

import pytest
from pyspark.sql import functions as F

from rdf_i2b2_converter_spark import schemas
from rdf_i2b2_converter_spark.streaming.stateful import (
    dedup_pages_stream,
    entity_count_stream,
)


@pytest.fixture()
def dup_pages_dir(spark, tmp_path):
    """Two files with overlapping urls — maxFilesPerTrigger=1 makes them
    separate micro-batches, so dedup must work ACROSS batches (state)."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    batch1 = [(f"u{i}", ts, None, f"text {i}", "en") for i in range(10)]
    batch2 = [(f"u{i}", ts, None, f"text {i} recrawl", "en") for i in range(5, 15)]
    d = str(tmp_path / "pages")
    spark.createDataFrame(batch1, schemas.PAGES).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(batch2, schemas.PAGES).coalesce(1).write.mode("append").parquet(d)
    return d


def test_cross_batch_dedup(spark, dup_pages_dir, tmp_path):
    stream = (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", 1)
        .parquet(dup_pages_dir)
    )
    out = dedup_pages_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("deduped")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT url FROM deduped").collect()
    urls = [r["url"] for r in rows]
    assert sorted(urls) == sorted(set(urls))  # no url twice, across batches
    assert set(urls) == {f"u{i}" for i in range(15)}


def test_running_entity_counts(spark, tmp_path):
    rows = [
        ("u1", "spark", 0, 1, 2),
        ("u2", "spark", 0, 1, 3),
        ("u3", "join", 0, 1, 1),
    ]
    d = str(tmp_path / "mentions")
    spark.createDataFrame(rows, schemas.MENTIONS).write.parquet(d)
    stream = spark.readStream.schema(schemas.MENTIONS).parquet(d)
    out = entity_count_stream(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("counts")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["surface"]: r["total"] for r in spark.sql("SELECT * FROM counts").collect()}
    assert got == {"spark": 5, "join": 1}
