"""Table sources/sinks: JSONL pages ingestion, size-targeted writer, CSV
round-trip, empty init."""

import base64
import json

from pyspark.sql import functions as F

from rdf_i2b2_converter_spark import schemas
from rdf_i2b2_converter_spark.sources.tables import (
    init_empty,
    read_csv,
    read_pages_jsonl,
    write_csv,
    write_sized_parquet,
)


def test_read_pages_jsonl_and_pipeline(spark, tmp_path):
    """JSONL (html as base64) -> pages schema -> the extraction invariant
    holds end-to-end through the real pipeline entry."""
    from rdf_i2b2_converter_spark.functions.text import extract_text_py
    from rdf_i2b2_converter_spark.plans.pipeline import verify_extraction

    html = b"<p>zorg1 says hello</p>"
    rows = [
        {
            "url": "https://x.org/1",
            "warc_ts": "2024-01-01T00:00:00",
            "html_b64": base64.b64encode(html).decode(),
            "text": extract_text_py(html),
            "lang": "en",
        },
        {"url": "https://x.org/2", "warc_ts": None, "html_b64": None, "text": "plain", "lang": "de"},
    ]
    p = tmp_path / "pages.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    pages = read_pages_jsonl(spark, str(p))
    got = {r["url"]: r for r in pages.collect()}
    assert bytes(got["https://x.org/1"]["html"]) == html
    assert got["https://x.org/2"]["html"] is None
    assert verify_extraction(pages).count() == 0


def test_write_sized_parquet_scales_file_count(spark, tmp_path):
    small = spark.range(0, 1000).select(F.col("id"), F.lit("x" * 100).alias("pad"))
    big = spark.range(0, 200_000).select(F.col("id"), F.lit("y" * 100).alias("pad"))
    n_small = write_sized_parquet(small, str(tmp_path / "small"), target_bytes=1 << 20)
    n_big = write_sized_parquet(big, str(tmp_path / "big"), target_bytes=1 << 20)
    assert n_small == 1
    assert n_big > n_small  # more data -> more target-sized files
    assert spark.read.parquet(str(tmp_path / "big")).count() == 200_000


def test_write_sized_parquet_empty(spark, tmp_path):
    empty = spark.range(0).select(F.col("id"))
    assert write_sized_parquet(empty, str(tmp_path / "e")) == 1
    assert spark.read.parquet(str(tmp_path / "e")).count() == 0


def test_csv_roundtrip_and_init(spark, tmp_path):
    df = spark.createDataFrame([(1, "a;b"), (2, None)], "k int, v string")
    write_csv(df, str(tmp_path / "c"))
    back = read_csv(spark, str(tmp_path / "c"), schema=df.schema)
    assert {(r["k"], r["v"]) for r in back.collect()} == {(1, "a;b"), (2, None)}
    init_empty(spark, schemas.GAZETTEER, str(tmp_path / "g"))
    empty = read_csv(spark, str(tmp_path / "g"), schema=schemas.GAZETTEER)
    assert empty.count() == 0 and empty.columns == [f.name for f in schemas.GAZETTEER.fields]


def test_read_csv_roundtrip_and_semicolon_lookup(spark, tmp_path):
    """A4 CSV scan (pinned schema, no inference pass) and A6 ';'-separated
    lookup scan (fill_metadata_units.py:16-19 analog)."""
    from pyspark.sql import types as T

    from rdf_i2b2_converter_spark.sources.tables import read_csv, write_csv

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta,with,commas")], "k int, v string"
    )
    out = str(tmp_path / "csv_rt")
    write_csv(df, out)
    schema = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("v", T.StringType())]
    )
    back = read_csv(spark, out, schema=schema)
    assert back.schema == schema  # pinned, not inferred
    assert {tuple(r) for r in back.collect()} == {(1, "alpha"), (2, "beta,with,commas")}

    lookup = tmp_path / "units.csv"
    lookup.write_text("key;unit\ncreat;mg/dL\nweight;kg\n")
    lk = read_csv(spark, str(lookup), sep=";")
    assert {(r["key"], r["unit"]) for r in lk.collect()} == {
        ("creat", "mg/dL"), ("weight", "kg"),
    }
