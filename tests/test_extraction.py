"""Byte-identity contract of text extraction (BASELINE input_hint:
byte-identical extracted text per url) — the analog of the reference's
literal-value goldens (tests/test_dataloader.py)."""

from pyspark.sql import functions as F

from rdf_i2b2_converter_spark.functions.text import extract_text, extract_text_py


def test_goldens():
    cases = [
        (b"<p>hello world</p>", "hello world"),
        (b"<html><script>var x = 1 < 2;</script><b>a</b></html>", "a"),
        (b"<style>p {color: red}</style>text", "text"),
        (b"a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;", "a & b <tag> \"q\" 's'"),
        (b"  spaced\n\t\r out  ", "spaced out"),
        (b"", ""),
        ("café <i>naïve</i>".encode(), "café naïve"),
        (b"\xff\xfe broken", "�� broken"),
    ]
    for html, want in cases:
        assert extract_text_py(html) == want, html


def test_none_passthrough():
    assert extract_text_py(None) is None


def test_udf_matches_python_exactly(spark, corpus):
    """The vectorized UDF and the pure function agree byte-for-byte, and
    the generator's carried text column is reproducible from html."""
    pages = corpus["pages"]
    re_extracted = pages.withColumn("re", extract_text(F.col("html")))
    mismatches = re_extracted.filter(~F.col("re").eqNullSafe(F.col("text"))).count()
    assert mismatches == 0


def test_deterministic_across_partitionings(spark, corpus):
    pages = corpus["pages"]
    a = pages.repartition(1).withColumn("re", extract_text(F.col("html")))
    b = pages.repartition(7).withColumn("re", extract_text(F.col("html")))
    ha = a.agg(F.bit_xor(F.xxhash64("url", "re"))).collect()[0][0]
    hb = b.agg(F.bit_xor(F.xxhash64("url", "re"))).collect()[0][0]
    assert ha == hb
