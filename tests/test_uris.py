"""URI presentation functions (H1, H3, F5)."""

from rdf_i2b2_converter_spark.functions.uris import (
    preferred_label,
    select_common,
    shortname,
)
from pyspark.sql import functions as F


def test_shortname_longest_prefix_wins(spark):
    ns = {"http://ex.org/": "ex", "http://ex.org/deep/": "deep"}
    df = spark.createDataFrame(
        [("http://ex.org/Foo",), ("http://ex.org/deep/Bar",), ("urn:other",)], "u string"
    )
    got = {r["u"]: r["s"] for r in df.select("u", shortname("u", ns).alias("s")).collect()}
    assert got == {
        "http://ex.org/Foo": "ex:Foo",
        "http://ex.org/deep/Bar": "deep:Bar",  # longest prefix, not 'ex:deep/Bar'
        "urn:other": "urn:other",
    }


def test_preferred_label_precedence_and_decoration(spark):
    rows = [
        ("kg:A", "rdfs:label", "label-fr", None, "fr"),
        ("kg:A", "rdfs:label", "label-en", None, "en"),
        ("kg:B", "rdfs:label", "plain", None, None),
        ("snomed:123", "rdfs:label", "Diabetes", None, "en"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, o_datatype string, o_lang string")
    got = {r["s"]: r["label"] for r in preferred_label(df, "en", terminology_prefixes=("snomed",)).collect()}
    assert got["kg:A"] == "label-en"
    assert got["kg:B"] == "plain"
    assert got["snomed:123"] == "SNOMED:00000123 Diabetes"  # lpad + upper (H3)


def test_select_common(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    assert select_common(df, ["c", "zz", "a"]).columns == ["c", "a"]
