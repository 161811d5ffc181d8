"""N-Triples scan/sink round-trip and terminology routing (A1, C12)."""

from pyspark.sql import functions as F

from rdf_i2b2_converter_spark.sources.rdf import (
    read_ntriples,
    route_terminology,
    scan_errors,
    write_ntriples,
)


NT = """# a comment
<http://ex.org/a> <http://ex.org/p> <http://ex.org/b> .
<http://ex.org/a> <http://ex.org/label> "hello world" .
<http://ex.org/a> <http://ex.org/num> "42"^^<xsd:integer> .
<http://ex.org/a> <http://ex.org/label> "bonjour"@fr .
<http://ex.org/q> <http://ex.org/says> "he said \\"hi\\"" .

this line is garbage
"""


def test_read_ntriples(spark, tmp_path):
    f = tmp_path / "g.nt"
    f.write_text(NT)
    df = read_ntriples(spark, str(f))
    rows = {(r["p"], r["o"], r["o_datatype"], r["o_lang"]) for r in df.collect()}
    assert ("http://ex.org/p", "http://ex.org/b", None, None) in rows
    assert ("http://ex.org/label", "hello world", "xsd:string", None) in rows
    assert ("http://ex.org/num", "42", "xsd:integer", None) in rows
    assert ("http://ex.org/label", "bonjour", "xsd:string", "fr") in rows
    assert ("http://ex.org/says", 'he said "hi"', "xsd:string", None) in rows
    assert df.count() == 5
    errs = scan_errors(spark, str(f)).collect()
    assert len(errs) == 1 and "garbage" in errs[0]["value"]


def test_route_terminology(spark, tmp_path):
    f = tmp_path / "g.nt"
    f.write_text(NT)
    df = read_ntriples(spark, str(f))
    routed = route_terminology(df, {"http://ex.org/q": "qgraph"})
    got = {r["s"]: r["source"] for r in routed.collect()}
    assert got["http://ex.org/q"] == "qgraph"
    assert got["http://ex.org/a"] == "main"


def test_ntriples_roundtrip(spark, tmp_path):
    triples = spark.createDataFrame(
        [
            ("kg:e/1", "rdf:type", "kg:T", None, None, 0),
            ("kg:e/1", "kg:name", "Ada Lovelace", "xsd:string", None, 0),
        ],
        "subj string, pred string, obj string, obj_datatype string, source_url string, part_id int",
    )
    out = str(tmp_path / "nt_out")
    write_ntriples(triples, out)
    back = read_ntriples(spark, out)
    got = {(r["s"], r["p"], r["o"], r["o_datatype"]) for r in back.collect()}
    assert got == {
        ("kg:e/1", "rdf:type", "kg:T", None),
        ("kg:e/1", "kg:name", "Ada Lovelace", "xsd:string"),
    }
