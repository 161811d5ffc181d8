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


TTL = """@prefix sphn: <https://biomedit.ch/rdf/sphn-ontology/sphn#> .
@prefix resource: <https://biomedit.ch/rdf/sphn-resource/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
# mirrors the reference's GraphParser corpus shapes (src/utils.py:48-75)
resource:obs1 a sphn:Diagnosis .
resource:obs1 sphn:hasCode resource:code1 ; sphn:hasComment "stable"@en .
resource:obs1 sphn:hasValue "7.5"^^xsd:double, "8.1"^^xsd:double .
resource:obs1 sphn:hasCount 42 .
resource:obs1 sphn:hasRatio 0.5 .
_:b1 sphn:memberOf resource:obs1 .
resource:obs1 sphn:hasUnit _:b1 .
<https://raw.example/x> sphn:hasLabel "plain" .
"""


def test_read_turtle_subset(spark, tmp_path):
    f = tmp_path / "g.ttl"
    f.write_text(TTL)
    from rdf_i2b2_converter_spark.sources.rdf import read_turtle, scan_turtle_errors

    df = read_turtle(spark, str(f))
    SPHN = "https://biomedit.ch/rdf/sphn-ontology/sphn#"
    RES = "https://biomedit.ch/rdf/sphn-resource/"
    rows = {(r["s"], r["p"], r["o"], r["o_datatype"], r["o_lang"]) for r in df.collect()}
    assert (f"{RES}obs1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            f"{SPHN}Diagnosis", None, None) in rows
    assert (f"{RES}obs1", f"{SPHN}hasCode", f"{RES}code1", None, None) in rows
    assert (f"{RES}obs1", f"{SPHN}hasComment", "stable", "xsd:string", "en") in rows
    # ',' object list -> two triples with the expanded xsd datatype
    assert (f"{RES}obs1", f"{SPHN}hasValue", "7.5",
            "http://www.w3.org/2001/XMLSchema#double", None) in rows
    assert (f"{RES}obs1", f"{SPHN}hasValue", "8.1",
            "http://www.w3.org/2001/XMLSchema#double", None) in rows
    # bare numerics: full XSD IRIs in expand mode (consistent with the
    # expanded ^^xsd:* datatype spelling)
    XSD = "http://www.w3.org/2001/XMLSchema#"
    assert (f"{RES}obs1", f"{SPHN}hasCount", "42", f"{XSD}integer", None) in rows
    assert (f"{RES}obs1", f"{SPHN}hasRatio", "0.5", f"{XSD}decimal", None) in rows
    # blank nodes both positions
    assert ("_:b1", f"{SPHN}memberOf", f"{RES}obs1", None, None) in rows
    assert (f"{RES}obs1", f"{SPHN}hasUnit", "_:b1", None, None) in rows
    assert ("https://raw.example/x", f"{SPHN}hasLabel", "plain", "xsd:string", None) in rows
    assert df.count() == 10
    assert scan_turtle_errors(spark, str(f)).count() == 0


def test_read_turtle_compact_mode_and_errors(spark, tmp_path):
    f = tmp_path / "g2.ttl"
    f.write_text(
        "@prefix kg: <http://kg.example/> .\n"
        "kg:a kg:p kg:b .\n"
        "kg:a kg:p [ kg:inner kg:c ] .\n"          # [] bnode: out of subset
        "kg:a kg:p\n"                                # multiline: out of subset
    )
    from rdf_i2b2_converter_spark.sources.rdf import read_turtle, scan_turtle_errors

    rows = {(r["s"], r["p"], r["o"]) for r in read_turtle(spark, str(f), expand_prefixes=False).collect()}
    assert rows == {("kg:a", "kg:p", "kg:b")}
    errs = scan_turtle_errors(spark, str(f))
    assert errs.count() == 2


def test_turtle_ntriples_equivalence(spark, tmp_path):
    """The same graph written as Turtle and as N-Triples parses to the same
    triple set — the guess_format parity check (src/utils.py:48-75)."""
    ttl = tmp_path / "eq.ttl"
    nt = tmp_path / "eq.nt"
    ttl.write_text(
        "@prefix ex: <http://ex.org/> .\n"
        "ex:a a ex:T ; ex:name \"Ada\" ; ex:knows _:b0 .\n"
        "_:b0 ex:age \"36\"^^<http://www.w3.org/2001/XMLSchema#integer> .\n"
    )
    nt.write_text(
        "<http://ex.org/a> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/T> .\n"
        '<http://ex.org/a> <http://ex.org/name> "Ada" .\n'
        "<http://ex.org/a> <http://ex.org/knows> _:b0 .\n"
        '_:b0 <http://ex.org/age> "36"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
    )
    from rdf_i2b2_converter_spark.sources.rdf import read_ntriples, read_turtle

    t = {tuple(r) for r in read_turtle(spark, str(ttl)).collect()}
    n = {tuple(r) for r in read_ntriples(spark, str(nt)).collect()}
    assert t == n


def test_blank_node_ntriples_roundtrip(spark, tmp_path):
    triples = spark.createDataFrame(
        [
            ("_:bn1", "kg:partOf", "kg:whole", None, None, 0),
            ("kg:whole", "kg:hasPart", "_:bn1", None, None, 0),
        ],
        "subj string, pred string, obj string, obj_datatype string, source_url string, part_id int",
    )
    out = str(tmp_path / "bn_out")
    write_ntriples(triples, out)
    back = read_ntriples(spark, out)
    got = {(r["s"], r["p"], r["o"]) for r in back.collect()}
    assert got == {("_:bn1", "kg:partOf", "kg:whole"), ("kg:whole", "kg:hasPart", "_:bn1")}


def test_turtle_no_space_before_terminator(spark, tmp_path):
    """Review r2: `ex:b.`, `5.`, `_:b1.` must lex as term + terminator —
    real-world serializers omit the space before the final dot."""
    f = tmp_path / "tight.ttl"
    f.write_text(
        "@prefix ex: <http://ex.org/> .\n"
        "ex:a ex:p ex:b.\n"
        "ex:a ex:n 5.\n"
        "ex:a ex:k _:b1.\n"
        'ex:a ex:s "x".\n'
    )
    from rdf_i2b2_converter_spark.sources.rdf import read_turtle, scan_turtle_errors

    rows = {(r["s"], r["p"], r["o"]) for r in read_turtle(spark, str(f), expand_prefixes=False).collect()}
    assert rows == {
        ("ex:a", "ex:p", "ex:b"),
        ("ex:a", "ex:n", "5"),
        ("ex:a", "ex:k", "_:b1"),
        ("ex:a", "ex:s", "x"),
    }
    assert scan_turtle_errors(spark, str(f)).count() == 0


def test_turtle_prefix_directive_case_insensitive(spark, tmp_path):
    """Review r2: 'prefix'/'PREFIX'/'@PREFIX' directives must land in the
    prefix map (the parser already skipped them case-insensitively)."""
    f = tmp_path / "pfx.ttl"
    f.write_text(
        "prefix ex: <http://ex.org/>\n"
        "@PREFIX oth: <http://oth.org/> .\n"
        "ex:a ex:p oth:b .\n"
    )
    from rdf_i2b2_converter_spark.sources.rdf import read_turtle

    rows = {(r["s"], r["p"], r["o"]) for r in read_turtle(spark, str(f)).collect()}
    assert rows == {("http://ex.org/a", "http://ex.org/p", "http://oth.org/b")}
