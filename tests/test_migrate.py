"""Migration operators I1-I4 (merge_datafields / merge_metavaluefields /
fill_metadata_units semantics)."""

from rdf_i2b2_converter_spark.operators.migrate import (
    insert_units,
    keyed_update,
    migrate_field,
    relocate_values,
)


def test_keyed_update(spark):
    target = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "k int, code string, v int")
    updates = spark.createDataFrame([(1, "A")], "k int, code string")
    got = {r["k"]: (r["code"], r["v"]) for r in keyed_update(target, updates, ["k"], ["code"]).collect()}
    assert got == {1: ("A", 10), 2: ("b", 20)}


def test_migrate_field_exact_and_wildcard(spark):
    rows = [
        ("\\A\\src\\", "XMLBLOB"),
        ("\\B\\dst\\", None),
        ("\\C\\", None),
        ("\\C\\kid1\\", None),
        ("\\C\\kid2\\", None),
    ]
    df = spark.createDataFrame(rows, "path string, xml string")
    moves = [("\\A\\src\\", "\\B\\dst\\"), ("\\A\\src\\", "\\C\\*")]
    out = migrate_field(df, moves, "path", "xml")
    got = {r["path"]: r["xml"] for r in out.collect()}
    assert "\\A\\src\\" not in got            # source dropped
    assert got["\\B\\dst\\"] == "XMLBLOB"      # exact destination
    assert got["\\C\\kid1\\"] == "XMLBLOB"     # wildcard children
    assert got["\\C\\kid2\\"] == "XMLBLOB"
    assert got["\\C\\"] is None                # wildcard excludes the parent itself


def test_insert_units(spark):
    rows = [
        ("\\lab\\weight\\", "<x>Integer</x><NormalUnits></NormalUnits>"),
        ("\\lab\\name\\", "<x>String</x><NormalUnits></NormalUnits>"),
        ("\\lab\\height\\", "<x>Float</x><NormalUnits></NormalUnits>"),
    ]
    df = spark.createDataFrame(rows, "path string, xml string")
    units = spark.createDataFrame([("weight", "kg")], "key string, unit string")
    got = {r["path"]: r["xml"] for r in insert_units(df, units, "path", "xml").collect()}
    assert "<NormalUnits>kg</NormalUnits>" in got["\\lab\\weight\\"]
    assert "<NormalUnits>(unit not found)</NormalUnits>" in got["\\lab\\height\\"]
    assert "<NormalUnits></NormalUnits>" in got["\\lab\\name\\"]  # non-numeric untouched


def test_relocate_values(spark):
    rows = [
        (1, "c1", "VALUE_ROW", 3.5),
        (1, "c1", "mod_a", None),
        (1, "c1", "mod_b", None),
        (2, "c1", "mod_a", None),  # group without a carrier: unchanged
    ]
    df = spark.createDataFrame(rows, "patient int, concept string, kind string, nval double")
    out = relocate_values(df, ["patient", "concept"], "kind = 'VALUE_ROW'", ["nval"])
    got = {(r["patient"], r["kind"]): r["nval"] for r in out.collect()}
    assert got == {(1, "mod_a"): 3.5, (1, "mod_b"): 3.5, (2, "mod_a"): None}


def test_generate_xml_full_template(spark):
    """H11 — full XML templating with EnumValues expansion
    (generate_xml, src/utils.py:229-249)."""
    from pyspark.sql import functions as F

    from rdf_i2b2_converter_spark.operators.migrate import generate_xml

    df = spark.createDataFrame(
        [("Float", ["mg", "ml"], None)],
        "dt string, enums array<string>, maxlen string",
    )
    out = df.select(
        generate_xml(
            {
                "DataType": F.col("dt"),
                "EnumValues": F.col("enums"),
                "MaxStringLength": F.col("maxlen"),
            }
        ).alias("xml")
    ).collect()[0]["xml"]
    assert "<DataType>Float</DataType>" in out
    assert (
        '<EnumValues><Val description="">mg</Val>'
        '<Val description="">ml</Val></EnumValues>' in out
    )
    assert "<MaxStringLength></MaxStringLength>" in out  # None -> tag untouched
    assert out.startswith("<?xml version='1.0'?><ValueMetadata>")
    assert "<Oktousevalues>Y</Oktousevalues>" in out


def test_migrate_field_overlapping_wildcards_no_fanout(spark):
    """Review r2: a destination row matching TWO overlapping wildcard
    patterns must stay ONE row (deterministic min value), not fan out."""
    from rdf_i2b2_converter_spark.operators.migrate import migrate_field

    df = spark.createDataFrame(
        [
            ("\\A\\", "vA"),
            ("\\A\\B\\", "vB"),
            ("\\A\\B\\C\\", None),  # matches both '\A\*' and '\A\B\*'
        ],
        "path string, xml string",
    )
    out = migrate_field(df, [("\\A\\", "\\A\\*"), ("\\A\\B\\", "\\A\\B\\*")], "path", "xml")
    rows = out.collect()
    assert len(rows) == 1  # sources dropped, one destination row
    assert rows[0]["path"] == "\\A\\B\\C\\" and rows[0]["xml"] == "vA"  # min of {vA, vB}


def test_replace_in_columns_h12(spark):
    df = spark.createDataFrame(
        [(":Concept", ":Concept/x", 1)], "a string, b string, n int"
    )
    from rdf_i2b2_converter_spark.operators.migrate import replace_in_columns

    out = replace_in_columns(df, "^:Concept", "sphn:SPHNConcept").collect()[0]
    assert out["a"] == "sphn:SPHNConcept" and out["b"] == "sphn:SPHNConcept/x"
    assert out["n"] == 1  # non-string columns untouched
    only_a = replace_in_columns(df, "^:Concept", "X", cols=["a"]).collect()[0]
    assert only_a["a"] == "X" and only_a["b"] == ":Concept/x"


def test_normalize_column_case_h14(spark):
    df = spark.createDataFrame([(1, "x")], "Concept_CD int, tVal string")
    from rdf_i2b2_converter_spark.operators.migrate import normalize_column_case

    assert normalize_column_case(df).columns == ["CONCEPT_CD", "TVAL"]
    assert normalize_column_case(df, upper=False).columns == ["concept_cd", "tval"]
