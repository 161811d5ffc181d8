"""Star-schema derivation (B3, B4, D6) — the main_ontology.py flow."""

from pyspark.sql import functions as F

from rdf_i2b2_converter_spark.plans.ontology_pipeline import run_ontology_pipeline


def test_star_schema_outputs(spark, corpus):
    outs = run_ontology_pipeline(corpus["ontology"])
    meta = outs["metadata"]
    cd = outs["concept_dimension"]
    md = outs["modifier_dimension"]
    ta = outs["table_access"]

    assert set(cd.columns) == {"concept_path", "concept_cd", "name_char"}
    assert set(md.columns) == {"modifier_path", "modifier_cd", "name_char"}
    # B3: concept rows == CONCEPT_DIMENSION-tagged metadata rows
    assert cd.count() == meta.filter(F.col("c_tablename") == "CONCEPT_DIMENSION").count()
    # properties land in the modifier dimension
    assert {r["name_char"] for r in md.collect()} == {"hasName", "foundedIn", "population"}
    # B4: table_access = the roots with constants
    rows = ta.collect()
    assert len(rows) == 1 and rows[0]["c_table_fullname"] == "\\Thing\\"
    assert rows[0]["c_facttable"] == "OBSERVATION_FACT"
    # referential integrity between dimensions and metadata codes
    codes_meta = {r["c_basecode"] for r in meta.collect()}
    assert {r["concept_cd"] for r in cd.collect()} <= codes_meta
