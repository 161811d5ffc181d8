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


def test_query_providers_and_star_schema(spark):
    """C5 4-hop provider query + init_star_schema (src/starschema.py:65-116):
    wildcard-hop fan-out kept (SPARQL solution semantics), header-only dims
    schema-pinned."""
    from rdf_i2b2_converter_spark.plans.ontology_pipeline import (
        init_star_schema,
        query_providers,
    )

    rows = [
        ("k1", "rdf:type", "kg:Provider", None),
        ("k1", "kg:worksAt", "w1", None),
        ("k1", "kg:managedBy", "w1", None),  # second wildcard hop -> fan-out
        ("w1", "kg:hasCode", "\\Provider\\A\\", "xsd:string"),
        ("w1", "kg:hasIdentifier", "prov1", "xsd:string"),
        # not a provider: must not appear
        ("k2", "rdf:type", "kg:Patient", None),
        ("k2", "kg:worksAt", "w2", None),
        ("w2", "kg:hasCode", "\\Provider\\B\\", "xsd:string"),
        ("w2", "kg:hasIdentifier", "prov2", "xsd:string"),
    ]
    t = spark.createDataFrame(
        [(s, p, o, dt, None) for s, p, o, dt in rows],
        "s string, p string, o string, o_datatype string, o_lang string",
    )
    provs = query_providers(t, "kg:Provider", "kg:hasCode", "kg:hasIdentifier")
    got = [(r["provider_path"], r["provider_id"]) for r in provs.collect()]
    assert sorted(got) == [("\\Provider\\A\\", "prov1")] * 2  # fan-out kept

    tables = init_star_schema(spark, providers=provs)
    assert set(tables) == {
        "visit_dimension", "patient_dimension", "encounter_mapping",
        "patient_mapping", "provider_dimension",
    }
    assert tables["visit_dimension"].count() == 0
    assert [f.name for f in tables["provider_dimension"].schema.fields] == [
        "provider_path", "provider_id",
    ]
    assert tables["provider_dimension"].count() == 2
