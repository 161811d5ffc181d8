"""Triple emission: P/R vs the oracle-derived expected triple set,
datatype-literal formatting goldens (src/utils.py:184-195 contract),
context precedence, referential integrity (obs_tools.py analog)."""

import pytest
from pyspark.sql import functions as F

from rdf_i2b2_converter_spark.operators.closure import close_ontology
from rdf_i2b2_converter_spark.operators.emit import (
    integrity_check,
    resolve_context,
    triples_to_ntriples,
)
from rdf_i2b2_converter_spark.plans.pipeline import build_triples
from rdf_i2b2_converter_spark.sources import synthetic as syn


@pytest.fixture(scope="module")
def triples(spark, corpus):
    return build_triples(
        corpus["pages"], corpus["gazetteer"], corpus["alias_edges"], n_parts=8
    ).cache()


def _expected_type_triples(n, gaz_rows):
    """Oracle: expected (subj-key, rdf:type, type_uri) set, keyed on the
    canonical (source, type, surface) input rather than the hash."""
    best = {}
    for surface, type_uri, canonical, weight in gaz_rows:
        if surface not in best or weight > best[surface][1]:
            best[surface] = ((type_uri, canonical), weight)
    out = set()
    for url, counts in syn.oracle_mentions(n).items():
        for surface in counts:
            (type_uri, _), _ = best[surface]
            out.add((url, type_uri, surface))
    return out


def test_type_triple_precision_recall(spark, corpus, triples):
    """P/R vs the reference-semantics oracle must be 1.0 (target >= 0.95)."""
    exp = _expected_type_triples(corpus["n"], syn.gen_gazetteer_rows())
    got_rows = (
        triples.filter(F.col("pred") == "rdf:type")
        .join(
            triples.filter(F.col("pred") == "kg:surfaceForm").select(
                F.col("subj"), F.col("obj").alias("surface")
            ),
            "subj",
        )
        .select("source_url", F.col("obj").alias("type_uri"), "surface")
        .collect()
    )
    got = {(r["source_url"], r["type_uri"], r["surface"]) for r in got_rows}
    tp = len(got & exp)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(exp) if exp else 0.0
    assert precision == 1.0, (len(got), len(exp), list(got - exp)[:3])
    assert recall == 1.0, list(exp - got)[:3]


def test_subj_determinism_across_parallelism(spark, corpus):
    a = build_triples(corpus["pages"].repartition(1), corpus["gazetteer"], None)
    b = build_triples(corpus["pages"].repartition(6), corpus["gazetteer"], None)
    ha = a.agg(F.bit_xor(F.xxhash64("subj", "pred", "obj"))).collect()[0][0]
    hb = b.agg(F.bit_xor(F.xxhash64("subj", "pred", "obj"))).collect()[0][0]
    assert ha == hb


def test_datetime_literal_golden(triples):
    row = (
        triples.filter(F.col("pred") == "kg:extractedAt")
        .filter(F.col("source_url") == "https://example.org/page/0")
        .collect()
    )
    assert row and row[0]["obj"] == "2024-01-01 00:00:00"
    assert row[0]["obj_datatype"] == "xsd:dateTime"


def test_sameas_uses_cc_canonical(spark, corpus, triples):
    """ent3 is aliased to ent0 via the synthetic alias graph (0-1, 0-3 ...):
    its owl:sameAs object must be the component root kg:c/ent0."""
    same = triples.filter(
        (F.col("pred") == "owl:sameAs") & (F.col("obj") == "kg:c/ent0")
    ).count()
    assert same > 0


def test_integrity_against_closed_ontology(spark, corpus, triples):
    closed = close_ontology(corpus["ontology"])
    bad = integrity_check(triples, closed)
    assert bad.count() == 0, bad.collect()[:5]


def test_ntriples_rendering(spark):
    df = spark.createDataFrame(
        [
            ("kg:e/1", "rdf:type", "kg:T", None, None, 0),
            ("kg:e/1", "kg:surfaceForm", 'say "hi" \\ ok', "xsd:string", None, 0),
        ],
        "subj string, pred string, obj string, obj_datatype string, source_url string, part_id int",
    )
    lines = sorted(r["value"] for r in triples_to_ntriples(df).collect())
    # review r3: the plain 'xsd:string' sentinel renders WITHOUT a ^^
    # suffix ('<xsd:string>' is not an absolute IRI — invalid N-Triples)
    assert lines[0] == '<kg:e/1> <kg:surfaceForm> "say \\"hi\\" \\\\ ok" .'
    assert lines[1] == "<kg:e/1> <rdf:type> <kg:T> ."


def test_context_precedence(spark):
    """overwrite=True field ('lang'): deepest wins; overwrite=False
    ('source_url'): shallowest wins (ContextFactory semantics,
    src/data_loader.py:340-347)."""
    rows = [
        ("e1", "lang", "en", 0),
        ("e1", "lang", "fr", 2),
        ("e1", "source_url", "outer", 0),
        ("e1", "source_url", "inner", 3),
    ]
    df = spark.createDataFrame(rows, "entity_id string, field string, value string, depth int")
    got = {(r["field"]): r["value"] for r in resolve_context(df).collect()}
    assert got == {"lang": "fr", "source_url": "outer"}
