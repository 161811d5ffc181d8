"""Ontology closure invariants — mirrors the reference's METADATA global
checks: path & basecode uniqueness (tests/test_i2b2wrappers.py:133-140),
parent-exists with level-1 (143-159), muting (tests/test_rdfwrappers.py:
132-159), blacklist pruning (src/rdfwrappers.py:6-9)."""

import pytest
from pyspark.sql import functions as F

from rdf_i2b2_converter_spark.operators.closure import (
    attach_properties,
    close_ontology,
    subtree,
)


@pytest.fixture(scope="module")
def closed(spark, corpus):
    return close_ontology(corpus["ontology"]).cache()


def test_path_and_code_unique(closed):
    n = closed.count()
    assert closed.select("path").distinct().count() == n
    assert closed.select("code").distinct().count() == n


def test_parent_exists_with_level_minus_one(closed):
    child = closed.filter(F.col("parent_uri").isNotNull()).alias("c")
    joined = child.join(
        closed.alias("p"), F.col("c.parent_uri") == F.col("p.class_uri"), "left"
    )
    assert joined.filter(F.col("p.class_uri").isNull()).count() == 0
    assert joined.filter(F.col("c.level") != F.col("p.level") + 1).count() == 0


def test_path_prefix_consistency(closed):
    child = closed.filter(F.col("parent_uri").isNotNull()).alias("c")
    joined = child.join(closed.alias("p"), F.col("c.parent_uri") == F.col("p.class_uri"))
    bad = joined.filter(~F.col("c.path").startswith(F.col("p.path"))).count()
    assert bad == 0


def test_code_chain_recomputable(closed):
    """Every child code = sha256(parent_code + uri + '\\')[:50] — the
    data-side recomputability contract (src/data_loader.py:250-255)."""
    import hashlib

    rows = closed.collect()
    codes = {r["class_uri"]: r["code"] for r in rows}
    for r in rows:
        prefix = codes.get(r["parent_uri"], "") if r["parent_uri"] else ""
        want = hashlib.sha256((prefix + r["class_uri"] + "\\").encode()).hexdigest()[:50]
        assert r["code"] == want, r["class_uri"]


def test_muting_stops_terminology_expansion(closed):
    """snomed:Disease has 2 same-terminology children -> ChildfreeConcept
    semantics: children not expanded (src/rdfwrappers.py:187-199)."""
    uris = {r["class_uri"] for r in closed.collect()}
    assert "snomed:Disease" in uris
    assert "snomed:Finding" not in uris
    assert "snomed:Infection" not in uris
    assert "loinc:Lab" in uris  # single-node terminology: kept


def test_blacklist_subtree_absent(closed):
    assert closed.filter(F.col("class_uri") == "kg:Deprecated").count() == 0


def test_levels_and_paths(closed):
    rows = {r["class_uri"]: r for r in closed.collect()}
    assert rows["kg:Thing"]["level"] == 0
    assert rows["kg:Thing"]["path"] == "\\Thing\\"
    assert rows["kg:Company"]["level"] == 2
    assert rows["kg:Company"]["path"] == "\\Thing\\Organization\\Company\\"


def test_attach_properties(spark, corpus, closed):
    props = attach_properties(closed, corpus["ontology"])
    rows = {r["class_uri"]: r for r in props.collect()}
    assert rows["kg:hasName"]["parent_uri"] == "kg:Organization"
    org = closed.filter(F.col("class_uri") == "kg:Organization").collect()[0]
    assert rows["kg:hasName"]["level"] == org["level"] + 1
    assert rows["kg:hasName"]["path"] == org["path"] + "hasName\\"


def test_subtree_filter(closed):
    sub = subtree(closed, "\\Thing\\Place\\")
    uris = {r["class_uri"] for r in sub.collect()}
    assert uris == {"kg:City", "kg:Country"}
