"""Mention detection vs the pure-Python oracle — operator-vs-oracle
cross-check in the reference's style (tests/test_rdfwrappers.py:31-57)."""

from pyspark.sql import functions as F

from rdf_i2b2_converter_spark.operators.mentions import (
    TokenAhoCorasick,
    detect_mentions,
    link_mentions,
)
from rdf_i2b2_converter_spark.sources import synthetic as syn


def test_ac_unit():
    ac = TokenAhoCorasick(["a b", "b", "a b c", "x"])
    toks = "a b c x b".split()
    got = sorted(ac.find(toks))
    assert ("a b", 0, 2) in got
    assert ("a b c", 0, 3) in got
    assert ("b", 1, 2) in got
    assert ("b", 4, 5) in got
    assert ("x", 3, 4) in got
    assert len(got) == 5


def test_ac_failure_links_across_patterns():
    # after failing 'aa b', must still find 'a b' via failure transition
    ac = TokenAhoCorasick(["aa b", "a b"])
    assert sorted(ac.find("aa a b".split())) == [("a b", 1, 3)]


def test_detection_equals_oracle(spark, corpus):
    m = detect_mentions(corpus["pages"], corpus["gazetteer"])
    got = {(r["url"], r["surface"]): r["n_occurrences"] for r in m.collect()}
    exp = {
        (url, s): c
        for url, d in syn.oracle_mentions(corpus["n"]).items()
        for s, c in d.items()
    }
    assert got == exp  # P = R = 1.0, counts exact


def test_linking_prefers_weight_then_canonical_id(spark, corpus):
    """'ambig{k}' maps to two entities (0.9 vs 0.6) — the 0.9 one must win;
    deterministic across runs (SURVEY.md §7.4 #3)."""
    pages = corpus["pages"]
    m = detect_mentions(pages, corpus["gazetteer"])
    linked = link_mentions(m, corpus["gazetteer"], pages.select("url", "lang"))
    amb = linked.filter(F.col("surface").startswith("ambig")).collect()
    assert amb, "corpus should contain ambiguous mentions"
    for r in amb:
        k = int(r["surface"][len("ambig"):])
        assert r["canonical_id"] == f"ent{k}"  # the 0.9-weight candidate


def test_linking_unique_per_url_surface(spark, corpus):
    pages = corpus["pages"]
    m = detect_mentions(pages, corpus["gazetteer"])
    linked = link_mentions(m, corpus["gazetteer"], pages.select("url", "lang"))
    assert linked.groupBy("url", "surface").count().filter(F.col("count") > 1).count() == 0



def test_link_orders_on_unrounded_score(spark):
    """Review r5: rounding before the argmax let a 5e-5 weight gap tie and
    fall through to the canonical_id tie-break, picking the LOWER-weight
    candidate."""
    from rdf_i2b2_converter_spark import schemas
    from rdf_i2b2_converter_spark.operators.mentions import link_mentions

    gaz = spark.createDataFrame(
        [("x", "kg:T", "ent_a", 0.85209), ("x", "kg:T", "ent_b", 0.85213)],
        schema=schemas.GAZETTEER,
    )
    mentions = spark.createDataFrame(
        [("u1", "x", 0, 1, 1)],
        "url string, surface string, begin_pos int, end_pos int, n_occurrences int",
    )
    got = link_mentions(mentions, gaz).collect()
    assert len(got) == 1 and got[0]["canonical_id"] == "ent_b"


def test_link_full_payload_tiebreak_deterministic(spark):
    """Review r5: two candidates identical in (score, canonical_id) but
    differing in type_uri must resolve deterministically (smallest
    payload wins lexicographically), at any partitioning."""
    from rdf_i2b2_converter_spark import schemas
    from rdf_i2b2_converter_spark.operators.mentions import link_mentions

    gaz = spark.createDataFrame(
        [("x", "kg:B", "ent", 0.9), ("x", "kg:A", "ent", 0.9)],
        schema=schemas.GAZETTEER,
    )
    mentions = spark.createDataFrame(
        [("u1", "x", 0, 1, 1)],
        "url string, surface string, begin_pos int, end_pos int, n_occurrences int",
    )
    for parts in (1, 7):
        got = link_mentions(mentions.repartition(parts), gaz).collect()
        assert [r["type_uri"] for r in got] == ["kg:A"], parts
