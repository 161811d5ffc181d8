"""Dedup suite: exact, MinHash-LSH, SimHash, Jaccard — on a constructed
corpus with known duplicates/near-duplicates."""

import pytest
from pyspark.sql import functions as F

from rdf_i2b2_converter_spark.operators.dedup import (
    exact_dedup,
    hamming64,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    simhash64,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while birds sing songs "
    "about bright summer days under blue skies near the old river"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE + " extra tail words here"),  # near dup of 0
        (3, BASE.replace("quick", "slow")),  # near dup of 0
        (4, "completely different content about spark dataframes and shuffles joins aggregations windows"),
        (5, "The  QUICK brown fox... jumps over the lazy dog while birds sing songs about bright summer days under blue skies near the old river"),  # normalized dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup_keeps_min_id(spark, docs):
    kept = sorted(r["doc_id"] for r in exact_dedup(docs).collect())
    assert 0 in kept and 1 not in kept and 5 not in kept  # 1,5 dups of 0
    assert {2, 3, 4}.issubset(set(kept))


def test_minhash_identical_docs_identical_sigs(spark, docs):
    sigs = {r["doc_id"]: tuple(r["minhash"]) for r in minhash_signature(docs).collect()}
    assert sigs[0] == sigs[1] == sigs[5]
    assert sigs[0] != sigs[4]


def test_lsh_finds_near_dups_not_distinct(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(docs, n_hashes=8, n_bands=4).collect()
    }
    assert (0, 1) in pairs and (0, 5) in pairs
    assert not any(4 in p for p in pairs)


def test_jaccard_values(spark, docs):
    pairs = spark.createDataFrame([(0, 1), (0, 4)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(docs, pairs).collect()}
    assert got[(0, 1)] == 1.0
    assert got[(0, 4)] == 0.0


def test_lsh_recall_on_planted_near_dups(spark):
    """Corpus-level recall: plant one near-duplicate (single-token edit) for
    every original; MinHash-LSH (16 hashes, 8 bands) must recover >= 90% of
    the planted pairs, and exact Jaccard verification must keep them."""
    from rdf_i2b2_converter_spark.sources import synthetic as syn

    originals = [(i, syn.gen_doc(i)["text"]) for i in range(100)]
    planted = []
    for i, text in originals:
        toks = text.split(" ")
        toks[len(toks) // 2] = "XEDITX"
        planted.append((1000 + i, " ".join(toks)))
    df = spark.createDataFrame(originals + planted, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(df, n_hashes=16, n_bands=8).collect()
    }
    want = {(i, 1000 + i) for i, _ in originals}
    recall = len(pairs & want) / len(want)
    assert recall >= 0.9, recall
    verified = jaccard_pairs(
        df, spark.createDataFrame(sorted(pairs & want), "id_a long, id_b long")
    )
    assert verified.filter("jaccard < 0.5").count() == 0


def test_simhash_hamming_orders_similarity(spark, docs):
    sims = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    df = spark.createDataFrame(
        [(sims[0], sims[3], sims[4])], "a long, b long, c long"
    ).select(
        hamming64(F.col("a"), F.col("b")).alias("near"),
        hamming64(F.col("a"), F.col("c")).alias("far"),
    )
    row = df.collect()[0]
    assert sims[0] == sims[1]  # identical text
    assert row["near"] < row["far"]


def test_exact_dedup_plan_partial_aggregate(spark, docs):
    """VERDICT round-1: the dedup must be a hash aggregate with map-side
    partial combine (partial_min_by before the exchange), not a window
    sort-shuffle of every row."""
    plan = exact_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # partial aggregate appears below the exchange: HashAggregate ... partial_min_by
    assert "partial_min_by" in plan, plan


def test_simhash_md5_variant_matches_bit_convention(spark):
    """hash_fn='md5' packs the first 16 md5 hex chars as hi/lo 32-bit halves;
    verified against a pure-Python reimplementation."""
    import hashlib
    import re

    texts = ["spark join hash", "the quick brown fox", "und das ist gut"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in simhash64(df, hash_fn="md5").collect()}

    def py_simhash(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        votes = [0] * 64
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        sim = 0
        for i in range(64):
            if votes[i] > 0:
                sim |= 1 << i
        return sim - (1 << 64) if sim >= (1 << 63) else sim

    for i, text in enumerate(texts):
        assert got[i] == py_simhash(text), (i, got[i], py_simhash(text))


def test_lsh_giant_bucket_cap_prevents_pair_blowup(spark):
    """A degenerate corpus (1k identical boilerplate docs) would emit ~500k
    candidate pairs; capped buckets are star-linked to the bucket's min id
    instead — the cluster stays CONNECTED (n-1 hub pairs a downstream CC
    recovers) without the n^2 pair set. Distinct docs sharing no band with
    the boilerplate are unaffected."""
    boiler = [(i, "all rights reserved copyright page footer text") for i in range(1000)]
    real = [(2000, "spark shuffles partition data by key"), (2001, "spark shuffles partition data by key column")]
    df = spark.createDataFrame(boiler + real, "doc_id long, text string")
    pairs = lsh_candidate_pairs(df, n_hashes=8, n_bands=4, max_bucket_size=100)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (2000, 2001) in got
    star = {p for p in got if p[1] < 2000}
    assert star == {(0, k) for k in range(1, 1000)}  # hub = min id, n-1 pairs
    assert len(got) < 1100  # nowhere near the ~500k all-pairs blowup
    # uncapped on the same corpus really is the n^2 blowup the cap prevents
    uncapped = lsh_candidate_pairs(df, n_hashes=8, n_bands=4, max_bucket_size=None)
    assert uncapped.count() >= 1000 * 999 // 2


def test_exact_dedup_null_text_passthrough(spark):
    """Review r5: null-text docs must NOT collapse into one 'duplicate'
    group (md5(NULL) is NULL for all of them)."""
    from rdf_i2b2_converter_spark.operators.dedup import exact_dedup

    rows = [(1, "same"), (2, "same"), (3, None), (4, None), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in exact_dedup(df).collect())
    assert kept == [1, 3, 4, 5]


def test_lsh_short_docs_never_pair(spark):
    """Review r5: docs with < k tokens (all-null signatures) used to land
    in one md5('') bucket and pair with EVERY other short doc."""
    from rdf_i2b2_converter_spark.operators.dedup import lsh_candidate_pairs

    rows = [(1, "alpha"), (2, "zebra quux"), (3, "x"),
            (4, "the quick brown fox jumps over the lazy dog"),
            (5, "the quick brown fox jumps over the lazy dog")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in
             lsh_candidate_pairs(df, k=3, n_hashes=4, n_bands=2).collect()}
    assert pairs == {(4, 5)}


def test_lsh_rejects_bad_band_split(spark):
    import pytest

    from rdf_i2b2_converter_spark.operators.dedup import lsh_candidate_pairs

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must divide"):
        lsh_candidate_pairs(df, n_hashes=4, n_bands=8)
    with pytest.raises(ValueError, match="must divide"):
        lsh_candidate_pairs(df, n_hashes=16, n_bands=5)


def test_jaccard_empty_shingle_pair_is_null_not_crash(spark):
    """Review r5: a candidate pair where both docs have no shingles used
    to DIVIDE_BY_ZERO under Spark 4 ANSI; jaccard is NULL (undefined)."""
    from rdf_i2b2_converter_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "alpha"), (3, "x"), (4, "a b c d e"), (5, "a b c d f")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 3), (4, 5)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           jaccard_pairs(docs, pairs, k=3).collect()}
    assert got[(1, 3)] is None
    assert got[(4, 5)] is not None and got[(4, 5)] > 0
