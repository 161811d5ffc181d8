"""Stress the driver-loop fixpoint operators at depth and width — the
regimes where lineage blowup or missed convergence would bite at 100 TB
(SURVEY.md §7.4 #2)."""

from pyspark.sql import functions as F

from rdf_i2b2_converter_spark import schemas
from rdf_i2b2_converter_spark.operators.canonicalize import connected_components
from rdf_i2b2_converter_spark.operators.closure import close_ontology


def _ontology_rows(rows):
    return [(c, p, "class", None, None, None, False) for c, p in rows]


import pytest


@pytest.mark.parametrize("driver_threshold", [100_000, 0], ids=["driver-bfs", "distributed"])
def test_closure_deep_chain_and_wide_fanout(spark, driver_threshold):
    """Depth 30 chain under a 400-child fanout: levels stamped correctly,
    every node reached exactly once, paths unique, no lineage explosion
    (localCheckpoint per round keeps each round's plan flat). Runs BOTH
    closure paths (review r6: the driver-BFS default would otherwise
    leave the distributed loop untested at depth)."""
    rows = [("root", None)]
    rows += [(f"w{i}", "root") for i in range(400)]          # wide fanout
    rows += [("d0", "root")] + [(f"d{i}", f"d{i-1}") for i in range(1, 30)]  # deep chain
    ont = spark.createDataFrame(_ontology_rows(rows), schema=schemas.ONTOLOGY)
    closed = close_ontology(ont, max_rounds=40, driver_threshold=driver_threshold)
    n = closed.count()
    assert n == 1 + 400 + 30
    levels = {r["class_uri"]: r["level"] for r in closed.collect()}
    assert levels["d29"] == 30 and levels["w0"] == 1
    assert closed.select("path").distinct().count() == n


def test_cc_random_graph_vs_union_find(spark):
    """5k-edge pseudo-random graph (LCG), distributed star algorithm forced
    — exact agreement with union-find."""
    x, edges = 7, []
    for _ in range(5000):
        x = (1664525 * x + 1013904223) % (2**32)
        a = x % 3000
        x = (1664525 * x + 1013904223) % (2**32)
        b = x % 3000
        if a != b:
            edges.append((f"n{a:04d}", f"n{b:04d}"))
    df = spark.createDataFrame(edges, schema=schemas.ALIAS_EDGES)
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, driver_threshold=0).collect()
    }

    parent: dict[str, str] = {}

    def find(v):
        parent.setdefault(v, v)
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[str, list[str]] = {}
    for v in list(parent):
        comp.setdefault(find(v), []).append(v)
    exp = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            exp[v] = m
    assert got == exp
    assert len(got) == len(exp)
