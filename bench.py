"""Headline benchmark: runs the engine's flagship operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Median-of-3 protocol (VERDICT r3 #4): the suite runs 3x back-to-back in
one JVM; ``value`` and per-query ``queries`` are the per-query MEDIANS, and
``runs`` carries each run's total so host drift is visible in the artifact.
The single-threaded reference proxy (bench_reference_proxy logic, reduced N)
runs in the same invocation: this box shares silicon with co-tenants and
multi-core walls have been observed to swing 4x between rounds while
single-thread speed stays stable, so ``ratio`` (engine docs/sec over proxy
docs/sec) is the drift-robust throughput metric to compare across rounds.

Scaling-efficiency evidence across two parallelism levels is produced by
bench_scaling.py (subprocess per level — one JVM cannot change its master).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
PROXY_DOCS = int(os.environ.get("SPARK_GRAFT_PROXY_DOCS", "20000"))


def _run_proxy(n_docs: int) -> float:
    """Single-thread reference-style proxy, IMPORTED from
    bench_reference_proxy so the ratio's denominator is the same code the
    standalone baseline runs (review r4: a copy here could silently
    drift). Returns docs/sec."""
    from bench_reference_proxy import run_proxy

    return float(run_proxy(n_docs)["docs_per_sec"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_start = round(os.getloadavg()[0], 2)

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from rdf_i2b2_converter_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")
    # warm the JVM and the Python UDF workers so per-query numbers measure
    # the plan, not process startup
    spark.range(1000).select(F.sum("id")).collect()

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(0, 1000, numPartitions=cpus).mapInPandas(_noop, "id long").count()

    qs = E.queries()
    suite = [
        "kg_type_triples",      # full KG emission path (mapInPandas + joins)
        "d5_groupby_q1",        # scan-heavy group-agg
        "c5_multihop_revenue",  # 3-way join + agg
        "e2_dense_reindex",     # window reindex + broadcast join-back
        "g1_closure",           # iterative transitive closure
        "g7_cc_canonical",      # connected components
        "t_lsh_pairs",          # MinHash-LSH near-dup
        "t_exact_dedup",        # hash dedup (min_by map-side combine)
        "t_simhash",            # single-pass 64-bit SimHash
        "t_langid",             # single-pass stopword argmax
        "s_ann_topk",           # embedding similarity
        "j_windowed_counts",    # windowed agg (streaming analog)
    ]
    all_timings: list[dict[str, float]] = []
    for _run in range(N_RUNS):
        timings: dict[str, float] = {}
        for name in suite:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.count()
            timings[name] = round(time.time() - t0, 3)
        all_timings.append(timings)
    median_timings = {
        name: round(statistics.median(t[name] for t in all_timings), 3)
        for name in suite
    }
    run_totals = [round(sum(t.values()), 3) for t in all_timings]
    total = round(sum(median_timings.values()), 3)

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    docs_per_sec = round(n_docs / median_timings["kg_type_triples"], 1)

    # ---- 10x tier (VERDICT r4 #4): the sf0.1 suite median sits at ~12s
    # with sub-second queries — fixed-overhead territory where regressions
    # hide. Replicate documents 10x (deterministic doc_id remap + a
    # replica-tag token so replicas are near- but not exact duplicates)
    # and re-run the 5 documents-driven headline queries, same
    # median-of-N protocol. Tier rows land in the same artifact.
    import tempfile

    tier_dir = tempfile.mkdtemp(prefix="bench_10x_")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep"),
            F.col("doc_id"),
            F.col("text"),
            F.col("lang"),
            F.col("source"),
        )
        .select(
            (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep")).alias("text"),
            "lang",
            "source",
        )
        .repartition(2 * cpus)
        .write.mode("overwrite")
        .parquet(f"{tier_dir}/documents.parquet")
    )
    suite_10x = ["kg_type_triples", "t_lsh_pairs", "t_exact_dedup", "t_simhash", "t_langid"]
    tier_timings: list[dict[str, float]] = []
    for _run in range(N_RUNS):
        timings = {}
        for name in suite_10x:
            t0 = time.time()
            qs[name](spark, tier_dir).count()
            timings[name] = round(time.time() - t0, 3)
        tier_timings.append(timings)
    median_10x = {
        name: round(statistics.median(t[name] for t in tier_timings), 3)
        for name in suite_10x
    }
    total_10x = round(sum(median_10x.values()), 3)
    runs_10x = [round(sum(t.values()), 3) for t in tier_timings]

    # engine/proxy ratio, LIKE-FOR-LIKE: both sides run the same synthetic
    # KG pipeline (html -> extract -> mention-detect -> mint) in the SAME
    # invocation/window, so the ratio is robust to co-tenant weather. The
    # sf-dir docs_per_sec above is a DIFFERENT quantity (tiny parquet
    # corpus, fixed job overhead dominates) — do not divide it by the
    # proxy.
    from rdf_i2b2_converter_spark.plans.pipeline import (
        build_triples_from_mentions as _btm,
    )
    from rdf_i2b2_converter_spark.sources import synthetic as _syn

    # 1M docs: measured side-by-side, 200k@64parts runs at ~23k docs/s vs
    # 1M@64parts at ~39k on idle silicon — small corpora pay ~2x per-task
    # overhead, and the ratio should measure the engine, not task startup.
    # The source is the FUSED synthesis+detection stage (VERDICT r4 #5):
    # one Python worker pool per task instead of two chained ones; output
    # parity with the unfused gen_pages|>detect_mentions plan is pytest-
    # asserted (test_pipeline.py), and the proxy does the same synth+match
    # work single-threaded, so the ratio stays like-for-like.
    n_pipe = int(os.environ.get("SPARK_GRAFT_PIPE_DOCS", "1000000"))
    pipe_walls = []
    for _ in range(N_RUNS):
        t0 = time.time()
        _btm(
            _syn.gen_mentions(spark, n_pipe, num_partitions=2 * cpus),
            _syn.gen_gazetteer(spark),
            None,
        ).count()
        pipe_walls.append(time.time() - t0)
    pipeline_dps = round(n_pipe / statistics.median(pipe_walls), 1)
    proxy_dps = round(_run_proxy(PROXY_DOCS), 1)
    ratio = round(pipeline_dps / proxy_dps, 2) if proxy_dps else None

    # headline correctness metric (BASELINE: triple P/R >= 0.95 vs the
    # reference-semantics oracle): engine triples vs the pure-Python oracle
    # on the deterministic synthetic corpus
    from rdf_i2b2_converter_spark.plans.pipeline import build_triples
    from rdf_i2b2_converter_spark.sources import synthetic as syn

    n_oracle_docs = 500
    pages = syn.gen_pages(spark, n_oracle_docs, num_partitions=8)
    tr = build_triples(pages, syn.gen_gazetteer(spark), None)
    got_rows = (
        tr.filter(F.col("pred") == "rdf:type")
        .join(
            tr.filter(F.col("pred") == "kg:surfaceForm").select(
                F.col("subj"), F.col("obj").alias("surface")
            ),
            "subj",
        )
        .select("source_url", "surface")
        .collect()
    )
    got = {(r["source_url"], r["surface"]) for r in got_rows}
    exp = {
        (url, s)
        for url, counts in syn.oracle_mentions(n_oracle_docs).items()
        for s in counts
    }
    tp = len(got & exp)
    precision = round(tp / len(got), 4) if got else 0.0
    recall = round(tp / len(exp), 4) if exp else 0.0
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": median_timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "runs": run_totals,
                "median": total,
                "queries_10x": median_10x,
                "value_10x": total_10x,
                "runs_10x": runs_10x,
                "n_docs_10x": n_docs * 10,
                "docs_per_sec": docs_per_sec,
                "pipeline_docs_per_sec": pipeline_dps,
                "proxy_docs_per_sec": proxy_dps,
                "ratio": ratio,
                "cpus": cpus,
                "triple_precision": precision,
                "triple_recall": recall,
                # host contamination markers: this sandbox shares silicon
                # with co-tenants; a 1-min load >> 0 at start or a large
                # rise during the run means the numbers are inflated by
                # EXTERNAL work (observed up to 4x) — compare only runs
                # with similar load fields; the ratio field above is the
                # drift-robust cross-round metric
                "load_avg_start": load_start,
                "load_avg_end": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
