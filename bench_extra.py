"""Extra (non-frozen) benchmarks for optimization work — guide §1.4.

Isolates each headline suite query with the noop sink so we time the
computation, not the count()-pruned plan, and writes
``plans/$SPARK_GRAFT_PLAN_TAG/<query>_<label>.txt`` (tag default: r06)
with ``explain('formatted')`` output.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [label] [q1 q2 ...]

Prints one JSON line with per-query medians (median of N_RUNS, default 3).
This file is NOT bench.py: the frozen driver contract lives there.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import statistics
import sys
import time

N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

SUITE = [
    "kg_type_triples",
    "d5_groupby_q1",
    "c5_multihop_revenue",
    "e2_dense_reindex",
    "g1_closure",
    "g7_cc_canonical",
    "t_lsh_pairs",
    "t_exact_dedup",
    "t_simhash",
    "t_langid",
    "s_ann_topk",
    "j_windowed_counts",
]


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "profile"
    only = sys.argv[2:] or SUITE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_start = round(os.getloadavg()[0], 2)

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from rdf_i2b2_converter_spark.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{cpus}]")
    spark.range(1000).select(F.sum("id")).collect()

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(0, 1000, numPartitions=cpus).mapInPandas(_noop, "id long").count()

    qs = E.queries()
    round_tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r06")
    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", round_tag)
    os.makedirs(plan_dir, exist_ok=True)

    medians: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in only:
        # capture the formatted plan once
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plan_dir, f"{name}_{label}.txt"), "w") as f:
            f.write(buf.getvalue())
        walls = []
        for _ in range(N_RUNS):
            spark.sparkContext.setJobDescription(f"{label}:{name}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        medians[name] = round(statistics.median(walls), 3)
        samples[name] = walls
    print(
        json.dumps(
            {
                "metric": f"bench_extra_{label}",
                "value": round(sum(medians.values()), 3),
                "unit": "sec",
                "queries": medians,
                "samples": samples,
                "sf_dir": sf_dir,
                "cpus": cpus,
                "load_avg_start": load_start,
                "load_avg_end": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
