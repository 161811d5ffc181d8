"""Scan-parallelism guard for unsplittable inputs.

A single-row-group parquet file (or any unsplittable input: gzip, one
giant text file) collapses the scan to ONE task, serializing every
per-row expression downstream of it — the 'input skew' failure mode of
the optimization playbook (one huge unsplittable file -> repartition
immediately after the read). Measured on this engine: the t_lsh_pairs
MinHash signature over a 50k-doc single-row-group parquet ran 1 task
(~19 s); spread across the session's cores it is a sub-second map stage.

The guard is scale-adaptive, not a local[32] tune: when the input
already carries at least the session's default parallelism in partitions
(the normal case at real scale, where file splits drive parallelism) it
is a NO-OP and no shuffle is paid. When it does fire, the shuffle moves
only the raw input rows — always cheaper than serializing the per-row
compute that follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism when its plan produces fewer partitions; no-op otherwise.

    Use immediately after a read and BEFORE expensive per-row expressions:
    a repartition placed downstream of a heavy projection parallelizes
    nothing (the compute runs upstream of the exchange). Row-set semantics
    are unchanged; round-robin repartition is deterministic under task
    retries (Spark sorts before repartitioning by default, SPARK-23207).
    """
    if df.isStreaming:  # partition introspection needs a batch plan
        return df
    # Only probe scan-shaped plans. ``df.rdd`` on a plan that carries an
    # Exchange would, under AQE, materialize every upstream query stage at
    # plan-composition time (real jobs whose results the later action does
    # not reuse — review r6). A plan string render runs zero jobs; any
    # Exchange in it also means downstream partitioning is governed by
    # shuffle.partitions/AQE anyway, so spreading would be pointless.
    if "Exchange" in df._jdf.queryExecution().executedPlan().toString():
        return df
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
