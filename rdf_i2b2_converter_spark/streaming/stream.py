"""Structured-Streaming front-end for the KG pipeline.

The reference is batch-only (SURVEY.md §2 J: append-mode CSV, restart-
unsafe). A continuously-crawled corpus wants incremental triple emission:
``readStream`` over the pages location -> the SAME stateless extraction/
mention/emission plan -> ``foreachBatch`` into an epoch-partitioned sink
with dynamic partition OVERWRITE: a replayed micro-batch overwrites its own
epoch partitions with identical rows (subj URIs are deterministic,
functions/ids.mint_uri) — exactly-once by idempotent replay.

A watermarked windowed aggregation is included as the monitoring analog of
the reference's progress counters (src/data_loader.py:49-54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators.emit import emit_triples
from ..operators.mentions import detect_mentions, link_mentions


def read_pages_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_mentions(pages_stream: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Stateless on-stream stage: mention detection is a pure mapInPandas,
    legal on a streaming DataFrame. Linking (a window) and the pages
    re-join (stream-stream, unsupported) belong in foreachBatch, where each
    micro-batch is a static DataFrame — see run_stream_to_sink."""
    return detect_mentions(pages_stream, gazetteer)


def crawl_rate(pages_stream: DataFrame, window: str = "10 minutes", slide: str = "5 minutes") -> DataFrame:
    """Watermarked windowed page counts per lang — late data beyond 1 hour
    dropped; the streaming counterpart of batch counters (D7)."""
    return (
        pages_stream.withWatermark("warc_ts", "1 hour")
        .groupBy(F.window("warc_ts", window, slide), "lang")
        .agg(F.count("*").alias("n_pages"))
    )


def run_stream_to_sink(
    spark: SparkSession,
    pages_path: str,
    gazetteer: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
) -> None:
    """foreachBatch sink: each micro-batch (a STATIC DataFrame — windows
    and joins allowed) runs the full batch linker+emitter and writes
    parquet partitioned by (epoch_id, part_id) with DYNAMIC partition
    overwrite — exactly-once by idempotent replay: a micro-batch replayed
    after a failure between write and checkpoint commit OVERWRITES its own
    epoch partitions with identical rows (deterministic subj URIs +
    source-file-driven batch membership) instead of appending duplicates.
    A plain mode('append') here would NOT be idempotent, deterministic rows
    notwithstanding."""
    from ..operators.mentions import broadcast_surfaces

    stream = read_pages_stream(spark, pages_path)
    # ONE surface broadcast for the whole stream — a per-epoch
    # detect_mentions collect would re-broadcast the gazetteer every
    # trigger and leak one Broadcast object per epoch (review r5)
    surfaces_bc = broadcast_surfaces(gazetteer)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        mentions = detect_mentions(batch_df, gazetteer, surfaces_bc=surfaces_bc)
        linked = link_mentions(mentions, gazetteer, batch_df.select("url", "lang"))
        triples = emit_triples(linked, dedup=False)
        (
            triples.withColumn("epoch_id", F.lit(epoch_id))
            .repartition("part_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id", "part_id")
            .parquet(f"{sink_dir}/triples")
        )

    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_ntriples_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Streaming A1: ``readStream.text`` over an N-Triples drop directory ->
    the SAME expression plan as the batch reader (sources/rdf.
    ntriples_from_lines is pure column expressions — legal on a streaming
    DataFrame: no collect, no checkpoint, no Python). A continuously
    crawled corpus appends .nt files; each micro-batch parses only the new
    files. Malformed lines are dropped exactly as in batch (fail-soft)."""
    from ..sources.rdf import ntriples_from_lines

    lines = (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
        .withColumn("__file", F.input_file_name())
    )
    # same per-file bnode scoping as the batch reader (ADVICE r4):
    # input_file_name() is legal on a streaming file source
    return ntriples_from_lines(lines, file_col="__file")


def read_jsonld_lines_stream(
    spark: SparkSession,
    path: str,
    context: dict | None = None,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming A1 for NDJSON-LD (r5): ``readStream.text`` over a drop
    directory -> the SAME stateless parse stage as the batch reader
    (sources/jsonld.jsonld_lines_plan — a pure mapInPandas, legal on a
    streaming DataFrame). The static ``context`` plays the same role as
    the static prefix table in read_turtle_lines_stream: stream queries
    cannot collect per-file headers mid-query, and crawler NDJSON shares
    one context by construction. Invalid JSON lines are dropped exactly
    as in batch (fail-soft)."""
    from ..sources.jsonld import jsonld_lines_plan

    lines = (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
        .select(F.input_file_name().alias("file"), "value")
    )
    return jsonld_lines_plan(lines, context)


def read_turtle_lines_stream(
    spark: SparkSession,
    path: str,
    prefixes: dict[str, str] | None = None,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming A1 for statement-per-line Turtle (VERDICT r3 #8):
    ``readStream.text`` over a drop directory -> the SAME stateless parse
    stage as the batch line reader (sources/rdf.turtle_lines_plan — a pure
    mapInPandas, legal on a streaming DataFrame).

    Prefix expansion on a stream cannot collect the prefix table mid-query
    (no actions on streams), so it takes a STATIC ``prefixes`` dict —
    e.g. ``turtle_prefixes(spark, existing_corpus)`` gathered batch-side,
    the natural fit for a crawl whose prefix set is fixed config — and
    applies the same Catalyst-side pn_mask expansion as batch. With
    ``prefixes=None`` triples come back in compact form. Unparseable
    lines are dropped exactly as in batch (fail-soft)."""
    from ..sources.rdf import _TRIPLE_COLS, _expand_col, turtle_lines_plan

    lines = (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
        .select(F.input_file_name().alias("file"), "value")
    )
    parsed = turtle_lines_plan(lines, "defer" if prefixes else "compact")
    triples = parsed.filter(F.col("kind") == "t")
    if not prefixes:
        return triples.select(*_TRIPLE_COLS)
    return triples.select(
        _expand_col("s", 1, prefixes),
        _expand_col("p", 2, prefixes),
        _expand_col("o", 4, prefixes),
        _expand_col("o_datatype", 8, prefixes),
        F.col("o_lang"),
    )
