"""Triple emission: linked mentions -> (subj, pred, obj, obj_datatype).

Analog of the reference's OBSERVATION_FACT row materialization
(ObservationRegister.digest + add_record, src/data_loader.py:142-179): one
output row per path end, carrying inherited context. Here a "path end" is
each (mention-entity, predicate) pair; the inherited context is the page's
(source_url, lang, crawl_ts) with the reference's overwrite policy
(ContextFactory.digest, src/data_loader.py:320-352).

Everything is built-in column expressions over one DataFrame — Catalyst
fuses the per-predicate projections into a single stage; the only shuffle
in the whole emission is the final ``distinct``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import (
    CONTEXT_FIELDS,
    PRED_EXTRACTED_AT,
    PRED_IN_LANG,
    PRED_LINK_SCORE,
    PRED_MENTIONED_IN,
    PRED_SAME_AS,
    PRED_SURFACE_FORM,
    PRED_TYPE,
    XSD_DATETIME,
    XSD_DOUBLE,
    XSD_STRING,
)
from ..functions.ids import mint_uri
from ..functions.values import format_datetime


def resolve_context(context_rows: DataFrame) -> DataFrame:
    """Context precedence resolver — ContextFactory semantics
    (src/data_loader.py:320-352) as a window:

    input rows (entity_id, field, value, depth); output one row per
    (entity_id, field). ``overwrite=True`` fields take the DEEPEST value
    (inner overrides inherited), ``overwrite=False`` the SHALLOWEST
    (first-wins, outer context survives). Ties at equal depth break on
    value for determinism (SURVEY.md §7.4 #4: explicit priority rank, not
    iteration order)."""
    overwrite_fields = [k for k, v in CONTEXT_FIELDS.items() if v["overwrite"]]
    depth_rank = F.when(
        F.col("field").isin(overwrite_fields), -F.col("depth")
    ).otherwise(F.col("depth"))
    w = Window.partitionBy("entity_id", "field").orderBy(depth_rank.asc(), F.col("value").asc())
    return (
        context_rows.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def filter_mandatory_context(df: DataFrame) -> DataFrame:
    """Drop rows missing mandatory context — the validity gate of
    src/data_loader.py:305-318 (operator B7)."""
    cond = F.lit(True)
    for field, spec in CONTEXT_FIELDS.items():
        if spec.get("mandatory") and field in df.columns:
            cond = cond & F.col(field).isNotNull() & (F.col(field) != "")
    return df.filter(cond)


def emit_triples(
    linked: DataFrame,
    canonical_mapping: DataFrame | None = None,
    hash_fn: str = "xxhash64",
    n_parts: int = 64,
    dedup: bool = True,
) -> DataFrame:
    """linked(url, surface, type_uri, canonical_id, link_score, lang,
    warc_ts?) -> TRIPLES.

    subj is minted deterministically from canonical (source, type, surface)
    — the reference's instance-URI / basecode determinism contract
    (src/utils.py:112-127). ``part_id`` buckets the sink by subj hash so a
    re-run writes the same rows to the same partitions (resume idempotency).
    """
    df = filter_mandatory_context(
        linked.withColumnRenamed("url", "source_url")
        if "source_url" not in linked.columns
        else linked
    )
    subj = mint_uri("source_url", "type_uri", "surface", prefix="kg:e/", hash_fn=hash_fn)
    df = df.withColumn("subj", subj)

    if canonical_mapping is not None:
        m = canonical_mapping.select(
            F.col("id").alias("canonical_id"), F.col("component").alias("__canon")
        )
        # no forced broadcast hint (review r4): the CC mapping covers every
        # alias-connected entity — gazetteer-derived graphs are tiny and AQE
        # broadcasts them at runtime, but a web-scale alias graph can carry
        # 10^9 ids, where a forced broadcast is a driver/executor OOM; the
        # plain equi-join lets AQE pick broadcast vs shuffled+skew-split
        df = df.join(m, "canonical_id", "left").withColumn(
            "canonical_entity",
            F.concat(F.lit("kg:c/"), F.coalesce(F.col("__canon"), F.col("canonical_id"))),
        ).drop("__canon")
    else:
        df = df.withColumn(
            "canonical_entity", F.concat(F.lit("kg:c/"), F.col("canonical_id"))
        )

    # ONE pass: explode an array of (pred, obj, datatype) structs instead of
    # a union of per-predicate branches — a union would recompute the whole
    # upstream (mapInPandas mention detection included) once per predicate.
    def s(pred: str, obj, datatype: str | None):
        return F.struct(
            F.lit(pred).alias("pred"),
            obj.cast("string").alias("obj"),
            F.lit(datatype).cast("string").alias("obj_datatype"),
        )

    structs = [
        s(PRED_TYPE, F.col("type_uri"), None),
        s(PRED_MENTIONED_IN, F.col("source_url"), None),
        s(PRED_SURFACE_FORM, F.col("surface"), XSD_STRING),
        s(PRED_SAME_AS, F.col("canonical_entity"), None),
        s(PRED_LINK_SCORE, F.col("link_score"), XSD_DOUBLE),
    ]
    if "lang" in df.columns:
        structs.append(s(PRED_IN_LANG, F.col("lang"), XSD_STRING))
    if "warc_ts" in df.columns:
        structs.append(s(PRED_EXTRACTED_AT, format_datetime("warc_ts"), XSD_DATETIME))

    triples = df.select(
        "subj", "source_url", F.explode(F.array(*structs)).alias("t")
    ).select("subj", "t.pred", "t.obj", "t.obj_datatype", "source_url")
    # D1 distinct (remove_duplicates, src/utils.py:252-257). Callers whose
    # input is already unique per (url, surface) — link_mentions guarantees
    # this via its min_by groupBy aggregate — should pass dedup=False: the exploded
    # triples are then distinct by construction and skipping the dedup
    # avoids a full-width shuffle of every emitted triple (the single
    # largest shuffle in the pipeline at 10^12 scale; dedup early on the
    # compact mention rows, not late on exploded triples).
    if dedup:
        triples = triples.distinct()
    return triples.withColumn(
        "part_id", F.pmod(F.xxhash64("subj"), F.lit(n_parts)).cast("int")
    )


def integrity_check(triples: DataFrame, ontology_closed: DataFrame) -> DataFrame:
    """Referential integrity (C10, check_basecodes src/scripts/obs_tools.py:
    5-29): every rdf:type object must exist in the closed ontology. Returns
    the offending objects (empty == pass) via a broadcast left_anti join."""
    typed = triples.filter(F.col("pred") == PRED_TYPE).select(F.col("obj")).distinct()
    dim = ontology_closed.select(F.col("class_uri").alias("obj"))
    return typed.join(F.broadcast(dim), "obj", "left_anti")


#: plain-literal sentinel spellings — no ^^ suffix on serialization
_PLAIN_DTS = ("xsd:string", "http://www.w3.org/2001/XMLSchema#string")


def escape_literal(col) -> "F.Column":
    r"""The ONE writer escape set (\\ \" \n \r \t) — shared by the
    N-Triples and Turtle sinks; its decode mirror is
    sources/rdf.ntriples_from_lines and sources/rdf._unescape. Keep the
    three in lockstep: an escape added to a writer but not the readers
    silently breaks write->read round-trips."""
    escaped = F.regexp_replace(col, r"\\", r"\\\\")
    escaped = F.regexp_replace(escaped, '"', r"\\\"")
    # control chars would break the one-statement-per-line format
    escaped = F.regexp_replace(escaped, "\n", r"\\n")
    escaped = F.regexp_replace(escaped, "\r", r"\\r")
    return F.regexp_replace(escaped, "\t", r"\\t")


def render_resource_term(col) -> "F.Column":
    """Standard ``_:`` blank nodes serialize bare, IRIs bracketed — shared
    by the N-Triples and Turtle sinks (the Turtle sink layers optional
    prefix compaction on top)."""
    return F.when(col.startswith("_:"), col).otherwise(
        F.concat(F.lit("<"), col, F.lit(">"))
    )


def triples_to_ntriples(triples: DataFrame) -> DataFrame:
    """Render as N-Triples lines (the rdflib serialization analog,
    src/main_ontology.py flow) — pure string expressions, writable with
    ``df.write.text``. Plain-literal sentinels ('xsd:string' / its
    expanded spelling) render without a ^^ suffix; an ``obj_lang`` column,
    when present, renders as '@lang' (review r3: both used to be silently
    mangled — the sentinel emitted as an invalid relative <xsd:string>
    IRI and the lang tag dropped)."""
    subj = render_resource_term(F.col("subj"))
    pred = F.concat(F.lit("<"), F.col("pred"), F.lit(">"))
    lang = F.col("obj_lang") if "obj_lang" in triples.columns else F.lit(None).cast("string")
    plain = F.col("obj_datatype").isin(*_PLAIN_DTS)
    lit_obj = F.concat(
        F.lit('"'),
        escape_literal(F.col("obj")),
        F.lit('"'),
        F.when(lang.isNotNull(), F.concat(F.lit("@"), lang))
        .when(~plain, F.concat(F.lit("^^<"), F.col("obj_datatype"), F.lit(">")))
        .otherwise(F.lit("")),
    )
    obj = F.when(F.col("obj_datatype").isNotNull(), lit_obj).otherwise(
        render_resource_term(F.col("obj"))
    )
    return triples.select(
        F.concat_ws(" ", subj, pred, obj, F.lit(".")).alias("value")
    )
