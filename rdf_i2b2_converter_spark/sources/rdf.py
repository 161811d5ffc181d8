"""RDF sources/sinks: N-Triples in and out of the triples DataFrame.

Analog of the reference's GraphParser (src/utils.py:48-75), which loads
Turtle files into an in-memory rdflib.Graph. We keep triples columnar:
``spark.read.text`` + built-in regex expressions parse N-Triples lines into
TRIPLES_RAW — JVM-side, whole-stage codegen, no Python in the loop — and
partition-pruned terminology routing replaces the reference's per-prefix
side graphs (src/utils.py:148-153).

Turtle's full grammar (prefixes, multiline literals) is out of scope for a
line-oriented scan; convert Turtle to N-Triples offline or land triples as
parquet. This matches the engine's columnar-first posture (SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: One N-Triples statement:  <s> <p> (<iri> | "lit"(^^<dt> | @lang)?) .
_NT_RE = (
    r"^\s*<([^>]*)>\s+<([^>]*)>\s+"
    r"(?:<([^>]*)>|\"((?:[^\"\\]|\\.)*)\"(?:\^\^<([^>]*)>|@([A-Za-z0-9-]+))?)\s*\.\s*$"
)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """N-Triples file(s) -> TRIPLES_RAW(s, p, o, o_datatype, o_lang).

    Scales as a plain text scan: line-splittable, predicate pushdown on the
    regexp filter, no shuffle. Comment/blank lines are dropped, malformed
    lines are surfaced via the companion :func:`scan_errors`."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", _NT_RE, 1).alias("s"),
        F.regexp_extract("value", _NT_RE, 2).alias("p"),
        F.regexp_extract("value", _NT_RE, 3).alias("o_iri"),
        F.regexp_extract("value", _NT_RE, 4).alias("o_lit"),
        F.regexp_extract("value", _NT_RE, 5).alias("o_dt"),
        F.regexp_extract("value", _NT_RE, 6).alias("o_lang"),
        F.col("value"),
    ).filter(F.col("value").rlike(_NT_RE))
    unescaped = (
        F.regexp_replace(F.regexp_replace(F.col("o_lit"), r'\\"', '"'), r"\\\\", r"\\")
    )
    return parsed.select(
        F.col("s"),
        F.col("p"),
        F.when(F.col("o_iri") != "", F.col("o_iri")).otherwise(unescaped).alias("o"),
        F.when(F.col("o_iri") != "", F.lit(None).cast("string"))
        .when(F.col("o_dt") != "", F.col("o_dt"))
        .otherwise(F.lit("xsd:string"))
        .alias("o_datatype"),
        F.when(F.col("o_lang") != "", F.col("o_lang")).otherwise(F.lit(None)).alias("o_lang"),
    )


def scan_errors(spark: SparkSession, path: str) -> DataFrame:
    """Lines that are neither statements, comments nor blank — the engine's
    fail-soft counterpart of rdflib's parse error (src/utils.py:61-63
    skips unparseable files; we report per line)."""
    lines = spark.read.text(path)
    return lines.filter(
        ~F.col("value").rlike(_NT_RE)
        & ~F.col("value").rlike(r"^\s*(#.*)?$")
    )


def route_terminology(triples: DataFrame, prefix_map: dict[str, str]) -> DataFrame:
    """Stamp a ``source`` column by longest-prefix match of the subject URI
    — the which_graph routing (src/utils.py:148-153, operator C12). The
    column is the partition key for terminology pruning downstream."""
    expr = F.lit("main")
    for prefix, name in sorted(prefix_map.items(), key=lambda kv: len(kv[0])):
        # sorted ascending: longer prefixes applied later win (when-chain
        # built inside-out, last when() evaluated first)
        expr = F.when(F.col("s").startswith(prefix), F.lit(name)).otherwise(expr)
    return triples.withColumn("source", expr)


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """TRIPLES -> N-Triples text files (the rdflib serialization analog).
    Uses operators/emit.triples_to_ntriples for escaping."""
    from ..operators.emit import triples_to_ntriples

    triples_to_ntriples(triples).write.mode(mode).text(path)
