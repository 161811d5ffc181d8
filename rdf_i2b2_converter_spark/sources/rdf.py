"""RDF sources/sinks: N-Triples and a Turtle subset in and out of the
triples DataFrame.

Analog of the reference's GraphParser (src/utils.py:48-75), which
``guess_format``s and loads Turtle files into an in-memory rdflib.Graph.
We keep triples columnar:

- N-Triples: ``spark.read.text`` + built-in regex expressions — JVM-side,
  whole-stage codegen, no Python in the loop. Standard ``_:name`` blank
  nodes supported in subject and object position.
- Turtle subset (:func:`read_turtle`): prefix directives are collected
  driver-side (a prefix table is ontology-config-sized); statements are
  parsed by a vectorized ``mapInPandas`` lexer — one statement per line,
  with same-line ``;`` predicate-object lists and ``,`` object lists,
  prefixed names, ``a``, typed/lang literals, bare numeric/boolean
  literals, and ``_:`` blank nodes. Multiline statements, ``[]`` anonymous
  bnodes and collections are out of scope — :func:`scan_turtle_errors`
  surfaces what the subset rejects. This covers the reference's own corpus
  shapes (SPHN ontology/data dumps are statement-per-line).

Partition-pruned terminology routing replaces the reference's per-prefix
side graphs (src/utils.py:148-153).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: One N-Triples statement:
#:   (<s> | _:b) <p> (<iri> | _:b | "lit"(^^<dt> | @lang)?) .
_NT_RE = (
    r"^\s*(?:<([^>]*)>|(_:\S+))\s+<([^>]*)>\s+"
    r"(?:<([^>]*)>|(_:\S+)|\"((?:[^\"\\]|\\.)*)\"(?:\^\^<([^>]*)>|@([A-Za-z0-9-]+))?)\s*\.\s*$"
)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """N-Triples file(s) -> TRIPLES_RAW(s, p, o, o_datatype, o_lang).

    Scales as a plain text scan: line-splittable, predicate pushdown on the
    regexp filter, no shuffle. Comment/blank lines are dropped, malformed
    lines are surfaced via the companion :func:`scan_errors`. Blank nodes
    (``_:name``) are carried verbatim as node ids."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", _NT_RE, 1).alias("s_iri"),
        F.regexp_extract("value", _NT_RE, 2).alias("s_blank"),
        F.regexp_extract("value", _NT_RE, 3).alias("p"),
        F.regexp_extract("value", _NT_RE, 4).alias("o_iri"),
        F.regexp_extract("value", _NT_RE, 5).alias("o_blank"),
        F.regexp_extract("value", _NT_RE, 6).alias("o_lit"),
        F.regexp_extract("value", _NT_RE, 7).alias("o_dt"),
        F.regexp_extract("value", _NT_RE, 8).alias("o_lang"),
        F.col("value"),
    ).filter(F.col("value").rlike(_NT_RE))
    unescaped = (
        F.regexp_replace(F.regexp_replace(F.col("o_lit"), r'\\"', '"'), r"\\\\", r"\\")
    )
    is_res = (F.col("o_iri") != "") | (F.col("o_blank") != "")
    return parsed.select(
        F.when(F.col("s_iri") != "", F.col("s_iri")).otherwise(F.col("s_blank")).alias("s"),
        F.col("p"),
        F.when(F.col("o_iri") != "", F.col("o_iri"))
        .when(F.col("o_blank") != "", F.col("o_blank"))
        .otherwise(unescaped)
        .alias("o"),
        F.when(is_res, F.lit(None).cast("string"))
        .when(F.col("o_dt") != "", F.col("o_dt"))
        .otherwise(F.lit("xsd:string"))
        .alias("o_datatype"),
        F.when(F.col("o_lang") != "", F.col("o_lang")).otherwise(F.lit(None)).alias("o_lang"),
    )


# --------------------------------------------------------------- Turtle

#: ``@prefix p: <iri> .`` / SPARQL-style ``PREFIX p: <iri>`` (p may be empty)
_PREFIX_RE = re.compile(
    r"^\s*(?:@prefix|PREFIX)\s+([A-Za-z][\w.-]*)?:\s*<([^>]*)>\s*\.?\s*$", re.IGNORECASE
)
#: ``@base <iri> .`` — accepted and ignored (we do not resolve relative IRIs)
_BASE_RE = re.compile(r"^\s*(?:@base|BASE)\s+<[^>]*>\s*\.?\s*$", re.IGNORECASE)

#: Turtle-line lexer. Order matters: IRIs and literals first so '<', '"'
#: runs never tokenize as pnames; 'a' only when delimited. Names may
#: contain '.' INTERNALLY but never consume a trailing one — per the
#: grammar (PN_LOCAL cannot end with '.', DECIMAL needs digits after it),
#: so `ex:b.` lexes as pname `ex:b` + statement terminator, not a
#: dot-terminated pname that swallows the '.' and kills the statement.
_TTL_TOKEN_RE = re.compile(
    r"""
    (?P<iri><[^>]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*")
  | (?P<dt>\^\^(?:<[^>]*>|[A-Za-z][\w-]*(?:\.[\w-]+)*:[\w-]+(?:\.[\w-]+)*))
  | (?P<lang>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<blank>_:[\w-]+(?:\.[\w-]+)*)
  | (?P<boolean>\b(?:true|false)\b(?!:))
  | (?P<pname>(?:[A-Za-z][\w-]*(?:\.[\w-]+)*)?:(?:[\w%/#-]+(?:\.[\w%/#-]+)*)?)
  | (?P<number>[+-]?(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<a>\ba\b(?!:))
  | (?P<punct>[;,.])
  | (?P<comment>\#.*)
  | (?P<ws>\s+)
  | (?P<bad>.)
""",
    re.VERBOSE,
)

XSD_NS = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _expand_pname(pname: str, prefixes: dict[str, str], expand: bool) -> str:
    if not expand:
        return pname
    pfx, _, local = pname.partition(":")
    base = prefixes.get(pfx)
    return base + local if base is not None else pname


def _parse_turtle_line(line: str, prefixes: dict[str, str], expand: bool):
    """One Turtle statement line -> list of (s, p, o, o_datatype, o_lang).

    Raises ValueError on anything outside the supported subset (the caller
    decides whether to fail or route to the error scan)."""
    toks: list[tuple[str, str]] = []
    for m in _TTL_TOKEN_RE.finditer(line):
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind == "bad":
            raise ValueError(f"unexpected character {m.group()!r}")
        toks.append((kind, m.group()))
    if not toks:
        return []

    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else (None, None)

    def term(allow_literal: bool):
        nonlocal pos
        kind, val = peek()
        if kind == "iri":
            pos += 1
            return val[1:-1], None, None
        if kind == "blank":
            pos += 1
            return val, None, None
        if kind == "a":
            pos += 1
            # per the Turtle grammar 'a' ALWAYS denotes rdf-syntax-ns#type,
            # even if the corpus re-declares the 'rdf:' prefix
            return (RDF_NS + "type") if expand else "rdf:type", None, None
        if kind == "pname":
            pos += 1
            return _expand_pname(val, prefixes, expand), None, None
        if not allow_literal:
            raise ValueError(f"expected resource term, got {kind}={val!r}")
        if kind == "literal":
            pos += 1
            text = val[1:-1].replace('\\"', '"').replace("\\\\", "\\")
            dkind, dval = peek()
            if dkind == "dt":
                pos += 1
                dt = dval[2:]
                dt = dt[1:-1] if dt.startswith("<") else _expand_pname(dt, prefixes, expand)
                return text, dt, None
            if dkind == "lang":
                pos += 1
                return text, "xsd:string", dval[1:]
            return text, "xsd:string", None
        if kind == "number":
            pos += 1
            local = "integer" if re.fullmatch(r"[+-]?\d+", val) else (
                "double" if ("e" in val or "E" in val) else "decimal"
            )
            # expand mode: full XSD IRI, consistent with expanded ^^xsd:*
            # datatypes (one namespace spelling per column, not two)
            return val, (XSD_NS + local if expand else "xsd:" + local), None
        if kind == "boolean":
            pos += 1
            return val, (XSD_NS + "boolean" if expand else "xsd:boolean"), None
        raise ValueError(f"expected term, got {kind}={val!r}")

    out = []
    s, _, _ = term(allow_literal=False)
    while True:
        p, _, _ = term(allow_literal=False)
        while True:
            o, dt, lang = term(allow_literal=True)
            out.append((s, p, o, dt, lang))
            kind, val = peek()
            if kind == "punct" and val == ",":
                pos += 1
                continue
            break
        kind, val = peek()
        if kind == "punct" and val == ";":
            pos += 1
            # tolerate trailing ';' before '.'
            if peek() == ("punct", "."):
                pos += 1
                break
            continue
        if kind == "punct" and val == ".":
            pos += 1
            break
        raise ValueError(f"expected ';' ',' or '.', got {kind}={val!r}")
    if pos != len(toks):
        raise ValueError(f"trailing tokens after '.': {toks[pos:]!r} (one statement per line)")
    return out


def turtle_prefixes(spark: SparkSession, path: str) -> dict[str, str]:
    """Collect the prefix table driver-side: prefix directives are a
    config-sized handful per corpus; a filtered text scan + collect is the
    same small-side reasoning as a broadcast-join build side."""
    rows = (
        spark.read.text(path)
        # (?i): the directive keyword is case-insensitive (matching
        # _PREFIX_RE) — a filter stricter than the parser's skip rule would
        # silently lose the prefix while still skipping the line
        .filter(F.col("value").rlike(r"(?i)^\s*(@prefix|prefix)\s"))
        .collect()
    )
    prefixes: dict[str, str] = {}
    for r in rows:
        m = _PREFIX_RE.match(r["value"])
        if m:
            prefixes[m.group(1) or ""] = m.group(2)
    return prefixes


def read_turtle(spark: SparkSession, path: str, expand_prefixes: bool = True) -> DataFrame:
    """Turtle-subset file(s) -> TRIPLES_RAW(s, p, o, o_datatype, o_lang).

    Two passes, both line-splittable: (1) driver-side prefix collection
    (:func:`turtle_prefixes`), (2) vectorized ``mapInPandas`` statement
    parsing with the broadcast prefix map — the ttl2nt converter shape
    recommended for the reference's own .ttl corpora (GraphParser,
    src/utils.py:48-75). Unparseable lines are skipped here and surfaced by
    :func:`scan_turtle_errors` (fail-soft, same posture as read_ntriples).

    ``expand_prefixes``: True resolves prefixed names to full IRIs
    (rdflib-parity); False keeps the compact ``p:local`` form the engine's
    configs use. Plain literals carry the 'xsd:string' sentinel datatype
    either way (read_ntriples parity)."""
    import pandas as pd

    prefixes = turtle_prefixes(spark, path)
    bc = spark.sparkContext.broadcast((prefixes, expand_prefixes))
    lines = spark.read.text(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pfx, expand = bc.value
        cols = ["s", "p", "o", "o_datatype", "o_lang"]
        for pdf in batches:
            rows: list[tuple] = []
            for line in pdf["value"]:
                if not line or _PREFIX_RE.match(line) or _BASE_RE.match(line):
                    continue
                try:
                    rows.extend(_parse_turtle_line(line, pfx, expand))
                except ValueError:
                    continue  # surfaced by scan_turtle_errors
            yield pd.DataFrame(rows, columns=cols)

    return lines.mapInPandas(
        parse, schema="s string, p string, o string, o_datatype string, o_lang string"
    )


def scan_turtle_errors(spark: SparkSession, path: str) -> DataFrame:
    """Lines the Turtle subset cannot parse (multiline statements, '[]'
    bnodes, collections) — report, don't crash the 100 TB ingest."""
    import pandas as pd

    prefixes = turtle_prefixes(spark, path)
    bc = spark.sparkContext.broadcast(prefixes)
    lines = spark.read.text(path)

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pfx = bc.value
        for pdf in batches:
            bad: list[tuple[str, str]] = []
            for line in pdf["value"]:
                if not line or _PREFIX_RE.match(line) or _BASE_RE.match(line):
                    continue
                try:
                    _parse_turtle_line(line, pfx, True)
                except ValueError as e:
                    bad.append((line, str(e)))
            yield pd.DataFrame(bad, columns=["value", "error"])

    return lines.mapInPandas(check, schema="value string, error string")


def read_rdf(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """guess_format front door (src/utils.py:48-75 analog): dispatch on
    explicit ``fmt`` ('ntriples'|'turtle'|'parquet') or file extension
    (.nt/.ttl), defaulting to a parquet triples table."""
    fmt = fmt or (
        "ntriples" if path.endswith(".nt")
        else "turtle" if path.endswith(".ttl")
        else "parquet"
    )
    if fmt == "ntriples":
        return read_ntriples(spark, path)
    if fmt == "turtle":
        return read_turtle(spark, path)
    return spark.read.parquet(path)


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
