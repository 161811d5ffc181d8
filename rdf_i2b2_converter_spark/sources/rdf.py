"""RDF sources/sinks: N-Triples and a Turtle subset in and out of the
triples DataFrame.

Analog of the reference's GraphParser (src/utils.py:48-75), which
``guess_format``s and loads Turtle files into an in-memory rdflib.Graph.
We keep triples columnar:

- N-Triples: ``spark.read.text`` + built-in regex expressions — JVM-side,
  whole-stage codegen, no Python in the loop. Standard ``_:name`` blank
  nodes supported in subject and object position.
- Turtle (:func:`read_turtle`): FULL Turtle by default — a recursive-
  descent document parser (multiline statements, ``[]`` anonymous bnodes,
  ``( ... )`` collections as rdf:first/rest/nil spines, @prefix/@base,
  long strings) running one file per task inside ``mapInPandas``; single
  pass, prefixes are document-scoped parser state. ``multiline=False``
  selects the statement-per-line subset instead — line-SPLITTABLE for
  huge single-file dumps, also single-scan (workers emit compact pnames +
  markers; expansion happens Catalyst-side from the prefix rows emitted
  in the same pass). :func:`scan_turtle_errors` surfaces whatever either
  mode rejects (fail-soft ingest).

Partition-pruned terminology routing replaces the reference's per-prefix
side graphs (src/utils.py:148-153).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
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
    return ntriples_from_lines(spark.read.text(path))


def ntriples_from_lines(lines: DataFrame) -> DataFrame:
    """The N-Triples expression plan over any lines DataFrame — pure column
    expressions, so it applies unchanged to a STREAMING lines source
    (streaming/stream.read_ntriples_stream)."""
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
    # decode \\ \" \n \r \t — the writer's full escape set
    # (operators/emit.triples_to_ntriples), so write->read round-trips
    # control characters. Order matters for mixed sequences like '\\n'
    # (escaped backslash THEN a literal n): protect '\\' behind a
    # private-use sentinel first, decode the singles, restore. Caveat: a
    # source literal containing U+E000 itself (private-use area, absent
    # from real text) would be corrupted.
    _sent = "\ue000"
    unescaped = F.regexp_replace(F.col("o_lit"), r"\\\\", _sent)
    unescaped = F.regexp_replace(unescaped, r'\\"', '"')
    unescaped = F.regexp_replace(unescaped, r"\\n", "\n")
    unescaped = F.regexp_replace(unescaped, r"\\r", "\r")
    unescaped = F.regexp_replace(unescaped, r"\\t", "\t")
    unescaped = F.regexp_replace(unescaped, _sent, r"\\")
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
#: ``@base <iri> .`` — line-mode only marker (the document parser resolves)
_BASE_RE = re.compile(r"^\s*(?:@base|BASE)\s+<[^>]*>\s*\.?\s*$", re.IGNORECASE)

#: Turtle token stream (shared by the line and document parsers). Order
#: matters: strings and IRIs first so '<', '"' runs never tokenize as
#: pnames; directive keywords before lang tags so '@prefix' is not a lang;
#: pnames before the 'a' keyword (a bare 'a' never matches pname, which
#: requires a colon) and both 'a' and true/false guarded with (?!:) so
#: prefixes named 'a'/'true'/'false' lex as pnames. Names may contain '.'
#: INTERNALLY but never consume a trailing one — per the grammar (PN_LOCAL
#: cannot end with '.', DECIMAL needs digits after it), so `ex:b.` lexes as
#: pname `ex:b` + statement terminator.
_TTL_TOKEN_RE = re.compile(
    r'''
    (?P<longlit>"{3}(?:\\[\s\S]|[^"\\]|"{1,2}(?!"))*"{3})
  | (?P<longlit1>'{3}(?:\\[\s\S]|[^'\\]|'{1,2}(?!'))*'{3})
  | (?P<literal>"(?:[^"\\\n]|\\.)*")
  | (?P<literal1>'(?:[^'\\\n]|\\.)*')
  | (?P<iri><[^>]*>)
  | (?P<prefix_kw>(?i:@?prefix\b(?!:)))
  | (?P<base_kw>(?i:@?base\b(?!:)))
  | (?P<lang>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<dt>\^\^)
  | (?P<blank>_:[\w-]+(?:\.[\w-]+)*)
  | (?P<boolean>\b(?:true|false)\b(?!:))
  | (?P<pname>(?:[A-Za-z][\w-]*(?:\.[\w-]+)*)?:(?:(?:[\w%/#-]|\\[_~.!$&'()*+,;=/?\#@%-])+(?:\.(?:[\w%/#-]|\\[_~.!$&'()*+,;=/?\#@%-])+)*)?)
  | (?P<number>[+-]?(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<a>\ba\b(?!:))
  | (?P<bracket>[\[\]()])
  | (?P<punct>[;,.])
  | (?P<comment>\#[^\n]*)
  | (?P<ws>\s+)
  | (?P<bad>.)
''',
    re.VERBOSE,
)

XSD_NS = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

#: plain-literal sentinel datatype (read_ntriples parity — never expanded)
_PLAIN = "xsd:string"

_ESCAPE_MAP = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
               '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    r"""Turtle string-escape decoding (\n, \t, \uXXXX, \UXXXXXXXX, ...).
    Fail-soft by construction (review r3): malformed numeric escapes
    (\uZZZZ) and unpairable surrogates keep their escaped spelling
    verbatim instead of raising — a ValueError here would escape the
    parser's per-statement recovery and kill the whole ingest task, and a
    lone surrogate in the output would crash the pandas->Arrow UTF-8
    conversion. JSON-style \uD8xx\uDCxx surrogate PAIRS (common in real
    dumps) are combined into the single intended codepoint. Unknown
    single-char escapes keep the escaped character."""
    if "\\" not in s:
        return s

    def _hex(start: int, width: int) -> int | None:
        end = start + width
        chunk = s[start:end]
        # strict: int(x, 16) alone accepts '+', whitespace and '_' —
        # '\u+FFF' would silently decode instead of staying verbatim
        if end > len(s) or not all(c in "0123456789abcdefABCDEF" for c in chunk):
            return None
        return int(chunk, 16)

    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "\\" or i + 1 >= n:
            out.append(c)
            i += 1
            continue
        e = s[i + 1]
        if e == "u":
            cp = _hex(i + 2, 4)
            if cp is None:
                out.append(s[i : i + 2])
                i += 2
                continue
            if 0xD800 <= cp <= 0xDBFF:  # high surrogate: try to pair
                lo = _hex(i + 8, 4) if s[i + 6 : i + 8] == "\\u" else None
                if lo is not None and 0xDC00 <= lo <= 0xDFFF:
                    out.append(chr(0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)))
                    i += 12
                    continue
            if 0xD800 <= cp <= 0xDFFF:  # unpairable surrogate: keep escaped
                out.append(s[i : i + 6])
                i += 6
                continue
            out.append(chr(cp))
            i += 6
        elif e == "U":
            cp = _hex(i + 2, 8)
            if cp is None or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                out.append(s[i : i + 2])
                i += 2
                continue
            out.append(chr(cp))
            i += 10
        else:
            out.append(_ESCAPE_MAP.get(e, e))
            i += 2
    return "".join(out)


def _tokenize(text: str) -> list[tuple[str, str, int]]:
    """-> [(kind, value, start_offset)], whitespace/comments dropped, the
    three extra literal spellings folded to kind='literal'."""
    toks: list[tuple[str, str, int]] = []
    for m in _TTL_TOKEN_RE.finditer(text):
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind in ("longlit", "longlit1", "literal1"):
            kind = "literal"
        toks.append((kind, m.group(), m.start()))
    return toks


class _TurtleError(ValueError):
    pass


_SCHEME_RE = re.compile(r"[A-Za-z][A-Za-z0-9+.-]*:")


class _TurtleParser:
    """Recursive-descent Turtle parser over the shared token stream —
    the engine's from-scratch answer to the reference's rdflib front door
    (GraphParser, src/utils.py:48-75). Handles multiline statements,
    ``[]`` anonymous bnode property lists, ``( ... )`` collections
    (emitted as rdf:first/rest/nil spines — what owl:unionOf consumers
    need, src/rdfwrappers.py:294-322), @prefix/@base directives, long
    strings, numeric/boolean literals, lang tags and datatypes.

    ``mode``:
      - ``expand``  — resolve pnames against the (document-scoped) prefix
        table; synthetic terms ('a', numeric datatypes, list spine) emit
        full IRIs.
      - ``compact`` — keep pnames as written; synthetics emit 'rdf:type',
        'xsd:integer', 'rdf:first', ... (the engine's config spelling).
      - ``defer``   — pnames stay compact but are MARKED (pn_mask bits
        s=1,p=2,o=4,dt=8) for later Catalyst-side expansion; synthetics
        emit full IRIs. This is what makes the splittable line reader
        single-scan: workers need no prefix table.

    ``allow_structs=False`` (line mode) rejects ``[]``/``()`` — a bnode
    synthesized independently per line could collide across lines.

    Rows land in ``self.rows`` as (s, p, o, o_datatype, o_lang, pn_mask);
    plain literals carry the 'xsd:string' sentinel (read_ntriples parity).
    """

    def __init__(self, toks, prefixes=None, mode="expand", bnode_ns="b",
                 allow_structs=True, text=""):
        self.toks = toks
        self.pos = 0
        self.prefixes: dict[str, str] = dict(prefixes or {})
        self.base: str | None = None
        self.mode = mode
        self.bnode_ns = bnode_ns
        self.n_bnodes = 0
        self.allow_structs = allow_structs
        self.text = text
        self.rows: list[tuple] = []
        self.errors: list[tuple[int, str]] = []

    # ---- token helpers
    def _peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else (None, None, len(self.text))

    def _next(self):
        t = self._peek()
        if self.pos < len(self.toks):
            self.pos += 1
        return t

    def _line_of(self, start: int) -> int:
        return self.text.count("\n", 0, start) + 1

    def _err(self, msg: str, start: int | None = None):
        if start is None:
            start = self._peek()[2]
        raise _TurtleError(f"line {self._line_of(start)}: {msg}")

    # ---- term constructors: a term is (value, deferred_pname_flag)
    def _std(self, ns_iri: str, pfx: str, local: str):
        if self.mode == "compact":
            return (f"{pfx}:{local}", False)
        return (ns_iri + local, False)

    def _rdf(self, local: str):
        return self._std(RDF_NS, "rdf", local)

    def _xsd(self, local: str):
        return self._std(XSD_NS, "xsd", local)

    def _pname_term(self, val: str):
        if "\\" in val:  # PN_LOCAL_ESC: '\,' '\(' ... -> the bare char
            val = re.sub(r"\\([_~.!$&'()*+,;=/?#@%-])", r"\1", val)
        if self.mode == "compact":
            return (val, False)
        if self.mode == "defer":
            return (val, True)
        pfx, _, local = val.partition(":")
        base = self.prefixes.get(pfx)
        return (base + local, False) if base is not None else (val, False)

    def _resolve_iri(self, raw: str) -> str:
        if self.base and not _SCHEME_RE.match(raw):
            from urllib.parse import urljoin

            return urljoin(self.base, raw)
        return raw

    def _iri_term(self, val: str):
        return (self._resolve_iri(val[1:-1]), False)

    def _new_bnode(self):
        self.n_bnodes += 1
        return (f"_:{self.bnode_ns}{self.n_bnodes}", False)

    def emit(self, s, p, o, dt=None, lang=None):
        mask = (
            (1 if s[1] else 0)
            | (2 if p[1] else 0)
            | (4 if o[1] else 0)
            | (8 if dt is not None and dt[1] else 0)
        )
        self.rows.append((s[0], p[0], o[0], dt[0] if dt else None, lang, mask))

    # ---- grammar
    def _literal_any(self, kind):
        """literal/number/boolean -> (text, dt_term, lang)."""
        _, val, start = self._next()
        if kind == "number":
            local = (
                "integer" if re.fullmatch(r"[+-]?\d+", val)
                else ("double" if "e" in val.lower() else "decimal")
            )
            return val, self._xsd(local), None
        if kind == "boolean":
            return val, self._xsd("boolean"), None
        body = val[3:-3] if val[:3] in ('"""', "'''") else val[1:-1]
        text = _unescape(body)
        k2, v2, _ = self._peek()
        if k2 == "dt":
            self._next()
            k3, v3, s3 = self._next()
            if k3 == "iri":
                return text, self._iri_term(v3), None
            if k3 == "pname":
                return text, self._pname_term(v3), None
            self._err(f"expected datatype IRI after '^^', got {v3!r}", s3)
        if k2 == "lang":
            self._next()
            return text, (_PLAIN, False), v2[1:]
        return text, (_PLAIN, False), None

    def _resource(self, role: str):
        kind, val, start = self._peek()
        if kind == "iri":
            self._next()
            return self._iri_term(val)
        if kind == "pname":
            self._next()
            return self._pname_term(val)
        if kind == "a" and role == "verb":
            self._next()
            # per the grammar 'a' ALWAYS denotes rdf-syntax-ns#type, even
            # if the corpus re-declares the 'rdf:' prefix
            return self._rdf("type")
        if role == "subject":
            if kind == "blank":
                self._next()
                return (val, False)
            if kind == "bracket" and val == "(":
                return self._collection()
        self._err(f"expected {role}, got {kind}={val!r}", start)

    def _object(self):
        """-> (o_term, dt_term_or_None, lang_or_None)."""
        kind, val, start = self._peek()
        if kind == "iri":
            self._next()
            return self._iri_term(val), None, None
        if kind == "pname":
            self._next()
            return self._pname_term(val), None, None
        if kind == "blank":
            self._next()
            return (val, False), None, None
        if kind == "bracket" and val == "[":
            return self._bnode_prop_list(), None, None
        if kind == "bracket" and val == "(":
            return self._collection(), None, None
        if kind in ("literal", "number", "boolean"):
            text, dt, lang = self._literal_any(kind)
            return (text, False), dt, lang
        self._err(f"expected object term, got {kind}={val!r}", start)

    def _expect_bracket(self, want: str):
        kind, val, start = self._next()
        if kind != "bracket" or val != want:
            self._err(f"expected {want!r}, got {kind}={val!r}", start)

    def _bnode_prop_list(self):
        if not self.allow_structs:
            self._err("'[' anonymous bnodes need the multiline (document) reader")
        self._expect_bracket("[")
        b = self._new_bnode()
        k, v, _ = self._peek()
        if not (k == "bracket" and v == "]"):
            self._predicate_object_list(b)
        self._expect_bracket("]")
        return b

    def _collection(self):
        if not self.allow_structs:
            self._err("'(' collections need the multiline (document) reader")
        self._expect_bracket("(")
        items = []
        while True:
            kind, val, start = self._peek()
            if kind is None:
                self._err("unterminated '(' collection", start)
            if kind == "bracket" and val == ")":
                self._next()
                break
            items.append(self._object())
        if not items:
            return self._rdf("nil")
        nodes = [self._new_bnode() for _ in items]
        for i, ((o, dt, lang), node) in enumerate(zip(items, nodes)):
            self.emit(node, self._rdf("first"), o, dt, lang)
            nxt = nodes[i + 1] if i + 1 < len(nodes) else self._rdf("nil")
            self.emit(node, self._rdf("rest"), nxt)
        return nodes[0]

    def _predicate_object_list(self, s):
        while True:
            p = self._resource("verb")
            while True:
                o, dt, lang = self._object()
                self.emit(s, p, o, dt, lang)
                k, v, _ = self._peek()
                if k == "punct" and v == ",":
                    self._next()
                    continue
                break
            k, v, _ = self._peek()
            if k == "punct" and v == ";":
                while self._peek()[:2] == ("punct", ";"):  # ';' runs are legal
                    self._next()
                k2, _v2, _ = self._peek()
                if k2 in ("iri", "pname", "a"):
                    continue
            break

    def _statement(self):
        kind, val, start = self._peek()
        if kind == "bad":
            self._err(f"unexpected character {val!r}", start)
        if kind == "bracket" and val == "[":
            s = self._bnode_prop_list()
            k, v, _ = self._peek()
            if not (k == "punct" and v == "."):
                self._predicate_object_list(s)
        else:
            s = self._resource("subject")
            self._predicate_object_list(s)
        k, v, st = self._peek()
        if k == "punct" and v == ".":
            self._next()
        else:
            self._err(f"expected ';' ',' or '.', got {k}={v!r}", st)

    def _directive(self):
        kw, _, _ = self._next()
        if kw == "prefix_kw":
            k, v, st = self._next()
            if k != "pname" or not v.endswith(":") or v.count(":") != 1:
                self._err(f"expected 'p:' prefix label, got {v!r}", st)
            pfx = v[:-1]
            k2, v2, st2 = self._next()
            if k2 != "iri":
                self._err(f"expected IRI in prefix directive, got {v2!r}", st2)
            iri = self._resolve_iri(v2[1:-1])
            self.prefixes[pfx] = iri
        else:
            k, v, st = self._next()
            if k != "iri":
                self._err(f"expected IRI in base directive, got {v!r}", st)
            self.base = self._resolve_iri(v[1:-1])
        if self._peek()[:2] == ("punct", "."):
            self._next()

    def document(self):
        """Whole-document parse, fail-soft: a bad statement is recorded in
        ``self.errors`` (with its line), its partial rows rolled back, and
        parsing resyncs past the next '.' — one lost statement, not a lost
        100 TB ingest."""
        while self.pos < len(self.toks):
            kind, _val, start = self._peek()
            n_rows = len(self.rows)
            try:
                if kind in ("prefix_kw", "base_kw"):
                    self._directive()
                else:
                    self._statement()
            except _TurtleError as e:
                del self.rows[n_rows:]
                self.errors.append((self._line_of(start), str(e)))
                while self.pos < len(self.toks):  # resync past next '.'
                    k, v, _ = self._next()
                    if k == "punct" and v == ".":
                        break

    def statement_line(self):
        """Line mode: exactly one statement, full token consumption."""
        if not self.toks:
            return
        self._statement()
        if self.pos != len(self.toks):
            self._err(
                f"trailing tokens after '.': {[t[1] for t in self.toks[self.pos:]]!r} "
                "(one statement per line)"
            )


def _parse_turtle_line(line: str, prefixes: dict[str, str], expand: bool):
    """One Turtle statement line -> list of (s, p, o, o_datatype, o_lang).

    Raises ValueError on anything outside the line subset (the caller
    decides whether to fail or route to the error scan)."""
    toks = _tokenize(line)
    if not toks:
        return []
    p = _TurtleParser(
        toks,
        prefixes=prefixes,
        mode="expand" if expand else "compact",
        allow_structs=False,
        text=line,
    )
    p.statement_line()
    return [r[:5] for r in p.rows]


def turtle_prefixes(spark: SparkSession, path: str) -> dict[str, str]:
    """Collect the prefix table driver-side (diagnostics / line-mode error
    scan): prefix directives are a config-sized handful per corpus."""
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


_TRIPLE_SCHEMA = "s string, p string, o string, o_datatype string, o_lang string"
_TRIPLE_COLS = ["s", "p", "o", "o_datatype", "o_lang"]


def _expand_col(name: str, bit: int, prefixes: dict[str, str]):
    """Catalyst-side pname expansion for the deferred line reader: value is
    expanded iff its pn_mask bit is set and its prefix is declared (prefix
    labels contain no ':', so `startswith(pfx + ':')` is unambiguous and
    order-free). Undeclared prefixes stay compact — parser parity."""
    col = F.col(name)
    marked = F.col("pn_mask").bitwiseAND(F.lit(bit)) != 0
    expr = col
    for pfx, iri in prefixes.items():
        expr = F.when(
            marked & col.startswith(pfx + ":"),
            F.concat(F.lit(iri), F.substring(col, len(pfx) + 2, 2147483647)),
        ).otherwise(expr)
    return expr.alias(name)


def _read_turtle_lines(spark: SparkSession, path: str, expand_prefixes: bool) -> DataFrame:
    """Statement-per-line Turtle — the SPLITTABLE scale path (a 100 TB
    single-file dump parallelizes by line ranges). SINGLE text scan:
    workers parse with compact pnames + pn_mask markers and emit prefix
    directives as tagged rows in the same pass; expansion happens
    Catalyst-side from the collected (tiny) prefix table. In expand mode
    the parsed columnar output is localCheckpoint'ed once — the price of
    the single scan is one materialization of the PARSED triples (much
    smaller than the raw text), not a second pass over the corpus."""
    import pandas as pd

    lines = spark.read.text(path)
    mode = "defer" if expand_prefixes else "compact"

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["kind", *_TRIPLE_COLS, "pn_mask"]
        for pdf in batches:
            rows: list[tuple] = []
            for line in pdf["value"]:
                if not line:
                    continue
                m = _PREFIX_RE.match(line)
                if m:
                    rows.append(("p", m.group(1) or "", None, m.group(2), None, None, 0))
                    continue
                if _BASE_RE.match(line):
                    continue
                toks = _tokenize(line)
                if not toks:
                    continue
                parser = _TurtleParser(toks, mode=mode, allow_structs=False, text=line)
                try:
                    parser.statement_line()
                except ValueError:
                    continue  # surfaced by scan_turtle_errors
                rows.extend(("t", *r) for r in parser.rows)
            yield pd.DataFrame(rows, columns=cols)

    parsed = lines.mapInPandas(parse, schema=f"kind string, {_TRIPLE_SCHEMA}, pn_mask int")
    if not expand_prefixes:
        return parsed.filter(F.col("kind") == "t").select(*_TRIPLE_COLS)
    parsed = parsed.localCheckpoint(eager=True)
    prefixes = {
        r["s"]: r["o"]
        for r in parsed.filter(F.col("kind") == "p").select("s", "o").collect()
    }
    return parsed.filter(F.col("kind") == "t").select(
        _expand_col("s", 1, prefixes),
        _expand_col("p", 2, prefixes),
        _expand_col("o", 4, prefixes),
        _expand_col("o_datatype", 8, prefixes),
        F.col("o_lang"),
    )


def _read_turtle_documents(spark: SparkSession, path: str, expand_prefixes: bool) -> DataFrame:
    """Full Turtle — one whole file per task (``wholetext``), the same
    non-splittable trade Spark itself makes for multiLine JSON/CSV;
    parallelism comes from the file count (CC-style corpora are many
    files). Single pass: prefixes are document-scoped state inside the
    parser — no driver collect, no second scan. Synthesized bnode labels
    are namespaced by a hash of the file path so labels never collide
    across files in one read."""
    import hashlib

    import pandas as pd

    files = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )
    mode = "expand" if expand_prefixes else "compact"

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for file, text in zip(pdf["file"], pdf["value"]):
                seed = hashlib.md5(str(file).encode()).hexdigest()[:8]
                parser = _TurtleParser(
                    _tokenize(text), mode=mode, bnode_ns=f"g{seed}x", text=text
                )
                parser.document()  # fail-soft; errors via scan_turtle_errors
                rows.extend(r[:5] for r in parser.rows)
            yield pd.DataFrame(rows, columns=_TRIPLE_COLS)

    return files.mapInPandas(parse, schema=_TRIPLE_SCHEMA)


def read_turtle(
    spark: SparkSession,
    path: str,
    expand_prefixes: bool = True,
    multiline: bool = True,
) -> DataFrame:
    """Turtle file(s) -> TRIPLES_RAW(s, p, o, o_datatype, o_lang).

    ``multiline=True`` (default): FULL Turtle via the document parser —
    multiline statements, ``[]`` anonymous bnodes, ``( ... )`` collections
    (emitted as rdf:first/rest/nil spines for the rdfq list expansion,
    operators/rdfq.py:38), long strings, @base. rdflib front-door parity
    (GraphParser, src/utils.py:48-75). One task per file.

    ``multiline=False``: the statement-per-line subset — line-SPLITTABLE
    (the 100 TB single-file path) and single-scan via deferred pname
    expansion. Unparseable lines are skipped here and surfaced by
    :func:`scan_turtle_errors` (fail-soft, same posture as read_ntriples).

    ``expand_prefixes``: True resolves prefixed names to full IRIs
    (rdflib parity); False keeps the compact ``p:local`` form the engine's
    configs use. Plain literals carry the 'xsd:string' sentinel datatype
    either way (read_ntriples parity)."""
    if multiline:
        return _read_turtle_documents(spark, path, expand_prefixes)
    return _read_turtle_lines(spark, path, expand_prefixes)


def scan_turtle_errors(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """What the Turtle reader could not parse — report, don't crash the
    100 TB ingest. Document mode: one row per failed statement
    ('file:line', error); line mode: one row per rejected line."""
    import pandas as pd

    if multiline:
        files = spark.read.text(path, wholetext=True).select(
            F.input_file_name().alias("file"), "value"
        )

        def check_docs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                bad: list[tuple[str, str]] = []
                for file, text in zip(pdf["file"], pdf["value"]):
                    parser = _TurtleParser(_tokenize(text), mode="expand", text=text)
                    parser.document()
                    bad.extend((f"{file}:{ln}", msg) for ln, msg in parser.errors)
                yield pd.DataFrame(bad, columns=["value", "error"])

        return files.mapInPandas(check_docs, schema="value string, error string")

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
    explicit ``fmt`` ('ntriples'|'turtle'|'turtle-lines'|'parquet') or
    file extension (.nt/.ttl), defaulting to a parquet triples table.
    'turtle-lines' selects the line-splittable statement-per-line subset
    (the huge-single-file scale path)."""
    fmt = fmt or (
        "ntriples" if path.endswith(".nt")
        else "turtle" if path.endswith(".ttl")
        else "parquet"
    )
    if fmt == "ntriples":
        return read_ntriples(spark, path)
    if fmt == "turtle":
        return read_turtle(spark, path)
    if fmt == "turtle-lines":
        return read_turtle(spark, path, multiline=False)
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


#: a local part the tokenizer accepts UNescaped (ASCII-conservative: Java
#: regex \w is ASCII; unicode locals simply stay <bracketed>, still valid)
_PN_LOCAL_OK = r"^([\w%/#-]+(\.[\w%/#-]+)*)?$"


def _render_resource(col: Column, prefixes: dict[str, str] | None) -> Column:
    """Resource term rendering: blank nodes bare, prefixed names compacted
    by longest-IRI match when a prefix table is given, else <bracketed>.
    Prefix labels contain no ':', so compaction is collision-free; longer
    IRIs are applied LAST in the when-chain so they win. Compaction is
    GATED on the remaining local part being valid PN_LOCAL for our own
    tokenizer (review r3: 'e:page?id=1' was emitted for http://e/page?id=1
    — a statement no Turtle parser, ours included, can read back); IRIs
    whose suffix doesn't qualify stay <bracketed>, which is always valid."""
    expr = F.concat(F.lit("<"), col, F.lit(">"))
    if prefixes:
        for pfx, iri in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
            local = F.substring(col, len(iri) + 1, 2147483647)
            expr = F.when(
                col.startswith(iri) & local.rlike(_PN_LOCAL_OK),
                F.concat(F.lit(pfx + ":"), local),
            ).otherwise(expr)
    return F.when(col.startswith("_:"), col).otherwise(expr)


def _render_object(prefixes: dict[str, str] | None) -> Column:
    """Object rendering: resources via :func:`_render_resource`; literals
    quoted with the N-Triples escape set (\\\\ \\\" \\n \\r \\t), '@lang'
    when present, '^^<dt>' for non-plain datatypes (the 'xsd:string'
    sentinel and its expanded spelling render as plain literals)."""
    from ..operators.emit import escape_literal

    esc = escape_literal(F.col("o"))

    dt = F.col("o_datatype")
    plain = dt.isNull() | (dt == F.lit(_PLAIN)) | (dt == F.lit(XSD_NS + "string"))
    lit = F.concat(
        F.lit('"'), esc, F.lit('"'),
        F.when(
            F.col("o_lang").isNotNull(), F.concat(F.lit("@"), F.col("o_lang"))
        ).when(
            ~plain, F.concat(F.lit("^^"), _render_resource(dt, prefixes))
        ).otherwise(F.lit("")),
    )
    return F.when(dt.isNull(), _render_resource(F.col("o"), prefixes)).otherwise(lit)


def triples_to_turtle(triples: DataFrame, prefixes: dict[str, str] | None = None) -> DataFrame:
    """TRIPLES(s, p, o, o_datatype, o_lang) -> one Turtle statement line per
    subject: predicates joined with ' ;', objects with ', ', 'a' for
    rdf:type — the compact rdflib-serialization shape (the reference
    serializes its graphs as Turtle via rdflib, src/utils.py GraphParser
    family). All grouping/rendering is JVM column expressions: two
    map-side-combinable aggregations (objects per (s,p), then predicate
    groups per s), deterministic order via sort_array — the same output at
    any parallelism. Prefix COMPACTION happens here; the @prefix header is
    prepended per output file by :func:`write_turtle`."""
    if "subj" in triples.columns:  # KG emission schema -> TRIPLES_RAW names
        triples = triples.withColumnsRenamed(
            {"subj": "s", "pred": "p", "obj": "o", "obj_datatype": "o_datatype"}
        )
    if "o_lang" not in triples.columns:
        triples = triples.withColumn("o_lang", F.lit(None).cast("string"))
    rdf_type = F.col("p").isin("rdf:type", RDF_NS + "type")
    rendered = triples.select(
        _render_resource(F.col("s"), prefixes).alias("s_txt"),
        F.when(rdf_type, F.lit("a")).otherwise(
            _render_resource(F.col("p"), prefixes)
        ).alias("p_txt"),
        _render_object(prefixes).alias("o_txt"),
    )
    by_pred = rendered.groupBy("s_txt", "p_txt").agg(
        F.array_join(F.sort_array(F.collect_set("o_txt")), ", ").alias("objs")
    )
    by_subj = by_pred.groupBy("s_txt").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("p_txt", "objs"))),
                lambda g: F.concat(g["p_txt"], F.lit(" "), g["objs"]),
            ),
            " ;\n    ",
        ).alias("body")
    )
    return by_subj.select(
        F.concat(F.col("s_txt"), F.lit(" "), F.col("body"), F.lit(" .")).alias("value")
    )


def write_turtle(
    triples: DataFrame,
    path: str,
    prefixes: dict[str, str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Turtle sink. Without ``prefixes`` the statements carry full
    <bracketed> IRIs and the write is pure ``df.write.text`` (no Python).
    With ``prefixes`` every output part-file gets its own ``@prefix``
    header (each file must be self-contained Turtle), prepended by a thin
    ``mapInPandas`` pass over the already-rendered statement lines."""
    lines = triples_to_turtle(triples, prefixes)
    if not prefixes:
        lines.write.mode(mode).text(path)
        return
    import pandas as pd

    header = [f"@prefix {p}: <{iri}> ." for p, iri in sorted(prefixes.items())]

    def add_header(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = True
        for pdf in batches:
            if first and len(pdf):
                yield pd.DataFrame({"value": header})
                first = False
            yield pdf

    lines.mapInPandas(add_header, schema="value string").write.mode(mode).text(path)


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """TRIPLES -> N-Triples text files (the rdflib serialization analog).
    Uses operators/emit.triples_to_ntriples for escaping."""
    from ..operators.emit import triples_to_ntriples

    triples_to_ntriples(triples).write.mode(mode).text(path)
