"""JSON-LD source (third guess_format front door, src/utils.py:58-63)."""

from rdf_i2b2_converter_spark.sources.jsonld import (
    read_jsonld,
    read_jsonld_lines,
    scan_jsonld_errors,
)
from rdf_i2b2_converter_spark.sources.rdf import read_rdf

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"

DOC = """{
  "@context": [
    {"ex": "http://ex.org/",
     "name": "http://ex.org/name",
     "knows": {"@id": "http://ex.org/knows", "@type": "@id"},
     "born": {"@id": "http://ex.org/born", "@type": "http://www.w3.org/2001/XMLSchema#date"},
     "@vocab": "http://voc.org/",
     "@base": "http://base.org/"}
  ],
  "@graph": [
    {"@id": "ex:a", "@type": "ex:Person",
     "name": "Ada",
     "label": {"@value": "bonjour", "@language": "fr"},
     "score": 7.5,
     "count": 42,
     "flag": true,
     "born": "1815-12-10",
     "knows": "rel-b",
     "friend": {"@id": "ex:c"},
     "pet": {"@type": "ex:Cat", "name": "Mog"},
     "nums": {"@list": [1, 2]}},
    {"@id": "_:x", "name": "anon"}
  ]
}
"""


def test_read_jsonld_document(spark, tmp_path):
    f = tmp_path / "g.jsonld"
    f.write_text(DOC)
    df = read_jsonld(spark, str(f))
    rows = {(r["s"], r["p"], r["o"], r["o_datatype"], r["o_lang"]) for r in df.collect()}
    EX, V = "http://ex.org/", "http://voc.org/"
    assert (f"{EX}a", f"{RDF_NS}type", f"{EX}Person", None, None) in rows
    assert (f"{EX}a", f"{EX}name", "Ada", "xsd:string", None) in rows
    assert (f"{EX}a", f"{V}label", "bonjour", "xsd:string", "fr") in rows
    assert (f"{EX}a", f"{V}score", "7.5", f"{XSD}double", None) in rows
    assert (f"{EX}a", f"{V}count", "42", f"{XSD}integer", None) in rows
    assert (f"{EX}a", f"{V}flag", "true", f"{XSD}boolean", None) in rows
    # @type coercion from the term definition
    assert (f"{EX}a", f"{EX}born", "1815-12-10", f"{XSD}date", None) in rows
    # "@type": "@id" coercion: string value resolved against @base
    assert (f"{EX}a", f"{EX}knows", "http://base.org/rel-b", None, None) in rows
    assert (f"{EX}a", f"{V}friend", f"{EX}c", None, None) in rows
    # embedded anonymous node
    pet = next(o for (s, p, o, dt, lg) in rows if p == f"{V}pet")
    assert pet.startswith("_:")
    assert (pet, f"{RDF_NS}type", f"{EX}Cat", None, None) in rows
    assert (pet, f"{EX}name", "Mog", "xsd:string", None) in rows
    # @list spine
    head = next(o for (s, p, o, dt, lg) in rows if p == f"{V}nums")
    firsts = {(o, dt) for (s, p, o, dt, lg) in rows if p == f"{RDF_NS}first"}
    assert head.startswith("_:")
    assert firsts == {("1", f"{XSD}integer"), ("2", f"{XSD}integer")}
    # explicit _:x label remapped into the per-file namespace
    anon = next(s for (s, p, o, dt, lg) in rows if o == "anon")
    assert anon.startswith("_:g") and anon.endswith("_x")
    assert scan_jsonld_errors(spark, str(f)).count() == 0
    # read_rdf dispatch by extension
    assert read_rdf(spark, str(f)).count() == df.count()


def test_read_jsonld_lines_with_shared_context(spark, tmp_path):
    f = tmp_path / "g.ndjson"
    f.write_text(
        '{"@id": "ex:1", "name": "one"}\n'
        "not json at all\n"
        '{"@id": "ex:2", "name": "two", "@context": {"name": "http://o.org/name"}}\n'
    )
    ctx = {"ex": "http://ex.org/", "name": "http://ex.org/name"}
    rows = {(r["s"], r["p"], r["o"]) for r in read_jsonld_lines(spark, str(f), ctx).collect()}
    assert rows == {
        ("http://ex.org/1", "http://ex.org/name", "one"),
        # per-line context overrides the shared one
        ("http://ex.org/2", "http://o.org/name", "two"),
    }


def test_jsonld_errors_surface(spark, tmp_path):
    f = tmp_path / "bad.jsonld"
    f.write_text('{"@context": "https://remote.example/ctx", "@id": "http://e/a", "undefinedterm": 1}')
    errs = {r["error"] for r in scan_jsonld_errors(spark, str(f)).collect()}
    assert any("remote @context" in e for e in errs)
    assert any("no @vocab" in e for e in errs)


def test_write_jsonld_roundtrip(spark, tmp_path):
    """write_jsonld -> read_jsonld_lines round-trips resources, typed/lang/
    plain literals, rdf:type -> @type, and bnode links (modulo per-file
    label remap)."""
    from rdf_i2b2_converter_spark.sources.jsonld import write_jsonld

    EX = "http://e/"
    rows = [
        (f"{EX}a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", f"{EX}T", None, None),
        (f"{EX}a", f"{EX}knows", f"{EX}b", None, None),
        (f"{EX}a", f"{EX}knows", "_:u1", None, None),
        (f"{EX}a", f"{EX}name", "Ada", "xsd:string", None),
        (f"{EX}a", f"{EX}label", "bonjour", "xsd:string", "fr"),
        (f"{EX}a", f"{EX}age", "36", "http://www.w3.org/2001/XMLSchema#integer", None),
        ("_:u1", f"{EX}code", "mg", "xsd:string", None),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, o_datatype string, o_lang string")
    out = str(tmp_path / "jsonld_out")
    write_jsonld(df, out)
    back = read_jsonld_lines(spark, out)
    got = {tuple(r) for r in back.collect()}

    def norm(rs):
        m = {}
        def f(v):
            if isinstance(v, str) and v.startswith("_:"):
                return m.setdefault(v, f"_:B{len(m)}")
            return v
        key = lambda r: tuple("" if v is None else str(v) for v in r)  # noqa: E731
        return {tuple(f(v) for v in r) for r in sorted(rs, key=key)}

    assert norm(got) == norm(rows)


def test_write_jsonld_is_valid_ndjson(spark, tmp_path):
    import glob
    import json as _json

    from rdf_i2b2_converter_spark.sources.jsonld import write_jsonld

    df = spark.createDataFrame(
        [("http://e/s", "http://e/p", "v", "xsd:string", None)],
        "s string, p string, o string, o_datatype string, o_lang string",
    )
    out = str(tmp_path / "nd_out")
    write_jsonld(df, out)
    lines = [
        ln
        for f in glob.glob(f"{out}/part-*")
        for ln in open(f).read().splitlines()
        if ln.strip()
    ]
    assert len(lines) == 1
    assert _json.loads(lines[0]) == {"@id": "http://e/s", "http://e/p": "v"}


def test_jsonld_lines_anonymous_bnodes_do_not_merge_across_lines(spark, tmp_path):
    """Review r4: anonymous embedded nodes on different NDJSON lines must
    get distinct labels; explicit _:labels still link across lines."""
    f = tmp_path / "nd.jsonld"
    f.write_text(
        '{"@id": "http://e/1", "http://e/pet": {"http://e/name": "Mog"}}\n'
        '{"@id": "http://e/2", "http://e/pet": {"http://e/name": "Rex"}}\n'
        '{"@id": "http://e/3", "http://e/unit": {"@id": "_:u"}}\n'
        '{"@id": "_:u", "http://e/code": "mg"}\n'
    )
    rows = {(r["s"], r["p"], r["o"]) for r in read_jsonld_lines(spark, str(f)).collect()}
    pets = {o for (s, p, o) in rows if p == "http://e/pet"}
    assert len(pets) == 2  # distinct anonymous nodes
    names = {(s, o) for (s, p, o) in rows if p == "http://e/name"}
    assert {n for _, n in names} == {"Mog", "Rex"}
    # each pet's name hangs off its own node
    by_node = {s: o for (s, o) in names}
    assert set(by_node) == pets
    # explicit label links across lines
    unit = next(o for (s, p, o) in rows if p == "http://e/unit")
    assert (unit, "http://e/code", "mg") in rows


def test_jsonld_string_term_definition_expands(spark, tmp_path):
    """Review r4: '"name": "ex:name"' context shapes must expand fully."""
    f = tmp_path / "td.jsonld"
    f.write_text(
        '{"@context": {"ex": "http://e/", "name": "ex:name", "loop": "loop"},'
        ' "@id": "ex:a", "name": "Ada"}'
    )
    rows = {(r["s"], r["p"], r["o"]) for r in read_jsonld(spark, str(f)).collect()}
    assert rows == {("http://e/a", "http://e/name", "Ada")}


def test_jsonld_lines_labels_partition_independent(spark, tmp_path):
    """Review r4: anonymous labels derive from line content, not row ids —
    the same file read at different parallelism yields identical rows."""
    f = tmp_path / "pi.jsonld"
    f.write_text(
        "".join(
            '{"@id": "http://e/%d", "http://e/pet": {"http://e/name": "n%d"}}\n' % (i, i)
            for i in range(40)
        )
    )
    one = {tuple(r) for r in read_jsonld_lines(spark, str(f)).collect()}
    # re-read with a tiny split size so the file fans out across many
    # partitions — labels must not change
    import rdf_i2b2_converter_spark.sources.jsonld as jmod

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "256")
        split = {tuple(r) for r in jmod.read_jsonld_lines(spark, str(f)).collect()}
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert split == one and len(one) == 80


def test_scan_jsonld_errors_lines_mode(spark, tmp_path):
    f = tmp_path / "err.ndjson"
    f.write_text(
        '{"@id": "http://e/1", "http://e/p": "ok"}\n'
        "totally not json\n"
        '{"@id": "http://e/2", "undefined": 1}\n'
    )
    errs = {r["error"] for r in scan_jsonld_errors(spark, str(f), lines=True).collect()}
    assert any("invalid JSON" in e for e in errs)
    assert any("no @vocab" in e for e in errs)


def test_jsonld_native_scalar_coercion(spark, tmp_path):
    """Review r4: @type coercion from the term definition applies to
    native JSON numbers/booleans, matching the explicit @value form."""
    f = tmp_path / "coerce.jsonld"
    f.write_text(
        '{"@context": {"ex": "http://e/",'
        ' "age": {"@id": "ex:age", "@type": "http://www.w3.org/2001/XMLSchema#decimal"}},'
        ' "@id": "ex:a", "age": 5}'
    )
    rows = {(r["p"], r["o"], r["o_datatype"]) for r in read_jsonld(spark, str(f)).collect()}
    assert rows == {("http://e/age", "5", "http://www.w3.org/2001/XMLSchema#decimal")}


def test_jsonld_keyword_type_mapping_not_a_datatype(spark, tmp_path):
    """Review r4 + ADVICE r4: '@type' KEYWORD mappings are never datatype
    coercions — '@none' keeps natural typing, '@vocab' (with a vocabulary
    in scope) expands string values to IRIs; neither ever stamps the
    keyword itself as a datatype."""
    f = tmp_path / "kw.jsonld"
    f.write_text(
        '{"@context": {"ex": "http://e/", "@vocab": "http://voc.org/",'
        ' "flag": {"@id": "ex:flag", "@type": "@none"},'
        ' "note": {"@id": "ex:note", "@type": "@vocab"}},'
        ' "@id": "ex:a", "flag": true, "note": "hello"}'
    )
    rows = {(r["p"], r["o"], r["o_datatype"]) for r in read_jsonld(spark, str(f)).collect()}
    XSD = "http://www.w3.org/2001/XMLSchema#"
    assert ("http://e/flag", "true", f"{XSD}boolean") in rows
    assert ("http://e/note", "http://voc.org/hello", None) in rows
    assert not any(dt and dt.startswith("@") for (_p, _o, dt) in rows)


def test_jsonld_vocab_coercion(spark, tmp_path):
    """ADVICE r4: {"@type": "@vocab"} coerces string values to
    vocab-expanded IRIs, not xsd:string literals; a context-defined term
    value resolves through its definition first (JSON-LD @vocab rules)."""
    f = tmp_path / "vocab.jsonld"
    f.write_text(
        '{"@context": {"@vocab": "http://voc.org/",'
        ' "role": {"@id": "http://ex.org/role", "@type": "@vocab"},'
        ' "boss": "http://ex.org/Boss"},'
        ' "@id": "http://ex.org/a", "role": ["admin", "boss"]}'
    )
    rows = {
        (r["p"], r["o"], r["o_datatype"]) for r in read_jsonld(spark, str(f)).collect()
    }
    assert ("http://ex.org/role", "http://voc.org/admin", None) in rows
    assert ("http://ex.org/role", "http://ex.org/Boss", None) in rows
    # native scalars under @vocab stay native literals (spec)
    g = tmp_path / "vocab2.jsonld"
    g.write_text(
        '{"@context": {"@vocab": "http://voc.org/",'
        ' "role": {"@id": "http://ex.org/role", "@type": "@vocab"}},'
        ' "@id": "http://ex.org/b", "role": 5}'
    )
    rows2 = {
        (r["p"], r["o"], r["o_datatype"]) for r in read_jsonld(spark, str(g)).collect()
    }
    assert ("http://ex.org/role", "5", XSD + "integer") in rows2


def test_jsonld_vocab_coercion_without_vocab_surfaces_error(spark, tmp_path):
    """A @vocab-coerced term with NO @vocab in scope cannot expand — the
    dropped value must land in the error scan, not silently vanish."""
    f = tmp_path / "novocab.jsonld"
    f.write_text(
        '{"@context": {"role": {"@id": "http://ex.org/role", "@type": "@vocab"}},'
        ' "@id": "http://ex.org/a", "role": "admin"}'
    )
    assert read_jsonld(spark, str(f)).filter("p = 'http://ex.org/role'").count() == 0
    errs = scan_jsonld_errors(spark, str(f)).collect()
    assert any("no @vocab" in r["error"] for r in errs)


def test_read_jsonld_warns_on_giant_document(spark, tmp_path, monkeypatch):
    """VERDICT r4 #2: document mode has no JSON chunker, so above the
    wholetext bound it must WARN and point at read_jsonld_lines."""
    import warnings as w

    import rdf_i2b2_converter_spark.sources.rdf as rdfmod

    f = tmp_path / "big.jsonld"
    f.write_text(
        '[{"@id": "http://e/a", "http://e/p": "' + "x" * 500 + '"}]'
    )
    monkeypatch.setattr(rdfmod, "_TTL_DOC_WARN_BYTES", 100)
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        df = read_jsonld(spark, str(f))
        assert any("read_jsonld_lines" in str(c.message) for c in caught)
    assert df.count() == 1
    monkeypatch.setattr(rdfmod, "_TTL_DOC_WARN_BYTES", 10**9)
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        read_jsonld(spark, str(f)).count()
        assert not any("read_jsonld_lines" in str(c.message) for c in caught)


def test_read_rdf_dispatches_ndjson_extensions(spark, tmp_path):
    """guess_format front door: .jsonl/.ndjson route to the line-splittable
    NDJSON-LD reader (r5)."""
    for ext in ("jsonl", "ndjson"):
        f = tmp_path / f"g.{ext}"
        f.write_text('{"@id": "http://e/a", "http://e/p": "v"}\n')
        rows = {(r["s"], r["p"], r["o"]) for r in read_rdf(spark, str(f)).collect()}
        assert rows == {("http://e/a", "http://e/p", "v")}
