"""The spark-submit CLI surface: synth -> pipeline -> ontology."""

import json

from rdf_i2b2_converter_spark.cli import main


def test_cli_synth_pipeline_ontology(spark, tmp_path, capsys):
    data = str(tmp_path / "data")
    assert main(["synth", "--n-docs", "80", "--partitions", "4", "--out", data]) == 0
    assert (
        main(
            [
                "pipeline",
                "--pages", f"{data}/pages",
                "--gazetteer", f"{data}/gazetteer",
                "--ontology", f"{data}/ontology",
                "--alias-edges", f"{data}/alias_edges",
                "--out", str(tmp_path / "triples"),
                "--parts", "4",
            ]
        )
        == 0
    )
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["n_triples"] > 0 and metrics["n_integrity_violations"] == 0

    assert main(["ontology", "--ontology", f"{data}/ontology", "--out", str(tmp_path / "star")]) == 0
    assert spark.read.parquet(str(tmp_path / "star/metadata")).count() > 0


def test_cli_data_from_turtle(spark, tmp_path, capsys):
    """The reference's own front door: point `data` at a .ttl file
    (guess_format analog) and get observation facts out."""
    ttl = tmp_path / "inst.ttl"
    ttl.write_text(
        "@prefix kg: <kg:> .\n"
        "kg:i1 a kg:Event .\n"
        'kg:i1 kg:hasSubject kg:s1 ; kg:hasScore "7.5"^^xsd:double .\n'
        "kg:s1 a kg:SubjectPseudoIdentifier .\n"
        'kg:s1 kg:hasIdentifier "u1" .\n'
    )
    out = str(tmp_path / "facts")
    assert (
        main(
            [
                "data",
                "--triples", str(ttl),
                "--entry-class", "kg:Event",
                "--out", out,
                "--no-reindex",
            ]
        )
        == 0
    )
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["n_observations"] == 2  # '@' concept row + hasScore value row


def test_cli_export_roundtrip(spark, tmp_path, capsys):
    """export: .nt -> compact .ttl -> read back equals the original."""
    from rdf_i2b2_converter_spark.cli import main
    from rdf_i2b2_converter_spark.sources.rdf import read_ntriples, read_turtle

    nt = tmp_path / "g.nt"
    nt.write_text(
        "<http://e/a> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .\n"
        '<http://e/a> <http://e/name> "Ada" .\n'
    )
    out = str(tmp_path / "g_ttl")
    assert main([
        "export", "--triples", str(nt), "--to", "turtle",
        "--prefix", "e=http://e/", "--out", out,
    ]) == 0
    back = {tuple(r) for r in read_turtle(spark, out).collect()}
    orig = {tuple(r) for r in read_ntriples(spark, str(nt)).collect()}
    assert back == orig


def test_cli_pipeline_pages_from_catalog_table(spark, tmp_path, capsys):
    """--pages-format table reads a catalog identifier (the north-star
    Iceberg-table input shape; plain saveAsTable here since this image has
    no Iceberg jar — same spark.table() code path)."""
    from rdf_i2b2_converter_spark.cli import main
    from rdf_i2b2_converter_spark.sources import synthetic as syn

    spark.sql("DROP TABLE IF EXISTS pages_tbl")
    syn.gen_pages(spark, 60, num_partitions=2).write.mode("overwrite").saveAsTable("pages_tbl")
    gaz = str(tmp_path / "gaz")
    syn.gen_gazetteer(spark).write.mode("overwrite").parquet(gaz)
    out = str(tmp_path / "trip")
    rc = main([
        "pipeline", "--pages", "pages_tbl", "--pages-format", "table",
        "--gazetteer", gaz, "--out", out, "--parts", "4",
    ])
    assert rc == 0
    assert spark.read.parquet(f"{out}/triples").count() > 0
    spark.sql("DROP TABLE IF EXISTS pages_tbl")
