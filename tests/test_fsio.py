"""Hadoop-FS small-file I/O (ADVICE r4: sidecars/ledger must live on the
same filesystem as the data, not the driver's local disk)."""

import json


def test_fsio_roundtrip(spark, tmp_path):
    from rdf_i2b2_converter_spark.fsio import (
        exists,
        makedirs,
        read_text_file,
        write_text_file,
    )

    p = str(tmp_path / "sub" / "meta.json")
    assert not exists(spark, p)
    makedirs(spark, str(tmp_path / "sub"))
    payload = json.dumps({"dim": 8, "centroids": [[0.5, -1.25]], "unicode": "héllo"})
    write_text_file(spark, p, payload)
    assert exists(spark, p)
    assert json.loads(read_text_file(spark, p)) == json.loads(payload)
    # overwrite semantics
    write_text_file(spark, p, '{"v": 2}')
    assert json.loads(read_text_file(spark, p)) == {"v": 2}


def test_ivf_sidecar_uses_hadoop_fs_scheme(spark, tmp_path):
    """The index path and its sidecar must resolve through the SAME
    filesystem — exercised here with an explicit file: URI (the scheme
    shape that broke local open())."""
    from rdf_i2b2_converter_spark.operators.similarity import (
        ivf_assign,
        ivf_train,
        ivf_write_index,
        query_ivf_index,
    )

    rows = [(i, [float(i % 4), float((i * 7) % 5), 1.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_train(df, dim=3, n_centroids=2, n_iters=2)
    path = "file://" + str(tmp_path / "ivf_idx")
    ivf_write_index(ivf_assign(df, cents), path, cents, dim=3)
    got = query_ivf_index(
        spark, path, [1.0, 0.0, 1.0], k=3, n_probes=2
    ).collect()
    assert len(got) == 3
