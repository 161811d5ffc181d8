"""Typed-literal dispatch and date formatting goldens
(src/utils.py:184-195, src/data_loader.py:149-157,382-388)."""

import datetime

from pyspark.sql import functions as F

from rdf_i2b2_converter_spark.functions.values import (
    dispatch_value,
    format_date_generalized,
    format_datetime,
)


def test_format_date_generalized_golden(spark):
    df = spark.createDataFrame([(datetime.datetime(2023, 7, 15, 13, 45, 9),)], "ts timestamp")
    row = df.select(
        format_date_generalized("ts").alias("g"), format_datetime("ts").alias("f")
    ).collect()[0]
    assert row["g"] == "2023-01-01 00:00:00"  # year-generalized (privacy)
    assert row["f"] == "2023-07-15 13:45:09"


def test_dispatch_value(spark):
    rows = [
        (1, "xsd:integer", "42"),
        (2, "xsd:double", "3.5"),
        (3, "xsd:string", "hello"),
        (4, "xsd:gYear", "2020-05-01 00:00:00"),
        (5, "xsd:unknown", "zzz"),
    ]
    df = spark.createDataFrame(rows, "id int, dt string, val string")
    out = {r["id"]: r for r in dispatch_value(df, "dt", "val").collect()}
    assert out[1]["nval_num"] == 42.0 and out[1]["valtype_cd"] == "N" and out[1]["tval_char"] == "E"
    assert out[2]["nval_num"] == 3.5
    assert out[3]["tval_char"] == "hello" and out[3]["valtype_cd"] == "T" and out[3]["nval_num"] is None
    assert out[4]["nval_num"] == 2020.0  # the ["year"] transform (H6)
    assert out[5]["valtype_cd"] == "ERR"  # fail-soft, not raise
