"""Typed-literal value dispatch and date formatting.

Re-realizes the reference's xsd-datatype -> value-column dispatch
(src/data_loader.py:142-170 with COLUMNS_MAPPING["VALUE"],
local_config_template/data_config_spo.json:35-73) and its two date
renderers (src/utils.py:184-195 format_date; src/data_loader.py:382-388)
as pure Column expressions compiled from config.VALUE_DISPATCH.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import VALUE_DISPATCH


def format_date_generalized(ts: Column | str) -> Column:
    """xsd date -> 'YYYY-01-01 00:00:00' (year-generalized for privacy) —
    exact output contract of src/utils.py:184-195."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(F.date_trunc("year", c), "yyyy-MM-dd HH:mm:ss")


def format_datetime(ts: Column | str) -> Column:
    """'{:%Y-%m-%d %H:%M:%S}' renderer (src/data_loader.py:382-388)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


def year_of(ts: Column | str) -> Column:
    """The config-reflective transform ["year"] on xsd:gYear values
    (extract_value, src/data_loader.py:16-25) — compiled, not reflected."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.year(c)


def dispatch_value(df: DataFrame, datatype_col: str, value_col: str) -> DataFrame:
    """Split a string-carried typed literal into (nval_num, tval_char,
    valtype_cd) per VALUE_DISPATCH — a compiled when()-chain instead of the
    reference's per-row dict lookup (src/data_loader.py:149-157).

    Unknown datatypes raise in the reference (data_loader.py:153); here they
    surface as valtype_cd = 'ERR' rows for an integrity filter to catch —
    fail-soft is the right behavior when one bad row sits in 100 TB.
    """
    dt = F.col(datatype_col)
    val = F.col(value_col)

    nval = F.lit(None).cast("double")
    tval = F.lit(None).cast("string")
    valtype = F.lit("ERR")
    for xsd, spec in VALUE_DISPATCH.items():
        this_num = spec["col"] == "nval_num"
        if spec.get("transform") == "year":
            num_expr = F.year(F.to_timestamp(val)).cast("double")
        else:
            num_expr = val.cast("double")
        nval = F.when(dt == xsd, num_expr if this_num else F.lit(None).cast("double")).otherwise(nval)
        tval = F.when(
            dt == xsd,
            F.lit(spec["tval"]).cast("string") if this_num else val,
        ).otherwise(tval)
        valtype = F.when(dt == xsd, F.lit(spec["valtype"])).otherwise(valtype)

    return (
        df.withColumn("nval_num", nval)
        .withColumn("tval_char", tval)
        .withColumn("valtype_cd", valtype)
    )
