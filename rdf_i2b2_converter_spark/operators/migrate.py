"""Update / merge / migration operators (SURVEY.md §2 I).

The reference mutates its CSV tables in post-passes: keyed in-place update
(merge_datafields.py:65-67, I1), metadata-XML migration between path-
resolved rows (merge_metavaluefields.py:51-114, I2), unit insertion
(fill_metadata_units.py:6-29, I3), per-group value relocation
(merge_datafields.py:9-68, I4). DataFrames are immutable, so each becomes
a join + conditional projection — which is also what an Iceberg MERGE INTO
compiles to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyed_update(target: DataFrame, updates: DataFrame, keys: list[str], cols: list[str]) -> DataFrame:
    """I1 — df.update analog: overwrite ``cols`` on key-matching rows, keep
    everything else. updates must be unique per key (enforced upstream)."""
    upd = updates.select(*keys, *[F.col(c).alias(f"__u_{c}") for c in cols])
    out = target.join(F.broadcast(upd), keys, "left")
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__u_{c}"), F.col(c))).drop(f"__u_{c}")
    return out


def migrate_field(
    df: DataFrame,
    moves: list[tuple[str, str]],
    path_col: str,
    value_col: str,
    drop_sources: bool = True,
) -> DataFrame:
    """I2 — move ``value_col`` from source rows to destination rows, where
    destinations are exact paths or '*'-suffixed prefixes (wildcard filter
    B8, merge_metavaluefields.py:18-48). Sources are dropped afterwards
    (the reference logs and deletes them, lines 96-110).

    moves: [(source_path, dest_path_or_wildcard), ...] — a small config
    list, turned into a broadcastable values DataFrame.
    """
    spark = df.sparkSession
    moves_df = F.broadcast(
        spark.createDataFrame(moves, "src_path string, dst_path string")
    )
    src_vals = (
        df.join(moves_df, F.col(path_col) == F.col("src_path"))
        .select("dst_path", F.col(value_col).alias("__moved"))
        .filter(F.col("__moved").isNotNull())
    )
    # Resolve ONE winning value per destination PATH VALUE, not per
    # destination pattern: overlapping wildcard patterns ('\\A\\*' and
    # '\\A\\B\\*' both matching '\\A\\B\\C\\') or two moves to the same
    # dst_path would otherwise fan out the left join and duplicate
    # destination rows — the reference moves exactly one value per
    # destination row. The pattern-match join runs against the DISTINCT
    # path values (dimension-sized), then min_by picks deterministically
    # and the fact-side join is a plain fan-out-free equi-join.
    is_wild = F.col("dst_path").endswith("*")
    prefix = F.expr("substring(dst_path, 1, length(dst_path) - 1)")
    dst_vals = (
        df.select(F.col(path_col)).distinct()
        .join(
            F.broadcast(src_vals),
            F.when(
                is_wild,
                F.col(path_col).startswith(prefix) & (F.col(path_col) != prefix),
            ).otherwise(F.col(path_col) == F.col("dst_path")),
        )
        .groupBy(path_col)
        .agg(F.min_by(F.col("__moved"), F.col("__moved")).alias("__moved"))
    )
    out = (
        df.join(F.broadcast(dst_vals), path_col, "left")
        .withColumn(value_col, F.coalesce(F.col("__moved"), F.col(value_col)))
        .drop("__moved")
    )
    if drop_sources:
        out = out.join(
            moves_df.select(F.col("src_path").alias(path_col)), path_col, "left_anti"
        )
    return out


def replace_in_columns(
    df: DataFrame, pattern: str, replacement: str, cols: list[str] | None = None
) -> DataFrame:
    """H12 — whole-frame regex replace (the reference's
    ``df.replace(":Concept", "sphn:SPHNConcept", regex=True)``,
    src/main_ontology.py:50): one regexp_replace per string column, fused
    into a single projection by Catalyst (no shuffle, no Python)."""
    targets = set(cols) if cols is not None else {
        c for c, t in df.dtypes if t == "string"
    }
    return df.select(
        *[
            F.regexp_replace(F.col(c), pattern, F.lit(replacement)).alias(c)
            if c in targets
            else F.col(c)
            for c in df.columns
        ]
    )


def normalize_column_case(df: DataFrame, upper: bool = True) -> DataFrame:
    """H14 — column-name case normalize (``df.columns = map(str.upper, ...)``,
    src/scripts/merge_datafields.py:55). Pure metadata: a rename projection,
    zero data movement."""
    return df.toDF(*[c.upper() if upper else c.lower() for c in df.columns])


def insert_units(
    df: DataFrame,
    units: DataFrame,
    path_col: str,
    meta_col: str,
    default: str = "(unit not found)",
) -> DataFrame:
    """I3 — splice a looked-up unit into the metadata blob of numeric rows:
    regex-key extract (H9) + broadcast lookup with default (C11) +
    regexp_replace (H10). ``units`` is (key, unit)."""
    key = F.regexp_extract(F.col(path_col), r".*\\([^\\]+)\\$", 1)
    joined = df.withColumn("__key", key).join(
        F.broadcast(units.select(F.col("key").alias("__key"), "unit")), "__key", "left"
    )
    is_numeric = F.col(meta_col).rlike("Integer|Float|PosFloat")
    spliced = F.regexp_replace(
        F.col(meta_col),
        "<NormalUnits></NormalUnits>",
        F.concat(
            F.lit("<NormalUnits>"),
            F.coalesce(F.col("unit"), F.lit(default)),
            F.lit("</NormalUnits>"),
        ),
    )
    return (
        joined.withColumn(meta_col, F.when(is_numeric, spliced).otherwise(F.col(meta_col)))
        .drop("__key", "unit")
    )


#: i2b2 C_METADATAXML template — same tag set as the reference's
#: XML_PATTERN (local_config_template/i2b2_rdf_config_spo.json:100).
XML_PATTERN = (
    "<?xml version='1.0'?><ValueMetadata><Version>3.02</Version>"
    "<CreationDateTime>08/14/2008 01:22:59</CreationDateTime>"
    "<TestID></TestID><TestName></TestName><DataType></DataType>"
    "<CodeType></CodeType><Flagstouse></Flagstouse>"
    "<Oktousevalues>Y</Oktousevalues><MaxStringLength></MaxStringLength>"
    "<EnumValues></EnumValues>"
    "<CommentsDeterminingExclusion><Com></Com></CommentsDeterminingExclusion>"
    "<UnitValues><NormalUnits></NormalUnits><EqualUnits></EqualUnits>"
    "<ExcludingUnits></ExcludingUnits><ConvertingUnits><Units></Units>"
    "<MultiplyingFactor></MultiplyingFactor></ConvertingUnits></UnitValues>"
    "<Analysis><Enums /><Counts /><New /></Analysis></ValueMetadata>"
)


def generate_xml(fields: dict, pattern: str = XML_PATTERN):
    """H11 — full XML templating (generate_xml, src/utils.py:229-249):
    fill ``<Tag></Tag>`` slots of the pattern from tag -> Column; the
    ``EnumValues`` tag takes an ``array<string>`` column expanded to
    ``<Val description="">elem</Val>`` items. Null values leave the empty
    tag (the reference skips None keys — inserting '' is the same string).
    Pure string expressions, one linear codegen chain, no UDF."""
    res = F.lit(pattern)
    for tag, col in fields.items():
        if tag == "EnumValues":
            col = F.aggregate(
                col,
                F.lit(""),
                lambda acc, e: F.concat(
                    acc, F.lit('<Val description="">'), e, F.lit("</Val>")
                ),
            )
        ftag, etag = f"<{tag}>", f"</{tag}>"
        res = F.replace(
            res,
            F.lit(ftag + etag),
            F.concat(F.lit(ftag), F.coalesce(col, F.lit("")), F.lit(etag)),
        )
    return res


def relocate_values(
    df: DataFrame,
    group_keys: list[str],
    source_pred: str,
    value_cols: list[str],
) -> DataFrame:
    """I4 — within each group, copy the value columns from the single
    'value-carrier' row (rows matching ``source_pred``) onto every other
    row, then drop the carrier — groupBy().applyInPandas per-group rewrite
    (merge_datafields.py:9-68, C9). At scale the group key is
    (patient, concept, instance)-like: high cardinality, well-distributed,
    so the shuffle is balanced.
    """
    import pandas as pd

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    marked = df.withColumn("__is_src", F.expr(source_pred))

    def rewrite(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf[pdf["__is_src"]]
        rest = pdf[~pdf["__is_src"]].copy()
        if len(src) > 0:
            for c in value_cols:
                v = src.iloc[0][c]
                if v is not None and not (isinstance(v, float) and pd.isna(v)):
                    rest[c] = v
        return rest.drop(columns=["__is_src"])

    return marked.groupBy(*group_keys).applyInPandas(rewrite, schema=out_schema)
