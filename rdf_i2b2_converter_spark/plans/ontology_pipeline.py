"""Ontology pipeline: closed hierarchy -> i2b2-style star-schema tables.

Re-realizes entry point 1 of the reference (src/main_ontology.py:58-69 and
src/starschema.py) as pure DataFrame transformations fused by Catalyst:

  ontology --close_ontology/attach_properties--> metadata (METADATA.csv
  analog) --filter+project+rename (B3)--> concept_dimension /
  modifier_dimension --multi-predicate filter + constants (B4)-->
  table_access; duplicate-root collapse (D6, src/main_ontology.py:48-55).

Where the reference needs five pandas post-passes and an awk stage, this is
one job per output table over the same closed-hierarchy DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.closure import attach_properties, close_ontology


def build_metadata(ontology: DataFrame) -> DataFrame:
    """METADATA analog: one row per concept/modifier with materialized path,
    level and content-hashed basecode (src/i2b2wrappers.py:164-198)."""
    closed = close_ontology(ontology)
    concepts = closed.withColumn("c_tablename", F.lit("CONCEPT_DIMENSION"))
    modifiers = attach_properties(closed, ontology).withColumn(
        "c_tablename", F.lit("MODIFIER_DIMENSION")
    )
    # allowMissingColumns: modifier rows carry their datatype (DATA_LEAVES,
    # r5); concept rows have none
    meta = concepts.unionByName(modifiers, allowMissingColumns=True).select(
        F.col("level").alias("c_hlevel"),
        F.col("path").alias("c_fullname"),
        F.substring_index(F.col("class_uri"), ":", -1).alias("c_name"),
        F.col("code").alias("c_basecode"),
        "c_tablename",
        F.when(F.col("kind") == "class", F.lit("FA")).otherwise(F.lit("RA")).alias(
            "c_visualattributes"
        ),
        F.col("class_uri"),
        F.col("kind"),
    )
    # duplicate-root collapse (D6): among level-0 rows with the same name
    # keep the lexicographically-first path (main_ontology.py:48-55 keeps
    # the first row; we pin an explicit order for parallelism-independence)
    w = Window.partitionBy("c_hlevel", "c_name").orderBy("c_fullname")
    return (
        meta.withColumn(
            "__rn",
            F.when(F.col("c_hlevel") == 0, F.row_number().over(w)).otherwise(F.lit(1)),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def gen_concept_dimension(metadata: DataFrame) -> DataFrame:
    """Filter+project+rename (B3, src/starschema.py:20-26)."""
    return metadata.filter(F.col("c_tablename") == "CONCEPT_DIMENSION").select(
        F.col("c_fullname").alias("concept_path"),
        F.col("c_basecode").alias("concept_cd"),
        F.col("c_name").alias("name_char"),
    )


def gen_modifier_dimension(metadata: DataFrame) -> DataFrame:
    return metadata.filter(F.col("c_tablename") == "MODIFIER_DIMENSION").select(
        F.col("c_fullname").alias("modifier_path"),
        F.col("c_basecode").alias("modifier_cd"),
        F.col("c_name").alias("name_char"),
    )


def gen_table_access(metadata: DataFrame) -> DataFrame:
    """Multi-predicate filter + literal constants (B4,
    src/starschema.py:119-134): the root rows, pointed at the fact table."""
    return metadata.filter(
        (F.col("c_hlevel") == 0) & (F.col("c_tablename") == "CONCEPT_DIMENSION")
    ).select(
        F.col("c_fullname").alias("c_table_fullname"),
        F.col("c_name").alias("c_table_name"),
        F.lit("concept_cd").alias("c_facttablecolumn"),
        F.lit("OBSERVATION_FACT").alias("c_facttable"),
        F.lit("T").alias("c_protected_access"),
    )


def query_providers(
    triples: DataFrame,
    provider_class: str = "kg:Provider",
    code_pred: str = "kg:hasCode",
    id_pred: str = "kg:hasIdentifier",
) -> DataFrame:
    """C5 — the reference's 4-hop provider SPARQL (query_providers,
    src/starschema.py:65-92): ``?k rdf:type <Provider> . ?k ?_ ?s .
    ?s <code_pred> ?c . ?s <id_pred> ?n`` -> (provider_path=c,
    provider_id=n).

    Three equi-joins of pushed-down slices of the one triples DataFrame;
    the provider-instance side is broadcast (providers are a dimension,
    facts are not). No DISTINCT — SPARQL solution-mapping semantics keep
    the fan-out over the wildcard ``?_`` edge, exactly as the reference
    materializes it into PROVIDER_DIMENSION rows."""
    k = triples.filter((F.col("p") == "rdf:type") & (F.col("o") == provider_class)).select(
        F.col("s").alias("__k")
    )
    edges = triples.filter(F.col("o_datatype").isNull()).select(
        F.col("s").alias("__k"), F.col("o").alias("__s")
    )
    codes = triples.filter(F.col("p") == code_pred).select(
        F.col("s").alias("__s"), F.col("o").alias("provider_path")
    )
    ids = triples.filter(F.col("p") == id_pred).select(
        F.col("s").alias("__s"), F.col("o").alias("provider_id")
    )
    return (
        edges.join(F.broadcast(k), "__k")
        .join(codes, "__s")
        .join(ids, "__s")
        .select("provider_path", "provider_id")
    )


def gen_provider_dimension(providers: DataFrame) -> DataFrame:
    """PROVIDER_DIMENSION projection (gen_provider_dim,
    src/starschema.py:96-105)."""
    from .. import schemas

    return providers.select(*[f.name for f in schemas.PROVIDER_DIMENSION.fields])


def init_star_schema(spark, providers: DataFrame | None = None) -> dict[str, DataFrame]:
    """init_star_schema (src/starschema.py:107-116): the observation-side
    dimension tables — header-only (empty, schema-pinned) visit/patient
    dims and encounter/patient mappings, filled later by the postprod
    reindex (E2/C8), plus the provider dimension when providers are given."""
    from .. import schemas

    out = {
        "visit_dimension": spark.createDataFrame([], schemas.VISIT_DIMENSION),
        "patient_dimension": spark.createDataFrame([], schemas.PATIENT_DIMENSION),
        "encounter_mapping": spark.createDataFrame([], schemas.ENCOUNTER_MAPPING),
        "patient_mapping": spark.createDataFrame([], schemas.PATIENT_MAPPING),
    }
    if providers is not None:
        out["provider_dimension"] = gen_provider_dimension(providers)
    return out


def run_ontology_pipeline(ontology: DataFrame) -> dict[str, DataFrame]:
    """All four outputs from one closed hierarchy — the whole of
    main_ontology.py as a dict of lazily-composed DataFrames."""
    metadata = build_metadata(ontology)
    return {
        "metadata": metadata,
        "concept_dimension": gen_concept_dimension(metadata),
        "modifier_dimension": gen_modifier_dimension(metadata),
        "table_access": gen_table_access(metadata),
    }
