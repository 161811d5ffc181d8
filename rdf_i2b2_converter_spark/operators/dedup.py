"""Deduplication suite for training-data pipelines.

Beyond the reference's full-row distinct (remove_duplicates,
src/utils.py:252-257, D1) and keep-first dedup (postprod.bash:103, D2),
a 100 TB corpus needs near-dup detection. All variants below are pure
DataFrame compositions — shingling/minhashing happen inside whole-stage
codegen via array expressions (functions/text.py), bucket joins are plain
shuffles on short keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, normalized_text, shingles, tokens

# ------------------------------------------------------------ exact dedup


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup on normalized text: keeps the smallest id
    per fingerprint (deterministic, parallelism-independent)."""
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__fp", fingerprint(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


# --------------------------------------------------------------- MinHash


def minhash_signature(
    df: DataFrame, text_col: str = "text", k: int = 3, n_hashes: int = 16
) -> DataFrame:
    """n_hashes-permutation MinHash over k-token shingles.

    Permutation i is md5(shingle || '#' || i) — md5 (not xxhash64) so the
    DuckDB oracle can reproduce signatures bit-for-bit. Adds
    ``minhash: array<string>``. Array expressions only; no UDF, no explode —
    the signature computes map-side with zero shuffle."""
    sh = shingles(F.col(text_col), k)
    sig = F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.md5(F.concat(s, F.lit(f"#{i}")))))
            for i in range(n_hashes)
        ]
    )
    return df.withColumn("minhash", sig)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """MinHash-LSH near-dup candidates: band the signature, self-join on
    (band_id, band_hash) buckets, emit id pairs (a < b).

    Scale: the self-join shuffles only (band_key, id) — never text. Skewed
    buckets (boilerplate pages) are split by AQE skew-join; add salting via
    canonicalize.salt_keys if a single band key dominates."""
    rows_per_band = n_hashes // n_bands
    sig = minhash_signature(df, text_col, k, n_hashes).select(id_col, "minhash")
    # materialize before the self-join: joining on COMPUTED columns makes
    # Catalyst lose the equi-keys and fall back to a nested-loop plan;
    # checkpointed attributes give a plain shuffled hash join.
    sig = sig.localCheckpoint(eager=False)
    bands = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.md5(
                            F.concat_ws(
                                "|", *[F.col("minhash")[b * rows_per_band + r] for r in range(rows_per_band)]
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_hash")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


# --------------------------------------------------------------- SimHash


def simhash64(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash over tokens: sum per-bit +-1 votes of xxhash64(token),
    sign -> bit. Pure array/bit expressions (aggregate over the token
    array); near-dup docs differ in few bits (hamming distance)."""
    toks = tokens(F.col(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0, 1).otherwise(-1),
        )
        for i in range(64)
    ]
    sim = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        sim = sim + F.when(v > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
    return df.withColumn(out_col, sim)


def hamming64(a, b):
    return F.bit_count(a.bitwiseXOR(b))


# -------------------------------------------------------- n-gram Jaccard


def jaccard_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Exact k-token-shingle Jaccard for candidate pairs (verification stage
    after LSH): |A∩B| / |A∪B| via array_intersect/union on distinct
    shingle sets. Join order: pairs (small) x docs twice, both joins on id —
    text is only shuffled for docs that appear in a candidate pair."""
    sh = df.select(
        F.col(id_col), F.array_distinct(shingles(F.col(text_col), k)).alias("sh")
    )
    return (
        pairs.join(sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ).alias("jaccard"),
        )
    )
