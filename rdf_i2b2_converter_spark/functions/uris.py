"""URI/label presentation functions (H1, H3, F5).

- ``shortname``: namespace-prefix compression, longest-prefix-wins
  (src/utils.py:166-181) — a when-chain compiled from the namespace map.
- ``preferred_label``: language-preferred rdfs:label with terminology
  decoration (0-padded code + upper-cased prefix) — src/rdfwrappers.py:
  80-119, as a window over an explicit precedence rank (iteration order in
  the reference; rank column here, SURVEY.md §7.4 #4).
- ``select_common``: schema intersection (src/starschema.py:125, F5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shortname(uri: Column | str, namespaces: dict[str, str]) -> Column:
    """Longest-prefix namespace compression: 'http://ex.org/x/Foo' ->
    'ex:Foo'. Unmatched URIs pass through unchanged."""
    c = F.col(uri) if isinstance(uri, str) else uri
    expr = c
    # ascending length: longer prefixes applied later win (when-chain is
    # built inside-out, so the last when() is evaluated first)
    for ns_uri, prefix in sorted(namespaces.items(), key=lambda kv: len(kv[0])):
        suffix = F.substring(c, len(ns_uri) + 1, 1 << 20)
        expr = F.when(c.startswith(ns_uri), F.concat(F.lit(prefix + ":"), suffix)).otherwise(expr)
    return expr


def preferred_label(
    triples: DataFrame,
    pref_lang: str = "en",
    label_pred: str = "rdfs:label",
    terminology_prefixes: tuple[str, ...] = (),
    code_width: int = 8,
) -> DataFrame:
    """(s, label): pick the language-preferred rdfs:label — precedence
    pref_lang > no-lang > other (ties by label text) — then decorate
    terminology subjects as 'PREFIX:<0-padded local code> label'
    (src/rdfwrappers.py:105-117)."""
    labels = triples.filter(F.col("p") == label_pred)
    rank = (
        F.when(F.col("o_lang") == pref_lang, 0)
        .when(F.col("o_lang").isNull(), 1)
        .otherwise(2)
    )
    w = Window.partitionBy("s").orderBy(rank.asc(), F.col("o").asc())
    best = (
        labels.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("s", F.col("o").alias("label"))
    )
    if not terminology_prefixes:
        return best
    is_term = F.lit(False)
    term_prefix = F.lit(None).cast("string")
    for p in terminology_prefixes:
        is_term = is_term | F.col("s").startswith(p + ":")
        term_prefix = F.when(F.col("s").startswith(p + ":"), F.lit(p)).otherwise(term_prefix)
    local = F.substring_index(F.col("s"), ":", -1)
    decorated = F.concat(
        F.upper(term_prefix), F.lit(":"), F.lpad(local, code_width, "0"), F.lit(" "), F.col("label")
    )
    return best.withColumn("label", F.when(is_term, decorated).otherwise(F.col("label")))


def select_common(df: DataFrame, columns: list[str]) -> DataFrame:
    """F5 — project onto the intersection of ``columns`` and df.columns,
    preserving the given order (driver-side, like the reference)."""
    have = set(df.columns)
    return df.select(*[c for c in columns if c in have])
