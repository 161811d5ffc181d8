"""Ontology hierarchy expansion: iterative transitive closure.

Re-realizes the reference's recursive subclass-tree walk
(find_subconcepts, src/rdfwrappers.py:161-184,424-444) and the i2b2 row
materialization (path/level/basecode, src/i2b2wrappers.py:219-288) as a
driver-side BFS of DataFrame self-joins — Spark has no recursive CTE, so
the fixpoint loop lives on the driver while each round is one distributed
broadcast join.

Per round r, frontier_r holds all nodes at depth r with their accumulated
path (G5, I2B2PathResolver src/i2b2wrappers.py:254-266) and hash-chained
code (G6, reduce_basecode src/utils.py:112-127). Terminology muting (G3,
src/rdfwrappers.py:236-276: a node with >1 child in its own terminology is
not expanded) is a ``stop_expansion`` flag excluding nodes from the next
frontier.

Scale: ontologies are small relative to the corpus (10^5-10^7 nodes vs
10^12 pages) — the closure checkpoints EVERY round (the emptiness check
per round is then metadata-cheap, SURVEY.md §4); join strategy per round
is left to AQE (broadcast for the usual small frontier, shuffle when a
wide level's accumulated path strings would not fit a broadcast). The
closed table is then itself broadcast against mentions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BLACKLIST
from ..functions.ids import chained_code

#: rname (src/utils.py:130-132): strip the namespace prefix up to ':'.
def _rname(col):
    return F.substring_index(col, ":", -1)


def close_ontology(
    ontology: DataFrame, max_rounds: int = 64, check_path_collisions: bool = True
) -> DataFrame:
    """ontology(class_uri, parent_uri, kind, ..., blacklisted) ->
    ONTOLOGY_CLOSED(class_uri, parent_uri, level, path, code, parent_code,
    kind, terminology, stop_expansion).

    Semantics matched to the reference:
    - blacklist pruning BEFORE expansion (src/rdfwrappers.py:6-9) — a
      blacklisted node's whole subtree disappears;
    - path = parent_path + rname + '\\' (src/i2b2wrappers.py:254-266);
    - code = sha256(parent_code + uri + '\\')[:50] chained along the
      logical parent axis (src/utils.py:112-127);
    - muting: >1 child in the node's own terminology => children not
      expanded (ChildfreeConcept, src/rdfwrappers.py:187-199).

    Multi-parent classes (a DAG) appear once per parent with separate
    paths — the i2b2 multi-path semantics. A hierarchy deeper than
    ``max_rounds`` or a parent cycle RAISES instead of returning a
    silently truncated/cycle-polluted closure (review r5).
    ``check_path_collisions``: paths are built from rnames (local names),
    so distinct URIs with equal local names under one parent would merge
    paths — one cheap ontology-sized agg turns that silent key collision
    into an error (disable for trusted inputs).
    """
    classes = ontology.filter((F.col("kind") == "class") & (~F.col("blacklisted"))).filter(
        ~F.col("class_uri").isin(list(BLACKLIST))
    )

    # stop_expansion: computed once, joined onto every frontier.
    same_term_children = (
        classes.alias("c")
        .join(
            classes.alias("p"),
            (F.col("c.parent_uri") == F.col("p.class_uri"))
            & (F.col("c.terminology") == F.col("p.terminology")),
            "inner",
        )
        .groupBy(F.col("p.class_uri").alias("class_uri"))
        .agg(F.count("*").alias("n_same_term_children"))
    )
    # one flag row per DISTINCT class_uri (review r5: per-ROW flags made
    # the join below emit k^2 node rows for a class with k parent rows)
    flags = (
        classes.select("class_uri")
        .distinct()
        .join(same_term_children, "class_uri", "left")
        .select(
            "class_uri",
            (F.coalesce(F.col("n_same_term_children"), F.lit(0)) > 1).alias("stop_expansion"),
        )
    )

    # materialize the (small) node table once — it is re-joined every
    # round; dropDuplicates guards against accidental exact-duplicate
    # input rows multiplying the whole subtree
    nodes = classes.join(flags, "class_uri", "left").select(
        "class_uri", "parent_uri", "kind", "terminology", "stop_expansion"
    ).dropDuplicates().localCheckpoint(eager=True)

    roots = nodes.filter(F.col("parent_uri").isNull()).select(
        "class_uri",
        "parent_uri",
        F.lit(0).alias("level"),
        F.concat(F.lit("\\"), _rname(F.col("class_uri")), F.lit("\\")).alias("path"),
        chained_code(None, "class_uri").alias("code"),
        F.lit(None).cast("string").alias("parent_code"),
        "kind",
        "terminology",
        "stop_expansion",
    )

    result = roots.localCheckpoint(eager=True)
    frontier = result
    converged = False
    for level in range(1, max_rounds + 1):
        expandable = frontier.filter(~F.col("stop_expansion")).select(
            F.col("class_uri").alias("p_uri"),
            F.col("path").alias("p_path"),
            F.col("code").alias("p_code"),
        )
        # no forced broadcast (review r5): the usual frontier is tiny and
        # AQE broadcasts it, but a wide level of a 10^7-node ontology with
        # accumulated path strings must be allowed to shuffle-join
        nxt = (
            nodes.alias("n")
            .join(expandable.alias("f"), F.col("n.parent_uri") == F.col("p_uri"))
            .select(
                F.col("n.class_uri").alias("class_uri"),
                F.col("n.parent_uri").alias("parent_uri"),
                F.lit(level).alias("level"),
                F.concat(F.col("p_path"), _rname(F.col("n.class_uri")), F.lit("\\")).alias("path"),
                chained_code(F.col("p_code"), F.col("n.class_uri")).alias("code"),
                F.col("p_code").alias("parent_code"),
                F.col("n.kind").alias("kind"),
                F.col("n.terminology").alias("terminology"),
                F.col("n.stop_expansion").alias("stop_expansion"),
            )
        )
        # checkpoint every round: truncates the iterative lineage (SURVEY.md
        # §4) and makes the emptiness check a metadata-cheap count
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.count() == 0:
            converged = True
            break
        result = result.unionByName(nxt)
        frontier = nxt
    if not converged:
        # review r5: silently truncating left levels > max_rounds missing
        # from METADATA (facts referencing them dropped downstream) and a
        # parent cycle returned max_rounds of ever-growing bogus paths
        raise ValueError(
            f"close_ontology did not converge within {max_rounds} rounds: "
            "the hierarchy is deeper than max_rounds or parent_uri has a "
            "cycle; raise max_rounds or fix the ontology"
        )
    if check_path_collisions:
        dup = (
            result.groupBy("path")
            .agg(F.countDistinct("class_uri").alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"close_ontology: path {dup[0]['path']!r} is produced by "
                f"{dup[0]['n']} distinct class URIs (equal local names under "
                "one parent) — the materialized-path key would silently "
                "merge unrelated subtrees; rename or disambiguate"
            )
    return result


def attach_properties(
    closed: DataFrame, ontology: DataFrame, max_rounds: int = 16
) -> DataFrame:
    """Modifier-tree analog (G4, walk_mtree src/i2b2wrappers.py:137-162):
    attach property rows under their domain class with level+1, extended
    path and chained code, then RECURSIVELY attach properties nested under
    other properties (the reference's walk is recursive — review r5: a
    property whose parent is a property was silently dropped). Datatype-
    property leaves keep their ``datatype`` column (DATA_LEAVES absorption,
    src/i2b2wrappers.py:128-135). Properties honor the same config
    BLACKLIST as classes."""
    props = (
        ontology.filter((F.col("kind") == "property") & (~F.col("blacklisted")))
        .filter(~F.col("class_uri").isin(list(BLACKLIST)))
        .localCheckpoint(eager=True)
    )

    def attach_to(parents: DataFrame) -> DataFrame:
        return (
            props.alias("pr")
            .join(parents.alias("d"), F.col("pr.parent_uri") == F.col("d.class_uri"))
            .select(
                F.col("pr.class_uri").alias("class_uri"),
                F.col("pr.parent_uri").alias("parent_uri"),
                (F.col("d.level") + 1).alias("level"),
                F.concat(F.col("d.path"), _rname(F.col("pr.class_uri")), F.lit("\\")).alias("path"),
                chained_code(F.col("d.code"), F.col("pr.class_uri")).alias("code"),
                F.col("d.code").alias("parent_code"),
                F.col("pr.kind").alias("kind"),
                F.col("pr.terminology").alias("terminology"),
                F.lit(True).alias("stop_expansion"),
                F.col("pr.datatype").alias("datatype"),
            )
        )

    frontier = attach_to(
        closed.filter(F.col("kind") == "class").select("class_uri", "level", "path", "code")
    ).localCheckpoint(eager=True)
    result = frontier
    for _ in range(max_rounds):
        frontier = attach_to(
            frontier.select("class_uri", "level", "path", "code")
        ).localCheckpoint(eager=True)
        if frontier.count() == 0:
            return result
        result = result.unionByName(frontier)
    raise ValueError(
        f"attach_properties did not converge within {max_rounds} rounds: "
        "property nesting is deeper than max_rounds or parent_uri cycles"
    )


def subtree(closed: DataFrame, root_path: str) -> DataFrame:
    """All nodes strictly under a materialized path — the i2b2 'path
    prefix' query (wildcard path filter B8,
    src/scripts/merge_metavaluefields.py:18-48). ``root_path`` is
    normalized to end with the '\\' separator (review r5: a bare prefix
    over-matched sibling paths like '\\Thing\\PlaceOther\\' and failed to
    exclude the root row itself)."""
    if not root_path.endswith("\\"):
        root_path = root_path + "\\"
    return closed.filter(F.col("path").startswith(root_path) & (F.col("path") != root_path))
