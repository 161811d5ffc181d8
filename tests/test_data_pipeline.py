"""Data pipeline (G7/G8): instance-tree DFS with context inheritance,
chained basecodes, value dispatch, mandatory-context gate — expected rows
hand-computed like the reference's fixture tests (tests/test_dataloader.py).
"""

import pytest
from pyspark.sql import functions as F

from rdf_i2b2_converter_spark.plans.data_pipeline import (
    extract_observations,
    reduce_basecode,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, dt, None) for s, p, o, dt in rows],
        "s string, p string, o string, o_datatype string, o_lang string",
    )


@pytest.fixture(scope="module")
def obs_graph(spark):
    rows = [
        # instance 1: full context
        ("i1", "rdf:type", "kg:Diagnosis", None),
        ("i1", "kg:hasSubject", "subj1", None),
        ("subj1", "rdf:type", "kg:SubjectPseudoIdentifier", None),
        ("subj1", "kg:hasIdentifier", "p001", "xsd:string"),
        ("i1", "kg:hasEncounter", "enc1", None),
        ("enc1", "rdf:type", "kg:Encounter", None),
        ("enc1", "kg:hasIdentifier", "e001", "xsd:string"),
        ("i1", "kg:recordedAt", "2023-05-01 10:00:00", "xsd:dateTime"),
        # nested measurement with unit context + numeric literal
        ("i1", "kg:hasMeasurement", "m1", None),
        ("m1", "rdf:type", "kg:Measurement", None),
        ("m1", "kg:hasValue", "7.5", "xsd:double"),
        ("m1", "kg:hasUnit", "u1", None),
        ("u1", "rdf:type", "kg:Unit", None),
        ("u1", "kg:hasCode", "mmol/L", "xsd:string"),
        # terminology-typed path end
        ("i1", "kg:hasCode", "c1", None),
        ("c1", "rdf:type", "snomed:Code", None),
        # instance 2: NO patient -> must be gated out entirely (B7)
        ("i2", "rdf:type", "kg:Diagnosis", None),
        ("i2", "kg:recordedAt", "2023-06-01 00:00:00", "xsd:dateTime"),
        # instance 3: minimal valid (numbering check)
        ("i3", "rdf:type", "kg:Diagnosis", None),
        ("i3", "kg:hasSubject", "subj3", None),
        ("subj3", "rdf:type", "kg:SubjectPseudoIdentifier", None),
        ("subj3", "kg:hasIdentifier", "p002", "xsd:string"),
    ]
    return _triples(spark, rows)


@pytest.fixture(scope="module")
def obs(spark, obs_graph):
    return extract_observations(obs_graph, ["kg:Diagnosis"]).cache()


def test_gated_instance_absent(obs):
    assert obs.filter("instance_uri = 'i2'").count() == 0


def test_concept_rows_and_numbering(obs):
    rows = {r["instance_uri"]: r for r in obs.filter("modifier_cd = '@'").collect()}
    assert set(rows) == {"i1", "i3"}
    assert rows["i1"]["instance_num"] == 1 and rows["i3"]["instance_num"] == 2
    c_root = reduce_basecode("kg:Diagnosis", "")
    assert rows["i1"]["concept_cd"] == c_root
    assert rows["i1"]["patient_num"] == "p001"
    assert rows["i1"]["encounter_num"] == "e001"
    assert rows["i1"]["start_date"] == "2023-05-01 10:00:00"


def test_terminology_pathend_code_chain(obs):
    c_root = reduce_basecode("kg:Diagnosis", "")
    bc_pred = reduce_basecode("kg:hasCode", c_root)
    want = reduce_basecode("snomed:Code", bc_pred)
    rows = obs.filter(f"modifier_cd = '{want}'").collect()
    assert len(rows) == 1 and rows[0]["instance_uri"] == "i1"
    assert rows[0]["nval_num"] is None


def test_nested_value_with_unit_context(obs):
    c_root = reduce_basecode("kg:Diagnosis", "")
    bc_meas = reduce_basecode("kg:hasMeasurement", c_root)
    c_meas = reduce_basecode("kg:Measurement", bc_meas)
    bc_val = reduce_basecode("kg:hasValue", c_meas)
    rows = obs.filter(f"modifier_cd = '{bc_val}'").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["nval_num"] == 7.5 and r["valtype_cd"] == "N" and r["tval_char"] == "E"
    assert r["units_cd"] == "mmol/L"          # captured at the inner level
    assert r["patient_num"] == "p001"         # inherited from the root
    assert r["concept_cd"] == c_root          # concept code stands for the tree


def test_no_unit_leak_to_sibling_rows(obs):
    """units_cd is captured inside the measurement subtree; the concept row
    and the terminology row (outside it) must not carry it — context flows
    DOWN, never back up (explore_obstree copies per recursion)."""
    at_root = obs.filter("modifier_cd = '@' and instance_uri = 'i1'").collect()[0]
    assert at_root["units_cd"] is None


def test_join_key_parity_with_ontology_side(spark, obs):
    """The fact-side chained code equals the ontology-side chained_code for
    the same URI chain — the reference's central join contract."""
    from pyspark.sql import functions as F
    from rdf_i2b2_converter_spark.functions.ids import chained_code

    df = spark.createDataFrame([("kg:Diagnosis",)], "uri string").select(
        chained_code(None, "uri").alias("code")
    )
    assert df.collect()[0]["code"] == reduce_basecode("kg:Diagnosis", "")


def test_instance_numbering_matches_window_form(spark, obs):
    """VERDICT r2 #3: the range-partitioned E1 numbering must be
    bit-identical to the per-class row_number window, with no per-class
    single-task sort in the plan."""
    from pyspark.sql import Window

    w = Window.partitionBy("class_uri").orderBy("instance_uri")
    expect = {
        (r["class_uri"], r["instance_uri"], r["instance_num"])
        for r in obs.select("class_uri", "instance_uri").distinct()
        .withColumn("instance_num", F.row_number().over(w)).collect()
    }
    got = {
        (r["class_uri"], r["instance_uri"], r["instance_num"])
        for r in obs.select("class_uri", "instance_uri", "instance_num").distinct().collect()
    }
    assert got == expect
    # the numbering plan must not window-partition by class_uri (one task
    # per class); the scalable form windows by the range-partition id
    plan = obs._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(class_uri" not in plan
    assert "row_number" in plan  # the per-range-partition numbering window


def test_dense_id_scalable_plan_build_is_lazy(spark):
    """Review r3: dense_id_scalable used to eager-checkpoint + collect at
    plan-BUILD time, running the whole upstream as a side effect of merely
    composing the plan. Now zero jobs until an action. (extract_observations
    as a whole stays eager by design — assign_subtrees is an iterative
    fixpoint whose rounds are driver actions.)"""
    from rdf_i2b2_converter_spark.functions.ids import dense_id, dense_id_scalable

    df = spark.createDataFrame(
        [(f"c{i % 3}", f"i{i}") for i in range(50)], "class_uri string, instance_uri string"
    )
    sc = spark.sparkContext
    # floor: repartitionByRange itself runs the RangePartitioner boundary
    # sketch at RDD creation — that's Spark, not our code. The regression
    # being guarded against is the EXTRA work (eager checkpoint
    # materialization + driver collect) beyond that sketch.
    sc.setJobGroup("lazy-floor", "range sampler sketch only")
    df.select("class_uri", "instance_uri").distinct().repartitionByRange(
        4, "class_uri", "instance_uri"
    ).localCheckpoint(eager=False)
    floor = len(sc.statusTracker().getJobIdsForGroup("lazy-floor"))
    sc.setJobGroup("lazy-check", "plan build must not execute beyond the sketch")
    try:
        ids = dense_id_scalable(df, ["class_uri", "instance_uri"], num_partitions=4)
        _ = ids.schema
        jobs = list(sc.statusTracker().getJobIdsForGroup("lazy-check"))
        assert len(jobs) <= floor, f"plan build ran extra jobs: {jobs} (sketch floor {floor})"
    finally:
        sc.setJobGroup("", "")
    # and the lazy form still numbers bit-identically to the window form
    got = {tuple(r) for r in ids.collect()}
    want = {tuple(r) for r in dense_id(df, ["class_uri", "instance_uri"], "dense_id").collect()}
    assert got == want
