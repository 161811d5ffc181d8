"""Bucketed co-located join: two tables bucketed on the join key must join
WITHOUT a shuffle exchange (the plan-level contract of write_bucketed)."""

from pyspark.sql import functions as F

from rdf_i2b2_converter_spark.sources.tables import write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        a = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        write_bucketed(a, "bkt_a", "k", 8, sort_col="k")
        write_bucketed(b, "bkt_b", "k", 8, sort_col="k")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # bucketing co-locates: no shuffle
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
