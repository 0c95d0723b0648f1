"""Unit coverage for the plan-audit BNLJ mechanization (round-7
verdict item 5): a BroadcastNestedLoopJoin whose broadcast side is
structurally a ≤1-row aggregate is allowed without a name-allowlist
entry; multi-row broadcast sides are not."""

from pyspark.sql import functions as F

from tools.plan_audit import _bnlj_sides_all_one_row


def test_one_row_agg_broadcast_side_allowed(spark):
    big = spark.range(0, 1000).withColumn("v", F.col("id") % 7)
    scalar = big.agg(F.avg("v").alias("m"))  # global agg: 1 row
    joined = big.crossJoin(F.broadcast(scalar)).filter(F.col("v") > F.col("m"))
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastNestedLoopJoin" in plan  # precondition for the check
    assert _bnlj_sides_all_one_row(joined)


def test_scalar_join_of_aggregates_allowed(spark):
    # the 'three scalar aggregates joined scalar-wise' pattern
    big = spark.range(0, 1000).withColumn("v", F.col("id") % 7)
    a = big.agg(F.avg("v").alias("m"))
    b = big.agg(F.max("v").alias("mx"))
    scalar = a.crossJoin(b)
    joined = big.crossJoin(F.broadcast(scalar)).filter(
        F.col("v") > F.col("m") + F.col("mx")
    )
    assert _bnlj_sides_all_one_row(joined)


def test_multi_row_broadcast_side_not_allowed(spark):
    big = spark.range(0, 1000).withColumn("v", F.col("id") % 7)
    grid = spark.range(0, 5).withColumnRenamed("id", "g")  # 5 rows
    joined = big.join(F.broadcast(grid), F.col("v") > F.col("g"))
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert not _bnlj_sides_all_one_row(joined)


def test_grouped_agg_broadcast_side_not_allowed(spark):
    # an aggregate WITH grouping keys is multi-row — must not pass
    big = spark.range(0, 1000).withColumn("v", F.col("id") % 7)
    per_group = big.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    joined = big.alias("l").join(
        F.broadcast(per_group).alias("r"), F.expr("l.id > r.n")
    )
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert not _bnlj_sides_all_one_row(joined)


def test_no_bnlj_in_plan_is_conservative_false(spark):
    # equi-joins plan as hash joins: no BNLJ found -> False (the name
    # allowlist, not the structural pass, then decides)
    big = spark.range(0, 100)
    small = spark.range(0, 10)
    joined = big.join(small, "id")
    assert not _bnlj_sides_all_one_row(joined)
