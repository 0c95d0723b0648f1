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


def test_bnlj_inside_scalar_subquery_is_visited(spark):
    """Round-8 advice: a quadratic BNLJ hiding in a scalar-subquery
    plan must fail the structural check even when the main tree's own
    BNLJ is a harmless 1-row broadcast."""
    spark.range(0, 1000).withColumn("v", F.col("id") % 7).createOrReplaceTempView(
        "paud_big"
    )
    spark.range(0, 50).withColumnRenamed("id", "g").createOrReplaceTempView(
        "paud_grid"
    )
    # scalar subquery: 1-row OUTPUT, but the cross join inside is 1000×50
    df = spark.sql(
        """
        SELECT * FROM paud_big
        WHERE v > (SELECT max(paud_big.id + paud_grid.g)
                   FROM paud_big JOIN paud_grid ON paud_big.v > paud_grid.g)
        """
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert not _bnlj_sides_all_one_row(df)


def test_one_row_bnlj_in_subquery_is_conservative_false(spark):
    """A BNLJ hosted in a subquery is structurally UNREACHABLE at the
    sparkPlan stage (the subquery is still logical there), so even a
    harmless scalar-scalar one falls through to the name allowlist —
    the count guard trades a little precision for never vouching for
    a join it could not inspect."""
    spark.range(0, 1000).withColumn("v", F.col("id") % 7).createOrReplaceTempView(
        "paud_big2"
    )
    df = spark.sql(
        """
        SELECT * FROM paud_big2
        WHERE v > (SELECT a.m + b.mx
                   FROM (SELECT avg(v) AS m FROM paud_big2) a
                   CROSS JOIN (SELECT max(v) AS mx FROM paud_big2) b)
        """
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert not _bnlj_sides_all_one_row(df)


def test_main_tree_one_row_bnlj_cannot_vouch_for_subquery_bnlj(spark):
    """The round-8 ADVICE scenario verbatim: main tree holds a 1-row
    scalar-broadcast BNLJ (verifiable), a subquery holds a quadratic
    one (unreachable) — the count guard must fail the whole plan."""
    spark.range(0, 1000).withColumn("v", F.col("id") % 7).createOrReplaceTempView(
        "paud_big3"
    )
    spark.range(0, 50).withColumnRenamed("id", "g").createOrReplaceTempView(
        "paud_grid3"
    )
    df = spark.sql(
        """
        SELECT * FROM paud_big3
        CROSS JOIN (SELECT avg(v) AS m FROM paud_big3)
        WHERE v > m
          AND v > (SELECT max(paud_big3.id + paud_grid3.g)
                   FROM paud_big3 JOIN paud_grid3
                     ON paud_big3.v > paud_grid3.g)
        """
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # both joins present: one in the main tree, one in the subquery
    import re as _re

    assert len(_re.findall(r"\(\d+\) BroadcastNestedLoopJoin\b", plan)) >= 2
    assert not _bnlj_sides_all_one_row(df)
