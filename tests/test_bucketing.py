"""Bucketed co-located join: prove the shuffle disappears.

At 100 TB the state-table join in entity assembly (A4/A11) is the
recurring shuffle; bucketing both sides by the join key makes it
co-located. This test materializes bucketed tables and asserts the
join plan contains NO shuffle exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # force a non-broadcast join so bucketing is what must kill the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        import shutil

        a = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
        b = spark.range(0, 10_000).withColumn("w", F.col("id") % 7)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for t in ("bkt_a", "bkt_b"):
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
        a.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bkt_a")
        b.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bkt_b")

        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
        assert joined.count() == 10_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle

        # control: the same join over non-bucketed parquet DOES shuffle
        a.write.mode("overwrite").parquet(str(tmp_path / "plain_a"))
        b.write.mode("overwrite").parquet(str(tmp_path / "plain_b"))
        plain = spark.read.parquet(str(tmp_path / "plain_a")).join(
            spark.read.parquet(str(tmp_path / "plain_b")), "id"
        )
        plain.count()
        plan2 = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
