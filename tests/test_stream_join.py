"""Stream-stream join with watermarks: impressions ⋈ clicks within an
interval — the remaining Structured Streaming join surface."""

from __future__ import annotations

import json


def test_stream_stream_interval_join(spark, tmp_path):
    imp_dir = tmp_path / "impressions"
    clk_dir = tmp_path / "clicks"
    imp_dir.mkdir()
    clk_dir.mkdir()
    imps = [
        {"ad_id": 1, "ts": "2024-01-01 00:00:00"},
        {"ad_id": 2, "ts": "2024-01-01 00:10:00"},
        {"ad_id": 3, "ts": "2024-01-01 00:20:00"},
    ]
    clks = [
        {"ad_id": 1, "ts": "2024-01-01 00:02:00"},  # within 5 min -> joins
        {"ad_id": 2, "ts": "2024-01-01 00:30:00"},  # too late -> dropped
    ]
    (imp_dir / "i.json").write_text("\n".join(json.dumps(r) for r in imps))
    (clk_dir / "c.json").write_text("\n".join(json.dumps(r) for r in clks))

    impressions = (
        spark.readStream.schema("ad_id long, ts timestamp")
        .json(str(imp_dir))
        .withWatermark("ts", "10 minutes")
        .selectExpr("ad_id", "ts AS imp_ts")
    )
    clicks = (
        spark.readStream.schema("ad_id long, ts timestamp")
        .json(str(clk_dir))
        .withWatermark("ts", "10 minutes")
        .selectExpr("ad_id AS c_ad_id", "ts AS click_ts")
    )
    joined = impressions.join(
        clicks,
        (impressions["ad_id"] == clicks["c_ad_id"])
        & (clicks["click_ts"] >= impressions["imp_ts"])
        & (clicks["click_ts"] <= impressions["imp_ts"] + F_interval("5 minutes")),
        "inner",
    ).select("ad_id", "imp_ts", "click_ts")

    q = (
        joined.writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM attributed").collect()
    assert [(r["ad_id"],) for r in rows] == [(1,)]


def F_interval(s: str):
    from pyspark.sql import functions as F

    return F.expr(f"INTERVAL {s}")
