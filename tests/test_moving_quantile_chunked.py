"""The chunked bounded-frame rolling median (q_moving_quantile,
round-7 verdict item 3) must equal the single-window form it
replaced: the carry-row construction is exact because CHUNK (1024)
exceeds the 50-row frame, so every real row sees precisely its 50
within-type predecessors."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from files_kraken_spark.queries.analytics import q_moving_quantile


def test_chunked_rolling_median_equals_direct_window(spark):
    sf = "/root/testdata/sf0.01"
    got = {
        (r["event_id"], r["event_type"]): r["rolling_median"]
        for r in q_moving_quantile(spark, sf).collect()
    }
    from files_kraken_spark.sources.tables import load_table

    ev = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-50, Window.currentRow)
    )
    want = {
        (r["event_id"], r["event_type"]): r["rm"]
        for r in ev.select(
            "event_id",
            "event_type",
            F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("rm"),
        ).collect()
    }
    assert got == want
    # sf0.01 exceeds one 1024-row chunk per type, so the carry-row
    # path (chunk boundaries) is genuinely exercised by the equality
    n_per_type = ev.groupBy("event_type").count().collect()
    assert max(r["count"] for r in n_per_type) > 1024
