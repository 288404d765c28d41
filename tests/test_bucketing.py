"""Bucketed-table co-located join: the pre-shuffled fact⋈fact path.

Writes two tables bucketed on the same key/count and asserts the join
plan contains NO Exchange — the physical proof that bucketing removes
the shuffle (the expensive half of every big join at 100 TB).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdatapipelinepysparksqlserver_spark.sources.lake import write_bucketed_table


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_val")
    )
    lines = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("l_key"), (F.col("id") % 13).alias("l_val")
    )
    write_bucketed_table(
        spark, orders, "t_orders_b", "o_key", 8, sort_col="o_key",
        path=str(tmp_path / "orders_b"),
    )
    write_bucketed_table(
        spark, lines, "t_lines_b", "l_key", 8, sort_col="l_key",
        path=str(tmp_path / "lines_b"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_orders_b").join(
            spark.table("t_lines_b"), F.col("o_key") == F.col("l_key")
        )
        assert joined.count() == 5000
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket layout IS the shuffle
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lines_b")


def test_bucketed_groupby_has_no_exchange(spark, tmp_path):
    ev = spark.range(0, 2000).select(
        (F.col("id") % 50).alias("user_id"), (F.col("id") % 9).alias("v")
    )
    write_bucketed_table(
        spark, ev, "t_events_b", "user_id", 8, path=str(tmp_path / "events_b")
    )
    try:
        agg = spark.table("t_events_b").groupBy("user_id").agg(F.sum("v").alias("s"))
        assert agg.count() == 50
        plan = _plan(agg)
        assert "Exchange" not in plan  # aggregation reuses the bucket partitioning
    finally:
        spark.sql("DROP TABLE IF EXISTS t_events_b")
