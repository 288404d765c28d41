"""Structured Streaming CDC primitives: unified batch/stream semantics —
the streaming plan must produce the batch twin's results on the same data."""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F

from bigdatapipelinepysparksqlserver_spark.sources.lake import LakeTable
from bigdatapipelinepysparksqlserver_spark.streaming import (
    foreach_batch_partition_overwrite,
    streaming_dedup,
    streaming_hourly_agg,
)

ROWS = [
    (1, datetime(2024, 1, 1, 10, 5), "purchase", 10.0),
    (2, datetime(2024, 1, 1, 10, 55), "purchase", 20.0),
    (3, datetime(2024, 1, 1, 11, 5), "view", 0.0),
    (3, datetime(2024, 1, 1, 11, 5), "view", 0.0),  # duplicate event_id
]
SCHEMA = "event_id long, ts timestamp, event_type string, amount double"


def _events(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_hourly_agg_batch_twin(spark):
    got = {
        (r.hour_start, r.event_type): (r.event_count, r.amount_sum)
        for r in streaming_hourly_agg(_events(spark)).collect()
    }
    assert got[(datetime(2024, 1, 1, 10), "purchase")] == (2, 30.0)
    assert got[(datetime(2024, 1, 1, 11), "view")] == (2, 0.0)


def test_streaming_hourly_agg_file_source(spark, tmp_path):
    """Real streaming run: file source → watermarked agg → memory sink,
    availableNow trigger (bounded), results == batch twin."""
    src_dir = str(tmp_path / "stream_src")
    _events(spark).write.parquet(src_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        streaming_hourly_agg(stream)
        .writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # complete mode emits every window regardless of watermark progress —
    # (append mode would hold back the final window, whose end is still
    # ahead of max-event-time − watermark)
    got = {
        (r.hour_start, r.event_type): (r.event_count, r.amount_sum)
        for r in spark.sql("select * from hourly_test").collect()
    }
    assert got[(datetime(2024, 1, 1, 10), "purchase")] == (2, 30.0)
    assert got[(datetime(2024, 1, 1, 11), "view")] == (2, 0.0)


def test_streaming_dedup_batch_twin(spark):
    out = streaming_dedup(_events(spark))
    assert out.count() == 3  # duplicate event_id collapsed


def test_foreach_batch_partition_overwrite(spark, tmp_path):
    lake = LakeTable(spark, str(tmp_path / "lake"), partition_cols=("event_type",))
    sink = foreach_batch_partition_overwrite(lake)
    sink(_events(spark).dropDuplicates(["event_id"]), 0)
    assert lake.read().count() == 3
    # replay the same batch: idempotent (C4)
    sink(_events(spark).dropDuplicates(["event_id"]), 0)
    assert lake.read().count() == 3
    # empty batch: no-op, does not truncate
    sink(_events(spark).where("event_id < 0"), 1)
    assert lake.read().count() == 3
    assert os.path.isdir(str(tmp_path / "lake"))


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """The session_window plan run as a REAL stream (file source,
    availableNow) produces the batch twin's sessions exactly."""
    from bigdatapipelinepysparksqlserver_spark.streaming.cdc import streaming_sessionize

    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 100),
        (2, datetime(2024, 1, 1, 10, 10), 100),   # same session
        (3, datetime(2024, 1, 1, 11, 0), 100),    # 50min gap → new session
        (4, datetime(2024, 1, 1, 10, 5), 200),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    src_dir = str(tmp_path / "sess_src")
    df.write.parquet(src_dir)

    batch = {
        (r.user_id, r.session_start, r.session_end, r.events_in_session)
        for r in streaming_sessionize(df).collect()
    }
    assert (100, datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 10, 40), 2) in batch
    assert len(batch) == 3

    stream = spark.readStream.schema("event_id long, ts timestamp, user_id long").parquet(src_dir)
    q = (
        streaming_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.events_in_session)
        for r in spark.sql("select * from sess_test").collect()
    }
    assert streamed == batch
