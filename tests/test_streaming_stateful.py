"""Real Structured Streaming execution: the windowed aggregation and
stateful dedup run as actual streams (file source, multiple
micro-batches, state store), not just batch twins."""

from __future__ import annotations

import pytest


@pytest.fixture()
def event_stream_dir(spark, tmp_path):
    rows1 = [(1, "2024-01-01 00:10:00", "click", 1.0), (2, "2024-01-01 00:50:00", "click", 2.0)]
    rows2 = [(3, "2024-01-01 01:10:00", "click", 4.0), (2, "2024-01-01 00:50:00", "click", 2.0)]  # dup id 2
    d = tmp_path / "stream"
    d.mkdir()
    for i, rows in enumerate([rows1, rows2]):
        lines = ["event_id,ts,event_type,value"] + [",".join(map(str, r)) for r in rows]
        (d / f"batch{i}.csv").write_text("\n".join(lines))
    return str(d)


def _read_stream(spark, path):
    return (
        spark.readStream.schema("event_id long, ts timestamp, event_type string, value double")
        .option("header", True)
        .option("maxFilesPerTrigger", 1)  # force 2 micro-batches
        .csv(path)
    )


def test_windowed_aggregation_streaming_execution(spark, event_stream_dir, tmp_path):
    from nlu_data_warehouse_project_spark.streaming import windowed_event_counts

    agg = windowed_event_counts(_read_stream(spark, event_stream_dir), "1 hour", watermark="10 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    # id-2 duplicate arrives in batch 2 and counts again (no dedup here)
    assert got[("2024-01-01 00:00:00", "click")] == 3
    assert got[("2024-01-01 01:00:00", "click")] == 1


def test_stateful_dedup_across_micro_batches(spark, event_stream_dir, tmp_path):
    stream = _read_stream(spark, event_stream_dir).dropDuplicates(["event_id"])
    q = (
        stream.writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT event_id FROM deduped").collect()
    # the duplicate event_id=2 in the second micro-batch is dropped by
    # the state store carried between micro-batches
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]


def test_streaming_scd2_current_emits_on_change(spark, tmp_path):
    from nlu_data_warehouse_project_spark.streaming import streaming_scd2_current

    d = tmp_path / "scd2stream"
    d.mkdir()
    # batch 0: user 7 -> 1.0, user 8 -> 9.0
    (d / "b0.csv").write_text(
        "event_id,ts,user_id,value\n1,2024-01-01 00:10:00,7,1.0\n2,2024-01-01 00:05:00,8,9.0"
    )
    # batch 1: user 7 changes to 2.0; user 8 re-reports 9.0 (no change)
    (d / "b1.csv").write_text(
        "event_id,ts,user_id,value\n3,2024-01-01 00:20:00,7,2.0\n4,2024-01-01 00:25:00,8,9.0"
    )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(d))
    )
    q = (
        streaming_scd2_current(stream)
        .writeStream.format("memory")
        .queryName("scd2_cur")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [(r["user_id"], r["value"]) for r in spark.sql("SELECT * FROM scd2_cur").collect()]
    # user 7: initial + change = 2 emissions; user 8: initial only
    assert sorted(rows) == [(7, 1.0), (7, 2.0), (8, 9.0)]
