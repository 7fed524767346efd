"""Real Structured Streaming execution: the windowed aggregation and
stateful dedup run as actual streams (file source, multiple
micro-batches, state store), not just batch twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


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


def test_streaming_scd2_two_changes_same_run_date(spark, tmp_path):
    """Two value changes for one key within one run_date (two
    micro-batches in one day) must yield two distinct versions — a
    (key, dt_load_to_dw)-keyed reconcile would collapse them and drop
    the newest open row (ADVICE r2); the version_seq key keeps them."""
    from nlu_data_warehouse_project_spark.streaming import (
        scd2_changes_to_table,
        streaming_scd2_changes,
    )

    src = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "changes")

    def run_once():
        sdf = spark.readStream.schema(
            "user_id long, value double, ts timestamp, run_date date"
        ).parquet(src)
        q = (
            streaming_scd2_changes(sdf, run_date_col="run_date")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def snap(value, ts):
        return spark.createDataFrame(
            [(7, value, ts, "2024-01-01")],
            "user_id long, value double, ts string, run_date string",
        ).selectExpr(
            "user_id", "value", "cast(ts as timestamp) ts", "cast(run_date as date) run_date"
        )

    snap(1.0, "2024-01-01 08:00:00").write.mode("append").parquet(src)
    run_once()
    snap(2.0, "2024-01-01 12:00:00").write.mode("append").parquet(src)
    run_once()
    snap(3.0, "2024-01-01 18:00:00").write.mode("append").parquet(src)
    run_once()

    table = scd2_changes_to_table(spark.read.parquet(out))
    got = sorted(
        (r["value"], str(r["dt_load_to_dw"]), str(r["dt_last_update"])) for r in table.collect()
    )
    assert got == [
        (1.0, "2024-01-01", "2024-01-01"),   # closed same day
        (2.0, "2024-01-01", "2024-01-01"),   # second version, also closed same day
        (3.0, "2024-01-01", "9999-12-31"),   # newest open row survives
    ]


def test_scd2_step_pure_transitions():
    """The shared state-transition core both stateful APIs delegate to:
    new key -> open seq 1; change -> close + open seq+1; unchanged ->
    no emission, state kept."""
    import datetime as dt

    from nlu_data_warehouse_project_spark.streaming import _scd2_step

    sentinel = dt.date(9999, 12, 31)
    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)

    st, em = _scd2_step(None, 1.0, d1, sentinel, 7, "user_id", "value")
    assert st == (1.0, "2024-01-01", 1)
    assert em["version_seq"].tolist() == [1] and em["dt_last_update"].tolist() == [sentinel]

    st2, em2 = _scd2_step(st, 1.0, d2, sentinel, 7, "user_id", "value")
    assert st2 is None and em2 is None  # unchanged

    st3, em3 = _scd2_step(st, 2.0, d2, sentinel, 7, "user_id", "value")
    assert st3 == (2.0, "2024-01-02", 2)
    assert em3["value"].tolist() == [1.0, 2.0]
    assert em3["dt_last_update"].tolist() == [d2, sentinel]
    assert em3["version_seq"].tolist() == [1, 2]


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    _has_protobuf(),
    reason="protobuf present: the fail-fast degradation path cannot trigger "
    "(the e2e equivalence test below covers this environment instead)",
)
def test_tws_without_protobuf_fails_fast_with_remedy(spark, tmp_path):
    """Where protobuf is absent (this container — see COVERAGE.md §2.7
    T4), the TWS twin must refuse at CALL time with the remedy named,
    not die opaquely inside an executor once the stream starts."""
    from nlu_data_warehouse_project_spark.streaming import streaming_scd2_changes_tws

    src = tmp_path / "empty-src"
    src.mkdir()
    sdf = spark.readStream.schema(
        "user_id long, value double, ts timestamp, run_date date"
    ).parquet(str(src))
    with pytest.raises(ImportError, match="streaming_scd2_changes"):
        streaming_scd2_changes_tws(sdf)


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas state protocol needs the protobuf package "
    "— EXPECTED skip in this container (documented unsupported-in-container, "
    "COVERAGE.md §2.7 T4); the fail-fast twin test above runs here instead",
)
def test_transform_with_state_scd2_matches_applyinpandas_form(spark, tmp_path):
    """The transformWithStateInPandas twin must emit the same change
    log as the applyInPandasWithState operator for the same snapshots
    (including a same-run_date re-change), reconciling to the same
    table."""
    from nlu_data_warehouse_project_spark.streaming import (
        scd2_changes_to_table,
        streaming_scd2_changes,
        streaming_scd2_changes_tws,
    )

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    src = str(tmp_path / "snaps")

    def run(op, ckpt, out):
        sdf = spark.readStream.schema(
            "user_id long, value double, ts timestamp, run_date date"
        ).parquet(src)
        q = (
            op(sdf, run_date_col="run_date")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def snap(uid, value, ts, day):
        return spark.createDataFrame(
            [(uid, value, ts, day)], "user_id long, value double, ts string, run_date string"
        ).selectExpr(
            "user_id", "value", "cast(ts as timestamp) ts", "cast(run_date as date) run_date"
        )

    batches = [
        [snap(7, 1.0, "2024-01-01 08:00:00", "2024-01-01"), snap(8, 5.0, "2024-01-01 08:00:00", "2024-01-01")],
        [snap(7, 2.0, "2024-01-01 12:00:00", "2024-01-01")],   # same-day re-change
        [snap(7, 3.0, "2024-01-02 09:00:00", "2024-01-02"), snap(8, 5.0, "2024-01-02 09:00:00", "2024-01-02")],
    ]
    outs = {}
    for name, op, provider in (
        ("apip", streaming_scd2_changes, prev_provider),
        ("tws", streaming_scd2_changes_tws,
         "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
    ):
        import shutil

        shutil.rmtree(src, ignore_errors=True)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
        try:
            for i, dfs in enumerate(batches):
                for df in dfs:
                    df.write.mode("append").parquet(src)
                run(op, str(tmp_path / f"ckpt_{name}"), str(tmp_path / f"out_{name}"))
            outs[name] = {
                (r["user_id"], r["value"], str(r["dt_load_to_dw"]),
                 str(r["dt_last_update"]), r["version_seq"])
                for r in spark.read.parquet(str(tmp_path / f"out_{name}")).collect()
            }
        finally:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev_provider)

    assert outs["tws"] == outs["apip"]
    table = scd2_changes_to_table(spark.read.parquet(str(tmp_path / "out_tws")))
    got = sorted((r["user_id"], r["value"], str(r["dt_last_update"])) for r in table.collect())
    assert got == [
        (7, 1.0, "2024-01-01"),
        (7, 2.0, "2024-01-02"),
        (7, 3.0, "9999-12-31"),
        (8, 5.0, "9999-12-31"),
    ]


def test_streaming_scd2_changes_reproduces_batch_merge(spark, sf_smoke, tmp_path):
    """Batch equivalence (VERDICT r1 #9): replaying the q08 event
    snapshots through the stateful close+insert stream and reconciling
    the emission log reproduces the batch scd2_merge table row for
    row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nlu_data_warehouse_project_spark.queries import _D0, _D1, _SNAP_SPLIT, _t, q08_scd2_merge
    from nlu_data_warehouse_project_spark.streaming import (
        scd2_changes_to_table,
        streaming_scd2_changes,
    )

    batch_truth = {
        (r["user_id"], r["value"], str(r["dt_load_to_dw"]), str(r["dt_last_update"]))
        for r in q08_scd2_merge(spark, sf_smoke).collect()
    }

    # the same per-user snapshot rows q08 merges, one file per run day
    ev = _t(spark, sf_smoke, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())

    def snapshot(pred, run_date):
        return (
            ev.filter(pred)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "value", "ts", F.to_date(F.lit(run_date)).alias("run_date"))
        )

    src = str(tmp_path / "snapshots")
    ckpt = str(tmp_path / "ckpt_scd2")
    out = str(tmp_path / "changes")
    split = F.lit(_SNAP_SPLIT).cast("timestamp")

    def run_once():
        sdf = spark.readStream.schema("user_id long, value double, ts timestamp, run_date date").parquet(src)
        q = (
            streaming_scd2_changes(sdf, run_date_col="run_date")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    snapshot(F.col("ts") < split, _D0).write.mode("append").parquet(src)
    run_once()
    snapshot(F.col("ts") >= split, _D1).write.mode("append").parquet(src)
    run_once()

    table = scd2_changes_to_table(spark.read.parquet(out))
    got = {
        (r["user_id"], r["value"], str(r["dt_load_to_dw"]), str(r["dt_last_update"]))
        for r in table.collect()
    }
    assert got == batch_truth


def test_sessionize_events_matches_q21_batch(spark, sf_smoke):
    """Built-in session_window must produce identical per-user session
    counts to the lag-based batch sessionizer on the real events table
    (same 30-minute gap: touching spans merge = split only on >1800s)."""
    from nlu_data_warehouse_project_spark.queries import _t, q21_sessionize
    from nlu_data_warehouse_project_spark.streaming import sessionize_events

    ev = _t(spark, sf_smoke, "events")
    sess = sessionize_events(ev, gap="30 minutes")
    got = {
        (r["user_id"], r["n_sessions"], r["n_events_total"])
        for r in sess.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events_total"),
        )
        .collect()
    }
    want = {
        (r["user_id"], r["n_sessions"], r["n_events_total"])
        for r in q21_sessionize(spark, sf_smoke).select(
            "user_id", "n_sessions", "n_events_total"
        ).collect()
    }
    assert got == want


def test_sessionize_gap_boundary_semantics(spark):
    """An event exactly `gap` after the previous one still MERGES
    (Spark merges touching session spans — matching q21's split-only-on
    `gap > threshold` rule); one second past the gap splits."""
    from nlu_data_warehouse_project_spark.streaming import sessionize_events

    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:30:00"),  # exactly 1800s -> merges (touching spans)
        (2, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:30:01"),  # 1801s -> new session
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = sessionize_events(ev, gap="30 minutes")
    per_user = {r["user_id"]: r["n"] for r in out.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert per_user == {1: 1, 2: 2}


def test_sessionize_streaming_with_watermark(spark, tmp_path):
    """session_window runs as a real watermarked stream: two micro-batches,
    the second extends user 7's open session and opens a new one for 9."""
    from nlu_data_warehouse_project_spark.streaming import sessionize_events

    d = tmp_path / "sess_stream"
    d.mkdir()
    (d / "b0.csv").write_text(
        "event_id,ts,user_id\n1,2024-01-01 00:00:00,7\n2,2024-01-01 00:10:00,7"
    )
    (d / "b1.csv").write_text(
        "event_id,ts,user_id\n3,2024-01-01 00:20:00,7\n4,2024-01-01 05:00:00,9"
    )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(d))
    )
    q = (
        sessionize_events(stream, gap="30 minutes", watermark="10 hours")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # user 7's three events (10-min gaps) are ONE session spanning both
    # micro-batches; user 9 opens its own
    assert got == {
        (7, "2024-01-01 00:00:00", 3),
        (9, "2024-01-01 05:00:00", 1),
    }


def test_sliding_window_streaming_matches_batch(spark, event_stream_dir, tmp_path):
    """1h windows sliding every 30min: the streaming run over 2
    micro-batches must agree with the batch run of the SAME query."""
    from nlu_data_warehouse_project_spark.streaming import windowed_event_counts

    agg = windowed_event_counts(
        _read_stream(spark, event_stream_dir), "1 hour", watermark="10 hours", slide="30 minutes"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("slide_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_slide"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_got = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM slide_counts").collect()
    }
    batch = spark.read.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).option("header", True).csv(event_stream_dir)
    batch_got = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in windowed_event_counts(batch, "1 hour", slide="30 minutes").collect()
    }
    assert stream_got == batch_got
    # overlapping windows: an event at 00:10 appears in the 23:30 AND
    # 00:00 windows
    assert ("2023-12-31 23:30:00", "click") in batch_got


def test_streaming_interval_join_attributes_clicks_to_impressions(spark, tmp_path):
    """Stream-stream inner join with a 15-minute attribution window:
    click at +10m matches, click at +20m does not, clicks BEFORE the
    impression never match, and a second user's click doesn't leak.
    Both sides arrive as real file streams across micro-batches."""
    from nlu_data_warehouse_project_spark.streaming import streaming_interval_join

    imp_dir = tmp_path / "imps"
    clk_dir = tmp_path / "clicks"
    imp_dir.mkdir()
    clk_dir.mkdir()
    (imp_dir / "b0.csv").write_text(
        "imp_id,imp_user,imp_ts\n1,7,2024-01-01 10:00:00\n2,8,2024-01-01 10:00:00"
    )
    (clk_dir / "b0.csv").write_text(
        "click_id,click_user,click_ts\n100,7,2024-01-01 10:10:00"   # +10m: match
    )
    (clk_dir / "b1.csv").write_text(
        "click_id,click_user,click_ts\n"
        "101,7,2024-01-01 10:20:00\n"                               # +20m: outside
        "102,8,2024-01-01 09:55:00\n"                               # before: never
        "103,8,2024-01-01 10:14:00"                                 # +14m user 8: match
    )
    imps = (
        spark.readStream.schema("imp_id long, imp_user long, imp_ts timestamp")
        .option("header", True).option("maxFilesPerTrigger", 1).csv(str(imp_dir))
    )
    clicks = (
        spark.readStream.schema("click_id long, click_user long, click_ts timestamp")
        .option("header", True).option("maxFilesPerTrigger", 1).csv(str(clk_dir))
    )
    joined = streaming_interval_join(
        imps, clicks,
        left_key="imp_user", right_key="click_user",
        left_ts="imp_ts", right_ts="click_ts",
        tolerance="15 minutes",
    )
    q = (
        joined.writeStream.format("memory").queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attrib"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["imp_id"], r["click_id"])
        for r in spark.sql("SELECT imp_id, click_id FROM attrib").collect()
    }
    assert got == {(1, 100), (2, 103)}


def test_streaming_interval_join_refuses_column_collisions(spark, tmp_path):
    from nlu_data_warehouse_project_spark.streaming import streaming_interval_join

    d = tmp_path / "collide"
    d.mkdir()
    (d / "b0.csv").write_text("user_id,ts\n1,2024-01-01 00:00:00")
    a = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("header", True).csv(str(d))
    )
    with pytest.raises(ValueError, match="disjoint"):
        streaming_interval_join(
            a, a, left_key="user_id", right_key="user_id",
            left_ts="ts", right_ts="ts",
        )
