"""Bucketed range join ≡ naive theta join, and as-of equal-ts
determinism (VERDICT r1 #4, ADVICE r1 #2)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.operators.asof import asof_join
from nlu_data_warehouse_project_spark.operators.rangejoin import range_pairs_within


def _ev(spark, rows):
    """rows: (user_id, event_id, seconds-offset)"""
    base = dt.datetime(2024, 1, 1)
    data = [(u, e, base + dt.timedelta(seconds=s)) for (u, e, s) in rows]
    return spark.createDataFrame(data, "user_id long, event_id long, ts timestamp")


def test_range_pairs_match_naive_join(spark):
    # crafted to exercise: same-bucket pair, boundary-crossing pair,
    # exactly-delta pair (inclusive), just-over-delta non-pair, and a
    # second user that must never cross-pair
    ev = _ev(
        spark,
        [
            (1, 10, 0), (1, 11, 30),    # same bucket
            (1, 12, 59),                # 59s after e10 -> pair; 29 after e11
            (1, 13, 119),               # 60s after e12 (inclusive edge), 89 after e11
            (1, 14, 181),               # 62s after e13 -> NOT a pair
            (2, 20, 1), (2, 21, 50),    # other user
        ],
    )
    naive = (
        ev.alias("a")
        .join(
            ev.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 60 SECONDS")),
        )
        .select(F.col("a.event_id").alias("ea"), F.col("b.event_id").alias("eb"))
    )
    bucketed = range_pairs_within(ev, key="user_id", ts_col="ts", delta_seconds=60).select(
        F.col("a_event_id").alias("ea"), F.col("b_event_id").alias("eb")
    )
    want = {tuple(r) for r in naive.collect()}
    got = {tuple(r) for r in bucketed.collect()}
    assert got == want
    assert (10, 12) in got and (12, 13) in got  # boundary + inclusive edge
    assert (13, 14) not in got


def test_range_join_plan_is_equi_not_nested_loop(spark):
    ev = _ev(spark, [(1, 10, 0), (1, 11, 30)])
    pairs = range_pairs_within(ev, key="user_id", ts_col="ts", delta_seconds=60)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:800]


def test_asof_equal_ts_right_rows_resolve_by_tiebreak(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, base + dt.timedelta(seconds=10))], "user_id long, ts timestamp")
    right = spark.createDataFrame(
        [
            (1, base, 7, "first"),
            (1, base, 9, "last"),    # same ts, higher id -> must win
            (1, base, 8, "middle"),
        ],
        "user_id long, view_ts timestamp, view_event_id long, label string",
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="view_ts", tiebreak="view_event_id"
    ).collect()
    assert len(out) == 1
    assert out[0]["label"] == "last" and out[0]["view_event_id"] == 9


def test_scd2_pit_join_boundaries(spark):
    """Point-in-time semantics: a fact dated ON a close date matches
    the successor version (same-day close+insert), facts inside an
    interval match that version, pre-history facts carry NULLs, and
    every fact emits exactly one row when versions partition time."""
    from nlu_data_warehouse_project_spark.operators.asof import scd2_pit_join

    dim = spark.createDataFrame(
        [
            (7, 1.0, "2024-01-01", "2024-01-10"),   # v1: [01-01, 01-10)
            (7, 2.0, "2024-01-10", "9999-12-31"),   # v2: [01-10, open)
        ],
        "user_id long, dim_value double, dt_load_to_dw string, dt_last_update string",
    ).select(
        "user_id", "dim_value",
        F.col("dt_load_to_dw").cast("date").alias("dt_load_to_dw"),
        F.col("dt_last_update").cast("date").alias("dt_last_update"),
    )
    facts = spark.createDataFrame(
        [
            (1, 7, "2023-12-31 09:00:00"),  # pre-history -> NULL
            (2, 7, "2024-01-01 00:00:00"),  # first instant of v1
            (3, 7, "2024-01-09 23:59:59"),  # last instant of v1
            (4, 7, "2024-01-10 00:00:00"),  # close date -> v2
            (5, 7, "2030-01-01 12:00:00"),  # far future -> open v2
            (6, 8, "2024-01-05 00:00:00"),  # unknown key -> NULL
        ],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    rows = {r["event_id"]: r["dim_value"] for r in scd2_pit_join(facts, dim, "user_id").collect()}
    assert rows == {1: None, 2: 1.0, 3: 1.0, 4: 2.0, 5: 2.0, 6: None}
    # exactly one output row per fact
    assert scd2_pit_join(facts, dim, "user_id").count() == 6


def test_interval_overlap_pairs_exactly_once_and_excludes_disjoint(spark):
    from nlu_data_warehouse_project_spark.operators.rangejoin import interval_overlap_pairs

    mk = lambda rows: spark.createDataFrame(
        rows, "iid long, start_ts string, end_ts string"
    ).select(
        "iid",
        F.col("start_ts").cast("timestamp").alias("start_ts"),
        F.col("end_ts").cast("timestamp").alias("end_ts"),
    )
    # long interval spanning many buckets × short ones: each overlapping
    # pair must appear EXACTLY once despite sharing several buckets
    left = mk([(1, "2024-01-01 00:00:00", "2024-01-01 12:00:00")])
    right = mk([
        (10, "2024-01-01 03:00:00", "2024-01-01 04:00:00"),   # inside
        (11, "2024-01-01 11:30:00", "2024-01-01 13:00:00"),   # straddles the end
        (12, "2024-01-01 12:00:00", "2024-01-01 14:00:00"),   # touches (closed) at 12:00
        (13, "2024-01-01 15:00:00", "2024-01-01 16:00:00"),   # disjoint
        (14, "2023-12-31 20:00:00", "2024-01-01 00:00:00"),   # touches at the start
    ])
    out = interval_overlap_pairs(left, right, "start_ts", "end_ts", bucket_seconds=3600)
    pairs = sorted((r["a_iid"], r["b_iid"]) for r in out.collect())
    assert pairs == [(1, 10), (1, 11), (1, 12), (1, 14)]

    # inverted interval fails fast instead of silently matching nothing
    import pytest as _pytest

    bad = mk([(9, "2024-01-02 00:00:00", "2024-01-01 00:00:00")])
    with _pytest.raises(Exception, match="inverted|wider"):
        interval_overlap_pairs(bad, right, "start_ts", "end_ts", bucket_seconds=3600).collect()


def test_interval_overlap_skips_null_timestamps(spark):
    from nlu_data_warehouse_project_spark.operators.rangejoin import interval_overlap_pairs

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-01 02:00:00"), (2, None, "2024-01-01 01:00:00")],
        "iid long, start_ts string, end_ts string",
    ).select("iid", F.col("start_ts").cast("timestamp").alias("start_ts"),
             F.col("end_ts").cast("timestamp").alias("end_ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 01:00:00", "2024-01-01 03:00:00")],
        "iid long, start_ts string, end_ts string",
    ).select("iid", F.col("start_ts").cast("timestamp").alias("start_ts"),
             F.col("end_ts").cast("timestamp").alias("end_ts"))
    # the NULL-start row is skipped, not a job-killing 'inverted' error
    out = interval_overlap_pairs(left, right, "start_ts", "end_ts", bucket_seconds=3600)
    assert sorted((r["a_iid"], r["b_iid"]) for r in out.collect()) == [(1, 10)]


def test_asof_strict_excludes_equal_ts_right_rows(spark):
    """strict=True is attribution semantics: a right row AT the left
    timestamp must not match; earlier rows still carry forward."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, base), (1, base + dt.timedelta(seconds=5))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, base - dt.timedelta(seconds=60), 1, "earlier"), (1, base, 2, "same-instant")],
        "user_id long, click_ts timestamp, click_id long, label string",
    )
    strict = {
        r["ts"]: r["label"]
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="click_ts",
            tiebreak="click_id", strict=True,
        ).collect()
    }
    # at ts==base the same-instant click is invisible; 5s later it matches
    assert strict[base] == "earlier"
    assert strict[base + dt.timedelta(seconds=5)] == "same-instant"

    default = {
        r["ts"]: r["label"]
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="click_ts",
            tiebreak="click_id",
        ).collect()
    }
    assert default[base] == "same-instant"  # <= semantics unchanged
