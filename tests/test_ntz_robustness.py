"""TIMESTAMP_NTZ input robustness (ADVICE r5): the testdata's events.ts
changed from TIMESTAMP(NANOS) to plain timestamp[us], which Spark 4's
inferTimestampNTZ default decodes as TIMESTAMP_NTZ.  unix_micros /
cast('long') reject NTZ, so every time-keyed operator must normalize —
these tests pin that each one accepts NTZ input directly, and that
``_t()`` hands LTZ timestamps to the query catalog regardless of how
the parquet decodes.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.operators.cleanse import dedup_within_window
from nlu_data_warehouse_project_spark.operators.rangejoin import range_pairs_within
from nlu_data_warehouse_project_spark.queries import _t


def _ev_ntz(spark, rows):
    """rows: (user_id, event_id, seconds-offset) with an NTZ ts column."""
    base = dt.datetime(2024, 1, 1)
    data = [(u, e, base + dt.timedelta(seconds=s)) for (u, e, s) in rows]
    return spark.createDataFrame(data, "user_id long, event_id long, ts timestamp_ntz")


def test_t_events_yields_ltz_timestamp(spark, sf_smoke):
    ev = _t(spark, sf_smoke, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # and the values survive: unix_micros analysis + a concrete row
    assert ev.select(F.unix_micros("ts").alias("us")).first()["us"] is not None


def test_range_pairs_accepts_ntz_input(spark):
    ev = _ev_ntz(spark, [(1, 10, 0), (1, 11, 30), (1, 12, 100)])
    got = {
        (r["a_event_id"], r["b_event_id"])
        for r in range_pairs_within(ev, key="user_id", ts_col="ts", delta_seconds=60).collect()
    }
    assert got == {(10, 11)}


def test_dedup_within_window_accepts_ntz_input(spark):
    ev = _ev_ntz(spark, [(1, 10, 0), (1, 11, 30), (1, 12, 120)])
    kept = {r["event_id"] for r in dedup_within_window(ev, ["user_id"], "ts", 60).collect()}
    assert kept == {10, 12}
