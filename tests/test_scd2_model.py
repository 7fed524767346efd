"""Model-based SCD2 testing: hypothesis generates random multi-day
snapshot sequences; the Spark merge chain must match a 20-line Python
reference model on every (key, value, load, last_update) row.

This is the deep-coverage complement to the example matrix in
test_scd2.py: instead of hand-picked transitions, every reachable
combination of unchanged / changed / new / disappeared / re-changed /
value-reverted keys across up to 4 days gets exercised."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nlu_data_warehouse_project_spark.operators.scd2 import scd2_merge

OPEN = dt.date(9999, 12, 31)
KEYS = ["k1", "k2", "k3"]
DAYS = ["2024-12-08", "2024-12-09", "2024-12-10", "2024-12-11"]

# one snapshot: a subset of keys, each with a small-int value
snapshot = st.dictionaries(st.sampled_from(KEYS), st.integers(0, 3), max_size=len(KEYS))
sequences = st.lists(snapshot, min_size=1, max_size=4)


def model_scd2(snaps: list[dict[str, int]]) -> set[tuple]:
    """Reference model: (key, value, load_date, last_update) rows after
    merging each day's snapshot in order.  A key disappearing from a
    snapshot stays open (reference semantics); a changed value closes
    the current row at the run date and opens a new one."""
    current: dict[str, tuple[int, str]] = {}  # key -> (value, load_day)
    closed: list[tuple] = []
    for day, snap in zip(DAYS, snaps):
        for key, value in snap.items():
            if key not in current:
                current[key] = (value, day)
            else:
                cur_v, cur_load = current[key]
                if cur_v != value:
                    closed.append((key, cur_v, cur_load, day))
                    current[key] = (value, day)
    rows = {(k, v, load, "9999-12-31") for k, (v, load) in current.items()}
    rows |= set(closed)
    return rows


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(sequences)
def test_scd2_merge_matches_model(spark, snaps):
    dw = spark.createDataFrame(
        [], "natural_key string, value int, dt_load_to_dw date, dt_last_update date"
    )
    for day, snap in zip(DAYS, snaps):
        batch = spark.createDataFrame(
            [(k, v) for k, v in snap.items()], "natural_key string, value int"
        )
        dw = scd2_merge(dw, batch, key="natural_key", attrs=["value"], run_date=day).persist()

    got = {
        (r["natural_key"], r["value"], str(r["dt_load_to_dw"]), str(r["dt_last_update"]))
        for r in dw.collect()
    }
    assert got == model_scd2(snaps)
