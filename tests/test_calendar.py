"""Golden test: the native calendar generator must reproduce the
reference's shipped date_dim.csv row-for-row (all 7,671 rows x 20
columns), including the Sunday-start week variant and the cumulative
day/month/quarter indexes (SURVEY.md §2.6 D1-D12, risk register items
1/6)."""

from __future__ import annotations

import csv
import os

import pytest

from nlu_data_warehouse_project_spark.functions.calendar import build_date_dim

REF_CSV = "/root/reference/date_dim.csv"

COLS = [
    "id", "full_date", "day_of_month", "month", "day_name", "month_name",
    "year", "start_of_week", "day_of_week", "day_of_year", "iso_week",
    "iso_week_year", "start_of_iso_week", "iso_week_alt",
    "iso_week_year_alt", "start_of_iso_alt", "quarter", "quarter_num",
    "holiday_flag", "is_weekend",
]


@pytest.mark.skipif(not os.path.exists(REF_CSV), reason="reference CSV unavailable")
def test_date_dim_matches_reference_golden(spark):
    golden = {row[0]: dict(zip(COLS, row)) for row in csv.reader(open(REF_CSV, encoding="utf-8"))}
    mine = build_date_dim(spark).collect()
    assert len(mine) == len(golden) == 7671
    mismatches = []
    for r in mine:
        ref = golden[str(r["id"])]
        for k in COLS:
            val = "" if r[k] is None else str(r[k])
            if val != ref[k]:
                mismatches.append((r["id"], k, val, ref[k]))
    assert not mismatches, f"first mismatches: {mismatches[:5]} (total {len(mismatches)})"


def test_date_dim_custom_range_and_holidays(spark):
    dd = build_date_dim(spark, "2024-01-01", "2024-01-10", holidays=["2024-01-01"]).collect()
    assert len(dd) == 10
    byid = {r["id"]: r for r in dd}
    assert byid[1]["holiday_flag"] == "Holiday"
    assert byid[2]["holiday_flag"] == "Non-Holiday"
    # 2024-01-06 is a Saturday
    assert byid[6]["is_weekend"] == "Weekend"
    assert byid[1]["quarter_num"] == 1 and byid[1]["month"] == 1
