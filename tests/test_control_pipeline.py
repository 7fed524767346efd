"""Control plane (T2/T3 guards, J1 join, J6 upserts) and end-to-end
P1->P2->P3 pipeline over FIXTURES.md F-2 style multi-day snapshots."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.control import ControlPlane
from nlu_data_warehouse_project_spark.functions.calendar import build_date_dim
from nlu_data_warehouse_project_spark.pipeline import DuplicateRunError, Warehouse
from nlu_data_warehouse_project_spark.schemas import (
    FILE_CONFIG_SCHEMA,
    STATUS_EXTRACT_SUCCESS,
    STATUS_LOAD_DW_SUCCESS,
    STATUS_RUNNING,
)

FEED_COLS = ["sku", "product_name", "price", "brand", "material", "shape",
             "dimension", "origin", "quantity_available", "product_url"]


def _feed(spark, rows):
    """rows: list of (sku, name, price, brand) — rest filled."""
    data = [
        (sku, name, price, brand, "Titanium", "Chữ nhật", "54-17-138", "Nhật", "4",
         f"https://example.vn/p/{sku}")
        for (sku, name, price, brand) in rows
    ]
    return spark.createDataFrame(data, FEED_COLS)


def _config_row(spark):
    return spark.createDataFrame(
        [Row(id=1, name="matkinh", source="https://kinhmatviettin.vn",
             source_file_location="daily/", destination_table_staging="matkinh_daily",
             destination_table_dw="dw", bucket_name="b", folder_b2_name="f", bucket_id="x")],
        FILE_CONFIG_SCHEMA,
    )


def test_control_plane_state_machine(spark):
    ctrl = ControlPlane.empty(spark)
    ctrl = ControlPlane(spark, _config_row(spark), ctrl.logs)
    assert ctrl.fetch_config(1)["name"] == "matkinh"
    assert ctrl.fetch_config(99) is None

    ctrl = ctrl.insert_log(1, "f.csv", "2024-12-08", STATUS_RUNNING)
    assert ctrl.has_log(1, "2024-12-08", [STATUS_RUNNING])
    assert not ctrl.has_log(1, "2024-12-09", [STATUS_RUNNING])

    ctrl = ctrl.update_status(1, "2024-12-08", STATUS_EXTRACT_SUCCESS, count=100, file_size_kb=16)
    info = ctrl.fetch_file_info(1, "2024-12-08", STATUS_EXTRACT_SUCCESS)
    assert info is not None
    assert info["count"] == 100 and info["file_size_kb"] == 16
    assert info["destination_table_dw"] == "dw"
    assert ctrl.fetch_file_info(1, "2024-12-08", STATUS_RUNNING) is None


def test_pipeline_three_days_scd2(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    build_date_dim(spark, "2024-12-01", "2024-12-31").write.parquet(wh.date_dim_dir)

    # day 0: k1/k2; duplicate rows in the raw feed (F-1 invariant)
    d0 = _feed(spark, [("S1", "P1", "100", "A"), ("S1", "P1", "100", "A"), ("S2", "P2", "200 ", "B")])
    dw = wh.run_day(d0, 1, "2024-12-08")
    assert dw.count() == 2  # deduped
    assert {r["price"] for r in dw.collect()} == {100, 200}

    # duplicate-run guard trips
    with pytest.raises(DuplicateRunError):
        wh.extract(d0, 1, "2024-12-08")

    # day 1: k1 price changes, k3 appears, k2 vanishes
    d1 = _feed(spark, [("S1", "P1", "150", "A"), ("S3", "P3", "300", "C")])
    dw = wh.run_day(d1, 1, "2024-12-09")
    open_rows = dw.filter(F.col("dt_last_update") == F.lit("9999-12-31").cast("date"))
    assert open_rows.count() == 3  # k1 v2, k2 (kept open), k3
    closed = dw.filter(F.col("dt_last_update") == F.lit("2024-12-09").cast("date"))
    assert closed.count() == 1  # k1 v1

    # J5: surrogate date keys resolved against date_dim (Dec 8 -> id 8)
    k1v1 = dw.filter((F.col("natural_key") == "P1-S1") & (F.col("price") == 100)).first()
    assert k1v1["dt_dim"] == 8
    k1v2 = dw.filter((F.col("natural_key") == "P1-S1") & (F.col("price") == 150)).first()
    assert k1v2["dt_dim"] == 9

    # status reached LWS for both days
    ctrl = wh.control()
    assert ctrl.has_log(1, "2024-12-08", [STATUS_LOAD_DW_SUCCESS])
    assert ctrl.has_log(1, "2024-12-09", [STATUS_LOAD_DW_SUCCESS])


def test_pipeline_guard_requires_prior_stage(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh2"))
    with pytest.raises(DuplicateRunError):
        wh.load_to_staging(1, "2024-12-08")  # no ES row
    with pytest.raises(DuplicateRunError):
        wh.load_to_dw(1, "2024-12-08")  # no LS row


def test_pipeline_failure_marks_sf_and_alerts(spark, tmp_path):
    alerts = []
    wh = Warehouse(spark, str(tmp_path / "wh3"), alert=lambda m, e: alerts.append(m))
    bad = spark.createDataFrame([("x",)], ["not_a_feed_col"])  # missing required cols downstream
    wh.extract(bad, 1, "2024-12-08")
    with pytest.raises(Exception):
        wh.load_to_staging(1, "2024-12-08")
    assert alerts, "alert hook fired"
    # per-stage failure status: staging failures mark SF, not EF, so the
    # retry re-runs staging without re-extracting (ADVICE r1 #1)
    assert wh.control().has_log(1, "2024-12-08", ["SF"])
    # ...and extract refuses to re-run (the landing data is fine)
    with pytest.raises(DuplicateRunError):
        wh.extract(bad, 1, "2024-12-08")
