"""P4 mart stage: star-schema materialization from the SCD2 gold table."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.functions.calendar import build_date_dim
from nlu_data_warehouse_project_spark.pipeline.mart import (
    dim_product,
    fact_inventory,
    materialize_mart,
    report_price_by_brand,
    report_price_history,
)

OPEN = dt.date(9999, 12, 31)


def _dw(spark):
    cols = ("natural_key string, sku string, product_name string, brand string, material string,"
            " shape string, dimension string, origin string, product_url string,"
            " price int, quantity_available int, dt_extract date, dt_dim int,"
            " dt_load_to_dw date, dt_last_update date")
    d8, d9 = dt.date(2024, 12, 8), dt.date(2024, 12, 9)
    rows = [
        # k1: closed v1 + open v2
        ("P1-S1", "S1", "P1", "A", "M", "Sh", "D", "O", "u1", 100, 5, d8, 8, d8, d9),
        ("P1-S1", "S1", "P1", "A", "M", "Sh", "D", "O", "u1", 150, 5, d9, 9, d9, OPEN),
        # k2: open only
        ("P2-S2", "S2", "P2", "B", "M", "Sh", "D", "O", "u2", 200, 2, d8, 8, d8, OPEN),
    ]
    return spark.createDataFrame(rows, cols)


def test_dim_fact_grain(spark):
    dw = _dw(spark)
    dim = dim_product(dw)
    assert dim.count() == 2  # current keys only
    sks = {r["natural_key"]: r["product_sk"] for r in dim.collect()}
    assert sks == {"P1-S1": 1, "P2-S2": 2}  # dense, ordered

    fact = fact_inventory(dw, dim)
    assert fact.count() == 3  # every version is a fact row
    k1 = [r for r in fact.collect() if r["natural_key"] == "P1-S1"]
    assert all(r["product_sk"] == 1 for r in k1)


def test_reports(spark):
    dw = _dw(spark)
    brand = {r["brand"]: r for r in report_price_by_brand(dw).collect()}
    assert brand["A"]["n_products"] == 1 and brand["A"]["avg_price"] == 150.0  # current only
    assert brand[None]["n_products"] == 2  # rollup grand total

    dd = build_date_dim(spark, "2024-12-01", "2024-12-31")
    hist = report_price_history(dw, dd).collect()
    by_key = {(r["year"], r["month_name"], r["brand"]): r["avg_price"] for r in hist}
    assert by_key[(2024, "December", "A")] == 125.0  # both versions over time


def test_materialize_mart_layout(spark, tmp_path):
    dw = _dw(spark)
    dd = build_date_dim(spark, "2024-12-01", "2024-12-31")
    out = str(tmp_path / "mart")
    mart = materialize_mart(dw, dd, out)
    assert set(mart) == {
        "dim_product", "fact_inventory", "report_price_by_brand",
        "report_origin_shape", "report_price_history",
    }
    # fact written date-partitioned for pruning
    reread = spark.read.parquet(f"{out}/fact_inventory")
    assert reread.filter(F.col("dt_load_to_dw") == "2024-12-09").count() == 1


def test_materialize_mart_transactional(spark, tmp_path):
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    dw = _dw(spark)
    dd = build_date_dim(spark, "2024-12-01", "2024-12-31")
    out = str(tmp_path / "mart_tx")
    materialize_mart(dw, dd, out, transactional=True, run_id="d09")
    dim = TxTable(spark, f"{out}/dim_product")
    assert dim.manifest()["version"] == 1
    assert dim.read().count() == 2
    # re-materialization flips atomically to version 2; v1 still reads
    materialize_mart(dw, dd, out, transactional=True, run_id="d10")
    assert dim.manifest()["version"] == 2
    assert dim.read(version=1).count() == 2
