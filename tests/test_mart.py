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


def test_refresh_mart_matches_full_rebuild(spark, tmp_path):
    """Incremental refresh (VERDICT r2 #6): refreshing after every
    pipeline day — reading only the gold current set + that day's
    closed delta — must produce tables row-identical to a full rebuild
    from the complete gold history."""
    from nlu_data_warehouse_project_spark.pipeline import Warehouse
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    wh = Warehouse(spark, str(tmp_path / "wh"))
    dd = build_date_dim(spark, "2024-12-01", "2024-12-31")
    dd.write.parquet(wh.date_dim_dir)

    feed_cols = ["sku", "product_name", "price", "brand", "material", "shape",
                 "dimension", "origin", "quantity_available", "product_url"]

    def feed(rows):
        return spark.createDataFrame(
            [(sku, name, price, brand, "M", "Sh", "D", "O", "1", f"u{sku}")
             for (sku, name, price, brand) in rows],
            feed_cols,
        )

    days = [
        ("2024-12-08", [("S1", "P1", "100", "A"), ("S2", "P2", "200", "B")]),
        ("2024-12-09", [("S1", "P1", "150", "A")]),                       # change S1
        ("2024-12-10", [("S1", "P1", "175", "A"), ("S3", "P3", "300", "A")]),  # change + new key
    ]
    mart_dir = str(tmp_path / "mart_inc")
    for day, rows in days:
        wh.run_day(feed(rows), 1, day)
        wh.refresh_mart(mart_dir, run_id=day)  # Warehouse P4 passthrough

    full = materialize_mart(
        wh.read_dw(), dd, str(tmp_path / "mart_full"), stable_sk=True
    )

    def rows_of(df):
        return sorted(tuple(str(v) for v in r) for r in df.select(*sorted(df.columns)).collect())

    for name, full_df in full.items():
        inc_df = TxTable(spark, f"{mart_dir}/{name}").read()
        assert rows_of(inc_df) == rows_of(full_df), f"{name} diverged from the full rebuild"


def test_refresh_mart_survives_maintenance_cycle(spark, tmp_path):
    """The maintenance cadence (VERDICT r6 #6): run_day → refresh_mart →
    Warehouse.maintain (compaction + vacuum) must leave the incremental
    refresh working — the compacted dir's recorded lineage marks it
    consumed — and the tables row-identical to a full rebuild."""
    from nlu_data_warehouse_project_spark.pipeline import Warehouse
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    wh = Warehouse(spark, str(tmp_path / "wh"))
    dd = build_date_dim(spark, "2024-12-01", "2024-12-31")
    dd.write.parquet(wh.date_dim_dir)
    feed_cols = ["sku", "product_name", "price", "brand", "material", "shape",
                 "dimension", "origin", "quantity_available", "product_url"]

    def feed(rows):
        return spark.createDataFrame(
            [(sku, name, price, brand, "M", "Sh", "D", "O", "1", f"u{sku}")
             for (sku, name, price, brand) in rows],
            feed_cols,
        )

    days = [
        ("2024-12-08", [("S1", "P1", "100", "A"), ("S2", "P2", "200", "B")]),
        ("2024-12-09", [("S1", "P1", "150", "A")]),
        ("2024-12-10", [("S1", "P1", "175", "A"), ("S3", "P3", "300", "A")]),
        ("2024-12-11", [("S2", "P2", "250", "B")]),
    ]
    mart_dir = str(tmp_path / "mart_inc")
    for i, (day, rows) in enumerate(days):
        wh.run_day(feed(rows), 1, day)
        wh.refresh_mart(mart_dir, run_id=day)
        if i == 1:  # mid-series maintenance: folds the 2 consumed dirs
            out = wh.maintain(min_dirs=2, retain_last=1)
            assert out["compacted_version"] is not None
            assert out["vacuumed"], "vacuum reclaimed the superseded dirs"
            man = wh.gold().manifest()
            assert len(man["closed"]) == 1 and man["closed"][0] in man["compacted_lineage"]

    # a second maintenance after the series also folds cleanly
    assert wh.maintain(min_dirs=2, retain_last=1)["compacted_version"] is not None
    wh.run_day(feed([("S3", "P3", "350", "A")]), 1, "2024-12-12")
    wh.refresh_mart(mart_dir, run_id="2024-12-12")

    full = materialize_mart(wh.read_dw(), dd, str(tmp_path / "mart_full"), stable_sk=True)

    def rows_of(df):
        return sorted(tuple(str(v) for v in r) for r in df.select(*sorted(df.columns)).collect())

    for name, full_df in full.items():
        inc_df = TxTable(spark, f"{mart_dir}/{name}").read()
        assert rows_of(inc_df) == rows_of(full_df), f"{name} diverged after maintenance"


def test_run_cycle_orders_refresh_before_maintain(spark, tmp_path):
    """run_cycle performs run_day → refresh_mart → maintain, so
    compaction only ever folds mart-consumed dirs and the incremental
    refresh never hits the mixed-compaction error."""
    from nlu_data_warehouse_project_spark.pipeline import Warehouse
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    wh = Warehouse(spark, str(tmp_path / "whc"))
    dd = build_date_dim(spark, "2024-12-01", "2024-12-31")
    dd.write.parquet(wh.date_dim_dir)
    feed_cols = ["sku", "product_name", "price", "brand", "material", "shape",
                 "dimension", "origin", "quantity_available", "product_url"]

    def feed(price):
        return spark.createDataFrame(
            [("S1", "P1", price, "A", "M", "Sh", "D", "O", "1", "u")], feed_cols
        )

    mart_dir = str(tmp_path / "mart")
    for day, price in [("2024-12-08", "100"), ("2024-12-09", "150"), ("2024-12-10", "175")]:
        wh.run_cycle(feed(price), 1, day, mart_dir=mart_dir, maintain_every=2)

    # gold was compacted mid-series yet the mart kept refreshing; the
    # final fact matches a full rebuild
    full = materialize_mart(wh.read_dw(), dd, str(tmp_path / "mf"), stable_sk=True)
    inc = TxTable(spark, f"{mart_dir}/fact_inventory").read()
    assert sorted(str(r["price"]) for r in inc.collect()) == sorted(
        str(r["price"]) for r in full["fact_inventory"].collect()
    )
    assert len(wh.gold().manifest()["closed"]) < 3  # compaction actually ran


def test_refresh_mart_refuses_stale_bookkeeping_after_compaction(spark, tmp_path):
    """Gold compaction invalidates the consumed-dir bookkeeping; the
    refresh must say so instead of silently double-counting."""
    import pytest

    from nlu_data_warehouse_project_spark.pipeline import Warehouse
    from nlu_data_warehouse_project_spark.pipeline.mart import refresh_mart

    wh = Warehouse(spark, str(tmp_path / "wh"))
    dd = build_date_dim(spark, "2024-12-01", "2024-12-31")
    dd.write.parquet(wh.date_dim_dir)
    f = spark.createDataFrame(
        [("S1", "P1", "100", "A", "M", "Sh", "D", "O", "1", "u1")],
        ["sku", "product_name", "price", "brand", "material", "shape",
         "dimension", "origin", "quantity_available", "product_url"],
    )
    f2 = spark.createDataFrame(
        [("S1", "P1", "150", "A", "M", "Sh", "D", "O", "1", "u1")], f.columns
    )
    wh.run_day(f, 1, "2024-12-08")
    mart_dir = str(tmp_path / "mart")
    refresh_mart(wh.gold(), dd, mart_dir, run_id="d08")
    wh.run_day(f2, 1, "2024-12-09")
    wh.gold().compact_closed(min_dirs=1)
    with pytest.raises(RuntimeError, match="compacted"):
        refresh_mart(wh.gold(), dd, mart_dir, run_id="d09")


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
