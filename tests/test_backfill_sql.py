"""Backfill semantics (reference: explicit date argv,
`load_to_dw.py:489-497`) and the Spark SQL frontend surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.pipeline import Warehouse
from nlu_data_warehouse_project_spark.sources import register_testdata_views

FEED_COLS = ["sku", "product_name", "price", "brand", "material", "shape",
             "dimension", "origin", "quantity_available", "product_url"]


def _feed(spark, rows):
    data = [(sku, name, price, "B", "M", "Sh", "D", "O", "1", f"u{sku}") for (sku, name, price) in rows]
    return spark.createDataFrame(data, FEED_COLS)


def test_backfill_day_between_loaded_days(spark, tmp_path):
    """A backfill run for a day with no prior log passes the guards and
    merges like any other run (the engine, like the reference, treats
    the supplied date as the run slice — ordering discipline is the
    operator's job)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.run_day(_feed(spark, [("S1", "P1", "100")]), 1, "2024-12-08")
    wh.run_day(_feed(spark, [("S1", "P1", "120")]), 1, "2024-12-10")
    # backfill the missed day 09 with a changed value
    dw = wh.run_day(_feed(spark, [("S1", "P1", "110")]), 1, "2024-12-09")
    rows = sorted(
        ((r["price"], str(r["dt_load_to_dw"]), str(r["dt_last_update"])) for r in dw.collect())
    )
    # three versions exist; the backfilled one becomes the new current
    # (engine applies merges in execution order — documented behavior)
    assert len(rows) == 3
    open_rows = [r for r in rows if r[2] == "9999-12-31"]
    assert open_rows == [(110, "2024-12-09", "9999-12-31")]


def test_spark_sql_frontend_over_registered_views(spark, sf_smoke):
    """The engine's tables are regular temp views: any ANSI SQL the
    reference would send to Postgres runs through spark.sql on the
    same Catalyst plans as the DataFrame API."""
    register_testdata_views(spark, sf_smoke)
    df = spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )
    got = {r["c_mktsegment"]: r["n"] for r in df.collect()}
    assert sum(got.values()) > 0
    # cross-check against the DataFrame-API form
    cust = spark.read.parquet(f"{sf_smoke}/customer.parquet")
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    api = {
        r["c_mktsegment"]: r["n"]
        for r in cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == api
