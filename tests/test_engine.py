"""Engine facade smoke: the public API surface works end to end."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.engine import Engine


def test_engine_facade(spark, sf_smoke):
    eng = Engine(spark)
    assert "q01_pricing_summary" in eng.query_names()
    df = eng.query("q01_pricing_summary", sf_smoke)
    assert df.count() == 6
    assert eng.oracle_sql("q01_pricing_summary") is not None
    assert eng.oracle_sql("q34_lsh_cosine_topk") is None  # approximate: rows-only

    eng.register_tables(sf_smoke)
    assert eng.sql("SELECT count(*) AS n FROM region").first()["n"] == 5

    dd = eng.date_dim("2024-01-01", "2024-01-31")
    assert dd.count() == 31


def test_register_warehouse_sql_views(spark, tmp_path):
    """The reference user's ad-hoc psql becomes eng.sql over registered
    warehouse views: full history, current set, closed history."""
    from nlu_data_warehouse_project_spark.functions.calendar import build_date_dim
    from nlu_data_warehouse_project_spark.pipeline import Warehouse

    eng = Engine(spark)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    build_date_dim(spark, "2024-12-01", "2024-12-31").write.parquet(wh.date_dim_dir)
    feed_cols = ["sku", "product_name", "price", "brand", "material", "shape",
                 "dimension", "origin", "quantity_available", "product_url"]
    f = lambda p: spark.createDataFrame(
        [("S1", "P1", p, "A", "M", "Sh", "D", "O", "1", "u")], feed_cols)
    wh.run_day(f("100"), 1, "2024-12-08")
    wh.run_day(f("150"), 1, "2024-12-09")

    names = eng.register_warehouse(wh, prefix="wh_")
    assert set(names) >= {"wh_dw", "wh_dw_current", "wh_dw_history", "wh_date_dim", "wh_staging"}
    assert eng.sql("SELECT count(*) AS n FROM wh_dw").first()["n"] == 2
    cur = eng.sql("SELECT price FROM wh_dw_current").collect()
    assert [r["price"] for r in cur] == [150]
    hist = eng.sql(
        "SELECT d.price, dd.year FROM wh_dw_history d JOIN wh_date_dim dd ON d.dt_dim = dd.id"
    ).collect()
    assert [(r["price"], r["year"]) for r in hist] == [(100, 2024)]


def test_funnel_requires_strict_stage_order(spark, monkeypatch):
    """A click BEFORE the first view must not advance the funnel."""
    import nlu_data_warehouse_project_spark.queries as Q

    rows = [
        # user 1: proper view -> click -> purchase
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 11:00:00", "click"),
        (1, "2024-01-01 12:00:00", "purchase"),
        # user 2: click precedes the only view -> stuck at 'view'
        (2, "2024-01-01 09:00:00", "click"),
        (2, "2024-01-01 10:00:00", "view"),
        # user 3: view then purchase without click -> stuck at 'view'
        (3, "2024-01-01 10:00:00", "view"),
        (3, "2024-01-01 11:00:00", "purchase"),
        # user 4: never viewed -> not in the funnel at all
        (4, "2024-01-01 10:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(
        [(u, t, e) for u, t, e in rows], "user_id long, ts string, event_type string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    monkeypatch.setattr(Q, "_t", lambda spark, sf_dir, name: ev)
    got = {r["stage"]: r["n_users"] for r in Q.q85_funnel(spark, "unused").collect()}
    assert got == {"purchase": 1, "view": 2}
