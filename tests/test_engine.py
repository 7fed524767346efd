"""Engine facade smoke: the public API surface works end to end."""

from __future__ import annotations

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
