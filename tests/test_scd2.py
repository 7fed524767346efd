"""SCD2 merge acceptance tests — FIXTURES.md F-2 day-over-day matrix
(unchanged / changed / new / disappeared / re-changed keys) plus the
reference's all-versions divergence flag (SURVEY.md §3.3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.functions.calendar import build_date_dim
from nlu_data_warehouse_project_spark.operators.scd2 import resolve_date_key, scd2_merge

OPEN = dt.date(9999, 12, 31)
ATTRS = ["price", "brand"]


def _batch(spark, rows):
    return spark.createDataFrame(rows, "natural_key string, price int, brand string")


def _empty_dw(spark):
    return spark.createDataFrame(
        [], "natural_key string, price int, brand string, dt_load_to_dw date, dt_last_update date"
    )


def _merge(dw, batch, day):
    return scd2_merge(dw, batch, key="natural_key", attrs=ATTRS, run_date=day)


def test_scd2_full_matrix(spark):
    d0 = _batch(spark, [("stay", 100, "A"), ("change", 200, "B"), ("vanish", 300, "C")])
    dw1 = _merge(_empty_dw(spark), d0, "2024-12-08")
    rows1 = {(r["natural_key"], r["dt_last_update"]) for r in dw1.collect()}
    # day 0: everything inserted open, stamped with run date
    assert rows1 == {("stay", OPEN), ("change", OPEN), ("vanish", OPEN)}
    assert {str(r["dt_load_to_dw"]) for r in dw1.collect()} == {"2024-12-08"}

    # day 1: stay unchanged, change changes, vanish disappears, new arrives
    d1 = _batch(spark, [("stay", 100, "A"), ("change", 250, "B"), ("new", 400, "D")])
    dw2 = _merge(dw1, d1, "2024-12-09")
    got = {(r["natural_key"], r["price"], str(r["dt_last_update"]), str(r["dt_load_to_dw"])) for r in dw2.collect()}
    assert got == {
        ("stay", 100, "9999-12-31", "2024-12-08"),       # untouched
        ("vanish", 300, "9999-12-31", "2024-12-08"),     # absent -> stays open
        ("change", 200, "2024-12-09", "2024-12-08"),     # old version closed
        ("change", 250, "9999-12-31", "2024-12-09"),     # new version open
        ("new", 400, "9999-12-31", "2024-12-09"),        # J2 insert-new
    }

    # day 2: re-change 'change' — intended semantics: exactly ONE new
    # version (compare against current only), total 3 versions for key
    d2 = _batch(spark, [("change", 275, "B")])
    dw3 = _merge(dw2, d2, "2024-12-10")
    versions = dw3.filter(F.col("natural_key") == "change").collect()
    assert len(versions) == 3
    open_rows = [r for r in versions if r["dt_last_update"] == OPEN]
    assert len(open_rows) == 1 and open_rows[0]["price"] == 275


def test_scd2_idempotent_on_unchanged_batch(spark):
    d0 = _batch(spark, [("k", 1, "A")])
    dw1 = _merge(_empty_dw(spark), d0, "2024-01-01")
    dw2 = _merge(dw1, d0, "2024-01-02")
    rows = dw2.collect()
    assert len(rows) == 1 and rows[0]["dt_last_update"] == OPEN
    assert str(rows[0]["dt_load_to_dw"]) == "2024-01-01"


def test_scd2_compat_all_versions_quirk(spark):
    """Reference J3 compares against ALL versions (`load_to_dw.py:270-281`):
    a key with 2 history versions differing from today's row inserts 2
    duplicate new versions."""
    d0 = _batch(spark, [("k", 1, "A")])
    dw1 = _merge(_empty_dw(spark), d0, "2024-01-01")
    dw2 = _merge(dw1, _batch(spark, [("k", 2, "A")]), "2024-01-02")
    # now 2 versions exist (closed v1, open v2); change again with compat on
    dw3 = scd2_merge(dw2, _batch(spark, [("k", 3, "A")]), key="natural_key",
                     attrs=ATTRS, run_date="2024-01-03", compat_all_versions=True)
    inserted = dw3.filter((F.col("price") == 3) & (F.col("dt_last_update") == F.lit("9999-12-31").cast("date")))
    assert inserted.count() == 2  # the quirk: one per differing version


def test_resolve_date_key_broadcast_lookup(spark):
    date_dim = build_date_dim(spark, "2024-12-01", "2024-12-31")
    dw = spark.createDataFrame(
        [("k", dt.date(2024, 12, 8)), ("k2", dt.date(2024, 12, 9)), ("k3", dt.date(2030, 1, 1))],
        "natural_key string, dt_extract date",
    ).withColumn("dt_dim", F.lit(None).cast("int"))
    out = {r["natural_key"]: r["dt_dim"] for r in resolve_date_key(dw, date_dim).collect()}
    assert out["k"] == 8 and out["k2"] == 9
    assert out["k3"] is None  # out-of-range date -> no surrogate


def test_scd3_merge_full_matrix(spark):
    """SCD type-3 (r13): new key inserts with NULL prev; a changed key
    shifts current->prev and stamps the run date; an unchanged key is a
    strict no-op (prev and date keep their OLD values); a key absent
    from the batch is untouched; all tracked attrs shift TOGETHER on
    one change event."""
    import datetime as _dt

    from nlu_data_warehouse_project_spark.operators.scd2 import scd3_merge

    empty = spark.createDataFrame(
        [], "k string, price double, size string, "
            "price_prev double, size_prev string, dt_last_update date"
    )
    b0 = spark.createDataFrame(
        [("a", 1.0, "S"), ("b", 2.0, "M")], "k string, price double, size string"
    )
    d1 = scd3_merge(empty, b0, key="k", attrs=["price", "size"], run_date="2024-01-01")
    rows = {r["k"]: r for r in d1.collect()}
    assert rows["a"]["price"] == 1.0 and rows["a"]["price_prev"] is None
    assert rows["a"]["dt_last_update"] == _dt.date(2024, 1, 1)

    # day 2: a changes price only (both attrs shift), b unchanged, c new
    b1 = spark.createDataFrame(
        [("a", 9.0, "S"), ("b", 2.0, "M"), ("c", 3.0, "L")],
        "k string, price double, size string",
    )
    d2 = scd3_merge(d1, b1, key="k", attrs=["price", "size"], run_date="2024-02-02")
    rows = {r["k"]: r for r in d2.collect()}
    assert rows["a"]["price"] == 9.0 and rows["a"]["price_prev"] == 1.0
    assert rows["a"]["size"] == "S" and rows["a"]["size_prev"] == "S"
    assert rows["a"]["dt_last_update"] == _dt.date(2024, 2, 2)
    # unchanged key: prev stays NULL, date stays day-1 (no-op merge)
    assert rows["b"]["price_prev"] is None
    assert rows["b"]["dt_last_update"] == _dt.date(2024, 1, 1)
    assert rows["c"]["price"] == 3.0 and rows["c"]["price_prev"] is None

    # day 3: batch without a or c -> both untouched; a second change to
    # a key OVERWRITES prev (type-3 keeps only the last transition)
    b2 = spark.createDataFrame([("b", 7.0, "XL")], "k string, price double, size string")
    d3 = scd3_merge(d2, b2, key="k", attrs=["price", "size"], run_date="2024-03-03")
    rows = {r["k"]: r for r in d3.collect()}
    assert rows["a"]["price"] == 9.0 and rows["a"]["price_prev"] == 1.0
    assert rows["b"]["price"] == 7.0 and rows["b"]["price_prev"] == 2.0
    assert rows["b"]["size_prev"] == "M" and rows["b"]["dt_last_update"] == _dt.date(2024, 3, 3)
    assert set(rows) == {"a", "b", "c"}
