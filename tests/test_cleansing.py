"""Unit tests for the cleanse/standardize expressions (SURVEY.md §2.6
C1-C7, §2.2 P1/P2, §2.5 F1/F2) against FIXTURES.md F-1 style dirt,
including the real reference snapshots in /root/reference/daily when
present."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.functions.cleansing import (
    clean_price,
    cleanse_feed,
    digits_only,
    extract_keyword_field,
    natural_key,
    normalize_description,
    source_domain,
    with_audit_columns,
)
from nlu_data_warehouse_project_spark.operators.cleanse import (
    dedup_keep_first,
    dense_ids,
    repair_nulls,
    with_ingest_order,
)
from nlu_data_warehouse_project_spark.sources import MissingColumnsError, read_feed_csv

REF_DAILY = "/root/reference/daily"


def test_clean_price_currency_strip(spark):
    df = spark.createDataFrame(
        [("7900000 ",), ("7,900,000₫ / 1 chiếc",), ("  123 ",), ("abc",), (None,)], ["price"]
    )
    got = [r[0] for r in df.select(clean_price("price")).collect()]
    assert got == [7900000, 7900000, 123, None, None]


def test_digits_only_quantity(spark):
    df = spark.createDataFrame([("4",), ("Còn 12 chiếc",), ("",), (None,)], ["q"])
    got = [r[0] for r in df.select(digits_only("q")).collect()]
    assert got == [4, 12, 0, 0]


def test_extract_keyword_field(spark):
    desc = "Mã sản phẩm: TF-1850 • Chất liệu: Titanium • Xuất xứ: Trung Quốc • Thông số: 54-17-138"
    df = spark.createDataFrame([(desc,)], ["d"])
    row = df.select(
        extract_keyword_field("d", "Chất liệu").alias("material"),
        extract_keyword_field("d", "Xuất xứ", first_token_only=True).alias("origin"),
        extract_keyword_field("d", "Thông số").alias("dimension"),
        extract_keyword_field("d", "Nothing").alias("missing"),
    ).first()
    assert row["material"] == "Titanium"
    assert row["origin"] == "Trung"
    assert row["dimension"] == "54-17-138"
    assert row["missing"] is None


def test_normalize_description(spark):
    df = spark.createDataFrame([("Thông tin abc",), ("• Thông tin abc",)], ["d"])
    got = [r[0] for r in df.select(normalize_description("d")).collect()]
    assert got == ["• Thông tin abc", "• Thông tin abc"]


def test_natural_key_and_domain(spark):
    df = spark.createDataFrame([Row(product_name="TITANTEC TF-1850", sku="TF-1850 56 C03",
                                    url="https://kinhmatviettin.vn/products/abc")])
    row = df.select(natural_key().alias("nk"), source_domain("url").alias("dom")).first()
    assert row["nk"] == "TITANTEC TF-1850-TF-1850 56 C03"
    assert row["dom"] == "kinhmatviettin.vn"


def test_repair_nulls_sentinels(spark):
    df = spark.createDataFrame([Row(a=None, b=None), Row(a="x", b=5)], "a string, b int")
    got = sorted(repair_nulls(df).collect())
    assert Row(a="N/A", b=-1) in got and Row(a="x", b=5) in got


def test_dedup_keep_first_pins_keeper(spark):
    df = spark.createDataFrame(
        [("k1", 1, "first"), ("k1", 2, "second"), ("k2", 3, "only")],
        ["natural_key", "surrogate_key", "v"],
    )
    got = {r["natural_key"]: r["v"] for r in dedup_keep_first(df, ["natural_key"], ["surrogate_key"]).collect()}
    assert got == {"k1": "first", "k2": "only"}


def test_with_ingest_order_monotonic(spark):
    df = spark.range(100).toDF("x").coalesce(1)
    out = with_ingest_order(df, "sk").collect()
    sks = [r["sk"] for r in out]
    assert sks == sorted(sks) and len(set(sks)) == 100


def test_dense_ids(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",)], ["v"])
    got = {r["v"]: r["id"] for r in dense_ids(df, ["v"]).collect()}
    assert got == {"a": 1, "b": 2, "c": 3}


def test_with_audit_columns(spark):
    df = spark.createDataFrame([("x",)], ["v"])
    row = with_audit_columns(df, 7, "2024-12-08", "2024-12-09").first()
    assert row["id_config"] == 7
    assert str(row["dt_extract"]) == "2024-12-08"
    assert str(row["dt_load"]) == "2024-12-09"


def test_read_feed_csv_missing_columns(spark, tmp_path):
    p = str(tmp_path / "bad.csv")
    spark.createDataFrame([("a",)], ["not_sku"]).write.option("header", True).csv(p)
    with pytest.raises(MissingColumnsError):
        read_feed_csv(spark, p)


@pytest.mark.skipif(not os.path.isdir(REF_DAILY), reason="reference daily snapshots unavailable")
def test_reference_daily_snapshot_cleanse_and_dedup(spark):
    """FIXTURES.md F-1 invariant on the real 2024-12-08 snapshot:
    200 raw rows, 100 distinct natural keys, dedup keeps one per key."""
    path = os.path.join(REF_DAILY, "data_matkinh_daily_2024-12-08_kinhmatviettin.vn.csv")
    if not os.path.exists(path):
        pytest.skip("snapshot file missing")
    raw = read_feed_csv(spark, path)
    assert raw.count() == 200
    silver = dedup_keep_first(
        with_ingest_order(cleanse_feed(raw), "surrogate_key"), ["natural_key"], ["surrogate_key"]
    )
    assert silver.count() == 100
    prices = silver.select("price").where(F.col("price").isNotNull())
    assert prices.count() > 0  # trailing-space prices parsed, not nulled


def test_dedup_within_window_burst_suppression(spark):
    """Rows within the gap of their predecessor are dropped; a burst
    longer than the gap keeps only gap-opening rows (lag semantics,
    same rule as session starts)."""
    import datetime as dt

    from nlu_data_warehouse_project_spark.operators.cleanse import dedup_within_window

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 7, "click", base),                               # kept (first)
        (2, 7, "click", base + dt.timedelta(seconds=30)),    # 30s gap -> dropped
        (3, 7, "click", base + dt.timedelta(seconds=59)),    # 29s gap -> dropped
        (4, 7, "click", base + dt.timedelta(seconds=125)),   # 66s gap -> kept
        (5, 7, "view", base + dt.timedelta(seconds=5)),      # other type -> kept
        (6, 8, "click", base + dt.timedelta(seconds=31)),    # other user -> kept
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, ts timestamp")
    kept = sorted(
        r["event_id"]
        for r in dedup_within_window(ev, ["user_id", "event_type"], "ts", 60, ["event_id"]).collect()
    )
    assert kept == [1, 4, 5, 6]


def test_flagged_token_fraction_whole_token_only(spark):
    from pyspark.sql import functions as F

    from nlu_data_warehouse_project_spark.functions.text import (
        content_safety_gate,
        flagged_token_fraction,
    )

    df = spark.createDataFrame(
        [
            (1, "clean text here"),
            (2, "one badword among four"),
            (3, "scunthorpe badwording is fine"),  # substrings never match
            (4, ""),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: (r["f"], r["keep"])
        for r in df.select(
            "id",
            flagged_token_fraction("text").alias("f"),
            content_safety_gate("text").alias("keep"),
        ).collect()
    }
    assert out[1] == (0.0, True)
    assert out[2] == (0.25, False)
    assert out[3] == (0.0, True)
    assert out[4] == (0.0, True)

    # custom list + soft threshold
    soft = df.select(
        "id", content_safety_gate("text", ["badword"], max_flagged_fraction=0.3).alias("keep")
    )
    assert {r["id"]: r["keep"] for r in soft.collect()}[2] is True


def test_flagged_empty_lexicon_flags_nothing(spark):
    from pyspark.sql import functions as F

    from nlu_data_warehouse_project_spark.functions.text import flagged_token_fraction

    df = spark.createDataFrame([(1, "badword gore slur1")], "id long, text string")
    # an explicitly EMPTY list must not fall back to the placeholder set
    r = df.select(flagged_token_fraction("text", []).alias("f")).first()
    assert r["f"] == 0.0


def test_survivorship_merge_rules(spark):
    from nlu_data_warehouse_project_spark.operators.cleanse import survivorship_merge

    df = spark.createDataFrame(
        [
            ("k1", 3, 100, None, "s3"),     # earliest row's lang is NULL
            ("k1", 1, 80, None, None),      # earliest overall: both NULL
            ("k1", 2, 120, "vi", "s2"),     # first non-null lang
            ("k2", 7, 50, None, None),      # all-null group -> NULL survives
        ],
        "k string, id int, n int, lang string, src string",
    )
    out = {
        r["k"]: r
        for r in survivorship_merge(
            df, ["k"], {"id": "min", "n": "max", "lang": ("first", "id"), "src": ("first", "id")}
        ).collect()
    }
    assert out["k1"]["id"] == 1 and out["k1"]["n"] == 120
    # NULLs in earlier rows fall through to the first non-null
    assert out["k1"]["lang"] == "vi" and out["k1"]["src"] == "s2"
    assert out["k1"]["n_merged"] == 3
    assert out["k2"]["lang"] is None and out["k2"]["n_merged"] == 1

    import pytest as _pytest
    with _pytest.raises(ValueError):
        survivorship_merge(df, ["k"], {"id": "median"})
