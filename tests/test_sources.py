"""Source/sink surface tests (SURVEY.md §2.1 S2/S3/S5/S7/S8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.sources import (
    file_info,
    landing_path,
    read_feed_csv,
    read_landing,
    table_exists,
    write_landing,
    write_table,
)

FEED_COLS = ["sku", "product_name", "price", "brand", "material", "shape",
             "dimension", "origin", "quantity_available", "product_url"]


def _feed(spark, n=4):
    rows = [(f"S{i}", f"P{i}", "100", "B", "M", "Sh", "D", "O", "1", f"u{i}") for i in range(n)]
    return spark.createDataFrame(rows, FEED_COLS)


def test_landing_roundtrip_and_partition_columns(spark, tmp_path):
    base = str(tmp_path / "landing")
    write_landing(_feed(spark, 4), base, 1, "2024-12-08")
    write_landing(_feed(spark, 2), base, 2, "2024-12-09")
    allrows = read_landing(spark, base)
    assert allrows.count() == 6
    # partition columns materialized from the directory layout
    assert {"id_config", "dt"} <= set(allrows.columns)
    assert allrows.filter((F.col("id_config") == 2)).count() == 2

    # single-slice read via the path convention
    one = read_feed_csv(spark, landing_path(base, 1, "2024-12-08"))
    assert one.count() == 4


def test_file_info_count_and_size(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _feed(spark, 10)
    write_table(df, path)
    info = file_info(spark, spark.read.parquet(path), path)
    assert info["count"] == 10
    assert info["file_size_kb"] and info["file_size_kb"] > 0


def test_table_exists_probe(spark, tmp_path):
    path = str(tmp_path / "maybe")
    assert not table_exists(spark, path)
    write_table(_feed(spark, 1), path)
    assert table_exists(spark, path)


def test_write_table_append_vs_overwrite(spark, tmp_path):
    path = str(tmp_path / "modes")
    write_table(_feed(spark, 3), path)
    write_table(_feed(spark, 2), path, mode="append")
    assert spark.read.parquet(path).count() == 5
    write_table(_feed(spark, 1), path, mode="overwrite")
    assert spark.read.parquet(path).count() == 1


def test_upsert_and_delete(spark):
    from pyspark.sql import functions as F

    from nlu_data_warehouse_project_spark.operators.upsert import delete_where, upsert

    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"])
    updates = spark.createDataFrame([(2, "B"), (4, "d")], ["id", "v"])
    merged = {r["id"]: r["v"] for r in upsert(target, updates, ["id"]).collect()}
    assert merged == {1: "a", 2: "B", 3: "c", 4: "d"}

    import pytest

    with pytest.raises(ValueError):
        upsert(target, updates.withColumnRenamed("v", "w"), ["id"])

    left = {r["id"] for r in delete_where(target, F.col("id") == 2).collect()}
    assert left == {1, 3}


def test_jsonl_roundtrip_and_corrupt_quarantine(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from nlu_data_warehouse_project_spark.sources import (
        read_jsonl,
        read_jsonl_quarantined,
        write_jsonl,
    )

    raw = tmp_path / "in.jsonl"
    raw.write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        "this line is not json\n"
        "\n"
        '{"doc_id": 2, "text": "beta"}\n'
        '{"doc_id": 3, "text": null}\n'
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    good, bad = read_jsonl_quarantined(spark, str(raw), schema, required=["doc_id", "text"])

    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2, 3]
    assert "_corrupt_record" not in good.columns
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and bad_rows[0]["raw_line"] == "this line is not json"

    out = tmp_path / "out"
    write_jsonl(good, str(out))
    back, back_bad = read_jsonl_quarantined(spark, str(out), schema)
    assert back_bad.count() == 0
    assert sorted((r["doc_id"], r["text"]) for r in back.collect()) == [
        (1, "alpha"), (2, "beta"), (3, None),
    ]
    # the plain reader agrees on clean input
    plain = read_jsonl(spark, str(out), schema=schema)
    assert plain.count() == 3


def test_write_jsonl_partitioned_by_split(spark, tmp_path):
    import os

    from nlu_data_warehouse_project_spark.sources import write_jsonl

    df = spark.createDataFrame(
        [(1, "a", "train"), (2, "b", "train"), (3, "c", "test")],
        "doc_id long, text string, split string",
    )
    out = str(tmp_path / "export")
    write_jsonl(df, out, partition_by=["split"])
    assert sorted(d for d in os.listdir(out) if d.startswith("split=")) == [
        "split=test", "split=train",
    ]
    train = spark.read.json(f"{out}/split=train")
    assert sorted(r["doc_id"] for r in train.collect()) == [1, 2]


def test_orc_roundtrip_pushdown_and_required_columns(spark, tmp_path):
    """ORC round-trips with partition layout; a predicate reaches the
    ORC scan (PushedFilters); missing required columns fail fast."""
    import pytest

    from nlu_data_warehouse_project_spark.plans import has_pushed_filters
    from nlu_data_warehouse_project_spark.sources import (
        MissingColumnsError,
        read_orc,
        write_orc,
    )

    df = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(60)], "id long, part int, s string"
    )
    out = str(tmp_path / "orc")
    write_orc(df, out, partition_by=["part"])
    got = read_orc(spark, out, required=["id", "s", "part"])
    assert got.count() == 60
    assert has_pushed_filters(got.filter(F.col("id") > 30).select("id"))
    with pytest.raises(MissingColumnsError):
        read_orc(spark, out, required=["id", "nope"])
