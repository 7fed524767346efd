"""Version diffing: O(delta) segment diffs for append corpora
(`TxTable.read_closed_delta`) and key-wise snapshot diffs for
merge-shaped tables (`operators/diff.py`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.operators.diff import snapshot_diff, table_diff
from nlu_data_warehouse_project_spark.sources.txlog import TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_read_closed_delta_is_the_corpus_diff(spark, tmp_path):
    corpus = TxTable(spark, str(tmp_path / "corpus"))
    corpus.commit_append(_df(spark, [(1, "a"), (2, "b")]), "d1")       # v1
    corpus.commit_append(_df(spark, [(3, "c")]), "d2")                 # v2
    corpus.commit_append(_df(spark, [(4, "d"), (5, "e")]), "d3")       # v3

    delta = corpus.read_closed_delta(1)
    assert sorted(r["doc_id"] for r in delta.collect()) == [3, 4, 5]
    assert sorted(r["doc_id"] for r in corpus.read_closed_delta(2, 3).collect()) == [4, 5]
    assert corpus.read_closed_delta(3).count() == 0  # v3 -> latest: empty

    with pytest.raises(Exception, match="version 9"):
        corpus.read_closed_delta(9)


def test_read_closed_delta_across_compaction(spark, tmp_path):
    corpus = TxTable(spark, str(tmp_path / "corpus"))
    corpus.commit_append(_df(spark, [(1, "a")]), "d1")   # v1
    corpus.commit_append(_df(spark, [(2, "b")]), "d2")   # v2
    corpus.compact_closed(min_dirs=2)                    # v3: folds d1+d2
    corpus.commit_append(_df(spark, [(3, "c")]), "d4")   # v4

    # the compacted dir covers exactly v2's leaves -> consumed; only d4 is new
    assert sorted(r["doc_id"] for r in corpus.read_closed_delta(2).collect()) == [3]
    # the fold crosses the v1 boundary -> unrecoverable from segments
    with pytest.raises(RuntimeError, match="compacted across"):
        corpus.read_closed_delta(1)


def test_read_closed_delta_detects_history_replace(spark, tmp_path):
    """A snapshot replace between the versions drops the old segments;
    'no new segments' would be a silent lie — the delta must refuse."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit_append(_df(spark, [(1, "a")]), "d1")          # v1
    t.commit_snapshot(_df(spark, [(9, "z")]), "replace")   # v2: closed=[]
    with pytest.raises(RuntimeError, match="replaced/rewritten"):
        t.read_closed_delta(1, 2)


def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, t string, v long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", 30), (4, None, 40), (5, "new", 50)],
        "k long, t string, v long",
    )
    rows = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}
    assert set(rows) == {1, 3, 5}  # 2 and 4 unchanged (incl. null-safe t)
    assert rows[1]["change"] == "removed" and rows[1]["t"] == "a"   # old side
    assert rows[3]["change"] == "changed" and rows[3]["t"] == "CHANGED"  # new side
    assert rows[5]["change"] == "added" and rows[5]["v"] == 50

    # restricted compare: only v matters -> the t change disappears
    only_v = {r["k"]: r for r in snapshot_diff(old, new, "k", compare_cols=["v"]).collect()}
    assert set(only_v) == {1, 5}
    with pytest.raises(ValueError, match="not shared"):
        snapshot_diff(old, new, "k", compare_cols=["nope"])


def test_table_diff_on_scd2_gold(spark, tmp_path):
    """Current-set diff across two gold versions of the pipeline."""
    from nlu_data_warehouse_project_spark.pipeline import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    feed_cols = ["sku", "product_name", "price", "brand", "material", "shape",
                 "dimension", "origin", "quantity_available", "product_url"]

    def feed(rows):
        return spark.createDataFrame(
            [(sku, "P" + sku, price, "A", "M", "Sh", "D", "O", "1", "u")
             for (sku, price) in rows],
            feed_cols,
        )

    wh.run_day(feed([("S1", "100"), ("S2", "200")]), 1, "2024-12-08")  # gold v1
    wh.run_day(feed([("S1", "150"), ("S3", "300")]), 1, "2024-12-09")  # gold v2

    gold = wh.gold()
    rows = {r["natural_key"]: r for r in table_diff(gold, 1, 2).collect()}
    # S1 changed price; S3 appeared; S2 stayed open & unchanged
    assert rows["PS1-S1"]["change"] == "changed" and rows["PS1-S1"]["price"] == 150
    assert rows["PS3-S3"]["change"] == "added"
    assert set(rows) == {"PS1-S1", "PS3-S3"}  # S2 unchanged -> absent

    # and the closed delta between the versions is exactly S1's old version
    closed = gold.read_closed_delta(1, 2).collect()
    assert [(r["natural_key"], r["price"]) for r in closed] == [("PS1-S1", 100)]


def test_schema_diff_and_table_history(spark, tmp_path):
    from nlu_data_warehouse_project_spark.operators.diff import schema_diff, table_history
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    d1 = spark.createDataFrame([(1, "a")], "id long, v string")
    t.commit_append(d1, "day1")
    d2 = spark.createDataFrame([(2, "b", 3.5)], "id long, v string, score double")
    t.commit_append(d2, "day2")

    drift = schema_diff(t, 1)
    assert drift == [
        {"column": "score", "change": "added", "old_type": None, "new_type": "double"}
    ]
    assert schema_diff(t, 2, 2) == []

    hist = table_history(t)
    assert [h["version"] for h in hist] == [1, 2]
    assert [h["run_id"] for h in hist] == ["day1", "day2"]
    assert [h["kind"] for h in hist] == ["append", "append"]
    assert all(h["new_closed_dirs"] == 1 for h in hist)
    assert hist[0]["n_columns"] == 2 and hist[1]["n_columns"] == 3

    import pytest as _pytest

    from nlu_data_warehouse_project_spark.sources.txlog import VersionNotFoundError
    with _pytest.raises(VersionNotFoundError):
        schema_diff(t, 99)


def test_table_history_classifies_compaction_merge_snapshot(spark, tmp_path):
    """Regression: a compaction publishes closed=[new-compacted-dir] (NOT a
    subset of prev_closed) and a snapshot publishes closed=[] (which IS a
    strict subset) — subset tests alone mislabel both."""
    from nlu_data_warehouse_project_spark.operators.diff import table_history
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    d = lambda i: spark.createDataFrame([(i, f"v{i}")], "id long, v string")  # noqa: E731
    t.commit_append(d(1), "day1")
    t.commit_append(d(2), "day2")
    t.compact_closed(min_dirs=2)
    t.commit_merge(d(3), d(4), "merge1")
    t.commit_snapshot(d(5), "snap1")

    kinds = [h["kind"] for h in table_history(t)]
    assert kinds == ["append", "append", "compaction", "merge", "snapshot"]


def test_table_history_snapshot_table(spark, tmp_path):
    """A snapshot-shaped table (closed always []) must read as
    snapshot commits, never compactions."""
    from nlu_data_warehouse_project_spark.operators.diff import table_history
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "snap"))
    d = lambda i: spark.createDataFrame([(i,)], "id long")  # noqa: E731
    t.commit_snapshot(d(1), "s1")
    t.commit_snapshot(d(2), "s2")
    kinds = [h["kind"] for h in table_history(t)]
    # v1 has no prior current to compare; a fresh table's first commit
    # reads as append (the seed); later replacements as snapshot
    assert kinds[1] == "snapshot"


def test_table_history_labels_restores(spark, tmp_path):
    from nlu_data_warehouse_project_spark.operators.diff import table_history
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    d = lambda i: spark.createDataFrame([(i,)], "id long")  # noqa: E731
    t.commit_append(d(1), "day1")
    t.commit_append(d(2), "day2")
    t.restore(1)
    t.commit_append(d(3), "day3")
    kinds = [h["kind"] for h in table_history(t)]
    assert kinds == ["append", "append", "restore", "append"]
