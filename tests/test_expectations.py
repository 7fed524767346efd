"""Data-quality expectations suite (operators/expectations.py, q89)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.operators.expectations import (
    check_foreign_key,
    check_not_null,
    check_predicate,
    check_unique,
    run_expectations,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_check_unique_ignores_null_keys_counts_dups(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,)], "k int"
    )
    r = _one(check_unique(df, ["k"]))
    # two NULL keys never collide; (1,1) is one violation
    assert r["n_violations"] == 1 and r["passed"] is False

    clean = spark.createDataFrame([(1,), (2,)], "k int")
    assert _one(check_unique(clean, ["k"]))["passed"] is True


def test_check_predicate_null_is_violation(spark):
    df = spark.createDataFrame([(1.0,), (-1.0,), (None,)], "v double")
    r = _one(check_predicate(df, "positive", F.col("v") > 0))
    assert r["n_violations"] == 2  # the negative AND the unevaluable NULL


def test_check_foreign_key_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = _one(check_foreign_key(child, parent, {"fk": "pk"}))
    assert r["n_violations"] == 2  # 9 and NULL are both orphans


def test_run_expectations_union_and_empty_table(spark):
    df = spark.createDataFrame([], "k int, v double")
    rep = run_expectations(
        [
            check_unique(df, ["k"]),
            check_not_null(df, ["k"]),
            check_predicate(df, "pos", F.col("v") > 0),
        ]
    )
    rows = {r["check"]: r for r in rep.collect()}
    assert len(rows) == 3
    # an empty table violates nothing
    assert all(r["n_violations"] == 0 and r["passed"] for r in rows.values())


def test_check_functional_dependency(spark):
    from nlu_data_warehouse_project_spark.operators.expectations import (
        check_functional_dependency,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "c"), (3, None), (3, "x")],
        "k int, v string",
    )
    r = _one(check_functional_dependency(df, ["k"], ["v"]))
    # k=2 (two values) and k=3 (NULL vs x) violate; k=1 holds
    assert r["n_violations"] == 2 and r["passed"] is False

    # surplus semantics: a 3-valued group contributes 2 violations
    tri = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "x")], "k int, v string"
    )
    assert _one(check_functional_dependency(tri, ["k"], ["v"]))["n_violations"] == 2

    holds = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "k int, v string")
    assert _one(check_functional_dependency(holds, ["k"], ["v"]))["passed"] is True


def test_check_predicates_single_scan_matches_per_check(spark):
    from nlu_data_warehouse_project_spark.operators.expectations import (
        check_predicate,
        check_predicates,
    )

    df = spark.createDataFrame([(1.0, 0.5), (-2.0, 1.5), (None, 0.0)], "a double, b double")
    conds = {"a_pos": F.col("a") > 0, "b_unit": (F.col("b") >= 0) & (F.col("b") <= 1)}
    multi = {r["check"]: (r["n_violations"], r["passed"]) for r in check_predicates(df, conds).collect()}
    for name, cond in conds.items():
        single = check_predicate(df, name, cond).first()
        assert multi[name] == (single["n_violations"], single["passed"])
    assert multi == {"a_pos": (2, False), "b_unit": (1, False)}


def test_guarded_commit_blocks_bad_batches(spark, tmp_path):
    from nlu_data_warehouse_project_spark.operators.expectations import (
        ExpectationsFailedError,
        check_not_null,
        check_unique,
        guarded_commit,
    )
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    contract = [
        lambda d: check_not_null(d, ["id"]),
        lambda d: check_unique(d, ["id"]),
    ]
    good = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    assert guarded_commit(t, good, "day1", contract) == 1

    bad = spark.createDataFrame([(3, "c"), (3, "d"), (None, "e")], "id long, v string")
    import pytest as _pytest
    with _pytest.raises(ExpectationsFailedError, match="2 expectation"):
        guarded_commit(t, bad, "day2", contract)
    # the refused commit published nothing: version unchanged, data clean
    assert t.manifest()["version"] == 1
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2]


def test_guarded_commit_snapshot_mode_and_bad_mode(spark, tmp_path):
    from nlu_data_warehouse_project_spark.operators.expectations import (
        check_not_null,
        guarded_commit,
    )
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    d = spark.createDataFrame([(1, "a")], "id long, v string")
    assert guarded_commit(t, d, "s1", [lambda x: check_not_null(x, ["id"])], mode="snapshot") == 1
    assert t.read_current().count() == 1

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown mode"):
        guarded_commit(t, d, "s2", [lambda x: check_not_null(x, ["id"])], mode="merge")
