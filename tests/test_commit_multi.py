"""Atomic multi-table transactions (VERDICT r9 #2): the 2PC
coordinator's both-or-neither visibility, abort tombstones, vacuum
reclaim, and the pipeline's crash-between-commits recovery."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.sources.txlog import (
    ConcurrentWriteError,
    TxTable,
    TxnCoordinator,
    VersionNotFoundError,
    commit_multi,
)


def _seed(spark, root, vals):
    t = TxTable(spark, root)
    t.commit_append(spark.createDataFrame([(v,) for v in vals], "id long"), "seed")
    return t


def test_commit_multi_success_flips_all_participants(spark, tmp_path):
    a = _seed(spark, str(tmp_path / "a"), [1])
    b = _seed(spark, str(tmp_path / "b"), [10])
    coord = TxnCoordinator(spark, str(tmp_path / "coord"))
    res = commit_multi(
        [
            (a, "append", {"delta": spark.createDataFrame([(2,)], "id long"), "run_id": "d2"}),
            (b, "append", {"delta": spark.createDataFrame([(20,)], "id long"), "run_id": "d2"}),
        ],
        coord,
    )
    assert coord.state(res["txn_id"]) == "committed"
    assert sorted(r["id"] for r in a.read().collect()) == [1, 2]
    assert sorted(r["id"] for r in b.read().collect()) == [10, 20]
    # the committed versions are ordinary history: time travel works
    assert res["versions"][a.root] in a.versions()


def test_commit_multi_in_doubt_is_invisible_then_flips_atomically(spark, tmp_path):
    """Simulated crash AFTER both manifests staged, BEFORE the
    coordinator record (and before any abort): both tables must read at
    their previous versions — 'neither'.  A late coordinator commit is
    ONE atomic rename that flips both to 'both'."""
    a = _seed(spark, str(tmp_path / "a"), [1])
    b = _seed(spark, str(tmp_path / "b"), [10])
    coord = TxnCoordinator(spark, str(tmp_path / "coord"))
    txn = uuid.uuid4().hex
    pend = {"coordinator": coord.root, "txn_id": txn}
    va = a.commit_append(
        spark.createDataFrame([(2,)], "id long"), "d2", extra={"pending_txn": pend}
    )
    vb = b.commit_append(
        spark.createDataFrame([(20,)], "id long"), "d2", extra={"pending_txn": pend}
    )
    # in-doubt: neither staged version is visible anywhere
    assert sorted(r["id"] for r in a.read().collect()) == [1]
    assert sorted(r["id"] for r in b.read().collect()) == [10]
    assert va not in a.versions() and vb not in b.versions()
    assert a.latest_version() == 1 and b.latest_version() == 1
    with pytest.raises(VersionNotFoundError, match="in_doubt"):
        a.manifest(va)
    # resolution: both flip at once
    coord.commit(txn)
    assert sorted(r["id"] for r in a.read().collect()) == [1, 2]
    assert sorted(r["id"] for r in b.read().collect()) == [10, 20]
    assert va in a.versions() and vb in b.versions()


def test_commit_multi_failure_aborts_and_tables_move_on(spark, tmp_path):
    """A crash at the coordinator commit aborts the transaction: staged
    versions become permanent tombstones, later commits allocate PAST
    them, and vacuum reclaims both the tombstone manifests and their
    orphaned data dirs."""
    a = _seed(spark, str(tmp_path / "a"), [1])
    b = _seed(spark, str(tmp_path / "b"), [10])
    coord = TxnCoordinator(spark, str(tmp_path / "coord"))
    boom = RuntimeError("injected coordinator crash")
    real_commit = coord.commit
    coord.commit = lambda txn_id: (_ for _ in ()).throw(boom)
    with pytest.raises(RuntimeError, match="injected coordinator"):
        commit_multi(
            [
                (a, "append", {"delta": spark.createDataFrame([(2,)], "id long"), "run_id": "d2"}),
                (b, "append", {"delta": spark.createDataFrame([(20,)], "id long"), "run_id": "d2"}),
            ],
            coord,
        )
    coord.commit = real_commit
    # aborted: neither visible, and the decision is terminal
    assert sorted(r["id"] for r in a.read().collect()) == [1]
    assert sorted(r["id"] for r in b.read().collect()) == [10]
    # a plain commit proceeds, skipping the tombstoned version number
    v = a.commit_append(spark.createDataFrame([(3,)], "id long"), "d3")
    assert v == 3  # v2 is the tombstone
    assert sorted(r["id"] for r in a.read().collect()) == [1, 3]
    assert a.versions() == [1, 3]
    # vacuum reclaims the tombstone manifest; reads stay correct
    a.vacuum(retain_last=2)
    assert sorted(r["id"] for r in a.read().collect()) == [1, 3]
    assert a._all_versions() == [1, 3]


def test_vacuum_aborts_in_doubt_leftovers(spark, tmp_path):
    """An in-doubt transaction encountered by vacuum (no writer in
    flight, per vacuum's contract) is dead: vacuum writes the abort
    record — so a zombie coordinator commit cannot resurrect a version
    whose data dirs were just reclaimed — then prunes the tombstone."""
    a = _seed(spark, str(tmp_path / "a"), [1])
    coord = TxnCoordinator(spark, str(tmp_path / "coord"))
    txn = uuid.uuid4().hex
    a.commit_append(
        spark.createDataFrame([(2,)], "id long"), "d2",
        extra={"pending_txn": {"coordinator": coord.root, "txn_id": txn}},
    )
    a.vacuum(retain_last=1)
    assert coord.state(txn) == "aborted"
    assert a._all_versions() == [1]
    # the zombie's late commit raises instead of silently succeeding
    with pytest.raises(ConcurrentWriteError, match="already decided"):
        coord.commit(txn)
    assert sorted(r["id"] for r in a.read().collect()) == [1]


def test_commit_multi_refuses_duplicate_participant(spark, tmp_path):
    a = _seed(spark, str(tmp_path / "a"), [1])
    coord = TxnCoordinator(spark, str(tmp_path / "coord"))
    with pytest.raises(ValueError, match="distinct tables"):
        commit_multi(
            [
                (a, "append", {"delta": spark.createDataFrame([(2,)], "id long"), "run_id": "x"}),
                (a, "append", {"delta": spark.createDataFrame([(3,)], "id long"), "run_id": "y"}),
            ],
            coord,
        )
