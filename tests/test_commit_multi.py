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


def _table_exists(spark, name: str) -> bool:
    return spark.catalog.tableExists(name)


def test_abort_preserves_visible_versions_bucketed_read_path(spark, tmp_path):
    """ADVICE r10 txlog:747 — a commit_merge/commit_snapshot staged
    under commit_multi must NOT drop the previous version's bucket
    catalog table at staging time: if the txn aborts, that version is
    still the visible one and would permanently lose its exchange-free
    bucketed read path.  The drop is deferred to the coordinator
    commit; on abort the staged version's own catalog entry is
    reclaimed by vacuum."""
    root = str(tmp_path / "bk")
    t = TxTable(spark, root, bucket_cols=["id"], num_buckets=4)
    t.commit_snapshot(spark.createDataFrame([(1,), (2,)], "id long"), "seed")
    v1_table = t.manifest()["current_table"]
    assert _table_exists(spark, v1_table)
    coord = TxnCoordinator(spark, str(tmp_path / "coord"))
    other = _seed(spark, str(tmp_path / "other"), [1])

    class Boom(RuntimeError):
        pass

    real_commit = coord.commit

    def exploding_commit(txn_id):
        raise Boom("crash at coordinator commit")

    coord.commit = exploding_commit
    with pytest.raises(Boom):
        commit_multi(
            [
                (t, "snapshot", {"df": spark.createDataFrame([(9,)], "id long"), "run_id": "d2"}),
                (other, "append", {"delta": spark.createDataFrame([(2,)], "id long"), "run_id": "d2"}),
            ],
            coord,
        )
    coord.commit = real_commit
    # aborted: the visible version's bucket table SURVIVED the abort
    assert _table_exists(spark, v1_table)
    assert t.manifest()["current_table"] == v1_table
    assert sorted(r["id"] for r in t.read_current().collect()) == [1, 2]
    # the aborted staged version registered its own catalog entry at
    # staging; vacuum reclaims it along with the tombstone manifest
    staged_tables = [
        n for n in (t._bucket_table_name(v) for v in t._all_versions())
        if n != v1_table and _table_exists(spark, n)
    ]
    assert staged_tables  # the staged entry exists pre-vacuum
    t.vacuum(retain_last=1)
    for n in staged_tables:
        assert not _table_exists(spark, n)
    assert _table_exists(spark, v1_table)  # live version untouched


def test_committed_txn_finalizes_deferred_catalog_drop(spark, tmp_path):
    """The happy path: after the coordinator commits, the superseded
    version's deferred bucket-table drop IS performed (commit_multi
    finalize), and the new version's table is live."""
    root = str(tmp_path / "bk2")
    t = TxTable(spark, root, bucket_cols=["id"], num_buckets=4)
    t.commit_snapshot(spark.createDataFrame([(1,)], "id long"), "seed")
    v1_table = t.manifest()["current_table"]
    other = _seed(spark, str(tmp_path / "other2"), [1])
    coord = TxnCoordinator(spark, str(tmp_path / "coord2"))
    commit_multi(
        [
            (t, "snapshot", {"df": spark.createDataFrame([(9,)], "id long"), "run_id": "d2"}),
            (other, "append", {"delta": spark.createDataFrame([(2,)], "id long"), "run_id": "d2"}),
        ],
        coord,
    )
    assert not _table_exists(spark, v1_table)  # deferred drop finalized
    v2_table = t.manifest()["current_table"]
    assert _table_exists(spark, v2_table)
    # the staged manifest records what it deferred (self-heal hook)
    assert t.manifest()["txn_stale_table"] == v1_table


def test_vacuum_reclaims_dead_leftovers_with_zero_committed_versions(spark, tmp_path):
    """ADVICE r10 txlog:1313 — vacuum on a table whose ONLY manifests
    are aborted-txn tombstones (no committed version ever) must still
    reclaim the tombstone manifests and their data dirs, not return []
    until some committed version appears."""
    import os

    root = str(tmp_path / "fresh")
    t = TxTable(spark, root)
    coord = TxnCoordinator(spark, str(tmp_path / "coord3"))
    txn = uuid.uuid4().hex
    pend = {"coordinator": coord.root, "txn_id": txn}
    t.commit_append(
        spark.createDataFrame([(1,)], "id long"), "d1", extra={"pending_txn": pend}
    )
    coord.abort(txn)
    assert t.versions() == [] and t._all_versions() == [1]
    dropped = t.vacuum(retain_last=1)
    assert dropped  # the orphaned data dirs were reclaimed NOW
    assert t._all_versions() == []
    data_dir = os.path.join(root, "data")
    assert not os.path.exists(data_dir) or os.listdir(data_dir) == []


def test_coordinator_vacuum_reference_based_retention(spark, tmp_path):
    """VERDICT r10 #8 — decided txn records are reclaimed once no
    surviving manifest references them; records still referenced (a
    committed txn whose manifests live, or an aborted txn whose
    tombstones haven't been table-vacuumed yet) are KEPT — deleting a
    referenced committed record would flip the version invisible."""
    a = _seed(spark, str(tmp_path / "a"), [1])
    b = _seed(spark, str(tmp_path / "b"), [10])
    coord = TxnCoordinator(spark, str(tmp_path / "coord4"))
    res = commit_multi(
        [
            (a, "append", {"delta": spark.createDataFrame([(2,)], "id long"), "run_id": "d2"}),
            (b, "append", {"delta": spark.createDataFrame([(20,)], "id long"), "run_id": "d2"}),
        ],
        coord,
    )
    committed_txn = res["txn_id"]
    # an aborted txn, manifests still on disk as tombstones
    txn2 = uuid.uuid4().hex
    a.commit_append(
        spark.createDataFrame([(3,)], "id long"), "d3",
        extra={"pending_txn": {"coordinator": coord.root, "txn_id": txn2}},
    )
    coord.abort(txn2)
    # both records referenced -> nothing reclaimed
    assert coord.vacuum([a, b]) == []
    assert coord.state(committed_txn) == "committed"
    assert coord.state(txn2) == "aborted"
    # table vacuum prunes a's tombstone AND the committed manifests
    # older than the retain window on both tables
    a.vacuum(retain_last=1)
    b.vacuum(retain_last=1)
    # a's latest committed manifest still carries committed_txn's
    # pending_txn -> that record must survive; txn2's tombstone is gone
    # -> its record is reclaimable
    removed = coord.vacuum([a, b])
    assert removed == [txn2]
    assert coord.state(committed_txn) == "committed"
    assert sorted(r["id"] for r in a.read().collect()) == [1, 2]
    # once nothing references the committed record it goes too: rebase
    # a and b onto plain commits, vacuum the old manifests away
    a.commit_append(spark.createDataFrame([(4,)], "id long"), "d4")
    b.commit_append(spark.createDataFrame([(40,)], "id long"), "d4")
    a.vacuum(retain_last=1)
    b.vacuum(retain_last=1)
    assert coord.vacuum([a, b]) == [committed_txn]
    assert sorted(r["id"] for r in a.read().collect()) == [1, 2, 4]


def test_vacuum_after_aborted_staged_append_keeps_live_bucket_table(spark, tmp_path):
    """ADVICE r11 txlog vacuum: a staged commit_append CARRIES the live
    version's current_table (appends don't touch the current dir), so
    vacuum's dead-manifest catalog sweep must not drop a name any
    RETAINED manifest still references — before the fix, vacuum after
    an aborted commit_multi append on a bucketed table silently
    stripped the visible version's exchange-free bucketed read path."""
    root = str(tmp_path / "bk3")
    t = TxTable(spark, root, bucket_cols=["id"], num_buckets=4)
    t.commit_snapshot(spark.createDataFrame([(1,), (2,)], "id long"), "seed")
    v1_table = t.manifest()["current_table"]
    assert _table_exists(spark, v1_table)
    coord = TxnCoordinator(spark, str(tmp_path / "coord5"))
    txn = uuid.uuid4().hex
    t.commit_append(
        spark.createDataFrame([(3,)], "id long"), "d2",
        extra={"pending_txn": {"coordinator": coord.root, "txn_id": txn}},
    )
    coord.abort(txn)
    # the tombstone manifest references the LIVE table, not its own
    t.vacuum(retain_last=1)
    assert _table_exists(spark, v1_table), "vacuum dropped the live version's bucket table"
    assert t.manifest()["current_table"] == v1_table
    assert sorted(r["id"] for r in t.read_current().collect()) == [1, 2]


def test_plain_append_sweeps_crashed_finalize_marker(spark, tmp_path):
    """ADVICE r11 txlog:769 — the 'next plain commit self-heals a
    crashed finalize' claim must hold for commit_append and
    commit_replace_slice too: they keep prev's current dir (so the full
    _drop_stale_bucket_table sweep would be wrong), but prev's
    txn_stale_table marker names a table superseded when prev itself
    committed — dead regardless — and before the fix one plain append
    made the marker vanish and the catalog entry leak forever."""
    root = str(tmp_path / "bk4")
    t = TxTable(spark, root, bucket_cols=["id"], num_buckets=4)
    t.commit_snapshot(spark.createDataFrame([(1,)], "id long"), "seed")
    v1_table = t.manifest()["current_table"]
    coord = TxnCoordinator(spark, str(tmp_path / "coord6"))
    txn = uuid.uuid4().hex
    t.commit_snapshot(
        spark.createDataFrame([(9,)], "id long"), "d2",
        extra={"pending_txn": {"coordinator": coord.root, "txn_id": txn}},
    )
    coord.commit(txn)  # crash simulated: decision written, finalize never ran
    assert t.manifest()["txn_stale_table"] == v1_table
    assert _table_exists(spark, v1_table)  # the leak before the sweep
    v2_table = t.manifest()["current_table"]
    # a PLAIN append self-heals the deferred drop without touching the
    # carried live table
    t.commit_append(spark.createDataFrame([(10,)], "id long"), "d3")
    assert not _table_exists(spark, v1_table), "crashed finalize's marker was not swept"
    assert _table_exists(spark, v2_table)
    assert t.manifest()["current_table"] == v2_table
    assert sorted(r["id"] for r in t.read().collect()) == [9, 10]
    # replace_slice sweeps the same way
    t2 = TxTable(spark, str(tmp_path / "bk5"), bucket_cols=["id"], num_buckets=4)
    t2.commit_snapshot(spark.createDataFrame([(1,)], "id long"), "seed")
    s1_table = t2.manifest()["current_table"]
    txn2 = uuid.uuid4().hex
    t2.commit_snapshot(
        spark.createDataFrame([(5,)], "id long"), "d2",
        extra={"pending_txn": {"coordinator": coord.root, "txn_id": txn2}},
    )
    coord.commit(txn2)
    assert _table_exists(spark, s1_table)
    t2.commit_replace_slice(
        spark.createDataFrame([(6,)], "id long"), "day1", "d3"
    )
    assert not _table_exists(spark, s1_table)
    assert _table_exists(spark, t2.manifest()["current_table"])


def test_staged_append_sweep_is_safe_under_abort(spark, tmp_path):
    """The crashed-finalize marker a STAGED append sweeps names a table
    superseded when the PREVIOUS version committed — dead no matter how
    the new transaction resolves.  So after the staged append's txn
    ABORTS, the visible version still reads correctly and the swept
    marker's table is gone (not resurrected, not missed)."""
    root = str(tmp_path / "bk6")
    t = TxTable(spark, root, bucket_cols=["id"], num_buckets=4)
    t.commit_snapshot(spark.createDataFrame([(1,)], "id long"), "seed")
    v1_table = t.manifest()["current_table"]
    coord = TxnCoordinator(spark, str(tmp_path / "coord7"))
    # crashed finalize: snapshot committed under a txn, drop deferred
    txn1 = uuid.uuid4().hex
    t.commit_snapshot(
        spark.createDataFrame([(5,)], "id long"), "d2",
        extra={"pending_txn": {"coordinator": coord.root, "txn_id": txn1}},
    )
    coord.commit(txn1)
    assert t.manifest()["txn_stale_table"] == v1_table
    v2_table = t.manifest()["current_table"]
    # a STAGED append sweeps the marker at staging time...
    txn2 = uuid.uuid4().hex
    t.commit_append(
        spark.createDataFrame([(6,)], "id long"), "d3",
        extra={"pending_txn": {"coordinator": coord.root, "txn_id": txn2}},
    )
    assert not _table_exists(spark, v1_table)
    # ...and an ABORT of that txn leaves the visible version intact
    coord.abort(txn2)
    assert t.manifest()["current_table"] == v2_table
    assert _table_exists(spark, v2_table)
    assert sorted(r["id"] for r in t.read().collect()) == [5]
