"""TxTable gold persistence guarantees (VERDICT r1 Next-round #1/#2):
history dirs are immutable across merges, a crash before the manifest
commit leaves the previous version readable, and per-stage failure
statuses make each stage retry idempotently from itself."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.pipeline import Warehouse
from nlu_data_warehouse_project_spark.sources.txlog import TxTable, VersionNotFoundError

FEED_COLS = ["sku", "product_name", "price", "brand", "material", "shape",
             "dimension", "origin", "quantity_available", "product_url"]


def _feed(spark, rows):
    data = [(sku, name, price, "B", "M", "Sh", "D", "O", "1", f"u{sku}") for (sku, name, price) in rows]
    return spark.createDataFrame(data, FEED_COLS)


def _snapshot_files(root: str) -> dict[str, tuple[int, float]]:
    """name -> (size, mtime) for every file under root."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime)
    return out


def test_closed_history_files_never_rewritten(spark, tmp_path):
    """The daily merge appends a closed-delta dir and replaces only the
    current dir: every file of day N's commit is byte-stable through
    day N+1's merge (the r1 layout rewrote all history twice per day)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.run_day(_feed(spark, [("S1", "P1", "100"), ("S2", "P2", "200")]), 1, "2024-12-08")
    wh.run_day(_feed(spark, [("S1", "P1", "150")]), 1, "2024-12-09")  # closes S1 v1

    gold = TxTable(spark, wh.dw_dir)
    man = gold.manifest()
    assert man["version"] == 2 and len(man["closed"]) == 2
    closed_dirs = [os.path.join(wh.dw_dir, d) for d in man["closed"]]
    before = {d: _snapshot_files(d) for d in closed_dirs}

    wh.run_day(_feed(spark, [("S1", "P1", "175"), ("S3", "P3", "300")]), 1, "2024-12-10")

    for d in closed_dirs:
        assert _snapshot_files(d) == before[d], f"closed dir {d} was rewritten"
    # and the logical table is the full history
    dw = wh.read_dw()
    assert dw.count() == 5  # S1 x3 versions, S2, S3
    assert dw.filter(F.col("dt_last_update") == F.to_date(F.lit("9999-12-31"))).count() == 3


def test_crash_before_commit_leaves_previous_version_readable(spark, tmp_path, monkeypatch):
    """Exception injected between the data writes and the manifest
    publish: the table still reads as the previous day, and a retry
    (allowed by the DF status) completes the merge without duplicates."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.run_day(_feed(spark, [("S1", "P1", "100")]), 1, "2024-12-08")
    day1 = {(r["price"], str(r["dt_last_update"])) for r in wh.read_dw().collect()}

    boom = RuntimeError("injected crash before manifest publish")
    orig_publish = TxTable._publish

    def crash_gold_only(self, man):
        # control tables persist through the same commit protocol now —
        # crash ONLY the gold publish, as the scenario describes
        if self.root == wh.dw_dir:
            raise boom
        return orig_publish(self, man)

    monkeypatch.setattr(TxTable, "_publish", crash_gold_only)
    wh.extract(_feed(spark, [("S1", "P1", "150")]), 1, "2024-12-09")
    wh.load_to_staging(1, "2024-12-09")
    with pytest.raises(RuntimeError, match="injected crash"):
        wh.load_to_dw(1, "2024-12-09")
    monkeypatch.undo()

    # previous version intact (orphan data dirs exist but are invisible)
    assert {(r["price"], str(r["dt_last_update"])) for r in wh.read_dw().collect()} == day1
    assert wh.control().has_log(1, "2024-12-09", ["DF"])

    # retry from the DF status re-runs ONLY load_to_dw and lands day 2
    dw = wh.load_to_dw(1, "2024-12-09")
    got = sorted((r["price"], str(r["dt_last_update"])) for r in dw.collect())
    assert got == [(100, "2024-12-09"), (150, "9999-12-31")]

    # vacuum removes the crash's orphan dirs but no live ones
    gold = TxTable(spark, wh.dw_dir)
    dropped = gold.vacuum()
    assert dropped, "orphan dirs from the crashed attempt were collected"
    assert sorted((r["price"], str(r["dt_last_update"])) for r in gold.read().collect()) == got


def test_staging_retry_is_idempotent(spark, tmp_path):
    """Dynamic partition overwrite: re-running staging for a day
    replaces the run slice instead of appending a duplicate copy
    (ADVICE r1 #1 — duplicate natural_keys would violate the SCD2
    merge's batch-uniqueness contract)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.extract(_feed(spark, [("S1", "P1", "100"), ("S2", "P2", "200")]), 1, "2024-12-08")
    wh.load_to_staging(1, "2024-12-08")
    # simulate a dw failure forcing a staging re-run: force SF and retry
    ctrl = wh.control()
    log_id = ctrl.active_log_id(1, "2024-12-08")
    wh._save(ctrl.update_status(1, "2024-12-08", "SF", log_id=log_id))
    wh.load_to_staging(1, "2024-12-08")

    staged = wh.staging().read_slice("1:2024-12-08")
    assert staged.count() == 2, "retried slice must replace, not append"
    assert staged.select("natural_key").distinct().count() == 2


def test_time_travel_reads_prior_versions(spark, tmp_path):
    """Committed versions stay readable until vacuum: version N is the
    table exactly as it stood after day N's merge."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.run_day(_feed(spark, [("S1", "P1", "100")]), 1, "2024-12-08")
    wh.run_day(_feed(spark, [("S1", "P1", "150")]), 1, "2024-12-09")

    gold = TxTable(spark, wh.dw_dir)
    v1 = {(r["price"], str(r["dt_last_update"])) for r in gold.read(version=1).collect()}
    assert v1 == {(100, "9999-12-31")}
    v2 = {(r["price"], str(r["dt_last_update"])) for r in gold.read(version=2).collect()}
    assert v2 == {(100, "2024-12-09"), (150, "9999-12-31")}
    assert {tuple(r) for r in gold.read().select("price").collect()} == {(100,), (150,)}


def test_two_configs_share_the_gold_table(spark, tmp_path):
    """Two sources loading the same day: each merge sees the other's
    keys as untouched current rows; both land in one gold table and
    day-scoped guards stay per-config."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.run_day(_feed(spark, [("A1", "PA", "100")]), 1, "2024-12-08")
    wh.run_day(_feed(spark, [("B1", "PB", "200")]), 2, "2024-12-08")

    dw = wh.read_dw()
    assert dw.count() == 2
    assert {r["id_config"] for r in dw.collect()} == {1, 2}
    # config 2's day-2 change must not disturb config 1's open row
    wh.run_day(_feed(spark, [("B1", "PB", "250")]), 2, "2024-12-09")
    dw = wh.read_dw()
    open_rows = {
        (r["id_config"], r["price"])
        for r in dw.filter(F.col("dt_last_update") == F.to_date(F.lit("9999-12-31"))).collect()
    }
    assert open_rows == {(1, 100), (2, 250)}


def test_compact_closed_merges_history_dirs(spark, tmp_path):
    """Small-files compaction: many closed-delta dirs merge into one
    via a normal manifest commit — same rows, old dirs invisible (and
    vacuumable), current dir untouched, below-threshold is a no-op."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    price = 100
    for i, day in enumerate(["2024-12-08", "2024-12-09", "2024-12-10", "2024-12-11"]):
        price += 10
        wh.run_day(_feed(spark, [("S1", "P1", str(price))]), 1, day)

    gold = TxTable(spark, wh.dw_dir)
    before = sorted(
        (r["price"], str(r["dt_last_update"])) for r in gold.read().collect()
    )
    assert gold.compact_closed(min_dirs=99) is None  # below threshold: no-op
    assert len(gold.manifest()["closed"]) == 4

    v = gold.compact_closed(min_dirs=2)
    man = gold.manifest()
    assert v == man["version"] and len(man["closed"]) == 1
    after = sorted((r["price"], str(r["dt_last_update"])) for r in gold.read().collect())
    assert after == before
    # superseded dirs are orphans now; vacuum removes them, data intact
    assert gold.vacuum()
    assert sorted((r["price"], str(r["dt_last_update"])) for r in gold.read().collect()) == before


def test_compaction_lineage_recorded_carried_and_pruned(spark, tmp_path):
    """Compaction provenance (`compacted_lineage`): each compaction
    records its source dirs, the mapping resolves to ORIGINAL commit
    dirs across repeated compactions, it carries through merge/append
    commits, dead entries are pruned, and a snapshot replace drops it."""
    from nlu_data_warehouse_project_spark.sources.txlog import lineage_leaves

    wh = Warehouse(spark, str(tmp_path / "wh"))
    for i, day in enumerate(["2024-12-08", "2024-12-09", "2024-12-10"]):
        wh.run_day(_feed(spark, [("S1", "P1", str(100 + 10 * i))]), 1, day)
    gold = TxTable(spark, wh.dw_dir)
    originals = list(gold.manifest()["closed"])

    gold.compact_closed(min_dirs=2)
    man = gold.manifest()
    (c1,) = man["closed"]
    assert man["compacted_lineage"] == {c1: originals}

    # a merge commit after compaction carries the lineage unchanged
    wh.run_day(_feed(spark, [("S1", "P1", "140")]), 1, "2024-12-11")
    man = gold.manifest()
    assert man["compacted_lineage"] == {c1: originals}
    d4 = [d for d in man["closed"] if d != c1]

    # second compaction: the new entry chains through the first, and
    # lineage_leaves resolves all the way down to the original dirs
    gold.compact_closed(min_dirs=2)
    man = gold.manifest()
    (c2,) = man["closed"]
    assert set(man["compacted_lineage"]) == {c1, c2}
    assert lineage_leaves(c2, man["compacted_lineage"]) == set(originals) | set(d4)

    # a snapshot replace empties closed history → lineage is dropped
    snap = TxTable(spark, str(tmp_path / "snap"))
    snap.commit_append(_feed(spark, [("A", "B", "1")]), "r1")
    snap.compact_closed(min_dirs=1)
    assert "compacted_lineage" in snap.manifest()
    snap.commit_snapshot(_feed(spark, [("A", "B", "2")]), "r2")
    assert "compacted_lineage" not in snap.manifest()


def test_txtable_works_on_uri_scheme_paths(spark, tmp_path):
    """S7 object-store abstraction: every TxTable/landing access goes
    through the Hadoop FileSystem API, so a scheme-qualified URI root
    (file:// here; s3a:// in production) must behave identically to a
    bare OS path — no direct os.* access anywhere in the commit path."""
    root = f"file://{tmp_path}/wh_uri"
    wh = Warehouse(spark, root)
    dw = wh.run_day(_feed(spark, [("S1", "P1", "100")]), 1, "2024-12-08")
    assert dw.count() == 1
    gold = TxTable(spark, f"{root}/dw")
    assert gold.manifest()["version"] == 1
    dw = wh.run_day(_feed(spark, [("S1", "P1", "150")]), 1, "2024-12-09")
    assert dw.count() == 2
    assert gold.vacuum() != [] or gold.manifest()["version"] == 2


def test_schema_evolution_add_column_mid_history(spark, tmp_path):
    """A column added on day 3 of a 4-day run (VERDICT r2 #4): the
    manifest records each dir's write-time schema, full-history reads
    null-fill the added column on old dirs, and both sides of time
    travel read with THEIR version's schema."""
    gold = TxTable(spark, str(tmp_path / "gold"))

    def cur(rows, schema):
        return spark.createDataFrame(rows, schema)

    s1 = "k long, v double"
    s2 = "k long, v double, region string"  # day-3 schema adds `region`
    # days 1-2: old schema
    gold.commit_merge(cur([(1, 10.0)], s1), cur([], s1), "d1")
    gold.commit_merge(cur([(1, 11.0)], s1), cur([(1, 10.0)], s1), "d2")
    # day 3 adds a column; day 4 continues with it
    gold.commit_merge(cur([(1, 12.0, "eu")], s2), cur([(1, 11.0, None)], s2), "d3")
    gold.commit_merge(cur([(1, 13.0, "us")], s2), cur([(1, 12.0, "eu")], s2), "d4")

    full = gold.read()
    assert full.schema.simpleString() == "struct<k:bigint,v:double,region:string>"
    got = sorted((r["v"], r["region"]) for r in full.collect())
    # day-1/2 closed dirs (written pre-column) null-fill region
    assert got == [(10.0, None), (11.0, None), (12.0, "eu"), (13.0, "us")]

    # time travel: version 2 still reads with the OLD schema
    v2 = gold.read(version=2)
    assert "region" not in v2.columns
    assert sorted(r["v"] for r in v2.collect()) == [10.0, 11.0]

    # compaction migrates history to the latest schema and stays green
    assert gold.compact_closed(min_dirs=2) == 5
    assert sorted((r["v"], r["region"]) for r in gold.read().collect()) == got


def test_schema_retype_refused_at_commit(spark, tmp_path):
    """A retyped column would poison every later history read, so the
    commit itself must refuse it with a clear error."""
    from nlu_data_warehouse_project_spark.sources.txlog import SchemaEvolutionError

    gold = TxTable(spark, str(tmp_path / "gold"))
    gold.commit_merge(
        spark.createDataFrame([(1, 10.0)], "k long, v double"),
        spark.createDataFrame([], "k long, v double"),
        "d1",
    )
    with pytest.raises(SchemaEvolutionError, match="retype column 'v'"):
        gold.commit_merge(
            spark.createDataFrame([(1, "ten")], "k long, v string"),
            spark.createDataFrame([], "k long, v string"),
            "d2",
        )


def test_vacuum_retains_readable_versions(spark, tmp_path):
    """vacuum(retain_last=N) keeps the last N versions fully readable
    and prunes older manifests along with their dirs — a listed version
    is always a readable version (VERDICT r2 #5 / ADVICE r2)."""
    from nlu_data_warehouse_project_spark.sources.txlog import VersionNotFoundError

    wh = Warehouse(spark, str(tmp_path / "wh"))
    prices = ["100", "150", "175", "190"]
    for day, p in zip(["2024-12-08", "2024-12-09", "2024-12-10", "2024-12-11"], prices):
        wh.run_day(_feed(spark, [("S1", "P1", p)]), 1, day)

    gold = TxTable(spark, wh.dw_dir)
    assert gold.versions() == [1, 2, 3, 4]
    gold.vacuum(retain_last=2)
    assert gold.versions() == [3, 4]

    # both retained versions read back exactly
    v3 = sorted(r["price"] for r in gold.read(version=3).collect())
    assert v3 == [100, 150, 175]
    v4 = sorted(r["price"] for r in gold.read(version=4).collect())
    assert v4 == [100, 150, 175, 190]

    # pruned versions raise a clear error naming what's available
    with pytest.raises(VersionNotFoundError, match="available versions: \\[3, 4\\]"):
        gold.read(version=1)


def test_dir_stats_prune_date_ranged_history_reads(spark, tmp_path):
    """Data skipping: each daily closed dir records min/max close/load
    dates in the manifest, so a date-ranged history read scans only the
    overlapping dirs — O(days-in-range), not O(all history).  Pruning
    must never change results, and dirs without stats must stay
    scanned."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    prices = ["100", "150", "175", "190"]
    for day, p in zip(["2024-12-08", "2024-12-09", "2024-12-10", "2024-12-11"], prices):
        wh.run_day(_feed(spark, [("S1", "P1", p)]), 1, day)

    gold = wh.gold()
    man = gold.manifest()
    assert len(man["closed"]) == 4
    # day-9 commit closed exactly the v1 row: its dir records that range
    stats = man["dir_stats"]
    closed_d9 = [d for d in man["closed"] if "2024-12-09" in d][0]
    assert stats[closed_d9]["dt_last_update"] == ["2024-12-09", "2024-12-09"]

    pruned = gold.read_closed_pruned("dt_last_update", "2024-12-09", "2024-12-09")
    rows = [(r["price"], str(r["dt_last_update"])) for r in pruned.collect()]
    assert rows == [(100, "2024-12-09")]
    # the scan itself must touch ONLY the one overlapping dir (plus
    # nothing from the empty day-8 insert-only delta, which records
    # null stats and is scanned-but-empty by the safety rule)
    touched = {f.split("/data/")[1].split("/")[0] for f in pruned.inputFiles()}
    with_rows = {d.split("/")[-1] for d in man["closed"] if "2024-12-09" in d}
    assert touched <= with_rows | {
        d.split("/")[-1] for d, s in stats.items()
        if s.get("dt_last_update", [None])[0] is None
    }

    # unpruned filter agrees (pruning is an optimization, not semantics)
    full = gold.read_closed().filter(F.col("dt_last_update") == F.to_date(F.lit("2024-12-09")))
    assert [(r["price"], str(r["dt_last_update"])) for r in full.collect()] == rows

    # after compaction the folded dir covers the union range
    gold.compact_closed(min_dirs=2)
    man2 = gold.manifest()
    (compacted,) = man2["closed"]
    folded = man2["dir_stats"].get(compacted, {})
    if folded:  # present only if every input dir had stats
        assert folded["dt_last_update"][0] <= "2024-12-09" <= folded["dt_last_update"][1]


def test_retry_preserves_failure_audit_trail(spark, tmp_path):
    """update_status is id-scoped (ADVICE r1 #4): after an extract
    failure plus successful retry, the historical EF row survives."""
    alerts = []
    wh = Warehouse(spark, str(tmp_path / "wh"), alert=lambda m, e: alerts.append(m))

    bad = _feed(spark, [("S1", "P1", "100")])
    # sabotage attempt 1: a poisoned column expression fails the landing write
    poison = bad.withColumn("price", F.raise_error(F.lit("boom")))
    with pytest.raises(Exception):
        wh.extract(poison, 1, "2024-12-08")
    assert wh.control().has_log(1, "2024-12-08", ["EF"])

    wh.extract(bad, 1, "2024-12-08")  # EF is retryable
    logs = wh.control().logs.filter(F.col("id_config") == 1).collect()
    statuses = sorted((r["id"], r["status"]) for r in logs)
    assert [s for _i, s in statuses] == ["EF", "ES"], "EF row must survive the retry"


def test_commit_with_retry_rebases_the_losing_writer(spark, tmp_path):
    """Two writers race one commit slot: the loser's publish hits
    ConcurrentWriteError, commit_with_retry re-invokes its BUILDER
    against the advanced table, and both deltas land in consecutive
    versions.  The lost attempt's orphan data dir stays invisible and
    vacuum reclaims it."""
    from nlu_data_warehouse_project_spark.sources.txlog import ConcurrentWriteError

    root = str(tmp_path / "race")
    a = TxTable(spark, root)

    class RacyTable(TxTable):
        """Injects a rival commit between the manifest read and the
        publish — the exact window the race guard protects."""

        rival = None

        def _publish(self, man):
            if RacyTable.rival is not None:
                r, RacyTable.rival = RacyTable.rival, None
                r()
            super()._publish(man)

    b = RacyTable(spark, root)
    seed = spark.createDataFrame([(0, "seed")], "id long, v string")
    a.commit_append(seed, "seed")

    dfa = spark.createDataFrame([(1, "from-a")], "id long, v string")
    dfb = spark.createDataFrame([(2, "from-b")], "id long, v string")
    RacyTable.rival = lambda: a.commit_append(dfa, "a1")

    builds = {"n": 0}

    def builder(t):
        builds["n"] += 1
        return t.commit_append(dfb, "b1")

    v = b.commit_with_retry(builder)
    assert v == 3 and builds["n"] == 2  # lost once, rebased, landed
    got = sorted((r["id"], r["v"]) for r in b.read().collect())
    assert got == [(0, "seed"), (1, "from-a"), (2, "from-b")]

    # the first attempt's data dir is an orphan: invisible to reads,
    # reclaimed by vacuum
    data_dirs = set(os.listdir(os.path.join(root, "data")))
    live = set()
    man = b.manifest()
    live.update(os.path.basename(d) for d in (man["current"], *man["closed"]))
    for vv in b.versions()[:-1]:
        m = b.manifest(vv)
        live.update(os.path.basename(d) for d in (m["current"], *m["closed"]))
    orphans = data_dirs - live
    assert orphans, "the lost attempt should have left an orphan dir"
    dropped = b.vacuum(retain_last=1)
    assert {os.path.basename(d.rstrip('/')) for d in dropped} >= orphans
    assert sorted(r["id"] for r in b.read().collect()) == [0, 1, 2]

    # exhausted retries surface the final error
    RacyTable.rival = None

    class AlwaysLoses(TxTable):
        def _publish(self, man):
            raise ConcurrentWriteError("always")

    c = AlwaysLoses(spark, root)
    with pytest.raises(ConcurrentWriteError):
        c.commit_with_retry(lambda t: t.commit_append(dfb, "b2"), max_retries=2)


def test_verify_fsck_reports_missing_dirs_and_orphans(spark, tmp_path):
    """verify(): green on a healthy table, flags out-of-band dir loss
    as an error per affected version, reports crashed-writer orphans
    informationally, and recovers to ok after vacuum prunes the
    damaged versions."""
    import os
    import shutil

    t = TxTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    t.commit_append(df, "d1")
    t.commit_append(spark.createDataFrame([(2, "b")], "id long, v string"), "d2")

    rep = t.verify(check_rows=True)
    assert rep["ok"] and rep["errors"] == [] and rep["versions_checked"] == [1, 2]

    # a crashed writer's half-written dir: orphan, NOT an error
    os.makedirs(tmp_path / "t" / "data" / "closed-crashed-writer")
    rep = t.verify()
    assert rep["ok"] and rep["orphans"] == ["data/closed-crashed-writer"]

    # out-of-band deletion of a live dir: error naming the versions
    victim = t.manifest(1)["closed"][0]
    shutil.rmtree(tmp_path / "t" / victim)
    rep = t.verify()
    assert not rep["ok"]
    assert any("missing data dir" in e for e in rep["errors"])
    # both v1 and v2 reference the deleted dir
    assert sum("missing data dir" in e for e in rep["errors"]) == 2

    # vacuum() cannot fix a deleted LIVE dir, but after a snapshot
    # replace + vacuum the damaged versions are pruned and verify is
    # green again
    t.commit_snapshot(df, "repair")
    t.vacuum(retain_last=1)
    rep = t.verify(check_rows=True)
    assert rep["ok"] and rep["versions_checked"] == [3]


def test_restore_rolls_back_without_copying_data(spark, tmp_path):
    from nlu_data_warehouse_project_spark.operators.diff import table_history

    t = TxTable(spark, str(tmp_path / "t"))
    d = lambda *ids: spark.createDataFrame([(i, f"v{i}") for i in ids], "id long, v string")  # noqa: E731
    t.commit_append(d(1), "day1")
    t.commit_append(d(2), "day2")
    t.commit_append(d(3), "bad-load")          # the commit to undo

    v = t.restore(2)
    assert v == 4
    # the table reads exactly as v2 again, metadata-only
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2]
    assert t.manifest()["restored_from"] == 2
    # history preserved: the bad version still time-travels for audit
    assert sorted(r["id"] for r in t.read(version=3).collect()) == [1, 2, 3]

    # restore is itself just a commit: appends continue from it
    t.commit_append(d(4), "day4")
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 4]
    # restored_from does not leak into later manifests
    assert "restored_from" not in t.manifest()

    # vacuum keeps the restored dirs (they are referenced by retained
    # manifests) and prunes the bad commit's delta
    t.vacuum(retain_last=2)
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 4]
    assert t.verify()["ok"]


def test_restore_invalidates_bloom_sidecar_delta_path(spark, tmp_path):
    """A restore SHRINKS the closed list while keeping version numbers
    advancing — the sidecar's O(delta) path must not survive it with a
    bitmap that over-covers (false positives are legal) or, worse,
    under-covers after a follow-up append."""
    from nlu_data_warehouse_project_spark.functions.text import doc_fingerprint
    from nlu_data_warehouse_project_spark.operators.bloomindex import BloomFingerprintIndex

    t = TxTable(spark, str(tmp_path / "corpus"))
    docs = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    wfp = lambda df: df.withColumn("fingerprint", doc_fingerprint("text"))  # noqa: E731
    t.commit_append(wfp(docs([(1, "alpha")])), "b0")
    idx = BloomFingerprintIndex(t, num_bits=1 << 14)
    idx.sync()
    t.commit_append(wfp(docs([(2, "beta")])), "b1")
    t.restore(1)                                  # undo b1
    t.commit_append(wfp(docs([(3, "gamma")])), "b2")

    got = sorted(
        r["doc_id"]
        for r in idx.dedup(docs([(10, "alpha"), (11, "beta"), (12, "gamma"), (13, "new")])).collect()
    )
    # beta was rolled back: it IS new again; alpha/gamma are dups
    assert got == [11, 13]


def test_rename_column_is_metadata_only_and_reads_resolve(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit_append(
        spark.createDataFrame([(1, "a")], "id long, val string"), "day1"
    )
    t.commit_append(
        spark.createDataFrame([(2, "b")], "id long, val string"), "day2"
    )
    v = t.rename_column("val", "value")
    # reads resolve old dirs to the new name, data intact
    got = sorted((r["id"], r["value"]) for r in t.read().collect())
    assert got == [(1, "a"), (2, "b")]
    assert "val" not in t.read().columns

    # appends under the NEW name mix with old dirs
    t.commit_append(spark.createDataFrame([(3, "c")], "id long, value string"), "day3")
    got = sorted((r["id"], r["value"]) for r in t.read().collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]

    # time travel to a pre-rename version reads the OLD name
    assert "val" in t.read_closed(version=v - 1).columns

    # chained rename resolves through the prior-name list
    t.rename_column("value", "text_value")
    got = sorted((r["id"], r["text_value"]) for r in t.read().collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        t.rename_column("nope", "x")
    with _pytest.raises(ValueError):
        t.rename_column("text_value", "id")


def test_rename_column_diff_history_and_compaction(spark, tmp_path):
    from nlu_data_warehouse_project_spark.operators.diff import schema_diff, table_history

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([(1, "a")], "id long, val string"), "day1")
    t.commit_append(spark.createDataFrame([(2, "b")], "id long, val string"), "day2")
    t.rename_column("val", "value")

    drift = schema_diff(t, 2)
    assert drift == [
        {"column": "value", "change": "renamed from val",
         "old_type": "string", "new_type": "string"}
    ]
    assert [h["kind"] for h in table_history(t)] == ["append", "append", "rename"]

    # compaction rewrites history under the new name; reads stay green
    assert t.compact_closed(min_dirs=2) is not None
    got = sorted((r["id"], r["value"]) for r in t.read().collect())
    assert got == [(1, "a"), (2, "b")]


def test_rename_column_on_bucketed_current_falls_back(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"), bucket_cols=["natural_key"])
    df = spark.createDataFrame([("k1", 10), ("k2", 20)], "natural_key string, price int")
    t.commit_merge(df, df.limit(0), "day1")
    t.rename_column("price", "unit_price")
    # catalog entry retired; parquet fallback applies the rename
    got = sorted((r["natural_key"], r["unit_price"]) for r in t.read_current().collect())
    assert got == [("k1", 10), ("k2", 20)]


def test_pruning_survives_column_rename(spark, tmp_path):
    """dir_stats recorded under the old name keep pruning after a
    rename: the lookup resolves through the rename lineage."""
    t = TxTable(spark, str(tmp_path / "t"), stats_cols=["day"])
    t.commit_append(spark.createDataFrame([(1, 10)], "id long, day int"), "d1")
    t.commit_append(spark.createDataFrame([(2, 20)], "id long, day int"), "d2")
    t.rename_column("day", "load_day")
    pruned = t.read_closed_pruned("load_day", lo=15)
    assert [r["id"] for r in pruned.collect()] == [2]
    # the disjoint dir was skipped, not just filtered: one input file group
    man = t.manifest()
    stats = man["dir_stats"]
    assert all("day" in s for s in stats.values())  # stats still keyed old-name


def test_restore_across_rename_boundary_reads_back(spark, tmp_path):
    """ADVICE r8 (high): restore() to a PRE-rename version must not
    carry the later rename map — the restored table reads back under
    the target's own column names."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([(1, "a")], "id long, val string"), "day1")
    t.rename_column("val", "value")

    t.restore(1)
    # the pre-rename schema is back, and read() resolves (the r8 bug
    # raised AnalysisException "Cannot resolve column name value")
    got = sorted((r["id"], r["val"]) for r in t.read().collect())
    assert got == [(1, "a")]
    assert "column_renames" not in (t.manifest() or {})

    # restore FORWARD to the post-rename version brings the map back
    t.restore(2)
    got = sorted((r["id"], r["value"]) for r in t.read().collect())
    assert got == [(1, "a")]


def test_snapshot_retires_rename_map_and_frees_old_name(spark, tmp_path):
    """ADVICE r8 (low): a snapshot replaces the only data dir with one
    written under the live schema, so the rename map is retired — a
    later commit may legitimately reintroduce the old column name
    without being re-projected on read."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([(1, "a")], "id long, val string"), "day1")
    t.rename_column("val", "value")
    t.commit_snapshot(
        spark.createDataFrame([(1, "a")], "id long, value string"), "snap"
    )
    assert "column_renames" not in t.manifest()

    # reintroducing the retired name is now legal and reads verbatim
    t.commit_append(
        spark.createDataFrame([(2, "b", "raw")], "id long, value string, val string"),
        "day2",
    )
    cols = set(t.read().columns)
    assert {"val", "value"} <= cols
    got = sorted((r["id"], r["value"], r["val"]) for r in t.read().collect())
    assert got == [(1, "a", None), (2, "b", "raw")]


def test_commit_reusing_renamed_away_name_is_refused(spark, tmp_path):
    """While old dirs still carry a prior name, a commit whose schema
    reuses that name would make history reads ambiguous — refused at
    commit time, with compact+snapshot as the documented escape."""
    from nlu_data_warehouse_project_spark.sources.txlog import SchemaEvolutionError

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([(1, "a")], "id long, val string"), "day1")
    t.rename_column("val", "value")
    with pytest.raises(SchemaEvolutionError, match="renamed away"):
        t.commit_append(
            spark.createDataFrame([(2, "b", "x")], "id long, value string, val string"),
            "day2",
        )
    # merge-shaped commits are guarded the same way
    with pytest.raises(SchemaEvolutionError, match="renamed away"):
        t.commit_merge(
            spark.createDataFrame([(2, "b", "x")], "id long, value string, val string"),
            spark.createDataFrame([], "id long, value string, val string"),
            "day2",
        )


def test_two_threaded_writers_race_same_base_version(spark, tmp_path):
    """VERDICT r8 #2, the non-injected form: two OS threads, two
    TxTable handles on one root, both building against the same base
    version at the same time.  Exactly one publish wins the atomic
    rename; the loser's commit_with_retry rebases onto the winner and
    lands its rows with no duplicates; history and the bloom sidecar
    stay correct afterwards."""
    import threading

    from nlu_data_warehouse_project_spark.operators.diff import table_history

    root = str(tmp_path / "race2")
    seed_t = TxTable(spark, root)
    seed_t.commit_append(
        spark.createDataFrame([(0, "seed")], "id long, v string"), "seed"
    )

    barrier = threading.Barrier(2, timeout=60)
    results: dict[str, int] = {}
    errors: list[BaseException] = []

    def writer(tag: str, row_id: int) -> None:
        try:
            t = TxTable(spark, root)
            df = spark.createDataFrame([(row_id, f"from-{tag}")], "id long, v string")
            aligned = {"done": False}

            def build(tt):
                base = tt.manifest()["version"]
                if not aligned["done"]:
                    aligned["done"] = True
                    barrier.wait()  # both first attempts see the same base
                results[f"{tag}_base"] = base
                return tt.commit_append(df, f"{tag}-run")

            results[tag] = t.commit_with_retry(build, max_retries=3)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    th_a = threading.Thread(target=writer, args=("a", 1))
    th_b = threading.Thread(target=writer, args=("b", 2))
    th_a.start(); th_b.start()
    th_a.join(120); th_b.join(120)
    assert not errors, errors

    # consecutive versions, both rows landed exactly once
    assert sorted((results["a"], results["b"])) == [2, 3]
    final = TxTable(spark, root)
    got = sorted((r["id"], r["v"]) for r in final.read().collect())
    assert got == [(0, "seed"), (1, "from-a"), (2, "from-b")]
    assert [h["kind"] for h in table_history(final)] == ["append", "append", "append"]

    # the sidecar built over the raced history dedups against ALL rows
    from nlu_data_warehouse_project_spark.functions.text import doc_fingerprint
    from nlu_data_warehouse_project_spark.operators.bloomindex import (
        BloomFingerprintIndex,
    )

    fp_root = str(tmp_path / "race-fp")
    fp_t = TxTable(spark, fp_root)
    docs = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    wfp = lambda df: df.withColumn("fingerprint", doc_fingerprint("text"))  # noqa: E731
    barrier2 = threading.Barrier(2, timeout=60)
    errs2: list[BaseException] = []

    def fp_writer(tag: str, did: int, text: str) -> None:
        try:
            t = TxTable(spark, fp_root)
            aligned = {"done": False}

            def build(tt):
                if not aligned["done"]:
                    aligned["done"] = True
                    barrier2.wait()
                return tt.commit_append(wfp(docs([(did, text)])), f"{tag}")

            t.commit_with_retry(build, max_retries=3)
        except BaseException as e:  # noqa: BLE001
            errs2.append(e)

    ta = threading.Thread(target=fp_writer, args=("fa", 1, "alpha"))
    tb = threading.Thread(target=fp_writer, args=("fb", 2, "beta"))
    ta.start(); tb.start(); ta.join(120); tb.join(120)
    assert not errs2, errs2
    idx = BloomFingerprintIndex(TxTable(spark, fp_root), num_bits=1 << 14)
    idx.sync()
    fresh = idx.dedup(docs([(10, "alpha"), (11, "beta"), (12, "gamma")]))
    assert sorted(r["doc_id"] for r in fresh.collect()) == [12]


def test_rename_onto_retired_prior_name_is_refused(spark, tmp_path):
    """Renaming a column ONTO a previously-renamed-away name would make
    _align_to read the retired column's bytes as the new logical
    column (direct name match wins over the rename map) — refused."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit_append(
        spark.createDataFrame([(1, "a", "b")], "id long, a string, b string"), "d1"
    )
    t.rename_column("a", "x")
    with pytest.raises(ValueError, match="renamed away"):
        t.rename_column("b", "a")
    # the legal rename still works and reads resolve
    t.rename_column("b", "y")
    got = t.read().collect()[0]
    assert (got["x"], got["y"]) == ("a", "b")


def test_timestamp_time_travel(spark, tmp_path):
    """Commits stamp committed_at from the injected clock; read_as_of
    resolves the version live at that instant.  The stamp is an OWNED
    key: each commit gets its own, never a carried one."""
    ticks = iter([100.0, 200.0, 300.0])
    t = TxTable(spark, str(tmp_path / "t"), clock=lambda: next(ticks))
    t.commit_append(spark.createDataFrame([(1,)], "id long"), "d1")   # v1 @100
    t.commit_append(spark.createDataFrame([(2,)], "id long"), "d2")   # v2 @200
    t.commit_append(spark.createDataFrame([(3,)], "id long"), "d3")   # v3 @300

    assert t.manifest(2)["committed_at"] == 200.0
    assert t.version_as_of(250.0) == 2
    assert t.version_as_of(200.0) == 2          # boundary: <= is live
    assert t.version_as_of(9999.0) == 3
    assert sorted(r["id"] for r in t.read_as_of(250.0).collect()) == [1, 2]

    with pytest.raises(VersionNotFoundError, match="at or before"):
        t.version_as_of(50.0)


def test_time_travel_respects_vacuum_retention(spark, tmp_path):
    """After vacuum prunes old manifests, a ts pointing into the pruned
    range raises instead of silently resolving to a nearby version."""
    ticks = iter([100.0, 200.0, 300.0])
    t = TxTable(spark, str(tmp_path / "t"), clock=lambda: next(ticks))
    for i, d in enumerate(["d1", "d2", "d3"]):
        t.commit_append(spark.createDataFrame([(i,)], "id long"), d)
    t.vacuum(retain_last=1)
    assert t.version_as_of(350.0) == 3
    with pytest.raises(VersionNotFoundError):
        t.version_as_of(150.0)


def test_table_changes_tags_rows_with_their_commit(spark, tmp_path):
    """CDF over three appends: each row carries the _commit_version /
    _commit_run_id of the commit that introduced it; half-open span
    semantics (since exclusive, to inclusive)."""
    t = TxTable(spark, str(tmp_path / "t"))
    for i, d in enumerate(["d1", "d2", "d3"], start=1):
        t.commit_append(spark.createDataFrame([(i,)], "id long"), d)

    feed = t.table_changes(1).collect()
    assert sorted((r["id"], r["_commit_version"], r["_commit_run_id"]) for r in feed) == [
        (2, 2, "d2"),
        (3, 3, "d3"),
    ]
    assert t.table_changes(1, to_version=2).collect()[0]["id"] == 2
    assert t.table_changes(3).count() == 0


def test_table_changes_skips_compaction_products(spark, tmp_path):
    """A compaction rewrites already-fed rows: the feed after
    compaction must not re-emit them, and a post-compaction append is
    still attributed correctly."""
    t = TxTable(spark, str(tmp_path / "t"))
    v1 = t.commit_append(spark.createDataFrame([(1,)], "id long"), "d1")
    t.commit_append(spark.createDataFrame([(2,)], "id long"), "d2")
    t.compact_closed(min_dirs=2)
    t.commit_append(spark.createDataFrame([(3,)], "id long"), "d3")

    feed = t.table_changes(v1).collect()
    assert sorted((r["id"], r["_commit_run_id"]) for r in feed) == [(2, "d2"), (3, "d3")]


def test_table_changes_refuses_vacuumed_span(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    for i, d in enumerate(["d1", "d2", "d3", "d4"], start=1):
        t.commit_append(spark.createDataFrame([(i,)], "id long"), d)
    t.vacuum(retain_last=2)
    with pytest.raises(VersionNotFoundError, match="retained"):
        t.table_changes(1)


def test_two_threaded_merge_writers_rebase_preserves_both_updates(spark, tmp_path):
    """The MERGE-shaped twin of the append race: two writers each
    read the current set, update a DIFFERENT key, and commit_merge at
    the same base version.  The loser's commit_with_retry builder
    RE-READS the advanced current set, so the winner's update survives
    in the rebased commit — blindly retrying the pre-built frame would
    be the classic lost update."""
    import threading

    root = str(tmp_path / "mrace")
    seed = TxTable(spark, root)
    cur0 = spark.createDataFrame([("k1", 1), ("k2", 2)], "k string, v int")
    seed.commit_merge(cur0, cur0.limit(0), "seed")

    barrier = threading.Barrier(2, timeout=60)
    errors: list[BaseException] = []

    def writer(key: str, newval: int) -> None:
        try:
            t = TxTable(spark, root)
            first = {"done": False}

            def build(tt):
                cur = tt.read_current()
                updated = cur.withColumn(
                    "v",
                    F.when(F.col("k") == key, F.lit(newval)).otherwise(F.col("v")),
                )
                updated = spark.createDataFrame(updated.collect(), updated.schema)
                if not first["done"]:
                    first["done"] = True
                    barrier.wait()  # both first attempts build on base v1
                return tt.commit_merge(updated, updated.limit(0), f"w-{key}")

            t.commit_with_retry(build, max_retries=3)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    ta = threading.Thread(target=writer, args=("k1", 10))
    tb = threading.Thread(target=writer, args=("k2", 20))
    ta.start(); tb.start(); ta.join(60); tb.join(60)
    assert not errors, errors

    final = TxTable(spark, root)
    assert final.manifest()["version"] == 3  # seed + two serialized merges
    got = {(r["k"], r["v"]) for r in final.read_current().collect()}
    assert got == {("k1", 10), ("k2", 20)}, got


def test_table_changes_across_rename_and_added_column(spark, tmp_path):
    """A rename and a schema add INSIDE the feed span: every part
    aligns to the feed-end schema (old-name dirs resolve through the
    rename map, pre-add rows null-fill), so the union is coherent and
    values land under the final column names."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([(1, "a")], "id long, val string"), "d1")
    t.commit_append(spark.createDataFrame([(2, "b")], "id long, val string"), "d2")
    t.rename_column("val", "value")                              # v3
    t.commit_append(
        spark.createDataFrame([(3, "c", "x")], "id long, value string, note string"),
        "d4",
    )
    feed = t.table_changes(1).collect()
    got = sorted((r["id"], r["value"], r["note"], r["_commit_version"]) for r in feed)
    assert got == [(2, "b", None, 2), (3, "c", "x", 4)], got


def test_table_changes_restore_reemits_compaction_products(spark, tmp_path):
    """ADVICE r9: a RESTORE that re-introduces a previously-closed
    COMPACTED dir must re-emit its rows (documented live-state
    semantics) — the lineage skip only applies to the commit that
    created the product.  v1 d1, v2 d2, v3 compact→P, v4 restore to
    v1 (drops P), v5 restore to v3 (re-introduces P)."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([(1,)], "id long"), "d1")
    t.commit_append(spark.createDataFrame([(2,)], "id long"), "d2")
    v3 = t.compact_closed(min_dirs=2)
    v4 = t.restore(1)
    v5 = t.restore(v3)
    # feed from v4 → v5 re-introduces the compacted dir: both its rows
    # re-enter live state at the restore commit
    feed = t.table_changes(v4).collect()
    assert sorted((r["id"], r["_commit_version"]) for r in feed) == [(1, v5), (2, v5)]
    # the compaction commit itself still does NOT re-emit (unchanged)
    assert t.table_changes(v3 - 1, to_version=v3).count() == 0

def test_schema_widening_int_to_long(spark, tmp_path):
    """VERDICT r9 #3: lossless type widenings are accepted evolution.
    Commit int rows, append long rows: the live schema widens, old dirs
    cast at read, time travel to v1 still returns int, and a NARROWING
    commit still refuses."""
    from nlu_data_warehouse_project_spark.sources.txlog import SchemaEvolutionError

    t = TxTable(spark, str(tmp_path / "widen"))
    d1 = spark.createDataFrame([(1, 10)], "k int, v int")
    t.commit_append(d1, run_id="d1")
    d2 = spark.createDataFrame([(2, 2**40)], "k int, v long")
    t.commit_append(d2, run_id="d2")

    out = t.read()
    assert dict(out.dtypes)["v"] == "bigint"
    assert {r["v"] for r in out.collect()} == {10, 2**40}

    # time travel: v1's manifest owns the pre-widening schema
    old = t.read(1)
    assert dict(old.dtypes)["v"] == "int"
    assert [r["v"] for r in old.collect()] == [10]

    # narrowing back to int refuses
    d3 = spark.createDataFrame([(3, 30)], "k int, v int")
    with pytest.raises(SchemaEvolutionError, match="not a lossless widening"):
        t.commit_append(d3, run_id="d3")


def test_schema_widening_float_decimal_and_refusals(spark, tmp_path):
    """float->double and decimal(p,s)->decimal(p+k,s) widen; scale
    shrink and cross-family retypes refuse."""
    from nlu_data_warehouse_project_spark.sources.txlog import SchemaEvolutionError

    t = TxTable(spark, str(tmp_path / "widen2"))
    t.commit_append(
        spark.createDataFrame([(1, 1.5, "9999999.99")], "k int, f float, d string")
        .select("k", "f", F.col("d").cast("decimal(9,2)").alias("d")),
        run_id="d1",
    )
    t.commit_append(
        spark.createDataFrame([(2, 2.5, "99999999999.999")], "k int, f double, d string")
        .select("k", "f", F.col("d").cast("decimal(14,3)").alias("d")),
        run_id="d2",
    )
    out = t.read()
    assert dict(out.dtypes)["f"] == "double"
    assert dict(out.dtypes)["d"] == "decimal(14,3)"
    vals = {str(r["d"]) for r in out.collect()}
    assert vals == {"9999999.990", "99999999999.999"}

    # decimal scale shrink loses digits -> refuse
    with pytest.raises(SchemaEvolutionError):
        t.commit_append(
            spark.createDataFrame([(3, 3.5, "1")], "k int, f double, d string")
            .select("k", "f", F.col("d").cast("decimal(14,1)").alias("d")),
            run_id="d3",
        )
    # cross-family retype (long -> string) -> refuse
    with pytest.raises(SchemaEvolutionError):
        t.commit_append(
            spark.createDataFrame([("x", 4.5, "1")], "k string, f double, d string")
            .select("k", "f", F.col("d").cast("decimal(14,3)").alias("d")),
            run_id="d4",
        )


def test_schema_widening_via_merge_keeps_history_readable(spark, tmp_path):
    """A merge commit that widens: old closed dirs (int) and the new
    current (long) reconcile in one read; no history rewrite needed."""
    t = TxTable(spark, str(tmp_path / "widen3"))
    t.commit_merge(
        current=spark.createDataFrame([(1, 100)], "k int, v int"),
        closed_delta=spark.createDataFrame([(0, 50)], "k int, v int"),
        run_id="d1",
    )
    t.commit_merge(
        current=spark.createDataFrame([(1, 2**41)], "k int, v long"),
        closed_delta=spark.createDataFrame([(1, 100)], "k int, v long"),
        run_id="d2",
    )
    out = t.read()
    assert dict(out.dtypes)["v"] == "bigint"
    assert sorted(r["v"] for r in out.collect()) == [50, 100, 2**41]

def test_cdf_tail_consumer_round_trip_with_restore(spark, tmp_path):
    """VERDICT r9 #5: an incremental consumer tails ``table_changes``
    into a DOWNSTREAM TxTable and must converge to the batch rebuild.

    Three append commits stream through one at a time (watermark
    recorded in the downstream manifest ``extra``, the documented
    pattern).  Then a snapshot replaces the live table (no closed rows
    -> empty feed) and a RESTORE re-introduces the old closed dirs:
    the feed RE-EMITS them at the restore commit — correct for
    live-state consumers — and an exactly-once consumer handles the
    replay with its own bookkeeping (primary-key anti-join here).
    End state: downstream == upstream.read_closed(), both after the
    three appends and after the restore."""
    up = TxTable(spark, str(tmp_path / "up"))
    down = TxTable(spark, str(tmp_path / "down"))

    def consume():
        """Tail (last_consumed, latest] into downstream, exactly-once
        via primary-key anti-join; watermark rides the manifest.  The
        FIRST tail is an initial snapshot (table_changes needs its
        since-manifest retained, and there is no v0) — the standard
        CDC bootstrap."""
        last = (down.manifest() or {}).get("src_version")
        latest = up.latest_version()
        if latest == last:
            return None
        if last is None:
            feed = up.read_closed(latest)
        else:
            feed = up.table_changes(last, latest).drop("_commit_version", "_commit_run_id")
        if down.exists():
            feed = feed.join(down.read(), "id", "left_anti")
        down.commit_append(feed, run_id=f"cdf-{latest}", extra={"src_version": latest})
        return feed

    def assert_converged():
        want = sorted((r["id"], r["v"]) for r in up.read_closed().collect())
        got = sorted((r["id"], r["v"]) for r in down.read().collect())
        assert got == want

    for lo, hi in ((1, 3), (4, 6), (7, 9)):
        up.commit_append(
            spark.createDataFrame([(i, i * 10) for i in range(lo, hi + 1)], "id int, v int"),
            run_id=f"d{lo}",
        )
        consume()
    assert_converged()  # 9 rows, three tails == batch rebuild

    # snapshot: live table replaced, closed history emptied -> the CDF
    # has nothing closed-entering; consumer sees an empty increment
    up.commit_snapshot(
        spark.createDataFrame([(100, 0)], "id int, v int"), run_id="snap"
    )
    inc = consume()
    assert inc is not None and inc.count() == 0

    # restore to the 3-append state: the old closed dirs RE-ENTER the
    # live history -> the feed re-emits all 9 rows tagged with the
    # restore commit (live-state consumers want exactly this)
    restored_v = up.restore(3)
    raw = up.table_changes((down.manifest() or {})["src_version"]).collect()
    assert len(raw) == 9
    assert {r["_commit_version"] for r in raw} == {restored_v}
    assert {r["_commit_run_id"] for r in raw} == {"restore-v3"}

    # ...and the exactly-once consumer absorbs the replay: anti-join
    # drops all 9 already-consumed rows; end state still == rebuild
    consume()
    assert_converged()
    assert (down.manifest() or {})["src_version"] == restored_v

def test_clustered_compaction_tightens_pruning_stats(spark, tmp_path):
    """compact_closed(cluster_by=...) range-partitions history into
    value bands with EXACT re-recorded stats: content identical, band
    ranges (near-)disjoint, a narrow predicate overlaps only its band
    (daily dirs each straddled the whole key range, so pre-compaction
    NOTHING pruned), time travel and the CDF product-skip intact."""
    t = TxTable(spark, str(tmp_path / "clust"), stats_cols=["v"])
    # 8 "daily" appends; each day's rows span the WHOLE key range, so
    # per-day [min, max] on k is always [0, 79] — unprunable by k
    for day in range(8):
        rows = [(k, day * 100 + k) for k in range(0, 80, 10)]
        t.commit_append(
            spark.createDataFrame(rows, "k int, v int"), run_id=f"d{day}"
        )
    before = sorted((r["k"], r["v"]) for r in t.read().collect())
    v_pre = t.latest_version()

    ver = t.compact_closed(min_dirs=8, cluster_by="k", n_output_dirs=4)
    assert ver == v_pre + 1

    man = t.manifest()
    bands = man["closed"]
    assert 1 < len(bands) <= 4
    assert all("__cluster=" in d for d in bands)
    # content unchanged
    after = sorted((r["k"], r["v"]) for r in t.read().collect())
    assert after == before

    # exact per-band stats on the CLUSTER column, recorded even though
    # k is not in stats_cols; bands must not all straddle the full range
    stats = man["dir_stats"]
    ranges = [tuple(stats[d]["k"]) for d in bands]
    assert all(lo is not None and hi is not None for lo, hi in ranges)
    spans = sorted(ranges)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"bands overlap: {spans}"
    # a narrow predicate overlaps exactly one band now
    overlapping = [d for d in bands if stats[d]["k"][0] <= 5 and stats[d]["k"][1] >= 5]
    assert len(overlapping) == 1
    got = sorted(r["v"] for r in t.read_closed_pruned("k", lo=5, hi=5).collect())
    assert got == sorted(v for k, v in before if k == 5)

    # stats_cols ("v") recorded per band too
    assert all("v" in stats[d] for d in bands)

    # time travel to the pre-compaction version still reads all dirs
    assert sorted((r["k"], r["v"]) for r in t.read(v_pre).collect()) == before
    # CDF: the bands are compaction products — not re-emitted
    assert t.table_changes(v_pre).count() == 0


def test_clustered_compaction_validates_column(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "clustbad"))
    for day in range(2):
        t.commit_append(spark.createDataFrame([(day,)], "k int"), run_id=f"d{day}")
    with pytest.raises(ValueError, match="cluster_by"):
        t.compact_closed(min_dirs=2, cluster_by="nope")
    with pytest.raises(ValueError, match="n_output_dirs"):
        t.compact_closed(min_dirs=2, cluster_by="k", n_output_dirs=0)


def test_commit_replace_slice_semantics(spark, tmp_path):
    """commit_replace_slice: per-slice replacement at the manifest level
    — replaced dirs leave the closed list but stay readable via time
    travel; read_slice scans exactly one slice; vacuum reclaims
    superseded slice dirs; compact_closed refuses on sliced tables."""
    import pytest as _pytest

    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "sl"))
    v1 = t.commit_replace_slice(
        spark.createDataFrame([(1, "a")], "id long, v string"), "day1", "r1"
    )
    t.commit_replace_slice(
        spark.createDataFrame([(2, "b")], "id long, v string"), "day2", "r2"
    )
    # replace day1: reader sees the new copy only
    v3 = t.commit_replace_slice(
        spark.createDataFrame([(1, "a2"), (3, "c")], "id long, v string"), "day1", "r3"
    )
    assert sorted((r["id"], r["v"]) for r in t.read().collect()) == [
        (1, "a2"), (2, "b"), (3, "c")
    ]
    assert sorted(r["id"] for r in t.read_slice("day1").collect()) == [1, 3]
    assert [r["v"] for r in t.read_slice("day2").collect()] == ["b"]
    assert t.read_slice("day3").count() == 0  # unknown slice: empty, typed
    # time travel: v1 still shows the original day1 rows
    assert [(r["id"], r["v"]) for r in t.read(version=v1).collect()] == [(1, "a")]
    assert [r["v"] for r in t.read_slice("day1", version=v1).collect()] == ["a"]
    with _pytest.raises(ValueError, match="slice-replaced"):
        t.compact_closed(min_dirs=1)
    # vacuum to the latest version: the superseded day1 dir is reclaimed
    dropped = t.vacuum(retain_last=1)
    assert dropped  # the replaced day1 dir (and old manifests' leftovers)
    assert sorted((r["id"], r["v"]) for r in t.read().collect()) == [
        (1, "a2"), (2, "b"), (3, "c")
    ]
    assert v3 == 3


def test_clustered_compaction_prunes_bands_at_bench_scale(spark, tmp_path):
    """VERDICT r10 #6 — the pruning PROOF at bench scale (sf0.1
    lineitem, ~600k rows), measured on the actual scan, not the
    manifest: commit 8 appends that each straddle the FULL shipdate
    range (hash-bucketed rows — pruning can skip nothing), then
    compact clustered on l_shipdate into 4 bands and assert a narrow
    date predicate (a) reads files from exactly ONE of the 4 band dirs
    (``inputFiles()``), and (b) returns the identical rows."""
    import os

    import pytest as _pytest

    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    bench_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(bench_sf):
        _pytest.skip(f"bench sf dir {bench_sf} not present")
    li = spark.read.parquet(f"{bench_sf}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"
    )
    t = TxTable(spark, str(tmp_path / "cl"), stats_cols=["l_shipdate"])
    for b in range(8):
        t.commit_append(li.filter(F.col("l_orderkey") % 8 == b), f"b{b}")
    man = t.manifest()
    # pre-clustering: every dir straddles the full range -> no dir is
    # prunable for a mid-range predicate
    lo, hi = "1998-06-01", "1998-06-30"  # mid-range of the 1995-2001 span
    pre = t.read_closed_pruned("l_shipdate", lo, hi)
    pre_dirs = {p.split("/data/")[1].split("/")[0] for p in pre.inputFiles()}
    assert len(pre_dirs) == 8, "hash-bucketed appends must all straddle"

    ver = t.compact_closed(min_dirs=8, cluster_by="l_shipdate", n_output_dirs=4)
    assert ver is not None
    assert len(t.manifest()["closed"]) == 4
    post = t.read_closed_pruned("l_shipdate", lo, hi)
    post_dirs = {
        p.split("/data/")[1].rsplit("/", 1)[0] for p in post.inputFiles()
    }
    assert len(post_dirs) == 1, (
        f"a one-month predicate must hit exactly one of 4 bands, got {post_dirs}"
    )
    # and pruning is a pure optimization: identical rows
    want = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.filter(F.col("l_shipdate").between(lo, hi)).collect()
    )
    got = sorted((r["l_orderkey"], r["l_linenumber"]) for r in post.collect())
    assert got == want
    assert man["version"] + 1 == ver


def test_zorder_compaction_prunes_on_both_dimensions(spark, tmp_path):
    """Multi-column Z-order clustering: after compact_closed(cluster_by=
    [x, y]) BOTH single-column predicates prune dirs — the property a
    1-D sort cannot give (clustering on x makes every band full-width
    in y).  Also: identical rows, and the 1-D path still accepts a
    plain string."""
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "z"), stats_cols=["x", "y"])
    # dense independent grid: x, y uniform over 0..63, shuffled into 8
    # straddling appends so pre-compaction stats prune nothing
    rows = [(i, (i * 29) % 64, (i * 37) % 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    for b in range(8):
        t.commit_append(df.filter(F.col("id") % 8 == b), f"b{b}")

    def dirs_scanned(q):
        return {p.split("/data/")[1].rsplit("/", 1)[0] for p in q.inputFiles()}

    assert len(dirs_scanned(t.read_closed_pruned("x", 10, 12))) == 8
    ver = t.compact_closed(min_dirs=8, cluster_by=["x", "y"], n_output_dirs=8)
    assert ver is not None and len(t.manifest()["closed"]) == 8

    x_dirs = dirs_scanned(t.read_closed_pruned("x", 10, 12))
    y_dirs = dirs_scanned(t.read_closed_pruned("y", 50, 52))
    assert len(x_dirs) < 8, f"x predicate must prune, scanned {len(x_dirs)}"
    assert len(y_dirs) < 8, f"y predicate must prune, scanned {len(y_dirs)}"

    got = sorted(r["id"] for r in t.read_closed_pruned("x", 10, 12).collect())
    want = sorted(i for (i, x, _) in rows if 10 <= x <= 12)
    assert got == want
    got_y = sorted(r["id"] for r in t.read_closed_pruned("y", 50, 52).collect())
    want_y = sorted(i for (i, _, y) in rows if 50 <= y <= 52)
    assert got_y == want_y


def test_delete_where_rewrites_only_hit_dirs(spark, tmp_path):
    """GDPR erasure: delete_where rewrites ONLY dirs containing
    matching rows (untouched dirs keep their exact files), prior
    versions still read the deleted rows until vacuum completes the
    erasure, the CDF does not re-emit survivors, and NULL-condition
    rows follow SQL DELETE semantics (kept)."""
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "del"), stats_cols=["uid"])
    t.commit_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "uid long, v string"), "d1"
    )
    t.commit_append(
        spark.createDataFrame([(3, "c"), (4, "d")], "uid long, v string"), "d2"
    )
    t.commit_append(
        spark.createDataFrame([(2, "e"), (None, "n")], "uid long, v string"), "d3"
    )
    man_before = t.manifest()
    res = t.delete_where(F.col("uid") == 2, run_id="erase-u2")
    assert res["n_deleted"] == 2 and len(res["rewritten"]) == 2
    man = t.manifest()
    # the d2 dir had no hits: same dir name survives in the manifest
    untouched = [d for d in man_before["closed"] if "d2" in d]
    assert untouched and untouched[0] in man["closed"]
    # survivors + the NULL-uid row remain
    assert sorted((r["uid"], r["v"]) for r in t.read().collect()
                  if r["uid"] is not None) == [(1, "a"), (3, "c"), (4, "d")]
    assert [r["v"] for r in t.read().collect() if r["uid"] is None] == ["n"]
    # time travel: the audit trail still shows uid=2 rows pre-delete
    old_rows = {(r["uid"], r["v"]) for r in t.read(version=man_before["version"]).collect()}
    assert (2, "b") in old_rows and (2, "e") in old_rows
    # CDF across the delete: survivors are NOT re-emitted
    cdf = t.table_changes(man_before["version"])
    assert cdf.count() == 0
    # stats re-recorded for rewritten dirs: the d1 replacement keeps
    # uid=1 only (range shrank to [1,1]); the d3 replacement holds just
    # the NULL-uid row, so its range is honestly unknown (None)
    rewritten_new = [d for d in man["closed"] if d not in man_before["closed"]]
    mins = sorted(
        (man["dir_stats"][d]["uid"][0] is not None) for d in rewritten_new
    )
    assert mins == [False, True]
    one_dir = [d for d in rewritten_new if man["dir_stats"][d]["uid"][0] is not None]
    assert man["dir_stats"][one_dir[0]]["uid"] == [1, 1]
    # erasure completes at vacuum: replaced dirs reclaimed, reads intact
    dropped = t.vacuum(retain_last=1)
    assert any(any(x in d for x in res["rewritten"]) for d in dropped)
    assert sorted(r["v"] for r in t.read().collect()) == ["a", "c", "d", "n"]
    # zero-match delete publishes nothing
    v_now = t.latest_version()
    res2 = t.delete_where(F.col("uid") == 99)
    assert res2 == {"version": None, "n_deleted": 0, "rewritten": []}
    assert t.latest_version() == v_now


def test_delete_where_slices_and_current(spark, tmp_path):
    """delete_where composes with commit_replace_slice (tags carry to
    the rewritten dir; read_slice stays correct) and rewrites a hit
    CURRENT dir (snapshot-shaped tables)."""
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "sl"))
    t.commit_replace_slice(
        spark.createDataFrame([(1, "x"), (2, "y")], "uid long, v string"), "day1", "r1"
    )
    t.commit_replace_slice(
        spark.createDataFrame([(3, "z")], "uid long, v string"), "day2", "r2"
    )
    t.delete_where(F.col("uid") == 1, run_id="erase")
    assert sorted(r["v"] for r in t.read_slice("day1").collect()) == ["y"]
    assert [r["v"] for r in t.read_slice("day2").collect()] == ["z"]

    snap = TxTable(spark, str(tmp_path / "snap"))
    snap.commit_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "uid long, v string"), "s1"
    )
    res = snap.delete_where("uid = 1", run_id="erase")
    assert res["n_deleted"] == 1
    assert [r["v"] for r in snap.read_current().collect()] == ["b"]
    assert snap.manifest()["delete_predicate"] == "uid = 1"
    # the predicate is an OWNED key: the next commit does not carry it
    snap.commit_snapshot(
        spark.createDataFrame([(9, "q")], "uid long, v string"), "s2"
    )
    assert "delete_predicate" not in snap.manifest()


def test_update_where_rewrites_only_hit_dirs(spark, tmp_path):
    """update_where: SET semantics on matching rows only, untouched
    dirs keep their files, assignments cast back to the column's type
    (no retype smuggling), pre-update values stay time-travelable, the
    predicate rides the manifest as an owned key, zero-match is a
    no-op."""
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "up"), stats_cols=["price"])
    t.commit_append(
        spark.createDataFrame([(1, 100, "a"), (2, 200, "b")], "id long, price long, v string"),
        "d1",
    )
    t.commit_append(
        spark.createDataFrame([(3, 300, "c")], "id long, price long, v string"), "d2"
    )
    man_before = t.manifest()
    res = t.update_where(
        F.col("price") >= 200, {"price": F.col("price") + 5, "v": F.lit("adj")},
        run_id="reprice",
    )
    assert res["n_updated"] == 2 and len(res["rewritten"]) == 1 or len(res["rewritten"]) == 2
    got = sorted((r["id"], r["price"], r["v"]) for r in t.read().collect())
    assert got == [(1, 100, "a"), (2, 205, "adj"), (3, 305, "adj")]
    # d1's dir was rewritten (row 2 hit); check type survived: price long
    assert dict(t.read().dtypes)["price"] == "bigint"
    # time travel shows the pre-update values
    old = sorted((r["id"], r["price"]) for r in t.read(version=man_before["version"]).collect())
    assert old == [(1, 100), (2, 200), (3, 300)]
    # stats re-recorded on rewritten dirs
    man = t.manifest()
    assert man["update_predicate"].startswith("Column") or "price" in man["update_predicate"]
    # zero-match no-op
    v = t.latest_version()
    assert t.update_where("price > 9999", {"v": F.lit("x")}) == {
        "version": None, "n_updated": 0, "rewritten": []
    }
    assert t.latest_version() == v
    # assignment to an unknown column refuses up front
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown column"):
        t.update_where("price > 0", {"nope": F.lit(1)})
    # the predicate is an OWNED key: next commit does not carry it
    t.commit_append(
        spark.createDataFrame([(9, 900, "z")], "id long, price long, v string"), "d3"
    )
    assert "update_predicate" not in t.manifest()


def test_replace_slice_carries_delete_lineage_no_cdf_double_feed(spark, tmp_path):
    """ADVICE r11 txlog:1010 — commit_replace_slice must CARRY (and
    prune) compacted_lineage like commit_append: delete_where on a
    sliced table records lineage for the rewritten dirs, and before the
    fix the next replace_slice erased the map, so a CDF consumer
    crossing that version saw the rewritten dirs as brand-new data and
    re-consumed every surviving row (double-feed)."""
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "rs"))
    t.commit_replace_slice(
        spark.createDataFrame([(1, "a"), (2, "b")], "uid long, v string"), "day1", "r1"
    )
    t.commit_replace_slice(
        spark.createDataFrame([(3, "c")], "uid long, v string"), "day2", "r2"
    )
    v_consumed = t.latest_version()
    res = t.delete_where(F.col("uid") == 2, run_id="erase")
    assert res["n_deleted"] == 1 and len(res["rewritten"]) == 1
    t.commit_replace_slice(
        spark.createDataFrame([(4, "d")], "uid long, v string"), "day3", "r3"
    )
    man = t.manifest()
    # the lineage entry for the rewritten day1 dir survived the slice commit
    assert man.get("compacted_lineage"), "replace_slice dropped compacted_lineage"
    # CDF since the pre-delete version emits ONLY day3's genuinely-new
    # rows — the day1 survivor (1,'a') is not re-fed
    cdf = t.table_changes(v_consumed)
    assert sorted(r["v"] for r in cdf.collect()) == ["d"]
    # and replacing day1 itself prunes its (now-stranded) lineage entry
    t.commit_replace_slice(
        spark.createDataFrame([(7, "g")], "uid long, v string"), "day1", "r4"
    )
    assert t.manifest().get("compacted_lineage", {}) == {}


def test_zorder_with_null_cluster_values_keeps_layout_quality(spark, tmp_path):
    """ADVICE r11 txlog:1219 — rows with NULL cluster values must be
    split out of the exact-ntile fence computation: with enough NULLs a
    fence row landed on a NULL (NULLS FIRST under asc), every fence
    comparison evaluated NULL, and the whole dimension's buckets
    collapsed to a single band.  After the fix: non-null rows still get
    a multi-band Z layout (both dimensions prune), NULL rows co-locate
    under a sentinel and are never lost."""
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "zn"), stats_cols=["x", "y"])
    # 25% NULL x (> 1/16 of rows, so pre-fix the first fences landed on
    # NULLs and the x dimension collapsed); y stays dense
    rows = [
        (i, None if i % 4 == 0 else (i * 29) % 64, (i * 37) % 64)
        for i in range(4096)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    for b in range(8):
        t.commit_append(df.filter(F.col("id") % 8 == b), f"b{b}")

    ver = t.compact_closed(min_dirs=8, cluster_by=["x", "y"], n_output_dirs=8)
    assert ver is not None and len(t.manifest()["closed"]) == 8

    def dirs_scanned(q):
        return {p.split("/data/")[1].rsplit("/", 1)[0] for p in q.inputFiles()}

    x_dirs = dirs_scanned(t.read_closed_pruned("x", 10, 12))
    y_dirs = dirs_scanned(t.read_closed_pruned("y", 50, 52))
    assert len(x_dirs) < 8, f"x pruning collapsed under NULLs: scanned {len(x_dirs)}"
    assert len(y_dirs) < 8, f"y pruning collapsed under NULLs: scanned {len(y_dirs)}"
    # no row lost or duplicated, NULLs included
    assert t.read().count() == 4096
    assert t.read().filter(F.col("x").isNull()).count() == 1024
    got = sorted(r["id"] for r in t.read_closed_pruned("x", 10, 12).collect())
    want = sorted(i for (i, x, _) in rows if x is not None and 10 <= x <= 12)
    assert got == want
