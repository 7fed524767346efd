"""TxTable gold persistence guarantees (VERDICT r1 Next-round #1/#2):
history dirs are immutable across merges, a crash before the manifest
commit leaves the previous version readable, and per-stage failure
statuses make each stage retry idempotently from itself."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.pipeline import Warehouse
from nlu_data_warehouse_project_spark.sources.txlog import TxTable

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
    monkeypatch.setattr(TxTable, "_publish", lambda self, man: (_ for _ in ()).throw(boom))
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

    staged = spark.read.parquet(wh.staging_dir).filter(
        (F.col("id_config") == 1) & (F.col("dt_load") == F.to_date(F.lit("2024-12-08")))
    )
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
