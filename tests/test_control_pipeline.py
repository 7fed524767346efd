"""Control plane (T2/T3 guards, J1 join, J6 upserts) and end-to-end
P1->P2->P3 pipeline over FIXTURES.md F-2 style multi-day snapshots."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.control import ControlPlane
from nlu_data_warehouse_project_spark.functions.calendar import build_date_dim
from nlu_data_warehouse_project_spark.pipeline import DuplicateRunError, Warehouse
from nlu_data_warehouse_project_spark.schemas import (
    FILE_CONFIG_SCHEMA,
    STATUS_EXTRACT_SUCCESS,
    STATUS_LOAD_DW_SUCCESS,
    STATUS_LOAD_STAGING_SUCCESS,
    STATUS_RUNNING,
)

FEED_COLS = ["sku", "product_name", "price", "brand", "material", "shape",
             "dimension", "origin", "quantity_available", "product_url"]


def _feed(spark, rows):
    """rows: list of (sku, name, price, brand) — rest filled."""
    data = [
        (sku, name, price, brand, "Titanium", "Chữ nhật", "54-17-138", "Nhật", "4",
         f"https://example.vn/p/{sku}")
        for (sku, name, price, brand) in rows
    ]
    return spark.createDataFrame(data, FEED_COLS)


def _config_row(spark):
    return spark.createDataFrame(
        [Row(id=1, name="matkinh", source="https://kinhmatviettin.vn",
             source_file_location="daily/", destination_table_staging="matkinh_daily",
             destination_table_dw="dw", bucket_name="b", folder_b2_name="f", bucket_id="x")],
        FILE_CONFIG_SCHEMA,
    )


def test_control_plane_state_machine(spark):
    ctrl = ControlPlane.empty(spark)
    ctrl = ControlPlane(spark, _config_row(spark), ctrl.logs)
    assert ctrl.fetch_config(1)["name"] == "matkinh"
    assert ctrl.fetch_config(99) is None

    ctrl = ctrl.insert_log(1, "f.csv", "2024-12-08", STATUS_RUNNING)
    assert ctrl.has_log(1, "2024-12-08", [STATUS_RUNNING])
    assert not ctrl.has_log(1, "2024-12-09", [STATUS_RUNNING])

    ctrl = ctrl.update_status(1, "2024-12-08", STATUS_EXTRACT_SUCCESS, count=100, file_size_kb=16)
    info = ctrl.fetch_file_info(1, "2024-12-08", STATUS_EXTRACT_SUCCESS)
    assert info is not None
    assert info["count"] == 100 and info["file_size_kb"] == 16
    assert info["destination_table_dw"] == "dw"
    assert ctrl.fetch_file_info(1, "2024-12-08", STATUS_RUNNING) is None


def test_pipeline_three_days_scd2(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    build_date_dim(spark, "2024-12-01", "2024-12-31").write.parquet(wh.date_dim_dir)

    # day 0: k1/k2; duplicate rows in the raw feed (F-1 invariant)
    d0 = _feed(spark, [("S1", "P1", "100", "A"), ("S1", "P1", "100", "A"), ("S2", "P2", "200 ", "B")])
    dw = wh.run_day(d0, 1, "2024-12-08")
    assert dw.count() == 2  # deduped
    assert {r["price"] for r in dw.collect()} == {100, 200}

    # duplicate-run guard trips
    with pytest.raises(DuplicateRunError):
        wh.extract(d0, 1, "2024-12-08")

    # day 1: k1 price changes, k3 appears, k2 vanishes
    d1 = _feed(spark, [("S1", "P1", "150", "A"), ("S3", "P3", "300", "C")])
    dw = wh.run_day(d1, 1, "2024-12-09")
    open_rows = dw.filter(F.col("dt_last_update") == F.lit("9999-12-31").cast("date"))
    assert open_rows.count() == 3  # k1 v2, k2 (kept open), k3
    closed = dw.filter(F.col("dt_last_update") == F.lit("2024-12-09").cast("date"))
    assert closed.count() == 1  # k1 v1

    # J5: surrogate date keys resolved against date_dim (Dec 8 -> id 8)
    k1v1 = dw.filter((F.col("natural_key") == "P1-S1") & (F.col("price") == 100)).first()
    assert k1v1["dt_dim"] == 8
    k1v2 = dw.filter((F.col("natural_key") == "P1-S1") & (F.col("price") == 150)).first()
    assert k1v2["dt_dim"] == 9

    # status reached LWS for both days
    ctrl = wh.control()
    assert ctrl.has_log(1, "2024-12-08", [STATUS_LOAD_DW_SUCCESS])
    assert ctrl.has_log(1, "2024-12-09", [STATUS_LOAD_DW_SUCCESS])


def test_pipeline_guard_requires_prior_stage(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh2"))
    with pytest.raises(DuplicateRunError):
        wh.load_to_staging(1, "2024-12-08")  # no ES row
    with pytest.raises(DuplicateRunError):
        wh.load_to_dw(1, "2024-12-08")  # no LS row


def test_control_tables_are_crash_safe(spark, tmp_path):
    """The run-state machine persists via TxTable snapshot commits: a
    crash mid-save leaves the PREVIOUS control state readable (a plain
    overwrite would half-delete file_logs and forget which days ran),
    and maintenance bounds the accumulated versions."""
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    wh = Warehouse(spark, str(tmp_path / "whcc"))
    wh.run_day(_feed(spark, [("S1", "P1", "100", "A")]), 1, "2024-12-08")
    assert wh.control().has_log(1, "2024-12-08", [STATUS_LOAD_DW_SUCCESS])

    # crash injected inside the snapshot publish: state unchanged
    logs_t = TxTable(spark, wh.logs_path)
    v_before = logs_t.latest_version()
    import pytest as _pytest

    boom = RuntimeError("crash mid control save")
    orig = TxTable._publish
    try:
        TxTable._publish = lambda self, man: (_ for _ in ()).throw(boom)
        with _pytest.raises(RuntimeError, match="mid control save"):
            wh._save(wh.control().insert_log(1, "f.csv", "2024-12-09", STATUS_RUNNING))
    finally:
        TxTable._publish = orig
    assert TxTable(spark, wh.logs_path).latest_version() == v_before
    ctrl = wh.control()  # still loads: previous version intact
    assert ctrl.has_log(1, "2024-12-08", [STATUS_LOAD_DW_SUCCESS])
    assert not ctrl.has_log(1, "2024-12-09", [STATUS_RUNNING])

    # versions accumulate per transition; maintain() vacuums them
    assert v_before > 1
    out = wh.maintain()
    assert out["control_vacuumed"], "stale control versions reclaimed"
    assert wh.control().has_log(1, "2024-12-08", [STATUS_LOAD_DW_SUCCESS])


def test_backfill_resumes_and_stops_on_failure(spark, tmp_path):
    """Backfill skips complete days, applies missing days in order,
    STOPS at a failure (out-of-order SCD2 merges would corrupt
    history), and a re-run after the fix resumes from the failed day's
    failed STAGE."""
    wh = Warehouse(spark, str(tmp_path / "whbf"))
    days = ["2024-12-08", "2024-12-09", "2024-12-10"]
    good = {d: _feed(spark, [("S1", "P1", str(100 + i), "A")]) for i, d in enumerate(days)}
    # a feed that explodes when the landing write evaluates it -> the
    # extract stage itself fails (EF), which IS re-extractable
    exploding = spark.range(1).select(
        F.raise_error(F.lit("feed fetch died")).alias("sku")
    )

    # day 1 pre-completed outside the backfill
    wh.run_day(good["2024-12-08"], 1, "2024-12-08")

    feeds = dict(good)
    feeds["2024-12-09"] = exploding
    out = wh.backfill(lambda d: feeds[d], 1, days)
    assert out["2024-12-08"] == "skipped"
    assert out["2024-12-09"].startswith("failed")
    assert "2024-12-10" not in out  # stopped: day 3 never attempted
    assert wh.control().has_log(1, "2024-12-09", ["EF"])
    assert wh.read_dw().count() == 1  # history untouched past day 1

    # fix the feed and re-run the same range: day 2 re-extracts (EF is
    # retryable), day 3 follows — backfill is the resume
    out = wh.backfill(lambda d: good[d], 1, days)
    assert out == {"2024-12-08": "skipped", "2024-12-09": "done", "2024-12-10": "done"}
    open_rows = wh.read_dw().filter(
        F.col("dt_last_update") == F.lit("9999-12-31").cast("date")
    ).collect()
    assert {r["price"] for r in open_rows} == {102}  # day-3 version current

    with pytest.raises(ValueError, match="ascending"):
        wh.backfill(lambda d: good[d], 1, list(reversed(days)))


def test_pipeline_two_sources_three_days(spark, tmp_path):
    """Multi-source control plane (reference `file_config` rows,
    `extract_file.py:198-222`: one scrape/load cycle per source id):
    two id_configs share one Warehouse over three days.  Each source
    keeps an INDEPENDENT SCD2 history — even for a sku both sources
    carry — the state machine interleaves per (id_config, day), and one
    source failing mid-series leaves the other progressing."""
    alerts = []
    wh = Warehouse(spark, str(tmp_path / "wh2src"), alert=lambda m, e: alerts.append(m))
    build_date_dim(spark, "2024-12-01", "2024-12-31").write.parquet(wh.date_dim_dir)
    bad = spark.createDataFrame([("x",)], ["not_a_feed_col"])
    open_d = F.col("dt_last_update") == F.lit("9999-12-31").cast("date")

    # day 1: both sources carry sku S1 (same natural key!) at different
    # prices; source 2 also has its own S9
    wh.run_day(_feed(spark, [("S1", "P1", "100", "A")]), 1, "2024-12-08")
    wh.run_day(_feed(spark, [("S1", "P1", "111", "A"), ("S9", "P9", "900", "Z")]), 2, "2024-12-08")
    dw = wh.read_dw()
    assert dw.count() == 3
    assert {(r["id_config"], r["price"]) for r in dw.filter(open_d).collect()} == {
        (1, 100), (2, 111), (2, 900)}

    # day 2: source 1 changes S1; source 2's feed is broken — extract
    # lands it, staging fails, source 1 is unaffected
    wh.run_day(_feed(spark, [("S1", "P1", "150", "A")]), 1, "2024-12-09")
    wh.extract(bad, 2, "2024-12-09")
    with pytest.raises(Exception):
        wh.load_to_staging(2, "2024-12-09")
    assert len(alerts) == 1 and "id_config=2" in alerts[0]

    ctrl = wh.control()
    assert ctrl.has_log(1, "2024-12-09", [STATUS_LOAD_DW_SUCCESS])
    assert ctrl.has_log(2, "2024-12-09", ["SF"])
    # the guard is per-source: day 2 re-runs refused for BOTH, for
    # their own reasons (1 complete, 2 retryable only from staging)
    with pytest.raises(DuplicateRunError):
        wh.extract(bad, 1, "2024-12-09")
    with pytest.raises(DuplicateRunError):
        wh.extract(bad, 2, "2024-12-09")

    # source 1's change closed ONLY its own S1 version — source 2's
    # S1 row (price 111) is still open: independent histories
    dw = wh.read_dw()
    s1_rows = dw.filter(F.col("sku") == "S1")
    assert {(r["id_config"], r["price"]) for r in s1_rows.filter(open_d).collect()} == {
        (1, 150), (2, 111)}
    closed = s1_rows.filter(~open_d)
    assert [(r["id_config"], r["price"]) for r in closed.collect()] == [(1, 100)]

    # day 3: source 2 recovers (its day-2 stays SF — landing data was
    # bad); source 1 proceeds; both merge independently
    wh.run_day(_feed(spark, [("S1", "P1", "175", "A")]), 1, "2024-12-10")
    wh.run_day(_feed(spark, [("S1", "P1", "222", "A")]), 2, "2024-12-10")
    ctrl = wh.control()
    assert ctrl.has_log(2, "2024-12-09", ["SF"])  # failed day untouched
    assert ctrl.has_log(2, "2024-12-10", [STATUS_LOAD_DW_SUCCESS])
    assert ctrl.has_log(1, "2024-12-10", [STATUS_LOAD_DW_SUCCESS])

    dw = wh.read_dw()
    # source 1: 100 -> 150 -> 175 (two closed, one open)
    h1 = sorted(r["price"] for r in dw.filter((F.col("id_config") == 1) & (F.col("sku") == "S1")).collect())
    assert h1 == [100, 150, 175]
    # source 2: 111 -> 222 (one closed, one open) + S9 untouched open
    h2 = sorted(r["price"] for r in dw.filter((F.col("id_config") == 2) & (F.col("sku") == "S1")).collect())
    assert h2 == [111, 222]
    s9 = dw.filter(F.col("sku") == "S9").collect()
    assert len(s9) == 1 and s9[0]["price"] == 900
    # open set: exactly one current row per (source, key)
    cur = dw.filter(open_d)
    assert {(r["id_config"], r["sku"], r["price"]) for r in cur.collect()} == {
        (1, "S1", 175), (2, "S1", 222), (2, "S9", 900)}


def test_pipeline_failure_marks_sf_and_alerts(spark, tmp_path):
    alerts = []
    wh = Warehouse(spark, str(tmp_path / "wh3"), alert=lambda m, e: alerts.append(m))
    bad = spark.createDataFrame([("x",)], ["not_a_feed_col"])  # missing required cols downstream
    wh.extract(bad, 1, "2024-12-08")
    with pytest.raises(Exception):
        wh.load_to_staging(1, "2024-12-08")
    assert alerts, "alert hook fired"
    # per-stage failure status: staging failures mark SF, not EF, so the
    # retry re-runs staging without re-extracting (ADVICE r1 #1)
    assert wh.control().has_log(1, "2024-12-08", ["SF"])
    # ...and extract refuses to re-run (the landing data is fine)
    with pytest.raises(DuplicateRunError):
        wh.extract(bad, 1, "2024-12-08")


def test_crash_between_gold_commit_and_status_commit_recovers(spark, tmp_path, monkeypatch):
    """VERDICT r9 #2 (crash-injection half): the gold data publish and
    the control-status advance are two TxTable commits.  Inject a crash
    BETWEEN them — gold committed, LWS status save dies — and prove
    recovery is clean: the failure handler records DF, the re-run
    completes, the dw has NO duplicate rows (the re-merged batch is a
    no-change merge), and the status converges to LWS.
    ``atomic_publish=False`` pins the reference-shaped two-commit
    sequence this test documents; the default path is exercised by
    ``test_atomic_publish_crash_leaves_neither_visible`` below."""
    wh = Warehouse(spark, str(tmp_path / "wh"), atomic_publish=False)
    build_date_dim(spark, "2024-12-01", "2024-12-31").write.parquet(wh.date_dim_dir)
    day = "2024-12-08"
    d0 = _feed(spark, [("S1", "P1", "100", "A"), ("S2", "P2", "200", "B")])
    wh.extract(d0, 1, day)
    wh.load_to_staging(1, day)

    orig_save = wh._save
    crashed = {"done": False}

    def crashing_save(ctrl):
        statuses = {r["status"] for r in ctrl.logs.collect()}
        if STATUS_LOAD_DW_SUCCESS in statuses and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash between gold commit and status commit")
        return orig_save(ctrl)

    monkeypatch.setattr(wh, "_save", crashing_save)
    with pytest.raises(RuntimeError, match="injected crash"):
        wh.load_to_dw(1, day)

    # gold IS committed (the data publish won), status records the
    # failure — the two commits are observably out of step
    gold_v1 = wh.gold().latest_version()
    assert wh.read_dw().count() == 2
    assert wh.control().has_log(1, day, ["DF"])

    # recovery: re-run the day's dw load; the merge is a no-change
    # no-op against the already-committed current set
    wh.load_to_dw(1, day)
    rows = wh.read_dw().collect()
    assert len(rows) == 2  # no duplicates
    assert {r["natural_key"] for r in rows} == {r["natural_key"] for r in rows}
    open_d = dt.date(9999, 12, 31)
    assert all(r["dt_last_update"] == open_d for r in rows)
    assert wh.control().has_log(1, day, [STATUS_LOAD_DW_SUCCESS])
    assert wh.gold().latest_version() > gold_v1  # the retry is its own commit

def test_atomic_publish_crash_leaves_neither_visible(spark, tmp_path, monkeypatch):
    """VERDICT r9 #2 (commit_multi half): with the default
    ``atomic_publish=True`` the gold merge and the LWS status advance
    are ONE multi-table transaction.  Crash AFTER all participants
    staged but BEFORE the coordinator commit — the worst instant for
    the two-commit design — and assert both-or-neither: no new gold
    version visible, no LWS status, the staged manifests are permanent
    tombstones, and the DF retry completes cleanly."""
    from nlu_data_warehouse_project_spark.sources.txlog import TxnCoordinator

    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert wh.atomic_publish  # the default
    build_date_dim(spark, "2024-12-01", "2024-12-31").write.parquet(wh.date_dim_dir)
    day = "2024-12-08"
    d0 = _feed(spark, [("S1", "P1", "100", "A"), ("S2", "P2", "200", "B")])
    wh.extract(d0, 1, day)
    wh.load_to_staging(1, day)

    orig_commit = TxnCoordinator.commit
    crashed = {"done": False}

    def crashing_commit(self, txn_id):
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash before coordinator commit")
        return orig_commit(self, txn_id)

    monkeypatch.setattr(TxnCoordinator, "commit", crashing_commit)
    with pytest.raises(RuntimeError, match="injected crash"):
        wh.load_to_dw(1, day)

    # NEITHER side visible: gold has no committed version, no LWS —
    # unlike the two-commit path, there is no out-of-step window
    assert wh.gold().latest_version() is None
    assert not wh.control().has_log(1, day, [STATUS_LOAD_DW_SUCCESS])
    # the failure arm still recorded DF through a plain commit
    assert wh.control().has_log(1, day, ["DF"])

    # retry: this time the coordinator commit goes through; everything
    # flips visible together
    wh.load_to_dw(1, day)
    rows = wh.read_dw().collect()
    assert len(rows) == 2
    open_d = dt.date(9999, 12, 31)
    assert all(r["dt_last_update"] == open_d for r in rows)
    assert wh.control().has_log(1, day, [STATUS_LOAD_DW_SUCCESS])


def test_atomic_publish_happy_path_and_txn_hygiene(spark, tmp_path):
    """Default atomic publish over two days: results identical to the
    two-commit path, one coordinator record per dw load, and the
    control tables stay readable mid-stream for the next stage."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    build_date_dim(spark, "2024-12-01", "2024-12-31").write.parquet(wh.date_dim_dir)
    d0 = _feed(spark, [("S1", "P1", "100", "A"), ("S2", "P2", "200", "B")])
    d1 = _feed(spark, [("S1", "P1", "150", "A"), ("S3", "P3", "300", "C")])
    for day, feed in (("2024-12-08", d0), ("2024-12-09", d1)):
        wh.extract(feed, 1, day)
        wh.load_to_staging(1, day)
        wh.load_to_dw(1, day)

    cur = wh.gold().read_current().collect()
    assert {r["natural_key"] for r in cur} == {r["natural_key"] for r in cur}
    assert len(cur) == 3  # S1 (repriced), S2, S3 open
    closed = wh.gold().read_closed().collect()
    assert len(closed) == 1 and closed[0]["price"] == 100.0  # S1 v1 closed
    assert wh.control().has_log(1, "2024-12-09", [STATUS_LOAD_DW_SUCCESS])


def test_staging_atomic_publish_crash_leaves_neither_visible(spark, tmp_path, monkeypatch):
    """VERDICT r10 #4 — the STAGING twin of the dw atomicity test: with
    ``atomic_publish=True`` the silver slice publish and the LS status
    advance are ONE multi-table transaction.  Crash after all
    participants staged but before the coordinator commit: no silver
    slice visible, no LS status, SF recorded, and the retry completes
    with exactly one slice (no duplicates)."""
    from nlu_data_warehouse_project_spark.sources.txlog import TxnCoordinator

    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert wh.atomic_publish
    day = "2024-12-08"
    wh.extract(_feed(spark, [("S1", "P1", "100", "A"), ("S2", "P2", "200", "B")]), 1, day)

    orig_commit = TxnCoordinator.commit
    crashed = {"done": False}

    def crashing_commit(self, txn_id):
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash before coordinator commit")
        return orig_commit(self, txn_id)

    monkeypatch.setattr(TxnCoordinator, "commit", crashing_commit)
    with pytest.raises(RuntimeError, match="injected crash"):
        wh.load_to_staging(1, day)

    # NEITHER visible: no committed staging version, no LS status
    assert wh.staging().latest_version() is None
    assert not wh.control().has_log(1, day, [STATUS_LOAD_STAGING_SUCCESS])
    # the failure arm recorded SF through a plain commit — retryable
    assert wh.control().has_log(1, day, ["SF"])

    # retry flips both together, and the slice is exactly one copy
    wh.load_to_staging(1, day)
    assert wh.control().has_log(1, day, [STATUS_LOAD_STAGING_SUCCESS])
    staged = wh.staging().read_slice("1:2024-12-08")
    assert staged.count() == 2
    assert staged.select("natural_key").distinct().count() == 2
    # and the dw stage runs off the atomic slice unchanged
    wh.load_to_dw(1, day)
    assert len(wh.gold().read_current().collect()) == 2
