"""Pipeline composition (SURVEY.md §3, §2.7 T1/T5).

The reference's three entry points — extract (P1), load-to-staging
(P2), load-to-dw (P3) — become three stage functions over a run date,
composed by ``run_day``.  Each stage:

  1. checks its guard against the control plane (T2),
  2. marks RUNNING, does vectorized work, advances the status (T3),
  3. on failure marks EF and calls the alert hook (T5) — email in the
     reference (`send_email`, `extract_file.py:365-394`), a callback
     here.

Data layering (parquet lakehouse):
  bronze  landing/id_config=*/dt=*/  raw feed CSV, partition-pruned
  silver  staging/ (TxTable manifest log of run slices): typed,
          cleansed, deduped; each (id_config, day) run commits ONE
          slice via commit_replace_slice — a retried day REPLACES its
          slice at the manifest level (never appends duplicates), and
          under atomic_publish the slice + LS status flip in one
          multi-table transaction
  gold    dw/ (TxTable manifest log) + date_dim/

Gold persistence is the TxTable commit log (`sources/txlog.py`): the
daily SCD2 merge reads ONLY the current (open) set, appends one
closed-delta dir and replaces the current dir, then publishes both with
an atomic manifest rename.  History is never rewritten — at 100 TB the
merge I/O is bounded by live keys + daily churn, and a crash anywhere
before the manifest commit leaves the previous version readable.

Failure statuses are per-stage (ES/EF, LS/SF, LWS/DF) so each stage
retries from itself: a dw failure re-runs load_to_dw against the
already-staged slice instead of re-extracting and re-appending it.
"""

from __future__ import annotations

import os
import traceback
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..control import ControlPlane
from ..functions.cleansing import cleanse_feed, with_audit_columns
from ..operators.cleanse import dedup_keep_first, repair_nulls, with_ingest_order
from ..operators.scd2 import resolve_date_key, scd2_merge
from ..schemas import (
    SCD2_ATTR_COLUMNS,
    SCD2_OPEN_SENTINEL,
    STATUS_DW_FAILED,
    STATUS_EXTRACT_FAILED,
    STATUS_EXTRACT_SUCCESS,
    STATUS_LOAD_DW_SUCCESS,
    STATUS_LOAD_STAGING_SUCCESS,
    STATUS_RUNNING,
    STATUS_STAGING_FAILED,
)
from ..sources import landing_path, read_feed_csv, table_exists, write_landing
from ..sources.txlog import TxnCoordinator, TxTable, commit_multi

AlertHook = Callable[[str, Exception], None]


def _noop_alert(message: str, exc: Exception) -> None:
    pass


class DuplicateRunError(RuntimeError):
    """T2 guard tripped: this (id_config, day) already ran."""


class Warehouse:
    """Filesystem layout + stage functions for one warehouse instance."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        alert: AlertHook = _noop_alert,
        gold_buckets: int = 32,
        atomic_publish: bool = True,
    ):
        self.spark = spark
        self.root = root
        self.alert = alert
        self.gold_buckets = gold_buckets
        # atomic_publish=True commits the gold merge and the LWS status
        # advance as ONE multi-table transaction (commit_multi): a
        # reader can never observe new dw rows with a stale status or
        # vice versa.  False keeps the reference-shaped two-commit
        # sequence (load_to_dw.py:144-148): still crash-RECOVERABLE
        # (write-then-advance + DF retry), just not atomic.
        self.atomic_publish = atomic_publish
        self.landing_dir = os.path.join(root, "landing")
        self.staging_dir = os.path.join(root, "staging")
        self.dw_dir = os.path.join(root, "dw")
        self.date_dim_dir = os.path.join(root, "date_dim")
        self.config_path = os.path.join(root, "control", "file_config")
        self.logs_path = os.path.join(root, "control", "file_logs")
        self.txn_dir = os.path.join(root, "control", "txn")

    def staging(self) -> TxTable:
        """The silver store as a TxTable of run slices: each
        ``load_to_staging`` commits ONE slice dir via
        ``commit_replace_slice`` (metadata-only partition overwrite), so
        a retry replaces the (id_config, day) slice instead of
        appending duplicates, readers flip atomically, and — being an
        ordinary manifest commit — the silver publish joins the same
        ``commit_multi`` transaction as the LS status advance
        (VERDICT r10 #4: the staging twin of the dw-side atomicity)."""
        return TxTable(self.spark, self.staging_dir)

    def read_staging(self) -> DataFrame:
        """The full silver table (all visible run slices)."""
        return self.staging().read()

    @staticmethod
    def _slice_id(id_config: int, day: str) -> str:
        return f"{id_config}:{day}"

    def gold(self) -> TxTable:
        """The gold TxTable, bucketed on the merge key: the daily SCD2
        merge's dw side reads pre-partitioned on natural_key and skips
        its Exchange — at 100 TB that shuffle of the full live-key set
        was the largest per-day data movement left (DESIGN.md; VERDICT
        r2 #3).  Size ``gold_buckets`` so live_keys/buckets fits an
        executor's memory at target scale.  Closed dirs record min/max
        date stats, so date-ranged history reads
        (``read_closed_pruned``) touch O(days-in-range) dirs."""
        return TxTable(
            self.spark,
            self.dw_dir,
            bucket_cols=["natural_key"],
            num_buckets=self.gold_buckets,
            stats_cols=["dt_last_update", "dt_load_to_dw"],
        )

    # -- control-plane persistence --------------------------------------
    def control(self) -> ControlPlane:
        if TxTable(self.spark, self.logs_path).exists():
            return ControlPlane.load(self.spark, self.config_path, self.logs_path)
        return ControlPlane.empty(self.spark)

    def _save(self, ctrl: ControlPlane) -> ControlPlane:
        return ctrl.save(self.config_path, self.logs_path)

    # -- P1: extract -----------------------------------------------------
    def extract(self, feed: DataFrame, id_config: int, day: str) -> str:
        """Land one day's raw feed (the scraper S1 is out-of-engine; any
        DataFrame-producing source works).  Guard: refuse a duplicate
        run for (id_config, day) — reference `check_file_log`,
        `extract_file.py:332-362`."""
        ctrl = self.control()
        # the reference guard only checks RUNNING/ES (`extract_file.py:347`);
        # we also block LS/LWS (a fully-loaded day must not re-extract)
        # and SF/DF (those retry from their own stage, not from here).
        # Only an EF (failed-at-extract) day is retryable.
        non_retryable = [
            STATUS_RUNNING,
            STATUS_EXTRACT_SUCCESS,
            STATUS_LOAD_STAGING_SUCCESS,
            STATUS_LOAD_DW_SUCCESS,
            STATUS_STAGING_FAILED,
            STATUS_DW_FAILED,
        ]
        if ctrl.has_log(id_config, day, non_retryable):
            raise DuplicateRunError(f"extract already ran for id_config={id_config} day={day}")
        file_name = f"data_{id_config}_{day}.csv"
        ctrl = self._save(ctrl.insert_log(id_config, file_name, day, STATUS_RUNNING))
        log_id = ctrl.active_log_id(id_config, day)
        try:
            from pyspark.sql import Observation

            # the row-count audit rides the landing write via observe()
            # instead of a second full scan of the feed (A2 metric, one
            # job not two)
            obs = Observation()
            observed = feed.observe(obs, F.count(F.lit(1)).alias("n_rows"))
            path = write_landing(observed, self.landing_dir, id_config, day)
            count = int(obs.get["n_rows"])
            ctrl = self._save(
                ctrl.update_status(id_config, day, STATUS_EXTRACT_SUCCESS, count=count, log_id=log_id)
            )
            return path
        except Exception as exc:  # T5 failure path
            self._save(ctrl.update_status(id_config, day, STATUS_EXTRACT_FAILED, log_id=log_id))
            self.alert(f"extract failed for id_config={id_config} day={day}\n{traceback.format_exc()}", exc)
            raise

    # -- P2: load to staging ----------------------------------------------
    def load_to_staging(self, id_config: int, day: str) -> DataFrame:
        """Landing CSV -> cleansed, typed, deduped silver rows, appended
        to the staging table (reference `load_to_staging.py:478-564`:
        row-loop insert + natural-key derivation + null repair F1 +
        keyed dedup F2 — here one vectorized chain, one shuffle for the
        dedup window).

        The write is idempotent AND atomic: ``commit_replace_slice``
        replaces exactly the (id_config, day) run slice at the manifest
        level, so a retry after a partial write (or after a downstream
        DF failure forced a re-run) cannot append duplicate natural_keys
        into the merge batch — and under ``atomic_publish`` the silver
        data and the LS status advance flip in ONE coordinator rename:
        a crash anywhere before it leaves NEITHER visible and the day
        retries cleanly (VERDICT r10 #4).  Retryable from ES (first
        attempt) or SF (prior staging failure)."""
        ctrl = self.control()
        if not ctrl.has_log(id_config, day, [STATUS_EXTRACT_SUCCESS, STATUS_STAGING_FAILED]):
            raise DuplicateRunError(f"no ES/SF log for id_config={id_config} day={day}: extract must succeed first")
        log_id = ctrl.active_log_id(id_config, day)
        ctrl = self._save(ctrl.update_status(id_config, day, STATUS_RUNNING, log_id=log_id))
        try:
            raw = read_feed_csv(self.spark, landing_path(self.landing_dir, id_config, day))
            silver = (
                with_audit_columns(cleanse_feed(raw), id_config, day, day)
                .transform(with_ingest_order)
                .transform(lambda d: repair_nulls(d))
                .transform(lambda d: dedup_keep_first(d, ["natural_key"], ["surrogate_key"]))
            )
            cols = [
                "surrogate_key", "natural_key", "sku", "product_name", "price", "brand",
                "material", "shape", "dimension", "origin", "quantity_available",
                "product_url", "id_config", "dt_extract", "dt_load",
            ]
            silver = silver.select(*cols)
            st = self.staging()
            if self.atomic_publish:
                done = ctrl.update_status(
                    id_config, day, STATUS_LOAD_STAGING_SUCCESS, log_id=log_id
                ).localize()
                commit_multi(
                    [
                        (st, "replace_slice", {
                            "delta": silver,
                            "slice_id": self._slice_id(id_config, day),
                            "run_id": f"stg-{id_config}-{day}",
                        }),
                        (TxTable(self.spark, self.config_path), "snapshot",
                         {"df": done.config, "run_id": "control"}),
                        (TxTable(self.spark, self.logs_path), "snapshot",
                         {"df": done.logs, "run_id": "control"}),
                    ],
                    TxnCoordinator(self.spark, self.txn_dir),
                )
            else:
                st.commit_replace_slice(
                    silver, self._slice_id(id_config, day), run_id=f"stg-{id_config}-{day}"
                )
                self._save(ctrl.update_status(id_config, day, STATUS_LOAD_STAGING_SUCCESS, log_id=log_id))
            return silver
        except Exception as exc:
            self._save(ctrl.update_status(id_config, day, STATUS_STAGING_FAILED, log_id=log_id))
            self.alert(f"staging load failed for id_config={id_config} day={day}", exc)
            raise

    # -- P3: SCD2 merge into dw --------------------------------------------
    def load_to_dw(self, id_config: int, day: str) -> DataFrame:
        """Staging run slice -> SCD2 merge -> transactional gold commit
        (reference `load_to_dw.py:491-560`; merge order J2 -> J4 -> J3 ->
        J5).  temp_dw never materializes: it is just the filtered staging
        DataFrame (the reference's TRUNCATE temp_dw S6 disappears).

        Scale shape: the merge joins the batch against ONLY the current
        (open) set from the TxTable — closed history is neither read nor
        rewritten.  The merge output is persisted once and split into a
        closed-delta append + a current-dir replace, published by one
        atomic manifest commit; a crash mid-write leaves the previous
        gold version readable and the day retryable from DF."""
        ctrl = self.control()
        if not ctrl.has_log(id_config, day, [STATUS_LOAD_STAGING_SUCCESS, STATUS_DW_FAILED]):
            raise DuplicateRunError(f"no LS/DF log for id_config={id_config} day={day}: staging must succeed first")
        log_id = ctrl.active_log_id(id_config, day)
        ctrl = self._save(ctrl.update_status(id_config, day, STATUS_RUNNING, log_id=log_id))
        try:
            # F3/P3/P4: the temp_dw scratch copy is just this slice read;
            # read_slice scans exactly the (id_config, day) run-slice dir
            # (dir-level pruning — the manifest twin of partition dirs)
            batch = self.staging().read_slice(self._slice_id(id_config, day)).drop(
                "surrogate_key"
            )

            gold = self.gold()
            if gold.exists():
                # scope the merge to THIS source's current rows: the
                # reference keeps one dw table per file_config row
                # (`destination_table_dw`), so two sources carrying the
                # same sku have independent SCD2 histories — in the
                # single shared gold table that means the merge key is
                # effectively (id_config, natural_key).  Other sources'
                # current rows ride through the commit untouched.
                current_all = gold.read_current()
                current = current_all.filter(F.col("id_config") == id_config).drop("dt_dim")
                current_other = current_all.filter(F.col("id_config") != id_config)
            else:
                current = (
                    batch.limit(0)
                    .withColumn("dt_load_to_dw", F.to_date(F.lit(day)))
                    .withColumn("dt_last_update", F.to_date(F.lit(SCD2_OPEN_SENTINEL)))
                )
                current_other = None

            delta = scd2_merge(
                current,
                batch,
                key="natural_key",
                attrs=[c for c in SCD2_ATTR_COLUMNS if c in batch.columns],
                run_date=day,
            )
            if table_exists(self.spark, self.date_dim_dir):
                date_dim = self.spark.read.parquet(self.date_dim_dir)
                delta = resolve_date_key(delta.withColumn("dt_dim", F.lit(None).cast("int")), date_dim)
            else:
                delta = delta.withColumn("dt_dim", F.lit(None).cast("int"))

            # one materialization feeds both writes (closed + current);
            # without it the merge join would execute twice
            delta = delta.persist()
            try:
                open_d = F.to_date(F.lit(SCD2_OPEN_SENTINEL))
                new_current = delta.filter(F.col("dt_last_update") == open_d)
                if current_other is not None:
                    new_current = new_current.unionByName(
                        current_other.select(*new_current.columns)
                    )
                closed_delta = delta.filter(F.col("dt_last_update") != open_d)
                if self.atomic_publish:
                    # gold merge + LWS status advance as ONE atomic
                    # multi-table transaction: both versions stage
                    # invisibly, one coordinator rename flips all three
                    # tables (dw, file_config, file_logs) at once.  A
                    # crash anywhere before that rename leaves NEITHER
                    # the data nor the status visible; the except arm
                    # below then records DF and the day retries cleanly.
                    done = ctrl.update_status(
                        id_config, day, STATUS_LOAD_DW_SUCCESS, log_id=log_id
                    ).localize()
                    commit_multi(
                        [
                            (gold, "merge", {
                                "current": new_current,
                                "closed_delta": closed_delta,
                                "run_id": day,
                            }),
                            (TxTable(self.spark, self.config_path), "snapshot",
                             {"df": done.config, "run_id": "control"}),
                            (TxTable(self.spark, self.logs_path), "snapshot",
                             {"df": done.logs, "run_id": "control"}),
                        ],
                        TxnCoordinator(self.spark, self.txn_dir),
                    )
                else:
                    gold.commit_merge(
                        current=new_current,
                        closed_delta=closed_delta,
                        run_id=day,
                    )
            finally:
                delta.unpersist()
            if not self.atomic_publish:
                self._save(ctrl.update_status(id_config, day, STATUS_LOAD_DW_SUCCESS, log_id=log_id))
            return gold.read()
        except Exception as exc:
            self._save(ctrl.update_status(id_config, day, STATUS_DW_FAILED, log_id=log_id))
            self.alert(f"dw load failed for id_config={id_config} day={day}", exc)
            raise

    def read_dw(self) -> DataFrame:
        """The full logical gold table (open ∪ closed history)."""
        return self.gold().read()

    # -- P4: incremental mart ------------------------------------------------
    def refresh_mart(self, out_dir: str, run_id: str = "mart") -> dict[str, DataFrame]:
        """Incrementally refresh the mart star from gold: reads only the
        current set + the closed dirs committed since the last refresh
        (O(live + churn)/day — see `pipeline/mart.refresh_mart`)."""
        from .mart import refresh_mart

        date_dim = self.spark.read.parquet(self.date_dim_dir)
        return refresh_mart(self.gold(), date_dim, out_dir, run_id)

    # -- full daily cycle ------------------------------------------------------
    def run_cycle(
        self,
        feed: DataFrame,
        id_config: int,
        day: str,
        mart_dir: str | None = None,
        maintain_every: int | None = None,
    ) -> DataFrame:
        """The complete daily cadence in the contract-safe order:
        run_day → refresh_mart → maintain.  The ordering matters:
        maintenance compacts gold's closed dirs, and the incremental
        mart can only treat a compacted dir as consumed if it refreshed
        BEFORE the fold (see ``maintain``) — running maintenance first
        would poison the mart's delta bookkeeping.  This helper exists
        so callers don't have to know that; prefer it over hand-ordering
        the three calls whenever a mart is in play."""
        out = self.run_day(feed, id_config, day)
        if mart_dir is not None:
            self.refresh_mart(mart_dir, run_id=day)
        if maintain_every is not None:
            self.maintain(min_dirs=maintain_every)
        return out

    # -- backfill --------------------------------------------------------------
    def backfill(
        self,
        feeds: Callable[[str], DataFrame],
        id_config: int,
        days: list[str],
        maintain_every: int | None = None,
        mart_dir: str | None = None,
    ) -> dict[str, str]:
        """Run P1→P2→P3 for each day IN ORDER, skipping days the control
        plane already shows complete (LWS) — the reference's optional
        date argv generalized to a range (`load_to_dw.py:489-497` +
        `check_file_log`).  ``feeds(day)`` supplies each day's feed.

        Days must apply in ascending order and a failure STOPS the
        backfill (returning the per-day outcomes so far): an SCD2 merge
        applied out of order would close versions with a dt_last_update
        BEFORE their insert date, silently corrupting history — a
        skipped-failure backfill is not a recoverable state, a retry
        from the failed day is.  Completed days are idempotently
        skipped, so re-running the same range after fixing the failure
        resumes exactly where it stopped.

        When an incremental mart consumes this gold table, pass
        ``mart_dir`` so each day refreshes the mart BEFORE maintenance
        runs (the `run_cycle` ordering) — ``maintain_every`` alone
        would compact dirs the mart has not consumed yet and force a
        full mart rebuild."""
        if days != sorted(days):
            raise ValueError("backfill days must be in ascending order (SCD2 merges are order-sensitive)")
        outcomes: dict[str, str] = {}
        for day in days:
            ctrl = self.control()
            try:
                if ctrl.has_log(id_config, day, [STATUS_LOAD_DW_SUCCESS]):
                    outcomes[day] = "skipped"
                    continue
                # resume from the stage the day's status says failed:
                # SF retries staging (the landing data is fine), DF
                # retries only the merge (the staged slice is fine) —
                # per-stage failure codes exist exactly for this
                if ctrl.has_log(id_config, day, [STATUS_STAGING_FAILED, STATUS_EXTRACT_SUCCESS]):
                    self.load_to_staging(id_config, day)
                    self.load_to_dw(id_config, day)
                    outcomes[day] = "resumed-from-staging"
                elif ctrl.has_log(id_config, day, [STATUS_DW_FAILED, STATUS_LOAD_STAGING_SUCCESS]):
                    self.load_to_dw(id_config, day)
                    outcomes[day] = "resumed-from-dw"
                else:  # never ran, or failed at extract (EF is re-extractable)
                    self.run_day(feeds(day), id_config, day)
                    outcomes[day] = "done"
                if mart_dir is not None:
                    self.refresh_mart(mart_dir, run_id=day)
                if maintain_every is not None:
                    self.maintain(min_dirs=maintain_every)
            except Exception as exc:  # noqa: BLE001 — recorded, then stop
                outcomes[day] = f"failed: {type(exc).__name__}"
                break
        return outcomes

    # -- maintenance ----------------------------------------------------------
    def maintain(self, min_dirs: int = 8, retain_last: int = 2) -> dict:
        """Gold-table maintenance cadence: compact the accumulated
        closed-delta dirs (one per merge day) once at least ``min_dirs``
        exist, then vacuum data dirs outside the last ``retain_last``
        versions (superseded pre-compaction dirs + orphans from crashed
        writers).  At 100 TB this bounds both the small-files count
        (history scans open O(1) dirs instead of O(days)) and the disk
        footprint (without vacuum every compaction doubles history on
        disk).

        Safe to run after any ``run_day``; compaction below the
        threshold is a no-op, and the lineage recorded by
        ``compact_closed`` lets ``refresh_mart`` keep refreshing
        incrementally as long as maintenance runs AFTER the mart
        consumed the dirs being folded (run_day → refresh_mart →
        maintain).  ``retain_last >= 2`` keeps one rollback version.
        Single-writer like every TxTable mutation: do not run
        concurrently with a ``load_to_dw``.
        """
        # control tables commit one snapshot version per status
        # transition (~6/day/source) — bound their version count on the
        # same cadence; keep a rollback version like gold
        control_vacuumed: list[str] = []
        for path in (self.config_path, self.logs_path):
            t = TxTable(self.spark, path)
            if t.exists():
                control_vacuumed += t.vacuum(retain_last=max(retain_last, 2))
        # staging versions accumulate one per run slice; superseded
        # slice dirs (replaced by retries) are reclaimed here too
        staging = self.staging()
        staging_vacuumed = (
            staging.vacuum(retain_last=max(retain_last, 2)) if staging.exists() else []
        )
        gold = self.gold()
        if gold.exists():
            compacted_version = gold.compact_closed(min_dirs=min_dirs)
            vacuumed = gold.vacuum(retain_last=retain_last)
        else:
            compacted_version, vacuumed = None, []
        # decided coordinator records whose manifests are now pruned
        # (reference-based retention — VERDICT r10 #8): runs LAST so the
        # table vacuums above have already dropped tombstone manifests;
        # pass EVERY table that participates in this warehouse's
        # transactions
        txn_reclaimed = TxnCoordinator(self.spark, self.txn_dir).vacuum([
            gold, staging,
            TxTable(self.spark, self.config_path),
            TxTable(self.spark, self.logs_path),
        ])
        return {
            "compacted_version": compacted_version,
            "vacuumed": vacuumed,
            "control_vacuumed": control_vacuumed,
            "staging_vacuumed": staging_vacuumed,
            "txn_reclaimed": txn_reclaimed,
        }

    # -- full day ------------------------------------------------------------
    def run_day(
        self,
        feed: DataFrame,
        id_config: int,
        day: str,
        maintain_every: int | None = None,
    ) -> DataFrame:
        """P1 -> P2 -> P3 for one run date (backfillable: pass any day,
        like the reference's optional date argv, `load_to_dw.py:489-497`).

        ``maintain_every=N`` folds the maintenance cadence into the
        daily run: after the dw load, compaction+vacuum triggers once N
        closed dirs have accumulated (i.e. roughly every N days).  Leave
        None when a mart refreshes incrementally off this gold table and
        schedule ``maintain()`` right after the refresh instead — see
        ``maintain`` for the ordering contract."""
        self.extract(feed, id_config, day)
        self.load_to_staging(id_config, day)
        out = self.load_to_dw(id_config, day)
        if maintain_every is not None:
            self.maintain(min_dirs=maintain_every)
        return out
