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
  silver  staging/                   typed, cleansed, deduped
  gold    dw/ + date_dim/            SCD2 table + calendar
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
    STATUS_EXTRACT_FAILED,
    STATUS_EXTRACT_SUCCESS,
    STATUS_LOAD_DW_SUCCESS,
    STATUS_LOAD_STAGING_SUCCESS,
    STATUS_RUNNING,
)
from ..sources import landing_path, read_feed_csv, table_exists, write_landing

AlertHook = Callable[[str, Exception], None]


def _noop_alert(message: str, exc: Exception) -> None:
    pass


class DuplicateRunError(RuntimeError):
    """T2 guard tripped: this (id_config, day) already ran."""


class Warehouse:
    """Filesystem layout + stage functions for one warehouse instance."""

    def __init__(self, spark: SparkSession, root: str, alert: AlertHook = _noop_alert):
        self.spark = spark
        self.root = root
        self.alert = alert
        self.landing_dir = os.path.join(root, "landing")
        self.staging_dir = os.path.join(root, "staging")
        self.dw_dir = os.path.join(root, "dw")
        self.date_dim_dir = os.path.join(root, "date_dim")
        self.config_path = os.path.join(root, "control", "file_config")
        self.logs_path = os.path.join(root, "control", "file_logs")

    # -- control-plane persistence --------------------------------------
    def control(self) -> ControlPlane:
        if table_exists(self.spark, self.logs_path):
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
        # we also block LS/LWS — a fully-loaded day must not re-extract.
        # Only an EF (failed) day is retryable.
        non_retryable = [
            STATUS_RUNNING,
            STATUS_EXTRACT_SUCCESS,
            STATUS_LOAD_STAGING_SUCCESS,
            STATUS_LOAD_DW_SUCCESS,
        ]
        if ctrl.has_log(id_config, day, non_retryable):
            raise DuplicateRunError(f"extract already ran for id_config={id_config} day={day}")
        file_name = f"data_{id_config}_{day}.csv"
        ctrl = self._save(ctrl.insert_log(id_config, file_name, day, STATUS_RUNNING))
        try:
            path = write_landing(feed, self.landing_dir, id_config, day)
            count = feed.count()
            ctrl = self._save(ctrl.update_status(id_config, day, STATUS_EXTRACT_SUCCESS, count=count))
            return path
        except Exception as exc:  # T5 failure path
            self._save(ctrl.update_status(id_config, day, STATUS_EXTRACT_FAILED))
            self.alert(f"extract failed for id_config={id_config} day={day}\n{traceback.format_exc()}", exc)
            raise

    # -- P2: load to staging ----------------------------------------------
    def load_to_staging(self, id_config: int, day: str) -> DataFrame:
        """Landing CSV -> cleansed, typed, deduped silver rows, appended
        to the staging table (reference `load_to_staging.py:478-564`:
        row-loop insert + natural-key derivation + null repair F1 +
        keyed dedup F2 — here one vectorized chain, one shuffle for the
        dedup window)."""
        ctrl = self.control()
        if not ctrl.has_log(id_config, day, [STATUS_EXTRACT_SUCCESS]):
            raise DuplicateRunError(f"no ES log for id_config={id_config} day={day}: extract must succeed first")
        ctrl = self._save(ctrl.update_status(id_config, day, STATUS_RUNNING))
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
            silver.write.mode("append").partitionBy("dt_load").parquet(self.staging_dir)
            self._save(ctrl.update_status(id_config, day, STATUS_LOAD_STAGING_SUCCESS))
            return silver
        except Exception as exc:
            self._save(ctrl.update_status(id_config, day, STATUS_EXTRACT_FAILED))
            self.alert(f"staging load failed for id_config={id_config} day={day}", exc)
            raise

    # -- P3: SCD2 merge into dw --------------------------------------------
    def load_to_dw(self, id_config: int, day: str) -> DataFrame:
        """Staging run slice -> SCD2 merge -> gold overwrite (reference
        `load_to_dw.py:491-560`; merge order J2 -> J4 -> J3 -> J5).
        temp_dw never materializes: it is just the filtered staging
        DataFrame (the reference's TRUNCATE temp_dw S6 disappears)."""
        ctrl = self.control()
        if not ctrl.has_log(id_config, day, [STATUS_LOAD_STAGING_SUCCESS]):
            raise DuplicateRunError(f"no LS log for id_config={id_config} day={day}: staging must succeed first")
        ctrl = self._save(ctrl.update_status(id_config, day, STATUS_RUNNING))
        try:
            staging = self.spark.read.parquet(self.staging_dir)
            # F3/P3/P4: the temp_dw scratch copy is just this projection
            batch = staging.filter(
                (F.col("id_config") == id_config) & (F.col("dt_load") == F.to_date(F.lit(day)))
            ).drop("surrogate_key")

            if table_exists(self.spark, self.dw_dir):
                dw = self.spark.read.parquet(self.dw_dir)
            else:
                dw = (
                    batch.limit(0)
                    .withColumn("dt_load_to_dw", F.to_date(F.lit(day)))
                    .withColumn("dt_last_update", F.to_date(F.lit(SCD2_OPEN_SENTINEL)))
                    .withColumn("dt_dim", F.lit(None).cast("int"))
                )

            merged = scd2_merge(
                dw.drop("dt_dim"),
                batch,
                key="natural_key",
                attrs=[c for c in SCD2_ATTR_COLUMNS if c in batch.columns],
                run_date=day,
            )
            if table_exists(self.spark, self.date_dim_dir):
                date_dim = self.spark.read.parquet(self.date_dim_dir)
                merged = resolve_date_key(merged.withColumn("dt_dim", F.lit(None).cast("int")), date_dim)
            else:
                merged = merged.withColumn("dt_dim", F.lit(None).cast("int"))

            # write-audit-then-swap: materialize to a new location and
            # atomically point at it (read-modify-overwrite of the same
            # path would race with the scan feeding the merge)
            tmp = self.dw_dir + "__new"
            merged.write.mode("overwrite").parquet(tmp)
            final = self.spark.read.parquet(tmp)
            final.write.mode("overwrite").parquet(self.dw_dir)
            self._save(ctrl.update_status(id_config, day, STATUS_LOAD_DW_SUCCESS))
            return self.spark.read.parquet(self.dw_dir)
        except Exception as exc:
            self._save(ctrl.update_status(id_config, day, STATUS_EXTRACT_FAILED))
            self.alert(f"dw load failed for id_config={id_config} day={day}", exc)
            raise

    # -- full day ------------------------------------------------------------
    def run_day(self, feed: DataFrame, id_config: int, day: str) -> DataFrame:
        """P1 -> P2 -> P3 for one run date (backfillable: pass any day,
        like the reference's optional date argv, `load_to_dw.py:489-497`)."""
        self.extract(feed, id_config, day)
        self.load_to_staging(id_config, day)
        return self.load_to_dw(id_config, day)
