"""Control plane (SURVEY.md §2.1 S9, §2.3 J1/J6, §2.7 T2/T3).

The reference drives every run from two Postgres tables:
``file_config`` (per-source configuration) and ``file_logs`` (per-day
run-state machine RUNNING/ES/EF/LS/LWS + row-count/size audit).  Here
they are small parquet tables manipulated with DataFrame ops; point
updates (J6) become filter-out + union + overwrite, which at control
table size (a few rows per source per day) is trivially cheap and keeps
atomic visibility.

State machine (docx xlines 92-110):
  extract   : RUNNING -> ES (success) | EF (failure)
  staging   : guarded on ES,  RUNNING -> LS
  dw        : guarded on LS,  RUNNING -> LWS
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from ..schemas import FILE_CONFIG_SCHEMA, FILE_LOGS_SCHEMA


class ControlPlane:
    """In-memory control-table store with parquet persistence hooks.

    ``logs``/``config`` are plain DataFrames; every mutator returns a
    new ControlPlane (immutable style — mirrors overwrite semantics).
    """

    def __init__(self, spark: SparkSession, config: DataFrame, logs: DataFrame):
        self.spark = spark
        self.config = config
        self.logs = logs

    # -- constructors --------------------------------------------------
    @classmethod
    def empty(cls, spark: SparkSession) -> "ControlPlane":
        return cls(
            spark,
            spark.createDataFrame([], FILE_CONFIG_SCHEMA),
            spark.createDataFrame([], FILE_LOGS_SCHEMA),
        )

    @classmethod
    def load(cls, spark: SparkSession, config_path: str, logs_path: str) -> "ControlPlane":
        from ..sources.txlog import TxTable

        return cls(
            spark,
            TxTable(spark, config_path).read_current(),
            TxTable(spark, logs_path).read_current(),
        )

    def localize(self) -> "ControlPlane":
        """Materialize both tables driver-side, cutting lineage to any
        parquet files about to be overwritten.  Control tables are a few
        rows per source per day — collect is free by design."""
        cfg = self.spark.createDataFrame(self.config.collect(), FILE_CONFIG_SCHEMA)
        lgs = self.spark.createDataFrame(self.logs.collect(), FILE_LOGS_SCHEMA)
        return ControlPlane(self.spark, cfg, lgs)

    def save(self, config_path: str, logs_path: str) -> "ControlPlane":
        """Persist the control tables as TxTable SNAPSHOT commits, not
        plain overwrites: the run-state machine is the exactly-once
        guard, so it must be the LAST table that can be lost to a crash
        mid-write — a half-deleted file_logs would forget which days
        already ran.  A crash before the manifest rename leaves the
        previous control state readable, identical to the gold
        contract.  Returns a localized plane safe to keep mutating.
        Versions accumulate one per status transition; the Warehouse
        maintenance cadence vacuums them."""
        from ..sources.txlog import TxTable

        fresh = self.localize()
        TxTable(self.spark, config_path).commit_snapshot(fresh.config, run_id="control")
        TxTable(self.spark, logs_path).commit_snapshot(fresh.logs, run_id="control")
        return fresh

    # -- S9: single-row config fetch ------------------------------------
    def fetch_config(self, id_config: int) -> Row | None:
        """`SELECT * FROM file_config WHERE id = %s`
        (reference `extract_file.py:198-222`)."""
        return self.config.filter(F.col("id") == id_config).first()

    # -- P7/T2: run guards ----------------------------------------------
    def has_log(self, id_config: int, day: str, statuses: list[str]) -> bool:
        """Existence probe: any log row for (id_config, day) with status
        in ``statuses`` (reference `check_file_log`,
        `extract_file.py:342-349`)."""
        return (
            self.logs.filter(
                (F.col("id_config") == id_config)
                & (F.col("time") == F.to_date(F.lit(day)))
                & (F.col("status").isin(statuses))
            )
            .limit(1)
            .count()
            > 0
        )

    # -- J1: control join ------------------------------------------------
    def fetch_file_info(self, id_config: int, day: str, status: str) -> Row | None:
        """file_logs ⋈ file_config + run-slice filter (reference
        `fetch_file_info`, `load_to_staging.py:82-101`).  Both sides are
        tiny — Catalyst broadcasts automatically."""
        fl = self.logs.alias("fl")
        fc = self.config.alias("fc")
        return (
            fl.join(F.broadcast(fc), F.col("fl.id_config") == F.col("fc.id"), "inner")
            .filter(
                (F.col("fl.id_config") == id_config)
                & (F.col("fl.time") == F.to_date(F.lit(day)))
                & (F.col("fl.status") == status)
            )
            .select(
                F.col("fl.id").alias("log_id"),
                "fl.file_name",
                "fl.time",
                "fl.status",
                "fl.count",
                "fl.file_size_kb",
                F.col("fc.id").alias("id_config"),
                "fc.name",
                "fc.source",
                "fc.source_file_location",
                "fc.destination_table_staging",
                "fc.destination_table_dw",
                "fc.bucket_name",
                "fc.folder_b2_name",
            )
            .first()
        )

    def active_log_id(self, id_config: int, day: str) -> int | None:
        """The id of the latest log row for (id_config, day) — the row
        the in-flight pipeline attempt owns.  Prior attempts' rows (a
        historical EF/SF/DF) keep lower ids and are never rewritten."""
        row = (
            self.logs.filter(
                (F.col("id_config") == id_config) & (F.col("time") == F.to_date(F.lit(day)))
            )
            .agg(F.max("id"))
            .first()
        )
        return None if row is None or row[0] is None else int(row[0])

    # -- J6: log upserts ---------------------------------------------------
    def insert_log(
        self,
        id_config: int,
        file_name: str,
        day: str,
        status: str,
        count: int | None = None,
        file_size_kb: int | None = None,
    ) -> "ControlPlane":
        """INSERT new log row with the next id (reference
        `insert_file_log`, `extract_file.py:266-299`)."""
        max_id = self.logs.agg(F.coalesce(F.max("id"), F.lit(0))).first()[0]
        new = self.spark.createDataFrame(
            [
                Row(
                    id=int(max_id) + 1,
                    id_config=id_config,
                    file_name=file_name,
                    time=_dt.date.fromisoformat(day),
                    status=status,
                    count=count,
                    file_size_kb=file_size_kb,
                    dt_update=_dt.datetime.now(),
                )
            ],
            FILE_LOGS_SCHEMA,
        )
        return ControlPlane(self.spark, self.config, self.logs.unionByName(new))

    def update_status(
        self,
        id_config: int,
        day: str,
        status: str,
        count: int | None = None,
        file_size_kb: int | None = None,
        log_id: int | None = None,
    ) -> "ControlPlane":
        """Point update of one log row (reference `update_status`,
        `load_to_staging.py:248-285`): rewrite =
        withColumn(when(match, new).otherwise(old)).

        Pass ``log_id`` (the reference updates by primary key too) so a
        retried day touches only the active attempt's row — a
        day-scoped match would also rewrite a historical failure row
        and erase the audit trail.
        """
        match = (F.col("id_config") == id_config) & (F.col("time") == F.to_date(F.lit(day)))
        if log_id is not None:
            match = match & (F.col("id") == log_id)
        logs = self.logs.withColumn("status", F.when(match, F.lit(status)).otherwise(F.col("status")))
        logs = logs.withColumn("dt_update", F.when(match, F.current_timestamp()).otherwise(F.col("dt_update")))
        if count is not None:
            logs = logs.withColumn("count", F.when(match, F.lit(count)).otherwise(F.col("count")))
        if file_size_kb is not None:
            logs = logs.withColumn(
                "file_size_kb", F.when(match, F.lit(file_size_kb)).otherwise(F.col("file_size_kb"))
            )
        return ControlPlane(self.spark, self.config, logs)
