"""Engine facade — the one import a user of the reference project
needs to switch.

The reference's "API" is three CLI scripts + ad-hoc SQL against
Postgres.  Here the same capabilities hang off one object:

    from nlu_data_warehouse_project_spark.engine import Engine

    eng = Engine.local()                       # or Engine(existing_spark)
    wh = eng.warehouse("/data/wh")             # P1/P2/P3 pipeline
    wh.run_day(feed_df, id_config=1, day="2024-12-08")

    eng.register_tables("/root/testdata/sf0.01")
    eng.sql("SELECT ... FROM lineitem ...")    # ANSI SQL frontend
    eng.query("q01_pricing_summary", "/root/testdata/sf0.01")
    eng.date_dim()                             # reference-exact calendar
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .functions.calendar import DEFAULT_END, DEFAULT_START, build_date_dim
from .pipeline import Warehouse
from .queries import ORACLE_SQL, QUERIES
from .session import get_spark
from .sources import load_testdata, register_testdata_views


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    @classmethod
    def local(cls, app_name: str = "nlu-dw", **kwargs) -> "Engine":
        return cls(get_spark(app_name, **kwargs))

    # -- warehouse pipeline (reference P1/P2/P3) ------------------------
    def warehouse(self, root: str, alert=None) -> Warehouse:
        return Warehouse(self.spark, root, alert=alert) if alert else Warehouse(self.spark, root)

    # -- calendar (reference date_dim) -----------------------------------
    def date_dim(self, start: str = DEFAULT_START, end: str = DEFAULT_END, holidays=None) -> DataFrame:
        return build_date_dim(self.spark, start, end, holidays)

    # -- tables & SQL ------------------------------------------------------
    def register_tables(self, sf_dir: str) -> None:
        register_testdata_views(self.spark, sf_dir)

    def tables(self, sf_dir: str) -> dict[str, DataFrame]:
        return load_testdata(self.spark, sf_dir)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    # -- named query catalog ----------------------------------------------
    def query(self, name: str, sf_dir: str) -> DataFrame:
        return QUERIES[name](self.spark, sf_dir)

    def query_names(self) -> list[str]:
        return sorted(QUERIES)

    def oracle_sql(self, name: str) -> str | None:
        return ORACLE_SQL.get(name)

    # -- transactional tables & curation ----------------------------------
    def table(self, root: str):
        """TxTable handle (versioned gold/mart table: read, time
        travel, compact, vacuum)."""
        from .sources.txlog import TxTable

        return TxTable(self.spark, root)

    def curate(self, df: DataFrame, **kwargs) -> DataFrame:
        """The end-to-end corpus curation pass (quality gate -> dedup ->
        cluster dedup -> redact -> split); see `pipeline/curate.py`."""
        from .pipeline.curate import curate_corpus

        return curate_corpus(df, **kwargs)

    def export_shards(self, df: DataFrame, path: str, **kwargs) -> int:
        """Export a corpus as WebDataset tar shards (the trainer
        interchange format); see `sources/webdataset.py`."""
        from .sources.webdataset import write_webdataset_shards

        return write_webdataset_shards(df, path, **kwargs)

    def read_shards(self, path: str, **kwargs) -> DataFrame:
        """Read a WebDataset shard directory back into a DataFrame."""
        from .sources.webdataset import read_webdataset_shards

        return read_webdataset_shards(self.spark, path, **kwargs)

    def register_warehouse(self, wh: Warehouse, prefix: str = "") -> list[str]:
        """Expose a Warehouse's tables to the SQL frontend as temp
        views — the reference user's ad-hoc psql session becomes
        ``eng.sql("SELECT ... FROM dw_current ...")``.  Registers
        ``dw`` (full SCD2 history), ``dw_current`` (open versions),
        ``dw_history`` (closed versions), plus ``date_dim`` and
        ``staging`` when they exist.  Returns the view names."""
        from .sources import table_exists

        gold = wh.gold()
        views: dict[str, DataFrame] = {}
        if gold.exists():
            views["dw"] = gold.read()
            views["dw_current"] = gold.read_current()
            views["dw_history"] = gold.read_closed()
        if table_exists(self.spark, wh.date_dim_dir):
            views["date_dim"] = self.spark.read.parquet(wh.date_dim_dir)
        staging = wh.staging()
        if staging.exists():
            views["staging"] = staging.read()
        names = []
        for name, df in views.items():
            full = f"{prefix}{name}"
            df.createOrReplaceTempView(full)
            names.append(full)
        return names
