"""P4 data-mart stage (SURVEY.md §0/§7 M5).

The reference *declares* a mart database feeding PowerBI — ``dim``,
``fact`` and ``report`` tables (docx xlines 39-50) — but ships no code
for it.  This module is the natural completion of that declared
surface: star-schema materialization from the gold layer.

  dim_product    current product attributes (one row per natural key,
                 from the SCD2 current set) + a dense surrogate key
  fact_inventory one row per (product version-day): price/quantity by
                 date surrogate — the grain the SCD2 table already
                 tracks, projected onto the star
  report_*       the aggregates the docx dashboards describe: price
                 stats by brand / origin / shape over calendar attrs

All outputs are plain DataFrames; ``materialize_mart`` writes them
date-partitioned for pruning.  Aggregations use the A-family operators
the reference never got to (sum/avg/min/max/count-distinct, rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import SCD2_OPEN_SENTINEL


def current_products(dw: DataFrame, key: str = "natural_key", ts_col: str = "dt_last_update") -> DataFrame:
    """The SCD2 current set: one open row per key."""
    return dw.filter(F.col(ts_col) == F.to_date(F.lit(SCD2_OPEN_SENTINEL)))


def dim_product(dw: DataFrame, key: str = "natural_key") -> DataFrame:
    """Product dimension from the current set, with a dense surrogate
    (dimension-sized: the global window is fine here, never on facts)."""
    cur = current_products(dw)
    w = Window.orderBy(F.col(key).asc())
    return cur.select(
        key, "sku", "product_name", "brand", "material", "shape", "dimension", "origin", "product_url"
    ).withColumn("product_sk", F.row_number().over(w).cast("int"))


def fact_inventory(dw: DataFrame, dim: DataFrame, key: str = "natural_key") -> DataFrame:
    """Fact at the (product, version) grain: measures + date surrogate,
    product surrogate resolved via broadcast."""
    sk = F.broadcast(dim.select(key, "product_sk"))
    return (
        dw.join(sk, key, "left")
        .select(
            "product_sk",
            key,
            "price",
            "quantity_available",
            "dt_dim",
            "dt_extract",
            "dt_load_to_dw",
            "dt_last_update",
        )
    )


def report_price_by_brand(dw: DataFrame) -> DataFrame:
    """Docx dashboard twin: price stats by brand over the current set,
    with a rollup grand-total row."""
    cur = current_products(dw)
    return (
        cur.rollup("brand")
        .agg(
            F.count("*").alias("n_products"),
            F.min("price").alias("min_price"),
            F.max("price").alias("max_price"),
            F.round(F.avg("price"), 2).alias("avg_price"),
            F.sum("quantity_available").alias("total_quantity"),
        )
    )


def report_origin_shape(dw: DataFrame) -> DataFrame:
    """Two-dimensional report: product counts and price by origin x
    shape (cube — every marginal the dashboard can slice)."""
    cur = current_products(dw)
    return cur.cube("origin", "shape").agg(
        F.count("*").alias("n_products"),
        F.round(F.avg("price"), 2).alias("avg_price"),
    )


def report_price_history(dw: DataFrame, date_dim: DataFrame) -> DataFrame:
    """Price-over-time report joined to calendar attributes via the
    dt_dim surrogate (the join J5 exists to serve): avg price per
    (year, month_name, brand)."""
    dd = F.broadcast(date_dim.select(F.col("id").alias("dt_dim"), "year", "month_name"))
    return (
        dw.join(dd, "dt_dim", "inner")
        .groupBy("year", "month_name", "brand")
        .agg(
            # decimal accumulation: a double sum varies in the last ULP
            # with partition order, which flips round(x, 2) at .005
            # boundaries — engine-reproducibility is part of the contract
            F.round(F.sum(F.col("price").cast("decimal(25,6)")) / F.count("price"), 2)
            .cast("double")
            .alias("avg_price"),
            F.countDistinct("natural_key").alias("n_products"),
        )
    )


def materialize_mart(
    dw: DataFrame,
    date_dim: DataFrame,
    out_dir: str,
    transactional: bool = False,
    run_id: str = "mart",
) -> dict[str, DataFrame]:
    """Build and persist the whole star; returns the mart DataFrames.

    ``transactional=True`` publishes each table as a TxTable snapshot
    commit instead of a plain overwrite: a crash mid-materialization
    leaves every table at its previous version (plain overwrite leaves
    a half-deleted directory), and dashboards read a consistent
    version.  Read back with ``TxTable(spark, path).read()``."""
    dim = dim_product(dw)
    fact = fact_inventory(dw, dim)
    reports = {
        "report_price_by_brand": report_price_by_brand(dw),
        "report_origin_shape": report_origin_shape(dw),
        "report_price_history": report_price_history(dw, date_dim),
    }
    tables = {"dim_product": dim, "fact_inventory": fact, **reports}
    if transactional:
        from ..sources.txlog import TxTable

        for name, df in tables.items():
            TxTable(df.sparkSession, f"{out_dir}/{name}").commit_snapshot(df, run_id)
    else:
        dim.write.mode("overwrite").parquet(f"{out_dir}/dim_product")
        fact.write.mode("overwrite").partitionBy("dt_load_to_dw").parquet(f"{out_dir}/fact_inventory")
        for name, df in reports.items():
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}")
    return tables
