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


def dim_product(dw: DataFrame, key: str = "natural_key", stable_sk: bool = False) -> DataFrame:
    """Product dimension from the current set.

    ``stable_sk=False``: dense int surrogate via a global window —
    dimension-sized, fine for a full rebuild, but the values SHIFT when
    keys appear/disappear, so dense sks cannot survive an incremental
    refresh.  ``stable_sk=True``: xxhash64 of the natural key —
    scan-local (no window at all) and refresh-stable, the form the
    incremental mart uses (collision odds over 64 bits are ~n²/2⁶⁵;
    negligible at any realistic key count)."""
    cur = current_products(dw)
    base = cur.select(
        key, "sku", "product_name", "brand", "material", "shape", "dimension", "origin", "product_url"
    )
    if stable_sk:
        return base.withColumn("product_sk", F.xxhash64(F.col(key)))
    w = Window.orderBy(F.col(key).asc())
    return base.withColumn("product_sk", F.row_number().over(w).cast("int"))


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
    stable_sk: bool = False,
) -> dict[str, DataFrame]:
    """Build and persist the whole star; returns the mart DataFrames.

    ``transactional=True`` publishes each table as a TxTable snapshot
    commit instead of a plain overwrite: a crash mid-materialization
    leaves every table at its previous version (plain overwrite leaves
    a half-deleted directory), and dashboards read a consistent
    version.  Read back with ``TxTable(spark, path).read()``.

    This is the FULL rebuild — every table recomputed from the whole
    gold table.  For the daily cadence use ``refresh_mart``, which
    consumes only the gold delta since the last refresh."""
    dim = dim_product(dw, stable_sk=stable_sk)
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


# ---------------------------------------------------------------------------
# Incremental refresh (VERDICT r2 #6).  After the TxTable merge fix, the
# daily FULL mart rebuild was the largest remaining per-day I/O: it
# re-read the entire gold history for tables whose inputs only ever
# GROW.  TxTable's layout hands the increment over for free:
#
#   * gold version rows are append-only — closing a version only flips
#     dt_last_update, which no history report reads — and every version
#     carries its insert run date, so "new versions since the last
#     refresh" is a dt_load_to_dw watermark filter over (current set ∪
#     closed dirs added since the last refresh): O(live + churn) read.
#   * fact_inventory mirrors gold's commit shape: replace the current
#     projection, append the closed-delta projection.
#   * report_price_history keeps a mergeable partial-aggregate state at
#     (year, month, brand, natural_key) grain — the classic
#     incremental-view-maintenance intermediate; countDistinct
#     finalizes as a row count over it.
#   * dim + current-set reports rebuild from the current set (O(live)).
#
# Surrogates must be refresh-stable, so the incremental path always
# uses the hash product_sk (a dense row_number sk shifts whenever a key
# set changes — full-rebuild-only semantics).
# ---------------------------------------------------------------------------

_PARTIAL_GRAIN = ["year", "month_name", "brand", "natural_key"]


def _fact_rows(rows: DataFrame) -> DataFrame:
    """Gold rows -> fact grain with the stable hash surrogate
    (scan-local: no dim join needed — xxhash64 IS the sk)."""
    return rows.select(
        F.xxhash64(F.col("natural_key")).alias("product_sk"),
        "natural_key",
        "price",
        "quantity_available",
        "dt_dim",
        "dt_extract",
        "dt_load_to_dw",
        "dt_last_update",
    )


def price_history_partials(rows: DataFrame, date_dim: DataFrame) -> DataFrame:
    """Partial sums at (year, month_name, brand, natural_key) grain —
    the mergeable intermediate behind ``report_price_history``.  Exact
    decimal accumulation keeps the merged result bit-identical to the
    full rebuild."""
    dd = F.broadcast(date_dim.select(F.col("id").alias("dt_dim"), "year", "month_name"))
    return (
        rows.join(dd, "dt_dim", "inner")
        .groupBy(*_PARTIAL_GRAIN)
        .agg(
            F.sum(F.col("price").cast("decimal(25,6)")).alias("sum_price"),
            F.count("price").alias("n_price"),
        )
    )


def merge_price_history_partials(prev: DataFrame, delta: DataFrame) -> DataFrame:
    return (
        prev.unionByName(delta)
        .groupBy(*_PARTIAL_GRAIN)
        .agg(F.sum("sum_price").alias("sum_price"), F.sum("n_price").alias("n_price"))
    )


def finalize_price_history(partials: DataFrame) -> DataFrame:
    """Partials -> the ``report_price_history`` result (same columns,
    same decimal arithmetic; n_products = countDistinct finalized as a
    count over the per-key partial rows)."""
    return partials.groupBy("year", "month_name", "brand").agg(
        F.round(F.sum("sum_price") / F.sum("n_price"), 2).cast("double").alias("avg_price"),
        F.count("*").alias("n_products"),
    )


def refresh_mart(gold, date_dim: DataFrame, out_dir: str, run_id: str = "mart") -> dict[str, DataFrame]:
    """Incrementally refresh the mart from a gold ``TxTable``: reads
    only the current set plus the closed dirs committed since the last
    refresh, never the full history.  Result tables are row-identical
    to ``materialize_mart(gold.read(), ..., stable_sk=True)`` (pinned
    by pytest).  All outputs are TxTable snapshot/merge commits, so a
    crash mid-refresh leaves the previous mart version readable.

    Compaction-aware (maintenance cadence, `Warehouse.maintain`): a
    compacted dir whose recorded sources (`compacted_lineage`) were all
    consumed by an earlier refresh is treated as consumed — so the
    refresh-then-compact cycle keeps refreshing without a rebuild.
    Raises only when compaction folded consumed and unconsumed commits
    into one dir, or history was rewritten outside the lineage (the
    delta is then unrecoverable) — rebuild once with
    ``materialize_mart`` and resume refreshing after.
    """
    from ..sources.txlog import TxTable, lineage_leaves

    spark = gold.spark
    man = gold.manifest()
    if man is None:
        raise FileNotFoundError(f"gold table {gold.root} has no committed version")

    fact_tx = TxTable(spark, f"{out_dir}/fact_inventory")
    partials_tx = TxTable(spark, f"{out_dir}/_price_history_partials")
    consumed: list[str] = []
    watermark: str | None = None
    lineage = man.get("compacted_lineage", {})
    if fact_tx.exists():
        m = fact_tx.manifest()
        consumed = m.get("source_closed_dirs", [])
        watermark = m.get("source_watermark")

    # resolve both sides to ORIGINAL commit dirs so the comparison
    # survives compaction on either side of the bookkeeping
    consumed_leaves: set[str] = set()
    for c in consumed:
        consumed_leaves |= lineage_leaves(c, lineage)
    new_dirs: list[str] = []
    covered: set[str] = set()
    for d in man["closed"]:
        leaves = lineage_leaves(d, lineage)
        covered |= leaves
        if leaves <= consumed_leaves:
            continue  # fully consumed before it was compacted
        if leaves & consumed_leaves:
            raise RuntimeError(
                f"gold closed history under {gold.root} was compacted across the refresh "
                f"boundary ({d} mixes consumed and unconsumed commits); run "
                "materialize_mart once to rebuild, then resume refresh_mart — or run "
                "maintenance right after a refresh so compaction only folds consumed dirs"
            )
        new_dirs.append(d)
    if not consumed_leaves <= covered:
        raise RuntimeError(
            f"gold closed history under {gold.root} was compacted/rewritten since the "
            "last refresh; run materialize_mart once to rebuild, then resume refresh_mart"
        )
    cur = gold.read_current().persist()
    closed_delta = gold.read_closed(dirs=new_dirs).persist()
    try:
        # new version rows since the last refresh: a version inserted
        # after the watermark is either still open or was closed by a
        # commit we haven't consumed — nowhere else
        rows_now = cur.unionByName(closed_delta.select(*cur.columns))
        delta_versions = (
            rows_now.filter(F.col("dt_load_to_dw") > F.to_date(F.lit(watermark)))
            if watermark
            else rows_now
        )
        new_wm = rows_now.agg(F.max("dt_load_to_dw")).collect()[0][0]
        new_wm = max(filter(None, [watermark, new_wm.isoformat() if new_wm else None]), default=None)

        new_partials = price_history_partials(delta_versions, date_dim)
        prev_partials = (
            partials_tx.read_current() if (partials_tx.exists() and watermark) else new_partials.limit(0)
        )
        merged = merge_price_history_partials(prev_partials, new_partials).persist()

        source = {
            "source_gold_version": man["version"],
            "source_closed_dirs": man["closed"],
            "source_watermark": new_wm,
        }
        fact_tx.commit_merge(_fact_rows(cur), _fact_rows(closed_delta), run_id, extra=source)
        partials_tx.commit_snapshot(merged, run_id, extra=source)

        dim = dim_product(cur, stable_sk=True)
        tables = {
            "dim_product": dim,
            "fact_inventory": fact_tx.read(),
            "report_price_by_brand": report_price_by_brand(cur),
            "report_origin_shape": report_origin_shape(cur),
            "report_price_history": finalize_price_history(merged),
        }
        for name in ("dim_product", "report_price_by_brand", "report_origin_shape", "report_price_history"):
            TxTable(spark, f"{out_dir}/{name}").commit_snapshot(tables[name], run_id, extra=source)
        return tables
    finally:
        cur.unpersist()
        closed_delta.unpersist()
        try:
            merged.unpersist()
        except NameError:
            pass
