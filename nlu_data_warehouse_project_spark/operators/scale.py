"""Scale-out machinery (SURVEY.md §4 partitioning row; BASELINE.json
100 TB north star).

Three tools a cluster-scale deployment of this engine leans on:

- **Bucketed tables** (``write_bucketed``): pre-shuffle a fact table
  once on its join key; every subsequent equi-join or aggregation on
  that key is exchange-free.  This is how the silver/gold layers
  should be laid out for the SCD2 merge key (natural_key) so the
  daily merge never re-shuffles the accumulated warehouse.
- **Salted joins** (``salted_join``): when one join key dominates
  (hot products, null-ish defaults), split it across
  ``salt_buckets`` synthetic sub-keys — the small side replicates per
  salt, the big side scatters deterministically.  AQE's skew-join
  splitting handles moderate skew at runtime; explicit salting is for
  the pathological keys you know about.
- **Partitioned layout** (``write_date_partitioned``): date-partitioned
  gold tables give run-slice queries partition pruning (the engine's
  equivalent of the reference's per-day filename convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins/aggregations on ``bucket_cols`` between tables bucketed the
    same way run without an Exchange."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: left rows scatter across
    ``salt_buckets`` sub-keys; right rows replicate once per salt.
    Semantics identical to ``left.join(right, on, how)`` — but ONLY for
    inner/left joins (a right/full join would emit unmatched right rows
    once per salt; semi/anti change semantics), so anything else raises.
    The salt comes from a per-row monotonic id, not a row hash: exact
    duplicate rows of a hot key must still spread across salts (a
    whole-row hash lands them all in one bucket, ADVICE r1 #3).
    Cost profile is a join on (key, salt) whose per-task share of a hot
    key is 1/salt_buckets."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: replicating the "
            "right side per salt breaks right/full/semi/anti semantics"
        )
    salted_left = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_left.join(salted_right, [on, "__salt"], how).drop("__salt")


def write_date_partitioned(df: DataFrame, path: str, date_col: str, mode: str = "overwrite") -> None:
    """Date-partitioned parquet layout: filters on ``date_col`` prune
    whole directories at plan time (PartitionFilters in the scan)."""
    df.write.mode(mode).partitionBy(date_col).parquet(path)


def repartition_for_key_work(df: DataFrame, keys: list[str], partitions: int | None = None) -> DataFrame:
    """Hash-repartition on the keys a downstream stage will group/join
    on, so consecutive keyed stages reuse one exchange instead of each
    introducing their own."""
    cols = [F.col(k) for k in keys]
    return df.repartition(partitions, *cols) if partitions else df.repartition(*cols)
