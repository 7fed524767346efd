"""Bounded-interval range join (VERDICT r1 "What's wrong #3").

The naive formulation — equi-join on the key with the time predicate
applied post-join — materializes O(n²) candidate pairs per key before
filtering, so one hot key (a bot user at 100 TB) degrades a task
quadratically and AQE skew-splitting cannot reduce the intrinsic pair
count.

The fix is the classic time-bucketing rewrite: quantize timestamps to
``delta``-wide buckets and equi-join on (key, bucket), with the right
side exploded into its own bucket and the previous one.  Any pair with
``0 < b.ts - a.ts <= delta`` lands in the same or adjacent bucket, so
the join compares only rows within ±1 bucket of each other — candidate
count is bounded by per-bucket density, not per-key row count.  Each
qualifying pair matches exactly once (a bucket cannot equal both of the
right row's two join keys).

This is the batch analogue of a stream-stream interval join; Spark has
no built-in bounded-range join in batch (range-join hints are a
Databricks-runtime feature), so the rewrite is the portable Spark-first
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_pairs_within(
    df: DataFrame,
    key: str,
    ts_col: str,
    delta_seconds: int,
) -> DataFrame:
    """All ordered pairs (a, b) sharing ``key`` with
    ``a.ts < b.ts <= a.ts + delta_seconds``.

    Returns the a-side columns aliased ``a.*`` and b-side ``b.*``
    (prefixed ``a_``/``b_``), one row per qualifying pair.
    """
    delta_us = int(delta_seconds) * 1_000_000
    # cast('timestamp') makes the operator robust to TIMESTAMP_NTZ input
    # (unix_micros rejects NTZ); no-op for LTZ columns
    with_bkt = df.withColumn("__us", F.unix_micros(F.col(ts_col).cast("timestamp"))).withColumn(
        "__bkt", F.expr(f"__us div {delta_us}L")
    )
    a = with_bkt.select(
        F.col(key).alias("__k"),
        F.col("__bkt"),
        F.col("__us").alias("__a_us"),
        *[F.col(c).alias(f"a_{c}") for c in df.columns],
    )
    # right side joins into its own bucket and the previous one: a pair
    # within delta spans at most one bucket boundary
    b = with_bkt.select(
        F.col(key).alias("__k"),
        F.explode(F.array(F.col("__bkt"), F.col("__bkt") - F.lit(1))).alias("__bkt"),
        F.col("__us").alias("__b_us"),
        *[F.col(c).alias(f"b_{c}") for c in df.columns],
    )
    pairs = a.join(b, ["__k", "__bkt"]).filter(
        (F.col("__b_us") > F.col("__a_us")) & (F.col("__b_us") <= F.col("__a_us") + F.lit(delta_us))
    )
    return pairs.drop("__k", "__bkt", "__a_us", "__b_us")
