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


def interval_overlap_pairs(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket_seconds: int = 3600,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Interval × interval overlap join (closed intervals:
    ``a.start <= b.end AND b.start <= a.end``) — the temporal-overlap
    shape (meetings × meetings, outage windows × job runs) the
    point-in-interval `range_pairs_within` cannot express.

    Scale shape: each interval explodes into the ``bucket_seconds``-wide
    buckets it covers; the join is an equi-join on (keys, bucket); a
    pair is CREDITED EXACTLY ONCE, in the bucket of the later of the
    two starts — that bucket is covered by both sides whenever they
    overlap (max(starts) <= min(ends)), so no distinct pass is needed.
    Candidate count is bounded by per-bucket interval density, never by
    per-key row count.  Pick ``bucket_seconds`` near the median
    interval length: row fan-out is interval_len/bucket_seconds per
    row (``max_buckets_per_interval`` fails fast — JVM-side
    ``assert_true`` — rather than letting one year-long interval
    explode into millions of rows).

    Left/right columns come back prefixed ``a_``/``b_``.
    """
    keys = keys or []
    w_us = int(bucket_seconds) * 1_000_000

    def prep(df: DataFrame, prefix: str) -> DataFrame:
        s = F.unix_micros(F.col(start_col).cast("timestamp"))
        e = F.unix_micros(F.col(end_col).cast("timestamp"))
        sb = F.expr(f"unix_micros(cast({start_col} as timestamp)) div {w_us}L")
        eb = F.expr(f"unix_micros(cast({end_col} as timestamp)) div {w_us}L")
        # NULL start/end rows are SKIPPED (explode of a NULL sequence
        # emits nothing), matching range_pairs_within — one NULL in 10^9
        # rows must not kill the query.  The guard below fires only on
        # genuinely inverted/over-wide intervals, and lives INSIDE the
        # exploded expression — a standalone assert_true column would be
        # pruned away unevaluated.
        ok = (e >= s) & (eb - sb <= max_buckets_per_interval)
        ok = F.when(s.isNull() | e.isNull(), F.lit(None).cast("boolean")).otherwise(ok)
        msg = (
            f"{prefix}: interval inverted or wider than "
            f"{max_buckets_per_interval} buckets of {bucket_seconds}s"
        )
        guarded_seq = F.when(ok, F.sequence(sb, eb)).otherwise(
            F.raise_error(F.lit(msg)).cast("array<bigint>")
        )
        return df.select(
            *[F.col(k).alias(f"__k_{k}") for k in keys],
            s.alias(f"{prefix}s_us"),
            e.alias(f"{prefix}e_us"),
            sb.alias(f"{prefix}sb"),
            F.explode(guarded_seq).alias(f"{prefix}bkt"),
            *[F.col(c).alias(f"{prefix}{c}") for c in df.columns],
        )

    a = prep(left, "a_")
    b = prep(right, "b_")
    on = [a[f"__k_{k}"] == b[f"__k_{k}"] for k in keys] + [a["a_bkt"] == b["b_bkt"]]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    pairs = a.join(b, cond).filter(
        (F.col("a_s_us") <= F.col("b_e_us"))
        & (F.col("b_s_us") <= F.col("a_e_us"))
        & (F.col("a_bkt") == F.greatest(F.col("a_sb"), F.col("b_sb")))
    )
    drop = (
        [f"__k_{k}" for k in keys]
        + ["a_bkt", "a_s_us", "a_e_us", "a_sb", "b_bkt", "b_s_us", "b_e_us", "b_sb"]
    )
    return pairs.drop(*drop)
