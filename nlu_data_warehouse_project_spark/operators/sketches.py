"""Approximate/sketch operators — the constant-memory summaries a
100 TB pipeline uses where exact answers don't fit (cardinality,
quantiles, heavy hitters).

Approximation means no independent-engine oracle can hash-match these;
their tests bound relative error against the exact answers at test
scale instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05, group_by: list[str] | None = None) -> DataFrame:
    """HyperLogLog++ distinct count (Spark's approx_count_distinct);
    rsd = target relative standard deviation.  Constant memory per
    group vs the exact count's hash-set."""
    agg = F.approx_count_distinct(col, rsd).alias(f"approx_distinct_{col}")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def approx_quantiles(df: DataFrame, col: str, probs: list[float], rel_err: float = 0.01) -> list[float]:
    """Greenwald-Khanna approximate quantiles (single pass, bounded
    memory).  Driver-side result: intended for stats collection, not
    row pipelines."""
    return df.approxQuantile(col, probs, rel_err)


def heavy_hitters(df: DataFrame, col: str, min_share: float = 0.01) -> DataFrame:
    """Keys appearing in at least ``min_share`` of rows — the exact
    two-pass form (count + filter on total).  The single-pass sketch
    alternative is count-min; at Spark's shuffle cost the exact
    groupBy with map-side combine is usually the right call, so that
    is what ships."""
    total = df.count()
    threshold = max(1, int(total * min_share))
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= threshold)
        .withColumn("share", F.round(F.col("n") / F.lit(total), 4))
    )
