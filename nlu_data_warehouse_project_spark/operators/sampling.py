"""Deterministic sampling & dataset splits (training-data pipeline
north star): train/val/test assignment, Bernoulli-by-hash sampling, and
exact-n stratified sampling.

Everything here derives randomness from md5 of a (seed, id) string, not
from an engine RNG: the same row lands in the same split on Spark, on
DuckDB, on a re-run, and after a repartition — reproducible splits are
a correctness property for training pipelines (a row that migrates from
test to train between runs silently leaks evaluation data).  Spark's
``sample``/``randomSplit`` are partition-order-dependent and engine
private, so they cannot give this guarantee.

All expressions are built-in (md5/conv/pmod) — JVM-side, no Python on
the hot path; assignment is a scan-local projection (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BUCKETS = 10_000


def hash_bucket(id_col: Column | str, seed: int = 42, buckets: int = HASH_BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from md5(seed:id) — the first 15
    hex chars parse into a 60-bit long (same recipe as the minhash
    family; mirrored in SQL as ('0x'||substring(md5(..),1,15))::BIGINT)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    digest = F.md5(F.concat(F.lit(f"{seed}:"), c.cast("string")))
    return F.conv(F.substring(digest, 1, 15), 16, 10).cast("long") % buckets


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights (must
    sum to ~1).  Assignment depends only on (seed, id): stable across
    runs, engines, and data order."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        bound = int(round(cum * HASH_BUCKETS))
        clause = F.when(bucket < bound, F.lit(name))
        expr = clause if expr is None else expr.when(bucket < bound, F.lit(name))
    expr = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: int = 42,
) -> DataFrame:
    """Bernoulli-by-hash sample: keeps the rows whose bucket falls below
    ``fraction`` of the bucket space.  Repeatable and engine-neutral,
    unlike ``DataFrame.sample``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bound = int(round(fraction * HASH_BUCKETS))
    return df.filter(hash_bucket(id_col, seed) < bound)


def stratified_exact_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (or all rows of a
    smaller stratum), chosen by hash order — a deterministic reservoir.
    One window shuffle on the strata key; the hash order makes the
    selection independent of input order and stable under reruns."""
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )
