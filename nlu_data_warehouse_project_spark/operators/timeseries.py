"""Calendar-spine gap filling for per-key daily series.

Every reporting/feature pipeline eventually joins a sparse fact series
against a dense calendar: missing days must become explicit rows
(carrying the last observation forward, or linearly interpolating)
before window features, smoothers (``operators/smooth``), or
forecasting can run — a gap silently skipped is a wrong rolling mean.

Built entirely from engine primitives: the spine is
``sequence(min_day, max_day)`` exploded per key (scan-local after one
small per-key bounds aggregate), the fill is ``last(..,
ignorenulls)`` / ``first(.., ignorenulls)`` frames over ONE window
partitioning — Spark reuses the sort, so the whole operator costs a
single shuffle on the key at any scale.  Interpolation uses only IEEE
basic ops (subtract, multiply, divide on doubles + integer datediff),
so results are bit-identical cross-engine and hash-gateable with no
tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

METHODS = ("ffill", "linear")


def gap_fill(
    df: DataFrame,
    key_cols: list[str],
    day_col: str,
    value_col: str,
    method: str = "ffill",
    out_col: str = "filled",
    observed_col: str = "observed",
) -> DataFrame:
    """Densify a per-key daily series over each key's own
    [min(day), max(day)] span and fill the holes.

    - ``ffill``: last observed value carries forward (step function —
      balances, prices, dimensional attributes).
    - ``linear``: straight line between the surrounding observations
      (flows and rates); spine edges are always observed (the spine is
      bounded by each key's own min/max), so the interpolation never
      lacks an endpoint.

    Output: key columns, ``day_col`` (dense), ``out_col`` (double),
    ``observed_col`` (1 for real rows, 0 for filled).  Input must be
    unique on (key, day) — pre-aggregate first."""
    if method not in METHODS:
        raise ValueError(f"method={method!r} not in {METHODS}")
    day = F.col(day_col)
    val = F.col(value_col)
    bounds = df.groupBy(*key_cols).agg(
        F.min(day).alias("__d0"), F.max(day).alias("__d1")
    )
    spine = bounds.select(
        *key_cols, F.explode(F.sequence(F.col("__d0"), F.col("__d1"))).alias(day_col)
    )
    j = spine.join(
        df.select(*key_cols, day_col, value_col), [*key_cols, day_col], "left"
    )
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if method == "ffill":
        out = F.last(val, ignorenulls=True).over(w_prev).cast("double")
    else:
        w_next = (
            Window.partitionBy(*key_cols)
            .orderBy(day_col)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pv = F.last(val, ignorenulls=True).over(w_prev).cast("double")
        pd_ = F.last(F.when(val.isNotNull(), day), ignorenulls=True).over(w_prev)
        nv = F.first(val, ignorenulls=True).over(w_next).cast("double")
        nd = F.first(F.when(val.isNotNull(), day), ignorenulls=True).over(w_next)
        out = F.when(val.isNotNull(), val.cast("double")).otherwise(
            pv
            + (nv - pv)
            * F.datediff(day, pd_).cast("double")
            / F.datediff(nd, pd_).cast("double")
        )
    return j.select(
        *key_cols,
        day_col,
        out.alias(out_col),
        val.isNotNull().cast("int").alias(observed_col),
    )
