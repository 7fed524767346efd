"""Linear-work sequential smoothing over per-key ordered series.

q197/q339 compute EWMA and Holt smoothing with a prefix-array fold so
the recursion is hash-gateable cross-engine — at the documented cost
of O(n^2) element work on the series' partition, safe only while the
series key is calendar-bounded.  This module is the promised LINEAR
alternative for per-key UNBOUNDED series (per-user activity, per-part
demand at minute grain): one ``applyInPandas`` pass per key, state
carried across rows inside the Python worker, O(n) total.

This is a sanctioned Python-in-plan stage (the multimodal design
rule): a sequential recurrence cannot be expressed as a parallel
aggregate without the quadratic prefix trick, groups arrive as Arrow
batches, and the recursion itself runs as a numpy-backed loop.  The
arithmetic is the EXACT IEEE sequence of the fold twins
(``acc*(1-alpha) + x*alpha`` in order), so on the same series this
operator reproduces q197's values bit-for-bit — property-tested."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def ewma_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average, O(n) per key:
    ``y_0 = x_0; y_t = y_{t-1}*(1-alpha) + x_t*alpha`` over rows
    ordered by ``order_col`` within each key.  Returns the input
    columns plus ``out_col``.  Rows within a key must be unique on
    ``order_col`` (ties would make the recursion order ambiguous)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha={alpha} must be in (0, 1]")
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType(), True)]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        y = np.empty_like(x)
        acc = 0.0
        for i in range(len(x)):
            # the fold twins' exact operation order: acc*(1-a) + x*a
            acc = x[i] if i == 0 else acc * (1.0 - alpha) + x[i] * alpha
            y[i] = acc
        pdf[out_col] = y
        return pdf

    return df.groupBy(*key_cols).applyInPandas(smooth, schema)


def holt_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.5,
    level_col: str = "level",
    trend_col: str = "trend",
) -> DataFrame:
    """Per-key Holt double exponential smoothing, O(n) per key — the
    linear twin of q339's coupled-recurrence fold:

        level_0 = x_0, trend_0 = 0
        a       = level + trend
        level'  = x*alpha + a*(1-alpha)
        trend'  = (level' - level)*beta + trend*(1-beta)

    Same expression order as the fold (level' inlined), so at
    alpha=beta=1/2 this reproduces q339's doubles bit-for-bit."""
    for name, v in (("alpha", alpha), ("beta", beta)):
        if not 0.0 < v <= 1.0:
            raise ValueError(f"{name}={v} must be in (0, 1]")
    schema = T.StructType(
        df.schema.fields
        + [T.StructField(level_col, T.DoubleType(), True),
           T.StructField(trend_col, T.DoubleType(), True)]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        ls = np.empty_like(x)
        ts = np.empty_like(x)
        lvl = trend = 0.0
        for i in range(len(x)):
            if i == 0:
                lvl, trend = x[0], 0.0
            else:
                new_lvl = x[i] * alpha + (lvl + trend) * (1.0 - alpha)
                trend = (new_lvl - lvl) * beta + trend * (1.0 - beta)
                lvl = new_lvl
            ls[i], ts[i] = lvl, trend
        pdf[level_col] = ls
        pdf[trend_col] = ts
        return pdf

    return df.groupBy(*key_cols).applyInPandas(smooth, schema)
