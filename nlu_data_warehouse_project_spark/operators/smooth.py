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
operator reproduces q197's values bit-for-bit — property-tested.

MEMORY BOUNDS (VERDICT r14 #3, defaults flipped r15 #2).  The
``*_by_key_grouped`` spellings use ``groupBy(...).applyInPandas``,
which materializes EACH KEY'S WHOLE SERIES as one pandas frame in the
Python worker — fine while a key is calendar-bounded (a nation-day
series is <= a few thousand rows), a real hazard for an unbounded
per-user event stream.  The ``*_by_key_streamed`` twins are the
streaming-state spelling: ``repartition(keys)`` +
``sortWithinPartitions(keys, order)`` + ``mapInPandas`` with the
accumulator carried ACROSS Arrow batches, so peak Python memory is
one Arrow batch (``spark.sql.execution.arrow.maxRecordsPerBatch``,
default 10k rows) regardless of series length.  Same IEEE operation
order row-by-row, so the two spellings are bit-equal —
property-tested across forced batch boundaries, and the catalog's
q341/q342 run the streamed spelling against the recursive DuckDB
oracle.  Since round 16 the BARE names (``ewma_by_key``,
``holt_by_key``) ARE the streamed spelling — a user reaching for "the
smoother" gets the bounded-memory plan; the grouped twins stay as the
equivalence oracles and for tiny calendar-bounded frames where one
groupBy beats a repartition+sort."""

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
    ``order_col`` (ties would make the recursion order ambiguous).

    DEFAULT = the STREAMED spelling (bounded memory; VERDICT r15 #2):
    see ``ewma_by_key_streamed``.  ``ewma_by_key_grouped`` is the
    whole-group ``applyInPandas`` twin, bit-equal by property test."""
    return ewma_by_key_streamed(df, key_cols, order_col, value_col,
                                alpha=alpha, out_col=out_col)


def ewma_by_key_grouped(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    out_col: str = "ewma",
) -> DataFrame:
    """The whole-group ``applyInPandas`` EWMA spelling — each key's
    series materializes as ONE pandas frame (memory bound: the longest
    series).  Kept as the streamed default's equivalence oracle and
    for tiny calendar-bounded frames."""
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
    linear twin of q339's coupled-recurrence fold.  DEFAULT = the
    STREAMED spelling (bounded memory; VERDICT r15 #2): see
    ``holt_by_key_streamed``; ``holt_by_key_grouped`` is the
    whole-group twin, bit-equal by property test."""
    return holt_by_key_streamed(df, key_cols, order_col, value_col,
                                alpha=alpha, beta=beta,
                                level_col=level_col, trend_col=trend_col)


def holt_by_key_grouped(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.5,
    level_col: str = "level",
    trend_col: str = "trend",
) -> DataFrame:
    """The whole-group ``applyInPandas`` Holt spelling (the streamed
    default's equivalence oracle) — the coupled recurrence:

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


def _streamed(df: DataFrame, key_cols: list[str], order_col: str,
              value_col: str, schema: T.StructType, reset, step) -> DataFrame:
    """Shared streamed-recurrence plumbing: hash-partition by key,
    sort (key, order) within partitions so each key's series is
    contiguous and ordered, then one ``mapInPandas`` pass whose
    generator carries the per-key state ACROSS Arrow batches.  Keys
    never span partitions (hash partitioning), so per-partition
    generators need no cross-partition state; a key's series CAN span
    many batches, which is the whole point — peak Python memory is one
    Arrow batch, not one series.

    ``reset(x) -> (state, outputs)`` starts a key's recurrence at its
    first row; ``step(state, x) -> (state, outputs)`` advances it.
    ``outputs`` is one float per appended schema field."""
    kcols = list(key_cols)
    out_names = [f.name for f in schema.fields[len(df.schema.fields):]]

    def run(batches):
        cur_key = None
        state = None
        for pdf in batches:
            n = len(pdf)
            x = pdf[value_col].to_numpy(dtype=np.float64)
            keys = list(zip(*(pdf[k].tolist() for k in kcols)))
            outs = [np.empty(n, dtype=np.float64) for _ in out_names]
            for i in range(n):
                if keys[i] != cur_key:
                    cur_key = keys[i]
                    state, vals = reset(x[i])
                else:
                    state, vals = step(state, x[i])
                for j, v in enumerate(vals):
                    outs[j][i] = v
            pdf = pdf.copy()
            for name, arr in zip(out_names, outs):
                pdf[name] = arr
            yield pdf

    return (
        df.repartition(*kcols)
        .sortWithinPartitions(*kcols, order_col)
        .mapInPandas(run, schema)
    )


def ewma_by_key_streamed(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    out_col: str = "ewma",
) -> DataFrame:
    """``ewma_by_key`` with bounded memory: same recurrence in the same
    IEEE operation order (bit-equal results, property-tested), but the
    per-key series streams through ``mapInPandas`` one Arrow batch at
    a time instead of materializing whole in a pandas group — the
    spelling for UNBOUNDED per-key series (per-user event streams) at
    100x, where a single key's history must never need to fit in one
    worker's memory."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha={alpha} must be in (0, 1]")
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType(), True)]
    )

    def reset(x):
        return x, (x,)

    def step(acc, x):
        # the fold twins' exact operation order: acc*(1-a) + x*a
        acc = acc * (1.0 - alpha) + x * alpha
        return acc, (acc,)

    return _streamed(df, key_cols, order_col, value_col, schema, reset, step)


def holt_by_key_streamed(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.5,
    level_col: str = "level",
    trend_col: str = "trend",
) -> DataFrame:
    """``holt_by_key`` with bounded memory — the streamed twin (see
    ``ewma_by_key_streamed``); same inlined-level' expression order as
    the q339 fold, so all three spellings agree bit-for-bit."""
    for name, v in (("alpha", alpha), ("beta", beta)):
        if not 0.0 < v <= 1.0:
            raise ValueError(f"{name}={v} must be in (0, 1]")
    schema = T.StructType(
        df.schema.fields
        + [T.StructField(level_col, T.DoubleType(), True),
           T.StructField(trend_col, T.DoubleType(), True)]
    )

    def reset(x):
        return (x, 0.0), (x, 0.0)

    def step(state, x):
        lvl, trend = state
        new_lvl = x * alpha + (lvl + trend) * (1.0 - alpha)
        trend = (new_lvl - lvl) * beta + trend * (1.0 - beta)
        return (new_lvl, trend), (new_lvl, trend)

    return _streamed(df, key_cols, order_col, value_col, schema, reset, step)
