"""Greedy sequence packing — the LLM-training sample-packing primitive.

Training pipelines concatenate documents into fixed-budget sequences
(e.g. 4096 tokens) to avoid padding waste; the standard streaming
packer is GREEDY FIRST-FIT-IN-ORDER: walk the corpus in a
deterministic order, accumulate documents into the current pack, open
a new pack when the next document would overflow the budget.  That
recurrence (the running total RESETS on overflow) is sequential —
inexpressible as a parallel aggregate without the quadratic prefix
trick — so like ``smooth.ewma_by_key`` it runs as one
``applyInPandas`` pass per key: Arrow batches in, a numpy-backed
integer loop, O(n) per key, state never leaves the worker.

At 100 TB the key (source shard, date bucket, ...) bounds each
sequential group; packs are then independent units downstream
(shuffle by pack_id is a plain hash shuffle).  All arithmetic is
integer, so the result is EXACTLY reproducible cross-engine — the
catalog gates it against a per-key recursive-CTE oracle with a full
value hash, no tolerance.

MEMORY BOUNDS (VERDICT r14 #3, defaults flipped r15 #2).
``greedy_pack_grouped`` materializes each key's whole group as one
pandas frame (fine for calendar/shard-bounded keys);
``greedy_pack_streamed`` — the spelling the bare ``greedy_pack`` name
now delegates to — is the bounded-memory one:
``repartition(keys)`` + ``sortWithinPartitions(keys, order)`` +
``mapInPandas`` carrying (pack_id, accumulated size) across Arrow
batches, so a key of ANY length packs in one-Arrow-batch peak memory.
Integer arithmetic in the same order → identical output; the
equivalence is property-tested across forced batch boundaries and the
catalog's packing queries run the streamed spelling against the
recursive-CTE oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def greedy_pack(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    size_col: str,
    budget: int,
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """First-fit-in-order packing per key — DEFAULT = the STREAMED
    bounded-memory spelling (VERDICT r15 #2); ``greedy_pack_grouped``
    is the whole-group twin, bit-equal by property test.  See
    ``greedy_pack_grouped`` for the full semantics."""
    return greedy_pack_streamed(df, key_cols, order_col, size_col, budget,
                                pack_col=pack_col, offset_col=offset_col)


def greedy_pack_grouped(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    size_col: str,
    budget: int,
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """First-fit-in-order packing per key: rows sorted by ``order_col``
    within each key accumulate into packs of total ``size_col`` <=
    ``budget``; a row that would overflow opens the next pack.  A
    single row LARGER than the budget gets a pack of its own (the
    caller chunks oversize documents first — ``operators/chunking``
    exists for exactly that; packing never silently truncates).

    Adds ``pack_col`` (0-based per key) and ``offset_col`` (the
    accumulated size before this row within its pack — the position a
    concatenated token stream would place it at).  Rows within a key
    must be unique on ``order_col``.
    """
    if budget <= 0:
        raise ValueError(f"budget={budget} must be positive")
    schema = T.StructType(
        df.schema.fields
        + [T.StructField(pack_col, T.LongType(), True),
           T.StructField(offset_col, T.LongType(), True)]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        sizes = pdf[size_col].to_numpy(dtype=np.int64)
        packs = np.empty(len(sizes), dtype=np.int64)
        offsets = np.empty(len(sizes), dtype=np.int64)
        pack_id, acc = 0, 0
        for i, s in enumerate(sizes):
            if i > 0 and acc + s > budget:
                pack_id += 1
                acc = 0
            packs[i] = pack_id
            offsets[i] = acc
            acc += s
        pdf[pack_col] = packs
        pdf[offset_col] = offsets
        return pdf

    return df.groupBy(*key_cols).applyInPandas(pack, schema)


def greedy_pack_streamed(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    size_col: str,
    budget: int,
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """``greedy_pack`` with bounded memory: the same first-fit-in-order
    recurrence, but each key's series streams through ``mapInPandas``
    one Arrow batch at a time with (pack_id, accumulated size) carried
    across batches — the spelling for unbounded per-key document
    streams at 100x.  Keys are contiguous and ordered inside each hash
    partition (repartition + sortWithinPartitions), so the generator
    only ever holds one batch plus two integers of state.  Identical
    integer arithmetic → bit-identical output to ``greedy_pack``
    (property-tested across forced batch boundaries)."""
    if budget <= 0:
        raise ValueError(f"budget={budget} must be positive")
    kcols = list(key_cols)
    schema = T.StructType(
        df.schema.fields
        + [T.StructField(pack_col, T.LongType(), True),
           T.StructField(offset_col, T.LongType(), True)]
    )

    def run(batches):
        cur_key = None
        pack_id = acc = 0
        for pdf in batches:
            n = len(pdf)
            sizes = pdf[size_col].to_numpy(dtype=np.int64)
            keys = list(zip(*(pdf[k].tolist() for k in kcols)))
            packs = np.empty(n, dtype=np.int64)
            offsets = np.empty(n, dtype=np.int64)
            for i in range(n):
                s = sizes[i]
                if keys[i] != cur_key:
                    cur_key, pack_id, acc = keys[i], 0, 0
                elif acc + s > budget:
                    pack_id += 1
                    acc = 0
                packs[i] = pack_id
                offsets[i] = acc
                acc += s
            pdf = pdf.copy()
            pdf[pack_col] = packs
            pdf[offset_col] = offsets
            yield pdf

    return (
        df.repartition(*kcols)
        .sortWithinPartitions(*kcols, order_col)
        .mapInPandas(run, schema)
    )
