"""Document chunking (training-data pipeline north star): split long
text into fixed-size overlapping character windows — the pre-tokenizer
sharding step of an LLM data pipeline (context-window packing operates
on chunks, not documents).

One explode per document: the chunk index sequence is computed
engine-side and ``substring`` slices are lazy column expressions, so
the operator is a scan-local projection + explode — no shuffle, no
Python, and the full text never leaves the row it came from until the
narrow chunk columns are projected out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 512,
    overlap: int = 64,
    chunk_col: str = "chunk",
    idx_col: str = "chunk_idx",
) -> DataFrame:
    """One row per (document, chunk): chunk i covers characters
    [i*step, i*step + chunk_chars) with step = chunk_chars - overlap;
    the final chunk may be short, and an empty/short document yields
    exactly one chunk.  Deterministic — mirrored 1:1 in SQL oracles."""
    if overlap >= chunk_chars:
        raise ValueError(f"overlap ({overlap}) must be smaller than chunk_chars ({chunk_chars})")
    step = chunk_chars - overlap
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(float(step))).cast("int"),
    )
    idx = F.explode(F.sequence(F.lit(0), n_chunks - 1))
    out = df.withColumn(idx_col, idx)
    return out.withColumn(
        chunk_col,
        F.expr(f"substring({text_col}, {idx_col} * {step} + 1, {chunk_chars})"),
    )


def pack_documents(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col=None,
    context_len: int = 256,
) -> DataFrame:
    """GPT-style sequence packing offsets: documents concatenate in
    ``id_col`` order within each ``group_col`` stream, and the token
    stream is cut into fixed ``context_len`` windows (documents may
    straddle a cut — the standard concat-then-chunk pretraining
    layout).  Emits, per document: its token count, start offset in
    the stream, the pack (window) its first token lands in, and how
    many packs it spans — everything a batch loader needs to
    materialize packed examples.

    ``tokens_col``: a Column with the document's token count; defaults
    to the whitespace ``token_count`` over ``text``.

    Scale shape: ONE window function partitioned by ``group_col``
    (running sum) — packing is embarrassingly parallel across sources/
    shards, sequential only within one source's stream, which is the
    determinism the layout requires.  No explode, no Python; a skewed
    giant source should be pre-split into shard groups by the caller.
    """
    if context_len <= 0:
        raise ValueError(f"context_len must be positive, got {context_len}")
    if tokens_col is None:
        from ..functions.text import token_count

        tokens_col = token_count("text")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("n_tokens", tokens_col)
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).cast("long")
    end = (cum - 1).cast("long")  # last token offset (inclusive)
    return out.select(
        group_col,
        id_col,
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / context_len).cast("long").alias("pack_id"),
        F.when(
            F.col("n_tokens") > 0,
            (F.floor(end / context_len) - F.floor(start / context_len) + 1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_packs_spanned"),
    )
