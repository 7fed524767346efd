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
