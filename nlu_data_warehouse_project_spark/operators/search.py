"""Positional phrase search — exact n-term phrase matching over a
token stream, the inverted-index primitive without materializing
posting lists.

A search engine answers "docs containing the exact phrase t1 t2 ... tn"
by intersecting POSITIONAL postings: occurrences of t1 at position p
survive only if t2 sits at p+1, t3 at p+2, ...  The Spark-first
spelling is the same intersection as a chain of (doc, position)-keyed
equi-joins over the posexploded token stream, with the term filters
applied BEFORE any join — each join side is only the occurrences of
ONE phrase term (a tiny, selective slice of the corpus; the filter
reaches the scan), and each join key includes the document, so the
shuffles are doc-partitioned and skew-free.  Never a regex over the
raw text: ``LIKE '%t1 t2%'`` can't express token boundaries and scans
every byte; the positional join touches only matching terms.

Materialized posting lists (collect_list per term) are deliberately
NOT built here: at 100 TB a common term's posting list is billions of
entries in one aggregation buffer — the join form keeps postings
distributed and is what this module ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def phrase_hits(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Count exact occurrences of ``phrase`` (a list of lowered tokens,
    matched adjacently in order) per document; documents with zero
    hits are absent.  Returns (id, n_hits).

    Overlapping occurrences all count (each start position is one
    hit).  Tokenization is the shared lowered-whitespace token set —
    mirrored in SQL by the catalog's ``_LTOKENS_SQL`` macro.
    """
    if len(phrase) < 1:
        raise ValueError("phrase must have at least one term")
    toks = docs.select(
        F.col(id_col).alias("__d"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("__p", "__t"),
    )
    cur = (
        toks.filter(F.col("__t") == phrase[0])
        .select("__d", F.col("__p").alias("__start"))
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = toks.filter(F.col("__t") == term).select(
            "__d", (F.col("__p") - F.lit(i)).alias("__start")
        )
        cur = cur.join(nxt, ["__d", "__start"], "left_semi")
    return cur.groupBy(F.col("__d").alias(id_col)).agg(
        F.count("*").alias("n_hits")
    )
