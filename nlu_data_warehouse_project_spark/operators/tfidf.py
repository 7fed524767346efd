"""TF-IDF keyword extraction — distinctive-term profiling for corpus
curation (what is this document/source *about*, which terms separate a
source from the rest of the mix).

Design for 100 TB:

- The term-frequency table is keyed by (doc, term) and the document-
  frequency table by term; both are plain partial-aggregated groupBys
  (map-side combine collapses repeated tokens before the shuffle).
- The idf join runs term-keyed (hash shuffle on the term) — the
  vocabulary can be arbitrarily large, so it is never broadcast or
  collected; the corpus-size scalar N rides a broadcast crossJoin.
- Top-k per document is one row_number window keyed by the document —
  the same shuffle key the tf aggregation already used, so AQE can
  reuse the exchange.

Cross-engine exactness: the classic ``ln((N+1)/(df+1)) + 1`` damping
is NOT used because ``ln`` is only 1-ulp-accurate in both engines'
libm and would force a tolerance gate.  Instead idf is the RATIONAL
``(N + 1) / (df + 1)`` — strictly monotone decreasing in df exactly
like the log form (per-document rankings that differ only when df
differs are preserved), but computed with one correctly-rounded IEEE
division and one multiply, so Spark and DuckDB agree bit for bit and
the catalog gates the scores with a full value hash, no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` terms per document by tf·idf with rational idf
    ``(N+1)/(df+1)`` (see module docstring for why not log).

    Tokens are the shared lowered-whitespace token set
    (``functions.text.tokens`` over ``lower(text)`` — mirrored in SQL
    by the catalog's ``_LTOKENS_SQL`` macro).  Ties break by higher
    raw tf, then term ascending, so the k-set is deterministic.

    Returns (id, term, tf, df, score, rank) — rank 1-based.
    """
    if k <= 0:
        raise ValueError(f"k={k} must be positive")
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # df counts documents, not occurrences: tf is already distinct on
    # (doc, term) so a plain count per term is the document frequency
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("__n"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * ((F.col("__n") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)).cast("double")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("tf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def distinctive_terms_by_group(
    docs: DataFrame,
    group_col: str,
    text_col: str = "text",
    k: int = 5,
    min_group_tf: int = 2,
) -> DataFrame:
    """Source-level distinctive terms: pool every document of a group
    into one bag of words, then run the same rational tf·idf where
    "documents" are GROUPS (df = number of groups containing the
    term).  The corpus-curation view of "what does source X contribute
    that the others don't".

    ``min_group_tf`` drops hapax noise before ranking (a term seen
    once in one group is not a signature).  Same determinism contract
    as :func:`tfidf_top_terms`.
    """
    if k <= 0:
        raise ValueError(f"k={k} must be positive")
    toks = docs.select(
        F.col(group_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = (
        toks.groupBy(group_col, "term")
        .agg(F.count("*").alias("tf"))
        .filter(F.col("tf") >= min_group_tf)
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_groups = docs.select(F.countDistinct(group_col).alias("__n"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_groups))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * ((F.col("__n") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)).cast("double")),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col("tf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "term", "tf", "df", "score", "rank")
    )
