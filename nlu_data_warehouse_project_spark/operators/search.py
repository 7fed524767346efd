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


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 (Robertson & Spärck Jones lineage; the Lucene
    ``+1``-inside-the-log idf variant, so idf is always positive) of a
    bag-of-terms query against every document — THE retrieval-scoring
    primitive a curation pipeline uses to pull topical slices out of a
    100 TB corpus (and the classical baseline ANN results are judged
    against).  Returns (id, n_terms_matched, score) for documents
    matching at least one term.

        idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)
        contrib(t)  = idf * tf * (k1+1) / (tf + k1 * (1 - b + b*dl/avgdl))
        score(d)    = Σ_t round(contrib, 6)            -- DECIMAL(25,6)

    Each term's contribution is rounded to 6 decimals into
    DECIMAL(25,6) BEFORE the per-document sum, so the sum is exact and
    order-independent — the hash-gate discipline (a raw double sum
    over shuffled rows is not reproducible cross-engine).

    Shape: one tokenize; doc lengths and (N, avgdl) are one grouped
    pass + a broadcast scalar; term frequencies filter to the query
    terms BEFORE any shuffle (the selective slice reaches the scan);
    df and idf live on a |terms|-row frame that BROADCASTS into the
    contribution join.  Nothing corpus-sized is ever collected or
    broadcast."""
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    toks = docs.select(
        F.col(id_col).alias("__d"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("__t"),
    )
    dl = toks.groupBy("__d").agg(F.count(F.lit(1)).cast("long").alias("__dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        (F.sum("__dl").cast("double") / F.count(F.lit(1))).alias("__avgdl"),
    )
    tf = (
        toks.filter(F.col("__t").isin([t.lower() for t in terms]))
        .groupBy("__d", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    df = tf.groupBy("__t").agg(F.count(F.lit(1)).cast("long").alias("__df"))
    idf = F.log(
        (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    denom = F.col("__tf") + k1 * (
        1.0 - b + b * F.col("__dl") / F.col("__avgdl")
    )
    contrib = (
        tf.join(F.broadcast(df), "__t")
        .join(dl, "__d")
        .crossJoin(F.broadcast(stats))
        .select(
            "__d",
            F.round(idf * F.col("__tf") * (k1 + 1.0) / denom, 6)
            .cast("decimal(25,6)").alias("__c"),
        )
    )
    return contrib.groupBy(F.col("__d").alias(id_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        F.sum("__c").cast("decimal(25,6)").alias("score"),
    )
