"""Model-based quality scoring: a hashed-ngram LINEAR classifier —
the CCNet/fastText curation step (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data", LREC 2020;
Joulin et al., "Bag of Tricks for Efficient Text Classification",
EACL 2017 — both public), next to the RULE gates (Gopher, q72) and
the statistical bigram-LM score (q360) the quality suite already has.

The model is multinomial Naive Bayes over hashed token buckets — a
LINEAR scorer: train once on a labeled seed set (CCNet: Wikipedia =
good vs raw crawl = bad; here any boolean label column), producing
one log-odds weight per bucket,

    w[b] = ln((c1[b] + α) / (n1 + αB)) − ln((c0[b] + α) / (n0 + αB))

(Laplace-smoothed class-conditional log-likelihood ratio), then score
any document as  bias + Σ_tokens w[bucket(token)]  — positive means
the positive class.  Inference is the primitive a 100 TB curation
pass runs per-document; training is one grouped pass over the seed.

Engine shape — NO Python in either path:

- bucket(token) is the repo's shared md5 recipe truncated to 40 bits,
  mod B — deterministic, so two runs or two ENGINES produce identical
  weights and scores (DuckDB respells hash, ln and round verbatim:
  the whole model is hash-gateable, VERDICT r16 #5).
- weights are rounded to 6 decimals and carried as DECIMAL(25,6):
  per-document sums are then EXACT and order-independent — no
  float-summation-order hazard between engines.
- training: one explode + one groupBy(bucket) + a broadcast totals
  join over exactly B output rows.  Scoring: one explode + one
  BROADCAST join against the B-row weight frame + one groupBy(doc) —
  the weight table is the broadcast side, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(25,6)"


def _bucket(tok: Column, buckets: int, salt: str) -> Column:
    """Hashed-ngram bucket: the shared 40-bit md5 recipe mod B (the
    value is non-negative, so % needs no pmod)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), tok)), 1, 10), 16, 10
    ).cast("long")
    return (h % buckets).alias("bucket")


def _tokens(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    """One row per whitespace token (empties dropped), carrying
    ``keep`` columns."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(*keep, F.explode(F.split(F.col(text_col), " ")).alias("__tok"))
        .filter(F.col("__tok") != "")
    )


def nb_linear_weights(
    df: DataFrame,
    text_col: str,
    label_col: str,
    buckets: int = 1024,
    alpha: float = 1.0,
    salt: str = "qc",
) -> DataFrame:
    """Train the NB linear model: (bucket, weight) for ALL buckets
    0..B-1 (unseen buckets get the pure-smoothing weight, so scoring
    never meets a missing key).  ``label_col`` is boolean — true =
    positive class.  Weight = the Laplace-smoothed log-likelihood
    ratio above, rounded to 6 decimals into DECIMAL(25,6)."""
    toks = _tokens(df, text_col, [F.col(label_col).alias("__pos")])
    cnt = (
        toks.select("__pos", _bucket(F.col("__tok"), buckets, salt))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__pos"), 1).otherwise(0)).cast("long").alias("__c1"),
            F.sum(F.when(F.col("__pos"), 0).otherwise(1)).cast("long").alias("__c0"),
        )
    )
    tot = cnt.agg(
        F.sum("__c1").cast("long").alias("__n1"),
        F.sum("__c0").cast("long").alias("__n0"),
    )
    allb = df.sparkSession.range(buckets).select(F.col("id").alias("bucket"))
    c1 = F.coalesce(F.col("__c1"), F.lit(0)).cast("double")
    c0 = F.coalesce(F.col("__c0"), F.lit(0)).cast("double")
    smooth = float(alpha * buckets)
    return (
        allb.join(F.broadcast(cnt), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.log((c1 + alpha) / (F.col("__n1") + smooth))
                - F.log((c0 + alpha) / (F.col("__n0") + smooth)),
                6,
            ).cast(_DEC).alias("weight"),
        )
    )


def nb_doc_prior(df: DataFrame, text_col: str, label_col: str) -> DataFrame:
    """One-row (bias) frame: the class prior ln(d1/d0) over documents
    with non-null text, rounded into DECIMAL(25,6) like the weights."""
    return df.filter(F.col(text_col).isNotNull()).agg(
        F.round(
            F.log(F.sum(F.when(F.col(label_col), 1).otherwise(0)).cast("double"))
            - F.log(F.sum(F.when(F.col(label_col), 0).otherwise(1)).cast("double")),
            6,
        ).cast(_DEC).alias("bias")
    )


def quality_model_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int = 1024,
    salt: str = "qc",
    prior: DataFrame | None = None,
) -> DataFrame:
    """Score documents under a trained model: (id, n_tokens, log_odds,
    log_odds_per_token, predicted_pos).  ``log_odds`` = bias +
    Σ w[bucket(token)] in exact DECIMAL(25,6); ``predicted_pos`` =
    log_odds > 0 (the NB decision); the per-token mean is the
    length-normalized quality score a threshold gate filters on
    (CCNet gates on per-token perplexity for the same reason: raw
    sums scale with length).  Docs with no tokens don't score.
    ``prior`` is a one-row (bias) frame (``nb_doc_prior``); omitted =
    zero bias."""
    if prior is None:
        prior = df.sparkSession.range(1).select(
            F.lit("0").cast(_DEC).alias("bias")
        )
    toks = _tokens(df, text_col, [F.col(id_col).alias("id")])
    bucketed = toks.select("id", _bucket(F.col("__tok"), buckets, salt))
    log_odds = (F.first("bias") + F.sum("weight")).cast(_DEC)
    return (
        bucketed.join(F.broadcast(weights), "bucket")
        .crossJoin(F.broadcast(prior))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            log_odds.alias("log_odds"),
            (log_odds / F.count(F.lit(1)).cast(_DEC)).cast(_DEC)
            .alias("log_odds_per_token"),
            (log_odds > 0).alias("predicted_pos"),
        )
    )
