"""DSIR — Data Selection via Importance Resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023 — public).  The modern curation step that picks raw-web
documents whose hashed n-gram distribution looks like a TARGET
corpus: fit two smoothed bag-of-features models (target p, raw q)
over hashed unigrams+bigrams, score every raw document with the log
importance weight  log w(x) = Σ_features [ln p̂(b) − ln q̂(b)], then
resample without replacement ∝ softmax via the Gumbel-top-k trick.

Relationship to the neighbors: `qualitymodel` (CCNet) trains a
DISCRIMINATIVE log-odds classifier on labels; DSIR is the
DISTRIBUTION-MATCHING estimator — no labels on the raw side, just a
target sample — and its output is a sampled subset, not a verdict.

Engine shape (the qualitymodel discipline, VERDICT r16 #5):
- features hash through the repo's shared 40-bit md5 recipe mod B;
- per-bucket weights round to 6 decimals into DECIMAL(25,6) so every
  per-document sum is EXACT and order-independent;
- the Gumbel noise is DETERMINISTIC — u = (h60(id) + 0.5) / 2^60,
  g = −ln(−ln u) — so the resampling itself (not just the scores)
  is a pure function of the input both engines reproduce: the whole
  pipeline hash-gates;
- training is one explode + groupBy(bucket) + a broadcast totals
  join over B rows; scoring broadcasts the B-row weight frame; the
  top-k select is a TakeOrdered, never a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(25,6)"
_HASH_SPACE = float(1 << 60)


def _bucket(feat: Column, buckets: int, salt: str) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), feat)), 1, 10), 16, 10
    ).cast("long")
    return (h % buckets).alias("bucket")


def _features(df: DataFrame, text_col: str, keep: list) -> DataFrame:
    """One row per hashed feature occurrence: unigrams AND adjacent
    bigrams (joined with one space), the paper's feature set.  Empty
    tokens are dropped before pairing, so bigrams span collapsed
    whitespace runs.  The unigram and bigram arrays CONCATENATE into
    one explode so the source scans exactly once (a uni ∪ big union
    of two selects re-scans the corpus — the winnow double-tokenize
    lesson, VERDICT r16 #2)."""
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            *keep,
            F.filter(
                F.split(F.col(text_col), " "), lambda t: t != ""
            ).alias("__ts"),
        )
    )
    kept = [c for c in toks.columns if c != "__ts"]
    bigrams = F.zip_with(
        F.slice(F.col("__ts"), 1, F.greatest(F.size("__ts") - 1, F.lit(0))),
        F.slice(F.col("__ts"), 2, F.greatest(F.size("__ts") - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return toks.select(
        *kept,
        F.explode(F.concat(F.col("__ts"), bigrams)).alias("__f"),
    )


def dsir_importance_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    buckets: int = 1024,
    alpha: float = 1.0,
    salt: str = "ds",
) -> DataFrame:
    """Fit the two hashed-feature bag models and return (bucket,
    weight) for ALL buckets 0..B-1, weight = the Laplace-smoothed
    log importance ratio

        w[b] = round(ln((ct[b]+α)/(nt+αB)) − ln((cr[b]+α)/(nr+αB)), 6)

    as DECIMAL(25,6).  ``target`` is the small in-distribution sample
    (Wikipedia/books in the paper); ``raw`` the corpus being
    selected from."""
    t_cnt = (
        _features(target, text_col, [])
        .select(_bucket(F.col("__f"), buckets, salt))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("__ct"))
    )
    r_cnt = (
        _features(raw, text_col, [])
        .select(_bucket(F.col("__f"), buckets, salt))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("__cr"))
    )
    allb = target.sparkSession.range(buckets).select(F.col("id").alias("bucket"))
    ct = F.coalesce(F.col("__ct"), F.lit(0)).cast("double")
    cr = F.coalesce(F.col("__cr"), F.lit(0)).cast("double")
    # totals as window sums over the B-row joined frame (bounded — B
    # rows, not data-sized), so the corpus-scanning count subtrees are
    # derived exactly once instead of re-entered by a separate .agg
    wall = Window.partitionBy()
    nt = F.sum(ct).over(wall)
    nr = F.sum(cr).over(wall)
    smooth = float(alpha * buckets)
    return (
        allb.join(F.broadcast(t_cnt), "bucket", "left")
        .join(F.broadcast(r_cnt), "bucket", "left")
        .select(
            "bucket",
            F.round(
                F.log((ct + alpha) / (nt + smooth))
                - F.log((cr + alpha) / (nr + smooth)),
                6,
            ).cast(_DEC).alias("weight"),
        )
    )


def dsir_scores(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    salt: str = "ds",
    gumbel_seed: int = 7,
) -> DataFrame:
    """Per-document log importance weight + the deterministic
    Gumbel-perturbed resampling key:

        log_iw     = Σ_features weight[bucket(f)]      (exact decimal)
        u          = (h60(seed:id) + 0.5) / 2^60       ∈ (0, 1)
        sample_key = round(log_iw + (−ln(−ln u)), 6)

    Taking the k largest ``sample_key`` is Gumbel-top-k sampling
    without replacement ∝ softmax(log_iw) — the paper's resampling
    step made reproducible (the noise is a pure md5 function of the
    id).  Returns (id_col, n_features, log_iw, sample_key)."""
    feats = _features(docs, text_col, [F.col(id_col).alias("__id")])
    bucketed = feats.select("__id", _bucket(F.col("__f"), buckets, salt))
    h60 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{gumbel_seed}:"), F.col(id_col).cast("string"))),
            1, 15,
        ), 16, 10,
    ).cast("long")
    u = (h60.cast("double") + 0.5) / F.lit(_HASH_SPACE)
    log_iw = F.sum("weight").cast(_DEC)
    return (
        bucketed.join(F.broadcast(weights), "bucket")
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_features"),
            log_iw.alias("log_iw"),
        )
        .withColumn(
            "sample_key",
            F.round(
                F.col("log_iw").cast("double") + (-F.log(-F.log(u))), 6
            ).cast(_DEC),
        )
    )


def dsir_select(scores: DataFrame, k: int) -> DataFrame:
    """The k documents with the largest ``sample_key`` — a
    TakeOrdered (sort + limit: Spark plans TakeOrderedAndProject, no
    global shuffle materialization, no single-partition window).
    Ties are broken by the key itself being an md5-derived decimal —
    collisions at 6 decimals are absent in practice and the oracle
    would surface one as a hash mismatch."""
    return scores.orderBy(F.col("sample_key").desc()).limit(k)
