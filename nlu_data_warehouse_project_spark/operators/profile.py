"""Corpus profiling — the monitoring surface a large-scale training
pipeline runs alongside curation (BASELINE.json north star): per-doc
repetition signals (Gopher-style quality rules) and per-source corpus
health (volume, duplication rate, language mix).

Both are pure built-in aggregations in their scale form: tokens explode
once and aggregate with map-side combine (the array-expression
alternative re-walks the token array per statistic — higher-order
functions are interpreted, not codegen'd), fingerprints are the same
md5 the dedup family uses, so profile numbers and dedup behavior can
never disagree.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, tokens


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition: (id, n_tokens, n_distinct_tokens,
    dup_token_frac, top_token_share) for every row.

    High duplicate-token fraction / single-token dominance are the
    classic filter signals for degenerate documents (keyword stuffing,
    boilerplate loops, truncated generations).  One explode + one
    two-level aggregation; zero-token docs come back with zeros rather
    than vanishing in the explode.
    """
    # explode_outer keeps zero-token docs as one null-token row, so the
    # aggregation chain carries them through at zero instead of the old
    # distinct + restore-join (two extra shuffles); the null group is
    # excluded from every count since it only exists for empty docs
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("__t"),
    )
    tf = toks.groupBy("__id", "__t").agg(F.count("*").alias("__tf"))
    real = F.col("__t").isNotNull()
    stats = tf.groupBy("__id").agg(
        F.sum(F.when(real, F.col("__tf")).otherwise(0)).alias("n_tokens"),
        F.count(F.when(real, True)).alias("n_distinct_tokens"),
        F.max(F.when(real, F.col("__tf"))).alias("__max_tf"),
    )
    return stats.select(
        F.col("__id").alias(id_col),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("int").alias("n_distinct_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(1.0 - F.col("n_distinct_tokens") / F.col("n_tokens"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("__max_tf") / F.col("n_tokens"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("top_token_share"),
    )


def length_quantiles(
    df: DataFrame,
    by: str = "lang",
    value_col: str = "n_chars",
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    approx: bool = False,
) -> DataFrame:
    """Per-group length distribution: (by, n_docs, min/max, and one
    ``p{N}`` column per requested quantile) — the stat sheet behind
    corpus length-filter thresholds ("truncate at p99", "drop below
    p5").

    Exact quantiles (the default) sort each group once —
    ``F.percentile`` is a single hash aggregate whose per-group state
    is the value list, fine for bounded group counts (languages,
    sources).  At 100 TB with high-cardinality groups pass
    ``approx=True``: ``percentile_approx`` (t-digest-like sketch,
    mergeable map-side, constant memory per group) — same schema,
    rank error ~1/accuracy, so keep exact for oracle-checked paths.
    """
    q = F.percentile_approx if approx else F.percentile
    aggs = [
        F.count("*").alias("n_docs"),
        F.min(value_col).alias("min_len"),
        F.max(value_col).alias("max_len"),
    ] + [
        F.round(q(F.col(value_col), F.lit(p)).cast("double"), 4).alias(
            f"p{str(p)[2:].ljust(2, '0')}"
        )
        for p in probs
    ]
    return df.groupBy(by).agg(*aggs)


def corpus_profile(
    df: DataFrame,
    by: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-``by`` corpus health: (by, n_docs, n_langs, avg_chars,
    n_distinct_fp, dup_rate).

    ``dup_rate`` = 1 - distinct fingerprints / docs, using the SAME
    normalized fingerprint ``exact_dedup`` keys on — the profile
    predicts exactly what the dedup stage will remove.  Shape: one
    groupBy on the grouping key; the fingerprint md5 is computed in the
    scan.  Decimal char accumulation keeps avg_chars reproducible
    across engines/partitionings.
    """
    keyed = df.select(
        F.col(by),
        F.col(lang_col),
        F.length(F.col(text_col)).cast("decimal(25,6)").alias("__chars"),
        doc_fingerprint(text_col).alias("__fp"),
    )
    return (
        keyed.groupBy(by)
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(lang_col).alias("n_langs"),
            F.round(F.sum("__chars") / F.count("*"), 2).cast("double").alias("avg_chars"),
            F.countDistinct("__fp").alias("n_distinct_fp"),
        )
        .withColumn(
            "dup_rate", F.round(1.0 - F.col("n_distinct_fp") / F.col("n_docs"), 4)
        )
    )


def dup_ngram_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    shared_threshold: float = 0.5,
) -> DataFrame:
    """Cross-document duplicated-n-gram mass (the RefinedWeb/MassiveText
    repetition filter family, corpus-wide flavor): per document, the
    fraction of its DISTINCT word n-grams that also occur in at least
    one other document.  Boilerplate-heavy pages (navigation chrome,
    license headers, templated listings) score high and get flagged
    even when no single document pair crosses a near-dup threshold —
    this catches many-way diffuse duplication that pairwise MinHash
    misses by design.

    Returns (id, n_shingles, shared_frac, dup_heavy) with
    ``dup_heavy = shared_frac > shared_threshold``.

    Scale shape: explode is scan-local; the per-(doc, shingle) distinct
    and the shingle document-frequency count are two map-side-combined
    shuffles on the shingle key; the per-doc rollup is one more keyed
    aggregation.  The intermediate document-frequency table is the
    reusable corpus artifact — persist it when several filters consume
    it.  No Python, no cross join; skew on a viral shingle is bounded
    because the count aggregates before anything joins back.
    """
    from ..functions.text import shingles

    doc_sh = (
        df.select(F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("sh"))
        .distinct()
    )
    # document frequency per shingle, joined straight back onto the
    # exploded rows: the join key is the shuffle key already in place
    freq = doc_sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    return (
        doc_sh.join(freq, "sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.round(
                F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).cast("decimal(25,6)")
                / F.count(F.lit(1)),
                4,
            )
            .cast("double")
            .alias("shared_frac"),
        )
        .withColumn("dup_heavy", (F.col("shared_frac") > F.lit(shared_threshold)).cast("int"))
    )


def histogram_drift(
    ref: DataFrame,
    cand: DataFrame,
    group_col: str,
    bin_expr: Column,
) -> DataFrame:
    """Chi-squared-style drift score between two slices' per-group
    value histograms (the q103 computation as a reusable operator, so
    the streaming ingest loop can score each micro-batch against a
    settled reference): per group, Σ (n_cand − n_ref)² / (n_ref + 1)
    over the shared bins.  All arithmetic in DECIMAL — counts are
    exact, the one division happens at fixed scale — so the score is
    bit-identical across engines and runs.  Shape: one map-side
    combined count per slice on the tiny (group, bin) key space, one
    equi-join on it, one rollup."""

    def hist(df: DataFrame, n_col: str) -> DataFrame:
        return df.groupBy(F.col(group_col).alias("__g"), bin_expr.alias("__bin")).agg(
            F.count(F.lit(1)).cast("long").alias(n_col)
        )

    j = (
        hist(ref, "n_ref")
        .join(hist(cand, "n_cand"), ["__g", "__bin"], "full")
        .fillna(0, ["n_ref", "n_cand"])
    )
    return _drift_score_from_counts(j, group_col)


def _drift_score_from_counts(j: DataFrame, group_col: str) -> DataFrame:
    """Score a pre-counted (``__g``, ``n_ref``, ``n_cand``) frame.

    The count difference is cast to DECIMAL(19,0) BEFORE squaring
    (ADVICE r8): a BIGINT square silently wraps once |n_cand − n_ref|
    exceeds ~3.04e9, well inside the 100 TB framing.  DECIMAL(19,0)
    holds any BIGINT difference exactly and its square is exact in the
    DECIMAL(38,0) product, so per-(group,bin) diffs are now good to
    ~1e16 (diff² ≤ ~1e32 against the 38−6 integer digits of the
    division result).  The division lands at Spark's derived
    DECIMAL(38,6) — per-term HALF_UP at a fixed scale, then an exact
    decimal sum — so scores stay order-independent and cross-engine
    reproducible."""
    d = (F.col("n_cand") - F.col("n_ref")).cast("decimal(19,0)")
    term = (d * d) / (F.col("n_ref") + 1).cast("decimal(25,6)")
    return j.groupBy(F.col("__g").alias(group_col)).agg(
        F.sum("n_ref").cast("long").alias("n_ref"),
        F.sum("n_cand").cast("long").alias("n_cand"),
        F.round(F.sum(term), 4).cast("double").alias("chi2"),
    )


def rare_ngram_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max_count: int = 2,
) -> DataFrame:
    """Per-document rare-bigram rate — the counts-only twin of n-gram
    LM perplexity filtering (reference has no analog; this is the
    standard 'perplexity-proxy' gate a training-data pipeline runs
    before expensive model-based scoring).

    A document whose word bigrams are mostly corpus-rare is gibberish,
    OCR noise, or a unique-boilerplate page; a document of common
    bigrams is ordinary prose.  True LM scoring sums ``log P(w|ctx)``
    — but libm logs differ across engines in the last ulp, so the
    HASH-GATED surface is kept in exact integers: a bigram is *rare*
    when its total corpus occurrence count is <= ``rare_max_count``,
    and the score is the exact ratio ``n_rare / n_bigrams`` (one IEEE
    division at the edge).  Monotone in the same signal the log sum
    reads; deterministic everywhere.

    Two wordcount-shaped passes at 100 TB: corpus bigram counts build
    with map-side combine, and the per-doc probe is an equi-join that
    reuses the count table's hash partitioning — no all-pairs work,
    no broadcast of the (unbounded) bigram vocabulary.  Tokenization
    is the corpus convention: lowercase, alpha runs (q126/q156), edge
    empties dropped.  Docs with fewer than two tokens have no bigrams
    and are returned with ``n_bigrams = 0`` and a NULL rate.
    """
    arr = F.split(F.lower(F.col(text_col)), "[^a-z]+")
    bigrams = F.expr(
        "transform(sequence(0, size(__arr) - 2), "
        "i -> struct(__arr[i] as x, __arr[i + 1] as y))"
    )
    base = df.select(F.col(id_col), arr.alias("__arr"))
    grams = (
        base.filter(F.size("__arr") >= 2)
        .select(id_col, F.explode(bigrams).alias("b"))
        .select(id_col, F.col("b.x").alias("__x"), F.col("b.y").alias("__y"))
        .filter((F.col("__x") != "") & (F.col("__y") != ""))
    )
    counts = grams.groupBy("__x", "__y").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    per_doc = (
        grams.join(counts, ["__x", "__y"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("__c") <= rare_max_count, 1).otherwise(0))
            .cast("long")
            .alias("n_rare"),
        )
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        F.coalesce("n_rare", F.lit(0).cast("long")).alias("n_rare"),
        F.when(
            F.col("n_bigrams") > 0,
            F.round(F.col("n_rare").cast("double") / F.col("n_bigrams").cast("double"), 6),
        ).alias("rare_rate"),
    )


def with_compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """Attach the zlib compression ratio as a column (NULL for
    empty/NULL text) — the gate-composable form of
    ``compression_ratio``: the streaming corpus ingest filters on it
    scan-locally inside each micro-batch, no projection, no join."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        import zlib

        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            b = t.encode("utf-8")
            out.append(round(len(zlib.compress(b, level)) / len(b), 6) if b else None)
        return pd.Series(out)

    return df.withColumn(out_col, _ratio(F.col(text_col)))


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the classic
    low-information-content screen (Gopher/C4-era quality stacks use
    it exactly like this): near-1.0 ratios mean random/encrypted/
    already-compressed bytes, very low ratios mean degenerate
    repetition (lorem-loops, keyword stuffing); prose sits in a
    recognizable band.  Complements `repetition_stats`, which sees
    token-level repeats but is blind to sub-token/byte-level ones.

    No SQL engine exposes DEFLATE, so this is one of the sanctioned
    Python sites: an Arrow-batched pandas UDF (zlib is C-speed, the
    per-batch loop is bytes-bounded), scan-local — no shuffle, no
    state, embarrassingly parallel at any corpus size.  Level is
    pinned (and zlib output is deterministic for a given level), so
    the ratio is stable across runs and partitionings.

    Returns (id, n_bytes, n_compressed, compression_ratio) with
    ratio = compressed/raw rounded to 6; empty/NULL docs report
    NULL ratio rather than a 0-divide."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _zsize(texts: pd.Series) -> pd.Series:
        import zlib

        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            b = t.encode("utf-8")
            out.append([len(b), len(zlib.compress(b, level))])
        return pd.Series(out)

    out = df.select(
        F.col(id_col).alias("doc_id"), _zsize(F.col(text_col)).alias("__z")
    ).select(
        "doc_id",
        F.col("__z")[0].alias("n_bytes"),
        F.col("__z")[1].alias("n_compressed"),
    )
    return out.withColumn(
        "compression_ratio",
        F.when(
            F.col("n_bytes") > 0,
            F.round(F.col("n_compressed").cast("double") / F.col("n_bytes").cast("double"), 6),
        ),
    )
