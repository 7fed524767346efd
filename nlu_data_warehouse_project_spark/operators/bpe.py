"""BPE (byte-pair-encoding) merge induction — learning a subword
vocabulary from a corpus, the tokenizer-training half of an LLM data
pipeline (Sennrich et al. 2016, word-level variant).

Each round: (1) count adjacent symbol pairs across the corpus,
weighted by word frequency; (2) take the most frequent pair
(deterministic tiebreak: count desc, then left asc, right asc);
(3) rewrite every word's symbol sequence merging that pair
left-to-right non-overlapping.

Scale shape:

- The corpus collapses to the WORD FREQUENCY table first (one
  groupBy) — all later rounds run over distinct words, not documents;
  at 100 TB the vocabulary is millions of rows while the corpus is
  trillions, so this is the only scan of the raw data.
- Pair counting is explode + sum with map-side combine; the argmax is
  an orderBy(...).limit(1) — a rank-limit the planner executes as a
  per-partition top-1 + single-row reduce, and the ONE collected row
  per round is bounded metadata (the same exception as centroids and
  control rows).
- The merge rewrite is a sequential left-to-right fold WITHIN each
  word — but word symbol arrays are short, so it stays JVM-side as a
  built-in ``F.aggregate`` lambda (pending-slot automaton: emit /
  hold / merge), NOT a Python UDF.  ``localCheckpoint`` between
  rounds cuts the lineage like the PageRank loop does.

Determinism: counts are integers, the tiebreak is total, and the
fold automaton is exactly the reference algorithm — the catalog gates
the learned merge table against a pure-Python recompute (the same
PYTHON_GATES machinery as q223; BPE has no SQL spelling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens


def _merge_fold(syms, left: str, right: str):
    """Left-to-right non-overlapping merge of adjacent (left, right)
    into one symbol, as a built-in aggregate fold: the accumulator is
    (emitted-array, pending-symbol); each step either starts a
    pending, completes a merge, or flushes the pending and holds the
    current symbol."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, x):
        return (
            F.when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), x.alias("pend")),
            )
            .when(
                (acc["pend"] == F.lit(left)) & (x == F.lit(right)),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    x.alias("pend"),
                )
            )
        )

    def finish(acc):
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(syms, init, step, finish)


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn up to ``num_merges`` BPE merges from the corpus; stops
    early when the best remaining pair falls below ``min_pair_count``.
    Initial symbols are single characters of the lowered whitespace
    tokens (no end-of-word marker — a documented simplification; add
    one upstream by suffixing tokens if boundary-aware merges are
    wanted).

    Returns a DataFrame (merge_round, left, right, pair_count) —
    ``merge_round`` 0-based in learning order.  The frame is
    driver-assembled from the per-round argmax rows (bounded:
    ``num_merges`` rows).
    """
    if num_merges < 1:
        raise ValueError(f"num_merges={num_merges} must be >= 1")
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("__w"))
        .groupBy("__w")
        .agg(F.count("*").alias("__freq"))
        .select("__freq", F.split("__w", "").alias("__syms"))
    )
    cur = words.localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(num_merges):
        pairs = cur.select(
            "__freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("__syms"), 1, F.size("__syms") - 1),
                    F.slice(F.col("__syms"), 2, F.size("__syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("__p"),
        )
        top = (
            pairs.groupBy(F.col("__p.l").alias("l"), F.col("__p.r").alias("r"))
            .agg(F.sum("__freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rnd, left, right, cnt))
        cur = cur.withColumn(
            "__syms", _merge_fold(F.col("__syms"), left, right)
        ).localCheckpoint(eager=False)

    return spark.createDataFrame(
        merges, "merge_round int, left string, right string, pair_count bigint"
    )


def bpe_segment_stats(
    docs: DataFrame,
    group_col: str,
    text_col: str = "text",
    num_merges: int = 8,
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn BPE merges on the corpus, APPLY them, and report per-group
    tokenizer statistics — the "how well does the learned vocabulary
    compress each source" view that decides whether a tokenizer suits
    a data mix.

    Returns per group: ``n_words`` (token occurrences), ``n_chars``
    (symbols before any merge), ``n_bpe_tokens`` (symbols after all
    merges), ``compression`` = n_chars / n_bpe_tokens (exact integer
    counts, one IEEE divide).  Application is the same JVM-side fold
    as training, chained once per merge over the (group, word,
    frequency) table — the corpus is scanned once per side (learn /
    apply), everything else runs on distinct words."""
    merges_df = learn_bpe_merges(docs, text_col, num_merges, min_pair_count)
    merges = [(r["left"], r["right"]) for r in merges_df.collect()]  # bounded rows
    words = (
        docs.select(
            F.col(group_col).alias("__g"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("__w"),
        )
        .groupBy("__g", "__w")
        .agg(F.count("*").alias("__freq"))
        .select("__g", "__w", "__freq", F.split("__w", "").alias("__syms"))
    )
    cur = words.localCheckpoint(eager=False)
    for left, right in merges:
        cur = cur.withColumn(
            "__syms", _merge_fold(F.col("__syms"), left, right)
        ).localCheckpoint(eager=False)
    return cur.groupBy(F.col("__g").alias(group_col)).agg(
        F.sum("__freq").alias("n_words"),
        F.sum(F.col("__freq") * F.length("__w")).alias("n_chars"),
        F.sum(F.col("__freq") * F.size("__syms")).alias("n_bpe_tokens"),
        (
            F.sum(F.col("__freq") * F.length("__w")).cast("double")
            / F.sum(F.col("__freq") * F.size("__syms")).cast("double")
        ).alias("compression"),
    )
