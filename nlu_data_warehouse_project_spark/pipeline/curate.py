"""End-to-end corpus curation — the canonical LLM training-data pass,
composed from the engine's operator families (BASELINE.json north
star): quality gate -> exact dedup -> near-dup cluster dedup -> PII
redaction -> deterministic split.

Each stage is the library operator, not a reimplementation, so the
chain inherits their scale shapes: the quality gate is a scan-local
filter (pushes ahead of everything), exact dedup is one window shuffle
on the fingerprint, near-dup clustering runs LSH candidate generation +
connected components on the already-thinned survivors, redaction is
codegen'd regexp chains, and the split is a scan-local md5 bucket.
Order matters at 100 TB: cheap row-local filters first so the
shuffling stages see the smallest possible corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import punct_ratio, redact_pii, token_count
from ..operators.clusters import dedup_by_clusters
from ..operators.dedup import benchmark_contamination, exact_dedup, minhash_candidate_pairs
from ..operators.sampling import deterministic_split


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_punct: float = 0.2,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int | None = 1000,
    benchmark: DataFrame | None = None,
    split_weights: dict[str, float] | None = None,
    seed: int = 42,
    gopher_rules: bool = False,
    flagged_words: list[str] | None = None,
    line_dedup_max_df: int | None = None,
    embeddings: DataFrame | None = None,
    embedding_col: str = "embedding",
    semantic_k: int = 8,
    semantic_threshold: float = 0.95,
    quality_model: DataFrame | None = None,
    quality_model_prior: DataFrame | None = None,
    quality_model_buckets: int = 1024,
    quality_min_log_odds_per_token: float = 0.0,
) -> DataFrame:
    """Returns the curated corpus at document grain: the input columns
    plus ``redacted`` (scrubbed text) and ``split``.  Deterministic end
    to end — rerunning (or re-partitioning) reproduces the same kept
    set, cluster representatives, and split assignment.

    ``max_bucket_size`` caps pathological LSH buckets in the near-dup
    stage (a boilerplate flood collapsing onto one band signature
    expands to B²/2 candidate pairs; at corpus scale one such bucket
    stalls its task forever).  The default is deliberately ON — an
    end-to-end curation pass must not be one templated-crawl away from
    a pair explosion; pass ``None`` to disable the cap."""
    weights = split_weights or {"train": 0.8, "val": 0.1, "test": 0.1}

    # 0. cross-document line dedup (optional) — RefinedWeb ordering:
    #    boilerplate lines are struck BEFORE anything fingerprints or
    #    gates, so a navbar can neither glue unrelated docs into one
    #    near-dup cluster nor carry a junk page past the length gate.
    #    Costs two extra keyed shuffles; enable for crawl-shaped input.
    if line_dedup_max_df is not None:
        from ..operators.cleanse import dedup_lines

        cleaned = dedup_lines(df, text_col, id_col, max_doc_frequency=line_dedup_max_df)
        df = (
            df.drop(text_col)
            .join(cleaned.select(id_col, "text"), id_col)
            .withColumnRenamed("text", text_col)
        )

    # 1. quality gate — row-local, runs at the scan.  gopher_rules=True
    #    additionally applies the published Gopher rule thresholds
    #    (functions.text.gopher_quality_gate) in the same scan-local
    #    pass — still zero shuffles before dedup.
    gated = df.filter(
        (token_count(text_col) >= min_tokens) & (punct_ratio(text_col) < max_punct)
    )
    if gopher_rules:
        from ..functions.text import gopher_quality_gate

        gated = gated.filter(gopher_quality_gate(text_col, min_words=min_tokens))
    #    flagged_words adds the C4-style word-list safety gate in the
    #    same scan-local pass (whole-token matching; zero-tolerance)
    if flagged_words is not None:
        from ..functions.text import content_safety_gate

        gated = gated.filter(content_safety_gate(text_col, flagged_words))
    # 1.25 LEARNED quality gate (optional) — CCNet-style NB linear
    #      model (operators.qualitymodel): caller passes a TRAINED
    #      (bucket, weight) frame; docs scoring under the per-token
    #      log-odds floor are dropped.  Costs one explode + a
    #      broadcast join against the B-row weight table — heavier
    #      than the row-local rules above (hence after them), still
    #      far ahead of the shuffling dedup stages.
    if quality_model is not None:
        from ..operators.qualitymodel import quality_model_score

        passing = quality_model_score(
            gated, quality_model, text_col, id_col,
            buckets=quality_model_buckets, prior=quality_model_prior,
        ).filter(
            F.col("log_odds_per_token") >= quality_min_log_odds_per_token
        ).select(F.col("id").alias(id_col))
        gated = gated.join(passing, id_col, "left_semi")
    # 1.5 benchmark decontamination (optional) — broadcast probe against
    #     the eval-set shingles; runs BEFORE dedup so a clean duplicate
    #     of a contaminated doc can still survive as the group's keeper
    if benchmark is not None:
        flags = benchmark_contamination(
            gated, benchmark, text_col, id_col, shingle_n=shingle_n
        ).filter(F.col("contaminated"))
        gated = gated.join(flags.select(id_col), id_col, "left_anti")
    # 2. exact dedup — one window shuffle on the content fingerprint
    exact = exact_dedup(gated, text_col, id_col)
    # 3. near-dup cluster dedup — LSH pairs + connected components on
    #    the survivors only, keep the min-id representative per cluster
    pairs = minhash_candidate_pairs(
        exact, text_col, id_col, num_hashes, bands, shingle_n, max_bucket_size=max_bucket_size
    )
    kept = dedup_by_clusters(exact, pairs, id_col)
    # 3.5 semantic dedup (optional) — SemDeDup over a caller-supplied
    #     embedding table keyed by id_col: paraphrase-level copies the
    #     text-shingle stages can't see.  Runs on the near-dup
    #     SURVIVORS only (the cheapest point), and docs WITHOUT an
    #     embedding pass through untouched — a partially-embedded
    #     corpus must not silently lose its unembedded tail.
    if embeddings is not None:
        from ..operators.dedup import semantic_prune

        scoped = kept.select(id_col).join(
            embeddings.select(id_col, embedding_col), id_col
        )
        pruned = semantic_prune(
            scoped, vec_col=embedding_col, id_col=id_col,
            k=semantic_k, threshold=semantic_threshold,
        ).select(id_col)
        has_emb = kept.join(embeddings.select(id_col), id_col, "left_semi")
        no_emb = kept.join(embeddings.select(id_col), id_col, "left_anti")
        kept = has_emb.join(pruned, id_col, "left_semi").unionByName(no_emb)
    # 4. PII redaction — codegen'd regexp chain
    red = kept.withColumn("redacted", redact_pii(text_col))
    # 5. deterministic split — scan-local md5 bucket
    return deterministic_split(red, id_col, weights, seed=seed)
