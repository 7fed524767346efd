"""Deterministic sampling & dataset splits (training-data pipeline
north star): train/val/test assignment, Bernoulli-by-hash sampling, and
exact-n stratified sampling.

Everything here derives randomness from md5 of a (seed, id) string, not
from an engine RNG: the same row lands in the same split on Spark, on
DuckDB, on a re-run, and after a repartition — reproducible splits are
a correctness property for training pipelines (a row that migrates from
test to train between runs silently leaks evaluation data).  Spark's
``sample``/``randomSplit`` are partition-order-dependent and engine
private, so they cannot give this guarantee.

All expressions are built-in (md5/conv/pmod) — JVM-side, no Python on
the hot path; assignment is a scan-local projection (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BUCKETS = 10_000


def hash_bucket(id_col: Column | str, seed: int = 42, buckets: int = HASH_BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from md5(seed:id) — the first 15
    hex chars parse into a 60-bit long (same recipe as the minhash
    family; mirrored in SQL as ('0x'||substring(md5(..),1,15))::BIGINT)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    digest = F.md5(F.concat(F.lit(f"{seed}:"), c.cast("string")))
    return F.conv(F.substring(digest, 1, 15), 16, 10).cast("long") % buckets


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights (must
    sum to ~1).  Assignment depends only on (seed, id): stable across
    runs, engines, and data order."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        bound = int(round(cum * HASH_BUCKETS))
        clause = F.when(bucket < bound, F.lit(name))
        expr = clause if expr is None else expr.when(bucket < bound, F.lit(name))
    expr = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: int = 42,
) -> DataFrame:
    """Bernoulli-by-hash sample: keeps the rows whose bucket falls below
    ``fraction`` of the bucket space.  Repeatable and engine-neutral,
    unlike ``DataFrame.sample``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bound = int(round(fraction * HASH_BUCKETS))
    return df.filter(hash_bucket(id_col, seed) < bound)


def stratified_exact_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (or all rows of a
    smaller stratum), chosen by hash order — a deterministic reservoir.
    One window shuffle on the strata key; the hash order makes the
    selection independent of input order and stable under reruns."""
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    order_cols: list[str],
) -> DataFrame:
    """Keep at most ``n`` rows per group, lowest ``order_cols`` first —
    the per-domain cap every crawl-derived corpus applies so one
    boilerplate-heavy domain cannot dominate training data.

    Deterministic: the kept set depends only on the ordering columns
    (pass the id for arrival-independent caps, a quality score to keep
    the best ``n``).  One window shuffle on the group key; Spark runs
    rank-limit windows with a per-partition top-n pushdown
    (WindowGroupLimit), so a million-row domain never materializes its
    full sort — only the running top ``n`` per partition survive the
    map side, the same shape a groupBy-max carries.
    """
    w = Window.partitionBy(*group_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def rebalance_by_group(
    df: DataFrame,
    group_col: str,
    keep_fractions: dict[str, float],
    id_col: str,
    seed: int = 42,
    default_fraction: float = 1.0,
) -> DataFrame:
    """Deterministic per-group Bernoulli downsampling to a target mix
    (e.g. keep 10% of web crawl, 100% of curated sources): each row's
    keep/drop depends only on (seed, id), so the rebalanced corpus is
    reproducible across engines, runs, and data order, and nested the
    same way ``deterministic_sample`` is — raising a group's fraction
    only ADDS rows, it never swaps them.  Scan-local projection +
    filter: no shuffle at any scale.
    """
    bucket = hash_bucket(id_col, seed)
    expr = None
    for g, frac in keep_fractions.items():
        bound = int(round(frac * HASH_BUCKETS))
        clause_cond = F.col(group_col) == g
        expr = (
            F.when(clause_cond, bucket < bound)
            if expr is None
            else expr.when(clause_cond, bucket < bound)
        )
    default_bound = int(round(default_fraction * HASH_BUCKETS))
    expr = (bucket < default_bound) if expr is None else expr.otherwise(bucket < default_bound)
    return df.filter(expr)


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """``deterministic_split`` keyed on the near-dup CLUSTER instead of
    the document: every member of a connected near-duplicate component
    hashes on the component's min-id representative, so near-duplicates
    can never straddle train/test — the eval-leakage hole a doc-keyed
    split leaves open (a test doc's near-copy in train inflates every
    metric).  Singleton docs key on their own id, so outside clusters
    the assignment is IDENTICAL to ``deterministic_split`` — adopting
    the safe split reshuffles only the near-dup population.

    ``pairs`` is any near-dup pair table (MinHash, SimHash, embedding);
    cluster resolution reuses ``neardup_clusters`` (raises rather than
    emitting split components).  One label join on top of the split's
    scan-local hash; labels are cluster-members-only, so the join
    broadcasts in the common sparse case.
    """
    from .clusters import neardup_clusters

    labels = neardup_clusters(pairs, id_a, id_b).withColumnRenamed("node", id_col)
    keyed = df.join(labels, id_col, "left").withColumn(
        "__split_key", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    return deterministic_split(keyed, "__split_key", weights, seed, split_col).drop(
        "__split_key", "cluster_id"
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-row weighted Bernoulli: keep a row with
    probability = its weight (clamped to [0, 1]), decided by the same
    md5 bucket as every other sampler — so quality-weighted corpus
    thinning ('keep good docs more often') is repeatable, engine-neutral
    and independent of partitioning/order, unlike a rand() filter.

    ``weight_col`` may be any numeric expression (e.g. a quality score
    scaled into [0, 1]); rows with NULL weight are dropped (an
    unevaluable keep-probability is not a keep).  Scan-local — no
    shuffle, fuses with the other row-local gates.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    p = F.least(F.greatest(w.cast("double"), F.lit(0.0)), F.lit(1.0))
    # floor, not a truncating cast: DuckDB's double->bigint CAST rounds,
    # so only an explicit floor keeps the kept set engine-identical
    return df.filter(hash_bucket(id_col, seed) < F.floor(p * HASH_BUCKETS))


def temperature_rebalance(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Temperature-smoothed source mixing (the multilingual
    alpha-sampling rule: final share of group g ∝ n_g^alpha, alpha < 1
    flattens the mix toward rare groups) realized as downsampling only:
    keep_frac_g = (n_min / n_g)^(1-alpha), so the rarest group keeps
    100% and no group is ever upsampled.  alpha=1 keeps everything;
    alpha=0 equalizes counts.

    Per-row keep/drop is the shared md5 bucket — deterministic and
    nested like every other sampler.  The group-count side is a tiny
    broadcast (one row per source); the filter itself is scan-local.

    alpha=0.5 computes via sqrt, which IEEE 754 rounds correctly in
    every engine — the keep fractions (and therefore the kept SET) are
    bit-identical cross-engine.  Other alphas go through pow(), whose
    last-bit rounding is libm-specific: at most a ~1e-4 sliver of rows
    near a bucket boundary may differ between engines — fine for
    corpus mixing, not for an exact-hash gate.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("double").alias("__n"))
    nmin = counts.agg(F.min("__n").alias("__nmin"))
    if alpha == 0.5:
        frac = F.sqrt(F.col("__nmin")) / F.sqrt(F.col("__n"))
    else:
        frac = F.pow(F.col("__nmin") / F.col("__n"), F.lit(1.0 - alpha))
    fracs = counts.crossJoin(F.broadcast(nmin)).select(
        group_col, frac.alias("__keep_frac")
    )
    bucket = hash_bucket(id_col, seed)
    return (
        df.join(F.broadcast(fracs), group_col)
        .filter(bucket < F.floor(F.col("__keep_frac") * HASH_BUCKETS))
        .drop("__keep_frac")
    )


def match_distribution(
    df: DataFrame,
    ref: DataFrame,
    bucket_col: Column | str,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Downsample ``df`` so its distribution over ``bucket_col``
    matches a REFERENCE slice's proportions — the distribution-matching
    sampler ("make the new crawl look like the curated corpus" along
    length/quality/language bins) that temperature mixing (which only
    reshapes counts per group) cannot express.

    keep_frac_b = (ref_b / cand_b) / max_b'(ref_b' / cand_b'): the
    bucket the reference over-represents most keeps 100 % and every
    other bucket thins to land EXACTLY on the reference shape in
    expectation — downsampling only, never upsampling.  Buckets absent
    from the reference drop entirely (their target share is zero);
    buckets absent from the candidate are unreachable and simply
    missing from the output.

    Per-row keep/drop is the shared md5 bucket — deterministic,
    partition-independent, nested like every sampler here.  The
    per-bucket fraction table is one tiny broadcast; the filter is
    scan-local.  Ratios divide in IEEE doubles (identical exact BIGINT
    counts in → identical fractions out, the q93 rule)."""
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    cand = df.groupBy(b.alias("__b")).agg(F.count(F.lit(1)).cast("long").alias("__nc"))
    refc = ref.groupBy(b.alias("__b")).agg(F.count(F.lit(1)).cast("long").alias("__nr"))
    ratios = cand.join(refc, "__b").withColumn(
        "__ratio", F.col("__nr").cast("double") / F.col("__nc").cast("double")
    )
    g = Window.partitionBy()
    fracs = ratios.withColumn(
        "__keep", F.col("__ratio") / F.max("__ratio").over(g)
    ).select("__b", "__keep")
    return (
        df.withColumn("__b", b)
        .join(F.broadcast(fracs), "__b")
        .filter(hash_bucket(id_col, seed) < F.floor(F.col("__keep") * HASH_BUCKETS))
        .drop("__b", "__keep")
    )


def priority_sample_topk(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str,
    weight_col: Column | str,
    seed: int = 42,
    priority_col: str = "priority",
) -> DataFrame:
    """Weighted WITHOUT-replacement top-k per stratum via PRIORITY
    SAMPLING (Duffield–Lund–Thorup): each row gets priority = w / u
    with u a per-row deterministic uniform in (0, 1], and the k
    highest-priority rows are kept — heavier rows win more often, any
    row can win (u can be tiny), and the inclusion probabilities match
    weighted sampling without replacement up to the scheme's provable
    near-optimal variance.

    Exactly reproducible cross-engine BY CONSTRUCTION: u derives from
    the shared md5 bucket ((bucket + 1) / HASH_BUCKETS, never 0), and
    priority uses only IEEE basic ops (one cast, one divide) — unlike
    the Efraimidis–Spirakis u^(1/w) key, whose pow/log round
    differently across libms and can flip near-tie ranks between
    engines.  Ties (same bucket AND same weight) break on the id.

    One rank-limit window per stratum; Spark's WindowGroupLimit keeps
    the running top-k per map partition, so a billion-row stratum
    never materializes a full sort — the ``cap_per_group`` shape.
    ``weight_col`` must be strictly positive (shift before calling)."""
    if k <= 0:
        raise ValueError(f"k={k} must be positive")
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (hash_bucket(id_col, seed) + F.lit(1)).cast("double") / F.lit(
        float(HASH_BUCKETS)
    )
    pri = wcol.cast("double") / u
    w = Window.partitionBy(*strata_cols).orderBy(
        F.col(priority_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn(priority_col, pri)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
