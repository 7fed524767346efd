"""Exact edit-distance-1 fuzzy join without all-pairs — SymSpell-style
deletion-neighborhood blocking.

The entity-resolution primitive (near-identical names, typo'd URLs,
OCR'd titles) is "find every pair of strings within Levenshtein
distance 1".  The naive spelling is an O(n²) cross join — the one
shape this engine bans.  The public SymSpell observation makes it a
plain equi-join: two strings are within edit distance 1 **iff** their
1-deletion neighborhoods (the string itself plus every string obtained
by deleting one character) intersect:

- substitution at position i:  del_i(a) == del_i(b)
- insertion / deletion:        a == del_i(b)  (a is in its own
  neighborhood at deletion-distance 0)
- equality:                    excluded by requiring distinct ids

So each row emits len+1 keys (built-in ``transform`` over a position
``sequence`` — no Python in the plan), the join is a hash equi-join on
the variant key, and a final built-in ``levenshtein`` filter kills the
false positives the neighborhood superset admits (e.g. two different
substitutions at the same position).  Cost is O(n·L) emitted keys and
hash-partitioned candidates, never O(n²) — the 100 TB shape.

Correctness gate: the DuckDB oracle brute-forces the quadratic join
with its own ``levenshtein`` — a genuinely different algorithm
arriving at the same answer, which is exactly what an oracle should
be (the blocking recall proof is checked, not assumed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fanout_partitions(df: DataFrame) -> int:
    """Partition count for a fan-out self-join.  AQE sizes post-shuffle
    partitions by the SHUFFLE INPUT (a few MB of keys here) and happily
    coalesces to 1 — then the join EXPLODES each input row into
    hundreds of candidates and the whole verify stage runs on one
    core (measured 3x slower at sf0.1).  An explicit repartition on
    the join key pins the parallelism AQE can't see the need for."""
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))


def edit1_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
) -> DataFrame:
    """All unordered pairs of rows whose ``key_col`` strings are within
    Levenshtein distance 1 (and not byte-equal — exact-dup pairs are
    `operators.dedup`'s job).  Returns (a_id, b_id, a_key, b_key,
    distance) with a_id < b_id, each pair exactly once.

    Rows must be unique on ``id_col``.  NULL / empty keys are dropped
    (an empty string is distance-1 from every single char — a
    degenerate hub that would recreate the quadratic blowup the
    blocking exists to avoid; callers who want it filter upstream).
    """
    base = (
        df.select(F.col(id_col).alias("__id"), F.col(key_col).alias("__key"))
        .filter(F.col("__key").isNotNull() & (F.length("__key") > 0))
    )
    # the string itself + every 1-deletion variant, exploded to keys
    variants = base.select(
        "__id",
        "__key",
        F.explode(
            F.concat(
                F.array(F.col("__key")),
                F.transform(
                    F.sequence(F.lit(1), F.length("__key")),
                    lambda i: F.concat(
                        F.substring(F.col("__key"), F.lit(1), i - F.lit(1)),
                        F.col("__key").substr(i + F.lit(1), F.length("__key")),
                    ),
                ),
            )
        ).alias("__v"),
    ).distinct()  # a string can repeat a variant (e.g. "aa" deleting either a)
    variants = variants.repartition(_fanout_partitions(df), "__v")
    left = variants
    right = variants.select(
        F.col("__id").alias("__id_r"), F.col("__key").alias("__key_r"), "__v"
    )
    cand = (
        left.join(right, "__v")
        .filter(F.col("__id") < F.col("__id_r"))
        .select(
            F.col("__id").alias("a_id"),
            F.col("__id_r").alias("b_id"),
            F.col("__key").alias("a_key"),
            F.col("__key_r").alias("b_key"),
        )
        .distinct()  # a pair can meet on several shared variants
    )
    return (
        cand.withColumn("distance", F.levenshtein("a_key", "b_key"))
        .filter((F.col("distance") == 1))
        .select("a_id", "b_id", "a_key", "b_key", "distance")
    )


def edit_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """``edit1_pairs`` generalized to Levenshtein distance <= 2
    (VERDICT r14 #5): all unordered pairs with ``1 <= distance <=
    max_distance``, same schema (a_id, b_id, a_key, b_key, distance).

    SymSpell's deletion-neighborhood algebra extends to depth d: if
    lev(a, b) <= d, take an optimal alignment and delete from each
    string the characters the alignment does NOT match — at most d
    deletions per side — leaving the same matched subsequence, so the
    depth-d deletion neighborhoods intersect.  Each row therefore
    emits its <=d-deletion variants (depth 0, 1 and, for d=2, every
    unordered position pair), the candidate step is a hash equi-join
    on the variant key, and the built-in ``levenshtein`` filter
    removes the superset's false positives exactly.

    FAN-OUT BOUND: a length-L string emits 1 + L keys at d=1 and
    1 + L + L*(L-1)/2 at d=2 — O(n*L^2/2) join keys total (~200 keys
    for L=20).  That is the price of exactness on SHORT keys (names,
    titles, SKUs); for long or multi-token strings use
    ``token_blocked_pairs``, which blocks on token prefixes instead of
    character deletions.  Cost stays hash-partitioned, never O(n^2).
    """
    if max_distance not in (1, 2):
        raise ValueError(
            f"max_distance={max_distance}: depth-{max_distance} deletion "
            "neighborhoods are exact only for 1 and 2 here (d>=3 fan-out "
            "is L^3/6 keys per row — block on tokens instead)"
        )
    base = (
        df.select(F.col(id_col).alias("__id"), F.col(key_col).alias("__key"))
        .filter(F.col("__key").isNotNull() & (F.length("__key") > 0))
    )
    key = F.col("__key")
    ln = F.length("__key")

    def del1(s, i, slen):
        # drop 1-based position i from s (slen = length(s) column)
        return F.concat(
            F.substring(s, F.lit(1), i - F.lit(1)),
            s.substr(i + F.lit(1), slen),
        )

    variants = [F.array(key), F.transform(F.sequence(F.lit(1), ln), lambda i: del1(key, i, ln))]
    if max_distance >= 2:
        # delete positions i < j: drop j first (so i's offset is
        # unshifted), i.e. concat of s[1..i-1], s[i+1..j-1], s[j+1..]
        # — guarded to length >= 2 because sequence(1, 0) DESCENDS
        variants.append(
            F.when(
                ln >= 2,
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), ln - F.lit(1)),
                        lambda i: F.transform(
                            F.sequence(i + F.lit(1), ln),
                            lambda j: F.concat(
                                F.substring(key, F.lit(1), i - F.lit(1)),
                                key.substr(i + F.lit(1), j - i - F.lit(1)),
                                key.substr(j + F.lit(1), ln),
                            ),
                        ),
                    )
                ),
            ).otherwise(F.array())
        )
    keyed = base.select(
        "__id", "__key", F.explode(F.concat(*variants)).alias("__v")
    ).distinct()  # depth-1/2 variants can coincide (repeated chars)
    keyed = keyed.repartition(_fanout_partitions(df), "__v")
    right = keyed.select(
        F.col("__id").alias("__id_r"), F.col("__key").alias("__key_r"), "__v"
    )
    cand = (
        keyed.join(right, "__v")
        .filter(F.col("__id") < F.col("__id_r"))
        .select(
            F.col("__id").alias("a_id"),
            F.col("__id_r").alias("b_id"),
            F.col("__key").alias("a_key"),
            F.col("__key_r").alias("b_key"),
        )
        .distinct()  # a pair meets on many shared variants
    )
    return (
        cand.withColumn("distance", F.levenshtein("a_key", "b_key"))
        .filter(
            (F.col("distance") >= 1) & (F.col("distance") <= max_distance)
        )
        .select("a_id", "b_id", "a_key", "b_key", "distance")
    )


def token_blocked_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    threshold: float = 0.5,
    token_pattern: str = r"\s+",
) -> DataFrame:
    """Multi-token entity resolution (VERDICT r14 #5): all unordered
    pairs whose TOKEN-SET Jaccard >= ``threshold`` — the right
    primitive when "Acme Global Logistics" / "Acme Logistics Global"
    must match (word order and character edits are the wrong model).
    Returns (a_id, b_id, a_name, b_name, jaccard).

    EXACT blocking via the AllPairs/PPJoin prefix filter (Bayardo,
    Ma & Srikant, "Scaling Up All Pairs Similarity Search", WWW'07 —
    public):  order every token by global document frequency
    ascending (rarest first, ties by token), and give each record a
    PREFIX of its first ``|A| - ceil(t*|A|) + 1`` tokens in that
    order.  Two sets with Jaccard >= t must overlap in >= ceil(t*|A|)
    tokens, so B cannot dodge A's prefix — any qualifying pair shares
    a token in BOTH prefixes, making the candidate step a hash
    equi-join on prefix tokens (rare tokens, so buckets stay small by
    construction).  Candidates then pass a size filter
    (t*|A| <= |B| <= |A|/t) and the EXACT Jaccard computed with
    built-in array intersection — no recall loss anywhere; the
    quadratic token-Jaccard oracle gates it.

    SCALE SHAPE: emitted keys <= (1-t)*|A|+1 per record (2 tokens per
    record at t=0.5 on 3-token names); candidate volume is bounded by
    the square of each RARE token's frequency, the quantity the
    frequency-ascending prefix order minimizes.  All built-ins — no
    Python in the plan."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold={threshold} must be in (0, 1]")
    base = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(name_col).alias("__name"),
            F.array_distinct(
                F.split(F.trim(F.col(name_col)), token_pattern)
            ).alias("__toks"),
        )
        .filter(F.col("__name").isNotNull() & (F.size("__toks") > 0))
        .withColumn("__n", F.size("__toks"))
    )
    toks = base.select(
        "__id", "__name", "__n", "__toks", F.explode("__toks").alias("__t")
    )
    freq = toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    from pyspark.sql import Window

    # global order: rarest token first (ties broken by the token
    # itself so the order is total and deterministic)
    rn = F.row_number().over(
        Window.partitionBy("__id").orderBy("__df", "__t")
    )
    # ceil nudged by -1e-9: float roundup above a true integer would
    # SHORTEN the prefix (a recall bug); the nudge only ever lengthens.
    # Name and token array ride along so candidates verify WITHOUT a
    # join back to the base frame (arrays are token-set sized — tens
    # of bytes — and two fewer shuffle joins beats the payload)
    prefix = (
        toks.join(freq, "__t")
        .withColumn("__rn", rn)
        .filter(
            F.col("__rn")
            <= F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n") - F.lit(1e-9)) + 1
        )
        .select("__id", "__name", "__n", "__toks", "__t")
    ).repartition(_fanout_partitions(df), "__t")
    right = prefix.select(
        F.col("__id").alias("__id_r"), F.col("__name").alias("__name_r"),
        F.col("__n").alias("__n_r"), F.col("__toks").alias("__toks_r"), "__t",
    )
    cand = (
        prefix.join(right, "__t")
        .filter(
            (F.col("__id") < F.col("__id_r"))
            # Jaccard >= t is impossible outside t*|A| <= |B| <= |A|/t
            & (F.col("__n_r") * F.lit(threshold) <= F.col("__n"))
            & (F.col("__n") * F.lit(threshold) <= F.col("__n_r"))
        )
    )
    return (
        cand.withColumn(
            "jaccard",
            F.size(F.array_intersect("__toks", "__toks_r"))
            / F.size(F.array_union("__toks", "__toks_r")).cast("double"),
        )
        # verify BEFORE deduplicating multi-token meetings: duplicates
        # of one pair share a jaccard, so filtering first shrinks the
        # dedup shuffle to qualifying pairs only
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("__id").alias("a_id"), F.col("__id_r").alias("b_id"),
            F.col("__name").alias("a_name"), F.col("__name_r").alias("b_name"),
            "jaccard",
        )
        .dropDuplicates(["a_id", "b_id"])
    )


def token_blocked_pairs_bipartite(
    new_df: DataFrame,
    old_df: DataFrame,
    name_col: str,
    id_col: str,
    threshold: float = 0.5,
    token_pattern: str = r"\s+",
    old_index: tuple | None = None,
) -> DataFrame:
    """``token_blocked_pairs`` between TWO corpora: every (new, old)
    pair with token-set Jaccard >= ``threshold``, never pairing old
    with old — the incremental-ER probe shape (VERDICT r15 #4), where
    a daily batch blocks against the standing corpus without paying
    the standing corpus's quadratic self-join again.

    Returns (new_id, old_id, new_name, old_name, jaccard).

    The prefix filter stays EXACT across two corpora as long as both
    sides' prefixes are taken under the SAME total token order (the
    WWW'07 theorem never references where the order came from, only
    that it is shared): token document frequency is computed over the
    UNION of the two name sets — one narrow pass over names, paid
    instead of the old-old candidate space.  A production deployment
    keeps that frequency table and the old side's prefix keys as a
    persisted index updated per batch (the ``bloomindex``/
    ``minhashindex`` sync discipline), so the standing corpus is read,
    not re-keyed; the algebra here is identical either way, and exact
    Jaccard verification makes the OUTPUT independent of the chosen
    order regardless (the order only steers candidate volume)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold={threshold} must be in (0, 1]")

    def prep(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(f"__id{tag}"),
                F.col(name_col).alias(f"__name{tag}"),
                F.array_distinct(
                    F.split(F.trim(F.col(name_col)), token_pattern)
                ).alias(f"__toks{tag}"),
            )
            .filter(
                F.col(f"__name{tag}").isNotNull() & (F.size(f"__toks{tag}") > 0)
            )
            .withColumn(f"__n{tag}", F.size(f"__toks{tag}"))
        )

    new_b = prep(new_df, "")
    if old_index is not None:
        freq, old_prefix = old_index
    else:
        old_b = prep(old_df, "_r")
        freq = (
            new_b.select(F.explode("__toks").alias("__t"))
            .unionByName(old_b.select(F.explode("__toks_r").alias("__t")))
            .groupBy("__t")
            .agg(F.count(F.lit(1)).alias("__df"))
        )
    from pyspark.sql import Window

    def prefix(df: DataFrame, tag: str) -> DataFrame:
        toks = df.select("*", F.explode(f"__toks{tag}").alias("__t"))
        rn = F.row_number().over(
            Window.partitionBy(f"__id{tag}").orderBy("__df", "__t")
        )
        # left join + df 0 for tokens outside the (frozen) vocabulary:
        # unseen-in-index tokens rank rarest, which is both a valid
        # total order (ties by token) and the right candidate shape
        return (
            toks.join(freq, "__t", "left")
            .withColumn("__df", F.coalesce("__df", F.lit(0)))
            .withColumn("__rn", rn)
            .filter(
                F.col("__rn")
                <= F.col(f"__n{tag}")
                - F.ceil(F.lit(threshold) * F.col(f"__n{tag}") - F.lit(1e-9))
                + 1
            )
            .drop("__rn", "__df")
        )

    parts = _fanout_partitions(new_df)
    right_keys = old_prefix if old_index is not None else prefix(old_b, "_r")
    cand = (
        prefix(new_b, "").repartition(parts, "__t")
        .join(right_keys, "__t")
        .filter(
            (F.col("__n_r") * F.lit(threshold) <= F.col("__n"))
            & (F.col("__n") * F.lit(threshold) <= F.col("__n_r"))
        )
    )
    return (
        cand.withColumn(
            "jaccard",
            F.size(F.array_intersect("__toks", "__toks_r"))
            / F.size(F.array_union("__toks", "__toks_r")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("__id").alias("new_id"), F.col("__id_r").alias("old_id"),
            F.col("__name").alias("new_name"), F.col("__name_r").alias("old_name"),
            "jaccard",
        )
        .dropDuplicates(["new_id", "old_id"])
    )


def golden_records_incremental(
    old_labels: DataFrame,
    old_docs: DataFrame,
    new_docs: DataFrame,
    name_col: str,
    id_col: str,
    threshold: float = 0.5,
    max_iters: int = 25,
    reliable: bool | None = None,
    old_index: tuple | None = None,
) -> DataFrame:
    """Incremental golden-record maintenance (VERDICT r15 #4): fold a
    NEW batch into standing entity clusters WITHOUT re-running the
    standing corpus's blocking self-join, yet BIT-EQUAL to the full
    batch recompute (``token_blocked_pairs`` + ``neardup_clusters``
    over old ∪ new) — the q368 capstone's daily form.

    ``old_labels`` is the prior run's (node, cluster_id) frame.  The
    equivalence rests on one graph identity: connected components are
    determined by connectivity alone, and a previously-computed
    component is EXACTLY summarized by its STAR (every member ->
    min-label edge) — so

        CC(E_old ∪ E_new-old ∪ E_new-new)
          == CC(star(CC(E_old)) ∪ E_new-old ∪ E_new-new)

    with identical min labels (the star preserves each old component's
    member set, hence its minimum).  New-bridges-old merges, two old
    clusters fused by one new doc, and brand-new clusters all fall out
    of the CC over the reduced edge set.  Work per batch: the new
    batch's self-join + the bipartite probe + CC over (star + new
    edges) — the standing corpus's O(old²/blocking) candidate space is
    never re-entered, which at 100 TB is the entire cost.

    Property-tested bit-equal to the batch recompute (the streaming-
    KMV sidecar discipline); the catalog gates the query spelling
    against the full-batch recursive-CTE oracle over the union."""
    from .clusters import neardup_clusters

    nn = token_blocked_pairs(new_docs, name_col, id_col, threshold)
    no = token_blocked_pairs_bipartite(
        new_docs, old_docs, name_col, id_col, threshold,
        old_index=old_index,
    )
    star = (
        old_labels.filter(F.col("node") != F.col("cluster_id"))
        .select(F.col("node").alias("a_id"), F.col("cluster_id").alias("b_id"))
    )
    edges = (
        nn.select("a_id", "b_id")
        .unionByName(no.select(F.col("new_id").alias("a_id"),
                               F.col("old_id").alias("b_id")))
        .unionByName(star)
    )
    return neardup_clusters(edges, id_a="a_id", id_b="b_id",
                            max_iters=max_iters, reliable=reliable)


def build_token_prefix_index(
    df: DataFrame,
    name_col: str,
    id_col: str,
    threshold: float = 0.5,
    token_pattern: str = r"\s+",
) -> tuple:
    """The standing corpus's PROBE INDEX for incremental ER: a frozen
    token-frequency table (the shared total order every future batch
    keys under) and the corpus's prefix keys, both ready to persist
    (parquet / TxTable) and reuse batch after batch — the
    ``bloomindex``/``minhashindex`` sync discipline.

    Returns ``(freq, prefix)`` for ``token_blocked_pairs_bipartite``'s
    ``old_index=``.  Appending a resolved batch to the index =
    computing the batch's prefix keys UNDER THE SAME FROZEN freq (the
    order must never drift mid-epoch — recall needs one shared total
    order) and unioning them in; refresh the freq table only at epoch
    boundaries, rebuilding prefixes with it."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold={threshold} must be in (0, 1]")
    base = (
        df.select(
            F.col(id_col).alias("__id_r"),
            F.col(name_col).alias("__name_r"),
            F.array_distinct(
                F.split(F.trim(F.col(name_col)), token_pattern)
            ).alias("__toks_r"),
        )
        .filter(F.col("__name_r").isNotNull() & (F.size("__toks_r") > 0))
        .withColumn("__n_r", F.size("__toks_r"))
    )
    freq = (
        base.select(F.explode("__toks_r").alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    return freq, token_prefix_keys(df, freq, name_col, id_col,
                                   threshold, token_pattern)


def token_prefix_keys(
    df: DataFrame,
    freq: DataFrame,
    name_col: str,
    id_col: str,
    threshold: float = 0.5,
    token_pattern: str = r"\s+",
) -> DataFrame:
    """Prefix keys for ``df`` under an EXISTING (frozen) token order —
    the index-APPEND primitive: once a batch is resolved, its keys
    (computed under the SAME freq table every prior batch used) union
    into the standing prefix index, so the shared-total-order
    requirement of the WWW'07 filter holds across the whole epoch.
    Tokens outside the frozen vocabulary rank rarest (df 0, ties by
    token).  Returns the "_r"-tagged frame ``old_index=`` expects."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold={threshold} must be in (0, 1]")
    from pyspark.sql import Window

    base = (
        df.select(
            F.col(id_col).alias("__id_r"),
            F.col(name_col).alias("__name_r"),
            F.array_distinct(
                F.split(F.trim(F.col(name_col)), token_pattern)
            ).alias("__toks_r"),
        )
        .filter(F.col("__name_r").isNotNull() & (F.size("__toks_r") > 0))
        .withColumn("__n_r", F.size("__toks_r"))
    )
    toks = base.select("*", F.explode("__toks_r").alias("__t"))
    rn = F.row_number().over(Window.partitionBy("__id_r").orderBy("__df", "__t"))
    return (
        toks.join(freq, "__t", "left")
        .withColumn("__df", F.coalesce("__df", F.lit(0)))
        .withColumn("__rn", rn)
        .filter(
            F.col("__rn")
            <= F.col("__n_r")
            - F.ceil(F.lit(threshold) * F.col("__n_r") - F.lit(1e-9))
            + 1
        )
        .select("__id_r", "__name_r", "__n_r", "__toks_r", "__t")
    )
