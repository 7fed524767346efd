"""Market-basket association rules — support / confidence / lift over
item co-occurrence within a basket (order, session, document).

Scale contract, stated up front: the pair stage expands each basket's
sorted item array into k(k-1)/2 pairs for a basket of k DISTINCT
items.  That is linear in the data only while basket width is bounded
(TPC-H caps lineitems per order at 7 → ≤ 21 pairs; real retail
baskets are similarly tens, not thousands).  For unbounded baskets
(e.g. items = tokens, basket = document) the caller MUST cap width
first — ``sampling.cap_per_group`` exists for exactly that — or the
quadratic term owns the job; the same bound q222 documents for its
co-order edge set.  The expansion is a map-side ``flatten(transform)``
over ONE basket-keyed aggregation (no self-join), and pair counts,
item supports and the basket count all ride ONE tagged aggregation of
that stream — a single scan of the input; item supports then join
item-keyed (the support table is vocabulary-sized, never broadcast).

All statistics are ratios of exact counts computed as single IEEE
divides/multiplies of count-valued doubles (counts < 2^53 convert
exactly), so the catalog hash-gates the doubles themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_share: float = 0.001,
    include_counts: bool = False,
) -> DataFrame:
    """Unordered item-pair rules: for every pair (a < b) of items
    co-occurring in at least ``min_pair_share`` of baskets, emit

    - ``n_ab`` / ``support`` — co-occurrence count and share of baskets
    - ``conf_a_to_b`` = P(b | a), ``conf_b_to_a`` = P(a | b)
    - ``lift`` = P(a,b) / (P(a)·P(b)) — > 1 means the pair attracts

    Input rows are (basket, item) events; multiplicity within a basket
    is ignored (set semantics — ``collect_set`` below).  N is the
    number of baskets containing at least one item.
    ``include_counts=True`` appends the raw marginals (``n_a``,
    ``n_b``, ``n_baskets``) for downstream tests that need the full
    2×2 contingency table (e.g. a chi-squared independence screen).
    """
    if not 0.0 <= min_pair_share <= 1.0:
        raise ValueError(f"min_pair_share={min_pair_share} must be in [0, 1]")
    # ONE basket-keyed exchange produces the sorted distinct item array
    # (collect_set dedupes = set semantics; array_sort gives a < b for
    # free).  Pairs, item supports and the basket count are then all
    # encoded into ONE exploded stream — pair rows (a, b), item rows
    # (a, NULL), one basket row (NULL, NULL) — so a single (a, b)
    # aggregation serves all three statistics from ONE scan of the
    # input: naively deriving them as three consumers of `baskets`
    # re-reads the base data three times, because column pruning gives
    # each consumer a different fragment and defeats ReusedExchange.
    # The pair expansion is a map-side flatten(transform) bounded by
    # the documented basket-width cap: k(k-1)/2 per ROW, not a join.
    item_type = df.schema[item_col].dataType
    null_i = F.lit(None).cast(item_type)
    baskets = (
        df.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .groupBy(F.col(basket_col).alias("__b"))
        .agg(F.array_sort(F.collect_set(F.col(item_col))).alias("__items"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("__items"),
            lambda x, i: F.transform(
                F.slice(F.col("__items"), i + F.lit(2), F.size("__items")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    tagged = baskets.select(
        F.explode(
            F.concat(
                pair_structs,
                F.transform(
                    F.col("__items"),
                    lambda x: F.struct(x.alias("a"), null_i.alias("b")),
                ),
                F.array(F.struct(null_i.alias("a"), null_i.alias("b"))),
            )
        ).alias("__r")
    )
    # localCheckpoint: the three consumers below filter on the GROUPING
    # KEYS, which Catalyst pushes beneath the aggregate — making their
    # fragments differ and defeating exchange reuse, so without the
    # barrier the base data is scanned once per consumer.  The
    # checkpointed frame is pair+vocabulary-sized (bounded by basket
    # width², not by the input), so materializing it is the cheap side
    # of the trade at any scale.
    agg = (
        tagged.groupBy(F.col("__r.a").alias("__ka"), F.col("__r.b").alias("__kb"))
        .agg(F.count("*").alias("__cnt"))
        .localCheckpoint(eager=False)
    )
    pairs = agg.filter(F.col("__ka").isNotNull() & F.col("__kb").isNotNull()).select(
        F.col("__ka").alias("__i"), F.col("__kb").alias("__j"),
        F.col("__cnt").alias("n_ab"),
    )
    item = agg.filter(F.col("__ka").isNotNull() & F.col("__kb").isNull()).select(
        F.col("__ka").alias("__i"), F.col("__cnt").alias("__n_item")
    )
    n_baskets = agg.filter(F.col("__ka").isNull()).select(
        F.col("__cnt").alias("__n")
    )
    sup_a = item.select(F.col("__i"), F.col("__n_item").alias("__n_a"))
    sup_b = item.select(F.col("__i").alias("__j"), F.col("__n_item").alias("__n_b"))
    out = (
        pairs.join(sup_a, "__i")
        .join(sup_b, "__j")
        .crossJoin(F.broadcast(n_baskets))
        .filter(
            F.col("n_ab").cast("double")
            >= F.col("__n").cast("double") * F.lit(min_pair_share)
        )
    )
    ab = F.col("n_ab").cast("double")
    na = F.col("__n_a").cast("double")
    nb = F.col("__n_b").cast("double")
    n = F.col("__n").cast("double")
    cols = [
        F.col("__i").alias("item_a"),
        F.col("__j").alias("item_b"),
        F.col("n_ab"),
        (ab / n).alias("support"),
        (ab / na).alias("conf_a_to_b"),
        (ab / nb).alias("conf_b_to_a"),
        ((ab * n) / (na * nb)).alias("lift"),
    ]
    if include_counts:
        cols += [
            F.col("__n_a").alias("n_a"),
            F.col("__n_b").alias("n_b"),
            F.col("__n").alias("n_baskets"),
        ]
    return out.select(*cols)
