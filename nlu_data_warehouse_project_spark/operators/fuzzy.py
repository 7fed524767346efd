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
