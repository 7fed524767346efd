"""As-of (point-in-time) join — an operator the reference lacks and
Spark has no built-in for; composed from union + a running ``last()``
window, so it scales as one shuffle on (key, time) instead of a per-row
correlated subquery.

Semantics: for each left row, attach the payload of the latest right
row with the same key and ``right_ts <= left_ts`` (backward as-of, left
outer).  With ``tolerance`` set (seconds), matches older than the
tolerance are nulled out.

Algorithm (the standard streaming-merge formulation):
  1. union left and right into one (key, ts)-ordered stream, right rows
     sorted before left rows at equal ts (<= semantics),
  2. per key, carry each right payload column forward with
     last(ignorenulls=True) over rows unbounded-preceding..current,
  3. keep only left rows.
One hash shuffle on the key + an in-partition sort: the same cost
profile as a regular sort-merge join, robust at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance: float | None = None,
    tiebreak: str | None = None,
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """As-of left join; right payload columns (everything but
    ``on``/``right_ts``) are appended, plus ``right_ts`` itself.

    ``direction`` (r13):
    - ``"backward"`` (default): latest right row with ``right_ts <=
      left_ts`` — the classic as-of.
    - ``"forward"``: EARLIEST right row with ``right_ts >= left_ts``
      ("time to next event": post-purchase re-engagement, next restock
      after a stockout).  Same one-shuffle merge, mirrored: the carry
      runs over the descending time order.
    - ``"nearest"``: whichever of the two is closer in absolute time;
      exact ties prefer the backward match (a cause over an effect).
      Costs both carries + one id-equijoin to pick per row — 3
      shuffles, still join-shaped, never a correlated subquery.

    ``tiebreak`` names a right-side column that deterministically orders
    right rows sharing the same (key, ts): backward keeps the HIGHEST
    tiebreak (the `ORDER BY ts DESC, id DESC LIMIT 1` oracle shape),
    forward the LOWEST (`ORDER BY ts ASC, id ASC LIMIT 1`) — each
    direction mirrors its natural correlated-subquery twin.  Without
    it, equal-ts right rows yield an arbitrary payload (ADVICE r1 #2).

    ``strict=True`` excludes right rows AT the left timestamp (``<`` /
    ``>``, attribution semantics: a cause cannot share its effect's
    instant) — implemented purely by the merge order, same shuffle.

    ``tolerance`` (seconds) nulls out matches farther than the bound in
    the match direction (for ``nearest``, applied before picking)."""
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, left_ts, right_ts, tolerance, tiebreak, strict
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction={direction!r}: backward | forward | nearest")
    payload_cols = [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast("timestamp").alias("__rts"),
        F.lit(None).cast(dict(right.dtypes)[tiebreak] if tiebreak else "int").alias("__tb"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
        F.col(right_ts).cast("timestamp").alias("__rts"),
        (F.col(tiebreak) if tiebreak else F.lit(None).cast("int")).alias("__tb"),
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
    )

    merged = l_tagged.unionByName(r_tagged)
    # backward: time ascends and right rows sort before left rows at
    # equal ts (<= semantics); strict puts left rows first, hiding
    # equal-ts right rows from the carry (<).  forward mirrors both on
    # a DESCENDING time order.  Among equal-ts right rows the tiebreak
    # is ordered so last() carries the direction's natural winner:
    # highest for backward, lowest for forward (nulls first keeps
    # no-tiebreak behavior in both).
    fwd = direction == "forward"
    ts_order = F.col("__ts").desc() if fwd else F.col("__ts").asc()
    side_order = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    tb_order = F.col("__tb").desc_nulls_first() if fwd else F.col("__tb").asc_nulls_first()
    w = (
        Window.partitionBy("__key")
        .orderBy(ts_order, side_order, tb_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        "__key",
        "__ts",
        "__is_left",
        "__left",
        F.last("__rts", ignorenulls=True).over(w).alias(right_ts),
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c) for c in payload_cols],
    ).filter(F.col("__is_left") == 1)

    if tolerance is not None:
        gap = F.col("__ts").cast("double") - F.col(right_ts).cast("double")
        stale = (-gap if fwd else gap) > tolerance
        carried = carried.select(
            "__key", "__ts", "__is_left", "__left",
            F.when(stale, F.lit(None).cast("timestamp")).otherwise(F.col(right_ts)).alias(right_ts),
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in payload_cols],
        )

    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    return carried.select(*out_cols, F.col(right_ts), *[F.col(c) for c in payload_cols])


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance: float | None,
    tiebreak: str | None,
    strict: bool,
) -> DataFrame:
    """nearest = per-row argmin(|gap|) over the backward and forward
    carries, ties to backward.  The left frame is stamped with a row id
    and PINNED so both carries see identical ids (a recomputed
    monotonically_increasing_id could renumber — the pin freezes it),
    then one id-equijoin picks a side per row."""
    from .scale import pin_frame

    stamped = pin_frame(
        left.withColumn("__asof_id", F.monotonically_increasing_id()), eager=True
    )
    b = asof_join(stamped, right, on, left_ts, right_ts, tolerance,
                  tiebreak, strict, "backward")
    f = asof_join(stamped, right, on, left_ts, right_ts, tolerance,
                  tiebreak, strict, "forward")
    payload_cols = [c for c in right.columns if c not in (on, right_ts)]
    fsel = f.select(
        F.col("__asof_id"),
        F.col(right_ts).alias("__f_rts"),
        *[F.col(c).alias(f"__f_{c}") for c in payload_cols],
    )
    j = b.join(fsel, "__asof_id")
    lts = F.col(left_ts).cast("timestamp").cast("double")
    bgap = lts - F.col(right_ts).cast("double")          # >= 0 when matched
    fgap = F.col("__f_rts").cast("double") - lts          # >= 0 when matched
    use_fwd = F.col("__f_rts").isNotNull() & (
        F.col(right_ts).isNull() | (fgap < bgap)          # tie -> backward
    )
    picked = j.select(
        *[F.col(c) for c in left.columns],
        F.when(use_fwd, F.col("__f_rts")).otherwise(F.col(right_ts)).alias(right_ts),
        *[
            F.when(use_fwd, F.col(f"__f_{c}")).otherwise(F.col(c)).alias(c)
            for c in payload_cols
        ],
    )
    return picked


def scd2_pit_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str = "ts",
    load_col: str = "dt_load_to_dw",
    close_col: str = "dt_last_update",
    open_sentinel: str = "9999-12-31",
    how: str = "left",
) -> DataFrame:
    """Point-in-time join of a fact stream to an SCD2 dimension: each
    fact row gets the dimension version that was CURRENT at its event
    time — the classic warehouse temporal lookup (resolve each order
    against the customer attributes as of that order's date, not
    today's).

    A version is valid on [load, close): a fact dated exactly on a
    close date matches the successor version (which loaded that day),
    mirroring the merge's same-day close+insert semantics.  Facts
    predating every version match nothing (NULL attrs under the
    default left join).

    Scale shape: a plain equi-join on the key with the interval
    predicate evaluated inside the join — versions-per-key is small
    (daily churn), so this is one key-partitioned sort-merge join, no
    range-bucketing machinery needed.  For interval tables with
    unbounded per-key versions use `rangejoin` instead.
    """
    d = F.to_date(F.col(f"f.{ts_col}"))
    open_d = F.to_date(F.lit(open_sentinel))
    cond = (
        (F.col(f"f.{key}") == F.col(f"d.{key}"))
        & (d >= F.col(f"d.{load_col}"))
        & ((F.col(f"d.{close_col}") == open_d) | (d < F.col(f"d.{close_col}")))
    )
    dim_cols = [c for c in dim.columns if c != key]
    return (
        facts.alias("f")
        .join(dim.alias("d"), cond, how)
        .select("f.*", *[F.col(f"d.{c}").alias(c) for c in dim_cols])
    )
