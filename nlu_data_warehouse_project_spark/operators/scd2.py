"""SCD2 merge — the heart of the reference warehouse (SURVEY.md §2.3
J2/J3/J4/J5 and §3.3).

Reference sequence (`load_to_dw.py:539-558`, statements at
:165-203, :313-331, :270-281, :365-369):

1. J2  insert-new:      temp keys absent from dw -> insert, open sentinel
2. J4  close-changed:   current dw rows whose key matches temp with any
                        attribute differing -> dt_last_update = run_date
3. J3  insert-changed:  new version rows for the changed keys
4. J5  dim lookup:      dt_dim = date_dim.id where dt_extract = full_date

Postgres executes these as four separate UPDATE/INSERT statements; on
immutable parquet the whole merge is ONE join-classify pass over
(current ⟗ batch) plus a union with untouched history, then an atomic
overwrite.  One shuffle on the natural key, one broadcast for the date
dimension — at 100 TB the join keys hash-partition and AQE handles
skew; history rows are never rewritten logically, and the TxTable gold
layout (`sources/txlog.py`) never rewrites them physically either: the
pipeline feeds this operator ONLY the current set (history filter
empty), splits the output into a closed-delta append + a current-dir
replace, and publishes both with one atomic manifest commit.

Reference divergence note (SURVEY.md §3.3): the reference's J3 compares
temp rows against *all* dw versions (no current-row predicate,
`load_to_dw.py:270-281`) so re-changed keys can insert duplicate
versions; J4 does scope to current rows (`:318`).  This operator
implements the intended semantics (compare against the current version
only); ``compat_all_versions=True`` reproduces the quirk for parity
testing.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import SCD2_OPEN_SENTINEL


def _attrs_equal(left_prefix: str, right_prefix: str, attrs: list[str]):
    """Null-safe conjunction: every tracked attribute equal."""
    return reduce(
        lambda a, b: a & b,
        [F.col(f"{left_prefix}.{c}").eqNullSafe(F.col(f"{right_prefix}.{c}")) for c in attrs],
    )


def scd2_merge(
    dw: DataFrame,
    batch: DataFrame,
    key: str,
    attrs: list[str],
    run_date: str,
    open_sentinel: str = SCD2_OPEN_SENTINEL,
    ts_col: str = "dt_last_update",
    load_col: str = "dt_load_to_dw",
    compat_all_versions: bool = False,
) -> DataFrame:
    """Merge one day's batch into the SCD2 table; returns the new dw.

    ``dw`` must carry ``batch``'s columns plus ``load_col``/``ts_col``.
    ``batch`` is the staged run slice (already cleansed + deduped on
    ``key`` — reference guarantees this via F2 before P3 runs).
    """
    # contract: batch must be unique on `key` (the reference guarantees
    # this via the staging dedup F2 before the merge runs); a duplicate
    # key would emit conflicting current rows.  Callers that cannot
    # guarantee it should dedup_keep_first() the batch beforehand.
    run = F.to_date(F.lit(run_date))
    open_d = F.to_date(F.lit(open_sentinel))

    current = dw.filter(F.col(ts_col) == open_d)
    history = dw.filter(F.col(ts_col) != open_d)

    data_cols = [c for c in dw.columns if c not in (load_col, ts_col)]
    out_cols = data_cols + [load_col, ts_col]

    b = batch.select(*[c for c in data_cols if c in batch.columns]).alias("b")
    cur = current.alias("cur")

    # ONE shuffle: full outer join current ⟗ batch on the natural key.
    # Classification and row emission happen in a single pass over the
    # join output (a per-disposition union would re-execute the join
    # once per branch): each key emits 0-2 rows via
    # explode(array_compact(...)).
    joined = cur.join(b, F.col(f"cur.{key}") == F.col(f"b.{key}"), "full_outer")

    in_batch = F.col(f"b.{key}").isNotNull()
    in_cur = F.col(f"cur.{key}").isNotNull()
    unchanged = _attrs_equal("cur", "b", attrs)

    # the surviving current row: untouched when unchanged or when the
    # key is absent from the batch (the reference keeps disappeared
    # keys open); closed at run_date when the batch changed it (J4)
    cur_out = F.when(
        in_cur,
        F.struct(
            *[F.col(f"cur.{c}").alias(c) for c in data_cols],
            F.col(f"cur.{load_col}").alias(load_col),
            F.when(in_batch & ~unchanged, run).otherwise(F.col(f"cur.{ts_col}")).alias(ts_col),
        ),
    )
    # the inserted open row: brand-new key (J2) or the new version of a
    # changed key (J3)
    new_out = F.when(
        in_batch & (~in_cur | ~unchanged),
        F.struct(
            *[F.col(f"b.{c}").alias(c) for c in data_cols],
            run.alias(load_col),
            open_d.alias(ts_col),
        ),
    )
    merged = joined.select(
        F.explode(F.array_compact(F.array(cur_out, new_out))).alias("__r")
    ).select([F.col(f"__r.{c}").alias(c) for c in out_cols])

    if compat_all_versions:
        # reference quirk: J3 compares batch against ALL versions, so a
        # key whose batch row differs from N historical versions inserts
        # N copies (`load_to_dw.py:270-281` has no current-row
        # predicate).  The single-pass plan already emitted the copy for
        # the current version; emit the extras from the history join.
        extra = (
            b.join(history.alias("cur"), F.col(f"b.{key}") == F.col(f"cur.{key}"), "inner")
            .filter(~_attrs_equal("cur", "b", attrs))
            .select([F.col(f"b.{c}").alias(c) for c in data_cols])
            .withColumn(load_col, run)
            .withColumn(ts_col, open_d)
        )
        merged = merged.unionByName(extra)

    return history.select(*out_cols).unionByName(merged)


def resolve_date_key(
    dw: DataFrame,
    date_dim: DataFrame,
    date_col: str = "dt_extract",
    dim_id_col: str = "dt_dim",
    dim_date_col: str = "full_date",
    dim_key_col: str = "id",
) -> DataFrame:
    """J5: surrogate date-key resolution
    (reference `update_dt_dim`, `load_to_dw.py:365-369`).

    Canonical broadcast-hash dimension lookup: date_dim is 7,670 rows,
    so the fact side never shuffles.
    """
    dim = F.broadcast(
        date_dim.select(
            F.col(dim_key_col).alias("__dim_id"), F.col(dim_date_col).alias("__dim_date")
        )
    )
    out = dw.drop(dim_id_col).join(dim, F.col(date_col) == F.col("__dim_date"), "left")
    return out.withColumn(dim_id_col, F.col("__dim_id")).drop("__dim_id", "__dim_date")


def scd3_merge(
    dim: DataFrame,
    batch: DataFrame,
    key: str,
    attrs: list[str],
    run_date: str,
    ts_col: str = "dt_last_update",
    prev_suffix: str = "_prev",
) -> DataFrame:
    """SCD TYPE-3 merge (r13): one row per key, each tracked attribute
    carried as (current, ``<attr>_prev``) column pairs — the "previous
    value" dimension pattern for attributes where only the last
    transition matters (prior segment, prior price band) and version
    explosion is unwanted.  The third member of the slowly-changing
    family next to ``scd2_merge`` (full history) and
    ``upsert`` (type-1, overwrite).

    ``dim`` carries ``key`` + attrs + their ``_prev`` twins + ``ts_col``
    (pass an empty frame with that schema to bootstrap); ``batch`` is
    the staged run slice, unique on ``key`` (the F2 staging-dedup
    contract, same as scd2_merge).  Semantics per key:

    - batch-only: insert; every ``_prev`` NULL, ``ts_col`` = run_date.
    - in both, any attr differs (null-safe): current <- batch value,
      ``_prev`` <- the OLD current, ``ts_col`` = run_date.  All
      tracked attrs shift together (one change event per row).
    - in both, all equal: row unchanged (``_prev``/``ts_col`` keep
      their old values — a no-op batch is a no-op merge).
    - dim-only: unchanged.

    ONE full-outer join on the key — single shuffle, no history union,
    at 100 TB the same cost as the type-1 upsert."""
    d, b = dim.alias("d"), batch.alias("b")
    joined = d.join(b, F.col(f"d.{key}").eqNullSafe(F.col(f"b.{key}")), "full_outer")
    in_dim = F.col(f"d.{key}").isNotNull()
    in_batch = F.col(f"b.{key}").isNotNull()
    changed = in_dim & in_batch & ~_attrs_equal("d", "b", attrs)
    cols = [F.coalesce(F.col(f"d.{key}"), F.col(f"b.{key}")).alias(key)]
    for a in attrs:
        cols.append(
            F.when(in_batch & (changed | ~in_dim), F.col(f"b.{a}"))
            .otherwise(F.col(f"d.{a}"))
            .alias(a)
        )
        cols.append(
            F.when(changed, F.col(f"d.{a}"))
            .otherwise(F.when(in_dim, F.col(f"d.{a}{prev_suffix}")))
            .alias(f"{a}{prev_suffix}")
        )
    cols.append(
        F.when(changed | ~in_dim, F.lit(run_date).cast("date"))
        .otherwise(F.col(f"d.{ts_col}"))
        .alias(ts_col)
    )
    return joined.select(*cols)
