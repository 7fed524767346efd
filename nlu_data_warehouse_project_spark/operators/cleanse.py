"""Set-based cleanse operators (SURVEY.md §2.5 F1/F2).

The reference runs these as two UPDATE/DELETE statements inside
Postgres after the row-loop load (`transform_data`,
`load_to_staging.py:191-245`).  Here they are narrow/shuffle-minimal
DataFrame transforms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import NULL_REPAIR_NUMBER, NULL_REPAIR_STRING


def repair_nulls(
    df: DataFrame,
    string_cols: list[str] | None = None,
    numeric_cols: list[str] | None = None,
    string_sentinel: str = NULL_REPAIR_STRING,
    numeric_sentinel: int = NULL_REPAIR_NUMBER,
) -> DataFrame:
    """F1: null repair — strings -> 'N/A', numerics -> -1
    (reference SQL at `load_to_staging.py:204-217`).

    Defaults: infer from dtypes when column lists aren't given.  Pure
    projection — no shuffle, stays in whole-stage codegen.
    """
    if string_cols is None:
        string_cols = [c for c, t in df.dtypes if t == "string"]
    if numeric_cols is None:
        numeric_cols = [c for c, t in df.dtypes if t in ("int", "bigint", "double", "float", "smallint")]
    out = df
    if string_cols:
        out = out.fillna(string_sentinel, subset=string_cols)
    if numeric_cols:
        out = out.fillna(numeric_sentinel, subset=numeric_cols)
    return out


def dedup_keep_first(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str | Column] | None = None,
) -> DataFrame:
    """F2: keyed dedup, keep-first (reference: DELETE all but MIN(ctid)
    per natural_key, `load_to_staging.py:220-227`).

    Postgres's ctid ≈ physical insert order; Spark has no row identity,
    so the keeper is pinned by an explicit ordering column
    (``order_cols``).  Without one, falls back to ``dropDuplicates``
    (nondeterministic keeper — fine when rows are exact duplicates).

    Scale note: the window variant shuffles once, hash-partitioned on
    ``key_cols``; AQE splits skewed keys.  For exact-duplicate rows
    prefer ``exact_dedup`` (map-side combine via groupBy-first).
    """
    if order_cols is None:
        return df.dropDuplicates(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def with_ingest_order(df: DataFrame, col_name: str = "surrogate_key") -> DataFrame:
    """Capture ingest order as an explicit column — the engine's stand-in
    for Postgres's serial surrogate / ctid.  monotonically_increasing_id
    is unique + monotonic within each partition (partition id in the
    high bits), which preserves file/row order for a single-source scan;
    dense, global ordering (date_dim ids) uses ``dense_ids`` instead.
    """
    return df.withColumn(col_name, F.monotonically_increasing_id())


def dense_ids(df: DataFrame, order_cols: list[str | Column], col_name: str = "id", start: int = 1) -> DataFrame:
    """Dense 1..N surrogate ids in a given order (date_dim needs ids to
    stay dense because dw.dt_dim stores them — SURVEY.md §1.2).

    A global row_number forces a single-partition window: fine for
    dimension-sized tables (7,670 rows), never used on fact tables.
    """
    w = Window.orderBy(*order_cols)
    return df.withColumn(col_name, (F.row_number().over(w) + (start - 1)).cast("int"))


def dedup_within_window(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 60,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Time-windowed dedup: keep a row only when the previous same-key
    row (by event time) is more than ``gap_seconds`` older, or absent —
    the batch twin of streaming ``dropDuplicatesWithinWatermark``
    (bounce/double-fire suppression for telemetry).

    Gap is measured from the previous EVENT, not the previous kept row
    (lag semantics): a burst longer than the window keeps only rows
    that follow a real gap — the same rule the sessionizer uses for
    session starts, so "kept row" ≡ "session-opening row".  One window
    shuffle on the keys; microsecond-exact arithmetic.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col, *(order_cols or []))
    # cast('timestamp') accepts TIMESTAMP_NTZ input (unix_micros rejects
    # NTZ); no-op for LTZ columns
    cur = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(F.unix_micros(F.col(ts_col).cast("timestamp"))).over(w)
    keep = prev.isNull() | (cur - prev > int(gap_seconds) * 1_000_000)
    return df.withColumn("__keep", keep).filter(F.col("__keep")).drop("__keep")


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_frequency: int = 10,
    sep: str = "\n",
    min_line_chars: int = 1,
) -> DataFrame:
    """Cross-document line dedup (RefinedWeb/CCNet-style boilerplate
    removal): drop every line that appears in more than
    ``max_doc_frequency`` DISTINCT documents — navbars, cookie banners,
    copyright footers — and reassemble each document from its surviving
    lines in original order.

    The reference has no corpus-level text operator (its cleansing is
    row-local regex, `load_to_staging.py:191-245`); this is the
    corpus-scale twin a pretraining pipeline needs.

    Shape at scale: posexplode (scan-local) → distinct(line, id) →
    count per line → left_anti join of the exploded lines against the
    heavy-line set → groupBy(id) reassembly.  The doc-frequency count
    never sees a line more than once per document (distinct first), so
    a line repeated 1M× inside ONE spam page costs one row.  The heavy
    set (df > threshold) is tiny by construction — boilerplate is rare
    among distinct lines — so AQE turns the anti-join into a broadcast;
    reassembly shuffles on ``id_col`` only.  Lines join on their full
    text, not a hash: no collision can silently drop a good line.

    Documents whose every line is boilerplate come back with empty
    text and ``n_lines_kept = 0`` — never silently dropped.

    Returns ``id_col``, ``text`` (cleaned), ``n_lines_kept``,
    ``n_lines_dropped``.
    """
    import re as _re

    # Spark's split() takes a Java REGEX; ``sep`` is a LITERAL separator
    # (matching DuckDB string_split), so escape it
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(_re.escape(sep)))).alias("__pos", "__line"),
    )
    # lines shorter than min_line_chars (default: blank lines) are
    # EXEMPT from the heavy filter: paragraph separators exceed any doc
    # frequency threshold in a real corpus, and striking them corpus-wide
    # would silently rewrite every document's structure
    heavy = (
        lines.filter(F.length("__line") >= int(min_line_chars))
        .select("__line", id_col)
        .distinct()
        .groupBy("__line")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > int(max_doc_frequency))
        .select("__line")
    )
    kept = lines.join(heavy, "__line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            sep,
        ).alias("text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n_total"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("long").alias("n_lines_kept"),
            (F.col("__n_total") - F.coalesce(F.col("n_lines_kept"), F.lit(0)))
            .cast("long")
            .alias("n_lines_dropped"),
        )
    )


def survivorship_merge(
    df: DataFrame,
    key_cols: list[str],
    rules: dict[str, object],
) -> DataFrame:
    """Golden-record merge: collapse duplicate rows per key into one
    survivor using per-column survivorship rules — the MDM step after
    duplicate DETECTION (dedup_keep_first keeps one physical row; this
    builds the best logical row from all of them).

    ``rules`` maps output column -> rule:
      - ``"min"`` / ``"max"``: extreme value over the group
      - ``("first", order_col)``: the column's first NON-NULL value in
        ascending ``order_col`` order (recency/priority source pick) —
        implemented with ``min_by`` over null-filtered rows, so a NULL
        in the earliest row falls through to the next, like a COALESCE
        down the ordered duplicates.  ``order_col`` must be unique per
        key (an id, a load timestamp): ``min_by`` breaks order ties
        arbitrarily, which would make the survivor run-dependent.

    One map-side-combined aggregate keyed on ``key_cols``; every rule
    is a single aggregate expression, so adding columns never adds
    shuffles.  Cites the reference's keep-MIN dedup policy
    (load_to_staging.py dedup CTE) which this generalizes."""
    aggs = []
    for col, rule in rules.items():
        if rule == "min":
            aggs.append(F.min(col).alias(col))
        elif rule == "max":
            aggs.append(F.max(col).alias(col))
        elif isinstance(rule, tuple) and len(rule) == 2 and rule[0] == "first":
            order_col = rule[1]
            # min_by over rows where the value is non-null: the first
            # non-null down the order wins; all-null groups yield NULL
            aggs.append(
                F.min_by(col, F.when(F.col(col).isNotNull(), F.col(order_col))).alias(col)
            )
        else:
            raise ValueError(f"unknown survivorship rule for {col}: {rule!r}")
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_merged"))
    return df.groupBy(*key_cols).agg(*aggs)
