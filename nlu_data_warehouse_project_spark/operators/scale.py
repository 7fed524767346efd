"""Scale-out machinery (SURVEY.md §4 partitioning row; BASELINE.json
100 TB north star).

Three tools a cluster-scale deployment of this engine leans on:

- **Bucketed tables** (``write_bucketed``): pre-shuffle a fact table
  once on its join key; every subsequent equi-join or aggregation on
  that key is exchange-free.  This is how the silver/gold layers
  should be laid out for the SCD2 merge key (natural_key) so the
  daily merge never re-shuffles the accumulated warehouse.
- **Salted joins** (``salted_join``): when one join key dominates
  (hot products, null-ish defaults), split it across
  ``salt_buckets`` synthetic sub-keys — the small side replicates per
  salt, the big side scatters deterministically.  AQE's skew-join
  splitting handles moderate skew at runtime; explicit salting is for
  the pathological keys you know about.
- **Partitioned layout** (``write_date_partitioned``): date-partitioned
  gold tables give run-slice queries partition pruning (the engine's
  equivalent of the reference's per-day filename convention).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins/aggregations on ``bucket_cols`` between tables bucketed the
    same way run without an Exchange."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: left rows scatter across
    ``salt_buckets`` sub-keys; right rows replicate once per salt.
    Semantics identical to ``left.join(right, on, how)`` — but ONLY for
    inner/left joins (a right/full join would emit unmatched right rows
    once per salt; semi/anti change semantics), so anything else raises.
    The salt comes from a per-row monotonic id, not a row hash: exact
    duplicate rows of a hot key must still spread across salts (a
    whole-row hash lands them all in one bucket, ADVICE r1 #3).
    Cost profile is a join on (key, salt) whose per-task share of a hot
    key is 1/salt_buckets."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: replicating the "
            "right side per salt breaks right/full/semi/anti semantics"
        )
    salted_left = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_left.join(salted_right, [on, "__salt"], how).drop("__salt")


def write_date_partitioned(df: DataFrame, path: str, date_col: str, mode: str = "overwrite") -> None:
    """Date-partitioned parquet layout: filters on ``date_col`` prune
    whole directories at plan time (PartitionFilters in the scan)."""
    df.write.mode(mode).partitionBy(date_col).parquet(path)


def repartition_for_key_work(df: DataFrame, keys: list[str], partitions: int | None = None) -> DataFrame:
    """Hash-repartition on the keys a downstream stage will group/join
    on, so consecutive keyed stages reuse one exchange instead of each
    introducing their own."""
    cols = [F.col(k) for k in keys]
    return df.repartition(partitions, *cols) if partitions else df.repartition(*cols)


def widen_if_narrow(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Hash-repartition ``df`` to the session's shuffle parallelism —
    but ONLY when its incoming plan has fewer partitions (r17).

    CPU-heavy per-row operators (posexplode to k-grams, per-gram md5,
    suffix expansion) inherit their parallelism from the scan: a small
    single-file input means ONE task does the whole expansion while 31
    cores idle (profiled: the serial map stage dominated several text
    queries at bench scale).  A 100 TB corpus arrives as thousands of
    splits, where an extra pre-expansion shuffle of the raw rows would
    be pure overhead — so this is a no-op whenever the input is
    already at least shuffle-partitions wide.  Keys must be
    deterministic columns (guide rule: never repartition on rand()).
    repartition-by-NUM is AQE-coalesce-exempt, so the widened layout
    sticks."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *[F.col(c) for c in key_cols])


def pin_frame(df: DataFrame, reliable: bool | None = None, eager: bool = True) -> DataFrame:
    """Materialize a frame and cut its lineage — the shared pin used by
    every iterative/multi-consumer operator (exact-rank family, BFS,
    connected components).

    ``reliable=False`` → ``localCheckpoint``: executor-local blocks,
    fastest, but NOT fault-tolerant — one lost executor aborts the job
    (blocks are unrecoverable, lineage is gone).  Fine on local[n] and
    for short interactive jobs.

    ``reliable=True`` → ``df.checkpoint()``: writes to the configured
    ``spark.sparkContext.setCheckpointDir(...)`` (HDFS/S3 at cluster
    scale), so a lost executor re-reads the checkpoint files instead of
    killing a 100 TB job.  Raises ``ValueError`` upfront if no
    checkpoint dir is configured.

    ``reliable=None`` (default) → auto: reliable when a checkpoint dir
    is configured, else local.  A cluster deployment opts every
    operator in with one driver-side ``setCheckpointDir`` call — no
    per-call-site plumbing (VERDICT r9 #1).

    ``eager=False`` is honored ONLY on the local path (ADVICE r17 #1).
    ``localCheckpoint`` persists at mark time, so a later action both
    computes and materializes the frame in one job — the lazy-pin
    job fusion the iterative operators rely on.  A lazy RELIABLE
    checkpoint has neither property: ``checkpoint(eager=False)`` does
    not persist, the files are only written by ``RDD.doCheckpoint``
    after some job that computes the RDD, and ``doCheckpoint`` stops
    at the FIRST marked RDD per lineage branch
    (``spark.checkpoint.checkpointAllMarkedAncestors`` defaults
    false) — so a lazy reliable pin sitting behind another lazy pin
    is never written at all: every consumer job silently recomputes
    it and the lost-executor recovery contract evaporates.  The
    reliable path therefore always persists first (one computation
    feeds both the materializing action and the checkpoint-file
    write, instead of two) and checkpoints eagerly."""
    sc = df.sparkSession.sparkContext
    has_dir = sc.getCheckpointDir() is not None
    if reliable is None:
        reliable = has_dir
    if reliable:
        if not has_dir:
            raise ValueError(
                "pin_frame(reliable=True) needs a checkpoint dir: call "
                "spark.sparkContext.setCheckpointDir('<shared fs path>') first"
            )
        df = df.persist()
        out = df.checkpoint(eager=True)
        df.unpersist()
        return out
    return df.localCheckpoint(eager=eager)


_MID_LOCAL_BITS = 33  # monotonically_increasing_id: pid << 33 | row-in-partition


def _range_parted_with_ids(
    df: DataFrame, order_cols: list, num_partitions: int | None,
    reliable: bool | None = None,
) -> DataFrame:
    """Shared first stage of the exact-rank family: range-partition on
    the total order, sort within each partition, and tag every row with
    ``__pid``/``__idx`` recovered from ``monotonically_increasing_id``
    (partition id in the upper bits, a 0-based row counter in partition
    order — i.e. sort order — in the lower 33).  That makes the local
    rank a pure column expression: NO window, NO per-partition Python.

    ``pin_frame`` pins the frame: ``repartitionByRange`` SAMPLES
    the data to pick boundaries, so without it the offset-counting job
    and the consuming job could re-plan with different boundaries and
    the broadcast offsets would be wrong.  The pin also makes
    the two jobs share one shuffle instead of recomputing the sort.
    At cluster scale this materializes the frame once — the price of
    exactness; pass ``reliable=True`` (or configure a checkpoint dir)
    for the fault-tolerant checkpoint path, and see the approximate
    percentile swap when even one materialization is too much.

    The pin is LAZY on the local path (r17, guide §1.2 "fewer
    jobs"): every caller's first action is ``_cumulative_offsets``'
    bounded collect, which materializes the localCheckpoint inside
    that same job — an eager pin here spent a whole extra job
    (sample + shuffle + write) only to have the offsets job re-read
    the result.  The single-materialization guarantee holds because
    ``localCheckpoint`` persists at mark time: the frame is stored
    the first time any job computes it, so the offsets and every
    later consumer see one frozen layout and one set of ids.  On the
    RELIABLE path ``pin_frame`` upgrades the pin to persist + eager
    checkpoint (ADVICE r17 #2: a lazy reliable checkpoint does not
    persist, so the offsets collect would consume a pre-checkpoint
    computation while later consumers read the checkpoint-write
    job's recompute — the frozen-layout guarantee would then rest
    only on shuffle-stage reuse plus consumers' tie-invariance).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    parted = df.repartitionByRange(num_partitions, *cols) if num_partitions \
        else df.repartitionByRange(*cols)
    parted = (
        parted.sortWithinPartitions(*cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright(F.col("__mid"), _MID_LOCAL_BITS))
        .withColumn(
            "__idx", F.col("__mid").bitwiseAND(F.lit((1 << _MID_LOCAL_BITS) - 1))
        )
        .drop("__mid")
    )
    return pin_frame(parted, reliable=reliable, eager=False)


def exact_global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rank",
    num_partitions: int | None = None,
    reliable: bool | None = None,
    n_total_col: str | None = None,
) -> DataFrame:
    """Exact global ``row_number`` over a TOTAL order, distributed
    (VERDICT r8 #1 — the scale-safe replacement for
    ``Window.orderBy(...)`` with no partitionBy, whose plan is one
    single-partition sort task that at 100 TB IS the job).

    ``order_cols`` must define a total order (include a unique
    tiebreak column, exactly as the window form would).  Shape:
    range-shuffle + local sort (the same work a global sort does, but
    across ALL partitions), one partition-count job whose collect is
    bounded by the partition COUNT (driver-safe at any data size), and
    a broadcast join mapping each partition to its cumulative row
    offset — rank = offset + local index + 1.  Skewed order keys are
    handled by the range partitioner's equal-frequency sampling.

    ``n_total_col`` (r18, guide §1.2 "don't compute what you already
    know"): attach the TOTAL row count N as a long literal column.
    The grand total falls out of the same bounded offsets collect, so
    callers that need N (rank thresholds, medians, top-percent cuts)
    skip the whole-frame ``count()`` aggregate they used to crossJoin
    back in — one fewer pass over the input at any scale."""
    parted = _range_parted_with_ids(df, order_cols, num_partitions, reliable=reliable)
    offsets, n_total = _cumulative_offsets_with_total(parted, F.count(F.lit(1)))
    out = (
        parted.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__idx") + 1).cast("long"))
        .drop("__pid", "__idx", "__off")
    )
    if n_total_col is not None:
        out = out.withColumn(n_total_col, F.lit(int(n_total or 0)).cast("long"))
    return out


def _cumulative_offsets(parted: DataFrame, agg_expr, how: str = "sum") -> DataFrame:
    """Per-partition aggregate of ``agg_expr`` (count for ranks,
    sum/max/min for prefix aggregates) rolled into EXCLUSIVE cumulative
    offsets — partition p's offset folds partitions 0..p-1 only.  One
    tiny job: the groupBy key space is the partition-id set, so both
    the shuffle and the collect are bounded by the partition count.
    For max/min the first partition's offset is NULL (no predecessor);
    consumers combine with greatest/least, which skip NULLs."""
    return _cumulative_offsets_with_total(parted, agg_expr, how)[0]


def _cumulative_offsets_with_total(
    parted: DataFrame, agg_expr, how: str = "sum"
) -> tuple[DataFrame, object]:
    """``_cumulative_offsets`` plus the GRAND total (the fold over all
    partitions) — it falls out of the same bounded collect, so callers
    that also need N (ntile's closed form, the percentile cut ranks)
    skip a whole extra count job over the pinned frame (r17)."""
    import decimal

    agg_df = parted.groupBy("__pid").agg(agg_expr.alias("__v"))
    vtype = agg_df.schema["__v"].dataType.simpleString()
    rows = sorted(agg_df.collect(), key=lambda r: r["__pid"])
    out: list = []
    if how == "sum":
        acc = decimal.Decimal(0) if vtype.startswith("decimal") else 0
        for r in rows:
            out.append((int(r["__pid"]), acc))
            acc += r["__v"]
    elif how in ("max", "min"):
        pick = max if how == "max" else min
        acc = None
        for r in rows:
            out.append((int(r["__pid"]), acc))
            if r["__v"] is not None:
                acc = r["__v"] if acc is None else pick(acc, r["__v"])
    else:
        raise ValueError(f"how={how!r} (sum|max|min)")
    # the offsets frame carries the aggregate's EXACT type (long
    # counts, DECIMAL(p,s) sums) so downstream arithmetic keeps its
    # cross-engine bit-exactness instead of inheriting Python-Decimal
    # inference's (38,18)
    offsets = parted.sparkSession.createDataFrame(
        out, f"__pid long, __off {vtype}"
    )
    return offsets, acc


def _offsets_counts_with_totals(
    parted: DataFrame, agg_expr, how: str = "sum"
) -> tuple[DataFrame, object, DataFrame, int, str]:
    """One bounded job serving every scalar the prefix machinery can
    need: per-partition VALUE offsets (exclusive fold of ``agg_expr``),
    per-partition ROW-COUNT offsets, the grand value total, and the
    grand row count N — all from a single groupBy-__pid collect (r18:
    ``exact_prefix_agg`` with ``rank_col`` used to run a SECOND
    offsets job for the counts, and callers needing the grand total
    re-aggregated the whole input frame).  Returns
    ``(value_offsets, value_total, count_offsets, n_total, vtype)``.
    The value fold mirrors ``_cumulative_offsets_with_total`` exactly
    (same types, same NULL handling) so offsets are bit-identical."""
    import decimal

    agg_df = parted.groupBy("__pid").agg(
        agg_expr.alias("__v"), F.count(F.lit(1)).alias("__c")
    )
    vtype = agg_df.schema["__v"].dataType.simpleString()
    rows = sorted(agg_df.collect(), key=lambda r: r["__pid"])
    vout: list = []
    cout: list = []
    cacc = 0
    if how == "sum":
        acc = decimal.Decimal(0) if vtype.startswith("decimal") else 0
        for r in rows:
            vout.append((int(r["__pid"]), acc))
            cout.append((int(r["__pid"]), cacc))
            acc += r["__v"]
            cacc += int(r["__c"])
        vtotal = acc if rows else None
    elif how in ("max", "min"):
        pick = max if how == "max" else min
        acc = None
        for r in rows:
            vout.append((int(r["__pid"]), acc))
            cout.append((int(r["__pid"]), cacc))
            if r["__v"] is not None:
                acc = r["__v"] if acc is None else pick(acc, r["__v"])
            cacc += int(r["__c"])
        vtotal = acc
    else:
        raise ValueError(f"how={how!r} (sum|max|min)")
    spark = parted.sparkSession
    voff = spark.createDataFrame(vout, f"__pid long, __voff {vtype}")
    roff = spark.createDataFrame(cout, "__pid long, __off long")
    return voff, vtotal, roff, cacc, vtype


def exact_global_ntile(
    df: DataFrame,
    order_cols: list,
    n_buckets: int,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
    reliable: bool | None = None,
) -> DataFrame:
    """Exact ``ntile(n)`` over a total order without the
    single-partition window: the global rank from
    ``exact_global_rank`` plus SQL ntile's closed form.  With N rows
    and B buckets, the first N mod B buckets take ceil(N/B) rows and
    the rest floor(N/B) — integer `div` arithmetic end-to-end, so the
    assignment is bit-identical to the engine-native window ntile
    (verified against DuckDB's in q129's oracle)."""
    b = int(n_buckets)
    if b < 1:
        # fail fast with a clear message instead of a modulo/division-
        # by-zero surfacing as an opaque codegen error at execution
        raise ValueError(f"n_buckets={n_buckets!r} (must be >= 1)")
    parted = _range_parted_with_ids(df, order_cols, num_partitions, reliable=reliable)
    # N rides the offsets collect (r17): the previous shape ran a
    # whole-frame count() aggregate crossJoined back in, re-scanning
    # the pinned frame inside the final action for a number the offsets
    # job already knows
    offsets, n_total = _cumulative_offsets_with_total(parted, F.count(F.lit(1)))
    ranked = (
        parted.join(F.broadcast(offsets), "__pid")
        .withColumn("__rk", (F.col("__off") + F.col("__idx") + 1).cast("long"))
        .drop("__pid", "__idx", "__off")
    )
    n = int(n_total)
    # q = floor(N/B), r = N mod B; ranks 1..r*(q+1) fill the ceil-sized
    # buckets, the rest the floor-sized ones.  All integer `div` — and
    # the ELSE's division by q only evaluates when some rank exceeds
    # the big buckets, which implies q >= 1 (CASE is lazy per-row, so
    # the literal q=0 case never divides)
    bucket = (
        f"CASE WHEN __rk <= ({n}L % {b}) * (({n}L div {b}) + 1) "
        f"THEN (__rk - 1) div (({n}L div {b}) + 1) "
        f"ELSE ({n}L % {b}) + (__rk - ({n}L % {b}) * (({n}L div {b}) + 1) - 1) div ({n}L div {b}) "
        f"END + 1"
    )
    return (
        ranked.withColumn(bucket_col, F.expr(bucket).cast("int"))
        .drop("__rk")
    )


def exact_global_ntiles(
    df: DataFrame,
    specs: list,
    num_partitions: int | None = None,
    reliable: bool | None = None,
) -> DataFrame:
    """Several exact ``ntile`` columns over INDEPENDENT total orders in
    one pass over the data (VERDICT r9 #4 — the RFM shape: recency,
    frequency and monetary quartiles on one customer frame).

    ``specs``: list of ``(order_spec, n_buckets, bucket_col)`` where
    ``order_spec`` is ``[(col_name, 'asc'|'desc'), ...]`` defining a
    TOTAL order (include a unique tiebreak; order columns must be
    non-null — same contract as ``exact_global_ntile``).

    Chaining ``exact_global_ntile`` per spec range-shuffles and
    materializes the FULL frame once per spec.  This operator instead
    computes each spec's B-1 bucket-boundary FENCE tuples exactly — a
    rank job over a projection of just that spec's order columns — and
    assigns every bucket column in one final scan-local ``select``
    against the broadcast fences: the full-width frame is pinned once
    and never shuffled at all.  Assignment is bit-identical to SQL
    ntile's closed form: with N rows and B buckets bucket k ends at
    rank ``k*(N div B) + min(k, N mod B)``; a row's bucket is 1 + the
    number of fences strictly before it in the spec's order (fences
    are kept as a MULTISET so B > N degrades exactly like ntile).
    """
    import functools

    for order_spec, n_buckets, bucket_col in specs:
        if int(n_buckets) < 1:
            raise ValueError(f"n_buckets={n_buckets!r} (must be >= 1) for {bucket_col!r}")
        for c, d in order_spec:
            if d not in ("asc", "desc"):
                raise ValueError(f"direction {d!r} for {c!r} (asc|desc)")
    # lazy pin: the count() below materializes it in the same job (r17)
    pinned = pin_frame(df, reliable=reliable, eager=False)
    n_total = pinned.count()

    def spec_col(spec):
        # one spec's fence computation: a rank job over a projection of
        # just this spec's order columns + a bounded fence collect.
        # Submitted from a driver thread (guide §2.6): the specs'
        # orders are INDEPENDENT, the pinned input is already
        # materialized, and each spec's chain is two small sequential
        # jobs whose tails would otherwise leave the executors idle —
        # overlapping them hides all but the slowest chain.  Results
        # are deterministic per spec, and assembly order below is the
        # caller's spec order, so concurrency never reorders output.
        order_spec, n_buckets, bucket_col = spec
        b = int(n_buckets)
        q_, r_ = divmod(n_total, b)
        ends = [k * q_ + min(k, r_) for k in range(1, b)]
        if n_total == 0 or b == 1 or ends[-1] == 0:
            return F.lit(1).cast("int").alias(bucket_col)
        names = [c for c, _ in order_spec]
        order_cols = [
            F.col(c).asc() if d == "asc" else F.col(c).desc() for c, d in order_spec
        ]
        ranked = exact_global_rank(
            pinned.select(*names), order_cols, rank_col="__rk",
            num_partitions=num_partitions, reliable=reliable,
        )
        distinct_ends = sorted({e for e in ends if e >= 1})
        by_rank = {
            row["__rk"]: row
            for row in ranked.filter(F.col("__rk").isin(distinct_ends)).collect()
        }
        fences = [by_rank[e] for e in ends if e >= 1]

        def after_fence(frow, order_spec=order_spec):
            # row strictly AFTER the fence tuple in this spec's order:
            # lexicographic expansion, direction-aware per column
            terms, prefix = [], F.lit(True)
            for c, d in order_spec:
                fv = F.lit(frow[c])
                cmp = (F.col(c) > fv) if d == "asc" else (F.col(c) < fv)
                terms.append(prefix & cmp)
                prefix = prefix & (F.col(c) == fv)
            return functools.reduce(lambda a, t: a | t, terms)

        bexpr = functools.reduce(
            lambda acc, fr: acc + after_fence(fr).cast("int"), fences, F.lit(1)
        )
        return bexpr.cast("int").alias(bucket_col)

    if len(specs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark.util import inheritable_thread_target

        # 2-3 chains in flight is the guide's guidance — enough to
        # back-fill stage tails, not enough to thrash the scheduler.
        # The target is wrapped inheritable (ADVICE r17 #3): under
        # pinned-thread mode a plain pool thread starts with EMPTY
        # JVM thread-locals, so a caller's job group / scheduler pool
        # would not cover the concurrent fence jobs (cancelJobGroup
        # would miss them); the wrapper copies the caller thread's
        # local properties into each worker invocation.
        with ThreadPoolExecutor(max_workers=min(3, len(specs))) as pool:
            out_cols = list(
                pool.map(inheritable_thread_target(df.sparkSession)(spec_col), specs)
            )
    else:
        out_cols = [spec_col(s) for s in specs]
    return pinned.select("*", *out_cols)


def approx_value_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    bucket_col: str = "bucket",
    accuracy: int = 10_000,
) -> DataFrame:
    """The documented 100 TB swap for ``exact_global_ntile`` (VERDICT
    r8 #6): bucket rows by percentile FENCES from one
    ``percentile_approx`` sketch aggregate — a map-side-combinable
    scan, a broadcast one-row fence frame, and a scan-local bucket
    assignment.  NO range shuffle, NO sort, NO checkpoint: the only
    data movement is the sketch merge.

    Semantics differ from ntile exactly where approximation is the
    point: buckets are VALUE intervals (``1 + #fences < value``), so
    ties on a fence value stay together instead of being split by
    rank, and bucket sizes are equal only up to sketch error.  With
    ``accuracy`` above the row count the Greenwald-Khanna summary
    stores every value and the fences are the exact discrete
    quantiles (DuckDB ``quantile_disc`` returns the identical
    elements — which is what makes the q146 oracle pairing
    tolerance-free at test scale); at the default 10k it is a true
    sketch whose memory stays bounded at any data size."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    fences = df.agg(
        F.percentile_approx(value_col, probs, accuracy).alias("__fences")
    )
    # Column-API higher-order filter (not an expr string): the lambda
    # variable lives in its own namespace, so no column name — not even
    # one called "f" — can shadow or be shadowed
    n_below = F.size(F.filter("__fences", lambda fence: fence < F.col(value_col)))
    return (
        df.crossJoin(F.broadcast(fences))
        .withColumn(bucket_col, (F.lit(1) + n_below).cast("int"))
        .drop("__fences")
    )


def exact_prefix_agg(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    how: str = "sum",
    cum_col: str = "cum",
    rank_col: str | None = None,
    num_partitions: int | None = None,
    exclusive: bool = False,
    reliable: bool | None = None,
    total_col: str | None = None,
    n_total_col: str | None = None,
) -> DataFrame:
    """Exact running sum/max/min over a total order, distributed: local
    prefix aggregates inside each range partition (a window PARTITIONED
    by ``__pid`` — every sort task is one range chunk, never the whole
    table) plus broadcast per-partition offsets.  The value's exact
    type carries through (DECIMAL sums stay DECIMAL — the offsets
    frame is built from the collected ``Decimal`` values), so running
    DECIMAL ledgers keep their cross-engine bit-exactness.

    ``exclusive=True`` aggregates STRICTLY-preceding rows only (the
    first row in the total order gets NULL for max/min, the additive
    identity for sum) — the frame a sort-based skyline or
    "best-so-far" comparison needs.

    ``total_col`` / ``n_total_col`` (r18, guide §1.2): attach the
    GRAND aggregate of ``value_col`` / the total row count N as
    literal columns, typed exactly as a whole-frame ``agg`` of the
    same function would type them.  Both fall out of the offsets
    collect the machinery already runs, so callers that used to
    re-aggregate the whole input frame (often a full fact-table scan
    + groupBy) and ``crossJoin(broadcast(tot))`` it back in skip that
    entire pass.  ``total_col`` requires an exact value type (DECIMAL
    or integral): a float grand total folded partition-by-partition
    on the driver is not guaranteed bit-identical to the engine's own
    row-order sum, so it raises rather than silently drifting.  When
    ``rank_col`` is requested together with either total, the count
    offsets ride the same single job (previously a second offsets
    job)."""
    from pyspark.sql import Window

    fns = {"sum": F.sum, "max": F.max, "min": F.min}
    if how not in fns:
        raise ValueError(f"how={how!r} (sum|max|min)")
    fn = fns[how]
    parted = _range_parted_with_ids(df, order_cols, num_partitions, reliable=reliable)
    want_totals = total_col is not None or n_total_col is not None
    if want_totals or rank_col is not None:
        # one bounded job yields value offsets, count offsets and both
        # grand totals (r18 — was up to three separate passes)
        voff, vtotal, roff, n_total, vtype = _offsets_counts_with_totals(
            parted, fn(value_col), how
        )
        if total_col is not None and not (
            vtype.startswith("decimal")
            or vtype in ("int", "bigint", "smallint", "tinyint", "long")
        ):
            raise ValueError(
                f"total_col needs an exact value type (decimal/integral), got {vtype}"
            )
    else:
        voff = _cumulative_offsets(parted, fn(value_col), how).withColumnRenamed("__off", "__voff")
    hi = -1 if exclusive else 0
    w = (
        Window.partitionBy("__pid")
        .orderBy("__idx")
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = fn(value_col).over(w)
    if how == "sum":
        combined = F.coalesce(F.col("__voff"), F.lit(0)) + F.coalesce(local, F.lit(0))
    elif how == "max":
        combined = F.greatest(F.col("__voff"), local)
    else:
        combined = F.least(F.col("__voff"), local)
    out = parted.join(F.broadcast(voff), "__pid").withColumn(cum_col, combined)
    if rank_col is not None:
        out = out.join(F.broadcast(roff), "__pid").withColumn(
            rank_col, (F.col("__off") + F.col("__idx") + 1).cast("long")
        ).drop("__off")
    out = out.drop("__pid", "__idx", "__voff")
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(vtotal).cast(vtype))
    if n_total_col is not None:
        out = out.withColumn(n_total_col, F.lit(int(n_total)).cast("long"))
    return out


def exact_prefix_sum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    cum_col: str = "cum",
    rank_col: str | None = None,
    num_partitions: int | None = None,
    reliable: bool | None = None,
    total_col: str | None = None,
    n_total_col: str | None = None,
) -> DataFrame:
    """Inclusive exact running total — ``exact_prefix_agg(how='sum')``."""
    return exact_prefix_agg(
        df, order_cols, value_col, how="sum", cum_col=cum_col,
        rank_col=rank_col, num_partitions=num_partitions, reliable=reliable,
        total_col=total_col, n_total_col=n_total_col,
    )


def zorder_value(
    cols: list,
    mins: list[int],
    maxs: list[int],
    bits: int = 16,
):
    """Z-curve (Morton) key over 2-3 numeric columns: each value is
    leveled into ``bits``-bit cells by a pure-integer shift — down
    when the span overflows ``bits`` bits, UP when it underfills them
    (a 4-bit key must stretch across the same bit positions as a
    20-bit one or the interleave degenerates to a single-column sort);
    no doubles anywhere, so micro-timestamp keys beyond 2^53 level
    exactly.  Then the columns' bits interleave.  Sorting by this key clusters rows that
    are close in EVERY dimension, which is what makes multi-column
    min/max pruning work where a single sort key only helps itself."""
    if not 2 <= len(cols) <= 3:
        raise ValueError(f"zorder interleaves 2-3 columns, got {len(cols)}")
    if len(mins) != len(cols) or len(maxs) != len(cols):
        raise ValueError("mins/maxs must match cols")
    n = len(cols)
    levels = (1 << bits) - 1
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        c = F.col(c) if isinstance(c, str) else c
        lo, hi = int(lo), int(hi)
        span = max(hi - lo, 1)
        shift = span.bit_length() - bits
        base = c.cast("long") - F.lit(lo)
        lvl = F.shiftright(base, shift) if shift >= 0 else F.shiftleft(base, -shift)
        scaled.append(F.least(F.lit(levels), lvl))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, sc in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(sc, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 64,
    bits: int = 16,
    mode: str = "overwrite",
    partition_by: str | list[str] | None = None,
) -> None:
    """Lay a table out along a Z-curve over ``cols`` so that per-file
    min/max statistics prune scans filtered on ANY of them — the
    layout move for the second and third filter column, where date
    partitioning (first column) and a linear sort (one column) stop
    helping.  ``repartitionByRange`` on the z-key gives files covering
    disjoint curve segments; the within-file sort tightens footer
    stats further.

    The column min/max pair used for scaling is one 2·k-value
    aggregate (never row data).  Linear scaling assumes roughly
    uniform key ranges — for heavy skew, rank-based leveling (ntile)
    would balance better at the cost of a full sort.

    ``partition_by`` (VERDICT r11 #5) is the 100 TB path: hive-style
    partition dirs with the z-layout applied WITHIN each partition —
    min/max computed per partition (one groupBy row per partition
    value: partition-metadata-sized, like the Hive catalog itself),
    each value leveled against its OWN partition's span (a global
    span would waste the level bits of every partition whose local
    range is a narrow slice of it), and the range shuffle keyed on
    (partition, z) so each output task — hence each written file —
    covers one partition's contiguous curve segment.  A later
    re-z-order of one day rewrites one dir, not the table."""
    if partition_by is None:
        row = df.agg(
            *[F.min(F.col(c).cast("long")).alias(f"__lo_{c}") for c in cols],
            *[F.max(F.col(c).cast("long")).alias(f"__hi_{c}") for c in cols],
        ).collect()[0]
        mins = [row[f"__lo_{c}"] for c in cols]
        maxs = [row[f"__hi_{c}"] for c in cols]
        z = zorder_value(list(cols), mins, maxs, bits=bits)
        (
            df.withColumn("__z", z)
            .repartitionByRange(n_files, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
            .write.mode(mode)
            .parquet(path)
        )
        return
    if not 2 <= len(cols) <= 3:
        raise ValueError(f"zorder interleaves 2-3 columns, got {len(cols)}")
    pby = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    overlap = set(pby) & set(cols)
    if overlap:
        raise ValueError(
            f"partition_by columns {sorted(overlap)} are already pruned by the "
            "partition dirs — z-order the NEXT filter columns instead"
        )
    # one row per live partition: bounded metadata, not row data
    bounds = (
        df.groupBy(*pby)
        .agg(
            *[F.min(F.col(c).cast("long")).alias(f"__lo_{c}") for c in cols],
            *[F.max(F.col(c).cast("long")).alias(f"__hi_{c}") for c in cols],
        )
        .collect()
    )
    # per-(partition, col) shift precomputed driver-side (the shift is
    # span.bit_length()-bits — integer arithmetic the SQL layer lacks),
    # then shipped back as a broadcast frame: every row levels against
    # its own partition's bounds as a plain column expression
    spark = df.sparkSession
    brows = []
    for r in bounds:
        rec = [r[p] for p in pby]
        for c in cols:
            lo = int(r[f"__lo_{c}"]) if r[f"__lo_{c}"] is not None else 0
            hi = int(r[f"__hi_{c}"]) if r[f"__hi_{c}"] is not None else 0
            span = max(hi - lo, 1)
            rec += [lo, span.bit_length() - bits]
        brows.append(tuple(rec))
    bschema = df.select(
        *pby,
        *[e for c in cols for e in (
            F.lit(0).cast("long").alias(f"__lo_{c}"),
            F.lit(0).cast("int").alias(f"__sh_{c}"),
        )],
    ).schema
    bdf = spark.createDataFrame(brows, bschema)
    # null-safe membership: a NULL partition value is a legal hive
    # partition (__HIVE_DEFAULT_PARTITION__) and must not vanish
    # through an equi-join
    cond = functools.reduce(
        lambda a, b: a & b, [df[p].eqNullSafe(bdf[p]) for p in pby]
    )
    leveled = df.join(F.broadcast(bdf), cond)
    for p in pby:
        leveled = leveled.drop(bdf[p])
    levels = (1 << bits) - 1
    zcols = []
    for c in cols:
        sh = F.col(f"__sh_{c}")
        lvl = F.when(
            sh >= 0, F.expr(f"shiftright(CAST({c} AS LONG) - __lo_{c}, __sh_{c})")
        ).otherwise(F.expr(f"shiftleft(CAST({c} AS LONG) - __lo_{c}, -__sh_{c})"))
        zcols.append(F.least(F.lit(levels), F.coalesce(lvl, F.lit(0))))
    n = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, sc in enumerate(zcols):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(sc, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    helper = [f"__lo_{c}" for c in cols] + [f"__sh_{c}" for c in cols]
    (
        leveled.withColumn("__z", z)
        .repartitionByRange(n_files, *[F.col(p) for p in pby], F.col("__z"))
        .sortWithinPartitions(*pby, "__z")
        .drop("__z", *helper)
        .write.mode(mode)
        .partitionBy(*pby)
        .parquet(path)
    )


def exact_global_percentiles(
    df: DataFrame,
    value_col: str,
    ps: list,
    num_partitions: int | None = None,
    reliable: bool | None = None,
) -> DataFrame:
    """Exact linearly-interpolated percentiles (the type-7 definition
    Spark ``percentile`` and DuckDB ``quantile_cont`` share) of one
    numeric column over the WHOLE frame, distributed.

    Spark's own ``percentile(col, p)`` aggregate is exact but buffers
    EVERY value in a single aggregation state — fine per-group (q57,
    q102), a driver/executor-memory killer as a GLOBAL aggregate at
    100 TB.  This instead rides the exact-rank machinery: range
    shuffle + broadcast offsets give every row its global rank, the
    <= 2*len(ps) rows sitting at the percentile cut ranks are filtered
    out (a broadcast-able frame), and the interpolation
    ``v_lo + frac * (v_hi - v_lo)`` runs as a plain column expression
    against the broadcast spec table.  No window, no global sort
    task, no value buffer anywhere.

    Returns (p DOUBLE, value DOUBLE) one row per requested percentile.
    NULLs are excluded (the percentile() convention).  The rank
    arithmetic is integral; the only floats are (n-1)*p and the final
    interpolation — both single IEEE expressions an oracle can
    replicate verbatim."""
    import math

    for p in ps:
        if not (0.0 <= float(p) <= 1.0):
            raise ValueError(f"percentile {p!r} outside [0, 1]")
    vals = df.select(F.col(value_col).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    parted = _range_parted_with_ids(
        vals, [F.col("__v").asc()], num_partitions, reliable=reliable
    )
    # N rides the offsets collect — no separate count job (r17)
    offsets, n_total = _cumulative_offsets_with_total(parted, F.count(F.lit(1)))
    ranked = (
        parted.join(F.broadcast(offsets), "__pid")
        .withColumn("__rk", (F.col("__off") + F.col("__idx") + 1).cast("long"))
        .drop("__pid", "__idx", "__off")
    )
    n = int(n_total)
    if n == 0:
        raise ValueError("exact_global_percentiles of an empty/all-NULL column")
    specs = []
    for p in ps:
        h = (n - 1) * float(p)
        lo = int(math.floor(h)) + 1
        hi = min(lo + 1, n)
        specs.append((float(p), lo, hi, h - math.floor(h)))
    spark = df.sparkSession
    spec_df = spark.createDataFrame(specs, "p double, __lo long, __hi long, __frac double")
    need = sorted({r for _, lo, hi, _ in specs for r in (lo, hi)})
    picked = F.broadcast(ranked.filter(F.col("__rk").isin(need)))
    return (
        spec_df.join(
            picked.select(F.col("__rk").alias("__lo"), F.col("__v").alias("__vlo")), "__lo"
        )
        .join(picked.select(F.col("__rk").alias("__hi"), F.col("__v").alias("__vhi")), "__hi")
        .select(
            "p",
            (F.col("__vlo") + F.col("__frac") * (F.col("__vhi") - F.col("__vlo"))).alias("value"),
        )
    )
