"""Structured Streaming surface (SURVEY.md §2.7).

The reference is batch micro-snapshot (one run per day per source),
but its semantics map directly onto Structured Streaming, and the
100 TB north star needs the streaming forms:

- T1 daily cadence        -> ``incremental_ingest``: readStream over the
                             date-partitioned landing dir with
                             ``trigger(availableNow=True)`` — processes
                             exactly the unseen files, checkpointed, the
                             streaming equivalent of the reference's
                             run-slice idempotence guard (T2).
- windowed aggregation    -> ``windowed_event_counts``: event-time
                             tumbling windows + watermark for late data
                             (the reference has no event-time handling;
                             this is the declared-surface completion).
- T4 SCD2-as-state        -> ``streaming_latest_state``: per-key latest
                             value via stateful dedup, the streaming
                             twin of the batch SCD2 current-version set.

All transformations are expressed on the streaming DataFrame exactly
as on the batch one — the engine's operators are trigger-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import FEED_SCHEMA


def incremental_ingest(
    spark: SparkSession,
    landing_base: str,
    checkpoint_dir: str,
    output_dir: str,
    max_files_per_trigger: int | None = None,
):
    """File-source incremental ingest of the landing zone: each
    ``availableNow`` run picks up only files the checkpoint hasn't seen
    (replaces the reference's control-table duplicate-run guard with
    the streaming commit log).  Returns the finished StreamingQuery.
    """
    # partition columns (id_config, dt) come from the directory layout —
    # they must NOT be in the explicit schema or the source errors with
    # COLUMN_ALREADY_EXISTS
    reader = (
        spark.readStream.option("header", True)
        .option("basePath", landing_base)
        .schema(FEED_SCHEMA)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.csv(f"{landing_base}/id_config=*/dt=*")

    from ..functions.cleansing import cleanse_feed

    cleansed = cleanse_feed(raw)
    q = (
        cleansed.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("dt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Event-time windowed counts with a watermark: late rows beyond
    ``watermark`` are dropped and their windows finalized.  ``slide``
    makes the windows overlap (e.g. 1-hour windows every 15 minutes —
    the alerting shape, q97); default is tumbling.  Works identically
    on a batch DataFrame (watermark is a no-op there), so the same
    query is testable batch-first."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration, slide or window_duration).alias("win"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_latest_state(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key latest value — the streaming twin of the SCD2 current
    set.  Batch form: max_by over the key.  In a live stream the same
    result comes from ``dropDuplicatesWithinWatermark``/output-mode
    update on this aggregation."""
    return events.groupBy(key_col).agg(
        F.max_by(value_col, F.struct(F.col(ts_col), F.col("event_id"))).alias("latest_value"),
        F.max(ts_col).alias("latest_ts"),
    )


def sessionize_events(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessionization via the built-in ``session_window``
    (the Spark-first form — no custom state, runs identically on a
    batch DataFrame and a watermarked stream; the one operator shape
    that covers both the q21 batch sessionizer and its streaming twin).

    A session is a maximal run of same-key events whose consecutive
    gaps are <= ``gap``: each event spans ``[ts, ts + gap)`` and
    Spark merges spans that overlap OR touch, so an event at exactly
    ``prev + gap`` still merges — identical to q21's lag rule, which
    splits only on ``gap > threshold``.  Pinned by the boundary test
    and the q21 batch-equivalence test.

    Returns one row per (key, session): session_start, session_end,
    n_events.  In streaming, pass ``watermark`` so closed sessions
    finalize and state is evicted — per-key state is bounded by OPEN
    sessions only, which is what makes this viable on an unbounded
    stream (vs. the batch window-function form, which needs the whole
    key partition sorted).
    """
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("session"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_scd2_current(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """T4 as a real stateful stream: per-key current value maintained in
    the state store across micro-batches via ``applyInPandasWithState``
    (the custom-stateful-operator escape hatch — the one place the
    engine deliberately runs Python, because Spark has no built-in
    "emit only on change" operator).

    Emits one row per key per micro-batch in which the key's current
    value CHANGED (the streaming analogue of the SCD2 close+insert
    pair).  Output: (key, value, ts).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} long, {value_col} double, {ts_col} timestamp"
    state_schema = "value double, ts timestamp"

    def update(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values([ts_col])
        newest = rows.iloc[-1]
        if state.exists:
            (cur_value, cur_ts) = state.get
        else:
            cur_value, cur_ts = None, None
        new_ts = newest[ts_col]
        if cur_ts is None or (new_ts is not None and new_ts > cur_ts):
            if cur_value is None or newest[value_col] != cur_value:
                state.update((float(newest[value_col]), new_ts))
                yield pd.DataFrame(
                    {key_col: [key[0]], value_col: [newest[value_col]], ts_col: [new_ts]}
                )

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def _scd2_step(state, v: float, load_date, sentinel, key, key_col: str, value_col: str):
    """One SCD2 state transition — the pure core shared by BOTH stateful
    APIs (applyInPandasWithState and transformWithStateInPandas), so
    their emission contracts cannot drift.

    ``state`` is (value, load_date_iso, seq) or None.  Returns
    (new_state | None, emission DataFrame | None): None state = keep,
    None emission = unchanged key.
    """
    import pandas as pd

    if state is None:
        return (v, load_date.isoformat(), 1), pd.DataFrame(
            {key_col: [key], value_col: [v],
             "dt_load_to_dw": [load_date], "dt_last_update": [sentinel],
             "version_seq": [1]}
        )
    cur_v, cur_load, cur_seq = state
    if v != cur_v:
        import datetime as _dt

        prior = _dt.date.fromisoformat(cur_load)
        return (v, load_date.isoformat(), cur_seq + 1), pd.DataFrame(
            {key_col: [key, key], value_col: [cur_v, v],
             "dt_load_to_dw": [prior, load_date], "dt_last_update": [load_date, sentinel],
             "version_seq": [cur_seq, cur_seq + 1]}
        )
    return None, None


def streaming_scd2_changes(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    run_date_col: str = "run_date",
    open_sentinel: str = "9999-12-31",
):
    """Full SCD2 over a change stream (VERDICT r1 #9): per micro-batch
    and key, compare the newest row against the keyed state and emit the
    complete close+insert pair —

      new key          -> one OPEN row  (load=run_date, last=sentinel)
      changed value    -> one CLOSE row (load=prior load, last=run_date)
                          + one OPEN row (load=run_date, last=sentinel)
      unchanged        -> nothing

    The emission stream is an upsert log keyed on (key, version_seq),
    where ``version_seq`` is a per-key monotonic version counter held in
    the state: a version's CLOSE row supersedes its earlier OPEN row.
    The counter — not (key, dt_load_to_dw) — is the upsert key because
    two value changes can land in the same run_date (two micro-batches
    in one day); a date-keyed reconcile would collapse those into one
    row with an arbitrary value and silently drop the newest open
    version (ADVICE r2).  Reconcile with ``scd2_changes_to_table`` (or
    any keyed upsert sink) and the result is row-identical to replaying
    the same snapshots through the batch ``scd2_merge`` — proven by the
    batch-equivalence test.

    State is (value, load_date, seq) per key — bounded by live keys,
    exactly the TxTable current-set bound, so a 100 TB history never
    enters the state store.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} long, {value_col} double, dt_load_to_dw date, dt_last_update date, "
        "version_seq long"
    )
    state_schema = "value double, load_date string, seq long"

    def update(key, pdfs, state: GroupState):
        import datetime as _dt

        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values([ts_col])
        newest = rows.iloc[-1]
        v = float(newest[value_col])
        d = newest[run_date_col]
        d = d if isinstance(d, _dt.date) else _dt.date.fromisoformat(str(d))
        sentinel = _dt.date.fromisoformat(open_sentinel)

        new_state, emission = _scd2_step(
            state.get if state.exists else None, v, d, sentinel, key[0], key_col, value_col
        )
        if new_state is not None:
            state.update(new_state)
        if emission is not None:
            yield emission

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_scd2_changes_tws(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    run_date_col: str = "run_date",
    open_sentinel: str = "9999-12-31",
):
    """``streaming_scd2_changes`` on the transformWithStateInPandas API
    (Spark 4.x's arbitrary-stateful-processing successor to
    ``applyInPandasWithState``): identical emission contract — version_seq
    keyed close+insert pairs — so ``scd2_changes_to_table`` reconciles
    either operator's log.  Needs the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``); the
    applyInPandasWithState form runs on the default provider.

    Kept alongside the original rather than replacing it: the TWS API
    adds per-state-variable handles, TTL and timers — room for the
    engine's stateful operators to grow (session gaps, per-key
    expiry) — while the legacy operator stays for clusters pinned to
    the HDFS-backed store.  Both delegate the state transition to
    ``_scd2_step`` (pure, unit-tested), so the two emission contracts
    are one implementation.  NB: the TWS state-server protocol needs
    the ``protobuf`` package on the Python workers (PySpark's generated
    ``StateMessage_pb2`` imports the real ``google.protobuf`` runtime);
    where it is absent this raises immediately with the remedy instead
    of failing opaquely inside an executor mid-stream — use
    ``streaming_scd2_changes`` (same emission contract, no protobuf)
    there.  The equivalence test runs only where protobuf exists; the
    fail-fast path and the shared ``_scd2_step`` core are tested
    everywhere (COVERAGE.md §2.7 T4).
    """
    import datetime as _dt

    import pandas as pd

    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "streaming_scd2_changes_tws needs the 'protobuf' package on the "
            "driver and Python workers (transformWithStateInPandas state "
            "protocol). Install protobuf, or use streaming_scd2_changes — "
            "the applyInPandasWithState twin with the identical emission "
            "contract."
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = (
        f"{key_col} long, {value_col} double, dt_load_to_dw date, dt_last_update date, "
        "version_seq long"
    )
    sentinel = _dt.date.fromisoformat(open_sentinel)

    class Scd2Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("scd2", "value double, load_date string, seq long")

        def handleInputRows(self, key, rows, timerValues):
            pdf = pd.concat(list(rows), ignore_index=True)
            if pdf.empty:
                return
            pdf = pdf.sort_values([ts_col])
            newest = pdf.iloc[-1]
            v = float(newest[value_col])
            d = newest[run_date_col]
            d = d if isinstance(d, _dt.date) else _dt.date.fromisoformat(str(d))

            new_state, emission = _scd2_step(
                self._state.get() if self._state.exists() else None,
                v, d, sentinel, key[0], key_col, value_col,
            )
            if new_state is not None:
                self._state.update(new_state)
            if emission is not None:
                yield emission

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        Scd2Processor(), out_schema, "append", "None"
    )


def scd2_changes_to_table(
    changes: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Reconcile a ``streaming_scd2_changes`` emission log into the SCD2
    table: per (key, version_seq) version, the CLOSE row (if any)
    supersedes the OPEN row — min(dt_last_update) picks it, because a
    close date always sorts before the open sentinel; value and load
    date are constant within a version.  One shuffle on the version
    key.  Keyed on the sequence (not the load date) so two changes in
    one run_date stay two distinct versions (ADVICE r2)."""
    return changes.groupBy(key_col, "version_seq").agg(
        F.min(value_col).alias(value_col),
        F.min("dt_load_to_dw").alias("dt_load_to_dw"),
        F.min("dt_last_update").alias("dt_last_update"),
    ).drop("version_seq")


def _replayed_batch(table, batch_id: int) -> bool:
    """Shared exactly-once guard for the foreachBatch ingest loops:
    True = this micro-batch's commit is already visible (skip it).

    A genuine crash-replay re-delivers exactly the LAST committed id;
    ids restarting far below it mean a FRESH checkpoint was pointed at
    an existing table, and treating those batches as replays would
    silently drop ALL of them (ADVICE r6) — the table must be reset
    (or moved) together with the checkpoint, same as Delta's
    txnVersion/txnAppId contract."""
    man = table.manifest() or {}
    last = man.get("last_batch_id")
    if last is None or batch_id > last:
        return False
    if batch_id < last:
        raise ValueError(
            f"batch_id={batch_id} is behind the table's last_batch_id={last} "
            "by more than a crash-replay: this is a fresh checkpoint pointed "
            "at an existing table; reset or relocate one of them"
        )
    return True


def make_corpus_ingest_processor(
    corpus,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_punct: float = 0.2,
    gopher_rules: bool = False,
    use_bloom: bool = False,
    near_dedup: bool = False,
    near_threshold: float = 0.8,
    compression_band: tuple | None = None,
    contract=None,
):
    """The foreachBatch body of ``streaming_corpus_ingest``, exposed so
    its replay/idempotence contract is directly testable.

    Per micro-batch: quality-gate (row-local, runs at the scan) ->
    keep-first dedup within the batch AND against every fingerprint
    already committed to the corpus (one anti-join on the md5 key) ->
    append the survivors, with their fingerprint column, as one
    transactional TxTable segment.

    Exactly-once: the committed manifest records ``last_batch_id``; a
    replayed micro-batch (foreachBatch re-runs after a crash between
    the commit and the checkpoint advancing) sees its own id already
    recorded and becomes a no-op.  The corpus table and the stream
    checkpoint therefore move together — reprocessing from a FRESH
    checkpoint into an existing table must also reset the table (the
    same pairing Delta's txnVersion/txnAppId idempotent writes
    require).

    ``contract``: optional list of ``df -> check frame`` callables
    (``operators/expectations``) evaluated against each batch's
    SURVIVORS before the commit — a violated contract raises and FAILS
    the micro-batch (stop-the-line semantics: the checkpoint does not
    advance, nothing publishes, and the stream surfaces the error; the
    quality gate above is for expected noise, the contract for
    must-never-happen invariants).

    Scale shape: the existing-fingerprint side is a column-pruned scan
    of the corpus segments (only the ~32-byte md5 column is read), the
    anti-join keys are uniform md5 strings (no skew), and each batch
    appends one segment — ``compact_closed`` bin-packs them when small
    batches accumulate.
    """
    from ..functions.text import doc_fingerprint, punct_ratio, token_count
    from ..operators.dedup import incremental_exact_dedup

    # use_bloom: serve the dedup's membership pre-filter from the
    # persistent sidecar (operators/bloomindex.py) — each micro-batch
    # folds in only the segments appended since the last one (O(delta)
    # via read_closed_delta), instead of re-scanning the corpus
    # fingerprints per batch.  Result-identical: the bloom only routes
    # rows, the exact anti-join still decides.
    bloom_index = None
    if use_bloom:
        from ..operators.bloomindex import BloomFingerprintIndex

        bloom_index = BloomFingerprintIndex(corpus)

    # near_dedup: ALSO drop paraphrase-level copies (exact shingle
    # Jaccard >= near_threshold) of the settled corpus or of a lower-id
    # batch row, via the persistent MinHash band sidecar — sync() per
    # micro-batch folds only the segments the previous batches
    # committed (O(delta), the near-dup twin of use_bloom)
    mh_index = None
    if near_dedup:
        from ..operators.minhashindex import MinHashBandIndex

        mh_index = MinHashBandIndex(
            corpus, text_col=text_col, id_col=id_col, threshold=near_threshold
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if _replayed_batch(corpus, batch_id):
            return  # replayed micro-batch: commit already visible
        gated = batch_df.filter(
            (token_count(text_col) >= min_tokens) & (punct_ratio(text_col) < max_punct)
        )
        if gopher_rules:
            # same composition as the batch curate_corpus: the rule
            # gate stays in the scan-local pass of each micro-batch
            from ..functions.text import gopher_quality_gate

            gated = gated.filter(gopher_quality_gate(text_col, min_words=min_tokens))
        if compression_band is not None:
            # the q223 byte-level screen as an ingest gate: ratios below
            # the band are degenerate repetition (lorem loops, keyword
            # stuffing) that token-level rules under-catch; ratios above
            # it are random/already-compressed bytes.  Arrow-batched,
            # scan-local — rides the same micro-batch pass as the rules
            from ..operators.profile import with_compression_ratio

            lo, hi = compression_band
            gated = with_compression_ratio(gated, text_col, "__zratio").filter(
                F.col("__zratio").between(lo, hi)
            ).drop("__zratio")
        if bloom_index is not None:
            survivors = bloom_index.dedup(gated, text_col, id_col)
        elif corpus.exists():
            existing = corpus.read().select("fingerprint")
            survivors = incremental_exact_dedup(
                gated, existing, text_col, id_col, existing_is_fingerprints=True
            )
        else:
            survivors = incremental_exact_dedup(
                gated, gated.limit(0).select(F.lit("").alias("fingerprint")),
                text_col, id_col, existing_is_fingerprints=True,
            )
        if mh_index is not None:
            mh_index.sync()
            survivors = mh_index.dedup(survivors)
        delta = survivors.withColumn("fingerprint", doc_fingerprint(text_col))
        if contract:
            from ..operators.expectations import enforce

            # checks + write are separate actions: checkpoint the batch
            # plan once so the validated rows ARE the written rows
            delta = delta.localCheckpoint(eager=False)
            enforce([fn(delta) for fn in contract])
        corpus.commit_append(
            delta, run_id=f"batch{batch_id}", extra={"last_batch_id": batch_id}
        )

    return process


def streaming_corpus_ingest(
    spark: SparkSession,
    landing_glob: str,
    schema: str,
    corpus,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_punct: float = 0.2,
    max_files_per_trigger: int | None = None,
    gopher_rules: bool = False,
    use_bloom: bool = False,
    near_dedup: bool = False,
    near_threshold: float = 0.8,
    compression_band: tuple | None = None,
    source_format: str = "parquet",
    contract=None,
):
    """Incremental corpus curation as a stream: each ``availableNow``
    run picks up exactly the unseen landing files (checkpoint commit
    log), quality-gates them, dedups within the batch and against the
    whole already-ingested corpus, and appends the survivors as one
    atomic TxTable segment — the daily-crawl ingestion loop of a
    training-data pipeline, idempotent end to end.  Returns the
    finished StreamingQuery.

    ``source_format``: "parquet" (default) or "json" (JSONL landing —
    the crawl-interchange format; malformed lines become all-null rows
    under PERMISSIVE and die at the quality gate rather than killing
    the stream)."""
    if source_format not in ("parquet", "json"):
        raise ValueError(f"source_format must be parquet or json, got {source_format}")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if source_format == "json":
        stream = reader.option("mode", "PERMISSIVE").json(landing_glob)
    else:
        stream = reader.parquet(landing_glob)
    q = (
        stream.writeStream.foreachBatch(
            make_corpus_ingest_processor(
                corpus, text_col, id_col, min_tokens, max_punct, gopher_rules,
                use_bloom=use_bloom, near_dedup=near_dedup,
                near_threshold=near_threshold,
                compression_band=compression_band, contract=contract,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def make_embedding_ingest_processor(
    index,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    expected_dim: int | None = None,
    threshold: float = 0.95,
    planes: list[list[float]] | None = None,
    bands: int = 4,
):
    """The foreachBatch body of ``streaming_embedding_ingest`` — the
    vector-table twin of the corpus ingest loop, sharing its
    exactly-once ``last_batch_id`` guard.

    Per micro-batch: health-gate (drop null / zero-norm / wrong-dim
    vectors — the q74 signals, applied as a filter) -> semantic dedup
    within the batch AND against every vector already committed
    (``incremental_embedding_dedup``: broadcast-exact by default, the
    hyperplane-banded path with ``planes`` at scale) -> append the
    survivors as one transactional TxTable segment.

    The committed index only ever holds gated, deduplicated vectors, so
    downstream ANN (q18/q34/q45) never sees degenerate rows; the
    existing side of the dedup reads ONLY the vector column of the
    index segments (column-pruned scan).
    """
    from ..operators.dedup import incremental_embedding_dedup
    from ..operators.similarity import norm

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if _replayed_batch(index, batch_id):
            return
        v = F.col(vec_col)
        gated = batch_df.filter(v.isNotNull() & (norm(v) > 1e-12))
        if expected_dim is not None:
            gated = gated.filter(F.size(v) == expected_dim)
        existing = (
            index.read().select(vec_col)
            if index.exists()
            else gated.limit(0).select(vec_col)
        )
        survivors = incremental_embedding_dedup(
            gated, existing, vec_col, id_col, threshold, planes, bands
        )
        index.commit_append(
            survivors, run_id=f"batch{batch_id}", extra={"last_batch_id": batch_id}
        )

    return process


def streaming_embedding_ingest(
    spark: SparkSession,
    landing_glob: str,
    schema: str,
    index,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    expected_dim: int | None = None,
    threshold: float = 0.95,
    planes: list[list[float]] | None = None,
    bands: int = 4,
    max_files_per_trigger: int | None = None,
):
    """Incremental embedding-index maintenance as a stream: each
    ``availableNow`` run picks up the unseen landing files, drops
    degenerate vectors, semantically dedups against the whole index,
    and appends one atomic TxTable segment — idempotent end to end,
    exactly like the text-corpus loop."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(landing_glob)
    q = (
        stream.writeStream.foreachBatch(
            make_embedding_ingest_processor(
                index, vec_col, id_col, expected_dim, threshold, planes, bands
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def make_drift_monitor_processor(
    reference: DataFrame,
    reports,
    group_col: str = "source",
    value_col: str = "n_chars",
    bin_width: int = 400,
    n_bins: int = 5,
    alarm_chi2: float | None = None,
    on_alarm=None,
):
    """foreachBatch body that scores every micro-batch's value
    histogram against a settled REFERENCE slice (q103's
    `histogram_drift`, per batch) and appends one report segment per
    batch to the ``reports`` TxTable — the distribution-drift alarm
    wired INTO the ingest loop instead of a nightly query.  Each report
    row is (group, n_ref, n_cand, chi2, batch_id); ``alarm_chi2`` plus
    an ``on_alarm(rows)`` hook turns threshold crossings into pages
    (the hook receives the report-sized row list, never batch data).

    Replay-safe like the corpus ingest: a replayed micro-batch sees its
    batch_id already recorded and becomes a no-op, so crash/retry never
    double-reports.  The reference histogram is dimension-sized and
    re-aggregated per batch from the (tiny) reference frame — persist
    the reference beforehand if it derives from an expensive plan."""
    from ..operators.profile import histogram_drift

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if _replayed_batch(reports, batch_id):
            return
        bin_expr = F.least(
            F.floor(F.col(value_col) / bin_width), F.lit(n_bins - 1)
        ).cast("int")
        report = histogram_drift(reference, batch_df, group_col, bin_expr).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        rows = report.collect()  # report is |groups|-sized, never batch data
        out = batch_df.sparkSession.createDataFrame(rows, report.schema)
        reports.commit_append(out, run_id=f"drift{batch_id}", extra={"last_batch_id": batch_id})
        if alarm_chi2 is not None and on_alarm is not None:
            hot = [r for r in rows if r["chi2"] is not None and r["chi2"] > alarm_chi2]
            if hot:
                on_alarm(hot)

    return process


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    tolerance: str = "15 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    join_type: str = "inner",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join: each left row matches
    right rows with the same key whose timestamp falls in
    ``[left_ts, left_ts + tolerance]`` — the attribution/enrichment
    primitive (impression -> click within N minutes, order ->
    first shipment, sensor -> acknowledgment).

    This is the one Structured Streaming surface the rest of the
    module doesn't reach: both sides buffer state, and it is the
    TIME-RANGE predicate plus the two watermarks that let Spark evict
    it — a left row can stop waiting once the right watermark passes
    ``left_ts + tolerance``, so state is bounded by (watermark +
    tolerance) x arrival rate, never by stream length.  Without the
    range condition Spark would (rightly) refuse to plan the join as
    unbounded-state.

    Column names must be disjoint across the two sides (rename before
    calling) — the join keeps both key columns so outer rows stay
    attributable.  ``join_type`` may be ``inner`` / ``leftOuter`` /
    ``rightOuter`` / ``fullOuter`` per Spark's stream-stream support
    matrix; outer results for a row emit only after its side's
    watermark closes the possibility of a future match.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint for a stream-stream "
            f"join (both sides are kept); rename {sorted(overlap)} first"
        )
    l = left.withWatermark(left_ts, left_watermark)
    r = right.withWatermark(right_ts, right_watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {tolerance}"))
    )
    return l.join(r, cond, join_type)


def make_kmv_distinct_processor(
    sketches,
    group_col: str,
    value_col: str,
    k: int = 64,
    seed: int = 77,
):
    """foreachBatch body maintaining per-group KMV distinct-count
    sketches in the ``sketches`` TxTable — streaming COUNT DISTINCT
    with O(k) state per group and NO per-value state store, because
    KMV merges losslessly: merge(batch sketch, stored sketch) equals
    the sketch of everything ever seen, EXACTLY (`operators.sketches`,
    q353's theorem).  flatMapGroupsWithState-style per-value dedup
    state would grow with true cardinality; this stays k doubles per
    group forever, and the estimate after any number of micro-batches
    is BIT-IDENTICAL to a batch `kmv_sketch` over the union of all
    batches — the equivalence the test pins.

    Replay-safe like the other sidecars: a replayed micro-batch id is
    a no-op (crash/retry never double-merges).  Each batch commits one
    snapshot of the (group, kmv_mins, n_kept, kmv_estimate) table —
    group-count-sized, never batch-sized."""
    from ..operators.sketches import kmv_merge, kmv_sketch

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if _replayed_batch(sketches, batch_id):
            return
        batch_sk = kmv_sketch(batch_df, value_col, [group_col], k=k, seed=seed)
        if sketches.exists() and sketches.manifest() is not None:
            prior = sketches.read().select(group_col, "kmv_mins")
            merged = kmv_merge(
                batch_sk.select(group_col, "kmv_mins").unionByName(prior),
                [group_col],
                k=k,
            )
        else:
            merged = batch_sk
        out = merged.select(
            group_col,
            # normalize containsNull: collect_set-derived arrays are
            # non-null-element typed, round-tripped rows aren't — a
            # strict schema comparison would reject the second commit
            F.col("kmv_mins").cast("array<double>").alias("kmv_mins"),
            "n_kept",
            "kmv_estimate",
        )
        # sketch table is |groups| x k doubles — snapshot it whole
        rows = out.collect()
        frame = batch_df.sparkSession.createDataFrame(rows, out.schema)
        sketches.commit_snapshot(
            frame, run_id=f"kmv{batch_id}", extra={"last_batch_id": batch_id}
        )

    return process


def make_golden_record_processor(
    docs,
    labels,
    name_col: str = "title",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_iters: int = 25,
    freq=None,
    prefix=None,
):
    """foreachBatch body maintaining a STANDING golden-record
    resolution — the streaming sidecar of q371's incremental ER
    (VERDICT r15 #4), the `make_kmv_distinct_processor` discipline
    applied to entity clusters.

    Per micro-batch: `fuzzy.golden_records_incremental` folds the
    batch into the standing clusters (new-new self-join + bipartite
    probe against the standing corpus + connected components over
    star(old labels) ∪ new edges), then TWO guarded commits in a
    crash-safe order: the labels SNAPSHOT first (it is computed from
    old docs + the batch, so it never needs the batch to be in the
    docs table), the docs APPEND second.  Each table records its own
    ``last_batch_id``, so a crash between the commits replays into
    "labels done, docs pending" and the retry appends only the docs —
    exactly-once for both tables under foreachBatch's at-least-once
    replay.

    INVARIANT (the equivalence tests pin it): after ANY number of
    micro-batches, the labels table equals the full-batch recompute
    (`token_blocked_pairs` + `neardup_clusters`) over every document
    ever ingested — the star identity composes inductively, so the
    standing corpus's blocking self-join is never re-entered, batch
    after batch.

    Optional ``freq``/``prefix`` TxTables turn on the PERSISTED-INDEX
    probe (the A/B-measured faster path): the first batch freezes the
    epoch's token-frequency order into ``freq``; every batch probes
    the standing ``prefix`` keys instead of re-keying the standing
    corpus, then APPENDS its own keys computed under the frozen order
    (``fuzzy.token_prefix_keys`` — the shared-total-order requirement
    holds across the epoch by construction).  All four tables carry
    the batch-id guard, committed in dependency-safe order: labels,
    prefix, docs, freq-once."""
    from ..operators.fuzzy import golden_records_incremental, token_prefix_keys

    if (freq is None) != (prefix is None):
        raise ValueError("pass BOTH freq and prefix tables, or neither")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, name_col)
        use_index = freq is not None
        frozen = None
        if use_index and freq.exists() and freq.manifest() is not None:
            frozen = freq.read()
        if not _replayed_batch(labels, batch_id):
            if docs.exists() and docs.manifest() is not None:
                old_docs = docs.read().select(id_col, name_col)
            else:
                old_docs = spark.createDataFrame(
                    [], batch.schema
                )
            if labels.exists() and labels.manifest() is not None:
                old_labels = labels.read().select("node", "cluster_id")
            else:
                old_labels = spark.createDataFrame([], "node long, cluster_id long")
            old_index = None
            if (use_index and frozen is not None
                    and prefix.exists() and prefix.manifest() is not None):
                old_index = (frozen, prefix.read())
            new_labels = golden_records_incremental(
                old_labels, old_docs, batch, name_col, id_col,
                threshold=threshold, max_iters=max_iters,
                old_index=old_index,
            )
            # labels table is cluster-membership-sized; snapshot whole
            rows = new_labels.collect()
            labels.commit_snapshot(
                spark.createDataFrame(rows, new_labels.schema),
                run_id=f"gr{batch_id}", extra={"last_batch_id": batch_id},
            )
        if use_index:
            if frozen is None:
                # epoch start: THIS batch's vocabulary freezes the order
                from ..operators.fuzzy import build_token_prefix_index

                f0, _ = build_token_prefix_index(
                    batch, name_col, id_col, threshold
                )
                freq.commit_snapshot(
                    f0, run_id=f"gr{batch_id}",
                    extra={"last_batch_id": batch_id},
                )
                frozen = freq.read()
            if not _replayed_batch(prefix, batch_id):
                keys = token_prefix_keys(
                    batch, frozen, name_col, id_col, threshold
                ).withColumn(
                    # normalize containsNull (the KMV-sidecar rule):
                    # split/array_distinct type non-null elements,
                    # round-tripped parquet rows don't
                    "__toks_r", F.col("__toks_r").cast("array<string>")
                )
                prefix.commit_append(
                    keys, run_id=f"gr{batch_id}",
                    extra={"last_batch_id": batch_id},
                )
        if not _replayed_batch(docs, batch_id):
            docs.commit_append(
                batch, run_id=f"gr{batch_id}",
                extra={"last_batch_id": batch_id},
            )

    return process


def make_cm_sketch_processor(
    sketches,
    value_col: str,
    width: int = 256,
    depth: int = 4,
    group_col: str | None = None,
):
    """foreachBatch body maintaining Count-Min frequency sketches in
    the ``sketches`` TxTable — streaming frequency estimation with
    depth*width BOUNDED state per group and no per-key state store,
    because CM counters are LINEAR: merge(batch sketch, stored sketch)
    = the sketch of everything ever seen, exactly (`operators.
    sketches.cm_merge`).  The estimate after any number of
    micro-batches is BIT-IDENTICAL to a batch ``cm_sketch`` over the
    union of all batches — the KMV-sidecar equivalence applied to
    frequencies.  Replay-safe via the shared batch-id guard; each
    commit snapshots the (group?, row, bucket, cnt) table, bounded
    regardless of stream length."""
    from ..operators.sketches import cm_merge, cm_sketch

    gcols = [group_col] if group_col else []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if _replayed_batch(sketches, batch_id):
            return
        batch_sk = cm_sketch(batch_df, value_col, width=width, depth=depth,
                             group_by=gcols)
        if sketches.exists() and sketches.manifest() is not None:
            merged = cm_merge(
                batch_sk.unionByName(sketches.read()), group_by=gcols
            )
        else:
            merged = batch_sk
        rows = merged.collect()  # bounded: depth*width per group
        sketches.commit_snapshot(
            batch_df.sparkSession.createDataFrame(rows, merged.schema),
            run_id=f"cm{batch_id}", extra={"last_batch_id": batch_id},
        )

    return process


def make_hll_distinct_processor(
    sketches,
    group_col: str,
    value_col: str,
    p: int = 10,
    seed: int = 77,
):
    """foreachBatch body maintaining per-group HyperLogLog register
    frames in the ``sketches`` TxTable — the third member of the
    streaming-sketch sidecar family (KMV order statistics, Count-Min
    linear counters, HLL register maxima).  MAX is associative, so
    merge(batch registers, stored registers) equals the registers of
    everything ever seen EXACTLY (`operators.sketches.hll_merge`,
    q384's theorem), and the estimate after any number of
    micro-batches is BIT-IDENTICAL to a batch ``hll_registers`` over
    the union — the equivalence the test pins.  State is <= 2^p
    (bucket, rho) ints per group forever; replay-safe via the shared
    batch-id guard; each commit snapshots the register table plus the
    per-group estimate."""
    from ..operators.sketches import hll_merge, hll_registers

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if _replayed_batch(sketches, batch_id):
            return
        batch_reg = hll_registers(batch_df, value_col, [group_col], p=p, seed=seed)
        if sketches.exists() and sketches.manifest() is not None:
            prior = sketches.read().select(group_col, "bucket", "rho")
            merged = hll_merge(
                batch_reg.unionByName(prior), [group_col]
            )
        else:
            merged = batch_reg
        rows = merged.collect()  # bounded: <= 2^p rows per group
        sketches.commit_snapshot(
            batch_df.sparkSession.createDataFrame(rows, merged.schema),
            run_id=f"hll{batch_id}", extra={"last_batch_id": batch_id},
        )

    return process
