"""Streaming corpus ingest: quality gate + cross-batch dedup against
the committed corpus + transactional TxTable appends, with the
replayed-micro-batch idempotence guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.sources.txlog import TxTable
from nlu_data_warehouse_project_spark.streaming import (
    make_corpus_ingest_processor,
    streaming_corpus_ingest,
)

SCHEMA = "doc_id long, text string"
GOOD = "the quick brown fox jumps over the lazy dog again and again today fine"
GOOD2 = "a completely different document about training data pipelines at scale"
SHORT = "too short"


def _write_landing(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_commit_append_segments_union(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "log"))
    d1 = spark.createDataFrame([(1, "a")], "id long, v string")
    d2 = spark.createDataFrame([(2, "b")], "id long, v string")
    assert t.commit_append(d1, "r1") == 1
    assert t.commit_append(d2, "r2") == 2
    got = sorted((r["id"], r["v"]) for r in t.read().collect())
    assert got == [(1, "a"), (2, "b")]
    # current stays the empty seed; history is the appended segments
    assert t.read_current().count() == 0
    assert t.read_closed().count() == 2


def test_streaming_corpus_ingest_dedups_across_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    # batch 1: one good doc, one in-batch exact dup (higher id loses),
    # one too-short doc (gated)
    _write_landing(spark, landing, [(1, GOOD), (5, GOOD), (2, SHORT)])
    # batch 2: a cross-batch dup of doc 1 (new id) and a genuinely new doc
    _write_landing(spark, landing, [(10, GOOD), (11, GOOD2)])

    corpus = TxTable(spark, str(tmp_path / "corpus"))
    streaming_corpus_ingest(
        spark,
        landing,
        SCHEMA,
        corpus,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    rows = corpus.read().collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 11]
    assert all(r["fingerprint"] for r in rows)
    # two micro-batches -> two append commits
    assert corpus.latest_version() == 2
    assert corpus.manifest()["last_batch_id"] == 1


def test_replayed_micro_batch_is_a_noop(spark, tmp_path):
    corpus = TxTable(spark, str(tmp_path / "corpus2"))
    process = make_corpus_ingest_processor(corpus)
    b0 = spark.createDataFrame([(1, GOOD)], SCHEMA)
    process(b0, 0)
    v_after = corpus.latest_version()
    # a crash between the commit and the checkpoint advancing replays
    # the same micro-batch: the recorded last_batch_id makes it a no-op
    process(b0, 0)
    assert corpus.latest_version() == v_after
    assert corpus.read().count() == 1
    # the NEXT batch id commits normally
    process(spark.createDataFrame([(2, GOOD2)], SCHEMA), 1)
    assert corpus.latest_version() == v_after + 1
    assert sorted(r["doc_id"] for r in corpus.read().collect()) == [1, 2]


def test_fresh_checkpoint_against_existing_table_raises(spark, tmp_path):
    """A crash-replay re-delivers exactly the last committed batch id;
    ids restarting BELOW it mean a fresh checkpoint was pointed at an
    existing corpus table — silently no-opping those batches would be
    wordless data loss (ADVICE r6), so the processor raises."""
    import pytest

    corpus = TxTable(spark, str(tmp_path / "corpus5"))
    process = make_corpus_ingest_processor(corpus)
    process(spark.createDataFrame([(1, GOOD)], SCHEMA), 0)
    process(spark.createDataFrame([(2, GOOD2)], SCHEMA), 1)
    with pytest.raises(ValueError, match="fresh checkpoint"):
        process(spark.createDataFrame([(3, GOOD)], SCHEMA), 0)
    # the true replay (== last) is still a silent no-op
    v = corpus.latest_version()
    process(spark.createDataFrame([(2, GOOD2)], SCHEMA), 1)
    assert corpus.latest_version() == v


def test_ingest_quality_gate_applies_per_batch(spark, tmp_path):
    corpus = TxTable(spark, str(tmp_path / "corpus3"))
    process = make_corpus_ingest_processor(corpus, min_tokens=5, max_punct=0.2)
    noisy = "!!! ??? !!! ??? !!!! ????........ !!!"
    process(spark.createDataFrame([(1, GOOD), (2, SHORT), (3, noisy)], SCHEMA), 0)
    assert [r["doc_id"] for r in corpus.read().collect()] == [1]


def test_ingest_gopher_rules_gate(spark, tmp_path):
    """gopher_rules=True composes the published rule gate into the
    per-micro-batch scan pass, mirroring curate_corpus: the
    keyword-stuffed doc (no required stopwords) is dropped even though
    it passes the score gate."""
    corpus = TxTable(spark, str(tmp_path / "corpus_g"))
    fluent = "the quick brown fox and that have with be of " * 5
    stuffed = "buy cheap watches best price deal now shop sale today " * 5
    process = make_corpus_ingest_processor(corpus, min_tokens=5, gopher_rules=True)
    process(spark.createDataFrame([(1, fluent), (2, stuffed)], SCHEMA), 0)
    assert [r["doc_id"] for r in corpus.read().collect()] == [1]


def test_compaction_preserves_replay_guard_and_segments(spark, tmp_path):
    """compact_closed folds append segments into one dir but must carry
    consumer manifest extras through — losing last_batch_id would
    re-open the replay window after every compaction."""
    corpus = TxTable(spark, str(tmp_path / "corpus4"))
    process = make_corpus_ingest_processor(corpus)
    texts = [GOOD, GOOD2, "third completely distinct document with plenty of tokens to pass the gate"]
    for i, t in enumerate(texts):
        process(spark.createDataFrame([(i + 1, t)], SCHEMA), i)
    assert corpus.latest_version() == 3 and len(corpus.manifest()["closed"]) == 3

    v = corpus.compact_closed(min_dirs=2)
    assert v == 4
    man = corpus.manifest()
    assert len(man["closed"]) == 1
    assert man["last_batch_id"] == 2, "replay guard must survive compaction"
    assert corpus.read().count() == 3
    # a replay of the last pre-compaction batch is still a no-op
    process(spark.createDataFrame([(3, texts[2])], SCHEMA), 2)
    assert corpus.latest_version() == 4


def test_all_commit_paths_carry_consumer_extras(spark, tmp_path):
    """A commit by one writer must not erase another consumer's manifest
    bookkeeping: merge and snapshot commits carry prior extras through
    (overridable), and structural fields stay commit-owned."""
    t = TxTable(spark, str(tmp_path / "extras"))
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    t.commit_snapshot(df, "r1", extra={"watermark": "2024-01-01", "last_batch_id": 4})
    # snapshot without extras: both consumer fields survive
    t.commit_snapshot(df, "r2")
    man = t.manifest()
    assert man["watermark"] == "2024-01-01" and man["last_batch_id"] == 4
    # merge commit overriding one field keeps the other
    t.commit_merge(df, df.limit(0), "r3", extra={"watermark": "2024-01-02"})
    man = t.manifest()
    assert man["watermark"] == "2024-01-02" and man["last_batch_id"] == 4
    assert man["run_id"] == "r3"


def test_embedding_ingest_gates_and_dedups_across_batches(spark, tmp_path):
    """Vector-table ingest loop: degenerate vectors (null / zero-norm /
    wrong dim) are gated, semantic dups are dropped within the batch
    and against the committed index, and a replayed batch is a no-op."""
    from nlu_data_warehouse_project_spark.streaming import make_embedding_ingest_processor

    index = TxTable(spark, str(tmp_path / "emb_index"))
    process = make_embedding_ingest_processor(index, expected_dim=3, threshold=0.99)
    schema = "vec_id long, embedding array<float>"

    b1 = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0]),      # in-batch dup of 1 (higher id loses)
            (3, [0.0, 1.0, 0.0]),
            (4, [0.0, 0.0, 0.0]),      # zero norm -> gated
            (5, None),                 # null -> gated
            (6, [1.0, 0.0]),           # wrong dim -> gated
        ],
        schema,
    )
    process(b1, 0)
    assert sorted(r["vec_id"] for r in index.read().collect()) == [1, 3]

    # batch 2: a dup of vector 1 (new id) and a genuinely new direction
    b2 = spark.createDataFrame(
        [(10, [2.0, 0.0, 0.0]), (11, [0.0, 0.0, 5.0])], schema
    )
    process(b2, 1)
    assert sorted(r["vec_id"] for r in index.read().collect()) == [1, 3, 11]

    # replay of batch 1 is a silent no-op
    v = index.latest_version()
    process(b1, 1)
    assert index.latest_version() == v
    # fresh-checkpoint signature raises (shared guard)
    import pytest

    with pytest.raises(ValueError, match="fresh checkpoint"):
        process(b1, 0)


def test_streaming_corpus_ingest_bloom_path_equivalent(spark, tmp_path):
    """use_bloom=True must produce the identical corpus, and the
    sidecar must track the table version across micro-batches."""
    import os

    landing = str(tmp_path / "landing")
    _write_landing(spark, landing, [(1, GOOD), (5, GOOD), (2, SHORT)])
    _write_landing(spark, landing, [(10, GOOD), (11, GOOD2)])

    corpus = TxTable(spark, str(tmp_path / "corpus"))
    streaming_corpus_ingest(
        spark,
        landing,
        SCHEMA,
        corpus,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        use_bloom=True,
    )
    rows = corpus.read().collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 11]
    assert corpus.manifest()["last_batch_id"] == 1

    # the sidecar lives NEXT TO the table dir and is synced
    from nlu_data_warehouse_project_spark.operators.bloomindex import (
        BloomFingerprintIndex,
    )

    idx = BloomFingerprintIndex(corpus)
    assert os.path.exists(idx.path)
    state = idx._load()
    # written most recently at dedup time of the LAST batch — one
    # version behind the final commit; sync() folds the tail
    assert state is not None and state[1] >= corpus.manifest()["version"] - 1
    idx.sync()
    assert idx._load()[1] == corpus.manifest()["version"]


def test_streaming_corpus_ingest_jsonl_landing(spark, tmp_path):
    """JSONL landing files stream through the same ingest loop; a
    malformed line becomes an all-null row and dies at the quality
    gate instead of killing the stream."""
    import json as _json

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "b1.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": GOOD}) + "\n"
        + "NOT JSON AT ALL\n"
        + _json.dumps({"doc_id": 2, "text": SHORT}) + "\n"
    )
    (landing / "b2.jsonl").write_text(
        _json.dumps({"doc_id": 10, "text": GOOD}) + "\n"
        + _json.dumps({"doc_id": 11, "text": GOOD2}) + "\n"
    )
    corpus = TxTable(spark, str(tmp_path / "corpus"))
    streaming_corpus_ingest(
        spark,
        str(landing),
        SCHEMA,
        corpus,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        source_format="json",
    )
    assert sorted(r["doc_id"] for r in corpus.read().collect()) == [1, 11]


def test_replayed_micro_batch_with_bloom_sidecar(spark, tmp_path):
    """Crash-replay under use_bloom=True: the replayed batch is a no-op
    BEFORE the sidecar is consulted, the sidecar stays consistent with
    the table version, and the next batch dedups correctly against
    everything committed — the replay guard and the bloom protocol
    compose without either breaking the other's invariant."""
    corpus = TxTable(spark, str(tmp_path / "corpus_bloom_replay"))
    process = make_corpus_ingest_processor(corpus, use_bloom=True)
    b0 = spark.createDataFrame([(1, GOOD)], SCHEMA)
    process(b0, 0)
    v_after = corpus.latest_version()
    process(b0, 0)  # replay: no new version, no sidecar regression
    assert corpus.latest_version() == v_after
    # batch 1 carries a dup of batch 0 (dropped via the bloom path) and
    # a new doc (kept)
    process(spark.createDataFrame([(10, GOOD), (11, GOOD2)], SCHEMA), 1)
    assert sorted(r["doc_id"] for r in corpus.read().collect()) == [1, 11]

    from nlu_data_warehouse_project_spark.operators.bloomindex import (
        BloomFingerprintIndex,
    )

    idx = BloomFingerprintIndex(corpus)
    idx.sync()
    assert idx._load()[1] == corpus.manifest()["version"]


def test_ingest_contract_fails_the_batch_and_publishes_nothing(spark, tmp_path):
    """Stop-the-line: a violated contract raises inside the processor,
    the commit never publishes, and a compliant retry (the fixed feed)
    goes through on the SAME batch id."""
    import pytest as _pytest

    from nlu_data_warehouse_project_spark.operators.expectations import (
        ExpectationsFailedError,
        check_not_null,
        check_unique,
    )

    corpus = TxTable(spark, str(tmp_path / "corpus"))
    contract = [
        lambda d: check_not_null(d, ["doc_id"]),
        lambda d: check_unique(d, ["doc_id"]),
    ]
    process = make_corpus_ingest_processor(corpus, min_tokens=5, contract=contract)

    bad = spark.createDataFrame([(None, GOOD)], SCHEMA)
    with _pytest.raises(ExpectationsFailedError, match="not_null"):
        process(bad, 0)
    assert not corpus.exists() or corpus.manifest() is None

    good = spark.createDataFrame([(1, GOOD)], SCHEMA)
    process(good, 0)  # the fixed feed replays the same micro-batch id
    assert [r["doc_id"] for r in corpus.read().collect()] == [1]


def test_drift_monitor_scores_batches_and_alarms(spark, tmp_path):
    from nlu_data_warehouse_project_spark.streaming import make_drift_monitor_processor

    SCHEMA2 = "doc_id long, source string, n_chars long"
    ref = spark.createDataFrame(
        [(i, "web", 100 + (i % 3) * 50) for i in range(30)], SCHEMA2
    )
    reports = TxTable(spark, str(tmp_path / "drift"))
    alarms: list = []
    process = make_drift_monitor_processor(
        ref, reports, alarm_chi2=5.0, on_alarm=lambda rows: alarms.extend(rows)
    )

    # batch 0: same shape as the reference -> low chi2, no alarm
    same = spark.createDataFrame([(100 + i, "web", 100 + (i % 3) * 50) for i in range(30)], SCHEMA2)
    process(same, 0)
    # batch 1: everything lands in a far bin -> large chi2, alarm fires
    shifted = spark.createDataFrame([(200 + i, "web", 1900) for i in range(30)], SCHEMA2)
    process(shifted, 1)

    rows = {(r["batch_id"], r["source"]): r["chi2"] for r in reports.read().collect()}
    assert rows[(0, "web")] < 5.0 < rows[(1, "web")]
    assert [r["batch_id"] for r in alarms] == [1]

    # replayed micro-batch is a no-op (no duplicate report, no re-alarm)
    process(shifted, 1)
    assert reports.read().count() == 2 and len(alarms) == 1


def test_drift_score_survives_bigint_overflow_counts(spark):
    """ADVICE r8: the chi² term squares the count diff in DECIMAL, not
    BIGINT — a per-(group,bin) difference of 4e9 (whose BIGINT square
    wraps negative) scores exactly 1.6e19."""
    from nlu_data_warehouse_project_spark.operators.profile import (
        _drift_score_from_counts,
    )

    j = spark.createDataFrame(
        [("g", 0, 4_000_000_000), ("h", 3, 10)],
        "__g string, n_ref long, n_cand long",
    )
    got = {r["g"]: r["chi2"] for r in _drift_score_from_counts(j, "g").collect()}
    assert got["g"] == 1.6e19
    assert got["h"] == 12.25  # 49/4 — small-count behavior unchanged


def test_drift_alarm_and_contract_block_publish_end_to_end(spark, tmp_path):
    """VERDICT r8 #5: the full stop-the-line loop in one piece — a
    foreachBatch body that (a) scores each micro-batch for drift and
    pages, (b) ingests under a drift contract.  Batch 0 (reference
    shape) publishes; batch 1 (drifted) fires the alarm WITH the chi²
    payload, the contract refuses the publish, and the corpus version
    stays put."""
    from nlu_data_warehouse_project_spark.operators.expectations import (
        ExpectationsFailedError,
        check_drift,
    )
    from nlu_data_warehouse_project_spark.streaming import (
        make_corpus_ingest_processor,
        make_drift_monitor_processor,
    )

    SCHEMA = "doc_id long, text string, source string"
    mk = lambda rows: spark.createDataFrame(rows, SCHEMA)  # noqa: E731
    words = lambda n: " ".join(f"w{i}" for i in range(n))  # noqa: E731

    # reference corpus slice: short docs (unique texts — the ingest
    # dedups, and a collapsed batch would itself read as drift)
    ref = mk([(i, words(5 + i % 3) + f" r{i}", "web") for i in range(30)])
    bin_expr = F.least(F.floor(F.length("text") / F.lit(40)), F.lit(4)).cast("int")

    corpus = TxTable(spark, str(tmp_path / "corpus"))
    reports = TxTable(spark, str(tmp_path / "drift-reports"))
    alarms: list = []
    monitor = make_drift_monitor_processor(
        ref.withColumn("n_chars", F.length("text")), reports,
        group_col="source", value_col="n_chars",
        bin_width=40, n_bins=5, alarm_chi2=5.0,
        on_alarm=lambda rows: alarms.extend(rows),
    )
    ingest = make_corpus_ingest_processor(
        corpus, min_tokens=2,
        contract=[lambda d: check_drift(d, ref, "source", bin_expr, max_chi2=5.0)],
    )

    def pipeline(batch_df, batch_id):
        # what one composed foreachBatch body would run
        monitor(batch_df.withColumn("n_chars", F.length("text")), batch_id)
        ingest(batch_df, batch_id)

    # batch 0: same length profile as the reference -> publishes
    pipeline(mk([(100 + i, words(5 + i % 3) + f" b{i}", "web") for i in range(30)]), 0)
    v_after_ok = corpus.manifest()["version"]
    assert corpus.read().count() == 30 and not alarms

    # batch 1: every doc 10x longer -> alarm + refused publish
    drifted = mk([(200 + i, words(60) + f" d{i}", "web") for i in range(30)])
    with pytest.raises(ExpectationsFailedError, match="drift_chi2"):
        pipeline(drifted, 1)
    assert corpus.manifest()["version"] == v_after_ok     # version stayed put
    assert corpus.read().count() == 30                    # no drifted rows
    assert [r["batch_id"] for r in alarms] == [1]
    assert alarms[0]["chi2"] is not None and alarms[0]["chi2"] > 5.0


def test_ingest_near_dedup_gate_via_minhash_sidecar(spark, tmp_path):
    """near_dedup=True: each micro-batch near-dedups against the
    settled corpus through the persistent MinHash band sidecar (synced
    O(delta) per batch) on top of the exact-fingerprint gate."""
    corpus = TxTable(spark, str(tmp_path / "corpus_nd"))
    base = ("the quick brown fox jumps over the lazy dog near the old river "
            "bank while morning light settles on the quiet water")
    process = make_corpus_ingest_processor(
        corpus, min_tokens=5, near_dedup=True, near_threshold=0.5
    )
    process(spark.createDataFrame([(1, base)], SCHEMA), 0)
    assert [r["doc_id"] for r in corpus.read().collect()] == [1]

    near = base.replace("quiet water", "quiet harbor")
    fresh = ("entirely novel text about spark physical plans and broadcast "
             "joins with no overlap against anything settled at all")
    process(spark.createDataFrame([(2, near), (3, fresh)], SCHEMA), 1)
    assert sorted(r["doc_id"] for r in corpus.read().collect()) == [1, 3]

    # replay of batch 1 is still a no-op (no sidecar double-fold)
    process(spark.createDataFrame([(2, near), (3, fresh)], SCHEMA), 1)
    assert corpus.read().count() == 2


def test_ingest_compression_band_gate(spark, tmp_path):
    """The q223 byte-level screen as an ingest gate: degenerate
    repetition (ultra-low zlib ratio) and high-entropy noise (ratio
    near 1) die in the micro-batch's scan-local pass even when they
    clear the token/punct rules; prose survives.  Values match a
    driver-side zlib run exactly (the operator's pytest contract)."""
    import hashlib
    import zlib

    import base64

    corpus = TxTable(spark, str(tmp_path / "corpus"))
    process = make_corpus_ingest_processor(
        corpus, compression_band=(0.3, 0.75), min_tokens=5, max_punct=0.9
    )
    # degenerate: 400x one word — token count high, punct low, zlib
    # ratio ~0.01; noise: base85 of a sha-chain, space-chunked so it
    # clears the token gate, ratio ~0.81; single-copy prose ~0.68
    degenerate = "spam " * 400
    prose = (
        "the quick brown fox jumps over the lazy dog while the curious cat "
        "watches from the fence wondering why foxes bother at all and some "
        "more words with varied content about pipelines and scale"
    )
    chunks, h = [], b"seed"
    while sum(len(c) for c in chunks) < 3000:
        h = hashlib.sha256(h).digest()
        chunks.append(base64.b85encode(h).decode())
    noise = " ".join("".join(chunks)[i:i + 10] for i in range(0, 2000, 10))

    def ratio(t):
        b = t.encode()
        return len(zlib.compress(b, 6)) / len(b)

    assert ratio(degenerate) < 0.3
    assert 0.3 < ratio(prose) < 0.75
    assert ratio(noise) > 0.75

    batch = spark.createDataFrame(
        [(1, degenerate), (2, prose), (3, noise)], SCHEMA
    )
    process(batch, 0)
    kept = [r["doc_id"] for r in corpus.read().select("doc_id").collect()]
    assert kept == [2]


def test_streaming_kmv_matches_batch_sketch_exactly(spark, tmp_path):
    """r14: the KMV sidecar's estimate after N micro-batches is
    BIT-IDENTICAL to a batch kmv_sketch over the union of all batches
    — the lossless-merge theorem (q353) applied incrementally; state
    per group stays k doubles regardless of true cardinality.  Replay
    of the last micro-batch id is a no-op."""
    from nlu_data_warehouse_project_spark.operators.sketches import kmv_sketch
    from nlu_data_warehouse_project_spark.streaming import make_kmv_distinct_processor

    SCHEMA3 = "g string, v long"
    K = 16
    batches = [
        spark.createDataFrame(
            [(f"g{(v + b) % 2}", (v * 7 + b * 131) % 450) for v in range(300)], SCHEMA3
        )
        for b in range(3)
    ]
    sketches = TxTable(spark, str(tmp_path / "kmv"))
    process = make_kmv_distinct_processor(sketches, "g", "v", k=K)
    for i, b in enumerate(batches):
        process(b, i)

    got = {
        r["g"]: (r["n_kept"], r["kmv_estimate"])
        for r in sketches.read().collect()
    }
    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = {
        r["g"]: (r["n_kept"], r["kmv_estimate"])
        for r in kmv_sketch(union, "v", ["g"], k=K).collect()
    }
    assert got == want  # exact, not approximate-equal

    # replayed micro-batch: a no-op, table unchanged
    process(batches[2], 2)
    assert {r["g"]: (r["n_kept"], r["kmv_estimate"])
            for r in sketches.read().collect()} == want
