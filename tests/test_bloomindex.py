"""Persistent Bloom sidecar (operators/bloomindex.py): delta sync,
crash/corruption recovery, and equivalence with the plain anti-join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.functions.text import doc_fingerprint
from nlu_data_warehouse_project_spark.operators.bloomindex import BloomFingerprintIndex
from nlu_data_warehouse_project_spark.operators.dedup import incremental_exact_dedup
from nlu_data_warehouse_project_spark.sources.txlog import TxTable

BITS = 1 << 14


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _with_fp(df):
    return df.withColumn("fingerprint", doc_fingerprint("text"))


def test_sidecar_syncs_by_delta_and_matches_exact(spark, tmp_path):
    corpus = TxTable(spark, str(tmp_path / "corpus"))
    idx = BloomFingerprintIndex(corpus, num_bits=BITS)

    # empty table: everything new
    b0 = _docs(spark, [(1, "alpha"), (2, "beta")])
    assert sorted(r["doc_id"] for r in idx.dedup(b0).collect()) == [1, 2]
    corpus.commit_append(_with_fp(b0), run_id="b0")
    v1 = corpus.manifest()["version"]

    # second batch: one corpus dup, one internal dup, one new
    b1 = _docs(spark, [(10, "alpha"), (11, "gamma"), (12, "gamma")])
    got = sorted(r["doc_id"] for r in idx.dedup(b1).collect())
    want = sorted(
        r["doc_id"]
        for r in incremental_exact_dedup(b1, corpus.read().select("fingerprint"),
                                         existing_is_fingerprints=True).collect()
    )
    assert got == want == [11]
    corpus.commit_append(_with_fp(b1.filter(F.col("doc_id") == 11)), run_id="b1")

    # the sidecar advanced by DELTA (synced version recorded)
    state = idx._load()
    assert state is not None and state[1] == v1
    idx.sync()
    assert idx._load()[1] == corpus.manifest()["version"]

    # third batch sees the b1 addition through the synced sidecar
    b2 = _docs(spark, [(20, "gamma"), (21, "delta")])
    assert sorted(r["doc_id"] for r in idx.dedup(b2).collect()) == [21]


def test_sidecar_rebuilds_on_corruption_and_param_change(spark, tmp_path):
    corpus = TxTable(spark, str(tmp_path / "corpus"))
    corpus.commit_append(_with_fp(_docs(spark, [(1, "alpha")])), run_id="b0")
    idx = BloomFingerprintIndex(corpus, num_bits=BITS)
    idx.sync()

    # corrupt the file: sync must rebuild, dedup stays correct
    with open(idx.path, "wb") as f:
        f.write(b"garbage")
    assert sorted(
        r["doc_id"] for r in idx.dedup(_docs(spark, [(5, "alpha"), (6, "new one")])).collect()
    ) == [6]
    assert idx._load() is not None  # rewritten consistently

    # parameter change invalidates the stored bitmap
    idx2 = BloomFingerprintIndex(corpus, num_bits=BITS * 2)
    assert idx2._load() is None
    assert sorted(
        r["doc_id"] for r in idx2.dedup(_docs(spark, [(7, "alpha"), (8, "other")])).collect()
    ) == [8]


def test_sidecar_full_rebuild_when_delta_unrecoverable(spark, tmp_path, monkeypatch):
    corpus = TxTable(spark, str(tmp_path / "corpus"))
    corpus.commit_append(_with_fp(_docs(spark, [(1, "alpha")])), run_id="b0")
    idx = BloomFingerprintIndex(corpus, num_bits=BITS)
    idx.sync()
    corpus.commit_append(_with_fp(_docs(spark, [(2, "beta")])), run_id="b1")

    def boom(*a, **k):
        raise RuntimeError("compacted across the boundary")

    monkeypatch.setattr(corpus, "read_closed_delta", boom)
    # delta path fails -> full rebuild; both corpus docs are still known
    got = sorted(
        r["doc_id"]
        for r in idx.dedup(_docs(spark, [(10, "alpha"), (11, "beta"), (12, "new")])).collect()
    )
    assert got == [12]
    assert idx._load()[1] == corpus.manifest()["version"]


def test_sidecar_rebuilds_when_current_dir_replaced(spark, tmp_path):
    """Regression: a snapshot/merge commit replaces the CURRENT dir while
    the closed-delta read still succeeds — the O(delta) path would
    silently omit fingerprints now living in the new current dir,
    breaking the no-false-negative guarantee.  A changed current must
    force a full rebuild."""
    corpus = TxTable(spark, str(tmp_path / "corpus"))
    corpus.commit_snapshot(_with_fp(_docs(spark, [(1, "alpha")])), run_id="s0")
    idx = BloomFingerprintIndex(corpus, num_bits=BITS)
    idx.sync()

    # replace current with a superset: 'epsilon' exists ONLY in the new
    # current dir; no closed delta carries it
    corpus.commit_snapshot(
        _with_fp(_docs(spark, [(1, "alpha"), (2, "epsilon")])), run_id="s1"
    )
    got = sorted(
        r["doc_id"]
        for r in idx.dedup(_docs(spark, [(10, "epsilon"), (11, "brand new")])).collect()
    )
    assert got == [11]  # epsilon is a known dup and must be dropped
    assert idx._load()[1] == corpus.manifest()["version"]


def test_bloom_dedup_tolerates_null_text(spark, tmp_path):
    """Regression: NULL text -> NULL fingerprint crashed the bloom-probe
    pandas UDF (int(None[:15],16)).  Parity target is
    incremental_exact_dedup: NULL keys are kept (NULL never
    equi-matches), deduped to one survivor by the keep-first window."""
    corpus = TxTable(spark, str(tmp_path / "corpus"))
    corpus.commit_append(_with_fp(_docs(spark, [(1, "alpha")])), run_id="b0")
    idx = BloomFingerprintIndex(corpus, num_bits=BITS)

    batch = _docs(spark, [(10, "alpha"), (11, None), (12, None), (13, "fresh")])
    got = sorted(r["doc_id"] for r in idx.dedup(batch).collect())
    want = sorted(
        r["doc_id"]
        for r in incremental_exact_dedup(
            batch, corpus.read().select("fingerprint"), existing_is_fingerprints=True
        ).collect()
    )
    assert got == want == [11, 13]
