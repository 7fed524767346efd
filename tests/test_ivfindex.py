"""Persistent IVF sidecar (`operators/ivfindex.py`): O(delta) sync on
append, frozen-quantizer delta assignment, retrain on rebuild, and a
recall floor vs the exact cosine top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.operators.ivfindex import IVFVectorIndex
from nlu_data_warehouse_project_spark.operators.similarity import cosine_topk
from nlu_data_warehouse_project_spark.sources.txlog import TxTable


def _vectors(spark, sf="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def _recall(got_df, want_df):
    got = {(r["query_id"], r["neighbor_id"]) for r in got_df.collect()}
    want = {(r["query_id"], r["neighbor_id"]) for r in want_df.collect()}
    return len(got & want) / len(want)


def test_ivf_sidecar_sync_topk_and_delta_append(spark, tmp_path):
    vecs = _vectors(spark)
    seed = vecs.filter(F.col("vec_id") % 5 != 0)
    delta = vecs.filter(F.col("vec_id") % 5 == 0)

    corpus = TxTable(spark, str(tmp_path / "corpus"))
    corpus.commit_append(seed, "seed")
    idx = IVFVectorIndex(corpus, k_cells=8, nprobe=4)
    assert idx.sync() == 1
    assert idx.sync() == 1  # idempotent re-sync: no new index version
    assert idx.index.latest_version() == 1

    queries = vecs.limit(5)
    # synthetic embeddings are near-uniform (no cluster structure), so
    # recall tracks the probed-corpus FRACTION (the q179 lesson):
    # nprobe 6 of 8 lists ~ 75% coverage clears the 0.8 floor
    got = idx.topk(queries, k=5, nprobe=6)
    want = cosine_topk(queries, corpus.read(), k=5)
    assert _recall(got, want) >= 0.8  # the q34/q147 floor

    # append-shaped advance: delta assignment against FROZEN centroids
    cents_before = idx.centroids()
    corpus.commit_append(delta, "delta")
    assert idx.sync() == 2
    iman = idx.index.manifest()
    assert iman["run_id"] == "sync-v2"          # appended, not rebuilt
    assert idx.centroids() == cents_before       # quantizer frozen
    assert idx.index.read().count() == vecs.count()
    # the delta's vectors are findable now
    got2 = idx.topk(queries, k=5, nprobe=6)
    want2 = cosine_topk(queries, corpus.read(), k=5)
    assert _recall(got2, want2) >= 0.8


def test_ivf_sidecar_rebuilds_on_restore_and_param_change(spark, tmp_path):
    vecs = _vectors(spark)
    corpus = TxTable(spark, str(tmp_path / "corpus"))
    corpus.commit_append(vecs.filter(F.col("vec_id") < 250), "d1")
    idx = IVFVectorIndex(corpus, k_cells=8, nprobe=4)
    idx.sync()
    corpus.commit_append(vecs.filter(F.col("vec_id") >= 250), "d2")
    idx.sync()
    assert idx.index.manifest()["run_id"] == "sync-v2"

    # restore shrinks the closed list -> not append-shaped -> rebuild
    corpus.restore(1)
    idx.sync()
    assert idx.index.manifest()["run_id"].startswith("rebuild-")
    assert idx.index.read().count() == corpus.read().count()

    # changed parameters -> rebuild with a retrained quantizer
    idx2 = IVFVectorIndex(corpus, k_cells=4, nprobe=2)
    idx2.sync()
    assert idx2.index.manifest()["run_id"].startswith("rebuild-")
    assert len(idx2.centroids()) == 4


def test_ivf_sidecar_requires_sync_before_topk(spark, tmp_path):
    import pytest

    vecs = _vectors(spark)
    corpus = TxTable(spark, str(tmp_path / "c2"))
    corpus.commit_append(vecs, "d1")
    idx = IVFVectorIndex(corpus)
    with pytest.raises(FileNotFoundError, match="sync"):
        idx.topk(vecs.limit(1))
