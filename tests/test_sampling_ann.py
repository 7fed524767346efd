"""Deterministic sampling/split operators and the IVF cell-probed ANN."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.operators.sampling import (
    deterministic_sample,
    deterministic_split,
    stratified_exact_sample,
)
from nlu_data_warehouse_project_spark.operators.similarity import cosine_topk, ivf_cosine_topk
from nlu_data_warehouse_project_spark.queries import _seeded_planes


def test_split_is_stable_and_partitions_rows(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = deterministic_split(docs, "doc_id", weights)
    s2 = deterministic_split(docs.repartition(7), "doc_id", weights)

    a = {(r["doc_id"], r["split"]) for r in s1.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in s2.select("doc_id", "split").collect()}
    assert a == b, "split assignment must not depend on partitioning"

    counts = {r["split"]: r["n"] for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == docs.count()  # every row in exactly one split
    assert 0.7 <= counts["train"] / total <= 0.9
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0

    with pytest.raises(ValueError, match="sum to 1"):
        deterministic_split(docs, "doc_id", {"train": 0.5, "test": 0.1})


def test_hash_sample_is_nested_and_repeatable(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    s10 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.1).collect()}
    s20 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    # bucket-threshold sampling nests: growing the fraction only ADDS rows
    assert s10 <= s20
    assert s10 == {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.1).collect()}
    n = docs.count()
    assert 0.02 <= len(s10) / n <= 0.25
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(docs, "doc_id", 1.5)


def test_stratified_exact_sample(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    picked = stratified_exact_sample(docs, ["lang"], 5, "doc_id")
    per = {r["lang"]: r["n"] for r in picked.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n == 5 for n in per.values())
    again = stratified_exact_sample(docs.repartition(3), ["lang"], 5, "doc_id")
    assert {r["doc_id"] for r in picked.collect()} == {r["doc_id"] for r in again.collect()}


def test_ivf_topk_recall_grows_with_nprobe(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    planes = _seeded_planes(3, 64)

    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(queries, emb, k=5).collect()}

    def recall(nprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_cosine_topk(queries, emb, planes, k=5, nprobe=nprobe).collect()
        }
        assert len(got) == 25  # full result sets
        return len(exact & got) / len(exact)

    r1, r4, r8 = recall(1), recall(4), recall(8)
    assert r1 <= r4 <= r8, (r1, r4, r8)
    # probing every cell (nprobe=2^3) IS the exact search
    assert r8 == 1.0
    # and the candidate generation is deterministic call to call
    a = sorted(map(tuple, ivf_cosine_topk(queries, emb, planes, k=5, nprobe=2).collect()))
    b = sorted(map(tuple, ivf_cosine_topk(queries, emb, planes, k=5, nprobe=2).collect()))
    assert a == b
