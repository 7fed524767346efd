"""The scale-stress harness's inflation is itself correctness-gated:
counts and key spaces must scale exactly, the token salt must preserve
within-copy text and break cross-copy shingles, and the cache marker
must make rebuilds idempotent."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tools.scale_stress import STRIDE, build_inflated


def test_build_inflated_invariants(spark, sf_smoke, tmp_path):
    out = build_inflated(spark, sf_smoke, str(tmp_path / "x2"), 2)

    # row and key spaces exactly doubled (build_inflated also asserts
    # this internally; re-checking here pins the invariant in CI)
    for name, pk in (("orders", "o_orderkey"), ("documents", "doc_id")):
        base = spark.read.parquet(f"{sf_smoke}/{name}.parquet")
        got = spark.read.parquet(f"{out}/{name}.parquet")
        assert got.count() == 2 * base.count()
        assert got.select(pk).distinct().count() == 2 * base.select(pk).distinct().count()

    # fk consistency: every inflated lineitem orderkey resolves
    li = spark.read.parquet(f"{out}/lineitem.parquet")
    o = spark.read.parquet(f"{out}/orders.parquet")
    orphans = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count()
    assert orphans == 0

    # token salt: copy-1 docs have every token suffixed, so the copy
    # shares NO tokens with its base twin while keeping the same count
    docs = spark.read.parquet(f"{out}/documents.parquet")
    pair = (
        docs.filter(F.col("doc_id") < STRIDE).select(
            F.col("doc_id").alias("id"), F.col("text").alias("t0"))
        .join(
            docs.filter(F.col("doc_id") >= STRIDE).select(
                (F.col("doc_id") - STRIDE).alias("id"), F.col("text").alias("t1")),
            "id",
        )
        .select(
            F.size(F.split("t0", " ")).alias("n0"),
            F.size(F.split("t1", " ")).alias("n1"),
            F.size(F.array_intersect(F.split("t0", " "), F.split("t1", " ")))
            .alias("common"),
        )
    )
    row = pair.agg(
        F.sum(F.when(F.col("n0") != F.col("n1"), 1).otherwise(0)).alias("len_mismatch"),
        F.max("common").alias("max_common"),
    ).collect()[0]
    assert row["len_mismatch"] == 0 and row["max_common"] == 0

    # embedding perturbation (VERDICT r13 #2): copy-1 vectors must be
    # NEAR their base twin, never verbatim — distinct on every vector,
    # each element within the ±EPS x rms bound
    from tools.scale_stress import PERTURB_EPS

    emb = spark.read.parquet(f"{out}/embeddings.parquet")
    epair = (
        emb.filter(F.col("vec_id") < STRIDE).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("e0"))
        .join(
            emb.filter(F.col("vec_id") >= STRIDE).select(
                (F.col("vec_id") - STRIDE).alias("id"), F.col("embedding").alias("e1")),
            "id",
        )
        .select(
            F.expr("aggregate(zip_with(e0, e1, (a, b) -> CAST(abs(a - b) AS DOUBLE)), "
                   "0.0D, (acc, x) -> greatest(acc, x))").alias("max_delta"),
            F.expr("sqrt(aggregate(e0, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * x) "
                   "/ greatest(size(e0), 1))").alias("rms"),
        )
    )
    erow = epair.agg(
        F.sum(F.when(F.col("max_delta") == 0.0, 1).otherwise(0)).alias("verbatim"),
        # float32 storage rounds the perturbed value, so allow a hair
        F.max(F.col("max_delta") / F.col("rms")).alias("worst_rel"),
    ).collect()[0]
    assert erow["verbatim"] == 0  # no copy survives identical
    assert erow["worst_rel"] <= PERTURB_EPS * 1.01

    # idempotent: the marker short-circuits a rebuild
    marker = json.load(open(os.path.join(out, "_SCALE_STRESS.json")))
    assert marker["copies"] == 2 and marker["stride"] == STRIDE
    assert marker["version"] >= 2  # perturbation generation
    before = os.path.getmtime(f"{out}/orders.parquet")
    build_inflated(spark, sf_smoke, out, 2)
    assert os.path.getmtime(f"{out}/orders.parquet") == before


def test_build_inflated_customer_name_salt(spark, sf_smoke, tmp_path):
    """r15: the X^4Y^4 letter tag keeps every pair of copies >= 4
    edits apart — d=2-AWARE (VERDICT r14 #5), so both q351's edit-1
    and q366's edit-2 pair sets scale exactly Kx (cross-copy pairs
    would otherwise make the output quadratic in K)."""
    out = build_inflated(spark, sf_smoke, str(tmp_path / "x3"), 3)
    cust = spark.read.parquet(f"{out}/customer.parquet")
    base_n = spark.read.parquet(f"{sf_smoke}/customer.parquet").count()
    assert cust.count() == 3 * base_n
    # names are globally unique across copies
    assert cust.select("c_name").distinct().count() == 3 * base_n
    # copy tags: same base key in two copies is >= 2 edits apart
    a = cust.filter((F.col("c_custkey") >= STRIDE) & (F.col("c_custkey") < 2 * STRIDE))
    b = cust.filter(F.col("c_custkey") >= 2 * STRIDE)
    pair = a.select((F.col("c_custkey") - STRIDE).alias("k"), F.col("c_name").alias("n1")).join(
        b.select((F.col("c_custkey") - 2 * STRIDE).alias("k"), F.col("c_name").alias("n2")), "k"
    )
    assert pair.filter(F.levenshtein("n1", "n2") < 4).count() == 0
    # and the tag leaves copy-0 (originals) untagged, so q45-style
    # probe sets keyed on copy-0 rows are byte-stable across scales
    base_names = {
        r["c_name"]
        for r in spark.read.parquet(f"{sf_smoke}/customer.parquet")
        .select("c_name").collect()
    }
    got0 = {
        r["c_name"]
        for r in cust.filter(F.col("c_custkey") < STRIDE).select("c_name").collect()
    }
    assert got0 == base_names
    # within one copy the pair structure matches the base corpus
    # (tag is a shared constant prefix — edit distances unchanged)
