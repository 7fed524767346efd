"""Round-16 equivalence properties:

- incremental golden-record maintenance == full-batch recompute,
  bit-for-bit (VERDICT r15 #4) — including new-bridges-old merges
- the bipartite prefix-filter probe == the full-batch pair set
  restricted to (new, old) pairs
- k-way KMV overlap is EXACT below saturation (VERDICT r15 #6)
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

VOCAB = ["acme", "global", "logistics", "north", "star", "trading",
         "pacific", "freight"]

# small vocab + short names force genuine cluster structure: shared
# rare tokens, transitive chains, and old/new overlap
names_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=4, unique=True),
    min_size=2, max_size=24,
)


def _docs(spark, names):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(names)]
    return spark.createDataFrame(rows, "doc_id long, title string")


def _batch_labels(spark, docs):
    from nlu_data_warehouse_project_spark.operators.clusters import neardup_clusters
    from nlu_data_warehouse_project_spark.operators.fuzzy import token_blocked_pairs

    pairs = token_blocked_pairs(docs, "title", "doc_id", threshold=0.5)
    if not pairs.take(1):
        return {}
    return {
        r["node"]: r["cluster_id"]
        for r in neardup_clusters(pairs, id_a="a_id", id_b="b_id").collect()
    }


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(names=names_strategy)
def test_incremental_golden_records_bitequal_batch(spark, names):
    from pyspark.sql import functions as F

    from nlu_data_warehouse_project_spark.operators.clusters import neardup_clusters
    from nlu_data_warehouse_project_spark.operators.fuzzy import (
        golden_records_incremental, token_blocked_pairs,
    )

    docs = _docs(spark, names)
    want = _batch_labels(spark, docs)

    old_docs = docs.filter(F.col("doc_id") % 3 != 0)
    new_docs = docs.filter(F.col("doc_id") % 3 == 0)
    old_pairs = token_blocked_pairs(old_docs, "title", "doc_id", threshold=0.5)
    if old_pairs.take(1):
        old_labels = neardup_clusters(old_pairs, id_a="a_id", id_b="b_id")
    else:
        old_labels = spark.createDataFrame([], "node long, cluster_id long")
    got = {
        r["node"]: r["cluster_id"]
        for r in golden_records_incremental(
            old_labels, old_docs, new_docs, "title", "doc_id", threshold=0.5
        ).collect()
    }
    assert got == want


def test_incremental_bridge_merges_two_old_clusters(spark):
    """One new doc whose tokens straddle two standing clusters must
    fuse them under the global min label — the case a blocking scheme
    that probes only ELECTED records per cluster would still catch
    (the canonical rows carry the tokens), but a naive 'assign to
    first match' incremental would get wrong."""
    from pyspark.sql import functions as F

    from nlu_data_warehouse_project_spark.operators.clusters import neardup_clusters
    from nlu_data_warehouse_project_spark.operators.fuzzy import (
        golden_records_incremental, token_blocked_pairs,
    )

    rows = [
        (1, "acme global"), (2, "acme global"),          # old cluster A (min 1)
        (7, "pacific freight"), (8, "pacific freight"),  # old cluster B (min 7)
        (9, "acme pacific"),                             # NEW: bridges nothing (J<0.5... )
        (12, "acme global pacific freight"),             # NEW: J=0.5 with both
    ]
    docs = spark.createDataFrame(rows, "doc_id long, title string")
    old_docs = docs.filter(F.col("doc_id") < 9)
    new_docs = docs.filter(F.col("doc_id") >= 9)
    old_labels = neardup_clusters(
        token_blocked_pairs(old_docs, "title", "doc_id", threshold=0.5),
        id_a="a_id", id_b="b_id",
    )
    assert {r["node"]: r["cluster_id"] for r in old_labels.collect()} == {
        1: 1, 2: 1, 7: 7, 8: 7,
    }
    got = {
        r["node"]: r["cluster_id"]
        for r in golden_records_incremental(
            old_labels, old_docs, new_docs, "title", "doc_id", threshold=0.5
        ).collect()
    }
    batch = _batch_labels_explicit(spark, rows)
    assert got == batch
    # the doc-12 bridge fuses A and B: every member labels to min id 1
    assert got[12] == 1 and got[7] == 1 and got[8] == 1


def _batch_labels_explicit(spark, rows):
    from nlu_data_warehouse_project_spark.operators.clusters import neardup_clusters
    from nlu_data_warehouse_project_spark.operators.fuzzy import token_blocked_pairs

    docs = spark.createDataFrame(rows, "doc_id long, title string")
    pairs = token_blocked_pairs(docs, "title", "doc_id", threshold=0.5)
    return {
        r["node"]: r["cluster_id"]
        for r in neardup_clusters(pairs, id_a="a_id", id_b="b_id").collect()
    }


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(names=names_strategy)
def test_bipartite_probe_equals_batch_restriction(spark, names):
    from pyspark.sql import functions as F

    from nlu_data_warehouse_project_spark.operators.fuzzy import (
        token_blocked_pairs, token_blocked_pairs_bipartite,
    )

    docs = _docs(spark, names)
    old_docs = docs.filter(F.col("doc_id") % 3 != 0)
    new_docs = docs.filter(F.col("doc_id") % 3 == 0)
    full = token_blocked_pairs(docs, "title", "doc_id", threshold=0.5)
    want = {
        frozenset((r["a_id"], r["b_id"])): r["jaccard"]
        for r in full.collect()
        if (r["a_id"] % 3 == 0) != (r["b_id"] % 3 == 0)
    }
    got = {
        frozenset((r["new_id"], r["old_id"])): r["jaccard"]
        for r in token_blocked_pairs_bipartite(
            new_docs, old_docs, "title", "doc_id", threshold=0.5
        ).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(sets=st.lists(
    st.frozensets(st.integers(0, 30), min_size=1, max_size=12),
    min_size=2, max_size=5,
))
def test_kmv_kway_overlap_exact_below_saturation(spark, sets):
    """With |union| < k every number the k-way estimator emits is
    EXACT: n_common == |∩ groups|, union_est == |∪ groups|,
    inter_est == |∩ groups| (the operator docstring's claim)."""
    from nlu_data_warehouse_project_spark.operators.sketches import (
        kmv_overlap_kway, kmv_sketch,
    )

    rows = [(f"g{gi}", v) for gi, s in enumerate(sets) for v in s]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = kmv_sketch(df, "v", ["g"], k=64, seed=77)
    got = kmv_overlap_kway(sk, "g", k=64).collect()[0]
    inter = frozenset.intersection(*sets)
    union = frozenset.union(*sets)
    assert got["n_groups"] == len(sets)
    assert got["n_common"] == len(inter)
    assert got["n_union_kept"] == len(union)
    assert got["union_est"] == float(len(union))
    assert got["inter_est"] == (
        len(inter) / len(union) * len(union) if union else 0.0
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.integers(0, 40), min_size=1, max_size=60))
def test_cm_sketch_merge_linearity_and_bound(spark, vals):
    """Count-Min invariants: (a) merged per-group sketches equal the
    from-scratch sketch over the union, exactly (linearity); (b) every
    point estimate >= the true count (overestimate-only)."""
    from collections import Counter

    from nlu_data_warehouse_project_spark.operators.sketches import (
        cm_estimate, cm_merge, cm_sketch,
    )

    rows = [("g" + str(i % 3), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, v long")
    per = cm_sketch(df, "v", width=16, depth=3, group_by=["g"])
    merged = {(r["row"], r["bucket"]): r["cnt"] for r in cm_merge(per).collect()}
    scratch = {(r["row"], r["bucket"]): r["cnt"]
               for r in cm_sketch(df, "v", width=16, depth=3).collect()}
    assert merged == scratch

    truth = Counter(vals)
    keys = spark.createDataFrame([(k,) for k in set(vals) | {999}], "v long")
    est = {r["v"]: r["cm_est"]
           for r in cm_estimate(cm_sketch(df, "v", width=16, depth=3),
                                keys, "v", 16, 3).collect()}
    for k, n in truth.items():
        assert est[k] >= n
    assert est[999] >= 0  # absent key may still collide, never negative


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    a=st.text(alphabet="abcd", min_size=0, max_size=40),
    b=st.text(alphabet="abcd", min_size=0, max_size=40),
    shared=st.text(alphabet="abcd", min_size=8, max_size=20),
)
def test_winnowing_guarantee(spark, a, b, shared):
    """SIGMOD'03: two documents sharing a substring of length >=
    w + k - 1 (here 4 + 5 - 1 = 8) share at least one selected
    fingerprint with identical gram content — for ANY surrounding
    context, including tie-heavy 4-letter alphabets."""
    from nlu_data_warehouse_project_spark.operators.winnow import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [(1, a + shared + b), (2, b + shared + a)], "doc_id long, text string"
    )
    fp = winnow_fingerprints(docs, "text", "doc_id", k=5, w=4)
    rows = fp.collect()
    g1 = {(r["fingerprint"], r["gram"]) for r in rows if r["id"] == 1}
    g2 = {(r["fingerprint"], r["gram"]) for r in rows if r["id"] == 2}
    assert g1 & g2, (a, shared, b)


def test_winnowing_selection_matches_reference(spark):
    """The windowed packed-key argmin reproduces a direct pure-Python
    robust-winnowing walk (per window: min hash, rightmost tie) on a
    fixed tie-rich string, position for position."""
    import hashlib

    from nlu_data_warehouse_project_spark.operators.winnow import (
        winnow_fingerprints,
    )

    text, k, w = "abababracadabraabab", 3, 4
    grams = [text[i:i + k] for i in range(len(text) - k + 1)]
    hs = [
        int(hashlib.md5(f"wn{k}:{g}".encode()).hexdigest()[:10], 16)
        for g in grams
    ]
    want = set()
    for j in range(len(hs) - w + 1):
        window = hs[j:j + w]
        m = min(window)
        # rightmost occurrence of the minimum
        sel = j + max(i for i, v in enumerate(window) if v == m)
        want.add((sel, hs[sel]))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        (r["pos"], r["fingerprint"])
        for r in winnow_fingerprints(docs, "text", "doc_id", k=k, w=w).collect()
    }
    assert got == want

    # short-doc convention: fewer than w grams -> single clipped window
    tiny = spark.createDataFrame([(1, "abcde")], "doc_id long, text string")
    got2 = winnow_fingerprints(tiny, "text", "doc_id", k=3, w=10).collect()
    hs2 = [
        int(hashlib.md5(f"wn3:{g}".encode()).hexdigest()[:10], 16)
        for g in ("abc", "bcd", "cde")
    ]
    m = min(hs2)
    assert {(r["pos"], r["fingerprint"]) for r in got2} == {
        (max(i for i, v in enumerate(hs2) if v == m), m)
    }


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(names=names_strategy)
def test_indexed_bipartite_probe_equals_unindexed(spark, names):
    """The persisted-index probe (frozen old-epoch token order, unseen
    tokens ranked rarest) returns EXACTLY the unindexed probe's pairs:
    the WWW'07 guarantee holds under any shared total order and the
    exact Jaccard verify makes the output order-independent."""
    from pyspark.sql import functions as F

    from nlu_data_warehouse_project_spark.operators.fuzzy import (
        build_token_prefix_index, token_blocked_pairs_bipartite,
    )

    docs = _docs(spark, names)
    old_docs = docs.filter(F.col("doc_id") % 3 != 0)
    new_docs = docs.filter(F.col("doc_id") % 3 == 0)
    plain = {
        frozenset((r["new_id"], r["old_id"])): r["jaccard"]
        for r in token_blocked_pairs_bipartite(
            new_docs, old_docs, "title", "doc_id", threshold=0.5
        ).collect()
    }
    idx = build_token_prefix_index(old_docs, "title", "doc_id", threshold=0.5)
    indexed = {
        frozenset((r["new_id"], r["old_id"])): r["jaccard"]
        for r in token_blocked_pairs_bipartite(
            new_docs, old_docs, "title", "doc_id", threshold=0.5,
            old_index=idx,
        ).collect()
    }
    assert indexed == plain
