"""Hypothesis property tests for the round-9 operators: the exact
distributed-rank family against brute-force references on arbitrary
inputs (duplicates, skew, N < partitions), skyline dominance laws, and
sketch-fence bucket totality."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

VALS = st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60)


def _frame(spark, vals):
    return spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(vals)], "k long, v long"
    )


@given(vals=VALS, parts=st.integers(min_value=1, max_value=9))
@settings(**SETTINGS)
def test_exact_rank_is_a_permutation_of_the_sort(spark, vals, parts):
    df = _frame(spark, vals)
    from nlu_data_warehouse_project_spark.operators.scale import exact_global_rank

    got = exact_global_rank(
        df, [F.col("v").asc(), F.col("k").asc()], num_partitions=parts
    ).collect()
    expect = {
        k: i + 1
        for i, (v, k) in enumerate(sorted((int(v), i) for i, v in enumerate(vals)))
    }
    assert {r["k"]: r["rank"] for r in got} == expect


@given(
    vals=VALS,
    b=st.integers(min_value=1, max_value=12),
    parts=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_exact_ntile_bucket_sizes_follow_sql_law(spark, vals, b, parts):
    """SQL ntile law: first N mod B buckets hold ceil(N/B) rows, the
    rest floor(N/B); assignment follows the total order."""
    from nlu_data_warehouse_project_spark.operators.scale import exact_global_ntile

    df = _frame(spark, vals)
    got = exact_global_ntile(
        df, [F.col("v").asc(), F.col("k").asc()], b, num_partitions=parts
    ).collect()
    n = len(vals)
    q, r = divmod(n, b)
    sizes: dict[int, int] = {}
    for row in got:
        sizes[row["bucket"]] = sizes.get(row["bucket"], 0) + 1
    for bucket, size in sizes.items():
        assert size == (q + 1 if bucket <= r else q), (n, b, sizes)
    # order-respecting: a lower-ranked row never has a higher bucket
    order = {r_["k"]: r_["bucket"] for r_ in got}
    ranked = sorted((int(v), i) for i, v in enumerate(vals))
    buckets = [order[k] for _, k in ranked]
    assert buckets == sorted(buckets)


@given(vals=VALS, parts=st.integers(min_value=1, max_value=6))
@settings(**SETTINGS)
def test_skyline_dominance_laws(spark, vals, parts):
    """Every kept point is undominated; every dropped point is
    dominated by some kept point (dominates = earlier in the
    (price asc, size desc, key asc) order with >= size)."""
    from nlu_data_warehouse_project_spark.operators.scale import exact_prefix_agg

    rows = [(i, int(v), int((v * 7 + i * 3) % 40)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, price long, size long")
    pm = exact_prefix_agg(
        df,
        [F.col("price").asc(), F.col("size").desc(), F.col("k").asc()],
        "size",
        how="max",
        cum_col="best",
        exclusive=True,
        num_partitions=parts,
    )
    kept = {
        r["k"]
        for r in pm.filter(
            F.col("best").isNull() | (F.col("size") > F.col("best"))
        ).collect()
    }
    ordered = sorted(rows, key=lambda r: (r[1], -r[2], r[0]))
    best = None
    expect = set()
    for k, _p, s in ordered:
        if best is None or s > best:
            expect.add(k)
            best = s if best is None else max(best, s)
    assert kept == expect


@given(
    vals=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=80),
    b=st.integers(min_value=2, max_value=10),
)
@settings(**SETTINGS)
def test_approx_buckets_are_total_and_monotone(spark, vals, b):
    """Every row lands in exactly one bucket in [1, B], and bucket
    assignment is monotone in the value."""
    from nlu_data_warehouse_project_spark.operators.scale import approx_value_buckets

    df = _frame(spark, vals)
    got = approx_value_buckets(df, "v", n_buckets=b, accuracy=100000).collect()
    assert len(got) == len(vals)
    by_val = sorted((r["v"], r["bucket"]) for r in got)
    assert all(1 <= bk <= b for _, bk in by_val)
    assert [bk for _, bk in by_val] == sorted(bk for _, bk in by_val)


@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)),
        min_size=1, max_size=25,
    ),
    hops=st.integers(min_value=0, max_value=4),
)
@settings(**SETTINGS)
def test_bfs_hops_matches_pure_python_bfs(spark, edges, hops):
    """bfs_hops == a dict-based BFS on arbitrary small digraphs
    (self-loops, duplicate edges, unreachable islands included)."""
    from nlu_data_warehouse_project_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["hops"] for r in bfs_hops(e, 0, max_hops=hops).collect()}

    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    expect = {0: 0}
    frontier = [0]
    for h in range(1, hops + 1):
        nxt = sorted({d for s in frontier for d in adj.get(s, ()) if d not in expect})
        for d in nxt:
            expect[d] = h
        frontier = nxt
    assert got == expect


@given(
    texts=st.lists(
        st.lists(st.sampled_from("ab cd ef gh ij".split()), min_size=0, max_size=6),
        min_size=1, max_size=12,
    ),
    k=st.integers(min_value=1, max_value=3),
)
@settings(**SETTINGS)
def test_rare_ngram_score_matches_pure_python_counts(spark, texts, k):
    """rare_ngram_score == a Counter-based reference on arbitrary
    small corpora: per-doc bigram multiset probed against global
    occurrence counts, rate = rare/total."""
    from collections import Counter

    from nlu_data_warehouse_project_spark.operators.profile import rare_ngram_score

    docs = [(i, " ".join(words)) for i, words in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in rare_ngram_score(df, rare_max_count=k).collect()}

    per_doc: dict[int, list[tuple[str, str]]] = {}
    global_counts: Counter = Counter()
    for i, words in enumerate(texts):
        grams = [(words[j], words[j + 1]) for j in range(len(words) - 1)]
        per_doc[i] = grams
        global_counts.update(grams)
    for i, grams in per_doc.items():
        n_rare = sum(1 for g in grams if global_counts[g] <= k)
        assert got[i]["n_bigrams"] == len(grams), (i, texts[i])
        assert got[i]["n_rare"] == n_rare
        if grams:
            assert got[i]["rare_rate"] == round(n_rare / len(grams), 6)
        else:
            assert got[i]["rare_rate"] is None
