"""Hypothesis property tests for the round-8 operators: largest-
remainder allocation quota/total invariants, Gini bounds, survivorship
against a pandas reference, distribution-match downsample laws."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window, functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _alloc(spark, counts: list[int], budget: int):
    """The q113 largest-remainder computation over arbitrary counts."""
    rows = [(f"s{i:03d}", int(n)) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "source string, n long")
    g = Window.partitionBy()
    out = (
        df.withColumn("__tot", F.sum("n").over(g))
        .withColumn("__fl", F.expr(f"(n * {budget}) div __tot"))
        .withColumn("__rem", (F.col("n") * budget) % F.col("__tot"))
        .withColumn(
            "__rk",
            F.row_number().over(Window.orderBy(F.col("__rem").desc(), F.col("source").asc())),
        )
        .withColumn("__short", F.lit(budget) - F.sum("__fl").over(g))
        .select(
            "source", "n",
            (F.col("__fl") + F.when(F.col("__rk") <= F.col("__short"), 1).otherwise(0)).alias("alloc"),
        )
    )
    return {r["source"]: (r["n"], r["alloc"]) for r in out.collect()}


@settings(**SETTINGS)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=12),
    budget=st.integers(min_value=1, max_value=10**6),
)
def test_largest_remainder_quota_and_total(spark, counts, budget):
    got = _alloc(spark, counts, budget)
    total = sum(n for n, _ in got.values())
    # exact-total: allocations always sum to the budget
    assert sum(a for _, a in got.values()) == budget
    # quota property (Hamilton's method): every allocation is the floor
    # or ceil of its exact proportional share
    for n, a in got.values():
        exact = n * budget / total
        assert int(exact) <= a <= int(exact) + 1


@settings(**SETTINGS)
@given(counts=st.lists(st.integers(min_value=1, max_value=10**6), min_size=2, max_size=10))
def test_gini_bounds_and_equality_case(spark, counts):
    df = spark.createDataFrame(
        [(i, int(n)) for i, n in enumerate(counts)], "user_id long, x long"
    )
    ranked = df.withColumn(
        "i", F.row_number().over(Window.orderBy(F.col("x").asc(), F.col("user_id").asc()))
    )
    g = Window.partitionBy()
    row = (
        ranked.select(
            F.sum(F.col("i") * F.col("x")).over(g).alias("ix"),
            F.sum("x").over(g).alias("sx"),
            F.count(F.lit(1)).over(g).alias("n"),
        )
        .limit(1)
        .collect()[0]
    )
    gini = (2 * row["ix"] - (row["n"] + 1) * row["sx"]) / (row["n"] * row["sx"])
    assert 0.0 <= gini < 1.0
    if len(set(counts)) == 1:
        assert gini == 0.0


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),              # key
            st.one_of(st.none(), st.text(alphabet="ab", max_size=2)),  # value
        ),
        min_size=1,
        max_size=20,
    )
)
def test_survivorship_first_matches_reference(spark, rows):
    from nlu_data_warehouse_project_spark.operators.cleanse import survivorship_merge

    data = [(k, i, v) for i, (k, v) in enumerate(rows)]  # unique order col i
    df = spark.createDataFrame(data, "k int, i int, v string")
    got = {
        r["k"]: r["v"]
        for r in survivorship_merge(df, ["k"], {"v": ("first", "i")}).collect()
    }
    # reference: first non-null v in ascending i per key
    want: dict[int, str | None] = {}
    for k, i, v in sorted(data, key=lambda t: t[1]):
        want.setdefault(k, None)
        if want[k] is None and v is not None:
            want[k] = v
    assert got == want


@settings(**SETTINGS)
@given(
    ref_counts=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=4),
    cand_counts=st.lists(st.integers(min_value=1, max_value=80), min_size=1, max_size=4),
)
def test_match_distribution_downsample_laws(spark, ref_counts, cand_counts):
    from nlu_data_warehouse_project_spark.operators.sampling import match_distribution

    ref_rows, cand_rows, nid = [], [], 0
    for b, n in enumerate(ref_counts):
        for _ in range(n):
            ref_rows.append((nid, f"b{b}")); nid += 1
    for b, n in enumerate(cand_counts):
        for _ in range(n):
            cand_rows.append((nid, f"b{b}")); nid += 1
    ref = spark.createDataFrame(ref_rows, "id long, b string")
    cand = spark.createDataFrame(cand_rows, "id long, b string")
    kept = match_distribution(cand, ref, "b", "id").collect()
    cand_ids = {r[0] for r in cand_rows}
    shared = {f"b{b}" for b in range(min(len(ref_counts), len(cand_counts)))}
    # downsample-only: kept rows are candidate rows, in ref-known buckets
    assert all(r["id"] in cand_ids and r["b"] in shared for r in kept)
    # the argmax-ratio bucket keeps everything (keep fraction 1.0)
    ratios = {
        f"b{b}": ref_counts[b] / cand_counts[b]
        for b in range(min(len(ref_counts), len(cand_counts)))
    }
    top = max(sorted(ratios), key=lambda k: ratios[k])
    n_top_kept = sum(1 for r in kept if r["b"] == top)
    assert n_top_kept == cand_counts[int(top[1:])]
