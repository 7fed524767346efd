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
