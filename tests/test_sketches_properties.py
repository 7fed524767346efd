"""Sketch-operator error bounds + Hypothesis property tests for the
SCD2 merge invariants."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    heavy_hitters,
)
from nlu_data_warehouse_project_spark.operators.scd2 import scd2_merge

OPEN = dt.date(9999, 12, 31)


def test_approx_distinct_error_bound(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    exact = li.select("l_partkey").distinct().count()
    approx = approx_distinct(li, "l_partkey", rsd=0.02).first()[0]
    assert abs(approx - exact) / exact < 0.1


def test_approx_quantiles_bound(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    [q50] = approx_quantiles(li, "l_quantity", [0.5], rel_err=0.01)
    exact = li.selectExpr("percentile(l_quantity, 0.5)").first()[0]
    assert abs(q50 - exact) <= max(1.0, 0.05 * exact)


def test_heavy_hitters_threshold(spark):
    df = spark.createDataFrame([("hot",)] * 90 + [("cold",)] * 10, ["k"])
    hh = {r["k"]: r["share"] for r in heavy_hitters(df, "k", min_share=0.5).collect()}
    assert hh == {"hot": 0.9}


# --- SCD2 merge invariants over generated day sequences -----------------

@st.composite
def day_batches(draw):
    """A sequence of 2-4 daily batches over a small key space with
    arbitrary value changes/appearances/disappearances."""
    n_days = draw(st.integers(min_value=2, max_value=4))
    keys = [f"k{i}" for i in range(draw(st.integers(min_value=1, max_value=5)))]
    days = []
    for _ in range(n_days):
        present = draw(st.lists(st.sampled_from(keys), unique=True, max_size=len(keys)))
        rows = [(k, draw(st.integers(min_value=0, max_value=3))) for k in present]
        days.append(rows)
    return days


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(day_batches())
def test_scd2_invariants(spark, batches):
    dw = spark.createDataFrame([], "k string, v int, dt_load_to_dw date, dt_last_update date")
    dates = [f"2024-01-{d+1:02d}" for d in range(len(batches))]
    seen_keys = set()
    for day, rows in zip(dates, batches):
        batch = spark.createDataFrame(rows, "k string, v int") if rows else spark.createDataFrame([], "k string, v int")
        dw = scd2_merge(dw, batch, key="k", attrs=["v"], run_date=day)
        # materialize to keep lineage bounded across iterations
        dw = spark.createDataFrame(dw.collect(), dw.schema)
        seen_keys |= {k for k, _ in rows}

    result = dw.collect()
    # I1: exactly one open row per key ever seen
    open_rows = [r for r in result if r["dt_last_update"] == OPEN]
    assert sorted(r["k"] for r in open_rows) == sorted(seen_keys)
    # I2: closed rows close at a real run date, open rows carry the
    # load date of the run that inserted them
    for r in result:
        assert str(r["dt_load_to_dw"]) in dates
        if r["dt_last_update"] != OPEN:
            assert str(r["dt_last_update"]) in dates
            assert r["dt_last_update"] > r["dt_load_to_dw"] or r["dt_last_update"] == r["dt_load_to_dw"]
    # I3: per key, version intervals never overlap: sort by load date,
    # each close date <= next load date
    by_key: dict[str, list] = {}
    for r in result:
        by_key.setdefault(r["k"], []).append(r)
    for k, versions in by_key.items():
        versions.sort(key=lambda r: (r["dt_load_to_dw"], r["dt_last_update"]))
        for a, b in zip(versions, versions[1:]):
            assert a["dt_last_update"] <= b["dt_load_to_dw"], (k, versions)


# --- sequence-packing invariants over generated corpora ------------------

@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),                       # source stream
            st.integers(min_value=0, max_value=12),            # token count
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=7),                     # context_len
)
def test_pack_documents_invariants(spark, docs, ctx):
    """Packing is a partition of each source's token stream: offsets
    are contiguous in id order, the containing pack is consistent with
    the offset, and spans cover exactly the doc's token range."""
    from nlu_data_warehouse_project_spark.operators.chunking import pack_documents

    rows = [(src, i, "w " * n) for i, (src, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = sorted(
        pack_documents(df, context_len=ctx).collect(),
        key=lambda r: (r["source"], r["doc_id"]),
    )
    streams: dict[str, int] = {}
    for r in out:
        expected_start = streams.get(r["source"], 0)
        assert r["start_offset"] == expected_start          # contiguous, id-ordered
        streams[r["source"]] = expected_start + r["n_tokens"]
        assert r["pack_id"] == r["start_offset"] // ctx
        if r["n_tokens"] == 0:
            assert r["n_packs_spanned"] == 0
        else:
            last = r["start_offset"] + r["n_tokens"] - 1
            assert r["n_packs_spanned"] == last // ctx - r["pack_id"] + 1


# --- snapshot-diff invariants -------------------------------------------

@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(st.integers(0, 9), st.integers(0, 3), max_size=8),
    st.dictionaries(st.integers(0, 9), st.integers(0, 3), max_size=8),
)
def test_snapshot_diff_invariants(spark, old_kv, new_kv):
    """Diff exactly reconstructs the set difference: applying the diff
    to `old` yields `new` (added+changed rows in, removed keys out),
    and unchanged keys never appear."""
    from nlu_data_warehouse_project_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(list(old_kv.items()) or [(None, None)], "k int, v int").filter("k is not null")
    new = spark.createDataFrame(list(new_kv.items()) or [(None, None)], "k int, v int").filter("k is not null")
    diff = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}

    for k, r in diff.items():
        if r["change"] == "added":
            assert k in new_kv and k not in old_kv and r["v"] == new_kv[k]
        elif r["change"] == "removed":
            assert k in old_kv and k not in new_kv and r["v"] == old_kv[k]
        else:
            assert old_kv[k] != new_kv[k] and r["v"] == new_kv[k]
    # completeness: every differing key is reported
    for k in set(old_kv) | set(new_kv):
        differs = (k not in old_kv) or (k not in new_kv) or old_kv[k] != new_kv[k]
        assert (k in diff) == differs


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=12), min_size=1, max_size=12
    ),
    split=st.integers(min_value=0, max_value=12),
)
def test_bloom_dedup_property_equivalent_to_exact(spark, texts, split):
    """For ANY corpus/batch split, the bloom path returns exactly the
    plain anti-join's survivors — the no-false-negative guarantee is a
    property, not an example."""
    from nlu_data_warehouse_project_spark.operators.dedup import (
        bloom_incremental_dedup,
        incremental_exact_dedup,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    existing = df.filter(F.col("doc_id") < split)
    incoming = df.filter(F.col("doc_id") >= split)
    want = sorted(r["doc_id"] for r in incremental_exact_dedup(incoming, existing).collect())
    got = sorted(
        r["doc_id"]
        for r in bloom_incremental_dedup(incoming, existing, num_bits=1 << 12).collect()
    )
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.text(alphabet="xy z", min_size=0, max_size=6), min_size=1, max_size=5),
        min_size=1,
        max_size=6,
    )
)
def test_dedup_lines_identity_when_nothing_heavy(spark, docs):
    """With the threshold above the corpus size no line is ever heavy:
    every document must reconstruct EXACTLY (order, duplicates, blanks)
    — the round-trip invariant of the explode/reassemble machinery."""
    from nlu_data_warehouse_project_spark.operators.cleanse import dedup_lines

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in dedup_lines(df, max_doc_frequency=len(docs) + 1).collect()}
    assert out == {i: t for i, t in rows}


# ---------------------------------------------------------------------------
# KMV intersection estimator (round 15): exactness below saturation,
# bounded error above it, identities the coincidence algebra must obey
# ---------------------------------------------------------------------------

def _overlap_frame(spark, n_a: int, n_b: int, n_shared: int):
    """Two groups over integer ids with a planted overlap: A = [0,
    n_a), B = [n_a - n_shared, n_a - n_shared + n_b)."""
    rows = [("A", i) for i in range(n_a)]
    rows += [("B", i) for i in range(n_a - n_shared, n_a - n_shared + n_b)]
    return spark.createDataFrame(rows, "g string, v long")


def test_kmv_intersection_exact_below_saturation(spark):
    """With |A ∪ B| < k the sketches hold EVERY hash, so jaccard,
    union and intersection estimates are exact integers/ratios."""
    from nlu_data_warehouse_project_spark.operators.sketches import (
        kmv_jaccard_pairs, kmv_sketch,
    )

    df = _overlap_frame(spark, n_a=30, n_b=25, n_shared=10)
    sk = kmv_sketch(df, "v", ["g"], k=64)
    row = kmv_jaccard_pairs(sk, "g", k=64).collect()[0]
    assert (row["group_a"], row["group_b"]) == ("A", "B")
    assert row["n_common"] == 10
    assert row["n_union_kept"] == 45
    assert row["union_est"] == 45.0
    assert abs(row["jaccard_est"] - 10 / 45) < 1e-12
    assert abs(row["inter_est"] - 10.0) < 1e-9


def test_kmv_intersection_error_bounded_above_saturation(spark):
    """Planted 50% overlap at 40x saturation: the k=64 coincidence
    estimator must land within a loose 4-sigma-ish band (sigma ~
    J*sqrt((1-J)/(J*k)) ~ 0.09 here), and disjoint groups must
    estimate ~0 intersection."""
    from nlu_data_warehouse_project_spark.operators.sketches import (
        kmv_jaccard_pairs, kmv_sketch,
    )

    df = _overlap_frame(spark, n_a=2000, n_b=2000, n_shared=1000)
    sk = kmv_sketch(df, "v", ["g"], k=64)
    row = kmv_jaccard_pairs(sk, "g", k=64).collect()[0]
    true_j = 1000 / 3000
    assert abs(row["jaccard_est"] - true_j) < 0.2
    assert 400 < row["inter_est"] < 1800  # truth 1000

    disjoint = _overlap_frame(spark, n_a=1000, n_b=1000, n_shared=0)
    skd = kmv_sketch(disjoint, "v", ["g"], k=64)
    rowd = kmv_jaccard_pairs(skd, "g", k=64).collect()[0]
    assert rowd["jaccard_est"] <= 0.05 and rowd["inter_est"] <= 60.0


def test_kmv_intersection_identity_self_pair(spark):
    """A group paired with an identical-content group: jaccard_est
    must be exactly 1.0 (every union hash coincides) regardless of
    saturation — the estimator's fixed point."""
    from nlu_data_warehouse_project_spark.operators.sketches import (
        kmv_jaccard_pairs, kmv_sketch,
    )

    rows = [("A", i) for i in range(500)] + [("B", i) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = kmv_sketch(df, "v", ["g"], k=64)
    row = kmv_jaccard_pairs(sk, "g", k=64).collect()[0]
    assert row["jaccard_est"] == 1.0
    assert row["n_common"] == row["n_union_kept"] == 64


# --- HyperLogLog: merge losslessness + accuracy + python recompute ------

def test_hll_merge_lossless_and_accurate(spark):
    """Registers merged from arbitrary partitions of the data equal
    the registers built from scratch (max is associative), and the
    p=10 estimate lands within 5 sigma (5 * 1.04/sqrt(m)) of the true
    5000-value cardinality."""
    from nlu_data_warehouse_project_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    n = 5000
    df = spark.createDataFrame(
        [(f"part{i % 3}", f"v{i}") for i in range(n)], ["part", "val"]
    )
    per_part = hll_registers(df, "val", ["part"], p=10)
    merged = hll_merge(per_part, None)
    scratch = hll_registers(df, "val", None, p=10)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, scratch.collect())
    )
    est = float(hll_estimate(merged, None, p=10).first()["hll_estimate"])
    assert abs(est - n) / n < 5 * 1.04 / (1 << 10) ** 0.5


def test_hll_registers_match_python_recompute(spark):
    """Bucket/rho construction against a from-scratch md5 recompute:
    top-p bits bucket, 1 + leading zeros of the low 60-p bits."""
    import hashlib

    from nlu_data_warehouse_project_spark.operators.sketches import hll_registers

    vals = [f"x{i}" for i in range(200)]
    p, rest_bits = 8, 52
    want: dict[int, int] = {}
    for v in vals:
        h60 = int(hashlib.md5(f"77:{v}".encode()).hexdigest()[:15], 16)
        bucket = h60 >> rest_bits
        rest = h60 & ((1 << rest_bits) - 1)
        rho = rest_bits + 1 - rest.bit_length() if rest else rest_bits + 1
        want[bucket] = max(want.get(bucket, 0), rho)
    df = spark.createDataFrame([(v,) for v in vals], ["val"])
    got = {
        r["bucket"]: r["rho"]
        for r in hll_registers(df, "val", None, p=p).collect()
    }
    assert got == want


def test_hll_linear_counting_branch_small_cardinality(spark):
    """Below ~2.5m the estimator must switch to linear counting,
    where a cardinality far under m is recovered near-exactly."""
    from nlu_data_warehouse_project_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    df = spark.createDataFrame([(f"v{i}",) for i in range(40)], ["val"])
    reg = hll_registers(df, "val", None, p=10)
    row = hll_estimate(reg, None, p=10).first()
    assert row["n_buckets_set"] <= 40
    assert abs(float(row["hll_estimate"]) - 40) / 40 < 0.05
