"""Round-15 operator properties.

1. Streamed per-key recurrences (VERDICT r14 #3): the bounded-memory
   ``mapInPandas`` spellings of EWMA / Holt / greedy packing are
   BIT-EQUAL to their ``applyInPandas`` twins, verified with the Arrow
   batch size forced tiny so every key's series is split across many
   batches and the cross-batch state carry is actually exercised.
2. Edit-distance-2 blocking (VERDICT r14 #5): ``fuzzy.edit_pairs``
   at max_distance=2 matches a quadratic pure-Python Levenshtein
   reference on adversarial string sets (transposition-ish shapes,
   repeats, shared deletions), and the multi-token rare-token blocking
   matches a quadratic token-Jaccard reference.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@contextmanager
def tiny_arrow_batches(spark, n: int = 7):
    """Force mapInPandas to feed n-row Arrow batches so a 25-row key
    spans ~4 batches — without this the whole test frame fits in one
    batch and the cross-batch state carry would go untested."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


# ---------------------------------------------------------------------------
# streamed == applyInPandas, bit-for-bit, across forced batch boundaries
# ---------------------------------------------------------------------------

@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(series=st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=40,
))
def test_ewma_streamed_bitequal(spark, series):
    from nlu_data_warehouse_project_spark.operators.smooth import (
        ewma_by_key_grouped, ewma_by_key_streamed,
    )

    rows = [(k, i, float(v)) for i, (k, v) in enumerate(series)]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    want = {(r["k"], r["i"]): r["ewma"]
            for r in ewma_by_key_grouped(df, ["k"], "i", "v").collect()}
    with tiny_arrow_batches(spark):
        got = {(r["k"], r["i"]): r["ewma"]
               for r in ewma_by_key_streamed(df, ["k"], "i", "v").collect()}
    assert got == want  # exact float equality


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(series=st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=40,
))
def test_holt_streamed_bitequal(spark, series):
    from nlu_data_warehouse_project_spark.operators.smooth import (
        holt_by_key_grouped, holt_by_key_streamed,
    )

    rows = [(k, i, float(v)) for i, (k, v) in enumerate(series)]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    want = {(r["k"], r["i"]): (r["level"], r["trend"])
            for r in holt_by_key_grouped(df, ["k"], "i", "v").collect()}
    with tiny_arrow_batches(spark):
        got = {(r["k"], r["i"]): (r["level"], r["trend"])
               for r in holt_by_key_streamed(df, ["k"], "i", "v").collect()}
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(sizes=st.lists(
    st.tuples(st.integers(0, 2), st.integers(1, 80)), min_size=1, max_size=40,
))
def test_greedy_pack_streamed_bitequal(spark, sizes):
    from nlu_data_warehouse_project_spark.operators.packing import (
        greedy_pack_grouped, greedy_pack_streamed,
    )

    rows = [(f"k{k}", i, s) for i, (k, s) in enumerate(sizes)]
    df = spark.createDataFrame(rows, "key string, ord long, sz long")
    want = {(r["key"], r["ord"]): (r["pack_id"], r["pack_offset"])
            for r in greedy_pack_grouped(df, ["key"], "ord", "sz", 50).collect()}
    with tiny_arrow_batches(spark):
        got = {(r["key"], r["ord"]): (r["pack_id"], r["pack_offset"])
               for r in greedy_pack_streamed(df, ["key"], "ord", "sz", 50).collect()}
    assert got == want


def test_streamed_validation(spark):
    from nlu_data_warehouse_project_spark.operators.packing import (
        greedy_pack_streamed,
    )
    from nlu_data_warehouse_project_spark.operators.smooth import (
        ewma_by_key_streamed, holt_by_key_streamed,
    )

    df = spark.createDataFrame([(1, 1, 1.0)], "k long, i long, v double")
    with pytest.raises(ValueError):
        ewma_by_key_streamed(df, ["k"], "i", "v", alpha=0.0)
    with pytest.raises(ValueError):
        holt_by_key_streamed(df, ["k"], "i", "v", beta=1.5)
    with pytest.raises(ValueError):
        greedy_pack_streamed(df, ["k"], "i", "v", budget=0)


# ---------------------------------------------------------------------------
# edit-distance-2 deletion-neighborhood blocking == quadratic reference
# ---------------------------------------------------------------------------

def _lev(a: str, b: str) -> int:
    """Textbook O(len(a)*len(b)) Levenshtein — the quadratic reference
    the blocking join must agree with."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# shapes that stress the neighborhood algebra: repeats ("aa" variants
# collide), near-anagrams (distance 2 via two substitutions),
# rotations ("abc"/"bca" = distance 2 via delete+insert), length-2
# gaps, and strings far apart
_ER_CORPUS = [
    "alpha", "alpa", "alph", "aloha", "alphaa", "lpha", "apha",
    "beta", "betta", "bta", "abet",
    "aa", "aaa", "aaaa", "ab", "ba", "abc", "bca", "cab",
    "gamma", "gamm", "gmma", "gama", "magam",
    "x", "xy", "yx", "xyz",
]


def test_edit_pairs_d2_matches_quadratic_reference(spark):
    from nlu_data_warehouse_project_spark.operators.fuzzy import edit_pairs

    rows = [(i, s) for i, s in enumerate(_ER_CORPUS)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["a_id"], r["b_id"]): r["distance"]
           for r in edit_pairs(df, "name", "id", max_distance=2).collect()}
    want = {}
    for i, a in rows:
        for j, b in rows:
            if i < j and 1 <= _lev(a, b) <= 2:
                want[(i, j)] = _lev(a, b)
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(strings=st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=14,
    unique=True,
))
def test_edit_pairs_d2_random(spark, strings):
    """Random small-alphabet strings maximize deletion-neighborhood
    collisions — the regime where a false positive the final
    levenshtein filter misses, or a blocking recall gap, would show."""
    from nlu_data_warehouse_project_spark.operators.fuzzy import edit_pairs

    rows = list(enumerate(strings))
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["a_id"], r["b_id"]): r["distance"]
           for r in edit_pairs(df, "name", "id", max_distance=2).collect()}
    want = {(i, j): _lev(a, b)
            for i, a in rows for j, b in rows
            if i < j and 1 <= _lev(a, b) <= 2}
    assert got == want


def test_edit_pairs_d1_matches_edit1_pairs(spark):
    """max_distance=1 reproduces the original edit1_pairs exactly —
    the generalization didn't change the d=1 semantics."""
    from nlu_data_warehouse_project_spark.operators.fuzzy import (
        edit1_pairs, edit_pairs,
    )

    rows = [(i, s) for i, s in enumerate(_ER_CORPUS)]
    df = spark.createDataFrame(rows, "id long, name string")
    a = {(r["a_id"], r["b_id"], r["distance"])
         for r in edit_pairs(df, "name", "id", max_distance=1).collect()}
    b = {(r["a_id"], r["b_id"], r["distance"])
         for r in edit1_pairs(df, "name", "id").collect()}
    assert a == b


def test_edit_pairs_validation(spark):
    from nlu_data_warehouse_project_spark.operators.fuzzy import edit_pairs

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with pytest.raises(ValueError):
        edit_pairs(df, "name", "id", max_distance=0)
    with pytest.raises(ValueError):
        edit_pairs(df, "name", "id", max_distance=3)


# ---------------------------------------------------------------------------
# multi-token entity resolution: rare-token blocking == quadratic ref
# ---------------------------------------------------------------------------

_NAMES = [
    "acme global logistics", "acme global logistic", "acme logistics global",
    "acme worldwide logistics", "beta industrial supply", "beta industrial",
    "industrial supply beta", "gamma foods", "gamma food", "delta gamma foods",
    "epsilon", "epsilon corp", "zeta corp",
]


def _tokjac(a: str, b: str) -> float:
    sa, sb = set(a.split()), set(b.split())
    return len(sa & sb) / len(sa | sb)


def test_token_blocked_pairs_matches_quadratic_reference(spark):
    """Every pair at token-Jaccard >= threshold is found: two names
    with |A∩B|/|A∪B| >= 0.5 MUST share each other's rarest token?  No —
    blocking keys are each name's R rarest tokens, and the docstring's
    recall argument (a qualifying pair shares a token that is among
    one side's R rarest) is exactly what this quadratic check
    verifies on an adversarial corpus."""
    from nlu_data_warehouse_project_spark.operators.fuzzy import (
        token_blocked_pairs,
    )

    rows = [(i, s) for i, s in enumerate(_NAMES)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["a_id"], r["b_id"]): r["jaccard"]
           for r in token_blocked_pairs(df, "name", "id", threshold=0.5).collect()}
    want = {(i, j): _tokjac(a, b)
            for i, a in rows for j, b in rows
            if i < j and _tokjac(a, b) >= 0.5}
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9
