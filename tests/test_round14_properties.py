"""Round-14 operator properties: greedy no-split packing invariants
(vs a pure-Python reference), priority-sampling determinism and
weight-sensitivity."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BUDGET = 50


def _ref_pack(sizes: list[int], budget: int) -> list[tuple[int, int]]:
    """Pure-Python first-fit-in-order reference: (pack_id, offset)."""
    out, pack, acc = [], 0, 0
    for i, s in enumerate(sizes):
        if i > 0 and acc + s > budget:
            pack += 1
            acc = 0
        out.append((pack, acc))
        acc += s
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=80), min_size=1, max_size=40),
)
def test_greedy_pack_matches_reference(spark, sizes):
    from nlu_data_warehouse_project_spark.operators.packing import greedy_pack

    rows = [("k", i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "key string, ord long, sz long")
    got = {
        r["ord"]: (r["pack_id"], r["pack_offset"])
        for r in greedy_pack(df, ["key"], "ord", "sz", BUDGET).collect()
    }
    want = dict(enumerate(_ref_pack(sizes, BUDGET)))
    assert got == want

    # invariants the reference itself must satisfy: no pack exceeds the
    # budget unless it is a single oversize row; offsets restart at 0
    fills: dict[int, int] = {}
    for i, s in enumerate(sizes):
        p, off = want[i]
        assert off == fills.get(p, 0)
        fills[p] = off + s
    for p, fill in fills.items():
        members = [s for i, s in enumerate(sizes) if want[i][0] == p]
        assert fill <= BUDGET or len(members) == 1


def test_greedy_pack_keys_are_independent(spark):
    """Packing state never leaks across keys, and a row larger than
    the budget gets a pack of its own."""
    from nlu_data_warehouse_project_spark.operators.packing import greedy_pack

    rows = [("a", 1, 40), ("a", 2, 40), ("b", 1, 999), ("b", 2, 10), ("b", 3, 45)]
    df = spark.createDataFrame(rows, "key string, ord long, sz long")
    got = {
        (r["key"], r["ord"]): (r["pack_id"], r["pack_offset"])
        for r in greedy_pack(df, ["key"], "ord", "sz", BUDGET).collect()
    }
    assert got[("a", 1)] == (0, 0) and got[("a", 2)] == (1, 0)  # 40+40 > 50
    assert got[("b", 1)] == (0, 0)      # oversize row: own pack, not an error
    assert got[("b", 2)] == (1, 0)      # next row starts fresh
    assert got[("b", 3)] == (2, 0)      # 10+45 > 50
    with pytest.raises(ValueError):
        greedy_pack(df, ["key"], "ord", "sz", 0)


def _md5_bucket(seed: int, ident) -> int:
    return int(hashlib.md5(f"{seed}:{ident}".encode()).hexdigest()[:15], 16) % 10_000


def test_priority_sample_topk_matches_pure_python(spark):
    """The kept set and the priority doubles both equal a pure-Python
    recompute (same md5 uniform, same IEEE divide) — the cross-engine
    exactness claim q345's hash gate rests on."""
    from nlu_data_warehouse_project_spark.operators.sampling import (
        priority_sample_topk,
    )

    rows = [("g", i, float(1 + (i * 7) % 20)) for i in range(50)]
    df = spark.createDataFrame(rows, "grp string, id long, w double")
    got = {
        r["id"]: r["priority"]
        for r in priority_sample_topk(df, ["grp"], 5, "id", "w").collect()
    }
    pri = {
        i: w / ((_md5_bucket(42, i) + 1) / 10_000.0) for _, i, w in rows
    }
    want_ids = sorted(pri, key=lambda i: (-pri[i], i))[:5]
    assert sorted(got) == sorted(want_ids)
    for i in got:
        assert got[i] == pri[i]  # bit-identical, no tolerance

    # determinism across reruns / repartitioning
    again = {
        r["id"]
        for r in priority_sample_topk(df.repartition(7), ["grp"], 5, "id", "w").collect()
    }
    assert again == set(got)

    # heavier rows must dominate: an extreme-weight row always wins
    heavy = df.union(spark.createDataFrame([("g", 999, 1e9)], df.schema))
    kept = {
        r["id"] for r in priority_sample_topk(heavy, ["grp"], 5, "id", "w").collect()
    }
    assert 999 in kept
    with pytest.raises(ValueError):
        priority_sample_topk(df, ["grp"], 0, "id", "w")


def test_gap_fill_both_methods(spark):
    """Hand-computed fixture: spine densifies each key's own span,
    ffill steps, linear draws the straight line, observed flags mark
    the real rows, and keys never leak into each other."""
    import datetime as dt

    from nlu_data_warehouse_project_spark.operators.timeseries import gap_fill

    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 10.0),
        ("a", d(2024, 1, 4), 40.0),   # 2-day hole
        ("a", d(2024, 1, 5), 0.0),
        ("b", d(2024, 2, 10), 5.0),   # different span entirely
        ("b", d(2024, 2, 12), 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, day date, v double")

    ff = {(r["k"], r["day"]): (r["filled"], r["observed"])
          for r in gap_fill(df, ["k"], "day", "v", method="ffill").collect()}
    assert ff[("a", d(2024, 1, 2))] == (10.0, 0)
    assert ff[("a", d(2024, 1, 3))] == (10.0, 0)
    assert ff[("a", d(2024, 1, 4))] == (40.0, 1)
    assert ff[("b", d(2024, 2, 11))] == (5.0, 0)
    assert len(ff) == 5 + 3  # a: 5 days, b: 3 days

    li = {(r["k"], r["day"]): r["filled"]
          for r in gap_fill(df, ["k"], "day", "v", method="linear").collect()}
    assert li[("a", d(2024, 1, 2))] == 20.0   # 10 + (40-10)*1/3
    assert li[("a", d(2024, 1, 3))] == 30.0
    assert li[("a", d(2024, 1, 4))] == 40.0   # observed rows pass through
    assert li[("b", d(2024, 2, 11))] == 7.0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        gap_fill(df, ["k"], "day", "v", method="nearest")


def test_heavy_hitters_mg_exactness(spark):
    """MG candidates + exact verify must equal the plain exact heavy
    hitters even when the counter table is SMALLER than the vocabulary
    (evictions exercised), on a skewed fixture."""
    from nlu_data_warehouse_project_spark.operators.sketches import (
        heavy_hitters, heavy_hitters_mg,
    )

    # zipf-ish: value v appears ~ 600//(v+1) times over 30 values
    rows = [(v,) for v in range(30) for _ in range(600 // (v + 1))]
    df = spark.createDataFrame(rows, "key long").repartition(8)

    exact = {(r["key"], r["n"], r["share"])
             for r in heavy_hitters(df, "key", 0.02).collect()}
    # counters just above the 1/min_share floor: vocabulary (30) far
    # exceeds the table (51 > 50 needed... force small: use 0.02 -> 50)
    got = {(r["key"], r["n"], r["share"])
           for r in heavy_hitters_mg(df, "key", 0.02).collect()}
    assert got == exact and len(exact) > 0

    # tight counter table (vocab 30 > counters 11 for min_share 0.1)
    exact10 = {(r["key"], r["n"]) for r in heavy_hitters(df, "key", 0.1).collect()}
    got10 = {(r["key"], r["n"])
             for r in heavy_hitters_mg(df, "key", 0.1, counters=11).collect()}
    assert got10 == exact10 and len(exact10) > 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        heavy_hitters_mg(df, "key", 0.1, counters=5)  # below the guarantee
    with _pytest.raises(ValueError):
        heavy_hitters_mg(df, "key", 0.0)
