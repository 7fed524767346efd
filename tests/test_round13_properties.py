"""Round-13 graph convergence properties (VERDICT r12 #3): the
run-to-fixpoint k-core and tolerance-stopped PageRank must agree
bit-for-bit with their fixed-round siblings at the audited round
count, on arbitrary Hypothesis-generated graphs — plus the ADVICE r12
multiplicity-invariance contract for k-core peeling."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_EDGES = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=30,
)


def _pure_kcore_fixpoint(edges: list, k: int) -> dict:
    """Reference peel-to-fixpoint in pure Python over DISTINCT edges."""
    e = set(edges)
    while True:
        deg: dict = {}
        for s, _ in e:
            deg[s] = deg.get(s, 0) + 1
        keep = {s for s, d in deg.items() if d >= k}
        ne = {(s, d) for s, d in e if s in keep and d in keep}
        if ne == e:
            break
        e = ne
    out: dict = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=_EDGES, k=st.integers(1, 4))
def test_kcore_fixpoint_matches_pure_python_and_fixed_rounds(spark, edges, k):
    """kcore_peel == the pure-Python fixpoint AND == kcore_peel_rounds
    at any round budget >= the audited convergence depth (extra rounds
    are no-ops once stable) — including on inputs with DUPLICATE edge
    rows, which both operators must dedup (ADVICE r12)."""
    from nlu_data_warehouse_project_spark.operators.graph import (
        kcore_peel, kcore_peel_rounds,
    )

    # duplicate every edge once: the result must be multiplicity-invariant
    df = spark.createDataFrame(edges + edges, "src long, dst long")
    core, audit = kcore_peel(df, k)
    got = {r["node"]: r["degree"] for r in core.collect()}

    assert got == _pure_kcore_fixpoint(edges, k)
    assert audit["converged"] is True
    assert len(audit["edge_counts"]) == audit["rounds_run"]
    # surviving edge counts shrink monotonically to the fixpoint
    counts = audit["edge_counts"]
    assert all(a >= b for a, b in zip(counts, counts[1:]))

    fixed = {
        r["node"]: r["degree"]
        for r in kcore_peel_rounds(df, k, rounds=audit["rounds_run"] + 2).collect()
    }
    assert got == fixed


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=20, unique=True,
), tol_exp=st.integers(6, 11))
def test_pagerank_fixpoint_equals_fixed_rounds_at_audited_count(spark, edges, tol_exp):
    """pagerank_fixpoint(tol) == pagerank_rounds(rounds=audit rounds)
    bit-for-bit, and the audit's delta trace respects the stopping
    rule: every recorded delta but the last exceeds tol, the last is
    <= tol iff converged."""
    from nlu_data_warehouse_project_spark.operators.graph import (
        pagerank_fixpoint, pagerank_rounds,
    )

    tol = 10 ** tol_exp
    df = spark.createDataFrame(edges, "src long, dst long")
    rank, audit = pagerank_fixpoint(df, tol_units=tol, max_rounds=12)
    got = {r["node"]: r["rank_units"] for r in rank.collect()}

    fixed = {
        r["node"]: r["rank_units"]
        for r in pagerank_rounds(df, rounds=audit["rounds_run"]).collect()
    }
    assert got == fixed
    deltas = audit["l1_deltas"]
    assert len(deltas) == audit["rounds_run"]
    assert all(d > tol for d in deltas[:-1])
    if audit["converged"]:
        assert deltas[-1] <= tol
    else:
        assert audit["rounds_run"] == 12 and (not deltas or deltas[-1] > tol)


def test_kcore_fixpoint_empty_and_validation(spark):
    from nlu_data_warehouse_project_spark.operators.graph import kcore_peel

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        kcore_peel(e, 0)
    with pytest.raises(ValueError):
        kcore_peel(e, 2, max_rounds=0)
    # a single directed edge peels to nothing at k=1 fixpoint?  no:
    # node 1 has out-degree 1 >= 1, node 2 has 0 -> drop 2 -> edge
    # (1,2) dies -> then node 1 drops: the true 1-core here is empty
    core, audit = kcore_peel(e, 1)
    assert core.count() == 0
    assert audit["converged"] is True


def test_pagerank_fixpoint_validation_and_budget_exit(spark):
    from nlu_data_warehouse_project_spark.operators.graph import pagerank_fixpoint

    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_fixpoint(e, tol_units=-1)
    with pytest.raises(ValueError):
        pagerank_fixpoint(e, tol_units=0, max_rounds=-1)
    # tol=0 on a 2-cycle: deg=1 everywhere so DIV loses nothing and the
    # symmetric ranks reach an exact integer fixpoint quickly
    rank, audit = pagerank_fixpoint(e, tol_units=0, max_rounds=30)
    assert audit["converged"] is True
    vals = {r["node"]: r["rank_units"] for r in rank.collect()}
    assert vals[1] == vals[2]


def test_shuffle_partitions_conf_fallback(spark):
    """ADVICE r12: a non-numeric spark.sql.shuffle.partitions (e.g.
    'auto' on managed AQE runtimes) must not crash the
    broadcast-frontier repartition — the helper falls back to 200.
    OSS Spark rejects 'auto' at conf.set time, so the non-numeric
    runtime is modeled with a stub conf (that IS the environment the
    ADVICE describes: the value arrives pre-set, never through a
    validated setter)."""
    from nlu_data_warehouse_project_spark.operators.graph import (
        _shuffle_partitions, bfs_hops,
    )

    class _AutoConf:
        def get(self, key, default=None):
            return "auto"

    class _AutoSpark:
        conf = _AutoConf()

    assert _shuffle_partitions(_AutoSpark()) == 200
    assert _shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    # and the real path still traverses
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {r["node"]: r["hops"] for r in
           bfs_hops(e, 1, max_hops=2, broadcast_frontier=True).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


# ---------------------------------------------------------------------------
# as-of join directions (r13): forward / nearest vs a pure-Python oracle
# ---------------------------------------------------------------------------

def _py_asof(levents, revents, direction, strict):
    """Reference: levents/revents are (key, ts, id); returns
    {left id: right id or None} under asof_join's documented tie rules."""
    out = {}
    for lk, lt, lid in levents:
        back = [(rt, rid) for rk, rt, rid in revents
                if rk == lk and (rt < lt if strict else rt <= lt)]
        fwd = [(rt, rid) for rk, rt, rid in revents
               if rk == lk and (rt > lt if strict else rt >= lt)]
        b = max(back, key=lambda x: (x[0], x[1])) if back else None
        f = min(fwd, key=lambda x: (x[0], x[1])) if fwd else None
        if direction == "backward":
            pick = b
        elif direction == "forward":
            pick = f
        else:  # nearest: smaller |gap|, tie -> backward
            if b is None:
                pick = f
            elif f is None:
                pick = b
            else:
                pick = f if (f[0] - lt) < (lt - b[0]) else b
        out[lid] = pick[1] if pick else None
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    levents=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20)),
                     min_size=1, max_size=12),
    revents=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20)),
                     min_size=0, max_size=12),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    strict=st.booleans(),
)
def test_asof_directions_match_pure_python(spark, levents, revents, direction, strict):
    import datetime

    from nlu_data_warehouse_project_spark.operators.asof import asof_join

    def ts(t):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=t)

    lrows = [(k, ts(t), i) for i, (k, t) in enumerate(levents)]
    rrows = [(k, ts(t), i) for i, (k, t) in enumerate(revents)]
    ldf = spark.createDataFrame(lrows, "k long, lts timestamp, lid long")
    rdf = spark.createDataFrame(
        rrows or [(None, None, None)], "k long, rts timestamp, rid long"
    ).filter(F.col("k").isNotNull())
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts",
                           tiebreak="rid", strict=strict,
                           direction=direction).collect()
    }
    lev = [(k, t, i) for i, (k, t) in enumerate(levents)]
    rev = [(k, t, i) for i, (k, t) in enumerate(revents)]
    assert got == _py_asof(lev, rev, direction, strict)


def test_asof_forward_tolerance_and_bad_direction(spark):
    import datetime

    from nlu_data_warehouse_project_spark.operators.asof import asof_join

    base = datetime.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(1, base, 10)], "k long, lts timestamp, lid long"
    )
    rdf = spark.createDataFrame(
        [(1, base + datetime.timedelta(seconds=90), 7)],
        "k long, rts timestamp, rid long",
    )
    hit = asof_join(ldf, rdf, "k", "lts", "rts", tolerance=120,
                    direction="forward").collect()[0]
    assert hit["rid"] == 7
    miss = asof_join(ldf, rdf, "k", "lts", "rts", tolerance=60,
                     direction="forward").collect()[0]
    assert miss["rid"] is None and miss["rts"] is None
    with pytest.raises(ValueError, match="direction"):
        asof_join(ldf, rdf, "k", "lts", "rts", direction="sideways")


# ---------------------------------------------------------------------------
# Bellman-Ford fixpoint (r13): true shortest paths + negative-cycle flag
# ---------------------------------------------------------------------------

def _py_shortest(edges, start):
    """Reference Bellman-Ford to fixpoint (non-negative weights)."""
    dist = {start: 0}
    for _ in range(len({v for e in edges for v in e[:2]}) + 1):
        changed = False
        for s, d, w in edges:
            if s in dist and dist[s] + w < dist.get(d, float("inf")):
                dist[d] = dist[s] + w
                changed = True
        if not changed:
            break
    return dist


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6), st.integers(1, 9))
    .filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=18,
))
def test_bellman_ford_fixpoint_matches_pure_python(spark, edges, ):
    from nlu_data_warehouse_project_spark.operators.graph import (
        bellman_ford_fixpoint, bellman_ford_rounds,
    )

    start = edges[0][0]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    dist, audit = bellman_ford_fixpoint(df, start)
    got = {r["node"]: r["dist"] for r in dist.collect()}
    assert got == _py_shortest(edges, start)
    assert audit["converged"] is True and audit["negative_cycle"] is False
    assert audit["changed_counts"][-1] == 0
    # fixed-round twin agrees at the audited depth
    fixed = {
        r["node"]: r["dist"]
        for r in bellman_ford_rounds(df, start, rounds=audit["rounds_run"]).collect()
    }
    assert got == fixed


def test_bellman_ford_negative_cycle_flagged(spark):
    from nlu_data_warehouse_project_spark.operators.graph import bellman_ford_fixpoint

    # 1 -> 2 -> 3 -> 1 with total weight -1: distances fall forever
    e = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 1, -3)], "src long, dst long, w long"
    )
    _dist, audit = bellman_ford_fixpoint(e, 1)
    assert audit["negative_cycle"] is True and audit["converged"] is False
    # and a negative EDGE without a negative cycle still converges
    e2 = spark.createDataFrame(
        [(1, 2, 5), (1, 3, 10), (3, 2, -8)], "src long, dst long, w long"
    )
    dist, audit2 = bellman_ford_fixpoint(e2, 1)
    assert audit2["negative_cycle"] is False
    assert {r["node"]: r["dist"] for r in dist.collect()} == {1: 0, 2: 2, 3: 10}


def test_bellman_ford_small_budget_is_not_a_cycle(spark):
    """ADVICE r13: a deep positive-weight chain that merely runs out
    of a caller-supplied small budget must report budget_exhausted,
    NOT a negative cycle (the BF certificate needs >= |V| rounds)."""
    from nlu_data_warehouse_project_spark.operators.graph import bellman_ford_fixpoint

    chain = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(8)], "src long, dst long, w long"
    )
    _dist, audit = bellman_ford_fixpoint(chain, 0, max_rounds=3)
    assert audit["converged"] is False
    assert audit["budget_exhausted"] is True
    assert audit["negative_cycle"] is False  # 3 < |V| = 9: no certificate
    # the true cycle case still certifies (budget covers |V|)
    cyc = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 1, -3)], "src long, dst long, w long"
    )
    _d, a2 = bellman_ford_fixpoint(cyc, 1)
    assert a2["negative_cycle"] is True and a2["budget_exhausted"] is True


def test_ngram_containment_finds_subset_pairs(spark):
    """A verbatim first-half truncation has containment 1.0 but
    jaccard well under 1 — the pair Jaccard-thresholded dedup misses."""
    from nlu_data_warehouse_project_spark.operators.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs,
    )

    words = [f"w{i}" for i in range(40)]
    full = " ".join(words)
    half = " ".join(words[:20])
    df = spark.createDataFrame(
        [(1, full), (2, half), (3, "совершенно другой текст без общих слов")],
        "doc_id long, text string",
    )
    pairs = ngram_containment_pairs(df, threshold=0.9).collect()
    assert {(min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])) for r in pairs} == {(1, 2)}
    row = pairs[0]
    assert row["containment"] == 1.0 and row["jaccard"] < 0.6
    # the jaccard verifier at the same 0.9 bar finds nothing
    assert ngram_jaccard_pairs(df, threshold=0.9).count() == 0


# ---------------------------------------------------------------------------
# Linear sequential smoothing == the quadratic fold twins, bit-for-bit
# ---------------------------------------------------------------------------

def test_linear_ewma_matches_q197_fold_bitwise(spark, sf_smoke):
    """operators/smooth.ewma_by_key (O(n) applyInPandas) reproduces
    q197's prefix-fold EWMA bit-for-bit on the real daily series —
    the documented linear alternative is not an approximation."""
    from nlu_data_warehouse_project_spark.operators.smooth import ewma_by_key
    from nlu_data_warehouse_project_spark.queries import QUERIES
    from pyspark.sql import functions as F2

    fold = {r["day"]: r["ewma"]
            for r in QUERIES["q197_ewma_daily_orders"](spark, sf_smoke).collect()}
    daily = (
        spark.read.parquet(f"{sf_smoke}/orders.parquet")
        .groupBy(F2.col("o_orderdate").cast("date").alias("day"))
        .agg(F2.count(F2.lit(1)).cast("double").alias("n"))
        .withColumn("k", F2.lit(1))
    )
    lin = {r["day"]: r["ewma"]
           for r in ewma_by_key(daily, ["k"], "day", "n").collect()}
    assert lin == fold  # exact float equality, all days


def test_linear_holt_matches_q339_fold_bitwise(spark, sf_smoke):
    from nlu_data_warehouse_project_spark.operators.smooth import holt_by_key
    from nlu_data_warehouse_project_spark.queries import QUERIES
    from pyspark.sql import functions as F2

    fold = {r["day"]: (r["level"], r["trend"])
            for r in QUERIES["q339_holt_trend_daily_orders"](spark, sf_smoke).collect()}
    daily = (
        spark.read.parquet(f"{sf_smoke}/orders.parquet")
        .groupBy(F2.col("o_orderdate").cast("date").alias("day"))
        .agg(F2.count(F2.lit(1)).cast("double").alias("n"))
        .withColumn("k", F2.lit(1))
    )
    lin = {r["day"]: (r["level"], r["trend"])
           for r in holt_by_key(daily, ["k"], "day", "n").collect()}
    assert lin == fold


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(series=st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=25,
))
def test_ewma_by_key_per_key_recursion(spark, series):
    """Multi-key: each key's recursion runs independently over its own
    order, matching a pure-Python reference."""
    from nlu_data_warehouse_project_spark.operators.smooth import ewma_by_key

    rows = [(k, i, float(v)) for i, (k, v) in enumerate(series)]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    got = {(r["k"], r["i"]): r["ewma"]
           for r in ewma_by_key(df, ["k"], "i", "v").collect()}
    acc: dict = {}
    want = {}
    for k, i, v in rows:
        acc[k] = v if k not in acc else acc[k] * 0.5 + v * 0.5
        want[(k, i)] = acc[k]
    assert got == want


def test_smooth_validation(spark):
    from nlu_data_warehouse_project_spark.operators.smooth import (
        ewma_by_key, holt_by_key,
    )

    df = spark.createDataFrame([(1, 1, 1.0)], "k long, i long, v double")
    with pytest.raises(ValueError):
        ewma_by_key(df, ["k"], "i", "v", alpha=0.0)
    with pytest.raises(ValueError):
        holt_by_key(df, ["k"], "i", "v", beta=1.5)
