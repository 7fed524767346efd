"""Round-10 operator properties: integer-exact PageRank vs a pure-
Python power iteration on random graphs, and distributed exact
percentiles vs the closed-form type-7 definition on random samples."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
        min_size=1, max_size=30, unique=True,
    ),
    rounds=st.integers(0, 4),
)
def test_pagerank_matches_pure_python_power_iteration(spark, edges, rounds):
    """pagerank_rounds == the reference integer power iteration on
    arbitrary digraphs, including dangling nodes (mass evaporates) and
    rounds=0 (uniform init)."""
    from nlu_data_warehouse_project_spark.operators.graph import pagerank_rounds

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_units"] for r in pagerank_rounds(df, rounds=rounds).collect()}

    nodes = sorted({v for e in edges for v in e})
    UNIT, D = 10**12, 85
    n = len(nodes)
    r0 = UNIT // n
    base = ((100 - D) * r0) // 100
    deg = {v: 0 for v in nodes}
    for s, _ in edges:
        deg[s] += 1
    rank = {v: r0 for v in nodes}
    for _ in range(rounds):
        mass = {v: 0 for v in nodes}
        for s, d in edges:
            mass[d] += rank[s] // deg[s]
        rank = {v: base + (D * mass[v]) // 100 for v in nodes}
    assert got == rank


def test_pagerank_mass_conservation_without_truncation_or_dangling(spark):
    """On a regular graph (every out-degree divides the rank exactly
    after round 1? not guaranteed — use a 4-cycle where deg=1 so DIV
    loses nothing), total mass follows the closed form
    n*base + 85% of previous total exactly."""
    from nlu_data_warehouse_project_spark.operators.graph import pagerank_rounds

    cyc = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long")
    UNIT, n = 10**12, 4
    r0, base = UNIT // n, (15 * (UNIT // n)) // 100
    total = n * r0
    for rounds in (1, 2, 3):
        got = sum(
            r["rank_units"] for r in pagerank_rounds(cyc, rounds=rounds).collect()
        )
    # deg=1 everywhere: each round total' = n*base + (85*prev_total)//100
    # up to per-node flooring; recompute exactly per node instead
    ranks = [r0] * n
    for _ in range(3):
        ranks = [base + (85 * ranks[(i - 1) % n]) // 100 for i in range(n)]
    assert got == sum(ranks)


def test_pagerank_validates_inputs(spark):
    from nlu_data_warehouse_project_spark.operators.graph import pagerank_rounds

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="rounds"):
        pagerank_rounds(e, rounds=-1)
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank_rounds(e, damping_pct=101)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=60,
    ),
    ps=st.lists(st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]),
                min_size=1, max_size=4, unique=True),
)
def test_exact_percentiles_match_type7_closed_form(spark, vals, ps):
    from nlu_data_warehouse_project_spark.operators.scale import exact_global_percentiles

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["p"]: r["value"] for r in exact_global_percentiles(df, "x", ps).collect()}
    s = sorted(vals)
    n = len(s)
    for p in ps:
        h = (n - 1) * p
        lo = int(math.floor(h))
        want = s[lo] + (h - math.floor(h)) * (s[min(lo + 1, n - 1)] - s[lo])
        assert got[p] == want, (p, got[p], want)


def test_exact_percentiles_nulls_and_validation(spark):
    from nlu_data_warehouse_project_spark.operators.scale import exact_global_percentiles

    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "x double")
    got = {r["p"]: r["value"] for r in exact_global_percentiles(df, "x", [0.5]).collect()}
    assert got[0.5] == 2.0  # NULL excluded, median of {1, 3}

    with pytest.raises(ValueError, match="outside"):
        exact_global_percentiles(df, "x", [1.5])
    empty = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError, match="empty"):
        exact_global_percentiles(empty, "x", [0.5])


def test_compression_ratio_orders_texts_sensibly(spark):
    """zlib ratio: repetitive << prose << random-ish; empty/NULL safe;
    deterministic across calls; values equal a driver-side zlib run."""
    import zlib

    from nlu_data_warehouse_project_spark.operators.profile import compression_ratio

    rep = "spam " * 400
    prose = (
        "The quick brown fox jumps over the lazy dog while the curious cat "
        "watches from the fence, wondering why foxes bother with dogs at all. "
    ) * 10
    # Genuinely incompressible text: hex of a chained SHA-256 stream.
    # (A chr(33 + i*k % 90) generator is PERIODIC with period 90 and
    # zlib-compresses BETTER than prose — the round-10 version of this
    # fixture made the ordering premise false.)
    import hashlib

    chunks, h = [], b"seed"
    while sum(len(c) for c in chunks) < 2000:
        h = hashlib.sha256(h).digest()
        chunks.append(h.hex())
    randomish = "".join(chunks)[:2000]
    df = spark.createDataFrame(
        [(1, rep), (2, prose), (3, randomish), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"] < got[3]["compression_ratio"]
    for i, txt in ((1, rep), (2, prose), (3, randomish)):
        b = txt.encode()
        assert got[i]["n_bytes"] == len(b)
        assert got[i]["n_compressed"] == len(zlib.compress(b, 6))
        assert got[i]["compression_ratio"] == round(len(zlib.compress(b, 6)) / len(b), 6)
    assert got[4]["compression_ratio"] is None and got[4]["n_bytes"] == 0
    assert got[5]["n_bytes"] is None and got[5]["compression_ratio"] is None

    again = {r["doc_id"]: r["compression_ratio"] for r in compression_ratio(df).collect()}
    assert again == {k: v["compression_ratio"] for k, v in got.items()}


def test_q223_compression_screen_matches_python_recompute(spark):
    """The catalog entry (banded corpus screen) equals an independent
    driver-side zlib recompute at sf0.001 — the same gate
    tools/check_oracle.py's PYTHON_GATES applies at sf0.01."""
    import decimal
    import zlib

    import pyarrow.parquet as pq

    from nlu_data_warehouse_project_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["verdict"]: (r["n_docs"], r["total_bytes"], r["total_compressed"], r["band_ratio"])
        for r in QUERIES["q223_compression_screen"](spark, sf_dir).collect()
    }

    def r6(x):
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    agg: dict = {}
    for t in tbl.column("text").to_pylist():
        b = t.encode("utf-8") if t is not None else b""
        if not b:
            band, nb, nc = "empty", 0, 0
        else:
            nb, nc = len(b), len(zlib.compress(b, 6))
            r = r6(nc / nb)
            band = "low_entropy" if r < 0.45 else "prose_band" if r < 0.6 else "high_entropy"
        a = agg.setdefault(band, [0, 0, 0])
        a[0] += 1
        a[1] += nb
        a[2] += nc
    want = {
        k: (v[0], v[1], v[2], r6(v[2] / v[1]) if v[1] else None) for k, v in agg.items()
    }
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
        min_size=1, max_size=20, unique=True,
    ),
    rounds=st.integers(0, 3),
    seed_picks=st.sets(st.integers(0, 7), min_size=1, max_size=3),
)
def test_personalized_pagerank_matches_pure_python(spark, edges, rounds, seed_picks):
    """pagerank_rounds(seeds=...) == the reference PERSONALIZED power
    iteration: unit mass split over the seeds, teleport term lands only
    on seeds, exact integer arithmetic."""
    from nlu_data_warehouse_project_spark.operators.graph import pagerank_rounds

    nodes = sorted({v for e in edges for v in e})
    seeds = sorted(s for s in seed_picks if s in nodes)
    if not seeds:
        seeds = [nodes[0]]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank_rounds(df, rounds=rounds, seeds=seeds).collect()
    }

    UNIT, D = 10**12, 85
    r0 = UNIT // len(seeds)
    base = ((100 - D) * r0) // 100
    deg = {v: 0 for v in nodes}
    for s, _ in edges:
        deg[s] += 1
    rank = {v: (r0 if v in seeds else 0) for v in nodes}
    for _ in range(rounds):
        mass = {v: 0 for v in nodes}
        for s, d in edges:
            mass[d] += rank[s] // deg[s]
        rank = {
            v: (base if v in seeds else 0) + (D * mass[v]) // 100 for v in nodes
        }
    assert got == rank


def test_personalized_pagerank_validates_seeds(spark):
    from nlu_data_warehouse_project_spark.operators.graph import pagerank_rounds

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="non-empty"):
        pagerank_rounds(e, seeds=[])
    with pytest.raises(ValueError, match="node space"):
        pagerank_rounds(e, seeds=[99])


def test_personalized_pagerank_accepts_seed_dataframe(spark, monkeypatch):
    """VERDICT r11 #3: a formula-derived seed set grows with the graph,
    so ``pagerank_rounds`` accepts it as a single-column DataFrame —
    bit-identical to the list form, fully lazy (no collect round-trip
    through the driver), and the seed-membership join BROADCASTS
    (asserted on the seed-flagged node frame captured just before its
    pin)."""
    from nlu_data_warehouse_project_spark.operators import graph
    from nlu_data_warehouse_project_spark.plans import formatted_plan

    pairs = [(i, (i * 3 + 1) % 11) for i in range(11) if i != (i * 3 + 1) % 11]
    df = spark.createDataFrame(pairs, "src long, dst long")
    want = {
        r["node"]: r["rank_units"]
        for r in graph.pagerank_rounds(df, rounds=2, seeds=[0, 3, 6]).collect()
    }

    captured = []
    real_pin = graph.pin_frame

    def capturing_pin(d, **kw):
        captured.append(d)
        return real_pin(d, **kw)

    monkeypatch.setattr(graph, "pin_frame", capturing_pin)
    seed_df = spark.createDataFrame([(0,), (3,), (6,), (3,)], "node long")
    got = {
        r["node"]: r["rank_units"]
        for r in graph.pagerank_rounds(df, rounds=2, seeds=seed_df).collect()
    }
    assert got == want
    # captures: edges, degree-folded edges, nodes, seed-flagged nodes,
    # one rank frame per round EXCEPT the last — the final fixed
    # round's vector is consumed exactly once by the caller's action,
    # so pinning it was a pure extra job (r17)
    assert len(captured) == 5
    assert "BroadcastHashJoin" in formatted_plan(captured[3])

    with pytest.raises(ValueError, match="exactly one column"):
        graph.pagerank_rounds(
            df, seeds=spark.createDataFrame([(1, 2)], "a long, b long")
        )
    # an all-miss seed frame hits the same node-space validation
    with pytest.raises(ValueError, match="node space"):
        graph.pagerank_rounds(df, seeds=spark.createDataFrame([(99,)], "node long"))


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
        min_size=1, max_size=25, unique=True,
    ),
    k=st.integers(1, 3),
    rounds=st.integers(0, 3),
)
def test_kcore_peel_matches_pure_python(spark, edges, k, rounds):
    """kcore_peel_rounds == the reference peel loop on arbitrary
    digraphs: per round, nodes with out-degree < k drop with all their
    incident edges (both endpoints)."""
    from nlu_data_warehouse_project_spark.operators.graph import kcore_peel_rounds

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["degree"]
        for r in kcore_peel_rounds(df, k, rounds=rounds).collect()
    }

    e = set(edges)
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for s, _d in e:
            deg[s] = deg.get(s, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        e = {(s, d) for (s, d) in e if s in keep and d in keep}
    want: dict[int, int] = {}
    for s, _d in e:
        want[s] = want.get(s, 0) + 1
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7), st.integers(-3, 9)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1, max_size=25, unique_by=lambda e: (e[0], e[1]),
    ),
    rounds=st.integers(0, 4),
)
def test_bellman_ford_matches_pure_python(spark, edges, rounds):
    """bellman_ford_rounds == the reference relaxation loop, including
    NEGATIVE weights and cycles (harmless at a fixed round budget) and
    an unreachable remainder (absent from the output)."""
    from nlu_data_warehouse_project_spark.operators.graph import bellman_ford_rounds

    start = edges[0][0]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["node"]: r["dist"]
        for r in bellman_ford_rounds(df, start, rounds=rounds).collect()
    }

    dist = {start: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        dist = nxt
    assert got == dist


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    member=st.lists(
        st.tuples(st.integers(0, 6), st.integers(100, 104)),
        min_size=1, max_size=20, unique=True,
    ),
    hops=st.integers(0, 3),
)
def test_bipartite_bfs_matches_pure_python(spark, member, hops):
    """bfs_hops_bipartite == BFS over the materialized co-member graph
    on arbitrary membership frames (the quadratic-free equivalence,
    property-tested)."""
    from nlu_data_warehouse_project_spark.operators.graph import bfs_hops_bipartite

    start = member[0][0]
    df = spark.createDataFrame(member, "m long, g long")
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops_bipartite(df, start, "m", "g", max_hops=hops).collect()
    }

    adj: dict[int, set[int]] = {}
    by_g: dict[int, set[int]] = {}
    for m, g in member:
        by_g.setdefault(g, set()).add(m)
    for g, ms in by_g.items():
        for a in ms:
            adj.setdefault(a, set()).update(ms - {a})
    want = {start: 0}
    frontier = {start}
    for h in range(1, hops + 1):
        nxt = set()
        for n in frontier:
            nxt |= adj.get(n, set())
        nxt -= set(want)
        for n in nxt:
            want[n] = h
        frontier = nxt
        if not frontier:
            break
    assert got == want
