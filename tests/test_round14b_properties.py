"""Round-14 wave-2 operator properties: tf·idf ranking invariants,
SymSpell edit-1 blocking vs a brute-force reference, KMV sketch
merge losslessness / salt invariance, association-rule identities."""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# tf·idf
# ---------------------------------------------------------------------------

def test_tfidf_ranking_and_score_shape(spark):
    from nlu_data_warehouse_project_spark.operators.tfidf import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple banana common"),
            (2, "banana banana cherry common"),
            (3, "cherry date common common"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2, 3}
    for doc_rows in by_doc.values():
        assert [r["rank"] for r in sorted(doc_rows, key=lambda r: r["rank"])] == [1, 2]
        # rank order is score-descending
        srt = sorted(doc_rows, key=lambda r: r["rank"])
        assert srt[0]["score"] >= srt[1]["score"]
        for r in doc_rows:
            # rational idf: score == tf * (N+1)/(df+1) exactly
            assert r["score"] == r["tf"] * ((3 + 1) / (r["df"] + 1))
    # doc 1's top term is its dominant distinctive token
    assert sorted(by_doc[1], key=lambda r: r["rank"])[0]["term"] == "apple"
    # 'common' (df=3) never outranks a distinctive term with equal tf:
    # doc 3 has common tf=2 vs cherry/date tf=1 — tf dominance can win,
    # but between equal tf the lower-df term must rank higher
    d2 = {r["term"]: r for r in by_doc[2]}
    if "common" in d2 and "cherry" in d2:
        assert d2["cherry"]["score"] > d2["common"]["score"]


def test_tfidf_deterministic_under_repartition(spark):
    from nlu_data_warehouse_project_spark.operators.tfidf import tfidf_top_terms

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} shared word{i}") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, tfidf_top_terms(docs, k=3).collect()))
    b = sorted(map(tuple, tfidf_top_terms(docs.repartition(13), k=3).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# edit-distance-1 blocking
# ---------------------------------------------------------------------------

def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5), min_size=2, max_size=12
    ),
)
def test_edit1_pairs_matches_bruteforce(spark, words):
    """The deletion-neighborhood join finds EXACTLY the brute-force
    distance-1 pairs: substitutions, inserts, deletes — over a tiny
    alphabet so collisions and duplicate variants actually occur."""
    from nlu_data_warehouse_project_spark.operators.fuzzy import edit1_pairs

    df = spark.createDataFrame(list(enumerate(words)), "id long, w string")
    got = {
        (r["a_id"], r["b_id"]) for r in edit1_pairs(df, "w", "id").collect()
    }
    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(words), 2)
        if _lev(a, b) == 1
    }
    assert got == want


def test_edit1_pairs_drops_empty_and_reports_distance(spark):
    from nlu_data_warehouse_project_spark.operators.fuzzy import edit1_pairs

    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "ab"), (4, "b"), (5, None)], "id long, w string"
    )
    rows = edit1_pairs(df, "w", "id").collect()
    ids = {i for r in rows for i in (r["a_id"], r["b_id"])}
    assert 1 not in ids and 5 not in ids  # empty + NULL keys dropped
    assert {(r["a_id"], r["b_id"]) for r in rows} == {(2, 3), (2, 4), (3, 4)}
    assert all(r["distance"] == 1 for r in rows)


# ---------------------------------------------------------------------------
# KMV sketch
# ---------------------------------------------------------------------------

def test_kmv_merge_is_lossless_and_salt_invariant(spark):
    """Merging per-group sketches equals sketching the union directly,
    and the salt fan-out is a pure memory dial (same answer for any
    salt_parts)."""
    from nlu_data_warehouse_project_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    rows = [(f"g{v % 3}", v % 211) for v in range(2000)]
    df = spark.createDataFrame(rows, "g string, v long")

    direct = kmv_sketch(df, "v", None, k=16).select("n_kept", "kmv_estimate").first()
    per_group = kmv_sketch(df, "v", ["g"], k=16)
    merged = kmv_merge(per_group, None, k=16).select("n_kept", "kmv_estimate").first()
    assert tuple(direct) == tuple(merged)

    other_salt = (
        kmv_sketch(df, "v", None, k=16, salt_parts=5)
        .select("n_kept", "kmv_estimate")
        .first()
    )
    assert tuple(direct) == tuple(other_salt)


def test_kmv_below_saturation_is_exact(spark):
    from nlu_data_warehouse_project_spark.operators.sketches import kmv_sketch

    df = spark.createDataFrame([(v % 9,) for v in range(500)], "v long")
    row = kmv_sketch(df, "v", None, k=64).first()
    assert row["n_kept"] == 9
    assert row["kmv_estimate"] == 9.0


def test_kmv_estimate_within_theory_bounds(spark):
    """k=64 → ~1/sqrt(62) ≈ 12.7% relative standard error; assert a
    generous 4-sigma band so the test pins the estimator, not luck."""
    from nlu_data_warehouse_project_spark.operators.sketches import kmv_sketch

    true_d = 5000
    df = spark.createDataFrame([(v % true_d,) for v in range(12000)], "v long")
    est = kmv_sketch(df, "v", None, k=64).first()["kmv_estimate"]
    assert abs(est - true_d) / true_d < 0.5


# ---------------------------------------------------------------------------
# association rules
# ---------------------------------------------------------------------------

def test_association_rules_identities(spark):
    from nlu_data_warehouse_project_spark.operators.basket import association_rules

    # 4 baskets; x+y co-occur twice, y+z once; duplicate item rows in a
    # basket must not inflate counts (set semantics)
    rows = [
        (1, "x"), (1, "x"), (1, "y"),
        (2, "x"), (2, "y"), (2, "z"),
        (3, "y"), (3, "z"),
        (4, "x"),
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r["item_a"], r["item_b"]): r for r in
           association_rules(df, "b", "i", 0.0).collect()}
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    xy = out[("x", "y")]
    assert xy["n_ab"] == 2
    assert xy["support"] == 2 / 4
    assert xy["conf_a_to_b"] == 2 / 3  # P(y | x): x in 3 baskets
    assert xy["conf_b_to_a"] == 2 / 3  # P(x | y): y in 3 baskets
    assert xy["lift"] == (2 * 4) / (3 * 3)
    # lift identity holds for every pair: lift = conf_a_to_b / P(b),
    # recovering n_b from conf_b_to_a = n_ab / n_b
    for r in out.values():
        p_b = (r["n_ab"] / r["conf_b_to_a"]) / 4
        assert r["lift"] == pytest.approx(r["conf_a_to_b"] / p_b)


def test_association_rules_threshold_filters(spark):
    from nlu_data_warehouse_project_spark.operators.basket import association_rules

    rows = [(b, i) for b in range(10) for i in ("a", "b")] + [(0, "rare"), (1, "rare")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = association_rules(df, "b", "i", min_pair_share=0.5).collect()
    assert {(r["item_a"], r["item_b"]) for r in out} == {("a", "b")}


# ---------------------------------------------------------------------------
# BPE merge induction
# ---------------------------------------------------------------------------

def _ref_bpe(texts, num_merges, min_pair_count=2):
    """Pure-Python word-level BPE reference (same as the q358 gate)."""
    import re
    from collections import Counter

    words: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", (t or "").strip().lower()):
            if w:
                words[w] += 1
    seqs = {w: list(w) for w in words}
    out = []
    for rnd in range(num_merges):
        pc: Counter = Counter()
        for w, f in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_pair_count:
            break
        out.append((rnd, left, right, cnt))
        merged = left + right
        for w, s in seqs.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            seqs[w] = ns
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.lists(st.text(alphabet="abxy", min_size=1, max_size=6),
                 min_size=1, max_size=8).map(" ".join),
        min_size=1, max_size=6,
    ),
)
def test_bpe_matches_reference(spark, texts):
    """Spark BPE == the pure-Python reference on tiny-alphabet corpora
    where same-symbol runs (the overlap-merge edge) are common."""
    from nlu_data_warehouse_project_spark.operators.bpe import learn_bpe_merges

    df = spark.createDataFrame(list(enumerate(texts)), "id long, text string")
    got = [
        (r["merge_round"], r["left"], r["right"], r["pair_count"])
        for r in learn_bpe_merges(df, num_merges=4, min_pair_count=1).collect()
    ]
    assert got == _ref_bpe(texts, 4, 1)


def test_bpe_overlap_merges_left_to_right(spark):
    """'aaa' with merge (a,a) must become [aa, a] — non-overlapping
    left-to-right, and round 2 can then merge (aa, a)."""
    from nlu_data_warehouse_project_spark.operators.bpe import learn_bpe_merges

    df = spark.createDataFrame([(1, "aaa aa a")], "id long, text string")
    got = [
        (r["merge_round"], r["left"], r["right"], r["pair_count"])
        for r in learn_bpe_merges(df, num_merges=3, min_pair_count=1).collect()
    ]
    assert got == [(0, "a", "a", 3), (1, "aa", "a", 1)]


def test_bpe_min_pair_count_stops_early(spark):
    from nlu_data_warehouse_project_spark.operators.bpe import learn_bpe_merges

    df = spark.createDataFrame([(1, "ab cd")], "id long, text string")
    assert learn_bpe_merges(df, num_merges=5, min_pair_count=2).count() == 0
