"""Round-14 wave-3 operator properties: phrase-search vs brute force,
group tf·idf filtering, KMV uniform shape, basket marginals, BPE
application invariants."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _brute_phrase_count(text: str, phrase: list[str]) -> int:
    toks = [t for t in text.strip().lower().split() if t]
    n = len(phrase)
    return sum(
        1 for i in range(len(toks) - n + 1) if toks[i:i + n] == phrase
    )


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12).map(" ".join),
        min_size=1, max_size=6,
    ),
    phrase=st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=3),
)
def test_phrase_hits_matches_bruteforce(spark, phrase, docs):
    """The positional semi-join chain counts EXACTLY the brute-force
    sliding-window occurrences — including overlapping ones — over a
    3-token alphabet where repeats and overlaps are the norm."""
    from nlu_data_warehouse_project_spark.operators.search import phrase_hits

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {r["doc_id"]: r["n_hits"] for r in phrase_hits(df, phrase).collect()}
    want = {
        i: c for i, d in enumerate(docs)
        if (c := _brute_phrase_count(d, phrase)) > 0
    }
    assert got == want


def test_phrase_hits_counts_overlaps(spark):
    from nlu_data_warehouse_project_spark.operators.search import phrase_hits

    df = spark.createDataFrame([(1, "a a a a")], "doc_id long, text string")
    assert phrase_hits(df, ["a", "a"]).first()["n_hits"] == 3


def test_distinctive_terms_hapax_filter_and_determinism(spark):
    from nlu_data_warehouse_project_spark.operators.tfidf import (
        distinctive_terms_by_group,
    )

    docs = spark.createDataFrame(
        [
            ("s1", "alpha alpha beta hapax1"),
            ("s1", "alpha gamma"),
            ("s2", "beta beta delta delta hapax2"),
        ],
        "source string, text string",
    )
    rows = distinctive_terms_by_group(docs, "source", k=5, min_group_tf=2).collect()
    terms = {(r["source"], r["term"]) for r in rows}
    # hapax terms (group tf == 1) never appear
    assert not any(t.startswith("hapax") for _, t in terms)
    assert ("s1", "alpha") in terms and ("s2", "beta") in terms
    a = sorted(map(tuple, rows))
    b = sorted(
        map(tuple, distinctive_terms_by_group(
            docs.repartition(7), "source", k=5, min_group_tf=2).collect())
    )
    assert a == b


def test_kmv_uniform_range_and_distinctness(spark):
    from pyspark.sql import functions as F

    from nlu_data_warehouse_project_spark.operators.sketches import kmv_uniform

    df = spark.createDataFrame([(i,) for i in range(2000)], "v long")
    u = df.select(kmv_uniform("v").alias("u"))
    stats = u.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"),
        F.countDistinct("u").alias("d"), F.avg("u").alias("mean"),
    ).first()
    assert 0.0 <= stats["lo"] and stats["hi"] < 1.0
    assert stats["d"] == 2000  # 60-bit space: no collisions at this n
    assert 0.45 < stats["mean"] < 0.55  # uniform, not clumped


def test_association_rules_include_counts_marginals(spark):
    from nlu_data_warehouse_project_spark.operators.basket import association_rules

    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (2, "z"), (3, "x"), (4, "z")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r["item_a"], r["item_b"]): r for r in
           association_rules(df, "b", "i", 0.0, include_counts=True).collect()}
    xy = out[("x", "y")]
    assert (xy["n_a"], xy["n_b"], xy["n_baskets"]) == (3, 2, 4)
    # marginal identities: conf recomputable from the counts
    assert xy["conf_a_to_b"] == xy["n_ab"] / xy["n_a"]
    assert xy["conf_b_to_a"] == xy["n_ab"] / xy["n_b"]


def test_bpe_segment_stats_invariants(spark):
    """Applying merges never increases token count, never changes the
    character mass, and compression == n_chars / n_bpe_tokens."""
    from nlu_data_warehouse_project_spark.operators.bpe import bpe_segment_stats

    docs = spark.createDataFrame(
        [("s1", "aa aa ab"), ("s2", "aaaa bb aa"), ("s2", "ab ab")],
        "source string, text string",
    )
    rows = bpe_segment_stats(docs, "source", num_merges=3, min_pair_count=1).collect()
    assert {r["source"] for r in rows} == {"s1", "s2"}
    for r in rows:
        assert r["n_bpe_tokens"] <= r["n_chars"]
        assert r["n_bpe_tokens"] >= r["n_words"]
        assert r["compression"] == r["n_chars"] / r["n_bpe_tokens"]
