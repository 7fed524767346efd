"""Round-17 equivalence properties:

- incremental winnowing (new-docs-vs-standing-corpus) == full-batch
  winnow_overlap_pairs restricted to pairs touching the new batch
  (VERDICT r16 #3), with and without the max_df boilerplate cap
- winnow_containment coverage/verdicts == an independent recompute
  from the fingerprint frame (VERDICT r16 #7)
- the persistent WinnowFingerprintIndex sidecar syncs O(delta) on
  appends, rebuilds on restore, and probes equal to the batch twin
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# a small pool of multi-char passages: docs built by concatenating
# sampled passages share contiguous substrings (what winnowing
# detects), and the pool is small enough that boilerplate passages
# recur corpus-wide (what max_df strikes)
PASSAGES = ["abcdefgh", "qrstuvwx", "mnopqrst", "12345678", "zzzzyyyy"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(PASSAGES), min_size=1, max_size=4),
    min_size=2, max_size=10,
)


def _docs(spark, texts):
    rows = [(i, "".join(parts)) for i, parts in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs_set(df):
    return {(r["a_id"], r["b_id"], r["n_shared"]) for r in df.collect()}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=docs_strategy, max_df=st.sampled_from([None, 3]))
def test_winnow_incremental_equals_batch_restricted(spark, texts, max_df):
    from pyspark.sql import functions as F

    from nlu_data_warehouse_project_spark.operators.winnow import (
        winnow_fingerprints, winnow_overlap_incremental, winnow_overlap_pairs,
    )

    docs = _docs(spark, texts)
    new_ids = {i for i in range(len(texts)) if i % 3 == 0}
    standing = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)

    want = {
        t for t in _pairs_set(
            winnow_overlap_pairs(
                docs, "text", "doc_id", k=3, w=3, min_shared=1, max_df=max_df
            )
        )
        if t[0] in new_ids or t[1] in new_ids
    }
    standing_fp = (
        winnow_fingerprints(standing, "text", "doc_id", k=3, w=3)
        .select("id", "fingerprint", "gram")
        .distinct()
    )
    got = _pairs_set(
        winnow_overlap_incremental(
            standing_fp, batch, "text", "doc_id",
            k=3, w=3, min_shared=1, max_df=max_df,
        )
    )
    assert got == want


def test_winnow_containment_matches_recompute(spark):
    """Coverage fractions and verdicts against an independent
    recompute from the fingerprint frame: A is a passage contained
    verbatim in B (high coverage on A's side), C shares only one
    passage with B (low coverage both sides), D is unrelated."""
    from nlu_data_warehouse_project_spark.operators.winnow import (
        winnow_containment, winnow_fingerprints,
    )

    a = "abcdefgh" * 4                               # wholly contained in b
    b = "abcdefgh" * 4 + "qrstuvwx" + "JKLMNOPQRS" * 8   # container + own bulk
    c = "qrstuvwx" + "0987654321" * 8                # small shared passage w/ b
    d = "zyxwvuts" * 6                               # unrelated
    e = "qrstuvwx" + "0987654321" + "zqxwvu" * 4     # mid-coverage vs c
    docs = spark.createDataFrame(
        [(0, a), (1, b), (2, c), (3, d), (4, e)], "doc_id long, text string"
    )
    k, w = 4, 3

    fp = {
        (r["id"], r["fingerprint"], r["gram"])
        for r in winnow_fingerprints(docs, "text", "doc_id", k=k, w=w).collect()
    }
    nf = {}
    for (i, f, g) in fp:
        nf.setdefault(i, set()).add((f, g))
    want = {}
    ids = sorted(nf)
    for x in ids:
        for y in ids:
            if x < y:
                shared = len(nf[x] & nf[y])
                if shared >= 1:
                    cov_a = (Decimal(shared) / Decimal(len(nf[x]))).quantize(
                        Decimal("0.000001")
                    )
                    cov_b = (Decimal(shared) / Decimal(len(nf[y]))).quantize(
                        Decimal("0.000001")
                    )
                    top = max(cov_a, cov_b)
                    verdict = (
                        "wholesale" if top >= Decimal("0.8")
                        else "partial" if top >= Decimal("0.2")
                        else "incidental"
                    )
                    want[(x, y)] = (
                        shared, len(nf[x]), len(nf[y]), cov_a, cov_b, verdict
                    )

    got = {
        (r["a_id"], r["b_id"]): (
            r["n_shared"], r["nf_a"], r["nf_b"],
            r["coverage_a"], r["coverage_b"], r["verdict"],
        )
        for r in winnow_containment(
            docs, "text", "doc_id", k=k, w=w, min_shared=1
        ).collect()
    }
    assert got == want
    # the construction exercised all three verdict classes
    verdicts = {v[5] for v in got.values()}
    assert verdicts == {"wholesale", "partial", "incidental"}, verdicts


def test_quality_model_matches_python_recompute(spark):
    """NB linear model (train + score) against a pure-Python Decimal
    recompute of the same math: md5 buckets, Laplace-smoothed
    log-odds weights rounded HALF_UP to 6 decimals, exact decimal
    per-doc sums plus the doc prior."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP

    from nlu_data_warehouse_project_spark.operators.qualitymodel import (
        nb_doc_prior, nb_linear_weights, quality_model_score,
    )

    rows = [
        (0, "alpha beta gamma alpha", True),
        (1, "alpha beta delta", True),
        (2, "noise junk spam junk", False),
        (3, "spam noise beta", False),
        (4, "alpha gamma gamma", True),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, pos boolean")
    B, alpha = 64, 1.0

    def bucket(tok):
        return int(hashlib.md5(f"qc:{tok}".encode()).hexdigest()[:10], 16) % B

    def r6(x):
        return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)

    c1, c0 = {}, {}
    for _i, text, pos in rows:
        for tok in text.split(" "):
            if tok:
                (c1 if pos else c0)[bucket(tok)] = (c1 if pos else c0).get(bucket(tok), 0) + 1
    n1, n0 = sum(c1.values()), sum(c0.values())
    w = {
        b: r6(math.log((c1.get(b, 0) + alpha) / (n1 + alpha * B))
              - math.log((c0.get(b, 0) + alpha) / (n0 + alpha * B)))
        for b in range(B)
    }
    bias = r6(math.log(3) - math.log(2))
    want = {}
    for i, text, _pos in rows:
        toks = [t for t in text.split(" ") if t]
        lo = (bias + sum(w[bucket(t)] for t in toks)).quantize(Decimal("0.000001"))
        want[i] = (
            len(toks), lo,
            (lo / Decimal(len(toks))).quantize(Decimal("0.000001"), ROUND_HALF_UP),
            lo > 0,
        )

    weights = nb_linear_weights(docs, "text", "pos", buckets=B, alpha=alpha)
    got_w = {r["bucket"]: r["weight"] for r in weights.collect()}
    assert got_w == w
    prior = nb_doc_prior(docs, "text", "pos")
    got = {
        r["id"]: (r["n_tokens"], r["log_odds"], r["log_odds_per_token"],
                  r["predicted_pos"])
        for r in quality_model_score(
            docs, weights, "text", "doc_id", buckets=B, prior=prior
        ).collect()
    }
    assert got == want
    # the easy corpus separates: positive-vocab docs classify positive
    assert [got[i][3] for i in range(5)] == [True, True, False, False, True]


def test_curate_quality_model_gate(spark):
    """curate_corpus drops docs scoring under the learned per-token
    log-odds floor, keeps the rest, and composes with the rule gates."""
    from nlu_data_warehouse_project_spark.operators.qualitymodel import (
        nb_linear_weights,
    )
    from nlu_data_warehouse_project_spark.pipeline.curate import curate_corpus

    good = "clean well formed prose about data engineering and spark plans"
    bad = "buy cheap buy cheap buy cheap click here click here click here"
    seed = spark.createDataFrame(
        [(100, good, True), (101, bad, False)],
        "doc_id long, text string, pos boolean",
    )
    model = nb_linear_weights(seed, "text", "pos", buckets=128)
    docs = spark.createDataFrame(
        [
            (1, "clean prose about spark data plans and engineering work"),
            (2, "click here buy cheap click here buy cheap right now friend"),
        ],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in curate_corpus(
            docs, min_tokens=5, max_bucket_size=None,
            quality_model=model, quality_model_buckets=128,
            quality_min_log_odds_per_token=0.0,
        ).collect()
    }
    assert kept == {1}
    # without the model gate both survive the rule gates
    both = {
        r["doc_id"]
        for r in curate_corpus(docs, min_tokens=5, max_bucket_size=None).collect()
    }
    assert both == {1, 2}


def test_bm25_matches_python_recompute(spark):
    """BM25 (Lucene idf variant) against a pure-Python Decimal
    recompute: idf, tf saturation, length normalization, and the
    round-each-contribution-then-sum discipline."""
    import math
    from decimal import ROUND_HALF_UP

    from nlu_data_warehouse_project_spark.operators.search import bm25_scores

    rows = [
        (0, "spark spark merge window row"),
        (1, "spark table"),
        (2, "merge merge merge"),
        (3, "nothing relevant here at all"),
        (4, "window spark window"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["spark", "merge", "window"]
    k1, b = 1.2, 0.75

    toks = {i: t.split() for i, t in rows}
    dls = {i: len(t) for i, t in toks.items()}
    n = len(dls)
    avgdl = sum(dls.values()) / n
    dfs = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}

    def r6(x):
        return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)

    want = {}
    for i, tk in toks.items():
        contribs = []
        for t in terms:
            tf = tk.count(t)
            if tf:
                idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
                c = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
                contribs.append(r6(c))
        if contribs:
            want[i] = (len(contribs), sum(contribs).quantize(Decimal("0.000001")))

    got = {
        r["doc_id"]: (r["n_terms_matched"], r["score"])
        for r in bm25_scores(docs, terms).collect()
    }
    assert got == want
    assert 3 not in got  # no-match docs are absent
    # repeated terms saturate: doc 2's triple 'merge' scores less than
    # 3x a single occurrence would
    single = want[0][1]  # doc 0 has tf=1 for merge among others
    assert got[2][1] > 0 and single > 0


def test_winnow_index_sync_and_overlap(spark, tmp_path):
    """Persistent winnowing sidecar: probe against the saved
    fingerprint table equals the full-batch computation restricted to
    pairs touching the batch; sync is O(delta) on appends, rebuilds on
    restore, and is idempotent."""
    from pyspark.sql import functions as F

    from nlu_data_warehouse_project_spark.operators.winnow import (
        winnow_overlap_pairs,
    )
    from nlu_data_warehouse_project_spark.operators.winnowindex import (
        WinnowFingerprintIndex,
    )
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    base = "the quick brown fox jumps over the lazy dog by the river"
    alt = "petabyte pipelines need deterministic sampling and dedup"
    docs = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731

    corpus = TxTable(spark, str(tmp_path / "corpus"))
    corpus.commit_append(docs([(1, base)]), "d1")
    idx = WinnowFingerprintIndex(corpus, k=5, w=4)
    assert idx.sync() == 1
    rows_v1 = idx.index.read().count()
    assert rows_v1 > 0

    # O(delta): appending one doc appends only that doc's fingerprints
    corpus.commit_append(docs([(2, alt)]), "d2")
    assert idx.sync() == 2
    v2_ids = {r["doc_id"] for r in idx.index.read().select("doc_id").distinct().collect()}
    assert v2_ids == {1, 2}
    assert idx.index.read().filter(F.col("doc_id") == 1).count() == rows_v1
    assert idx.sync() == 2  # idempotent: no new index version
    assert idx.index.latest_version() == 2

    # batch: 10 shares a passage with corpus doc 1; 11 and 12 share a
    # passage with each other; 13 is novel
    batch = docs([
        (10, "yesterday the quick brown fox jumps over the fence again"),
        (11, "shared incremental winnow passage one two three"),
        (12, "shared incremental winnow passage four five six"),
        (13, "nothing in common with anything settled anywhere"),
    ])
    got = _pairs_set(idx.overlap(batch, min_shared=1))
    union = corpus.read().unionByName(batch)
    want = {
        t for t in _pairs_set(
            winnow_overlap_pairs(union, "text", "doc_id", k=5, w=4, min_shared=1)
        )
        if t[0] >= 10 or t[1] >= 10
    }
    assert got == want
    got_ids = {i for t in got for i in t[:2]}
    assert 10 in got_ids and 11 in got_ids and 12 in got_ids
    assert 13 not in got_ids

    # restore shrinks the corpus -> sync must rebuild; doc 2's
    # fingerprints must be gone and doc-1 overlap still works
    corpus.restore(1)
    assert idx.sync() == 3
    assert idx.index.manifest()["synced_corpus_version"] == 3
    assert idx.index.read().count() == rows_v1
    got2 = _pairs_set(idx.overlap(docs([(20, alt)]), min_shared=1))
    assert got2 == set()  # alt's twin (doc 2) was rolled back


# --- exact substring dedup (Lee et al. 2022) ----------------------------

@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_dup_substring_spans_match_bruteforce(spark, doc_passages):
    """Spans == a brute-force Python recompute: positions whose
    length-L gram occurs >= 2 times corpus-wide, merged into maximal
    islands; and strip_dup_substrings removes exactly those chars."""
    from nlu_data_warehouse_project_spark.operators.dedup import (
        dup_substring_spans,
        strip_dup_substrings,
    )

    L = 8
    texts = ["".join(ps) for ps in doc_passages]
    from collections import Counter

    counts = Counter(
        t[p:p + L] for t in texts for p in range(len(t) - L + 1)
    )
    want_spans = {}
    want_clean = {}
    for i, t in enumerate(texts):
        marked = [
            p for p in range(len(t) - L + 1) if counts[t[p:p + L]] > 1
        ]
        spans = []
        for p in marked:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + L)
            else:
                spans.append([p, p + L])
        want_spans[i] = [(s + 1, e - s) for s, e in spans]  # 1-based
        keep = [
            ch for j, ch in enumerate(t)
            if not any(s <= j < e for s, e in spans)
        ]
        want_clean[i] = "".join(keep)

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {}
    for r in dup_substring_spans(df, min_len=L).collect():
        got.setdefault(r["doc_id"], []).append((r["span_start"], r["span_len"]))
    for k in got:
        got[k].sort()
    assert got == {k: v for k, v in want_spans.items() if v}

    cleaned = {
        r["doc_id"]: (r["clean_text"], r["chars_removed"])
        for r in strip_dup_substrings(df, min_len=L).collect()
    }
    assert set(cleaned) == set(range(len(texts)))
    for i, t in enumerate(texts):
        assert cleaned[i][0] == want_clean[i]
        assert cleaned[i][1] == len(t) - len(want_clean[i])


# --- DSIR importance resampling (Xie et al. 2023) -----------------------

def test_dsir_matches_python_recompute(spark):
    """Weights (smoothed log importance ratios over hashed
    unigram+bigram features), per-doc scores, deterministic Gumbel
    keys and the top-k subset against a pure-Python recompute."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP

    from nlu_data_warehouse_project_spark.operators.dsir import (
        dsir_importance_weights,
        dsir_scores,
        dsir_select,
    )

    B, seed = 64, 7
    rows = [
        (0, "en", "the cat sat on the mat"),
        (1, "en", "a dog  ran far"),          # double space: empty dropped
        (2, "de", "der hund lief weit weg"),
        (3, "de", "the cat der hund"),
        (4, "en", ""),                        # no features -> no score row
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    target = docs.filter("lang = 'en'")

    def feats(text):
        ts = [t for t in text.split(" ") if t]
        return ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]

    def bucket(f):
        return int(hashlib.md5(f"ds:{f}".encode()).hexdigest()[:10], 16) % B

    def r6(x):
        return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)

    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for _id, lang, text in rows:
        for f in feats(text):
            b = bucket(f)
            rc[b] = rc.get(b, 0) + 1
            if lang == "en":
                tc[b] = tc.get(b, 0) + 1
    nt, nr = sum(tc.values()), sum(rc.values())
    want_w = {
        b: r6(
            math.log((tc.get(b, 0) + 1.0) / (nt + B))
            - math.log((rc.get(b, 0) + 1.0) / (nr + B))
        )
        for b in range(B)
    }
    w = dsir_importance_weights(target, docs, "text", buckets=B)
    got_w = {r["bucket"]: r["weight"] for r in w.collect()}
    assert got_w == want_w

    want_sc = {}
    for _id, _lang, text in rows:
        fs = feats(text)
        if not fs:
            continue
        iw = sum(want_w[bucket(f)] for f in fs)
        h60 = int(
            hashlib.md5(f"{seed}:{_id}".encode()).hexdigest()[:15], 16
        )
        u = (h60 + 0.5) / float(1 << 60)
        key = r6(float(iw) + (-math.log(-math.log(u))))
        want_sc[_id] = (len(fs), iw.quantize(Decimal("0.000001")), key)
    sc = dsir_scores(docs, w, "text", "doc_id", buckets=B, gumbel_seed=seed)
    got_sc = {
        r["doc_id"]: (r["n_features"], r["log_iw"], r["sample_key"])
        for r in sc.collect()
    }
    assert got_sc == want_sc
    assert 4 not in got_sc  # empty doc scores nowhere

    top2 = sorted(want_sc, key=lambda d: want_sc[d][2], reverse=True)[:2]
    got_top = {r["doc_id"] for r in dsir_select(sc, 2).collect()}
    assert got_top == set(top2)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_dup_substring_keep_first_bruteforce(spark, doc_passages):
    """keep_first=True == brute force where a position is marked iff
    its gram has a lexicographically earlier (doc, pos) occurrence;
    the corpus-wide FIRST copy of every duplicated string survives."""
    from nlu_data_warehouse_project_spark.operators.dedup import (
        strip_dup_substrings,
    )

    L = 8
    texts = ["".join(ps) for ps in doc_passages]
    occ: dict[str, tuple[int, int]] = {}
    for i, t in enumerate(texts):
        for p in range(len(t) - L + 1):
            occ.setdefault(t[p:p + L], (i, p))
    want = {}
    for i, t in enumerate(texts):
        spans = []
        for p in range(len(t) - L + 1):
            if occ[t[p:p + L]] < (i, p):
                if spans and p <= spans[-1][1]:
                    spans[-1][1] = max(spans[-1][1], p + L)
                else:
                    spans.append([p, p + L])
        keep = [
            ch for j, ch in enumerate(t)
            if not any(s <= j < e for s, e in spans)
        ]
        want[i] = "".join(keep)

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in strip_dup_substrings(df, min_len=L, keep_first=True).collect()
    }
    assert got == want
    # doc 0 can never lose anything: every first occurrence beats it
    # only if an earlier (doc, pos) exists, and within doc 0 earlier
    # positions are the within-doc repeats
    if texts and len(set(texts[0][p:p + L] for p in range(len(texts[0]) - L + 1))) == max(0, len(texts[0]) - L + 1):
        assert got[0] == texts[0]
