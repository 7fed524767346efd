"""Scale-stress harness (VERDICT r12 #1): measure how the heavy
headline queries actually scale, instead of arguing it from plans.

Inflates sf0.1 by key-space remapping — K disjoint copies of each
fact table with keys offset by ``copy * 10_000_000`` (the q290
``doc_id + 1000000`` trick, applied table-wide) — into a throwaway
gitignored dir, then times the HEAVY_HEADLINE set plus the two
corpus-shaped headliners (q16 MinHash LSH, q45 IVF top-k) at 1x and
each inflated factor, and fits the per-query scaling exponent
``alpha = ln(t_K / t_1) / ln(K)`` (1.0 = linear, <1 = fixed job
overhead amortizing, >1 = super-linear — the thing the harness
exists to catch).

Why remapping preserves the WORKLOAD SHAPE and not just the byte
count:

- orders / lineitem / customer / part / supplier: every key column is
  offset per copy, so joins stay key-correct and group-by cardinality
  (customers, parts, orders) inflates Kx — q182's RFM frame, q242's
  part census, and q200/q180's co-order graph all grow Kx in keys,
  not just in rows per key.
- documents: doc_id offsets AND every token gets a per-copy suffix.
  Verbatim copies would put each doc's K twins in the same LSH bucket
  and mint O(K^2) candidate pairs PER DOC — a data-construction
  quadratic that would smear the plan measurement.  Salting every
  token keeps each copy's internal near-dup structure byte-identical
  to the base corpus while making cross-copy shingles disjoint, so
  q16's candidate volume scales exactly Kx.
- embeddings: vec_id offsets AND a deterministic per-copy
  PERTURBATION (additive xxhash64 noise, ±5% of the vector's RMS
  element magnitude per element).  VERDICT r13 #2: verbatim vector
  copies would make every ANN's recall trivially 1.0 (each copy lands
  in exactly its source's buckets), so recall-at-scale measured on
  them is not evidence; seeded noise far below the inter-vector
  distance keeps each copy a distinct NEAR neighbor — the ANN has to
  actually find it.  q45's query set pins vec_id < 5 (copy-0
  originals) so the probe count stays fixed while the probed corpus
  grows Kx (the "same dashboard, 10x the data" read pattern), and
  ``ann_recall_at_scale`` re-runs the recall suite (LSH, trained IVF,
  PQ-ADC) against the exact top-k RECOMPUTED at each scale.
- region / nation / events: symlinked unchanged (dimension tables are
  sf-invariant; events is outside the stress set).

Usage:
    python tools/scale_stress.py                 # copies 3 and 10, 3 runs
    python tools/scale_stress.py --copies 10 --runs 2
    python tools/scale_stress.py --queries q200_coorder_pagerank

Prints one JSON line and (unless --no-md) rewrites SCALING.md.
Inflated dirs are cached under .scale_stress/ (gitignored) keyed by a
marker recording base dir + copies; delete the dir to force rebuild.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nlu_data_warehouse_project_spark.queries import QUERIES  # noqa: E402
from nlu_data_warehouse_project_spark.session import get_spark  # noqa: E402

STRIDE = 10_000_000
# key columns offset by copy * STRIDE; fk pairs share the stride so
# every join in the stress set stays key-correct across copies
REMAP = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SYMLINK = ["region", "nation", "events"]

STRESS_QUERIES = [
    "q180_coorder_blast_radius",
    "q182_rfm_segmentation",
    "q200_coorder_pagerank",
    "q227_spearman_qty_price",
    "q242_abc_xyz_matrix",
    "q16_minhash_neardup",
    "q45_ivf_topk",
    # iterative connected-components over the near-dup pair graph: the
    # round-count-dependent operator class the fixed-round bench can't
    # characterize — its scaling exponent belongs in SCALING.md
    "q47_neardup_clusters",
    # VERDICT r13 #4: the highest-exchange-count relational plans in
    # the catalog (PLAN_AUDIT), previously never stress-run — q222 is
    # also the one documented k²-per-order fan-out (its docstring
    # states the TPC-H k<=7 bound; the stress row verifies the claim)
    "q222_degree_assortativity",
    "q320_abc_migration",
    "q310_price_decile_drift",
    "q322_bullwhip_ratio",
    "q294_peak_open_orders",
    # round-14 additions with non-obvious scaling shapes: the SymSpell
    # variant-key join (O(n*L) emitted keys — the claim the exponent
    # verifies), the tf-idf vocabulary joins, the basket pair
    # expansion behind its checkpoint barrier, and the BPE rounds
    # (word-frequency-table-sized after the first scan, so inflation
    # that replicates documents should leave it nearly flat)
    "q351_fuzzy_name_pairs",
    "q349_tfidf_top_terms",
    "q354_brand_affinity_rules",
    "q358_bpe_merges",
    # round 15: depth-2 deletion-neighborhood join — L^2/2 variant
    # keys per name, the steepest documented fan-out in the fuzzy
    # family; the d=2-aware salt (pairwise tag distance >= 4) keeps
    # its OUTPUT Kx so the exponent measures the plan, not the data
    "q366_edit2_name_pairs",
    # round 16: the streamed recurrence defaults (repartition+sort+
    # mapInPandas — state bounded, wall should track the sort), the
    # incremental golden-record capstone (iterative CC over star+new
    # edges; the standing self-join is the cost it must NOT re-pay),
    # and the CM sketch (counters bounded at depth*width, so the
    # exponent measures the one explode+groupBy scan)
    "q341_ewma_by_nation",
    "q343_sequence_packing",
    "q371_golden_record_incremental",
    "q372_cm_sketch_part_freq",
    # the winnowing pair join: its first 30x run OOM'd on an AQE
    # auto-broadcast of the corpus-sized fingerprint frame (fixed with
    # merge hints) — exactly the failure class this harness exists to
    # catch, so the row is permanent
    "q373_winnow_overlap_pairs",
    # round 17: the exact-substring dedup (a gram per CHARACTER — the
    # largest constant-factor explode in the catalog; the global
    # dup-gram count and per-doc islands windows are the plan under
    # test, and token salting keeps cross-copy grams disjoint so
    # output scales Kx) and DSIR (two bag fits + broadcast-scored
    # corpus + TakeOrdered — should track the feature explode)
    "q385_dup_substring_spans",
    "q387_dsir_selection",
]

# per-copy embedding perturbation scale: |noise element| <= EPS x the
# vector's RMS element magnitude (see module docstring)
PERTURB_EPS = 0.05
# marker version: bump to force a rebuild when inflation LOGIC changes
BUILD_VERSION = 4


def build_inflated(spark, base: str, out: str, copies: int) -> str:
    """Materialize ``copies`` disjoint key-remapped copies of the base
    tables under ``out`` (idempotent via a marker file)."""
    marker = os.path.join(out, "_SCALE_STRESS.json")
    want = {"base": os.path.abspath(base), "copies": copies, "stride": STRIDE,
            "version": BUILD_VERSION}
    if os.path.exists(marker):
        with open(marker, encoding="utf-8") as f:
            if json.load(f) == want:
                return out
    os.makedirs(out, exist_ok=True)
    for name, keys in REMAP.items():
        df = spark.read.parquet(f"{base}/{name}.parquet")
        parts = []
        for i in range(copies):
            c = df
            if i > 0:
                for k in keys:
                    c = c.withColumn(k, F.col(k) + F.lit(i * STRIDE))
                if name == "customer":
                    # per-copy NAME tag for the edit-distance family
                    # (q351/q355/q366): tag = X*4 + Y*4 over a 2-letter
                    # copy code, giving any two DISTINCT copies
                    # pairwise Levenshtein >= 4 (LCS of x^4y^4 vs
                    # u^4v^4 with (x,y) != (u,v) is at most 4, so
                    # distance >= 8-4; the r14 doubled-digit tag only
                    # guaranteed >= 2, not d=2-aware — "010101" vs
                    # "101010" style rotations even collapse repeated
                    # tags to distance 2).  Cross-copy pairs therefore
                    # cannot exist at d <= 2 and both q351's and
                    # q366's output scales exactly Kx — the token-salt
                    # philosophy; an un-salted name column would make
                    # the OUTPUT itself quadratic in K
                    tag = chr(65 + (i // 26) % 26) * 4 + chr(65 + i % 26) * 4
                    c = c.withColumn(
                        "c_name", F.concat(F.lit(tag + "~"), F.col("c_name"))
                    )
                elif name == "supplier":
                    # q366 (edit-2 on s_name) needs the same d=2-aware
                    # tag on suppliers
                    tag = chr(65 + (i // 26) % 26) * 4 + chr(65 + i % 26) * 4
                    c = c.withColumn(
                        "s_name", F.concat(F.lit(tag + "~"), F.col("s_name"))
                    )
                elif name == "documents":
                    # per-copy token salt: keeps within-copy shingles
                    # identical to the base corpus, makes cross-copy
                    # shingles disjoint (see module docstring)
                    c = c.withColumn(
                        "text",
                        F.expr(
                            f"array_join(transform(split(text, ' '), "
                            f"w -> concat(w, '~{i}')), ' ')"
                        ),
                    )
                elif name == "embeddings":
                    # per-copy deterministic perturbation: each element
                    # gets xxhash64(vec_id, element index, copy)-seeded
                    # uniform noise in ±EPS x the vector's RMS element
                    # magnitude — copies become distinct NEAR neighbors
                    # instead of verbatim twins (see module docstring).
                    # NOTE vec_id is already offset at this point, so
                    # the hash seed differs per copy through it too.
                    c = c.withColumn(
                        "__rms",
                        F.expr(
                            "sqrt(aggregate(embedding, 0.0D, "
                            "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) "
                            "/ greatest(size(embedding), 1))"
                        ),
                    ).withColumn(
                        "embedding",
                        F.expr(
                            "transform(embedding, (x, j) -> CAST(x + __rms * "
                            f"{PERTURB_EPS} * "
                            f"((pmod(xxhash64(vec_id, j, {i}), 2001) - 1000) / 1000.0)"
                            " AS FLOAT))"
                        ),
                    ).drop("__rms")
            parts.append(c)
        import functools

        out_df = functools.reduce(lambda a, b: a.unionByName(b), parts)
        out_df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        # inflation invariant: exactly copies x base rows landed, and
        # the remapped key spaces didn't collide (distinct primary keys
        # scale by exactly the same factor) — a remap bug here would
        # silently corrupt every measured exponent
        got = spark.read.parquet(f"{out}/{name}.parquet")
        n_base, n_got = df.count(), got.count()
        if n_got != copies * n_base:
            raise AssertionError(
                f"{name}: inflated rows {n_got} != {copies} * {n_base}"
            )
        pk = keys[0]
        k_base = df.select(pk).distinct().count()
        k_got = got.select(pk).distinct().count()
        if k_got != copies * k_base:
            raise AssertionError(
                f"{name}: distinct {pk} {k_got} != {copies} * {k_base} (key collision)"
            )
    for name in SYMLINK:
        dst = f"{out}/{name}.parquet"
        # ADVICE r13: on a rebuild into the same out dir with a
        # different --base, a skipped-on-lexists symlink would keep
        # pointing at the OLD base and silently mix scale factors —
        # always re-point the link when (re)building
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(os.path.abspath(f"{base}/{name}.parquet"), dst)
    with open(marker, "w", encoding="utf-8") as f:
        json.dump(want, f)
    return out


def time_query(spark, name: str, sf_dir: str, n_runs: int) -> float:
    """bench.py's protocol: one untimed codegen warm-up, then the
    median of ``n_runs`` noop-sink materializations."""
    times = []
    for i in range(n_runs + 1):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        if i > 0:
            times.append(time.time() - t0)
        spark.catalog.clearCache()
    return round(statistics.median(times), 3)


RECALL_FLOOR = 0.8


def ann_recall_at_scale(spark, dirs: dict[int, str], k: int = 5) -> dict:
    """VERDICT r13 #2: recall of every production ANN path at each
    inflation factor, against the exact cosine top-k RECOMPUTED on the
    same (perturbed) corpus.  The queries are the 5 copy-0 originals
    (vec_id < 5), so as the corpus inflates Kx each query gains K-1
    perturbed twins among its true nearest neighbors — near but NOT
    identical vectors (sign-LSH planes can flip, IVF cells can split
    them), which is exactly the regime where a scale-dependent recall
    cliff would show.  Floor: every path >= 0.8 at every scale."""
    from pyspark.sql import functions as F

    from nlu_data_warehouse_project_spark.operators.kmeans import (
        ivf_cosine_topk_trained, kmeans_fit,
    )
    from nlu_data_warehouse_project_spark.operators.pq import ivf_pq_topk, pq_fit
    from nlu_data_warehouse_project_spark.operators.similarity import (
        cosine_topk, lsh_cosine_topk,
    )
    from nlu_data_warehouse_project_spark.queries import _IVF_PLANES, _seeded_planes, _t

    out: dict[str, dict] = {}
    for scale in sorted(dirs):
        emb = _t(spark, dirs[scale], "embeddings")
        q = emb.filter(F.col("vec_id") < 5)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(q, emb, k=k, vec_col="embedding").collect()
        }

        def recall(df) -> float:
            approx = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
            return round(len(exact & approx) / len(exact), 4) if exact else 1.0

        # q34 production config: 16 planes / 4 bands, multi-probe
        lsh = recall(lsh_cosine_topk(q, emb, planes=_seeded_planes(), bands=4, k=k))
        # trained IVF at the bench budget (nprobe 4 of 8 cells)
        cents = kmeans_fit(emb, k=8, max_iters=40, tol=5e-2)
        ivf = recall(ivf_cosine_topk_trained(q, emb, cents, k=k, nprobe=4))
        # PQ-ADC shortlist + exact re-rank (q147 parameters)
        cb = pq_fit(emb, m=16, ksub=32)
        pq = recall(ivf_pq_topk(q, emb, cb, _IVF_PLANES, k=k, nprobe=8, shortlist=128))
        out[f"{scale}x"] = {"lsh": lsh, "ivf_trained_nprobe4of8": ivf, "pq_adc": pq}
        print(f"# ann recall @{scale}x: lsh={lsh} ivf={ivf} pq={pq}", file=sys.stderr)
    flat = [v for row in out.values() for v in row.values()]
    return {"paths": out, "floor": RECALL_FLOOR,
            "gate_ok": bool(min(flat) >= RECALL_FLOOR) if flat else True}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--copies", default="3,10,30",
                    help="comma-separated inflation factors (1x always runs)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_stress"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default=",".join(STRESS_QUERIES))
    ap.add_argument("--no-md", action="store_true", help="skip rewriting SCALING.md")
    ap.add_argument("--no-recall", action="store_true",
                    help="skip the ANN recall-at-scale suite")
    args = ap.parse_args()
    copies = sorted({int(c) for c in args.copies.split(",") if int(c) > 1})
    names = [q for q in args.queries.split(",") if q]

    spark = get_spark("scale-stress")
    dirs = {1: args.base}
    for k in copies:
        d = os.path.join(args.out, f"x{k}")
        print(f"# building {k}x inflated dir at {d} ...", file=sys.stderr)
        dirs[k] = build_inflated(spark, args.base, d, k)

    results: dict[str, dict] = {}
    for name in names:
        row: dict = {}
        for k in sorted(dirs):
            t = time_query(spark, name, dirs[k], args.runs)
            row[f"sec@{k}x"] = t
            print(f"# {name} @{k}x: {t}s", file=sys.stderr)
        t1 = row["sec@1x"]
        for k in copies:
            tk = row[f"sec@{k}x"]
            row[f"ratio@{k}x"] = round(tk / t1, 2)
            row[f"alpha@{k}x"] = round(math.log(tk / t1) / math.log(k), 2)
        results[name] = row

    report = {
        "metric": "scale_stress",
        "base": args.base,
        "copies": [1] + copies,
        "runs_per_query": args.runs,
        "queries": results,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }
    if not args.no_recall:
        # VERDICT r14 #4: the recall table now spans the FULL curve —
        # 1x and every inflation factor (the r13 two-ends shortcut
        # stopped the recall table at 10x while the time curve went
        # to 30x); k-means/PQ retrain at each scale, which is the
        # honest cost of measuring the quantizer where it must live
        report["ann_recall"] = ann_recall_at_scale(spark, dirs)
    print(json.dumps(report))
    if not args.no_md:
        write_scaling_md(report)
    spark.stop()


def write_scaling_md(report: dict) -> None:
    copies = [k for k in report["copies"] if k != 1]
    kmax = max(copies)
    lines = [
        "# SCALING — measured scale-stress curve",
        "",
        f"Harness: `tools/scale_stress.py` (runs={report['runs_per_query']}, "
        f"median after 1 warm-up, noop sink; base={report['base']}, "
        f"load_avg at finish {report['load_avg']}).",
        "",
        "Data inflated by key-space remapping into disjoint per-copy key",
        "ranges (stride 10M); documents token-salted per copy so LSH",
        "candidate volume scales Kx instead of K^2 (see the harness",
        "docstring).  `alpha` is the fitted exponent ln(t_K/t_1)/ln(K):",
        "1.0 = linear in data volume, <1 = the ~0.6s/job fixed cost and",
        "constant-size stages (dictionaries, dimension joins, probe",
        "sets) amortizing, >1 = super-linear (a plan that would NOT",
        "survive 100x — none may ship in that state).",
        "",
        "Read the RATIOS, not the 1x column: all three scales of one",
        "query run back-to-back in one session, so each row's ratios are",
        "internally fair, but absolute seconds are NOT comparable to",
        "BENCH_r{N}.json (different session, and the harness itself",
        "loads the machine while it runs).",
        "",
        "EXPECT alpha to RISE toward (but stay below) 1.0 as the scale",
        "grows: at small K the ~0.6s/job fixed cost dominates and alpha",
        "reads low; at 30x the fixed costs have amortized away and a",
        "linear-work plan's honest asymptote is alpha -> 1.  The defect",
        "this table exists to catch is alpha ABOVE 1 (super-linear),",
        "not an alpha@30x that is higher than alpha@10x.",
        "",
        "| query | " + " | ".join(f"sec@{k}x" for k in report["copies"])
        + " | " + " | ".join(f"alpha@{k}x" for k in copies) + " |",
        "|---|" + "---|" * (len(report["copies"]) + len(copies)),
    ]
    for name, row in report["queries"].items():
        cells = [f"{row[f'sec@{k}x']}" for k in report["copies"]]
        cells += [f"{row[f'alpha@{k}x']}" for k in copies]
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
    worst = max(report["queries"].items(), key=lambda kv: kv[1][f"alpha@{kmax}x"])
    lines += [
        "",
        f"Worst exponent at {kmax}x: `{worst[0]}` "
        f"(alpha={worst[1][f'alpha@{kmax}x']}).",
        "",
    ]
    rec = report.get("ann_recall")
    if rec:
        scales = list(rec["paths"])
        paths = list(next(iter(rec["paths"].values())))
        lines += [
            "## ANN recall at scale (perturbed copies)",
            "",
            "Embedding copies carry deterministic ±5%-of-RMS per-element",
            "noise (VERDICT r13 #2): verbatim copies would land in exactly",
            "their source's LSH buckets / IVF cells and make recall",
            "trivially 1.0, so each copy is instead a distinct NEAR",
            "neighbor the ANN must actually find.  Recall is measured",
            "against the exact cosine top-5 recomputed on the same",
            f"perturbed corpus at each scale; gate: every path >= "
            f"{rec['floor']} at every scale "
            f"({'PASS' if rec['gate_ok'] else 'FAIL'}).",
            "",
            "| path | " + " | ".join(f"recall@{s}" for s in scales) + " |",
            "|---|" + "---|" * len(scales),
        ]
        for p in paths:
            lines.append(
                f"| {p} | " + " | ".join(f"{rec['paths'][s][p]}" for s in scales) + " |"
            )
        lines.append("")
    md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "SCALING.md")
    with open(md, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    print(f"# wrote {md}", file=sys.stderr)


if __name__ == "__main__":
    main()
