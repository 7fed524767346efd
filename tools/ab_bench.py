"""Same-machine A/B micro-bench for a handful of catalog queries
across two checkouts (VERDICT r11 #1 — the q05/q07/q08/q10 drift
question).  Usage:

    git worktree add /tmp/r10wt <commit>
    for i in 1 2 3; do
        python tools/ab_bench.py /root/repo
        python tools/ab_bench.py /tmp/r10wt
    done

Each invocation is a fresh JVM running ONLY the listed queries (one
untimed warm-up + median of 5, bench.py's discipline); interleaving
the two checkouts cancels slow machine drift, and comparing the
per-variant MINIMUM cancels GC/scheduling spikes.

Round-12 finding (2026-08-15), 3 interleaved pairs, HEAD(r11+fixes)
vs r10 final (39bf994), min-of-3 per query:

    q01 1.028/0.970  q05 0.592/0.610  q07 0.999/1.010
    q08 1.217/1.210  q10 1.333/1.295

All four "drift" queries are within ±3% of r10 — and the q01 CONTROL
(untouched since round 3) shows the same spread as the cluster.  The
+15-24% r10->r11 drift in the driver's BENCH_r11 was machine
variance, not the round-11 TxTable rewrite-engine changes; no code
fix required.  (Full-suite bench totals are additionally inflated by
late-suite JVM/GC pressure — the same queries run ~20% faster in a
5-query session than at the tail of a 53-query one, which is why this
harness compares small like-for-like sessions.)

Round-13 finding (2026-08-15), VERDICT r12 #2 (q18 +21% / q21 +20%
in BENCH_r11->r12): 3 interleaved pairs, HEAD vs r11 final
(dd5995f), min-of-3 per query, idle machine (1-min load 0.5):

    q01(control) 1.005/1.014   q18 0.662/0.705   q21 0.440/0.446

q18 is 6% FASTER at HEAD than at r11, q21 within 1.5%, control
within 1% — the r12 drift was machine variance (the same verdict as
the r11 cluster; both queries sit late in the 57-query bench
session where JVM pressure inflates small queries the most).  No
code fix required.  The query list is overridable per run via
SPARK_GRAFT_AB_QUERIES so this file never has to change inside the
checkouts being compared.

Round-13 addendum (same day): the round-end local bench read q16
+21% / q242 +20% vs BENCH_r12 — exactly at the 1.2x investigate
line — so the same protocol ran against the r12 final (f09e85f):
3 clean interleaved pairs, min-of-3,

    q01(control) 1.002/1.045   q16 1.770/1.819   q242 2.590/2.602

HEAD is marginally FASTER on both (and their code is byte-untouched
this round).  Note both checkouts measure q16/q242 higher in a
3-query session than in r12's full bench — session composition
shifts absolute numbers; only interleaved mins are like-for-like.

Round-14 finding (2026-08-15), VERDICT r13 #1 — the ACTUAL top
movers of the r12->r13 drift (q08 +31.6%, q07 +29.4%, q05 +25.5%,
q182 +20.2%, q01 +19.7%), which r13's addendum skipped.  Two
interleaved sessions vs the r12 final (f09e85f), min-of-3 per query
(HEAD/r12):

    q01 0.965/0.981   q05 0.554/0.589   q07 0.925/0.929
    q08 1.144/1.184   q182 2.533/2.405

HEAD is FASTER on q01/q05/q07/q08; q182 reads +5.3% — the same
magnitude as the q01 control's spread across the two sessions (HEAD
q01 mins were 0.965 then 0.942 vs r12's 0.981 then 0.915), and in
the first session HEAD's q182 hit 2.214, below r12's best anywhere.
Verdict: the entire r13 drift cluster was session/machine variance;
no code regression.  (The r12 side of session 1 ran its own older
harness, which predates SPARK_GRAFT_AB_QUERIES and fell back to the
default list — when A/B-ing old checkouts, invoke THIS file against
the old worktree path so both sides run the same list.)

This was the THIRD consecutive round of manual drift adjudication,
so the structural fix landed with it: bench.py now runs each gated
group (legacy19, heavy) in its own fresh JVM subprocess with a
frozen query set and order — the recorded series is like-for-like
across rounds by construction, and this harness remains only for
ad-hoc forensics.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# default set = the r11 drift cluster; override per run with
# SPARK_GRAFT_AB_QUERIES=q18_cosine_topk,q21_sessionize (r12's watch
# items need a different list, and editing the file would change the
# checkout under test)
QUERIES_UNDER_TEST = [
    q for q in os.environ.get(
        "SPARK_GRAFT_AB_QUERIES",
        "q01_pricing_summary,q05_date_surrogate,q07_dedup_keep_first,"
        "q08_scd2_merge,q10_mart_revenue",
    ).split(",") if q
]


def main() -> None:
    repo = sys.argv[1] if len(sys.argv) > 1 else os.getcwd()
    sys.path.insert(0, repo)
    os.chdir(repo)
    from nlu_data_warehouse_project_spark.queries import QUERIES
    from nlu_data_warehouse_project_spark.session import get_spark

    spark = get_spark("ab-bench")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = {}
    for name in QUERIES_UNDER_TEST:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(5):
            spark.catalog.clearCache()
            t = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t)
        out[name.split("_")[0]] = round(statistics.median(ts), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
