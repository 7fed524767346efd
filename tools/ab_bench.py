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
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

QUERIES_UNDER_TEST = [
    "q01_pricing_summary",
    "q05_date_surrogate",
    "q07_dedup_keep_first",
    "q08_scd2_merge",
    "q10_mart_revenue",
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
