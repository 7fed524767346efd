"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall seconds.

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 3) and reports
the per-query MEDIAN; the headline value is the sum of medians (single
runs at this scale carry multi-hundred-ms JVM/GC noise).  The LSH
top-k's recall against the exact top-k is measured alongside so the
approximate path's speed/recall trade stays visible round over round.

Each query is fully materialized via the no-op sink (forces execution
of every partition without a driver-side collect bottleneck).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nlu_data_warehouse_project_spark.queries import QUERIES  # noqa: E402
from nlu_data_warehouse_project_spark.session import get_spark  # noqa: E402

HEADLINE = [
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
]


def lsh_topk_recall(spark, sf_dir: str) -> float:
    """Fraction of the exact cosine top-k pairs the LSH path recovers."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["q18_cosine_topk"](spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["q34_lsh_cosine_topk"](spark, sf_dir).collect()
    }
    return round(len(exact & approx) / len(exact), 4) if exact else 1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_spark("nlu-dw-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the query, not session startup
    QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        times = []
        for _ in range(n_runs):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            # queries that persist intermediates must not feed their
            # cache (or their memory) into the following runs
            spark.catalog.clearCache()
        med = round(statistics.median(times), 3)
        per_query[name.split("_")[0]] = med
        total += med

    recall = lsh_topk_recall(spark, sf_dir)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "runs_per_query": n_runs,
                "lsh_topk_recall": recall,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
