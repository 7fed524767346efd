"""Per-stage wall/metric breakdown for one catalog query (guide §1:
measure first, empirically).  Runs the query through the noop sink in a
fresh JVM with the UI enabled, then reads /api/v1 stage metrics and
prints stages sorted by executor-time share, with shuffle bytes and
task counts — the local stand-in for the Spark UI's Stages tab.

    python tools/profile_query.py q227_spearman_qty_price [runs]

Timed-run discipline matches bench.py (1 untimed warm-up, then median
of ``runs``, default 3); only the LAST run's stages are detailed (the
warm runs' stages are dropped from the listing by submission time).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nlu_data_warehouse_project_spark.queries import QUERIES  # noqa: E402
from nlu_data_warehouse_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        f"profile-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    times = []
    last_start = 0.0
    for i in range(runs + 1):
        spark.sparkContext.setJobDescription(f"{name} run {i}")
        t0 = time.time()
        if i == runs:
            last_start = t0
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if i > 0:
            times.append(dt)
        spark.catalog.clearCache()
    print(f"{name}: median {statistics.median(times):.3f}s over {runs} runs "
          f"(all: {[round(t, 3) for t in times]})")

    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4055/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as resp:
        stages = json.load(resp)
    # keep only stages submitted during the LAST run
    recent = [
        s for s in stages
        if s.get("firstTaskLaunchedTime")
        and _ms(s["firstTaskLaunchedTime"]) >= last_start * 1000 - 500
    ]
    recent.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    total_exec = sum(s.get("executorRunTime") or 0 for s in recent) or 1
    print(f"\nlast-run stages: {len(recent)}  "
          f"total executorRunTime {total_exec/1000.0:.2f}s (sums across tasks)")
    print(f"{'stage':>6} {'tasks':>5} {'execMs':>8} {'%':>5} {'shufRd':>9} "
          f"{'shufWr':>9} {'input':>9} {'name'}")
    for s in recent[:25]:
        print(
            f"{s['stageId']:>6} {s['numCompleteTasks']:>5} "
            f"{s.get('executorRunTime', 0):>8} "
            f"{100.0 * (s.get('executorRunTime') or 0) / total_exec:>4.0f}% "
            f"{_mb(s.get('shuffleReadBytes')):>9} {_mb(s.get('shuffleWriteBytes')):>9} "
            f"{_mb(s.get('inputBytes')):>9} {s.get('name', '')[:60]}"
        )
    spark.stop()


def _ms(iso: str) -> float:
    from datetime import datetime

    return datetime.strptime(iso, "%Y-%m-%dT%H:%M:%S.%f%Z").timestamp() * 1000


def _mb(b) -> str:
    return f"{(b or 0) / 1048576.0:.1f}M"


if __name__ == "__main__":
    main()
