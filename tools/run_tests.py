"""Parallel test runner: the full pytest suite in a few minutes.

pytest-xdist is not available in this environment, so this fans the
suite out by FILE across N worker subprocesses, each running its own
pytest (and therefore its own SparkSession/JVM).  Files are pulled from
a shared queue in descending expected-cost order (longest-processing-
time-first — the classic makespan heuristic), so the heavy Spark files
start immediately and the tail is packed with cheap ones.

Isolation notes (why by-file fanout is safe here):
- every test writes only under pytest tmp_path / tmp_path_factory dirs,
  unique per process;
- the Spark UI is disabled (no port contention) and the catalog is
  in-memory (no shared derby metastore);
- each worker JVM gets local[$SPARK_GRAFT_TEST_CPUS] (default 8)
  threads — workers × cpus is sized to the machine, and beats one
  local[32] session because pytest itself is single-threaded per
  session: one JVM leaves 31 threads idle between actions.

Usage:
    python tools/run_tests.py           # 4 workers (default)
    python tools/run_tests.py -j 6
    python tools/run_tests.py -j 1      # serial, same selection

Exit status is non-zero if ANY file fails; per-file tails are printed
as they finish, full logs land in .pytest-par/<file>.log.
"""

from __future__ import annotations

import argparse
import glob
import os
import queue
import subprocess
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Expected relative cost (seconds-ish, from a measured full run); files
# not listed default to 30.  Only the ORDER matters — the queue is
# work-stealing, so stale weights cost a little packing efficiency,
# never correctness.
WEIGHTS = {
    "test_txlog.py": 365,
    "test_mart.py": 240,
    "test_control_pipeline.py": 184,
    "test_llm_ops.py": 126,
    "test_sketches_properties.py": 88,
    "test_corpus_ingest.py": 81,
    "test_plans.py": 58,
    "test_diff.py": 58,
    "test_backfill_sql.py": 57,
    "test_streaming_stateful.py": 53,
    "test_sampling_ann.py": 51,
    "test_engine.py": 48,
    "test_scd2_model.py": 47,
    "test_bloomindex.py": 41,
    "test_streaming_multimodal.py": 31,
    "test_scale.py": 29,
    "test_scd2.py": 28,
    "test_expectations.py": 27,
    "test_alerts.py": 25,
    "test_sources.py": 24,
    "test_cleansing.py": 24,
    "test_rangejoin.py": 22,
    "test_ntz_robustness.py": 17,
    "test_calendar.py": 14,
    "test_round8_properties.py": 45,
    "test_webdataset.py": 16,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-j", "--jobs", type=int, default=int(os.environ.get("SPARK_GRAFT_TEST_JOBS", "4")))
    ap.add_argument("files", nargs="*", help="test files (default: tests/test_*.py)")
    args = ap.parse_args()

    files = args.files or sorted(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    files = sorted(files, key=lambda f: -WEIGHTS.get(os.path.basename(f), 30))
    logdir = os.path.join(ROOT, ".pytest-par")
    os.makedirs(logdir, exist_ok=True)

    q: "queue.Queue[str]" = queue.Queue()
    for f in files:
        q.put(f)

    lock = threading.Lock()
    failures: list[str] = []
    t0 = time.time()

    def worker(wid: int) -> None:
        while True:
            try:
                f = q.get_nowait()
            except queue.Empty:
                return
            base = os.path.basename(f)
            log = os.path.join(logdir, base + ".log")
            tf = time.time()
            with open(log, "w") as out:
                rc = subprocess.call(
                    [sys.executable, "-m", "pytest", f, "-q", "-p", "no:cacheprovider"],
                    cwd=ROOT,
                    stdout=out,
                    stderr=subprocess.STDOUT,
                )
            dt = time.time() - tf
            tail = ""
            try:
                with open(log) as fh:
                    lines = [ln.strip() for ln in fh if ln.strip()]
                    tail = lines[-1] if lines else ""
            except OSError:
                pass
            with lock:
                status = "ok  " if rc == 0 else "FAIL"
                print(f"[{status}] {base:<34} {dt:6.1f}s  {tail}", flush=True)
                if rc != 0:
                    failures.append(base)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(max(1, args.jobs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    total = time.time() - t0
    print(f"\n{len(files)} files in {total:.0f}s with {args.jobs} workers", flush=True)
    if failures:
        print("FAILED: " + ", ".join(failures), flush=True)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
