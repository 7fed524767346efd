"""Dump ``explain('formatted')`` for the benched catalog queries into
``plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt`` (tag =
before/after, round dir default r18), for the optimization-round
evidence trail.  Usage:

    python tools/dump_plans.py <tag> [query ...]

With no query list, dumps every query in bench.py's gated + extras
groups.  Planning only — nothing is executed.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import EXTRAS, HEAVY_HEADLINE, LEGACY19  # noqa: E402
from nlu_data_warehouse_project_spark.queries import QUERIES  # noqa: E402
from nlu_data_warehouse_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or (LEGACY19 + HEAVY_HEADLINE + EXTRAS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r18")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("nlu-dw-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                QUERIES[name](spark, sf_dir).explain("formatted")
        except Exception as exc:  # noqa: BLE001 — record the failure in place
            buf.write(f"\nEXPLAIN FAILED: {type(exc).__name__}: {exc}\n")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
