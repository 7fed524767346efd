"""Physical-plan introspection (SURVEY.md §4).

The reference delegates all optimization to Postgres; here Catalyst
does it, and this module makes the resulting plans *checkable*: tests
assert that filters reach the parquet scan, small dimensions broadcast,
and hot paths stay inside whole-stage codegen — so a regression that
silently de-optimizes a plan fails CI instead of surfacing as a 10x
slowdown at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `.explain("formatted")` text of the physical plan."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def has_pushed_filters(df: DataFrame) -> bool:
    """True when the parquet scan carries PushedFilters (predicate
    reached the reader — row-group pruning applies)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line and "[]" not in line.split("PushedFilters:")[1]:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in the scan's ReadSchema (column pruning check:
    a 2-column projection must not read 16 columns)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema_part = line.split("ReadSchema:")[1].strip()
            inner = schema_part[schema_part.index("<") + 1 : schema_part.rindex(">")]
            depth = 0
            field = ""
            for ch in inner:
                if ch == "<" or ch == "(":
                    depth += 1
                elif ch == ">" or ch == ")":
                    depth -= 1
                if ch == "," and depth == 0:
                    cols.append(field.split(":")[0].strip())
                    field = ""
                else:
                    field += ch
            if field:
                cols.append(field.split(":")[0].strip())
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators in the plan (each is one shuffle
    boundary; fewer is better as long as semantics hold)."""
    plan = formatted_plan(df)
    # count detail headings "(N) Exchange" only — each operator appears
    # both in the tree and as a heading, and reused exchanges don't count
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(") and ") Exchange" in line and "Reused" not in line
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (JVM-compiled pipelines) in the
    simple-mode plan (``*(N) Operator``).  NB: with AQE enabled the
    markers only materialize in the FINAL plan (after execution); on an
    unexecuted AQE plan this returns 0 — prefer ``python_udf_count``
    for static stay-JVM-side assertions."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    ids = set()
    for token in plan.split("*(")[1:]:
        num = token.split(")")[0]
        if num.isdigit():
            ids.add(int(num))
    return len(ids)


def python_udf_count(df: DataFrame) -> int:
    """Number of Python-evaluation operators in the plan
    (BatchEvalPython / ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).
    0 means the whole query runs JVM-side inside codegen — the engine's
    default contract for relational operators."""
    plan = formatted_plan(df)
    markers = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(") and any(f") {m}" in line for m in markers)
    )


def window_count(df: DataFrame) -> int:
    """Number of Window operators in the physical plan.  The exact-rank
    family (`operators/scale.exact_global_rank` and friends) exists so
    global ranks need ZERO of these; a prefix sum keeps exactly one,
    partitioned by the range-partition id."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(") and ") Window" in line
    )


def single_partition_exchange_count(df: DataFrame) -> int:
    """Number of `Exchange SinglePartition` nodes.  A scalar aggregate
    legitimately funnels its per-partition partials through one (tiny
    rows), but a SORT or WINDOW above one is the global-sort
    scale-killer the exact-rank operators eliminate — pin those plans
    to zero."""
    plan = formatted_plan(df)
    return plan.count("Exchange SinglePartition")
