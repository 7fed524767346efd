"""Declarative data-quality expectations — the warehouse gate the
reference runs implicitly through its per-stage status checks
(`load_to_staging.py` row-count/status guards) generalized into a
reusable report: each check aggregates to ONE row
(check, n_violations, passed), the suite unions them.

Scale shape: every check is a single aggregate (or anti-join +
aggregate) over its table — map-side combined, one row out, no
collect.  The union of one-row frames is driver-cheap.  Checks run
lazily: callers get one DataFrame for the whole suite and Spark
schedules the table scans together (a shared input table's scans can
be cached by the caller when several checks hit the same table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(name: str, violations: Column) -> list[Column]:
    n = violations.cast("long")
    return [
        F.lit(name).alias("check"),
        n.alias("n_violations"),
        (n == 0).alias("passed"),
    ]


def check_predicate(df: DataFrame, name: str, cond: Column) -> DataFrame:
    """Rows violating ``cond`` (NULL counts as a violation — an
    expectation that cannot be evaluated is not met)."""
    bad = F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1))
    return df.agg(*_report(name, F.coalesce(bad, F.lit(0))))


def check_not_null(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    return check_predicate(df, name or f"not_null({','.join(cols)})", cond)


def check_unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Violations = rows beyond the first per key (count - distinct
    over non-null keys; a NULL key never collides in SQL semantics and
    is ignored here — pair with ``check_not_null`` to forbid it)."""
    key = F.struct(*[F.col(c) for c in cols])
    no_null = sum(F.col(c).isNull().cast("int") for c in cols) == 0
    keyed = F.when(no_null, key)  # NULL for null-bearing keys: both counts skip them
    return df.agg(
        *_report(
            name or f"unique({','.join(cols)})",
            F.coalesce(F.count(keyed) - F.count_distinct(keyed), F.lit(0)),
        )
    )


def check_foreign_key(
    child: DataFrame,
    parent: DataFrame,
    keys: dict[str, str],
    name: str | None = None,
) -> DataFrame:
    """Orphaned child rows: child keys with no parent match (NULL child
    keys are orphans — forbid them separately if NULLs are legal).  The
    anti-join broadcasts the parent key set when dimension-sized;
    fact-to-fact referential checks shuffle on the key as any join."""
    cond = None
    for ck, pk in keys.items():
        c = F.col(f"__c.{ck}") == F.col(f"__p.{pk}")
        cond = c if cond is None else (cond & c)
    orphans = child.alias("__c").join(parent.alias("__p"), cond, "left_anti")
    label = name or f"fk({','.join(keys)})"
    return orphans.agg(*_report(label, F.coalesce(F.count(F.lit(1)), F.lit(0))))


def run_expectations(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check frames into the suite report."""
    if not checks:
        raise ValueError("no checks given")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def check_functional_dependency(
    df: DataFrame,
    determinant: list[str],
    dependent: list[str],
    name: str | None = None,
) -> DataFrame:
    """FD violation check: every determinant group must carry exactly
    one distinct dependent tuple (orderkey → orderdate, key → dimension
    attributes).  Violations = SURPLUS distinct dependent tuples,
    Σ_groups (n_distinct − 1) = count_distinct(det, dep) −
    count_distinct(det): zero iff the FD holds, and computable in ONE
    aggregate over the table (both distinct-counts share a single
    Expand-based pass) instead of a per-group aggregate followed by a
    global one — half the exchanges of the groupBy form.  A struct over
    the dependent columns is never NULL, so NULL-bearing tuples count
    as distinct values — two rows (k, NULL) and (k, x) ARE a
    violation."""
    det_s = F.struct(*[F.col(c) for c in determinant])
    dep = F.struct(*[F.col(c) for c in dependent])
    pair = F.struct(det_s.alias("d"), dep.alias("v"))
    label = name or f"fd({','.join(determinant)}->{','.join(dependent)})"
    surplus = F.count_distinct(pair) - F.count_distinct(det_s)
    return df.agg(*_report(label, F.coalesce(surplus, F.lit(0))))


def check_predicates(df: DataFrame, conds: dict[str, Column]) -> DataFrame:
    """Several row-predicate checks in ONE scan of ``df`` (the
    one-check-per-aggregate form scans the table once per rule — at
    warehouse scale, rules over the same fact table must share the
    pass).  Same per-row NULL-is-a-violation semantics as
    ``check_predicate``; one row out per rule via a posexploded
    aggregate."""
    if not conds:
        raise ValueError("no predicates given")
    sums = [
        F.coalesce(
            F.sum(F.when(F.coalesce(c, F.lit(False)), 0).otherwise(1)), F.lit(0)
        ).cast("long").alias(f"__v{i}")
        for i, c in enumerate(conds.values())
    ]
    one = df.agg(*sums)
    names = list(conds)
    packed = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("check"),
                        F.col(f"__v{i}").alias("n_violations"),
                        (F.col(f"__v{i}") == 0).alias("passed"),
                    )
                    for i, n in enumerate(names)
                ]
            )
        ).alias("r")
    )
    return packed.select("r.check", "r.n_violations", "r.passed")


class ExpectationsFailedError(RuntimeError):
    """A guarded commit was refused: the batch violated its contract."""


def enforce(checks: list[DataFrame]) -> list[dict]:
    """Run an expectations suite and RAISE on any failed check —
    the enforcement form of ``run_expectations`` (which only reports).
    Returns the suite rows (as dicts) when everything passed; the
    collect is suite-sized (one row per check), never data-sized."""
    rows = [r.asDict() for r in run_expectations(checks).collect()]
    failed = [r for r in rows if not r["passed"]]
    if failed:
        detail = "; ".join(f"{r['check']}: {r['n_violations']} violations" for r in failed)
        raise ExpectationsFailedError(f"{len(failed)} expectation(s) failed: {detail}")
    return rows


def check_drift(
    df: DataFrame,
    reference: DataFrame,
    group_col: str,
    bin_expr: Column,
    max_chi2: float,
    name: str | None = None,
) -> DataFrame:
    """Distribution drift as a data-contract check (VERDICT r8 #5): the
    q103 ``histogram_drift`` score of ``df`` against a settled
    ``reference``, folded to the (check, n_violations, passed) suite
    shape — n_violations = groups whose chi² exceeds ``max_chi2``.
    Drop it into a ``contract=`` list / ``guarded_commit`` and a
    drifted batch STOPS THE LINE instead of publishing."""
    from .profile import histogram_drift

    rep = histogram_drift(reference, df, group_col, bin_expr)
    bad = F.sum(F.when(F.col("chi2") > F.lit(max_chi2), 1).otherwise(0))
    return rep.agg(
        *_report(name or f"drift_chi2_le_{max_chi2}", F.coalesce(bad, F.lit(0)))
    )


def guarded_commit(table, df, run_id: str, check_fns, mode: str = "append", extra=None) -> int:
    """Data-contract enforcement AT THE COMMIT BOUNDARY: evaluate every
    check against the batch and refuse to publish if any fails — bad
    data never becomes a visible version, and the (crash-safe) TxTable
    protocol means a refused commit leaves nothing behind.

    ``check_fns`` are callables ``df -> check frame`` (e.g.
    ``lambda d: check_not_null(d, ["doc_id"])``), so the same contract
    list can guard every ingest batch.  The checks and the write are
    separate actions over ``df``; for non-deterministic or expensive
    inputs, pass a persisted/localCheckpoint'ed frame so the validated
    rows are the written rows.

    The reference enforces this implicitly by row-count/status guards
    between stages (`load_to_staging.py`); this is the declarative,
    per-batch form.
    """
    if mode not in ("append", "snapshot"):
        raise ValueError(f"unknown mode {mode!r} (append|snapshot)")
    enforce([fn(df) for fn in check_fns])
    if mode == "append":
        return table.commit_append(df, run_id, extra=extra)
    return table.commit_snapshot(df, run_id, extra=extra)
