"""Snapshot / corpus version diffing over TxTable time travel.

The question every curation iteration asks — "what changed in the
corpus between the version we trained on and HEAD?" — has two
scale-distinct answers:

* append-shaped tables (training corpora via ``commit_append``): the
  answer is already materialized as the closed segments added between
  the two manifests.  ``TxTable.read_closed_delta`` returns exactly
  those dirs — an O(delta) manifest lookup + scan, no join, no full
  read of either version.
* merge/snapshot-shaped tables (SCD2 gold, dimensions): rows mutate,
  so the diff is a key-wise comparison of the two versions.
  ``snapshot_diff`` below is that join: one shuffle per side on the
  key, null-safe column comparison, classification in a single pass.

Both compose with the manifest log's version retention: any version
``vacuum`` kept is diffable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Key-wise diff of two snapshots: one output row per key whose
    state differs, classified ``added`` / ``removed`` / ``changed``
    (unchanged keys are dropped).  Value columns carry the NEW side
    for added/changed rows and the OLD side for removed rows.

    ``compare_cols`` defaults to every shared non-key column.  Columns
    present in only one snapshot are ignored for comparison (schema
    evolution between versions) but still reported from the surviving
    side.  One shuffle per side; at 100 TB prefer diffing the CURRENT
    sets of two versions rather than full histories — closed history
    is immutable, so its diff is ``read_closed_delta``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    shared = [c for c in new.columns if c in set(old.columns) and c not in keys]
    cmp_cols = [c for c in (compare_cols or shared) if c not in keys]
    missing = set(cmp_cols) - set(shared)
    if missing:
        raise ValueError(f"compare_cols not shared by both snapshots: {sorted(missing)}")

    # explicit presence markers rather than key-is-not-null probes: a
    # row whose KEY is legitimately NULL still matches via eqNullSafe,
    # and inferring presence from the key would misclassify it
    o = old.withColumn("__in_old", F.lit(True)).alias("o")
    n = new.withColumn("__in_new", F.lit(True)).alias("n")
    cond = reduce(
        lambda a, b: a & b, [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    )
    joined = o.join(n, cond, "full_outer")

    in_old = F.col("o.__in_old").isNotNull()
    in_new = F.col("n.__in_new").isNotNull()
    same = (
        reduce(lambda a, b: a & b, [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in cmp_cols])
        if cmp_cols
        else F.lit(True)
    )
    change = (
        F.when(in_old & ~in_new, F.lit("removed"))
        .when(in_new & ~in_old, F.lit("added"))
        .when(~same, F.lit("changed"))
    )
    side = lambda c: F.when(change == "removed", F.col(f"o.{c}")).otherwise(F.col(f"n.{c}"))
    # report every value column either side carries: new-side layout
    # first, then old-only columns (dropped between versions) — a
    # removed row must surface the attributes that were dropped with it
    out_vals = [c for c in new.columns if c not in keys]
    old_only = [c for c in old.columns if c not in set(new.columns) and c not in keys]
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys],
            "change",
            *[
                (side(c) if c in shared else F.col(f"n.{c}")).alias(c)
                for c in out_vals
            ],
            *[F.col(f"o.{c}").alias(c) for c in old_only],
        )
    )


def table_diff(table, v_old: int, v_new: int | None = None, key: str | list[str] = "natural_key") -> DataFrame:
    """``snapshot_diff`` of two committed versions of a TxTable's
    CURRENT set (the live state a consumer sees).  Current sets are
    unique on the merge key, which the join requires; the closed
    history between the versions is append-only and therefore
    O(delta)-diffable via ``TxTable.read_closed_delta`` instead."""
    return snapshot_diff(
        table.read_current(version=v_old), table.read_current(version=v_new), key
    )


def schema_diff(table, since_version: int, version: int | None = None) -> list[dict]:
    """Schema drift between two versions of a TxTable, from the
    manifests alone — no data scan.  Returns a list of
    ``{"column", "change", "old_type", "new_type"}`` dicts
    (change ∈ added / removed / retyped), empty when identical.

    This is the audit view of the commit-time evolution rules: adds are
    legal (history null-fills), retypes are refused at commit — so a
    ``retyped`` row here means the rules were bypassed out-of-band and
    the table needs `verify()`.
    """
    # manifest() raises VersionNotFoundError itself for missing/vacuumed
    # versions — no need to re-wrap
    old_man = table.manifest(since_version)
    new_man = table.manifest(version)
    old = {f.name: f.dataType.simpleString() for f in table._manifest_schema(old_man).fields}
    new = {f.name: f.dataType.simpleString() for f in table._manifest_schema(new_man).fields}
    renames = new_man.get("column_renames", {})
    renamed_from = {}  # new name -> the prior name it left in `old`
    for c, priors in renames.items():
        if c in new and c not in old:
            src = next((p for p in priors if p in old and p not in new), None)
            if src is not None:
                renamed_from[c] = src
    consumed = set(renamed_from.values())
    out = []
    for c in sorted(set(old) | set(new)):
        if c in renamed_from:
            out.append({"column": c, "change": f"renamed from {renamed_from[c]}",
                        "old_type": old[renamed_from[c]], "new_type": new[c]})
        elif c in consumed:
            continue  # reported as the rename, not a remove
        elif c not in new:
            out.append({"column": c, "change": "removed", "old_type": old[c], "new_type": None})
        elif c not in old:
            out.append({"column": c, "change": "added", "old_type": None, "new_type": new[c]})
        elif old[c] != new[c]:
            out.append({"column": c, "change": "retyped", "old_type": old[c], "new_type": new[c]})
    return out


def table_history(table) -> list[dict]:
    """Per-version audit log from the manifests (no data scan):
    version, run_id, commit ``kind`` (append = closed dirs grew with
    the current set untouched; merge/snapshot = the current dir was
    replaced; compaction = closed dirs replaced by a lineage-recorded
    dir; restore = a ``restored_from`` rollback; rename = the
    column-rename map moved), closed-dir count, and
    schema column count — the `DESCRIBE HISTORY` twin for a TxTable."""
    out = []
    prev_closed: set[str] = set()
    prev_current = None
    prev_renames: dict = {}
    for v in table.versions():
        man = table.manifest(v)
        closed = set(man.get("closed", []))
        added = closed - prev_closed
        removed = prev_closed - closed
        current = man.get("current")
        if man.get("restored_from") is not None:
            # a restore publishes the TARGET's dirs under a new version:
            # closed may shrink with nothing added and current may
            # revert — every structural heuristic below misreads it, so
            # the explicit provenance field decides first
            kind = "restore"
        elif man.get("column_renames", {}) != prev_renames:
            # a rename commit is metadata-only: dirs untouched, only the
            # schema + rename map move (checked after restore — a restore
            # across a rename boundary changes the map too)
            kind = "rename"
        elif prev_current is None or current == prev_current:
            # current untouched: an append only grows the closed list; a
            # compaction REPLACES closed dirs with a new dir recorded in
            # compacted_lineage (closed=[compacted] is not a subset of
            # prev_closed, so subset tests misfire — check lineage instead)
            if removed and any(d in man.get("compacted_lineage", {}) for d in added):
                kind = "compaction"
            else:
                kind = "append"
        else:
            # the current set was replaced: a merge also appends its
            # closed delta (and never drops history); a snapshot resets
            # closed to [] — which is a strict SUBSET of prev_closed, so
            # it must be classified here, not as a compaction
            kind = "merge" if added and not removed else "snapshot"
        prev_current = current
        out.append(
            {
                "version": v,
                "run_id": man.get("run_id"),
                "kind": kind,
                "new_closed_dirs": len(added),
                "total_closed_dirs": len(closed),
                "n_columns": len(table._manifest_schema(man).fields),
                "extra": {
                    k: man[k]
                    for k in man
                    if k not in ("version", "run_id", "closed", "current", "schema",
                                 "dir_schemas", "stats", "compacted_lineage")
                },
            }
        )
        prev_closed = closed
        prev_renames = man.get("column_renames", {})
    return out
