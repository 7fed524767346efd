"""Generic keyed upsert (SURVEY.md §2.3 J6 generalized).

The reference point-updates control rows with ``UPDATE ... WHERE id =``
(`load_to_staging.py:248-285`).  Parquet is immutable, so upsert =
anti-join out the matched keys, union the updates, overwrite — MERGE
semantics without a transaction log.  For control-plane-sized and
dimension-sized tables this rewrite is exact and cheap; the gold SCD2
table gets real transactional commits from the TxTable manifest log
(`sources/txlog.py`), whose merge appends closed deltas instead of
rewriting, so this full-rewrite upsert is never on the big-table path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE: rows of ``target`` whose key appears in ``updates`` are
    replaced; new keys are inserted.  Column sets must match."""
    missing = set(target.columns) ^ set(updates.columns)
    if missing:
        raise ValueError(f"upsert requires identical columns; mismatched: {sorted(missing)}")
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates.select(*target.columns))


def delete_where(target: DataFrame, predicate) -> DataFrame:
    """DELETE: rewrite without the matching rows."""
    return target.filter(~predicate)
