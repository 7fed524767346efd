"""Model-based fuzz of TxTable: random commit/rename/restore/compact/
vacuum sequences checked against a pure-Python model of what every
retained version must read back (rows AND column names).  This is the
layer where round-8's bugs lived (restore across rename, snapshot
carrying a dead rename map), so the fuzzer biases toward those
interactions."""

from __future__ import annotations

import random

import pytest

from nlu_data_warehouse_project_spark.sources.txlog import (
    SchemaEvolutionError,
    TxTable,
)


_NONE_SAFE = lambda tup: tuple((v is None, v) for v in tup)  # noqa: E731


def _read_rows(t: TxTable, version=None):
    df = t.read(version)
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return sorted(rows, key=_NONE_SAFE), cols


def _model_rows(rows, cols):
    out = [tuple(r.get(c) for c in sorted(cols)) for r in rows]
    return sorted(out, key=_NONE_SAFE), sorted(cols)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_txtable_random_op_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = TxTable(spark, str(tmp_path / f"t{seed}"))

    next_id = [0]

    def fresh_rows(n, cols):
        rows = []
        for _ in range(n):
            next_id[0] += 1
            r = {"id": next_id[0]}
            for c in cols:
                if c != "id":
                    r[c] = f"{c}{next_id[0]}"
            rows.append(r)
        return rows

    def df_of(rows, cols):
        ordered = ["id"] + sorted(c for c in cols if c != "id")
        schema = ", ".join(f"{c} long" if c == "id" else f"{c} string" for c in ordered)
        return spark.createDataFrame(
            [tuple(r.get(c) for c in ordered) for r in rows], schema
        )

    # model: version -> {"rows": [dict], "cols": set}; retained = readable
    model: dict[int, dict] = {}
    cols: set = {"id", "val"}
    retired: set = set()      # column names renamed away while history needs them
    live = 0

    def commit_append():
        nonlocal live
        rows = fresh_rows(rng.randint(1, 3), cols)
        live = t.commit_append(df_of(rows, cols), f"a{live}")
        prev = model.get(live - 1, {"rows": [], "cols": cols})
        model[live] = {"rows": prev["rows"] + rows, "cols": set(cols)}

    def commit_snapshot():
        nonlocal live, retired
        rows = fresh_rows(rng.randint(1, 3), cols)
        live = t.commit_snapshot(df_of(rows, cols), f"s{live}")
        model[live] = {"rows": rows, "cols": set(cols)}
        retired = set()  # snapshot retires the rename map

    def add_column():
        nonlocal live
        new = f"c{live}"
        if new in cols or new in retired:
            return
        cols.add(new)
        commit_append()

    def rename_column():
        nonlocal live, cols, retired
        candidates = sorted(c for c in cols if c != "id")
        if not candidates:
            return
        old = rng.choice(candidates)
        new = f"r{live}"
        live = t.rename_column(old, new)
        cols = (cols - {old}) | {new}
        retired = retired | {old}
        prev = model[live - 1]
        model[live] = {
            "rows": [
                {(new if k == old else k): v for k, v in r.items()}
                for r in prev["rows"]
            ],
            "cols": set(cols),
        }

    def restore():
        nonlocal live, cols, retired
        if len(model) < 2:
            return
        target = rng.choice(sorted(model))
        live = t.restore(target)
        model[live] = {
            "rows": list(model[target]["rows"]),
            "cols": set(model[target]["cols"]),
        }
        cols = set(model[target]["cols"])
        # the restored manifest carries the TARGET's map; approximate
        # the retired set conservatively as "names not in any live cols"
        retired = {c for c in retired if c not in cols}

    def compact():
        nonlocal live
        v = t.compact_closed(min_dirs=2)
        if v is not None:
            live = v
            model[live] = {
                "rows": list(model[live - 1]["rows"]),
                "cols": set(model[live - 1]["cols"]),
            }

    def vacuum():
        keep = rng.randint(1, 3)
        t.vacuum(retain_last=keep)
        for v in sorted(model)[:-keep]:
            model.pop(v, None)

    commit_append()  # ensure a first version
    ops = [commit_append, commit_append, commit_snapshot, add_column,
           rename_column, restore, compact, vacuum]
    for _ in range(12):
        op = rng.choice(ops)
        try:
            op()
        except SchemaEvolutionError:
            # legal refusal: a generated schema reused a renamed-away
            # name; the table must be unchanged — verified below
            pass
        got_rows, got_cols = _read_rows(t)
        want_rows, want_cols = _model_rows(model[live]["rows"], model[live]["cols"])
        assert got_cols == want_cols, (op.__name__, got_cols, want_cols)
        assert got_rows == want_rows, (op.__name__,)

    # every retained version time-travels to its model state
    for v in t.versions():
        if v in model:
            got_rows, got_cols = _read_rows(t, v)
            want_rows, want_cols = _model_rows(model[v]["rows"], model[v]["cols"])
            assert got_cols == want_cols, (v, got_cols, want_cols)
            assert got_rows == want_rows, (v,)
    assert t.verify()["ok"]


@pytest.mark.parametrize("seed", [7, 8])
def test_version_as_of_matches_model_under_random_ops(spark, tmp_path, seed):
    """Time-travel fuzz: a counting clock stamps every commit; after a
    random op sequence, version_as_of(ts) must return the LARGEST
    retained version whose stamp <= ts for every ts in range, and
    raise below the earliest retained stamp.  Vacuum prunes both the
    version and its stamp from reachability."""
    from nlu_data_warehouse_project_spark.sources.txlog import VersionNotFoundError

    rng = random.Random(seed)
    tick = [0.0]

    def clock():
        tick[0] += 10.0
        return tick[0]

    t = TxTable(spark, str(tmp_path / f"tt{seed}"), clock=clock)
    stamps: dict[int, float] = {}

    def do_commit():
        df = spark.createDataFrame([(rng.randint(0, 99),)], "id long")
        if rng.random() < 0.3:
            v = t.commit_snapshot(df, f"s{len(stamps)}")
        else:
            v = t.commit_append(df, f"a{len(stamps)}")
        stamps[v] = t.manifest(v)["committed_at"]

    def do_restore():
        if len(stamps) >= 2:
            v = t.restore(rng.choice(sorted(stamps)))
            stamps[v] = t.manifest(v)["committed_at"]

    def do_vacuum():
        t.vacuum(retain_last=rng.randint(1, 3))
        kept = set(t.versions())
        for v in list(stamps):
            if v not in kept:
                del stamps[v]

    do_commit()
    for _ in range(10):
        rng.choice([do_commit, do_commit, do_restore, do_vacuum])()

    # stamps strictly increase with version (counting clock)
    ordered = sorted(stamps)
    assert all(stamps[a] < stamps[b] for a, b in zip(ordered, ordered[1:]))

    lo = min(stamps.values())
    for ts in [lo - 5.0] + [s + d for s in stamps.values() for d in (0.0, 1.0)]:
        want = max((v for v, s in stamps.items() if s <= ts), default=None)
        if want is None:
            with pytest.raises(VersionNotFoundError):
                t.version_as_of(ts)
        else:
            assert t.version_as_of(ts) == want, (ts, want)
