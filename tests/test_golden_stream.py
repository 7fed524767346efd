"""Streaming golden-record sidecar (round 16): after any number of
micro-batches the standing labels table equals the FULL-BATCH entity
resolution over every document ever ingested — the star identity
composing inductively — and both tables are replay-safe."""

from __future__ import annotations

import pytest

from nlu_data_warehouse_project_spark.sources.txlog import TxTable
from nlu_data_warehouse_project_spark.streaming import make_golden_record_processor

SCHEMA = "doc_id long, title string"

BATCHES = [
    [(1, "acme global"), (2, "acme global"), (3, "north star trading")],
    [(7, "pacific freight"), (8, "pacific freight co")],
    # doc 12 bridges the acme cluster and the pacific cluster
    [(12, "acme global pacific freight"), (13, "unrelated solo entry")],
]


def _batch_recompute(spark, rows):
    from nlu_data_warehouse_project_spark.operators.clusters import neardup_clusters
    from nlu_data_warehouse_project_spark.operators.fuzzy import token_blocked_pairs

    docs = spark.createDataFrame(rows, SCHEMA)
    pairs = token_blocked_pairs(docs, "title", "doc_id", threshold=0.5)
    if not pairs.take(1):
        return {}
    return {
        r["node"]: r["cluster_id"]
        for r in neardup_clusters(pairs, id_a="a_id", id_b="b_id").collect()
    }


def test_stream_equals_batch_after_every_micro_batch(spark, tmp_path):
    docs = TxTable(spark, str(tmp_path / "docs"))
    labels = TxTable(spark, str(tmp_path / "labels"))
    process = make_golden_record_processor(docs, labels)

    seen: list = []
    for bid, rows in enumerate(BATCHES):
        process(spark.createDataFrame(rows, SCHEMA), bid)
        seen += rows
        got = {r["node"]: r["cluster_id"] for r in labels.read().collect()}
        assert got == _batch_recompute(spark, seen), f"batch {bid}"
    # the bridge fused both standing clusters under the global min
    final = {r["node"]: r["cluster_id"] for r in labels.read().collect()}
    assert final[12] == 1 and final[7] == 1 and final[8] == 1
    # docs table accumulated every batch, append-only
    assert sorted(r["doc_id"] for r in docs.read().collect()) == sorted(
        i for i, _t in seen
    )


def test_replay_and_fresh_checkpoint_guard(spark, tmp_path):
    docs = TxTable(spark, str(tmp_path / "docs"))
    labels = TxTable(spark, str(tmp_path / "labels"))
    process = make_golden_record_processor(docs, labels)

    for bid, rows in enumerate(BATCHES[:2]):
        process(spark.createDataFrame(rows, SCHEMA), bid)
    dv, lv = docs.latest_version(), labels.latest_version()
    # crash-replay of the LAST batch id: full no-op on both tables
    process(spark.createDataFrame(BATCHES[1], SCHEMA), 1)
    assert (docs.latest_version(), labels.latest_version()) == (dv, lv)
    # a fresh checkpoint pointed at the standing tables is loud
    with pytest.raises(ValueError, match="fresh checkpoint"):
        process(spark.createDataFrame(BATCHES[0], SCHEMA), 0)


def test_cm_sketch_sidecar_equals_batch(spark, tmp_path):
    """Streaming CM sidecar: after every micro-batch the stored sketch
    equals the from-scratch batch sketch over everything ever seen
    (counter linearity), and point estimates agree bit-for-bit."""
    from nlu_data_warehouse_project_spark.operators.sketches import (
        cm_estimate, cm_sketch,
    )
    from nlu_data_warehouse_project_spark.streaming import make_cm_sketch_processor

    sk = TxTable(spark, str(tmp_path / "cm"))
    process = make_cm_sketch_processor(sk, "v", width=16, depth=3)
    batches = [[1, 1, 2, 5], [2, 2, 2, 9], [1, 9, 9, 40]]
    seen: list = []
    for bid, vals in enumerate(batches):
        process(spark.createDataFrame([(v,) for v in vals], "v long"), bid)
        seen += vals
        stored = {(r["row"], r["bucket"]): r["cnt"] for r in sk.read().collect()}
        scratch = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cm_sketch(
                spark.createDataFrame([(v,) for v in seen], "v long"),
                "v", width=16, depth=3,
            ).collect()
        }
        assert stored == scratch, f"batch {bid}"
    keys = spark.createDataFrame([(1,), (2,), (9,)], "v long")
    est = {r["v"]: r["cm_est"]
           for r in cm_estimate(sk.read(), keys, "v", 16, 3).collect()}
    assert est[1] >= 3 and est[2] >= 4 and est[9] >= 3
    # replay no-op
    v = sk.latest_version()
    process(spark.createDataFrame([(1,)], "v long"), 2)
    assert sk.latest_version() == v


def test_indexed_sidecar_equals_batch_and_maintains_index(spark, tmp_path):
    """With freq/prefix TxTables attached, the sidecar probes the
    PERSISTED index (frozen first-batch token order, per-batch key
    appends) and still equals the full-batch recompute after every
    micro-batch — including tokens outside the frozen vocabulary
    (batch 3's 'unrelated solo entry') and the cross-batch bridge."""
    docs = TxTable(spark, str(tmp_path / "docs"))
    labels = TxTable(spark, str(tmp_path / "labels"))
    freq = TxTable(spark, str(tmp_path / "freq"))
    prefix = TxTable(spark, str(tmp_path / "prefix"))
    process = make_golden_record_processor(
        docs, labels, freq=freq, prefix=prefix
    )

    seen: list = []
    for bid, rows in enumerate(BATCHES):
        process(spark.createDataFrame(rows, SCHEMA), bid)
        seen += rows
        got = {r["node"]: r["cluster_id"] for r in labels.read().collect()}
        assert got == _batch_recompute(spark, seen), f"batch {bid}"
    # frozen order: freq committed exactly once, at epoch start
    assert freq.latest_version() == 1
    # prefix index grew per batch (one append each)
    assert prefix.latest_version() == len(BATCHES)
    ids_in_index = {r["__id_r"] for r in prefix.read().collect()}
    assert ids_in_index == {i for i, _t in seen}
    # replay is a no-op on every table
    vs = (docs.latest_version(), labels.latest_version(),
          freq.latest_version(), prefix.latest_version())
    process(spark.createDataFrame(BATCHES[-1], SCHEMA), len(BATCHES) - 1)
    assert vs == (docs.latest_version(), labels.latest_version(),
                  freq.latest_version(), prefix.latest_version())

    import pytest as _pt
    with _pt.raises(ValueError, match="BOTH freq and prefix"):
        make_golden_record_processor(docs, labels, freq=freq)


def test_hll_sidecar_equals_batch(spark, tmp_path):
    """Streaming HLL sidecar: after every micro-batch the stored
    register frame equals the from-scratch batch registers over
    everything ever seen (max associativity), and the estimate
    matches bit-for-bit."""
    from nlu_data_warehouse_project_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from nlu_data_warehouse_project_spark.streaming import (
        make_hll_distinct_processor,
    )

    sk = TxTable(spark, str(tmp_path / "hll"))
    process = make_hll_distinct_processor(sk, "g", "v", p=6)
    batches = [
        [("a", f"x{i}") for i in range(50)],
        [("a", f"x{i}") for i in range(25, 75)] + [("b", "y0")],
        [("b", f"y{i}") for i in range(200)],
    ]
    seen: list = []
    for bid, rows in enumerate(batches):
        process(spark.createDataFrame(rows, "g string, v string"), bid)
        seen += rows
        stored = sorted(map(tuple, sk.read().collect()))
        scratch = sorted(map(tuple, hll_registers(
            spark.createDataFrame(seen, "g string, v string"), "v", ["g"], p=6
        ).collect()))
        assert stored == scratch, f"batch {bid}"
    est = {
        r["g"]: r["hll_estimate"]
        for r in hll_estimate(sk.read(), ["g"], p=6).collect()
    }
    want = {
        r["g"]: r["hll_estimate"]
        for r in hll_estimate(hll_registers(
            spark.createDataFrame(seen, "g string, v string"), "v", ["g"], p=6
        ), ["g"], p=6).collect()
    }
    assert est == want
    # replay no-op
    v = sk.latest_version()
    process(spark.createDataFrame([("a", "zz")], "g string, v string"), 2)
    assert sk.latest_version() == v
