"""Scale machinery: bucketed joins are exchange-free, salted joins are
semantics-preserving, date partitioning prunes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.operators.scale import (
    salted_join,
    write_bucketed,
    write_date_partitioned,
)
from nlu_data_warehouse_project_spark.plans import formatted_plan, shuffle_count


# managed-table warehouse dir is set (statically) in conftest's session
@pytest.fixture(scope="module")
def warehouse_conf(spark):
    return spark.conf.get("spark.sql.warehouse.dir")


def test_bucketed_join_has_no_exchange(spark, sf_smoke, warehouse_conf):
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
    assert shuffle_count(joined) == 0, formatted_plan(joined)[:500]
    # and it still returns the right number of rows
    plain = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
    assert joined.count() == plain.count()


def test_bucketed_aggregation_has_no_exchange(spark, sf_smoke, warehouse_conf):
    write_bucketed(
        spark.read.parquet(f"{sf_smoke}/orders.parquet"), "orders_b2", ["o_custkey"], 8
    )
    agg = spark.table("orders_b2").groupBy("o_custkey").agg(F.count("*").alias("n"))
    assert shuffle_count(agg) == 0


def test_salted_join_preserves_semantics(spark, sf_smoke):
    # skewed fact: every lineitem of one hot order plus normal tail
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").limit(2000)
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").select("o_orderkey", "o_totalprice")
    li2 = li.withColumnRenamed("l_orderkey", "o_orderkey")

    plain = li2.join(orders, "o_orderkey")
    salted = salted_join(li2, orders, "o_orderkey", salt_buckets=4)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.select("o_orderkey", "l_linenumber", "o_totalprice").collect()}
    b = {tuple(r) for r in salted.select("o_orderkey", "l_linenumber", "o_totalprice").collect()}
    assert a == b


def test_salted_join_left_and_guard(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").limit(500)
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").select("o_orderkey", "o_totalprice")
    li2 = li.withColumnRenamed("l_orderkey", "o_orderkey")

    plain = li2.join(orders, "o_orderkey", "left")
    salted = salted_join(li2, orders, "o_orderkey", salt_buckets=4, how="left")
    assert salted.count() == plain.count()

    # replicating the right side per salt breaks right/full/semi/anti
    for bad in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(li2, orders, "o_orderkey", how=bad)


def test_date_partitioned_scan_prunes(spark, sf_smoke, tmp_path):
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").withColumn(
        "order_date", F.col("o_orderdate").cast("date")
    )
    path = str(tmp_path / "orders_by_date")
    write_date_partitioned(orders.filter(F.year("order_date") == 1995), path, "order_date")
    scan = spark.read.parquet(path).filter(F.col("order_date") == "1995-03-15")
    plan = formatted_plan(scan)
    # partition filter present and non-empty
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert pf.strip(), "partition filter did not reach the scan"


def test_zorder_layout_tightens_per_file_ranges_on_both_columns(spark, tmp_path, sf_smoke):
    """The point of the z-curve: per-file min/max ranges shrink on BOTH
    interleaved columns, where a linear sort helps only its own column
    and a hash layout helps neither."""
    from nlu_data_warehouse_project_spark.operators.scale import write_zordered

    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").select("l_partkey", "l_suppkey")
    naive = str(tmp_path / "naive")
    zpath = str(tmp_path / "zorder")
    li.repartition(8).write.parquet(naive)
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=8)

    def avg_range(path, col):
        df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
        rows = df.groupBy("__f").agg((F.max(col) - F.min(col)).alias("w")).collect()
        return sum(r["w"] for r in rows) / len(rows)

    for col in ("l_partkey", "l_suppkey"):
        zr, nr = avg_range(zpath, col), avg_range(naive, col)
        # hash files span ~the full key range; z-curve files cover a
        # fraction of it on every dimension at once
        assert zr < 0.6 * nr, f"{col}: zorder {zr} vs naive {nr}"

    # layout is a rewrite, not a transform: same rows
    assert spark.read.parquet(zpath).count() == li.count()


def test_zorder_rejects_bad_arity(spark):
    from nlu_data_warehouse_project_spark.operators.scale import zorder_value

    import pytest as _pytest
    with _pytest.raises(ValueError):
        zorder_value(["a"], [0], [1])
    with _pytest.raises(ValueError):
        zorder_value(["a", "b"], [0], [1, 2])


def _rank_fixture(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id") * 37 + 11, F.lit(997)).alias("v"),  # dup values: ties
    )


def test_exact_global_rank_matches_window_row_number(spark):
    """exact_global_rank == the single-partition window row_number on
    the same total order — across asc/desc, ties, and more partitions
    than the data strictly needs (empty range partitions)."""
    from pyspark.sql import Window

    from nlu_data_warehouse_project_spark.operators.scale import exact_global_rank

    df = _rank_fixture(spark)
    for order, wspec in (
        ([F.col("v").asc(), F.col("k").asc()],
         Window.orderBy(F.col("v").asc(), F.col("k").asc())),
        ([F.col("v").desc(), F.col("k").asc()],
         Window.orderBy(F.col("v").desc(), F.col("k").asc())),
    ):
        ref = {r["k"]: r["r"] for r in
               df.select("k", F.row_number().over(wspec).alias("r")).collect()}
        got = {r["k"]: r["rank"] for r in
               exact_global_rank(df, order, num_partitions=8).collect()}
        assert got == ref
    # more partitions than rows: empty partitions must not shift offsets
    tiny = _rank_fixture(spark, n=5)
    got = {r["k"]: r["rank"] for r in exact_global_rank(
        tiny, [F.col("v").asc(), F.col("k").asc()], num_partitions=16).collect()}
    ref = {r["k"]: r["r"] for r in tiny.select(
        "k", F.row_number().over(Window.orderBy(F.col("v").asc(), F.col("k").asc())).alias("r")
    ).collect()}
    assert got == ref


def test_exact_global_ntile_matches_window_ntile(spark):
    """The closed-form bucket assignment reproduces SQL ntile's
    ceil/floor split exactly, including B that doesn't divide N and
    N < B."""
    from pyspark.sql import Window

    from nlu_data_warehouse_project_spark.operators.scale import exact_global_ntile

    w = Window.orderBy(F.col("v").asc(), F.col("k").asc())
    order = [F.col("v").asc(), F.col("k").asc()]
    for n, b in ((1000, 7), (1000, 10), (10, 4), (3, 8)):
        df = _rank_fixture(spark, n=n)
        ref = {r["k"]: r["b"] for r in df.select("k", F.ntile(b).over(w).alias("b")).collect()}
        got = {r["k"]: r["bucket"] for r in
               exact_global_ntile(df, order, b, num_partitions=6).collect()}
        assert got == ref, (n, b)


def test_exact_prefix_sum_matches_window_and_keeps_decimal(spark):
    from pyspark.sql import Window

    from nlu_data_warehouse_project_spark.operators.scale import exact_prefix_sum

    df = _rank_fixture(spark).withColumn("d", F.col("v").cast("decimal(25,6)"))
    w = Window.orderBy(F.col("v").desc(), F.col("k").asc())
    ref = {r["k"]: (r["c"], r["r"]) for r in df.select(
        "k",
        F.sum("d").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("c"),
        F.row_number().over(w).alias("r"),
    ).collect()}
    out = exact_prefix_sum(
        df, [F.col("v").desc(), F.col("k").asc()], "d",
        cum_col="c", rank_col="r", num_partitions=5,
    )
    got = {r["k"]: (r["c"], r["r"]) for r in out.collect()}
    assert got == ref
    # DECIMAL survives: no silent drift to (38,18) or double
    assert dict(out.dtypes)["c"].startswith("decimal"), out.dtypes


def test_exact_prefix_agg_max_min_exclusive(spark):
    """Prefix max/min (inclusive and exclusive) match the window
    reference, across partition boundaries and the NULL-for-first-row
    exclusive edge."""
    from pyspark.sql import Window

    from nlu_data_warehouse_project_spark.operators.scale import exact_prefix_agg

    df = _rank_fixture(spark, n=500)
    order = [F.col("k").asc()]
    w = Window.orderBy(F.col("k").asc())
    ref = {r["k"]: (r["mx"], r["mn"], r["xmx"]) for r in df.select(
        "k",
        F.max("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("mx"),
        F.min("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("mn"),
        F.max("v").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias("xmx"),
    ).collect()}
    mx = {r["k"]: r["c"] for r in exact_prefix_agg(
        df, order, "v", how="max", cum_col="c", num_partitions=7).collect()}
    mn = {r["k"]: r["c"] for r in exact_prefix_agg(
        df, order, "v", how="min", cum_col="c", num_partitions=7).collect()}
    xmx = {r["k"]: r["c"] for r in exact_prefix_agg(
        df, order, "v", how="max", cum_col="c", num_partitions=7,
        exclusive=True).collect()}
    assert all(ref[k][0] == mx[k] for k in ref)
    assert all(ref[k][1] == mn[k] for k in ref)
    assert xmx[0] is None and all(ref[k][2] == xmx[k] for k in ref)


def test_exact_global_ntile_rejects_bad_bucket_count(spark):
    """ADVICE r9: n_buckets < 1 must raise upfront, not surface as a
    division-by-zero inside generated SQL at execution time."""
    from nlu_data_warehouse_project_spark.operators.scale import exact_global_ntile

    df = spark.range(5).withColumnRenamed("id", "v")
    for bad in (0, -3):
        with pytest.raises(ValueError, match="n_buckets"):
            exact_global_ntile(df, ["v"], bad)


def test_pin_frame_reliable_checkpoint_survives_block_loss(spark, tmp_path):
    """VERDICT r9 #1: with a checkpoint dir configured, the iterative
    family's pin is a RELIABLE checkpoint — data lives in checkpoint
    files, so nuking every executor-local block (the local[n] stand-in
    for losing an executor) leaves the frame recomputable with the
    same result.  Also pins: reliable=True without a dir fails fast,
    and auto mode (reliable=None) upgrades when the dir is set."""
    from nlu_data_warehouse_project_spark.operators.clusters import neardup_clusters
    from nlu_data_warehouse_project_spark.operators.graph import bfs_hops
    from nlu_data_warehouse_project_spark.operators.scale import (
        exact_global_rank,
        pin_frame,
    )

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    with pytest.raises(ValueError, match="checkpoint dir"):
        pin_frame(spark.range(3), reliable=True)

    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        df = spark.range(500).withColumn("v", F.pmod(F.col("id"), F.lit(7)))
        r = exact_global_rank(df, ["v", "id"], reliable=True, num_partitions=8)
        expected = [
            (row["id"], i + 1)
            for i, row in enumerate(
                sorted(df.collect(), key=lambda x: (x["v"], x["id"]))
            )
        ]
        assert sorted((x["id"], x["rank"]) for x in r.collect()) == sorted(expected)
        # files actually landed under the configured dir
        assert any(p.is_file() for p in (tmp_path / "ckpt").rglob("*"))
        # kill every block-manager entry; the checkpointed frame must
        # re-read its FILES, not depend on executor-local blocks
        for rdd in sc._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)
        assert sorted((x["id"], x["rank"]) for x in r.collect()) == sorted(expected)

        # auto mode: BFS + CC run reliably end-to-end with the dir set
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
        )
        cc = {
            (row["node"], row["cluster_id"])
            for row in neardup_clusters(pairs).collect()
        }
        assert cc == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "src long, dst long"
        )
        hops = {
            (row["node"], row["hops"])
            for row in bfs_hops(edges, 1, max_hops=2).collect()
        }
        assert hops == {(1, 0), (2, 1), (3, 2)}
    finally:
        # unset so later tests in this JVM keep the local-pin default
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(spark._jvm.scala.Option.apply(None))
        assert sc.getCheckpointDir() is None


def test_exact_global_ntiles_matches_chained_window_ntiles(spark):
    """VERDICT r9 #4: the single-pass multi-ntile must agree with the
    engine-native window ntile on every spec, including desc orders,
    B > N (empty tail buckets) and B = 1."""
    from pyspark.sql import Window

    from nlu_data_warehouse_project_spark.operators.scale import exact_global_ntiles

    rows = [(i, (i * 37) % 11, float((i * 13) % 7)) for i in range(53)]
    df = spark.createDataFrame(rows, "id long, a int, b double")
    got = exact_global_ntiles(
        df,
        [
            ([("a", "asc"), ("id", "asc")], 4, "na"),
            ([("b", "desc"), ("id", "asc")], 5, "nb"),
            ([("id", "desc")], 60, "big"),  # B > N
            ([("a", "asc"), ("id", "asc")], 1, "one"),
        ],
        num_partitions=4,
    )
    ref = (
        df.withColumn("na", F.ntile(4).over(Window.orderBy(F.asc("a"), F.asc("id"))))
        .withColumn("nb", F.ntile(5).over(Window.orderBy(F.desc("b"), F.asc("id"))))
        .withColumn("big", F.ntile(60).over(Window.orderBy(F.desc("id"))))
        .withColumn("one", F.lit(1))
    )
    key = lambda r: (r["id"], r["na"], r["nb"], r["big"], r["one"])
    assert sorted(map(key, got.collect())) == sorted(map(key, ref.collect()))


def test_exact_global_ntiles_single_materialization(spark):
    """The input frame appears exactly once as a pinned scan in the
    final plan — no per-spec shuffle of the full frame."""
    from nlu_data_warehouse_project_spark.operators.scale import exact_global_ntiles

    df = spark.range(100).withColumn("v", F.pmod(F.col("id"), F.lit(9)))
    out = exact_global_ntiles(df, [([("v", "asc"), ("id", "asc")], 4, "q")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # assignment is scan-local: no Exchange in the consuming plan
    assert "Exchange" not in plan, plan


def test_zorder_partition_by_clusters_within_each_partition(spark, tmp_path):
    """VERDICT r11 #5: write_zordered(partition_by=) makes the 'per
    date partition at 100 TB' advice executable — hive dirs per
    partition value, per-PARTITION min/max (day2's x range is offset
    +100000, so a global span would level both days' values into a few
    coarse cells and de-cluster day1 entirely), and per-file ranges
    narrow on BOTH z columns within EVERY partition dir."""
    from nlu_data_warehouse_project_spark.operators.scale import write_zordered

    rows = []
    for day, off in (("2024-01-01", 0), ("2024-01-02", 100000)):
        rows += [
            (day, off + (i * 29) % 64, (i * 37) % 64, i) for i in range(2048)
        ]
    df = spark.createDataFrame(rows, "day string, x long, y long, id long")
    zpath = str(tmp_path / "zp")
    write_zordered(df, zpath, ["x", "y"], n_files=16, bits=6, partition_by="day")

    import os

    dirs = sorted(d for d in os.listdir(zpath) if d.startswith("day="))
    assert dirs == ["day=2024-01-01", "day=2024-01-02"]

    back = spark.read.parquet(zpath)
    assert back.count() == len(rows)

    def per_file_avg_range(day, col):
        part = spark.read.parquet(f"{zpath}/day={day}").withColumn(
            "__f", F.input_file_name()
        )
        got = part.groupBy("__f").agg((F.max(col) - F.min(col)).alias("w")).collect()
        return sum(r["w"] for r in got) / len(got), len(got)

    for day in ("2024-01-01", "2024-01-02"):
        for col in ("x", "y"):
            avg_w, n_files = per_file_avg_range(day, col)
            # full span per day is 63; clustered files must cover a
            # fraction of it on BOTH dimensions
            assert n_files > 1
            assert avg_w < 0.6 * 63, f"{day}/{col}: avg per-file range {avg_w}"

    # guardrails: overlap with partition cols refused; arity enforced
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already pruned"):
        write_zordered(df, str(tmp_path / "zz"), ["day", "x"], partition_by="day")
    with _pytest.raises(ValueError, match="2-3 columns"):
        write_zordered(df, str(tmp_path / "zz"), ["x"], partition_by="day")


def test_zorder_partition_by_null_partition_value_survives(spark, tmp_path):
    """A NULL partition value is a legal hive partition
    (__HIVE_DEFAULT_PARTITION__): the per-partition bounds join is
    null-safe, so those rows neither vanish nor crash the leveling."""
    from nlu_data_warehouse_project_spark.operators.scale import write_zordered

    rows = [("d1", i % 50, (i * 7) % 50, i) for i in range(400)]
    rows += [(None, i % 50, (i * 7) % 50, 1000 + i) for i in range(100)]
    df = spark.createDataFrame(rows, "day string, x long, y long, id long")
    zpath = str(tmp_path / "zn")
    write_zordered(df, zpath, ["x", "y"], n_files=4, bits=4, partition_by="day")

    back = spark.read.parquet(zpath)
    assert back.count() == 500
    # hive writes NULL as the default-partition dir; reads restore NULL
    assert back.filter(F.col("day").isNull()).count() == 100
    assert back.filter(F.col("day") == "d1").count() == 400
