"""Plan-quality regression tests (SURVEY.md §4): these pin the
*physical* properties that keep the engine fast at 100 TB — predicate
pushdown into the parquet scan, column pruning, broadcast joins for
dimensions, bounded shuffle counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.plans import (
    has_pushed_filters,
    python_udf_count,
    scan_read_schema,
    shuffle_count,
    uses_broadcast_join,
)
from nlu_data_warehouse_project_spark.queries import QUERIES


def test_filter_pushdown_reaches_scan(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1998-09-02").select("l_quantity")
    assert has_pushed_filters(q)


def test_column_pruning(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    q = li.select("l_returnflag", "l_quantity")
    cols = scan_read_schema(q)
    assert set(cols) == {"l_returnflag", "l_quantity"}, cols


def test_flagship_query_plan_quality(spark, sf_smoke):
    q = QUERIES["q01_pricing_summary"](spark, sf_smoke)
    assert has_pushed_filters(q)          # the shipdate filter reaches the scan
    read = set(scan_read_schema(q))
    assert "l_orderkey" not in read       # unused columns pruned
    # the widen repartition (r17: parallelize map-side decimal work out
    # of a single-row-group scan; keyed on a column the aggregate
    # already reads) plus the groupBy exchange — and nothing else
    assert shuffle_count(q) == 2
    assert python_udf_count(q) == 0       # fully JVM-side


def test_relational_queries_have_no_python_in_hot_path(spark, sf_smoke):
    # every relational operator must stay JVM-side; only the multimodal
    # mapInPandas operators are allowed Python in the plan
    for name in ("q02_control_join", "q07_dedup_keep_first", "q08_scd2_merge",
                 "q16_minhash_neardup", "q18_cosine_topk", "q21_sessionize",
                 "q22_asof_join", "q26_simhash", "q31_range_join",
                 "q42_salted_join", "q44_deterministic_split",
                 "q46_stratified_sample", "q48_redact_pii", "q49_chunk_text",
                 "q64_lsh_bucket_stats", "q65_session_windows",
                 "q66_incremental_embedding_dedup", "q67_cap_per_source",
                 "q68_rebalance_sources", "q72_gopher_rules",
                 "q73_top_ngrams_per_source", "q74_embedding_health",
                 "q75_pack_sequences", "q76_dup_ngram_fraction"):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"


def test_scan_local_ops_have_no_shuffle(spark, sf_smoke):
    # redaction and chunking are per-row transforms: any exchange in
    # their plan is a regression
    for name in ("q48_redact_pii", "q49_chunk_text", "q72_gopher_rules"):
        q = QUERIES[name](spark, sf_smoke)
        assert shuffle_count(q) == 0, f"{name} grew a shuffle"


def test_dim_joins_broadcast(spark, sf_smoke):
    for name in ("q02_control_join", "q05_date_surrogate", "q10_mart_revenue",
                 "q53_decontaminate", "q70_shipping_priority",
                 "q71_local_supplier_volume"):
        q = QUERIES[name](spark, sf_smoke)
        assert uses_broadcast_join(q), f"{name} lost its broadcast join"


def test_profiling_queries_stay_jvm_side(spark, sf_smoke):
    # corpus profiling runs over every doc at 100 TB: it must be pure
    # built-ins with bounded shuffles (explode + keyed aggregation)
    for name, max_shuffles in (("q54_repetition_stats", 3), ("q55_corpus_profile", 3)):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"
        assert shuffle_count(q) <= max_shuffles, f"{name}: {shuffle_count(q)} exchanges"


def test_incremental_dedup_plan_quality(spark, sf_smoke):
    """The daily-ingest dedup must (a) push both doc_id slices into the
    scan, (b) anti-join against the fingerprint index as a broadcast
    (the index is tiny relative to the batch text), (c) stay JVM-side."""
    from nlu_data_warehouse_project_spark.plans import formatted_plan

    q = QUERIES["q56_incremental_dedup"](spark, sf_smoke)
    plan = formatted_plan(q)
    assert "LeftAnti" in plan
    assert uses_broadcast_join(q), "fingerprint anti-join lost its broadcast"
    assert has_pushed_filters(q)
    assert python_udf_count(q) == 0


def test_pivot_matrix_single_shuffle(spark, sf_smoke):
    # pivot as conditional aggregation: one groupBy exchange — the
    # DataFrame.pivot form would cost two plus a discovery job
    q = QUERIES["q58_event_matrix"](spark, sf_smoke)
    assert shuffle_count(q) == 1, shuffle_count(q)
    assert python_udf_count(q) == 0


def test_scd2_merge_single_shuffle_pair(spark, sf_smoke):
    # the merge is one full-outer join: at most 2 exchanges (one per
    # side) before AQE, never one per disposition branch
    q = QUERIES["q08_scd2_merge"](spark, sf_smoke)
    # events feed two snapshot windows + the join; ensure the plan does
    # not blow up into per-branch re-joins (>6 exchanges would mean the
    # old 5-branch union shape)
    assert shuffle_count(q) <= 6, shuffle_count(q)


def test_bucketed_gold_merge_has_no_dw_side_exchange(spark, tmp_path):
    """VERDICT r2 #3: with the TxTable current set bucketed on the
    merge key, the SCD2 merge's dw side reads pre-partitioned — only
    the batch side shuffles.  The bucketed scan must appear in the
    plan and the merge must carry exactly ONE exchange (vs two over a
    plain parquet current set)."""
    from nlu_data_warehouse_project_spark.operators.scd2 import scd2_merge
    from nlu_data_warehouse_project_spark.plans import formatted_plan
    from nlu_data_warehouse_project_spark.sources.txlog import TxTable

    def mkcur(df):
        return (
            df.withColumn("dt_load_to_dw", F.to_date(F.lit("2024-12-08")))
            .withColumn("dt_last_update", F.to_date(F.lit("9999-12-31")))
        )

    rows = [(f"k{i}", float(i)) for i in range(100)]
    cur_df = mkcur(spark.createDataFrame(rows, "natural_key string, price double"))
    batch = spark.createDataFrame(
        [(f"k{i}", float(i) + 0.5) for i in range(0, 100, 2)], "natural_key string, price double"
    )

    def merge_plan(gold_root, bucket_cols):
        gold = TxTable(spark, gold_root, bucket_cols=bucket_cols, num_buckets=8)
        gold.commit_merge(cur_df, cur_df.limit(0), "d1")
        merged = scd2_merge(
            gold.read_current(), batch, key="natural_key", attrs=["price"], run_date="2024-12-09"
        )
        return merged

    plain = merge_plan(str(tmp_path / "plain"), None)
    bucketed = merge_plan(str(tmp_path / "bucketed"), ["natural_key"])

    assert "Bucketed: true" in formatted_plan(bucketed)
    assert shuffle_count(plain) == 2, formatted_plan(plain)
    assert shuffle_count(bucketed) == 1, formatted_plan(bucketed)

    # identical results either way — bucketing is a layout property
    key = lambda df: sorted((r["natural_key"], r["price"], str(r["dt_last_update"])) for r in df.collect())
    assert key(bucketed) == key(plain)


def test_anti_and_semi_join_forms(spark, sf_smoke):
    from nlu_data_warehouse_project_spark.plans import formatted_plan

    anti = QUERIES["q03_anti_join"](spark, sf_smoke)
    semi = QUERIES["q20_semi_join"](spark, sf_smoke)
    assert "LeftAnti" in formatted_plan(anti)
    assert "LeftSemi" in formatted_plan(semi)


def test_round7_queries_stay_jvm_side(spark, sf_smoke):
    # line dedup / safety gate / funnel / retention are relational —
    # any Python in their plans is a regression
    for name in ("q81_line_dedup", "q82_volume_shipping", "q84_content_safety",
                 "q85_funnel", "q86_cohort_retention"):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"


def test_volume_shipping_broadcasts_both_nation_roles(spark, sf_smoke):
    q = QUERIES["q82_volume_shipping"](spark, sf_smoke)
    assert uses_broadcast_join(q)
    assert has_pushed_filters(q)  # the shipdate range reaches the scan


def test_content_safety_gate_is_scan_local(spark, sf_smoke):
    q = QUERIES["q84_content_safety"](spark, sf_smoke)
    assert shuffle_count(q) == 0, shuffle_count(q)


def test_bloom_dedup_probes_index_by_broadcast(spark, sf_smoke):
    """The bloom path's exact probe must reach the settled index as a
    BROADCAST semi/anti join — the index side never shuffles.  The only
    Python in the plan is the Arrow-batched bloom membership test."""
    from nlu_data_warehouse_project_spark.plans import formatted_plan

    q = QUERIES["q83_bloom_incremental_dedup"](spark, sf_smoke)
    plan = formatted_plan(q)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert uses_broadcast_join(q)
    assert python_udf_count(q) <= 2  # the pandas bloom probe only


def test_third_wave_queries_stay_jvm_side(spark, sf_smoke):
    for name in ("q87_trailing_window", "q88_fuzzy_match", "q89_expectations"):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"


def test_trailing_window_single_shuffle(spark, sf_smoke):
    # one window partitioned on user_id: exactly one exchange
    q = QUERIES["q87_trailing_window"](spark, sf_smoke)
    assert shuffle_count(q) == 1, shuffle_count(q)


def test_fourth_wave_queries_stay_jvm_side(spark, sf_smoke):
    for name in ("q91_event_transitions", "q92_weighted_sample", "q93_temperature_mix",
                 "q94_value_histogram", "q95_grouping_sets", "q96_forward_fill",
                 "q97_sliding_window", "q98_scd2_churn", "q99_table_checksum",
                 "q100_source_health", "q101_fd_audit", "q102_outlier_trim",
                 "q103_length_drift"):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"


def test_checksum_and_histogram_single_shuffle(spark, sf_smoke):
    # one keyed aggregate each: exactly one exchange
    for name in ("q99_table_checksum", "q94_value_histogram"):
        q = QUERIES[name](spark, sf_smoke)
        assert shuffle_count(q) == 1, f"{name}: {shuffle_count(q)}"


def test_weighted_and_mix_samplers_broadcast_or_scan_local(spark, sf_smoke):
    # weighted_sample is a pure scan-local filter; temperature mixing
    # joins only a broadcast source-count frame
    assert shuffle_count(QUERIES["q92_weighted_sample"](spark, sf_smoke)) == 0
    assert uses_broadcast_join(QUERIES["q93_temperature_mix"](spark, sf_smoke))


def test_decorrelation_family_plans(spark, sf_smoke):
    # q104-q106: correlated-subquery shapes hand-decorrelated into
    # broadcast agg-joins — all JVM-side, dims broadcast, fact filters
    # pushed to the scan, and shuffles bounded (only aggregated rows
    # ever cross an exchange)
    for name, max_shuffles in (
        ("q104_small_qty_revenue", 2),   # part-stats agg + final single-row agg
        ("q105_min_cost_supplier", 1),   # ONE struct-min aggregate, no window sort
        ("q106_dominant_suppliers", 3),  # per-(part,supp) agg, per-part agg, bcast-back
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"
        assert uses_broadcast_join(q), f"{name} lost its broadcast join"
        assert has_pushed_filters(q), f"{name} lost scan pushdown"
        assert shuffle_count(q) <= max_shuffles, f"{name}: {shuffle_count(q)}"


def test_round8_queries_stay_jvm_side(spark, sf_smoke):
    for name in ("q107_embedding_drift", "q108_dispersion_stats", "q109_funnel_latency"):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"


def test_dispersion_stats_single_shuffle(spark, sf_smoke):
    # five power sums in ONE map-side-combined aggregate: one exchange
    q = QUERIES["q108_dispersion_stats"](spark, sf_smoke)
    assert shuffle_count(q) == 1, shuffle_count(q)


def test_embedding_drift_bounded_shuffles(spark, sf_smoke):
    # posexplode -> (label, pos) agg -> label rollup: the explode never
    # shuffles raw vector rows, only the 64·|labels| aggregate
    q = QUERIES["q107_embedding_drift"](spark, sf_smoke)
    assert shuffle_count(q) <= 2, shuffle_count(q)


def test_round8_second_wave_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q110_mad", 3),                  # two percentile aggs + broadcast-median join
        ("q111_inverted_index", 2),       # tokenize scan-local, one term-keyed agg
        ("q112_idle_rich_customers", 2),  # scalar-agg broadcast + anti join + final agg
        ("q113_budget_allocation", 2),    # corpus agg + dimension-sized global window
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"
        assert shuffle_count(q) <= max_shuffles, f"{name}: {shuffle_count(q)}"


def test_round8_third_wave_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q114_rolling_wau", 4),        # (user,day) dedup, day dim, 2-phase count_distinct
        ("q115_golden_record", 1),      # ONE survivorship aggregate
        ("q116_quantile_normalize", 1), # one window on the source key
        ("q117_skew_report", 3),        # key count agg + TakeOrdered top-20 + total agg (r9 rewrite)
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"
        assert shuffle_count(q) <= max_shuffles, f"{name}: {shuffle_count(q)}"


def test_round8_fourth_wave_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q118_volume_anomalies", 3),   # daily agg + two tiny percentile aggs
        ("q119_term_cooccurrence", 4),  # (doc,term) dedup, doc self-join, pair agg
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"
        assert shuffle_count(q) <= max_shuffles, f"{name}: {shuffle_count(q)}"
    # q118's scalar joins are broadcast NESTED-LOOP (1-row frames), which
    # uses_broadcast_join (hash-join probe) doesn't see; q119's term-count
    # joins are real broadcast hash joins
    assert uses_broadcast_join(QUERIES["q119_term_cooccurrence"](spark, sf_smoke))


def test_round8_fifth_wave_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q120_user_concentration", 3),  # user agg + rank + whole-frame sums
        ("q121_weekly_movers", 2),       # (type, week) agg + lag window
        ("q122_fulfillment_latency", 3), # per-order max, fact-fact join, priority agg
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"
        assert shuffle_count(q) <= max_shuffles, f"{name}: {shuffle_count(q)}"


def test_round8_sixth_wave_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q123_session_funnel", 6),     # sessionize window + 3 stage aggs + 2 stage joins, all on one shrinking key family
        ("q124_dedup_savings", 2),      # fingerprint agg + size histogram agg
        ("q125_revenue_share", 2),      # star agg + region window on nation-sized frame
        ("q126_vocab_growth", 3),       # bigram first-seen agg + bucket agg + running sum
        ("q127_attribution", 1),        # the as-of union carry: one user-keyed shuffle
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"
        assert shuffle_count(q) <= max_shuffles, f"{name}: {shuffle_count(q)}"
    assert uses_broadcast_join(QUERIES["q125_revenue_share"](spark, sf_smoke))


def test_unpivot_adds_no_shuffle(spark, sf_smoke):
    # melt is an Expand over the aggregated wide frame: exactly the
    # groupBy exchange, nothing for the reshape
    q = QUERIES["q128_unpivot_metrics"](spark, sf_smoke)
    assert python_udf_count(q) == 0
    assert shuffle_count(q) == 1, shuffle_count(q)


def test_round8_seventh_wave_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q129_order_deciles", 2),       # global ntile sort + decile agg
        ("q130_activity_gaps", 2),       # (user, day) dedup + per-user agg
        ("q131_distribution_match", 4),  # two bin counts + bin agg, fracs broadcast
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"
        assert shuffle_count(q) <= max_shuffles, f"{name}: {shuffle_count(q)}"


def test_round8_eighth_wave_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q132_returning_rate", 4),   # (user,week) dedup + shifted self-join + week agg
        ("q133_top_order_share", 2),  # global rank sort + single-row agg
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"
        assert shuffle_count(q) <= max_shuffles, f"{name}: {shuffle_count(q)}"


def test_round8_ninth_wave_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q134_custdist", 3),   # left join + per-customer agg + histogram agg
        ("q135_sole_blame", 3), # join + ONE expand agg (two distincts share it)
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"
        assert shuffle_count(q) <= max_shuffles, f"{name}: {shuffle_count(q)}"


def test_round8_experimentation_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q136_ab_test", 3),  # per-user agg, variant agg, whole-frame widen
        ("q137_cuped", 2),    # per-user agg + whole-frame power sums + variant agg
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"
        assert shuffle_count(q) <= max_shuffles, f"{name}: {shuffle_count(q)}"


def test_round8_final_wave_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q139_forecast_eval", 3),   # (type,day) agg + lag window + type agg
        ("q140_pareto_coverage", 4), # part agg + pid-window prefix sum + totals + final agg (r9)
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, f"{name} fell off the JVM path"
        assert shuffle_count(q) <= max_shuffles, f"{name}: {shuffle_count(q)}"


def test_interval_union_single_window_shuffle(spark, sf_smoke):
    # islands + span agg + user rollup: all on the user key family
    q = QUERIES["q141_interval_union"](spark, sf_smoke)
    assert python_udf_count(q) == 0
    assert shuffle_count(q) <= 2, shuffle_count(q)


def test_ledger_reconcile_plan(spark, sf_smoke):
    q = QUERIES["q142_ledger_reconcile"](spark, sf_smoke)
    assert python_udf_count(q) == 0
    assert shuffle_count(q) <= 4, shuffle_count(q)  # two aggs + detail join + day join


def test_topk_with_ties_single_shuffle(spark, sf_smoke):
    q = QUERIES["q143_topk_with_ties"](spark, sf_smoke)
    assert python_udf_count(q) == 0
    assert shuffle_count(q) == 1, shuffle_count(q)


def test_floored_balance_single_sort_family(spark, sf_smoke):
    # three frames over ONE user-keyed sort: a single exchange
    q = QUERIES["q144_floored_balance"](spark, sf_smoke)
    assert python_udf_count(q) == 0
    assert shuffle_count(q) <= 2, shuffle_count(q)


def test_independence_test_bounded_shuffles(spark, sf_smoke):
    # cell agg + three marginal windows + final agg — all on cell-sized data
    q = QUERIES["q145_independence_test"](spark, sf_smoke)
    assert python_udf_count(q) == 0
    assert shuffle_count(q) <= 5, shuffle_count(q)


def test_exact_rank_family_has_no_global_sort_window(spark, sf_smoke):
    """VERDICT r8 #1: q129/q133/q120 rank through exact_global_rank
    (no Window at all), q140's prefix sum keeps one Window partitioned
    by the range-partition id, q117 is a distributed top-k — none of
    them may plan a single-partition exchange (the one-task global
    sort), and all stay JVM-side."""
    from nlu_data_warehouse_project_spark.plans import (
        single_partition_exchange_count,
        window_count,
    )

    for name, max_windows in (
        ("q129_order_deciles", 0),
        ("q133_top_order_share", 0),
        ("q120_user_concentration", 0),
        ("q117_skew_report", 0),
        ("q140_pareto_coverage", 1),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert window_count(q) <= max_windows, (name, window_count(q))
        # the only legal SinglePartition exchange is a scalar agg's
        # partial-merge; those queries' scalar aggs feed broadcast
        # one-row frames, which plan as BroadcastExchange instead
        assert single_partition_exchange_count(q) == 0, name


def test_exact_rank_spreads_sort_over_partitions(spark, sf_smoke):
    """The ranked frame comes back range-partitioned: >= 2 sort
    partitions on real data (the old form was exactly 1)."""
    from nlu_data_warehouse_project_spark.operators.scale import exact_global_rank

    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    ranked = exact_global_rank(
        orders, [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        num_partitions=8,
    )
    assert ranked.rdd.getNumPartitions() >= 2


def test_approx_deciles_plan_is_sketch_only(spark, sf_smoke):
    """q146: one sketch aggregate + broadcast fences + final 10-key
    agg — no window, no range shuffle, no Python."""
    from nlu_data_warehouse_project_spark.plans import window_count

    q = QUERIES["q146_order_deciles_approx"](spark, sf_smoke)
    assert python_udf_count(q) == 0
    assert window_count(q) == 0
    assert shuffle_count(q) <= 2, shuffle_count(q)


def test_round9_tpch_wave_plans(spark, sf_smoke):
    """q148-q153: dimensions broadcast, Python-free, bounded shuffles;
    q148's EXISTS decorrelates to one semi join, q150's top-20 is a
    TakeOrderedAndProject (no global sort), q153's OR-arms stay one
    equi-join."""
    from nlu_data_warehouse_project_spark.plans import formatted_plan

    for name, max_shuffles in (
        ("q148_late_ship_priority", 3),
        ("q149_local_supplier_volume", 4),
        ("q150_returned_top_customers", 3),
        ("q151_promo_share", 1),
        ("q152_large_volume_orders", 3),
        ("q153_disjunctive_arm_revenue", 1),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))
    for name in ("q149_local_supplier_volume", "q150_returned_top_customers",
                 "q151_promo_share", "q153_disjunctive_arm_revenue"):
        assert uses_broadcast_join(QUERIES[name](spark, sf_smoke)), name
    assert "TakeOrderedAndProject" in formatted_plan(
        QUERIES["q150_returned_top_customers"](spark, sf_smoke)
    )


def test_round9_pipeline_wave_plans(spark, sf_smoke):
    """q154-q157: Python-free, bounded shuffles; q156's global top-15
    is a TakeOrderedAndProject, and q154's probe is a semi join."""
    from nlu_data_warehouse_project_spark.plans import formatted_plan

    for name, max_shuffles in (
        ("q154_contamination_check", 6),
        ("q155_retention_cohorts", 4),
        ("q156_collocations", 5),
        ("q157_centroid_similarity", 4),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))
    assert "TakeOrderedAndProject" in formatted_plan(
        QUERIES["q156_collocations"](spark, sf_smoke)
    )


def test_round9_rank_showcase_plans(spark, sf_smoke):
    """q158-q160: rank-family consumers stay window-free (q158/q159 ride
    the broadcast-offset machinery), attribution is one user-keyed
    equi-join family; all Python-free."""
    from nlu_data_warehouse_project_spark.plans import window_count

    for name, max_windows, max_shuffles in (
        ("q158_exact_quantiles", 0, 2),
        ("q159_price_size_skyline", 1, 1),   # the pid-partitioned prefix window
        ("q160_linear_attribution", 0, 4),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert window_count(q) <= max_windows, (name, window_count(q))
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))


def test_round9_series_wave_plans(spark, sf_smoke):
    """q161-q163: densify's spine is a broadcast cross join of two tiny
    frames; bounce reuses the session window's single user exchange;
    HLL is one mergeable aggregate."""
    for name, max_shuffles in (
        ("q161_dense_daily_series", 4),
        ("q162_bounce_rate", 2),
        ("q163_approx_distinct_users", 1),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))


def test_round9_trend_wave_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q164_dedup_pressure", 3),
        ("q165_trend_slopes", 2),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))


def test_round9_final_wave_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q166_weighted_median", 2),   # price pre-agg + flag window family
        ("q167_spend_concentration", 3),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))
    assert uses_broadcast_join(QUERIES["q167_spend_concentration"](spark, sf_smoke))


def test_round9_reporting_wave_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q168_yoy_growth", 3),
        ("q169_share_of_parent", 3),
        ("q170_fuzzy_name_pairs", 1),   # one (brand,size) block join
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))


def test_tpch_completion_wave_plans(spark, sf_smoke):
    """q171-q177 (TPC-H Q6/Q8/Q9/Q11/Q12/Q15/Q16 shapes): Python-free,
    bounded shuffles, dims broadcast.  q171 is the pure-scan query —
    exactly the one groupBy exchange; q174/q176's scalar thresholds are
    broadcast one-row cross joins, not whole-frame windows."""
    for name, max_shuffles in (
        ("q171_discount_uplift", 1),
        ("q172_national_market_share", 6),   # 1 at smoke (AQE broadcasts facts)
        ("q173_product_line_profit", 5),
        ("q174_important_stock", 3),
        ("q175_late_priority_split", 3),
        ("q176_top_supplier", 3),
        ("q177_supplier_diversity", 3),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))
    for name in ("q172_national_market_share", "q173_product_line_profit",
                 "q174_important_stock", "q176_top_supplier",
                 "q177_supplier_diversity"):
        assert uses_broadcast_join(QUERIES[name](spark, sf_smoke)), name
    # the Q6 shape does ALL its work at the scan: pushdown + one exchange
    q171 = QUERIES["q171_discount_uplift"](spark, sf_smoke)
    assert has_pushed_filters(q171)
    assert shuffle_count(q171) == 1


def test_capability_wave_plans_q178_q180(spark, sf_smoke):
    """q178 rare-ngram: two wordcount-shaped aggs + probe join, zero
    Python.  q179's projection matmul is a sanctioned pandas-UDF site
    (no built-in matmul) — everything around it stays JVM.  q180 BFS
    materializes per hop via localCheckpoint, so plan properties are
    per-round; pinned by its unit tests instead."""
    q = QUERIES["q178_rare_ngram_score"](spark, sf_smoke)
    assert python_udf_count(q) == 0
    assert shuffle_count(q) <= 5, shuffle_count(q)
    q179 = QUERIES["q179_projected_cosine_topk"](spark, sf_smoke)
    assert python_udf_count(q179) <= 2, python_udf_count(q179)  # one per projected side
    assert uses_broadcast_join(q179)


def test_business_wave_plans_q181_q183(spark, sf_smoke):
    """q181/q182 route ALL global ordering through the exact-rank
    family — no window operator and no single-partition exchange may
    appear (the one-task global sort); q183 is integer joins + one
    TakeOrdered.  Zero Python anywhere."""
    from nlu_data_warehouse_project_spark.plans import (
        formatted_plan,
        single_partition_exchange_count,
        window_count,
    )

    # q181's prefix sum keeps ONE window partitioned by the range-
    # partition id (the q140 precedent); q182's ntiles use none
    for name, max_windows in (
        ("q181_abc_classification", 1),
        ("q182_rfm_segmentation", 0),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert window_count(q) <= max_windows, (name, window_count(q))
        assert single_partition_exchange_count(q) == 0, name
    q183 = QUERIES["q183_basket_rules"](spark, sf_smoke)
    assert python_udf_count(q183) == 0
    assert window_count(q183) == 0
    assert "TakeOrderedAndProject" in formatted_plan(q183)


def test_reporting_wave_plans_q184_q190(spark, sf_smoke):
    """q184-q190: Python-free, bounded shuffles.  q185's one window is
    the sanctioned whole-frame sum over the calendar-sized aggregated
    hour frame; q186/q188's windows are key-partitioned; q189/q190
    audit post-checkpoint (the edge set materializes once)."""
    for name, max_shuffles in (
        ("q184_longest_streak", 3),
        ("q185_cumulative_uniques", 3),
        ("q186_fifo_allocation", 3),
        ("q187_revenue_waterfall", 2),
        ("q188_purchase_gap_histogram", 3),
        ("q189_triangle_census", 8),   # 3-way self-join + degree agg
        ("q190_degree_distribution", 3),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))


def test_closing_wave_plans_q195_q199(spark, sf_smoke):
    """q195's Apriori prune must appear as a LeftSemi before the third
    join; q196-q199 are Python-free with bounded shuffles."""
    from nlu_data_warehouse_project_spark.plans import formatted_plan

    q195 = QUERIES["q195_frequent_triples"](spark, sf_smoke)
    assert "LeftSemi" in formatted_plan(q195)
    for name, max_shuffles in (
        ("q195_frequent_triples", 8),
        ("q196_null_profile", 1),
        ("q197_ewma_daily_orders", 3),
        ("q198_suppressed_cells", 3),
        ("q199_benford_audit", 3),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))


def test_q85_funnel_keeps_sort_merge_at_bench_scale(spark):
    """VERDICT r9 #7: q85 is the one cross-scale plan drift in
    PLAN_AUDIT — at sf0.001 the shrunken stage frames flip to broadcast
    (3 exchanges), at the bench scale sf0.1 the funnel must stay
    sort-merge on its single user_id shuffle key (4 exchanges, no
    broadcast).  Pin BOTH so a future regression to
    broadcast-everywhere (stage frames are user-count-sized — NOT
    broadcastable at 100 TB) or to extra exchanges is caught rather
    than re-adjudicated each round."""
    import os

    bench_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(bench_sf):
        import pytest

        pytest.skip(f"bench-scale dir {bench_sf} not present")
    q = QUERIES["q85_funnel"](spark, bench_sf)
    assert not uses_broadcast_join(q), (
        "q85 stage frames are user-count-sized; broadcasting them at bench "
        "scale means the planner thinks they're dims — would OOM at 100 TB"
    )
    assert shuffle_count(q) <= 4, "funnel gained exchanges beyond the user_id chain"
    assert python_udf_count(q) == 0


def test_q200_pagerank_round_plan_never_rematerializes_edges(spark, sf_smoke, monkeypatch):
    """VERDICT r10 #5 (q200 pin): each PageRank round must join the
    rank VECTOR against the PINNED edge set — if the pin regressed, the
    co-order self-join (the expensive edge materialization) would
    reappear as a parquet re-scan in every round's plan.  Capture the
    per-round frame just before it is pinned and assert: no parquet
    scan anywhere in it (all inputs are checkpointed ExistingRDD
    scans), no single-partition exchange, zero Python."""
    from nlu_data_warehouse_project_spark.operators import graph
    from nlu_data_warehouse_project_spark.plans import (
        formatted_plan,
        single_partition_exchange_count,
    )

    captured = []
    real_pin = graph.pin_frame

    def capturing_pin(df, **kw):
        captured.append(df)
        return real_pin(df, **kw)

    monkeypatch.setattr(graph, "pin_frame", capturing_pin)

    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").limit(400)
    a = li.select(F.col("l_orderkey").alias("__o"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("__o"), F.col("l_partkey").alias("dst"))
    edges = a.join(b, "__o").filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    graph.pagerank_rounds(edges, rounds=2)

    # captures: edges, degree-folded edges, nodes, then one rank frame
    # per NON-FINAL round (r17 job trim: the uniform branch no longer
    # re-pins the seed-flagged node frame — it is a literal column over
    # the already-pinned nodes — and the FINAL fixed round's vector is
    # consumed exactly once by the caller's action, so pinning it was a
    # pure extra job).  rounds=2 -> 3 setup pins + 1 round pin.
    assert len(captured) == 4
    for round_frame in captured[3:]:
        plan = formatted_plan(round_frame)
        assert "Scan parquet" not in plan, "a round re-materialized the edge self-join"
        assert single_partition_exchange_count(round_frame) == 0
        assert python_udf_count(round_frame) == 0


def test_q206_global_percentiles_plan_has_no_single_partition_sort(spark, sf_smoke):
    """VERDICT r10 #5 (q206 pin): exact_global_percentiles must ride
    the range-shuffle + broadcast-offsets machinery — a regression to a
    global Window or a single-state percentile() would appear as a
    single-partition exchange (the one-task sort that IS the job at
    100 TB) or a window operator."""
    from nlu_data_warehouse_project_spark.plans import (
        single_partition_exchange_count,
        window_count,
    )

    q = QUERIES["q206_global_price_percentiles"](spark, sf_smoke)
    assert single_partition_exchange_count(q) == 0
    assert window_count(q) == 0
    assert python_udf_count(q) == 0
    assert uses_broadcast_join(q)  # the cut-rank offsets join broadcasts


def test_round11_wave_plans(spark, sf_smoke):
    """q224-q250 discipline: zero Python in every relational plan; the
    rank-machinery queries (Gini, Spearman, weighted median, ABC-XYZ)
    carry NO single-partition exchange; bounded shuffles on the heavy
    joins."""
    from nlu_data_warehouse_project_spark.plans import (
        single_partition_exchange_count,
    )

    for name in (
        "q224_gini_customer_spend", "q227_spearman_qty_price",
        "q228_weighted_median_price", "q242_abc_xyz_matrix",
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert single_partition_exchange_count(q) == 0, name

    for name, max_shuffles in (
        ("q225_supplier_cr4", 3),
        ("q226_clamped_inventory_balance", 2),
        ("q229_attribution_model_gap", 4),
        ("q230_second_order_transitions", 3),
        ("q231_regular_cadence_customers", 2),
        ("q232_lexical_diversity", 2),
        ("q233_order_seasonality", 3),
        ("q236_new_vs_returning", 4),
        ("q237_reactivations", 2),
        ("q238_basket_diversity", 3),
        ("q241_ship_latency_sla", 3),
        ("q243_price_mix_shift", 4),
        ("q244_dup_rate_by_lang", 2),
        ("q246_revenue_bridge", 4),
        ("q247_retention_triangle", 6),
        ("q248_event_cooccurrence_lift", 5),
        ("q249_customer_survival", 4),
        ("q250_backlog_aging", 2),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))

    # q245's pair-free identity: the ONLY join is the tiny label-frame
    # meet — no pairwise self-join of vectors may ever appear
    q245 = QUERIES["q245_label_coherence"](spark, sf_smoke)
    assert python_udf_count(q245) == 0
    assert shuffle_count(q245) <= 4, shuffle_count(q245)


def test_round11_late_wave_plans(spark, sf_smoke):
    """q251-q270: zero Python everywhere; q254's rank rides the pinned
    exact-rank frame (no single-partition exchange); bounded shuffles
    on the rest."""
    from nlu_data_warehouse_project_spark.plans import (
        single_partition_exchange_count,
    )

    q254 = QUERIES["q254_top_percentile_share"](spark, sf_smoke)
    assert python_udf_count(q254) == 0
    assert single_partition_exchange_count(q254) == 0
    q258 = QUERIES["q258_out_of_order_arrivals"](spark, sf_smoke)
    assert python_udf_count(q258) == 0
    assert single_partition_exchange_count(q258) == 0

    for name, max_shuffles in (
        ("q251_pseudonymized_export", 4),
        ("q252_l_diversity_audit", 3),
        ("q253_weekend_effect", 3),
        ("q255_rapid_repeat_purchases", 3),
        # r17: the final fixed round is no longer pinned (one fewer job),
        # so its mass join + rank reassembly ride the visible plan over
        # the pinned inputs instead of a bare post-checkpoint select
        ("q256_personalized_pagerank", 4),
        ("q257_adjusted_outlier_days", 3),
        ("q259_error_rate_alarms", 3),
        ("q260_keyword_revenue", 4),
        ("q261_order_value_movers", 4),
        ("q262_supplier_churn", 5),
        ("q263_discount_effectiveness", 3),
        ("q264_session_exit_types", 4),
        ("q265_doc_quality_bands", 2),
        ("q266_iqr_outlier_suppliers", 3),
        ("q267_lines_per_order_profile", 2),
        ("q268_price_dispersion_arbitrage", 3),
        ("q269_activity_burstiness", 2),
        ("q270_bilateral_trade_matrix", 4),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))


def test_round11_final_wave_plans(spark, sf_smoke):
    """q271-q275: zero Python; q274's lag pairing is a date-shift join
    on the pinned day frame (no ordered window anywhere)."""
    from nlu_data_warehouse_project_spark.plans import window_count

    q274 = QUERIES["q274_revenue_autocorrelation"](spark, sf_smoke)
    assert python_udf_count(q274) == 0
    assert window_count(q274) == 0
    for name, max_shuffles in (
        ("q271_waiting_time_paradox", 2),
        ("q272_weekly_cusum", 4),
        ("q273_signup_to_purchase", 4),
        ("q275_event_integrity_audit", 3),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))


def test_q276_q277_plans(spark, sf_smoke):
    """q276's pair join fans out per word by languages-carrying-it;
    q277 is all-DECIMAL with a key-partitioned nearest window and a
    broadcast centroid frame — zero Python in both."""
    for name, max_shuffles in (
        ("q276_cross_lang_vocab_overlap", 5),
        ("q277_label_confusion", 5),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))
    assert uses_broadcast_join(QUERIES["q277_label_confusion"](spark, sf_smoke))


def test_q278_q279_plans(spark, sf_smoke):
    for name, max_shuffles in (
        ("q278_order_state_audit", 3),
        ("q279_month_end_rush", 2),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))


def test_round12_wave_plans(spark, sf_smoke):
    """q280-q299 discipline: zero Python UDFs in every relational plan,
    bounded shuffles.  The DML-audit trio (q280/q289/q299) builds temp
    TxTables, so their frames are unions over pinned/committed state —
    they get the no-Python pin and a looser shuffle budget."""
    for name, max_shuffles in (
        ("q281_kendall_tau_discount_qty", 6),
        ("q282_kcore_purchase_network", 4),
        ("q283_substitution_distance", 3),
        ("q284_nation_year_effects", 6),
        ("q285_stratified_discount_uplift", 3),
        ("q286_order_fill_milestones", 8),
        ("q287_momentum_streaks", 6),
        ("q288_revenue_trend_ols2", 4),
        # r17 widen: every documents scan in the LSH+verify DAG (the
        # corpus union is derived once per sigs/shsets consumer) now
        # carries its widen_if_narrow repartition — a no-op at cluster
        # scale, identical subtrees exchange-reused at runtime; measured
        # 3.49 -> 2.53 s at sf0.1 despite the fatter smoke-scale plan
        ("q290_neardup_threshold_sweep", 11),
        ("q291_subject_access_report", 8),
        ("q292_label_silhouette", 6),
        ("q293_cross_source_dup_spread", 4),
        ("q294_peak_open_orders", 8),
        ("q295_copurchase_novelty", 4),
        ("q296_modal_quantity", 4),
        ("q297_supplier_latency_consistency", 6),
        ("q298_month_end_open_orders", 8),
        ("q300_attribution_window_sweep", 4),
        ("q301_vocab_coverage", 6),
        ("q302_watermark_lateness_sweep", 4),
        ("q303_boilerplate_position_profile", 6),
        ("q304_keeper_policy_sensitivity", 4),
        ("q305_ivf_cell_balance", 4),
        ("q306_customer_trajectory_census", 5),
        ("q307_supplier_mixing", 4),
        ("q308_embedding_dim_variance", 4),
        ("q309_contrarian_movers", 6),
        # 9 decile branches over the pinned rank frame: one broadcast
        # offset-agg exchange per branch, rank machinery paid once
        ("q310_price_decile_drift", 10),
        ("q311_linenumber_density_audit", 4),
        ("q312_return_contagion", 4),
        ("q313_simpson_detector", 5),
        # two half-ranked branches over one scan: per-half agg +
        # window exchanges on each side of the overlap join
        ("q314_ranking_stability", 8),
        ("q315_decayed_revenue_share", 5),
        ("q316_substitute_parts", 8),
        ("q317_first_value_ltv", 6),
        ("q318_lang_label_confusion", 4),
        ("q319_littles_law_audit", 8),
        # two per-year prefix-sum passes + the full-join matrix
        ("q320_abc_migration", 12),
        ("q321_header_detail_reconciliation", 4),
        ("q322_bullwhip_ratio", 8),
        ("q323_engagement_diversity_bands", 3),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))
    for name in (
        "q280_price_correction_audit",
        "q289_erasure_audit",
        "q299_slice_skew_report",
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name


def test_round13_wave_plans(spark, sf_smoke):
    """q324-q335 discipline: zero Python UDFs, bounded shuffles.  The
    iterative trio (q324/q325/q333) returns a final select over PINNED
    frames, so its visible plan is shallow by construction — the
    per-round shapes are pinned by the operator property tests; the
    budgets here bound the post-iteration aggregation."""
    for name, max_shuffles in (
        ("q324_pagerank_tolerance_stop", 2),
        ("q325_kcore_fixpoint", 4),
        ("q326_post_purchase_reengagement", 3),
        ("q327_nearest_click_gap", 5),
        # blocked prefix self-join broadcasts at smoke scale (0
        # shuffles); allow the sort-merge form at scale
        ("q328_prefix_truncation_pairs", 3),
        # r17 widen: same as q290 — each documents scan in the
        # LSH+containment-verify DAG carries its widen repartition
        # (no-op on wide cluster scans); measured 3.45 -> 2.67 s at sf0.1
        ("q329_quote_containment_pairs", 10),
        ("q330_balance_distribution_rank", 2),
        ("q331_winsorized_revenue", 6),
        ("q332_revenue_drawdown", 4),
        ("q333_substitution_distance_fixpoint", 3),
        ("q334_scd3_value_history", 8),
        ("q335_scd2_interval_audit", 8),
        ("q336_brand_loyalists", 4),
        ("q337_metadata_integrity_flags", 2),
        ("q338_hll_rollup_distinct", 3),
        ("q338x_exact_rollup_distinct", 3),
        # calendar-sized global window (the sanctioned whole-frame
        # exception, stated in its docstring) + one day aggregation
        ("q339_holt_trend_daily_orders", 3),
        ("q340_session_window_native", 2),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, name
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))


def test_round14_wave_plans(spark, sf_smoke):
    """q341-q345 discipline: the smoothers/packers are SANCTIONED
    sequential-recurrence Python stages — exactly ONE
    FlatMapGroupsInPandas each, nothing row-at-a-time, and the shuffle
    budget is the group-by exchange plus the joins feeding it; q345
    stays fully JVM-side (rank-limit window, no Python)."""
    from nlu_data_warehouse_project_spark.plans import python_udf_count, shuffle_count

    for name, py_stages, max_shuffles in (
        ("q341_ewma_by_nation", 1, 4),
        ("q342_holt_by_nation", 1, 4),
        ("q343_sequence_packing", 1, 2),
        ("q344_packing_efficiency", 1, 4),
        ("q345_priority_weighted_sample", 0, 2),
        # spine bounds agg + spine-to-facts join + ONE window sort
        # (ffill and linear share the partitioning, so linear's four
        # ignorenulls frames reuse a single exchange)
        ("q346_gap_fill_ffill", 0, 6),
        ("q347_gap_fill_linear", 0, 6),
        # one MapInPandas MG stage; shuffles = candidate distinct +
        # the candidates-only groupBy (the full-cardinality exchange
        # this operator exists to avoid)
        ("q348_heavy_hitters_mg", 1, 4),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == py_stages, (name, python_udf_count(q))
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))


def test_round14_wave2_plans(spark, sf_smoke):
    """q349-q354 discipline: all six stay fully JVM-side (zero Python
    stages).  Budgets: tf·idf = tf agg + df agg + term join + doc
    window (×1.5 for the source variant's having-filter split); the
    edit-1 join = variant-key hash join + two dedups, NEVER an O(n²)
    cross join; KMV = the two-level salted aggregation only; the
    basket rules ride ONE tagged aggregation behind the checkpoint
    barrier (pairs/supports/N from a single scan)."""
    from nlu_data_warehouse_project_spark.plans import python_udf_count, shuffle_count

    for name, max_shuffles in (
        ("q349_tfidf_top_terms", 6),
        ("q350_source_signature_terms", 6),
        # r15: +2 exchanges — the explicit variant-key repartition
        # that pins fan-out join parallelism (AQE would coalesce the
        # few-MB variant shuffle to 1 partition, then the candidate
        # join explodes on one core: q366 measured 6.8s -> 2.1s)
        ("q351_fuzzy_name_pairs", 5),
        ("q352_kmv_distinct_customers", 2),
        ("q353_kmv_merge_global", 3),
        ("q354_brand_affinity_rules", 4),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, (name, python_udf_count(q))
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))
    # the fuzzy join's physical plan must not contain a cartesian /
    # nested-loop pair stage — the deletion-neighborhood equi-join is
    # the entire point
    from nlu_data_warehouse_project_spark.plans import formatted_plan

    plan = formatted_plan(QUERIES["q351_fuzzy_name_pairs"](spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_round14_wave3_plans(spark, sf_smoke):
    """q355-q359 discipline: all JVM-side.  q355's plan reads 0
    exchanges because the iterative closure materializes through
    checkpointed rounds (the pinned frames ARE the exchanges — same
    accounting as q47); q357's phrase intersection is one keyed
    exchange (the term slices broadcast); q356/q359 stay within their
    aggregation budgets."""
    from nlu_data_warehouse_project_spark.plans import python_udf_count, shuffle_count

    for name, max_shuffles in (
        ("q355_fuzzy_entity_clusters", 2),
        ("q356_brand_pair_chi2", 4),
        ("q357_phrase_search", 3),
        ("q359_kmv_rollup_regions", 4),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, (name, python_udf_count(q))
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))


def test_round14_wave4_plans(spark, sf_smoke):
    """q360/q361: zero Python stages (the bigram model is zip_with +
    joins; BPE application is the JVM aggregate fold — the learn
    rounds materialize through checkpoints, so the final plan shows
    only the apply-side aggregation)."""
    from nlu_data_warehouse_project_spark.plans import python_udf_count, shuffle_count

    for name, max_shuffles in (
        ("q360_bigram_lm_score", 6),
        ("q361_bpe_compression_by_source", 3),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, (name, python_udf_count(q))
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))


def test_round14_wave5_plans(spark, sf_smoke):
    """q362-q365: all JVM-side, and q363's global top-20 must plan as
    TakeOrderedAndProject (per-partition heads + driver merge), never
    a single-partition sort of the vocabulary."""
    from nlu_data_warehouse_project_spark.plans import (
        formatted_plan, python_udf_count, shuffle_count,
    )

    for name, max_shuffles in (
        ("q362_source_vocab_jaccard", 7),
        ("q363_zipf_constant", 2),
        ("q364_l_diversity_audit", 3),
        ("q365_reidentification_risk_sweep", 3),
    ):
        q = QUERIES[name](spark, sf_smoke)
        assert python_udf_count(q) == 0, (name, python_udf_count(q))
        assert shuffle_count(q) <= max_shuffles, (name, shuffle_count(q))
    assert "TakeOrderedAndProject" in formatted_plan(
        QUERIES["q363_zipf_constant"](spark, sf_smoke)
    )
