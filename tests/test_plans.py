"""Physical-plan shape regression tests: the scale properties claimed
in operator docstrings (pushdown reached the scan, columns pruned,
joins never nested-loop, shuffle counts as designed) are pinned here
so refactors can't silently regress the 100 TB plan."""

from __future__ import annotations

import pytest

from eeg_data_lake_spark.plans import (
    count_exchanges,
    explain_string,
    has_cartesian_or_bnlj,
    join_strategies,
    pushed_filters,
    read_schema_columns,
)
from eeg_data_lake_spark.workload import REGISTRY


@pytest.fixture(autouse=True)
def _plan_shape_no_spread(monkeypatch):
    """Plan pins in this module document the AT-SCALE plan shape,
    where the scale-adaptive input rebalance (operators/spread.py) is
    identity by its own gate — so pin with it off rather than encode
    the local one-row-group artifact into every exchange count.
    Result-parity THROUGH the spread path is covered by
    tests/test_spread.py and the oracle-parity sweep."""
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "off")


def q(name, spark, sf_dir):
    return REGISTRY[name].spark_fn(spark, sf_dir)


def test_q01_scan_pushdown_and_pruning(spark, sf_dir):
    df = q("q01_pricing_summary", spark, sf_dir)
    assert any("l_shipdate" in f for f in pushed_filters(df))
    (cols,) = read_schema_columns(df)
    # 7 of lineitem's 11 columns — projection pruning reached parquet
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert count_exchanges(df) == 1  # single agg shuffle


def test_q06_broadcasts_the_small_dims(spark, sf_dir):
    df = q("q06_small_part_quantity", spark, sf_dir)
    strategies = join_strategies(df)
    assert strategies and all(s == "BroadcastHashJoin" for s in strategies)


def test_q16_window_is_single_shuffle(spark, sf_dir):
    assert count_exchanges(q("q16_order_total_zscore", spark, sf_dir)) == 1


def test_q33_posting_list_plan_shape(spark, sf_dir):
    df = q("q33_neardup_shingle_jaccard", spark, sf_dir)
    # parallelize-repartition + posting groupBy + pair groupBy; no join
    # (one more exchange is visible when the shared shingle cache is
    # already materialized by an earlier query and the plan reads the
    # InMemoryRelation subtree)
    assert count_exchanges(df) <= 4
    assert join_strategies(df) == []
    assert not has_cartesian_or_bnlj(df)


def test_q50_asof_is_one_shuffle_no_pair_blowup(spark, sf_dir):
    df = q("q50_asof_join_last_order", spark, sf_dir)
    assert count_exchanges(df) == 1  # the union+window exchange
    assert not has_cartesian_or_bnlj(df)


def test_q13_range_join_is_hash_not_nested_loop(spark, sf_dir):
    df = q("q13_range_join_order_activity", spark, sf_dir)
    assert not has_cartesian_or_bnlj(df)
    assert set(join_strategies(df)) <= {
        "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    }


@pytest.mark.parametrize(
    "name",
    [
        "q02_top_revenue_customers",
        "q04_customers_with_orders",
        "q05_customers_without_orders",
        "q35_minhash_lsh_pairs",
    ],
)
def test_no_query_degrades_to_nested_loop(spark, sf_dir, name):
    assert not has_cartesian_or_bnlj(q(name, spark, sf_dir))


def test_q43_tfidf_is_three_shuffles_no_joins(spark, sf_dir):
    """docs-by-id rebalance (which the tf hash-agg AND the doc-length
    window both reuse — hashpartitioning(doc_id) satisfies their
    clustering) + term window + doc rank window; the old round-robin
    rebalance paid a 4th exchange re-shuffling every exploded token
    row, and the join formulation needed five plus a per-doc broadcast
    that can't exist at web scale."""
    df = q("q43_tfidf_top_terms", spark, sf_dir)
    assert count_exchanges(df) == 3
    assert join_strategies(df) == []


def test_q37_norms_hoisted_below_join_and_topk_pruned(spark, sf_dir):
    """Norms must be computed once per side BELOW the broadcast join
    (one fold per scored pair, not three), and the per-query top-k
    must hit Spark's WindowGroupLimit partial pruning."""
    df = q("q37_cosine_topk", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_at = plan.find("BroadcastNestedLoopJoin")
    assert join_at != -1  # 10 broadcast queries × corpus, by design
    above = plan[:join_at]
    # exactly one fold (the dot product) above the join
    assert above.count("aggregate(zip_with") == 1
    assert "WindowGroupLimit" in plan


def test_q53_2grams_never_shuffle(spark, sf_dir):
    df = q("q53_repetition_quality", spark, sf_dir)
    # word path: (doc,word) count + doc agg sharing one partitioning →
    # 2 exchanges total; gram dedup is per-row (array_distinct), no
    # exchange of its own; final join broadcasts an aggregate side
    assert count_exchanges(df) <= 3
    assert not has_cartesian_or_bnlj(df)
    for cols in read_schema_columns(df):
        assert set(cols) == {"doc_id", "text"}  # lang/source/n_chars pruned


def test_q54_subqueries_rewrite_to_joins(spark, sf_dir):
    df = q("q54_subquery_above_average", spark, sf_dir)
    # correlated EXISTS pushed l_quantity>=45 into the lineitem scan
    assert any("l_quantity" in f for f in pushed_filters(df))
    # scalar subquery reads ONLY o_totalprice (1-column scan)
    assert ["o_totalprice"] in read_schema_columns(df)
    assert not has_cartesian_or_bnlj(df)


def test_q56_packing_is_single_exchange(spark, sf_dir):
    # window keyed on lang; the (lang, pack_id) aggregate reuses that
    # partitioning (pack_id is a function of the window output), so the
    # whole packing plan moves the corpus once
    assert count_exchanges(q("q56_sequence_packing", spark, sf_dir)) == 1


def test_q57_centroids_single_agg_shuffle(spark, sf_dir):
    df = q("q57_label_centroids", spark, sf_dir)
    # explode happens map-side; only (label, dim) partials shuffle
    assert count_exchanges(df) == 1
    assert join_strategies(df) == []


def test_q58_grouping_sets_scan_once(spark, sf_dir):
    df = q("q58_explicit_grouping_sets", spark, sf_dir)
    # one Expand + one agg exchange — NOT three scans unioned
    assert count_exchanges(df) == 1
    assert len(read_schema_columns(df)) == 1


def test_q60_range_frame_two_exchanges(spark, sf_dir):
    # daily pre-agg shuffle + user-ordered window shuffle, nothing else
    assert count_exchanges(q("q60_time_range_rolling", spark, sf_dir)) == 2


def test_q70_scrub_is_pure_narrow_map(spark, sf_dir):
    df = q("q70_blocklist_scrub", spark, sf_dir)
    assert count_exchanges(df) == 0  # regex scrub runs at scan speed
    assert join_strategies(df) == []
    (cols,) = read_schema_columns(df)
    assert set(cols) == {"doc_id", "text"}  # projection pruned to 2 cols


def test_q71_mixture_corpus_never_shuffles(spark, sf_dir):
    df = q("q71_language_mixture_sample", spark, sf_dir)
    # rates reach the corpus by broadcast hash join only; the one
    # BroadcastNestedLoopJoin is the 1-row scalar min() cross (5×1
    # rows — the correct plan for a scalar subquery, not a blowup)
    strategies = join_strategies(df)
    assert "BroadcastHashJoin" in strategies
    assert set(strategies) <= {"BroadcastHashJoin", "BroadcastNestedLoopJoin"}


def test_q74_stat_aggs_single_shuffle(spark, sf_dir):
    df = q("q74_stat_association", spark, sf_dir)
    # all six bivariate statistics share one partial+final hash agg;
    # the second exchange is the trivial ~3-row result sort
    assert count_exchanges(df) <= 2
    assert join_strategies(df) == []
    (cols,) = read_schema_columns(df)
    assert set(cols) == {"l_returnflag", "l_quantity", "l_extendedprice"}


def test_q75_levenshtein_is_blocked_equi_join(spark, sf_dir):
    df = q("q75_levenshtein_neardup", spark, sf_dir)
    # prefix blocking makes it an ordinary hash/merge equi-join —
    # never an all-pairs nested loop over the corpus
    assert not has_cartesian_or_bnlj(df)
    assert set(join_strategies(df)) <= {
        "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    }


def test_q76_gapfill_no_nested_loop(spark, sf_dir):
    df = q("q76_gapfill_daily", spark, sf_dir)
    assert not has_cartesian_or_bnlj(df)
    # daily pre-agg + span agg + spine⋈daily join exchanges, bounded
    assert count_exchanges(df) <= 4


def test_q78_vocab_pairs_broadcast_only(spark, sf_dir):
    df = q("q78_lang_vocab_overlap", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the lang-pair cross is a DELIBERATE broadcast nested loop over
    # #languages rows (tiny); the heavy (lang, tok) distinct must be
    # hash exchanges, with no shuffle join anywhere
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_r01_rollup_scans_raw_events_once(spark, sf_dir):
    df = q("r01_multires_rollup", spark, sf_dir)
    # raw events are scanned exactly once, at the eager hourly
    # checkpoint — the returned plan re-aggregates the materialized
    # partials and contains NO parquet scan at all (day and week never
    # touch raw rows)
    assert len(read_schema_columns(df)) == 0
    assert join_strategies(df) == []


def test_q85_map_explode_single_agg_shuffle(spark, sf_dir):
    df = q("q85_map_props_functions", spark, sf_dir)
    # from_json + explode are narrow; the prop-key agg (+ tiny result
    # sort) are the only exchanges
    assert count_exchanges(df) <= 2
    assert join_strategies(df) == []


def test_q86_arrow_map_single_group_shuffle(spark, sf_dir):
    df = q("q86_mad_arrow", spark, sf_dir)
    # one groupBy(user_id) exchange feeds the Arrow kernel (+ result sort)
    assert count_exchanges(df) <= 2
    (cols,) = read_schema_columns(df)
    assert set(cols) == {"user_id", "value"}  # projection pruned


def test_r04_chunking_is_zero_shuffle(spark, sf_dir):
    df = q("r04_rag_chunking", spark, sf_dir)
    assert count_exchanges(df) == 0
    assert join_strategies(df) == []


def test_r05_classifier_is_zero_shuffle_narrow_projection(spark, sf_dir):
    df = q("r05_hashed_quality_classifier", spark, sf_dir)
    assert count_exchanges(df) == 0
    assert join_strategies(df) == []


def test_r06_span_novelty_is_two_shuffles_no_self_join(spark, sf_dir):
    df = q("r06_span_novelty", spark, sf_dir)
    # span window + doc rollup; the explode is narrow. The third
    # exchange is the RoundRobin repartition INSIDE the persisted
    # shingle inventory (shingled_cached) — it executes once per
    # session at cache-fill, not per query, and exists to spread the
    # single-row-group local scan; the per-query data movement is
    # still exactly the two shuffles.
    assert count_exchanges(df) == 3
    assert join_strategies(df) == []


def test_r09_bpe_pairs_single_count_shuffle_topk(spark, sf_dir):
    from eeg_data_lake_spark.plans import explain_string

    df = q("r09_bpe_pair_counts", spark, sf_dir)
    assert count_exchanges(df) == 1
    # top-k must be TakeOrderedAndProject, never a global sort
    assert "TakeOrderedAndProject" in explain_string(df)


def test_r10_audit_is_single_aggregation(spark, sf_dir):
    df = q("r10_constraint_audit", spark, sf_dir)
    # one reduce to a single row; the stack/explode is in-row
    assert count_exchanges(df) <= 1
    assert join_strategies(df) == []


def test_r13_bench_matrix_is_broadcast_corpus_never_shuffles(spark, sf_dir):
    from eeg_data_lake_spark.plans import explain_string

    df = q("r13_semantic_decontamination", spark, sf_dir)
    # scoring every (corpus, bench) pair has no equi-key by design, so
    # the correct physical join is a nested loop whose INNER side is
    # the broadcast bench matrix — a map-side loop over a tiny
    # relation, not the unbounded-pair hazard BNLJ usually signals.
    # What must hold: the bench side broadcasts, and the corpus side
    # reaches the scorer without any shuffle.
    strategies = join_strategies(df)
    assert strategies and all(
        s == "BroadcastNestedLoopJoin" for s in strategies
    )
    assert "BroadcastExchange" in explain_string(df)
    assert count_exchanges(df) == 1  # the per-vector rollup only


def test_r17_funnel_is_one_events_exchange(spark, sf_dir):
    df = q("r17_event_funnel", spark, sf_dir)
    # ONE shuffle of events for the three chained user_id windows (the
    # per-user groupBy reuses that partitioning); the only other
    # exchange is the 3-row stage sort. No joins — the oracle's three
    # join-backs collapse into window aggregates.
    assert count_exchanges(df) == 2
    assert join_strategies(df) == []
    (cols,) = read_schema_columns(df)
    assert set(cols) == {"user_id", "event_type", "ts"}


def test_r18_cohort_single_events_shuffle(spark, sf_dir):
    df = q("r18_cohort_retention", spark, sf_dir)
    # window exchange + countDistinct two-phase + result sort; never a
    # first-touch self-join
    assert count_exchanges(df) <= 3
    assert join_strategies(df) == []
    (cols,) = read_schema_columns(df)
    assert set(cols) == {"user_id", "ts"}  # event cols pruned


def test_r22_cooccurrence_never_self_joins(spark, sf_dir):
    df = q("r22_event_cooccurrence", spark, sf_dir)
    # pair generation is map-side from per-basket arrays — the oracle's
    # quadratic self-join must not appear in the physical plan
    assert join_strategies(df) == []
    assert not has_cartesian_or_bnlj(df)
    assert count_exchanges(df) <= 3


def test_r23_ewma_fold_one_exchange(spark, sf_dir):
    df = q("r23_ewma_fold", spark, sf_dir)
    assert count_exchanges(df) == 2  # user_id agg + result sort
    assert join_strategies(df) == []


def test_z05_cms_probe_is_broadcast(spark, sf_dir):
    df = q("z05_cms_heavy_hitters", spark, sf_dir)
    # the candidate probe (≤ depth×25 rows) must broadcast against the
    # sketch cells; the cell build itself must stay a plain hash agg
    strategies = join_strategies(df)
    assert strategies and all(s == "BroadcastHashJoin" for s in strategies)
    assert not has_cartesian_or_bnlj(df)


def test_z06_triangles_read_checkpointed_edges(spark, sf_dir):
    df = q("z06_neardup_triangles", spark, sf_dir)
    # the edge list is materialized once; without it the LSH band join
    # re-runs three times (16 join nodes in the explain vs 4 here —
    # AQE's formatted output lists each of the 2 triangle joins twice)
    assert len(join_strategies(df)) <= 4
    assert not has_cartesian_or_bnlj(df)


def test_r27_segment_dedup_shape(spark, sf_dir):
    """Narrow segment construction; the document-frequency WINDOW over
    the seg exchange and the doc re-agg are the only wide stages (the
    old freq-agg + seg-join-back shape paid a third exchange and a
    broadcast growing with distinct segments — r10 optimization)."""
    df = q("r27_crossdoc_segment_dedup", spark, sf_dir)
    assert count_exchanges(df) <= 2
    assert join_strategies(df) == []
    assert not has_cartesian_or_bnlj(df)


def test_r30_prefix_sum_has_no_single_task_window(spark, sf_dir):
    """The global running total must come from the two-phase scan, not
    an unpartitioned window: every Window node in the plan partitions
    by pid."""
    df = q("r30_token_shard_packing", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.split("\n"):
        if "Window" in line and "windowspecdefinition" in line:
            assert "pid" in line  # partitioned — never a global sort
    assert not has_cartesian_or_bnlj(df)


def test_r31_prefix_filter_joins_are_hash(spark, sf_dir):
    df = q("r31_prefix_filter_jaccard", spark, sf_dir)
    assert not has_cartesian_or_bnlj(df)
    assert set(join_strategies(df)) <= {
        "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    }


def test_r32_acf_single_exchange(spark, sf_dir):
    """lag window + corr agg share the user_id partitioning."""
    df = q("r32_lag_autocorrelation", spark, sf_dir)
    assert count_exchanges(df) == 1
    assert join_strategies(df) == []


def test_r33_rolling_p95_two_exchanges_no_joins(spark, sf_dir):
    """Daily pre-agg + RANGE window; the in-row percentile adds none."""
    df = q("r33_rolling_p95", spark, sf_dir)
    assert count_exchanges(df) == 2
    assert join_strategies(df) == []


def test_r36_q5_shape_single_exchange_all_broadcast(spark, sf_dir):
    """Six-way join: lineitem never shuffles for the dims; the only
    exchange is the final 25-group agg."""
    df = q("r36_local_supplier_volume", spark, sf_dir)
    assert count_exchanges(df) == 1
    assert set(join_strategies(df)) == {"BroadcastHashJoin"}


def test_r37_q21_shape_fact_shuffles_once(spark, sf_dir):
    """EXISTS/NOT-EXISTS become scalar predicates over aggregation
    reuse — no self-join of lineitem, no nested loop."""
    df = q("r37_sole_failing_suppliers", spark, sf_dir)
    assert not has_cartesian_or_bnlj(df)
    assert set(join_strategies(df)) <= {"BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"}
    assert count_exchanges(df) <= 4


def test_explain_cost_report_shape(spark, sf_dir):
    from eeg_data_lake_spark.plans import explain_cost

    df = q("q02_top_revenue_customers", spark, sf_dir)
    c = explain_cost(df)
    assert c["exchanges"] >= 1
    assert "BroadcastHashJoin" in c["joins"]
    assert not c["has_nested_loop"]
    assert c["python_stages"] == 0
    # AQE hides codegen fusion until THIS DataFrame's own plan has
    # executed (a write goes through a separate QueryExecution)
    assert c["codegen_spans"] is None
    df.collect()
    assert explain_cost(df)["codegen_spans"] >= 1
    assert any("o_orderdate" in f or "c_custkey" in f or f for f in c["pushed_filters"])
    # the pandas-UDF signal fires where it should
    c2 = explain_cost(q("q94_bandpass_user_series", spark, sf_dir))
    assert c2["python_stages"] >= 1


def test_r45_audio_decode_is_narrow(spark, sf_dir):
    """Codec path: scan → Arrow-batched Python map — NO exchange; 100 TB
    of payloads must stream through without a shuffle."""
    df = q("r45_audio_pcm_features", spark, sf_dir)
    assert count_exchanges(df) == 0
    assert join_strategies(df) == []


def test_r46_frame_energy_is_narrow(spark, sf_dir):
    df = q("r46_audio_frame_energy", spark, sf_dir)
    assert count_exchanges(df) == 0


def test_r47_dsir_broadcasts_bucket_stats(spark, sf_dir):
    """The 256-row bucket-stat side must broadcast; the corpus side
    shuffles only for its own aggregations (doc-bucket counts + the
    per-doc fold + stats), never for the stats join."""
    df = q("r47_dsir_importance_resample", spark, sf_dir)
    strategies = join_strategies(df)
    assert "BroadcastHashJoin" in strategies
    # every join is a broadcast variant — the corpus never shuffles for
    # a join. The BNLJ rows are the broadcast cross join attaching the
    # ONE-row corpus totals to the 256-row bucket stats (the subtree is
    # listed once per consumer in the formatted plan).
    assert set(strategies) <= {"BroadcastHashJoin", "BroadcastNestedLoopJoin"}
    assert count_exchanges(df) <= 6


def test_r67_cusum_single_data_exchange(spark, sf_dir):
    """All four window families (mean, prefix sum, extrema, argmax)
    share the ONE user_id hash exchange; the second exchange is the
    presentation ORDER BY. The rn=1 argmax must push down to a
    WindowGroupLimit, not rank every row."""
    df = q("r67_cusum_changepoint", spark, sf_dir)
    assert count_exchanges(df) == 2
    assert join_strategies(df) == []
    assert "WindowGroupLimit" in explain_string(df)


def test_r68_holt_single_data_exchange(spark, sf_dir):
    """Ordered struct fold: one user_id exchange for the collect_list
    groupBy, plus the presentation sort. The fold itself is an in-row
    expression — no joins, no extra shuffle."""
    df = q("r68_holt_forecast", spark, sf_dir)
    assert count_exchanges(df) == 2
    assert join_strategies(df) == []


def test_r69_benford_no_joins(spark, sf_dir):
    """Digit histogram: one partial-aggregated 9-row shuffle + the
    presentation sort; the corpus total rides a window over the 9-row
    aggregate, never a join or second scan."""
    df = q("r69_benford_audit", spark, sf_dir)
    assert count_exchanges(df) == 2
    assert join_strategies(df) == []
    assert not has_cartesian_or_bnlj(df)


def test_r70_gini_all_broadcast(spark, sf_dir):
    """Both dims broadcast — the fact table shuffles only for its own
    aggregations (per-customer revenue, per-nation windows, final
    nation agg, presentation sort), never for a join."""
    df = q("r70_gini_concentration", spark, sf_dir)
    assert set(join_strategies(df)) == {"BroadcastHashJoin"}
    assert not has_cartesian_or_bnlj(df)
    assert count_exchanges(df) <= 4


def test_r71_auc_bin_table_windows(spark, sf_dir):
    """The corpus-sized pass is the bin groupBy; the cumulative window
    and final agg ride the bounded bin table (one single-partition
    exchange, deliberate and documented)."""
    df = q("r71_auc_rank", spark, sf_dir)
    assert count_exchanges(df) == 2
    assert join_strategies(df) == []


def test_whole_stage_codegen_spans(spark, sf_dir):
    """Hot relational paths must stay inside whole-stage codegen — the
    'expressions JVM-side' claim made testable. AQE hides codegen until
    runtime, so the pin runs on an AQE-off twin session; span counts
    are exact (a drop means an expression fell out of codegen, a rise
    means a pipeline fractured into more stages)."""
    import re

    s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    expected = {
        "q01_pricing_summary": 2,        # scan..partial-agg | final-agg
        "q02_top_revenue_customers": 5,  # per join/agg stage
        "q16_order_total_zscore": 3,
        # 4 → 3 in round 10: the O(df)-memory pair expansion (two
        # stacked generates) FUSES into one codegen span where the old
        # flatten(transform(...)) buffer broke the pipeline
        "q33_neardup_shingle_jaccard": 3,
    }
    for name, n_spans in expected.items():
        df = REGISTRY[name].spark_fn(s2, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            s2._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "codegen"
            )
        )
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees", txt)
        assert m, f"{name}: no codegen report"
        assert int(m.group(1)) == n_spans, f"{name}: {m.group(1)} != {n_spans}"


def test_r78_attribution_is_joinless_single_pass(spark, sf_dir):
    """First-touch via min-of-struct folds into the conversion agg —
    events read once, no window, no join; exchanges are the two
    aggregations' own plus the presentation sort."""
    df = q("r78_first_touch_attribution", spark, sf_dir)
    assert count_exchanges(df) <= 3
    assert join_strategies(df) == []


def test_z18_z19_gram_path_shape(spark, sf_dir):
    """ExactSubstr plan invariants: grams are assembled per OUTPUT row
    from an exploded position sequence (never a transform the Generate
    would re-evaluate per row — the shingle pathology), the gram
    string never reaches an exchange in the hashed mode, and the plan
    stays at its 3 data shuffles (gram count, interval window, final
    sort) with no cartesian."""
    import re

    for name in ("z18_exact_substring_dedup", "z19_exact_substring_hashed"):
        df = q(name, spark, sf_dir)
        plan = explain_string(df)
        assert not has_cartesian_or_bnlj(df), name
        # posexplode(sequence(...)) — positions, not prebuilt strings
        assert "posexplode(sequence" in plan, name
        assert "array_join" in plan, name
        assert count_exchanges(df) <= 4, (name, count_exchanges(df))


def test_z20_pipeline_scans_documents_exactly_three_times(spark, sf_dir):
    """z20's composition invariant: ONE scan feeds the dedup+ESD+gate
    chain (persisted deduped corpus + count-window dup-gram detection
    keep every downstream consumer on the pinned subtree), and the
    contamination probe's two sides (bench + probe over ORIGINAL
    text) account for the rest. Without the persist the dedup
    semi-join recomputes per consumer — measured 11 scans, i.e.
    re-reading and re-shuffling a 100 TB corpus several extra times."""
    df = q("z20_curation_pipeline_esd", spark, sf_dir)
    plan = explain_string(df)
    import re

    # count distinct scan NODES (formatted mode repeats each node in
    # the tree, its detail section, and cached-relation child plans)
    n_scans = len(set(re.findall(r"\((\d+)\) Scan parquet", plan)))
    assert n_scans == 3, n_scans
    assert not has_cartesian_or_bnlj(df)


def test_r27_segments_assembled_per_row(spark, sf_dir):
    """r27 builds each doc's segment array once and posexplodes the
    materialized column; two data shuffles (seg window + doc rollup),
    no join back."""
    import re

    df = q("r27_crossdoc_segment_dedup", spark, sf_dir)
    plan = explain_string(df)
    assert "posexplode" in plan and "array_join" in plan
    assert not has_cartesian_or_bnlj(df)


def test_q10_has_no_single_group_percentile_buffer(spark, sf_dir):
    """q10 must ride the rank-based exact plan: Spark's `percentile`
    aggregate (ObjectHashAggregate over a value→count map) puts each
    group's ENTIRE value distribution on one reducer — with 3
    l_returnflag groups that is a corpus-sized narrow stage at scale.
    The rank plan's heavy shuffle is groupBy(flag, price) — parallel
    over distinct values — and min/max ride the same shuffle."""
    df = q("q10_price_percentiles", spark, sf_dir)
    plan = explain_string(df)
    assert "ObjectHashAggregate" not in plan
    assert "percentile" not in plan.lower()
    # the fused single-window path (r10 optimization) reads lineitem
    # exactly ONCE in total: min/max ride the quantile shuffle and the
    # key set comes from the same grouped relation (the old shape paid
    # a second 1-column scan for the key-set branch plus a broadcast
    # join to attach it)
    scans = read_schema_columns(df)
    assert len(scans) == 1 and "l_extendedprice" in scans[0]
    assert count_exchanges(df) <= 2
    assert join_strategies(df) == []
