"""Partitioning-independence under config perturbation: the same
queries must hash-match their oracles with AQE DISABLED and a hostile
shuffle-partition count (7). Catches results that silently depend on
partition count or AQE coalescing — the classic source of
'works-on-my-cluster' drift for order-sensitive folds, collect_list
surfaces, prefix sums and sampled/salted plans. SQL confs are
session-scoped, so a newSession() perturbs only this module."""

from __future__ import annotations

import pytest

from eeg_data_lake_spark.workload import REGISTRY
from tests.oracle_utils import compare, run_oracle

#: queries whose SEMANTICS could plausibly leak partitioning: ordered
#: folds, collect_list/sort_array, windows, prefix sums, sampling,
#: posting lists, asof, interval pairs, percentile grids
SENSITIVE = [
    "q17_first_order_per_customer",
    "q20_event_type_pivot",
    "q33_neardup_shingle_jaccard",
    "q43_tfidf_top_terms",
    "q50_asof_join_last_order",
    "r14_rolling_distinct_users",
    "r17_event_funnel",
    "r23_ewma_fold",
    "r24_weighted_sample",
    "r30_token_shard_packing",
    "r42_weighted_median",
    "r47_dsir_importance_resample",
    "r53_interval_overlap_join",
    "r56_quantile_normalization",
    "z05_cms_heavy_hitters",
    "r62_psi_drift",
    "r63_survival_life_table",
    "r64_hybrid_search_rrf",
    "r67_cusum_changepoint",
    "r68_holt_forecast",
    "r70_gini_concentration",
    "r71_auc_rank",
    "r72_fulfillment_latency",
    "r75_l_diversity_audit",
    "r76_t_closeness_audit",
]


@pytest.fixture(scope="module")
def perturbed(spark):
    s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "7")
    return s2


@pytest.mark.parametrize("name", SENSITIVE)
def test_oracle_parity_under_perturbation(perturbed, sf_dir, name):
    e = REGISTRY[name]
    problems = compare(
        e.spark_fn(perturbed, sf_dir), run_oracle(e.oracle, sf_dir), name
    )
    assert not problems, "\n".join(problems)


@pytest.fixture(scope="module")
def tiny_splits(spark):
    s3 = spark.newSession()
    s3.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    s3.conf.set("spark.sql.files.openCostInBytes", "0")
    return s3


@pytest.mark.parametrize(
    "name",
    [
        "q16_order_total_zscore",   # window over scan order
        "q33_neardup_shingle_jaccard",
        "r23_ewma_fold",
        "r30_token_shard_packing",  # prefix sum over partition ids
        "r53_interval_overlap_join",
        "r67_cusum_changepoint",    # prefix sum over window order
        "r68_holt_forecast",        # ordered struct fold
    ],
)
def test_oracle_parity_with_tiny_scan_splits(tiny_splits, sf_dir, name):
    """64 KB input splits multiply scan partitions and reorder rows —
    results must not notice."""
    e = REGISTRY[name]
    problems = compare(
        e.spark_fn(tiny_splits, sf_dir), run_oracle(e.oracle, sf_dir), name
    )
    assert not problems, "\n".join(problems)
