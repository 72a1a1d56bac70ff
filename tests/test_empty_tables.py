"""Zero-row robustness: every table empty (correct schemas, no rows)
through a representative slice of the registry. An empty partition, an
all-filtered-out day, or a brand-new tenant is a normal Monday at
100 TB — no plan may crash on it (driver-side .collect() loops, numpy
norms over (0,d) matrices, sequence(0,-1) and min()-of-nothing are the
usual suspects, several already guarded in the operators)."""

from __future__ import annotations

import pytest

from eeg_data_lake_spark.workload.registry import REGISTRY
from tests.oracle_utils import TABLES

#: representative per family: aggs, windows, joins, dedup, similarity,
#: curation, text, prefix sums, graph-iterative, sketches
EMPTY_SAFE = [
    "q01_pricing_summary",
    "q02_top_revenue_customers",
    "q10_price_percentiles",
    "q16_order_total_zscore",
    "q19_user_sessionization",
    "q27_top_tokens",
    "q32_exact_dedup_groups",
    "q33_neardup_shingle_jaccard",
    "q36_embedding_neardup_pairs",
    "q37_cosine_topk",
    "q50_asof_join_last_order",
    "r17_event_funnel",
    "r27_crossdoc_segment_dedup",
    "r30_token_shard_packing",
    "r33_rolling_p95",
    "r34_ks_drift",
    "r36_local_supplier_volume",
    "r38_vocab_coverage",
    "z05_cms_heavy_hitters",
    # round-3 session additions
    "r45_audio_pcm_features",
    "r46_audio_frame_energy",
    "r47_dsir_importance_resample",
    "r48_keyframe_selection",
    "r50_bloom_prefilter_join",
    "r51_asof_join_tolerance",
    "r52_k_anonymity_audit",
    "z12_phash_neardup",
    "z13_audio_spectral",
    "r53_interval_overlap_join",
    "r55_table_version_diff",
    "r56_quantile_normalization",
    "r57_table_profile",
    "r58_referential_integrity",
    "r59_key_skew_report",
    "r60_matryoshka_recall",
    "r61_training_export",
    "z14_rolling_hll_wau",
    "z15_bpe_apply",
    "r62_psi_drift",
    "r63_survival_life_table",
    "r64_hybrid_search_rrf",
    "r65_rfm_segmentation",
    "r66_hierarchy_revenue_shares",
    "r67_cusum_changepoint",
    "r68_holt_forecast",
    "r69_benford_audit",
    "r70_gini_concentration",
    "r71_auc_rank",
    "r72_fulfillment_latency",
    "r73_calendar_seasonality",
    "r74_dp_noisy_counts",
    "r75_l_diversity_audit",
    "r76_t_closeness_audit",
    "r77_theil_decomposition",
    "r78_first_touch_attribution",
    "r79_time_to_convert",
    "r80_linear_attribution",
    "q98_text_embedding_topk",
    "z17_image_embedding_topk",
    "z18_exact_substring_dedup",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory, sf_dir):
    """Single-FILE parquet per table (like the driver's layout — the
    DuckDB oracle globs files, not Spark part-directories), zero rows,
    schemas copied from the real testdata."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = tmp_path_factory.mktemp("empty_sf")
    for tbl in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{tbl}.parquet")
        pq.write_table(
            pa.Table.from_pylist([], schema=schema), str(p / f"{tbl}.parquet")
        )
    return str(p)


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_runs_on_empty_tables(spark, empty_dir, name):
    """No crash, and the same row count DuckDB's oracle produces on the
    identical empty layout (global aggregates legitimately emit rows —
    r17's funnel reports three zero-count stages, matching its SQL)."""
    from tests.oracle_utils import run_oracle

    df = REGISTRY[name].spark_fn(spark, empty_dir)
    n = df.count()
    assert len(df.columns) > 0
    oracle = REGISTRY[name].oracle
    if oracle:
        assert n == len(run_oracle(oracle, empty_dir))
    else:
        # rows-only: empty inputs yield empty outputs, except global
        # summary aggregates that legitimately report one zero row
        assert n == {"z15_bpe_apply": 1}.get(name, 0)


def test_r58_reports_zero_not_null_on_empty_children(spark, empty_dir):
    """sum() over an empty child aggregates to NULL; the audit must
    coalesce it to 0 like the oracle's count(*) (value-level check —
    the row-count sweep above can't see this)."""
    rows = (
        REGISTRY["r58_referential_integrity"].spark_fn(spark, empty_dir).collect()
    )
    assert len(rows) == 4
    for r in rows:
        assert r.n_orphans == 0 and r.n_rows == 0
