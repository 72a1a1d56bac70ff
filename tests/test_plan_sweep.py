"""Engine-wide plan-invariant sweep over the ENTIRE registry: no
query may plan a CartesianProduct, and a BroadcastNestedLoopJoin is
allowed only for the whitelisted 1-row global-scalar broadcast
pattern (attach one aggregate row — a corpus total, a query vector, a
global prior — to every row of a bounded relation; O(|rows|) work, no
pair blow-up). A new query that introduces an unreviewed BNLJ or any
cartesian fails here and must restructure or justify itself on the
list below.

Plan-building only — nothing executes, so the sweep stays cheap even
though it touches all queries.
"""

from __future__ import annotations

import re

from eeg_data_lake_spark.plans import explain_string
from eeg_data_lake_spark.workload import REGISTRY

#: queries whose BNLJ is the reviewed 1-row-broadcast scalar attach
#: (build side is an aggregate with no grouping keys, or a broadcast
#: literal query vector) — every entry's docstring documents it
BNLJ_OK = {
    "q37_cosine_topk",             # broadcast query vector row
    "q71_language_mixture_sample", # global min language share
    "q78_lang_vocab_overlap",      # global vocab size
    "q98_text_embedding_topk",     # broadcast query embedding row
    "z17_image_embedding_topk",    # broadcast query embedding row (5)
    "r13_semantic_decontamination",# broadcast eval-centroid row
    "r26_temperature_mixture",     # global Z normalizer
    "r29_domain_quality_filter",   # global quality threshold row
    "r35_chi2_independence",       # grand-total cell
    "r38_vocab_coverage",          # total token mass
    "r43_target_encoding",         # global prior row
    "r44_anova_sources",           # grand mean/SS totals
    "r47_dsir_importance_resample",# corpus totals onto 256 buckets
    "r60_matryoshka_recall",       # broadcast query row
    "r62_psi_drift",               # reference decile edges row
    "r63_survival_life_table",     # cohort size row
    "r64_hybrid_search_rrf",       # corpus stats (avgdl, N) row
    "r65_rfm_segmentation",        # global quintile boundaries row
    "z24_streaming_chunk_ingest",  # 1-row corpus agg × 1-row store agg
    "z25_chunkstore_lifecycle",    # 1-row put/check/gc report aggs
    "z40_streaming_chunk_maintained",  # z24's dedup_report: same 1-row aggs
}


def test_no_cartesian_and_only_whitelisted_bnlj(spark, sf_dir):
    # Plan construction is independent per query (the streaming/
    # lifecycle entries even RUN their ingest to produce the terminal
    # frame, which is why this sweep was the suite's single most
    # expensive test at ~176 s) — build the plans from a small driver
    # thread pool (guide §2.6: overlap independent jobs; plan
    # construction is mostly driver/catalyst work, so 8 in flight beats
    # 4 (A/B'd: 77 s → 64 s) without starving the 4-core test session).
    from concurrent.futures import ThreadPoolExecutor

    def plan_of(item):
        name, e = item
        return name, explain_string(e.spark_fn(spark, sf_dir))

    with ThreadPoolExecutor(max_workers=8) as pool:
        plans = list(pool.map(plan_of, sorted(REGISTRY.items())))

    cartesian, bnlj_new, bnlj_seen = [], [], set()
    for name, plan in plans:
        if re.search(r"CartesianProduct", plan):
            cartesian.append(name)
        if re.search(r"BroadcastNestedLoopJoin", plan):
            bnlj_seen.add(name)
            if name not in BNLJ_OK:
                bnlj_new.append(name)
    assert not cartesian, f"cartesian products: {cartesian}"
    assert not bnlj_new, (
        f"unreviewed BroadcastNestedLoopJoin in: {bnlj_new} — restructure "
        "(window-over-aggregate or broadcast hash join) or review and add "
        "to BNLJ_OK with the 1-row justification"
    )
    # the whitelist must not rot: every entry still plans its BNLJ
    stale = BNLJ_OK - bnlj_seen
    assert not stale, f"BNLJ_OK entries no longer plan a BNLJ: {stale}"
