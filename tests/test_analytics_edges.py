"""Unit-level semantics for the analytics workload — the properties the
DuckDB oracle can't articulate: funnel stage ordering, EWMA numeric
parity with a reference fold, co-occurrence vs brute force, and the
Efraimidis–Spirakis sample matching an independent Python replica."""

from __future__ import annotations

import datetime as dt
import hashlib
import itertools

import numpy as np
import pandas as pd

from eeg_data_lake_spark.workload.registry import REGISTRY


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, et, float(i))
            for i, (u, et, m) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_funnel_respects_stage_order(spark, tmp_path):
    """A view BEFORE signup must not count toward stage 2, and a
    purchase before the first qualifying view must not count toward
    stage 3 — the strictness that separates a funnel from three
    independent counts."""
    df = _events(
        spark,
        [
            # user 1: view → signup → purchase-less  ⇒ stage 1 only
            (1, "view", 0), (1, "signup", 10),
            # user 2: signup → purchase → view       ⇒ stages 1, 2 (view@30)
            (2, "signup", 0), (2, "purchase", 10), (2, "view", 30),
            # user 3: the clean path                  ⇒ stages 1, 2, 3
            (3, "signup", 0), (3, "view", 5), (3, "purchase", 9),
        ],
    )
    path = str(tmp_path / "events.parquet")
    df.toPandas().to_parquet(path)
    got = {
        r.stage: r.users
        for r in REGISTRY["r17_event_funnel"].spark_fn(spark, str(tmp_path)).collect()
    }
    assert got == {"1_signup": 3, "2_view": 2, "3_purchase": 1}


def test_ewma_matches_reference_fold(spark, sf_dir):
    from eeg_data_lake_spark.workload.analytics import EWMA_ALPHA

    got = (
        REGISTRY["r23_ewma_fold"].spark_fn(spark, sf_dir).toPandas().set_index("user_id")
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    for uid, grp in itertools.islice(ev.groupby("user_id"), 25):
        acc = None
        for x in grp["value"]:
            acc = x if acc is None else EWMA_ALPHA * x + (1 - EWMA_ALPHA) * acc
        assert got.loc[uid, "n_events"] == len(grp)
        assert abs(got.loc[uid, "ewma"] - round(acc, 6)) < 1e-6, uid


def test_cooccurrence_matches_bruteforce(spark, sf_dir):
    got = {
        (r.type_a, r.type_b): r.n_user_days
        for r in REGISTRY["r22_event_cooccurrence"].spark_fn(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["d"] = ev["ts"].dt.date
    want: dict[tuple[str, str], int] = {}
    for _, grp in ev.groupby(["user_id", "d"]):
        for a, b in itertools.combinations(sorted(set(grp["event_type"])), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


def test_weighted_sample_matches_python_replica(spark, sf_dir):
    """Recompute the Efraimidis–Spirakis selection independently
    (hashlib md5 → u → key = u^(1/w)) and require the exact same
    (lang, doc_id, rn) selection — proves the sample is a pure
    deterministic function of the data, not of partitioning."""
    from eeg_data_lake_spark.workload.analytics import SAMPLE_K

    got = (
        REGISTRY["r24_weighted_sample"]
        .spark_fn(spark, sf_dir)
        .select("lang", "doc_id", "rn")
        .collect()
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def key(doc_id, w):
        v = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        # ranking uses the 6-rounded key (cross-engine pow-ulp safety)
        return round(((v + 0.5) / 2**32) ** (1.0 / w), 6)

    docs["k"] = [key(i, w) for i, w in zip(docs["doc_id"], docs["n_chars"])]
    want = set()
    for lang, grp in docs.groupby("lang"):
        top = grp.sort_values(["k", "doc_id"], ascending=[False, True]).head(SAMPLE_K)
        for rn, doc_id in enumerate(top["doc_id"], start=1):
            want.add((lang, doc_id, rn))
    assert {(r.lang, r.doc_id, r.rn) for r in got} == want
    # heavier docs must dominate the sample: mean weight of selected
    # docs exceeds the corpus mean (the property that makes it a
    # WEIGHTED sample rather than uniform)
    sel = docs[docs["doc_id"].isin({r.doc_id for r in got})]
    assert sel["n_chars"].mean() > docs["n_chars"].mean()


def test_temperature_mixture_flattens_distribution(spark, sf_dir):
    """α < 1 must FLATTEN the language distribution: the kept-count
    spread (max/min) is strictly tighter than the input spread, and the
    total kept lands near the budget (binomial noise aside)."""
    from eeg_data_lake_spark.workload.analytics import MIX_BUDGET

    rows = REGISTRY["r26_temperature_mixture"].spark_fn(spark, sf_dir).collect()
    n = {r.lang: r.n_docs for r in rows}
    kept = {r.lang: r.kept for r in rows}
    assert all(kept[lang] <= n[lang] for lang in n)
    in_spread = max(n.values()) / max(1, min(n.values()))
    out_spread = max(kept.values()) / max(1, min(kept.values()))
    if in_spread > 1.5:  # only meaningful when the input is skewed
        assert out_spread < in_spread
    total = sum(kept.values())
    assert abs(total - MIX_BUDGET) < MIX_BUDGET * 0.5 + 20


def test_bigram_lm_scores_repetition_low(spark, tmp_path):
    """A degenerate looping doc must score (strictly) lower average
    negative log-prob than a doc of unique words — the property that
    makes LM scoring a REPETITION-loving metric, which is exactly why
    production filters pair it with q53-style repetition caps."""
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["spam spam spam spam spam spam spam", "one two three four five six"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [35, 27],
        }
    )
    docs.to_parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r.avg_neg_logp
        for r in REGISTRY["r25_bigram_lm_quality"].spark_fn(spark, str(tmp_path)).collect()
    }
    # 'spam spam' is the only bigram of doc 1 and is certain under the
    # model (p=1 ⇒ nll=0); the unique-word doc's bigrams are all
    # unique contexts (p=1 each too)... unless they share words — they
    # don't — so both are 0 here EXCEPT the cross-doc context sharing.
    # With this tiny corpus both end at 0.0; assert the metric is
    # non-negative and present for both, and that a mixed doc scores
    # higher than the pure loop.
    assert got[1] == 0.0 and got[2] == 0.0
    docs2 = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a a a a a a a a", "a b a c a d a e"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [15, 15],
        }
    )
    docs2.to_parquet(str(tmp_path / "documents.parquet"))
    got2 = {
        r.doc_id: r.avg_neg_logp
        for r in REGISTRY["r25_bigram_lm_quality"].spark_fn(spark, str(tmp_path)).collect()
    }
    # now contexts ARE shared: after 'a' the loop doc always sees 'a'
    # (majority continuation → low nll) while the varied doc keeps
    # hitting 1/n continuations → strictly higher nll
    assert got2[2] > got2[1]


def test_r63_km_survival_from_life_table(spark, sf_dir):
    """The KM survival curve derived from the life table must start
    at S <= 1, be strictly computed as the running product of
    (1 - hazard) in duration order, and stay monotonically
    non-increasing; censored users must make the at-risk counts
    exceed total churned (right-censoring actually happened)."""
    rows = sorted(
        REGISTRY["r63_survival_life_table"].spark_fn(spark, sf_dir).collect(),
        key=lambda r: r.duration_days,
    )
    assert rows, "life table empty — churn gap no longer fires on testdata"
    s, prev = 1.0, None
    total_churned = 0
    for r in rows:
        assert 0 < r.hazard <= 1
        assert r.n_churned <= r.n_at_risk
        s *= 1.0 - r.n_churned / r.n_at_risk
        assert prev is None or s <= prev
        prev = s
        total_churned += r.n_churned
    # right-censoring: at the earliest churn duration, the risk set
    # includes censored users too, so it must exceed all churn events
    assert rows[0].n_at_risk > total_churned
