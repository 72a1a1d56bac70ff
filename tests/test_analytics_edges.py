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
