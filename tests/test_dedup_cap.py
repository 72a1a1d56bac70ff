"""The hot-shingle document-frequency cap must actually DO something:
plant a boilerplate shingle in every document, set a cap that drops
its posting list, and require (a) the pair space stays bounded and
(b) survivors still match a DuckDB oracle applying the same cap."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.dedup import shingle_jaccard_pairs, shingled

BOILER = "all rights reserved worldwide"  # 4 tokens → contains hot shingles


@pytest.fixture(scope="module")
def corpus(spark):
    """40 docs, each ending with the same boilerplate sentence; docs
    2k/2k+1 are near-dups of each other (long shared body), everything
    else is unrelated."""
    rows = []
    for k in range(20):
        body = " ".join(f"tok{k}x{i}" for i in range(30))
        rows.append((2 * k, f"{body} {BOILER}"))
        # near-dup: same body, one token changed
        rows.append((2 * k + 1, f"{body.replace(f'tok{k}x7', 'CHANGED')} {BOILER}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _oracle_pairs(pdf: pd.DataFrame, cap: int, tau: float) -> set[tuple]:
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(tl) - 2),
               i -> tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2])) AS sl
      FROM (SELECT doc_id, string_split(text, ' ') AS tl FROM documents)
    ),
    sizes AS (SELECT doc_id, len(sl) AS n FROM sh),
    inv AS (SELECT doc_id, unnest(sl) AS shingle FROM sh),
    hot AS (SELECT shingle FROM inv GROUP BY shingle HAVING count(*) > {cap}),
    inv2 AS (SELECT * FROM inv WHERE shingle NOT IN (SELECT shingle FROM hot)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM inv2 a JOIN inv2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b, shared,
           round(CAST(shared AS DOUBLE) / (na.n + nb.n - shared), 6) AS jaccard
    FROM pairs
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= {tau}
    """
    return {tuple(r) for r in con.sql(sql).fetchall()}


def test_cap_bounds_pairs_and_matches_capped_oracle(spark, corpus):
    sh = shingled(corpus).select("doc_id", F.size("sl").alias("n"), "sl")
    cap = 10  # boilerplate shingles have df=40 > 10 → dropped
    got_rows = shingle_jaccard_pairs(sh, tau=0.4, max_shingle_df=cap).collect()
    got = {(r.doc_a, r.doc_b, r.shared, r.jaccard) for r in got_rows}
    want = _oracle_pairs(corpus.toPandas(), cap, 0.4)
    assert got == want
    # exactly the 20 planted near-dup pairs survive; the 780-pair
    # boilerplate clique never materializes
    assert {(a, b) for a, b, *_ in got} == {(2 * k, 2 * k + 1) for k in range(20)}


def test_uncapped_boilerplate_blows_up_pair_space(spark, corpus):
    """Control: without the cap the boilerplate connects every doc to
    every other — the quadratic blow-up the cap exists to stop."""
    sh = shingled(corpus).select("doc_id", F.size("sl").alias("n"), "sl")
    uncapped = shingle_jaccard_pairs(sh, tau=0.0, max_shingle_df=10**9)
    n_docs = corpus.count()
    assert uncapped.count() == n_docs * (n_docs - 1) // 2
    capped = shingle_jaccard_pairs(sh, tau=0.0, max_shingle_df=10)
    assert capped.count() == 20
