"""ANN quality gates: both approximate paths (LSH q39, IVF q60) must
recover a meaningful fraction of the exact top-k (q37) — the check
that keeps 'approximate' from silently meaning 'wrong'."""

from __future__ import annotations

import pytest

from eeg_data_lake_spark.workload import REGISTRY


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


@pytest.fixture(scope="module")
def exact(spark, sf_dir):
    return _topk_sets(REGISTRY["q37_cosine_topk"].spark_fn(spark, sf_dir))


@pytest.mark.parametrize("name,min_recall", [
    ("q93_lsh_ann_topk", 0.15),
    ("q99_ivf_ann_topk", 0.25),
    ("q89_ivf_learned_topk", 0.25),
    ("z02_pq_ann_topk", 0.2),
    ("z03_ivfpq_ann_topk", 0.1),
])
def test_ann_recall_vs_exact(spark, sf_dir, exact, name, min_recall):
    approx = _topk_sets(REGISTRY[name].spark_fn(spark, sf_dir))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    # embeddings are near-uniform random (max pairwise cosine ~0.5), the
    # hardest possible case for bucketed ANN — the gate is deliberately
    # modest; planted-duplicate data would score near 1.0
    assert recall >= min_recall, f"{name} recall {recall:.2f}"


def test_ann_results_are_subset_of_corpus(spark, sf_dir):
    approx = REGISTRY["q99_ivf_ann_topk"].spark_fn(spark, sf_dir)
    rows = approx.collect()
    assert all(r.query_id != r.neighbor_id for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.cosine)
    # per query: descending cosine, at most TOP_K rows
    for cos in per_q.values():
        assert len(cos) <= 5
        assert cos == sorted(cos, reverse=True)


def test_pq_results_are_deterministic(spark, sf_dir):
    """Codebook training (sample + fixed init + fixed iterations) and
    encoding are fully deterministic — two invocations must agree
    row-for-row, or the 'stored index' framing is a lie."""
    a = REGISTRY["z02_pq_ann_topk"].spark_fn(spark, sf_dir).collect()
    b = REGISTRY["z02_pq_ann_topk"].spark_fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pq_paths_degrade_gracefully_on_empty_corpus(spark, tmp_path):
    """An empty (or all-NULL-embedding) corpus yields an empty top-k,
    not a numpy AxisError from norm() over a 0-row matrix."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
                "label": pa.array([], pa.int32()),
            }
        ),
        f"{sf}/embeddings.parquet",
    )
    for name in ("z02_pq_ann_topk", "z03_ivfpq_ann_topk"):
        out = REGISTRY[name].spark_fn(spark, sf)
        assert out.count() == 0
        assert out.columns == ["query_id", "neighbor_id", "approx_cosine"]


def test_zero_norm_vector_never_hijacks_topk(spark):
    """A zero-norm embedding scores NULL (den>0 guard) and sorts LAST:
    unguarded 0/0 would be NaN, which sorts FIRST under desc and
    occupies a top-k slot for every query."""
    from eeg_data_lake_spark.workload.similarity import embedding_topk

    rows = [(i, [float(i), 1.0]) for i in range(6)] + [(9, [0.0, 0.0])]
    d = spark.createDataFrame(rows, "doc_id long, e array<double>")
    out = embedding_topk(d, n_queries=2, k=3).collect()
    assert len(out) == 6  # 2 queries x k
    assert all(r.neighbor_id != 9 for r in out)
    assert all(r.cosine is not None for r in out)
