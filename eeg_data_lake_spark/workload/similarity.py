"""Similarity-search workload over the embeddings table (north-star):
brute-force cosine top-k as the verified baseline, LSH-bucketed ANN as
the scale path.

Scale design: brute-force is O(queries × corpus) — correct and fine
when the query set is small and broadcast (the corpus streams, nothing
shuffles). The ANN variant hashes the corpus into sign-pattern buckets
(random hyperplanes, seeded) so each query only scores its bucket —
the 100 TB shape, where the corpus side is also indexed.

All vector math uses JVM HOFs (zip_with/aggregate) over double-cast
arrays — sequential fold, same evaluation order as the DuckDB oracle's
list_dot_product, so doubles agree bit-for-bit and round(…,6) hashes
stably.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.registry import register, t

N_QUERIES = 10
TOP_K = 5


def as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a):
    return F.sqrt(dot(a, a))


def embedding_topk(d, n_queries: int = 5, k: int = 3):
    """Top-``k`` cosine neighbors for the ``n_queries`` lowest doc_ids
    of an embedded corpus ``d`` with columns (doc_id, e: array<double>)
    — the retrieval block q98 (text) and z17 (image) share. Scoring
    broadcasts the query vectors (the q37 plan); the != join is the
    reviewed tiny-broadcast BNLJ whitelisted in the plan sweep."""
    from pyspark.sql import Window

    # norms hoisted to per-row columns BEFORE the pair join: each
    # l2norm is an O(dim) interpreted HOF fold, and computing it per
    # PAIR would triple the fold work n_queries-fold (bit-identical
    # result — the same fold value is reused, not re-derived)
    dn = d.withColumn("n", l2norm(F.col("e")))
    q = dn.filter(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("n").alias("qn"),
    )
    # zero-norm guard (the q93/q99 convention): cosine of a zero
    # vector is NULL → sorts LAST under desc; an unguarded 0/0 would
    # be NaN, which sorts FIRST and hijacks every top-k slot
    den = F.col("qn") * F.col("n")
    scored = dn.join(
        F.broadcast(q), F.col("doc_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("doc_id").alias("neighbor_id"),
        F.round(
            F.when(den > 0, dot(F.col("qe"), F.col("e")) / den),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


@register(
    "q37_cosine_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             round(CASE WHEN sqrt(list_dot_product(q.qe, q.qe))
                             * sqrt(list_dot_product(v.e, v.e)) > 0
                        THEN list_dot_product(q.qe, v.e)
                             / (sqrt(list_dot_product(q.qe, q.qe))
                                * sqrt(list_dot_product(v.e, v.e)))
                   END, 6) AS cosine
      FROM q JOIN v ON v.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """,
    tags=("similarity", "ann-baseline"),
)
def q37_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (U5's retrieval semantics): broadcast
    the query vectors, stream the corpus, rank per query. Ties broken
    by neighbor_id so the result set is deterministic.

    Norms are computed ONCE per corpus row / per query row *before*
    the broadcast join, so each of the |q| x |corpus| scored pairs
    evaluates a single array fold (the dot product) instead of three —
    measured ~2x on the sf0.1 corpus, and the effect grows with the
    query count. The fold itself stays the sequential JVM HOF so
    doubles agree bit-for-bit with the oracle's list_dot_product.

    Delegates to ``embedding_topk`` (the q98/z17 retrieval block) so
    the norm-hoist / zero-norm-guard / tiebreak conventions live in
    ONE plan — previously a line-for-line copy that had already
    started drifting (the den>0 guard reached q93/q99 but not here)."""
    v = t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        as_double(F.col("embedding")).alias("e"),
    )
    return embedding_topk(v, n_queries=N_QUERIES, k=TOP_K)


@register(
    "q38_embedding_norm_stats",
    oracle="""
    SELECT label,
           count(*) AS n_vectors,
           CAST(max(len(embedding)) AS INTEGER) AS dim,
           round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 6)
               AS avg_norm,
           round(avg(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding)), 6)
               AS avg_component_mean
    FROM embeddings
    GROUP BY label
    """,
    tags=("similarity", "arrays"),
)
def q38_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-HOF aggregate surface (F.aggregate / zip_with) over the
    embedding column: per-label norm and component statistics."""
    v = t(spark, sf_dir, "embeddings").select(
        "label", as_double(F.col("embedding")).alias("e")
    )
    return v.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.max(F.size("e")).alias("dim"),
        F.round(F.avg(l2norm(F.col("e"))), 6).alias("avg_norm"),
        F.round(
            F.avg(
                F.aggregate(F.col("e"), F.lit(0.0), lambda a, x: a + x)
                / F.size("e")
            ),
            6,
        ).alias("avg_component_mean"),
    )


#: deterministic random hyperplanes for the LSH path (seeded; 6 planes
#: over 64 dims → 64 buckets).
_LSH_SEED = 42
_LSH_PLANES = 6
# single source of truth for the embedding dimension: a hard-coded
# copy would null-pad zip_with dot products on a dim change, silently
# hashing every vector to bucket 0 (LSH degenerates to a full scan)
from eeg_data_lake_spark.functions.embed import EMBED_DIM as _LSH_DIM  # noqa: E402


def _hyperplanes() -> list[list[float]]:
    rng = np.random.default_rng(_LSH_SEED)
    return rng.standard_normal((_LSH_PLANES, _LSH_DIM)).round(6).tolist()


@register(
    "q93_lsh_ann_topk",
    oracle=None,  # verified rows-only + recall assertion in tests
    tags=("similarity", "ann", "lsh"),
)
def q93_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH with MULTI-PROBE: bucket =
    sign-pattern of 6 seeded hyperplane dot products; each query
    probes its own bucket plus every bucket at Hamming distance 1
    (the standard multi-probe trick — a near neighbor most likely
    differs in exactly the one hyperplane whose margin was smallest,
    so flipping single bits recovers most of the recall that strict
    bucketing loses). Candidate volume ≈ (1+planes)/2^planes of the
    corpus — still a tiny fraction; the bucket equi-join replaces the
    full cross product. Recall vs exact q37 asserted in tests."""
    planes = _hyperplanes()
    v = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )

    def bucket(col):
        bits = [
            F.when(
                dot(col, F.array(*[F.lit(x) for x in plane])) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
            for i, plane in enumerate(planes)
        ]
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    vb = v.withColumn("bucket", bucket(F.col("e"))).withColumn(
        "nrm", l2norm(F.col("e"))
    )
    probe_set = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << i))
            for i in range(len(planes))
        ],
    )
    q = (
        vb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qnrm"),
            F.explode(probe_set).alias("qbucket"),
        )
    )
    # norms precomputed per side BEFORE the join (the q37 pattern:
    # one fold per scored pair, not three); zero-norm vectors score
    # NULL, and desc ordering puts NULLs last — a NaN would instead
    # sort FIRST and hijack every top-k slot
    den = F.col("qnrm") * F.col("nrm")
    scored = (
        vb.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.when(den > 0, dot(F.col("qe"), F.col("e")) / den), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine")
    )


#: IVF coarse quantizer: seeded spherical centroids, nprobe buckets
#: scanned per query.
_IVF_K = 16
_IVF_NPROBE = 4


def _centroids() -> list[list[float]]:
    rng = np.random.default_rng(_LSH_SEED + 1)
    c = rng.standard_normal((_IVF_K, _LSH_DIM))
    return (c / np.linalg.norm(c, axis=1, keepdims=True)).round(6).tolist()


@register(
    "q99_ivf_ann_topk",
    oracle=None,  # approximate by construction → recall-tested vs q37
    tags=("similarity", "ann", "ivf"),
)
def q99_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via an IVF-style coarse quantizer: every vector is assigned
    to its nearest of K seeded spherical centroids (the inverted-file
    cell); each query scans only its ``nprobe`` closest cells. The
    second scale path next to LSH (q93): cells shrink the candidate
    set ~K/nprobe-fold, and on a cluster the corpus is partitioned BY
    cell so a probe reads only its partitions. Recall vs the exact
    q37 is asserted in tests.
    """
    return _ivf_topk(spark, sf_dir, _centroids(), [0.0] * _IVF_K)


def _ivf_topk(
    spark: SparkSession, sf_dir: str, cents: list, bias: list
) -> DataFrame:
    """Shared IVF plan: cell affinity of vector x to centroid c_i is
    ``dot(x, c_i) + bias_i``. With unit-norm centroids and zero bias
    that is spherical assignment (q99); with ``bias_i = -||c_i||²/2``
    it is exact euclidean nearest-centroid, matching Lloyd's k-means
    assignment up to the constant ||x||² (q89)."""
    v = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )

    def cell_dots(col):
        return F.array(
            *[
                dot(col, F.array(*[F.lit(x) for x in c])) + F.lit(b)
                for c, b in zip(cents, bias)
            ]
        )

    vd = v.withColumn("dots", cell_dots(F.col("e"))).withColumn(
        "nrm", l2norm(F.col("e"))
    )
    corpus = vd.withColumn(
        "cell",
        F.array_position(F.col("dots"), F.array_max(F.col("dots"))).cast("int"),
    ).drop("dots")

    ranked = F.transform(
        F.col("dots"), lambda d, i: F.struct(d.alias("d"), i.alias("i"))
    )
    probes = F.transform(
        F.slice(F.reverse(F.array_sort(ranked)), 1, _IVF_NPROBE),
        lambda s: s["i"] + 1,
    )
    q = (
        vd.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qnrm"),
            F.explode(probes).alias("probe"),
        )
        .select(
            "query_id", "qe", "qnrm", F.col("probe").cast("int").alias("cell")
        )
    )
    # one fold per scored pair (norms hoisted, q37 pattern); zero-norm
    # vectors score NULL → sorted last, never NaN-first
    den = F.col("qnrm") * F.col("nrm")
    scored = (
        corpus.join(
            F.broadcast(q),
            (corpus.cell == q.cell) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.when(den > 0, dot(F.col("qe"), F.col("e")) / den), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine")
    )


@register(
    "q89_ivf_learned_topk",
    oracle=None,  # approximate by construction → recall-tested vs q37
    tags=("similarity", "ann", "ivf", "kmeans"),
)
def q89_ivf_learned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q99's IVF ANN with a TRAINED coarse quantizer: distributed
    Lloyd's k-means (ml/kmeans.py, K=16, 4 rounds, deterministic init)
    replaces the seeded random hyperplane centroids, and cell
    assignment becomes exact euclidean nearest-centroid via the
    ``dot(x,c) - ||c||²/2`` bias trick — all still JVM expressions, the
    training cost is one small iterative job amortized over every
    subsequent query. This is the production IVF build order (train
    quantizer → partition corpus by cell → probe); recall vs exact
    q37 is gated in tests alongside the seeded variant."""
    from eeg_data_lake_spark.ml.kmeans import kmeans_fit

    v = t(spark, sf_dir, "embeddings")
    model = kmeans_fit(v, k=_IVF_K, max_iter=4)
    cents = model.centroids.tolist()
    bias = [-0.5 * float((c * c).sum()) for c in model.centroids]
    return _ivf_topk(spark, sf_dir, cents, bias)


@register(
    "q57_label_centroids",
    oracle="""
    SELECT label,
           pos - 1          AS dim,
           round(avg(v), 6) AS centroid
    FROM (
      SELECT label,
             unnest(embedding)                  AS v,
             generate_subscripts(embedding, 1)  AS pos
      FROM embeddings
    )
    GROUP BY label, dim
    """,
    tags=("similarity", "centroid"),
)
def q57_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids — the building block of IVF coarse
    quantizers (q99), semantic-dedup cluster pruning, and domain-mix
    audits (distance of a new corpus to each domain centroid).

    posexplode flattens (vector → 64 scalar rows) BEFORE the shuffle,
    so the aggregate is a plain (label, dim) hash agg with map-side
    partial averaging — at 100 TB this moves |labels|x|dims| partials
    per task, not vectors. The alternative (collect vectors per label,
    average driver-side) is the anti-pattern this operator replaces."""
    e = t(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("v"), 6).alias("centroid"))
    )


@register(
    "r07_int8_quantization_error",
    oracle="""
    WITH v AS (
      SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    q AS (
      SELECT label, e,
             list_max([abs(x) FOR x IN e]) / 127.0 AS s
      FROM v
    ),
    d AS (
      SELECT label, e, s,
             [CASE WHEN x >= 0 THEN floor(x / s + 0.5)
                   ELSE ceil(x / s - 0.5) END * s FOR x IN e] AS dq
      FROM q WHERE s > 0
    ),
    m AS (
      SELECT label, s,
             list_sum([(e[i] - dq[i]) ** 2
                       FOR i IN generate_series(1, len(e))]) / len(e) AS mse,
             list_dot_product(e, dq)
               / (sqrt(list_dot_product(e, e))
                  * sqrt(list_dot_product(dq, dq))) AS cos
      FROM d
    )
    SELECT label,
           count(*) AS n_vectors,
           round(avg(s), 6)   AS avg_scale,
           round(avg(mse), 6) AS avg_mse,
           round(min(cos), 6) AS min_cosine
    FROM m
    GROUP BY label
    """,
    tags=("similarity", "quantization", "int8"),
)
def r07_int8_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization audit: scale each vector
    by max|x|/127, round-half-away-from-zero to int8, dequantize, and
    report the per-label reconstruction error (MSE and worst cosine
    vs the original) — the go/no-go measurement before shipping an
    embedding corpus at 4× smaller storage (float32 → int8), which at
    100 TB of vectors is the difference between fitting in cluster
    memory or not.

    Entirely JVM HOFs (transform / zip_with / aggregate folds) — the
    quantize-dequantize round trip is a narrow projection, and the
    only shuffle is the tiny per-label rollup. Rounding is spelled as
    floor(x/s + .5) / ceil(x/s − .5) so Spark and DuckDB agree on
    ties by construction rather than by each engine's round() mode."""
    v = t(spark, sf_dir, "embeddings").select(
        "label", as_double(F.col("embedding")).alias("e")
    )
    s = F.array_max(F.transform(F.col("e"), F.abs)) / 127.0
    q = v.withColumn("s", s).filter(F.col("s") > 0)
    dq = F.transform(
        F.col("e"),
        lambda x: F.when(x >= 0, F.floor(x / F.col("s") + 0.5))
        .otherwise(F.ceil(x / F.col("s") - 0.5))
        * F.col("s"),
    )
    d = q.withColumn("dq", dq)
    mse = (
        F.aggregate(
            F.zip_with(F.col("e"), F.col("dq"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.size("e")
    )
    cos = dot(F.col("e"), F.col("dq")) / (
        l2norm(F.col("e")) * l2norm(F.col("dq"))
    )
    m = d.select("label", "s", mse.alias("mse"), cos.alias("cos"))
    return m.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.avg("s"), 6).alias("avg_scale"),
        F.round(F.avg("mse"), 6).alias("avg_mse"),
        F.round(F.min("cos"), 6).alias("min_cosine"),
    )


#: product quantization geometry: 64-dim vectors → 8 subspaces × 8 dims,
#: 16 centroids per subspace (4-bit codes → 32× smaller than float32).
_PQ_M = 8
_PQ_K = 16
_PQ_TRAIN_IDS = 512  # codebooks train on the first N vec_ids (sample)
_PQ_ITERS = 10


def _pq_codebooks(sample: np.ndarray) -> np.ndarray:
    """(m, k, sub_dim) codebooks via per-subspace Lloyd's k-means on
    the (unit-normalized) training sample. Deterministic: init = first
    k sample rows, fixed iteration count, empty cells keep their
    previous centroid. Training is sample-based on purpose — that is
    how PQ codebooks are built in production (a bounded sample fits
    one machine; the CORPUS encode step is the distributed part)."""
    n, dim = sample.shape
    sub = dim // _PQ_M
    books = np.empty((_PQ_M, _PQ_K, sub))
    for m in range(_PQ_M):
        x = sample[:, m * sub:(m + 1) * sub]
        c = x[:_PQ_K].copy()
        if len(c) < _PQ_K:
            # degenerate sample (tiny corpus): tile rows up to k —
            # duplicate centroids are harmless, argmin picks the first
            c = np.resize(c, (_PQ_K, sub))
        for _ in range(_PQ_ITERS):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(_PQ_K):
                mask = assign == j
                if mask.any():
                    c[j] = x[mask].mean(axis=0)
        books[m] = c
    return books


def _pq_setup(v):
    """ONE driver collect builds everything driver-sided: the
    unit-normalized training sample (vec_id < _PQ_TRAIN_IDS), the
    codebooks, and the query vectors — N_QUERIES < _PQ_TRAIN_IDS, so
    the query rows are a SLICE of the same collected rows and no
    second Spark job runs. Returns None when the corpus has no usable
    training rows (empty table, or all rows zero-norm) — callers
    degrade to an empty result instead of a numpy AxisError."""
    rows = v.filter(F.col("vec_id") < _PQ_TRAIN_IDS).collect()
    if not rows:
        return None
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    ok = nrm[:, 0] > 0
    if not ok.any():
        return None
    books = _pq_codebooks(mat[ok] / nrm[ok])
    queries = {
        int(i): mat[j]
        for j, i in enumerate(ids)
        if i < N_QUERIES and nrm[j, 0] > 0
    }
    return books, queries


def _pq_encode(x, books):
    """(n, m) int codes: per subspace, the nearest codebook row
    (argmin squared distance via the dot-product expansion). These
    codes are what a stored PQ index persists instead of floats."""
    sub = books.shape[2]
    codes = np.empty((len(x), _PQ_M), dtype=np.int64)
    for m in range(_PQ_M):
        xs = x[:, m * sub:(m + 1) * sub]
        d2 = (
            (xs ** 2).sum(1)[:, None]
            - 2 * xs @ books[m].T
            + (books[m] ** 2).sum(1)[None, :]
        )
        codes[:, m] = d2.argmin(axis=1)
    return codes


def _pq_topk(spark, v, setup, cents=None):
    """Shared z02/z03 execution: encode + (optional cell mask) + ADC
    score + partition-local top-k in ONE mapInPandas pass, then a tiny
    global top-k window. ``cents`` (IVF centroids) switches on the
    per-query probe-set mask — the only difference between plain PQ
    and IVF-PQ."""
    import pandas as pd

    if setup is None:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, approx_cosine double"
        )
    books, queries = setup
    sub = books.shape[2]
    tables, probes = {}, None
    for qid, q in queries.items():
        qn = q / np.linalg.norm(q)
        tables[qid] = np.stack(
            [books[m] @ qn[m * sub:(m + 1) * sub] for m in range(_PQ_M)]
        )
    if cents is not None:
        probes = {
            qid: set(
                np.argsort(
                    -(cents @ (q / np.linalg.norm(q)))
                )[:_IVF_NPROBE].tolist()
            )
            for qid, q in queries.items()
        }

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(x, axis=1, keepdims=True)
            ok = nrm[:, 0] > 0
            x, ids = x[ok] / nrm[ok], pdf["vec_id"].to_numpy(np.int64)[ok]
            if not len(ids):
                continue
            cells = (x @ cents.T).argmax(axis=1) if cents is not None else None
            codes = _pq_encode(x, books)
            out = []
            for qid, tbl in tables.items():
                keep = ids != qid
                if probes is not None:
                    keep &= np.isin(cells, list(probes[qid]))
                if not keep.any():
                    continue
                approx = tbl[
                    np.arange(_PQ_M)[:, None], codes[keep].T
                ].sum(axis=0)
                cand_ids = ids[keep]
                # prune with the FINAL ordering (rounded score desc,
                # neighbor_id asc): a bare argsort over unrounded
                # scores is unstable under ties, so which boundary
                # candidate survived depended on Arrow batch layout —
                # nondeterministic output run-to-run
                top = np.lexsort((cand_ids, -np.round(approx, 6)))[:TOP_K]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cand_ids[top],
                            "approx_cosine": np.round(approx[top], 6),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = v.mapInPandas(
        score, schema="query_id long, neighbor_id long, approx_cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "approx_cosine")
    )


@register(
    "z02_pq_ann_topk",
    oracle=None,  # approximate by construction -> recall-tested vs q37
    tags=("similarity", "ann", "pq"),
)
def z02_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via product quantization with asymmetric-distance scoring
    (Jegou et al., PAMI 2011): unit-normalize, split each vector into
    8 subspaces, encode each subspace as its nearest of 16 codebook
    centroids (4-bit code => 32x smaller than float32 — the memory
    story that makes billion-vector search fit a cluster), then score
    queries against CODES only: one (m x k) lookup table per query,
    approx cosine = sum_m table[m, code_m]. Third scale path next to
    LSH (q93) and IVF (q99): those prune candidates, PQ compresses
    them — and z03 composes both.

    Plan: codebooks train on a driver-sized sample and ship in the
    task closure; the corpus is encoded AND scored in one Arrow-batched
    mapInPandas pass that emits only each partition's per-query top-k
    (k x partitions rows, never |queries| x |corpus|), and one tiny
    window takes the global top-k. No shuffle touches the corpus.
    Recall vs the exact q37 is gated in tests/test_ann_recall.py."""
    v = t(spark, sf_dir, "embeddings").select("vec_id", "embedding").filter(
        F.col("embedding").isNotNull()
    )
    return _pq_topk(spark, v, _pq_setup(v))


@register(
    "z03_ivfpq_ann_topk",
    oracle=None,  # doubly approximate (prune + quantize) -> recall-tested
    tags=("similarity", "ann", "ivf", "pq"),
)
def z03_ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the production billion-vector ANN composition (FAISS's
    default index family) — IVF cells prune WHICH vectors each query
    scores (q99's coarse quantizer, nprobe cells per query), PQ codes
    compress HOW each candidate is scored (z02's codebooks + ADC
    lookup). Orthogonal savings: cells cut candidates ~K/nprobe-fold,
    codes cut bytes-per-candidate 32-fold, so the scan cost per query
    drops by both factors at once.

    Implementation IS z02's single-pass plan (_pq_topk) with the IVF
    centroids passed in — the per-query probe-set mask inside the
    pass is the only delta, so fixes to either path apply to both by
    construction. On a cluster the corpus is partitioned BY cell and
    a probe touches nprobe partitions; the mask stands in for that
    partition pruning. Recall vs exact q37 is gated in
    tests/test_ann_recall.py."""
    v = t(spark, sf_dir, "embeddings").select("vec_id", "embedding").filter(
        F.col("embedding").isNotNull()
    )
    cents = np.array(_centroids())  # q99's seeded spherical centroids
    return _pq_topk(spark, v, _pq_setup(v), cents=cents)


@register(
    "r13_semantic_decontamination",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    bench AS (SELECT vec_id AS bench_id, e AS be FROM v WHERE vec_id % 50 = 0),
    scored AS (
      SELECT v.vec_id,
             list_dot_product(v.e, bench.be)
               / (sqrt(list_dot_product(v.e, v.e))
                  * sqrt(list_dot_product(bench.be, bench.be))) AS cosine
      FROM v JOIN bench ON v.vec_id % 50 <> 0
    )
    SELECT vec_id,
           round(max(cosine), 6) AS max_bench_cosine,
           CAST(sum(CASE WHEN cosine >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bench_hits
    FROM scored
    GROUP BY vec_id
    HAVING round(max(cosine), 6) >= 0.25
    """,
    tags=("similarity", "decontamination", "curation"),
)
def r13_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval-set decontamination: flag training vectors whose
    embedding is suspiciously close to any benchmark vector (vec_id %
    50 == 0 stands in for the eval set) — the cosine-space complement
    to q69's n-gram overlap, which paraphrased or translated
    contamination slips past. Emits per-vector worst-case benchmark
    similarity and a hit count at the drop threshold.

    The q37 plan shape: per-side norms hoisted, the benchmark matrix
    BROADCAST (eval sets are small by construction), corpus streams
    through one fold per scored pair and aggregates per vector — the
    corpus never shuffles, so this runs at scan speed at 100 TB. The
    HAVING keeps the report to the suspicious tail (the full scored
    set is the same query without it)."""
    v = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    ).withColumn("nrm", l2norm(F.col("e")))
    bench = v.filter(F.col("vec_id") % 50 == 0).select(
        F.col("e").alias("be"), F.col("nrm").alias("bnrm")
    )
    scored = v.filter(F.col("vec_id") % 50 != 0).join(F.broadcast(bench)).select(
        "vec_id",
        (dot(F.col("e"), F.col("be")) / (F.col("nrm") * F.col("bnrm"))).alias(
            "cosine"
        ),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.round(F.max("cosine"), 6).alias("max_bench_cosine"),
            F.sum((F.col("cosine") >= 0.5).cast("long")).alias("n_bench_hits"),
        )
        .filter(F.col("max_bench_cosine") >= 0.25)
    )


#: Matryoshka audit: how many leading dims the truncated ranking keeps
_MRL_DIMS = 16
_MRL_K = 10


@register(
    "r60_matryoshka_recall",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), q AS (
      SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < {_MRL_K}
    ), tops AS (
      SELECT q.qid,
        (SELECT list(vec_id) FROM (
           SELECT b.vec_id FROM v b WHERE b.vec_id <> q.qid
           ORDER BY list_dot_product(q.qe, b.e)
                    / (sqrt(list_dot_product(q.qe, q.qe))
                       * sqrt(list_dot_product(b.e, b.e))) DESC,
                    b.vec_id
           LIMIT {_MRL_K}) t) AS full_top,
        (SELECT list(vec_id) FROM (
           SELECT b.vec_id FROM v b WHERE b.vec_id <> q.qid
           ORDER BY list_dot_product(q.qe[1:{_MRL_DIMS}], b.e[1:{_MRL_DIMS}])
                    / (sqrt(list_dot_product(q.qe[1:{_MRL_DIMS}],
                                             q.qe[1:{_MRL_DIMS}]))
                       * sqrt(list_dot_product(b.e[1:{_MRL_DIMS}],
                                               b.e[1:{_MRL_DIMS}]))) DESC,
                    b.vec_id
           LIMIT {_MRL_K}) t) AS trunc_top
      FROM q
    )
    SELECT qid AS query_id,
           CAST(len(list_intersect(full_top, trunc_top)) AS INTEGER)
               AS n_overlap,
           round(len(list_intersect(full_top, trunc_top)) / {_MRL_K}.0, 2)
               AS recall_at_{_MRL_K}
    FROM tops
    """,
    tags=("similarity", "embedding", "matryoshka", "audit"),
)
def r60_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-truncation retrieval audit (the Matryoshka/MRL
    question): for each query, how much of the exact top-10
    neighbor set survives when cosine ranking uses only the first
    16 of 64 dims — the measurement that decides whether a
    cheap truncated index can serve first-stage retrieval. Both
    rankings ride the one broadcast-query scoring pass (the q37 plan,
    two rank columns from one join); overlap is an in-row
    array_intersect. Fully oracle-checked against LATERAL top-k
    twins."""
    from pyspark.sql import Window

    tr = lambda c: F.slice(c, 1, _MRL_DIMS)  # noqa: E731
    # norms (full + truncated) hoisted to per-row columns before the
    # broadcast join — the q37 pattern: each l2norm is an O(dim) HOF
    # fold, and evaluating four of them per PAIR recomputed the
    # query-side norms |corpus| times each for bit-identical values
    v = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("e"))
        .withColumn("n_full", l2norm(F.col("e")))
        .withColumn("n_tr", l2norm(tr(F.col("e"))))
    )
    q = v.filter(F.col("vec_id") < _MRL_K).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("n_full").alias("qn_full"),
        F.col("n_tr").alias("qn_tr"),
    )
    scored = v.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        (dot(F.col("qe"), F.col("e"))
         / (F.col("qn_full") * F.col("n_full"))).alias("cos_full"),
        (dot(tr(F.col("qe")), tr(F.col("e")))
         / (F.col("qn_tr") * F.col("n_tr"))).alias("cos_tr"),
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("cos_full"), F.asc("vec_id"))
    wt = Window.partitionBy("qid").orderBy(F.desc("cos_tr"), F.asc("vec_id"))
    ranked = scored.select(
        "qid", "vec_id",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wt).alias("rt"),
    )
    sets = ranked.groupBy("qid").agg(
        F.sort_array(
            F.collect_list(F.when(F.col("rf") <= _MRL_K, F.col("vec_id")))
        ).alias("full_top"),
        F.sort_array(
            F.collect_list(F.when(F.col("rt") <= _MRL_K, F.col("vec_id")))
        ).alias("trunc_top"),
    )
    n_overlap = F.size(F.array_intersect("full_top", "trunc_top"))
    return sets.select(
        F.col("qid").alias("query_id"),
        n_overlap.cast("int").alias("n_overlap"),
        F.round(n_overlap / float(_MRL_K), 2).alias(f"recall_at_{_MRL_K}"),
    )


# --------------------------------------------------------------------
# r64: hybrid search — BM25 + vector cosine fused with RRF
# --------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_RRF_K = 60
_HYBRID_TOPN = 20
_HYBRID_QUERY_DOC = 0


@register(
    "r64_hybrid_search_rrf",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
    ), stats AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
    ), df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), qterms AS (
      SELECT DISTINCT term FROM tf WHERE doc_id = {_HYBRID_QUERY_DOC}
    ), contrib AS (
      SELECT tf.doc_id, tf.term,
             ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * ({_BM25_K1} + 1.0)
             / (tf.tf + {_BM25_K1}
                * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl)) AS c
      FROM tf
      JOIN qterms USING (term)
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
      WHERE tf.doc_id <> {_HYBRID_QUERY_DOC}
    ), bm25 AS (
      SELECT doc_id,
             list_reduce(
               list_transform(
                 list_sort(list(struct_pack(t := term, c := c))), x -> x.c),
               (a, x) -> a + x) AS score
      FROM contrib GROUP BY doc_id
    ), br AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS r_bm25
      FROM bm25
    ), v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), qv AS (SELECT e AS qe FROM v WHERE vec_id = {_HYBRID_QUERY_DOC}),
    cosr AS (
      SELECT v.vec_id AS doc_id,
             row_number() OVER (
               ORDER BY list_dot_product(qv.qe, v.e)
                        / (sqrt(list_dot_product(qv.qe, qv.qe))
                           * sqrt(list_dot_product(v.e, v.e))) DESC,
                        v.vec_id) AS r_cos
      FROM v, qv WHERE v.vec_id <> {_HYBRID_QUERY_DOC}
    )
    SELECT br.doc_id,
           CAST(br.r_bm25 AS BIGINT) AS r_bm25,
           CAST(cosr.r_cos AS BIGINT) AS r_cos,
           round(1.0 / ({_RRF_K} + br.r_bm25)
                 + 1.0 / ({_RRF_K} + cosr.r_cos), 6) AS rrf
    FROM br JOIN cosr USING (doc_id)
    ORDER BY 1.0 / ({_RRF_K} + br.r_bm25)
             + 1.0 / ({_RRF_K} + cosr.r_cos) DESC,
             br.doc_id
    LIMIT {_HYBRID_TOPN}
    """,
    tags=("similarity", "text", "bm25", "hybrid", "rrf"),
)
def r64_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, the modern RAG first stage: rank the corpus
    by real BM25 (k1=1.2, b=0.75, Lucene idf) against the query doc's
    terms AND by embedding cosine against its vector, then fuse with
    reciprocal-rank fusion (1/(60+r) each side) — RRF needs no score
    calibration between the two systems, which is why it's the
    production default. Only documents matching ≥1 query term enter
    the lexical ranking (the inverted-index contract: a real engine
    scores postings, never the corpus).

    Scale shape: tf/df/dl are one explode + hash aggs (the q43
    machinery); query terms broadcast; each doc's BM25 sums its
    matched-term contributions in a term-sorted fold (the r47
    order-pinning discipline, bit-equal to the oracle's list_reduce);
    the vector side is the q37 broadcast-query pass; fusion is a join
    of two |ranked| relations + TakeOrderedAndProject."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    tf = tf.localCheckpoint(eager=True)  # reused 4×: dl, df, qterms, contrib
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = (
        tf.filter(F.col("doc_id") == _HYBRID_QUERY_DOC).select("term").distinct()
    )
    contrib = (
        tf.filter(F.col("doc_id") != _HYBRID_QUERY_DOC)
        .join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_t.join(F.broadcast(qterms), "term")), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.struct(
                F.col("term").alias("t"),
                (
                    F.log(
                        (F.col("n_docs") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)
                        + 1.0
                    )
                    * F.col("tf")
                    * (_BM25_K1 + 1.0)
                    / (
                        F.col("tf")
                        + _BM25_K1
                        * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                    )
                ).alias("c"),
            ).alias("x"),
        )
    )
    bm25 = (
        contrib.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("x")).alias("xs"))
        .select(
            "doc_id",
            F.aggregate(
                F.expr("slice(xs, 2, size(xs) - 1)"),
                F.element_at("xs", 1).getField("c"),
                lambda a, x: a + x.getField("c"),
            ).alias("score"),
        )
    )
    br = bm25.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("r_bm25"),
    )
    # norm hoisted before the broadcast (the q37 pattern): per-pair
    # l2norm folds recomputed the query norm |corpus| times
    v = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("e"))
        .withColumn("nrm", l2norm(F.col("e")))
    )
    qv = v.filter(F.col("vec_id") == _HYBRID_QUERY_DOC).select(
        F.col("e").alias("qe"), F.col("nrm").alias("qnrm")
    )
    cos = (
        v.filter(F.col("vec_id") != _HYBRID_QUERY_DOC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            (
                dot(F.col("qe"), F.col("e"))
                / (F.col("qnrm") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    cosr = cos.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cosine"), F.asc("doc_id")))
        .alias("r_cos"),
    )
    rrf = 1.0 / (_RRF_K + F.col("r_bm25")) + 1.0 / (_RRF_K + F.col("r_cos"))
    return (
        br.join(cosr, "doc_id")
        .orderBy(rrf.desc(), F.asc("doc_id"))
        .limit(_HYBRID_TOPN)
        .select(
            "doc_id",
            F.col("r_bm25").cast("long").alias("r_bm25"),
            F.col("r_cos").cast("long").alias("r_cos"),
            F.round(rrf, 6).alias("rrf"),
        )
    )
