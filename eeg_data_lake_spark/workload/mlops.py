"""ML workload entries (U5/U6). Iterative fitting is not
SQL-expressible, so both are rows-only checks; numeric behavior is
asserted in tests/test_ml.py on analytically-known data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.registry import register, t


@register(
    "q95_ml_priority_classifier",
    oracle=None,  # iterative LBFGS fit → rows-only
    tags=("ml", "classification"),
)
def q95_ml_priority_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6 pipeline end-to-end on the orders table: predict order
    priority from (totalprice, order month, weekday). Returns the
    held-out split's predictions (indexer → assembler → scaler → LR,
    the exact stage chain of /root/reference/main/train_model.py:66-98).
    """
    from eeg_data_lake_spark.ml.classify import train_classifier

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").alias("f_price"),
        F.month("o_orderdate").cast("double").alias("f_month"),
        F.dayofweek("o_orderdate").cast("double").alias("f_dow"),
    )
    res = train_classifier(
        o, label_col="o_orderpriority", feature_cols=["f_price", "f_month", "f_dow"]
    )
    return res.predictions.select(
        "o_orderkey", F.col("prediction").cast("long").alias("predicted_label")
    )


@register(
    "q96_ridge_embedding_regression",
    oracle=None,  # matrix solve → rows-only
    tags=("ml", "regression"),
)
def q96_ridge_embedding_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5's ridge (alpha=10) fitted distributed over the embeddings
    table (embedding → label), scored JVM-side. Sufficient statistics
    (XᵀX, Xᵀy) are the only thing that reaches the driver."""
    from eeg_data_lake_spark.ml.ridge import ridge_fit, ridge_predict

    v = t(spark, sf_dir, "embeddings")
    first = v.select("embedding").head()
    if first is None:
        raise ValueError("q96: embeddings table is empty — nothing to fit")
    dim = len(first["embedding"])
    w = ridge_fit(v, "embedding", "label", dim=dim, alpha=10.0)
    return ridge_predict(v, "embedding", w).select(
        "vec_id", "label", F.round("prediction", 4).alias("prediction")
    )


@register(
    "q90_kmeans_clusters",
    oracle=None,  # iterative fixpoint → rows-only (numpy-parity tested)
    tags=("ml", "clustering", "kmeans"),
)
def q90_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, 5 rounds, deterministic
    lowest-id init) over the embeddings table; emits per-cluster size,
    inertia and the centroid's L2 norm. Per round: one Arrow-batched
    assignment pass (BLAS matmul per batch, centroids in the closure)
    plus one (cluster, dim) partial-average shuffle whose size is
    k·d·n_partitions — independent of corpus size; only the k×d
    centroid matrix ever reaches the driver. Assignments and inertia
    match a single-node numpy Lloyd's reference exactly
    (tests/test_kmeans.py)."""
    from eeg_data_lake_spark.ml.kmeans import assign_clusters, kmeans_fit

    v = t(spark, sf_dir, "embeddings")
    model = kmeans_fit(v, k=8, max_iter=5)
    cn = [float(np.linalg.norm(c)) for c in model.centroids]
    norms = spark.createDataFrame(
        [(i, round(n, 6)) for i, n in enumerate(cn)],
        "cluster int, centroid_norm double",
    )
    sizes = (
        assign_clusters(v, model.centroids)
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.sum("sqdist"), 4).alias("inertia"),
        )
    )
    # LEFT join from norms: a cluster left empty by Lloyd's (it keeps
    # its previous centroid) has no assignment row, and an inner join
    # would silently drop it from the promised per-cluster output
    return norms.join(sizes, "cluster", "left").select(
        "cluster",
        F.coalesce("n_vecs", F.lit(0)).alias("n_vecs"),
        F.coalesce("inertia", F.lit(0.0)).alias("inertia"),
        "centroid_norm",
    )


@register(
    "z08_pca_embeddings",
    oracle=None,  # eigendecomposition — numpy-parity tested instead
    tags=("ml", "pca", "dimensionality-reduction"),
)
def z08_pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA over the embeddings table (ml/pca.py): per-
    partition sufficient statistics → driver eigh → JVM-side projected
    scores, summarized as per-component eigenvalue, cumulative
    variance-explained, and the projected-score variance (which must
    equal the eigenvalue — reported so the driver's rows-only check
    exercises the projection path too, not just the fit). Iterative-
    free but eigen-based → no SQL oracle; numpy parity, partitioning
    invariance and the all-JVM projection plan are pinned in
    tests/test_pca.py."""
    from eeg_data_lake_spark.ml.pca import pca_fit, pca_project

    v = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # dim inferred inside the fit's sufficient-stats pass — no eager
    # .first() probe at plan-build time (k clamps to dim in pca_fit)
    comps, vals, mean = pca_fit(v, "embedding", None, 8)
    k = comps.shape[0]
    proj = pca_project(v, "embedding", comps, mean)
    score_vars = (
        proj.agg(
            *[F.var_samp(f"pc{i}").alias(f"v{i}") for i in range(k)]
        ).collect()[0]
    )
    total = float(vals.sum())
    rows = []
    cum = 0.0
    for i in range(k):
        cum += float(vals[i])
        rows.append(
            (
                i,
                round(float(vals[i]), 6),
                round(cum / total, 6),
                round(float(score_vars[f"v{i}"]), 6),
            )
        )
    return spark.createDataFrame(
        rows,
        "component int, eigenvalue double, cum_var_explained_of_topk double, "
        "projected_score_var double",
    )


@register(
    "z09_semdedup",
    oracle=None,  # k-means fixpoint feeds the NMS scan → rows-only
    tags=("ml", "dedup", "embedding", "semdedup"),
)
def z09_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings,
    then within each cluster greedily retain in ascending-id order,
    dropping any vector whose cosine to an already-retained one is
    ≥ 0.45 (the q36 threshold, so the two dedup surfaces agree on what
    'near-dup' means). Pairwise work confined to clusters — O(Σ n_c²),
    the SemDeDup scaling contract — with one dense-int exchange.
    Deterministic: lowest-id k-means init + id-ordered NMS.
    tests/test_semdedup.py proves the NMS chain semantics, that every
    dropped vector has a kept in-cluster witness ≥ tau, and that the
    quantizer's pair-capture rate beats the random-collision
    baseline on the exact q36 pair set."""
    from eeg_data_lake_spark.ml.kmeans import assign_clusters, kmeans_fit
    from eeg_data_lake_spark.ml.semdedup import semdedup_flags
    from eeg_data_lake_spark.workload.joins_advanced import COSINE_NEARDUP_TAU

    v = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    model = kmeans_fit(v, k=8, max_iter=5)
    assigned = assign_clusters(v, model.centroids)
    return semdedup_flags(assigned, COSINE_NEARDUP_TAU)
