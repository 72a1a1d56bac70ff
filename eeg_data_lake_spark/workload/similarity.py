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


@register(
    "q37_cosine_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             round(list_dot_product(q.qe, v.e)
                   / (sqrt(list_dot_product(q.qe, q.qe))
                      * sqrt(list_dot_product(v.e, v.e))), 6) AS cosine
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
    by neighbor_id so the result set is deterministic."""
    v = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qe"), F.col("e"))
                / (l2norm(F.col("qe")) * l2norm(F.col("e"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine")
    )


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


#: deterministic random hyperplanes for the LSH path (seeded; 8 planes
#: over 64 dims → 256 buckets).
_LSH_SEED = 42
_LSH_PLANES = 8
_LSH_DIM = 64


def _hyperplanes() -> list[list[float]]:
    rng = np.random.default_rng(_LSH_SEED)
    return rng.standard_normal((_LSH_PLANES, _LSH_DIM)).round(6).tolist()


@register(
    "q39_lsh_ann_topk",
    oracle=None,  # verified rows-only + recall assertion in tests
    tags=("similarity", "ann", "lsh"),
)
def q39_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: bucket = sign-pattern of 8 seeded
    hyperplane dot products; each query scores only its bucket. The
    100 TB path — the bucket join replaces the full cross product.
    Compared against q37's exact top-k for recall in tests."""
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

    vb = v.withColumn("bucket", bucket(F.col("e")))
    q = vb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
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
                dot(F.col("qe"), F.col("e"))
                / (l2norm(F.col("qe")) * l2norm(F.col("e"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine")
    )
