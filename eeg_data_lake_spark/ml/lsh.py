"""MLlib LSH wrappers — the library path for similarity joins that
SURVEY.md §4 names as the no-custom-rule option
(pyspark.ml.feature.BucketedRandomProjectionLSH / MinHashLSH),
complementing the hand-built LSH (workload.similarity q93) and
MinHash banding (workload.dedup q35).

Why both exist: the custom forms are column-expression-only (oracle-
checkable, zero ML dependencies, schema under our control); the MLlib
forms bring approxSimilarityJoin's bucket-pruned distributed join and
model persistence for free. At 100 TB they plan the same way — hash to
buckets, shuffle on bucket, join within bucket.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, MinHashLSH
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def brp_similarity_join(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    distance_threshold: float = 5.0,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Euclidean near-pair join via BucketedRandomProjectionLSH:
    returns (id_a, id_b, dist) for pairs with L2 distance below the
    threshold that collide in at least one hash table. Candidate
    volume is bucket-pruned; raising num_hash_tables trades compute
    for recall."""
    from pyspark.ml.functions import array_to_vector

    v = df.select(
        F.col(id_col).alias("id"),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features"),
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(v)
    joined = model.approxSimilarityJoin(v, v, distance_threshold, distCol="dist")
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round("dist", 6).alias("dist"),
        )
    )


def minhash_neardup_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_distance_threshold: float = 0.5,
    num_hash_tables: int = 4,
    vocab_size: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Token-set near-dup candidates via MinHashLSH over hashed binary
    term vectors (HashingTF with binary=True — vocabulary-free, so no
    driver-side dictionary even at web scale). Returns
    (id_a, id_b, jaccard_dist ≤ threshold)."""
    from pyspark.ml.feature import HashingTF, Tokenizer

    tok = Tokenizer(inputCol=text_col, outputCol="toks")
    tf = HashingTF(
        inputCol="toks", outputCol="features", numFeatures=vocab_size, binary=True
    )
    base = tf.transform(tok.transform(df.select(id_col, text_col)))
    # MinHashLSH requires at least one non-zero entry per vector
    base = base.filter(F.length(F.trim(F.col(text_col))) > 0)
    model = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(base)
    joined = model.approxSimilarityJoin(
        base, base, jaccard_distance_threshold, distCol="jaccard_dist"
    )
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )
