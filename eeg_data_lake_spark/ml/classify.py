"""Classification pipeline (U6): StringIndexer → VectorAssembler →
StandardScaler → LogisticRegression, evaluated with the multiclass
metrics the reference prints.

Mirrors /root/reference/main/train_model.py:66-126 (pipeline stages,
maxIter=50, regParam=0.01, L2, seeded 80/20 split at :100) using only
public pyspark.ml classes. Everything runs distributed: indexing is a
distinct-agg job, scaling a two-pass stats job, LR an iterative
treeAggregate — no driver-side data movement beyond coefficients.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import StandardScaler, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame


@dataclass
class TrainResult:
    model: PipelineModel
    predictions: DataFrame  # test-split predictions
    metrics: dict[str, float]


def train_classifier(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    max_iter: int = 50,
    reg_param: float = 0.01,
    seed: int = 42,
    train_fraction: float = 0.8,
) -> TrainResult:
    """Fit the reference's four-stage pipeline and score the held-out
    split (J2 randomSplit, /root/reference/main/train_model.py:100)."""
    pipeline = Pipeline(
        stages=[
            StringIndexer(
                inputCol=label_col, outputCol="label", handleInvalid="skip"
            ),
            VectorAssembler(
                inputCols=list(feature_cols),
                outputCol="features_raw",
                handleInvalid="skip",
            ),
            StandardScaler(
                inputCol="features_raw",
                outputCol="features",
                withMean=True,
                withStd=True,
            ),
            LogisticRegression(
                featuresCol="features",
                labelCol="label",
                maxIter=max_iter,
                regParam=reg_param,
                elasticNetParam=0.0,  # pure L2, as the reference
            ),
        ]
    )
    train, test = df.randomSplit(
        [train_fraction, 1.0 - train_fraction], seed=seed
    )
    model = pipeline.fit(train)
    # persist across the four evaluator jobs: each evaluate() is its
    # own action, and an uncached predictions frame would re-run the
    # split + full pipeline transform four times for identical results
    predictions = model.transform(test).persist()
    try:
        metrics = {
            m: MulticlassClassificationEvaluator(
                labelCol="label", predictionCol="prediction", metricName=m
            ).evaluate(predictions)
            for m in ("accuracy", "f1", "weightedPrecision", "weightedRecall")
        }
    except Exception:
        predictions.unpersist()
        raise
    return TrainResult(model=model, predictions=predictions, metrics=metrics)
