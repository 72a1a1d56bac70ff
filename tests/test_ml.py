"""ML layer (U5/U6): pipeline correctness on separable synthetic data
and ridge parity with the closed-form numpy solution."""

from __future__ import annotations

import numpy as np
import pytest

from eeg_data_lake_spark.ml.classify import train_classifier
from eeg_data_lake_spark.ml.ridge import ridge_fit, ridge_predict


class TestClassifier:
    @pytest.fixture(scope="class")
    def separable_df(self, spark):
        rng = np.random.default_rng(7)
        rows = []
        for label, (cx, cy) in [("alpha", (0.0, 0.0)), ("beta", (8.0, 8.0))]:
            pts = rng.normal([cx, cy], 1.0, size=(200, 2))
            rows += [(label, float(x), float(y)) for x, y in pts]
        return spark.createDataFrame(rows, "cls string, f1 double, f2 double")

    def test_separable_accuracy(self, separable_df):
        res = train_classifier(separable_df, "cls", ["f1", "f2"])
        assert res.metrics["accuracy"] > 0.95
        assert set(res.metrics) == {
            "accuracy", "f1", "weightedPrecision", "weightedRecall",
        }

    def test_prediction_schema(self, separable_df):
        res = train_classifier(separable_df, "cls", ["f1", "f2"])
        cols = set(res.predictions.columns)
        assert {"prediction", "probability", "features"} <= cols


class TestRidge:
    def test_recovers_known_coefficients(self, spark):
        rng = np.random.default_rng(11)
        x = rng.normal(size=(500, 3))
        y = x @ np.array([2.0, -3.0, 0.5]) + 1.25
        df = spark.createDataFrame(
            [(list(map(float, xi)), float(yi)) for xi, yi in zip(x, y)],
            "emb array<double>, target double",
        ).repartition(4)
        w = ridge_fit(df, "emb", "target", dim=3, alpha=1e-8)
        assert np.allclose(w, [2.0, -3.0, 0.5, 1.25], atol=1e-6)

    def test_matches_numpy_closed_form(self, spark):
        rng = np.random.default_rng(13)
        x = rng.normal(size=(300, 4))
        y = rng.normal(size=300)
        alpha = 10.0
        df = spark.createDataFrame(
            [(list(map(float, xi)), float(yi)) for xi, yi in zip(x, y)],
            "emb array<double>, target double",
        ).repartition(3)
        w = ridge_fit(df, "emb", "target", dim=4, alpha=alpha)
        x1 = np.hstack([x, np.ones((len(x), 1))])
        reg = alpha * np.eye(5)
        reg[-1, -1] = 0.0
        expected = np.linalg.solve(x1.T @ x1 + reg, x1.T @ y)
        assert np.allclose(w, expected, atol=1e-9)

    def test_predict_is_dot_plus_intercept(self, spark):
        df = spark.createDataFrame(
            [([1.0, 2.0],), ([0.0, 0.0],)], "emb array<double>"
        )
        out = ridge_predict(df, "emb", np.array([3.0, -1.0, 0.5]))
        vals = [r.prediction for r in out.orderBy(F_desc_first(out)).collect()]
        assert sorted(vals) == [0.5, 1.5]


def F_desc_first(df):
    from pyspark.sql import functions as F

    return F.col(df.columns[0])


def test_model_save_load_roundtrip(spark, tmp_path):
    """U6 model persistence (/root/reference/main/train_model.py:123-126):
    the fitted PipelineModel round-trips through disk and scores
    identically."""
    import numpy as np
    from pyspark.ml import PipelineModel

    rng = np.random.default_rng(23)
    rows = [
        (("alpha" if x + y > 0 else "beta"), float(x), float(y))
        for x, y in rng.normal(size=(120, 2))
    ]
    df = spark.createDataFrame(rows, "cls string, f1 double, f2 double")
    res = train_classifier(df, "cls", ["f1", "f2"])
    path = str(tmp_path / "model")
    res.model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    a = [r.prediction for r in res.model.transform(df).select("prediction").collect()]
    b = [r.prediction for r in reloaded.transform(df).select("prediction").collect()]
    assert a == b


def test_ridge_null_rows_dropped_not_poisoning(spark):
    """A NULL target/feature row must be dropped, not propagate NaN
    through gram/moment (np.linalg.solve returns NaN coefficients
    WITHOUT raising)."""
    clean = [([1.0, 0.0], 2.0), ([0.0, 1.0], 3.0), ([1.0, 1.0], 5.0),
             ([2.0, 1.0], 7.0)]
    dirty = clean + [([1.0, 2.0], None), (None, 1.0)]
    d1 = spark.createDataFrame(clean, "features array<double>, y double")
    d2 = spark.createDataFrame(dirty, "features array<double>, y double")
    w1 = ridge_fit(d1, "features", "y", dim=2, alpha=0.1)
    w2 = ridge_fit(d2, "features", "y", dim=2, alpha=0.1)
    assert np.all(np.isfinite(w2))
    assert np.allclose(w1, w2)  # NULL rows contributed nothing


def test_ridge_empty_input_clear_error(spark):
    import pytest as _pytest

    empty = spark.createDataFrame([], "features array<double>, y double")
    with _pytest.raises(ValueError, match="no non-null training rows"):
        ridge_fit(empty, "features", "y", dim=2)
