"""Distributed closed-form ridge regression (U5's estimator,
/root/reference/test_train.py:98-101 — sklearn Ridge(alpha=10) fit on
driver-collected matrices).

Scale design: the sufficient statistics (Gramian XᵀX, d×d, and moment
vector Xᵀy, d×1) are computed as per-partition numpy partials inside
``mapInPandas`` (Arrow batches, vectorized X.T@X) — one output row per
partition, so only num_partitions × d² doubles ever reach the driver,
where (XᵀX + αI)w = Xᵀy is solved with numpy. Predictions evaluate the
coefficients as literal JVM array expressions (whole-stage codegen, no
Python hop). The training data itself never leaves the executors —
this is how ridge stays O(d²) driver memory at 100 TB of rows, unlike
the reference's collect-then-sklearn path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ridge_fit(
    df: DataFrame, features_col: str, target_col: str, dim: int, alpha: float = 10.0
) -> np.ndarray:
    """Solve (XᵀX + αI)w = Xᵀy from distributed sufficient statistics.

    Returns w of length dim+1; the last element is the intercept,
    fitted via an appended constant-1 feature and left unpenalized.
    """
    d1 = dim + 1

    def partials(batches):
        gram = np.zeros((d1, d1))
        moment = np.zeros(d1)
        seen = False
        for pdf in batches:
            # drop NULL rows here, not after: a single NaN target or
            # feature poisons gram/moment and np.linalg.solve returns
            # NaN coefficients WITHOUT raising — silent garbage
            pdf = pdf.dropna(subset=[features_col, target_col])
            if not len(pdf):
                continue
            seen = True
            x = np.asarray(pdf[features_col].tolist(), dtype=np.float64)
            x = np.hstack([x, np.ones((len(x), 1))])
            y = pdf[target_col].to_numpy(dtype=np.float64)
            gram += x.T @ x
            moment += x.T @ y
        if seen:
            yield pd.DataFrame(
                {"gram": [gram.ravel().tolist()], "moment": [moment.tolist()]}
            )

    parts = df.select(features_col, target_col).mapInPandas(
        partials, schema="gram array<double>, moment array<double>"
    )
    rows = parts.collect()  # ≤ one small row per partition
    if not rows:
        raise ValueError(
            "ridge_fit: no non-null training rows "
            f"(features={features_col!r}, target={target_col!r})"
        )
    gram = np.sum([np.array(r["gram"]).reshape(d1, d1) for r in rows], axis=0)
    moment = np.sum([np.array(r["moment"]) for r in rows], axis=0)
    reg = alpha * np.eye(d1)
    reg[-1, -1] = 0.0  # don't penalize the intercept
    return np.linalg.solve(gram + reg, moment)


def ridge_predict(
    df: DataFrame, features_col: str, w: np.ndarray, out_col: str = "prediction"
) -> DataFrame:
    """Score with coefficients inlined as literals into a zip_with dot
    product — pure JVM expression under whole-stage codegen."""
    coefs = F.array(*[F.lit(float(c)) for c in w[:-1]])
    dot = F.aggregate(
        F.zip_with(
            F.transform(F.col(features_col), lambda v: v.cast("double")),
            coefs,
            lambda x, c: x * c,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn(out_col, dot + F.lit(float(w[-1])))
