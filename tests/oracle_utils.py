"""Local replica of the driver's DuckDB-oracle comparison.

Normalization: sort columns by name, round floats, stringify
timestamps, sort rows — then compare values with a small numeric
tolerance. Stricter in spirit than the driver's value hash: a pass
here should imply a hash match there (both sides round identically
inside the queries themselves).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con.sql(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif s.dtype == object and len(s) and isinstance(s.iloc[0], (int, np.integer)):
            df[c] = s.astype("int64")  # duckdb HUGEINT arrives as object
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    got = normalize(spark_df.toPandas())
    want = normalize(oracle_df)
    if list(got.columns) != list(want.columns):
        problems.append(f"{name}: columns {list(got.columns)} != {list(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"{name}: row count {len(got)} != {len(want)}")
        return problems
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ok = np.allclose(
                g.astype(float), w.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
            )
            exact = (
                g.astype(float).fillna(1.2345e300)
                == w.astype(float).fillna(1.2345e300)
            ).all()
            if not ok:
                bad = np.where(
                    ~np.isclose(
                        g.astype(float), w.astype(float), rtol=1e-9, atol=1e-9,
                        equal_nan=True,
                    )
                )[0][:3]
                problems.append(
                    f"{name}.{c}: value mismatch at rows {bad.tolist()}: "
                    f"{[(g.iloc[i], w.iloc[i]) for i in bad.tolist()]}"
                )
            elif not exact:
                # tolerance pass but not bit-equal → the driver's hash
                # would likely fail; surface it as a warning-grade problem
                problems.append(f"{name}.{c}: close but not bit-equal (hash risk)")
        else:
            neq = (g != w) & ~(g.isna() & w.isna())
            if neq.any():
                i = int(np.where(neq)[0][0])
                problems.append(
                    f"{name}.{c}: mismatch at row {i}: {g.iloc[i]!r} != {w.iloc[i]!r}"
                )
    return problems
