"""Every oracle-backed workload query must match DuckDB — the local
twin of the driver's CORRECTNESS gate. Rows-only entries are executed
for shape (runs, ≥0 rows, stable schema)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from eeg_data_lake_spark.workload import REGISTRY
from tests.oracle_utils import compare, run_oracle

ORACLE_NAMES = [n for n, e in sorted(REGISTRY.items()) if e.oracle]
ROWS_ONLY_NAMES = [n for n, e in sorted(REGISTRY.items()) if not e.oracle]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_contract_shapes():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(REGISTRY)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    e = REGISTRY[name]
    problems = compare(e.spark_fn(spark, sf_dir), run_oracle(e.oracle, sf_dir), name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    df = REGISTRY[name].spark_fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
