"""Plan pins for the TPC-H shape queries (workload/tpch_shapes.py):
each exercises a Catalyst decorrelation / outer-join path, and the
pin asserts the rewrite actually produced hash joins within a fixed
exchange budget — a decorrelation that fell back to a nested-loop or
per-row subquery would blow both. Value correctness is covered by
the DuckDB oracle parity sweep."""

from __future__ import annotations

import pytest

from eeg_data_lake_spark.plans import explain_cost
from eeg_data_lake_spark.workload import REGISTRY

BUDGETS = {
    # query -> max exchanges at test SF (observed: 3/4/3/3/3)
    "r82_order_count_distribution": 3,
    "r83_top_supplier_revenue": 4,
    "r84_small_quantity_revenue": 3,
    "r85_heavy_shippers_of_small_parts": 3,
    "r86_idle_rich_customers": 3,
}


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_decorrelated_plan_within_budget(spark, sf_dir, name):
    df = REGISTRY[name].spark_fn(spark, sf_dir)
    c = explain_cost(df)
    assert not c["has_nested_loop"], (
        f"{name}: decorrelation fell back to a nested loop"
    )
    assert c["exchanges"] <= BUDGETS[name], (
        f"{name}: {c['exchanges']} exchanges > budget {BUDGETS[name]}"
    )
    assert all("HashJoin" in j or "SortMerge" in j for j in c["joins"]), c[
        "joins"
    ]


def test_q13_shape_keeps_zero_order_customers(spark, sf_dir):
    """The ON-clause filter placement is the point of the Q13 shape:
    every customer appears in exactly one bucket, INCLUDING those
    whose every order was filtered away (a WHERE placement would
    drop them and the distribution would no longer sum to the
    customer count)."""
    from eeg_data_lake_spark.workload.registry import t

    df = REGISTRY["r82_order_count_distribution"].spark_fn(spark, sf_dir)
    total = sum(r.custdist for r in df.collect())
    assert total == t(spark, sf_dir, "customer").count()
