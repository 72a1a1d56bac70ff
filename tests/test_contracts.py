"""Schema contract validator: additive/widening allowed, drops/
narrowing/non-nullable-adds refused, nested recursion."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from eeg_data_lake_spark.sources.contracts import (
    assert_compatible,
    compatibility_problems,
)


def s(ddl: str) -> T.StructType:
    return T.StructType.fromDDL(ddl)


def test_identical_and_additive_and_widening_ok(spark):
    old = s("id int, v float, meta struct<lang: string>")
    assert compatibility_problems(old, old) == []
    new = s("id bigint, v double, meta struct<lang: string, note: string>, extra string")
    assert compatibility_problems(old, new) == []
    assert_compatible(old, new)


def test_drop_narrow_retype_refused(spark):
    old = s("id bigint, v double, name string")
    probs = compatibility_problems(old, s("id int, v double"))
    assert any("name: column dropped" in p for p in probs)
    assert any("incompatible type change bigint -> int" in p for p in probs)
    probs2 = compatibility_problems(old, s("id bigint, v string, name string"))
    assert any("double -> string" in p for p in probs2)


def test_non_nullable_add_and_nullability_tightening_refused(spark):
    old = s("id bigint")
    new = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),
            T.StructField("req", T.StringType(), nullable=False),
        ]
    )
    probs = compatibility_problems(old, new)
    assert any("req: new column must be nullable" in p for p in probs)
    assert any("id: nullable column became non-nullable" in p for p in probs)


def test_nested_array_map_recursion(spark):
    old = s("a array<int>, m map<string, float>, st struct<x: int>")
    ok = s("a array<long>, m map<string, double>, st struct<x: long, y: string>")
    assert compatibility_problems(old, ok) == []
    bad = s("a array<string>, m map<int, double>, st struct<y: string>")
    probs = compatibility_problems(old, bad)
    assert any("a[]" in p for p in probs)
    assert any("m<key>" in p for p in probs)
    assert any("st.x: column dropped" in p for p in probs)


def test_assert_raises_with_all_violations(spark):
    with pytest.raises(ValueError, match="dropped"):
        assert_compatible(s("id int, v int"), s("id int"))


def test_array_map_nullability_narrowing_refused(spark):
    old = T.StructType(
        [
            T.StructField("a", T.ArrayType(T.StringType(), containsNull=True)),
            T.StructField(
                "m",
                T.MapType(T.StringType(), T.DoubleType(), valueContainsNull=True),
            ),
        ]
    )
    new = T.StructType(
        [
            T.StructField("a", T.ArrayType(T.StringType(), containsNull=False)),
            T.StructField(
                "m",
                T.MapType(T.StringType(), T.DoubleType(), valueContainsNull=False),
            ),
        ]
    )
    probs = compatibility_problems(old, new)
    assert any("a[]: nullable elements became non-nullable" in p for p in probs)
    assert any(
        "m<value>: nullable values became non-nullable" in p for p in probs
    )


def test_widening_refusable_for_plain_parquet_readers(spark):
    """TxTable merge-on-read and the txstream CDC DDL cannot cast
    across files, so allow_widening=False must refuse int->long for
    writers feeding those readers."""
    old = s("id int, v float")
    new = s("id bigint, v double")
    assert compatibility_problems(old, new) == []  # default: Avro rules
    probs = compatibility_problems(old, new, allow_widening=False)
    assert any("int -> bigint" in p for p in probs)
    assert any("float -> double" in p for p in probs)
    with pytest.raises(ValueError, match="contract violation"):
        assert_compatible(old, new, allow_widening=False)
