"""Schema data contracts: decide whether a producer's new schema is
backward-compatible with what consumers already read — the check a
pipeline runs BEFORE a write, so an incompatible deploy fails at
commit time instead of poisoning downstream readers.

Rules (the Delta/Avro-resolution consensus):

- **additive**: new nullable columns are fine (old readers ignore
  them, new readers see NULL for old data — the txlog merge-on-read
  path already proves this end to end);
- **widening**: int→long, float→double (value-preserving) are fine
  FOR READERS THAT CAST — Avro resolution, Delta's type-widening
  feature, a full-rewrite flow. Plain-parquet multi-file readers do
  NOT: this repo's ``TxTable.read(merge_schema=True)`` and the
  txstream CDC DDL both refuse files whose types differ, so gate
  writes into a TxTable with ``allow_widening=False`` — otherwise the
  check would bless exactly the deploy that poisons those readers;
- **forbidden**: dropping a column, narrowing a type (including
  array-element / map-value nullability: ``containsNull`` false where
  it was true is a narrowing — old arrays holding NULL elements
  violate the new contract), any other type change, or adding a
  NON-nullable column (old files cannot supply a value and NULL would
  violate the declared contract);
- nested structs are checked field-by-field under the same rules;
  arrays/maps recurse on their element/key/value types.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: value-preserving widenings (old reader type -> allowed new types)
_WIDENINGS: dict[type, tuple[type, ...]] = {
    T.ByteType: (T.ShortType, T.IntegerType, T.LongType),
    T.ShortType: (T.IntegerType, T.LongType),
    T.IntegerType: (T.LongType,),
    T.FloatType: (T.DoubleType,),
}


def _type_ok(
    old: T.DataType,
    new: T.DataType,
    path: str,
    problems: list[str],
    allow_widening: bool,
    relax_nullability: bool = False,
):
    if old == new:
        return
    if allow_widening and isinstance(
        new, tuple(_WIDENINGS.get(type(old), ()))
    ):
        return
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        _struct_ok(
            old, new, path, problems, allow_widening, relax_nullability
        )
        return
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        _type_ok(
            old.elementType, new.elementType, f"{path}[]", problems,
            allow_widening, relax_nullability,
        )
        if (
            old.containsNull
            and not new.containsNull
            and not relax_nullability
        ):
            problems.append(
                f"{path}[]: nullable elements became non-nullable"
            )
        if not old.containsNull and new.containsNull and relax_nullability:
            problems.append(
                f"{path}[]: NULL elements appended into a non-nullable "
                "element contract"
            )
        return
    if isinstance(old, T.MapType) and isinstance(new, T.MapType):
        _type_ok(
            old.keyType, new.keyType, f"{path}<key>", problems,
            allow_widening, relax_nullability,
        )
        _type_ok(
            old.valueType, new.valueType, f"{path}<value>", problems,
            allow_widening, relax_nullability,
        )
        if (
            old.valueContainsNull
            and not new.valueContainsNull
            and not relax_nullability
        ):
            problems.append(
                f"{path}<value>: nullable values became non-nullable"
            )
        if (
            not old.valueContainsNull
            and new.valueContainsNull
            and relax_nullability
        ):
            problems.append(
                f"{path}<value>: NULL values appended into a "
                "non-nullable value contract"
            )
        return
    problems.append(
        f"{path}: incompatible type change "
        f"{old.simpleString()} -> {new.simpleString()}"
    )


def _struct_ok(
    old: T.StructType,
    new: T.StructType,
    path: str,
    problems: list[str],
    allow_widening: bool,
    relax_nullability: bool = False,
):
    new_fields = {f.name: f for f in new.fields}
    for f in old.fields:
        p = f"{path}.{f.name}" if path else f.name
        nf = new_fields.pop(f.name, None)
        if nf is None:
            problems.append(f"{p}: column dropped")
            continue
        _type_ok(
            f.dataType, nf.dataType, p, problems, allow_widening,
            relax_nullability,
        )
        if f.nullable and not nf.nullable and not relax_nullability:
            problems.append(f"{p}: nullable column became non-nullable")
        if not f.nullable and nf.nullable and relax_nullability:
            problems.append(
                f"{p}: nullable data appended into a non-nullable "
                "column contract"
            )
    for name, nf in new_fields.items():
        p = f"{path}.{name}" if path else name
        if not nf.nullable and not relax_nullability:
            # evolution direction only: declaring a non-nullable column
            # old files cannot supply breaks the contract. In the
            # APPEND direction a non-nullable NEW column is fine — the
            # merged read schema relaxes it to nullable for old files.
            problems.append(
                f"{p}: new column must be nullable (old data has no value)"
            )


def compatibility_problems(
    old: T.StructType,
    new: T.StructType,
    allow_widening: bool = True,
) -> list[str]:
    """All backward-compatibility violations of evolving ``old`` →
    ``new`` (empty list == compatible). ``allow_widening=False`` for
    plain-parquet consumers (TxTable merge-on-read, the txstream CDC
    source) that cannot cast across files — see the module docstring."""
    problems: list[str] = []
    _struct_ok(old, new, "", problems, allow_widening)
    return problems


def assert_compatible(
    old: T.StructType,
    new: T.StructType,
    allow_widening: bool = True,
) -> None:
    """Raise with every violation listed — run this before a write
    whose schema may have drifted."""
    problems = compatibility_problems(old, new, allow_widening)
    if problems:
        raise ValueError(
            "schema contract violation:\n  " + "\n  ".join(problems)
        )


def append_compatibility_problems(
    old: T.StructType, new: T.StructType
) -> list[str]:
    """Violations of APPENDING a ``new``-schema batch of rows into a
    table whose files carry ``old`` — the per-trigger gate a streaming
    sink runs (streaming/txpair.py).

    Differs from ``compatibility_problems`` in direction of
    nullability: the evolution check asks "can old readers survive the
    new declared schema", the append check asks "can the new ROWS live
    under the old contract" — so a batch column that is non-nullable
    where the table is nullable is FINE (its values are simply never
    NULL), while a nullable batch column under a non-nullable table
    contract is the violation. Type rules stay strict
    (``allow_widening=False``): TxTable's merge-on-read and the
    txstream CDC DDL refuse files whose types differ, so a widened
    append is exactly the poison this gate exists to catch."""
    problems: list[str] = []
    _struct_ok(old, new, "", problems, False, relax_nullability=True)
    return problems
