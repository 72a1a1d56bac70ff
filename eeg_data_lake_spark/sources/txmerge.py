"""Full conditional MERGE INTO over the transaction-logged table —
the Delta/Iceberg statement shape (WHEN MATCHED THEN UPDATE / DELETE,
WHEN NOT MATCHED THEN INSERT) that `sources/merge.py`'s plain upsert
and `sources/scd.py`'s history merge don't cover: one source batch
can update some keys, delete others (e.g. a CDC feed's op column),
and insert the rest, atomically, with txn-id replay idempotence.

Plan: ONE null-safe full-outer join of the current snapshot to the
source on the merge keys decides each row's fate; the merged relation
overwrites transactionally (time travel keeps the pre-merge version
readable — txlog contract). Cost is the join shuffle plus the
rewrite, the plain-parquet floor; a log-structured engine would prune
the rewrite to touched files, which `merge.py`'s partitioned variant
demonstrates.

Delta-compatible contracts enforced here:
- a source with DUPLICATE merge keys is rejected up front (Delta
  raises the same "multiple source rows matched" error — silently
  picking one would make the merge nondeterministic);
- the delete condition sees BOTH sides (target attrs by name, source
  attrs through the callable's second argument), so CDC patterns like
  ``lambda t, s: s["op"] == "D"`` work directly.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable


def merge_into(
    table: TxTable,
    source: DataFrame,
    keys: Sequence[str],
    when_matched_update: bool | Sequence[str] = True,
    when_matched_delete: Callable[[dict, dict], Column] | None = None,
    when_not_matched_insert: bool = True,
    txn_id: str | None = None,
) -> int:
    """Merge ``source`` into ``table`` on ``keys``. Returns the
    committed version (unchanged if ``txn_id`` already applied).

    ``when_matched_update``: True replaces every non-key column from
    the source; a column list updates just those; False leaves matched
    rows untouched (unless deleted). ``when_matched_delete`` is a
    callable ``(target_cols, source_cols) -> Column`` evaluated on
    matched rows; deletes win over updates (Delta clause order with
    the delete clause first). ``when_not_matched_insert`` inserts
    source keys absent from the target."""
    keys = list(keys)
    dup = source.groupBy(*keys).count().filter(F.col("count") > 1)
    if dup.limit(1).count():
        raise ValueError(
            "merge_into: source has duplicate merge keys — a target row "
            "would match multiple source rows (Delta raises here too)"
        )
    if table.version() < 0:
        # bootstrap: with no target schema there is no target/source
        # column diff, so the FIRST merge defines the table schema from
        # the source verbatim — callers with source-only side columns
        # (a CDC op flag) must drop them for the bootstrap batch, or
        # later merges will see them in the target schema and treat
        # them as real attrs
        if not when_not_matched_insert:
            return table.version()
        return table.append(source, txn_id=txn_id)

    snap = table.read()
    # attrs: columns MERGED into the target. Source-only columns (a CDC
    # op flag, batch metadata) are visible to the delete condition but
    # never written; target-only columns pass through (update) or NULL
    # (insert) — Delta's column-resolution behavior.
    attrs = [
        c for c in source.columns if c not in keys and c in snap.columns
    ]
    side = [
        c for c in source.columns if c not in keys and c not in snap.columns
    ]
    extra = [c for c in snap.columns if c not in source.columns]
    s = source.select(
        *[F.col(k).alias(f"__s_{k}") for k in keys],
        *[F.col(a).alias(f"__s_{a}") for a in [*attrs, *side]],
        F.lit(True).alias("__s_present"),
    )
    cond = None
    for k in keys:
        eq = F.col(k).eqNullSafe(F.col(f"__s_{k}"))
        cond = eq if cond is None else (cond & eq)
    # presence via literal indicator columns, NOT key null-checks: the
    # join is null-safe precisely so NULL merge keys are legal, and a
    # row whose keys are all NULL would otherwise test as absent from
    # both sides and silently vanish from the overwrite
    j = snap.withColumn("__t_present", F.lit(True)).join(
        s, cond, "full_outer"
    )
    in_t = F.col("__t_present").isNotNull()
    in_s = F.col("__s_present").isNotNull()

    tcols = {c: F.col(c) for c in snap.columns}
    scols = {c: F.col(f"__s_{c}") for c in [*keys, *attrs, *side]}
    delete = (
        when_matched_delete(tcols, scols)
        if when_matched_delete is not None
        else F.lit(False)
    )
    if when_matched_update is True:
        upd = set(attrs)
    elif when_matched_update is False:
        upd = set()
    else:
        upd = set(when_matched_update)
        unknown = upd - set(attrs)
        if unknown:
            raise ValueError(f"merge_into: update columns not in source: {sorted(unknown)}")

    kept_target = j.filter(in_t & ~in_s).select(snap.columns)
    matched = j.filter(in_t & in_s & ~F.coalesce(delete, F.lit(False)))
    updated = matched.select(
        *keys,
        *[
            (F.col(f"__s_{a}") if a in upd else F.col(a)).alias(a)
            for a in attrs
        ],
        *extra,
    ).select(snap.columns)
    out = kept_target.unionByName(updated)
    if when_not_matched_insert:
        inserted = (
            j.filter(in_s & ~in_t)
            .select(
                *[F.col(f"__s_{k}").alias(k) for k in keys],
                *[F.col(f"__s_{a}").alias(a) for a in attrs],
                *[F.lit(None).cast(snap.schema[c].dataType).alias(c) for c in extra],
            )
            .select(snap.columns)
        )
        out = out.unionByName(inserted)
    return table.overwrite(out, txn_id=txn_id)
