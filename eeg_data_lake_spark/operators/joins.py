"""As-of and range joins as DataFrame compositions.

The reference's join surface is one left equi-join
(/root/reference/pilots/pilot_gold.py:104-106); these two operators
are the time-series joins a lakehouse engine needs beyond it.

Scale design:

- asof_join: the naive formulation is an inequality join (cross
  product per key). The scalable plan used here is the union+window
  trick: tag both sides, union, one shuffle on the key, one
  in-partition sort by (time, side), then ``last(ignorenulls)``
  carries the most recent right-side payload forward onto each left
  row. Cost = exactly one exchange of |L|+|R| rows — the same shape
  as a window aggregation, no pair blow-up, AQE-skew-handled.
- range_count_join: an equi-join on the entity key with the range
  predicate as a residual filter inside the hash join. The range
  never multiplies cost beyond true matches; per-key fan-out is
  bounded by the entity's activity, so the shuffle is the only cost.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    tie_breakers: Sequence[str] = (),
    tolerance=None,
) -> DataFrame:
    """Backward (inclusive) as-of join: each left row gains the payload
    of the right row with the greatest ``right_ts <= left_ts`` for the
    same key; ``tie_breakers`` resolve equal timestamps (greatest
    wins). Right payload columns must not collide with left columns.

    ``tolerance`` bounds the lookback (pandas ``merge_asof``
    semantics): a match older than ``left_ts - tolerance`` yields NULL
    payload instead. Pass a Column matching the timestamp type —
    ``F.expr("INTERVAL '90' DAY")`` for timestamps, a numeric literal
    for numeric ts. Same one-exchange plan: the matched right
    timestamp rides inside the payload struct, so the bound is a
    post-window scalar comparison, not another join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys + [right_ts]]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {clash}")
    reserved = {"__t", "__side", "__p", "__rts"}
    bad = reserved & (set(left.columns) | set(right.columns))
    if bad:
        raise ValueError(
            f"asof_join inputs may not use the reserved names {sorted(bad)}"
        )

    nn_keys = None
    for k in keys:
        c = F.col(k).isNotNull()
        nn_keys = c if nn_keys is None else (nn_keys & c)
    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = (
        # NULL-timestamp right rows match nothing under SQL semantics
        # (right_ts <= left_ts is never true); without this filter they
        # sort FIRST in the window and leak into every left row. NULL
        # KEYS likewise match nothing under equi-join semantics, but
        # Window.partitionBy groups NULLs together — without the key
        # filter a NULL-key right row would leak its payload onto
        # NULL-key left rows (which must get NULL payload instead).
        right.filter(F.col(right_ts).isNotNull() & nn_keys)
        .select(*keys, F.col(right_ts).alias("__t"), *payload)
        .withColumn("__side", F.lit(0))
    )
    # Carry the payload as ONE struct: per-column last(ignorenulls)
    # would resurrect non-null values from OLDER right rows whenever
    # the matched row holds a NULL in some column, emitting a mixed
    # row that never existed on the right.
    rt = rt.withColumn(
        "__p", F.struct(F.col("__t").alias("__rts"), *payload)
    ).drop(*payload)
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # tie-breakers naming payload columns resolve inside the struct
    # (they only ever disambiguate right-vs-right rows, whose __p is
    # non-null); others (key/ts columns) resolve normally
    ties = [
        F.col("__p").getField(tb) if tb in payload else F.col(tb)
        for tb in tie_breakers
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side", *ties)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = unioned.withColumn("__p", F.last("__p", ignorenulls=True).over(w))
    out = unioned.filter(F.col("__side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__p",
            F.when(
                F.col("__p").getField("__rts") >= F.col("__t") - tolerance,
                F.col("__p"),
            ),
        )
    for c in payload:
        out = out.withColumn(c, F.col("__p").getField(c))
    return out.drop("__t", "__side", "__p")


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, str],
    right_ts: str,
    range_start,
    range_end,
    count_col: str,
    group_cols: Sequence[str],
) -> DataFrame:
    """LEFT equi-join ``left.on[0] == right.on[1]`` with the residual
    range predicate ``range_start <= right_ts < range_end``, then a
    per-``group_cols`` SQL ``COUNT(count_col)`` (0 for unmatched left
    rows). Standard COUNT(column) semantics on purpose: matched right
    rows whose ``count_col`` is NULL do not count — identical to the
    ``COUNT(e.event_id)`` a SQL twin of this query writes.
    """
    lk, rk = on
    # qualify via the DataFrame handles: bare F.col crashes with an
    # ambiguous reference whenever both sides share the key name
    cond = (
        (left[lk] == right[rk])
        & (right[right_ts] >= range_start)
        & (right[right_ts] < range_end)
    )
    return (
        left.join(right, cond, "left")
        .groupBy(*[left[c] for c in group_cols])
        .agg(F.count(right[count_col]).alias(f"n_{count_col}"))
    )


def interval_overlap_join(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    start_us: str,
    end_us: str,
    bin_us: int,
) -> DataFrame:
    """All overlapping interval PAIRS within each key group — the
    general interval-overlap join (genomics/occupancy/session-overlap
    shape) that Spark has no native operator for, built as
    bin-and-verify:

    1. each interval explodes into the ``bin_us``-wide bins it spans
       (``sequence(floor(s/W), floor(e/W))`` — JVM, no Python);
    2. candidates come from an EQUI join on (keys…, bin) — never an
       inequality join, which Catalyst would execute as a per-key
       nested loop;
    3. exact overlap verify, ``id_a < id_b`` orientation;
    4. each true pair is COUNTED ONCE by keeping only the bin holding
       the later start: overlapping intervals share that bin by
       construction, so no distinct() pass is needed.

    Cost: |bins per interval| ≈ span/W + 1 index rows, and the
    candidate join is keyed by (keys, bin) — pick W near the median
    span so candidates ≈ true pairs. Inputs are integer microseconds
    (exact in both engines; no float time math).

    Output: keys…, id_a, id_b, overlap_us.
    """
    keys = list(keys)
    s, e = F.col(start_us), F.col(end_us)
    # an interval with end < start is empty and overlaps nothing —
    # dropped here (the SQL-predicate outcome); without the filter,
    # sequence() auto-steps -1 over the reversed bounds and the
    # malformed row would join with NEGATIVE overlap_us. NULL bounds
    # drop the same way (sequence(NULL) explodes to nothing).
    binned = df.filter(s <= e).select(
        *keys,
        F.col(id_col).alias("id"),
        s.alias("s"),
        e.alias("e"),
        # integer DIV, not float floor(x/W): exact at any epoch scale
        F.explode(
            F.sequence(
                F.expr(f"{start_us} DIV {bin_us}"),
                F.expr(f"{end_us} DIV {bin_us}"),
            )
        ).alias("bin"),
    )
    a, b = binned.alias("a"), binned.alias("b")
    on = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys]
    on += [
        F.col("a.bin") == F.col("b.bin"),
        F.col("a.id") < F.col("b.id"),
        F.col("a.s") <= F.col("b.e"),
        F.col("b.s") <= F.col("a.e"),
        # count-once: only the bin containing the later start emits
        F.col("a.bin")
        == F.expr(f"greatest(a.s, b.s) DIV {bin_us}"),
    ]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    return a.join(b, cond).select(
        *[F.col(f"a.{k}").alias(k) for k in keys],
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        (
            F.least(F.col("a.e"), F.col("b.e"))
            - F.greatest(F.col("a.s"), F.col("b.s"))
        ).alias("overlap_us"),
    )
