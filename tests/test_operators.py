"""asof_join / range_count_join corner-case semantics on hand-built
frames (the oracle parity tests cover them at table scale)."""

from __future__ import annotations

import datetime as dt

import pytest

from eeg_data_lake_spark.operators.joins import asof_join, range_count_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:00")),  # before any right row
            (2, 10, _ts("2024-01-02 12:00:00")),  # between r1 and r2
            (3, 10, _ts("2024-01-03 00:00:00")),  # exactly at r2 (inclusive)
            (4, 99, _ts("2024-01-05 00:00:00")),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-02 00:00:00"), 100),
            (10, _ts("2024-01-03 00:00:00"), 200),
            (10, _ts("2024-01-03 00:00:00"), 201),  # tie: greater key wins
            (10, _ts("2024-01-04 00:00:00"), 300),  # in the future of all
        ],
        "user_id long, odate timestamp, okey long",
    )
    return left, right


def test_asof_backward_semantics(frames):
    left, right = frames
    out = {
        r.event_id: r.okey
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="odate",
            tie_breakers=("okey",),
        ).collect()
    }
    assert out[1] is None          # nothing at or before
    assert out[2] == 100           # latest at-or-before
    assert out[3] == 201           # inclusive + tie-break by greatest key
    assert out[4] is None          # unmatched key preserved (left join)


def test_asof_preserves_left_rowcount(frames):
    left, right = frames
    assert (
        asof_join(left, right, "user_id", "ts", "odate", ("okey",)).count()
        == left.count()
    )


def test_asof_collision_raises(frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left, right.withColumnRenamed("okey", "event_id"),
            "user_id", "ts", "odate",
        )


def test_range_count_join_zero_matches(spark, frames):
    left, right = frames
    from pyspark.sql import functions as F

    out = {
        r.event_id: r.n_okey
        for r in range_count_join(
            left,
            right.withColumnRenamed("user_id", "r_user"),
            on=("user_id", "r_user"),
            right_ts="odate",
            range_start=F.col("ts"),
            range_end=F.col("ts") + F.expr("INTERVAL 1 DAY"),
            count_col="okey",
            group_cols=("event_id",),
        ).collect()
    }
    # r rows within [ts, ts+1d): e1 none, e2 two at 01-03, e3 the same
    # two (inclusive start), e4 no rows for key 99
    assert out == {1: 0, 2: 2, 3: 2, 4: 0}


class TestSaltedJoin:
    def test_equals_plain_join(self, spark):
        import numpy as np

        from eeg_data_lake_spark.operators.skew import salted_join

        rng = np.random.default_rng(17)
        # one hot key (0) carrying half the rows — the salting target
        keys = np.where(rng.random(400) < 0.5, 0, rng.integers(1, 20, 400))
        left = spark.createDataFrame(
            [(int(k), i) for i, k in enumerate(keys)], "k long, lid long"
        )
        right = spark.createDataFrame(
            [(int(k), f"d{k}") for k in range(20)], "k long, tag string"
        )
        plain = sorted(
            (r.k, r.lid, r.tag) for r in left.join(right, ["k"]).collect()
        )
        salted = sorted(
            (r.k, r.lid, r.tag)
            for r in salted_join(left, right, ["k"], salt_buckets=4).collect()
        )
        assert salted == plain

    def test_left_join_preserved(self, spark):
        from eeg_data_lake_spark.operators.skew import salted_join

        left = spark.createDataFrame([(1, 10), (99, 11)], "k long, lid long")
        right = spark.createDataFrame([(1, "a")], "k long, tag string")
        rows = {
            r.lid: r.tag
            for r in salted_join(left, right, ["k"], how="left").collect()
        }
        assert rows == {10: "a", 11: None}


class TestConnectedComponents:
    def test_known_graph(self, spark):
        from eeg_data_lake_spark.operators.graph import connected_components

        # components: {1,2,3,4} via chain, {10,11}, {20,21,22} via star
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)],
            "src long, dst long",
        )
        got = {
            r.node: r.component
            for r in connected_components(edges).collect()
        }
        assert got == {
            1: 1, 2: 1, 3: 1, 4: 1,
            10: 10, 11: 10,
            20: 20, 21: 20, 22: 20,
        }

    def test_long_chain_converges(self, spark):
        from eeg_data_lake_spark.operators.graph import connected_components

        n = 12
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "src long, dst long"
        )
        got = {r.node: r.component for r in connected_components(edges).collect()}
        assert set(got.values()) == {0}
        assert len(got) == n + 1


class TestCosineNeardupPairs:
    """Both physical strategies of the exact all-pairs operator must
    produce identical rows (and match the q36 DuckDB oracle, which the
    parity suite checks against whichever path the corpus size picks)."""

    def _load(self, spark, sf_dir):
        from eeg_data_lake_spark.workload.registry import t

        return t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def test_block_path_equals_broadcast_path(self, spark, sf_dir):
        from eeg_data_lake_spark.operators.allpairs import cosine_neardup_pairs

        v = self._load(spark, sf_dir)
        tau = 0.45
        fast = cosine_neardup_pairs(v, tau)  # corpus << cutover → broadcast
        # force the distributed block path: cutover 0, tiny blocks so
        # several same-block AND cross-block groups actually occur
        slow = cosine_neardup_pairs(
            v, tau, broadcast_cutover=0, rows_per_block=7
        )
        a = sorted(map(tuple, fast.collect()))
        b = sorted(map(tuple, slow.collect()))
        assert a == b
        assert len(a) > 0  # the fixture corpus has near-dup pairs

    def test_block_path_has_no_collect_of_corpus(self, spark, sf_dir):
        """The registered plan above the cutover is a real distributed
        plan: its lineage contains the block-pair FlatMapGroupsInPandas,
        not a LocalTableScan of collected rows."""
        from eeg_data_lake_spark.operators.allpairs import cosine_neardup_pairs

        v = self._load(spark, sf_dir)
        plan = cosine_neardup_pairs(
            v, 0.45, broadcast_cutover=0, rows_per_block=7
        )._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" in plan


def test_salted_join_rejects_outer_joins(spark):
    from eeg_data_lake_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, 10)], "k long, lid long")
    right = spark.createDataFrame([(1, "a"), (2, "b")], "k long, tag string")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="inner/left-family"):
            salted_join(left, right, ["k"], how=how)


def test_connected_components_raises_past_max_iter(spark):
    from eeg_data_lake_spark.operators.graph import connected_components

    # a 8-node chain has diameter 7 > max_iter=3 → must raise, not
    # return partially-propagated labels
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=3)


def test_asof_null_payload_not_resurrected(spark):
    """The matched right row's NULLs must survive: carrying columns
    independently would resurrect older non-null values and emit a
    right row that never existed."""
    from eeg_data_lake_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 3)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 1, 5, "x"), (1, 2, None, "y")],
        "k long, rt long, a int, b string",
    )
    row = asof_join(left, right, on="k", left_ts="t", right_ts="rt").first()
    assert row.a is None and row.b == "y"  # the t=2 row, intact


def test_asof_null_right_ts_matches_nothing(spark):
    """right_ts IS NULL never satisfies right_ts <= left_ts; without
    filtering, the NULL sorts first and leaks into every left row."""
    from eeg_data_lake_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 5)], "k long, t long")
    right = spark.createDataFrame([(1, None, 7)], "k long, rt long, val int")
    row = asof_join(left, right, on="k", left_ts="t", right_ts="rt").first()
    assert row.val is None


def test_range_count_join_same_key_name(spark):
    """Both sides sharing the key (and count) column names must not
    trigger an ambiguous-reference error."""
    from pyspark.sql import functions as F

    from eeg_data_lake_spark.operators.joins import range_count_join

    left = spark.createDataFrame([(1, 10), (2, 20)], "user_id long, t0 long")
    right = spark.createDataFrame(
        [(1, 11), (1, 15), (1, 99), (2, 5)], "user_id long, ts long"
    )
    out = {
        r.t0: r.n_ts
        for r in range_count_join(
            left, right,
            on=("user_id", "user_id"),
            right_ts="ts",
            range_start=F.col("t0"),
            range_end=F.col("t0") + 10,
            count_col="ts",
            group_cols=("t0",),
        ).collect()
    }
    assert out == {10: 2, 20: 0}


def test_pagerank_matches_numpy_power_iteration(spark):
    """pagerank() == the dense numpy power iteration on the same
    (symmetrized, deduplicated) graph, node for node."""
    import numpy as np

    from eeg_data_lake_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=10).collect()}

    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    adj = np.zeros((len(nodes), len(nodes)))
    for a, b in edges:
        adj[idx[a], idx[b]] = adj[idx[b], idx[a]] = 1
    deg = adj.sum(axis=1)
    r = np.ones(len(nodes))
    for _ in range(10):
        r = 0.15 + 0.85 * adj.T @ (r / deg)
    for n in nodes:
        assert got[n] == pytest.approx(r[idx[n]], rel=1e-9)
    # sanity: the degree-3 hub outranks leaves
    assert got[2] == max(got.values())


def test_pagerank_is_deterministic_across_runs(spark):
    from eeg_data_lake_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [(i, (i * 7 + 1) % 20) for i in range(40)], "src long, dst long"
    ).filter("src <> dst")
    a = sorted(map(tuple, pagerank(df, iters=5).collect()))
    b = sorted(map(tuple, pagerank(df, iters=5).collect()))
    assert a == b


def test_group_aware_folds_never_split_a_source(spark, sf_dir):
    """The structural invariant behind r16: a source's documents all
    share one fold (fold is a pure function of source)."""
    from pyspark.sql import functions as F

    from eeg_data_lake_spark.workload.registry import t as load

    d = load(spark, sf_dir, "documents")
    fold = (
        (
            F.instr(
                F.lit("0123456789abcdef"),
                F.substring(F.md5(F.col("source")), 1, 1),
            )
            - 1
        )
        % 5
    ).cast("long")
    spans = (
        d.withColumn("fold", fold)
        .groupBy("source")
        .agg(F.countDistinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert spans == 0


class TestIntervalOverlapJoin:
    def test_count_once_across_many_bins(self, spark):
        """A long interval overlapping a short one across many bins
        must yield exactly ONE pair row (the count-once bin rule), and
        touching endpoints count as overlap (inclusive semantics)."""
        from eeg_data_lake_spark.operators.joins import interval_overlap_join

        df = spark.createDataFrame(
            [
                ("u", 1, 0, 10_000),      # spans bins 0..10
                ("u", 2, 3_500, 4_200),   # inside bin 3-4
                ("u", 3, 10_000, 11_000), # touches id 1 at exactly 10_000
                ("u", 4, 20_000, 21_000), # disjoint
                ("v", 5, 3_500, 4_200),   # other key: never pairs
            ],
            "k string, id long, s long, e long",
        )
        rows = {
            (r.id_a, r.id_b): r.overlap_us
            for r in interval_overlap_join(
                df, ["k"], "id", "s", "e", bin_us=1_000
            ).collect()
        }
        assert rows == {(1, 2): 700, (1, 3): 0}

    def test_no_nested_loop_in_plan(self, spark):
        from eeg_data_lake_spark.operators.joins import interval_overlap_join
        from eeg_data_lake_spark.plans import has_cartesian_or_bnlj

        df = spark.createDataFrame(
            [("u", i, i * 100, i * 100 + 500) for i in range(50)],
            "k string, id long, s long, e long",
        )
        out = interval_overlap_join(df, ["k"], "id", "s", "e", bin_us=1_000)
        assert not has_cartesian_or_bnlj(out)


def test_asof_null_key_rows_get_null_payload(spark):
    """NULL join keys match nothing under equi-join semantics; without
    the right-side key filter, Window.partitionBy groups NULLs together
    and a NULL-key right row leaks its payload onto NULL-key left
    rows."""
    left = spark.createDataFrame(
        [(None, 10), (1, 10)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(None, 5, "leak"), (1, 5, "ok")], "k long, rt long, v string"
    )
    out = {
        r.k: r.v
        for r in asof_join(left, right, "k", "t", "rt").collect()
    }
    assert out == {None: None, 1: "ok"}


def test_asof_reserved_names_rejected(spark):
    left = spark.createDataFrame([(1, 10, "x")], "k long, t long, __t string")
    right = spark.createDataFrame([(1, 5, "p")], "k long, rt long, v string")
    with pytest.raises(ValueError, match="reserved names"):
        asof_join(left, right, "k", "t", "rt")


def test_interval_overlap_malformed_intervals_dropped(spark):
    """end < start is an EMPTY interval: it overlaps nothing (dropped,
    the SQL-predicate outcome) instead of joining with negative
    overlap via the auto-reversing sequence()."""
    from eeg_data_lake_spark.operators.joins import interval_overlap_join

    df = spark.createDataFrame(
        [
            ("u", 1, 0, 1000),
            ("u", 2, 500, 1500),
            ("u", 3, 5000, 3000),  # malformed: e < s
        ],
        "k string, id long, s long, e long",
    )
    pairs = interval_overlap_join(
        df, ["k"], "id", "s", "e", bin_us=1000
    ).collect()
    assert [(r.id_a, r.id_b, r.overlap_us) for r in pairs] == [(1, 2, 500)]
    assert all(r.overlap_us >= 0 for r in pairs)
