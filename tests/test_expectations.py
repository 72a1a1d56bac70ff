"""Data-quality expectations: one-pass audit counts, drop/quarantine
enforcement, NULL-means-violation CHECK semantics, and the audit/
enforce agreement invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.operators.expectations import audit, enforce

def _rules():
    # built lazily: Column operators need an active SparkContext, which
    # doesn't exist at module-collection time
    return {
        "v_positive": F.col("v") > 0,
        "name_present": F.col("name").isNotNull(),
        "v_small": F.col("v") < 100,
    }


@pytest.fixture()
def df(spark):
    rows = [
        (1, 5.0, "a"),      # passes all
        (2, -1.0, "b"),     # fails v_positive
        (3, None, "c"),     # NULL v → fails v_positive AND v_small
        (4, 7.0, None),     # fails name_present
        (5, 500.0, "e"),    # fails v_small
    ]
    return spark.createDataFrame(rows, "id long, v double, name string")


def test_audit_counts_each_rule_once_per_row(spark, df):
    got = {r["rule"]: r for r in audit(df, _rules()).collect()}
    assert set(got) == set(_rules())
    assert all(r["n_rows"] == 5 for r in got.values())
    assert got["v_positive"]["n_violations"] == 2   # id 2, id 3 (NULL)
    assert got["name_present"]["n_violations"] == 1
    assert got["v_small"]["n_violations"] == 2      # id 3 (NULL), id 5
    assert got["name_present"]["violation_frac"] == pytest.approx(0.2)


def test_enforce_drop_keeps_only_fully_passing_rows(spark, df):
    passed, quarantined = enforce(df, _rules(), mode="drop")
    assert quarantined is None
    assert [r.id for r in passed.collect()] == [1]


def test_enforce_quarantine_tags_failed_rules(spark, df):
    passed, quarantined = enforce(df, _rules(), mode="quarantine")
    assert [r.id for r in passed.collect()] == [1]
    tags = {r.id: sorted(r._failed_rules) for r in quarantined.collect()}
    assert tags == {
        2: ["v_positive"],
        3: ["v_positive", "v_small"],
        4: ["name_present"],
        5: ["v_small"],
    }
    # quarantine keeps the original columns alongside the tag
    assert set(quarantined.columns) == {"id", "v", "name", "_failed_rules"}


def test_audit_matches_enforce_partition(spark, df):
    """The audit's total-violating-row bound and the enforce split
    agree: rows quarantined == rows failing >= 1 rule."""
    passed, quarantined = enforce(df, _rules(), mode="quarantine")
    assert passed.count() + quarantined.count() == df.count()
    # every rule's violation count equals the quarantined rows tagged
    # with that rule
    got = {r["rule"]: r["n_violations"] for r in audit(df, _rules()).collect()}
    q = quarantined.select(F.explode("_failed_rules").alias("rule"))
    per_rule = {
        r["rule"]: r["n"]
        for r in q.groupBy("rule").agg(F.count("*").alias("n")).collect()
    }
    assert got == {**{k: 0 for k in _rules()}, **per_rule}


def test_validates_arguments(spark, df):
    with pytest.raises(ValueError, match="at least one"):
        audit(df, {})
    with pytest.raises(ValueError, match="unknown mode"):
        enforce(df, _rules(), mode="fail_fast")


def test_expectations_gated_streaming_ingest(spark, tmp_path):
    """The production composition: a document stream is split by
    enforce() inside foreachBatch — passing rows append to the corpus
    table, violations (tagged with their failed rules) to a quarantine
    table, both exactly-once under the same batch txn scheme. A
    replayed batch commits nothing twice to either table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from eeg_data_lake_spark.sources.txlog import TxTable

    src = tmp_path / "exp_src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["good doc here", "", "also fine", None]),
            }
        ),
        str(src / "a.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([5, 6], pa.int64()),
                "text": pa.array(["ok", ""]),
            }
        ),
        str(src / "b.parquet"),
    )

    corpus = TxTable(spark, str(tmp_path / "corpus"))
    quarantine = TxTable(spark, str(tmp_path / "quarantine"))

    def rules():
        return {
            "text_present": F.col("text").isNotNull(),
            "text_nonempty": F.length(F.col("text")) > 0,
        }

    def process(batch_df, batch_id):
        passed, bad = enforce(batch_df, rules(), mode="quarantine")
        corpus.append(passed, txn_id=f"exp:corpus-{batch_id}")
        quarantine.append(
            bad.withColumn("_failed_rules", F.to_json("_failed_rules")),
            txn_id=f"exp:quarantine-{batch_id}",
        )

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    good = {r.doc_id for r in corpus.read().collect()}
    bad = {r.doc_id: r._failed_rules for r in quarantine.read().collect()}
    assert good == {1, 3, 5}
    assert set(bad) == {2, 4, 6}
    assert "text_present" in bad[4] and "text_nonempty" in bad[2]

    # replay: the same batches re-commit as no-ops (txn-id idempotence)
    pv, qv = corpus.version(), quarantine.version()
    process(spark.createDataFrame([(1, "good doc here")], "doc_id long, text string"), 0)
    assert corpus.version() == pv and quarantine.version() == qv
    assert corpus.read().count() == 3


def test_rule_names_are_data_not_sql(spark, df):
    """Rule names are arbitrary labels — quotes, spaces, hyphens and
    dots must neither crash the audit nor reach a SQL parser."""
    weird = {
        "bad'name": F.col("v") > 0,
        "has space": F.col("v") < 100,
        "dot.and-dash": F.col("name").isNotNull(),
    }
    got = {r["rule"]: r["n_violations"] for r in audit(df, weird).collect()}
    assert got == {"bad'name": 2, "has space": 2, "dot.and-dash": 1}
    _passed, quarantined = enforce(df, weird, mode="quarantine")
    tags = {r.id: set(r._failed_rules) for r in quarantined.collect()}
    assert tags[3] == {"bad'name", "has space"}
