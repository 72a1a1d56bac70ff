"""Python DataSource WRITER: JSONL shard export with manifest-last
commit, checksum verification, round-trip, overwrite semantics."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.jsonlsink import (
    JsonlShardsDataSource,
    read_manifest,
    verify_export,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(JsonlShardsDataSource)
    return spark


def test_export_roundtrip_and_manifest(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "corpus")
    df = spark.range(0, 1000).select(
        "id",
        F.concat(F.lit("doc-"), F.col("id")).alias("text"),
        F.to_date(F.lit("2024-01-02")).alias("day"),
    ).repartition(4)
    df.write.format("jsonlshards").mode("append").option("path", out).save()

    m = read_manifest(out)
    assert m["total_rows"] == 1000
    assert len(m["shards"]) == 4
    assert verify_export(out) == []

    back = spark.read.json(os.path.join(out, "*.jsonl"))
    assert back.count() == 1000
    row = back.filter(F.col("id") == 7).collect()[0]
    assert row.text == "doc-7" and row.day == "2024-01-02"


def test_overwrite_replaces_export(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "corpus")
    spark.range(0, 100).repartition(2).write.format("jsonlshards").mode(
        "append"
    ).option("path", out).save()
    spark.range(0, 10).repartition(1).write.format("jsonlshards").mode(
        "overwrite"
    ).option("path", out).save()
    m = read_manifest(out)
    assert m["total_rows"] == 10 and len(m["shards"]) == 1
    # no stale shards on disk
    shards = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(shards) == 1
    assert verify_export(out) == []


def test_overwrite_spares_unmanifested_shards(registered, tmp_path):
    """ADVICE r4: overwrite's reclaim sweep must delete ONLY the
    shards the previous manifest listed — a `.jsonl` the manifest
    doesn't know about is indistinguishable from a concurrent append
    job's not-yet-committed shard, and deleting it would corrupt that
    job's commit."""
    spark = registered
    out = str(tmp_path / "corpus")
    spark.range(0, 100).repartition(2).write.format("jsonlshards").mode(
        "append"
    ).option("path", out).save()
    prev = {s["file"] for s in read_manifest(out)["shards"]}
    # simulate a concurrent append's in-flight (uncommitted) shard
    inflight = os.path.join(out, "shard-deadbeef0001.jsonl")
    with open(inflight, "w") as fh:
        fh.write('{"id": 999}\n')
    spark.range(0, 10).repartition(1).write.format("jsonlshards").mode(
        "overwrite"
    ).option("path", out).save()
    # previous generation reclaimed, in-flight shard untouched
    left = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert not (prev & left)
    assert "shard-deadbeef0001.jsonl" in left
    assert read_manifest(out)["total_rows"] == 10
    assert verify_export(out) == []  # manifest consistent regardless


def test_append_merges_into_existing_manifest(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "corpus")
    spark.range(0, 100).repartition(2).write.format("jsonlshards").mode(
        "append"
    ).option("path", out).save()
    spark.range(100, 150).repartition(1).write.format("jsonlshards").mode(
        "append"
    ).option("path", out).save()
    m = read_manifest(out)
    assert m["total_rows"] == 150 and len(m["shards"]) == 3
    assert verify_export(out) == []


def test_failed_overwrite_preserves_previous_export(registered, tmp_path):
    """A job that dies mid-overwrite must leave the previous good
    manifest AND every shard it references untouched (old behavior
    deleted them up front, destroying the export before any task ran)."""
    spark = registered
    out = str(tmp_path / "corpus")
    spark.range(0, 100).repartition(2).write.format("jsonlshards").mode(
        "append"
    ).option("path", out).save()
    before = read_manifest(out)

    def boom(i: int) -> int:
        raise RuntimeError("task failure injected")

    ubad = F.udf(boom, "int")
    with pytest.raises(Exception):
        spark.range(0, 10).select(ubad("id").alias("id")).repartition(
            1
        ).write.format("jsonlshards").mode("overwrite").option(
            "path", out
        ).save()

    assert read_manifest(out) == before  # manifest untouched
    assert verify_export(out) == []  # every referenced shard intact


def test_verify_detects_corruption(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "corpus")
    spark.range(0, 50).repartition(1).write.format("jsonlshards").mode(
        "append"
    ).option("path", out).save()
    shard = read_manifest(out)["shards"][0]["file"]
    with open(os.path.join(out, shard), "ab") as fh:
        fh.write(b'{"id": 999}\n')  # tampered
    problems = verify_export(out)
    assert problems and any("checksum" in p for p in problems)


def test_deterministic_bytes_per_row(registered, tmp_path):
    """Same rows → same checksums (sorted keys + ISO dates make the
    shard md5 a real integrity check)."""
    spark = registered
    outs = []
    for i in range(2):
        out = str(tmp_path / f"c{i}")
        spark.range(0, 20).select(
            "id", F.current_date().alias("d")
        ).coalesce(1).write.format("jsonlshards").mode("append").option(
            "path", out
        ).save()
        outs.append(read_manifest(out)["shards"][0]["md5"])
    assert outs[0] == outs[1]


def test_nested_struct_rows_serialize(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "nested")
    spark.range(0, 5).select(
        "id", F.struct(F.lit("en").alias("lang"), F.col("id").alias("n")).alias("meta")
    ).coalesce(1).write.format("jsonlshards").mode("append").option(
        "path", out
    ).save()
    assert verify_export(out) == []
    back = spark.read.json(os.path.join(out, "*.jsonl"))
    r = back.filter(F.col("id") == 3).collect()[0]
    assert r.meta.lang == "en" and r.meta.n == 3


def test_crashed_overwrite_reclaim_sidecar_drains_on_next_commit(
    registered, tmp_path
):
    """An overwrite that died between its manifest swap and its shard
    unlinks leaves a durable .reclaim sidecar; the NEXT commit (here an
    append) must finish the reclaim instead of orphaning the
    generation forever."""
    spark = registered
    out = str(tmp_path / "corpus")
    spark.range(0, 10).repartition(1).write.format("jsonlshards").mode(
        "append"
    ).option("path", out).save()

    # simulate the post-swap crash: an unreferenced shard plus the
    # sidecar its overwrite wrote before dying
    orphan = "shard-deadbeef0001.jsonl"
    open(os.path.join(out, orphan), "w").write('{"id": 0}\n')
    with open(os.path.join(out, ".reclaim-test1"), "w") as fh:
        json.dump([orphan], fh)

    spark.range(10, 20).repartition(1).write.format("jsonlshards").mode(
        "append"
    ).option("path", out).save()
    assert not os.path.exists(os.path.join(out, orphan))
    assert not os.path.exists(os.path.join(out, ".reclaim-test1"))
    assert verify_export(out) == []


def test_reclaim_sidecar_never_touches_live_shards(registered, tmp_path):
    """A sidecar whose writer died BEFORE its swap lists still-live
    shards: draining must skip them (they are in the current manifest)
    and just discard the sidecar. Torn sidecars are discarded too."""
    spark = registered
    out = str(tmp_path / "corpus")
    spark.range(0, 10).repartition(1).write.format("jsonlshards").mode(
        "append"
    ).option("path", out).save()
    live = [s["file"] for s in read_manifest(out)["shards"]]
    with open(os.path.join(out, ".reclaim-test2"), "w") as fh:
        json.dump(live, fh)
    open(os.path.join(out, ".reclaim-torn"), "w").write('["shard-x')

    spark.range(10, 20).repartition(1).write.format("jsonlshards").mode(
        "append"
    ).option("path", out).save()
    for f in live:
        assert os.path.exists(os.path.join(out, f))  # survived
    assert not os.path.exists(os.path.join(out, ".reclaim-test2"))
    assert not os.path.exists(os.path.join(out, ".reclaim-torn"))
    assert verify_export(out) == []
