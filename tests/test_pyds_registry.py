"""Thread-safety contract of sources/pyds.register_python_sources.

The plan sweep (8 plan-construction threads over the shared session)
exposed a real race in bare ``spark.dataSource.register`` calls from
concurrent driver threads: the jsonl-export query registered
``jsonlshards`` and immediately failed its own ``.save()`` with
DATA_SOURCE_NOT_FOUND while another thread registered ``txlogcdc`` —
a lost update in the session data-source manager's lazy
initialization. The helper serializes registration under one lock and
registers every package source in a single first-call burst, so by
the time any thread can reach a format lookup the registry is complete
and never mutated again. These tests pin that contract; the 8-thread
plan sweep itself stays the integration-level canary.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from eeg_data_lake_spark.sources.pyds import register_python_sources

ALL_NAMES = ("eegsynth", "jsonlshards", "txlogcdc")


def _registered_names(spark):
    m = spark._jsparkSession.sessionState().dataSourceManager()
    return {n for n in ALL_NAMES if m.dataSourceExists(n)}


def test_concurrent_first_touch_registers_everything(spark):
    # fresh session twin so THIS test owns the first-touch burst
    s2 = spark.newSession()
    with ThreadPoolExecutor(max_workers=16) as pool:
        list(pool.map(lambda _: register_python_sources(s2), range(32)))
    assert _registered_names(s2) == set(ALL_NAMES)


def test_repeat_calls_are_noops_and_complete(spark):
    register_python_sources(spark)
    register_python_sources(spark)
    assert _registered_names(spark) == set(ALL_NAMES)
    assert getattr(spark, "_edl_pyds_registered") is True


def test_registered_source_is_usable_after_concurrent_burst(spark, tmp_path):
    # end-to-end: the format that originally failed under the race
    # must be usable immediately after a concurrent registration burst
    s2 = spark.newSession()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(lambda _: register_python_sources(s2), range(8)))
    out = str(tmp_path / "export")
    (
        s2.range(10)
        .selectExpr("id AS doc_id", "'en' AS lang", "repeat('x', 5) AS text")
        .repartition(2)
        .write.format("jsonlshards")
        .mode("overwrite")
        .option("path", out)
        .save()
    )
    from eeg_data_lake_spark.sources.jsonlsink import read_manifest

    assert read_manifest(out)["total_rows"] == 10


def test_usable_from_fresh_driver_threads(spark, tmp_path):
    # the exact failing shape: a FRESH driver thread (whose py4j JVM
    # companion inherited no active session) builds and saves with a
    # Python data source. Before the setActiveSession pin this failed
    # deterministically with DATA_SOURCE_NOT_FOUND on bare threads
    # (4/4 in the round-11 probe) even when the session had the source
    # registered by another thread.
    register_python_sources(spark)  # registered by THIS thread

    def save_in_thread(i):
        register_python_sources(spark)  # no-op register + thread pin
        out = str(tmp_path / f"export_{i}")
        (
            spark.range(5)
            .selectExpr("id AS doc_id", "'en' AS lang", "'x' AS text")
            .write.format("jsonlshards")
            .mode("overwrite")
            .option("path", out)
            .save()
        )
        from eeg_data_lake_spark.sources.jsonlsink import read_manifest

        return read_manifest(out)["total_rows"]

    with ThreadPoolExecutor(max_workers=4) as pool:
        assert list(pool.map(save_in_thread, range(4))) == [5, 5, 5, 5]
