"""Thread-safe, idempotent registration of the package's Python data
sources.

Python data sources are not usable from arbitrary driver threads in
Spark 4.1 classic: ``DataSource.lookupDataSource`` resolves a Python
source name through the JVM's ACTIVE-SESSION thread-local, and under
py4j pinned-thread mode (the default) a fresh Python driver thread's
JVM companion inherits that thread-local from whichever JVM thread
happened to spawn the connection — often none. The lookup then falls
through to the classpath and ``.format(name)`` fails with
``DATA_SOURCE_NOT_FOUND: jsonlshards`` even though the session
registered it. Observed concretely: the 8-thread plan sweep building
the jsonl-export query failed its own ``.save()`` intermittently
(whether the companion JVM thread had the active session set is
connection-pool luck — reproduced deterministically with a
bare-thread vs ``setActiveSession`` A/B, 4/4 fail vs 4/4 pass).

The engine submits independent jobs from driver threads by design
(optimization guide §2.6), so usability must not depend on which
thread builds the query. ``register_python_sources`` therefore makes
two guarantees:

1. registration happens exactly once per session, under one
   process-wide lock, and registers ALL package sources in a single
   burst (no concurrent-registration interleavings to reason about);
2. every call — including the no-op repeats — pins the session as the
   CALLING thread's JVM active session, so the Python-source lookup
   in any subsequent ``.format(...)`` on this thread resolves.

Builtin sources (parquet etc.) resolve via the classpath and never
needed any of this — which is why only the Python-source queries were
exposed.
"""

from __future__ import annotations

import threading

_LOCK = threading.Lock()
_ATTR = "_edl_pyds_registered"


def _package_sources():
    # imported lazily: this module is imported by workload builders and
    # must not drag every source module in at import time
    from eeg_data_lake_spark.sources.eegsynth import EEGSynthDataSource
    from eeg_data_lake_spark.sources.jsonlsink import JsonlShardsDataSource
    from eeg_data_lake_spark.sources.txstream import TxLogStreamDataSource

    return (EEGSynthDataSource, JsonlShardsDataSource, TxLogStreamDataSource)


def register_python_sources(spark) -> None:
    """Make every Python data source this package ships usable from
    the CURRENT driver thread of ``spark``: registers all of them
    exactly once per session (lock-serialized) and pins the session
    as this thread's JVM active session so the name lookup resolves.
    Call this instead of ``spark.dataSource.register`` in query
    builders."""
    with _LOCK:
        if not getattr(spark, _ATTR, False):
            for cls in _package_sources():
                spark.dataSource.register(cls)
            setattr(spark, _ATTR, True)
    # runs on EVERY call: under py4j pinned-thread mode this executes
    # on the calling thread's JVM companion, which is exactly the
    # thread whose active-session thread-local the later
    # .format(<python source>) lookup consults
    spark._jvm.org.apache.spark.sql.SparkSession.setActiveSession(
        spark._jsparkSession
    )
