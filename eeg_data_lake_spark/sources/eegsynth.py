"""A Spark 4 Python DataSource serving synthetic EEG trials.

The reference generates synthetic test signals with a single-node
helper (SURVEY §2.1 S17 — /root/reference/tests fixtures); this is the
engine-native form: ``spark.read.format("eegsynth")`` produces the
same deterministic long-format signal rows as a first-class scan —
partition-parallel (one input partition per trial, so a 1M-trial load
fans out across the cluster with zero files and zero driver memory),
with **planning-time filter pushdown**: trial_id range predicates
prune entire partitions before any row is generated, the Python
DataSource analog of parquet partition pruning
(``spark.sql.python.filterPushdown.enabled`` must be on; without it
Spark simply runs the filter post-scan — correctness never depends on
the pushdown).

Rows are produced as Arrow RecordBatches built from vectorized numpy
(one batch per trial·channel block), not per-row Python tuples — the
same Arrow-batch discipline the repo applies to UDFs.

Signal model (deterministic per (seed, trial, channel)): a per-channel
sine at a channel-indexed frequency (4 + 2·channel_index Hz) plus 0.1σ
seeded Gaussian noise. NOTE: this is the same *style* of synthetic EEG
as eeg_data_lake_spark.fixtures but a different model (fixtures uses
the reference's per-channel 8/10/6/12/4 Hz sin/cos waves and one
sequential RNG per trial) — analytic expectations derived for one do
NOT transfer to the other.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from eeg_data_lake_spark import schemas

_SCHEMA = (
    "trial_id long, channel string, sample_idx int, "
    "time_sec double, value double"
)


class _TrialPartition(InputPartition):
    def __init__(self, trial_id: int):
        self.trial_id = trial_id


class EEGSynthReader(DataSourceReader):
    def __init__(self, options):
        self.n_trials = int(options.get("n_trials", 8))
        self.samples = int(options.get("samples", 256))
        self.seed = int(options.get("seed", 7))
        chans = options.get("channels")
        self.channels: Sequence[str] = (
            [c.strip() for c in chans.split(",")] if chans else list(schemas.CHANNELS)
        )
        self.lo = 0  # inclusive trial range after pushdown
        self.hi = self.n_trials - 1

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume trial_id range predicates by narrowing [lo, hi];
        everything else is returned for Spark to apply post-scan."""
        for f in filters:
            attr = getattr(f, "attribute", ())
            col = attr[0] if len(attr) == 1 else None
            if col == "trial_id" and isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value))
            elif col == "trial_id" and isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif col == "trial_id" and isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif col == "trial_id" and isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value) - 1)
            elif col == "trial_id" and isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value))
            else:
                yield f  # unsupported → Spark filters after the scan

    def partitions(self):
        if self.hi < self.lo:
            # pushdown narrowed the range to empty. Returning [] makes
            # PySpark substitute [None] and call read(None) → crash;
            # a sentinel empty partition yields zero rows instead.
            return [_TrialPartition(-1)]
        return [_TrialPartition(t) for t in range(self.lo, self.hi + 1)]

    def read(self, partition: _TrialPartition):
        import numpy as np
        import pyarrow as pa

        if partition is None or partition.trial_id < 0:
            return  # empty-range sentinel (or defensive None): no rows
        t = partition.trial_id
        n = self.samples
        # Arrow arrays built from the SAME generator as the stream
        # reader — one definition of the signal model, so batch==stream
        # parity cannot silently desynchronize.
        idx, time_sec, channel_values = _trial_arrays(self, t)
        for ch, value in channel_values:
            yield pa.RecordBatch.from_pydict(
                {
                    "trial_id": pa.array(np.full(n, t, dtype=np.int64)),
                    "channel": pa.array([ch] * n, type=pa.string()),
                    "sample_idx": pa.array(idx.astype(np.int32)),
                    "time_sec": pa.array(time_sec),
                    "value": pa.array(value),
                }
            )


def _trial_arrays(reader_opts, trial_id: int):
    """The signal model, defined ONCE: (idx, time_sec, [(channel,
    values)]) for one trial. Both the batch partition reader (Arrow
    wrapping) and the stream reader (tuple rows) consume this, so an
    edit to the model can never desynchronize batch vs stream output
    (bit-identical replay is what the stream's exactly-once story
    rests on)."""
    import numpy as np

    n = reader_opts.samples
    idx = np.arange(n, dtype=np.int64)
    time_sec = idx / float(schemas.FS)
    out = []
    for ci, ch in enumerate(reader_opts.channels):
        rng = np.random.default_rng((reader_opts.seed, trial_id, ci))
        freq = 4.0 + 2.0 * ci
        value = np.sin(2.0 * np.pi * freq * time_sec) + 0.1 * (
            rng.standard_normal(n)
        )
        out.append((ch, value))
    return idx, time_sec, out


def _trial_rows(reader_opts, trial_id: int):
    """Row tuples for one trial (the simple-stream contract), from the
    shared signal model in _trial_arrays."""
    idx, time_sec, channel_values = _trial_arrays(reader_opts, trial_id)
    for ch, value in channel_values:
        for i in range(len(idx)):
            yield (trial_id, ch, int(idx[i]), float(time_sec[i]), float(value[i]))


class EEGSynthStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same synthetic trials: each batch
    emits one trial; the offset is {"trial": next}. Deterministic
    generation makes ``readBetweenOffsets`` (crash-recovery replay of
    a committed-but-unread batch) trivially exact — the replayed rows
    are bit-identical, which is what gives the stream its end-to-end
    exactly-once story when paired with an idempotent sink."""

    def __init__(self, options):
        self._r = EEGSynthReader(options)

    def initialOffset(self) -> dict:
        return {"trial": 0}

    def read(self, start: dict):
        # Rows returned here are pickled by the driver-side prefetcher
        # before shipping to executors — they must be a materialized
        # list, not a generator (generators don't pickle).
        t = int(start["trial"])
        if t >= self._r.n_trials:
            # caught up: empty batch, same offset — must be an ITERATOR
            # (the prefetcher validates no-advance batches with next(it))
            return iter(()), start
        return iter(list(_trial_rows(self._r, t))), {"trial": t + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for t in range(int(start["trial"]), int(end["trial"])):
            rows.extend(_trial_rows(self._r, t))
        return rows


class EEGSynthDataSource(DataSource):
    """``spark.dataSource.register(EEGSynthDataSource)`` then
    ``spark.read.format("eegsynth").option("n_trials", 100).load()``
    for batch, or ``spark.readStream.format("eegsynth")...`` for a
    one-trial-per-micro-batch stream."""

    @classmethod
    def name(cls) -> str:
        return "eegsynth"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> EEGSynthReader:
        return EEGSynthReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> EEGSynthStreamReader:
        return EEGSynthStreamReader(self.options)
