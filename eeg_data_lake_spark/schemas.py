"""Canonical schemas for the medallion layers and the driver test tables.

The reference mixes inferred, explicit-StructType and write-time-enforced
schemas (SURVEY.md §1.3). This engine mandates explicit StructTypes
everywhere; inferSchema never runs in production paths.

Bronze unifies the reference's two incompatible variants
(/root/reference/delta_bronze.py:45-72 vs /root/reference/main/combine_files.py:46-75)
on v2 column names + v1's lineage columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Emotiv Insight channel whitelist (/root/reference/delta_bronze.py:13).
CHANNELS = ["AF3", "AF4", "T7", "T8", "Pz"]

#: Sampling rate in Hz (/root/reference/delta_bronze.py:12).
FS = 128.0

#: Filename metadata regex, v2 5-group form
#: (/root/reference/main/combine_files.py:46).
FILENAME_RX = r"MindBigData_Imagenet_([^_]+)_(n\d+)_(\d+)_(\d+)_(\d+)\.csv"

#: Pilot trial filename regex (/root/reference/pilots/pilot_silver.py:57).
PILOT_TRIAL_RX = r"trial_(\d+)\.csv"


def wide_channel_schema() -> T.StructType:
    """Headered pilot CSV: one double column per channel
    (/root/reference/pilots/pilot_bronze.py:77-84)."""
    return T.StructType(
        [T.StructField(c, T.DoubleType(), True) for c in CHANNELS]
    )


BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType(), False),
        T.StructField("headset", T.StringType(), True),
        T.StructField("synset", T.StringType(), True),
        T.StructField("image_id", T.IntegerType(), True),
        T.StructField("take", T.IntegerType(), True),
        T.StructField("session", T.IntegerType(), True),
        T.StructField("channel", T.StringType(), False),
        T.StructField("sample_idx", T.IntegerType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("time_sec", T.DoubleType(), True),
        T.StructField("_ingest_ts", T.TimestampType(), False),
        T.StructField("_ingest_date", T.DateType(), False),
    ]
)

SILVER_SCHEMA = T.StructType(
    [T.StructField("trial_id", T.LongType(), False)]
    + [f for f in BRONZE_SCHEMA.fields if not f.name.startswith("_")]
    + [
        T.StructField("z", T.DoubleType(), True),
        T.StructField("is_outlier", T.BooleanType(), False),
    ]
)

#: gold_trial_channel output columns (/root/reference/main/gold.py:40-81).
GOLD_TRIAL_CHANNEL_KEYS = [
    "trial_id", "channel", "synset", "image_id", "take", "session", "headset",
]

#: per-epoch feature schema (/root/reference/pilots/pilot_gold.py:44-115).
GOLD_EPOCH_KEYS = ["trial_id", "channel", "epoch_id", "win_start_sec", "win_end_sec"]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

#: JSON shape of events.props (driver testdata: {"k": <int>}).
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType(), True)])

#: Multimodal asset table: opaque binary payload + typed metadata
#: (north-star "multimodal columns"; PNG/PPM/PGM and PCM16 payloads
#: decode through the real pure-Python codecs in functions/, other
#: formats fall back to the documented deterministic stand-in).
MULTIMODAL_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("media_type", T.StringType(), True),  # e.g. image/png
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
