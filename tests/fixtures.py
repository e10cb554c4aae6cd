"""Reference-native fixtures (FIXTURES.md): tiny inline tables with the
shapes and edge cases the DDL + webhook payload imply — NULL-key external
attendees, duplicate keys with different versions, preference-category
recording files with ties, illegal/overlong topics, bad timestamps."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (ArrayType, BooleanType, IntegerType, LongType,
                               StringType, StructField, StructType,
                               TimestampType)

PARTICIPANT_SCHEMA = StructType([
    StructField("user_id", StringType(), True),     # NULL = external attendee
    StructField("meeting_uuid", StringType(), False),
    StructField("name", StringType(), True),
    StructField("duration", IntegerType(), True),   # seconds
    StructField("version", IntegerType(), False),   # upsert arrival order
])

# duplicate (meeting_uuid, user_id) with different durations → last wins;
# two NULL-user_id rows for the same meeting → both must survive a merge
PARTICIPANTS = [
    ("u1", "m1", "Jill Chill", 3308, 1),
    ("u1", "m1", "Jill Chill", 3400, 2),      # same key, newer version
    ("u2", "m1", "Max Power", 1200, 1),
    (None, "m1", "Guest A", 600, 1),          # external attendee
    (None, "m1", "Guest B", 700, 1),          # second NULL key, distinct row
    ("u1", "m2", "Jill Chill", 100, 1),
]

RECORDING_FILE_SCHEMA = StructType([
    StructField("id", StringType(), False),
    StructField("meeting_uuid", StringType(), False),
    StructField("recording_type", StringType(), True),
    StructField("file_size", LongType(), True),
])

# the 4 preference categories of the reference handler with ties inside
RECORDING_FILES = [
    ("r1", "m1", "shared_screen_with_speaker_view", 100),
    ("r2", "m1", "shared_screen_with_speaker_view", 200),  # tie on type
    ("r3", "m1", "audio_only", 50),
    ("r4", "m1", "chat_file", 5),
    ("r5", "m2", "audio_only", 42),
]

# priority map: lower = preferred (category, priority) per recording_type
RECORDING_PREFERENCES = [
    ("shared_screen_with_speaker_view(CC)", "video", 0),
    ("shared_screen_with_speaker_view", "video", 1),
    ("shared_screen", "video", 2),
    ("active_speaker", "video", 3),
    ("audio_only", "audio", 0),
    ("audio_transcript", "transcript", 0),
    ("chat_file", "chat", 0),
]

DIRTY_TOPICS = [
    (1, 'a/b:c*d?e"f<g>h|i\\j'),
    (2, "x" * 300),
    (3, ""),
    (4, None),
    (5, "Clean Topic"),
]

BAD_TIMESTAMPS = [
    (1, "2021-07-13T21:44:51Z"),
    (2, "2021-07-13 21:44:51"),
    (3, "not-a-timestamp"),
    (4, None),
    (5, "2021-13-45T99:99:99Z"),
]


def participants(spark: SparkSession):
    return spark.createDataFrame(PARTICIPANTS, PARTICIPANT_SCHEMA)


def recording_files(spark: SparkSession):
    return spark.createDataFrame(RECORDING_FILES, RECORDING_FILE_SCHEMA)


def preferences(spark: SparkSession):
    return spark.createDataFrame(RECORDING_PREFERENCES,
                                 "recording_type string, category string, priority int")


def dirty_topics(spark: SparkSession):
    return spark.createDataFrame(DIRTY_TOPICS, "id int, topic string")


def bad_timestamps(spark: SparkSession):
    return spark.createDataFrame(BAD_TIMESTAMPS, "id int, ts_str string")


def ooo_events_stream(spark: SparkSession, sf_dir: str, n_slices: int = 3):
    """The events table replayed as an OUT-OF-ORDER multi-batch stream:
    sliced into event-time thirds written newest-first, streamed with
    maxFilesPerTrigger=1 — so later micro-batches carry OLDER events.
    The adversarial source for cross-batch ordering contracts (sink
    last-wins, SCD2 buffering): availableNow over a single file hides
    these bugs; this source exposes them."""
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.streaming.ingest import EVENTS_SCHEMA

    e = table(spark, sf_dir, "events")
    srcdir = tempfile.mkdtemp(prefix="zes_ooo_")
    slices = F.ntile(n_slices).over(Window.orderBy(F.col("ts").desc()))
    raw = (e.withColumn("g", slices)
           .withColumn("ts", F.unix_micros("ts") * 1000))  # back to nanos-long
    for g in range(1, n_slices + 1):
        (raw.filter(F.col("g") == g).drop("g")
         .coalesce(1).write.mode("overwrite").parquet(f"{srcdir}/f{g}"))
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true").parquet(srcdir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
