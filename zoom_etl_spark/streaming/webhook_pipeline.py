"""The complete webhook ingest pipeline (SURVEY §3.2 end-to-end):

  raw JSON stream → from_json(nested schema) → required-field validation
  → topic sanitization → explode recording_files (null-URL skip) →
  preference top-1 per (meeting, category) → storage path construction →
  staging upsert rows.

Every stage is the Spark-native twin of a Lambda step (reference
lambda/zoom_webhook/handler.py:38-111): validation :46-52, sanitize :54
(utils.py:82-88), preference select :18-36,59, null-URL skip :64-66,
path build :70,86, staging upsert :98 (utils.py:147-178). Works
identically on a batch DataFrame (tests) and a readStream source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import concat_path, sanitize_name
from ..operators.windows import topk_per_group
from ..sources.webhook_stream import WEBHOOK_SCHEMA

# recording_type → (category, priority): the preference table of
# handler.py:19-24 as data, not code (broadcast dim, not a when-chain)
PREFERENCES = [
    ("shared_screen_with_speaker_view(CC)", "video", 0),
    ("shared_screen_with_speaker_view", "video", 1),
    ("shared_screen", "video", 2),
    ("active_speaker", "video", 3),
    ("audio_only", "audio", 0),
    ("audio_transcript", "transcript", 0),
    ("chat_file", "chat", 0),
]


def parse_events(raw: DataFrame) -> DataFrame:
    """from_json the raw bodies; corrupt/malformed → NULL struct (kept —
    routed by validation, mirroring PERMISSIVE-mode semantics)."""
    return raw.select(
        "event_no",
        F.from_json("body", WEBHOOK_SCHEMA).alias("e"),
    ).select("event_no", F.col("e.payload.object").alias("o"),
             F.col("e.event_ts").alias("event_ts"))


def validate(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Required fields (handler.py:46-52): uuid, topic, host_email,
    start_time, recording_files. Returns (valid, rejected)."""
    from ..operators.quarantine import validate_split
    rules = [
        ("MISSING_UUID", F.col("o.uuid").isNotNull()),
        ("MISSING_TOPIC", F.col("o.topic").isNotNull()),
        ("MISSING_HOST_EMAIL", F.col("o.host_email").isNotNull()),
        ("MISSING_START_TIME", F.col("o.start_time").isNotNull()),
        ("MISSING_RECORDING_FILES",
         F.col("o.recording_files").isNotNull() & (F.size("o.recording_files") > 0)),
    ]
    return validate_split(parsed, rules)


def select_preferred_files(valid: DataFrame, prefs: DataFrame) -> DataFrame:
    """Explode files (skip null download_url), rank by category preference,
    keep the best per (meeting, category); ties → last file id wins
    (SURVEY §7.3: the reference dict-build keeps the last duplicate)."""
    files = (valid.select(
        F.col("o.uuid").alias("meeting_uuid"),
        sanitize_name(F.col("o.topic")).alias("topic"),
        F.col("o.host_email").alias("host_email"),
        F.col("o.start_time").alias("start_time"),
        F.explode("o.recording_files").alias("f"))
        .filter(F.col("f.download_url").isNotNull()))
    ranked = files.join(F.broadcast(prefs), files["f.recording_type"] == prefs["recording_type"])
    best = topk_per_group(
        ranked, keys=["meeting_uuid", "category"],
        order=[F.col("priority").asc(), F.col("f.id").desc()], k=1)
    return best.select(
        F.col("f.id").alias("id"),
        "meeting_uuid",
        F.col("f.file_type").alias("file_type"),
        F.col("f.file_size").alias("file_size"),
        F.col("f.recording_type").alias("recording_type"),
        concat_path(F.lit("recordings"), "host_email", "topic", "start_time",
                    F.col("f.file_type")).alias("file_path"),
    )


def webhook_batch_pipeline(raw: DataFrame, spark) -> tuple[DataFrame, DataFrame]:
    """Full pipeline on a (micro-)batch: returns (staging_rows, rejected)."""
    prefs = spark.createDataFrame(PREFERENCES,
                                  "recording_type string, category string, priority int")
    parsed = parse_events(raw)
    valid, rejected = validate(parsed)
    return select_preferred_files(valid, prefs), rejected
