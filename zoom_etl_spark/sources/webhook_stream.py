"""Webhook event stream as a custom Python STREAMING data source —
the reference's Lambda trigger (reference lambda/zoom_webhook/
handler.py:38-57; payload shape lambda/zoom_webhook/event.json:1-70)
re-expressed as a Structured Streaming source: each micro-batch delivers
the JSON bodies that arrived since the last offset; checkpointed offsets
replace Lambda's at-least-once redelivery contract.

No network here, so events are synthesized deterministically from the
offset — the offset/read/replay mechanics (the part a real Kafka/HTTP
bridge would reuse) are real.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType)

RAW_SCHEMA = StructType([
    StructField("event_no", LongType(), False),
    StructField("body", StringType(), False),   # raw JSON, parsed downstream
])

# the nested payload shape (FIXTURES.md §5) used by from_json downstream
WEBHOOK_SCHEMA = StructType([
    StructField("event", StringType()),
    StructField("event_ts", LongType()),
    StructField("payload", StructType([
        StructField("account_id", StringType()),
        StructField("object", StructType([
            StructField("id", LongType()),
            StructField("uuid", StringType()),
            StructField("host_id", StringType()),
            StructField("topic", StringType()),
            StructField("type", IntegerType()),
            StructField("start_time", StringType()),
            StructField("host_email", StringType()),
            StructField("duration", IntegerType()),
            StructField("recording_files", ArrayType(StructType([
                StructField("id", StringType()),
                StructField("recording_start", StringType()),
                StructField("recording_end", StringType()),
                StructField("recording_type", StringType()),
                StructField("file_type", StringType()),
                StructField("file_size", LongType()),
                StructField("download_url", StringType()),
            ]))),
        ])),
    ])),
])

_REC_TYPES = ["shared_screen_with_speaker_view", "audio_only", "chat_file"]


def synth_event(i: int) -> str:
    """Deterministic recording.completed body #i; every 5th event is
    malformed (missing uuid) to exercise the validation reject path."""
    obj = {
        "id": 1000 + i,
        "uuid": None if i % 5 == 4 else f"uuid-{i:04d}==",
        "host_id": f"host-{i % 7}",
        "topic": f"Meeting {i}: a/b|c" if i % 3 == 0 else f"Meeting {i}",
        "type": 2,
        "start_time": f"2024-02-{(i % 28) + 1:02d}T10:00:00Z",
        "host_email": f"host{i % 7}@example.com",
        "duration": 30 + i % 60,
        "recording_files": [
            {
                "id": f"rec-{i}-{j}",
                "recording_start": f"2024-02-{(i % 28) + 1:02d}T10:00:00Z",
                "recording_end": f"2024-02-{(i % 28) + 1:02d}T10:30:00Z",
                "recording_type": _REC_TYPES[(i + j) % len(_REC_TYPES)],
                "file_type": "M4A" if j == 0 else "MP4",
                "file_size": 1000 * (i + 1) + j,
                "download_url": None if (i + j) % 11 == 10
                                else f"https://example.invalid/dl/{i}/{j}",
            }
            for j in range((i % 3) + 1)
        ],
    }
    return json.dumps({"event": "recording.completed",
                       "event_ts": 1700000000000 + i * 1000,
                       "payload": {"account_id": "acct-1", "object": obj}})


class WebhookStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.total = int(options.get("nevents", 50))
        self.per_batch = int(options.get("perbatch", 10))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.per_batch, self.total)
        rows = [(i, synth_event(i)) for i in range(lo, hi)]
        return iter(rows), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery — same determinism as the original read
        return iter((i, synth_event(i)) for i in range(start["next"], end["next"]))


class WebhookStreamDataSource(DataSource):
    """spark.readStream.format("webhook_sim").option("nevents", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "webhook_sim"

    def schema(self) -> StructType:
        return RAW_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> WebhookStreamReader:
        return WebhookStreamReader(self.options)


def register(spark) -> None:
    try:
        spark.dataSource.register(WebhookStreamDataSource)
    except Exception:
        pass
