"""Real stdlib WAV decode (round-7: multimodal_framesample off the
rows-only ledger): the synthesized blob must be a genuine RIFF/WAVE
container, the fake=False path must decode it for real, and the decoded
frames must equal both a hand computation and the byte-window fake over
the same payload."""

from __future__ import annotations

import io
import wave

import pytest

from zoom_etl_spark.sources.multimodal import (attach_fake_media,
                                               sample_frames,
                                               synthesize_wav)

TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog, twice over"),
    (2, "short"),                      # < 32 chars: one partial frame
    (3, "x" * 300),                    # > 8*32: frame cap binds
]


def _wav_df(spark):
    return synthesize_wav(
        spark.createDataFrame(TEXTS, "doc_id long, text string"),
        "doc_id", "text")


def test_synthesize_wav_is_a_real_riff_container(spark):
    blobs = {r.doc_id: bytes(r.media) for r in _wav_df(spark).collect()}
    for doc_id, text in TEXTS:
        b = blobs[doc_id]
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
        with wave.open(io.BytesIO(b)) as w:
            assert (w.getnchannels(), w.getsampwidth(),
                    w.getframerate()) == (1, 1, 8000)
            assert w.readframes(w.getnframes()) == text.encode("utf-8")


def test_real_decode_frames_match_hand_computation(spark):
    got = {(r.doc_id, r.frame_no): r.frame_checksum
           for r in sample_frames(_wav_df(spark), every_n_bytes=32,
                                  max_frames=8, fake=False).collect()}
    want = {}
    for doc_id, text in TEXTS:
        bb = text.encode("utf-8")
        for i in range(min(8, max(1, len(bb) // 32))):
            want[(doc_id, i)] = sum(bb[i * 32:(i + 1) * 32]) % (1 << 31)
    assert got == want
    # the cap and the partial-frame edge both appear in the fixture
    assert max(i for d, i in got if d == 3) == 7
    assert got[(2, 0)] == sum(b"short")


def test_real_decode_equals_fake_over_same_payload(spark):
    """attach_fake_media's blob IS the text bytes, so the byte-window
    fake over it must equal the real wave-parse over the synthesized
    container — the decode recovers exactly the payload."""
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    real = sorted(map(tuple, sample_frames(
        _wav_df(spark), fake=False).collect()))
    fake = sorted(map(tuple, sample_frames(
        attach_fake_media(df, "doc_id", "text"), fake=True).collect()))
    assert real == fake and len(real) > 0


def test_non_riff_blob_raises_not_implemented(spark):
    df = attach_fake_media(
        spark.createDataFrame(TEXTS, "doc_id long, text string"),
        "doc_id", "text")
    with pytest.raises(Exception) as ei:
        sample_frames(df, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)
