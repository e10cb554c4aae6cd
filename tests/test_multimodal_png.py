"""Real stdlib PNG codec (round-7: multimodal_features off the
rows-only ledger): the synthesized blob must be a structurally valid
PNG (signature, chunk CRCs, zlib IDAT, filter-0 scanlines), decode_png
must recover exactly the source pixels through a genuine
parse→inflate→defilter chain, and corruption must fail loudly."""

from __future__ import annotations

import struct
import zlib

import pytest

from zoom_etl_spark.sources.multimodal import (attach_fake_media,
                                               decode_png,
                                               synthesize_png)

TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog"),   # 44 -> 2 rows
    (2, "tiny"),                                          # pads one row
    (3, "z" * 64),                                        # exact 2 rows
]


def _png_df(spark):
    return synthesize_png(
        spark.createDataFrame(TEXTS, "doc_id long, text string"),
        "doc_id", "text")


def _chunks(b: bytes):
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    pos, out = 8, []
    while pos < len(b):
        (ln,) = struct.unpack(">I", b[pos:pos + 4])
        tag = b[pos + 4:pos + 8]
        payload = b[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", b[pos + 8 + ln:pos + 12 + ln])
        assert zlib.crc32(tag + payload) & 0xFFFFFFFF == crc, tag
        out.append((tag, payload))
        pos += 12 + ln
    return out

def test_synthesized_png_is_structurally_valid(spark):
    blobs = {r.doc_id: bytes(r.media) for r in _png_df(spark).collect()}
    for doc_id, text in TEXTS:
        ch = _chunks(blobs[doc_id])
        tags = [t for t, _ in ch]
        assert tags[0] == b"IHDR" and tags[-1] == b"IEND"
        w, h, depth, ctype = struct.unpack(">IIBB", ch[0][1][:10])
        assert (w, depth, ctype) == (32, 8, 0)
        assert h == max(1, -(-len(text) // 32))
        raw = zlib.decompress(
            b"".join(p for t, p in ch if t == b"IDAT"))
        assert len(raw) == h * (w + 1)
        pixels = b"".join(raw[r * (w + 1) + 1:(r + 1) * (w + 1)]
                          for r in range(h))
        assert pixels == text.encode().ljust(w * h, b"\x00")


def test_decode_png_recovers_geometry_and_pixels(spark):
    got = {r.doc_id: r.asDict() for r in decode_png(_png_df(spark)).collect()}
    for doc_id, text in TEXTS:
        r = got[doc_id]
        h = max(1, -(-len(text) // 32))
        assert r["kind"] == "image/png;gray8"
        assert (r["width"], r["height"]) == (32, h)
        assert r["checksum"] == sum(text.encode()) % (1 << 31)


def test_decode_png_rejects_corruption_and_non_png(spark):
    df = attach_fake_media(
        spark.createDataFrame(TEXTS, "doc_id long, text string"),
        "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|PNG"):
        decode_png(df).collect()  # text bytes: no PNG signature
    # flip one IDAT payload byte -> the CRC validation must trip
    blob = bytearray(bytes(_png_df(spark).limit(1).collect()[0].media))
    idat = blob.find(b"IDAT")
    blob[idat + 6] ^= 0xFF
    corrupted = spark.createDataFrame(
        [(99, bytes(blob))], "doc_id long, media binary")
    with pytest.raises(Exception, match="CRC"):
        decode_png(corrupted).collect()


def test_decode_png_rejects_truncation_and_missing_ihdr(spark):
    """Round-7 ADVICE: malformed chunk streams must fail as descriptive
    ValueErrors at the validation layer, never as struct.error /
    TypeError deep in the executor."""
    full = bytes(_png_df(spark).limit(1).collect()[0].media)

    def _df(blob):
        return spark.createDataFrame([(99, bytes(blob))],
                                     "doc_id long, media binary")

    # (a) blob cut mid chunk-header -> "truncated PNG"
    with pytest.raises(Exception, match="truncated PNG"):
        decode_png(_df(full[:14])).collect()
    # (b) blob cut mid chunk-payload -> "truncated PNG ... overruns"
    with pytest.raises(Exception, match="truncated PNG"):
        decode_png(_df(full[:-6])).collect()
    # (c) IHDR chunk stripped (sig + everything after IHDR) -> the
    # explicit missing-IHDR validation, not TypeError on width=None
    import struct as _s
    ihdr_ln = _s.unpack(">I", full[8:12])[0]
    no_ihdr = full[:8] + full[8 + 12 + ihdr_ln:]
    with pytest.raises(Exception, match="no IHDR"):
        decode_png(_df(no_ihdr)).collect()


def test_pixel_embedding_exact_strided_projection(spark):
    """pixel_embedding (round-8: the deterministic stdlib 'encoder')
    must equal the pure-Python strided-bucket sums over the REAL
    decoded pixels — text bytes zero-padded to the 32-px raster, so
    padding adds 0 to every bucket and the projection is derivable
    straight from the source chars."""
    from zoom_etl_spark.sources.multimodal import pixel_embedding

    got = {r.doc_id: list(r.embedding)
           for r in pixel_embedding(_png_df(spark), dim=16).collect()}
    for doc_id, text in TEXTS:
        want = [0] * 16
        for i, ch in enumerate(text.encode()):
            want[i % 16] += ch
        assert got[doc_id] == want, doc_id
