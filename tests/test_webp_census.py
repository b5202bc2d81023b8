"""WebP container census conformance (operators/webp.py): golden
hand-written containers for each variant, the even-pad chunk hop,
unknown-chunk skipping, VP8X canvas precedence, and every quarantine
class (truncation, size overrun, missing signatures)."""

from __future__ import annotations

from vacancy_gpt_etl_pipeline_spark.operators.webp import _parse_webp


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    return (
        fourcc
        + len(payload).to_bytes(4, "little")
        + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )


def _container(*chunks: bytes) -> bytes:
    body = b"".join(chunks)
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body


def _vp8(w: int, h: int, fill: int = 0) -> bytes:
    return _chunk(
        b"VP8 ",
        b"\x10\x00\x00"
        + b"\x9d\x01\x2a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + b"A" * fill,
    )


def _vp8l(w: int, h: int, alpha: bool) -> bytes:
    pack = (w - 1) | ((h - 1) << 14) | (int(alpha) << 28)
    return _chunk(b"VP8L", b"\x2f" + pack.to_bytes(4, "little"))


def _vp8x(w: int, h: int, alpha: bool) -> bytes:
    return _chunk(
        b"VP8X",
        (b"\x10" if alpha else b"\x00")
        + b"\x00\x00\x00"
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little"),
    )


def test_lossy_golden():
    assert _parse_webp(_container(_vp8(320, 240))) == (
        "lossy",
        320,
        240,
        False,
        1,
    )


def test_lossy_scale_bits_masked():
    """The upper 2 bits of the VP8 dim fields are SCALE, not size —
    a 2x-upscaled 100x80 frame still reports 100x80."""
    payload = (
        b"\x10\x00\x00"
        + b"\x9d\x01\x2a"
        + (100 | (1 << 14)).to_bytes(2, "little")
        + (80 | (2 << 14)).to_bytes(2, "little")
    )
    got = _parse_webp(_container(_chunk(b"VP8 ", payload)))
    assert got == ("lossy", 100, 80, False, 1)


def test_lossless_golden_alpha_bit():
    assert _parse_webp(_container(_vp8l(16383, 1, True))) == (
        "lossless",
        16383,
        1,
        True,
        1,
    )
    assert _parse_webp(_container(_vp8l(7, 9, False))) == (
        "lossless",
        7,
        9,
        False,
        1,
    )


def test_extended_canvas_overrides_stream_dims():
    """VP8X canvas is what renderers display — it wins over the
    embedded VP8 stream dims, regardless of chunk inspection order."""
    got = _parse_webp(_container(_vp8x(1000, 900, True), _vp8(998, 898)))
    assert got == ("extended", 1000, 900, True, 2)


def test_unknown_chunks_skipped_and_counted():
    """EXIF/ICCP/odd-sized unknown chunks must be hopped over via the
    even-pad rule — a mis-hop desynchronizes the walk."""
    exif = _chunk(b"EXIF", b"\x01\x02\x03")  # odd payload → padded
    iccp = _chunk(b"ICCP", b"\x00" * 4)
    got = _parse_webp(_container(iccp, exif, _vp8(64, 48, fill=3)))
    assert got == ("lossy", 64, 48, False, 3)


def test_quarantine_classes():
    good = _container(_vp8(64, 48))
    assert _parse_webp(good) is not None
    # truncation → RIFF size overruns buffer
    assert _parse_webp(good[:-6]) is None
    # not RIFF / not WEBP
    assert _parse_webp(b"JUNK" + good[4:]) is None
    assert _parse_webp(good[:8] + b"WAVE" + good[12:]) is None
    # missing VP8 start code
    bad = bytearray(good)
    bad[12 + 8 + 3] = 0x00
    assert _parse_webp(bytes(bad)) is None
    # missing VP8L signature
    l = bytearray(_container(_vp8l(7, 9, False)))
    l[12 + 8] = 0x00
    assert _parse_webp(bytes(l)) is None
    # chunk size overruns container
    oversize = bytearray(good)
    oversize[12 + 4] = 0xFF
    assert _parse_webp(bytes(oversize)) is None
    # empty / tiny
    assert _parse_webp(b"") is None
    assert _parse_webp(b"RIFF\x00\x00\x00\x00WEB") is None
    # chunk overruns the CONTAINER but not the buffer (trailing garbage
    # after the RIFF payload): must quarantine, not read dimensions
    # from bytes outside the container (advice r13)
    trailing = bytes(oversize) + b"\x9d\x01\x2aZZ" * 64
    assert _parse_webp(trailing) is None
    # a well-formed container followed by trailing garbage is still
    # valid — the bound is the container end, not the buffer end
    assert _parse_webp(good + b"GARBAGE") == _parse_webp(good)


def test_spark_census_and_quarantine(spark, sf_dir):
    """End-to-end over the synthesized fixture: closed forms hold and
    every 23rd id quarantines."""
    from vacancy_gpt_etl_pipeline_spark.operators.webp import (
        census_webp,
        synthesize_webp_payload,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    rows = census_webp(synthesize_webp_payload(docs)).collect()
    assert rows
    for r in rows:
        i = r.asset_id
        if i % 23 == 0:
            assert r.fmt == "webp?" and r.variant is None
            continue
        assert r.fmt == "webp"
        assert (r.width, r.height) == (16 + i % 97, 16 + i % 61)
        v = i % 3
        assert r.variant == ("lossy", "lossless", "extended")[v]
        assert r.has_alpha == (False if v == 0 else i % 2 == 1)
