"""FLAC codec (operators/flac.py): lossless round-trip, an INDEPENDENT
spec-based bit assembler cross-checking both encoder bytes and decoder
semantics, corruption quarantine, and the Spark decode_audio routing.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from vacancy_gpt_etl_pipeline_spark.operators import flac


# --- independent spec implementation (test-side) ---------------------------


def _crc8_table(data: bytes) -> int:
    """Table-driven CRC-8/0x07 — independent of the codec's bitwise loop."""
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07 if c & 0x80 else c << 1) & 0xFF
        table.append(c)
    crc = 0
    for byte in data:
        crc = table[crc ^ byte]
    return crc


def _crc16_table(data: bytes) -> int:
    table = []
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005 if c & 0x8000 else c << 1) & 0xFFFF
        table.append(c)
    crc = 0
    for byte in data:
        crc = (table[(crc >> 8) ^ byte] ^ (crc << 8)) & 0xFFFF
    return crc


class _Bits:
    """Minimal MSB-first assembler for hand-building spec streams."""

    def __init__(self):
        self.s = ""

    def put(self, v, n):
        self.s += format(v & ((1 << n) - 1), f"0{n}b")
        return self

    def unary(self, q):
        self.s += "0" * q + "1"
        return self

    def bytes(self):
        s = self.s + "0" * (-len(self.s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _streaminfo(block_size, rate, n, samples):
    body = struct.pack(">HH", block_size, block_size) + b"\x00" * 6
    body += struct.pack(">Q", (rate << 44) | (15 << 36) | n)
    body += hashlib.md5(np.asarray(samples, "<i2").tobytes()).digest()
    return flac.FLAC_MAGIC + bytes([0x80, 0, 0, 34]) + body


def _frame_header(fno, blocksize):
    bb = _Bits()
    bb.put(0x3FFE, 14).put(0, 1).put(0, 1)
    bb.put(0b0111, 4).put(0, 4).put(0, 4).put(0b100, 3).put(0, 1)
    hdr = bb.bytes() + bytes([fno]) + struct.pack(">H", blocksize - 1)
    return hdr + bytes([_crc8_table(hdr)])


# --- round trip ------------------------------------------------------------


def test_roundtrip_exact():
    rng = np.random.default_rng(5)
    cases = [
        (np.sin(np.arange(1000) * 0.05) * 12000).astype(np.int16),
        rng.integers(-32768, 32768, 777).astype(np.int16),
        np.full(512, 123, dtype=np.int16),
        np.arange(-300, 300, dtype=np.int16),
        np.array([5], dtype=np.int16),
        np.repeat(rng.integers(-100, 100, 10), 37).astype(np.int16),
        np.array([-32768, 32767, 0, -1, 1] * 60, dtype=np.int16),
    ]
    for s in cases:
        for bs in (256, 192, 64):
            b = flac.encode_flac(s, 8000, block_size=bs)
            sr, ch, bps, out = flac.decode_flac(b)
            assert (sr, ch, bps) == (8000, 1, 16)
            assert np.array_equal(out, s.astype(np.int64))


def test_tonal_signal_actually_compresses():
    s = (np.sin(np.arange(4000) * 0.03) * 9000).astype(np.int16)
    b = flac.encode_flac(s, 16000)
    assert len(b) < 0.6 * 2 * s.size  # fixed predictors must earn keep


# --- independent spec assembly ---------------------------------------------


def test_constant_frame_bytes_match_independent_assembly():
    """Hand-assemble the spec bit layout for a flat block and require
    the encoder's bytes to match EXACTLY — CRCs from the table-driven
    implementations, layout from RFC 9639, no shared code."""
    samples = np.full(8, 77, dtype=np.int16)
    body = _Bits().put(0, 1).put(0, 6).put(0, 1).put(77, 16).bytes()
    want_frame = _frame_header(0, 8) + body
    want_frame += struct.pack(">H", _crc16_table(want_frame))
    got = flac.encode_flac(samples, 8000, block_size=8)
    want = _streaminfo(8, 8000, 8, samples) + want_frame
    assert got == want


def test_fixed_order1_stream_decodes_per_spec():
    """Hand-build a FIXED order-1 subframe with Rice(param=2)
    residuals and require decode_flac to reconstruct the samples the
    spec's predictor defines — decoder vs the spec, not vs our encoder."""
    # samples: 10, 13, 11, 16  -> warmup 10, residuals +3, -2, +5
    samples = [10, 13, 11, 16]
    bb = _Bits()
    bb.put(0, 1).put(0b001001, 6).put(0, 1)  # FIXED order 1
    bb.put(10, 16)  # warmup
    bb.put(0b00, 2).put(0, 4).put(2, 4)  # rice4, porder 0, param 2
    for r in (3, -2, 5):
        u = (r << 1) if r >= 0 else ((-r << 1) - 1)
        bb.unary(u >> 2).put(u, 2)
    body = bb.bytes()
    frame = _frame_header(0, 4) + body
    frame += struct.pack(">H", _crc16_table(frame))
    stream = _streaminfo(4, 8000, 4, samples) + frame
    sr, ch, bps, out = flac.decode_flac(stream)
    assert list(out) == samples


def test_two_partition_residual_decodes():
    """The decoder supports partition orders the encoder never emits:
    a hand-built porder=1 residual (two partitions, different params)."""
    # order 0 (residual == samples), blocksize 4, partitions of 2
    samples = [3, -1, 40, -25]
    bb = _Bits()
    bb.put(0, 1).put(0b001000, 6).put(0, 1)  # FIXED order 0
    bb.put(0b00, 2).put(1, 4)  # rice4, porder 1
    for part, param in (((3, -1), 1), ((40, -25), 5)):
        bb.put(param, 4)
        for r in part:
            u = (r << 1) if r >= 0 else ((-r << 1) - 1)
            bb.unary(u >> param).put(u, param)
    body = bb.bytes()
    frame = _frame_header(0, 4) + body
    frame += struct.pack(">H", _crc16_table(frame))
    stream = _streaminfo(4, 8000, 4, samples) + frame
    assert list(flac.decode_flac(stream)[3]) == samples


def test_escape_partition_decodes():
    """Rice escape (param 0b1111 -> raw n-bit residuals)."""
    samples = [100, -100]
    bb = _Bits()
    bb.put(0, 1).put(0b001000, 6).put(0, 1)
    bb.put(0b00, 2).put(0, 4)
    bb.put(0b1111, 4).put(8, 5)  # escape, 8 raw bits
    for r in samples:
        bb.put(r, 8)
    body = bb.bytes()
    frame = _frame_header(0, 2) + body
    frame += struct.pack(">H", _crc16_table(frame))
    stream = _streaminfo(2, 8000, 2, samples) + frame
    assert list(flac.decode_flac(stream)[3]) == samples


# --- quarantine ------------------------------------------------------------


def test_corruption_quarantined():
    s = (np.sin(np.arange(500) * 0.05) * 10000).astype(np.int16)
    b = flac.encode_flac(s, 8000)
    for where in (30, 60, 120, len(b) - 3):
        bad = bytearray(b)
        bad[where] ^= 0x40
        with pytest.raises(ValueError):
            flac.decode_flac(bytes(bad))
    with pytest.raises((ValueError, struct.error)):
        flac.decode_flac(b[:50])
    with pytest.raises(ValueError):
        flac.decode_flac(b"not flac at all")


def test_lpc_subframe_decodes_per_spec():
    """Hand-built order-2 LPC subframe (quantized coefficients,
    arithmetic sum-shift): the TEST derives the residuals from the
    published prediction formula, builds the bit stream with the
    independent assembler, and requires decode_flac to reconstruct the
    target samples."""
    samples = [100, 110, 118, 123, 125, 124]
    order, prec, shift = 2, 7, 5
    coefs = [60, -28]  # ~[1.875, -0.875] at shift 5
    res = []
    for i in range(order, len(samples)):
        acc = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        res.append(samples[i] - (acc >> shift))
    bb = _Bits()
    bb.put(0, 1).put(0b100000 | (order - 1), 6).put(0, 1)
    for v in samples[:order]:
        bb.put(v, 16)
    bb.put(prec - 1, 4).put(shift, 5)
    for c in coefs:
        bb.put(c, prec)
    param = 4
    bb.put(0b00, 2).put(0, 4).put(param, 4)
    for r in res:
        u = (r << 1) if r >= 0 else ((-r << 1) - 1)
        bb.unary(u >> param).put(u, param)
    body = bb.bytes()
    frame = _frame_header(0, len(samples)) + body
    frame += struct.pack(">H", _crc16_table(frame))
    stream = _streaminfo(len(samples), 8000, len(samples), samples) + frame
    assert list(flac.decode_flac(stream)[3]) == samples


def test_lpc_invalid_precision_and_negative_shift_rejected():
    def build(prec_bits, shift_bits):
        bb = _Bits()
        bb.put(0, 1).put(0b100000, 6).put(0, 1)  # LPC order 1
        bb.put(7, 16)  # warmup
        bb.put(prec_bits, 4).put(shift_bits, 5)
        bb.put(1, 4 if prec_bits == 0b1111 else prec_bits + 1)
        bb.put(0b00, 2).put(0, 4).put(0, 4)
        bb.unary(0)  # one zero residual
        body = bb.bytes()
        frame = _frame_header(0, 2) + body
        frame += struct.pack(">H", _crc16_table(frame))
        return _streaminfo(2, 8000, 2, [7, 7]) + frame

    with pytest.raises(ValueError, match="precision"):
        flac.decode_flac(build(0b1111, 0))
    with pytest.raises(ValueError, match="negative LPC shift"):
        flac.decode_flac(build(6, 0b11111))  # -1 as signed 5-bit


# --- Spark routing ---------------------------------------------------------


def test_decode_audio_routes_flac_wav_and_garbage(spark):
    from vacancy_gpt_etl_pipeline_spark.operators.multimodal import (
        decode_audio,
        synthesize_flac_payload,
        synthesize_pcm_payload,
    )

    ids = spark.range(6).withColumnRenamed("id", "doc_id")
    flac_assets = synthesize_flac_payload(ids, "doc_id")
    wav_assets = synthesize_pcm_payload(ids, "doc_id")
    out_f = {r.asset_id: r for r in decode_audio(flac_assets).collect()}
    out_w = {r.asset_id: r for r in decode_audio(wav_assets).collect()}
    for i in range(6):
        f, w = out_f[i], out_w[i]
        assert f.fmt == "flac" and w.fmt == "wav"
        # same closed-form samples, different n: cross-check the shared
        # amplitude formula on the overlapping prefix is not needed —
        # peak/mean must match the generator independently
        n = i % 300 + 40
        u = (i * 13 + np.arange(n) * 7) % 65536
        av = np.where(u >= 32768, 65536 - u, u)
        assert f.n_samples == n
        assert f.peak_abs == int(av.max())
        assert f.mean_abs == pytest.approx(int(av.sum()) / n)
    # corrupt payload -> null-stats flac row, not a task failure
    import pyspark.sql.functions as F

    corrupted = flac_assets.select(
        "asset_id",
        F.concat(
            F.substring("content", 1, 40),
            F.lit(b"\xff\x00\xde\xad"),
        ).alias("content"),
    )
    rows = decode_audio(corrupted).collect()
    assert all(r.n_samples is None for r in rows)


def test_stereo_independent_channels_decode():
    """2-channel INDEPENDENT decode (in scope; the encoder never emits
    it, so the stream is hand-built): two CONSTANT subframes -> the
    output interleaves L,R per the MD5/sample contract."""
    n, l_val, r_val = 4, 11, -7
    samples = np.array([l_val, r_val] * n, dtype=np.int16)  # interleaved
    body = struct.pack(">HH", 8, 8) + b"\x00" * 6
    body += struct.pack(">Q", (8000 << 44) | (1 << 41) | (15 << 36) | n)
    body += hashlib.md5(samples.astype("<i2").tobytes()).digest()
    stream = flac.FLAC_MAGIC + bytes([0x80, 0, 0, 34]) + body
    bb = _Bits()
    bb.put(0x3FFE, 14).put(0, 1).put(0, 1)
    bb.put(0b0111, 4).put(0, 4).put(0b0001, 4).put(0b100, 3).put(0, 1)
    hdr = bb.bytes() + bytes([0]) + struct.pack(">H", n - 1)
    hdr += bytes([_crc8_table(hdr)])
    fb = _Bits()
    for v in (l_val, r_val):
        fb.put(0, 1).put(0, 6).put(0, 1).put(v, 16)
    frame = hdr + fb.bytes()
    frame += struct.pack(">H", _crc16_table(frame))
    sr, ch, bps, out = flac.decode_flac(stream + frame)
    assert (sr, ch, bps) == (8000, 2, 16)
    assert np.array_equal(out, samples.astype(np.int64))


def test_stereo_decorrelation_is_documented_boundary():
    bb = _Bits()
    bb.put(0x3FFE, 14).put(0, 1).put(0, 1)
    bb.put(0b0111, 4).put(0, 4).put(0b1000, 4).put(0b100, 3).put(0, 1)
    hdr = bb.bytes() + bytes([0]) + struct.pack(">H", 1)
    hdr += bytes([_crc8_table(hdr)])
    body = struct.pack(">HH", 8, 8) + b"\x00" * 6
    body += struct.pack(">Q", (8000 << 44) | (1 << 41) | (15 << 36) | 2)
    body += b"\x00" * 16
    stream = flac.FLAC_MAGIC + bytes([0x80, 0, 0, 34]) + body
    with pytest.raises(ValueError, match="decorrelation"):
        flac.decode_flac(stream + hdr)


def test_utf8_coded_frame_number_boundaries():
    """The extended-UTF-8 frame-number coding round-trips at every
    byte-length boundary up to the 36-bit spec maximum (fixtures only
    exercise small frame numbers)."""
    from vacancy_gpt_etl_pipeline_spark.operators.flac import (
        _BitReader,
        _read_utf8_coded,
        _utf8_coded,
    )

    for n in (0, 127, 128, 2047, 2048, 65535, 65536,
              (1 << 31), (1 << 36) - 1):
        b = _utf8_coded(n)
        assert _read_utf8_coded(_BitReader(b, 0)) == n, n
    with pytest.raises(ValueError):
        _utf8_coded(1 << 36)
    # a bare continuation byte is not a valid start
    with pytest.raises(ValueError):
        _read_utf8_coded(_BitReader(b"\x80\x80", 0))
