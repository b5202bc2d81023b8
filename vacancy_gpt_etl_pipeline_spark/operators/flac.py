"""Baseline FLAC codec — pure numpy/stdlib, written against the PUBLIC
format spec (RFC 9639 / xiph.org FLAC format), zero third-party decoder
lineage. The audio twin of :mod:`operators.jpeg`: it exists so the
engine can decode a REAL compressed audio format end-to-end (bit
reader, Rice codes, fixed linear predictors, CRC-8/CRC-16, STREAMINFO
MD5) without any media library in the container.

Decoder scope (the real constraint set, stated loudly):
  * 'fLaC' stream marker; STREAMINFO parsed, all other metadata blocks
    (padding, vorbis comment, seektable, ...) skipped by length;
  * fixed-blocking-strategy frames; 1..2 INDEPENDENT channels (no
    stereo decorrelation — the encoder here emits mono; L/S, R/S, M/S
    channel assignments raise ``ValueError``);
  * subframes: CONSTANT, VERBATIM, FIXED predictor orders 0..4, and
    LPC orders 1..32 (quantized coefficients, arithmetic sum-shift) —
    the full subframe taxonomy decodes; only the ENCODER stays
    fixed-predictor (LPC analysis is a quality knob, not a
    conformance one — any spec-valid stream decodes);
  * residuals: 4-bit (method 0) and 5-bit (method 1) Rice partitions,
    incl. the escape-to-raw-bits case; any partition order;
  * integrity: frame-header CRC-8 (poly 0x07) and whole-frame CRC-16
    (poly 0x8005) VERIFIED, and the decoded stream is checked against
    STREAMINFO's MD5 when present — a corrupted payload quarantines
    (ValueError) instead of yielding silently wrong samples.

The encoder exists to make REAL fixtures and round-trip tests: mono
16-bit, one fixed block size, per-block best-of FIXED order 0..2 with
single-partition Rice residuals (parameter swept 0..14 for the
smallest encoding), correct CRCs and STREAMINFO MD5. Compression is
not the point — bit-exact lossless round-trip through the real bit
syntax is.

Scale shape (same argument as the JPEG family): payloads are opaque
binary cells; decode runs in Arrow ``mapInPandas`` batches over a
widened scan, one payload per row, embarrassingly parallel. Pure-
Python bit-level decode is ~100x off a native codec's throughput —
the accepted price of the dependency-free constraint, restated from
the r9 verdict.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

# Fixed-predictor coefficients, order 0..4 (RFC 9639 §9.2.2): residual
# r[i] = sum coef[j]*s[i-1-j] subtracted from s[i].
_FIXED_COEFS = (
    (),
    (1,),
    (2, -1),
    (3, -3, 1),
    (4, -6, 4, -1),
)


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — frame header CRC."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — frame CRC."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = (
                (crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1
            ) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            self.buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zero bits then a one bit

    def align(self) -> None:
        if self._nbits:
            self.put(0, 8 - self._nbits)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.bitpos = 0

    def bits(self, n: int) -> int:
        out = 0
        for _ in range(n):
            if self.bytepos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            bit = (self.data[self.bytepos] >> (7 - self.bitpos)) & 1
            out = (out << 1) | bit
            self.bitpos += 1
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
        return out

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway unary code")
        return q

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


def _utf8_coded(n: int) -> bytes:
    """FLAC's extended-UTF-8 coding of the frame number (RFC 9639
    §9.1.5) — UTF-8's byte syntax applied to up to 36-bit values."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8),
                         (6, 0xFC), (7, 0xFE)):
        if n < 1 << (6 * (nbytes - 1) + (7 - nbytes) if nbytes < 7 else 36):
            out = [lead | (n >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number out of range")


def _read_utf8_coded(rd: _BitReader) -> int:
    first = rd.bits(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8-coded frame number")
    n = first & (mask - 1)
    for _ in range(nbytes - 1):
        cont = rd.bits(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        n = (n << 6) | (cont & 0x3F)
    return n


# --- Encoder ---------------------------------------------------------------


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r < 0, (-r << 1) - 1, r << 1)


def _rice_encode(bw: _BitWriter, res: np.ndarray, param: int) -> None:
    for u in _zigzag(res.astype(np.int64)):
        bw.put_unary(int(u) >> param)
        bw.put(int(u), param)


def _rice_cost(res: np.ndarray, param: int) -> int:
    u = _zigzag(res.astype(np.int64))
    return int((u >> param).sum()) + len(u) * (param + 1)


def encode_flac(
    samples: np.ndarray, sample_rate: int, block_size: int = 256
) -> bytes:
    """Encode mono int16 samples as a real FLAC stream: STREAMINFO with
    MD5, then fixed-blocking frames; per block the best of FIXED order
    0/1/2 (by swept single-partition Rice cost) or VERBATIM if Rice
    loses, CONSTANT when the block is flat."""
    s = np.asarray(samples, dtype=np.int64)
    if s.size == 0:
        raise ValueError("cannot encode an empty stream")
    if s.min() < -0x8000 or s.max() > 0x7FFF:
        raise ValueError("encoder is 16-bit")
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    streaminfo = bytearray()
    streaminfo += struct.pack(">HH", block_size, block_size)
    streaminfo += b"\x00\x00\x00" * 2  # min/max frame size unknown
    # sample_rate(20) | channels-1(3) | bps-1(5) | total(36) = 64 bits
    packed = (
        (sample_rate << 44) | (0 << 41) | (15 << 36) | (s.size & ((1 << 36) - 1))
    )
    streaminfo += struct.pack(">Q", packed)
    streaminfo += md5
    head = FLAC_MAGIC + bytes([0x80, 0, 0, 34]) + bytes(streaminfo)

    frames = bytearray()
    for fno, start in enumerate(range(0, s.size, block_size)):
        blk = s[start : start + block_size]
        frames += _encode_frame(blk, fno, block_size, sample_rate)
    return head + bytes(frames)


def _encode_frame(
    blk: np.ndarray, fno: int, nominal_bs: int, sample_rate: int
) -> bytes:
    bw = _BitWriter()
    bw.put(0x3FFE, 14)  # sync
    bw.put(0, 1)  # reserved
    bw.put(0, 1)  # fixed blocking strategy
    bw.put(0b0111, 4)  # block size: 16-bit value at end of header
    bw.put(0b0000, 4)  # sample rate: from STREAMINFO
    bw.put(0b0000, 4)  # channel assignment: mono
    bw.put(0b100, 3)  # sample size: 16 bit
    bw.put(0, 1)  # reserved
    for byte in _utf8_coded(fno):
        bw.put(byte, 8)
    bw.put(len(blk) - 1, 16)
    bw.align()
    header = bytes(bw.buf)
    bw.buf[:] = header + bytes([_crc8(header)])
    bw._acc = 0
    bw._nbits = 0

    if np.all(blk == blk[0]):
        bw.put(0, 1)
        bw.put(0b000000, 6)  # CONSTANT
        bw.put(0, 1)
        bw.put(int(blk[0]), 16)
    else:
        best = None  # (cost, order, param, residual)
        for order in (0, 1, 2):
            if blk.size <= order:
                continue
            res = blk.copy()
            for _ in range(order):
                res = np.diff(res)
            res = res[max(0, order - (blk.size - res.size)) :]
            # np.diff applied `order` times == fixed-predictor residual
            for param in range(15):
                cost = _rice_cost(res, param) + order * 16
                if best is None or cost < best[0]:
                    best = (cost, order, param, res)
        assert best is not None
        cost, order, param, res = best
        if cost >= blk.size * 16:
            bw.put(0, 1)
            bw.put(0b000001, 6)  # VERBATIM
            bw.put(0, 1)
            for v in blk:
                bw.put(int(v), 16)
        else:
            bw.put(0, 1)
            bw.put(0b001000 | order, 6)  # FIXED, given order
            bw.put(0, 1)
            for v in blk[:order]:
                bw.put(int(v), 16)  # warmup
            bw.put(0b00, 2)  # residual method: 4-bit Rice
            bw.put(0, 4)  # partition order 0
            bw.put(param, 4)
            _rice_encode(bw, res, param)
    bw.align()
    body = bytes(bw.buf)
    return body + struct.pack(">H", _crc16(body))


# --- Decoder ---------------------------------------------------------------


def parse_streaminfo(b: bytes) -> tuple[int, int, int, int, bytes, int]:
    """(sample_rate, channels, bits_per_sample, total_samples, md5,
    first_frame_offset) from the metadata chain. Raises ValueError on
    anything that is not a FLAC stream with a leading STREAMINFO."""
    if b[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream (missing fLaC)")
    pos = 4
    sr = ch = bps = total = None
    md5 = b""
    while True:
        if pos + 4 > len(b):
            raise ValueError("metadata chain truncated")
        hdr = b[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        length = int.from_bytes(b[pos + 1 : pos + 4], "big")
        body = b[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise ValueError("metadata block truncated")
        if btype == 0:  # STREAMINFO
            if length != 34:
                raise ValueError("bad STREAMINFO length")
            packed = struct.unpack(">Q", body[10:18])[0]
            sr = packed >> 44
            ch = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            md5 = body[18:34]
        pos += 4 + length
        if last:
            break
    if sr is None:
        raise ValueError("no STREAMINFO block")
    return sr, ch, bps, total, md5, pos


_BLOCKSIZE_CODES = {
    0b0001: 192,
    **{c: 576 << (c - 2) for c in range(0b0010, 0b0110)},
    **{c: 256 << (c - 8) for c in range(0b1000, 0b10000)},
}


def decode_flac(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a FLAC stream within the documented scope. Returns
    ``(sample_rate, channels, bits_per_sample, samples)`` where samples
    is int32 of shape (n, channels) flattened to interleaved 1-D.
    Verifies frame CRC-8/CRC-16 and the STREAMINFO MD5 (when nonzero);
    any mismatch or out-of-scope feature raises ValueError."""
    sr, ch, bps, total, md5, pos = parse_streaminfo(b)
    if ch > 2:
        raise ValueError("decoder supports 1..2 channels")
    out: list[np.ndarray] = []
    n_got = 0
    while pos < len(b) and (total == 0 or n_got < total):
        frame, pos = _decode_frame(b, pos, sr, ch, bps)
        out.append(frame)
        n_got += frame.shape[0]
    samples = (
        np.concatenate(out) if out else np.zeros((0, ch), dtype=np.int32)
    )
    if total and samples.shape[0] > total:
        samples = samples[:total]
    if md5 != b"\x00" * 16 and bps == 16:
        got = hashlib.md5(
            samples.astype("<i2").tobytes()
        ).digest()
        if got != md5:
            raise ValueError("STREAMINFO MD5 mismatch (corrupt stream)")
    return sr, ch, bps, samples.reshape(-1)


def _decode_frame(
    b: bytes, pos: int, sr: int, ch: int, bps: int
) -> tuple[np.ndarray, int]:
    rd = _BitReader(b, pos)
    if rd.bits(14) != 0x3FFE:
        raise ValueError("bad frame sync")
    rd.bits(1)  # reserved
    rd.bits(1)  # blocking strategy (fixed/variable both fine: UTF-8 number)
    bs_code = rd.bits(4)
    sr_code = rd.bits(4)
    ch_code = rd.bits(4)
    ss_code = rd.bits(3)
    rd.bits(1)  # reserved
    if ch_code >= 8:
        raise ValueError("stereo decorrelation not supported")
    n_ch = ch_code + 1
    if n_ch != ch:
        raise ValueError("frame/STREAMINFO channel mismatch")
    _read_utf8_coded(rd)
    if bs_code == 0b0110:
        blocksize = rd.bits(8) + 1
    elif bs_code == 0b0111:
        blocksize = rd.bits(16) + 1
    elif bs_code in _BLOCKSIZE_CODES:
        blocksize = _BLOCKSIZE_CODES[bs_code]
    else:
        raise ValueError("reserved block size code")
    if sr_code == 0b1100:
        rd.bits(8)
    elif sr_code in (0b1101, 0b1110):
        rd.bits(16)
    elif sr_code == 0b1111:
        raise ValueError("invalid sample rate code")
    _SS = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
    if ss_code not in _SS:
        raise ValueError("reserved sample size code")
    ss = _SS[ss_code]
    header_end = rd.bytepos + (1 if rd.bitpos else 0)
    rd.align()
    crc8 = rd.bits(8)
    if _crc8(b[pos:header_end]) != crc8:
        raise ValueError("frame header CRC-8 mismatch")

    chans = []
    for _ in range(n_ch):
        chans.append(_decode_subframe(rd, blocksize, ss))
    rd.align()
    frame_end = rd.bytepos
    crc16 = struct.unpack(">H", b[frame_end : frame_end + 2])[0]
    if _crc16(b[pos:frame_end]) != crc16:
        raise ValueError("frame CRC-16 mismatch")
    return np.stack(chans, axis=1).astype(np.int32), frame_end + 2


def _decode_subframe(rd: _BitReader, blocksize: int, ss: int) -> np.ndarray:
    if rd.bits(1) != 0:
        raise ValueError("bad subframe padding bit")
    stype = rd.bits(6)
    wasted = 0
    if rd.bits(1):
        wasted = rd.unary() + 1
        ss -= wasted
    if stype == 0b000000:  # CONSTANT
        out = np.full(blocksize, rd.signed(ss), dtype=np.int64)
    elif stype == 0b000001:  # VERBATIM
        out = np.array([rd.signed(ss) for _ in range(blocksize)], np.int64)
    elif 0b001000 <= stype <= 0b001100:  # FIXED order 0..4
        order = stype - 0b001000
        warm = [rd.signed(ss) for _ in range(order)]
        res = _decode_residual(rd, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out[i] = res[i - order] + pred
    elif stype >= 0b100000:  # LPC, order 1..32
        order = (stype & 0x1F) + 1
        warm = [rd.signed(ss) for _ in range(order)]
        prec = rd.bits(4)
        if prec == 0b1111:
            raise ValueError("invalid LPC coefficient precision")
        prec += 1
        shift = rd.signed(5)
        if shift < 0:
            # RFC 9639 §9.2.3: negative shift is forbidden
            raise ValueError("negative LPC shift")
        coefs = [rd.signed(prec) for _ in range(order)]
        res = _decode_residual(rd, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            # c[0] weights the most recent sample; the SUM is shifted
            # (arithmetic), per spec — not the individual products
            acc = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError("reserved subframe type")
    return out << wasted


def _decode_residual(
    rd: _BitReader, blocksize: int, order: int
) -> np.ndarray:
    method = rd.bits(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = rd.bits(4)
    n_part = 1 << porder
    if blocksize % n_part or blocksize >> porder <= order and n_part > 1:
        raise ValueError("bad partition order")
    res: list[int] = []
    for p in range(n_part):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("bad partition order")
        param = rd.bits(pbits)
        if param == escape:
            raw = rd.bits(5)
            res.extend(
                rd.signed(raw) if raw else 0 for _ in range(n)
            )
        else:
            for _ in range(n):
                q = rd.unary()
                u = (q << param) | rd.bits(param)
                res.append((u >> 1) ^ -(u & 1))
    return np.array(res, dtype=np.int64)
