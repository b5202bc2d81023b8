"""Regression tests for the round-9 ADVICE findings fixed in round 10.

1. parse_mjpeg_avi_stats / _jpeg_channel_means quarantine a scan that
   references an UNDEFINED Huffman/quant table id (KeyError previously
   escaped the Python worker and failed the whole Spark task).
2. parse_mjpeg_avi_stats skips frames whose SOF declares width=0 or
   height=0 instead of raising ZeroDivisionError.
3. Non-divisor sampling factors (e.g. h=2 with hmax=3) raise ValueError
   at scan setup instead of silently producing undersized planes.
4. The BPE recursive-CTE oracle survives corpus words containing a
   literal '|' (the old delimiter) — parity with bpe_segment.
"""

from __future__ import annotations

import struct

import duckdb
import numpy as np
import pytest

from vacancy_gpt_etl_pipeline_spark.operators import jpeg
from vacancy_gpt_etl_pipeline_spark.operators.multimodal import (
    _jpeg_channel_means,
)
from vacancy_gpt_etl_pipeline_spark.operators.tokenize import (
    DEFAULT_BPE_MERGES,
    bpe_merge_sql,
    bpe_segment,
)


def _plane(w: int, h: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def _find_marker(b: bytes, marker: bytes) -> int:
    """Offset of a segment marker. Safe pre-scan: entropy data is
    byte-stuffed (FF -> FF 00) so FFCx/FFDA can't appear inside it,
    and all header segments precede the scan anyway."""
    i = b.find(marker)
    assert i >= 0, f"marker {marker!r} not found"
    return i


def _patch_sos_table_id(b: bytes) -> bytes:
    """Point the first scan component at undefined Huffman tables
    (Td=2, Ta=2) — a malformed-but-parseable-header payload."""
    sos = _find_marker(b, b"\xff\xda")
    # FFDA(2) len(2) ns(1) [Cs(1) TdTa(1)]... -> TdTa of comp 0 at +6
    out = bytearray(b)
    out[sos + 6] = 0x22
    return bytes(out)


def _patch_sof_height_zero(b: bytes) -> bytes:
    sof = _find_marker(b, b"\xff\xc0")
    # FFC0 len(2) prec(1) height(2) width(2) ...
    out = bytearray(b)
    out[sof + 5 : sof + 7] = struct.pack(">H", 0)
    return bytes(out)


def _patch_sof_nondivisor_sampling(b: bytes) -> bytes:
    """Set component sampling to h=3 and h=2 (3 % 2 != 0)."""
    sof = _find_marker(b, b"\xff\xc0")
    ncomp_off = sof + 9
    out = bytearray(b)
    assert out[ncomp_off] == 3, "fixture must be 3-component"
    # per-comp: id(1) HV(1) Tq(1); HV byte of comp 0 and comp 1
    out[ncomp_off + 2] = 0x31  # h=3, v=1
    out[ncomp_off + 5] = 0x21  # h=2, v=1
    return bytes(out)


def _rgbish_jpeg(w: int = 16, h: int = 16) -> bytes:
    return jpeg.encode_baseline_jpeg(
        [_plane(w, h, s) for s in range(3)], w, h
    )


def test_undefined_table_id_is_quarantined_not_keyerror():
    bad = _patch_sos_table_id(_rgbish_jpeg())
    with pytest.raises(KeyError):
        jpeg.decode_baseline_jpeg(bad)  # the decoder itself still raises
    # ...but both Spark-facing wrappers quarantine it
    assert _jpeg_channel_means(bad) == (None, None, None)
    good = _rgbish_jpeg(8, 8)
    avi = jpeg.build_mjpeg_avi([bad, good], 16, 16)
    rows = list(jpeg.parse_mjpeg_avi_stats(avi))
    # the malformed frame is skipped; the good frame still decodes
    assert len(rows) == 1
    assert rows[0][1:3] == (8, 8)


def test_zero_height_frame_skipped_not_zerodivision():
    zero = _patch_sof_height_zero(_rgbish_jpeg())
    good = _rgbish_jpeg(8, 8)
    avi = jpeg.build_mjpeg_avi([zero, good], 16, 16)
    rows = list(jpeg.parse_mjpeg_avi_stats(avi))
    assert len(rows) == 1
    assert rows[0][1:3] == (8, 8)


def test_nondivisor_sampling_raises_value_error():
    bad = _patch_sof_nondivisor_sampling(_rgbish_jpeg())
    with pytest.raises(ValueError, match="non-divisor sampling"):
        jpeg.decode_baseline_jpeg(bad)
    # ValueError is already in every wrapper's quarantine tuple
    assert _jpeg_channel_means(bad) == (None, None, None)


def test_divisor_sampling_still_decodes():
    """4:2:0 (the common divisor case) must be unaffected by the new
    validation."""
    w, h = 16, 16
    y = _plane(w, h, 1)
    cb = _plane(w // 2, h // 2, 2)
    cr = _plane(w // 2, h // 2, 3)
    b = jpeg.encode_baseline_jpeg(
        [y, cb, cr], w, h, sampling=[(2, 2), (1, 1), (1, 1)]
    )
    dw, dh, planes = jpeg.decode_baseline_jpeg(b)
    assert (dw, dh) == (w, h)
    assert planes[0].shape == (h, w)


def test_bpe_oracle_handles_literal_pipe_words():
    """r9 ADVICE: the old '|'-delimited CTE diverged for words containing
    a literal pipe. The U+001F delimiter restores parity."""
    words = ["a|b", "|", "ta|ble", "t|a", "||table||", "table", "scan"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE vocab AS SELECT * FROM (VALUES "
        + ",".join(f"('{w}')" for w in words)
        + ") t(word)"
    )
    sql = (
        "WITH RECURSIVE "
        + bpe_merge_sql()
        + " SELECT word, word_tokens FROM tok"
    )
    got = dict(con.execute(sql).fetchall())
    for w in words:
        assert got[w] == len(bpe_segment(w, DEFAULT_BPE_MERGES)), w


def test_bpe_merge_sql_rejects_separator_in_symbols():
    with pytest.raises(AssertionError):
        bpe_merge_sql(merges=(("a", "\x1fb"),))
