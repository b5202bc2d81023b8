"""MP3 / ID3v2 census conformance (operators/mp3.py).

Golden byte literals are hand-written straight from the public specs
(ID3v2.2/2.3/2.4 informal standards; ISO/IEC 11172-3 / 13818-3 frame
headers), NOT produced by the synthesizer — they catch symmetric
encode/parse bugs the DuckDB oracle round trip cannot see: syncsafe vs
plain big-endian frame sizes, the per-layer slot-length formulas, the
MPEG-2 half-frame, and the quarantine paths (free format, truncated
tails, ID3v1 trailers).
"""

from __future__ import annotations

from vacancy_gpt_etl_pipeline_spark.operators.mp3 import (
    _frame_info,
    _parse_id3v2,
    census_mp3,
    synthesize_mp3_payload,
)


def _frame(
    *,
    version_bits: int = 3,
    layer: int = 3,
    br_idx: int,
    sr_idx: int = 0,
    pad: int = 0,
    mode_bits: int = 0,
    fill: bytes = b"\x41",
) -> bytes:
    """Assemble one frame by hand from raw header fields + fill bytes."""
    b1 = 0xE0 | (version_bits << 3) | ((4 - layer) << 1) | 1
    b2 = (br_idx << 4) | (sr_idx << 2) | (pad << 1)
    b3 = mode_bits << 6
    hdr = bytes([0xFF, b1, b2, b3])
    info = _frame_info(hdr + b"\x00" * 8192, 0)
    assert info is not None
    flen = info[0]
    return hdr + (fill * (flen - 4))[: flen - 4]


# --- frame-header table conformance --------------------------------------


def test_mpeg1_layer3_slot_formula():
    # 128 kbps @ 44100, no padding: 144000*128/44100 = 417 bytes
    f = _frame(br_idx=9, sr_idx=0)
    flen, vg, layer, kbps, sr, mode, spf = _frame_info(f, 0)
    assert (flen, vg, layer, kbps, sr, mode, spf) == (
        417, "1", 3, 128, 44100, "stereo", 1152,
    )
    # padding adds exactly one byte
    assert _frame_info(_frame(br_idx=9, sr_idx=0, pad=1), 0)[0] == 418


def test_mpeg1_layer1_slot_formula():
    # Layer I: (12*br/sr + pad) * 4 — 256 kbps idx 8 @ 44100 → 278*4? no:
    # 12*256000//44100 = 69 slots, +pad 0 → 69*4 = 276 bytes, 384 samples
    f = _frame(layer=1, br_idx=8, sr_idx=0)
    flen, vg, layer, kbps, sr, mode, spf = _frame_info(f, 0)
    assert (flen, layer, kbps, spf) == (276, 1, 256, 384)


def test_mpeg2_layer3_half_frame():
    # MPEG-2 (version bits 2) L3: 72*br/sr, 576 samples — 64 kbps idx 8
    # @ 22050 (sr idx 0): 72*64000//22050 = 208
    f = _frame(version_bits=2, br_idx=8, sr_idx=0)
    flen, vg, layer, kbps, sr, mode, spf = _frame_info(f, 0)
    assert (flen, vg, kbps, sr, spf) == (208, "2", 64, 22050, 576)


def test_layer2_bitrate_table():
    # MPEG-1 Layer II idx 9 → 160 kbps (the L3 table would say 160 too at
    # idx 10 — idx 9 in L2 is 160 vs 128 in L3, so this pins the table)
    f = _frame(layer=2, br_idx=9, sr_idx=1)
    flen, vg, layer, kbps, sr, mode, spf = _frame_info(f, 0)
    assert (layer, kbps, sr, spf) == (2, 160, 48000, 1152)


def test_quarantine_paths():
    assert _frame_info(b"\x00\x00\x00\x00", 0) is None  # no sync
    assert _frame_info(_frame(br_idx=9)[:3], 0) is None  # truncated
    # free format (idx 0) and forbidden (15) quarantine
    assert _frame_info(bytes([0xFF, 0xFB, 0x00, 0x00]), 0) is None
    assert _frame_info(bytes([0xFF, 0xFB, 0xF0, 0x00]), 0) is None
    # reserved version bits (01) and layer bits (00)
    assert _frame_info(bytes([0xFF, 0xEB, 0x90, 0x00]), 0) is None
    assert _frame_info(bytes([0xFF, 0xF9, 0x90, 0x00]), 0) is None
    # reserved sample-rate index (3)
    assert _frame_info(bytes([0xFF, 0xFB, 0x9C, 0x00]), 0) is None


# --- ID3v2 golden tags ----------------------------------------------------

# v2.3 tag: 'ID3' v3.0 flags=0, syncsafe size 21 = TIT2 frame (10 hdr +
# 1 encoding + 10 latin-1 chars 'Golden Tag')
GOLDEN_ID3V23 = (
    b"ID3\x03\x00\x00\x00\x00\x00\x15"
    b"TIT2\x00\x00\x00\x0b\x00\x00\x00Golden Tag"
)

# v2.4 tag with a SYNCSAFE frame size and utf-8 encoding byte 3
GOLDEN_ID3V24 = (
    b"ID3\x04\x00\x00\x00\x00\x00\x13"
    b"TIT2\x00\x00\x00\x09\x00\x00\x03caf\xc3\xa9 t4"
)

# v2.2 tag: 3-byte ids, 3-byte BE sizes, 'TT2'
GOLDEN_ID3V22 = (
    b"ID3\x02\x00\x00\x00\x00\x00\x0f"
    b"TT2\x00\x00\x06\x00old22"
)


def test_id3v23_golden():
    total, title = _parse_id3v2(GOLDEN_ID3V23)
    assert (total, title) == (10 + 21, "Golden Tag")


def test_id3v24_syncsafe_frame_and_utf8():
    total, title = _parse_id3v2(GOLDEN_ID3V24)
    assert (total, title) == (10 + 19, "café t4")


def test_id3v22_three_byte_frames():
    total, title = _parse_id3v2(GOLDEN_ID3V22)
    assert (total, title) == (10 + 15, "old22")


def test_id3_absent_and_truncated():
    assert _parse_id3v2(b"") == (0, None)
    assert _parse_id3v2(b"ID3") == (0, None)
    # valid header but body cut off mid-frame: size honoured, no title
    cut = GOLDEN_ID3V23[:14]
    total, title = _parse_id3v2(cut)
    assert total == 31 and title is None


def test_id3_null_terminated_title():
    tag = (
        b"ID3\x03\x00\x00\x00\x00\x00\x12"
        b"TIT2\x00\x00\x00\x08\x00\x00\x00abc\x00xyz"
    )
    assert _parse_id3v2(tag)[1] == "abc"


# --- whole-stream walks ---------------------------------------------------


def test_walk_stops_at_id3v1_trailer():
    """Trailing ID3v1 ('TAG' + 125 bytes) must terminate the walk, not
    crash it — the first trailer byte is not a sync word."""
    stream = GOLDEN_ID3V23 + _frame(br_idx=9) + _frame(br_idx=9) + (
        b"TAG" + b"\x00" * 125
    )
    from vacancy_gpt_etl_pipeline_spark.operators.mp3 import _frame_info as fi

    tag_bytes, title = _parse_id3v2(stream)
    i, n = tag_bytes, 0
    while True:
        info = fi(stream, i)
        if info is None:
            break
        n += 1
        i += info[0]
    assert (title, n) == ("Golden Tag", 2)
    assert stream[i : i + 3] == b"TAG"


def test_vbr_detection_and_census(spark, sf_dir):
    """Spark round trip: synthesizer → census over the sf0.001 docs.
    VBR docs (id % 7 == 0) census is_cbr=False; everything else CBR;
    duration is sample-exact n_frames*1152/rate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = census_mp3(synthesize_mp3_payload(docs, "doc_id")).collect()
    assert len(out) == docs.count()
    for r in out:
        i = r["asset_id"]
        assert r["fmt"] == "mp3"
        assert r["title"] == f"t{i}"
        assert r["n_frames"] == i % 8 + 3
        assert r["is_cbr"] == (i % 7 != 0)
        assert r["channel_mode"] == ("stereo" if i % 2 == 0 else "mono")
        rate = (44100, 48000, 32000)[i % 3]
        assert r["sample_rate"] == rate
        assert abs(r["duration_sec"] - (i % 8 + 3) * 1152 / rate) < 1e-12
        assert r["id3_bytes"] == 22 + len(str(i))


def test_garbage_payload_quarantines(spark):
    df = spark.createDataFrame(
        [(1, b"\x00not an mp3 at all"), (2, None)],
        "asset_id long, content binary",
    )
    rows = {r["asset_id"]: r for r in census_mp3(df).collect()}
    assert rows[1]["fmt"] == "mp3?" and rows[1]["n_frames"] is None
    assert rows[2]["fmt"] == "mp3?" and rows[2]["n_bytes"] == 0


# --- ADTS (AAC) -----------------------------------------------------------

from vacancy_gpt_etl_pipeline_spark.operators.mp3 import (  # noqa: E402
    _adts_frame_info,
    census_adts,
    synthesize_adts_payload,
)


def _adts_header(
    *,
    mpeg2: bool = False,
    crc: bool = False,
    profile: int = 1,
    sf_i: int = 4,
    ch: int = 2,
    flen: int,
    n_blocks: int = 1,
) -> bytes:
    b1 = 0xF0 | (0x08 if mpeg2 else 0) | (0 if crc else 1)
    b2 = (profile << 6) | (sf_i << 2) | ((ch >> 2) & 1)
    b3 = ((ch & 3) << 6) | ((flen >> 11) & 3)
    b4 = (flen >> 3) & 0xFF
    b5 = ((flen & 7) << 5) | 0x1F
    b6 = 0xFC | (n_blocks - 1)
    return bytes([0xFF, b1, b2, b3, b4, b5, b6])


def test_adts_golden_header():
    # 44100 Hz (idx 4), AAC LC, stereo, 768-byte frame: 768 = 0b0_1100000_000
    # → b3 low bits 0, b4 = 0x60, b5 high 3 bits 0
    h = _adts_header(flen=768) + b"\x00" * 761
    flen, mpeg_id, profile, sr, ch, nb = _adts_frame_info(h, 0)
    assert (flen, mpeg_id, profile, sr, ch, nb) == (
        768, "MPEG-4", "AAC LC", 44100, 2, 1,
    )


def test_adts_13bit_length_straddles_all_three_bytes():
    # flen = 0x1FFF (max): bits land in b3(2) + b4(8) + b5(3)
    h = _adts_header(flen=0x1FFF)
    assert _adts_frame_info(h + b"\x00" * 0x2000, 0)[0] == 0x1FFF
    # flen = 7 (header only, protection absent) is the legal minimum
    assert _adts_frame_info(_adts_header(flen=7), 0)[0] == 7
    # CRC present (protection_absent=0) needs ≥ 9 bytes
    assert _adts_frame_info(_adts_header(flen=8, crc=True), 0) is None


def test_adts_mpeg2_id_and_multi_block():
    h = _adts_header(mpeg2=True, profile=0, sf_i=8, ch=1, flen=100, n_blocks=3)
    flen, mpeg_id, profile, sr, ch, nb = _adts_frame_info(h + b"\x00" * 93, 0)
    assert (mpeg_id, profile, sr, ch, nb) == ("MPEG-2", "AAC Main", 16000, 1, 3)


def test_adts_quarantine():
    assert _adts_frame_info(b"\xff\xf1\x00", 0) is None  # truncated
    assert _adts_frame_info(b"\x00" * 7, 0) is None  # no sync
    # layer bits must be 00: 0xFFF5 has layer=10
    assert _adts_frame_info(bytes([0xFF, 0xF5, 0, 0, 0, 0, 0]), 0) is None
    # reserved sampling-frequency index (13)
    assert _adts_frame_info(_adts_header(sf_i=13, flen=100), 0) is None


def test_adts_spark_round_trip(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = census_adts(synthesize_adts_payload(docs, "doc_id")).collect()
    assert len(out) == docs.count()
    for r in out:
        i = r["asset_id"]
        assert r["fmt"] == "aac"
        assert r["mpeg_id"] == "MPEG-4"
        assert r["n_frames"] == i % 6 + 2
        assert r["channels"] == 1 + i % 2
        rate = (48000, 44100, 32000, 24000, 22050)[i % 5]
        assert r["sample_rate"] == rate
        assert abs(r["duration_sec"] - (i % 6 + 2) * 1024 / rate) < 1e-12
        assert r["n_bytes"] == sum(
            107 + (i + 13 * f) % 200 for f in range(i % 6 + 2)
        )


def test_id3v24_footer_flag():
    """v2.4 footer flag (0x10): the 10-byte '3DI' footer follows the
    body and is NOT counted in the syncsafe size — total tag bytes must
    include it so the frame walk starts after it."""
    tag = (
        b"ID3\x04\x00\x10\x00\x00\x00\x13"
        b"TIT2\x00\x00\x00\x09\x00\x00\x03caf\xc3\xa9 t4"
        + b"3DI\x04\x00\x10\x00\x00\x00\x13"
    )
    total, title = _parse_id3v2(tag)
    assert (total, title) == (10 + 19 + 10, "café t4")
    # v2.3 never has a footer even if the bit happens to be set
    total23, _ = _parse_id3v2(GOLDEN_ID3V23)
    assert total23 == 31


def test_id3v23_unsynchronisation_destuffed():
    """Tag-level unsync (flag 0x80): a 0x00 is stuffed after every 0xFF
    in the tag body; sizes and text must be read over the DE-stuffed
    bytes. Title here contains a 0xFF latin-1 byte ('ÿ'), and the frame
    size covers the unstuffed body per spec."""
    body = b"TIT2\x00\x00\x00\x04\x00\x00\x00a\xffb"
    stuffed = body.replace(b"\xff", b"\xff\x00")
    tag = b"ID3\x03\x00\x80" + bytes(
        [(len(stuffed) >> 21) & 127, (len(stuffed) >> 14) & 127,
         (len(stuffed) >> 7) & 127, len(stuffed) & 127]
    ) + stuffed
    total, title = _parse_id3v2(tag)
    assert total == 10 + len(stuffed)
    assert title == "a\xffb"


def test_id3v24_unsynchronisation_is_boundary():
    """v2.4 + tag-level unsync (r12 advice): the flag means PER-FRAME
    unsync and frame sizes count the stored (stuffed) bytes, so a
    global de-stuff desynchronizes the walk. Documented boundary: the
    tag is skipped correctly (header syncsafe size over RAW bytes) and
    no title is surfaced."""
    body = b"TIT2\x00\x00\x00\x04\x00\x02\x00a\xffb"
    stuffed = body.replace(b"\xff", b"\xff\x00")
    tag = b"ID3\x04\x00\x80" + bytes(
        [(len(stuffed) >> 21) & 127, (len(stuffed) >> 14) & 127,
         (len(stuffed) >> 7) & 127, len(stuffed) & 127]
    ) + stuffed
    total, title = _parse_id3v2(tag)
    assert total == 10 + len(stuffed)
    assert title is None
