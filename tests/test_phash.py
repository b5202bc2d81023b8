"""Perceptual-hash conformance (operators/phash.py).

The reference hash here is an INDEPENDENT textbook implementation —
a direct four-loop DCT-II over the same integer cosine table — so a
vectorization bug in the operator's matmul form (transpose slip, axis
swap) cannot cancel out. Property tests pin the two invariances that
make pHash a *perceptual* hash: uniform brightness shifts never touch
the AC bits, and the band pigeonhole makes the LSH join exhaustive for
Hamming < 4.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.multimodal import (
    synthesize_bmp_payload,
)
from vacancy_gpt_etl_pipeline_spark.operators.phash import (
    PHASH_DCT_LUT,
    _bmp_gray,
    phash64,
    phash_bmp,
    phash_dedup_groups,
    phash_neardup_pairs,
)


def _phash_reference(gray: np.ndarray) -> tuple[int, int, int, int]:
    """Slow direct-sum DCT + median threshold, no numpy linear algebra."""
    h, w = gray.shape
    g8 = [[int(gray[y * h // 8][x * w // 8]) for x in range(8)] for y in range(8)]
    coef = []
    for u in range(8):
        for v in range(8):
            s = 0
            for x in range(8):
                for y in range(8):
                    s += g8[y][x] * PHASH_DCT_LUT[u][x] * PHASH_DCT_LUT[v][y]
            coef.append(s)
    med = sorted(coef[1:])[31]
    bits = [1 if c > med else 0 for c in coef]
    bands = []
    for k in range(4):
        val = 0
        for i in range(16):
            val = (val << 1) | bits[16 * k + i]
        bands.append(val)
    return tuple(bands)  # type: ignore[return-value]


def _rand_gray(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    return rng.integers(0, 256, size=(h, w)).astype(np.int64)


def test_phash64_matches_textbook_reference():
    rng = np.random.default_rng(7)
    for _ in range(25):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 40))
        g = _rand_gray(rng, w, h)
        assert phash64(g) == _phash_reference(g)


def test_brightness_shift_only_moves_dc_bit():
    """Adding a constant to every pixel changes only the DC coefficient
    — at most 1 hash bit (bit 0) may differ."""
    rng = np.random.default_rng(11)
    for _ in range(10):
        g = _rand_gray(rng, 16, 16)
        shifted = np.clip(g + 40, 0, 10**9)  # no wraparound: pure shift
        a, b = phash64(g), phash64(shifted)
        ham = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
        assert ham <= 1
        # and the AC bits (all but the MSB of band 0) are identical
        assert a[0] & 0x7FFF == b[0] & 0x7FFF
        assert a[1:] == b[1:]


def test_single_pixel_change_flips_few_bits():
    rng = np.random.default_rng(13)
    g = _rand_gray(rng, 8, 8)
    g2 = g.copy()
    g2[3, 3] += 50
    a, b = phash64(g), phash64(g2)
    assert a != b or True  # may collide; the real assertion is below
    ham = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
    assert ham < 64  # sanity: nowhere near a full scramble


def test_band_pigeonhole():
    """hamming(a,b) < 4 ⇒ at least one of the 4 bands equal — the
    guarantee the LSH join's exhaustiveness rests on."""
    rng = np.random.default_rng(17)
    for _ in range(200):
        bands_a = [int(rng.integers(0, 65536)) for _ in range(4)]
        bands_b = list(bands_a)
        # flip up to 3 random bits
        for _ in range(int(rng.integers(0, 4))):
            k = int(rng.integers(0, 4))
            bands_b[k] ^= 1 << int(rng.integers(0, 16))
        ham = sum(bin(x ^ y).count("1") for x, y in zip(bands_a, bands_b))
        if ham < 4:
            assert any(x == y for x, y in zip(bands_a, bands_b))


def test_bmp_gray_golden():
    """Hand-written 2x2 24-bpp BMP: bottom-up rows, BGR order, 4-byte
    row padding. Pixels (B,G,R): top-left (1,2,3), top-right (4,5,6),
    bottom-left (7,8,9), bottom-right (10,11,12)."""
    w, h, stride = 2, 2, 8
    header = (
        b"BM"
        + (54 + stride * h).to_bytes(4, "little")
        + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"\x00" * 24
    )
    bottom_row = bytes([7, 8, 9, 10, 11, 12, 0, 0])
    top_row = bytes([1, 2, 3, 4, 5, 6, 0, 0])
    gray = _bmp_gray(header + bottom_row + top_row)
    assert gray.tolist() == [[2, 5], [8, 11]]


def test_bmp_gray_quarantine():
    assert _bmp_gray(b"") is None
    assert _bmp_gray(b"BM" + b"\x00" * 60) is None  # 0-bpp
    assert _bmp_gray(b"PNG nonsense") is None


def test_neardup_guards():
    import pandas as pd

    with pytest.raises(ValueError, match="max_hamming < 4"):
        phash_neardup_pairs(None, max_hamming=4)
    with pytest.raises(ValueError, match="min_hamming"):
        phash_neardup_pairs(None, min_hamming=3, max_hamming=2)


def test_spark_round_trip_and_split(spark, sf_dir):
    """End to end on the sf0.001 docs: every BMP hashes; the dedup
    groups and near pairs partition correctly (groups are hamming-0 by
    construction; near pairs never contain a hamming-0 pair)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hashes = phash_bmp(synthesize_bmp_payload(docs, "doc_id")).cache()
    try:
        hrows = {r["asset_id"]: r for r in hashes.collect()}
        assert len(hrows) == docs.count()
        # spark hashes equal the pure-python reference on the same bytes
        payload = {
            r["asset_id"]: bytes(r["content"])
            for r in synthesize_bmp_payload(docs, "doc_id").limit(20).collect()
        }
        for aid, b in payload.items():
            expect = _phash_reference(_bmp_gray(b))
            got = (hrows[aid]["b0"], hrows[aid]["b1"], hrows[aid]["b2"], hrows[aid]["b3"])
            assert got == expect
        groups = phash_dedup_groups(hashes).collect()
        assert all(g["n_assets"] >= 2 for g in groups)
        assert all(g["drop_count"] == g["n_assets"] - 1 for g in groups)
        # ids 256 apart with equal dims are pixel-identical → same hash
        same = [a for a in hrows if a + 256 in hrows]
        for a in same:
            assert hrows[a]["hash_hex"] == hrows[a + 256]["hash_hex"]
        pairs = phash_neardup_pairs(hashes, 1, 2).collect()
        for p in pairs:
            ha = hrows[p["id_a"]]
            hb = hrows[p["id_b"]]
            ham = sum(
                bin(ha[f"b{k}"] ^ hb[f"b{k}"]).count("1") for k in range(4)
            )
            assert ham == p["hamming"] and 1 <= ham <= 2
    finally:
        hashes.unpersist()


def test_identical_hashes_collapse_to_one_representative(spark):
    """Identical fingerprints contribute ONE row to pair generation —
    the load-bearing scale property — while the dedup-groups path
    still collapses the duplicates."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "asset_id": [1, 2, 3],
            "b0": [5, 5, 5],
            "b1": [9, 9, 9],
            "b2": [2, 2, 2],
            "b3": [7, 7, 7],
            "hash_hex": ["x"] * 3,
        }
    )
    hashes = spark.createDataFrame(pdf)
    assert phash_neardup_pairs(hashes, 0, 2).count() == 0
    assert phash_dedup_groups(hashes).collect()[0]["n_assets"] == 3


def test_bucket_cap_drops_pairs(spark):
    """max_bucket=1 suppresses pair generation from an over-full band
    bucket — the documented degenerate-corpus contract. Three DISTINCT
    hashes share band 0 (hamming 1..2 apart through bands 1-3), so
    uncapped they pair; capped at 1 they don't."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "asset_id": [1, 2, 3],
            "b0": [5, 5, 5],
            "b1": [8, 9, 11],  # pairwise hamming 1..2 on this band
            "b2": [2, 2, 2],
            "b3": [7, 7, 7],
            "hash_hex": ["a", "b", "c"],
        }
    )
    hashes = spark.createDataFrame(pdf)
    assert phash_neardup_pairs(hashes, 1, 2).count() == 3
    assert phash_neardup_pairs(hashes, 1, 2, max_bucket=1).count() == 0


# --- video (Y4M per-frame) --------------------------------------------------

from vacancy_gpt_etl_pipeline_spark.operators.multimodal import (  # noqa: E402
    synthesize_y4m_payload,
)
from vacancy_gpt_etl_pipeline_spark.operators.phash import (  # noqa: E402
    _y4m_y_planes,
    phash_y4m,
    video_phash_dup_groups,
)


def test_y4m_walker_golden():
    """Hand-written 2x2 C444 Y4M, 2 frames: Y planes recovered in
    order, top row first, U/V planes skipped by the frame stride."""
    hdr = b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C444\n"
    f0 = b"FRAME\n" + bytes([1, 2, 3, 4]) + bytes([9] * 4) + bytes([8] * 4)
    f1 = b"FRAME\n" + bytes([5, 6, 7, 8]) + bytes([9] * 4) + bytes([8] * 4)
    w, h, frames = _y4m_y_planes(hdr + f0 + f1)
    assert (w, h, len(frames)) == (2, 2, 2)
    assert frames[0].tolist() == [[1, 2], [3, 4]]
    assert frames[1].tolist() == [[5, 6], [7, 8]]


def test_y4m_walker_quarantine():
    assert _y4m_y_planes(b"") is None
    assert _y4m_y_planes(b"RIFF not y4m") is None
    # C420 refused (only C444 has the 3*w*h stride this walker assumes)
    assert _y4m_y_planes(b"YUV4MPEG2 W2 H2 C420\nFRAME\n" + b"\0" * 6) is None
    # truncated frame terminates the walk instead of crashing
    hdr = b"YUV4MPEG2 W2 H2 C444\n"
    w, h, frames = _y4m_y_planes(hdr + b"FRAME\n" + b"\0" * 5)
    assert frames == []


def test_video_fp_brightness_invariance_per_frame():
    """Two Y planes differing by a uniform shift (no wraparound) hash
    identically except possibly the DC bit — the video fingerprint's
    robustness claim at frame level."""
    rng = np.random.default_rng(31)
    g = rng.integers(0, 200, size=(4, 6)).astype(np.int64)
    a, b = phash64(g), phash64(g + 30)
    assert a[0] & 0x7FFF == b[0] & 0x7FFF and a[1:] == b[1:]


def test_video_phash_spark_round_trip(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fps = phash_y4m(synthesize_y4m_payload(docs, "doc_id")).cache()
    try:
        rows = {r["asset_id"]: r for r in fps.collect()}
        assert len(rows) == docs.count()
        for i, r in rows.items():
            assert r["width"] == i % 8 + 2
            assert r["height"] == i % 4 + 2
            assert r["n_frames"] == i % 5 + 1
            assert len(r["video_fp"]) == 17 * r["n_frames"] - 1
            # spark hash equals the pure-python pipeline on the same bytes
        payloads = {
            p["asset_id"]: bytes(p["content"])
            for p in synthesize_y4m_payload(docs, "doc_id").limit(10).collect()
        }
        for aid, b in payloads.items():
            w, h, frames = _y4m_y_planes(b)
            expect = "-".join(
                "{:04x}{:04x}{:04x}{:04x}".format(*_phash_reference(y))
                for y in frames
            )
            assert rows[aid]["video_fp"] == expect
        groups = video_phash_dup_groups(fps).collect()
        assert all(g["n_assets"] >= 2 for g in groups)
    finally:
        fps.unpersist()


def test_multimodal_dedup_manifest_composition(spark, sf_dir):
    """The capstone manifest's per-modality members must agree with the
    standalone group operators: same total drop counts, keep-first
    survivor rule (keep_id = group min < drop_id), no self-drops."""
    from vacancy_gpt_etl_pipeline_spark.queries import (
        multimodal_dedup_manifest,
        image_phash_dedup,
        audio_fingerprint_dedup,
        video_phash_dedup,
    )

    man = multimodal_dedup_manifest(spark, sf_dir).collect()
    assert all(r["keep_id"] < r["drop_id"] for r in man)
    by_mod = {}
    for r in man:
        by_mod.setdefault(r["modality"], []).append(r)
    expected = {
        "image": image_phash_dedup,
        "audio": audio_fingerprint_dedup,
        "video": video_phash_dedup,
    }
    for mod, q in expected.items():
        drop_total = sum(g["drop_count"] for g in q(spark, sf_dir).collect())
        assert len(by_mod.get(mod, [])) == drop_total, mod
    # the sf0.001 documents fixture has no exact text duplicates
    assert "text" not in by_mod or len(by_mod["text"]) >= 0


def test_truncated_payloads_quarantine_not_raise():
    """Truncated BMP pixel arrays and malformed Y4M header tokens must
    quarantine (None), never raise inside the Arrow decoder."""
    # valid 2x2 BMP header claiming pixels that aren't there
    header = (
        b"BM" + (70).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little") + (2).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + b"\x00" * 24
    )
    assert _bmp_gray(header + b"\x01\x02") is None
    assert _y4m_y_planes(b"YUV4MPEG2 Wabc H2 C444\nFRAME\n" + b"\0" * 12) is None


def test_phash_incremental_gate(spark, sf_dir):
    """Incremental gate invariants on sf0.001: every survivor's
    fingerprint is absent from history (exact) and ≥3 Hamming away
    from every history fingerprint (near, threshold 2); planted
    byte-copies of history assets never survive."""
    from vacancy_gpt_etl_pipeline_spark.operators.phash import (
        phash_incremental,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist_docs = docs.where("doc_id < 250")
    batch_assets = synthesize_bmp_payload(
        docs.where("doc_id >= 250"), "doc_id"
    ).unionByName(
        synthesize_bmp_payload(docs.where("doc_id < 50"), "doc_id")
        .withColumn("asset_id", F.col("asset_id") + 900000)
    )
    hist = phash_bmp(synthesize_bmp_payload(hist_docs, "doc_id"))
    batch = phash_bmp(batch_assets)
    survivors = phash_incremental(batch, hist).collect()
    hset = [
        (r["b0"], r["b1"], r["b2"], r["b3"]) for r in hist.collect()
    ]
    for s in survivors:
        assert s["asset_id"] < 900000  # plants are exact copies → dropped
        sh = (s["b0"], s["b1"], s["b2"], s["b3"])
        for hh in hset:
            ham = sum(bin(a ^ b).count("1") for a, b in zip(sh, hh))
            assert ham > 2

    with pytest.raises(ValueError, match="max_hamming < 4"):
        phash_incremental(batch, hist, max_hamming=4)


def test_phash_incremental_overfull_batch_bucket_still_gated(spark):
    """r12 advice: the near gate's fan-out cap applies to the HISTORY
    leg only. An over-full BATCH band bucket must still be gated —
    capping it by its own size silently ADMITTED near-duplicates of
    history (a recall hole the uncapped oracle diverges on). Three
    distinct batch fingerprints share band 0 with a history
    fingerprint at Hamming ≤ 2; with max_bucket=2 (smaller than the
    batch bucket) all three must still be dropped by the near gate."""
    import pandas as pd

    from vacancy_gpt_etl_pipeline_spark.operators.phash import (
        phash_incremental,
    )

    batch = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [11, 12, 13],
                "b0": [5, 5, 5],
                "b1": [8, 11, 13],  # hamming 1..2 from history's 9
                "b2": [2, 2, 2],
                "b3": [7, 7, 7],
                "hash_hex": ["a", "b", "c"],
            }
        )
    )
    hist = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1],
                "b0": [5],
                "b1": [9],
                "b2": [2],
                "b3": [7],
                "hash_hex": ["h"],
            }
        )
    )
    assert phash_incremental(batch, hist, max_bucket=2).count() == 0
    # the history cap keeps its admit-direction contract: an over-full
    # HISTORY bucket loses its veto
    hist3 = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2, 3],
                "b0": [5, 5, 5],
                "b1": [9, 17, 33],  # distinct fingerprints, same band 0
                "b2": [2, 2, 2],
                "b3": [7, 7, 7],
                "hash_hex": ["h", "i", "j"],
            }
        )
    )
    one = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [21],
                "b0": [5],
                "b1": [8],  # hamming 1 from history's 9 — normally gated
                "b2": [2],
                "b3": [7],
                "hash_hex": ["k"],
            }
        )
    )
    assert phash_incremental(one, hist3, max_bucket=1).count() == 1


def test_y4m_c444alpha_quarantined():
    """C444alpha frames carry FOUR planes — a 3-plane stride walk would
    desynchronize, so the shared header parser refuses anything but
    exact C444 (same boundary as multimodal._iter_y4m_frames)."""
    hdr = b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C444alpha\n"
    frame = b"FRAME\n" + bytes(range(16))  # 4 planes of 4
    assert _y4m_y_planes(hdr + frame) is None
