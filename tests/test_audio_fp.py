"""Acoustic fingerprint conformance (operators/audio_fp.py).

The reference is an independent direct-sum DFT (no numpy matmul) over
the same integer tables; property tests pin the two design invariants:
amplitude invariance (gain² scales every bin energy — argmax unmoved)
and pure-tone bin recovery (a LUT tone at frequency f peaks at bin f).
"""

from __future__ import annotations

import numpy as np

from vacancy_gpt_etl_pipeline_spark.operators.audio_fp import (
    FP_COS16,
    FP_SIN16,
    audio_fp_dup_groups,
    fingerprint_pcm,
    fingerprint_wav,
    synthesize_tone_payload,
)


def _fingerprint_reference(samples: list[int]) -> tuple[int, str]:
    tops = []
    start = 0
    while start + 16 <= len(samples):
        best = None
        for b in range(1, 9):
            re = sum(samples[start + k] * FP_COS16[(b * k) % 16] for k in range(16))
            im = sum(samples[start + k] * FP_SIN16[(b * k) % 16] for k in range(16))
            e = re * re + im * im
            if best is None or e > best[0]:
                best = (e, b)
        tops.append(best[1])
        start += 8
    return len(tops), "-".join(map(str, tops))


def test_matches_textbook_reference_on_random_pcm():
    rng = np.random.default_rng(23)
    for _ in range(30):
        n = int(rng.integers(0, 100))
        s = rng.integers(-32768, 32768, size=n)
        assert fingerprint_pcm(s) == _fingerprint_reference([int(x) for x in s])


def test_pure_tone_recovers_its_bin():
    for f in range(1, 9):
        s = np.array([FP_COS16[(f * k) % 16] for k in range(48)])
        n_windows, fp = fingerprint_pcm(s)
        assert n_windows == 5
        assert fp == "-".join([str(f)] * 5)


def test_amplitude_invariance():
    rng = np.random.default_rng(29)
    s = rng.integers(-8000, 8000, size=64)
    base = fingerprint_pcm(s)
    for gain in (2, 3, 4):
        assert fingerprint_pcm(s * gain) == base


def test_short_payload_zero_windows():
    assert fingerprint_pcm(np.array([], dtype=np.int64)) == (0, "")
    assert fingerprint_pcm(np.arange(15)) == (0, "")
    assert fingerprint_pcm(np.arange(16))[0] == 1


def test_spark_round_trip_and_dup_groups(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fps = fingerprint_wav(synthesize_tone_payload(docs, "doc_id")).cache()
    try:
        rows = {r["asset_id"]: r for r in fps.collect()}
        assert len(rows) == docs.count()
        for i, r in rows.items():
            n = i % 32 + 32
            assert r["n_samples"] == n
            assert r["n_windows"] == (n - 16) // 8 + 1
        # ids 64 apart share f1/f2/n (all mod-64 forms) but differ in
        # amplitude (mod 3) — fingerprints must still agree
        for i in rows:
            j = i + 64
            if j in rows:
                assert rows[i]["fingerprint"] == rows[j]["fingerprint"]
        groups = audio_fp_dup_groups(fps).collect()
        assert groups and all(g["n_assets"] >= 2 for g in groups)
        total_grouped = sum(g["n_assets"] for g in groups)
        assert total_grouped <= len(rows)
    finally:
        fps.unpersist()


def test_non_wav_quarantined(spark):
    df = spark.createDataFrame(
        [(1, b"not a wav"), (2, None)], "asset_id long, content binary"
    )
    assert fingerprint_wav(df).count() == 0
