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


def test_near_tail_twin_differs_in_at_most_last_window():
    """The near-encode fixture's contract: the tail switch touches
    only samples exclusive to the LAST analysis window, so the twin's
    fingerprint has window-Hamming ≤ 1 from its source — and for at
    least some ids the peak actually moves (a real near pair)."""
    import numpy as np

    from vacancy_gpt_etl_pipeline_spark.operators.audio_fp import (
        FP_COS16,
        fingerprint_pcm,
    )

    moved = 0
    for i in range(64):
        n = i % 32 + 32
        f1, f2, f3 = 1 + i % 8, 1 + (i // 8) % 8, 1 + (i + 3) % 8
        amp = 1 + i % 3
        cut = ((n - 16) // 8) * 8 + 8
        base = np.array(
            [
                amp * FP_COS16[((f1 if k < n // 2 else f2) * k) % 16]
                for k in range(n)
            ]
        )
        near = np.array(
            [
                amp
                * FP_COS16[
                    (
                        (
                            f3
                            if k >= cut
                            else (f1 if k < n // 2 else f2)
                        )
                        * k
                    )
                    % 16
                ]
                for k in range(n)
            ]
        )
        _, fpa = fingerprint_pcm(base)
        _, fpb = fingerprint_pcm(near)
        a, b = fpa.split("-"), fpb.split("-")
        assert len(a) == len(b)
        ham = sum(x != y for x, y in zip(a, b))
        assert ham <= 1, (i, fpa, fpb)
        moved += ham
    assert moved > 0  # the plant class produces REAL near pairs


def test_audio_fp_near_veto_gate(spark):
    """Gate semantics: exact copies vetoed by the anti-join, 1-window
    re-encodes vetoed by the band-LSH near tier, genuinely novel
    clips survive, and short clips (n_windows <= max_diff) are exempt
    from the near veto but still face the exact gate."""
    from vacancy_gpt_etl_pipeline_spark.operators.audio_fp import (
        audio_fp_near_veto,
    )

    hist = spark.createDataFrame(
        [
            (1, 64, 5, "3-4-5-2-7"),
            (2, 40, 2, "6-1"),  # short: near-exempt
        ],
        "asset_id long, n_samples long, n_windows int, fingerprint string",
    )
    batch = spark.createDataFrame(
        [
            (10, 64, 5, "3-4-5-2-7"),   # exact copy -> vetoed
            (11, 64, 5, "3-4-5-2-8"),   # hamming 1 -> near-vetoed
            (12, 64, 5, "3-4-6-2-8"),   # hamming 2 -> near-vetoed
            (13, 64, 5, "3-9-6-2-8"),   # hamming 3 -> survives
            (14, 64, 5, "1-1-1-1-1"),   # novel -> survives
            (15, 64, 5, "1-1-1-1-1"),   # dup of 14 in-batch -> keep-first
            (16, 40, 2, "6-2"),         # short, hamming 1 but EXEMPT
            (17, 40, 2, "6-1"),         # short exact copy -> vetoed
            (18, 0, 0, ""),             # zero windows -> dropped
        ],
        "asset_id long, n_samples long, n_windows int, fingerprint string",
    )
    got = sorted(
        r["asset_id"]
        for r in audio_fp_near_veto(
            batch, hist, max_diff=2, n_bands=3
        ).collect()
    )
    assert got == [13, 14, 16]


def test_audio_fp_near_veto_guards(spark):
    from vacancy_gpt_etl_pipeline_spark.operators.audio_fp import (
        audio_fp_near_veto,
    )

    df = spark.createDataFrame(
        [(1, 64, 5, "1-2-3-4-5")],
        "asset_id long, n_samples long, n_windows int, fingerprint string",
    )
    for kwargs in ({"max_diff": 3, "n_bands": 3}, {"max_diff": 0}):
        try:
            audio_fp_near_veto(df, df, **kwargs)
            assert False, kwargs
        except ValueError:
            pass


def test_seq_near_pairs_generic(spark):
    """The shared sequence-band-LSH core (dedup.seq_near_pairs):
    equal-length-only pairing, inclusive diff bounds, short-sequence
    exemption, min-id representatives, and the banding finding every
    pair a brute-force Hamming finds (pigeonhole exhaustiveness)."""
    from itertools import combinations

    from vacancy_gpt_etl_pipeline_spark.operators.dedup import (
        seq_near_pairs,
    )

    rows = [
        (1, "3-4-5-2-7"),
        (2, "3-4-5-2-8"),    # d(1,2)=1
        (3, "3-4-6-2-8"),    # d(1,3)=2, d(2,3)=1
        (4, "9-9-9-9-9"),
        (5, "3-4-5-2"),      # different length: never pairs with 1-3
        (6, "3-4-5-3"),      # d(5,6)=1 (length-4 family)
        (7, "3-4-5-2-7"),    # exact dup of 1: collapses to rep 1
        (8, "1-2"),          # n <= max_diff: exempt
        (9, "1-3"),
    ]
    df = spark.createDataFrame(rows, "asset_id long, fingerprint string")
    got = sorted(
        (r["id_a"], r["id_b"], r["n_diff"])
        for r in seq_near_pairs(df, "fingerprint").collect()
    )
    # brute force over min-id reps with n > 2
    reps = {}
    for aid, fp in rows:
        reps[fp] = min(reps.get(fp, 10**9), aid)
    want = []
    for (fa, a), (fb, b) in combinations(sorted(reps.items()), 2):
        sa, sb = fa.split("-"), fb.split("-")
        if len(sa) != len(sb) or len(sa) <= 2:
            continue
        d = sum(x != y for x, y in zip(sa, sb))
        if 1 <= d <= 2:
            want.append((min(a, b), max(a, b), d))
    assert got == sorted(want)
    assert (1, 2, 1) in got and (5, 6, 1) in got and (8, 9, 1) not in got


def test_seq_near_pairs_matches_bruteforce_on_fixture(spark, sf_dir):
    """Banding exhaustiveness on the REAL audio fixture: every pair
    brute-force Hamming finds between distinct-fingerprint reps, the
    banded join finds too (and nothing more)."""
    from itertools import combinations

    from vacancy_gpt_etl_pipeline_spark.operators.audio_fp import (
        fingerprint_wav,
        synthesize_tone_payload,
    )
    from vacancy_gpt_etl_pipeline_spark.operators.dedup import (
        seq_near_pairs,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .where("doc_id < 200")
    )
    fps = fingerprint_wav(synthesize_tone_payload(docs, "doc_id"))
    rows = [(r["asset_id"], r["fingerprint"]) for r in fps.collect()]
    got = sorted(
        (r["id_a"], r["id_b"], r["n_diff"])
        for r in seq_near_pairs(fps, "fingerprint").collect()
    )
    reps = {}
    for aid, fp in rows:
        if fp:
            reps[fp] = min(reps.get(fp, 10**9), aid)
    want = []
    for (fa, a), (fb, b) in combinations(sorted(reps.items()), 2):
        sa, sb = fa.split("-"), fb.split("-")
        if len(sa) != len(sb) or len(sa) <= 2:
            continue
        d = sum(x != y for x, y in zip(sa, sb))
        if 1 <= d <= 2:
            want.append((min(a, b), max(a, b), d))
    assert got == sorted(want) and got
