"""Blocked fuzzy self-join (operators/fuzzy.py): distance bound is exact,
blocking recall properties, straddle spill, block cap."""

from __future__ import annotations

from vacancy_gpt_etl_pipeline_spark.operators.fuzzy import fuzzy_self_join


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id int, name string")
    return sorted(
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_self_join(df, "name", "id", **kw).collect()
    )


def test_finds_typo_within_distance(spark):
    got = _pairs(
        spark,
        [(1, "widget assembly"), (2, "widgt assembly"), (3, "flange")],
        max_distance=2,
    )
    assert got == [(1, 2, 1)]


def test_distance_bound_is_exact_not_heuristic(spark):
    # 3 edits with a shared prefix and same length bucket: candidate IS
    # generated, verification must reject it
    got = _pairs(
        spark, [(1, "abcdefgh"), (2, "abcxxxgh")], max_distance=2
    )
    assert got == []


def test_straddle_spill_catches_length_boundary_pairs(spark):
    # lengths 8 and 7 sit in different floor(len/4) buckets (2 vs 1);
    # the spill rule must still co-block them for a 1-deletion pair
    got = _pairs(spark, [(1, "abcdefgh"), (2, "abcdefg")], max_distance=2)
    assert got == [(1, 2, 1)]


def test_suffix_pass_recovers_prefix_edits(spark):
    # an edit INSIDE the prefix was the documented single-pass miss;
    # the suffix pass must recover it (shared tail, same length bucket)
    got = _pairs(spark, [(1, "xabcdef"), (2, "yabcdef")], max_distance=2)
    assert got == [(1, 2, 1)]


def test_prefix_only_pass_still_misses_prefix_edits(spark):
    # single-pass mode keeps the documented prefix recall limit
    got = _pairs(
        spark, [(1, "xabcdef"), (2, "yabcdef")], max_distance=2,
        passes=("prefix",),
    )
    assert got == []


def test_both_end_edits_remain_the_documented_miss(spark):
    # one edit at each END breaks prefix AND suffix keys — the residual
    # multi-pass recall limit stated in the module docstring
    got = _pairs(spark, [(1, "xabcdefm"), (2, "yabcdefn")], max_distance=2)
    assert got == []


def test_recall_against_unblocked_exact_join(spark):
    """INDEPENDENT quality oracle (not the mirrored SQL): every
    distance<=2 pair whose edits sit at one end only — including planted
    position-1 typos — must be recovered; the blocked join must also be
    a SUBSET of the exact join (precision 1.0)."""
    from pyspark.sql import functions as F

    names = [
        "chartreuse widget assembly",
        "goldenrod flange bracket",
        "midnight azure coupling",
        "burnished copper fitting",
        "antique linen gasket",
    ]
    rows = [(i, n) for i, n in enumerate(names)]
    # position-1 deletions (escape prefix blocking)
    rows += [(100 + i, n[1:]) for i, n in enumerate(names)]
    # interior deletions (escape nothing)
    rows += [(200 + i, n[:8] + n[9:]) for i, n in enumerate(names)]
    # last-char deletions (escape suffix blocking)
    rows += [(300 + i, n[:-1]) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "id int, name string")

    got = {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy_self_join(df, "name", "id", max_distance=2).collect()
    }

    norm = df.select(
        F.col("id"),
        F.regexp_replace(F.lower(F.trim("name")), r"\s+", " ").alias("t"),
    )
    l, r = norm.alias("l"), norm.alias("r")
    exact = {
        (row["id_a"], row["id_b"]): row["d"]
        for row in l.crossJoin(r)
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.levenshtein("l.t", "r.t").alias("d"),
        )
        .where(F.col("d") <= 2)
        .collect()
    }
    # precision: every blocked pair is a true pair with the same distance
    assert all(exact.get(k) == v for k, v in got.items())
    # recall: single-end edit pairs are all recovered (the planted
    # original↔variant pairs differ by ONE end-deletion each)
    # original↔variant pairs only: variant↔variant pairs (e.g. 100 vs
    # 300) carry an edit at EACH end — the documented residual miss
    planted = {k for k in exact if k[0] < 100 and k[1] - k[0] in (100, 200, 300)}
    missed = planted - set(got)
    assert not missed, f"single-end-edit pairs missed: {missed}"


def test_block_cap_drops_degenerate_blocks(spark):
    rows = [(i, f"aaa{i:04d}") for i in range(50)]
    got = _pairs(spark, rows, max_distance=2, max_block=10)
    assert got == []  # the 50-row block exceeds the cap entirely


def test_normalization_case_and_whitespace(spark):
    got = _pairs(spark, [(1, "Cold  Widget"), (2, "cold widget")], max_distance=2)
    assert got == [(1, 2, 0)]
