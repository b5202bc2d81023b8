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


def test_prefix_blocking_recall_limit_documented(spark):
    # an edit INSIDE the prefix is the documented single-pass miss
    got = _pairs(spark, [(1, "xabcdef"), (2, "yabcdef")], max_distance=2)
    assert got == []


def test_block_cap_drops_degenerate_blocks(spark):
    rows = [(i, f"aaa{i:04d}") for i in range(50)]
    got = _pairs(spark, rows, max_distance=2, max_block=10)
    assert got == []  # the 50-row block exceeds the cap entirely


def test_normalization_case_and_whitespace(spark):
    got = _pairs(spark, [(1, "Cold  Widget"), (2, "cold widget")], max_distance=2)
    assert got == [(1, 2, 0)]
