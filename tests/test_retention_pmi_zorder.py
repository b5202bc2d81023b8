"""Semantic tests for cohort retention, PMI collocations, and z-order
layout — properties the mirrored SQL oracle can't prove on its own."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.layout import (
    zorder_manifest,
    zorder_repartition,
    zvalue,
)
from vacancy_gpt_etl_pipeline_spark.operators.retention import cohort_retention
from vacancy_gpt_etl_pipeline_spark.operators.text_search import (
    pmi_collocations,
)


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def test_cohort_week0_is_always_100pct(spark):
    # every user is active in their own first week by construction
    rows = [
        Row(user_id=1, ts=_ts(1)),   # Mon Jan 1 cohort
        Row(user_id=1, ts=_ts(10)),  # week offset 1
        Row(user_id=2, ts=_ts(3)),   # same cohort week
        Row(user_id=3, ts=_ts(8)),   # next week's cohort
    ]
    out = cohort_retention(spark.createDataFrame(rows)).collect()
    week0 = [r for r in out if r.week_offset == 0]
    assert week0 and all(r.retention_pct == 100.0 for r in week0)
    assert all(
        r.active_users == r.cohort_size for r in week0
    )


def test_cohort_counts_hand_checked(spark):
    rows = [
        # cohort A (week of Jan 1): users 1, 2
        Row(user_id=1, ts=_ts(1)),
        Row(user_id=2, ts=_ts(2)),
        # user 1 returns in week offset 1 twice (distinct-user counted once)
        Row(user_id=1, ts=_ts(8)),
        Row(user_id=1, ts=_ts(9)),
        # user 2 returns in week offset 2
        Row(user_id=2, ts=_ts(15)),
    ]
    out = {
        (r.cohort_week, r.week_offset): r
        for r in cohort_retention(spark.createDataFrame(rows)).collect()
    }
    a = dt.date(2024, 1, 1)
    assert out[(a, 0)].active_users == 2 and out[(a, 0)].cohort_size == 2
    assert out[(a, 1)].active_users == 1
    assert out[(a, 1)].retention_pct == 50.0
    assert out[(a, 2)].active_users == 1


def test_pmi_ranks_collocation_over_independent_pair(spark):
    # "san francisco" always co-occur; "the" pairs with everything
    docs = [
        Row(doc_id=i, text=f"the city of san francisco is the city {i % 3}")
        for i in range(30)
    ]
    out = pmi_collocations(
        spark.createDataFrame(docs), k=10, min_count=3
    ).collect()
    pairs = {r.pair: r for r in out}
    assert "san francisco" in pairs
    # a perfectly-bound pair outranks the promiscuous "the city"
    assert pairs["san francisco"].pmi > pairs["the city"].pmi
    assert out == sorted(out, key=lambda r: (-r.pmi, r.pair))


def test_pmi_value_matches_closed_form(spark):
    # corpus of 4 docs, hand-countable stream
    texts = ["a b a b", "a b c d", "c d c d", "a a a a"]
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    out = {r.pair: r for r in pmi_collocations(docs, k=50, min_count=1).collect()}
    # token stream bigrams: each doc has 3 pairs -> N = 12
    # c("a b") = 3 ("a b a b" has 2: positions 1-2, 3-4? no — adjacent:
    # (a,b),(b,a),(a,b) -> 2; "a b c d" has 1) ; c(a)=4+1+0+4? count:
    # doc0: a,b,a,b -> a=2 b=2 ; doc1: a=1 b=1 c=1 d=1 ; doc2: c=2 d=2 ;
    # doc3: a=4 => c(a)=7, c(b)=3, c("a b")=3, N=12
    import math

    expected = round(float(3 * 12) / float(7 * 3), 12)
    assert out["a b"].c_xy == 3
    assert out["a b"].pmi == pytest.approx(math.log(expected), abs=1e-6)


def test_zvalue_matches_python_reference(spark):
    rows = [Row(x=i * 37 % 101, y=i * 53 % 97) for i in range(101)]
    df = spark.createDataFrame(rows)
    got = {(r.x, r.y): r.z for r in zvalue(df, "x", "y", bits=8).collect()}
    xs = [r.x for r in rows]
    ys = [r.y for r in rows]
    xmin, xmax, ymin, ymax = min(xs), max(xs), min(ys), max(ys)

    def norm(v, lo, hi):
        return int((v - lo) * 255.0 / float(hi - lo)) if hi > lo else 0

    def interleave(zx, zy):
        z = 0
        for k in range(8):
            z |= ((zx >> k) & 1) << (2 * k)
            z |= ((zy >> k) & 1) << (2 * k + 1)
        return z

    for r in rows:
        import math

        zx = int(math.floor((r.x - xmin) * 255.0 / float(xmax - xmin)))
        zy = int(math.floor((r.y - ymin) * 255.0 / float(ymax - ymin)))
        assert got[(r.x, r.y)] == interleave(zx, zy), (r.x, r.y)


def test_zorder_buckets_bound_both_dimensions(spark):
    # uniform 256x256 grid: after z-bucketing into 256 buckets each bucket
    # must cover ~1/16 of EACH dimension's range (a 16x16 tile), far
    # tighter than a 1-D sort could bound the second column
    rows = [Row(x=i, y=j) for i in range(0, 256, 4) for j in range(0, 256, 4)]
    man = zorder_manifest(
        spark.createDataFrame(rows), "x", "y", bits=8, bucket_bits=8
    ).collect()
    assert len(man) == 256
    for r in man:
        assert r.x_max - r.x_min <= 16
        assert r.y_max - r.y_min <= 16


def test_zorder_repartition_sorted_within_partitions(spark):
    rows = [Row(x=i * 29 % 997, y=i * 31 % 991) for i in range(997)]
    z = zorder_repartition(
        spark.createDataFrame(rows), "x", "y", bits=10, num_partitions=8
    )

    def check(it):
        vals = [r.z for r in it]
        assert vals == sorted(vals)
        yield Row(n=len(vals), lo=vals[0] if vals else -1, hi=vals[-1] if vals else -1)

    parts = z.rdd.mapPartitions(check).collect()
    spans = sorted((p.lo, p.hi) for p in parts if p.n > 0)
    # range partitioning: partition z-spans must not overlap
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_zorder_manifest_query_matches_python_brute_force(spark):
    """VERDICT r7 item 5 (mirror→independent oracles): the registry's
    zorder_manifest entry, verified against a from-scratch pure-Python
    brute force over the REAL sf0.001 lineitem at the query's actual
    parameters (bits=16, bucket_bits=8) — independent of both the Spark
    codegen expression AND the generated duckdb SQL twin. The Python
    side re-derives normalization (same IEEE floor expression),
    interleaves bits with a naive per-bit loop, buckets by the top 8
    bits, and aggregates with a dict."""
    import math

    from vacancy_gpt_etl_pipeline_spark.queries import zorder_manifest_query

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r.bucket: (r.n_rows, r.x_min, r.x_max, r.y_min, r.y_max)
        for r in zorder_manifest_query(spark, sf_dir).collect()
    }

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    xs = [r.l_orderkey for r in rows]
    ys = [r.l_partkey for r in rows]
    xmin, xmax, ymin, ymax = min(xs), max(xs), min(ys), max(ys)
    top = float((1 << 16) - 1)

    def norm(v, lo, hi):
        return (
            int(math.floor((v - lo) * top / float(hi - lo))) if hi > lo else 0
        )

    def interleave(zx, zy):
        z = 0
        for k in range(16):
            z |= ((zx >> k) & 1) << (2 * k)
            z |= ((zy >> k) & 1) << (2 * k + 1)
        return z

    expect: dict[int, list] = {}
    for x, y in zip(xs, ys):
        z = interleave(norm(x, xmin, xmax), norm(y, ymin, ymax))
        b = z >> 24  # 2*bits - bucket_bits
        e = expect.setdefault(b, [0, x, x, y, y])
        e[0] += 1
        e[1], e[2] = min(e[1], x), max(e[2], x)
        e[3], e[4] = min(e[3], y), max(e[4], y)

    assert got == {b: tuple(e) for b, e in expect.items()}
