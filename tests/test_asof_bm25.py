"""As-of join boundary semantics (operators/asof.py) and BM25 ranking
sanity (operators/text_search.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.asof import asof_join
from vacancy_gpt_etl_pipeline_spark.operators.text_search import bm25_topk


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100, 1.0), (1, _ts(30), 101, 2.0), (2, _ts(5), 102, 3.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 50, 10.0), (1, _ts(20), 51, 20.0), (3, _ts(1), 52, 30.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    return left, right


def test_asof_exact_ts_matches_and_latest_prior_wins(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(
            left, right, ["user_id"], "ts", ["value"], seq_col="event_id"
        ).collect()
    }
    assert out[100] == (_ts(10), 10.0)  # right at EXACTLY left.ts matches
    assert out[101] == (_ts(20), 20.0)  # latest prior, not first
    assert out[102] == (None, None)  # no right row for user 2 → left join


def test_asof_duplicate_right_ts_resolved_by_seq(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100, 1.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 50, 10.0), (1, _ts(5), 51, 20.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    rows = asof_join(
        left, right, ["user_id"], "ts", ["value"], seq_col="event_id"
    ).collect()
    assert rows[0]["asof_value"] == 20.0  # highest event_id at the tied ts


def test_asof_keeps_all_left_columns(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["user_id"], "ts", ["value"], seq_col="event_id")
    assert set(out.columns) == {
        "user_id", "ts", "event_id", "value", "asof_ts", "asof_value",
    }
    assert out.count() == left.count()


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark join join join filler filler"),
            (2, "spark join filler filler filler filler"),
            (3, "filler filler filler filler filler filler"),
            (4, "rare spark filler filler filler filler"),
        ],
        "doc_id long, text string",
    )


def test_bm25_tf_orders_within_term(spark):
    q = spark.createDataFrame([(0, "join")], "query_id long, query string")
    rows = bm25_topk(_docs(spark), q, k=10).orderBy("rank").collect()
    ids = [r["doc_id"] for r in rows]
    assert ids[0] == 1  # tf=3 beats tf=1
    assert 3 not in ids  # doc without the term never scores


def test_bm25_rare_term_outweighs_common(spark):
    # "rare" appears in 1 doc, "spark" in 3 → for doc 4 the rare term
    # contributes more than the common one does for doc 2
    q = spark.createDataFrame(
        [(0, "rare"), (1, "spark")], "query_id long, query string"
    )
    rows = bm25_topk(_docs(spark), q, k=1).collect()
    by_q = {r["query_id"]: r["score"] for r in rows}
    assert by_q[0] > by_q[1]


def test_bm25_multi_term_sums(spark):
    q_both = spark.createDataFrame(
        [(0, "spark join"), (1, "spark"), (2, "join")],
        "query_id long, query string",
    )
    rows = bm25_topk(_docs(spark), q_both, k=10).collect()
    s = {
        (r["query_id"], r["doc_id"]): r["score"] for r in rows
    }
    got = s[(0, 2)]
    want = s[(1, 2)] + s[(2, 2)]
    assert abs(got - want) < 2e-6  # score(q="spark join") = sum of parts


def test_incremental_topk_merge_equals_full(spark):
    # three-way batch split must reproduce the full top-k exactly,
    # including re-submission of an already-merged batch (idempotence)
    import random

    from pyspark.sql import Row
    from vacancy_gpt_etl_pipeline_spark.operators.similarity import (
        incremental_topk_merge,
        knn_brute_force,
    )

    rng = random.Random(5)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows)
    queries = emb.where("vec_id < 3").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    full = knn_brute_force(emb, queries, k=5, dim=8)
    batches = [emb.where(f"vec_id % 3 = {i}") for i in range(3)]
    acc = knn_brute_force(batches[0], queries, k=5, dim=8)
    for b in batches[1:]:
        acc = incremental_topk_merge(acc, knn_brute_force(b, queries, k=5, dim=8), k=5)
    # idempotent re-merge of batch 0
    acc = incremental_topk_merge(acc, knn_brute_force(batches[0], queries, k=5, dim=8), k=5)
    assert sorted(map(tuple, acc.collect())) == sorted(map(tuple, full.collect()))


def test_point_in_time_join_no_fanout_no_leakage(spark):
    from datetime import datetime

    from pyspark.sql import Row
    from vacancy_gpt_etl_pipeline_spark.operators.asof import (
        point_in_time_join,
    )

    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    hist = spark.createDataFrame(
        [
            Row(k=1, state="bronze", valid_from=ts("2024-01-01T00:00:00"),
                valid_to=ts("2024-02-01T00:00:00")),
            Row(k=1, state="gold", valid_from=ts("2024-02-01T00:00:00"),
                valid_to=None),
        ]
    )
    facts = spark.createDataFrame(
        [
            Row(f=10, k=1, at=ts("2023-12-15T00:00:00")),  # pre-history
            Row(f=11, k=1, at=ts("2024-01-15T00:00:00")),  # bronze era
            Row(f=12, k=1, at=ts("2024-02-01T00:00:00")),  # boundary -> gold
            Row(f=13, k=1, at=ts("2024-07-01T00:00:00")),  # open run
        ]
    )
    rows = point_in_time_join(facts, hist, ["k"], "at").collect()
    # exactly one row per fact (SCD2 runs never overlap -> no fan-out):
    # assert the COUNT, not just the dict, or a fan-out regression would
    # be silently collapsed by the comprehension
    assert len(rows) == 4
    out = {r["f"]: r["state"] for r in rows}
    # a fact BEFORE the first run gets NULL, never a future state
    assert out == {10: None, 11: "bronze", 12: "gold", 13: "gold"}
    # the history-side key is dropped: bare key reference is unambiguous
    assert [r["k"] for r in rows] == [1, 1, 1, 1]
