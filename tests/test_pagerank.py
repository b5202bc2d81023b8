"""Integer-quantized PageRank (operators/graph.pagerank).

The registry entry `pagerank` hash-matches an unrolled-CTE SQL twin; these
tests pin the semantics independently: an exact pure-Python mirror of the
quantized recurrence on a hand-built graph, rank-ordering sanity, and
partitioning invariance (BIGINT sums are order-independent — a float
implementation would fail this bit-for-bit check).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.graph import (
    PAGERANK_SCALE,
    pagerank,
)


def _python_pagerank(edge_list, iterations, scale=PAGERANK_SCALE):
    edges = sorted(set(edge_list))
    nodes = sorted({s for s, _ in edges})
    n = len(nodes)
    deg = {u: sum(1 for s, _ in edges if s == u) for u in nodes}
    rank = {u: scale // n for u in nodes}
    base = (15 * scale) // (100 * n)
    for _ in range(iterations):
        m = {u: 0 for u in nodes}
        for s, d in edges:
            m[d] += rank[s] // deg[s]
        rank = {u: base + (85 * m[u]) // 100 for u in nodes}
    return rank


@pytest.fixture(scope="module")
def star_graph(spark):
    # hub 0 ↔ leaves 1..6, plus a 7-8 pendant pair; symmetrized
    pairs = [(0, i) for i in range(1, 7)] + [(7, 8)]
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


def test_matches_python_mirror(star_graph):
    got = {r["node"]: r["rank"] for r in pagerank(star_graph, iterations=5).collect()}
    sym = [(r["src"], r["dst"]) for r in star_graph.collect()]
    want = _python_pagerank(sym, 5)
    assert got == want


def test_hub_outranks_leaves(star_graph):
    got = {r["node"]: r["rank"] for r in pagerank(star_graph, iterations=5).collect()}
    assert all(got[0] > got[i] for i in range(1, 7))
    # pendant pair nodes are symmetric: identical quantized ranks
    assert got[7] == got[8]


def test_partitioning_invariance(star_graph):
    a = sorted(map(tuple, pagerank(star_graph, iterations=4).collect()))
    b = sorted(map(tuple, pagerank(star_graph.repartition(5), iterations=4).collect()))
    assert a == b


def test_duplicate_edges_ignored(spark, star_graph):
    """The operator dedups its edge input — feeding each edge twice must
    not change any rank."""
    doubled = star_graph.unionByName(star_graph)
    a = sorted(map(tuple, pagerank(star_graph, iterations=3).collect()))
    b = sorted(map(tuple, pagerank(doubled, iterations=3).collect()))
    assert a == b
