"""Closed-form edge-case tests for the round-8 TPC-H completion pack
(q2/q11/q20/q21): each plants a tiny hand-derived dataset that pins the
semantics the DuckDB oracle alone could miss — tie retention in the
Q2 join-back, the strict > at Q11/Q20's exact threshold boundary, and
the aggregate decorrelation of Q21's EXISTS/NOT-EXISTS pair."""

from __future__ import annotations

from datetime import datetime


def _write_tables(spark, tmp_path, **tables):
    sf_dir = str(tmp_path / "sf")
    for name, df in tables.items():
        df.write.parquet(f"{sf_dir}/{name}.parquet")
    return sf_dir


def test_q2_keeps_every_tied_min_cost_supplier(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import q2_min_cost_supplier

    part = spark.createDataFrame(
        [(1, "Brand#1", "LARGE", 10), (2, "Brand#2", "SMALL", 10)],
        "p_partkey long, p_brand string, p_type string, p_size long",
    )
    lineitem = spark.createDataFrame(
        # part 1: s1 and s2 tie at 100.0 (s1 via its cheaper second line),
        # s3 loses at 150.0; part 2 filtered out by p_type
        [(1, 1, 120.0), (1, 1, 100.0), (1, 2, 100.0), (1, 3, 150.0), (2, 3, 1.0)],
        "l_partkey long, l_suppkey long, l_extendedprice double",
    )
    supplier = spark.createDataFrame(
        [(1, "S1", 0, 10.0), (2, "S2", 0, 20.0), (3, "S3", 0, 30.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    nation = spark.createDataFrame(
        [(0, "NATION_0", 0)], "n_nationkey long, n_name string, n_regionkey long"
    )
    sf_dir = _write_tables(
        spark, tmp_path, part=part, lineitem=lineitem,
        supplier=supplier, nation=nation,
    )
    rows = q2_min_cost_supplier(spark, sf_dir).collect()
    assert [(r.s_name, r.p_partkey, r.min_cost) for r in rows] == [
        ("S2", 1, 100.0),  # acctbal 20 sorts before 10 (DESC)
        ("S1", 1, 100.0),
    ]


def _q11_tables(spark, tmp_path, prices):
    part_rows = [(pk, price) for pk, price in enumerate(prices, start=1)]
    lineitem = spark.createDataFrame(
        [(pk, 1, price, 0.0) for pk, price in part_rows],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    supplier = spark.createDataFrame(
        [(1, 0, 0.0)], "s_suppkey long, s_nationkey long, s_acctbal double"
    )
    nation = spark.createDataFrame(
        [(0, "NATION_0", 0)], "n_nationkey long, n_name string, n_regionkey long"
    )
    return _write_tables(
        spark, tmp_path, lineitem=lineitem, supplier=supplier, nation=nation
    )


def test_q11_exact_double_average_is_excluded(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import q11_important_stock

    # values 10, 10, 40: total 60 over 3 parts; 40×3 = 120 is NOT > 2×60,
    # so the exactly-double part must not leak through the strict >
    sf_dir = _q11_tables(spark, tmp_path, [10.0, 10.0, 40.0])
    assert q11_important_stock(spark, sf_dir).count() == 0


def test_q11_one_cent_above_double_qualifies(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import q11_important_stock

    # 40.01×3 = 120.03 > 2×60.01 = 120.02 — exact decimal arithmetic must
    # resolve the one-cent margin (doubles would be at rounding mercy)
    sf_dir = _q11_tables(spark, tmp_path, [10.0, 10.0, 40.01])
    rows = q11_important_stock(spark, sf_dir).collect()
    assert [(r.partkey, r.part_value) for r in rows] == [(3, 40.01)]


def test_q20_exactly_half_is_excluded(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import q20_excess_shippers

    part = spark.createDataFrame(
        [(1, "small bolt"), (2, "small nut")], "p_partkey long, p_name string"
    )
    ship = datetime(1997, 3, 1)
    lineitem = spark.createDataFrame(
        # part 1: 50/50 split — NEITHER ships more than half;
        # part 2: 51/49 — only supplier 1 qualifies
        [
            (1, 1, 50.0, ship), (1, 2, 50.0, ship),
            (2, 1, 51.0, ship), (2, 2, 49.0, ship),
        ],
        "l_partkey long, l_suppkey long, l_quantity double, l_shipdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(1, "S1", 0), (2, "S2", 0)],
        "s_suppkey long, s_name string, s_nationkey long",
    )
    nation = spark.createDataFrame(
        [(0, "NATION_0", 0)], "n_nationkey long, n_name string, n_regionkey long"
    )
    sf_dir = _write_tables(
        spark, tmp_path, part=part, lineitem=lineitem,
        supplier=supplier, nation=nation,
    )
    rows = q20_excess_shippers(spark, sf_dir).collect()
    assert [(r.s_name, r.n_name) for r in rows] == [("S1", "NATION_0")]


def test_q21_aggregate_decorrelation_edge_cases(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import q21_waiting_orders

    od = datetime(2024, 1, 1)
    late, ontime = datetime(2024, 6, 1), datetime(2024, 1, 15)
    orders = spark.createDataFrame(
        [
            (1, od, "F"),  # s10 late (twice!), s20 on time → s10 waits ONCE
            (2, od, "F"),  # s10 late but sole supplier → excluded
            (3, od, "F"),  # both late → excluded (another late supplier exists)
            (4, od, "O"),  # open order → excluded by status
            (5, od, "F"),  # s20 late, s10 on time → s20 waits
        ],
        "o_orderkey long, o_orderdate timestamp, o_orderstatus string",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 10, late), (1, 10, late), (1, 20, ontime),
            (2, 10, late),
            (3, 10, late), (3, 20, late),
            (4, 10, late), (4, 20, ontime),
            (5, 20, late), (5, 10, ontime),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(10, "S10"), (20, "S20")], "s_suppkey long, s_name string"
    )
    sf_dir = _write_tables(
        spark, tmp_path, orders=orders, lineitem=lineitem, supplier=supplier
    )
    rows = q21_waiting_orders(spark, sf_dir).collect()
    assert [(r.s_name, r.numwait) for r in rows] == [("S10", 1), ("S20", 1)]
