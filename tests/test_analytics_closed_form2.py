"""Round-7 closed-form batch for the analytics pack entries whose only
prior verification was the (mirrored) DuckDB oracle: each test plants a
tiny dataset whose correct answer is derived by hand or in plain Python,
independent of any SQL formulation."""

from __future__ import annotations

import math
from datetime import date, datetime, timedelta

from pyspark.sql import Row


def _write_tables(spark, tmp_path, **tables):
    sf_dir = str(tmp_path / "sf")
    for name, df in tables.items():
        df.write.parquet(f"{sf_dir}/{name}.parquet")
    return sf_dir


def _event(eid, uid, ts, etype, value=1.0):
    return Row(
        event_id=eid, user_id=uid, ts=ts, event_type=etype, value=value, props="{}"
    )


def test_benford_first_significant_digit(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import benford_price_digits

    # digits: 1.50→1, 19.00→1, 123.00→1, 0.50→5, 950.00→9;
    # 0.001 rounds to 0.00 at decimal(18,2) → dropped entirely
    orders = spark.createDataFrame(
        [(v,) for v in (1.5, 19.0, 123.0, 0.5, 950.0, 0.001)],
        "o_totalprice double",
    )
    sf_dir = _write_tables(spark, tmp_path, orders=orders)
    got = {r["digit"]: r for r in benford_price_digits(spark, sf_dir).collect()}
    assert set(got) == {1, 5, 9}
    assert got[1]["n_orders"] == 3 and got[1]["observed_share"] == 0.6
    assert got[5]["observed_share"] == 0.2 and got[9]["observed_share"] == 0.2
    assert got[1]["benford_share"] == round(math.log10(2), 6)
    assert got[9]["benford_share"] == round(math.log10(1 + 1 / 9), 6)


def test_ab_test_z_statistic_closed_form(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import ab_test_conversion

    # variant = user_id % 2. Users 2,4,6,8 (variant 0): 2 and 4 convert
    # (purchase ≥ 250). Users 1,3,5,7 (variant 1): only 1 converts.
    rows, eid = [], 0
    for u in range(1, 9):
        eid += 1
        rows.append(_event(eid, u, datetime(2024, 1, 2, 9), "view"))
    for u, v in ((2, 300.0), (4, 260.0), (1, 999.0), (3, 100.0)):
        eid += 1
        rows.append(_event(eid, u, datetime(2024, 1, 3, 9), "purchase", v))
    sf_dir = _write_tables(spark, tmp_path, events=spark.createDataFrame(rows))
    row = ab_test_conversion(spark, sf_dir).collect()[0]
    assert (row["users_a"], row["conv_a"], row["users_b"], row["conv_b"]) == (4, 2, 4, 1)
    p_a, p_b = 0.5, 0.25
    pool = 3 / 8
    se = math.sqrt(pool * (1 - pool) * (1 / 4 + 1 / 4))
    assert row["rate_a"] == p_a and row["rate_b"] == p_b
    assert row["z_score"] == (p_a - p_b) / se
    assert row["significant_95"] is False


def test_diff_in_diff_four_cells(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import diff_in_diff_conversion

    # period 0: ts < 2024-01-16. control (even users) 2,4; treat (odd) 1,3.
    # control: before rate 1/2 (u2 converts), after rate 1/2 (u4 converts)
    # treat: before 0/2, after 1/2 (u1 converts) → DiD = (0.5-0) - (0.5-0.5)
    rows, eid = [], 0
    before, after = datetime(2024, 1, 10, 9), datetime(2024, 1, 20, 9)
    for u in (1, 2, 3, 4):
        eid += 1
        rows.append(_event(eid, u, before, "view"))
        eid += 1
        rows.append(_event(eid, u, after, "view"))
    eid += 1
    rows.append(_event(eid, 2, before, "purchase", 300.0))
    eid += 1
    rows.append(_event(eid, 4, after, "purchase", 300.0))
    eid += 1
    rows.append(_event(eid, 1, after, "purchase", 300.0))
    sf_dir = _write_tables(spark, tmp_path, events=spark.createDataFrame(rows))
    row = diff_in_diff_conversion(spark, sf_dir).collect()[0]
    assert (row["control_before"], row["control_after"]) == (0.5, 0.5)
    assert (row["treat_before"], row["treat_after"]) == (0.0, 0.5)
    assert row["did_estimate"] == 0.5


def test_event_transition_matrix_hand_counts(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import event_transition_matrix

    t0 = datetime(2024, 1, 1, 8)
    rows = [
        _event(1, 1, t0, "A"),
        _event(2, 1, t0 + timedelta(hours=1), "B"),
        _event(3, 1, t0 + timedelta(hours=2), "A"),
        _event(4, 2, t0, "A"),
        _event(5, 2, t0 + timedelta(hours=1), "A"),
    ]
    sf_dir = _write_tables(spark, tmp_path, events=spark.createDataFrame(rows))
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["probability"])
        for r in event_transition_matrix(spark, sf_dir).collect()
    }
    assert got == {
        ("A", "B"): (1, 0.5),
        ("A", "A"): (1, 0.5),
        ("B", "A"): (1, 1.0),
    }


def test_seasonality_iso_weekday_index(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import seasonality_dow_index

    # 2024-01-01 is a Monday (ISO 1), 2024-01-07 a Sunday (ISO 7):
    # 6 Monday events + 1 Sunday event → index 6.0 and 1.0
    rows = [_event(i, 1, datetime(2024, 1, 1, 8 + i), "X") for i in range(6)]
    rows.append(_event(99, 1, datetime(2024, 1, 7, 8), "X"))
    sf_dir = _write_tables(spark, tmp_path, events=spark.createDataFrame(rows))
    got = {r["iso_dow"]: r for r in seasonality_dow_index(spark, sf_dir).collect()}
    assert set(got) == {1, 7}
    assert got[1]["n_events"] == 6 and got[1]["seasonality_index"] == (6 / 7) * 7.0
    assert got[7]["seasonality_index"] == (1 / 7) * 7.0


def test_fulfillment_aging_exact_day_gaps(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import order_fulfillment_aging

    orders = spark.createDataFrame(
        [
            (1, date(1996, 1, 1), "1-URGENT"),
            (2, date(1996, 1, 1), "1-URGENT"),
            (3, date(1996, 2, 1), "5-LOW"),
        ],
        "o_orderkey long, o_orderdate date, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, date(1996, 1, 5)),
            (1, date(1996, 1, 11)),  # last ship → age 10
            (2, date(1996, 1, 3)),  # age 2
            (3, date(1996, 2, 21)),  # age 20
        ],
        "l_orderkey long, l_shipdate date",
    )
    sf_dir = _write_tables(spark, tmp_path, orders=orders, lineitem=li)
    got = {r["o_orderpriority"]: r for r in order_fulfillment_aging(spark, sf_dir).collect()}
    assert got["1-URGENT"]["n_orders"] == 2
    assert got["1-URGENT"]["avg_age_days"] == 6.0  # (10 + 2) / 2
    assert got["1-URGENT"]["max_age_days"] == 10
    assert got["5-LOW"]["avg_age_days"] == 20.0


def test_modal_priority_deterministic_tie_break(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import modal_priority_per_status

    # status O: priorities tied 2-2 → lexicographically smallest wins
    orders = spark.createDataFrame(
        [
            ("O", "3-MEDIUM"),
            ("O", "3-MEDIUM"),
            ("O", "1-URGENT"),
            ("O", "1-URGENT"),
            ("F", "5-LOW"),
        ],
        "o_orderstatus string, o_orderpriority string",
    )
    sf_dir = _write_tables(spark, tmp_path, orders=orders)
    got = {r["o_orderstatus"]: r for r in modal_priority_per_status(spark, sf_dir).collect()}
    assert got["O"]["modal_priority"] == "1-URGENT" and got["O"]["n_orders"] == 2
    assert got["F"]["modal_priority"] == "5-LOW"


def test_linear_attribution_even_split_and_window(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import linear_attribution

    t = datetime(2024, 1, 10, 12)
    rows = [
        _event(1, 1, t, "purchase", 12.0),
        _event(2, 1, t - timedelta(days=1), "view"),
        _event(3, 1, t - timedelta(days=2), "click"),
        _event(4, 1, t - timedelta(days=8), "view"),  # outside 7-day window
        _event(5, 2, t, "purchase", 99.0),  # user 2 has no touches → uncredited
    ]
    sf_dir = _write_tables(spark, tmp_path, events=spark.createDataFrame(rows))
    got = {r["touch_type"]: r for r in linear_attribution(spark, sf_dir).collect()}
    assert set(got) == {"view", "click"}
    assert got["view"]["n_credits"] == 1 and got["view"]["credited_value"] == 6.0
    assert got["click"]["credited_value"] == 6.0


def test_dau_wau_trailing_window(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import dau_wau_stickiness

    d1, d5 = datetime(2024, 1, 1, 9), datetime(2024, 1, 5, 9)
    rows = [
        _event(1, 10, d1, "view"),
        _event(2, 20, d1, "view"),
        _event(3, 10, d5, "view"),
    ]
    sf_dir = _write_tables(spark, tmp_path, events=spark.createDataFrame(rows))
    got = {r["day"]: r for r in dau_wau_stickiness(spark, sf_dir).collect()}
    assert got["2024-01-01"]["dau"] == 2 and got["2024-01-01"]["wau"] == 2
    # day 5's trailing 7-day window still sees both day-1 users
    assert got["2024-01-05"]["dau"] == 1 and got["2024-01-05"]["wau"] == 2
    assert got["2024-01-05"]["stickiness"] == 0.5


def test_monthly_growth_exact_deltas(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import monthly_revenue_growth

    orders = spark.createDataFrame(
        [
            (date(1996, 1, 10), 100.0),
            (date(1996, 1, 20), 50.0),
            (date(1996, 2, 5), 300.0),
        ],
        "o_orderdate date, o_totalprice double",
    )
    sf_dir = _write_tables(spark, tmp_path, orders=orders)
    got = {r["month"]: r for r in monthly_revenue_growth(spark, sf_dir).collect()}
    assert got["1996-01"]["revenue"] == 150.0
    assert got["1996-01"]["mom_delta"] is None  # first month has no prior
    assert got["1996-02"]["mom_delta"] == 150.0
    assert got["1996-02"]["mom_growth"] == 1.0


def test_cohort_ltv_cumulative_per_user(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import cohort_ltv_curve

    # one cohort of 2 users first seen Mon 2024-01-01; purchases of 10
    # in week 0 and 30 in week 1 → ltv/user 5.0 then 20.0
    mon = datetime(2024, 1, 1, 9)
    rows = [
        _event(1, 1, mon, "view"),
        _event(2, 2, mon, "view"),
        _event(3, 1, mon + timedelta(days=1), "purchase", 10.0),
        _event(4, 2, mon + timedelta(days=8), "purchase", 30.0),
    ]
    sf_dir = _write_tables(spark, tmp_path, events=spark.createDataFrame(rows))
    got = {r["week_offset"]: r for r in cohort_ltv_curve(spark, sf_dir).collect()}
    assert got[0]["cohort_users"] == 2
    assert got[0]["week_revenue"] == 10.0 and got[0]["ltv_per_user"] == 5.0
    assert got[1]["cum_revenue"] == 40.0 and got[1]["ltv_per_user"] == 20.0


def test_pearson_exact_moments(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import pearson_corr_lineitem

    # flag A: y = 2x exactly → r = 1; flag B: constant y → den 0 → NULL
    li = spark.createDataFrame(
        [("A", 1.0, 2.0), ("A", 2.0, 4.0), ("A", 3.0, 6.0),
         ("B", 1.0, 5.0), ("B", 9.0, 5.0)],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    )
    sf_dir = _write_tables(spark, tmp_path, lineitem=li)
    got = {r["l_returnflag"]: r for r in pearson_corr_lineitem(spark, sf_dir).collect()}
    # same IEEE expression recomputed in Python from the exact moments —
    # for y=2x it lands within one ulp of 1 (sqrt rounding), not at 1
    xs, ys = [1.0, 2.0, 3.0], [2.0, 4.0, 6.0]
    n, sx, sy = 3.0, sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    want = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    assert got["A"]["n_rows"] == 3 and got["A"]["price_qty_corr"] == want
    assert abs(got["A"]["price_qty_corr"] - 1.0) < 1e-12
    assert got["B"]["price_qty_corr"] is None


def test_golden_profile_survivorship(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import golden_user_profile

    t = datetime(2024, 1, 1, 12)
    rows = [
        _event(3, 1, t, "signup", 1.0),
        _event(1, 1, t + timedelta(hours=2), "view", 50.0),
        _event(2, 1, t + timedelta(hours=2), "purchase", 9.0),  # same ts:
        # event_id 2 > 1 → purchase is the LAST at the tied timestamp
    ]
    sf_dir = _write_tables(spark, tmp_path, events=spark.createDataFrame(rows))
    row = golden_user_profile(spark, sf_dir).collect()[0]
    assert row["first_event_type"] == "signup"
    assert row["last_event_type"] == "purchase"  # tie broken by event_id
    assert row["peak_value"] == 50.0
    assert row["first_seen"] == "2024-01-01 12:00:00"
    assert row["n_events"] == 3


def test_gapfill_emits_zero_rows_for_missing_days(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import gapfill_daily_events

    rows = [
        _event(1, 1, datetime(2024, 1, 1, 9), "error", 350.0),
        _event(2, 1, datetime(2024, 1, 4, 9), "error", 400.0),
        _event(3, 1, datetime(2024, 1, 1, 9), "view", 10.0),  # below filter
    ]
    sf_dir = _write_tables(spark, tmp_path, events=spark.createDataFrame(rows))
    got = {(r["day"], r["event_type"]): r["n_events"]
           for r in gapfill_daily_events(spark, sf_dir).collect()}
    # spine covers 1..4 for the single surviving type; days 2-3 are zeros
    assert got == {
        ("2024-01-01", "error"): 1,
        ("2024-01-02", "error"): 0,
        ("2024-01-03", "error"): 0,
        ("2024-01-04", "error"): 1,
    }


def test_funnel_first_purchase_after_signup_only(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import funnel_conversion

    t = datetime(2024, 1, 1, 0)
    rows = [
        # user 1: purchase BEFORE signup ignored; first valid at +90min → bin 1
        _event(1, 1, t - timedelta(hours=5), "purchase", 9.0),
        _event(2, 1, t, "signup"),
        _event(3, 1, t + timedelta(minutes=90), "purchase", 5.0),
        _event(4, 1, t + timedelta(hours=50), "purchase", 5.0),  # not first
        # user 2: signup, no purchase → not in any bin
        _event(5, 2, t, "signup"),
        # user 3: purchase exactly at signup ts → delay 0
        _event(6, 3, t, "signup"),
        _event(7, 3, t, "purchase", 1.0),
    ]
    sf_dir = _write_tables(spark, tmp_path, events=spark.createDataFrame(rows))
    got = {r["delay_hours"]: r["n_users"] for r in funnel_conversion(spark, sf_dir).collect()}
    assert got == {0: 1, 1: 1}


def test_grouping_sets_exact_cells(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import grouping_sets_revenue

    orders = spark.createDataFrame(
        [("O", "HI", 10.0), ("O", "LO", 20.0), ("F", "HI", 5.0)],
        "o_orderstatus string, o_orderpriority string, o_totalprice double",
    )
    sf_dir = _write_tables(spark, tmp_path, orders=orders)
    rows = grouping_sets_revenue(spark, sf_dir).collect()
    cells = {
        (r["o_orderstatus"], r["o_orderpriority"], r["g_status"], r["g_priority"]):
        (r["revenue"], r["n_orders"])
        for r in rows
    }
    # exactly (status) + (priority) + grand total — no cross cells
    assert len(rows) == 2 + 2 + 1
    assert cells[("O", None, 0, 1)] == (30.0, 2)
    assert cells[("F", None, 0, 1)] == (5.0, 1)
    assert cells[(None, "HI", 1, 0)] == (15.0, 2)
    assert cells[(None, "LO", 1, 0)] == (20.0, 1)
    assert cells[(None, None, 1, 1)] == (35.0, 3)


def test_unpivot_is_pivot_inverse(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import unpivot_part_measures

    part = spark.createDataFrame(
        [(1, 7, 19.5), (2, 3, 4.25)],
        "p_partkey long, p_size int, p_retailprice double",
    )
    sf_dir = _write_tables(spark, tmp_path, part=part)
    got = {(r["p_partkey"], r["metric"]): r["value"]
           for r in unpivot_part_measures(spark, sf_dir).collect()}
    assert got == {
        (1, "p_size"): 7.0, (1, "p_retailprice"): 19.5,
        (2, "p_size"): 3.0, (2, "p_retailprice"): 4.25,
    }


def test_orders_with_lines_sorted_nesting(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import orders_with_lines

    li = spark.createDataFrame(
        [
            (1, 50, 3.0, date(1997, 3, 5)),
            (1, 2, 1.0, date(1997, 3, 9)),
            (1, 9, 2.0, date(1997, 2, 28)),  # outside the ship-month window
            (2, 7, 4.0, date(1997, 3, 15)),
        ],
        "l_orderkey long, l_partkey long, l_quantity double, l_shipdate date",
    )
    orders = spark.createDataFrame(
        [(1, "O"), (2, "F"), (3, "O")],
        "o_orderkey long, o_orderstatus string",
    )
    sf_dir = _write_tables(spark, tmp_path, lineitem=li, orders=orders)
    got = {r["o_orderkey"]: r for r in orders_with_lines(spark, sf_dir).collect()}
    assert got[1]["n_lines"] == 2 and got[1]["total_qty"] == 4.0
    # lexicographically sorted "partkey:quantity" serialization
    assert got[1]["lines"] == "2:1.00,50:3.00"
    assert got[2]["lines"] == "7:4.00"
    assert 3 not in got  # no in-window lineitems → inner join drops it


def test_moving_average_trailing_hour_edges(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import moving_average_events

    t = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        _event(1, 1, t, "purchase", 10.0),
        # exactly 3600 s later: the -3600 trailing bound is INCLUSIVE
        _event(2, 1, t + timedelta(seconds=3600), "purchase", 20.0),
        # 3601 s after the first: first event falls out of the frame
        _event(3, 1, t + timedelta(seconds=3601), "purchase", 40.0),
        _event(4, 1, t, "view", 999.0),  # non-purchase ignored
    ]
    sf_dir = _write_tables(spark, tmp_path, events=spark.createDataFrame(rows))
    got = {r["event_id"]: r for r in moving_average_events(spark, sf_dir).collect()}
    assert got[1]["n_trailing"] == 1 and got[1]["avg_trailing_value"] == 10.0
    assert got[2]["n_trailing"] == 2 and got[2]["avg_trailing_value"] == 15.0
    assert got[3]["n_trailing"] == 2 and got[3]["avg_trailing_value"] == 30.0


def test_train_test_split_content_keyed_and_deterministic(spark, tmp_path):
    import hashlib
    import re as _re

    from vacancy_gpt_etl_pipeline_spark.queries import train_test_split

    texts = [f"doc number {i} body" for i in range(50)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sf_dir = _write_tables(spark, tmp_path, documents=docs)
    got = {r["split"]: r["n_docs"] for r in train_test_split(spark, sf_dir).collect()}
    # independent recomputation of the 13/16 hash gate in plain Python
    want_train = sum(
        1 for t in texts
        if hashlib.md5(_re.sub(r"\s+", " ", t.strip()).lower().encode()).hexdigest()[0] < "d"
    )
    assert got.get("train", 0) == want_train
    assert got.get("train", 0) + got.get("test", 0) == 50


def test_incremental_dedup_drops_history_copies_only(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import incremental_dedup_batch

    # history = doc_id < 250; batch = ids >= 250 plus planted copies of
    # ids < 50 under +900000. All copies must drop; novel batch docs stay.
    docs = spark.createDataFrame(
        [(i, f"unique body {i}") for i in range(300)], "doc_id long, text string"
    )
    sf_dir = _write_tables(spark, tmp_path, documents=docs)
    kept = [r["doc_id"] for r in incremental_dedup_batch(spark, sf_dir).collect()]
    assert kept == list(range(250, 300))  # no 900000+ survivor


def test_text_profile_closed_form_counts(spark, tmp_path):
    """Token/BPE/punct/stopword arithmetic on a hand-counted document,
    independent of the SQL formulation."""
    from vacancy_gpt_etl_pipeline_spark.queries import text_analysis_profile

    text = "the cat, and a dog!"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    sf_dir = _write_tables(spark, tmp_path, documents=docs)
    row = text_analysis_profile(spark, sf_dir).collect()[0]
    # whitespace tokens: the / cat, / and / a / dog!  -> 5
    assert row["n_tokens"] == 5
    # BPE-ish: letter runs (the,cat,and,a,dog)=5 + punct (, !)=2 -> 7
    assert row["n_bpe_tokens"] == 7
    # punctuation chars: ',' and '!' over 19 chars
    assert row["punct_ratio"] == round(2 / len(text), 6)
    # stopwords among lowercase tokens: the, and, a -> 3/5 (cat,/dog!
    # carry punctuation so they never match the stopword list)
    assert row["stopword_ratio"] == round(3 / 5, 6)
    assert row["lang_pred"] is not None and row["fingerprint"] is not None


def test_quality_filter_token_band_edges(spark, tmp_path):
    """The [20, 80] token band is inclusive on both edges; short/long
    docs drop regardless of quality."""
    from vacancy_gpt_etl_pipeline_spark.queries import text_quality_filter

    def doc(n):
        # long-ish words keep chars/token in the quality sweet spot
        return " ".join(f"word{i:04d}" for i in range(n))

    docs = spark.createDataFrame(
        [(19, doc(19)), (20, doc(20)), (80, doc(80)), (81, doc(81))],
        "doc_id long, text string",
    )
    sf_dir = _write_tables(spark, tmp_path, documents=docs)
    kept = sorted(r["doc_id"] for r in text_quality_filter(spark, sf_dir).collect())
    assert kept == [20, 80]
    got = {r["doc_id"]: r["n_tokens"] for r in text_quality_filter(spark, sf_dir).collect()}
    assert got == {20: 20, 80: 80}
