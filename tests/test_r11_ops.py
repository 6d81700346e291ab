"""Round-11 operator tests: planted-fixture pins for the six r11 query
additions (tail dependence, price index, chain ladder, containment,
Weibull fit, Adamic-Adar)."""

from __future__ import annotations

import datetime
import math

import __spark_entry__ as m

_EV_SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _daily_events(spark, tmp_path, series):
    """series: dict type -> list of per-day values (day 0 = 2024-03-01,
    one event per day per type)."""
    rows = []
    eid = 0
    for t, vals in series.items():
        for d, v in enumerate(vals):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 3, 1)
                    + datetime.timedelta(days=d, hours=1),
                    t,
                    float(v),
                )
            )
            eid += 1
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_tail_dependence_comonotone_pair_is_one(spark, tmp_path):
    """Two strictly comonotone daily series exceed their own 0.8
    thresholds on exactly the same days, so λ_U = 1; the threshold
    sits at the exact type-1 position ceil(0.8·20) = 16."""
    sf = _daily_events(
        spark,
        tmp_path,
        {"a": [d for d in range(20)], "b": [2 * d for d in range(20)]},
    )
    rows = m.queries()["evt_tail_dependence"](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.t1, r.t2, r.n_days) == ("a", "b", 20)
    # 16th smallest of {0..19}·100 cents is day 15
    assert r.thr1_cents == 15 * 100
    assert r.thr2_cents == 30 * 100
    assert r.n_exc1 == r.n_exc2 == r.n_joint == 4
    assert r.lambda_u == 1.0


def test_tail_dependence_antimonotone_pair_is_zero(spark, tmp_path):
    """Anti-monotone series never spike together: n_joint = 0, λ_U = 0
    (the exceedance counts themselves stay 4 on each side)."""
    sf = _daily_events(
        spark,
        tmp_path,
        {"a": [d for d in range(20)], "b": [19 - d for d in range(20)]},
    )
    r = m.queries()["evt_tail_dependence"](spark, sf).collect()[0]
    assert r.n_exc1 == r.n_exc2 == 4
    assert r.n_joint == 0
    assert r.lambda_u == 0.0


def test_price_index_doubling_month(spark, tmp_path):
    """Five parts, qty 1, every price exactly doubled in month 2:
    all three indices read exactly 2.0 (and 1.0 in the base month —
    the matched basket is the full part set both months)."""
    rows = []
    for p in range(1, 6):
        price = 100.0 + 10.0 * p
        rows.append((p, 1.0, price, 0.0, datetime.datetime(2024, 1, 15)))
        rows.append((p, 1.0, 2 * price, 0.0, datetime.datetime(2024, 2, 15)))
    spark.createDataFrame(
        rows,
        "l_partkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = m.queries()["part_price_index"](spark, str(tmp_path)).collect()
    assert [r.n_parts_matched for r in out] == [5, 5]
    assert [r.laspeyres for r in out] == [1.0, 2.0]
    assert [r.paasche for r in out] == [1.0, 2.0]
    assert [r.fisher for r in out] == [1.0, 2.0]


def test_chain_ladder_exact_factors_and_eligibility(spark, tmp_path):
    """One cohort with cumulative 100 → 150 → 175: f₀ = 1.5,
    f₁ = 7/6, to_ultimate(k=0) = 1.75 exactly.  A second cohort born
    in the LAST month (max_age 0) is never observed at age 1, so the
    run-off eligibility rule must keep every factor unchanged."""
    rows = [
        (1, 100.0, datetime.datetime(2024, 1, 10)),
        (1, 50.0, datetime.datetime(2024, 2, 10)),
        (1, 25.0, datetime.datetime(2024, 3, 10)),
        (2, 999.0, datetime.datetime(2024, 3, 11)),
    ]
    spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = m.queries()["orders_chain_ladder"](spark, str(tmp_path)).collect()
    assert [r.k for r in out] == [0, 1]
    assert [r.n_cohorts for r in out] == [1, 1]
    assert out[0].den_cents == 10000 and out[0].num_cents == 15000
    assert out[0].factor == 1.5
    assert out[1].factor == 17500 / 15000
    assert out[0].to_ultimate == 1.75
    assert out[1].to_ultimate == round(17500 / 15000, 6)


def test_containment_subset_doc_scores_one(spark, tmp_path):
    """Doc 1's full shingle set sits inside doc 2 (an embedded quote):
    containment exactly 1.0 with doc 1 as the smaller side; the
    unrelated doc 3 shares no shingle and must produce no pair."""
    rows = [
        (1, "a b c d e f", "en", "s1", 11),
        (2, "x y a b c d e f z w", "en", "s1", 19),
        (3, "p q r s t u", "en", "s2", 11),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = m.queries()["doc_shingle_containment"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert (r.size_a, r.size_b, r.n_shared) == (4, 8, 4)
    assert r.containment == 1.0


def test_weibull_recovery_on_planted_sample(spark, tmp_path):
    """Delays drawn from Weibull(shape=2, scale=30) by inverse CDF on
    the (i−0.5)/n grid, rounded to integer days: the median-rank
    regression must recover the shape within the integer-rounding
    bias and fit nearly perfectly."""
    n = 2000
    orders, lines = [], []
    for i in range(1, n + 1):
        u = (i - 0.5) / n
        t = max(1, round(30.0 * (-math.log(1.0 - u)) ** 0.5))
        orders.append(
            (i, "1-URGENT", datetime.datetime(2024, 1, 1))
        )
        lines.append(
            (i, 1, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=t))
        )
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderpriority string, "
        "o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(
        lines, "l_orderkey long, l_linenumber int, l_shipdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = m.queries()["lineitem_weibull_delay"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == n
    assert abs(r.weibull_shape - 2.0) < 0.15
    assert abs(r.weibull_scale_days - 30.0) < 1.5
    assert r.r_squared > 0.97


def test_adamic_adar_planted_wedge(spark, tmp_path):
    """Edges (1,2) and (1,3) (each co-ordered twice — the ≥2 support
    rule), no edge (2,3): the only candidate is (2,3) through hub 1
    with deg(1)=2, so AA = 1/ln 2 exactly (rounded 6dp)."""
    rows = []
    for ok, parts in [
        (101, (1, 2)),
        (102, (1, 2)),
        (103, (1, 3)),
        (104, (1, 3)),
    ]:
        for p in parts:
            rows.append((ok, p))
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = m.queries()["g13_adamic_adar"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.u, r.v, r.n_common) == (2, 3, 1)
    assert r.aa_score == round(1.0 / math.log(2.0), 6)


def test_adamic_adar_excludes_existing_edges(spark, tmp_path):
    """A triangle (1,2),(1,3),(2,3) has wedges everywhere but every
    candidate pair is already an edge — the anti-join must leave the
    prediction set empty."""
    rows = []
    ok = 200
    for pair in [(1, 2), (1, 3), (2, 3)]:
        for _ in range(2):
            rows.extend([(ok, pair[0]), (ok, pair[1])])
            ok += 1
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = m.queries()["g13_adamic_adar"](spark, str(tmp_path)).collect()
    assert out == []
