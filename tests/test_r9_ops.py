"""r9 additions: funnel conversion, DAU drawdown, turning-point and
record-count randomness tests — unit semantics beyond the automatic
oracle-parity coverage."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as m


def test_funnel_steps_monotone_and_bounded(spark, sf_small):
    rows = m.queries()["evt_funnel_conversion"](spark, sf_small).collect()
    assert [r.step for r in rows] == [1, 2, 3]
    assert [r.step_name for r in rows] == ["view", "click", "purchase"]
    # strict-order funnel: each step is a subset of the previous
    assert rows[0].n_users >= rows[1].n_users >= rows[2].n_users
    for r in rows:
        assert r.n_users <= r.n_all
        if r.conv_vs_prev is not None:
            assert 0.0 <= r.conv_vs_prev <= 1.0
        if r.conv_vs_all is not None:
            assert 0.0 <= r.conv_vs_all <= 1.0
        if r.step == 1:
            assert r.median_gap_s is None and r.p90_gap_s is None
        elif r.n_users > 0:
            # strict 'after' on whole seconds: every gap >= 1
            assert r.median_gap_s >= 1.0
            assert r.p90_gap_s >= r.median_gap_s


def test_funnel_step2_matches_manual_first_touch(spark, sf_small):
    """Recompute step-2 count by hand from the raw events: users whose
    first click lands strictly after their first view."""
    from pyspark.sql import functions as F

    from vector_search_optimization_spark.sources import load_table

    e = load_table(spark, sf_small, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("t")
    )
    clicks: dict[int, list[int]] = {}
    views: dict[int, int] = {}
    for r in e.collect():
        if r.event_type == "view":
            views[r.user_id] = min(views.get(r.user_id, r.t), r.t)
        elif r.event_type == "click":
            clicks.setdefault(r.user_id, []).append(r.t)
    expected = sum(
        1
        for u, t1 in views.items()
        if any(t > t1 for t in clicks.get(u, []))
    )
    rows = m.queries()["evt_funnel_conversion"](spark, sf_small).collect()
    assert rows[1].n_users == expected


def test_dau_drawdown_bounds(spark, sf_small):
    rows = m.queries()["evt_dau_drawdown"](spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0 <= r.max_drawdown <= r.peak_dau
        assert r.longest_underwater_days <= r.n_days
        if r.max_drawdown_pct is not None:
            assert 0.0 <= r.max_drawdown_pct <= 1.0
        if r.max_drawdown > 0:
            # an underwater day exists, so the longest spell is >= 1
            assert r.longest_underwater_days >= 1


def test_turning_points_bounds_and_expectation(spark, sf_small):
    rows = m.queries()["evt_turning_points"](spark, sf_small).collect()
    assert rows
    for r in rows:
        # only interior days can turn
        assert 0 <= r.n_turning <= max(r.n_days - 2, 0)
        if r.n_days >= 3:
            assert r.expected_turning == pytest.approx(
                2.0 * (r.n_days - 2) / 3.0
            )


def test_records_expected_is_harmonic_number(spark, sf_small):
    rows = m.queries()["evt_records_test"](spark, sf_small).collect()
    assert rows
    for r in rows:
        hn = sum(1.0 / k for k in range(1, r.n + 1))
        assert r.expected_records == pytest.approx(round(hn, 6), abs=2e-6)
        # the first observation is always both an upper and lower record
        assert r.n_upper_records >= 1
        assert r.n_lower_records >= 1
        assert r.n_upper_records <= r.n
        assert r.n_lower_records <= r.n


def test_records_on_strictly_increasing_series(spark, tmp_path):
    """A strictly increasing value series: every one of the n rows is
    an upper record and only the first is a lower record."""
    import datetime

    rows = [
        (
            i,
            datetime.datetime(2024, 3, 1) + datetime.timedelta(hours=i),
            "a",
            1.0 + i,
        )
        for i in range(50)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = m.queries()["evt_records_test"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n == 50
    assert r.n_upper_records == 50
    assert r.n_lower_records == 1
    expected_z = (50 - r.expected_records) / math.sqrt(
        sum(1.0 / k for k in range(1, 51))
        - sum(1.0 / (k * k) for k in range(1, 51))
    )
    assert r.z_upper == pytest.approx(expected_z, abs=1e-4)


def test_granger_bounds_and_row_count(spark, sf_small):
    rows = m.queries()["evt_granger_lag1"](spark, sf_small).collect()
    # 5 event types -> 20 ordered pairs
    assert len(rows) == 20
    for r in rows:
        if r.f_stat is not None:
            assert r.f_stat >= -1e-9  # RSS_r >= RSS_u up to fp noise
        if r.rss_gain_share is not None:
            assert -1e-9 <= r.rss_gain_share < 1.0


def test_granger_collinear_pair_is_guarded(spark, tmp_path):
    """Two types with IDENTICAL daily series: x_lag == y_lag exactly,
    the unrestricted design matrix is singular (det=0) and the guard
    must export NULLs instead of garbage."""
    import datetime

    rows = []
    eid = 0
    for d in range(20):
        ts = datetime.datetime(2024, 5, 1, 6) + datetime.timedelta(days=d)
        v = float(10 + (d * 7) % 13)
        for t in ("a", "b"):
            rows.append((eid, ts, t, v))
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = m.queries()["evt_granger_lag1"](spark, str(tmp_path)).collect()
    assert len(got) == 2
    for r in got:
        assert r.beta_xlag is None
        assert r.f_stat is None


def test_stylometry_identical_sources_have_zero_delta(spark, tmp_path):
    """Two sources with identical token distributions sit at Delta=0;
    a third, different source sits strictly above."""
    docs = []
    for i in range(10):
        docs.append((i, "alpha beta gamma delta alpha beta", "en", "s1", 30))
        docs.append((100 + i, "alpha beta gamma delta alpha beta", "en", "s2", 30))
        docs.append((200 + i, "omega omega psi chi phi omega", "en", "s3", 30))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        (r.src_a, r.src_b): r.delta_burrows
        for r in m.queries()["source_stylometry_delta"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[("s1", "s2")] == pytest.approx(0.0, abs=1e-9)
    assert got[("s1", "s3")] > 0.1
    assert got[("s1", "s3")] == pytest.approx(got[("s2", "s3")], abs=1e-9)


def test_stylometry_delta_nonnegative_and_bounded_markers(spark, sf_small):
    rows = m.queries()["source_stylometry_delta"](spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.delta_burrows >= 0
        assert 1 <= r.n_markers <= 30


def test_cohort_ltv_monotone_and_identities(spark, sf_small):
    rows = m.queries()["orders_cohort_ltv"](spark, sf_small).collect()
    assert rows
    by_cohort: dict[int, list] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_month, []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r.k)
        # the cohort's defining month is always a curve point
        assert rs[0].k == 0
        cum = 0
        for r in rs:
            assert r.k >= 0
            cum += r.rev_cents
            assert r.cum_rev_cents == cum
            assert r.ltv_cents_per_customer == pytest.approx(
                cum / r.n_customers
            )


def test_pot_bounds(spark, sf_small):
    rows = m.queries()["evt_peak_over_threshold"](spark, sf_small).collect()
    assert rows
    for r in rows:
        # strictly-above-rank-k exceedances: at most floor(n/10)
        assert 0 <= r.n_exceed <= r.n_days // 10
        if r.gpd_xi is not None:
            # MoM xi = 0.5(1 - m^2/s2) < 0.5 always
            assert r.gpd_xi < 0.5
            assert r.gpd_sigma > 0
        if r.return_level_90d is not None:
            assert r.return_level_90d >= r.threshold_cents - 1e-6


def test_segment_migration_partition_identities(spark, sf_small):
    from vector_search_optimization_spark.sources import load_table

    rows = m.queries()["customer_segment_migration"](
        spark, sf_small
    ).collect()
    assert rows
    total = sum(r.n_customers for r in rows)
    n_cust = (
        load_table(spark, sf_small, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert total == n_cust
    by_from: dict[int, float] = {}
    for r in rows:
        assert 0 <= r.seg_from <= 4 and 0 <= r.seg_to <= 4
        # (0, 0) is impossible: every counted customer ordered somewhere
        assert (r.seg_from, r.seg_to) != (0, 0)
        by_from[r.seg_from] = by_from.get(r.seg_from, 0.0) + r.origin_share
    for s, tot in by_from.items():
        assert tot == pytest.approx(1.0, abs=1e-9)


def test_vocab_jaccard_bounds(spark, sf_small):
    rows = m.queries()["doc_source_vocab_jaccard"](spark, sf_small).collect()
    # 20 sources -> 190 unordered pairs
    assert len(rows) == 190
    for r in rows:
        assert r.n_shared <= min(r.vocab_a, r.vocab_b)
        assert 0.0 <= r.jaccard <= r.containment <= 1.0


def test_yule_k_identities(spark, sf_small):
    rows = m.queries()["doc_yule_k"](spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.vocab <= r.n_tokens
        # K = 1e4 * D * (N-1)/N exactly
        assert r.yule_k == pytest.approx(
            1e4 * r.simpson_d * (r.n_tokens - 1) / r.n_tokens, rel=1e-12
        )
        assert 0.0 <= r.simpson_d <= 1.0
        assert 0.0 < r.herdan_c <= 1.0


def test_abc_xyz_partition_and_shares(spark, sf_small):
    from vector_search_optimization_spark.sources import load_table

    rows = m.queries()["lineitem_abc_xyz"](spark, sf_small).collect()
    assert rows
    n_parts_total = (
        load_table(spark, sf_small, "lineitem")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r.n_parts for r in rows) == n_parts_total
    assert sum(r.rev_share for r in rows) == pytest.approx(1.0, abs=1e-9)
    # the A band holds at most 80% of revenue by construction; with
    # the closing part it can only undershoot, never overshoot
    share_a = sum(r.rev_share for r in rows if r.abc == "A")
    assert share_a <= 0.8 + 1e-9


def test_session_paths_ranked_and_bounded(spark, sf_small):
    rows = m.queries()["evt_session_paths"](spark, sf_small).collect()
    assert 1 <= len(rows) <= 20
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    prev = None
    share = 0.0
    for r in rows:
        if prev is not None:
            # count desc, path asc tie-break: prev sorts strictly before r
            assert (-prev.n_sessions, prev.path) < (-r.n_sessions, r.path)
        assert r.n_users <= r.n_sessions
        assert 0.0 < r.session_share <= 1.0
        # every path step is a real event type
        for step in r.path.split(">"):
            assert step in {"view", "click", "purchase", "signup", "error"}
        share += r.session_share
        prev = r
    assert share <= 1.0 + 1e-9


def test_icc_day_effect_bounds(spark, sf_small):
    rows = m.queries()["evt_icc_day_effect"](spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.n_events > r.n_days > 1
        if r.f_ratio is not None:
            assert r.f_ratio > 0
        if r.icc_day is not None:
            # ICC(1) is bounded by (-1/(kbar-1), 1]; loose sanity band
            assert -1.0 <= r.icc_day <= 1.0


def test_icc_pure_day_effect_is_one(spark, tmp_path):
    """All events on a day share one value, days differ: MSW = 0 so
    ICC -> 1 and F is undefined-large but finite-positive; with 4
    events x 3 distinct-value days the decomposition is exact."""
    import datetime

    rows = []
    eid = 0
    for d, v in enumerate([10.0, 20.0, 40.0]):
        for j in range(4):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 9, 1 + d, 6 + j),
                    "a",
                    v,
                )
            )
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = m.queries()["evt_icc_day_effect"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_events == 12 and r.n_days == 3
    # MSW = 0 -> the f_ratio guard nulls it, ICC = 1 exactly
    assert r.f_ratio is None
    assert r.icc_day == pytest.approx(1.0, abs=1e-9)
