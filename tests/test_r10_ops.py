"""Round-10 operator tests: the mechanized at-scale routes (VERDICT r9
items 3-4) and the r10 query additions."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as m


def _planted_clusters(spark, n_clusters=4, per=12, dim=6, scale=100.0):
    """Well-separated planted clusters: cluster c sits at scale·e_c with
    deterministic small offsets, so every vector's true 1-NN is inside
    its own cluster and any sane quantizer isolates the clusters —
    the regime where the per-IVF-cell route must EQUAL the exact
    pair join."""
    rows = []
    vid = 0
    for c in range(n_clusters):
        for i in range(per):
            v = [0.0] * dim
            v[c % dim] = scale
            # deterministic jitter, distinct per row, < cluster gap
            v[(c + 1) % dim] = 0.25 * ((i * 7 + c * 3) % 11)
            v[(c + 2) % dim] = 0.125 * ((i * 5 + c) % 13)
            # a couple of mislabeled rows per cluster keep the
            # confusion export non-trivial
            label = c if i % 6 else (c + 1) % n_clusters
            rows.append((vid, label, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, schema="vec_id long, label int, embedding array<float>"
    )


def test_loo_knn_cell_route_equals_pair_join_multicell(spark, monkeypatch):
    """VERDICT r9 item 3 pin: beyond the broadcast limit the query routes
    through ann.assign_ivf_cells + per-cell GEMM; on a planted fixture
    whose clusters the quantizer separates, that route must EXACTLY
    equal the declarative corpus² pair join (which survives only as
    this oracle)."""
    emb = _planted_clusters(spark)
    n = emb.count()
    # force a genuinely multi-cell run: 12-row target -> 4 cells
    monkeypatch.setattr(m, "_LOO_KNN_CELL_TARGET", 12)
    cell_nn = {
        r.i: (r.true_label, r.pred_label)
        for r in m._loo_knn_ivf_cells(spark, emb, n).collect()
    }
    pair_nn = {
        r.i: (r.true_label, r.pred_label)
        for r in m._loo_knn_pair_join(emb).collect()
    }
    assert len(cell_nn) == n  # no singleton-cell drops on this fixture
    assert cell_nn == pair_nn


def test_loo_knn_dispatch_routes_to_cells_beyond_limit(spark, monkeypatch):
    """The query itself (not just the helper) must take the cell route
    beyond _LOO_KNN_BROADCAST_LIMIT — and, with the corpus smaller than
    one cell target, that route degenerates to one exact global cell,
    so the export must equal the broadcast-kernel path bit-for-bit."""
    fast = sorted(
        tuple(r)
        for r in m.queries()["emb_loo_knn_accuracy"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    )
    monkeypatch.setattr(m, "_LOO_KNN_BROADCAST_LIMIT", 0)
    routed = sorted(
        tuple(r)
        for r in m.queries()["emb_loo_knn_accuracy"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    )
    assert fast == routed


def test_emb_label_cap_engages_deterministically(spark, monkeypatch):
    """VERDICT r9 item 4 pin: labels beyond _EMB_PAIR_LABEL_CAP are
    audited over a deterministic hash-ranked sample of exactly CAP
    rows; labels at-or-under the cap pass through untouched. The
    selection must be identical across runs (it is mirrored verbatim
    in the DuckDB oracles)."""
    rows = [(i, 0, [float(i % 7), 1.0]) for i in range(100)] + [
        (1000 + i, 1, [50.0 + (i % 5), 2.0]) for i in range(40)
    ]
    emb = spark.createDataFrame(
        rows, schema="vec_id long, label int, embedding array<float>"
    )
    monkeypatch.setattr(m, "_EMB_PAIR_LABEL_CAP", 64)
    got1 = sorted(
        (r.label, r.vec_id) for r in m._emb_label_capped(emb).collect()
    )
    got2 = sorted(
        (r.label, r.vec_id) for r in m._emb_label_capped(emb).collect()
    )
    assert got1 == got2  # deterministic
    by_label = {}
    for lab, vid in got1:
        by_label.setdefault(lab, []).append(vid)
    assert len(by_label[0]) == 64  # capped exactly
    assert sorted(by_label[1]) == [1000 + i for i in range(40)]  # untouched
    # the sample is the hash-ranked prefix, not a head/tail slice
    assert sorted(by_label[0]) != list(range(64))


def test_emb_label_cap_matches_duckdb_mirror(spark):
    """The Spark cap helper and the oracle CTE must select the SAME
    rows — the property the at-scale value-oracle guarantee rests on."""
    import duckdb

    rows = [(i * 13 + 5, i % 3, [float(i), 0.5]) for i in range(90)]
    emb = spark.createDataFrame(
        rows, schema="vec_id long, label int, embedding array<float>"
    )
    spark_ids = sorted(
        (r.label, r.vec_id) for r in m._emb_label_capped(emb).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ",".join(f"({v}, {l})" for v, l, _ in rows)
        + ") t(vec_id, label)"
    )
    # CAP=1024 never engages at 30 rows/label: equality must hold on
    # the FULL ranking expression, so rank both sides and compare the
    # per-label hash order instead of just membership
    duck = con.execute(
        """
        SELECT label, vec_id,
               row_number() OVER (
                 PARTITION BY label
                 ORDER BY (((CAST(vec_id AS BIGINT) % 2147483647)
                            * 1000003 + 12345)
                           % 2147483647 * 69069 + 1) % 2147483629,
                          vec_id) AS crn
        FROM embeddings ORDER BY label, crn
        """
    ).fetchall()
    from pyspark.sql import Window as W
    from pyspark.sql import functions as SF

    h1 = (
        (SF.col("vec_id") % SF.lit(2147483647)) * SF.lit(1000003)
        + SF.lit(12345)
    ) % SF.lit(2147483647)
    h = (h1 * SF.lit(69069) + SF.lit(1)) % SF.lit(2147483629)
    w = W.partitionBy("label").orderBy(h.asc(), SF.col("vec_id").asc())
    spark_ranked = sorted(
        (r.label, r.vec_id, r.crn)
        for r in emb.withColumn("crn", SF.row_number().over(w))
        .select("label", "vec_id", "crn")
        .collect()
    )
    assert spark_ranked == sorted((l, v, c) for l, v, c in duck)
    assert {(lb, v) for lb, v in spark_ids} == {
        (lb, v) for lb, v, _ in duck
    }


def test_emd_metric_properties(spark):
    """EMD on planted distributions: exact value on a hand-computable
    pair, zero on identical distributions, and the triangle/shift
    identities a metric must satisfy."""
    from vector_search_optimization_spark.operators.distribution import (
        emd_pairs_from_counts,
    )

    # g0: mass at $1.00 (100c); g1: same mass at $3.00 -> EMD = $2 exactly
    # g2: identical to g0 -> EMD(g0,g2) = 0
    # g3: half at $1, half at $3 -> EMD(g0,g3) = $1 exactly
    rows = [
        ("g0", 100, 4),
        ("g1", 300, 4),
        ("g2", 100, 4),
        ("g3", 100, 2),
        ("g3", 300, 2),
    ]
    counts = spark.createDataFrame(
        rows, schema="event_type string, cents long, n long"
    )
    got = {
        (r.grp_a, r.grp_b): r.emd
        for r in emd_pairs_from_counts(counts).collect()
    }
    assert got[("g0", "g1")] == pytest.approx(2.0, abs=1e-12)
    assert got[("g0", "g2")] == 0.0
    assert got[("g0", "g3")] == pytest.approx(1.0, abs=1e-12)
    assert got[("g1", "g3")] == pytest.approx(1.0, abs=1e-12)
    # triangle inequality across the planted triple
    assert got[("g0", "g1")] <= got[("g0", "g3")] + got[("g1", "g3")] + 1e-12


def test_type_emd_query_shape(spark, sf_small):
    rows = m.queries()["evt_type_emd"](spark, sf_small).collect()
    assert len(rows) == 10  # C(5,2) ordered pairs
    for r in rows:
        assert r.type_a < r.type_b
        assert r.emd_dollars >= 0.0
        assert r.n_a > 0 and r.n_b > 0


def test_friedman_identities(spark, sf_small):
    rows = m.queries()["evt_friedman_test"](spark, sf_small).collect()
    k = len(rows)
    assert k == 5
    n = rows[0].n_days
    assert all(r.n_days == n for r in rows)
    # mean ranks average to (k+1)/2 exactly, chi2 >= 0 and equal on rows
    assert sum(r.mean_rank for r in rows) == pytest.approx(
        k * (k + 1) / 2.0, abs=1e-9
    )
    chis = {r.chi2_f for r in rows}
    assert len(chis) == 1
    assert rows[0].chi2_f >= -1e-9


def test_sax_motifs_ranked_and_alphabet(spark, sf_small):
    rows = m.queries()["evt_sax_motifs"](spark, sf_small).collect()
    by_type = {}
    for r in rows:
        assert len(r.motif) == 3 and set(r.motif) <= set("abcd")
        assert r.n_windows >= 1
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        for prev, cur in zip(rs, rs[1:]):
            assert (-prev.n_windows, prev.motif) < (-cur.n_windows, cur.motif)


def test_mattr_bounds_and_exactness(spark, sf_small):
    rows = m.queries()["doc_mattr_diversity"](spark, sf_small).collect()
    assert rows
    for r in rows:
        # a window of W words has between 1 and W distinct words
        assert 0.0 < r.mattr <= 1.0
        assert r.n_windows >= r.n_docs  # every eligible doc has >=1 window
        assert r.sum_distinct <= m._MATTR_WINDOW * r.n_windows
        # exactness: the export IS the single division of its own ints
        assert r.mattr == r.sum_distinct / (m._MATTR_WINDOW * r.n_windows)


def test_mattr_first_occurrence_identity_vs_bruteforce(spark):
    """The one-pass first-occurrence formula must equal the brute-force
    per-window distinct count on a planted repetitive document."""
    text = "a b a c b a d a b c a a e b c d a b c a b c d e f"
    words = text.split()
    W = m._MATTR_WINDOW
    # shrink the window for the fixture via monkeypatching the module
    # constant is NOT possible (the SQL inlines 25), so plant a doc
    # longer than 25 words instead and brute-force at W=25
    words = (words * 3)[:40]
    text = " ".join(words)
    brute = sum(
        len(set(words[s : s + W])) for s in range(0, len(words) - W + 1)
    )
    n_windows = len(words) - W + 1
    df = spark.createDataFrame(
        [(1, "s1", text)], schema="doc_id long, source string, text string"
    )
    import vector_search_optimization_spark.sources.readers as R

    orig = m.load_table
    try:
        m.load_table = lambda _s, _d, name: df  # noqa: ARG005
        rows = m.doc_mattr_diversity(spark, "ignored").collect()
    finally:
        m.load_table = orig
    assert len(rows) == 1
    assert rows[0].n_windows == n_windows
    assert rows[0].sum_distinct == brute
    assert rows[0].mattr == brute / (W * n_windows)


def test_ca_trend_single_row_and_bounds(spark, sf_small):
    rows = m.queries()["orders_priority_trend_ca"](spark, sf_small).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0 < r.n_urgent < r.n_orders
    assert r.n_months >= 2
    assert r.z_ca is not None


def test_ca_trend_detects_planted_trend(spark):
    """A planted monotone-increasing urgent share must yield a large
    positive z; a flat share must yield |z| near 0."""
    import datetime as dt

    def frame(shares):
        rows = []
        k = 0
        for i, p in enumerate(shares):
            n = 200
            for j in range(n):
                pri = "1-URGENT" if j < int(p * n) else "5-LOW"
                rows.append(
                    (
                        k,
                        1,
                        "O",
                        100.0,
                        dt.datetime(2024, 1 + i, 15),
                        pri,
                    )
                )
                k += 1
        return spark.createDataFrame(
            rows,
            schema="o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        )

    orig = m.load_table
    try:
        m.load_table = lambda _s, _d, name: frame([0.1, 0.3, 0.5, 0.7])
        up = m.orders_priority_trend_ca(spark, "ignored").collect()[0]
        m.load_table = lambda _s, _d, name: frame([0.4, 0.4, 0.4, 0.4])
        flat = m.orders_priority_trend_ca(spark, "ignored").collect()[0]
    finally:
        m.load_table = orig
    assert up.z_ca > 5.0
    assert abs(flat.z_ca) < 1e-6


def test_hill_tail_index_identities(spark, sf_small):
    rows = m.queries()["evt_hill_tail_index"](spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.k == max(10, r.n // 20)
        assert r.k < r.n
        assert r.xk1_cents >= 1
        # gamma is a mean of ln(x/thr) with x >= thr -> non-negative
        assert r.hill_gamma >= 0.0
        if r.hill_gamma > 0:
            assert r.tail_alpha == 1.0 / r.hill_gamma


def test_hill_on_planted_pareto(spark):
    """On exact Pareto(alpha=2) quantile values the Hill estimate must
    land near gamma = 0.5."""
    import math

    n = 4000
    rows = []
    for i in range(n):
        u = (i + 0.5) / n
        v = round(100.0 * (1.0 - u) ** -0.5, 2)  # Pareto(2) quantiles
        rows.append((i, i % 7, "P", None, v))
    df = spark.createDataFrame(
        rows,
        schema="event_id long, user_id long, event_type string,"
        " ts timestamp, value double",
    )
    orig = m.load_table
    try:
        m.load_table = lambda _s, _d, name: df
        got = m.evt_hill_tail_index(spark, "ignored").collect()
    finally:
        m.load_table = orig
    assert len(got) == 1
    assert got[0].hill_gamma == pytest.approx(0.5, rel=0.15)


def test_haar_energy_identities(spark, sf_small):
    rows = m.queries()["evt_haar_energy"](spark, sf_small).collect()
    by_type = {}
    for r in rows:
        assert r.scale in (2, 4, 8)
        assert r.energy >= 0.0
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        shares = [r.energy_share for r in rs if r.energy_share is not None]
        if shares:
            assert sum(shares) == pytest.approx(1.0, abs=1e-12)
        # block counts halve (floor) as the width doubles
        byw = {r.scale: r.n_blocks for r in rs}
        if 2 in byw and 4 in byw:
            assert byw[4] <= byw[2] // 2 + 1


def test_haar_energy_on_planted_alternation(spark):
    """A pure ±1-alternating daily series is ALL scale-2 detail: every
    width-2 block differs by a constant, wider blocks cancel."""
    import datetime as dt

    rows = []
    for i in range(64):
        rows.append(
            (
                i,
                1,
                "A",
                dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
                100.0 if i % 2 == 0 else 50.0,
            )
        )
    df = spark.createDataFrame(
        rows,
        schema="event_id long, user_id long, event_type string,"
        " ts timestamp, value double",
    )
    orig = m.load_table
    try:
        m.load_table = lambda _s, _d, name: df
        got = {
            r.scale: (r.energy, r.energy_share)
            for r in m.evt_haar_energy(spark, "ignored").collect()
        }
    finally:
        m.load_table = orig
    assert got[2][1] == pytest.approx(1.0, abs=1e-12)
    assert got[4][0] == 0.0 and got[8][0] == 0.0
    # scale-2 detail per block is exactly (10000 - 5000) cents
    assert got[2][0] == 32 * (5000.0**2)


def test_length_ks_bounds_and_argmax(spark, sf_small):
    rows = m.queries()["doc_length_ks_drift"](spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.d_ks <= 1.0
        assert r.n_docs >= 1
        assert r.at_n_chars >= 0


def test_length_ks_exact_on_planted_split(spark):
    """Two disjoint length distributions must give D = 1 at the split
    point; identical distributions must give D = 0... except D is vs
    the REST, so plant 3 sources: a low block, a high block, and check
    the low one's D against rest exactly."""
    rows = []
    did = 0
    for _ in range(10):
        rows.append((did, "t" * 10, "en", "lo", 10))
        did += 1
    for _ in range(10):
        rows.append((did, "t" * 50, "en", "hi", 50))
        did += 1
    df = spark.createDataFrame(
        rows,
        schema="doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    orig = m.load_table
    try:
        m.load_table = lambda _s, _d, name: df
        got = {
            r.source: (r.d_ks, r.at_n_chars)
            for r in m.doc_length_ks_drift(spark, "ignored").collect()
        }
    finally:
        m.load_table = orig
    # lo's CDF is 1 at x=10 while rest (hi) is 0 -> D = 1 attained at 10
    assert got["lo"] == (1.0, 10)
    assert got["hi"] == (1.0, 10)


def test_rqa_identities(spark, sf_small):
    rows = m.queries()["evt_rqa_determinism"](spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.eps_cents >= 1
        max_pairs = r.n_days * (r.n_days - 1) // 2
        assert 0 <= r.n_rec <= max_pairs
        assert 0.0 <= r.rr <= 1.0
        if r.n_rec > 0:
            assert 0.0 <= r.det <= 1.0
            assert 1 <= r.l_max <= r.n_days - 1
        assert r.rr == 2.0 * r.n_rec / (r.n_days * (r.n_days - 1))


def test_rqa_on_planted_periodic_series(spark):
    """An exactly period-3 series recurs ONLY at offsets that are
    multiples of 3 (with the IQR/5 epsilon separating the levels), and
    every recurrent point then lies on a full-length diagonal line:
    DET = 1 and L_max = n − 3 exactly."""
    import datetime as dt

    n = 12
    vals = [0.10, 0.20, 0.30] * (n // 3)
    rows = [
        (
            i,
            1,
            "P",
            dt.datetime(2024, 5, 1) + dt.timedelta(days=i),
            vals[i],
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        schema="event_id long, user_id long, event_type string,"
        " ts timestamp, value double",
    )
    orig = m.load_table
    try:
        m.load_table = lambda _s, _d, name: df
        got = m.evt_rqa_determinism(spark, "ignored").collect()
    finally:
        m.load_table = orig
    assert len(got) == 1
    r = got[0]
    # IQR = 30 - 10 = 20 cents -> eps = 4: only equal values recur
    assert r.eps_cents == 4
    # offsets 3,6,9 with 9,6,3 pairs -> 18 recurrent pairs, all in runs
    assert r.n_rec == 18
    assert r.det == 1.0
    assert r.l_max == n - 3  # the offset-3 diagonal has n-3 points
    assert r.rr == 2.0 * 18 / (n * (n - 1))


def test_permutation_entropy_identities(spark, sf_small):
    import math

    rows = m.queries()["evt_permutation_entropy"](spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_patterns <= 6
        assert 0.0 <= r.perm_entropy <= math.log(6) + 1e-9
        assert r.perm_entropy_norm == r.perm_entropy / math.log(6.0)
        # entropy is bounded by ln(observed patterns)
        assert r.perm_entropy <= math.log(r.n_patterns) + 1e-6


def test_permutation_entropy_on_planted_series(spark):
    """A strictly monotone series uses ONE ordinal pattern (H = 0); a
    period-3 zigzag built from two alternating patterns at equal
    frequency gives H = ln 2 exactly (before the 6dp round)."""
    import datetime as dt
    import math

    def frame(vals):
        return spark.createDataFrame(
            [
                (
                    i,
                    1,
                    "S",
                    dt.datetime(2024, 6, 1) + dt.timedelta(days=i),
                    v,
                )
                for i, v in enumerate(vals)
            ],
            schema="event_id long, user_id long, event_type string,"
            " ts timestamp, value double",
        )

    orig = m.load_table
    try:
        m.load_table = lambda _s, _d, name: frame(
            [float(i + 1) for i in range(20)]
        )
        mono = m.evt_permutation_entropy(spark, "ignored").collect()[0]
        # up-up-down cycle: triples rotate between exactly 3 patterns;
        # use 1,2,3,1,2,3... -> triples (1,2,3),(2,3,1),(3,1,2): 3
        # patterns equally often over a multiple-of-3 window count
        m.load_table = lambda _s, _d, name: frame(
            [1.0, 2.0, 3.0] * 4 + [1.0, 2.0]
        )  # 14 days -> 12 triples, 4 of each pattern
        zig = m.evt_permutation_entropy(spark, "ignored").collect()[0]
    finally:
        m.load_table = orig
    assert mono.n_patterns == 1 and mono.perm_entropy == 0.0
    assert zig.n_patterns == 3 and zig.n_windows == 12
    assert zig.perm_entropy == pytest.approx(math.log(3.0), abs=1e-6)


def test_loo_knn_singleton_cells_dropped_not_selfmatched(spark, monkeypatch):
    """A 1-row cell has no non-self LOO reference: the documented audit
    contract drops it rather than letting the GEMM argmin degenerate to
    a self-match (which would inflate accuracy)."""
    # two tight clusters + one far outlier that gets its own cell
    rows = [
        (0, 0, [0.0, 0.0]),
        (1, 0, [0.0, 1.0]),
        (2, 1, [100.0, 0.0]),
        (3, 1, [100.0, 1.0]),
        (4, 2, [0.0, 10000.0]),
    ]
    emb = spark.createDataFrame(
        rows, schema="vec_id long, label int, embedding array<float>"
    )
    monkeypatch.setattr(m, "_LOO_KNN_CELL_TARGET", 2)
    nn = m._loo_knn_ivf_cells(spark, emb, emb.count()).collect()
    # the outlier lands alone in its cell and is dropped; the four
    # clustered rows are all audited and within-cluster correct
    assert sorted((r.i, r.true_label, r.pred_label) for r in nn) == [
        (0, 0, 0),
        (1, 0, 0),
        (2, 1, 1),
        (3, 1, 1),
    ]
