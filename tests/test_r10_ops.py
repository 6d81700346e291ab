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
