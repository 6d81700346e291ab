"""Unit tests for functions.vector (SURVEY §2.8 F1-F6) against numpy."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_optimization_spark.functions import vector as V

VECS = [
    ([1.0, 2.0, 2.0], [0.0, 3.0, 4.0]),
    ([0.5, -0.5, 0.25], [1.0, 1.0, 1.0]),
    ([0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),  # zero vector edge case
]


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(
        [(a, b) for a, b in VECS], "a array<float>, b array<float>"
    )


def test_l2_norm_and_dot(pairs_df):
    rows = pairs_df.select(
        V.l2_norm("a").alias("na"), V.dot("a", "b").alias("d")
    ).collect()
    for row, (a, b) in zip(rows, VECS):
        assert row.na == pytest.approx(np.linalg.norm(a), rel=1e-9)
        assert row.d == pytest.approx(float(np.dot(a, b)), rel=1e-9)


def test_l2_normalize_unit_and_zero_safe(pairs_df):
    rows = pairs_df.select(V.l2_normalize("a").alias("u")).collect()
    assert np.linalg.norm(rows[0].u) == pytest.approx(1.0, abs=1e-9)
    assert rows[2].u == [0.0, 0.0, 0.0]  # zero vector passes through


def test_distances_match_numpy(pairs_df):
    rows = pairs_df.select(
        V.euclidean("a", "b").alias("e"),
        V.manhattan("a", "b").alias("m"),
        V.cosine_similarity("a", "b").alias("c"),
    ).collect()
    for row, (a, b) in zip(rows, VECS):
        a_, b_ = np.array(a), np.array(b)
        assert row.e == pytest.approx(float(np.linalg.norm(a_ - b_)), rel=1e-9)
        assert row.m == pytest.approx(float(np.abs(a_ - b_).sum()), rel=1e-9)
        na, nb = np.linalg.norm(a_), np.linalg.norm(b_)
        if na == 0 or nb == 0:
            assert row.c is None  # zero-norm → NULL, not NaN
        else:
            assert row.c == pytest.approx(float(a_ @ b_ / (na * nb)), rel=1e-9)


def test_sq_euclidean_rank_equivalent(pairs_df):
    rows = pairs_df.select(
        V.euclidean("a", "b").alias("e"), V.sq_euclidean("a", "b").alias("s")
    ).collect()
    for row in rows:
        assert row.s == pytest.approx(row.e**2, rel=1e-9)


def test_parse_vector_roundtrip(spark):
    df = spark.createDataFrame(
        [("[0.1, -2.5, 3]",), ("[]",), ("[1.5]",)], "s string"
    )
    rows = df.select(V.parse_vector("s").alias("v")).collect()
    assert rows[0].v == pytest.approx([0.1, -2.5, 3.0])
    assert rows[1].v is None
    assert rows[2].v == [1.5]
    # roundtrip through vector_to_string
    back = (
        df.select(V.parse_vector("s").alias("v"))
        .where(F.col("v").isNotNull())
        .select(V.parse_vector(V.vector_to_string("v")).alias("v2"))
        .collect()
    )
    assert back[0].v2 == pytest.approx([0.1, -2.5, 3.0])


def test_distance_dispatch_rejects_unknown():
    with pytest.raises(ValueError, match="unknown metric"):
        V.distance("a", "b", "chebyshev")
