"""Closed-form linear probe (operators/regression.py): exact-integer
Gram determinism, correctness of the solve, and the integer-input gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_optimization_spark.operators import regression as REG


def _df(spark, rows, schema="x1 long, x2 long, y long"):
    return spark.createDataFrame(rows, schema)


def test_recovers_exact_linear_relation(spark):
    rows = [(i, (i * 7) % 13, 3 + 2 * i - ((i * 7) % 13)) for i in range(60)]
    w = REG.fit_linear_probe(_df(spark, rows), ["x1", "x2"], "y")
    assert np.allclose(w, [3.0, 2.0, -1.0], atol=1e-9)


def test_gram_matches_numpy_and_is_partition_invariant(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(a), int(b), int(c))
        for a, b, c in rng.integers(0, 1000, size=(200, 3))
    ]
    df = _df(spark, rows)
    X = np.array([[1, a, b] for a, b, _ in rows], dtype=object)
    y = np.array([c for *_, c in rows], dtype=object)
    A1, b1, n1 = REG.gram_aggregate(df, ["x1", "x2"], "y")
    assert n1 == 200
    assert A1 == (X.T @ X).tolist()
    assert b1 == (X.T @ y).tolist()
    for parts in (1, 13):
        A2, b2, _ = REG.gram_aggregate(
            df.repartition(parts), ["x1", "x2"], "y"
        )
        assert (A2, b2) == (A1, b1)


def test_scoring_is_left_associated_literal_math(spark):
    df = _df(spark, [(10, 3, 0)])
    w = [0.5, 1.25, -2.0]
    got = REG.score_linear_probe(df, ["x1", "x2"], w).collect()[0]["pred"]
    assert got == (0.5 + 1.25 * 10.0) + (-2.0) * 3.0


def test_rejects_float_features(spark):
    df = spark.createDataFrame([(1.0, 2)], "x1 double, y long")
    with pytest.raises(ValueError, match="integer"):
        REG.gram_aggregate(df, ["x1"], "y")


def test_overflow_safe_decimal_sums(spark):
    # products of two ~2^40 values overflow int64 (~2^80) — the
    # decimal(38,0) path must stay exact where long math would ANSI-error
    big = 2**40
    df = _df(spark, [(big, 1, big), (big - 1, 1, big - 1)])
    A, b, _ = REG.gram_aggregate(df, ["x1", "x2"], "y")
    assert A[1][1] == big**2 + (big - 1) ** 2
    assert b[1] == big**2 + (big - 1) ** 2
