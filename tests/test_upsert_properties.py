"""Algebraic properties of the keyed upsert (S11)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_optimization_spark.operators.upsert import upsert_fields


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(i, f"v{i}", i * 10) for i in range(20)], "id int, s string, n int"
    ).cache()


def _as_set(df):
    return {(r.id, r.s, r.n) for r in df.collect()}


def test_empty_updates_is_identity(spark, base):
    empty = spark.createDataFrame([], "id int, s string, n int")
    assert _as_set(upsert_fields(base, empty, "id")) == _as_set(base)


def test_idempotent(spark, base):
    ups = spark.createDataFrame([(3, "X", None), (7, None, 99)], "id int, s string, n int")
    once = upsert_fields(base, ups, "id")
    twice = upsert_fields(once, ups, "id")
    assert _as_set(once) == _as_set(twice)


def test_last_writer_wins_composition(spark, base):
    u1 = spark.createDataFrame([(5, "first", None)], "id int, s string, n int")
    u2 = spark.createDataFrame([(5, "second", None)], "id int, s string, n int")
    composed = upsert_fields(upsert_fields(base, u1, "id"), u2, "id")
    row = composed.where("id = 5").first()
    assert row.s == "second"
    assert row.n == 50  # untouched field preserved through both


def test_row_count_invariant(spark, base):
    ups = spark.createDataFrame(
        [(1, "a", None), (99, "ghost", 1), (100, "ghost2", 2)],
        "id int, s string, n int",
    )
    out = upsert_fields(base, ups, "id")
    assert out.count() == base.count()  # upsert never inserts or deletes
