"""Heavy-hitter sketch-then-verify (operators/heavy_hitters.py).

The contract under test: the output is the EXACT set of keys with
``count > phi * total`` — independent of partition layout — even though
the intermediate candidate set is layout-dependent; and the candidate
stage is bounded (<= 1/phi keys per batch) so nothing corpus-sized is
ever shuffled or broadcast.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_optimization_spark.operators import heavy_hitters as HH


def _planted(spark, n_noise=3000, n_hot=400, parts=7):
    """A stream with one true hitter ('hot', ~12%) spread EVENLY over
    all partitions (the adversarial layout for per-partition counting:
    no partition is hot-dominated) plus near-uniform noise keys."""
    rows = [(i, f"k{i % 97}") for i in range(n_noise)]
    step = (n_noise + n_hot) // n_hot
    rows += [(n_noise + i, "hot") for i in range(n_hot)]
    df = spark.createDataFrame(rows, "i long, key string")
    # round-robin-ish deterministic spread: partition by i
    return df.repartition(parts, "i").select("key")


def _exact(df, phi):
    tot = df.count()
    return {
        r["key"]: r["n"]
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > phi * tot)
        .collect()
    }


@pytest.mark.parametrize("phi", [0.05, 0.02])
def test_matches_exact_formulation(spark, phi):
    df = _planted(spark)
    got = {
        r["key"]: (r["n"], r["total"], r["share"])
        for r in HH.heavy_hitters(df, "key", phi).collect()
    }
    want = _exact(df, phi)
    assert set(got) == set(want)
    total = df.count()
    for k, (n, tot, share) in got.items():
        assert n == want[k] and tot == total and share == n / total


def test_partition_layout_invariance(spark):
    """Same data, three different layouts -> identical output rows."""
    base = _planted(spark)
    outs = []
    for df in (base, base.repartition(1), base.repartition(13, "key")):
        outs.append(
            tuple(map(tuple, HH.heavy_hitters(df, "key", 0.05).collect()))
        )
    assert outs[0] == outs[1] == outs[2]
    assert any(r[0] == "hot" for r in outs[0])


def test_candidate_stage_is_bounded_and_complete(spark):
    df = _planted(spark)
    phi = 0.05
    cands = [r["key"] for r in HH.candidate_keys(df, "key", phi).collect()]
    # complete: the true hitter is guaranteed a candidate
    assert "hot" in cands
    # bounded: far below the 97-key noise vocabulary — per batch at most
    # 1/phi=20 keys can qualify, and near-uniform noise keys mostly don't
    assert len(cands) <= 98


def test_no_hitters_when_uniform(spark):
    df = spark.createDataFrame(
        [(i, f"k{i % 50}") for i in range(2000)], "i long, key string"
    ).select("key")
    assert HH.heavy_hitters(df, "key", 0.05).count() == 0
