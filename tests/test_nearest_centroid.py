"""J7/W4/M12 — nearest-centroid join: UDF path vs declarative oracle vs numpy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_optimization_spark.operators import nearest_centroid as NC
from vector_search_optimization_spark.sources import load_table

METRICS = ["euclidean", "sqeuclidean", "cosine", "manhattan"]


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return load_table(spark, sf_small, "embeddings").cache()


@pytest.fixture(scope="module")
def cents(spark, sf_small):
    from vector_search_optimization_spark.operators import vector_agg as VA

    e = load_table(spark, sf_small, "embeddings")
    return (
        VA.group_vector_mean(e, "label", "embedding")
        .withColumnRenamed("label", "cluster_label")
        .cache()
    )


@pytest.mark.parametrize("metric", METRICS)
def test_udf_matches_crossjoin(emb, cents, metric):
    a = (
        NC.nearest_centroid(emb, cents, vector_col="embedding", metric=metric)
        .select("vec_id", "assigned_label", "assigned_dist")
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    b = (
        NC.nearest_centroid_crossjoin(emb, cents, vector_col="embedding", metric=metric)
        .select("vec_id", "assigned_label", "assigned_dist")
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert (a.assigned_label == b.assigned_label).all()
    assert np.allclose(a.assigned_dist, b.assigned_dist, rtol=1e-9, equal_nan=True)


def test_matches_numpy_argmin(emb, cents):
    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    cdf = cents.toPandas().sort_values("cluster_label")
    mat = np.array(pdf.embedding.tolist(), dtype=np.float64)
    cm = np.array(cdf.centroid.tolist(), dtype=np.float64)
    d = np.sqrt(((mat[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2))
    expected = cdf.cluster_label.values[np.argmin(d, axis=1)]
    got = (
        NC.nearest_centroid(emb, cents, vector_col="embedding")
        .select("vec_id", "assigned_label")
        .toPandas()
        .sort_values("vec_id")
    )
    assert (got.assigned_label.values == expected).all()


def test_tie_breaks_to_lowest_label(spark):
    # two identical centroids → argmin must pick the lower label in BOTH paths
    df = spark.createDataFrame([(1, [1.0, 1.0])], "id long, v array<float>")
    cents = spark.createDataFrame(
        [(7, [0.0, 0.0]), (3, [0.0, 0.0])], "cluster_label int, centroid array<float>"
    )
    for fn in (NC.nearest_centroid, NC.nearest_centroid_crossjoin):
        row = fn(df, cents, vector_col="v").first()
        assert row.assigned_label == 3, fn.__name__


def test_duplicate_rows_survive_crossjoin_path(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (1, [1.0, 0.0])], "id long, v array<float>"
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0])], "cluster_label int, centroid array<float>"
    )
    assert NC.nearest_centroid_crossjoin(df, cents, vector_col="v").count() == 2
