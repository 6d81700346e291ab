"""Outlier-detection suite (SURVEY §2.9 M6-M9).

Reference:
- M6 z-score on distance-to-centroid, z > 3 per cluster
  (main-script1.ipynb:3767 c64; numpy std → ddof=0 → stddev_pop).
- M7 cosine-distance > 95th percentile per cluster
  (nuevo-kmeans-pre.ipynb:636 c29).
- M8 Local Outlier Factor per cluster, n_neighbors = 5%/25% of cluster,
  contamination 0.02/'auto' (main-script1.ipynb:3966 c67,
  analisis-informe.ipynb:2204 c69 — clusters are 85-335 points).
- M9 robust-covariance Mahalanobis > 95th pct per cluster
  (main-script1.ipynb:4140 c70, MinCovDet).

Spark mapping: M6/M7 are pure window/groupBy expressions (distributed,
codegen'd). M8/M9 are per-group numpy kernels via applyInPandas — the
idiomatic "Spark for the big table, local kernel for the small group"
split; the container has no sklearn, so LOF and the covariance estimator
are implemented in numpy inside the kernel (LOF follows Breunig et al.
2000 exactly; the covariance path uses the empirical estimator — a
documented deviation from MinCovDet, SURVEY §4.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import vector as V


def zscore_outliers(
    df: DataFrame,
    cluster_col: str,
    dist_col: str,
    threshold: float = 3.0,
    out_col: str = "is_outlier",
) -> DataFrame:
    """M6 — |z| of dist within cluster > threshold (population std, ddof=0,
    matching np.std at main-script1.ipynb:3767 c64)."""
    w = Window.partitionBy(cluster_col)
    mean = F.mean(dist_col).over(w)
    std = F.stddev_pop(dist_col).over(w)
    z = V.z_score(F.col(dist_col), mean, std)
    return df.withColumn("z", z).withColumn(
        out_col, F.coalesce(F.abs(F.col("z")) > threshold, F.lit(False))
    )


def percentile_outliers(
    df: DataFrame,
    cluster_col: str,
    dist_col: str,
    pct: float = 0.95,
    out_col: str = "is_outlier",
) -> DataFrame:
    """M7 — dist > per-cluster exact percentile (np.percentile linear
    interpolation = Spark `percentile`)."""
    thresholds = df.groupBy(cluster_col).agg(
        F.percentile(dist_col, F.lit(pct)).alias("__thr")
    )
    return (
        df.join(F.broadcast(thresholds), cluster_col)
        .withColumn(out_col, F.col(dist_col) > F.col("__thr"))
        .drop("__thr")
    )


def _lof_scores(X: np.ndarray, n_neighbors: int) -> np.ndarray:
    """Local Outlier Factor (Breunig et al. 2000), plain numpy.

    O(m^2) distances — intended for per-cluster groups of <= a few
    thousand rows. Returns the LOF score per row (~1 inlier, >1 outlier).
    """
    m = len(X)
    k = max(1, min(n_neighbors, m - 1))
    d = np.sqrt(
        np.maximum(
            ((X**2).sum(1)[:, None] - 2 * X @ X.T + (X**2).sum(1)[None, :]), 0.0
        )
    )
    np.fill_diagonal(d, np.inf)
    knn_idx = np.argpartition(d, k - 1, axis=1)[:, :k]
    rows = np.arange(m)[:, None]
    kdist = d[rows, knn_idx].max(axis=1)  # k-distance per point
    # reachability distance: max(k-dist(neighbor), d(p, neighbor))
    reach = np.maximum(kdist[knn_idx], d[rows, knn_idx])
    lrd = 1.0 / (reach.mean(axis=1) + 1e-12)
    lof = (lrd[knn_idx].mean(axis=1)) / lrd
    return lof


def lof_outliers(
    df: DataFrame,
    cluster_col: str,
    vector_col: str,
    id_col: str,
    n_neighbors_frac: float = 0.05,
    contamination: float = 0.02,
    out_col: str = "is_outlier",
) -> DataFrame:
    """M8 — per-cluster LOF via applyInPandas.

    n_neighbors = int(frac * cluster_size) (reference uses 5% / 25%);
    the top `contamination` fraction by LOF score is flagged, mirroring
    sklearn's contamination=0.02 behavior. Returns
    (cluster, id, lof double, is_outlier boolean).
    """
    id_field = df.schema[id_col]
    c_field = df.schema[cluster_col]
    schema = T.StructType(
        [
            T.StructField(cluster_col, c_field.dataType),
            T.StructField(id_col, id_field.dataType),
            T.StructField("lof", T.DoubleType()),
            T.StructField(out_col, T.BooleanType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        X = np.asarray(pdf[vector_col].tolist(), dtype=np.float64)
        if m < 3:
            return pd.DataFrame(
                {
                    cluster_col: pdf[cluster_col],
                    id_col: pdf[id_col],
                    "lof": np.ones(m),
                    out_col: np.zeros(m, dtype=bool),
                }
            )
        k = max(1, int(n_neighbors_frac * m))
        lof = _lof_scores(X, k)
        n_out = max(0, int(np.ceil(contamination * m)))
        thr = np.partition(lof, m - n_out)[m - n_out] if n_out else np.inf
        return pd.DataFrame(
            {
                cluster_col: pdf[cluster_col],
                id_col: pdf[id_col],
                "lof": lof,
                out_col: lof >= thr if n_out else np.zeros(m, dtype=bool),
            }
        )

    return (
        df.select(cluster_col, id_col, vector_col)
        .groupBy(cluster_col)
        .applyInPandas(kernel, schema=schema)
    )


def mahalanobis_outliers(
    df: DataFrame,
    cluster_col: str,
    vector_col: str,
    id_col: str,
    pct: float = 95.0,
    out_col: str = "is_outlier",
) -> DataFrame:
    """M9 — per-cluster Mahalanobis distance > pct-th percentile.

    Deviation from the reference (documented, SURVEY §4.3): MinCovDet's
    FastMCD has no dependency here, so the empirical covariance (with
    pseudo-inverse for rank-deficient clusters) stands in. The reference
    applies this after a UMAP->3D projection; the operator takes whatever
    vector column it is given.
    """
    id_field = df.schema[id_col]
    c_field = df.schema[cluster_col]
    schema = T.StructType(
        [
            T.StructField(cluster_col, c_field.dataType),
            T.StructField(id_col, id_field.dataType),
            T.StructField("mahal", T.DoubleType()),
            T.StructField(out_col, T.BooleanType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.asarray(pdf[vector_col].tolist(), dtype=np.float64)
        m = len(X)
        if m < 3:
            return pd.DataFrame(
                {
                    cluster_col: pdf[cluster_col],
                    id_col: pdf[id_col],
                    "mahal": np.zeros(m),
                    out_col: np.zeros(m, dtype=bool),
                }
            )
        mu = X.mean(axis=0)
        cov = np.cov(X, rowvar=False)
        prec = np.linalg.pinv(np.atleast_2d(cov))
        c = X - mu
        mahal = np.sqrt(np.einsum("ij,jk,ik->i", c, prec, c))
        thr = np.percentile(mahal, pct)
        return pd.DataFrame(
            {
                cluster_col: pdf[cluster_col],
                id_col: pdf[id_col],
                "mahal": mahal,
                out_col: mahal > thr,
            }
        )

    return (
        df.select(cluster_col, id_col, vector_col)
        .groupBy(cluster_col)
        .applyInPandas(kernel, schema=schema)
    )
