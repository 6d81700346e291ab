"""Dimensionality reduction (SURVEY §2.9 M10-M11).

- PCA 2D/3D + explained variance (nuevo-kmeans-pre.ipynb:520 c26): MLlib
  PCA — distributed, covariance accumulated in one pass.
- UMAP 2D/3D (nuevo-kmeans-pre.ipynb:689 c31): no distributed equivalent
  and umap-learn is not in this container; the operator is a documented
  driver-side stage behind an import-try (NotImplementedError otherwise),
  exactly as SURVEY §4.3 plans it.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vector as V


def pca_components_numpy(
    X: np.ndarray, n_components: int
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic PCA basis from a (bounded) sample: eigh of the
    covariance, eigenvalue-descending, each component's sign fixed so its
    largest-|coordinate| entry is positive.

    Shared by the m9 query's plan-literal projection and its DuckDB
    oracle generator — both sides must produce the *same* basis, which
    MLlib's SVD-based PCA can't guarantee across engines. Returns
    (mean, components) with projection = (x - mean) @ components.T.
    """
    X = np.asarray(X, dtype=np.float64)
    mu = X.mean(axis=0)
    w, v = np.linalg.eigh(np.atleast_2d(np.cov(X, rowvar=False)))
    order = np.argsort(w, kind="stable")[::-1][:n_components]
    comps = v[:, order].T.copy()
    for i in range(len(comps)):
        if comps[i, np.argmax(np.abs(comps[i]))] < 0:
            comps[i] = -comps[i]
    return mu, comps


def pca_project(
    df: DataFrame,
    n_components: int = 2,
    vector_col: str = "embedding",
    out_col: str = "pca",
) -> tuple[DataFrame, list[float]]:
    """M10 — PCA projection; returns (df + out_col array<double>,
    explained variance ratios)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = df.withColumn(
        "__features", array_to_vector(F.col(vector_col).cast("array<double>"))
    )
    model = PCA(k=n_components, inputCol="__features", outputCol="__pca").fit(feats)
    out = (
        model.transform(feats)
        .withColumn(out_col, vector_to_array(F.col("__pca")))
        .drop("__features", "__pca")
    )
    return out, [float(x) for x in model.explainedVariance]


def umap_project(
    df: DataFrame,
    n_components: int = 2,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int = 100_000,
    **umap_kwargs,
) -> DataFrame:
    """M11 — UMAP on the driver over collected vectors (non-distributed
    stage, reference runs it on <=10k rows). Raises NotImplementedError
    when umap-learn is absent (not installed in this container)."""
    try:
        import umap  # noqa: F401
    except ImportError as e:  # pragma: no cover - env without umap
        raise NotImplementedError(
            "umap-learn is not installed; UMAP is a driver-side optional "
            "stage (SURVEY §2.9 M11). Install umap-learn to enable."
        ) from e

    pdf = df.select(id_col, vector_col).limit(max_rows).toPandas()
    import numpy as np

    X = V.stack_vectors(pdf[vector_col])
    emb = umap.UMAP(n_components=n_components, **umap_kwargs).fit_transform(X)
    out = pdf[[id_col]].copy()
    out["umap"] = [row.tolist() for row in emb]
    return df.sparkSession.createDataFrame(out)
