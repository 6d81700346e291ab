"""S1-S11 sources/sinks: CSV centroid roundtrip, JSON dump, upsert sink."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from vector_search_optimization_spark import schemas
from vector_search_optimization_spark.sources import (
    read_centroids_csv,
    read_chunks,
    write_csv,
    write_parquet,
    write_upsert,
)
from vector_search_optimization_spark.sources.readers import (
    read_excel,
    read_json_index_dump,
)
from vector_search_optimization_spark.sources.writers import write_excel


def test_centroids_csv_roundtrip(spark, tmp_path):
    """S1/S8 + F6: centroid table with '[f, f, ...]' vector strings."""
    path = str(tmp_path / "centroids_csv")
    cents = spark.createDataFrame(
        [(0, [0.5, -1.25], "Etiqueta 0"), (1, [2.0, 3.5], "Etiqueta 1")],
        schemas.CENTROIDS,
    )
    write_csv(cents, path)
    back = read_centroids_csv(spark, path)
    rows = {r.cluster_label: r for r in back.collect()}
    assert rows[0].centroid == pytest.approx([0.5, -1.25])
    assert rows[1].centroid == pytest.approx([2.0, 3.5])
    assert rows[1].etiqueta == "Etiqueta 1"


def test_read_json_index_dump_nulls(spark, tmp_path):
    """S2/S4 + P8: null content_vector records survive the scan (the
    null-drop filter is the caller's explicit step)."""
    p = tmp_path / "dump.json"
    recs = [
        {"id": "a", "document_id": "d1", "content_vector": [1.0, 2.0],
         "document_path": "/x/a.pdf", "etiqueta_cluster": None},
        {"id": "b", "document_id": "d1", "content_vector": None,
         "document_path": "/x/b.pdf", "etiqueta_cluster": None},
    ]
    p.write_text("\n".join(json.dumps(r) for r in recs))
    df = read_json_index_dump(spark, str(p))
    assert df.count() == 2
    assert df.where(F.col("content_vector").isNotNull()).count() == 1
    assert "etiqueta_cluster" in df.columns


def test_read_chunks_pinned_schema(spark, tmp_path):
    path = str(tmp_path / "chunks_parquet")
    df = spark.createDataFrame(
        [("c1", "d1", "d1/c0", "text", "pdf", "document",
          [0.1, 0.2], "/p", "n", None, None, None, 3)],
        schemas.CHUNKS,
    )
    write_parquet(df, path)
    back = read_chunks(spark, path)
    # same names+types (nullability is storage-dependent after a roundtrip)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in schemas.CHUNKS.fields
    ]
    assert back.count() == 1


def test_write_upsert_sink(spark, tmp_path):
    """S11 — keyed partial update with atomic base rewrite."""
    base_path = str(tmp_path / "base_tbl")
    base = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id int, lab string"
    )
    base.write.parquet(base_path)
    updates = spark.createDataFrame([(2, "NEW")], "id int, lab string")
    write_upsert(base_path, updates, "id")
    after = {r.id: r.lab for r in spark.read.parquet(base_path).collect()}
    assert after == {1: "x", 2: "NEW", 3: "z"}
    # idempotent second run (no-op updates)
    write_upsert(base_path, updates, "id")
    again = {r.id: r.lab for r in spark.read.parquet(base_path).collect()}
    assert again == after


def test_write_json_roundtrip(spark, tmp_path):
    """S10 — JSON sink (json.dump, nuevo-kmeans-pre.ipynb:136 c9)."""
    from vector_search_optimization_spark.sources import write_json

    path = str(tmp_path / "json_sink")
    df = spark.createDataFrame(
        [(1, "a", [0.5, 1.5]), (2, "b", None)],
        "id int, s string, v array<float>",
    )
    write_json(df, path)
    back = spark.read.json(path)
    rows = {r.id: r for r in back.collect()}
    assert rows[1].s == "a" and rows[1].v == [0.5, 1.5]
    assert "v" not in rows[2].asDict() or rows[2].v is None


def test_excel_stubs_raise_without_openpyxl(spark, tmp_path):
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl present; stub path not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="openpyxl"):
        read_excel(spark, str(tmp_path / "x.xlsx"))
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(NotImplementedError, match="openpyxl"):
        write_excel(df, str(tmp_path / "y.xlsx"))
