"""Streaming curation: stream-vs-batch equivalence and incremental drop-zone
pickup (streaming/curation.py)."""

from __future__ import annotations

import os
import shutil

import pytest

from vector_search_optimization_spark.sources import load_table
from vector_search_optimization_spark.streaming import curation as C


@pytest.fixture()
def scratch(tmp_path):
    d = {
        "drop": str(tmp_path / "drop"),
        "out": str(tmp_path / "curated"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["drop"])
    yield d
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _drop(docs, drop_dir: str, leaf: str) -> None:
    """Land a batch of documents as one parquet dir in the drop zone.

    The file source watches files under drop_dir; writing a part-dir per
    batch mirrors a lake drop-zone ingest."""
    docs.coalesce(1).write.mode("overwrite").parquet(os.path.join(drop_dir, leaf))


def test_stream_curation_matches_batch(spark, sf_small, scratch):
    docs = load_table(spark, sf_small, "documents")
    first = docs.where("doc_id % 2 = 0")
    second = docs.where("doc_id % 2 = 1")
    _drop(first, scratch["drop"], "b0")

    stream = C.read_documents_stream(spark, scratch["drop"] + "/*")
    q = C.stream_curate_to_parquet(stream, scratch["out"], scratch["ckpt"])
    try:
        q.processAllAvailable()
        _drop(second, scratch["drop"], "b1")  # late-arriving second batch
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(scratch["out"])
    want = C.curate_columns(docs)
    g = sorted(
        (r.doc_id, r.lang, r.n_tokens, r.clean) for r in got.collect()
    )
    w = sorted(
        (r.doc_id, r.lang, r.n_tokens, r.clean) for r in want.collect()
    )
    assert g == w
    assert len(g) > 0
    # partitioned-by-lang layout in the curated zone
    langs = {e.split("=")[1] for e in os.listdir(scratch["out"]) if e.startswith("lang=")}
    assert langs == {r.lang for r in want.select("lang").distinct().collect()}


def test_curate_columns_scrubs_and_gates(spark):
    rows = [
        (0, "mail a@b.io " + "w " * 20, "en", "s", 0),
        (1, "too short", "en", "s", 0),
        (2, None, "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.doc_id: r for r in C.curate_columns(df).collect()}
    assert set(out) == {0}
    assert out[0].clean.startswith("mail <EMAIL> ")
    assert out[0].n_tokens == 22
