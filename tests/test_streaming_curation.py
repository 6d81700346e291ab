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


def test_stream_dedup_against_corpus_matches_batch(spark, sf_small, scratch):
    """The streaming band-index maintenance loop must, after a bounded
    backlog drains, have emitted EXACTLY the batch-mode LSH candidate
    set over corpus ∪ stream minus the corpus-internal pairs — no
    matter how the backlog was chopped into micro-batches (cross-batch
    pairs come from the index probe, same-batch pairs from the
    intra-batch self-join)."""
    from vector_search_optimization_spark.operators import dedup as D
    from vector_search_optimization_spark.streaming import (
        stream_dedup_against_corpus,
    )

    docs = load_table(spark, sf_small, "documents")
    corpus = docs.where("doc_id % 3 = 0")
    s1 = docs.where("doc_id % 3 = 1")
    s2 = docs.where("doc_id % 3 = 2")

    index = os.path.join(scratch["out"], "band_index")
    pairs = os.path.join(scratch["out"], "pairs")

    def bands(df):
        return D.minhash_band_rows(
            D.minhash_signatures_kernel(df), num_hashes=64
        )

    bands(corpus).write.parquet(index)  # seed: the already-deduped corpus
    _drop(s1, scratch["drop"], "b0")
    stream = C.read_documents_stream(spark, scratch["drop"] + "/*")
    q = stream_dedup_against_corpus(
        stream, index, pairs, checkpoint=scratch["ckpt"]
    )
    try:
        q.processAllAvailable()
        _drop(s2, scratch["drop"], "b1")  # the next "night"
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        frozenset((r.id_a, r.id_b))
        for r in spark.read.parquet(pairs).collect()
    }

    def cand_set(df):
        return {
            frozenset((r.id_a, r.id_b))
            for r in D.minhash_lsh_candidates(
                D.minhash_signatures_kernel(df), num_hashes=64
            ).collect()
        }

    want = cand_set(docs) - cand_set(corpus)
    assert got == want
    assert got  # the synthetic corpus must actually produce candidates
    # and the index now contains every document's band rows
    n_index_ids = (
        spark.read.parquet(index).select("doc_id").distinct().count()
    )
    assert n_index_ids == docs.count()


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
