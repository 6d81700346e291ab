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
    the sharers get covered_chars > 0 (and never above doc length),
    the others exactly zero — driven through the registered query's
    actual operator (operators/dedup.py:dup_span_coverage_frame)."""
    import __spark_entry__ as m
    from vector_search_optimization_spark.operators import dedup

    span = "this exact sixty character duplicated span appears twice okx"
    assert len(span) == 60
    rows = [
        (1, "unique prologue one " + span + " unique epilogue one"),
        (2, "different opening text " + span + " different closing"),
        (3, "completely unrelated document number three with words"),
        (4, "another fully distinct text body number four here"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.dup_span_coverage_frame(
            d, n=m._SPAN_N, w=m._SPAN_W
        ).collect()
    }
    assert out[1]["covered_chars"] > 0 and out[2]["covered_chars"] > 0
    assert out[1]["n_matched"] > 0 and out[2]["n_matched"] > 0
    for i in (3, 4):
        assert out[i]["covered_chars"] == 0
        assert out[i]["n_matched"] == 0
        assert out[i]["dup_span_fraction"] == 0.0
    for i in (1, 2, 3, 4):
        assert 0 <= out[i]["covered_chars"] <= out[i]["len_t"]
        assert out[i]["n_selected"] > 0
