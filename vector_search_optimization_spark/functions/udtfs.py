"""Python UDTFs (SURVEY §2.12 UDF-surface completeness).

Spark 4's user-defined TABLE functions: one input row → many output
rows, usable from SQL via ``LATERAL``. The explode-shaped operators in
this engine (LSH bands, frame sampling) are pure-plan ``explode`` calls —
always prefer those; a UDTF is for row-expansion logic that genuinely
needs Python. The shingle UDTF here is that case's reference
implementation, matching the tokenization of the dedup kernels
(lower + whitespace split, <n-token fallback to the whole join).

Usage::

    from vector_search_optimization_spark.functions.udtfs import (
        register_udtfs,
    )
    register_udtfs(spark)
    spark.sql(\"\"\"
        SELECT d.doc_id, s.shingle, s.pos
        FROM documents d, LATERAL word_shingles_udtf(d.text, 3) s
    \"\"\")
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="shingle: string, pos: int")
class WordShinglesUDTF:
    """All word n-gram shingles of a text with their token position
    (NOT deduplicated — positions make duplicates meaningful; use
    functions.text.word_shingles for the distinct-set expression)."""

    def eval(self, text: str, n: int):  # noqa: D102 — contract is the class doc
        toks = (text or "").lower().split()
        if n <= 0:
            return
        if len(toks) < n:
            yield " ".join(toks), 0
            return
        for i in range(len(toks) - n + 1):
            yield " ".join(toks[i : i + n]), i


def register_udtfs(spark) -> None:
    """Idempotent SQL registration of the engine's UDTFs."""
    spark.udtf.register("word_shingles_udtf", WordShinglesUDTF)
