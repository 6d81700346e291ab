"""Data layout for scan pruning — Z-order (Morton) clustering.

The 100 TB lever parquet gives away for free: min/max zone maps prune
row groups ONLY if the writer clustered the data. A single-column sort
prunes one predicate dimension; bit-interleaving k columns into one
Morton key and range-partition-sorting by it gives every interleaved
dimension a narrow per-file range simultaneously — the Delta/Iceberg
OPTIMIZE ZORDER technique, reproduced on plain parquet with two public
primitives (repartitionByRange + sortWithinPartitions).

The z-value is PURE integer bit math (unrolled shifts/masks), so it
stays inside whole-stage codegen on the Spark side and has an exact
DuckDB twin (``z_value_sql``) for value oracles. Columns must be
pre-quantized by the caller to small non-negative ints (bucket ids,
clamped dims) — quantization choice is a layout policy, not hidden
here.

Scale notes: z_value is map-only; the layout write is exactly one
range shuffle (sampling-based bounds, skew-tolerant) + a partition-
local sort — the same cost as any global sort-write. Pruning
effectiveness is pinned in tests/test_layout.py by reading the parquet
footers' per-file min/max spans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column | str], bits: int = 10) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column.

    Bit b of column i lands at position b*k + i, so the key orders by
    all columns' high bits first — the locality property zone-map
    pruning needs. Inputs are masked to [0, 2^bits) (callers quantize;
    the mask makes out-of-range values wrap rather than error). Output
    fits a long for k*bits <= 63."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(
            F.lit((1 << bits) - 1)
        )
        for b in range(bits):
            bit = F.shiftright(cc, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * k + i))
    return out


def z_value_sql(cols: list[str], bits: int = 10) -> str:
    """DuckDB twin of :func:`z_value` — the same unrolled expression,
    for value oracles. Every term is FULLY parenthesized: DuckDB gives
    ``<<`` and ``|`` equal precedence (left-associative, Postgres
    style), so ``a << 3 | b << 4`` would parse as ``((a << 3) | b) <<
    4`` and overflow."""
    k = len(cols)
    mask = (1 << bits) - 1
    terms = [
        f"((((CAST({c} AS BIGINT) & {mask}) >> {b}) & 1) << {b * k + i})"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    quantized_cols: list[str],
    path: str,
    bits: int = 10,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of
    ``quantized_cols``: ONE range shuffle on the key (sampled bounds)
    + a partition-local sort, so each output file covers a narrow
    range of EVERY interleaved column — min/max zone maps then prune
    multi-dimensional predicates. The helper key column is dropped
    from the files."""
    keyed = df.withColumn("__z", z_value(quantized_cols, bits))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
