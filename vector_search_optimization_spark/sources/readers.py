"""Readers (SURVEY §2.1 S1-S7).

The reference loads CSV with a runtime column-presence check
(main-script1.ipynb:161 c8), JSON dumps via json.load (main-script1.ipynb:190
c9), and parquet snapshots (nuevo-kmeans-pre.ipynb:33 c2). Spark equivalents
pin explicit schemas so scans prune columns and push predicates; schema
drift fails loudly at plan time instead of silently at chart time.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas
from ..functions import vector as V

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# footer-schema memo: (mtime_ns, size) -> inferred StructType per path.
# METADATA ONLY (the catalog role a metastore plays on a real cluster) —
# never rows, never results: every query still computes from the parquet
# bytes. Keyed on the file's stat so a regenerated dataset re-probes the
# footer (the ts-encoding-varies-between-rounds rule stays intact).
# Motivation: schema inference re-reads the footer on EVERY
# spark.read.parquet call — measured ~0.1-0.25 s per load_table, and a
# full bench run makes ~500 such calls (optimization guide §1: measure
# first; this was the largest constant in the suite).
_SCHEMA_CACHE: dict[str, tuple[int, int, T.StructType]] = {}


def _parquet_schema(spark: SparkSession, path: str) -> T.StructType:
    st = os.stat(path)
    hit = _SCHEMA_CACHE.get(path)
    if hit is not None and hit[0] == st.st_mtime_ns and hit[1] == st.st_size:
        return hit[2]
    schema = spark.read.parquet(path).schema
    _SCHEMA_CACHE[path] = (st.st_mtime_ns, st.st_size, schema)
    return schema


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver test table (TESTDATA.md) as a DataFrame.

    events.ts is TIMESTAMP(NANOS) in the parquet footer, which Spark reads
    as long (session sets spark.sql.legacy.parquet.nanosAsLong); convert to
    a real timestamp at microsecond precision — the same truncation DuckDB
    applies, so oracle comparisons line up.
    """
    if name == "events":
        # both confs are dynamic — safe to pin on a caller-provided session
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # explicit (memoized) schema skips per-call footer inference; the
    # probe itself stays dynamic per data generation (stat-keyed)
    df = spark.read.schema(_parquet_schema(spark, path)).parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division, NOT `/1000` + cast: the double round-trip is
        # off by 1µs for ~12% of arbitrary ns values (53-bit mantissa at
        # 1.8e18), which would hash-mismatch DuckDB's exact ns→µs floor
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def spread_scan(df: DataFrame, *keys: str, target: int | None = None) -> DataFrame:
    """Unsplittable-input remedy (optimization guide §2.5, "input skew:
    one huge unsplittable file ... repartition immediately after the
    read").

    The driver tables are single-row-group parquet files, so a scan of
    one CANNOT be byte-split: every map-side operator downstream runs
    as ONE task no matter how many cores the session has. For queries
    whose cost is per-row map compute BEFORE the first exchange (hash
    fan-outs, shingling, converters, Expand aggregates, per-row file
    writes) that one task serializes the whole stage — measured 6.9 s
    warm on evt_ab_bootstrap's 64-sha256-per-row stage at sf0.1.

    Redistributes to the session's default parallelism first: a keyed
    hash exchange when ``keys`` are given (deterministic, no
    sort-before-repartition), round-robin otherwise. No-op when the
    scan already has at least that many splits — at lake scale a table
    scan has ~bytes/128 MB tasks, so this helper never funnels a big
    scan down to the core count; it is scale-adaptive, not a local[32]
    constant. Do NOT use before an operator whose first step is itself
    a shuffle (join/groupBy/distinct with cheap map work): that only
    doubles the exchanges.
    """
    if df.isStreaming:  # partition introspection is batch-only
        return df
    spark = df.sparkSession
    n = target or spark.sparkContext.defaultParallelism
    if _scan_splits_at_least(df, n):
        return df
    if keys:
        return df.repartition(n, *[F.col(k) for k in keys])
    return df.repartition(n)


def _scan_splits_at_least(df: DataFrame, n: int) -> bool:
    """True when the frame's scan already yields >= n splits. Estimated
    from the input-file byte total over maxPartitionBytes (a lower bound
    on Spark's split count — it never packs more than maxPartitionBytes
    into one split), which costs one cached file-listing instead of the
    ~0.15 s full physical planning that ``df.rdd.getNumPartitions()``
    pays. A byte split of a parquet file only carries rows when it
    covers a row-group start, so each file's contribution is capped at
    its row-group count (stat-memoized footer probe — ADVICE r11: a
    single-row-group file larger than n*maxPartitionBytes is exactly
    the unsplittable pathology this helper exists to fix and must not
    be counted as many splits). Falls back to the exact planner count
    when the frame has no resolvable local input files (derived frames,
    non-file sources); that fallback pays full physical planning, so
    hot-loop callers should pass fresh scans, not derived frames."""
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001
        files = []
    paths: list[str] = []
    for uri in files:
        if not uri.startswith("file:"):
            paths = []
            break
        from urllib.parse import unquote, urlparse

        paths.append(unquote(urlparse(uri).path))
    if paths:
        conf = df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728b"
        )
        m = re.match(r"(\d+)([bkmg]?)", conf.lower())
        mpb = max(
            int(m.group(1))
            * {"": 1, "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}[
                m.group(2)
            ],
            1,
        )
        splits = 0
        try:
            for p in paths:
                byte_splits = -(-os.path.getsize(p) // mpb)
                if byte_splits > 1:
                    # only non-empty when a split covers a row-group
                    # boundary: cap at the file's row-group count
                    byte_splits = min(byte_splits, _parquet_row_groups(p))
                splits += byte_splits
                if splits >= n:
                    return True
        except OSError:
            return df.rdd.getNumPartitions() >= n
        # small split total, but the frame may already sit downstream of
        # a shuffle-producing operator (inputFiles sees through them):
        # consult the ANALYZED plan — no optimization pass, so this
        # stays cheap. "Exchange" is physical-plan-only and can never
        # appear here (ADVICE r11); match the logical nodes that always
        # redistribute their output instead. Join is deliberately NOT
        # matched: a broadcast join preserves the probe side's (possibly
        # single-task) partitioning, and at analysis time the strategy
        # is undecided — treating every Join as "already shuffled" would
        # silently no-op spreads after broadcast semi-joins.
        plan = df._jdf.queryExecution().analyzed().toString()
        return bool(
            re.search(
                r"\b(Repartition|RepartitionByExpression|Rebalance"
                r"|Aggregate|Window|Deduplicate)\b",
                plan,
            )
        )
    return df.rdd.getNumPartitions() >= n


# row-group count per local parquet file, stat-keyed like the schema
# memo (a regenerated file re-probes); non-parquet inputs count as 1
# unsplittable unit, the conservative answer for this estimator
_ROW_GROUP_CACHE: dict[str, tuple[int, int, int]] = {}


def _parquet_row_groups(path: str) -> int:
    st = os.stat(path)
    hit = _ROW_GROUP_CACHE.get(path)
    if hit is not None and hit[0] == st.st_mtime_ns and hit[1] == st.st_size:
        return hit[2]
    try:
        import pyarrow.parquet as pq

        ng = max(int(pq.ParquetFile(path).metadata.num_row_groups), 1)
    except Exception:  # noqa: BLE001 — non-parquet / unreadable footer
        ng = 1
    _ROW_GROUP_CACHE[path] = (st.st_mtime_ns, st.st_size, ng)
    return ng


def read_chunks(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S2/S3 — chunk fact table with the pinned schema (SURVEY §1.2)."""
    reader = spark.read.schema(schemas.CHUNKS)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unsupported chunks format {fmt!r}")


def read_centroids_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 — centroid table from CSV with the string→vector cast (F6).

    cluster_centroids.csv serializes the centroid as "[f, f, ...]"
    (main-script1.ipynb:310 c15 parses it with np.fromstring); the Spark
    read applies functions.vector.parse_vector so downstream operators see
    array<float>. The header is VALIDATED against the pinned schema first
    (mirroring the reference's runtime check, main-script1.ipynb:161 c8):
    with an explicit schema Spark maps CSV columns by POSITION, so a
    missing or reordered column would otherwise load silently with
    swapped/null data rather than failing.
    """
    expected = [f.name for f in schemas.CENTROIDS_CSV.fields]
    header_row = (
        spark.read.option("header", False).csv(path).first()
    )
    actual = [str(c).strip() for c in header_row] if header_row else []
    if actual != expected:
        raise ValueError(
            f"centroid CSV header {actual} does not match the pinned "
            f"schema columns {expected} (positional mapping would "
            "silently mis-assign data)"
        )
    raw = spark.read.option("header", True).schema(schemas.CENTROIDS_CSV).csv(path)
    return raw.select(
        "cluster_label", V.parse_vector("centroid").alias("centroid"), "etiqueta"
    )


def read_excel(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """S6 — Excel scan (pd.read_excel inside the vendored converter,
    analisis-informe.ipynb:2806 c82). Excel is a driver-side small-table
    format — config/dimension tables only, never a distributed scan.

    Parsed by the stdlib zip+XML codec (sources.xlsx), so no openpyxl
    dependency; handles inline and shared strings, numbers, bools.
    Column types are inferred per column from the cell values (all-numeric
    → double/long, else string), mirroring pd.read_excel inference.
    """
    from . import xlsx

    header, rows = xlsx.read_xlsx(path, sheet)
    schema, rows = infer_excel_schema(header, rows)
    return spark.createDataFrame(rows, schema)


def infer_excel_schema(
    header: list[str], rows: list[list]
) -> tuple[T.StructType, list[list]]:
    """Per-column type inference over parsed xlsx cells (pd.read_excel
    style: all-bool → boolean, all-int → long, numeric mix → double,
    else string), coercing cell values to the inferred type. Shared by
    the driver-side read_excel helper and the distributed "xlsx"
    DataSource."""
    fields = []
    for i, name in enumerate(header):
        vals = [r[i] for r in rows if r[i] is not None]
        if vals and all(isinstance(v, bool) for v in vals):
            tp: T.DataType = T.BooleanType()
        elif vals and all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
            tp = T.LongType()
        elif vals and all(
            isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals
        ):
            tp = T.DoubleType()
            rows = [
                r[:i] + [float(r[i]) if r[i] is not None else None] + r[i + 1 :]
                for r in rows
            ]
        else:
            tp = T.StringType()
            rows = [
                r[:i] + [str(r[i]) if r[i] is not None else None] + r[i + 1 :]
                for r in rows
            ]
        fields.append(T.StructField(name, tp, True))
    return T.StructType(fields), rows


def coerce_cell_to_type(v, tp: T.DataType):
    """Coerce one parsed xlsx cell to a PLANNED Spark field type.

    Used by the distributed "xlsx" DataSource so every file in a
    directory lands in the schema planned from the first file — a file
    whose own cells would infer long where the plan says double (or
    vice versa) must not leak mismatched Python types into the Arrow
    conversion. Unrepresentable values become None rather than silently
    diverging (e.g. a non-integral float under a long plan)."""
    if v is None:
        return None
    if isinstance(tp, T.BooleanType):
        return v if isinstance(v, bool) else None
    if isinstance(tp, T.LongType):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, int):
            return v
        if isinstance(v, float):
            return int(v) if v.is_integer() else None
        return None
    if isinstance(tp, T.DoubleType):
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return float(v)
        try:
            return float(v)
        except (TypeError, ValueError):
            return None
    return str(v)


def read_json_index_dump(spark: SparkSession, path: str) -> DataFrame:
    """S2/S4 — full search-index dump (documentos_pre.json shape): chunk
    columns plus document_path and the writeback target etiqueta_cluster.
    Null vectors are kept — the null-drop filter (P8) is the caller's
    explicit step, as in get_all_embeddings (update-etiquetas.ipynb:171 c9).
    """
    schema = T.StructType(
        list(schemas.CHUNKS.fields)
        + [
            T.StructField("document_path", T.StringType(), True),
            T.StructField("etiqueta_cluster", T.StringType(), True),
        ]
    )
    return spark.read.schema(schema).json(path)
