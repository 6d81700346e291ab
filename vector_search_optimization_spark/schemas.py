"""Explicit StructTypes for every boundary table (SURVEY §1.2).

The reference infers schemas at load time (``pd.DataFrame(results2)``,
main-script1.ipynb:190-234 c9-c11) and defensively checks columns at runtime
(main-script1.ipynb:161 c8). On a 100 TB lake that is a recipe for silent
drift, so the engine pins StructTypes at the boundaries: scans read exactly
these columns (column pruning reaches the parquet footer) and writers refuse
to persist anything else.
"""

from __future__ import annotations

from pyspark.sql import types as T

VECTOR = T.ArrayType(T.FloatType())

# --- reference-shaped tables (SURVEY §1.2) ---------------------------------

# chunk fact table: analisis-informe.ipynb:244 c12 / silhouettes.ipynb:237 c11
CHUNKS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("document_id", T.StringType(), True),
        T.StructField("chunk_id", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("content_vector", VECTOR, True),
        T.StructField("original_path", T.StringType(), True),
        T.StructField("document_name", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("event_url", T.StringType(), True),
        T.StructField("page_number", T.IntegerType(), True),
    ]
)

# centroid dimension table: cluster_centroids.csv (main-script1.ipynb:161 c8)
CENTROIDS = T.StructType(
    [
        T.StructField("cluster_label", T.IntegerType(), False),
        T.StructField("centroid", VECTOR, True),
        T.StructField("etiqueta", T.StringType(), True),
    ]
)

# CSV serialization of the centroid table: `centroid` is a "[f, f, ...]"
# string parsed with np.fromstring (main-script1.ipynb:310 c15) — see
# functions.vector.parse_vector for the Spark-side cast.
CENTROIDS_CSV = T.StructType(
    [
        T.StructField("cluster_label", T.IntegerType(), False),
        T.StructField("centroid", T.StringType(), True),
        T.StructField("etiqueta", T.StringType(), True),
    ]
)

# --- driver test tables (TESTDATA.md) ---------------------------------------

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", VECTOR, True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# multimodal asset table (engine extension; SURVEY §2.12 — binary payload +
# typed metadata, decode runs as a mapInPandas stage)
ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), True),  # image|audio|video
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)
