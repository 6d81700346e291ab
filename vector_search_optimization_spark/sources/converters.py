"""S7 — document-to-text ingest stage (SURVEY §2.1).

The reference vendors a ~1,650-LoC markdown-conversion library covering
pdf/docx/pptx/xlsx/html/ipynb/rss/wav/mp3/zip (analisis-informe.ipynb:2806
c82). For engine parity only the *text-bearing* formats matter (SURVEY S7
note): this module implements txt/html/csv/json extraction with stdlib-only
parsing, running as an Arrow-batched stage over Spark's binaryFile source —
the out-of-core ingest shape (bytes in executors, text out, no driver
round-trip). Binary media formats (pdf/docx images/audio) need codec
libraries absent from this container and route to operators.multimodal's
stubbed decode path.
"""

from __future__ import annotations

import csv
import html as html_mod
import io
import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TEXT_FORMATS = ("txt", "md", "html", "htm", "csv", "json")

_SCRIPT_RE = re.compile(r"(?is)<(script|style)[^>]*>.*?</\1>")
_TAG_RE = re.compile(r"(?s)<[^>]+>")
_WS_RE = re.compile(r"[ \t\f\v]+")
_NL_RE = re.compile(r"\n{3,}")


def html_to_text(raw: str) -> str:
    """Strip script/style blocks, tags, entities; collapse whitespace."""
    s = _SCRIPT_RE.sub(" ", raw)
    s = _TAG_RE.sub(" ", s)
    s = html_mod.unescape(s)
    s = _WS_RE.sub(" ", s)
    return _NL_RE.sub("\n\n", s).strip()


def csv_to_text(raw: str) -> str:
    """Rows → 'col: val' lines, the flat-text form the reference's Excel/CSV
    converters emit for indexing."""
    rows = list(csv.reader(io.StringIO(raw)))
    if not rows:
        return ""
    header, *data = rows
    if not data:
        return ", ".join(header)
    out = []
    for row in data:
        out.append(", ".join(f"{h}: {v}" for h, v in zip(header, row)))
    return "\n".join(out)


def json_to_text(raw: str) -> str:
    """Flatten scalar leaves to 'path: value' lines."""
    try:
        obj = json.loads(raw)
    except json.JSONDecodeError:
        return raw.strip()
    lines: list[str] = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}.{k}" if path else str(k))
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{path}[{i}]")
        elif node is not None:
            lines.append(f"{path}: {node}")

    walk(obj, "")
    return "\n".join(lines)


def convert_payload(fmt: str, payload: bytes) -> str | None:
    """Dispatch one document; None for formats needing absent codecs."""
    fmt = (fmt or "").lower().lstrip(".")
    if fmt not in TEXT_FORMATS:
        return None
    raw = payload.decode("utf-8", errors="replace")
    if fmt in ("html", "htm"):
        return html_to_text(raw)
    if fmt == "csv":
        return csv_to_text(raw)
    if fmt == "json":
        return json_to_text(raw)
    return raw.strip()  # txt / md


CONVERTED_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("converted", T.BooleanType()),
    ]
)


def read_binary_docs(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile scan: (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def convert_documents(binary_df: DataFrame) -> DataFrame:
    """The ingest stage: binaryFile rows → (path, fmt, text, n_chars,
    converted). Non-text formats pass through with converted=false so the
    pipeline can route them to the multimodal path instead of dropping them
    silently."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fmts, texts, ns, oks = [], [], [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                fmt = p.rsplit(".", 1)[-1].lower() if "." in p else ""
                text = convert_payload(fmt, bytes(content) if content is not None else b"")
                fmts.append(fmt)
                texts.append(text)
                ns.append(len(text) if text is not None else 0)
                oks.append(text is not None)
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "fmt": fmts,
                    "text": texts,
                    "n_chars": ns,
                    "converted": oks,
                }
            )

    return binary_df.select("path", "content").mapInPandas(
        batches, schema=CONVERTED_SCHEMA
    )
