"""S7 — document-to-text ingest stage (SURVEY §2.1).

The reference vendors a ~1,650-LoC markdown-conversion library covering
pdf/docx/pptx/xlsx/html/ipynb/rss/wav/mp3/zip (analisis-informe.ipynb:2806
c82). This module implements txt/md/html/csv/json extraction AND the OOXML
family (docx/pptx/xlsx — zip+XML, so stdlib-only like sources.xlsx) over an
Arrow-batched stage on Spark's binaryFile source — the out-of-core ingest
shape (bytes in executors, text out, no driver round-trip). Formats that
genuinely need codec libraries absent from this container (pdf, images,
audio) route to operators.multimodal's stubbed decode path with
converted=false.
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

TEXT_FORMATS = (
    "txt", "md", "html", "htm", "csv", "json", "ipynb", "rss", "atom", "xml",
)

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


def _ooxml_runs(root, local_tag: str) -> list[str]:
    """Text runs of one OOXML part, namespace-agnostic."""
    return [
        t.text or ""
        for t in root.iter()
        if t.tag.endswith("}" + local_tag) or t.tag == local_tag
    ]


def docx_to_text(payload: bytes) -> str:
    """Word document → paragraphs (word/document.xml <w:p>/<w:t> runs).

    OOXML is zip+XML, so like the xlsx codec this is stdlib-only — the
    reference's vendored converter reaches the same text through
    python-docx (analisis-informe.ipynb:2806 c82)."""
    import zipfile
    from xml.etree import ElementTree as ET

    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    paras = []
    for p in root.iter():
        if p.tag.endswith("}p"):
            runs = _ooxml_runs(p, "t")
            if any(runs):
                paras.append("".join(runs))
    return "\n".join(paras).strip()


def pptx_to_text(payload: bytes) -> str:
    """PowerPoint deck → slide texts (ppt/slides/slideN.xml <a:t> runs),
    slides in numeric order, one blank line between slides."""
    import re as _re
    import zipfile
    from xml.etree import ElementTree as ET

    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        slide_names = sorted(
            (n for n in z.namelist()
             if _re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(_re.search(r"(\d+)\.xml$", n).group(1)),
        )
        slides = []
        for name in slide_names:
            runs = _ooxml_runs(ET.fromstring(z.read(name)), "t")
            if any(runs):
                slides.append("\n".join(r for r in runs if r))
    return "\n\n".join(slides).strip()


def xlsx_to_text(payload: bytes) -> str:
    """Workbook → the same 'col: val' flat-text lines as csv_to_text,
    through the stdlib xlsx codec (sources.xlsx handles inline + shared
    strings, so real-Excel files parse too)."""
    from . import xlsx as xlsx_mod

    header, rows = xlsx_mod.read_xlsx(io.BytesIO(payload))  # type: ignore[arg-type]
    if not rows:
        return ", ".join(str(h) for h in header)
    return "\n".join(
        ", ".join(f"{h}: {'' if v is None else v}" for h, v in zip(header, row))
        for row in rows
    )


def ipynb_to_text(raw: str) -> str:
    """Notebook JSON → markdown cells verbatim + code cells fenced, in
    order (the reference's converter emits the same md-ish stream)."""
    try:
        nb = json.loads(raw)
    except json.JSONDecodeError:
        return raw.strip()
    parts = []
    for cell in nb.get("cells", []):
        src = "".join(cell.get("source", []))
        if not src.strip():
            continue
        if cell.get("cell_type") == "markdown":
            parts.append(src.strip())
        elif cell.get("cell_type") == "code":
            parts.append(f"```\n{src.strip()}\n```")
    return "\n\n".join(parts)


def rss_to_text(raw: str) -> str:
    """RSS/Atom feed → 'title: description' lines per item, tags
    namespace-agnostic, entity-unescaped, any HTML stripped."""
    from xml.etree import ElementTree as ET

    try:
        root = ET.fromstring(raw)
    except ET.ParseError:
        return ""
    lines = []
    for item in root.iter():
        if not (item.tag.endswith("item") or item.tag.endswith("entry")):
            continue
        title = desc = ""
        for child in item:
            tag = child.tag.rsplit("}", 1)[-1]
            if tag == "title":
                title = (child.text or "").strip()
            elif tag in ("description", "summary", "content"):
                desc = html_to_text(child.text or "")
        if title or desc:
            lines.append(f"{title}: {desc}" if desc else title)
    # generic (non-feed) XML: fall back to tag-stripped text
    return "\n".join(lines) if lines else html_to_text(raw)


def zip_to_text(payload: bytes) -> str | None:
    """Zip container → converted members concatenated with
    '=== <name> ===' separators. Strictly ONE nesting level (zip members
    inside a zip are skipped — no recursion, no zip-bomb surface),
    mirroring the reference's archive walk. Members whose format needs
    an absent codec are skipped; an archive with NO convertible member
    is unconverted."""
    import zipfile

    try:
        z = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile:
        return None
    parts = []
    with z:
        for name in z.namelist():
            if name.endswith("/"):
                continue
            fmt = name.rsplit(".", 1)[-1].lower() if "." in name else ""
            if fmt == "zip":
                continue
            text = convert_payload(fmt, z.read(name))
            if text:
                parts.append(f"=== {name} ===\n{text}")
    return "\n\n".join(parts) if parts else None


OOXML_FORMATS = ("docx", "pptx", "xlsx")


def convert_payload(fmt: str, payload: bytes) -> str | None:
    """Dispatch one document; None for formats needing absent codecs
    (pdf and media formats — those route to operators.multimodal)."""
    fmt = (fmt or "").lower().lstrip(".")
    if fmt in OOXML_FORMATS:
        try:
            if fmt == "docx":
                return docx_to_text(payload)
            if fmt == "pptx":
                return pptx_to_text(payload)
            return xlsx_to_text(payload)
        except Exception:  # corrupt/encrypted container → unconverted route
            return None
    if fmt == "zip":
        return zip_to_text(payload)
    if fmt not in TEXT_FORMATS:
        return None
    raw = payload.decode("utf-8", errors="replace")
    if fmt in ("html", "htm"):
        return html_to_text(raw)
    if fmt == "csv":
        return csv_to_text(raw)
    if fmt == "json":
        return json_to_text(raw)
    if fmt == "ipynb":
        return ipynb_to_text(raw)
    if fmt in ("rss", "atom", "xml"):
        return rss_to_text(raw)
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
