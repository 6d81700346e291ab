"""S7 — binaryFile ingest + text extraction for text-bearing formats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_optimization_spark.sources.converters import (
    convert_documents,
    convert_payload,
    csv_to_text,
    html_to_text,
    json_to_text,
    read_binary_docs,
)

HTML = b"""<html><head><style>body {color: red}</style>
<script>var x = 1;</script></head>
<body><h1>Title &amp; More</h1><p>Hello <b>world</b>.</p></body></html>"""
CSV = b"name,age\nana,3\nbob,5\n"
JSON = b'{"a": 1, "b": {"c": "x"}, "d": [10, 20]}'


def test_html_strips_script_style_tags():
    text = html_to_text(HTML.decode())
    assert "Title & More" in text
    assert "Hello" in text and "world" in text
    assert "var x" not in text and "color: red" not in text and "<" not in text


def test_csv_to_text_rows():
    assert csv_to_text(CSV.decode()) == "name: ana, age: 3\nname: bob, age: 5"


def test_json_flatten():
    text = json_to_text(JSON.decode())
    assert "a: 1" in text and "b.c: x" in text and "d[1]: 20" in text


def test_convert_payload_dispatch():
    assert convert_payload("pdf", b"%PDF...") is None  # codec-less format
    assert convert_payload("txt", b" hi \n") == "hi"
    assert convert_payload("HTML", HTML) is not None


def test_binaryfile_ingest_end_to_end(spark, tmp_path):
    (tmp_path / "a.txt").write_bytes(b"plain text doc")
    (tmp_path / "b.html").write_bytes(HTML)
    (tmp_path / "c.csv").write_bytes(CSV)
    (tmp_path / "d.json").write_bytes(JSON)
    (tmp_path / "e.pdf").write_bytes(b"%PDF-1.4 binary stuff")

    out = convert_documents(read_binary_docs(spark, str(tmp_path))).toPandas()
    out["name"] = out.path.str.rsplit("/", n=1).str[-1]
    by = out.set_index("name")

    assert by.loc["a.txt", "converted"] and by.loc["a.txt", "text"] == "plain text doc"
    assert by.loc["b.html", "converted"] and "Title & More" in by.loc["b.html", "text"]
    assert by.loc["c.csv", "converted"] and "name: ana" in by.loc["c.csv", "text"]
    assert by.loc["d.json", "converted"] and "b.c: x" in by.loc["d.json", "text"]
    assert not by.loc["e.pdf", "converted"]  # routed, not silently dropped
    assert by.loc["e.pdf", "text"] is None
    # n_chars consistent
    assert (by[by.converted].n_chars == by[by.converted].text.str.len()).all()
