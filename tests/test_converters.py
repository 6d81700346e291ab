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
    assert convert_payload("pdf", b"%PDF...") is None  # no text streams
    assert convert_payload("txt", b" hi \n") == "hi"
    assert convert_payload("HTML", HTML) is not None


def test_pdf_roundtrip_and_extraction():
    from vector_search_optimization_spark.sources.converters import (
        pdf_to_text,
        text_to_pdf,
    )

    cases = [
        "hello world",
        "multi\nline\ntext",
        "escapes ()\\ and (nested (parens)) ok",
        "latin1: café über",
        "  outer spaces trimmed  ",
    ]
    for t in cases:
        assert pdf_to_text(text_to_pdf(t)) == t.strip(" \t\n\r\f\v")
    # non-latin1 chars are written as '?' — length preserved
    assert pdf_to_text(text_to_pdf("emoji \U0001F600 x")) == "emoji ? x"
    # dispatch goes through convert_payload now
    assert convert_payload("pdf", text_to_pdf("via dispatch")) == "via dispatch"
    # junk / stream-less / image-only pdfs stay unconverted
    assert pdf_to_text(b"not a pdf") is None
    assert convert_payload("pdf", b"%PDF-1.4 binary stuff") is None


def test_pdf_raw_stream_and_tj_arrays():
    import zlib

    from vector_search_optimization_spark.sources.converters import pdf_to_text

    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 40 >>\nstream\n"
        b"BT (plain stream) Tj ET\nendstream\nendobj\n"
    )
    assert pdf_to_text(raw) == "plain stream"

    content = b"BT [(A) -120 (B) 3 (C)] TJ (next) ' <48690A> Tj ET"
    s = zlib.compress(content)
    flate = (
        b"%PDF-1.4\n<< /Filter /FlateDecode /Length "
        + str(len(s)).encode()
        + b" >>\nstream\n"
        + s
        + b"\nendstream"
    )
    # TJ kerns concatenate; ' starts a new line; hex strings decode
    assert pdf_to_text(flate) == "ABC\nnextHi"


def _mini_docx() -> bytes:
    import io
    import zipfile

    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>First paragraph.</w:t></w:r>"
        "<w:r><w:t> Second run.</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>Second paragraph.</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def _mini_pptx() -> bytes:
    import io
    import zipfile

    def slide(text):
        return (
            '<?xml version="1.0"?>'
            '<p:sld xmlns:p="http://schemas.openxmlformats.org/'
            'presentationml/2006/main" '
            'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
            f"<p:cSld><a:t>{text}</a:t></p:cSld></p:sld>"
        )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("ppt/slides/slide2.xml", slide("slide two"))
        z.writestr("ppt/slides/slide1.xml", slide("slide one"))
        z.writestr("ppt/slides/slide10.xml", slide("slide ten"))
    return buf.getvalue()


def test_docx_paragraphs_and_runs():
    from vector_search_optimization_spark.sources.converters import docx_to_text

    assert docx_to_text(_mini_docx()) == (
        "First paragraph. Second run.\nSecond paragraph."
    )


def test_pptx_slides_in_numeric_order():
    from vector_search_optimization_spark.sources.converters import pptx_to_text

    # numeric sort: slide10 after slide2, not lexicographic
    assert pptx_to_text(_mini_pptx()) == "slide one\n\nslide two\n\nslide ten"


def test_xlsx_payload_to_text(tmp_path):
    from vector_search_optimization_spark.sources.converters import xlsx_to_text
    from vector_search_optimization_spark.sources.xlsx import write_xlsx

    p = tmp_path / "t.xlsx"
    write_xlsx(str(p), ["name", "age"], [["ana", 3], ["bob", 5]])
    assert xlsx_to_text(p.read_bytes()) == "name: ana, age: 3\nname: bob, age: 5"


def test_convert_payload_ooxml_and_corrupt():
    assert "First paragraph." in convert_payload("docx", _mini_docx())
    assert convert_payload("pptx", _mini_pptx()).startswith("slide one")
    assert convert_payload("docx", b"not a zip") is None  # corrupt → routed


def test_ipynb_cells_in_order():
    import json as _json

    from vector_search_optimization_spark.sources.converters import ipynb_to_text

    nb = _json.dumps(
        {
            "cells": [
                {"cell_type": "markdown", "source": ["# Title\n", "intro"]},
                {"cell_type": "code", "source": ["x = 1\n", "print(x)"]},
                {"cell_type": "code", "source": ["   "]},  # blank: dropped
            ]
        }
    )
    text = ipynb_to_text(nb)
    assert text == "# Title\nintro\n\n```\nx = 1\nprint(x)\n```"


def test_rss_items_and_generic_xml_fallback():
    from vector_search_optimization_spark.sources.converters import rss_to_text

    rss = (
        "<rss><channel><item><title>Post A</title>"
        "<description>Body &amp; more</description></item>"
        "<item><title>Post B</title></item></channel></rss>"
    )
    assert rss_to_text(rss) == "Post A: Body & more\nPost B"
    assert rss_to_text("<cfg><k>v</k></cfg>") == "v"  # non-feed: tag strip


def test_zip_walks_members_one_level():
    import io as _io
    import zipfile

    from vector_search_optimization_spark.sources.converters import zip_to_text

    inner = _io.BytesIO()
    with zipfile.ZipFile(inner, "w") as z:
        z.writestr("deep.txt", "too deep")
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", "member text")
        z.writestr("b.csv", "h\nv")
        z.writestr("c.bin", b"\x00\x01")  # unconvertible: skipped
        z.writestr("nested.zip", inner.getvalue())  # one level only
    text = zip_to_text(buf.getvalue())
    assert "=== a.txt ===\nmember text" in text
    assert "h: v" in text
    assert "too deep" not in text and "c.bin" not in text
    assert zip_to_text(b"not a zip") is None


def test_binaryfile_ingest_end_to_end(spark, tmp_path):
    (tmp_path / "a.txt").write_bytes(b"plain text doc")
    (tmp_path / "b.html").write_bytes(HTML)
    (tmp_path / "c.csv").write_bytes(CSV)
    (tmp_path / "d.json").write_bytes(JSON)
    (tmp_path / "e.pdf").write_bytes(b"%PDF-1.4 binary stuff")
    (tmp_path / "f.docx").write_bytes(_mini_docx())
    (tmp_path / "g.pptx").write_bytes(_mini_pptx())

    out = convert_documents(read_binary_docs(spark, str(tmp_path))).toPandas()
    out["name"] = out.path.str.rsplit("/", n=1).str[-1]
    by = out.set_index("name")

    assert by.loc["a.txt", "converted"] and by.loc["a.txt", "text"] == "plain text doc"
    assert by.loc["b.html", "converted"] and "Title & More" in by.loc["b.html", "text"]
    assert by.loc["c.csv", "converted"] and "name: ana" in by.loc["c.csv", "text"]
    assert by.loc["d.json", "converted"] and "b.c: x" in by.loc["d.json", "text"]
    assert not by.loc["e.pdf", "converted"]  # routed, not silently dropped
    assert by.loc["e.pdf", "text"] is None
    assert by.loc["f.docx", "converted"] and "Second paragraph." in by.loc["f.docx", "text"]
    assert by.loc["g.pptx", "converted"] and "slide ten" in by.loc["g.pptx", "text"]
    # n_chars consistent
    assert (by[by.converted].n_chars == by[by.converted].text.str.len()).all()


def test_pdf_literal_string_escape_edge_cases():
    """Spec edge cases that previously crashed extraction: \\8 and \\9 are
    unknown escapes (the digit survives), \\08 is octal NUL + literal 8,
    unicode digits are not octal, and an unterminated hex string skips
    only its own token rather than aborting the remaining stream."""
    from vector_search_optimization_spark.sources.converters import (
        _pdf_content_text,
        _pdf_literal_string,
    )

    assert _pdf_literal_string(r"(a\9b)", 0)[0] == "a9b"
    assert _pdf_literal_string(r"(a\8b)", 0)[0] == "a8b"
    assert _pdf_literal_string(r"(a\08b)", 0)[0] == "a\x008b"
    assert _pdf_literal_string(r"(a\101b)", 0)[0] == "aAb"
    assert _pdf_literal_string("(a\\²b)", 0)[0] == "a²b"

    # unterminated hex token must not swallow the rest of the stream
    data = b"BT (before) Tj < 4142 (after) Tj ET"
    out = _pdf_content_text(data)
    assert "before" in out and "after" in out
