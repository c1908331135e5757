"""HTML → text extraction for the webtext ingest path.

The corpus's raw column is ``html: binary`` (a Common-Crawl-style capture);
the indexed column is ``text: string``. This module is the bridge — a
deterministic extractor with the per-row invariant the pipeline is built
around: for every url, ``extract_text(html) == text`` byte-identically
(pinned by tests/test_extract.py against the synthesized corpus, whose
``text`` column is the ground truth the html was rendered from).

Extraction semantics (deterministic, dependency-free):

- decode utf-8 (errors replaced, never raised — a malformed capture must
  not kill a 10^12-row build);
- keep character data from BODY content only: everything inside ``<head>``,
  ``<title>``, ``<script>``, ``<style>``, ``<template>`` and comments is
  dropped (titles/scripts are markup metadata, not page text); ``</head>``
  may be omitted (it is optional in HTML5) — ``<body>`` implies it;
- entities unescaped (``&amp;`` → ``&``) by html.parser itself;
- whitespace collapsed to single spaces, leading/trailing stripped — the
  canonical form that makes the invariant byte-exact regardless of how the
  markup was pretty-printed.

Spark-side it ships as an Arrow-batched pandas UDF (``extract_text_udf``):
HTML parsing is inherently per-document, but the transfer is columnar and
the loop never crosses the JVM boundary per row — the pattern the rest of
the analysis chain uses (analysis/spark.py). At scale the extraction is a
map-only stage: no shuffle, pipelined into tokenize's source scan.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SKIP = frozenset(("script", "style", "template", "title"))

# <head> content ends at any of these even when </head> is omitted —
# HTML5 makes the head end tag optional (implied by the first body-level
# element), and html.parser does NOT synthesize implied end tags, so a
# depth counter keyed on </head> would swallow the whole document body.
_HEAD_ENDERS = frozenset(("body", "frameset"))


class _TextExtractor(HTMLParser):
    """Collects character data outside head/title/script/style/template."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0   # script/style/template/title nesting
        self._in_head = False
        self._body_seen = False
        self.parts: list = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
        elif tag == "head" and not self._body_seen:
            self._in_head = True
        elif tag in _HEAD_ENDERS:
            self._in_head = False
            self._body_seen = True

    def handle_endtag(self, tag):
        if tag in _SKIP and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag == "head":
            self._in_head = False

    def handle_data(self, data):
        if self._skip_depth == 0 and not self._in_head and data:
            self.parts.append(data)


def extract_text(html: bytes | str | None) -> str | None:
    """Pure-Python twin (drives the UDF; usable driver-side and in the
    oracle). None in → None out; undecodable bytes are replaced, malformed
    markup yields best-effort text — never an exception."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # keep whatever was collected before the parse error
    return " ".join("".join(p.parts).split())


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


def with_extracted_text(pages: DataFrame, html_col: str = "html",
                        out_col: str = "text") -> DataFrame:
    """Ingest adapter: fill ``out_col`` from ``html_col`` wherever it is
    null (captures that shipped with pre-extracted text keep it — the
    invariant guarantees both routes agree). Column-level, map-only; the
    optimizer pipelines it into the index build's one source scan."""
    if out_col in pages.columns:
        # gate INSIDE the UDF input: Spark evaluates pandas UDFs in an
        # unconditional ArrowEvalPython node, so coalesce(text, udf(html))
        # would still parse every row — feeding None for already-extracted
        # rows makes them a map lookup instead of an HTMLParser pass
        gated = F.when(F.col(out_col).isNull(), F.col(html_col))
        return pages.withColumn(
            out_col, F.coalesce(F.col(out_col), extract_text_udf(gated)))
    return pages.withColumn(out_col, extract_text_udf(F.col(html_col)))
