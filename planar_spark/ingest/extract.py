"""HTML text + link extraction as vectorized pandas UDFs.

The reference's only ingestion parser is an edgelist-CSV splitter
(tools/graph_converter/graph_converter.cpp:61-103). Our input is a
Common-Crawl-style pages table (url, warc_ts, html binary, text, lang);
the per-row invariant is that ``extract_text(html)`` is byte-identical
to the table's ``text`` column, and ``extract_links(html)`` yields
exactly the page's out-edges.

Extraction spec (deterministic, regex-based — the fixture generator in
pages.py emits HTML conforming to it):

- text  := title + "\\n" + <p> body text + ("\\n" + anchor texts joined
  by " " if any anchors)
- links := the href values of all <a> tags, in document order

Both UDFs are Arrow-vectorized (pandas Series in/out); no per-row Python
crosses the JVM boundary row-at-a-time.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.DOTALL)
_P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_A_RE = re.compile(r'<a\s+href="([^"]*)"\s*>(.*?)</a>', re.DOTALL)


def extract_text_py(html: bytes | str) -> str:
    """Pure-Python extraction (the spec; also used by the oracle/tests)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8")
    title = _TITLE_RE.search(html)
    body = _P_RE.search(html)
    anchors = [m[1] for m in _A_RE.findall(html)]
    parts = [title.group(1) if title else "", body.group(1) if body else ""]
    text = "\n".join(parts)
    if anchors:
        text += "\n" + " ".join(anchors)
    return text


def extract_links_py(html: bytes | str) -> list[str]:
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8")
    return [m[0] for m in _A_RE.findall(html)]


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_links_py)


def extract_edges(pages_df):
    """pages(url, html, ...) -> edges_raw(src_url, dst_url).

    One vectorized UDF produces the href array; the explode and the
    projection stay JVM-side.
    """
    return (
        pages_df.select(
            F.col("url").alias("src_url"),
            F.explode(extract_links_udf(F.col("html"))).alias("dst_url"),
        )
    )
