"""URL normalization — canonical keys for crawl dedup and host graphs.

The reference keys its graph on raw extracted URLs (SURVEY.md §2.3 S1);
real crawls need a canonicalization pass first or the same page appears
under trivially different URLs. Standard web-pipeline normalization,
expressed entirely with engine-portable string functions (no UDF, no
backreference regexes — those differ between Java and RE2 dialects):

- scheme and host lowercased (path case is preserved — it is
  significant on most servers)
- a leading ``www.`` on the host dropped
- query string and fragment dropped
- trailing slashes on the path stripped

Single projection — fully pushdown/codegen-friendly at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SCHEME_HOST_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"


def host_of(col) -> F.Column:
    """Lowercased authority of a URL column, leading ``www.`` dropped;
    '' when unparseable."""
    h = F.lower(
        F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    return F.when(
        h.startswith("www."), F.substring(h, 5, 2**30)
    ).otherwise(h)


def host_graph(
    edges_urls: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """(src_host, dst_host, weight) — host-level aggregation of a
    page-level URL edge table (weight = page-edge count). The standard
    coarsening for site-level ranking and link-spam analysis; one
    partial-agg'd groupBy, scale-safe at any page-edge count."""
    return (
        edges_urls.select(
            host_of(F.col(src_col)).alias("src_host"),
            host_of(F.col(dst_col)).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def normalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """Adds ``out_col`` with the normalized form of ``url_col``.

    Unparseable values (no scheme://host) normalize to ''."""
    u = F.col(url_col)
    scheme_host = F.replace(
        F.lower(F.regexp_extract(u, _SCHEME_HOST_RE, 1)),
        F.lit("://www."),
        F.lit("://"),
    )
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), r"/+$", "")
    return df.withColumn(out_col, F.concat(scheme_host, path))
