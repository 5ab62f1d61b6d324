"""Web-corpus hygiene operators: URL canonicalization and per-host
aggregation — the dedup key-prep stage of a crawl pipeline (CommonCrawl
style, where near-identical URLs differ only in tracking params, case,
default ports, fragments, or trailing slashes).

Everything is a chain of RE2-compatible regex projections (no
lookaround, no Python) so the pass is pure whole-stage codegen and the
IDENTICAL rules run in DuckDB/any ANSI engine for the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tracking query parameters stripped during canonicalization (public
# convention: Google Analytics utm_*, click ids)
TRACKING_PARAM_RE = r"(utm_[a-z]+|gclid|fbclid|msclkid|ref)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL string:

    1. scheme and host lowercased (path/query case is significant);
    2. fragment dropped;
    3. tracking params (``utm_*``/``gclid``/...) removed, with any
       orphaned ``&``/``?`` separators cleaned up;
    4. default ports (``:80`` http, ``:443`` https) dropped;
    5. trailing ``/`` dropped (except a bare host root).

    Pure regex chain — composes into one codegen'd projection.
    """
    # 1. lowercase scheme://host[:port] (the authority prefix only)
    head = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    tail = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    u = F.concat(head, tail)
    # 2. drop fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. strip tracking params then orphaned separators
    u = F.regexp_replace(u, TRACKING_PARAM_RE, "")
    u = F.regexp_replace(u, r"[?&]+$", "")       # trailing ? / &
    u = F.regexp_replace(u, r"\?&+", "?")         # ?&x -> ?x
    u = F.regexp_replace(u, r"&&+", "&")          # x&&y -> x&y
    u = F.regexp_replace(u, r"\?$", "")
    # 4. default ports (no lookahead — RE2 lacks it; optional tail group)
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80([/?#].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443([/?#].*)?$", r"$1$2")
    # 5. trailing path slash — before the query string or at the end —
    # but never the bare "scheme://host/" root
    u = F.regexp_replace(u, r"(://[^/?#]+/.+?)/+(\?.*)?$", r"$1$2")
    return u


def url_host(url: Column) -> Column:
    """Lowercased registrable host (authority minus port/userinfo)."""
    auth = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    auth = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.regexp_replace(auth, r":[0-9]+$", "")


def url_canonicalize(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-row canonicalization: (id, url, canonical, host). Zero
    shuffles; feeds exact_dedup on ``canonical`` or per-host quotas on
    ``host`` without another scan."""
    u = F.col(url_col)
    return df.select(
        F.col(id_col),
        u.alias("url"),
        canonical_url(u).alias("canonical"),
        url_host(u).alias("host"),
    )


def host_stats(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Crawl-frontier style per-host rollup: page count, distinct
    canonical URLs, and the duplicate surplus (pages - distinct
    canonicals — the URL-level dup mass canonicalization exposes).

    ONE hash aggregate on host (count + approx-free exact distinct via
    count(distinct) riding the same shuffle as an expand) — at 100 TB
    hosts are the natural partition key and heavy hosts are exactly the
    interesting rows.
    """
    c = url_canonicalize(df, url_col, id_col)
    return c.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("canonical").alias("n_canonical"),
        (F.count("*") - F.countDistinct("canonical")).alias("n_dup"),
    )
