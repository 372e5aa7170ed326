"""URL canonicalization — the key-maker for URL-level dedup, per-
domain quotas and crawl-frontier joins in a web-scale pipeline.

Canonical form (the common subset of the public crawl-dedup rules —
cf. RFC 3986 §6 normalization):

1. strip the fragment (``#...``)
2. lowercase scheme and authority (host[:port]) — path/query stay
   case-sensitive
3. drop default ports (``:80`` for http, ``:443`` for https)
4. drop tracking parameters (``utm_*``)
5. sort remaining query parameters bytewise (param order is not
   semantic); drop an empty ``?``
6. drop a single trailing ``/`` on a non-root path

Everything is JVM-side regex/array expressions (whole-stage codegen,
no Python, no UDF) so the canonical key can be computed inline at the
scan before any shuffle; dedup on the canonical URL is then the same
16-byte-digest hash-aggregate as exact text dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCHEME_AUTH = r"^([A-Za-z][A-Za-z0-9+.-]*://)(?:([^/?#@]*)@)?([^/?#]*)"


def canonical_url(url_col: str) -> Column:
    """Column expression for the canonical form of ``url_col``."""
    u = F.col(url_col)
    u = F.regexp_replace(u, r"#.*$", "")                      # 1 fragment
    # 2: lowercase scheme and host[:port] ONLY — RFC 3986 §6.2.2.1
    # makes userinfo case-SENSITIVE (round-3 review finding: naively
    # lowercasing the whole authority merges URLs with distinct
    # credentials and corrupts the stored canonical form)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_AUTH, 1))
    userinfo = F.regexp_extract(u, _SCHEME_AUTH, 2)
    hostport = F.lower(F.regexp_extract(u, _SCHEME_AUTH, 3))
    rest = F.regexp_replace(u, _SCHEME_AUTH, "")
    u = F.concat(
        scheme,
        F.when(userinfo != "", F.concat(userinfo, F.lit("@"))).otherwise(
            F.lit("")
        ),
        hostport,
        rest,
    )
    # 3 default ports — capture-the-follower instead of lookahead so
    # the same pattern family works in RE2 engines (the DuckDB oracle);
    # an optional userinfo prefix ([^/?#@]*@) is allowed before the
    # host, else a password's colon (user:pw@host:80) stops the host
    # class early and the default port survives (round-3 advice)
    u = F.regexp_replace(u, r"^(http://(?:[^/?#@]*@)?[^/?#:]*):80([/?#]|$)", "$1$2")
    u = F.regexp_replace(u, r"^(https://(?:[^/?#@]*@)?[^/?#:]*):443([/?#]|$)", "$1$2")
    # 4+5: split off the query; drop empty and utm_* params; sort
    base = F.regexp_replace(u, r"\?.*$", "")
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.startswith("utm_"),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    u = F.when(sorted_q == "", base).otherwise(F.concat(base, F.lit("?"), sorted_q))
    # 6 trailing slash on non-root path
    u = F.regexp_replace(u, r"(://[^/?#]+/[^?#]*[^/?#])/(\?|$)", "$1$2")
    return u


def canonical_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, canonical_url, host, registered_domain): host is the
    lowercased authority minus port/userinfo; registered_domain is the
    last two labels (a public-suffix list is the production upgrade —
    out of container scope, seam documented)."""
    canon = canonical_url(url_col)
    host = F.regexp_extract(
        F.lower(F.col(url_col)), r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1
    )
    reg_dom = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return df.select(
        F.col(url_col),
        canon.alias("canonical_url"),
        host.alias("host"),
        reg_dom.alias("registered_domain"),
    )


def url_dedup_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Groups of URLs identical after canonicalization: (canonical_url,
    n_variants, keep_url). Same digest-key shuffle shape as exact text
    dedup — at 10^12 pages the canonical key computes at the scan and
    only the (md5, url-min) pairs shuffle."""
    canon = canonical_url(url_col)
    return (
        df.select(canon.alias("canonical_url"), F.col(url_col))
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_variants"),
            F.min(url_col).alias("keep_url"),
        )
        .filter(F.col("n_variants") > 1)
    )
