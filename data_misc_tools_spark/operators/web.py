"""Web-corpus curation: URL decomposition, domain blocklists,
per-domain quotas.

Beyond-reference capability: web-crawl training corpora are curated by
URL — blocklist known-bad hosts, cap the share any single domain can
contribute (C4/RefinedWeb both do this), and stratify by registrable
domain. All parsing is scan-local regexp in the Java-regex ∩ RE2
common subset (the pii_scrub convention) so Spark and the DuckDB
oracle decompose URLs byte-identically; Spark's ``parse_url`` built-in
is an alternative when oracle parity is not needed.

Scale shape: parsing and blocklisting are narrow (no shuffle); the
quota is one shuffle on the domain — AQE splits skewed mega-domains
before the rank; the deterministic hash-rank keeps the retained set
stable under re-partitioning (the sampling.py invariant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_parts",
    "with_url_parts",
    "blocklist_filter",
    "per_domain_cap",
    "canonical_url",
]

_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)"
_QUERY_RE = "\\?([^#]*)"
_DOMAIN_RE = "([^.]+\\.[^.]+)$"


def url_parts(url: Column | str) -> Column:
    """struct(host, domain, path, query) from a URL string.

    ``domain`` is the last-two-dot-labels approximation of the
    registrable domain (a full public-suffix-list lookup is a
    broadcast join against the PSL table — out of scope here); a
    port, having no dot, stays attached. Missing components come back
    as '' (both engines' regexp_extract no-match value).
    """
    u = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(u, _HOST_RE, 1)
    return F.struct(
        host.alias("host"),
        F.regexp_extract(host, _DOMAIN_RE, 1).alias("domain"),
        F.regexp_extract(u, _PATH_RE, 1).alias("path"),
        F.regexp_extract(u, _QUERY_RE, 1).alias("query"),
    )


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append host/domain/path/query columns parsed from ``url_col``."""
    return df.withColumn("__u", url_parts(url_col)).select(
        "*", "__u.host", "__u.domain", "__u.path", "__u.query"
    ).drop("__u")


def blocklist_filter(
    df: DataFrame, blocked: list[str], domain_col: str = "domain"
) -> DataFrame:
    """Drop rows whose domain is on the blocklist. Small lists inline
    into the scan predicate (pushed to the source); for large lists
    pass a DataFrame and use a broadcast anti-join instead."""
    return df.where(~F.col(domain_col).isin(blocked))


def per_domain_cap(
    df: DataFrame,
    cap: int,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    salt: str = "domcap:",
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, chosen by the
    deterministic md5 hash-rank (partitioning-independent, engine-
    portable — the per_group_reservoir rule with the rank retained).
    Appends the 1-based ``rank`` within the domain."""
    from pyspark.sql.window import Window

    from data_misc_tools_spark.operators.sampling import _hash_u32

    w = Window.partitionBy(domain_col).orderBy(
        _hash_u32(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= cap)
    )


# Tracking parameters dropped by canonical_url — the RefinedWeb/CCNet
# URL-dedup convention. Anchored key= match; Java-regex ∩ RE2 subset.
TRACKING_PARAM_RE = "^(utm_[a-z]+|gclid|fbclid|msclkid|mc_eid|ref|igshid)="

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_ANYPATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)"


def canonical_url(url: Column | str, strip_www: bool = True) -> Column:
    """Canonical form of a URL for exact URL-level dedup (the first,
    cheapest dedup pass in a web-crawl pipeline — identical pages
    refetched under trivially different URLs):

    - scheme and host lowercased; default ports stripped (http:80,
      https:443); leading ``www.`` stripped (``strip_www=False`` to
      keep);
    - fragment dropped; tracking query params dropped
      (:data:`TRACKING_PARAM_RE`); surviving params SORTED so
      ``?b=2&a=1`` == ``?a=1&b=2``;
    - empty path -> '/'; trailing slashes trimmed from non-root
      paths.

    Pure scan-local expressions in the Java-regex ∩ RE2 subset plus
    array_sort — byte-identical in Spark and DuckDB, no UDF, no
    shuffle. Userinfo (user:pass@host) is not parsed (rare in crawl
    data; such URLs canonicalize with the userinfo inside the host
    token).
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hp = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hp, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hp, ":443$", ""))
        .otherwise(hp)
    )
    if strip_www:
        host = F.regexp_replace(host, "^www\\.", "")
    path = F.regexp_extract(u, _ANYPATH_RE, 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, "\\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    canon_q = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), canon_q)),
    )
