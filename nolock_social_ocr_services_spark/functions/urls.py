"""URL curation for web-scale corpus ingestion: canonicalization,
registered-domain extraction, and blocklist filtering.

Web pipelines (RefinedWeb, CCNet, Gopher's ingestion stage) run URL
filtering FIRST — before any byte of the payload is touched — because
it is the only filter whose cost is independent of document size.
Everything here is a regexp/string-expression chain over the URL
column: whole-stage codegen, zero Python, zero shuffles; the blocklist
join broadcasts (blocklists are MB-scale; the corpus is the 100-TB
side and never moves).

Canonicalization (the dedup-key form of a URL):
  * scheme and host lowercased (path/query case is preserved — it is
    significant on most servers),
  * default ports stripped (``:80`` for http, ``:443`` for https),
  * fragment stripped (never sent to the server),
  * tracking parameters stripped (``utm_*``, ``fbclid``, ``gclid``,
    ``ref``) with dangling ``?``/``&`` cleanup.

``registered_domain`` is the deliberately-naive last-two-label rule;
a production pipeline swaps in the public-suffix list as a broadcast
table (same join shape, ~10k rows) — documented here rather than
vendored so the sandbox stays dependency-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scheme://host[:port] prefix (userinfo not handled — see module doc)
_SCHEME_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
#: tracking params stripped by canonicalize_url (lowercase names; run
#: after host lowercasing, before dangling-separator cleanup)
_TRACKING = r"(utm_[a-z0-9_]*|fbclid|gclid|ref)=[^&#]*&?"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL column — pure expression chain, one
    pass, codegen'd. See module docstring for the exact rules."""
    head = F.lower(F.regexp_extract(url, _SCHEME_HOST, 0))
    head = F.when(
        head.startswith("http://"), F.regexp_replace(head, ":80$", "")
    ).otherwise(
        F.when(
            head.startswith("https://"),
            F.regexp_replace(head, ":443$", ""),
        ).otherwise(head)
    )
    rest = F.regexp_replace(url, _SCHEME_HOST, "")
    rest = F.regexp_replace(rest, "#.*$", "")
    rest = F.regexp_replace(rest, _TRACKING, "")
    rest = F.regexp_replace(rest, "[?&]$", "")
    return F.concat(head, rest)


def registered_domain(canon_url: Column) -> Column:
    """Last-two-label registered domain of an already-canonical URL
    (lowercased host, default port stripped). Production note: replace
    with a public-suffix-list broadcast join; the rule here is the
    PSL's fallback for unlisted suffixes."""
    host = F.regexp_extract(canon_url, r"^https?://([^/?#:]*)", 1)
    return F.regexp_extract(host, r"([^.]+[.][^.]+)$", 1)


def url_filter(
    df: DataFrame, blocked_domains: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose registered domain is on the blocklist.

    ``blocked_domains`` is a one-column (``domain``) DataFrame;
    blocklists are small by nature, so the join is a BROADCAST
    left-anti — the corpus side never shuffles. Adds ``canon_url``
    and ``domain`` audit columns to the survivors.
    """
    canon = canonicalize_url(F.col(url_col))
    with_key = df.withColumn("canon_url", canon).withColumn(
        "domain", registered_domain(F.col("canon_url"))
    )
    return with_key.join(
        F.broadcast(blocked_domains.select("domain")),
        on="domain",
        how="left_anti",
    )
