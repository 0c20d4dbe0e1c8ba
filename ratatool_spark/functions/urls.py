"""URL canonicalization — the web-corpus curation primitives.

Common-Crawl-scale pipelines dedup and cap BY URL before any content
pass: the same page is fetched under `http`/`https`, with and without
`www.`, with tracking parameters (`utm_*`, `gclid`, `fbclid`), default
ports, fragments, and query-parameter orderings.  Canonicalizing first
turns that whole equivalence class into one exact-dedup key
(operators/dedup.exact_dedup) and one per-domain cap key
(operators/corpus.cap_per_group).

Everything here is pure Column expressions — regexp_extract + array ops,
JVM-side, whole-stage-codegen friendly, zero Python boundary — and every
step has an exact DuckDB replay (the `url_normalize_docs` oracle gate),
so canonical keys derived in this engine match keys derived by any other
engine running the same rules: the property that lets a crawl frontier,
a dedup job, and an audit query agree on identity.

Scope note: this is RFC-3986-shaped canonicalization for http(s) crawl
URLs (scheme/host lowercasing, default-port and fragment stripping,
tracking-parameter removal, query-parameter sorting, eTLD+1 via a
compact two-level-suffix heuristic).  It does not decode percent-escapes
or punycode — those change identity semantics and belong to a fetch
layer, not a keying layer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking parameters stripped by normalize_url: ad-click and analytics
# attribution only — never functional parameters. Prefix match for the
# utm_ family, exact-name match for the click ids.
TRACKING_PREFIXES = ("utm_",)
TRACKING_NAMES = ("fbclid", "gclid", "msclkid", "mc_eid")

# Two-level public suffixes for the eTLD+1 heuristic. A compact, pinned
# subset of the Mozilla Public Suffix List's most common entries — enough
# for per-domain capping/reporting; swap in the full PSL as a broadcast
# table when exactness across every ccTLD matters.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "org.nz", "net.nz",
    "com.br", "org.br", "net.br",
    "co.in", "org.in", "net.in",
    "co.za", "org.za", "com.mx", "com.ar", "com.tr",
    "com.cn", "net.cn", "org.cn", "com.tw", "com.hk",
    "co.kr", "or.kr", "com.sg", "com.my",
)


def url_scheme(url: Column) -> Column:
    """Lowercased scheme, '' when the value has none."""
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(url: Column, strip_www: bool = False) -> Column:
    """Lowercased host without port. ``strip_www`` drops ONE leading
    ``www.`` label (common crawl-identity choice; off by default because
    `www.` and apex can serve different content)."""
    host = F.lower(
        F.split(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1), ":")[0]
    )
    if strip_www:
        host = F.when(
            host.startswith("www."), F.substring(host, 5, 2147483647)
        ).otherwise(host)
    return host


def registered_domain(host: Column) -> Column:
    """eTLD+1 of a lowercase host: last two labels, or last three when
    the final two form a known two-level public suffix (co.uk, com.au,
    …). Hosts with fewer labels pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    return (
        F.when(n <= 2, host)
        .when(last2.isin(*TWO_LEVEL_SUFFIXES) & (n >= 3), last3)
        .otherwise(last2)
    )


def _is_tracking_param(p: Column) -> Column:
    name = F.split(p, "=")[0]
    cond = F.lit(False)
    for pref in TRACKING_PREFIXES:
        cond = cond | name.startswith(pref)
    return cond | name.isin(*TRACKING_NAMES)


def normalize_url(url: Column) -> Column:
    """Canonical form of an http(s) URL, as one expression tree:

    - scheme and host lowercased;
    - default port stripped (``:80`` for http, ``:443`` for https; other
      ports kept);
    - empty path becomes ``/``;
    - fragment dropped (client-side only — never part of the resource);
    - tracking parameters removed (``utm_*`` prefix + known click ids),
      survivors SORTED bytewise so parameter order stops splitting the
      equivalence class; an emptied query drops its ``?``.

    Idempotent: normalize(normalize(u)) == normalize(u) (test-pinned).
    NULL and scheme-less strings yield NULL — feed crawl URLs, not
    arbitrary text."""
    scheme = url_scheme(url)
    authority = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host = F.lower(F.split(authority, ":")[0])
    port = F.split(authority, ":")[1]
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)

    has_port = F.size(F.split(authority, ":")) > 1
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        has_port & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))

    kept = F.array_sort(
        F.filter(F.split(query, "&"), lambda p: ~_is_tracking_param(p) & (p != ""))
    )
    query_part = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))

    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    return F.when(
        scheme != "",
        F.concat(scheme, F.lit("://"), host, port_part, path_part, query_part),
    )
