"""URL canonicalization for crawl pipelines — pure JVM expressions.

A crawl feed re-delivers the same page under syntactically different
URLs (case-shifted hosts, default ports, fragments, tracking params,
shuffled query order). Canonicalizing BEFORE url-keyed dedup
(streaming.dedup_pages_stream, jobs/run_dedup.py) is what makes the
url key actually identify a page; registrable_domain is the
domain-skew / politeness partitioning key the north rule's salted
repartitioning needs.

Canonical form (the spec, applied in order):
  1. fragment (#...) removed
  2. scheme lowercased; host lowercased, all leading "www." labels dropped
  3. default ports removed (http:80, https:443); other ports kept
  4. empty path -> "/"
  5. query: split on "&", drop empty params and tracking params
     (utm_*, fbclid, gclid, ref), sort the rest byte-wise, rejoin;
     a query left empty is dropped entirely
Inputs that do not look like scheme://... pass through unchanged
(canonicalization must never destroy a key it cannot parse).

registrable_domain: last two host labels, or last three when the
second-to-last is a common second-level registry label (co/com/net/
org/ac/gov/edu) under a 2-letter country TLD — the standard
public-suffix HEURISTIC (the full PSL is a data file, not an
algorithm; swap it in where exactness matters).

Everything here is plain pyspark.sql.functions (no UDF, no shuffle);
`canonical_url_py` / `registrable_domain_py` are the pure-Python
reference twins (parity pinned by test and by the q68 DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAMS = ("fbclid", "gclid", "ref")
_SLD = ("co", "com", "net", "org", "ac", "gov", "edu")


def _is_tracking(name: str) -> bool:
    return name.startswith("utm_") or name in TRACKING_PARAMS


def canonical_url_py(url: str) -> str:
    """Pure-Python reference twin of canonical_url (same spec)."""
    import re

    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(.*)$",
                 url)
    if not m or not m.group(2):
        return url
    scheme = m.group(1).lower()
    auth = m.group(2)
    pm = re.match(r"^(.*?)(?::(\d+))?$", auth)
    host, port = pm.group(1).lower(), pm.group(2)
    while host.startswith("www."):
        host = host[4:]
    if port and not ((scheme == "http" and port == "80")
                     or (scheme == "https" and port == "443")):
        host = f"{host}:{port}"
    path = m.group(3) or "/"
    rest = m.group(4)
    qm = re.match(r"^\?([^#]*)", rest)
    query = ""
    if qm:
        parts = sorted(
            p for p in qm.group(1).split("&")
            if p and not _is_tracking(p.split("=", 1)[0])
        )
        query = "&".join(parts)
    return f"{scheme}://{host}{path}" + (f"?{query}" if query else "")


def registrable_domain_py(host: str) -> str:
    labels = host.lower().split(".")
    if len(labels) < 2:
        return host.lower()
    if (len(labels) >= 3 and labels[-2] in _SLD
            and len(labels[-1]) == 2):
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def canonical_url(c: Column) -> Column:
    """Canonical URL as a single JVM expression tree (spec above)."""
    # fragment FIRST: a '?' inside the fragment is not a query
    u = F.regexp_replace(c, r"#.*", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    auth = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    host = F.lower(F.regexp_replace(auth, r":[0-9]+$", ""))
    host = F.regexp_replace(host, r"^(www\.)+", "")
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443"))
    hostport = F.when((port == "") | default, host).otherwise(
        F.concat_ws(":", host, port))
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_extract(u, r"\?(.*)", 1)
    keep = F.filter(
        F.split(rawq, "&"),
        lambda p: (p != "") & ~p.startswith("utm_")
        & ~F.split(p, "=")[0].isin(*TRACKING_PARAMS),
    )
    query = F.array_join(F.array_sort(keep), "&")
    rebuilt = F.concat(
        scheme, F.lit("://"), hostport, path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"),
                                                          query)),
    )
    return F.when((scheme == "") | (auth == ""), c).otherwise(rebuilt)


def registrable_domain(host: Column) -> Column:
    """Registrable domain of a (already canonical) host column."""
    labels = F.split(F.lower(host), r"\.")
    n = F.size(labels)
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    sld = F.element_at(labels, -2).isin(*_SLD)
    cc = F.length(F.element_at(labels, -1)) == 2
    return (
        F.when(n < 2, F.lower(host))
        .when((n >= 3) & sld & cc, last3)
        .otherwise(last2)
    )
