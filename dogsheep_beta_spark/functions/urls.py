"""URL canonicalization — the dedup key a web corpus uses BEFORE any
content-level dedup (CCNet / RefinedWeb order: URL dedup → exact hash
→ near-dup).  Two crawls of ``HTTP://Example.COM:80/a/?b=2&a=1#x`` and
``http://example.com/a?a=1&b=2`` are the same page; canonicalizing to
one key collapses them in a single map-side pass.

Everything here is a pure codegen column expression (regexp + split +
sort_array + concat) so canonicalization costs no shuffle, and the
SAME steps are expressible in any SQL engine — which keeps the
declared query strict-hash oracle-able.

Canonical form (the common subset of the public normalization rules,
RFC 3986 §6 + the de-facto crawler extras), applied to ABSOLUTE URLs
(anything with a ``scheme://``):

- scheme and host lowercased
- the scheme's OWN default port stripped (``:80`` for http, ``:443``
  for https — a non-default port is a different origin and is kept,
  including ``http://h:443``)
- fragment (``#...``) dropped
- trailing ``/`` on a non-root path dropped
- query parameters SORTED lexicographically (param order is
  insignificant to almost every server); empty query dropped
- leading ``www.`` stripped (crawler convention: example.com and
  www.example.com are overwhelmingly the same origin)

Inputs WITHOUT a scheme (relative hrefs like ``a.html`` or
``/dir/page``) cannot be canonicalized without a base URL; they pass
through unchanged except for fragment removal — never collapsed into
a shared key.  Callers with a base URL resolve relative hrefs first.
NULL in → NULL out; no input ever raises (corpus rows must never
kill a task).

Deliberately NOT done (lossy or server-dependent): percent-decoding,
utm-param stripping, path-segment ``..`` resolution — callers layer
those if their corpus warrants.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_url(url: Column) -> Column:
    """Canonical URL key as described in the module docstring."""
    u = F.regexp_replace(url, r"#.*$", "")  # drop fragment first
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1)
    )
    # strip only the scheme's own default port — :443 on http is a
    # genuinely different origin and must survive
    deported = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_replace(deported, r"^www\.", "")
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    path = F.regexp_replace(path, r"(.)/$", "$1")  # trim non-root trailing /
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.sort_array(F.split(query, "&")), "&")
    return (
        F.when(url.isNull(), F.lit(None).cast("string"))
        .when(scheme == "", u)  # relative/scheme-less: defragment only
        .otherwise(
            F.concat(
                scheme,
                F.lit("://"),
                host,
                path,
                F.when(sorted_q == "", F.lit("")).otherwise(
                    F.concat(F.lit("?"), sorted_q)
                ),
            )
        )
    )


#: the DuckDB twin of canonicalize_url, as a SQL template over {col} —
#: kept next to the Spark expression so the two evolve together (the
#: oracle in __spark_entry__ interpolates it).  Structure mirrors the
#: Column expression clause for clause.
CANONICALIZE_URL_SQL = """
    CASE
    WHEN {col} IS NULL THEN NULL
    WHEN regexp_extract(regexp_replace({col}, '#.*$', ''),
                        '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) = ''
        THEN regexp_replace({col}, '#.*$', '')
    ELSE
        lower(regexp_extract(regexp_replace({col}, '#.*$', ''),
              '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
        regexp_replace(
            CASE lower(regexp_extract(regexp_replace({col}, '#.*$', ''),
                       '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
            WHEN 'http' THEN regexp_replace(
                lower(regexp_extract(regexp_replace({col}, '#.*$', ''),
                      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)), ':80$', '')
            WHEN 'https' THEN regexp_replace(
                lower(regexp_extract(regexp_replace({col}, '#.*$', ''),
                      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)), ':443$', '')
            ELSE lower(regexp_extract(regexp_replace({col}, '#.*$', ''),
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1))
            END, '^www\\.', '') ||
        CASE WHEN regexp_replace(
                regexp_extract(regexp_replace({col}, '#.*$', ''),
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)', 1),
                '(.)/$', '\\1') = ''
             THEN '/'
             ELSE regexp_replace(
                regexp_extract(regexp_replace({col}, '#.*$', ''),
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)', 1),
                '(.)/$', '\\1') END ||
        CASE WHEN regexp_extract(regexp_replace({col}, '#.*$', ''),
                                 '\\?(.*)$', 1) = '' THEN ''
             ELSE '?' || array_to_string(list_sort(string_split(
                regexp_extract(regexp_replace({col}, '#.*$', ''),
                               '\\?(.*)$', 1), '&')), '&') END
    END
"""


#: the one scheme://authority matcher the URL family shares — robots
#: filtering and canonicalization must split hosts identically or a
#: page could be fetched under one host key and deduped under another.
URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)"
URL_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$"


def url_host(url: Column) -> Column:
    """Raw authority (host[:port]) of an absolute URL; '' if none."""
    return F.regexp_extract(url, URL_HOST_RE, 1)


def url_path_query(url: Column) -> Column:
    """Path + query of an absolute URL ('/' for a bare origin)."""
    p = F.regexp_extract(url, URL_PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)
