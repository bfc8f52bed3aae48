"""URL canonicalization — the first normalization pass of every web
corpus curation pipeline (CCNet-style dedup keys on the canonical URL,
per-domain quotas key on the registrable host).

Pure JVM column expressions (regexp_extract / regexp_replace / lower)
so the pass stays inside whole-stage codegen — no UDF. The regex subset
is deliberately common to Java (Spark) and RE2 (DuckDB) so the same
pipeline is expressible as an ANSI oracle.

Canonical form produced:
  * scheme and host lowercased (path/query case is preserved — paths
    are case-sensitive by RFC 3986);
  * a leading ``www.`` stripped from the host;
  * default ports dropped (``:443`` for https, ``:80`` for http);
  * the fragment removed;
  * tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``),
    other query parameters preserved in order;
  * trailing slashes stripped (the empty path means root).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: regexes shared with the SQL oracle builders below
_RE_SCHEME = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_RE_HOST = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_RE_REST = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$"
_RE_TRACKING = "(utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*&?"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL as a pure column expression (see module doc)."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, "#.*$", "")  # fragment first: simplest grammar
    scheme = F.lower(F.regexp_extract(u, _RE_SCHEME, 1))
    host = F.lower(F.regexp_extract(u, _RE_HOST, 1))
    host = F.regexp_replace(host, "^www\\.", "")
    host = F.when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, ":443$", ""),
    ).when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, ":80$", ""),
    ).otherwise(host)
    rest = F.regexp_extract(u, _RE_REST, 1)
    rest = F.regexp_replace(rest, _RE_TRACKING, "")
    rest = F.regexp_replace(rest, "[?&]$", "")  # dangling separator
    rest = F.regexp_replace(rest, "\\?&", "?")  # first param was tracking
    rest = F.regexp_replace(rest, "/+$", "")  # trailing slash == root
    return F.concat(scheme, F.lit("://"), host, rest)


def host_of(url: Column | str) -> Column:
    """Lowercased host (``www.`` and default ports NOT stripped — pair
    with :func:`canonicalize_url` output for the canonical host)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(u, _RE_HOST, 1))


def canonicalize_url_sql(expr: str) -> str:
    """The identical canonicalization over a SQL expression — DuckDB
    (RE2) mirror of :func:`canonicalize_url`, kept adjacent so the two
    pipelines cannot drift silently. DuckDB replaces the FIRST match
    unless the 'g' flag is passed; Spark always replaces all — 'g'
    everywhere a pattern can occur more than once."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '{_RE_SCHEME}', 1))"
    host = f"lower(regexp_extract({u}, '{_RE_HOST}', 1))"
    host = f"regexp_replace({host}, '^www\\.', '')"
    host = (
        f"CASE WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '') "
        f"WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '') "
        f"ELSE {host} END"
    )
    rest = f"regexp_extract({u}, '{_RE_REST}', 1)"
    rest = f"regexp_replace({rest}, '{_RE_TRACKING}', '', 'g')"
    rest = f"regexp_replace({rest}, '[?&]$', '')"
    rest = f"regexp_replace({rest}, '\\?&', '?')"
    rest = f"regexp_replace({rest}, '/+$', '')"
    return f"({scheme} || '://' || {host} || {rest})"
