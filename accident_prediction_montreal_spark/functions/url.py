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
#: Tracking params must be ANCHORED to a separator: an unanchored
#: alternation matches tracking names as substrings of longer parameter
#: names ('?xfbclid=1' -> '?x', '?my_utm_x=1' -> '?my_'), corrupting the
#: query string and over-merging distinct URLs. The leading ([?&]) is
#: captured and restored by the replacement; the inner '+' consumes a RUN
#: of consecutive tracking params in one match (a single leading-anchored
#: match would strip only every other param of a run, because the
#: replacement scan resumes after the consumed separator).
_RE_TRACKING = "([?&])((utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*&?)+"


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
    rest = F.regexp_replace(rest, _RE_TRACKING, "$1")
    rest = F.regexp_replace(rest, "[?&]$", "")  # dangling separator
    rest = F.regexp_replace(rest, "\\?&", "?")  # first param was tracking
    rest = F.regexp_replace(rest, "/+$", "")  # trailing slash == root
    return F.concat(scheme, F.lit("://"), host, rest)


def host_of(url: Column | str) -> Column:
    """Lowercased host (``www.`` and default ports NOT stripped — pair
    with :func:`canonicalize_url` output for the canonical host)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(u, _RE_HOST, 1))


#: Offline public-suffix-list SNAPSHOT (publicsuffix.org is the public
#: registry real pipelines ship a pinned copy of; this subset covers the
#: fixture's flavors — generic TLDs, a two-label country registry, and a
#: PRIVATE-section entry (github.io) where user sites are registrable one
#: label below what looks like a domain). Swap in the full ~9k-entry
#: snapshot at deploy time: it rides into the plan as ONE literal
#: array<string> value (a single serialized Literal, not per-element
#: expressions), so the lookup stays inside whole-stage codegen with no
#: join and no UDF at any PSL size.
PSL_SNAPSHOT = [
    "com", "org", "net", "io", "gov", "edu",
    "co.uk", "org.uk", "ac.uk", "com.au",
    "github.io",
]


def registrable_domain(
    host: Column | str, psl: list[str] | None = None
) -> Column:
    """The PSL registrable domain (eTLD+1) of a lowercased host, as a
    pure column expression: the host's longest dot-suffix present in
    the public-suffix list plus one label; NULL when the host IS a
    public suffix (or a single label with no registrable part). The
    PSL default rule applies: a host whose every proper suffix is
    unknown treats its last label as the public suffix.

    This is the unit per-domain quotas and blocklists must key on —
    'example.org' can block subdomains, but bare 'org' must not
    (org IS the public suffix, everything under it belongs to
    different owners).
    """
    h = F.col(host) if isinstance(host, str) else host
    psl_lit = F.lit(psl if psl is not None else PSL_SNAPSHOT)
    labels = F.split(h, "\\.")
    n = F.size(labels)

    def suffix(length):
        return F.array_join(F.slice(labels, n - length + 1, length), ".")

    cand = F.transform(
        F.sequence(F.lit(1), n),
        lambda length: F.when(F.array_contains(psl_lit, suffix(length)), length),
    )
    psl_len = F.coalesce(
        F.array_max(F.filter(cand, lambda x: x.isNotNull())), F.lit(1)
    )
    return F.when(n > psl_len, suffix(psl_len + 1))


def registrable_domain_sql(expr: str, psl: list[str] | None = None) -> str:
    """DuckDB mirror of :func:`registrable_domain`, kept adjacent so the
    two cannot drift. ``expr`` must be a bare column/identifier (it is
    re-referenced several times)."""
    values = ", ".join(
        "'" + s + "'" for s in (psl if psl is not None else PSL_SNAPSHOT)
    )
    labels = f"string_split({expr}, '.')"
    n = f"len({labels})"

    def suffix(length: str) -> str:
        return f"array_to_string({labels}[{n} - ({length}) + 1:], '.')"

    cand = (
        f"list_transform(range(1, {n} + 1), "
        f"L -> CASE WHEN list_contains([{values}], {suffix('L')}) THEN L END)"
    )
    psl_len = (
        f"COALESCE(list_max(list_filter({cand}, x -> x IS NOT NULL)), 1)"
    )
    return (
        f"CASE WHEN {n} > {psl_len} THEN {suffix(f'{psl_len} + 1')} END"
    )


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
    rest = f"regexp_replace({rest}, '{_RE_TRACKING}', '\\1', 'g')"
    rest = f"regexp_replace({rest}, '[?&]$', '')"
    rest = f"regexp_replace({rest}, '\\?&', '?')"
    rest = f"regexp_replace({rest}, '/+$', '')"
    return f"({scheme} || '://' || {host} || {rest})"
