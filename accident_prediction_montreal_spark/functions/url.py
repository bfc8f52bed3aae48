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


#: Longest rule in any form we accept (the real PSL's longest plain
#: rules are 4 labels; 6 leaves headroom). Both registrable-domain
#: forms reject longer rules up front so they can never diverge on a
#: rule neither would match.
PSL_MAX_RULE_LABELS = 6

#: Measured head-to-head of the two registrable-domain forms at 2M
#: hosts (scripts/bench_psl.py, BENCH_psl_r13.json): the broadcast-join
#: chain is flat ~2.5 s at EVERY list size while the literal-array HOF
#: scan degrades linearly in |PSL| (16 s at 1k rules, 151 s at 9k — its
#: array_contains is O(|PSL|) per candidate suffix). Production path is
#: therefore :func:`registrable_domain_join`; the HOF form stays as the
#: pure-Column semantic reference (it is what the DuckDB oracle mirrors
#: and what the property tests hold the join form equal to).


def _check_psl(psl: list[str]) -> list[str]:
    if len(set(psl)) != len(psl):
        raise ValueError("PSL rules must be unique")
    too_long = [r for r in psl if r.count(".") + 1 > PSL_MAX_RULE_LABELS]
    if too_long:
        raise ValueError(
            f"PSL rules over {PSL_MAX_RULE_LABELS} labels: {too_long[:3]}"
        )
    return psl


def registrable_domain_join(
    df, host_col: str, out_col: str, psl: list[str] | None = None
):
    """eTLD+1 via a chain of per-suffix-length BROADCAST left joins —
    the full-size-PSL form of :func:`registrable_domain` (identical
    semantics, property-tested equal in tests/test_url.py).

    Why a second form exists: the HOF form embeds the PSL as one
    literal array and ``array_contains`` scans it linearly — O(|PSL|)
    comparisons per candidate suffix per row, fine at fixture scale but
    ~9k rules x ~4 suffixes per host at corpus scale is 36k string
    compares per row. Here each suffix length L in 1..PSL_MAX_RULE_LABELS
    gets ONE broadcast hash join (left) against the rule table: O(1)
    hash probe per suffix, map-side only — NO shuffle of the corpus, no
    explode, no per-row aggregation. The rule table is deduplicated and
    bounded (~9k rows), so every join is a broadcast hash join by
    construction; row multiplicity is preserved (unique build side).
    """
    rules_list = _check_psl(psl if psl is not None else PSL_SNAPSHOT)
    spark = df.sparkSession
    reserved = {"__psl_labels"} | {
        f"__psl_r{L}" for L in range(1, PSL_MAX_RULE_LABELS + 1)
    }
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"registrable_domain_join temp columns clash with input "
            f"columns {sorted(clash)}; rename them first"
        )
    # Only rules with exactly L labels can match the length-L suffix —
    # bucket the list once so each join broadcasts ONLY its own band
    # (a real PSL is ~70% two-label rules; shipping all ~9k rows to all
    # six joins was 6x the broadcast bytes for zero extra matches) and
    # suffix lengths with no rules at all cost nothing.
    by_len: dict[int, list[str]] = {}
    for r in rules_list:
        by_len.setdefault(r.count(".") + 1, []).append(r)
    labels = F.split(F.col(host_col), "\\.")
    n = F.size(labels)
    out = df.withColumn("__psl_labels", labels)
    match_len_cols = []
    for L, band in sorted(by_len.items()):
        rule_col = f"__psl_r{L}"
        rules = spark.createDataFrame(
            [(r,) for r in band], f"{rule_col} string"
        )
        suf = F.when(
            n >= L,
            F.array_join(F.slice("__psl_labels", n - L + 1, L), "."),
        )
        out = out.join(
            F.broadcast(rules),
            suf == F.col(rule_col),
            "left",
        )
        match_len_cols.append(
            F.when(F.col(rule_col).isNotNull(), F.lit(L))
        )
    # longest matched suffix; PSL default rule: unknown TLD -> length 1
    # (greatest() needs >=2 args; a one-band PSL degenerates to that
    # band's match column, an empty one to the default)
    if len(match_len_cols) >= 2:
        longest = F.greatest(*match_len_cols)
    elif match_len_cols:
        longest = match_len_cols[0]
    else:
        longest = F.lit(None).cast("int")
    psl_len = F.coalesce(longest, F.lit(1))
    reg = F.when(
        n > psl_len,
        F.array_join(
            F.slice("__psl_labels", n - psl_len, psl_len + 1), "."
        ),
    )
    drop = ["__psl_labels"] + [
        f"__psl_r{L}" for L in range(1, PSL_MAX_RULE_LABELS + 1)
    ]
    return out.withColumn(out_col, reg).drop(*drop)


def synthetic_psl(n_rules: int = 9000, seed: int = 13) -> list[str]:
    """A deterministic PSL-SHAPED rule set for tests and benchmarks.

    Models the real publicsuffix.org list's composition (~9.5k rules:
    ~1.5k plain TLDs, the bulk two-label country registries like
    co.uk/ac.jp, a smaller three-label band, plus private-section
    entries like github.io) without shipping the list itself. Purely
    synthetic labels — the only real entries used at runtime remain
    PSL_SNAPSHOT; this builder exists to measure and property-test the
    two registrable-domain forms at full-size-list scale.
    """
    import random

    rng = random.Random(seed)
    seconds = ["co", "or", "ac", "go", "ne", "ed", "mil", "web", "biz"]
    rules: list[str] = []
    tlds: list[str] = []
    i = 0
    while len(rules) < n_rules:
        tld = f"t{i:04d}"
        i += 1
        tlds.append(tld)
        rules.append(tld)
        # most country registries carry a handful of second-level rules
        for s in rng.sample(seconds, rng.randrange(0, 6)):
            rules.append(f"{s}.{tld}")
            if rng.random() < 0.05:  # sparse three-label band
                rules.append(f"x{rng.randrange(100)}.{s}.{tld}")
    return _check_psl(rules[:n_rules])
