"""Session-scoped persist registry (X3 cache-lifecycle pattern).

Operators that persist internal subtrees and return a LAZY plan over
them (matching, the apm capstone, the minhash contract) cannot unpersist
at return time — r1-r5 did exactly that and silently recomputed the kNN
subtree per downstream branch (pipeline/matching.py). But never
unpersisting leaks: repeated invocations in one session (the month-shard
backfill loop, a bench harness) accumulate cached frames until session
end.

Resolution: each persist site registers its frames under a SITE key.
Re-registering a site unpersists the PREVIOUS generation first, so a
loop holds at most one generation of cache per site — the current
invocation's lazy plan stays cached until the next invocation or an
explicit ``release``/``release_all`` (callers that materialize eagerly
should release their sites afterwards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SITES: dict[str, list[DataFrame]] = {}


def register(site: str, *dfs: DataFrame) -> None:
    """Track ``dfs`` as the current cached generation for ``site``,
    unpersisting whatever the site held before."""
    release(site)
    _SITES[site] = list(dfs)


def release(site: str) -> None:
    """Unpersist and forget everything registered under ``site``."""
    for df in _SITES.pop(site, []):
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass


def release_all() -> None:
    """Drop every tracked cache (bench harnesses call this between
    timed repetitions, alongside ``spark.catalog.clearCache()``)."""
    for site in list(_SITES):
        release(site)


def sites() -> list[str]:
    return sorted(_SITES)
