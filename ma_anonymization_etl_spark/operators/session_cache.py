"""Bounded per-session persist caches (ADVICE r8).

Several operators persist a derived subtree (j3's shingles, j9b's
signatures, j50/j52's distinct token table, j24's funnel flags) keyed
by ``(applicationId, sf_dir, *tag)`` so repeat invocations within one
session measure steady state instead of re-materializing the same
DataFrame.  Left unbounded, a long-lived session that touches many
sf_dirs (scale_sweep's small→big pass, an exploratory notebook) grows
executor storage without limit — each key pins its persisted
DataFrames forever.

``cache_put`` bounds every such cache to ONE ``(applicationId,
sf_dir)`` generation: inserting a key for a new (app, dir) evicts and
``unpersist``s everything cached for any OTHER (app, dir), including
entries from stopped sessions (their unpersist is a no-op wrapped in
a try).  Multiple tags for the SAME (app, dir) coexist — that is the
intra-session reuse the caches exist for (j24 and j24b share flags;
j50 and j52 share tokens).

``clear_caches`` is the explicit hook: unpersist + drop everything.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

# Every session cache registers itself here so clear_caches() can reach
# it without import cycles.
_ALL_CACHES: list[dict] = []


def register_cache(cache: dict) -> dict:
    _ALL_CACHES.append(cache)
    return cache


def _unpersist_value(value: Any) -> None:
    """Unpersist every DataFrame inside a cached value (a DataFrame or a
    tuple containing some).  blocking=False; a DataFrame belonging to a
    stopped SparkSession raises — swallowed, the JVM already freed it."""
    items = value if isinstance(value, (tuple, list)) else (value,)
    for item in items:
        if isinstance(item, DataFrame):
            try:
                item.unpersist()
            except Exception:
                pass


def cache_put(cache: dict, key: tuple, value: Any) -> Any:
    """Insert ``value`` under ``key`` = (applicationId, sf_dir, *tag),
    first evicting (and unpersisting) every entry of the SAME cache
    whose (applicationId, sf_dir) generation differs."""
    gen = key[:2]
    for k in [k for k in cache if k[:2] != gen]:
        _unpersist_value(cache.pop(k))
    # Same-key overwrite must not leak the old persisted value (the
    # routed-prefix cache overwrites its single key per routed call).
    if key in cache:
        _unpersist_value(cache.pop(key))
    cache[key] = value
    return value


def clear_caches() -> None:
    """Unpersist and drop every registered session-cache entry."""
    for cache in _ALL_CACHES:
        for k in list(cache):
            _unpersist_value(cache.pop(k))
