"""Cache-lifecycle helpers for operators that persist intermediates.

Several operators persist a subtree that feeds a self-join (MinHash
band buckets, SimHash signatures, LSH buckets, IVF cell assignments,
the AML target join): the cached plan is the *right* scale shape, but
Spark's CacheManager keys cached DataFrames by logical plan and never
GC-collects them, so in a long-lived session repeated calls would leak
executor storage memory.

Contract: every such operator takes an optional ``cache`` list. Pass a
list to receive the persisted handles and unpersist them once the
returned plan has been materialized (``temp_caches`` does this for
you); pass None (the default) when the session is short-lived or the
caller deliberately keeps the cache warm across calls.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


def register_cache(df: DataFrame, cache: list | None) -> DataFrame:
    """persist() a DataFrame and, when the caller provided a registry
    list, hand it the persisted handle (the caller then owns unpersist)."""
    df = df.persist()
    if cache is not None:
        cache.append(df)
    return df


@contextmanager
def temp_caches():
    """Scope for operator caches::

        with temp_caches() as cache:
            out = minhash_lsh_pairs(df, "id", "text", cache=cache)
            out.write.parquet(path)   # materialize INSIDE the scope
        # every intermediate persisted by the operator is now freed
    """
    handles: list[DataFrame] = []
    try:
        yield handles
    finally:
        for df in handles:
            try:
                df.unpersist()
            except Exception:
                pass
