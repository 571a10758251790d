"""Session-bounded operator caches.

Operators that feed one internal frame to several consumers persist
it; an operator cannot unpersist after returning (its plan is still
lazy), so lifetime is bounded by a module-level POOL instead: each
call drains the previous call's entry before persisting its own — a
long session holds at most one cached frame per operator family, not
one per invocation. Sequential callers only; a concurrent drain merely
recomputes (unpersist is never a correctness hazard).

One implementation for every pool (dedup_index signatures, video
signatures, CDC grams, skew counts) so the lifetime contract can't
drift between copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def swap_pooled(pool: list, df: DataFrame) -> DataFrame:
    """Drain ``pool`` (unpersisting every previous entry), persist
    ``df``, track it in ``pool``, return it."""
    while pool:
        pool.pop().unpersist()
    out = df.persist()
    pool.append(out)
    return out
