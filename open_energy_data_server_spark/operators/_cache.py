"""Shared capped registry for operator-internal persisted frames.

Several operators persist an intermediate that feeds multiple
consumers in ONE returned plan (jaccard posting stream, quantile
count table, fuzzy variant stream, pagerank edge list, bigram
stream). The persist is load-bearing — without it DataFrame lineage
re-runs the upstream pipeline per consumer — but a long-lived session
calling such operators repeatedly would otherwise accumulate
executor-storage blocks without bound (the round-3 quantiles
finding, generalized here).

Unpersisting is SAFE for still-referenced plans: the cache entry goes
away and a re-execution recomputes the subtree — correctness is
unaffected, only the sharing. So a bounded FIFO (oldest evicted
first) caps storage at ``CAP`` intermediates while keeping recent
plans shared.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame

_PERSISTED: deque[DataFrame] = deque()
CAP = 16


def register_persisted(df: DataFrame) -> DataFrame:
    """Track a just-persisted frame; evict (unpersist) the oldest
    beyond the cap. Returns ``df`` for chaining."""
    _PERSISTED.append(df)
    while len(_PERSISTED) > CAP:
        _drop_oldest()
    return df


def _drop_oldest() -> None:
    df = _PERSISTED.popleft()
    try:
        df.unpersist()
    except Exception:  # noqa: BLE001 — dead-session handle, nothing to free
        pass


def release_all() -> int:
    """Unpersist every registered intermediate; returns the count.
    Already-returned plans stay valid (they recompute on next run)."""
    n = 0
    while _PERSISTED:
        _drop_oldest()
        n += 1
    return n
