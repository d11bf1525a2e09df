"""Tracked persist() for shared multi-consumer plan stages.

Several operators persist an intermediate stage that multiple plan
branches consume (the corpus tokenization in ``operators/text.py``, the
shingle/signature stages in ``operators/dedup.py``, the normalized-name
projection in ``operators/fuzzy.py``).  Spark's cache manager keys these
on the canonicalized plan, so repeated queries over the SAME corpus
share one entry — but a long-lived session running over MANY distinct
corpora (or parameterizations that change the plan) accumulates one
entry per plan indefinitely, since nothing ever unpersists them.

``persist_stage`` is a drop-in ``df.persist()`` that also registers the
DataFrame here; ``release_stages()`` unpersists everything registered —
call it between corpora in a multi-corpus session (or use the
``stage_cache_scope`` context manager around a batch of queries).  The
correctness path is unaffected: a released stage is recomputed, never
wrong.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

# Strong references, deliberately: the Spark cache entry outlives the
# operator-local DataFrame object that created it (the cache manager
# keys on the canonicalized plan), so tracking must too — a weak ref
# would be collected the moment the operator returns, leaving the
# entry unreleasable.  A DataFrame handle is a few plan objects, not
# data; the list stays small (one entry per distinct persisted plan).
# All registry mutations hold _LOCK: Spark drivers routinely run
# queries from several threads (one per concurrent job), and unlocked
# pop/append races would drop or double-release entries.  unpersist()
# itself runs outside the lock — it is a JVM round-trip.
_TRACKED: list[DataFrame] = []
_LOCK = threading.Lock()


def persist_stage(df: DataFrame) -> DataFrame:
    """persist() a shared stage and track it for later release."""
    df = df.persist()
    with _LOCK:
        _TRACKED.append(df)
    return df


def _drain_all() -> list[DataFrame]:
    with _LOCK:
        drained = _TRACKED[:]
        _TRACKED.clear()
    return drained


def _drain_except(keep_ids: set[int]) -> list[DataFrame]:
    """Remove and return every tracked entry NOT in the identity
    snapshot.  Identity-based (not index-based) so a concurrent
    release_stages() during a scope cannot shift positions and leak
    in-scope entries."""
    with _LOCK:
        drained = [df for df in _TRACKED if id(df) not in keep_ids]
        _TRACKED[:] = [df for df in _TRACKED if id(df) in keep_ids]
    return drained


def _unpersist_all(dfs: list[DataFrame]) -> int:
    n = 0
    for df in dfs:
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 - session may already be stopped
            pass
    return n


def release_stages() -> int:
    """Unpersist every tracked stage; returns how many were released.

    Blocking=False (Spark default): blocks are dropped asynchronously,
    callers don't wait on executor round-trips.
    """
    return _unpersist_all(_drain_all())


@contextmanager
def stage_cache_scope() -> Iterator[None]:
    """Scope for a batch of queries over one corpus: stages persisted
    inside are released on exit.  Stages persisted BEFORE entry are
    left alone (identified by handle identity, so a concurrent
    release_stages() during the scope cannot shift the boundary).
    Concurrent persists from OTHER threads that land inside the scope
    are treated as part of it (the registry is a process-wide resource;
    per-thread scoping would leak entries)."""
    with _LOCK:
        # hold the HANDLES, not just ids: keeping the snapshot alive for
        # the scope's duration pins their id()s, so a concurrently
        # released-and-GC'd entry can't free an id that a new in-scope
        # DataFrame then reuses (which would misclassify it as
        # pre-existing and leak it)
        entry_handles = list(_TRACKED)
    entry_ids = {id(df) for df in entry_handles}
    try:
        yield
    finally:
        _unpersist_all(_drain_except(entry_ids))
        del entry_handles
