"""Query-scoped persist tracker (round 11, VERDICT r10 #2).

Many operators and registered query builders persist an intermediate
frame that feeds several downstream branches (banded dedup signatures,
LSH candidate frames, BFS frontiers, invariant twins).  Until round 10
those caches were "scoped to the caller's ``spark.catalog.clearCache()``
between queries" — a prose contract only the bench/driver_sim harnesses
and the test fixtures honored, so a library caller looping over
registered queries accumulated session-lifetime cache entries.

Round 10 built the fix for ONE operator (``sparse_cosine_pairs``'s
module-local ``_SCRATCH``); this module is that pattern generalized, and
every ``.persist()`` inside the package now routes through it:

- ``df.transform(spersist)`` (postfix, plan-shape-neutral) persists the
  frame AND registers it in the module tracker;
- entering any registered query via the ``plans.registry`` wrapper first
  releases every frame the PREVIOUS query tracked — so a long-lived
  session holds at most one query's scratch no matter how many
  registered queries run, with NO harness cooperation required;
- harnesses that want the memory back after the LAST query call
  ``release()`` directly (bench.py / scripts/driver_sim.py do, replacing
  their former blunt session-wide ``clearCache()``).

Releasing is always safe: a consumer of a previously returned frame
just recomputes the unpersisted lineage on its next action — these are
performance caches, never correctness state.  ``unpersist()`` on a
handle bound to a stopped SparkSession is swallowed (ADVICE r10: a
module-global holding DataFrames across session lifetimes must drop
stale handles silently instead of raising from the dead context).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: scope name → tracked persisted frames, in persist order.  The default
#: scope ("query") is what the registry wrapper releases on entry;
#: operators with their own replace-on-call contract use a private scope
#: (e.g. sparse_cosine_pairs) so intra-query repeat calls stay bounded
#: at one outstanding frame even before the next query begins.
_SCRATCH: dict[str, list[DataFrame]] = {}


def spersist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and track it under the default query scope.

    Postfix form for builder chains: ``frame.transform(spersist)`` is a
    drop-in for ``frame.persist()`` — same MEMORY_AND_DISK level, same
    returned frame, plus tracker registration.
    """
    return track(df, scope="query")


def track(df: DataFrame, scope: str = "query", replace: bool = False) -> DataFrame:
    """Persist ``df`` and register it under ``scope``.

    ``replace=True`` first releases everything the scope already holds —
    the self-scoping contract operators like ``sparse_cosine_pairs`` use
    so repeated calls in one session never accumulate cache.
    """
    frames = _SCRATCH.setdefault(scope, [])
    if replace:
        _drop(frames)
    df.persist()
    frames.append(df)
    return df


def _drop(frames: list[DataFrame]) -> int:
    """Unpersist and forget every frame in the list; returns how many
    were actually released.  A handle whose SparkContext is gone (the
    session was stopped and restarted since it was tracked) is dropped
    silently — it holds no executor memory anymore by definition."""
    n = 0
    while frames:
        f = frames.pop()
        try:
            f.unpersist()
            n += 1
        except Exception:
            pass
    return n


def release(scope: str | None = None) -> int:
    """Unpersist every tracked frame (of ``scope``, or of ALL scopes when
    None); returns how many were released.  Idempotent and safe at any
    time — see the module docstring."""
    if scope is not None:
        return _drop(_SCRATCH.get(scope, []))
    return sum(_drop(frames) for frames in list(_SCRATCH.values()))


def outstanding(scope: str | None = None) -> int:
    """How many frames the tracker currently holds (test/diagnostic
    surface for the bounded-residency contract)."""
    if scope is not None:
        return len(_SCRATCH.get(scope, ()))
    return sum(len(v) for v in _SCRATCH.values())
