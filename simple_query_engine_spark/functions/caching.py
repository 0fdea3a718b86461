"""Session cache registry for load-once/query-many DataFrames.

Several operators cache an expensive intermediate (shingle tables, LSH
signature/bucket tables) for the session, because a typical analytics
session loads one corpus and runs many queries against it.  Left
unmanaged, a session that touches several scale dirs accumulates one
cached copy per dir and relies on LRU eviction alone.

``session_cache`` centralizes the policy: caches are tagged with the
``sf_dir`` they derive from, and requesting a cache for a *different*
``sf_dir`` unpersists every cache tagged with another dir first — the
working set is always one scale dir wide.  Within one dir, repeated calls
rebuild an identical plan and Spark's cache manager serves the existing
materialization.

Assumes queries run sequentially in a session (the harness does);
concurrent queries over different scale dirs would evict each other.
"""

from __future__ import annotations

import os
import warnings

from py4j.protocol import Py4JError

from pyspark.sql import DataFrame

# key -> (sf_dir, cached handle)
_TRACKED: dict[str, tuple[str, DataFrame]] = {}


def _unpersist_quietly(handle: DataFrame) -> None:
    """Unpersist, tolerating a handle whose SparkSession has been stopped
    and recreated within the same Python process: the module-level
    registry outlives sessions, and letting the py4j error escape BEFORE
    the registry entry is removed would poison ``_TRACKED`` permanently
    (every later call re-hits the dead handle and fails)."""
    try:
        handle.unpersist()
    except (Py4JError, AttributeError):
        # Stale handle from a stopped session — the py4j gateway call
        # fails (Py4JError and subclasses) or an internal ref is already
        # torn down (AttributeError); nothing left to release.
        pass
    except Exception as exc:
        # A GENUINE unpersist failure (e.g. an interrupted job) must not
        # poison the registry, but it must not vanish either.
        warnings.warn(
            f"unpersist of a tracked session cache failed: {exc!r}",
            RuntimeWarning,
            stacklevel=2,
        )


def session_cache(df: DataFrame, sf_dir: str, key: str) -> DataFrame:
    """Cache ``df`` for the session under ``key``, evicting caches that
    belong to a different scale dir."""
    for other_key, (other_dir, handle) in list(_TRACKED.items()):
        if other_dir != sf_dir:
            del _TRACKED[other_key]
            _unpersist_quietly(handle)
    prior = _TRACKED.get(key)
    if prior is not None:
        try:
            if df.sameSemantics(prior[1]):
                return prior[1]
        except Exception:
            # Stale handle from a stopped session: fall through to
            # replace it (the cache itself died with that session).
            pass
        # Same key, new plan (e.g. a scratch-table path baked into the
        # lineage changed): release the stale blocks instead of leaking
        # them for the rest of the session.
        del _TRACKED[key]
        _unpersist_quietly(prior[1])
    handle = df.cache()
    _TRACKED[key] = (sf_dir, handle)
    return handle


def evict_all() -> None:
    """Unpersist every tracked cache (test hook / explicit session reset)."""
    handles = [handle for _, (_, handle) in list(_TRACKED.items())]
    _TRACKED.clear()
    for handle in handles:
        _unpersist_quietly(handle)
    evict_all_materialized()


# key -> (sf_dir, plan handle for sameSemantics, path, read-back handle)
_MATERIALIZED: dict[str, tuple[str, DataFrame, str, DataFrame]] = {}


def session_materialize(df: DataFrame, sf_dir: str, key: str) -> DataFrame:
    """Like :func:`session_cache`, but materialize ``df`` to parquet in a
    PROCESS-scoped scratch dir and return a DataFrame that scans the
    files — i.e. every downstream plan starts from a scan LEAF.

    Why this exists next to ``session_cache``: caching serves the rows
    but leaves the full LOGICAL plan in place, and Spark's classic-mode
    eager analysis re-walks it on every transformation built on top —
    for the minhash signature table (64 aggregate expressions over a
    shingle explode) that re-analysis costs seconds per consumer query
    (measured: graph_label_spread spent ~9 s of a 12 s invocation in
    JVM analysis/canonicalization of plans embedding the signature
    subtree).  Materializing truncates the lineage exactly like
    ``_propagate_labels``' per-round parquet round-trip, for the same
    guide-§3.3/"very large plans" reason.

    The scratch root is created fresh per process (``mkdtemp`` under the
    shared sweep-managed root), so nothing is ever served across
    processes — a fresh bench/driver run always recomputes from the
    source parquet.  Same-key/new-plan and cross-``sf_dir`` staleness
    follow session_cache's rules; the read-back pins ``df.schema`` so
    the scan's types (and nullability) are exactly the plan's."""
    import shutil

    for other_key, entry in list(_MATERIALIZED.items()):
        if entry[0] != sf_dir:
            del _MATERIALIZED[other_key]
            shutil.rmtree(entry[2], ignore_errors=True)
    prior = _MATERIALIZED.get(key)
    if prior is not None:
        try:
            # Liveness guard (ADVICE r17): a session outliving
            # SQE_SCRATCH_TTL_SEC can have a LATER materialization's root
            # sweep reclaim this entry's parquet — verify the files still
            # exist before serving the handle, and refresh the swept
            # unit's mtime (the per-call mkdtemp dir) so a live entry
            # keeps aging from its last USE, not its creation.
            if df.sameSemantics(prior[1]) and os.path.exists(prior[2]):
                try:
                    os.utime(os.path.dirname(prior[2]), None)
                except OSError:
                    pass
                return prior[3]
        except Exception:
            pass  # stale handle from a stopped session: rebuild below
        del _MATERIALIZED[key]
        shutil.rmtree(prior[2], ignore_errors=True)
    from simple_query_engine_spark.operators.storage import scratch_dir

    path = os.path.join(scratch_dir("mat_", "sqe_session_mat"), key)
    df.write.parquet(path)
    read_back = df.sparkSession.read.schema(df.schema).parquet(path)
    _MATERIALIZED[key] = (sf_dir, df, path, read_back)
    return read_back


def evict_all_materialized() -> None:
    """Delete every in-session materialization (test hook / reset)."""
    import shutil

    entries = list(_MATERIALIZED.values())
    _MATERIALIZED.clear()
    for _, _, path, _ in entries:
        shutil.rmtree(path, ignore_errors=True)
