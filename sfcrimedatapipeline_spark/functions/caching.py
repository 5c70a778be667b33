"""Cache-lifetime helpers.

Lazy operators persist scan-shared intermediates (an edge list consumed
by three self-joins, a ranked frame consumed by three lookups). The
cache must survive until the CALLER materializes the returned plan, so
the operator cannot unpersist before returning — but the caller holds
no handle on the intermediates, so without help the cached frames
outlive the query and accumulate executor storage for the life of the
session (ADVICE r4: cross_corpus_contamination leaked its tf/ef caches,
triangle_count its edge list, exact_quantiles_by its ranked frame).

``unpersist_when_released`` ties the intermediates' cache lifetime to
the result object itself: when the caller drops its last reference to
the returned frame — which in CPython happens deterministically, right
after ``collect()``/``toPandas()``/write in every normal call shape —
the intermediates are unpersisted (non-blocking). Iterative operators
(connected_components, pagerank) that materialize eagerly in-loop keep
their explicit in-loop unpersists; this helper is for one-shot lazy
plans only.
"""

from __future__ import annotations

import weakref


def truncate_lineage(df, checkpoint_dir: str | None = None, eager: bool = False):
    """Lineage truncation for iterative loops: a RELIABLE checkpoint
    when a directory is given (written to that path — survives executor
    loss, the cluster setting; VERDICT r4 #6), else ``localCheckpoint``
    (blocks live only in executor storage — fine for local mode, lost
    on executor death). Lazy either way; the caller's next action
    materializes it."""
    if checkpoint_dir is not None:
        sc = df.sparkSession.sparkContext
        current = sc.getCheckpointDir()
        # getCheckpointDir returns a scheme-prefixed UUID subdir of the
        # configured path; only (re)configure when its PARENT differs.
        # Compare the parent path exactly — a substring test
        # false-positives on prefix-sharing dirs ('/data/ckpt' inside
        # 'file:/data/ckpt2/<uuid>') and silently checkpoints to the
        # wrong mount (round-5 review).
        want = "/" + checkpoint_dir.strip("/")
        parent = None
        if current is not None:
            import posixpath

            parent = posixpath.dirname(str(current))
            if "://" in parent:
                parent = parent.split("://", 1)[1]
            elif parent.startswith("file:"):
                parent = parent[len("file:") :]
            parent = "/" + parent.strip("/")
        if parent != want:
            sc.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def keep_alive_until_released(result, *holders):
    """Chain object LIFETIMES: hold strong references to ``holders``
    until ``result`` is released. For derived frames built on top of an
    :func:`unpersist_when_released` result — the derived frame
    references the PLAN, not the Python wrapper, so chaining
    ``op(...).orderBy(...)`` would otherwise drop the wrapper and fire
    its unpersist finalizer before any action runs (round-10 review:
    graph_hits_dup made the hits() cache fix inert this way). Returns
    ``result``."""

    def _noop(hs=list(holders)):
        del hs

    weakref.finalize(result, _noop)
    return result


def unpersist_when_released(result, *cached):
    """Unpersist every frame in ``cached`` once ``result`` is released.

    Returns ``result`` (a ``DataFrame`` — or any object, e.g. the dict
    of tables a pipeline returns). The finalizer swallows errors: at
    interpreter shutdown the JVM gateway may already be gone, and a
    double-unpersist (e.g. after a session-wide ``clearCache()``) is a
    no-op.

    CONTRACT: the caches live exactly as long as the returned OBJECT —
    hold it until the query is materialized. A chained
    ``op(...).filter(...).count()`` drops the returned frame
    immediately (derived frames reference the plan, not the Python
    object), fires the finalizer, and the intermediates recompute; the
    result stays CORRECT but the persist saves nothing. Every driver
    query/bench/gate call shape here collects the returned frame
    directly; callers who transform first should keep a binding
    (``r = op(...); r.filter(...).count()``).
    """

    def _release(frames=list(cached)):
        for f in frames:
            try:
                f.unpersist(blocking=False)
            except Exception:
                pass

    weakref.finalize(result, _release)
    return result
