"""Iteration support: localCheckpoint with a *working* free handle.

Iterative operators (BFS q108, MMR s12, PageRank q96) flatten per-round
lineage with ``localCheckpoint`` — the right tool (O(1) plan depth per
round) with one trap: ``DataFrame.unpersist()`` is a **no-op** on a
checkpointed frame.  ``Dataset.localCheckpoint`` persists the underlying
internal RDD directly, NOT through the CacheManager, so the DataFrame-
level unpersist (a CacheManager call) never finds it and the blocks
linger until the JVM garbage-collects the RDD reference — across a long
session of repeated iterative queries that is unbounded storage-memory
growth.

``local_checkpoint_freeable`` returns the checkpointed frame plus a
``free()`` that reaches the actual persisted RDDs: it diffs the
SparkContext's persistent-RDD registry around the checkpoint call and
unpersists exactly the newly registered handles.  Verified behavior
(pinned in tests/test_operators.py::test_local_checkpoint_freeable):
after ``free()`` the registry returns to baseline and recomputing the
frame raises ``CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND`` — i.e. the blocks
are genuinely gone, which also means **free() only after nothing will
read the frame again** (a materialized downstream result, or the frame
was superseded).

Assumes the registry diff is not racing concurrent persists from other
driver threads — true for these single-threaded driver loops.

Reference parity note: the reference engine holds no cross-stage state
at all (each MapReduce stage writes its store and frees, reference
``src/Impl.hs:60-75``); this is the Spark analog of that discipline for
iterative plans.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def _persistent_rdds(sc) -> dict[int, object]:
    """id → JavaRDD handle for every RDD registered as persistent."""
    jmap = sc._jsc.getPersistentRDDs()
    return {int(k): jmap[k] for k in jmap.keySet().toArray()}


def local_checkpoint_freeable(
    df: DataFrame, eager: bool = True
) -> tuple[DataFrame, Callable[[], None]]:
    """``df.localCheckpoint(eager)`` plus a ``free()`` that actually
    releases the checkpoint blocks (see module docstring).

    ``free()`` is idempotent and best-effort: a handle whose blocks were
    already GC'd unpersists as a no-op.
    """
    sc = df.sparkSession.sparkContext
    before = set(_persistent_rdds(sc))
    out = df.localCheckpoint(eager=eager)
    fresh = [r for i, r in _persistent_rdds(sc).items() if i not in before]

    def free() -> None:
        while fresh:
            try:
                fresh.pop().unpersist(False)
            except Exception:
                pass  # already cleaned by ContextCleaner — nothing to free

    return out, free
