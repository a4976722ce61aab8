"""Lineage pinning: executor-local vs reliable checkpoints.

Iterative loops (connected-components rounds) and nondeterministic row
ids (the build spine, the audit rowid) must be pinned by MATERIALIZING
and truncating lineage — a plain persist() can be evicted and silently
recomputed, reassigning ids mid-build.

Two pin strengths:

* ``localCheckpoint`` (default, ``checkpoint_dir=None``) — blocks live on
  executor local storage. Fast (no DFS round-trip), correct on a healthy
  cluster, but the blocks die with their executor: on executor loss the
  job fails and the whole build/loop must be retried from the start.
* ``checkpoint`` (``checkpoint_dir='hdfs://...'``) — blocks are written
  to the reliable FS under the given directory and survive any executor.
  The right setting for long iterative jobs on preemptible/spot
  executors at cluster scale; costs one DFS write per pin. RETENTION:
  Spark does not delete reliable checkpoint data by default
  (``spark.cleaner.referenceTracking.cleanCheckpoints`` is false), and
  iterative callers pin once per round — set that conf to true or give
  each application its own subdirectory and remove it after the job
  (see docs/concepts/scale.md, "Checkpoint durability").

See docs/concepts/scale.md ("Checkpoint durability").
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# setCheckpointDir() is NOT idempotent to observe via getCheckpointDir():
# Spark fully qualifies the path AND appends a random UUID subdirectory
# (e.g. 'file:/tmp/ckpt/c7f3...'), so comparing against the raw target
# always mismatches. Track what WE set per SparkContext instead —
# otherwise every pin() call would mkdir a fresh UUID directory (one per
# connected-components round) and stomp any user-configured dir.
_SET_DIRS: dict[str, str] = {}


def pin(
    df: DataFrame, *, checkpoint_dir: str | None = None, eager: bool = True
) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    ``checkpoint_dir=None`` -> ``localCheckpoint(eager)``;
    otherwise the SparkContext checkpoint dir is pointed at
    ``checkpoint_dir`` (set once per (context, dir) — see ``_SET_DIRS``)
    and ``checkpoint(eager)`` writes the blocks to reliable storage."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    target = str(checkpoint_dir)
    app_id = sc.applicationId
    if _SET_DIRS.get(app_id) != target:
        sc.setCheckpointDir(target)
        _SET_DIRS[app_id] = target
    return df.checkpoint(eager=eager)
