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
  executors at cluster scale; costs one DFS write per pin.

See docs/concepts/scale.md ("Checkpoint durability").
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin(
    df: DataFrame, *, checkpoint_dir: str | None = None, eager: bool = True
) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    ``checkpoint_dir=None`` -> ``localCheckpoint(eager)``;
    otherwise the SparkContext checkpoint dir is pointed at
    ``checkpoint_dir`` (idempotent) and ``checkpoint(eager)`` writes the
    blocks to reliable storage."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    target = str(checkpoint_dir)
    if sc.getCheckpointDir() != target:
        sc.setCheckpointDir(target)
    return df.checkpoint(eager=eager)
