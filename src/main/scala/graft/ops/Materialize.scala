package graft.ops

import org.apache.spark.sql.DataFrame

/** Eager materialization with lineage truncation for iterative results
  * (label-propagation fixpoints, probe outputs) whose upstream caches are
  * released before the frame is handed back.
  */
private[graft] object Materialize {

  /** Reliable `checkpoint` when the session has a checkpoint directory
    * configured — blocks land on shared storage and survive executor loss,
    * which is what a multi-executor deployment needs when the result feeds
    * further jobs (losing a `localCheckpoint` block mid-pipeline is fatal:
    * the lineage was truncated, so Spark cannot recompute it).
    *
    * The reliable path caches the frame first: `checkpoint` re-runs the
    * full lineage to write the checkpoint files unless the data is already
    * persisted, so an uncached iterative result (e.g. an ANN probe) would
    * otherwise execute twice. The cache is dropped once the checkpoint is
    * written — the checkpoint files are the durable copy.
    *
    * Checkpoint files are NOT GC-cleaned by default; long-lived sessions
    * with a checkpoint dir should set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (or prune the
    * checkpoint dir externally) so abandoned checkpoints don't accumulate
    * on shared storage.
    *
    * Without a checkpoint dir (local bench / tests) falls back to an eager
    * `localCheckpoint`: executor-local blocks, GC-cleaned with the frame.
    * Cluster deployments should call
    * `spark.sparkContext.setCheckpointDir(...)` once at startup to get the
    * reliable path.
    */
  def eager(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val alreadyCached =
        df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
      if (alreadyCached) df.checkpoint(eager = true)
      else {
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try df.checkpoint(eager = true)
        finally df.unpersist(blocking = false)
      }
    } else
      df.localCheckpoint(eager = true)
}
