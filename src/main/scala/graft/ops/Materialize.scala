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
    * Without a checkpoint dir (local bench / tests) falls back to an eager
    * `localCheckpoint`: executor-local blocks, GC-cleaned with the frame.
    * Cluster deployments should call
    * `spark.sparkContext.setCheckpointDir(...)` once at startup to get the
    * reliable path.
    */
  def eager(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else
      df.localCheckpoint(eager = true)
}
