package graft.operators

import org.apache.spark.sql.DataFrame

/** Plan-sharing materialization with a deployment-mode escape hatch —
  * every multi-reference subtree in the dedup/similarity family routes
  * through here.
  *
  * Default: `localCheckpoint`. Blocks live on executors and the
  * ContextCleaner frees them once the plan is GC'd — leak-free, and the
  * fastest of the seven lifecycle strategies measured in SCALE.md (see
  * [[Dedup]] `shingleRelation` for the sweep). The tradeoff it buys that
  * speed with: localCheckpoint TRUNCATES lineage, so on a real cluster a
  * lost block (executor loss, decommission, dynamic-allocation
  * downscale) fails the query outright instead of recomputing the
  * subtree. local[n] has no executor loss; a 1000-executor job does.
  *
  * Cluster deployments that need replayability set
  * `spark.graft.reliableCheckpoint=true` AND a
  * `SparkContext.setCheckpointDir` (HDFS / object store): shares then go
  * through reliable checkpoints — slower per share (a write+read round
  * trip to distributed storage), but any lost block is re-read, not a
  * query failure. The switch is read per call, so one session can mix
  * modes across jobs.
  */
object Materialize {
  /** Materialize `df` for multi-branch reuse. `eager = true` runs the
    * upstream plan NOW (a job barrier — callers use it when the subtree
    * is large and every downstream reference would re-run it); `eager =
    * false` fills blocks during the first consuming stage. */
  def apply(df: DataFrame, eager: Boolean): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption("spark.graft.reliableCheckpoint")
      .exists(_.toBoolean) &&
      spark.sparkContext.getCheckpointDir.isDefined
    if (reliable) df.checkpoint(eager) else df.localCheckpoint(eager)
  }
}
