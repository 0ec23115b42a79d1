package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The shared one-lineage barrier for multi-consumer frames (d52's gated
  * corpus, d59's signature scan, e17's assigned index): materialize once,
  * cut lineage, fan out N consumers without re-running the parent plan —
  * and under predicate pushdown, without the admit filter's alias chain
  * being substituted into each consumer's scan (the d52 measurement:
  * 93 s → 7 s at sf0.1 from this barrier alone).
  *
  * Checkpoint flavor is chosen at runtime, the same seam as
  * ConnectedComponents.materializeWith: with a checkpoint directory
  * configured on the SparkContext (`sc.setCheckpointDir` — HDFS/object
  * store on a real cluster) the barrier is a RELIABLE checkpoint, so a
  * lost executor during the fan-out re-reads files instead of killing
  * the run; otherwise `localCheckpoint` (executor-local blocks — right
  * for local mode and tests, lossy on a cluster). Reliable flavor
  * persists the plan first so the checkpoint-write job reads cached
  * blocks instead of recomputing the parent (RDD reliable checkpointing
  * otherwise computes the plan twice), then drops the cache handle —
  * the checkpoint files are the only storage the caller holds.
  */
object Checkpoints {
  def barrier(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isDefined) {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      try cached.checkpoint() // eager: one job computes into cache; the
                              // checkpoint write then reads the cache
      finally cached.unpersist(blocking = false)
    } else df.localCheckpoint()
  }
}
