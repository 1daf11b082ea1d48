package org.apache.spark

/** Test-only accessor for clearing `SparkContext.checkpointDir` (a
  * `private[spark]` var with a setter but no public unsetter). PinSpec
  * flips the shared session into reliable-checkpoint mode to exercise
  * `graft.ops.Pin`'s cluster branch and must restore localCheckpoint
  * mode afterwards — suites share one SparkContext.
  */
object CheckpointDirTestHook {
  def clear(sc: SparkContext): Unit = { sc.checkpointDir = None }
}
