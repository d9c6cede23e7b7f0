package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Recursive CTE fixpoint — the reference's `PhysicalRecursiveCTE`
  * (`/root/reference/src/execution/operator/set/physical_recursive_cte.cpp`).
  * Spark has no native fixpoint operator, so the loop runs on the driver:
  * each iteration is a distributed job over the frontier only (semi-naive
  * evaluation for UNION mode), with periodic localCheckpoint to truncate
  * the ever-growing lineage — without it the plan tree grows linearly in
  * iterations and planning time explodes at scale.
  */
object RecursiveCTE {

  /** UNION mode (distinct accumulate, stop when no NEW rows). */
  def unionFixpoint(
      base: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int = 1000,
      checkpointEvery: Int = 8): DataFrame = {
    var acc = base.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = acc
    var i = 0
    var done = false
    while (!done && i < maxIterations) {
      // semi-naive: only expand the NEW rows from the last round
      var next = step(frontier).distinct().exceptAll(acc).distinct()
      if (i % checkpointEvery == checkpointEvery - 1) next = next.localCheckpoint()
      next = next.persist(StorageLevel.MEMORY_AND_DISK)
      if (next.isEmpty) done = true
      else {
        acc = acc.unionAll(next).persist(StorageLevel.MEMORY_AND_DISK)
        frontier = next
      }
      i += 1
    }
    acc
  }

  /** UNION ALL mode (append every round's rows, stop when a round is empty). */
  def unionAllFixpoint(
      base: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int = 1000,
      checkpointEvery: Int = 8): DataFrame = {
    var acc = base.persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = base
    var i = 0
    var done = false
    while (!done && i < maxIterations) {
      var next = step(frontier)
      if (i % checkpointEvery == checkpointEvery - 1) next = next.localCheckpoint()
      next = next.persist(StorageLevel.MEMORY_AND_DISK)
      if (next.isEmpty) done = true
      else {
        acc = acc.unionAll(next)
        frontier = next
      }
      i += 1
    }
    acc
  }
}
