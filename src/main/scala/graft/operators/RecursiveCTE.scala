package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Recursive CTE fixpoint — the reference's `PhysicalRecursiveCTE`
  * (`/root/reference/src/execution/operator/set/physical_recursive_cte.cpp`).
  * Spark has no native fixpoint operator, so the loop runs on the driver.
  *
  * Driver-loop recursion pays a fixed per-job cost (scheduling + a fresh
  * codegen compile for every new plan), which dominates when iterations
  * are many and frontiers small. Both modes therefore **batch** `batchSize`
  * lazily-composed steps into ONE materialized job: the batch union is
  * localCheckpoint'ed (truncating lineage, so plan depth stays bounded by
  * the batch size rather than total iterations), a `_step` tag recovers
  * the last frontier from the checkpointed data, and the emptiness test
  * runs on already-materialized partitions. `step` of an empty frontier
  * must be empty (true for any composition of filters/joins/projections),
  * so overshooting the fixpoint inside a batch adds no rows.
  */
object RecursiveCTE {

  private val STEP = "_graft_step"

  /** Lazily compose up to `batchSize` steps, tag each with its index,
    * union, and materialize once. Returns the checkpointed tagged union.
    *
    * The union is coalesced back to the frontier's partition count before
    * the checkpoint — otherwise each batch multiplies partitions by
    * `batchSize` (union concatenates them) and the count compounds
    * exponentially across batches. Shuffle-bearing steps re-partition
    * themselves anyway; this only bounds the narrow-union layout.
    */
  private def runBatch(
      frontier: DataFrame, step: DataFrame => DataFrame, batchSize: Int): DataFrame = {
    val steps = Iterator.iterate(step(frontier))(step).take(batchSize).toSeq
    val target = math.max(frontier.rdd.getNumPartitions, 1)
    steps.zipWithIndex
      .map { case (d, i) => d.withColumn(STEP, lit(i)) }
      .reduce(_ unionAll _)
      .coalesce(target)
      .localCheckpoint() // ONE job; lineage truncated
  }

  /** UNION mode (distinct accumulate, stop when no NEW rows).
    *
    * Non-convergence within `maxIterations` raises — the reference never
    * silently truncates a recursive CTE (physical_recursive_cte.cpp loops
    * to actual fixpoint); returning a partial result would be a wrong
    * answer, not a degraded one.
    */
  def unionFixpoint(
      base: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int = 1000,
      batchSize: Int = 8): DataFrame = {
    var acc = base.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = acc
    var iters = 0
    var done = false
    val retired = scala.collection.mutable.ListBuffer[DataFrame]()
    while (!done && iters < maxIterations) {
      val b = math.min(batchSize, maxIterations - iters)
      val batch = runBatch(frontier, step, b)
      // rows first seen in this batch (semi-naive at batch granularity:
      // in-batch steps expand each other directly; only batch novelties
      // join against the accumulator)
      val fresh = batch.drop(STEP).distinct().exceptAll(acc)
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (fresh.isEmpty) { fresh.unpersist(); done = true }
      else {
        val prevAcc = acc
        acc = acc.unionAll(fresh).persist(StorageLevel.MEMORY_AND_DISK)
        // next frontier: the last step's novel rows (earlier steps were
        // already expanded inside the batch)
        frontier = batch.filter(col(STEP) === b - 1).drop(STEP).except(prevAcc)
        // prevAcc/fresh back the new acc's lineage until it materializes;
        // retire them after the emptiness check of the NEXT round (by which
        // point acc has been computed at least once)
        retired += prevAcc; retired += fresh
      }
      iters += b
    }
    if (!done && !step(frontier).isEmpty)
      throw new IllegalStateException(
        s"recursive CTE did not converge within $maxIterations iterations")
    acc.count() // materialize before releasing lineage backers
    retired.foreach(_.unpersist())
    acc
  }

  /** UNION ALL mode (append every round's rows, stop when a round is empty).
    *
    * Batch size grows geometrically (8 → 16 → 32): deep recursions pay
    * O(log n) driver round-trips instead of O(n/8), while shallow ones
    * never analyze a plan wider than their actual depth. Overshooting the
    * fixpoint inside a batch is free — `step` of an empty frontier is
    * empty — and the stop test reads only the LAST step of the
    * checkpointed batch, so the fixpoint is detected in the same round it
    * occurs. Like the reference, non-convergence raises rather than
    * silently truncating (physical_recursive_cte.cpp loops to fixpoint).
    */
  def unionAllFixpoint(
      base: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int = 1000,
      batchSize: Int = 8,
      maxBatchSize: Int = 32): DataFrame = {
    var acc = base
    var frontier = base
    var iters = 0
    var b = batchSize
    var done = false
    while (!done && iters < maxIterations) {
      val k = math.min(b, maxIterations - iters)
      val batch = runBatch(frontier, step, k)
      val last = batch.filter(col(STEP) === k - 1).drop(STEP)
      acc = acc.unionAll(batch.drop(STEP))
      frontier = last
      iters += k
      if (last.isEmpty) done = true
      else b = math.min(b * 2, maxBatchSize)
    }
    if (!done && !step(frontier).isEmpty)
      throw new IllegalStateException(
        s"recursive CTE did not converge within $maxIterations iterations")
    acc
  }
}
