package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.LocalPlans
import org.apache.spark.storage.StorageLevel

/** Recursive CTE fixpoint — the reference's `PhysicalRecursiveCTE`
  * (`/root/reference/src/execution/operator/set/physical_recursive_cte.cpp`).
  * Spark has no native fixpoint operator, so the loop runs on the driver.
  *
  * Two execution regimes:
  *
  * 1. **Driver-local**: when the frontier's plan folds to a literal
  *    `LocalRelation` (Catalyst's `ConvertToLocalRelation` evaluates
  *    projections/filters over local data at optimization time), each
  *    iteration is pure driver-side plan folding — `collect()` on a
  *    `LocalTableScanExec` launches NO job. Small-frontier recursions
  *    (series generation, bounded graph walks over literal edge lists)
  *    run hundreds of iterations in milliseconds. The moment a step
  *    stops folding (it references a table scan / join) or the
  *    accumulated rows exceed [[LocalRowCap]], the loop hands its
  *    current state to the distributed regime — nothing is recomputed.
  *
  * 2. **Distributed**: driver-loop recursion pays a fixed per-job cost
  *    (scheduling + a fresh codegen compile for every new plan), which
  *    dominates when iterations are many and frontiers small. Both modes
  *    therefore **batch** `batchSize` lazily-composed steps into ONE
  *    materialized job: the batch union is localCheckpoint'ed (truncating
  *    lineage, so plan depth stays bounded by the batch size rather than
  *    total iterations), a `_step` tag recovers the last frontier from the
  *    checkpointed data, and the emptiness test runs on already-materialized
  *    partitions. `step` of an empty frontier must be empty (true for any
  *    composition of filters/joins/projections), so overshooting the
  *    fixpoint inside a batch adds no rows.
  */
object RecursiveCTE {

  private val STEP = "_graft_step"

  /** Row cap for the driver-local regime; beyond this the recursion is
    * genuinely data-sized and belongs on executors.
    */
  private val LocalRowCap = 200000

  private def nonConverged(maxIterations: Int): Nothing =
    throw new IllegalStateException(
      s"recursive CTE did not converge within $maxIterations iterations")

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
    * answer, not a degraded one. The boundary test is "no NEW rows"
    * (`step(frontier) ⊆ acc`), not "no rows": cyclic data reaches its
    * fixpoint with a non-empty but fully-seen step output.
    */
  def unionFixpoint(
      base: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int = 1000,
      batchSize: Int = 8): DataFrame = {
    val spark = base.sparkSession
    LocalPlans.foldedRows(base) match {
      case Some((rows0, attrs0)) =>
        // dedup keys are EXTERNAL rows (value equality); the matching
        // InternalRow is kept alongside so rebuilt frontiers never
        // round-trip through row conversion
        val seen = mutable.LinkedHashMap[Row, InternalRow]()
        LocalPlans.toExternal(rows0, attrs0).lazyZip(rows0).foreach {
          (k, v) => if (!seen.contains(k)) seen(k) = v
        }
        var frontier = seen.values.toSeq
        var iters = 0
        LocalPlans.compileStep(spark, attrs0, step) match {
          case Some((fn, outAttrs)) =>
            // steady state: zero plan work per iteration
            var overflow = false
            while (!overflow && frontier.nonEmpty && iters < maxIterations) {
              val next = fn(frontier)
              if (seen.size + next.length > LocalRowCap) overflow = true
              else {
                val fresh = mutable.ArrayBuffer[InternalRow]()
                LocalPlans.toExternal(next, outAttrs).lazyZip(next).foreach {
                  (k, v) => if (!seen.contains(k)) { seen(k) = v; fresh += v }
                }
                frontier = fresh.toSeq
                iters += 1
              }
            }
            if (overflow)
              distributedUnion(
                LocalPlans.dfFromInternal(spark, attrs0, seen.values.toSeq),
                LocalPlans.dfFromInternal(spark, attrs0, frontier),
                step, maxIterations - iters, batchSize)
            else {
              if (frontier.nonEmpty &&
                  LocalPlans.toExternal(fn(frontier), outAttrs).exists(!seen.contains(_)))
                nonConverged(maxIterations)
              LocalPlans.dfFromInternal(spark, attrs0, seen.values.toSeq)
            }
          case None =>
            var attrs = attrs0
            var done = false
            while (!done && frontier.nonEmpty && iters < maxIterations) {
              val nextDf = step(LocalPlans.dfFromInternal(spark, attrs, frontier))
              LocalPlans.foldedRows(nextDf) match {
                // schema-stable steps only: drifted types corrupt the
                // attrs0-rebuilt LocalRelation (distributed path coerces)
                case Some((rows, as)) if seen.size + rows.length <= LocalRowCap &&
                    as.map(_.dataType) == attrs0.map(_.dataType) =>
                  val fresh = mutable.ArrayBuffer[InternalRow]()
                  LocalPlans.toExternal(rows, as).lazyZip(rows).foreach {
                    (k, v) => if (!seen.contains(k)) { seen(k) = v; fresh += v }
                  }
                  attrs = as
                  frontier = fresh.toSeq
                  iters += 1
                case _ => done = true // escaped local space
              }
            }
            if (done)
              distributedUnion(
                LocalPlans.dfFromInternal(spark, attrs0, seen.values.toSeq),
                LocalPlans.dfFromInternal(spark, attrs, frontier),
                step, maxIterations - iters, batchSize)
            else {
              val acc = LocalPlans.dfFromInternal(spark, attrs0, seen.values.toSeq)
              if (frontier.nonEmpty &&
                  !step(LocalPlans.dfFromInternal(spark, attrs, frontier)).except(acc).isEmpty)
                nonConverged(maxIterations)
              acc
            }
        }
      case None =>
        val acc = base.distinct().persist(StorageLevel.MEMORY_AND_DISK)
        distributedUnion(acc, acc, step, maxIterations, batchSize)
    }
  }

  private def distributedUnion(
      acc0: DataFrame,
      frontier0: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int,
      batchSize: Int): DataFrame = {
    var acc =
      if (acc0.storageLevel == StorageLevel.NONE)
        acc0.persist(StorageLevel.MEMORY_AND_DISK)
      else acc0
    var frontier = frontier0
    var iters = 0
    var done = false
    // cache backers retired in round r are released at the start of round
    // r+1, right after that round's batch + fresh-emptiness check has
    // forced acc to materialize (the last moment their lineage is needed)
    var toRetire: Seq[DataFrame] = Nil
    while (!done && iters < maxIterations) {
      val b = math.min(batchSize, maxIterations - iters)
      val batch = runBatch(frontier, step, b)
      // rows first seen in this batch (semi-naive at batch granularity:
      // in-batch steps expand each other directly; only batch novelties
      // join against the accumulator)
      val fresh = batch.drop(STEP).distinct().exceptAll(acc)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val freshEmpty = fresh.isEmpty // forces fresh → materializes acc
      toRetire.foreach(_.unpersist())
      toRetire = Nil
      if (freshEmpty) { fresh.unpersist(); done = true }
      else {
        val prevAcc = acc
        acc = acc.unionAll(fresh).persist(StorageLevel.MEMORY_AND_DISK)
        // next frontier: the last step's novel rows (earlier steps were
        // already expanded inside the batch)
        frontier = batch.filter(col(STEP) === b - 1).drop(STEP).except(prevAcc)
        toRetire = Seq(prevAcc, fresh)
      }
      iters += b
    }
    // at the iteration cap, a non-empty step that contains only
    // already-seen rows IS the fixpoint (cyclic data) — only genuinely
    // new rows mean non-convergence
    if (!done && !step(frontier).except(acc).isEmpty)
      nonConverged(maxIterations)
    acc.count() // materialize before releasing lineage backers
    toRetire.foreach(_.unpersist())
    acc
  }

  /** UNION ALL mode (append every round's rows, stop when a round is empty).
    *
    * Batch size grows geometrically up to `maxBatchSize`: deep recursions
    * pay fewer driver round-trips, while shallow ones never analyze a plan
    * wider than their actual depth. The cap is 16 — analysis of the K-way
    * chained-step union grows ~O(K²), and measured batch 32 REGRESSED the
    * 50-step bench ~1.8× vs 8/16. Overshooting the fixpoint inside a
    * batch is free — `step` of an empty frontier is empty — and the stop
    * test reads only the LAST step of the checkpointed batch, so the
    * fixpoint is detected in the same round it occurs. Like the reference,
    * non-convergence raises rather than silently truncating
    * (physical_recursive_cte.cpp loops to fixpoint).
    */
  def unionAllFixpoint(
      base: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int = 1000,
      batchSize: Int = 8,
      maxBatchSize: Int = 16): DataFrame = {
    val spark = base.sparkSession
    LocalPlans.foldedRows(base) match {
      case Some((rows0, attrs0)) =>
        val acc = mutable.ArrayBuffer[InternalRow](rows0: _*)
        var frontier = rows0
        var iters = 0
        LocalPlans.compileStep(spark, attrs0, step) match {
          case Some((fn, _)) =>
            // steady state: zero plan work per iteration
            var overflow = false
            while (!overflow && frontier.nonEmpty && iters < maxIterations) {
              val next = fn(frontier)
              if (acc.length + next.length > LocalRowCap) overflow = true
              else { acc ++= next; frontier = next; iters += 1 }
            }
            if (overflow)
              distributedUnionAll(
                LocalPlans.dfFromInternal(spark, attrs0, acc.toSeq),
                LocalPlans.dfFromInternal(spark, attrs0, frontier),
                step, maxIterations - iters, batchSize, maxBatchSize)
            else {
              if (frontier.nonEmpty && fn(frontier).nonEmpty) nonConverged(maxIterations)
              LocalPlans.dfFromInternal(spark, attrs0, acc.toSeq)
            }
          case None =>
            var attrs = attrs0
            var done = false
            while (!done && frontier.nonEmpty && iters < maxIterations) {
              val nextDf = step(LocalPlans.dfFromInternal(spark, attrs, frontier))
              LocalPlans.foldedRows(nextDf) match {
                // schema-stable steps only (see unionFixpoint note)
                case Some((rows, as)) if acc.length + rows.length <= LocalRowCap &&
                    as.map(_.dataType) == attrs0.map(_.dataType) =>
                  acc ++= rows
                  attrs = as
                  frontier = rows
                  iters += 1
                case _ => done = true // escaped local space
              }
            }
            if (done)
              distributedUnionAll(
                LocalPlans.dfFromInternal(spark, attrs0, acc.toSeq),
                LocalPlans.dfFromInternal(spark, attrs, frontier),
                step, maxIterations - iters, batchSize, maxBatchSize)
            else {
              if (frontier.nonEmpty &&
                  !step(LocalPlans.dfFromInternal(spark, attrs, frontier)).isEmpty)
                nonConverged(maxIterations)
              LocalPlans.dfFromInternal(spark, attrs0, acc.toSeq)
            }
        }
      case None =>
        distributedUnionAll(base, base, step, maxIterations, batchSize, maxBatchSize)
    }
  }

  /** USING KEY mode — the reference's keyed recursive CTE
    * (`WITH RECURSIVE t(…) USING KEY (k)`; physical_recursive_cte.cpp's
    * key-table variant): the accumulated state holds ONE row per key, each
    * iteration's output UPSERTS into it (same key → replace, new key →
    * insert, identical row → no-op), and only actually-changed rows feed
    * the next frontier. `step` receives BOTH the frontier and the full
    * key-table state — referencing the accumulated state inside the
    * recursive part is the feature's point (e.g. shortest path: keep a
    * candidate only when it improves the stored distance, so cyclic
    * graphs converge).
    *
    * Scale shape: upsert = changed ∪ (state ⟕̸ changed-keys) — two
    * key-partitioned shuffles per round over state + changed only; the
    * frontier shrinks to the changed set each round (semi-naive).
    */
  def keyedFixpoint(
      base: DataFrame,
      step: (DataFrame, DataFrame) => DataFrame,
      keys: Seq[String],
      maxIterations: Int = 1000): DataFrame = {
    var acc = base.dropDuplicates(keys).localCheckpoint()
    var frontier = acc
    var iters = 0
    var done = false
    // every round checkpoints `changed` and the upserted `acc` — the
    // upsert plan references the previous acc TWICE (union + anti-join),
    // so without per-round truncation the plan tree doubles every round.
    // Retired rounds' checkpoint blocks are released explicitly (the
    // context cleaner alone is GC-driven best-effort): round r's backers
    // go right after round r+1's eager checkpoint has consumed them.
    var toRetire: Seq[DataFrame] = Nil
    while (!done && iters < maxIterations) {
      val next = step(frontier, acc).dropDuplicates(keys)
      val changed = next.except(acc).localCheckpoint() // eager: materializes now
      toRetire.foreach(LocalPlans.releaseCheckpoint)
      toRetire = Nil
      if (changed.isEmpty) { LocalPlans.releaseCheckpoint(changed); done = true }
      else {
        val prevAcc = acc
        acc = changed
          .unionAll(prevAcc.join(changed.select(keys.map(col): _*), keys, "left_anti"))
          .localCheckpoint()
        frontier = changed
        toRetire = Seq(prevAcc, changed)
      }
      iters += 1
    }
    if (!done &&
        !step(frontier, acc).dropDuplicates(keys).except(acc).isEmpty)
      nonConverged(maxIterations)
    toRetire.foreach(LocalPlans.releaseCheckpoint) // acc is self-contained
    acc
  }

  private def distributedUnionAll(
      acc0: DataFrame,
      frontier0: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int,
      batchSize: Int,
      maxBatchSize: Int): DataFrame = {
    var acc = acc0
    var frontier = frontier0
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
      nonConverged(maxIterations)
    acc
  }
}
