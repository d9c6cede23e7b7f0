package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Bounded-ROWS-frame window aggregates over a GLOBAL ordering without the
  * single-task sort that Spark's empty-PARTITION-BY `WindowExec` forces
  * (everything moves to ONE task — dead at 100× scale). The reference
  * streams these (`/root/reference/src/execution/operator/aggregate/
  * physical_streaming_window.cpp`); the distributed equivalent is
  * chunk-and-overlap:
  *
  *  1. range-partition on the order column → each chunk holds a contiguous
  *     slice of the global order, all chunks in parallel;
  *  2. duplicate each chunk's last `before` rows into the NEXT chunk and
  *     first `after` rows into the PREVIOUS chunk as ghosts — every real
  *     row's ±(before, after) ROWS frame is then fully present inside its
  *     own chunk;
  *  3. run the ordinary per-chunk window and drop the ghosts.
  *
  * Shuffle cost: one range exchange + one hash exchange of (rows +
  * `before+after` ghosts per chunk) — versus ALL rows through one task.
  * The order column must be globally unique (both callers order by a key),
  * otherwise ties straddling a chunk boundary would make frames ambiguous
  * — exactly the nondeterminism a global ROWS frame has anyway.
  */
object ChunkedWindow {

  /** Append the window columns produced by `build` (from a WindowSpec whose
    * frame is `ROWS BETWEEN before PRECEDING AND after FOLLOWING` over the
    * global `orderCol` order) to `df`, computed chunk-parallel.
    */
  def boundedFrame(
      df: DataFrame, orderCol: String, before: Int, after: Int,
      chunks: Int = 0)(build: WindowSpec => Seq[Column]): DataFrame = {
    val n =
      if (chunks > 0) chunks
      else math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    val ranged = df.repartitionByRange(n, col(orderCol))
      .withColumn("_chunk", spark_partition_id())
    val wIn = Window.partitionBy("_chunk").orderBy(orderCol)
    val sized = ranged
      .withColumn("_rn", row_number().over(wIn))
      .withColumn("_cnt", count(lit(1)).over(Window.partitionBy("_chunk")))
    val real = sized.withColumn("_ghost", lit(false))
    val tailGhosts = sized.filter(col("_rn") > col("_cnt") - before)
      .withColumn("_chunk", col("_chunk") + 1)
      .withColumn("_ghost", lit(true))
    val headGhosts = sized.filter(col("_rn") <= after)
      .withColumn("_chunk", col("_chunk") - 1)
      .withColumn("_ghost", lit(true))
    val all = real.unionByName(tailGhosts).unionByName(headGhosts)
    val w = Window.partitionBy("_chunk").orderBy(orderCol)
      .rowsBetween(-before, after)
    all.select(df.columns.map(col) ++ (col("_ghost") +: build(w)): _*)
      .filter(!col("_ghost"))
      .drop("_ghost")
  }
}
