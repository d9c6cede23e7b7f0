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
  *  2. merge undersized chunks: per-chunk counts (cheap job over the
  *     materialized range layout) feed a driver-side greedy merge so every
  *     chunk holds at least max(before, after) rows — the exactness
  *     precondition for step 3 (a chunk smaller than the frame could not
  *     donate enough boundary rows, silently truncating neighbors'
  *     frames);
  *  3. duplicate each chunk's last `before` rows into the NEXT chunk and
  *     first `after` rows into the PREVIOUS chunk as ghosts — every real
  *     row's ±(before, after) ROWS frame is then fully present inside its
  *     own chunk;
  *  4. run the ordinary per-chunk window and drop the ghosts.
  *
  * Shuffle cost: one range exchange (materialized once, reused by the
  * count and the window) + one hash exchange of rows + ghosts — versus
  * ALL rows through one task. The order column must be globally unique
  * (both callers order by a key), otherwise ties straddling a chunk
  * boundary would make frames ambiguous — exactly the nondeterminism a
  * global ROWS frame has anyway.
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
    // the count pass and the window pass each execute this plan;
    // RangePartitioner's sampling is seeded deterministically, so both
    // executions see identical partition boundaries (and ids). Recomputing
    // the exchange costs one extra pass but pins NOTHING in storage — a
    // checkpoint here would hold the whole input until GC.
    val ranged = df.repartitionByRange(n, col(orderCol))
      .withColumn("_pid", spark_partition_id())

    // driver-side greedy merge of adjacent partitions until every chunk
    // carries at least max(before, after, 1) rows
    val need = math.max(math.max(before, after), 1)
    val counts = ranged.groupBy("_pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val chunkOf = new Array[Int](n)
    var chunkId = 0
    var inChunk = 0L
    for (pid <- 0 until n) {
      chunkOf(pid) = chunkId
      inChunk += counts.getOrElse(pid, 0L)
      if (inChunk >= need && pid < n - 1) { chunkId += 1; inChunk = 0L }
    }
    // a trailing underfull chunk folds back into its predecessor
    if (inChunk > 0 && inChunk < need && chunkId > 0) {
      for (pid <- 0 until n) if (chunkOf(pid) == chunkId) chunkOf(pid) = chunkId - 1
    }

    val chunked = ranged.withColumn("_chunk",
      element_at(typedLit(chunkOf.toSeq), col("_pid") + 1))
    val wIn = Window.partitionBy("_chunk").orderBy(orderCol)
    val sized = chunked
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
