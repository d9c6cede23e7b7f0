package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Holistic window aggregate over an UNBOUNDED PRECEDING frame —
  * running median per partition in O(n log n).
  *
  * Spark's own windowed percentile re-collects the frame per row
  * (O(n·frame)); the reference instead maintains incremental order
  * statistics (window_segment_tree.cpp — a segment tree over sorted
  * chunk prefixes). The Spark-shaped equivalent for the
  * UNBOUNDED-PRECEDING frame is a streaming two-heap median: hash
  * repartition on the partition keys, secondary sort by (keys, order),
  * then one pass per partition keeping a max-heap of the lower half and
  * a min-heap of the upper half — O(log n) per row, no frame
  * re-collection.
  *
  * 100 TB shape: ONE hash shuffle on the partition keys (identical to
  * what any window over the same spec needs), per-task state is two
  * heaps bounded by the largest single partition, and partitions
  * process independently across executors. NULLs are skipped (the
  * reference's aggregate semantics); an all-NULL prefix yields NULL.
  * Even-sized prefixes interpolate the two middle values — the
  * reference's CONTINUOUS median.
  */
object RunningMedian {

  def runningMedian(df: DataFrame, partCols: Seq[String],
      orderCols: Seq[String], valueCol: String, outCol: String): DataFrame = {
    val tmp = "__rm_v"
    val in = df.withColumn(tmp, col(valueCol).cast(DoubleType))
    val outSchema = df.schema.add(outCol, DoubleType)
    val partIdx = partCols.map(in.schema.fieldIndex)
    val valIdx = in.schema.fieldIndex(tmp)
    val nOrig = df.schema.length
    val sortCols: Seq[Column] = (partCols ++ orderCols).map(col)
    in.repartition(partCols.map(col): _*)
      .sortWithinPartitions(sortCols: _*)
      .mapPartitions { it =>
        // max-heap (lower half) / min-heap (upper half); lo ≥ hi in size
        var lo: java.util.PriorityQueue[java.lang.Double] = null
        var hi: java.util.PriorityQueue[java.lang.Double] = null
        var curKey: Seq[Any] = null
        it.map { r =>
          val k = partIdx.map(r.get)
          if (curKey == null || k != curKey) {
            curKey = k
            lo = new java.util.PriorityQueue[java.lang.Double](
              java.util.Collections.reverseOrder[java.lang.Double]())
            hi = new java.util.PriorityQueue[java.lang.Double]()
          }
          if (!r.isNullAt(valIdx)) {
            val v = r.getDouble(valIdx)
            if (lo.isEmpty || v <= lo.peek) lo.add(v) else hi.add(v)
            if (lo.size > hi.size + 1) hi.add(lo.poll())
            else if (hi.size > lo.size) lo.add(hi.poll())
          }
          val med: Any =
            if (lo.isEmpty) null
            else if (lo.size == hi.size) (lo.peek + hi.peek) / 2.0
            else lo.peek.doubleValue
          Row.fromSeq(r.toSeq.take(nOrig) :+ med)
        }
      }(Encoders.row(outSchema))
  }
}
