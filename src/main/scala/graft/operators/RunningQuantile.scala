package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Holistic windowed quantile over an UNBOUNDED PRECEDING frame —
  * running `quantile_cont(v, q)` per partition in O(n log n).
  *
  * The two-heap trick ([[RunningMedian]]) only reaches the 0.5
  * quantile; the reference's general answer is a merge-sort tree
  * (`src/function/window/window_merge_sort_tree.cpp`) giving O(log² n)
  * rank queries. The Spark-shaped equivalent: hash-repartition on the
  * partition keys, secondary-sort by (keys, order), then per GROUP
  * coordinate-compress the group's values once and stream a Fenwick
  * (binary-indexed) tree over the compressed domain — insert is
  * O(log m), and the k-th-smallest query is one binary-lifting descent,
  * also O(log m), with m = distinct values in the group.
  *
  * 100 TB shape: ONE hash shuffle on the partition keys (the same
  * exchange any window over this spec needs); groups process
  * independently and stream group-at-a-time (state is one group's rows
  * plus an int array over its distinct values — the same O(partition)
  * bound Spark's own WindowExec buffers for ANY window function).
  *
  * Interpolation matches the reference's CONTINUOUS quantile
  * (`quantile_cont`): position q·(n−1) over the 0-based sorted prefix,
  * linear between the two straddling values. NULLs are skipped; an
  * all-NULL prefix yields NULL.
  */
object RunningQuantile {

  def runningQuantile(df: DataFrame, partCols: Seq[String],
      orderCols: Seq[String], valueCol: String, q: Double,
      outCol: String): DataFrame = {
    require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q")
    val tmp = "__rq_v"
    val in = df.withColumn(tmp, col(valueCol).cast(DoubleType))
    val outSchema = df.schema.add(outCol, DoubleType)
    val partIdx = partCols.map(in.schema.fieldIndex)
    val valIdx = in.schema.fieldIndex(tmp)
    val nOrig = df.schema.length
    val sortCols: Seq[Column] = (partCols ++ orderCols).map(col)
    in.repartition(partCols.map(col): _*)
      .sortWithinPartitions(sortCols: _*)
      .mapPartitions { it =>
        new Iterator[Row] {
          private val rowsIn = it.buffered
          private var groupRows: Iterator[Row] = Iterator.empty
          override def hasNext: Boolean = groupRows.hasNext || rowsIn.hasNext
          override def next(): Row = {
            if (!groupRows.hasNext) groupRows = processNextGroup()
            groupRows.next()
          }
          private def processNextGroup(): Iterator[Row] = {
            val key = partIdx.map(rowsIn.head.get)
            val rows = scala.collection.mutable.ArrayBuffer[Row]()
            while (rowsIn.hasNext && partIdx.map(rowsIn.head.get) == key)
              rows += rowsIn.next()
            // coordinate-compress this group's non-null values
            val sortedVals = rows.iterator
              .filterNot(_.isNullAt(valIdx)).map(_.getDouble(valIdx))
              .toArray.sorted.distinct
            val m = sortedVals.length
            val tree = new Array[Int](m + 1) // Fenwick over value ranks
            def add(i0: Int): Unit = {
              var i = i0 + 1
              while (i <= m) { tree(i) += 1; i += i & (-i) }
            }
            // index of the k-th smallest inserted value (0-based k)
            def select(k0: Int): Int = {
              var k = k0 + 1 // 1-based rank
              var pos = 0
              var pw = Integer.highestOneBit(math.max(m, 1))
              while (pw > 0) {
                if (pos + pw <= m && tree(pos + pw) < k) {
                  pos += pw; k -= tree(pos)
                }
                pw >>= 1
              }
              pos // 0-based compressed index
            }
            var cnt = 0
            rows.iterator.map { r =>
              if (!r.isNullAt(valIdx)) {
                add(java.util.Arrays.binarySearch(sortedVals, r.getDouble(valIdx)))
                cnt += 1
              }
              val out: Any =
                if (cnt == 0) null
                else {
                  val pos = q * (cnt - 1)
                  val lo = math.floor(pos).toInt
                  val hi = math.ceil(pos).toInt
                  val vLo = sortedVals(select(lo))
                  if (hi == lo) vLo
                  else {
                    // weighted form (CRN−RN)·lo + (RN−FRN)·hi — the
                    // oracle DuckDB's (1.0) rounding; HEAD's
                    // lo + (hi−lo)·d (interpolate.hpp:22) differs by
                    // 1 ulp on non-representable deltas
                    val vHi = sortedVals(select(hi))
                    (hi - pos) * vLo + (pos - lo) * vHi
                  }
                }
              Row.fromSeq(r.toSeq.take(nOrig) :+ out)
            }
          }
        }
      }(Encoders.row(outSchema))
  }
}
