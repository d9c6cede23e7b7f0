package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** approx_top_k — the reference's heavy-hitter sketch aggregate
  * (`/root/reference/extension/core_functions/aggregate/holistic/
  * approx_top_k.cpp`), re-expressed as a typed Spark `Aggregator` (the
  * state-based shape of the reference's AggregateFunction callbacks:
  * initialize/update/combine/finalize — aggregate_function.hpp:76-85).
  *
  * Algorithm: Metwally et al. space-saving with capacity `m = slack*k`.
  * Guarantees after any distributed merge: every key whose true count
  * exceeds N/m is present, and reported counts overestimate by at most
  * the tracked `err`. The buffer is a bounded map, so partial aggregation
  * ships O(m) state per partition regardless of input size — this is the
  * whole point at 100 TB: an exact top-k by groupBy+orderBy shuffles every
  * distinct key; the sketch shuffles `m` entries per partition.
  */
object ApproxTopK {

  case class Entry(key: String, n: Long, err: Long)
  case class Buf(items: Map[String, (Long, Long)]) // key -> (count, err)

  class TopKAgg(k: Int, slack: Int = 6) extends Aggregator[String, Buf, Seq[Entry]] {
    private val m = math.max(1, slack * k)

    override def zero: Buf = Buf(Map.empty)

    override def reduce(b: Buf, key: String): Buf = {
      if (key == null) return b
      b.items.get(key) match {
        case Some((n, e)) => Buf(b.items.updated(key, (n + 1, e)))
        case None if b.items.size < m => Buf(b.items.updated(key, (1L, 0L)))
        case None =>
          // evict the minimum; the newcomer inherits its count as error
          val (minK, (minN, _)) = b.items.minBy { case (kk, (n, _)) => (n, kk) }
          Buf(b.items - minK + (key -> (minN + 1, minN)))
      }
    }

    override def merge(x: Buf, y: Buf): Buf = {
      // standard space-saving merge: sum counts for shared keys; keys
      // missing from one side absorb that side's minimum as extra error;
      // then trim back to capacity
      def minCount(b: Buf): Long =
        if (b.items.size < m) 0L else b.items.values.map(_._1).min
      val mx = minCount(x); val my = minCount(y)
      val keys = x.items.keySet ++ y.items.keySet
      val merged = keys.iterator.map { kk =>
        val (nx, ex) = x.items.getOrElse(kk, (mx, mx))
        val (ny, ey) = y.items.getOrElse(kk, (my, my))
        kk -> (nx + ny, ex + ey)
      }.toMap
      Buf(merged.toSeq
        .sortBy { case (kk, (n, _)) => (-n, kk) }
        .take(m).toMap)
    }

    override def finish(b: Buf): Seq[Entry] =
      b.items.toSeq
        .map { case (kk, (n, e)) => Entry(kk, n, e) }
        .sortBy(en => (-en.n, en.key))
        .take(k)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Column-API entry: `df.agg(ApproxTopK.topK(10)(col))`. */
  def udafFor(k: Int, slack: Int = 6): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k, slack), Encoders.STRING)
}
