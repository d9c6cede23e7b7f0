package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Holistic aggregates from the reference's core_functions set:
  *
  *  - `lttb(x, y, n)` — Largest-Triangle-Three-Buckets downsampling
  *    (`/root/reference/extension/core_functions/aggregate/holistic/
  *    lttb.cpp:269-336`): keep the first and last point, split the rest
  *    into n−2 buckets, and from each bucket keep the point forming the
  *    largest triangle with the previously kept point and the NEXT
  *    bucket's average (shoelace area). The reference requires x-ordered
  *    input (`lttb(... ORDER BY x)`); Spark aggregation carries no ORDER
  *    BY, so the state sorts by x at finalize — same result, one extra
  *    O(v log v) per group. State is the buffered group (like the
  *    reference's linked-list state): bounded by the SERIES length, not
  *    the table — fine for its purpose (downsampling per-key time series
  *    that fit a plot), wrong tool for billion-point single groups.
  *
  *  - `reservoir_quantile(x, q, n)` — approximate quantile over a bounded
  *    reservoir (`reservoir_quantile.cpp`). State is O(n) per partial
  *    regardless of input size — the scale win over exact quantiles, which
  *    shuffle every value. Randomness is hash-derived (deterministic for a
  *    fixed arrival order) instead of the reference's RNG; like the
  *    reference, results are approximate and arrival-order dependent, so
  *    the driver gate is rows-only and the spec asserts exactness when the
  *    reservoir holds everything plus tolerance beyond.
  */
object Holistic {

  case class Pt(x: Double, y: Double)

  /** The reference's selection loop, verbatim semantics. Input must be
    * x-sorted; returns all points when v ≤ n.
    */
  def lttbSelect(pts: IndexedSeq[Pt], n: Int): IndexedSeq[Pt] = {
    val v = pts.length
    if (v <= n || n <= 0) return pts
    if (n == 1) return IndexedSeq(pts.head)
    if (n == 2) return IndexedSeq(pts.head, pts.last)
    val sel = new Array[Int](n)
    sel(0) = 0
    sel(n - 1) = v - 1
    val width = (v - 2).toDouble / (n - 2).toDouble
    def bucketIndex(m: Double): Int = math.floor(m * width).toInt + 1
    var prev = 0
    var i = 1
    while (i < n - 1) {
      val nextBeg = bucketIndex(i)
      val nextEnd = math.min(bucketIndex(i + 1), v)
      val currBeg = bucketIndex(i - 1)
      val currEnd = math.min(bucketIndex(i), v)
      var avgX = 0.0
      var avgY = 0.0
      var j = nextBeg
      while (j < nextEnd) { avgX += pts(j).x; avgY += pts(j).y; j += 1 }
      avgX /= (nextEnd - nextBeg)
      avgY /= (nextEnd - nextBeg)
      val ax = pts(prev).x
      val ay = pts(prev).y
      var maxArea = -1.0
      var best = currBeg
      var c = currBeg
      while (c < currEnd) {
        val area = math.abs((ax - avgX) * (pts(c).y - ay) - (ax - pts(c).x) * (avgY - ay)) * 0.5
        if (area > maxArea) { maxArea = area; best = c }
        c += 1
      }
      sel(i) = best
      prev = best
      i += 1
    }
    sel.toIndexedSeq.map(pts)
  }

  class LttbAgg(n: Int) extends Aggregator[Pt, Seq[Pt], Seq[Pt]] {
    override def zero: Seq[Pt] = Vector.empty
    override def reduce(b: Seq[Pt], p: Pt): Seq[Pt] = if (p == null) b else b :+ p
    override def merge(a: Seq[Pt], b: Seq[Pt]): Seq[Pt] = a ++ b
    override def finish(b: Seq[Pt]): Seq[Pt] =
      lttbSelect(b.sortBy(p => (p.x, p.y)).toIndexedSeq, n)
    override def bufferEncoder: Encoder[Seq[Pt]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pt]]()
    override def outputEncoder: Encoder[Seq[Pt]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pt]]()
  }

  /** `df.agg(Holistic.lttb(20)(xCol, yCol))` — args flatten the Pt fields. */
  def lttb(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new LttbAgg(n), Encoders.product[Pt])

  // ---- reservoir_quantile ------------------------------------------------

  case class RqBuf(seen: Long, sample: Vector[Double])

  private def mix(a: Long, b: Long): Long = {
    var h = a * 0x9e3779b97f4a7c15L + b
    h ^= h >>> 32; h *= 0xff51afd7ed558ccdL; h ^= h >>> 32
    h
  }

  class ReservoirQuantileAgg(q: Double, size: Int)
      extends Aggregator[java.lang.Double, RqBuf, java.lang.Double] {
    require(q >= 0 && q <= 1 && size > 0)

    override def zero: RqBuf = RqBuf(0L, Vector.empty)

    // Algorithm R with hash-derived pseudo-randomness: the j-th arrival
    // replaces a slot with probability size/j, slot chosen by the hash.
    override def reduce(b: RqBuf, x: java.lang.Double): RqBuf = {
      if (x == null) return b
      val seen = b.seen + 1
      if (b.sample.length < size) RqBuf(seen, b.sample :+ x.doubleValue())
      else {
        val j = math.floorMod(mix(seen, java.lang.Double.doubleToLongBits(x)), seen)
        if (j < size) RqBuf(seen, b.sample.updated(j.toInt, x.doubleValue()))
        else RqBuf(seen, b.sample)
      }
    }

    // WEIGHTED merge: each side contributes slots proportional to how many
    // rows its sample represents (`seen`), hash-ranked within the side for
    // determinism. An unweighted union-take would let a 64-row partial
    // outvote a million-row partial 50/50 and bias the quantile far beyond
    // the documented tolerance — the reference's reservoir merge weights
    // the same way.
    override def merge(a: RqBuf, b: RqBuf): RqBuf = {
      val all = a.sample.length + b.sample.length
      if (all <= size) return RqBuf(a.seen + b.seen, a.sample ++ b.sample)
      val total = math.max(a.seen + b.seen, 1L)
      val fromA = math.min(a.sample.length,
        math.max(size - b.sample.length,
          math.round(size.toDouble * a.seen / total).toInt))
      val fromB = size - fromA
      def pick(s: Vector[Double], n: Int): Vector[Double] =
        if (s.length <= n) s
        else s.zipWithIndex
          .sortBy { case (x, i) => mix(java.lang.Double.doubleToLongBits(x), i) }
          .take(n).map(_._1)
      RqBuf(a.seen + b.seen, pick(a.sample, fromA) ++ pick(b.sample, fromB))
    }

    override def finish(b: RqBuf): java.lang.Double =
      if (b.sample.isEmpty) null
      else {
        val s = b.sample.sorted
        s((q * (s.length - 1)).toInt) // discrete lower quantile, like the reference
      }

    override def bufferEncoder: Encoder[RqBuf] = Encoders.product[RqBuf]
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  def reservoirQuantile(q: Double, size: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new ReservoirQuantileAgg(q, size), Encoders.DOUBLE)
}
