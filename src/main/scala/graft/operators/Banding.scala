package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}

/** Shared, memoized equi-depth cut derivation for the band-partitioned
  * operators ([[RangeJoin]], [[ChunkedWindow]]).
  *
  * Two sources, tried in order:
  *
  *  1. **Parquet row-group statistics** — when the input is a (possibly
  *     projected/filtered) scan of parquet files, the per-row-group
  *     (min, max, rowCount) triples for the banded column come straight
  *     out of the file FOOTERS (a metadata read, no data scan). Each
  *     row group is treated as uniform mass over [min, max]; the
  *     weighted point multiset is inverted at i/n for the cuts. The
  *     reference reads the same zone-map statistics for its join
  *     planning (storage statistics propagation). Cuts are only a
  *     PARTITIONING decision — exact predicates re-check every
  *     candidate — so the uniform-within-group approximation (and any
  *     filter above the scan) can skew balance, never results.
  *  2. **Greenwald–Khanna pass** (`approxQuantile`) — one bounded-
  *     memory scan, for inputs that are not parquet scans (joins,
  *     aggregates, in-memory frames).
  *
  * Within a session the same (plan, column, count) triple recurs
  * constantly, so derivations are memoized on the logical plan's
  * semantic hash; bounded size with whole-cache reset.
  */
object Banding {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, Int), Array[Double]]()
  private val MaxEntries = 256

  /** Debug/assert hook: which source produced the LAST non-memoized
    * derivation ("stats" | "scan").
    */
  @volatile var lastSource: String = ""

  /** `n`-quantile cut points of `col` over `df` (distinct, sorted;
    * length ≤ n−1), computed once per (plan, col, n) and reused.
    */
  def cuts(df: DataFrame, col: String, n: Int, relErr: Double): Array[Double] = {
    val key = (df.queryExecution.logical.semanticHash(), col, n)
    if (cache.size > MaxEntries) cache.clear()
    cache.computeIfAbsent(key, _ => {
      val probs = (1 until math.max(n, 1)).map(_.toDouble / n).toArray
      if (probs.isEmpty) Array.empty[Double]
      else statsCuts(df, col, n) match {
        case Some(c) => lastSource = "stats"; c
        case None =>
          lastSource = "scan"
          df.stat.approxQuantile(col, probs, relErr).distinct.sorted
      }
    })
  }

  /** True when the plan is only Project/Filter/alias layers over one
    * file-source relation — the shape whose footer stats describe the
    * banded column. (A filter above the scan may skew the distribution;
    * that costs band balance only.)
    */
  private def scanShaped(plan: LogicalPlan): Boolean = plan match {
    case Project(_, c) => scanShaped(c)
    case Filter(_, c) => scanShaped(c)
    case SubqueryAlias(_, c) => scanShaped(c)
    case l if l.children.isEmpty => true
    case _ => false
  }

  private def statsCuts(df: DataFrame, col: String, n: Int): Option[Array[Double]] = {
    try {
      if (!scanShaped(df.queryExecution.analyzed)) return None
      val files = df.inputFiles.filter(_.endsWith(".parquet"))
      if (files.isEmpty) return None
      val conf = df.sparkSession.sessionState.newHadoopConf()
      // one uniform-mass segment [min, max] × rowCount per row group; the
      // mixture CDF is piecewise linear, so ANY number of equi-depth cuts
      // inverts exactly — a fixed per-group sample count would cap the
      // distinct cuts (and thus the band parallelism) at sample count,
      // regardless of how many bands the join asked for
      val segs = scala.collection.mutable.ArrayBuffer[(Double, Double, Double)]()
      for (f <- files) {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks
          val it = blocks.iterator()
          while (it.hasNext) {
            val b = it.next()
            val cc = b.getColumns.iterator()
            var found = false
            while (cc.hasNext && !found) {
              val c = cc.next()
              if (c.getPath.toDotString.equalsIgnoreCase(col)) {
                found = true
                val st = c.getStatistics
                if (st == null || !st.hasNonNullValue) return None
                val lo = toD(st.genericGetMin.asInstanceOf[AnyRef])
                val hi = toD(st.genericGetMax.asInstanceOf[AnyRef])
                if (lo.isNaN || hi.isNaN) return None
                if (b.getRowCount > 0) segs += ((lo, hi, b.getRowCount.toDouble))
              }
            }
            if (!found) return None // column not in footer → bail
          }
        } finally reader.close()
      }
      if (segs.isEmpty) return None
      val total = segs.iterator.map(_._3).sum
      if (total <= 0) return None
      // CDF(x) = Σ w · clamp((x−lo)/(hi−lo), 0, 1)  (point mass when lo=hi)
      def cdf(x: Double): Double = {
        var acc = 0.0
        var i = 0
        while (i < segs.length) {
          val (lo, hi, w) = segs(i)
          acc +=
            (if (x >= hi) w
             else if (x < lo) 0.0
             else if (hi == lo) w
             else w * (x - lo) / (hi - lo))
          i += 1
        }
        acc
      }
      val gMin = segs.iterator.map(_._1).min
      val gMax = segs.iterator.map(_._2).max
      val out = new Array[Double](n - 1)
      var k = 1
      while (k < n) {
        // monotone bisection for CDF(x) ≥ k·total/n
        val target = total * k / n
        var lo = gMin; var hi = gMax
        var it2 = 0
        while (it2 < 60 && hi - lo > math.ulp(hi).max(1e-12)) {
          val mid = (lo + hi) / 2
          if (cdf(mid) >= target) hi = mid else lo = mid
          it2 += 1
        }
        out(k - 1) = hi
        k += 1
      }
      Some(out.distinct.sorted)
    } catch {
      case _: Exception => None // any footer surprise → scan fallback
    }
  }

  private def toD(v: AnyRef): Double = v match {
    case n: java.lang.Number => n.doubleValue
    case other =>
      try other.toString.toDouble catch { case _: Exception => Double.NaN }
  }
}
