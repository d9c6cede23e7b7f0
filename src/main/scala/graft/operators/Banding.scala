package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared, memoized equi-depth cut derivation for the band-partitioned
  * operators ([[RangeJoin]], [[ChunkedWindow]]).
  *
  * The cut points come from one bounded-memory Greenwald–Khanna pass
  * (`approxQuantile`) — correct but a full extra scan of the banded
  * column per query. Within a session the same (plan, column, count)
  * triple recurs constantly: every bench iteration, every re-execution
  * of a cached query shape, and any query that bands the same input
  * twice. Cuts are only a PARTITIONING decision (exact predicates are
  * re-checked on every candidate), so reusing them across executions
  * can never change results — stale cuts after an in-place data change
  * cost balance, not correctness. Keyed by the logical plan's semantic
  * hash; bounded size with whole-cache reset (band derivations are
  * cheap to redo, eviction bookkeeping is not worth it).
  */
object Banding {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, Int), Array[Double]]()
  private val MaxEntries = 256

  /** `n`-quantile cut points of `col` over `df` (distinct, sorted;
    * length ≤ n−1), computed once per (plan, col, n) and reused.
    */
  def cuts(df: DataFrame, col: String, n: Int, relErr: Double): Array[Double] = {
    val key = (df.queryExecution.logical.semanticHash(), col, n)
    if (cache.size > MaxEntries) cache.clear()
    cache.computeIfAbsent(key, _ => {
      val probs = (1 until math.max(n, 1)).map(_.toDouble / n).toArray
      if (probs.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(col, probs, relErr).distinct.sorted
    })
  }
}
