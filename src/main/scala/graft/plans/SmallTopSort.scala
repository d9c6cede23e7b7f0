package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Terminal-ORDER-BY single-partition rewrite.
  *
  * A global `Sort` plans as RangePartitioning, and the range partitioner
  * SAMPLES its child to pick bounds — a separate job that re-executes
  * everything after the last exchange, then the real shuffle runs the same
  * subtree again. For the common analytics shape `aggregate → ORDER BY`
  * the final result is a handful of rows, so the sampling pass, the range
  * exchange and the N post-shuffle sort tasks are pure fixed overhead
  * (2 jobs + child recomputed twice to order rows that fit in one task).
  *
  * Gate: the optimizer's size estimate for the sort input, OR the sum of
  * the plan's leaf-relation estimates, is at most
  * `spark.graft.smallsort.maxBytes` (default 128 MB — one guide-sized
  * reduce partition). Two bounds because the size-only stats model fails
  * in opposite directions: aggregates inherit their child's size (a
  * 4-row GROUP BY over a 50 MB table "weighs" 50 MB), and join outputs
  * multiply (a broadcast dim join "weighs" petabytes). The leaf sum is
  * the honest scale signal — a query that READS under 128 MB has a
  * floor-dominated terminal sort; one that reads terabytes keeps the
  * parallel range sort no matter what the estimate says. Rewrite
  *
  *   Sort(global = true, child)  →  Sort(global = false, Repartition(1, child))
  *
  * One single-partition round-robin exchange (no partitioner sampling —
  * and Spark skips its defensive pre-repartition sort for numPartitions=1,
  * where the row→partition map is trivially deterministic under retry)
  * feeding one in-task sort. Row multiset and total order are identical;
  * only the physical route changes.
  *
  * Scale safety is the stats gate itself, not a config pinned to this box:
  * at cluster scale the estimate exceeds the threshold and the plan is
  * untouched (the same adaptivity contract as RangeJoin.autoLess /
  * tuneForScale). ORDER BY + LIMIT is deliberately left alone — the
  * rewrite only fires on the plan-root sort, never under a Limit, so
  * TakeOrderedAndProject keeps planning top-N.
  *
  * Registered through ExperimentalMethods (EngineSession.configure), which
  * runs in the optimizer's final user batch: after pushdown/collapse, with
  * final stats. SPARK_GRAFT_NOSMALLSORT=1 keeps it out of the session for
  * A/B; spark.graft.smallsort.maxBytes=0 disables it per-query.
  */
object SmallTopSort extends Rule[LogicalPlan] {

  private val MaxBytesKey = "spark.graft.smallsort.maxBytes"

  private def maxBytes: Long =
    try conf.getConfString(MaxBytesKey, (128L << 20).toString).toLong
    catch { case _: NumberFormatException => 0L }

  /** The sort the user's query ENDS with: walk the root spine through
    * output-preserving wrappers (projections, coalesce/repartition, write
    * commands) but never through a Limit — `Limit(Sort)` belongs to
    * TakeOrderedAndProject.
    */
  @scala.annotation.tailrec
  private def rootSort(p: LogicalPlan): Option[Sort] = p match {
    case s: Sort if s.global            => Some(s)
    case pr: Project                    => rootSort(pr.child)
    case r: RepartitionOperation        => rootSort(r.child)
    case w: V2WriteCommand              => rootSort(w.query)
    case c: Command if c.children.length == 1 => rootSort(c.children.head)
    case _                              => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mb = maxBytes
    if (mb <= 0L) return plan
    def small(s: Sort): Boolean =
      s.child.stats.sizeInBytes <= mb ||
        s.child.collectLeaves().map(_.stats.sizeInBytes).sum <= mb
    rootSort(plan) match {
      case Some(s) if small(s) =>
        val local = Sort(s.order, global = false,
          Repartition(1, shuffle = true, s.child))
        plan.transformDown { case node if node eq s => local }
      case _ => plan
    }
  }
}
