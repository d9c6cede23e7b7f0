package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band-partitioned inequality join — the distributed path for joins whose
  * only useful predicate is an inequality. The reference plans
  * PhysicalPiecewiseMergeJoin for one inequality and PhysicalIEJoin for two
  * (plan_comparison_join.cpp:104-210, physical_iejoin.cpp) precisely
  * because nested-loop dies when neither side fits in memory. Spark's
  * native answer is BroadcastNestedLoopJoin — correct, but it requires one
  * side to broadcast; at 100 TB neither side does.
  *
  * This operator restores a shuffled, band-parallel plan:
  *
  *  1. one bounded-memory quantile pass (Greenwald–Khanna via
  *     approxQuantile) over the right side derives B equi-depth value
  *     bands of the first inequality column — equi-depth keeps bands
  *     balanced under value skew;
  *  2. each right row hashes to its band; each left row replicates to the
  *     bands it can possibly match. Band assignment is monotone in the
  *     value, so `l < r` implies `band(l) <= band(r)` and replicating the
  *     left row to bands `band(l)..B-1` covers every match;
  *  3. both sides shuffle ONCE on the band id and Spark runs an ordinary
  *     equi-join on it, with the full inequality (+ any residual
  *     predicate) as the join condition. Within a band pair that is a
  *     nested-loop over two bounded chunks; across bands it is B-way
  *     parallel with no broadcast and no single-task funnel.
  *
  * Cost: the left side shuffles ~B/2 replicas per row (bounded, chosen by
  * `bands`); join work is O(output) like the reference's IEJoin result
  * enumeration. The boundary array (≤ B doubles) ships as plan literals.
  *
  * Nulls in an inequality column never match (SQL three-valued logic), so
  * both sides drop them before banding.
  */
object RangeJoin {

  /** Inner-join `left` × `right` on `left(leftCol) < right(rightCol)`
    * (`<=` when `strict = false`) AND `residual`, without broadcasting
    * either side. Column names must be disjoint across the two inputs
    * (alias before calling, as for any self-join); both band columns must
    * be numeric.
    */
  def bandedLess(
      left: DataFrame,
      leftCol: String,
      right: DataFrame,
      rightCol: String,
      residual: Option[Column] = None,
      bands: Int = 32,
      strict: Boolean = true): DataFrame = {
    val l = left.where(col(leftCol).isNotNull)
    val r = right.where(col(rightCol).isNotNull)

    // Equi-depth cut points from the right side. Duplicate quantiles (heavy
    // hitters) collapse; the band count degrades gracefully to the number
    // of distinct cuts + 1. Double-cast banding is only a PARTITIONING
    // decision — the exact typed inequality is still evaluated on every
    // candidate pair — so double rounding cannot change results, only
    // which band evaluates them. Monotonicity of the cast keeps coverage:
    // l < r (exact) implies band(l) <= band(r) (non-strict, double).
    val probs = (1 until math.max(bands, 1)).map(_.toDouble / bands).toArray
    val cuts =
      if (probs.isEmpty) Array.empty[Double]
      else r.stat.approxQuantile(rightCol, probs, 0.01).distinct.sorted
    val nBands = cuts.length + 1

    // band(v) = number of cuts <= v; a codegen'd fold over the literal
    // boundary array (no UDF).
    def bandOf(c: Column): Column =
      if (cuts.isEmpty) lit(0)
      else aggregate(
        array(cuts.map(lit(_)).toSeq: _*),
        lit(0),
        (acc, cut) => acc + when(c.cast("double") >= cut, 1).otherwise(0))

    val lb = l.withColumn(
      "__graft_band",
      explode(sequence(bandOf(col(leftCol)), lit(nBands - 1))))
    // The right band intentionally goes through a one-element explode too
    // (not a plain Project alias): with constraint propagation on, Catalyst
    // substitutes a Project-aliased join key with its defining expression
    // and infers a left-side filter referencing right-side attributes — an
    // unresolvable plan that fails at runtime with
    // INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND. Generator outputs are not
    // alias-substitutable, which blocks the bad inference.
    val rb = r.withColumn(
      "__graft_band",
      explode(sequence(bandOf(col(rightCol)), bandOf(col(rightCol)))))

    val ineq =
      if (strict) col(leftCol) < col(rightCol)
      else col(leftCol) <= col(rightCol)
    val cond = residual.map(ineq && _).getOrElse(ineq)

    lb.join(rb, Seq("__graft_band")).where(cond).drop("__graft_band")
  }

  /** Stats-dispatched inequality join: when either side's estimated size
    * fits the broadcast threshold, the plain theta join wins (Spark plans
    * BroadcastNestedLoopJoin — measured ~1.5× faster than banding at
    * broadcastable scale, since banding pays a quantile pass plus ~B/2
    * left-row replication); past the threshold neither side may
    * broadcast and the banded shuffle plan is the only one that scales.
    * Same dispatch shape as AsOfJoin.backwardAuto.
    */
  def autoLess(
      left: DataFrame,
      leftCol: String,
      right: DataFrame,
      rightCol: String,
      residual: Option[Column] = None,
      bands: Int = 32,
      strict: Boolean = true): DataFrame = {
    val thr = left.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    def fits(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= thr
    if (thr > 0 && (fits(right) || fits(left))) {
      val ineq =
        if (strict) col(leftCol) < col(rightCol)
        else col(leftCol) <= col(rightCol)
      left.join(right, residual.map(ineq && _).getOrElse(ineq))
    } else bandedLess(left, leftCol, right, rightCol, residual, bands, strict)
  }
}
