package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Reference list concatenation operator: `+` over two LISTs is
  * list_concat (core_functions list operators; test/sql/binder/
  * alias_qualification tests exercise it as `lower + upper` over
  * split() results). Spark's Add is numeric-only, so rewrite
  * Add(array, array) to Concat at resolution time.
  *
  * Same cost discipline as [[IntCondToBool]]: resolution rules run at
  * every analyzer fixed-point iteration, so the traversal is pruned to
  * plans that contain a BINARY_ARITHMETIC node at all, and the rewrite
  * only fires on RESOLVED children that are both arrays.
  */
object ListPlusToConcat extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.trees.TreePattern.BINARY_ARITHMETIC
    plan.resolveExpressionsWithPruning(_.containsPattern(BINARY_ARITHMETIC)) {
      case Add(l, r, _)
          if l.resolved && r.resolved &&
            l.dataType.isInstanceOf[ArrayType] &&
            r.dataType.isInstanceOf[ArrayType] =>
        Concat(Seq(l, r))
    }
  }
}
