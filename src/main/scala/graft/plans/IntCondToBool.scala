package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Reference conditional-context coercion: the reference implicitly casts
  * integral values to BOOLEAN in conditional positions — `CASE WHEN 2
  * THEN …` is `CASE WHEN 2 != 0 THEN …` (numeric→bool cast,
  * `src/common/operator/cast_operators.cpp`), where ANSI Spark rejects
  * the plan outright (catalog/function/test_window_macro.test exercises
  * this through a macro body). Injected as a resolution rule at session
  * build ([[graft.engine.EngineSession.builder]]); deliberately scoped
  * to CaseWhen/If conditions — the one context the reference corpus
  * uses — rather than every boolean position.
  */
object IntCondToBool extends Rule[LogicalPlan] {
  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _                                             => false
  }

  private def needsBool(e: Expression): Boolean =
    e.resolved && (isIntegral(e.dataType) || e.dataType == StringType)

  private def boolify(c: Expression): Expression =
    if (c.resolved && isIntegral(c.dataType))
      Not(EqualTo(c, Cast(Literal(0), c.dataType)))
    else if (c.resolved && c.dataType == StringType)
      // the reference's VARCHAR→BOOLEAN conditional cast ('1'/'true'/'t');
      // Spark's string→boolean cast accepts the same lexicon and errors
      // on anything else, exactly like the reference's Conversion Error
      Cast(c, BooleanType)
    else c

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Resolution rules run at every analyzer fixed-point iteration of
    // every eager Dataset analysis — an unguarded whole-tree traversal
    // here costs ~10-20 ms per DataFrame build on wide plans (measured,
    // round-10 bench drift). TreePattern pruning skips any subtree that
    // provably contains no CASE/IF.
    import org.apache.spark.sql.catalyst.trees.TreePattern.{CASE_WHEN, IF}
    plan.resolveExpressionsWithPruning(
      _.containsAnyPattern(CASE_WHEN, IF)) {
      case cw @ CaseWhen(branches, elseValue)
          if branches.exists(b => needsBool(b._1)) =>
        CaseWhen(branches.map { case (c, v) => (boolify(c), v) }, elseValue)
      case If(pred, t, f) if needsBool(pred) =>
        If(boolify(pred), t, f)
    }
  }
}
