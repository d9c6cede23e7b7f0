package graft.plans

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.expressions.variant.ToVariantObject
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** The reference casts STRUCT/LIST/MAP values to VARIANT directly
  * (`{'a': 1}::VARIANT`, test/sql/variant/); Spark spells that
  * to_variant_object() and rejects the Cast. Map the rejected cast onto
  * the function so the reference spelling binds. */
object StructCastToVariant extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators { case p =>
      p.transformExpressionsUp {
        case c @ Cast(child, VariantType, _, _) if child.resolved =>
          child.dataType match {
            case _: StructType | _: ArrayType | _: MapType =>
              ToVariantObject(child)
            case _ => c
          }
      }
    }
}
