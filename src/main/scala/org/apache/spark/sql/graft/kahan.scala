package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Kahan-compensated double sum (reference fsum/sumkahan/kahan_sum,
  * src/core_functions/aggregate/algebraic/ kahan state): keeps a running
  * compensation term so pathological cancellation cases (the corpus adds
  * 2^51+0.5 batteries) stay exact where a plain double fold loses the
  * fraction. Declarative so it stays inside whole-stage codegen; the
  * merge step Kahan-adds the partial (sum, comp) pairs, preserving the
  * compensation across partitions.
  */
case class KahanSum(child: Expression)
    extends DeclarativeAggregate with ImplicitCastInputTypes
    with UnaryLike[Expression] {
  override def prettyName: String = "fsum"
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val sum = AttributeReference("sum", DoubleType, nullable = false)()
  private lazy val comp = AttributeReference("comp", DoubleType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(sum, comp, seen)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(false))

  override lazy val updateExpressions: Seq[Expression] = {
    val y = Subtract(child, comp)
    val t = Add(sum, y)
    Seq(
      If(IsNull(child), sum, t),
      If(IsNull(child), comp, Subtract(Subtract(t, sum), y)),
      Or(seen, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // Kahan-add the right partial (sum + comp folded to one addend)
    val y = Subtract(Add(sum.right, comp.right), comp.left)
    val t = Add(sum.left, y)
    Seq(
      t,
      Subtract(Subtract(t, sum.left), y),
      Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    If(seen, Add(sum, comp), Literal.create(null, DoubleType))

  override protected def withNewChildInternal(c: Expression): KahanSum =
    copy(child = c)
}
