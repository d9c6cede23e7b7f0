package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{Bridge, VecCosine, VecDot, VecL2, VecNorm}

/** Column-DSL entry points for the vector-math expressions
  * (see org.apache.spark.sql.graft.expressions for the Catalyst internals
  * and the reference citations).
  */
object VectorFunctions {
  import Bridge.{column, expression}
  def vec_dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))
  def vec_cosine(a: Column, b: Column): Column = column(VecCosine(expression(a), expression(b)))
  def vec_l2(a: Column, b: Column): Column = column(VecL2(expression(a), expression(b)))
  def vec_norm(a: Column): Column = column(VecNorm(expression(a)))
}
