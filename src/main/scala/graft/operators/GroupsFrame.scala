package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** GROUPS window frames (SQL:2011), the reference's
  * EXPR_PRECEDING_GROUPS / EXPR_FOLLOWING_GROUPS boundaries
  * (`/root/reference/src/function/window/window_boundaries_state.cpp:333-367`,
  * exercised by `test/sql/window/test_window_groups.test_slow`).
  *
  * A GROUPS frame counts PEER GROUPS (maximal runs of order-key ties),
  * not rows: `GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING` spans the
  * previous tie-group, the current row's whole tie-group, and the next.
  *
  * Spark has no GROUPS mode, but the frame is exactly expressible with
  * built-in operators: `dense_rank()` over the same (partition, order)
  * assigns each peer group a consecutive integer index, and a numeric
  * RANGE frame over that index selects whole peer groups by group
  * distance — the same peer boundaries the reference computes. Cost is
  * ONE shuffle on the partition key shared by both window passes
  * (Catalyst collapses them into a single sort), so the plan scales the
  * same as any keyed window.
  */
object GroupsFrame {

  /** Append aggregate columns evaluated over a GROUPS frame.
    *
    * @param partitionBy window partition columns (never empty at scale)
    * @param orderBy     window order columns (peer groups = ties of these)
    * @param preceding   group offset back  (Window.unboundedPreceding ok)
    * @param following   group offset ahead (Window.unboundedFollowing ok)
    * @param aggs        aggregates to evaluate over the frame spec
    */
  def frame(
      df: DataFrame,
      partitionBy: Seq[String],
      orderBy: Seq[Column],
      preceding: Long,
      following: Long)(aggs: WindowSpec => Seq[Column]): DataFrame = {
    val idxCol = "_graft_grp_idx"
    val wIdx = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy: _*)
    val wFrame = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(col(idxCol))
      .rangeBetween(preceding, following)
    df.withColumn(idxCol, dense_rank().over(wIdx))
      .select(df.columns.map(col) ++ aggs(wFrame): _*)
  }
}
