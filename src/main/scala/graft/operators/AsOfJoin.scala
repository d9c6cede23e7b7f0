package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join (nearest-predecessor match), the reference's
  * `PhysicalAsOfJoin` (`/root/reference/src/execution/operator/join/
  * physical_asof_join.cpp`): for every left row, attach the single right
  * row with the greatest right-time <= left-time within the same key.
  *
  * Spark-first plan: tag both sides, UNION, then one window pass per key
  * ordered by (time, side) filling the right columns forward with
  * `last(_, ignoreNulls = true)`. Cost = ONE shuffle + sort over
  * (key, time) — same asymptotics as the reference's partitioned merge.
  * No row explosion (a range join would rewrite to O(n·m) nested loop),
  * so this scales to 100 TB: the shuffle is keyed by the join key, skew
  * handled by AQE.
  *
  * Right side must be unique per (key, time); pre-aggregate if not.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side (its `rightValues` get attached)
    * @param key        equi-key column name present on both sides
    * @param leftTime   time column name on left
    * @param rightTime  time column name on right
    * @param rightValues right columns to carry (renamed as given)
    * @param strict     if true use `<` (strictly before) instead of `<=`
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    // side ordering: at equal times the right row must sort BEFORE the
    // left row for <= semantics, AFTER it for < semantics.
    val rightSideTag = if (strict) 1 else 0
    val leftSideTag = if (strict) 0 else 1

    val taggedLeft = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(leftSideTag))
      .select(Seq(col(key).as("_k"), col("_t"), col("_side")) ++
        leftCols.map(c => col(c)) ++
        rightValues.map(c => lit(null).cast(right.schema(c).dataType).as(s"_rv_$c")): _*)

    val taggedRight = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(rightSideTag))
      .select(Seq(col(key).as("_k"), col("_t"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValues.map(c => col(c).as(s"_rv_$c")): _*)

    val unioned = taggedLeft.unionAll(taggedRight)
    val w = Window
      .partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightValues.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"_filled_$c", last(col(s"_rv_$c"), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("_side") === leftSideTag)
      .select(leftCols.map(col) ++
        rightValues.map(c => col(s"_filled_$c").as(c)): _*)
  }
}
