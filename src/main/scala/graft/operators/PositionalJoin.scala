package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Positional join — align two relations row-by-row, the reference's
  * `PhysicalPositionalJoin` (`/root/reference/src/execution/operator/join/
  * physical_positional_join.cpp`). Shorter side is padded with NULLs
  * (FULL OUTER on position), matching the reference.
  *
  * Implemented with `RDD.zipWithIndex` (distributed two-pass: per-partition
  * counts, then offset add — no single-partition bottleneck) + an equi-join
  * on the position, which Spark plans as a shuffle join on `_pos`.
  */
object PositionalJoin {

  def withRowIndex(df: DataFrame, name: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(name, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  def apply(left: DataFrame, right: DataFrame): DataFrame = {
    val l = withRowIndex(left, "_pos")
    val r = withRowIndex(right, "_pos")
    l.join(r, Seq("_pos"), "full_outer")
      .orderBy(col("_pos"))
      .drop("_pos")
  }
}
