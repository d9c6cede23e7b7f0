package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for known key skew. AQE's skew-join handles sort-merge
  * skew at runtime by splitting oversized partitions; salting is the
  * plan-level tool when the skew is structural and known up front (a
  * default/placeholder key, a power-law entity) or the join is hash-based:
  * without it, every row of a hot key lands in ONE shuffle partition and
  * one task runs for hours while the rest of the cluster idles.
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right ON key`, with `left`'s hot keys (more
    * than `hotThreshold` rows) salted `salts` ways and `right`'s matching
    * rows replicated `salts` ways, so a hot key's rows spread over `salts`
    * shuffle partitions instead of one. Cold keys join unchanged (salt 0,
    * no replication). Row-identical to the plain join.
    *
    * The hot-key scan is one cheap aggregate over `left`'s key column
    * only; by definition the hot set is small (each member exceeds
    * `hotThreshold` rows), so it collects to the driver and rides into
    * both plans as an `isin` literal — codegen-friendly, no extra join.
    */
  def salted(
      left: DataFrame, right: DataFrame, key: String,
      salts: Int = 16, hotThreshold: Long = 1000000L): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val hot = left.groupBy(key).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > hotThreshold)
      .select(key).collect().map(_.get(0))
    if (hot.isEmpty) return left.join(right, key)

    val isHotL = col(key).isin(hot: _*)
    // even spread without an RNG: hash the row content PLUS its position —
    // content alone would send identical duplicate rows (the archetypal
    // hot key: many copies of one row) to a single salt. Any salt value is
    // correct (the build side is replicated to all of them), so the
    // partitioning-dependent position component affects distribution only.
    val leftS = left.withColumn("_salt",
      when(isHotL, pmod(hash(
        struct(left.columns.map(col): _*), monotonically_increasing_id()), lit(salts)))
        .otherwise(lit(0)))
    val isHotR = col(key).isin(hot: _*)
    val rightS = right
      .withColumn("_salt",
        when(isHotR, sequence(lit(0), lit(salts - 1)))
          .otherwise(array(lit(0))))
      .withColumn("_salt", explode(col("_salt")))
    leftS.join(rightS, Seq(key, "_salt")).drop("_salt")
  }
}
