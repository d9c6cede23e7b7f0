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
  import org.apache.spark.sql.types._

  /** Exact-as-long types (IntegralType itself is private[sql]). */
  private[operators] def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private[operators] def broadcastableTime(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType => true
    case other => isIntegral(other)
  }

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

    // NULL equi-keys/times never match (SQL equality); unioned as-is they
    // WOULD match, because window partitionBy groups NULL keys together.
    // A null-key left row then forms its own empty partition (no fill →
    // right side null), and a null-time left row sorts before every right
    // row (asc nulls-first) → also no fill. Both give the right answer.
    val taggedRight = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
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

    // Row-atomic fill: one struct of ALL rightValues per right row, one
    // last(ignoreNulls=true) over it. Per-column fills would back-fill a
    // NULL field from an OLDER right row, diverging from the reference's
    // PhysicalAsOfJoin (which returns the matched row verbatim) and from
    // backwardBroadcast. A right row's struct is non-null even when every
    // field is null, so the latest matched row always wins atomically.
    val rvStruct = struct(rightValues.map(c => col(s"_rv_$c").as(c)): _*)
    val filled = unioned
      .withColumn("_rv", when(col("_side") === rightSideTag, rvStruct))
      .withColumn("_filled", last(col("_rv"), ignoreNulls = true).over(w))
    filled
      .filter(col("_side") === leftSideTag)
      .select(leftCols.map(col) ++
        rightValues.map(c => col("_filled")(c).as(c)): _*)
  }

  /** Dispatching entry point: when the build side's optimizer-estimated
    * size fits the session's broadcast threshold, take [[backwardBroadcast]]
    * (hash-map probe, NO shuffle of the probe side — the reference's
    * PhysicalAsOfJoin builds exactly this per-key sorted table on its
    * build side); otherwise the shuffle-based [[backward]]. The stats
    * check is free (no job), so the choice scales: a 100 TB right side
    * reports terabytes and routes to the partitioned plan.
    */
  def backwardAuto(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types._
    // Spark accepts byte-suffixed values ("10MB") for this conf; plain
    // toLong would throw on them. Try the plain parse first (covers "-1"),
    // fall back to Spark's own byte-string parser.
    val raw = left.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold").trim
    val threshold =
      try raw.toLong
      catch { case _: NumberFormatException =>
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw) }
    val estimated = right.queryExecution.optimizedPlan.stats.sizeInBytes
    // The broadcast build map keys by the key's exact long value and probes
    // times as longs; fractional key/time types (Double/Float/Decimal) would
    // truncate and silently match wrong rows — only integral keys and
    // timestamp-or-integral times may take the broadcast path.
    val typesOk = AsOfJoin.isIntegral(right.schema(key).dataType) &&
      AsOfJoin.broadcastableTime(left.schema(leftTime).dataType) &&
      AsOfJoin.broadcastableTime(right.schema(rightTime).dataType)
    if (typesOk && threshold > 0 && estimated <= threshold)
      backwardBroadcast(left, right, key, leftTime, rightTime, rightValues, strict)
    else backward(left, right, key, leftTime, rightTime, rightValues, strict)
  }

  /** Broadcast AS-OF: collect the (small) right side into per-key
    * time-sorted arrays, broadcast, and probe with a binary search per
    * left row — no shuffle, no sort of the probe side. This is the
    * reference's build-side layout (physical_asof_join.cpp sorts each
    * hash partition's build rows by time and binary-searches the probe);
    * here the build table is small enough to replicate instead of
    * partition. Time columns must be orderable as epoch micros
    * (timestamp) or numeric.
    */
  def backwardBroadcast(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = left.sparkSession
    // the build map is keyed by the key's long value; a non-integral key
    // (string, or fractional numeric — 1.2 and 1.9 both truncate to 1)
    // would silently join wrong rows — refuse instead (backwardAuto routes
    // such keys to the window plan, which is type-generic)
    require(AsOfJoin.isIntegral(right.schema(key).dataType),
      s"backwardBroadcast requires an integral key column, got ${right.schema(key).dataType}")

    def toMicros(df: DataFrame, c: String) = {
      require(AsOfJoin.broadcastableTime(df.schema(c).dataType),
        s"backwardBroadcast requires integral or timestamp time, got ${df.schema(c).dataType}")
      df.schema(c).dataType match {
        case TimestampType | TimestampNTZType => unix_micros(col(c).cast("timestamp"))
        case _ => col(c).cast("long")
      }
    }

    // NULL keys/times never match in AS-OF semantics; unboxing a null via
    // Row.getLong would fold them into key 0's sorted table instead.
    val build = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(col(key).cast("long").as("_k"), toMicros(right, rightTime).as("_t"),
        struct(rightValues.map(col): _*).as("_v"))
      .collect()
    val byKey: Map[Long, (Array[Long], Array[Row])] = build
      .groupBy(_.getLong(0))
      .map { case (k, rows) =>
        val sorted = rows.sortBy(_.getLong(1))
        (k, (sorted.map(_.getLong(1)), sorted.map(_.getStruct(2))))
      }
    val bc = spark.sparkContext.broadcast(byKey)

    val rightSchema = right.select(rightValues.map(col): _*).schema
    val outSchema = StructType(left.schema.fields ++
      rightSchema.fields.map(_.copy(nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val nRight = rightValues.length
    val strictSearch = strict

    val probe = left
      .withColumn("_probe_t", toMicros(left, leftTime))
    val leftWidth = left.schema.fields.length
    probe.mapPartitions { it =>
      val table = bc.value
      it.map { r =>
        // null probe key/time → no match (left row kept, right side null),
        // matching the window plan and the reference's semantics.
        val matched: Row =
          if (r.isNullAt(leftWidth) || r.getAs[Any](key) == null) null
          else {
            val t = r.getLong(leftWidth) // _probe_t appended last
            val k = r.getAs[Any](key) match {
              case l: Long => l
              case i: Int => i.toLong
              case other => other.asInstanceOf[Number].longValue()
            }
            table.get(k) match {
              case Some((times, vals)) =>
                // rightmost index with times(i) <= t (or < t when strict)
                var lo = 0; var hi = times.length - 1; var ans = -1
                while (lo <= hi) {
                  val mid = (lo + hi) >>> 1
                  val ok = if (strictSearch) times(mid) < t else times(mid) <= t
                  if (ok) { ans = mid; lo = mid + 1 } else hi = mid - 1
                }
                if (ans >= 0) vals(ans) else null
              case None => null
            }
          }
        val out = new Array[Any](leftWidth + nRight)
        var i = 0
        while (i < leftWidth) { out(i) = r.get(i); i += 1 }
        if (matched != null) {
          var j = 0
          while (j < nRight) { out(leftWidth + j) = matched.get(j); j += 1 }
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
      }
    }(enc)
  }
}
