package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `list_aggregate(l, 'name' [, extra])` and its `list_<name>` aliases —
  * the reference's list-rewrite of every regular aggregate
  * (`core_functions/scalar/list/list_aggregates.cpp`): the aggregate runs
  * per ROW over the list's elements. Row-local by construction (the
  * 100 TB story is the same as any scalar function — no shuffle, fully
  * partition-parallel); eval-only because it serves the conformance
  * surface, not the pipeline hot path.
  *
  * NULL list → NULL; NULL elements are skipped (aggregate semantics);
  * empty input → NULL (count/histogram excepted). Integral sums widen to
  * DECIMAL(38,0) the way the reference widens to HUGEINT; statistical
  * aggregates are computed with the same estimators the reference uses
  * (sample stddev/var, G1 skewness, G2 kurtosis, base-2 entropy over
  * value frequencies, MAD as median of absolute deviations from the
  * median).
  */
case class ListAggr(list: Expression, nameExpr: Expression,
    extra: Option[Expression]) extends Expression with CodegenFallback {
  override def prettyName: String = "list_aggregate"
  override def children: Seq[Expression] = Seq(list, nameExpr) ++ extra
  override def nullable: Boolean = true

  private lazy val fname: String = nameExpr.eval(null) match {
    case s: UTF8String => s.toString.toLowerCase
    case other => String.valueOf(other).toLowerCase
  }

  private def elemType: DataType = list.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = list.dataType match {
    case _: ArrayType =>
      if (!nameExpr.foldable)
        TypeCheckResult.TypeCheckFailure("aggregate name must be a literal")
      else if (!Names.contains(fname))
        TypeCheckResult.TypeCheckFailure(s"unknown list aggregate: $fname")
      else TypeCheckResult.TypeCheckSuccess
    case NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"cannot aggregate $other")
  }

  private val Names: Set[String] = Set(
    "sum", "min", "max", "avg", "mean", "median", "mode", "count",
    "product", "sem", "skewness", "kurtosis", "entropy", "mad",
    "stddev", "stddev_samp", "stddev_pop", "var", "var_samp", "var_pop",
    "variance", "fsum", "sumkahan", "kahan_sum", "favg", "string_agg", "group_concat", "histogram", "bool_and", "bool_or",
    "first", "last", "any_value", "approx_count_distinct")

  override def dataType: DataType = fname match {
    case "count" | "approx_count_distinct" => LongType
    case "min" | "max" | "mode" | "first" | "last" | "any_value" => elemType
    // reference mad over temporal inputs yields an INTERVAL (the median
    // absolute deviation is a difference, test_mad.test)
    case "mad" if elemType == DateType || elemType == TimestampType ||
        elemType == TimestampNTZType || elemType.isInstanceOf[TimeType] =>
      CalendarIntervalType
    // decimal mad stays decimal: the reference computes it in scaled
    // integer arithmetic (truncating medians), not doubles
    case "mad" if elemType.isInstanceOf[DecimalType] => elemType
    case "sum" | "fsum" | "sumkahan" | "kahan_sum" => elemType match {
      case _: DoubleType | _: FloatType => DoubleType
      case d: DecimalType => DecimalType(38, d.scale)
      case _ => DecimalType(38, 0)
    }
    case "string_agg" | "group_concat" => StringType
    case "histogram" => MapType(histKeyType, LongType)
    case "bool_and" | "bool_or" => BooleanType
    case _ => DoubleType
  }

  // binned-histogram key type: the reference promotes the bin list to
  // the input's type at bind (wider of the two)
  private def histKeyType: DataType = extra.map(_.dataType) match {
    case Some(ArrayType(e, _)) if e != NullType =>
      if (elemType == NullType) e
      else org.apache.spark.sql.catalyst.analysis.TypeCoercion
        .findWiderTypeForTwo(elemType, e).getOrElse(e)
    case _ => elemType
  }

  private def toD(v: Any): Double = v match {
    case n: java.lang.Number => n.doubleValue
    case d: Decimal => d.toDouble
    case b: java.lang.Boolean => if (b) 1.0 else 0.0
    case other => other.toString.toDouble
  }

  private def ordering: Ordering[Any] = elemType match {
    case _: StringType =>
      Ordering.by((v: Any) => v.asInstanceOf[UTF8String])
    case _: BooleanType =>
      Ordering.by((v: Any) => v.asInstanceOf[Boolean])
    case _ => Ordering.by((v: Any) => toD(v))
  }

  private def median(xs: Array[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    // even case uses the reference's interpolation spelling
    // lo*(1-d) + hi*d (interpolate.hpp) — (lo+hi)/2 differs by an ULP,
    // which the runner's 1e-6 relative compare can expose
    if (n % 2 == 1) s(n / 2) else s(n / 2 - 1) * 0.5 + s(n / 2) * 0.5
  }

  override def eval(input: InternalRow): Any = {
    val base = list.eval(input)
    if (base == null) return null
    val arr = base.asInstanceOf[ArrayData]
    val et = elemType
    val vals = (0 until arr.numElements())
      .filterNot(arr.isNullAt).map(i => arr.get(i, et)).toArray
    val n = vals.length
    fname match {
      case "count" => n.toLong
      case "approx_count_distinct" => vals.distinct.length.toLong
      case "first" | "any_value" => if (n == 0) null else vals.head
      case "last" => if (n == 0) null else vals.last
      case "min" => if (n == 0) null else vals.min(ordering)
      case "max" => if (n == 0) null else vals.max(ordering)
      case "bool_and" =>
        if (n == 0) null else vals.forall(v => toD(v) != 0.0)
      case "bool_or" =>
        if (n == 0) null else vals.exists(v => toD(v) != 0.0)
      case "sum" | "fsum" | "sumkahan" | "kahan_sum" =>
        if (n == 0) null
        else dataType match {
          case DoubleType => vals.map(toD).sum
          case dt: DecimalType =>
            val s = vals.map {
              case d: Decimal => d.toJavaBigDecimal
              case x: java.lang.Number => new java.math.BigDecimal(x.toString)
            }.reduce(_.add(_))
            Decimal(s, dt.precision, dt.scale)
        }
      case "product" =>
        if (n == 0) null else vals.map(toD).product
      case "avg" | "mean" | "favg" =>
        if (n == 0) null else vals.map(toD).sum / n
      case "median" => if (n == 0) null else median(vals.map(toD))
      case "mad" =>
        if (n == 0) null
        else if (dataType == CalendarIntervalType) {
          // temporal mad in INTEGER units (days for DATE, micros
          // otherwise) with the reference's truncating medians — double
          // math would fabricate half-day fractions
          // reference temporal mad runs on the MICROS axis with
          // llround interpolation (interpolate.hpp dtime_t/timestamp_t
          // specializations), then splits days out (Interval::FromMicro)
          def medL(xs: Array[Long]): Long = {
            val s = xs.sorted
            val k = s.length
            if (k % 2 == 1) s(k / 2)
            else math.round(s(k / 2 - 1).toDouble * 0.5 +
              s(k / 2).toDouble * 0.5)
          }
          val xs = vals.map { v =>
            elemType match {
              case DateType => v.asInstanceOf[Int].toLong * 86400000000L
              case _: TimeType => v.asInstanceOf[Long] / 1000L
              case _ => v.asInstanceOf[Long]
            }
          }
          val m = medL(xs)
          val mad = medL(xs.map(x => math.abs(x - m)))
          new org.apache.spark.unsafe.types.CalendarInterval(
            0, (mad / 86400000000L).toInt, mad % 86400000000L)
        } else if (elemType.isInstanceOf[DecimalType]) {
          // scaled-integer medians with C++ truncating division
          val dt = elemType.asInstanceOf[DecimalType]
          def medBI(xs: Array[java.math.BigInteger]): java.math.BigInteger = {
            val s = xs.sorted
            val k = s.length
            if (k % 2 == 1) s(k / 2)
            else s(k / 2 - 1).add(s(k / 2))
              .divide(java.math.BigInteger.valueOf(2))
          }
          val us = vals.map(v =>
            v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue)
          val m = medBI(us)
          val mad = medBI(us.map(x => x.subtract(m).abs))
          Decimal(new java.math.BigDecimal(mad, dt.scale), dt.precision, dt.scale)
        } else {
          val xs = vals.map(toD)
          val m = median(xs)
          median(xs.map(x => math.abs(x - m)))
        }
      case "mode" =>
        if (n == 0) null
        else {
          val counts = scala.collection.mutable.LinkedHashMap[Any, Int]()
          vals.foreach(v => counts(v) = counts.getOrElse(v, 0) + 1)
          counts.maxBy(_._2)._1
        }
      case "string_agg" | "group_concat" =>
        if (n == 0) null
        else {
          val sep = extra.map(_.eval(input) match {
            case s: UTF8String => s.toString
            case other => String.valueOf(other)
          }).getOrElse(",")
          UTF8String.fromString(vals.map {
            case s: UTF8String => s.toString
            case v => String.valueOf(v)
          }.mkString(sep))
        }
      case "histogram" if extra.isDefined =>
        // binned histogram (reference binned_histogram.cpp): values land
        // in the smallest bin boundary >= value; overflow goes to the
        // type-maximum "other" bucket for numeric bins and is dropped
        // for types without one (SupportsOtherBucket)
        val bexpr = extra.get
        val bv = bexpr.eval(input)
        if (bv == null)
          throw new IllegalArgumentException(
            "Histogram bin list cannot be NULL")
        val bt0 = bexpr.dataType match {
          case ArrayType(e, _) if e != NullType => e
          case _ => elemType
        }
        val bt = histKeyType
        def widen(v: Any): Any = (v, bt) match {
          case (n: java.lang.Number, LongType) => n.longValue
          case (n: java.lang.Number, IntegerType) => n.intValue
          case (n: java.lang.Number, DoubleType) => n.doubleValue
          case (n: java.lang.Number, FloatType) => n.floatValue
          // Decimal keys: integral/fractional inputs (or Decimals of a
          // different scale) must land as Decimal at the key scale, or
          // the DecimalType binOrd ClassCastExceptions on them
          case (n: java.lang.Number, t: DecimalType) =>
            Decimal(BigDecimal(n.toString)
              .setScale(t.scale, BigDecimal.RoundingMode.HALF_UP),
              t.precision, t.scale)
          case (d: Decimal, t: DecimalType)
              if d.precision != t.precision || d.scale != t.scale =>
            Decimal(d.toBigDecimal
              .setScale(t.scale, BigDecimal.RoundingMode.HALF_UP),
              t.precision, t.scale)
          // Decimal inputs with non-Decimal widened keys
          case (d: Decimal, LongType) => d.toLong
          case (d: Decimal, IntegerType) => d.toInt
          case (d: Decimal, DoubleType) => d.toDouble
          case (d: Decimal, FloatType) => d.toFloat
          case _ => v
        }
        val bArr = bv.asInstanceOf[ArrayData]
        val rawBins = (0 until bArr.numElements()).map { i =>
          if (bArr.isNullAt(i))
            throw new IllegalArgumentException(
              "Histogram bin entry cannot be NULL")
          widen(bArr.get(i, bt0))
        }
        val binOrd: Ordering[Any] = bt match {
          case _: StringType => Ordering.by((v: Any) => v.asInstanceOf[UTF8String])
          // exact integral compare — Long extremes collapse in double
          case ByteType | ShortType | IntegerType | LongType |
               TimestampType | TimestampNTZType | DateType =>
            Ordering.by((v: Any) => v.asInstanceOf[java.lang.Number].longValue)
          case _: DecimalType => Ordering.by((v: Any) => v.asInstanceOf[Decimal])
          case _ => Ordering.by((v: Any) => toD(v))
        }
        val bins = rawBins.distinct.sorted(binOrd).toIndexedSeq
        val otherKey: Option[Any] = bt match {
          case ByteType => Some(Byte.MaxValue)
          case ShortType => Some(Short.MaxValue)
          case IntegerType => Some(Int.MaxValue)
          case LongType | TimestampType | TimestampNTZType => Some(Long.MaxValue)
          case FloatType => Some(Float.PositiveInfinity)
          case DoubleType => Some(Double.PositiveInfinity)
          case d: DecimalType =>
            Some(Decimal(new java.math.BigDecimal(
              java.math.BigInteger.TEN.pow(d.precision)
                .subtract(java.math.BigInteger.ONE), d.scale),
              d.precision, d.scale))
          case _ => None // strings etc.: overflow values are dropped
        }
        val counts = Array.fill(bins.length)(0L)
        var other = 0L
        vals.foreach { v0 =>
          val v = widen(v0)
          var lo = 0; var hi = bins.length
          while (lo < hi) { // first bin >= v
            val mid = (lo + hi) >>> 1
            if (binOrd.lt(bins(mid), v)) lo = mid + 1 else hi = mid
          }
          if (lo < bins.length) counts(lo) += 1
          else if (otherKey.isDefined) other += 1
        }
        val keys = if (other > 0) bins :+ otherKey.get else bins
        val cnts = if (other > 0) counts.toSeq :+ other else counts.toSeq
        ArrayBasedMapData(keys.toArray, cnts.toArray)
      case "histogram" =>
        val counts = scala.collection.mutable.LinkedHashMap[Any, Long]()
        vals.sorted(ordering).foreach(v =>
          counts(v) = counts.getOrElse(v, 0L) + 1L)
        ArrayBasedMapData(counts.keys.toArray, counts.values.toArray)
      case "entropy" =>
        if (n == 0) 0.0 // reference: entropy of empty/all-NULL input is 0
        else {
          val counts = vals.groupBy(identity).values.map(_.length.toDouble)
          -counts.map { c =>
            val p = c / n; p * math.log(p) / math.log(2.0)
          }.sum
        }
      case "stddev" | "stddev_samp" | "var" | "var_samp" | "variance" |
           "stddev_pop" | "var_pop" | "sem" =>
        if (n == 0) null
        else {
          val xs = vals.map(toD)
          val mean = xs.sum / n
          val m2 = xs.map(x => (x - mean) * (x - mean)).sum
          // sem is population-based in the reference (sem(1) = 0,
          // test_sem.test): sqrt(var_pop)/sqrt(n)
          val samp = fname != "stddev_pop" && fname != "var_pop" &&
            fname != "sem"
          if (samp && n < 2) null
          else {
            val v = m2 / (if (samp) n - 1 else n)
            fname match {
              case "var" | "var_samp" | "variance" | "var_pop" => v
              case "sem" => math.sqrt(v) / math.sqrt(n)
              case _ => math.sqrt(v)
            }
          }
        }
      case "skewness" =>
        if (n < 3) null
        else {
          val xs = vals.map(toD)
          val mean = xs.sum / n
          val m2 = xs.map(x => math.pow(x - mean, 2)).sum / n
          val m3 = xs.map(x => math.pow(x - mean, 3)).sum / n
          val g1 = m3 / math.pow(m2, 1.5)
          g1 * math.sqrt(n.toDouble * (n - 1)) / (n - 2)
        }
      case "kurtosis" =>
        if (n < 4) null
        else {
          val xs = vals.map(toD)
          val mean = xs.sum / n
          val m2 = xs.map(x => math.pow(x - mean, 2)).sum / n
          val m4 = xs.map(x => math.pow(x - mean, 4)).sum / n
          val g2 = m4 / (m2 * m2) - 3.0
          ((n - 1.0) / ((n - 2.0) * (n - 3.0))) * ((n + 1.0) * g2 + 6.0)
        }
    }
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(list = cs(0), nameExpr = cs(1),
      extra = if (cs.length > 2) Some(cs(2)) else None)
}
