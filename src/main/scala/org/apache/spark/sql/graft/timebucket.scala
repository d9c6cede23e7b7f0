package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** `time_bucket(width, ts [, origin | offset])` — TimescaleDB-style
  * bucketing exactly as the reference implements it
  * (`extension/core_functions/scalar/date/time_bucket.cpp`):
  *
  *  - sub-month widths bucket on the micros axis with default origin
  *    2000-01-03 (a Monday, so 7-day widths align to weeks);
  *  - month-convertible widths bucket on a month index with default
  *    origin 2000-01-01;
  *  - a third TIMESTAMP/DATE argument replaces the origin; a third
  *    INTERVAL argument shifts the input before and the result after
  *    bucketing;
  *  - a width mixing month and day/time components is the reference's
  *    binder error.
  *
  * Scalar and row-local — at 100 TB it is a map-side expression like any
  * date function (the streaming hot path uses native `window()`; this
  * covers the SQL-name surface and the conformance corpus).
  */
case class TimeBucket(width: Expression, ts: Expression,
    anchor: Option[Expression]) extends Expression with CodegenFallback {
  override def prettyName: String = "time_bucket"
  override def children: Seq[Expression] = Seq(width, ts) ++ anchor
  override def nullable: Boolean = true

  private val MicrosPerDay = 86400000000L
  private val DefaultOriginMicros = 10959L * MicrosPerDay // 2000-01-03
  private val DefaultOriginMonths = 360                   // 2000-01-01

  override def dataType: DataType = ts.dataType match {
    case DateType => DateType
    case t: TimeType => t
    case _ => TimestampType
  }

  private def isInterval(dt: DataType): Boolean = dt match {
    case CalendarIntervalType | NullType => true
    case _: DayTimeIntervalType | _: YearMonthIntervalType => true
    case _ => false
  }

  /** Normalize any of Spark's three interval types to CalendarInterval. */
  private def asInterval(v: Any, dt: DataType): CalendarInterval = dt match {
    case _: DayTimeIntervalType => // Long micros
      new CalendarInterval(0, 0, v.asInstanceOf[Long])
    case _: YearMonthIntervalType => // Int months
      new CalendarInterval(v.asInstanceOf[Int], 0, 0)
    case _ => v.asInstanceOf[CalendarInterval]
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!isInterval(width.dataType))
      return TypeCheckResult.TypeCheckFailure(
        s"time_bucket width must be an INTERVAL, got ${width.dataType}")
    ts.dataType match {
      case DateType | TimestampType | TimestampNTZType | NullType =>
      case _: TimeType => // buckets within the day, wrap-around
      case other => return TypeCheckResult.TypeCheckFailure(
        s"time_bucket input must be DATE or TIMESTAMP, got $other")
    }
    anchor.map(_.dataType) match {
      case None | Some(DateType | TimestampType | TimestampNTZType |
                       NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case Some(_: TimeType) => TypeCheckResult.TypeCheckSuccess
      case Some(dt) if isInterval(dt) => TypeCheckResult.TypeCheckSuccess
      case Some(other) => TypeCheckResult.TypeCheckFailure(
        s"time_bucket origin must be DATE/TIMESTAMP/INTERVAL, got $other")
    }
  }

  private def toMicros(v: Any, dt: DataType): Long = dt match {
    case DateType => v.asInstanceOf[Int].toLong * MicrosPerDay
    case _: TimeType => v.asInstanceOf[Long] / 1000L // nanos-of-day
    case _ => v.asInstanceOf[Long]
  }

  private def monthsOf(micros: Long): Int = {
    val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(micros, MicrosPerDay))
    (d.getYear - 1970) * 12 + d.getMonthValue - 1
  }

  override def eval(input: InternalRow): Any = {
    val w = width.eval(input)
    val t = ts.eval(input)
    if (w == null || t == null) return null
    val iv = asInterval(w, width.dataType)
    val o = anchor.map(e => (e.eval(input), e.dataType))
    if (o.exists(_._1 == null)) return null
    val tMicros = toMicros(t, ts.dataType)

    val (offM, offMicros) = o match {
      case Some((ov, dt)) if isInterval(dt) =>
        val oi = asInterval(ov, dt)
        (oi.months, oi.days * MicrosPerDay + oi.microseconds)
      case _ => (0, 0L)
    }

    // interval offset (reference TimeBucketOffsetOperator): shift the
    // input by -offset with REAL interval arithmetic (months on the date
    // axis), bucket, shift the result by +offset. Overflow-checked like
    // the reference's AddOperatorOverflowCheck — a ±2^31-month offset
    // must raise, not wrap.
    def addInterval(micros: Long, m: Long, us: Long): Long = {
      val afterM =
        if (m == 0) micros
        else Math.addExact(Math.multiplyExact(
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            (Math.floorMod(micros, 1000000L) * 1000).toInt,
            java.time.ZoneOffset.UTC).plusMonths(m)
            .toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
          Math.floorMod(micros, 1000000L))
      Math.addExact(afterM, us)
    }
    val shifted = addInterval(tMicros, -offM.toLong, -offMicros)

    // zero / negative sub-month width must raise the period diagnostic,
    // not fall through to the month-interval shape error
    if (iv.months == 0 && iv.days.toLong * MicrosPerDay + iv.microseconds <= 0)
      throw new IllegalArgumentException(
        "time_bucket: period must be greater than 0")

    val result: Long =
      if (iv.months == 0 && (iv.days.toLong * MicrosPerDay + iv.microseconds) > 0) {
        val widthMicros = iv.days.toLong * MicrosPerDay + iv.microseconds
        val originMicros = o match {
          case Some((ov, dt)) if !isInterval(dt) => toMicros(ov, dt)
          case _ => DefaultOriginMicros
        }
        val org = originMicros % widthMicros
        val x = Math.subtractExact(shifted, org)
        var r = (x / widthMicros) * widthMicros
        if (x < 0 && x % widthMicros != 0) r -= widthMicros
        r += org
        addInterval(r, offM.toLong, offMicros)
      } else if (iv.months != 0 && iv.days == 0 && iv.microseconds == 0) {
        if (iv.months < 0)
          throw new IllegalArgumentException(
            "time_bucket: period must be greater than 0")
        val widthMonths = iv.months
        val originMonths = o match {
          case Some((ov, dt)) if !isInterval(dt) =>
            monthsOf(toMicros(ov, dt))
          case _ => DefaultOriginMonths
        }
        val tM = monthsOf(shifted)
        val org = originMonths % widthMonths
        val x = Math.subtractExact(tM, org)
        var rM = (x / widthMonths) * widthMonths
        if (x < 0 && x % widthMonths != 0) rM -= widthMonths
        rM = Math.addExact(rM, org)
        val year = if (rM < 0 && rM % 12 != 0) 1970 + rM / 12 - 1 else 1970 + rM / 12
        val month = if (rM < 0 && rM % 12 != 0) rM % 12 + 13 else rM % 12 + 1
        addInterval(Math.multiplyExact(
          java.time.LocalDate.of(year, month, 1).toEpochDay, MicrosPerDay),
          offM.toLong, offMicros)
      } else {
        throw new IllegalArgumentException(
          "time_bucket: month intervals cannot have day or time components")
      }

    ts.dataType match {
      case DateType => Math.floorDiv(result, MicrosPerDay).toInt
      case _: TimeType => // wrap into the day, back to nanos
        Math.floorMod(result, MicrosPerDay) * 1000L
      case _ => result
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(width = newChildren(0), ts = newChildren(1),
      anchor = if (newChildren.length > 2) Some(newChildren(2)) else None)
}
