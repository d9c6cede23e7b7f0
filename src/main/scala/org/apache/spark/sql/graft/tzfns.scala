package org.apache.spark.sql.graft

import java.time.{Instant, LocalDateTime, ZoneId}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Timezone conversion runtime for the engine's `AT TIME ZONE` /
  * `timezone(tz, ts)` surface.
  *
  * Semantics match the reference's ICU timezone extension
  * (`extension/icu/icu-timezone.cpp` ICUFromNaiveTimestamp /
  * ICUToNaiveTimestamp; `test/sql/timezone/test_icu_timezone.test`):
  *
  *  - TIMESTAMP (naive wall clock) AT TIME ZONE z → TIMESTAMPTZ: the
  *    instant whose wall clock in z reads the input. DST gaps shift
  *    forward by the gap; ambiguous (repeated) wall clocks resolve to
  *    the LATER instant — the documented ICU choice
  *    (test_icu_timezone_properties.test "the later one is the
  *    documented choice").
  *  - TIMESTAMPTZ (instant) AT TIME ZONE z → TIMESTAMP: the wall clock
  *    of the instant in z.
  *
  * Zone names resolve case-insensitively against the JVM tz database
  * (the reference uses ICU's, same IANA data), including the
  * `UTC±N[N][:MM]` / `UTC±NNNN` offset spellings. An unknown zone
  * raises "Unknown TimeZone" with a nearest-name suggestion, like the
  * reference binder.
  */
object TzUtil {
  import scala.jdk.CollectionConverters._

  // lowercase name -> canonical IANA id (built once; ~600 entries)
  private lazy val canonical: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    // aliases first so real region ids win on collision
    ZoneId.SHORT_IDS.asScala.foreach { case (k, _) => m.put(k.toLowerCase, k) }
    ZoneId.getAvailableZoneIds.asScala.foreach(z => m.put(z.toLowerCase, z))
    m
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, ZoneId]()

  // UTC±H, UTC±HH, UTC±HHMM, UTC±HH:MM (also GMT spelled); the POSIX
  // sign inversion to Etc/GMT∓H only matters for the SET TimeZone
  // display name — ZoneOffset holds the real offset either way
  private val UtcOffRe = "(?i)^(?:UTC|GMT)([+-])(\\d{1,2})(?::?(\\d{2}))?$".r

  private def parse(s0: String): ZoneId = {
    val s = s0.trim
    val canon = canonical.get(s.toLowerCase)
    if (canon != null) return ZoneId.of(canon, ZoneId.SHORT_IDS)
    s match {
      case UtcOffRe(sign, hh, mm) =>
        val total = hh.toInt * 3600 + (if (mm == null) 0 else mm.toInt * 60)
        java.time.ZoneOffset.ofTotalSeconds(if (sign == "-") -total else total)
      case _ =>
        try ZoneId.of(s)
        catch { case _: Throwable => throw unknown(s) }
    }
  }

  /** Reference binder error shape: "Unknown TimeZone '<x>'!\nDid you
    * mean \"<nearest>\"?" (icu-timezone.cpp uses StringUtil candidates). */
  private def unknown(s: String): RuntimeException = {
    val cand = nearest(s)
    new IllegalArgumentException(
      s"Not implemented Error: Unknown TimeZone '$s'!" +
        cand.map(c => s"\nDid you mean \"$c\"?").getOrElse(""))
  }

  private def nearest(s: String): Option[String] = {
    val target = s.toLowerCase
    var best: String = null
    var bestD = 4 // suggestion only within edit distance 3
    canonical.values().asScala.foreach { z =>
      val d = levenshtein(target, z.toLowerCase, bestD)
      if (d < bestD) { bestD = d; best = z }
    }
    Option(best)
  }

  private def levenshtein(a: String, b: String, cap: Int): Int = {
    if (math.abs(a.length - b.length) >= cap) return cap
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var j = 0
    while (j <= b.length) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var min = i
      j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        if (cur(j) < min) min = cur(j)
        j += 1
      }
      if (min >= cap) return cap
      System.arraycopy(cur, 0, prev, 0, b.length + 1)
      i += 1
    }
    math.min(prev(b.length), cap)
  }

  /** Resolve (and cache) a zone name; throws Unknown TimeZone. */
  def zone(tz: UTF8String): ZoneId = {
    val s = tz.toString
    val hit = cache.get(s)
    if (hit != null) hit
    else { val z = parse(s); cache.put(s, z); z }
  }

  /** Validate + canonicalize for SET TimeZone: returns the reference's
    * display spelling (UTC offsets show as POSIX-inverted Etc/GMT∓H for
    * whole hours, like ICU) and the java zone to install. */
  def canonSetting(name: String): (String, ZoneId) = {
    val s = name.trim
    s match {
      case UtcOffRe(sign, hh, mm) if mm == null || mm == "00" =>
        val h = hh.toInt
        // h == 0 still displays the POSIX spelling (ICU: UTC+0 -> Etc/GMT+0)
        val disp = if (h == 0) "Etc/GMT+0"
                   else s"Etc/GMT${if (sign == "-") "+" else "-"}$h"
        (disp, parse(s))
      case _ =>
        val canon = canonical.get(s.toLowerCase)
        if (canon != null) (canon, ZoneId.of(canon, ZoneId.SHORT_IDS))
        else (s, parse(s)) // offset-with-minutes or error
    }
  }

  /** Naive-timestamp string → wall-clock micros (the reference binds a
    * bare VARCHAR operand of AT TIME ZONE as TIMESTAMP). */
  def parseNtz(s: UTF8String): Long =
    DateTimeUtils.stringToTimestampWithoutTimeZone(s).getOrElse(
      throw new IllegalArgumentException(
        s"Conversion Error: invalid timestamp '$s'"))

  /** The conversion kernel (see object doc). `toInstant` = input is a
    * naive wall clock; false = input is an instant. */
  def atTimeZone(micros: Long, tz: UTF8String, toInstant: Boolean): Long = {
    val z = zone(tz)
    if (toInstant) {
      val ldt = DateTimeUtils.microsToLocalDateTime(micros)
      val inst = ldt.atZone(z).withLaterOffsetAtOverlap().toInstant
      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    } else {
      val sec = Math.floorDiv(micros, 1000000L)
      val inst = Instant.ofEpochSecond(sec, (micros - sec * 1000000L) * 1000L)
      DateTimeUtils.localDateTimeToMicros(LocalDateTime.ofInstant(inst, z))
    }
  }
}

/** `timezone(tz, ts)` / `ts AT TIME ZONE tz` — directionality decided by
  * the operand's type at analysis, exactly the reference's two ICU
  * overloads (icu-timezone.cpp ICUFromNaiveTimestamp for TIMESTAMP,
  * ICUToNaiveTimestamp for TIMESTAMPTZ). DATE and VARCHAR operands bind
  * like naive TIMESTAMPs. Codegen'd — the kernel is one static call, so
  * the expression stays inside whole-stage codegen. */
case class AtTimeZone(tzArg: Expression, tsArg: Expression)
    extends BinaryExpression {
  override def left: Expression = tzArg
  override def right: Expression = tsArg
  override def prettyName: String = "timezone"
  override def nullIntolerant: Boolean = true

  private lazy val toInstant: Boolean = tsArg.dataType != TimestampType
  override def dataType: DataType =
    if (toInstant) TimestampType else TimestampNTZType

  override def checkInputDataTypes(): TypeCheckResult = {
    val tzOk = tzArg.dataType.isInstanceOf[StringType] || tzArg.dataType == NullType
    val tsOk = tsArg.dataType match {
      case TimestampType | TimestampNTZType | DateType | NullType => true
      case _: StringType => true
      case _ => false
    }
    if (tzOk && tsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"timezone(tz, ts) takes (STRING, TIMESTAMP), got " +
        s"(${tzArg.dataType.sql}, ${tsArg.dataType.sql})")
  }

  override def nullSafeEval(tz: Any, ts: Any): Any = {
    val wall = tsArg.dataType match {
      case DateType => ts.asInstanceOf[Int] * 86400000000L
      case _: StringType => TzUtil.parseNtz(ts.asInstanceOf[UTF8String])
      case _ => ts.asInstanceOf[Long]
    }
    TzUtil.atTimeZone(wall, tz.asInstanceOf[UTF8String], toInstant)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tzC, tsC) => {
      val conv = tsArg.dataType match {
        case DateType => s"((long)$tsC) * 86400000000L"
        case _: StringType => s"org.apache.spark.sql.graft.TzUtil.parseNtz($tsC)"
        case _ => tsC
      }
      s"${ev.value} = org.apache.spark.sql.graft.TzUtil.atTimeZone($conv, $tzC, $toInstant);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tzArg = newLeft, tsArg = newRight)
}
