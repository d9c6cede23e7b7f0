package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reference collection (LIST/STRUCT/MAP) subscript and list-function
  * semantics, re-expressed as Catalyst expressions.
  *
  * The reference's bracket subscript (`l[i]`, `l[a:b]`,
  * `src/core_functions/scalar/list/list_extract.cpp`,
  * `array_slice.cpp`) is 1-based with NULL (lists) / '' (strings) out of
  * range, negative indexes counting from the end, and clamped slice
  * bounds. Spark's `element_at`/`slice` differ on every edge (0 errors,
  * OOB errors under ANSI, no clamp), so these are dedicated expressions;
  * eval-only (CodegenFallback) is fine — they serve the imported
  * sqllogictest conformance surface, not the 100 TB hot path (the
  * pipeline's hot list ops — vec_*, explode, transform — are codegen'd
  * natives).
  */
object ListFns {
  /** Type-lenient equality used by position/contains/map-subscript:
    * the binder may hand us an INT literal probe against a BIGINT list.
    */
  def eqValues(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (d: Decimal, e: Decimal) => d.compareTo(e) == 0
    case (d: Decimal, y: java.lang.Number) =>
      d.toBigDecimal == BigDecimal(y.toString)
    case (x: java.lang.Number, e: Decimal) =>
      BigDecimal(x.toString) == e.toBigDecimal
    case (x: java.lang.Number, y: java.lang.Number) =>
      (x, y) match {
        case (d: java.lang.Double, _) => d.doubleValue == y.doubleValue
        case (_, d: java.lang.Double) => x.doubleValue == d.doubleValue
        case (f: java.lang.Float, _) => f.floatValue == y.floatValue
        case (_, f: java.lang.Float) => x.floatValue == f.floatValue
        case _ => x.longValue == y.longValue
      }
    case (x, y) => x == y
  }
}

/** `base[index]` with reference semantics. Dispatches on the resolved
  * child type: LIST (1-based, 0/OOB -> NULL, negative from end), MAP
  * (value lookup, missing key -> NULL — Spark ANSI would throw), STRUCT
  * (case-insensitive field by foldable string), VARCHAR (single
  * grapheme, OOB -> ''). */
case class DuckSubscript(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "graft_subscript"

  private lazy val structOrdinal: Int = left.dataType match {
    case st: StructType =>
      val name = right.eval(null) match {
        case s: UTF8String => s.toString
        case other => String.valueOf(other)
      }
      st.fieldNames.indexWhere(_.equalsIgnoreCase(name))
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case _: ArrayType | _: MapType => TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case _: StructType =>
      if (!right.foldable)
        TypeCheckResult.TypeCheckFailure("struct subscript must be a literal")
      else if (structOrdinal < 0)
        TypeCheckResult.TypeCheckFailure(s"no such struct field: $right")
      else TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"cannot subscript type $other")
  }

  override def dataType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case MapType(_, vt, _) => vt
    case st: StructType => st(structOrdinal).dataType
    case _ => StringType
  }
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val base = left.eval(input)
    if (base == null) return null
    val idx = right.eval(input)
    left.dataType match {
      case ArrayType(et, _) =>
        if (idx == null) return null
        val arr = base.asInstanceOf[ArrayData]
        val n = arr.numElements()
        val i0 = idx.asInstanceOf[java.lang.Number].longValue
        val pos = if (i0 < 0) n + i0 + 1 else i0
        if (pos < 1 || pos > n) null
        else if (arr.isNullAt(pos.toInt - 1)) null
        else arr.get(pos.toInt - 1, et)
      case MapType(kt, vt, _) =>
        if (idx == null) return null
        val m = base.asInstanceOf[MapData]
        val keys = m.keyArray()
        val vals = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          if (!keys.isNullAt(i) &&
              ListFns.eqValues(keys.get(i, kt), idx)) {
            return if (vals.isNullAt(i)) null else vals.get(i, vt)
          }
          i += 1
        }
        null
      case st: StructType =>
        val row = base.asInstanceOf[InternalRow]
        if (row.isNullAt(structOrdinal)) null
        else row.get(structOrdinal, st(structOrdinal).dataType)
      case _ =>
        if (idx == null) return null
        val s = base.asInstanceOf[UTF8String]
        val n = TextFns.lengthGrapheme(s)
        val i0 = idx.asInstanceOf[java.lang.Number].longValue
        // reference substring offsets are uint32-bounded (string
        // subscript past that raises Out of Range, substring.cpp)
        if (i0 > 4294967295L || i0 < -4294967295L)
          throw new ArithmeticException(
            "Substring offset outside of supported range (> 4294967295)")
        val pos = if (i0 < 0) n + i0 + 1 else i0
        if (pos < 1 || pos > n) UTF8String.fromString("")
        else TextFns.substringGrapheme(s, pos.toInt, 1)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `base[lo:hi]` / list_slice with reference clamp semantics: 1-based
  * inclusive bounds, negative from the end, NULL bound = open, bounds
  * clamped into range (never an error), crossed bounds -> empty. Strings
  * slice by grapheme. */
case class DuckSlice(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "graft_slice"

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case _: ArrayType | _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"cannot slice type $other")
  }
  override def dataType: DataType = first.dataType
  override def nullable: Boolean = true

  private def bound(v: Any, n: Int, dflt: Int): Int = v match {
    case null => dflt
    case x: java.lang.Number =>
      val i = x.longValue
      (if (i < 0) n + i + 1 else i).max(Int.MinValue).min(Int.MaxValue).toInt
  }

  override def eval(input: InternalRow): Any = {
    val base = first.eval(input)
    if (base == null) return null
    val loV = second.eval(input)
    val hiV = third.eval(input)
    first.dataType match {
      case ArrayType(et, _) =>
        val arr = base.asInstanceOf[ArrayData]
        val n = arr.numElements()
        val lo = bound(loV, n, 1).max(1)
        val hi = bound(hiV, n, n).min(n)
        if (hi < lo) new GenericArrayData(Array.empty[Any])
        else {
          val out = new Array[Any](hi - lo + 1)
          var i = lo
          while (i <= hi) {
            out(i - lo) = if (arr.isNullAt(i - 1)) null else arr.get(i - 1, et)
            i += 1
          }
          new GenericArrayData(out)
        }
      case _ =>
        val s = base.asInstanceOf[UTF8String]
        val n = TextFns.lengthGrapheme(s)
        val lo = bound(loV, n, 1).max(1)
        val hi = bound(hiV, n, n).min(n)
        if (hi < lo) UTF8String.fromString("")
        else TextFns.substringGrapheme(s, lo, hi - lo + 1)
    }
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
}

/** list_distinct: duplicates AND NULLs removed (list_distinct.cpp),
  * first-occurrence order preserved. */
case class ListDistinct(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "list_distinct"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected list, got $other")
  }
  override def dataType: DataType = child.dataType match {
    case ArrayType(et, _) => ArrayType(et, containsNull = false)
  }
  override def nullSafeEval(v: Any): Any = {
    val ArrayType(et, _) = child.dataType: @unchecked
    val arr = v.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val x = arr.get(i, et)
        if (!out.exists(ListFns.eqValues(_, x))) out += x
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** list_unique: count of distinct non-NULL elements (list_unique.cpp). */
case class ListUnique(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "list_unique"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected list, got $other")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val ArrayType(et, _) = child.dataType: @unchecked
    val arr = v.asInstanceOf[ArrayData]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val x = arr.get(i, et)
        if (!seen.exists(ListFns.eqValues(_, x))) seen += x
      }
      i += 1
    }
    seen.length.toLong
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** list_position / list_indexof: 1-based index of the first match, NULL
  * when absent or when probing for NULL (list_position.cpp). */
case class ListPosition(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "list_position"
  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected list, got $other")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val base = left.eval(input)
    if (base == null) return null
    val probe = right.eval(input)
    val ArrayType(et, _) = left.dataType: @unchecked
    val arr = base.asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      val elem = if (arr.isNullAt(i)) null else arr.get(i, et)
      if ((probe == null && elem == null) ||
          (probe != null && elem != null && ListFns.eqValues(elem, probe)))
        return i + 1
      i += 1
    }
    null
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** contains(x, probe) dispatching on x: VARCHAR substring test, LIST
  * membership, MAP key test — the reference overloads one name
  * (contains.cpp, list_contains.cpp, map_contains.cpp). */
case class DuckContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "contains"
  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(et, _) =>
      // the reference binder rejects a probe that shares no common type
      // with the element (list_contains.cpp: "Cannot compare values" —
      // prepare_ambiguous_type.test probes an INT list with a list)
      val pt = right.dataType
      if (pt == NullType || et == NullType ||
          org.apache.spark.sql.catalyst.analysis.TypeCoercion
            .findWiderTypeForTwo(et, pt).isDefined)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"Cannot compare values of type $et and type $pt")
    case _: MapType | _: StringType | NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"cannot apply contains to $other")
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val base = left.eval(input)
    if (base == null) return null
    val probe = right.eval(input)
    left.dataType match {
      case ArrayType(et, _) =>
        if (probe == null) return null
        val arr = base.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i) && ListFns.eqValues(arr.get(i, et), probe))
            return true
          i += 1
        }
        false
      case MapType(kt, _, _) =>
        if (probe == null) return null
        val m = base.asInstanceOf[MapData]
        val keys = m.keyArray()
        var i = 0
        while (i < m.numElements()) {
          if (!keys.isNullAt(i) && ListFns.eqValues(keys.get(i, kt), probe))
            return true
          i += 1
        }
        false
      case _ =>
        if (probe == null) return null
        base.asInstanceOf[UTF8String].contains(probe.asInstanceOf[UTF8String])
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** list_concat: variadic, NULL arguments skipped (list_concat.cpp —
  * distinct from `||`, which is NULL-propagating). */
case class ListConcat(children: Seq[Expression])
    extends Expression with ImplicitCastInputTypes with CodegenFallback {
  override def prettyName: String = "list_concat"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.exists(_.dataType.isInstanceOf[ArrayType]) &&
        children.forall(c => c.dataType.isInstanceOf[ArrayType] ||
          c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("list_concat expects lists")
  // list_concat.cpp unifies element types across arguments
  // (tinyint ++ smallint = smallint); untyped empty literals
  // (array() = ARRAY<VOID>) don't vote. The analyzer inserts the
  // element casts via inputTypes.
  private def unifiedElem: Option[DataType] = {
    val ets = children.map(_.dataType)
      .collect { case ArrayType(et, _) if et != NullType => et }
    if (ets.isEmpty) None
    else org.apache.spark.sql.catalyst.analysis.TypeCoercion
      .findWiderCommonType(ets)
  }
  override def inputTypes: Seq[AbstractDataType] = unifiedElem match {
    case Some(t) =>
      Seq.fill(children.size)(ArrayType(t, containsNull = true))
    case None => Seq.fill(children.size)(
      org.apache.spark.sql.types.AnyDataType)
  }
  override def dataType: DataType = unifiedElem
    .map(t => ArrayType(t, containsNull = true))
    .orElse(children.map(_.dataType)
      .collectFirst { case a: ArrayType => a })
    .getOrElse(ArrayType(NullType))
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    children.foreach { c =>
      val v = c.eval(input)
      if (v != null) {
        val ArrayType(et, _) = c.dataType: @unchecked
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          out += (if (arr.isNullAt(i)) null else arr.get(i, et))
          i += 1
        }
      }
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(children = cs)
}

/** Reference CONCAT (concat.cpp): list-aware dispatch. All-list
  * arguments concatenate as lists (NULL args skipped, element types
  * unified); all-scalar arguments concatenate as strings with NULL
  * skipped (= concat_ws('')); mixing lists and scalars is a binder
  * error ("an explicit cast is required"). The imported corpus lowers
  * CONCAT( to this name so Spark's own concat keeps its semantics. */
case class DuckConcatFn(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def prettyName: String = "concat"
  private lazy val anyArray =
    children.exists(_.dataType.isInstanceOf[ArrayType])
  // The delegate tree is hidden from the analyzer (only `children` is
  // walked), so ResolveTimeZone never reaches its Casts — a TIMESTAMP
  // argument would hit TimeZoneAwareExpression.zoneId = timeZoneId.get
  // at eval. Pin the session zone explicitly, captured eagerly on the
  // driver at construction time.
  private val castZone: Option[String] =
    try Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    catch { case _: Throwable => Some("UTC") }
  private lazy val delegate: Expression =
    if (anyArray) {
      val ets = children.map(_.dataType)
        .collect { case ArrayType(et, _) if et != NullType => et }
      val elem = org.apache.spark.sql.catalyst.analysis.TypeCoercion
        .findWiderCommonType(ets).getOrElse(ets.headOption.getOrElse(NullType))
      ListConcat(children.map { c =>
        if (c.dataType == ArrayType(elem, containsNull = true)) c
        else Cast(c, ArrayType(elem, containsNull = true), castZone)
      })
    } else ConcatWs(Literal.create("", StringType) +: children.map { c =>
      if (c.dataType == StringType) c else Cast(c, StringType, castZone)
    })
  override def checkInputDataTypes(): TypeCheckResult =
    if (anyArray && !children.forall(c =>
        c.dataType.isInstanceOf[ArrayType] || c.dataType == NullType))
      TypeCheckResult.TypeCheckFailure(
        "concat mixes LIST and non-LIST arguments: an explicit cast is required")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = delegate.dataType
  override def nullable: Boolean = delegate.nullable
  override def eval(input: InternalRow): Any = delegate.eval(input)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(children = cs)
}

/** list_sort with explicit direction + null order (list_sort.cpp);
  * Spark's SortArray pins null position to the direction, the reference
  * lets them vary independently. */
case class ListSortFull(child: Expression, asc: Boolean, nullsFirst: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "list_sort"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if RowOrdering.isOrderable(et) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"cannot sort $other")
  }
  override def dataType: DataType = child.dataType
  override def nullSafeEval(v: Any): Any = {
    val ArrayType(et, _) = child.dataType: @unchecked
    val arr = v.asInstanceOf[ArrayData]
    val (nulls, vals) = (0 until arr.numElements())
      .map(i => if (arr.isNullAt(i)) null else arr.get(i, et))
      .partition(_ == null)
    val ord = TypeUtils.getInterpretedOrdering(et)
    val sorted = vals.sorted(if (asc) ord else ord.reverse)
    val out = if (nullsFirst) nulls ++ sorted else sorted ++ nulls
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** list_grade_up: 1-based ORIGINAL indexes of the elements in sort order
  * (list_sort.cpp ListGradeUpBind — APL "grade up"). Stable: equal
  * values keep their input order. Unlike list_sort's own NULLS FIRST
  * default, grade_up resolves null order from the session config
  * (default NULLS LAST, direction-independent), matching the oracle. */
case class ListGradeUp(child: Expression, asc: Boolean, nullsFirst: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "list_grade_up"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if RowOrdering.isOrderable(et) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"cannot sort $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val ArrayType(et, _) = child.dataType: @unchecked
    val arr = v.asInstanceOf[ArrayData]
    val idx = 0 until arr.numElements()
    val (nullIdx, valIdx) = idx.partition(arr.isNullAt)
    val ord = TypeUtils.getInterpretedOrdering(et)
    val sorted = valIdx.sortBy(i => arr.get(i, et))(if (asc) ord else ord.reverse)
    val out = if (nullsFirst) nullIdx ++ sorted else sorted ++ nullIdx
    new GenericArrayData(out.map(i => (i + 1).toLong).toArray)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** list_resize(l, n[, pad]): truncate or right-pad to n elements
  * (list_resize.cpp). */
case class ListResize(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "list_resize"
  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected list, got $other")
  }
  override def dataType: DataType = first.dataType
  override def eval(input: InternalRow): Any = {
    val base = first.eval(input)
    if (base == null) return null
    val nV = second.eval(input)
    if (nV == null) return null
    val pad = third.eval(input)
    val ArrayType(et, _) = first.dataType: @unchecked
    val arr = base.asInstanceOf[ArrayData]
    val n = nV.asInstanceOf[java.lang.Number].intValue.max(0)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (i < arr.numElements()) {
          if (arr.isNullAt(i)) null else arr.get(i, et)
        } else pad
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
}

/** range / generate_series in scalar position: a BIGINT list; range is
  * end-exclusive, generate_series end-inclusive; negative steps count
  * down; crossed bounds -> empty (range.cpp). */
case class GenSeries(children: Seq[Expression], inclusive: Boolean)
    extends Expression with CodegenFallback {
  override def prettyName: String = if (inclusive) "generate_series" else "range"

  private def temporal: Boolean = children.head.dataType match {
    case TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty || children.length > 3)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects 1-3 args")
    else if (temporal && children.length != 3)
      TypeCheckResult.TypeCheckFailure(
        s"temporal $prettyName expects (start, stop, step interval)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    if (temporal) ArrayType(children.head.dataType, containsNull = false)
    else ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // runaway-series guard: the reference errors long before this; an
  // unbounded loop here would OOM the executor
  private val MaxLen = 10_000_000

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (temporal) {
      // Spark parses INTERVAL literals to the ANSI year-month /
      // day-time types; legacy mode yields CalendarInterval
      val iv = (children(2).dataType, vs(2)) match {
        case (_: YearMonthIntervalType, m: java.lang.Integer) =>
          new org.apache.spark.unsafe.types.CalendarInterval(m, 0, 0L)
        case (_: DayTimeIntervalType, us: java.lang.Long) =>
          new org.apache.spark.unsafe.types.CalendarInterval(0, 0, us)
        case (_, c: org.apache.spark.unsafe.types.CalendarInterval) => c
        case (t, v) => throw new IllegalArgumentException(
          s"$prettyName step must be an interval, got $t = $v")
      }
      // direction from the interval's approximate total length
      val approx = iv.months * 2629746000000L + iv.days * 86400000000L +
        iv.microseconds
      if (approx == 0)
        throw new IllegalArgumentException("interval step must not be 0")
      val isDate = children.head.dataType == DateType
      def add(t: Long): Long =
        if (isDate) { // days since epoch
          java.time.LocalDate.ofEpochDay(t)
            .plusMonths(iv.months).plusDays(
              iv.days + iv.microseconds / 86400000000L).toEpochDay
        } else { // micros since epoch
          val ldt = java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(t, 1000000L),
            (Math.floorMod(t, 1000000L) * 1000).toInt,
            java.time.ZoneOffset.UTC)
          val r = ldt.plusMonths(iv.months).plusDays(iv.days)
            .plusNanos(iv.microseconds * 1000)
          r.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            r.getNano / 1000
        }
      var x = vs(0).asInstanceOf[java.lang.Number].longValue
      val stop = vs(1).asInstanceOf[java.lang.Number].longValue
      val fwd = approx > 0
      while ((if (fwd) { if (inclusive) x <= stop else x < stop }
              else { if (inclusive) x >= stop else x > stop })) {
        out += (if (isDate) Int.box(x.toInt) else Long.box(x))
        if (out.length > MaxLen)
          throw new IllegalArgumentException(s"$prettyName result too large")
        val nx = add(x)
        if (nx == x)
          throw new IllegalArgumentException("interval step must not be 0")
        x = nx
      }
    } else {
      val nums = vs.map(_.asInstanceOf[java.lang.Number].longValue)
      val (start, stop, step) = nums match {
        case Seq(b) => (0L, b, 1L)
        case Seq(a, b) => (a, b, 1L)
        case Seq(a, b, s) => (a, b, s)
      }
      if (step == 0) throw new IllegalArgumentException("step must not be 0")
      var x = start
      if (step > 0) while (if (inclusive) x <= stop else x < stop) {
        out += x; x += step
        if (out.length > MaxLen)
          throw new IllegalArgumentException(s"$prettyName result too large")
      } else while (if (inclusive) x >= stop else x > stop) {
        out += x; x += step
        if (out.length > MaxLen)
          throw new IllegalArgumentException(s"$prettyName result too large")
      }
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(children = cs)
}

/** len/length over VARCHAR (codepoints, like the reference's length) or
  * LIST/MAP (cardinality), returned as BIGINT like the reference. */
case class DuckLen(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "len"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | _: ArrayType | _: MapType | _: BinaryType |
         NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"len of $other")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = child.dataType match {
    case _: StringType => v.asInstanceOf[UTF8String].numChars.toLong
    case _: BinaryType => v.asInstanceOf[Array[Byte]].length.toLong
    case _: ArrayType => v.asInstanceOf[ArrayData].numElements.toLong
    case _ => v.asInstanceOf[MapData].numElements.toLong
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** struct_concat(s1, s2, …) — one struct holding every argument's
  * fields in argument order (reference
  * core_functions/scalar/struct/struct_concat.cpp): a NULL struct
  * argument contributes its fields as NULL values; duplicate field
  * names (case-insensitive, like the duck binder) are an analysis
  * error. */
case class StructConcat(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def prettyName: String = "struct_concat"
  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty)
      return TypeCheckResult.TypeCheckFailure(
        "struct_concat: At least one argument is required")
    children.zipWithIndex.find(!_._1.dataType.isInstanceOf[StructType]) match {
      case Some((_, i)) =>
        return TypeCheckResult.TypeCheckFailure(
          s"struct_concat: Argument at position \"${i + 1}\" is not a STRUCT")
      case None =>
    }
    val names = children.flatMap(_.dataType.asInstanceOf[StructType].fieldNames)
    names.groupBy(_.toLowerCase).collectFirst {
      case (_, vs) if vs.length > 1 =>
        TypeCheckResult.TypeCheckFailure(
          s"struct_concat: Arguments contain duplicate STRUCT entry " +
            s""""${vs.head}"""")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }
  override def dataType: StructType =
    StructType(children.flatMap(_.dataType.asInstanceOf[StructType].fields))
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val out = new Array[Any](dataType.length)
    var k = 0
    children.foreach { c =>
      val st = c.dataType.asInstanceOf[StructType]
      val r = c.eval(input).asInstanceOf[InternalRow]
      var i = 0
      while (i < st.length) {
        out(k) = if (r == null || r.isNullAt(i)) null else r.get(i, st(i).dataType)
        k += 1; i += 1
      }
    }
    new GenericInternalRow(out)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(children = cs)
}

/** typeof(x) with the REFERENCE's type names (INTEGER/BIGINT/VARCHAR…,
  * `src/common/types.cpp` LogicalType::ToString) instead of Spark's
  * lowercase names — the name is a function of the child's STATIC type,
  * so the value is a per-plan constant. */
case class DuckTypeOf(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "typeof"
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  private def name(dt: DataType): String = dt match {
    case BooleanType => "BOOLEAN"
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case _: StringType => "VARCHAR"
    case BinaryType => "BLOB"
    case DateType => "DATE"
    case TimestampNTZType => "TIMESTAMP"
    case TimestampType => "TIMESTAMP WITH TIME ZONE"
    case NullType => "\"NULL\""
    case _: DayTimeIntervalType | _: YearMonthIntervalType |
         CalendarIntervalType => "INTERVAL"
    case ArrayType(et, _) => name(et) + "[]"
    case MapType(k, v, _) => s"MAP(${name(k)}, ${name(v)})"
    case StructType(fields) =>
      fields.map(f => s"${f.name} ${name(f.dataType)}")
        .mkString("STRUCT(", ", ", ")")
    case other => other.sql
  }
  private lazy val result = UTF8String.fromString(name(child.dataType))
  override def eval(input: InternalRow): Any = result
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `regexp_escape` — backslash-escape every regex metacharacter
  * (reference core_functions/scalar/string regexp_escape, RE2::QuoteMeta
  * semantics: non-word bytes get a backslash).
  */
case class RegexpEscape(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "regexp_escape"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"regexp_escape of $other")
  }
  override def dataType: DataType = child.dataType
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val sb = new StringBuilder(s.length + 8)
    s.foreach { c =>
      if (c.isLetterOrDigit || c == '_' || c > 127) sb.append(c)
      else { sb.append('\\'); sb.append(c) }
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
