package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.VariantVal

/** `variant_comparator(v)` — the reference's logical VARIANT sort key
  * (src/common/types/variant/variant_comparator.cpp;
  * test/sql/variant/variant_comparator.test): a byte-comparable BINARY
  * whose unsigned-lexicographic order IS the logical VARIANT order.
  *
  * Semantics pinned by the reference test:
  *  - type ranks: NULL < BOOLEAN < NUMBER < REAL < temporal(naive) <
  *    temporal(tz) < VARCHAR < BLOB < UUID < ARRAY < OBJECT;
  *  - NUMBER folds every integer width AND decimals by numeric value
  *    (5 == 5.00, -100.5 < 0); REAL folds float/double and keeps its
  *    own rank (1 != 1.0e0); NaN sorts after everything, -0.0 == 0.0;
  *  - DATE folds with naive TIMESTAMPs as midnight instants; tz
  *    timestamps keep a distinct rank;
  *  - arrays compare element-by-element with shorter-prefix-first;
  *  - objects compare key-sorted, so key ORDER is insignificant;
  *  - NULL input propagates SQL NULL.
  */
object VariantCmp {
  // type ranks (one byte, order above)
  private final val RNull = 0x01
  private final val RBool = 0x02
  private final val RNumber = 0x03
  private final val RReal = 0x04
  private final val RNaiveTs = 0x05
  private final val RTzTs = 0x06
  private final val RString = 0x07
  private final val RBinary = 0x08
  private final val RUuid = 0x09
  private final val RArray = 0x0a
  private final val RObject = 0x0b

  def key(v: VariantVal): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(32)
    write(new Variant(v.getValue, v.getMetadata), out)
    out.toByteArray
  }

  private def write(v: Variant, out: java.io.ByteArrayOutputStream): Unit = {
    import VariantUtil.Type._
    v.getType match {
      case NULL => out.write(RNull)
      case BOOLEAN =>
        out.write(RBool); out.write(if (v.getBoolean) 1 else 0)
      case LONG =>
        out.write(RNumber)
        writeDecimal(java.math.BigDecimal.valueOf(v.getLong), out)
      case DECIMAL =>
        out.write(RNumber); writeDecimal(v.getDecimal, out)
      case FLOAT =>
        out.write(RReal); writeRealBits(v.getFloat.toDouble, out)
      case DOUBLE =>
        out.write(RReal); writeRealBits(v.getDouble, out)
      case DATE =>
        // folds with naive timestamps as midnight (reference temporal
        // fold); stored value = days since epoch
        out.write(RNaiveTs); writeLong(v.getLong * 86400000000L, out)
      case TIMESTAMP_NTZ =>
        out.write(RNaiveTs); writeLong(v.getLong, out)
      case TIMESTAMP =>
        out.write(RTzTs); writeLong(v.getLong, out)
      case STRING =>
        out.write(RString)
        val b = v.getString.getBytes("UTF-8")
        out.write(b, 0, b.length); out.write(0)
      case BINARY =>
        out.write(RBinary)
        val b = v.getBinary
        out.write(b, 0, b.length); out.write(0)
      case UUID =>
        out.write(RUuid)
        val u = v.getUuid
        writeLong(u.getMostSignificantBits, out)
        writeLong(u.getLeastSignificantBits, out)
      case ARRAY =>
        out.write(RArray)
        var i = 0
        val n = v.arraySize()
        while (i < n) { write(v.getElementAtIndex(i), out); i += 1 }
        out.write(0) // terminator: shorter prefix sorts first
      case OBJECT =>
        out.write(RObject)
        val n = v.objectSize()
        val fields = new Array[(String, Variant)](n)
        var i = 0
        while (i < n) {
          val f = v.getFieldAtIndex(i)
          fields(i) = (f.key, f.value)
          i += 1
        }
        // key-sorted: field declaration/storage order is insignificant
        java.util.Arrays.sort(fields,
          Ordering.by((p: (String, Variant)) => p._1))
        fields.foreach { case (k, fv) =>
          val kb = k.getBytes("UTF-8")
          out.write(kb, 0, kb.length); out.write(0)
          write(fv, out)
        }
        out.write(0)
      case other =>
        // remaining physical types (future spec growth): rank by name
        out.write(0x7f)
        val b = other.toString.getBytes("UTF-8")
        out.write(b, 0, b.length); out.write(0)
    }
  }

  /** Unsigned-comparable big-endian encoding of a signed long. */
  private def writeLong(x: Long, out: java.io.ByteArrayOutputStream): Unit = {
    val flipped = x ^ Long.MinValue
    var i = 56
    while (i >= 0) { out.write(((flipped >>> i) & 0xff).toInt); i -= 8 }
  }

  /** IEEE total-order trick, with -0.0 normalized to 0.0 (NaN's raw
    * bits are positive and maximal, so it sorts after +inf). */
  private def writeRealBits(d0: Double, out: java.io.ByteArrayOutputStream): Unit = {
    val d = if (d0 == 0.0) 0.0 else d0 // normalizes -0.0
    var bits = java.lang.Double.doubleToLongBits(d)
    bits = if (bits < 0) ~bits else bits | Long.MinValue
    var i = 56
    while (i >= 0) { out.write(((bits >>> i) & 0xff).toInt); i -= 8 }
  }

  /** Byte-comparable decimal: sign class, order-preserving adjusted
    * exponent (inverted for negatives), then significand digits
    * (complemented for negatives) with an order-correct terminator —
    * value-equal decimals of any scale/width produce identical keys
    * (stripTrailingZeros), the reference's NUMBER fold. */
  private def writeDecimal(x0: java.math.BigDecimal,
      out: java.io.ByteArrayOutputStream): Unit = {
    val x = x0.stripTrailingZeros()
    val signum = x.signum()
    if (signum == 0) { out.write(2); return }
    val digits = x.unscaledValue().abs().toString
    // value = 0.digits * 10^adjExp
    val adjExp = digits.length - x.scale()
    if (signum > 0) {
      out.write(3)
      writeIntOrdered(adjExp, invert = false, out)
      var i = 0
      while (i < digits.length) { out.write(digits.charAt(i) - '0' + 1); i += 1 }
      out.write(0) // prefix (fewer digits) sorts first
    } else {
      out.write(1)
      writeIntOrdered(adjExp, invert = true, out)
      var i = 0
      while (i < digits.length) { out.write(10 - (digits.charAt(i) - '0')); i += 1 }
      out.write(0xff) // prefix sorts LAST among negatives
    }
  }

  private def writeIntOrdered(x: Int, invert: Boolean,
      out: java.io.ByteArrayOutputStream): Unit = {
    val v0 = x ^ Int.MinValue
    val v = if (invert) ~v0 else v0
    var i = 24
    while (i >= 0) { out.write((v >>> i) & 0xff); i -= 8 }
  }
}

case class VariantComparator(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "variant_comparator"
  override def inputTypes: Seq[AbstractDataType] = Seq(VariantType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VariantCmp.key(v.asInstanceOf[VariantVal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.VariantCmp.key($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
