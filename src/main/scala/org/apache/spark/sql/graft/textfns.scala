package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar functions from the reference's string/numeric packs that have no
  * Spark builtin with matching semantics. SQL names are wired in
  * [[graft.functions.Registry]]; semantics are pinned by the imported
  * sqllogictest corpus (`src/test/resources/sql/ref/`).
  *
  * All are row-local, codegen'd via a static helper (same pattern as
  * [[StripAccents]]) so they stay inside whole-stage codegen.
  */
object TextFns {
  // chr: reference `chr(codepoint)` is a Unicode codepoint constructor
  // (scalar_function/chr.cpp); Spark's chr is ASCII-mod-256.
  def chr(cp: Int): UTF8String = {
    if (!Character.isValidCodePoint(cp))
      throw new IllegalArgumentException(s"chr: invalid Unicode codepoint $cp")
    UTF8String.fromString(new String(Character.toChars(cp)))
  }

  // format_bytes: binary units capped at PiB (Long.MaxValue renders
  // "8191.9 PiB"), one decimal digit truncated (never rounded up past
  // the unit boundary), "N byte(s)" below 1 KiB
  def formatBytes(n: Long): UTF8String = {
    if (n == Long.MinValue) // |MinValue| = 2^63 exactly = 8192 PiB
      return UTF8String.fromString("-8192.0 PiB")
    val neg = n < 0
    val a = math.abs(n)
    val s =
      if (a < 1024) s"$a byte" + (if (a == 1) "" else "s")
      else {
        val units = Array("KiB", "MiB", "GiB", "TiB", "PiB")
        var k = 0
        var v = a
        while (v >= 1024L * 1024 && k < units.length - 1) { v /= 1024; k += 1 }
        val tenths = v * 10 / 1024 // truncated single decimal
        s"${tenths / 10}.${tenths % 10} ${units(k)}"
      }
    UTF8String.fromString(if (neg) "-" + s else s)
  }

  // formatReadableDecimalSize (clickhouse-compat pack): 1000-based
  // units with a lowercase k, same truncated single decimal
  def formatBytesDecimal(n: Long): UTF8String = {
    val neg = n < 0
    val a = if (n == Long.MinValue) Long.MaxValue else math.abs(n)
    val s =
      if (a < 1000) s"$a byte" + (if (a == 1) "" else "s")
      else {
        val units = Array("kB", "MB", "GB", "TB", "PB", "EB")
        var k = 0
        var v = a
        while (v >= 1000L * 1000 && k < units.length - 1) { v /= 1000; k += 1 }
        val tenths = v / 100 // truncated single decimal of v/1000
        s"${tenths / 10}.${tenths % 10} ${units(k)}"
      }
    UTF8String.fromString(if (neg) "-" + s else s)
  }

  // md5_number_upper/lower: the first/second 8 md5 bytes as a
  // little-endian UNSIGNED 64-bit number, in DECIMAL(20,0) (the
  // reference returns UBIGINT, which exceeds signed long)
  def md5Half(s: UTF8String, upper: Boolean): org.apache.spark.sql.types.Decimal = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
    val off = if (upper) 0 else 8
    var v = java.math.BigInteger.ZERO
    var i = 7
    while (i >= 0) { // little-endian: most significant byte last
      v = v.shiftLeft(8).or(java.math.BigInteger.valueOf(d(off + i) & 0xffL))
      i -= 1
    }
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(v), 20, 0)
  }

  // even(x): round away from zero to the next even integer, saturating
  // (no long round-trip — even(1.79e308) is the input, not an overflow)
  def even(x: Double): Double = {
    val r = math.ceil(math.abs(x) / 2.0) * 2.0
    if (x < 0) -r else r
  }

  // reference substring semantics (substring.cpp SubstringStartEnd):
  // codepoint-indexed; offset<0 counts from the end, offset=0 consumes
  // one length unit before the first char, length<0 scans backwards
  // reference substring.cpp bounds: offsets/lengths past ±2^32 error
  private val SubstringBound = 4294967295L
  private def checkSubstringRange(offset: Long, length: Long): Unit = {
    if (offset < -SubstringBound - 1 || offset > SubstringBound)
      throw new IllegalArgumentException(
        "Substring offset outside of supported range")
    if (length < -SubstringBound - 1 || length > SubstringBound)
      throw new IllegalArgumentException(
        "Substring length outside of supported range")
  }

  def substringRef(s: UTF8String, offset: Long, length: Long): UTF8String = {
    checkSubstringRange(offset, length)
    val str = s.toString
    val n: Long = str.codePointCount(0, str.length)
    if (length == 0) return UTF8String.EMPTY_UTF8
    var start = 0L
    var len = length
    if (offset > 0) start = math.min(n, offset - 1)
    else if (offset < 0) start = math.max(n + offset, 0)
    else {
      start = 0
      len -= 1
      if (len <= 0) return UTF8String.EMPTY_UTF8
    }
    var end = 0L
    if (len > 0) end = if (len > n - start) n else start + len
    else {
      end = start
      start = math.max(0, start + len)
    }
    if (start >= end) return UTF8String.EMPTY_UTF8
    val a = str.offsetByCodePoints(0, start.toInt)
    val b = str.offsetByCodePoints(a, (end - start).toInt)
    UTF8String.fromString(str.substring(a, b))
  }

  // unicode/ord: codepoint of the first character; '' -> -1 (reference
  // unicode.cpp returns -1 on empty input rather than erroring)
  def firstCodePoint(s: UTF8String): Int = {
    val str = s.toString
    if (str.isEmpty) -1 else str.codePointAt(0)
  }

  private val BASE_DIGITS = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"

  // to_base(n, radix[, min_length]): uppercase digits, zero-padded; the
  // three validation errors mirror the reference's messages
  def toBase(n: Long, radix: Int, minLength: Int): UTF8String = {
    if (n < 0)
      throw new IllegalArgumentException(
        "'to_base' number must be greater than or equal to 0")
    if (radix < 2 || radix > 36)
      throw new IllegalArgumentException("radix must be between 2 and 36")
    if (minLength < 0 || minLength > 64)
      throw new IllegalArgumentException("min_length must be between 0 and 64")
    val sb = new java.lang.StringBuilder
    var v = n
    if (v == 0) sb.append('0')
    while (v > 0) { sb.append(BASE_DIGITS.charAt((v % radix).toInt)); v /= radix }
    while (sb.length < minLength) sb.append('0')
    UTF8String.fromString(sb.reverse.toString)
  }

  // binom(n, k) = n choose k in DECIMAL(38,0) — covers the reference's
  // HUGEINT (int128) range; like it, errors on negatives and overflow
  // (binom(130,65) ~ 9.5e37 fits, binom(131,65) errors on both engines)
  def binom(n: Long, k: Long): org.apache.spark.sql.types.Decimal = {
    if (n < 0 || k < 0)
      throw new IllegalArgumentException("binom with negative input is undefined")
    val acc =
      if (k > n) java.math.BigInteger.ZERO
      else {
        val kk = math.min(k, n - k)
        var a = java.math.BigInteger.ONE
        var i = 0L
        while (i < kk) {
          a = a.multiply(java.math.BigInteger.valueOf(n - i))
            .divide(java.math.BigInteger.valueOf(i + 1))
          i += 1
        }
        a
      }
    if (acc.toString.length > 38)
      throw new ArithmeticException("binom: Value out of range")
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(acc), 38, 0)
  }

  // path_join: '/'-joined with '.'/'..'/empty-segment normalization.
  // Semantics pinned by the reference's path_join.test: a non-first
  // absolute or scheme-qualified component errors; '<scheme>://bucket'
  // is an unremovable root ('..' clamps to '<scheme>://bucket/');
  // '<scheme>:/' prefixes behave like plain absolute paths; an
  // all-relative empty result renders '.'.
  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*:(//)?)(.*)$".r
  def pathJoin(parts: Array[UTF8String]): UTF8String = {
    val first = parts(0).toString
    var prefix = ""    // rendered verbatim before the joined segments
    var absolute = false
    var rest0 = first
    first match {
      case SchemeRe(scheme, dslash, tail) =>
        if (dslash != null) {
          // s3://bucket — bucket is part of the root
          val bucket = tail.takeWhile(_ != '/')
          prefix = scheme + bucket
          rest0 = tail.drop(bucket.length)
          absolute = true
        } else {
          prefix = scheme
          rest0 = tail
          absolute = tail.startsWith("/")
        }
      case _ =>
        absolute = first.startsWith("/")
    }
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    def push(s: String): Unit = s.split("/", -1).foreach {
      case "" | "." => ()
      case ".." =>
        if (segs.nonEmpty && segs.last != "..") segs.remove(segs.length - 1)
        else if (!absolute && prefix.isEmpty) segs += ".."
      case seg => segs += seg
    }
    push(rest0)
    parts.iterator.drop(1).foreach { p =>
      val s = p.toString
      if (s.startsWith("/") || SchemeRe.findFirstIn(s).isDefined)
        throw new IllegalArgumentException(
          s"path_join: incompatible paths, '$s' is absolute")
      push(s)
    }
    val joined = segs.mkString("/")
    val out =
      if (prefix.nonEmpty)
        prefix + "/" + joined  // s3://foo/... ; s3://foo/ at the root
      else if (absolute) "/" + joined
      else if (joined.isEmpty) "."
      else joined
    UTF8String.fromString(out)
  }

  // parse_formatted_bytes('1.5 KiB') -> 1536; decimal SI (KB=1000^k) and
  // binary (KiB=1024^k) suffixes, with the reference's error wording
  // unit suffix is REQUIRED and must end in b — '5' and '1 Ki' error
  private val BytesRe =
    """^\s*(\d+(?:\.\d+)?(?:e[+-]?\d+)?)\s*(b|byte|bytes|[kmgtpe]i?b)\s*$""".r
  def parseFormattedBytes(s: UTF8String): Long = {
    val str = s.toString.trim
    if (str.startsWith("-"))
      throw new IllegalArgumentException("Memory cannot be negative")
    str.toLowerCase match {
      case BytesRe(num, suffix) =>
        val mult: Double = Option(suffix).getOrElse("b") match {
          case "b" | "byte" | "bytes" => 1d
          case sfx =>
            val base = if (sfx.length > 1 && sfx.charAt(1) == 'i') 1024d else 1000d
            val exp = "kmgtpe".indexOf(sfx.charAt(0)) + 1
            math.pow(base, exp)
        }
        val v = num.toDouble * mult
        if (v > Long.MaxValue.toDouble)
          throw new ArithmeticException("Memory value out of range: value is too large")
        v.toLong
      case _ =>
        throw new IllegalArgumentException(s"Invalid memory limit: '$str'")
    }
  }

  // reference math functions error on domain violations where Spark's
  // return NULL/NaN (math_functions.cpp with ieee_floating_point_ops
  // off): log/ln/log2/log10 of x<=0, sqrt of x<0. Note reference `log`
  // (1-arg) is BASE-10, not natural.
  def checkedMath(op: String, x: Double): Double = op match {
    case "ln" =>
      if (x <= 0) throw new ArithmeticException("cannot take logarithm of a non-positive number")
      math.log(x)
    case "log10" =>
      if (x <= 0) throw new ArithmeticException("cannot take logarithm of a non-positive number")
      math.log10(x)
    case "log2" =>
      if (x <= 0) throw new ArithmeticException("cannot take logarithm of a non-positive number")
      math.log(x) / math.log(2.0)
    case "sqrt" =>
      if (x < 0) throw new ArithmeticException("cannot take square root of a negative number")
      math.sqrt(x)
  }

  // factorial in DECIMAL(38,0) like the reference's HUGEINT (33! is the
  // largest that fits int128; we admit up to 38 digits); negatives error
  def factorial(n: Int): org.apache.spark.sql.types.Decimal = {
    if (n < 0)
      throw new IllegalArgumentException("factorial of a negative number is undefined")
    var acc = java.math.BigInteger.ONE
    var i = 2
    while (i <= n) {
      acc = acc.multiply(java.math.BigInteger.valueOf(i))
      if (acc.toString.length > 38)
        throw new ArithmeticException("factorial: Value out of range")
      i += 1
    }
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(acc), 38, 0)
  }

  // regexp_extract with the reference's edges: default group 0, ''
  // (not an error) when the group doesn't exist in the pattern
  private val patternCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]
  def regexpExtract(s: UTF8String, p: UTF8String, idx: Int): UTF8String = {
    val pat = patternCache.computeIfAbsent(p.toString,
      java.util.regex.Pattern.compile(_))
    val m = pat.matcher(s.toString)
    // reference: group 1 on a group-less pattern yields '', but an
    // index beyond the pattern's (non-zero) group count is an error
    if (idx > math.max(1, pat.matcher("").groupCount()))
      throw new IllegalArgumentException(
        s"regexp_extract: pattern has ${pat.matcher("").groupCount()} groups, cannot access group $idx")
    if (!m.find() || idx > m.groupCount()) UTF8String.EMPTY_UTF8
    else {
      val g = m.group(idx)
      if (g == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(g)
    }
  }

  private val collatorCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.text.Collator]()

  def icuSortKey(s: UTF8String, locale: UTF8String): UTF8String = {
    val loc = locale.toString.replace('_', '-').toLowerCase
    val coll = collatorCache.computeIfAbsent(loc, l => {
      // modifier segments compose with an optional locale:
      // 'de.NOCASE' / 'NOACCENT' / 'icu.NOACCENT' (the extension's
      // alias for the root collator)
      val parts = l.split('-').filter(_.nonEmpty)
      val mods = parts.filter(p => p == "noaccent" || p == "nocase" || p == "icu")
      val locParts = parts.filterNot(mods.contains)
      val jl =
        if (locParts.isEmpty) java.util.Locale.ROOT
        else java.util.Locale.forLanguageTag(locParts.mkString("-"))
      if (locParts.nonEmpty) {
        val known = java.text.Collator.getAvailableLocales
          .exists(_.getLanguage == jl.getLanguage)
        if (jl.getLanguage.isEmpty || !known)
          throw new IllegalArgumentException(
            s"Conversion Error: Not a valid collation: $l")
      }
      val c = java.text.Collator.getInstance(jl)
      if (mods.contains("noaccent")) c.setStrength(java.text.Collator.PRIMARY)
      else if (mods.contains("nocase")) c.setStrength(java.text.Collator.SECONDARY)
      c
    })
    val bytes = coll.synchronized { coll.getCollationKey(s.toString).toByteArray }
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    UTF8String.fromString(sb.toString)
  }

  /** regexp_replace with the reference's semantics (re_functions.cpp
    * RegexpReplace): replaces the FIRST match unless the 'g' option is
    * given; options i/c/l/m/n/p/s as in regexp_matches; replacement
    * backrefs are RE2-style (\\1..\\9), converted to Java's $N. */
  def regexpReplace(s: UTF8String, p: UTF8String, r: UTF8String,
      opts: UTF8String): UTF8String = {
    val o = opts.toString.filterNot(_.isWhitespace)
    o.find(c => !"gcilmnps".contains(c)).foreach { c =>
      throw new IllegalArgumentException(s"unrecognized regex option '$c'")
    }
    val literal = o.contains('l')
    var flags = 0
    if (o.contains('i')) flags |= java.util.regex.Pattern.CASE_INSENSITIVE
    if (o.contains('s')) flags |= java.util.regex.Pattern.DOTALL
    if (o.contains('m') || o.contains('n') || o.contains('p'))
      flags |= java.util.regex.Pattern.MULTILINE
    val key = (if (literal) "\u0000L" else "\u0000R") + flags + "\u0000" + p.toString
    val pat = patternCache.computeIfAbsent(key, _ =>
      java.util.regex.Pattern.compile(
        if (literal) java.util.regex.Pattern.quote(p.toString) else p.toString, flags))
    val repl =
      if (literal) java.util.regex.Matcher.quoteReplacement(r.toString)
      else {
        // RE2 \N backrefs -> Java $N; literal $ escaped
        val sb = new java.lang.StringBuilder
        val rs = r.toString
        var i = 0
        while (i < rs.length) {
          val c = rs.charAt(i)
          if (c == '$') sb.append("\\$")
          else if (c == '\\' && i + 1 < rs.length && rs.charAt(i + 1).isDigit) {
            sb.append('$').append(rs.charAt(i + 1)); i += 1
          } else if (c == '\\' && i + 1 < rs.length && rs.charAt(i + 1) == '\\') {
            sb.append("\\\\"); i += 1
          } else if (c == '\\') {
            // RE2 rewrite strings allow only \0-\9 and \\ (re2.cc Rewrite)
            throw new IllegalArgumentException(
              "regexp_replace: invalid escape sequence in replacement string")
          } else sb.append(c)
          i += 1
        }
        sb.toString
      }
    val m = pat.matcher(s.toString)
    if (!o.contains('g'))
      return UTF8String.fromString(m.replaceFirst(repl))
    // RE2-style global replace: an EMPTY match immediately after the
    // previous match is skipped (Java's replaceAll would double-fire,
    // e.g. '.*' with DOTALL replacing "a\nb" -> "xx" instead of "x")
    val sb = new java.lang.StringBuffer
    var prevEnd = -1
    while (m.find()) {
      if (!(m.start() == m.end() && m.start() == prevEnd))
        m.appendReplacement(sb, repl)
      prevEnd = m.end()
    }
    m.appendTail(sb)
    UTF8String.fromString(sb.toString)
  }

  // to_binary/from_binary: byte string <-> '0'/'1' bit string (the
  // reference's bin()/from_binary over VARCHAR)
  def toBitString(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val sb = new java.lang.StringBuilder(b.length * 8)
    b.foreach { x =>
      var bit = 7
      while (bit >= 0) { sb.append(if (((x >> bit) & 1) == 1) '1' else '0'); bit -= 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  def fromBitString(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.length % 8 != 0 || !str.forall(c => c == '0' || c == '1'))
      throw new IllegalArgumentException(s"from_binary: malformed bit string")
    val out = new Array[Byte](str.length / 8)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(str.substring(i * 8, i * 8 + 8), 2).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  // grapheme-cluster helpers: icu4j ships with Spark 4 (collations), and
  // its BreakIterator implements extended grapheme clusters (UAX #29),
  // so ZWJ emoji sequences count as one cluster like the reference's
  // utf8proc-based length_grapheme (string/length.cpp)
  private def clusters(s: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]
    val it = com.ibm.icu.text.BreakIterator.getCharacterInstance(java.util.Locale.ROOT)
    it.setText(s)
    var start = it.first()
    var end = it.next()
    while (end != com.ibm.icu.text.BreakIterator.DONE) {
      out.add(s.substring(start, end)); start = end; end = it.next()
    }
    out
  }

  def lengthGrapheme(s: UTF8String): Int = clusters(s.toString).size

  // reference reverse() reverses grapheme clusters, not codepoints
  // (string/reverse.cpp) — 'S̈a' -> 'aS̈', combining marks stay attached
  def graphemeReverse(s: UTF8String): UTF8String = {
    val cl = clusters(s.toString)
    val sb = new java.lang.StringBuilder
    var i = cl.size - 1
    while (i >= 0) { sb.append(cl.get(i)); i -= 1 }
    UTF8String.fromString(sb.toString)
  }

  // reference format() is fmt-style: '{}' consumes arguments in order
  // ('{0}' positional also accepted); enough for the corpus + error()
  def format(fmt: String, args: Array[String]): UTF8String = {
    val out = new java.lang.StringBuilder
    var i = 0
    var next = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '{' && i + 1 < fmt.length) {
        val close = fmt.indexOf('}', i)
        if (close < 0) { out.append(c); i += 1 }
        else {
          val spec = fmt.substring(i + 1, close)
          val idx = if (spec.isEmpty) { next += 1; next - 1 }
                    else spec.takeWhile(_.isDigit) match {
                      case "" => { next += 1; next - 1 }
                      case d => d.toInt
                    }
          out.append(if (idx < args.length) args(idx) else "")
          i = close + 1
        }
      } else { out.append(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }

  // substring_grapheme(s, start, len): 1-based cluster offsets, the
  // same SubstringStartEnd algorithm as substringRef (negative start
  // from the end, start 0 consumes a length unit, negative length
  // scans backwards) over grapheme clusters
  def substringGrapheme(s: UTF8String, start: Int, len: Int): UTF8String = {
    val cl = clusters(s.toString)
    val n = cl.size.toLong
    if (len == 0) return UTF8String.EMPTY_UTF8
    var begin = 0L
    var l = len.toLong
    if (start > 0) begin = math.min(n, start - 1L)
    else if (start < 0) begin = math.max(n + start, 0L)
    else {
      begin = 0
      l -= 1
      if (l <= 0) return UTF8String.EMPTY_UTF8
    }
    var end = 0L
    if (l > 0) end = if (l > n - begin) n else begin + l
    else {
      end = begin
      begin = math.max(0, begin + l)
    }
    if (begin >= end) return UTF8String.EMPTY_UTF8
    val sb = new java.lang.StringBuilder
    var i = begin.toInt
    while (i < end) { sb.append(cl.get(i)); i += 1 }
    UTF8String.fromString(sb.toString)
  }
}

case class CodePointChr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "chr"
  override def inputTypes: Seq[AbstractDataType] = Seq(IntegerType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = TextFns.chr(v.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.chr($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class FirstCodePoint(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "unicode"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextFns.firstCodePoint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.firstCodePoint($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class ToBase(num: Expression, radix: Expression, minLength: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "to_base"
  override def first: Expression = num
  override def second: Expression = radix
  override def third: Expression = minLength
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(n: Any, r: Any, m: Any): Any =
    TextFns.toBase(n.asInstanceOf[Long], r.asInstanceOf[Int], m.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, r, m) =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.toBase($n, $r, $m);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(num = a, radix = b, minLength = c)
}

case class Binom(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "binom"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = DecimalType(38, 0)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any =
    TextFns.binom(l.asInstanceOf[Long], r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.binom($l, $r);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

// varargs + error-on-absolute semantics; cold-path utility, so plain
// eval (CodegenFallback) is fine — it never appears in a hot loop
case class PathJoin(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "path_join"
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def checkInputDataTypes() =
    if (children.size >= 1 && children.forall(c =>
        c.dataType == StringType || c.dataType == NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "path_join expects 1+ string arguments")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) null
    else TextFns.pathJoin(vals.map(_.asInstanceOf[UTF8String]).toArray)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]) = copy(children = cs)
}

case class ParseFormattedBytes(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "parse_formatted_bytes"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextFns.parseFormattedBytes(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.parseFormattedBytes($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class LengthGrapheme(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "length_grapheme"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextFns.lengthGrapheme(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.lengthGrapheme($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class GraftRegexpExtract(str: Expression, pattern: Expression,
    idx: Expression) extends TernaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "regexp_extract"
  override def first: Expression = str
  override def second: Expression = pattern
  override def third: Expression = idx
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, IntegerType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(s: Any, p: Any, i: Any): Any =
    TextFns.regexpExtract(s.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String], i.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, i) =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.regexpExtract($s, $p, $i);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(str = a, pattern = b, idx = c)
}

case class GraftRegexpReplace(str: Expression, pattern: Expression,
    repl: Expression, opts: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "regexp_replace"
  override def first: Expression = str
  override def second: Expression = pattern
  override def third: Expression = repl
  override def fourth: Expression = opts
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, StringType, StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(s: Any, p: Any, r: Any, o: Any): Any =
    TextFns.regexpReplace(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String], o.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, r, o) =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.regexpReplace($s, $p, $r, $o);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression) = copy(str = a, pattern = b, repl = c, opts = d)
}

case class ToBitString(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "to_binary"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextFns.toBitString(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.toBitString($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class FromBitString(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "from_binary"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextFns.fromBitString(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.fromBitString($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class GraftReverse(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "reverse"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextFns.graphemeReverse(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.graphemeReverse($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

// fmt-style format('{} and {}', a, b); cold-path utility, plain eval
/** printf with argument coercion the JVM Formatter needs: Spark's
  * Decimal unwraps to BigDecimal (reference printf accepts DECIMAL for
  * %f — printf.cpp), UTF8String to String. */
/** icu_sort_key(s, locale) — the reference ICU extension's sort-key
  * function (extension: icu; test/sql/collate/test_icu_collate.test).
  * The key's only contract is locale-correct ORDERING; the JDK Collator
  * key bytes render as fixed-width hex so lexicographic string order
  * equals collation order. */
case class IcuSortKey(str: Expression, locale: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "icu_sort_key"
  override def left: Expression = str
  override def right: Expression = locale
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(s: Any, l: Any): Any =
    TextFns.icuSortKey(s.asInstanceOf[UTF8String], l.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l) =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.icuSortKey($s, $l);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression) =
    copy(str = a, locale = b)
}

case class GraftPrintf(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "printf"
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def checkInputDataTypes() =
    if (children.nonEmpty && children.head.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "printf expects a string template first argument")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val fmt = children.head.eval(input)
    if (fmt == null) return null
    val args = children.tail.map { c =>
      c.eval(input) match {
        case null => null
        case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
        case u: UTF8String => u.toString
        case v => v
      }
    }
    UTF8String.fromString(
      String.format(fmt.asInstanceOf[UTF8String].toString,
        args.asInstanceOf[Seq[Object]]: _*))
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]) = copy(children = cs)
}

case class GraftFormat(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "format"
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def checkInputDataTypes() =
    if (children.nonEmpty && children.head.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "format expects a string template first argument")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val fmt = children.head.eval(input)
    if (fmt == null) return null
    val args = children.tail.map { c =>
      val v = c.eval(input)
      if (v == null) "NULL" else v.toString
    }.toArray
    TextFns.format(fmt.asInstanceOf[UTF8String].toString, args)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]) = copy(children = cs)
}

case class CheckedMathFn(op: String, child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = op
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextFns.checkedMath(op, v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.sql.graft.TextFns.checkedMath("$op", $a);""")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class GraftFactorial(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "factorial"
  override def inputTypes: Seq[AbstractDataType] = Seq(IntegerType)
  override def dataType: DataType = DecimalType(38, 0)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = TextFns.factorial(v.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.factorial($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class SubstringGrapheme(str: Expression, pos: Expression, len: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "substring_grapheme"
  override def first: Expression = str
  override def second: Expression = pos
  override def third: Expression = len
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(s: Any, p: Any, l: Any): Any =
    TextFns.substringGrapheme(s.asInstanceOf[UTF8String],
      p.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, l) =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.substringGrapheme($s, $p, $l);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(str = a, pos = b, len = c)
}

/** format_bytes / pg_size_pretty (reference format_bytes.cpp): binary
  * units, one decimal digit TRUNCATED (1048575 -> "1023.9 KiB"), plural
  * "bytes" below 1 KiB.
  */
case class FormatBytes(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "format_bytes"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextFns.formatBytes(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.formatBytes($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** signbit(x): true iff the IEEE sign bit is set — unlike x < 0 this is
  * true for -0.0 and negative NaNs (reference signbit.cpp).
  */
case class SignBit(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "signbit"
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double]) < 0
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = Double.doubleToRawLongBits($a) < 0;")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** even(x) without a long round-trip — DOUBLE in, DOUBLE out, exact on
  * the reference's saturation cases (even(1.79e308) = 1.79e308).
  */
case class EvenFn(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "even"
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = TextFns.even(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.even($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Reference-exact substring (substring.cpp): negative offsets count
  * from the end, offset 0 consumes a length unit, negative lengths scan
  * backwards. Codepoint-indexed like the reference's UTF-8 scan.
  */
case class GraftSubstring(str: Expression, off: Expression, len: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "substring"
  override def first: Expression = str
  override def second: Expression = off
  override def third: Expression = len
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, LongType, LongType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(s: Any, o: Any, l: Any): Any =
    TextFns.substringRef(s.asInstanceOf[UTF8String],
      o.asInstanceOf[Long], l.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, o, l) =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.substringRef($s, $o, $l);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(str = a, off = b, len = c)
}

/** formatReadableDecimalSize (1000-based, lowercase kB). */
case class FormatBytesDecimal(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "formatreadabledecimalsize"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextFns.formatBytesDecimal(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.formatBytesDecimal($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** md5_number_upper / md5_number_lower: an 8-byte md5 half as a
  * little-endian unsigned 64-bit number (reference UBIGINT), carried
  * in DECIMAL(20,0).
  */
case class Md5Half(child: Expression, upper: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String =
    if (upper) "md5_number_upper" else "md5_number_lower"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DecimalType(20, 0)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextFns.md5Half(v.asInstanceOf[UTF8String], upper)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextFns.md5Half($a, $upper);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
