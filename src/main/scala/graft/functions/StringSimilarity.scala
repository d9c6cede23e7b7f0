package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{Bridge, DamerauLevenshtein, HammingDistance, JaccardChars, JaroWinkler}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity kernels, byte-oriented like the reference
  * (`/root/reference/extension/core_functions/scalar/string/jaccard.cpp`,
  * `damerau_levenshtein.cpp`, `jaro_winkler.cpp`, `hamming.cpp`).
  * Called from generated code (static forwarders), so keep signatures
  * UTF8String-based and allocation-light. Spark already provides
  * `levenshtein` natively.
  */
object StringSim {

  /** Jaccard similarity of the distinct-byte sets (reference jaccard.cpp:26-39). */
  def jaccard(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes; val y = b.getBytes
    // reference jaccard.cpp errors on empty input rather than defining 0
    if (x.length == 0 || y.length == 0)
      throw new IllegalArgumentException("Jaccard Function: An argument too short!")
    val sa = new java.util.BitSet(256); val sb = new java.util.BitSet(256)
    var i = 0
    while (i < x.length) { sa.set(x(i) & 0xff); i += 1 }
    i = 0
    while (i < y.length) { sb.set(y(i) & 0xff); i += 1 }
    val inter = { val t = sa.clone().asInstanceOf[java.util.BitSet]; t.and(sb); t.cardinality() }
    val union = { val t = sa.clone().asInstanceOf[java.util.BitSet]; t.or(sb); t.cardinality() }
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  /** Unrestricted Damerau-Levenshtein (Lowrance-Wagner 1975), matching the
    * reference (damerau_levenshtein.cpp:10).
    */
  def damerauLevenshtein(sa: UTF8String, sb: UTF8String): Long = {
    val s = sa.getBytes; val t = sb.getBytes
    val n = s.length; val m = t.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = n + m + 1
    val d = Array.fill(n + 2, m + 2)(inf)
    var i = 0
    while (i <= n) { d(i + 1)(1) = i; i += 1 }
    var j = 1
    while (j <= m) { d(1)(j + 1) = j; j += 1 }
    val lastRow = new java.util.HashMap[Byte, Integer]()
    i = 1
    while (i <= n) {
      var lastMatchCol = 0
      j = 1
      while (j <= m) {
        val i1v = lastRow.get(t(j - 1))
        val i1 = if (i1v == null) 0 else i1v.intValue()
        val j1 = lastMatchCol
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        if (cost == 0) lastMatchCol = j
        val subst = d(i)(j) + cost
        val insert = d(i + 1)(j) + 1
        val delete = d(i)(j + 1) + 1
        val transp = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) = math.min(math.min(subst, insert), math.min(delete, transp))
        j += 1
      }
      lastRow.put(s(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1).toLong
  }

  /** Jaro similarity on bytes. */
  def jaro(sa: UTF8String, sb: UTF8String): Double = {
    val s = sa.getBytes; val t = sb.getBytes
    val n = s.length; val m = t.length
    // rapidfuzz (and the reference's jaro.cpp) score empty-vs-empty as
    // 0, not 1 — pinned by test_jaro_winkler.test #9
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window); val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    (mm / n + mm / m + (mm - transpositions / 2.0) / mm) / 3.0
  }

  /** Jaro-Winkler, prefix weight 0.1, boost threshold 0.7
    * (reference jaro_winkler.cpp:19 — rapidfuzz defaults).
    */
  def jaroWinkler(sa: UTF8String, sb: UTF8String): Double = {
    val j = jaro(sa, sb)
    if (j <= 0.7) return j
    val s = sa.getBytes; val t = sb.getBytes
    val maxPrefix = math.min(math.min(s.length, t.length), 4)
    var l = 0
    while (l < maxPrefix && s(l) == t(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Hamming distance; the reference (hamming.cpp) errors on empty or
    * unequal-length inputs rather than returning NULL.
    */
  def hamming(sa: UTF8String, sb: UTF8String): java.lang.Long = {
    val s = sa.getBytes; val t = sb.getBytes
    if (s.length == 0 || t.length == 0)
      throw new IllegalArgumentException("Hamming Function: An argument too short!")
    if (s.length != t.length)
      throw new IllegalArgumentException(
        "Mismatch Function: Strings must be of equal length!")
    var d = 0L; var i = 0
    while (i < s.length) { if (s(i) != t(i)) d += 1; i += 1 }
    java.lang.Long.valueOf(d)
  }
}

/** Column DSL for the string-similarity expressions. */
object StringFunctions {
  import Bridge.{column, expression}
  def jaro_winkler(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b)))
  def damerau_levenshtein(a: Column, b: Column): Column =
    column(DamerauLevenshtein(expression(a), expression(b)))
  def jaccard_sim(a: Column, b: Column): Column =
    column(JaccardChars(expression(a), expression(b)))
  def hamming_distance(a: Column, b: Column): Column =
    column(HammingDistance(expression(a), expression(b)))
}
