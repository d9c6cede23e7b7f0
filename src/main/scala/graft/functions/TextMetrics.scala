package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-quality kernel (called from generated code). Reproduces
  * graft.pipeline.TextAnalysis's column formulation EXACTLY — same
  * lowercase, same `\s+` split with trailing empties kept (Spark's
  * split uses limit -1), same [a-z0-9 ] kept-set, same composite score
  * arithmetic order — but in one traversal instead of five regex passes
  * per row (the column tree re-split and re-replaced the text per
  * metric; the DuckDB oracle pins the semantics either way).
  */
object TextMetrics {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Java regex `\s` class (NOT all Unicode whitespace). */
  private def isWs(code: Int): Boolean =
    code == ' ' || code == '\t' || code == '\n' || code == 0x0B ||
      code == '\f' || code == '\r'

  /** -> (n_tokens BIGINT, avg_word_len, punct_ratio, quality) */
  def stats(text: UTF8String, stopwords: Array[String]): InternalRow = {
    val orig = text.toString
    val lower = text.toLowerCase.toString
    val tokens = ws.split(lower, -1)
    val nTok = tokens.length

    // avg word length: non-\s code points of the ORIGINAL text / token
    // count (code points, not UTF-16 units — Spark's length() semantics)
    var nonWs = 0
    var cp = 0
    var i = 0
    while (i < orig.length) {
      val code = orig.codePointAt(i)
      if (!isWs(code)) nonWs += 1
      cp += 1
      i += Character.charCount(code)
    }
    val avgWordLen = nonWs.toDouble / nTok

    // punct ratio: code points of lower(text) outside [a-z0-9 ], over
    // length(text)
    var kept = 0
    i = 0
    while (i < lower.length) {
      val code = lower.codePointAt(i)
      if ((code >= 'a' && code <= 'z') || (code >= '0' && code <= '9') || code == ' ')
        kept += 1
      i += Character.charCount(code)
    }
    // empty text: 0/0 would be NaN here, but the column formulation's
    // Divide yields NULL on a zero divisor — match it (quality inherits
    // the null since it sums punctComp).
    if (cp == 0) {
      return new GenericInternalRow(
        Array[Any](nTok.toLong, nonWs.toDouble / nTok, null, null))
    }
    val punctRatio = (cp - kept).toDouble / cp

    // diversity + stopword ratio over the token multiset
    val distinct = new java.util.HashSet[String]()
    var stops = 0
    var t = 0
    while (t < nTok) {
      val tok = tokens(t)
      distinct.add(tok)
      var s = 0
      var hit = false
      while (s < stopwords.length && !hit) {
        if (stopwords(s) == tok) hit = true
        s += 1
      }
      if (hit) stops += 1
      t += 1
    }
    val diversity = distinct.size.toDouble / nTok
    val stopRatio = stops.toDouble / nTok

    val lenScore = math.min(nTok.toDouble / 64.0, 1.0)
    val punctComp = 1.0 - math.min(punctRatio * 5.0, 1.0)
    val stopComp = math.min(stopRatio * 5.0, 1.0)
    val quality = (lenScore + diversity + punctComp + stopComp) / 4.0

    new GenericInternalRow(Array[Any](nTok.toLong, avgWordLen, punctRatio, quality))
  }
}
