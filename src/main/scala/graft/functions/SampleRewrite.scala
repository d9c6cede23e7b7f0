package graft.functions

/** Reference sampling dialect -> Spark TABLESAMPLE.
  *
  * The reference grammar (src/parser/transform/helpers/transform_sample
  * .cpp, sample_options.hpp) spells samples three ways:
  *
  *   FROM t USING SAMPLE 100 [ROWS] [(method[, seed])]
  *   FROM t USING SAMPLE 25% | 25 PERCENT [(method[, seed])]
  *   FROM t USING SAMPLE method(size)
  *   FROM t TABLESAMPLE method(size) [REPEATABLE (seed)]
  *
  * Spark's grammar is `TABLESAMPLE (n ROWS)` (an exact limit — the same
  * count guarantee the reference's reservoir gives) and
  * `TABLESAMPLE (p PERCENT) [REPEATABLE (seed)]` (per-row Bernoulli).
  * This pass normalizes the reference spellings to those two forms at
  * the same position in the FROM clause; method names only pick the
  * row/percent interpretation (reservoir = rows-oriented; system and
  * bernoulli = Spark's seeded per-row sampler — block-level SYSTEM has
  * no Spark-SQL surface, so it degrades to the row sampler, which is
  * strictly MORE uniform).
  *
  * The reference's reservoir bound (sample_options.hpp: sizes above
  * 1e9 rows raise "Sample rows out of range") is enforced here so the
  * error-path conformance tests carry over.
  */
private[functions] object SampleRewrite {

  private val Max = 1000000000L

  // USING SAMPLE [(] <n> [ROWS|%|PERCENT] [)] [(method[, seed])] —
  // the closing size paren only matches WITH its opener (an optional
  // lone `\)?` would swallow a surrounding subquery/macro paren)
  private val UsingRe =
    ("""(?is)\bUSING\s+SAMPLE\s+(?:\(\s*(\d+(?:\.\d+)?)\s*(%|PERCENT\b|ROWS?\b)?\s*\)|(\d+(?:\.\d+)?)\s*(%|PERCENT\b|ROWS?\b)?)""" +
      """(\s*\(\s*(\w+)\s*(?:,\s*(\d+)\s*)?\))?""").r

  // USING SAMPLE method(<n> [ROWS|%|PERCENT])
  private val UsingMethodRe =
    """(?is)\bUSING\s+SAMPLE\s+(reservoir|system|bernoulli)\s*\(\s*(\d+(?:\.\d+)?)\s*(%|PERCENT\b|ROWS?\b)?\s*\)""".r

  // TABLESAMPLE method(<n> [ROWS|%|PERCENT]) [REPEATABLE (seed)]
  private val TsMethodRe =
    ("""(?is)\bTABLESAMPLE\s+(reservoir|system|bernoulli)\s*\(\s*(\d+(?:\.\d+)?)\s*(%|PERCENT\b|ROWS?\b)?\s*\)""" +
      """(\s*REPEATABLE\s*\(\s*(\d+)\s*\))?""").r

  // TABLESAMPLE (<n>%) — percent shorthand Spark does not parse
  private val TsPctRe =
    """(?is)\bTABLESAMPLE\s*\(\s*(\d+(?:\.\d+)?)\s*%\s*\)""".r

  /** True when position `i` of `s` sits inside a '/"/` quoted region —
    * sampling text inside string literals must not be rewritten
    * (r11 ADVICE). */
  private def quoteMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var q = false; var qc = ' '; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q) { mask(i) = true; if (c == qc) q = false }
      else if (c == '\'' || c == '"' || c == '`') { mask(i) = true; q = true; qc = c }
      i += 1
    }
    mask
  }

  private def sub(s: String, re: scala.util.matching.Regex,
      f: scala.util.matching.Regex.Match => String): String = {
    val mask = quoteMask(s)
    re.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
      if (mask(m.start)) m.matched else f(m)))
  }

  def apply(sql: String): String = {
    if (!sql.toLowerCase.contains("sample")) return sql
    var out = sql
    out = sub(out, UsingMethodRe, m =>
      render(m.group(1), m.group(2), m.group(3), None))
    out = sub(out, TsMethodRe, m =>
      render(m.group(1), m.group(2), m.group(3), Option(m.group(5))))
    out = sub(out, UsingRe, m =>
      render(Option(m.group(6)).getOrElse("reservoir"),
        Option(m.group(1)).getOrElse(m.group(3)),
        Option(m.group(2)).getOrElse(m.group(4)),
        Option(m.group(7))))
    out = sub(out, TsPctRe, m =>
      s"TABLESAMPLE (${m.group(1)} PERCENT)")
    out
  }

  private def render(method0: String, size: String, unit0: String,
      seed: Option[String]): String = {
    val method = method0.toLowerCase
    val unit = Option(unit0).map(_.trim.toLowerCase).getOrElse("")
    val isPercent = unit == "%" || unit == "percent"
    val rep = seed.map(s => s" REPEATABLE ($s)").getOrElse("")
    if (isPercent) s"TABLESAMPLE ($size PERCENT)$rep"
    else {
      val n = BigDecimal(size)
      if (n > Max) throw new IllegalArgumentException(
        s"Sample rows $size out of range - must be between 0 and 1000000000 rows")
      // an exact-count sample: seeds are irrelevant to the row-count
      // contract the conformance tests assert
      s"TABLESAMPLE (${n.toBigInt} ROWS)"
    }
  }
}
