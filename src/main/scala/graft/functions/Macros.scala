package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CREATE MACRO — the reference's scalar SQL macros
  * (`/root/reference/src/function/macro_function.cpp`): a named expression
  * template inlined at bind time.
  *
  * Two Spark-first realizations:
  *
  *  - [[create]] parses the reference's `CREATE [OR REPLACE] MACRO
  *    name(p, …) AS body` DDL and registers a NATIVE Spark SQL function
  *    (`CREATE OR REPLACE TEMPORARY FUNCTION name(p, …) RETURN body`,
  *    Spark 4 SQL UDFs). The function then works in any `spark.sql` text
  *    and — exactly like the reference — is inlined into the plan at
  *    analysis time, so it codegens like the raw expression (no UDF
  *    call overhead).
  *
  *  - [[expand]] is the bind-time textual inliner for callers that want
  *    macro expansion without touching the session catalog:
  *    quote-aware balanced-paren argument parsing, capture-free two-phase
  *    parameter substitution, recursive expansion of nested macro calls,
  *    arity checked like the reference's bind error.
  */
object Macros {

  private val Head = """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?MACRO\s+(\w+)\s*\(""".r

  /** Parse `CREATE MACRO name(params) AS body` with a balanced,
    * quote-aware scan of the parameter list (a regex `[^)]*` would break
    * on parenthesized types like `DECIMAL(10,2)`).
    */
  private def parseDdl(ddl: String): (String, Seq[String], String) = {
    val m = Head.findPrefixMatchOf(ddl).getOrElse(
      throw new IllegalArgumentException(s"not a CREATE MACRO statement: $ddl"))
    val name = m.group(1)
    val (params, afterParams) = scanArgs(ddl, m.end) // m.end is just past '('
    val rest = ddl.substring(afterParams).trim
    val asRe = """(?is)^AS\s+(.+?)\s*;?\s*$""".r
    rest match {
      case asRe(body) => (name, params, body)
      case _ =>
        throw new IllegalArgumentException(s"not a CREATE MACRO statement: $ddl")
    }
  }

  /** Scan a balanced, quote-aware argument list starting just past the
    * opening '('; returns (top-level-comma-split args, index past ')').
    */
  private def scanArgs(s: String, from: Int): (Seq[String], Int) = {
    val args = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 1
    var inQuote = false
    var i = from
    var argStart = from
    while (i < s.length && depth > 0) {
      val ch = s.charAt(i)
      if (inQuote) {
        if (ch == '\'') inQuote = false
      } else ch match {
        case '\'' => inQuote = true
        case '('  => depth += 1
        case ')'  =>
          depth -= 1
          if (depth == 0) args += s.substring(argStart, i).trim
        case ',' if depth == 1 =>
          args += s.substring(argStart, i).trim; argStart = i + 1
        case _ =>
      }
      i += 1
    }
    if (depth != 0)
      throw new IllegalArgumentException(s"unbalanced parentheses in: $s")
    (args.filter(_.nonEmpty).toSeq, i)
  }

  /** Register the macro as a native Spark SQL temporary function. DuckDB
    * macros are untyped; Spark SQL UDF parameters carry a type, so
    * arguments bind as DOUBLE by default or `name TYPE` when the DDL says
    * so (e.g. `CREATE MACRO f(a STRING) AS upper(a)`).
    */
  def create(spark: SparkSession, ddl: String): Unit = {
    val (name, params, body) = parseDdl(ddl)
    val typed = params.map(p => if (p.contains(" ")) p else s"$p DOUBLE")
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY FUNCTION $name(${typed.mkString(", ")}) RETURN $body")
    registry.get(spark).put(name.toLowerCase, (params.map(paramName), body))
  }

  /** Parse + remember the macro for [[expand]] without registering a
    * session function (pure template).
    */
  def define(spark: SparkSession, ddl: String): Unit = {
    val (name, params, body) = parseDdl(ddl)
    registry.get(spark).put(name.toLowerCase, (params.map(paramName), body))
  }

  private def paramName(p: String): String = p.trim.split("\\s+")(0)

  private val registry = SessionScoped(
    () => new java.util.concurrent.ConcurrentHashMap[String, (Seq[String], String)])

  private val tableRegistry = SessionScoped(
    () => new java.util.concurrent.ConcurrentHashMap[String, (Seq[String], String)])

  /** `CREATE MACRO name(params) AS TABLE <query>` — the reference's TABLE
    * macros (`/root/reference/src/function/table_macro_function.cpp`): a
    * parameterized view, inlined at bind time. Spark has no SQL surface
    * for table-valued functions, so the call side is programmatic
    * ([[callTable]]), with the same expansion semantics: arguments
    * substitute capture-free, scalar macros inside the body expand too.
    */
  def createTable(spark: SparkSession, ddl: String): Unit = {
    val (name, params, body) = parseDdl(ddl)
    val t = """(?is)^TABLE\s+(.+)$""".r
    body match {
      case t(query) =>
        tableRegistry.get(spark).put(name.toLowerCase, (params.map(paramName), query))
      case _ =>
        throw new IllegalArgumentException(s"not a TABLE macro: $ddl")
    }
  }

  /** Expand a table-macro call `name(arg, …)` to its DataFrame. */
  def callTable(spark: SparkSession, call: String): DataFrame = {
    val m = """(?s)\s*(\w+)\s*\(""".r.findPrefixMatchOf(call).getOrElse(
      throw new IllegalArgumentException(s"not a macro call: $call"))
    val name = m.group(1).toLowerCase
    val (args, _) = scanArgs(call, m.end)
    val (params, query) = Option(tableRegistry.get(spark).get(name)).getOrElse(
      throw new IllegalArgumentException(s"unknown table macro: $name"))
    if (args.length != params.length)
      throw new IllegalArgumentException(
        s"macro $name expects ${params.length} arguments, got ${args.length}")
    spark.sql(expand(spark, substitute(query, params, args)))
  }

  /** Inline every known macro call in `sql` (recursively, so macros can
    * call macros), exactly the reference's bind-time expansion. Calls
    * inside string literals are left alone; arity mismatches raise like
    * the reference's bind error.
    */
  def expand(spark: SparkSession, sql: String, maxDepth: Int = 16): String = {
    val macros = registry.get(spark)
    var cur = sql
    var depth = 0
    var changed = true
    while (changed && depth < maxDepth) {
      changed = false
      macros.forEach { (name, pb) =>
        val next = expandOne(cur, name, pb._1, pb._2)
        if (next != cur) { cur = next; changed = true }
      }
      depth += 1
    }
    cur
  }

  /** Two-phase substitution: params → collision-free placeholders →
    * arguments, so an argument containing another parameter's name is
    * never re-substituted (classic capture bug otherwise).
    */
  private def substitute(body: String, params: Seq[String], args: Seq[String]): String = {
    val sep = 1.toChar.toString // a control char cannot occur in SQL text
    val tagged = params.zipWithIndex.foldLeft(body) { case (b, (p, idx)) =>
      b.replaceAll(s"(?i)\\b${java.util.regex.Pattern.quote(p)}\\b",
        java.util.regex.Matcher.quoteReplacement(sep + idx + sep))
    }
    args.zipWithIndex.foldLeft(tagged) { case (b, (a, idx)) =>
      b.replace(sep + idx + sep, s"($a)")
    }
  }

  private def expandOne(sql: String, name: String, params: Seq[String], body: String): String = {
    val out = new StringBuilder
    val lower = sql.toLowerCase
    var i = 0
    var inQuote = false
    while (i < sql.length) {
      val ch = sql.charAt(i)
      if (inQuote) {
        out.append(ch)
        if (ch == '\'') inQuote = false
        i += 1
      } else if (ch == '\'') {
        out.append(ch); inQuote = true; i += 1
      } else if (lower.startsWith(name + "(", i) &&
          (i == 0 || (!Character.isLetterOrDigit(sql.charAt(i - 1)) && sql.charAt(i - 1) != '_'))) {
        val (args, after) = scanArgs(sql, i + name.length + 1)
        if (args.length != params.length)
          throw new IllegalArgumentException(
            s"macro $name expects ${params.length} arguments, got ${args.length}")
        out.append(s"(${substitute(body, params, args)})")
        i = after
      } else {
        out.append(ch); i += 1
      }
    }
    out.toString
  }
}

/** Session-keyed map with listener-based eviction on application end —
  * shared lifetime handling for per-session registries (used by Macros;
  * same pattern as engine.Tables' plan cache).
  */
private[graft] final class SessionScoped[V <: AnyRef](mk: () => V) {
  private val m = new java.util.concurrent.ConcurrentHashMap[SparkSession, V]()
  def get(spark: SparkSession): V = m.computeIfAbsent(spark, s => {
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onApplicationEnd(
          e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = m.remove(s)
    })
    mk()
  })

  /** Explicit eviction for services that churn sessions on one long-lived
    * context (the listener only fires when the whole application ends).
    */
  def drop(spark: SparkSession): Unit = m.remove(spark)
}

private[graft] object SessionScoped {
  def apply[V <: AnyRef](mk: () => V): SessionScoped[V] = new SessionScoped(mk)
}
