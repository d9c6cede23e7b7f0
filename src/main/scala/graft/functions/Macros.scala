package graft.functions

import org.apache.spark.sql.SparkSession

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
  *    macro expansion without touching the session catalog: balanced-paren
  *    argument parsing, word-boundary parameter substitution, recursive
  *    expansion of nested macro calls.
  */
object Macros {

  private val Ddl =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?MACRO\s+(\w+)\s*\(([^)]*)\)\s*AS\s+(.+?)\s*;?\s*""".r

  /** Register the macro as a native Spark SQL temporary function. DuckDB
    * macros are untyped; Spark SQL UDF parameters carry a type, so
    * arguments bind as DOUBLE by default or `name TYPE` when the DDL says
    * so (e.g. `CREATE MACRO f(a STRING) AS upper(a)`).
    */
  def create(spark: SparkSession, ddl: String): Unit = ddl match {
    case Ddl(name, params, body) =>
      val ps = params.split(",").map(_.trim).filter(_.nonEmpty).map { p =>
        if (p.contains(" ")) p else s"$p DOUBLE"
      }
      spark.sql(
        s"CREATE OR REPLACE TEMPORARY FUNCTION $name(${ps.mkString(", ")}) RETURN $body")
      registry.get(spark).put(macroKey(name), (paramNames(params), body))
    case _ =>
      throw new IllegalArgumentException(s"not a CREATE MACRO statement: $ddl")
  }

  /** Parse + remember the macro for [[expand]] without registering a
    * session function (pure template).
    */
  def define(spark: SparkSession, ddl: String): Unit = ddl match {
    case Ddl(name, params, body) =>
      registry.get(spark).put(macroKey(name), (paramNames(params), body))
    case _ =>
      throw new IllegalArgumentException(s"not a CREATE MACRO statement: $ddl")
  }

  private def paramNames(params: String): Seq[String] =
    params.split(",").map(_.trim.split("\\s+")(0)).filter(_.nonEmpty).toSeq

  private def macroKey(name: String): String = name.toLowerCase

  private val registry =
    new ThreadSafeSessionMap[java.util.concurrent.ConcurrentHashMap[String, (Seq[String], String)]](
      () => new java.util.concurrent.ConcurrentHashMap)

  /** Inline every known macro call in `sql` (recursively, so macros can
    * call macros), exactly the reference's bind-time expansion.
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

  private def expandOne(sql: String, name: String, params: Seq[String], body: String): String = {
    val out = new StringBuilder
    var i = 0
    val lower = sql.toLowerCase
    while (i < sql.length) {
      val at = lower.indexOf(name + "(", i)
      val boundaryOk = at >= 0 &&
        (at == 0 || !Character.isLetterOrDigit(sql.charAt(at - 1)) && sql.charAt(at - 1) != '_')
      if (at < 0) { out.append(sql.substring(i)); i = sql.length }
      else if (!boundaryOk) { out.append(sql.substring(i, at + name.length)); i = at + name.length }
      else {
        out.append(sql.substring(i, at))
        // balanced-paren argument scan from the '(' after the name
        var j = at + name.length + 1
        var depth = 1
        val args = scala.collection.mutable.ArrayBuffer[String]()
        var argStart = j
        while (j < sql.length && depth > 0) {
          sql.charAt(j) match {
            case '(' => depth += 1
            case ')' =>
              depth -= 1
              if (depth == 0) { args += sql.substring(argStart, j).trim }
            case ',' if depth == 1 =>
              args += sql.substring(argStart, j).trim; argStart = j + 1
            case _ =>
          }
          j += 1
        }
        val substituted = params.zip(args).foldLeft(body) { case (b, (p, a)) =>
          b.replaceAll(s"(?i)\\b${java.util.regex.Pattern.quote(p)}\\b",
            java.util.regex.Matcher.quoteReplacement(s"($a)"))
        }
        out.append(s"($substituted)")
        i = j
      }
    }
    out.toString
  }

  /** Minimal session-keyed map with listener-based eviction (mirrors
    * engine.Tables' cache lifetime handling).
    */
  private final class ThreadSafeSessionMap[V <: AnyRef](mk: () => V) {
    private val m = new java.util.concurrent.ConcurrentHashMap[SparkSession, V]()
    def get(spark: SparkSession): V = m.computeIfAbsent(spark, s => {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = m.remove(s)
      })
      mk()
    })
  }
}
