package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Macros

class MacrosSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark

  test("CREATE MACRO registers a native SQL function, inlined at analysis") {
    Macros.create(spark, "CREATE MACRO m_markup(price, pct) AS price * (1 + pct / 100)")
    val r = spark.sql("SELECT m_markup(200.0, 10.0) AS v").collect().head.getDouble(0)
    assert(math.abs(r - 220.0) < 1e-9)
  }

  test("typed macro parameters pass through") {
    Macros.create(spark, "CREATE MACRO m_shout(s STRING) AS upper(s)")
    assert(spark.sql("SELECT m_shout('abc') AS v").collect().head.getString(0) == "ABC")
  }

  test("expand inlines nested macro calls with balanced parens") {
    Macros.define(spark, "CREATE MACRO m_sq(x) AS x * x")
    Macros.define(spark, "CREATE MACRO m_hyp(a, b) AS sqrt(m_sq(a) + m_sq(b))")
    val sql = Macros.expand(spark, "SELECT m_hyp(3, 4) AS h")
    val r = spark.sql(sql).collect().head.getDouble(0)
    assert(math.abs(r - 5.0) < 1e-9)
    assert(!sql.toLowerCase.contains("m_hyp") && !sql.toLowerCase.contains("m_sq"))
  }

  test("macro names are not substituted inside longer identifiers") {
    Macros.define(spark, "CREATE MACRO f(x) AS x + 1")
    val sql = Macros.expand(spark, "SELECT sqrtf(1.0), f(2)")
    assert(sql.contains("sqrtf(1.0)"))
  }

  test("no capture: an argument containing a later parameter name survives") {
    Macros.define(spark, "CREATE MACRO m_pair(a, b) AS a + b")
    // passing the literal column name `b` as the FIRST argument must not be
    // re-substituted by the b->second-arg pass
    val sql = Macros.expand(spark, "SELECT m_pair(b, 2) AS v FROM (SELECT 7 AS b)")
    assert(spark.sql(sql).collect().head.getInt(0) == 9, sql)
  }

  test("string literals are opaque to expansion and argument splitting") {
    Macros.define(spark, "CREATE MACRO m_tag(s STRING) AS concat('[', s, ']')")
    val sql = Macros.expand(spark, "SELECT m_tag('a,b') AS v, 'm_tag(x)' AS lit")
    val row = spark.sql(sql).collect().head
    assert(row.getString(0) == "[a,b]", sql)
    assert(row.getString(1) == "m_tag(x)", sql) // untouched inside the literal
  }

  test("arity mismatch raises at expansion, like the reference bind error") {
    Macros.define(spark, "CREATE MACRO m_two(a, b) AS a + b")
    intercept[IllegalArgumentException] {
      Macros.expand(spark, "SELECT m_two(1)")
    }
  }

  test("parenthesized parameter types parse (DECIMAL(10,2))") {
    Macros.create(spark, "CREATE MACRO m_dec(a DECIMAL(10,2)) AS a * 2")
    val r = spark.sql("SELECT m_dec(CAST(1.25 AS DECIMAL(10,2))) AS v")
      .collect().head.getDecimal(0)
    assert(r.doubleValue() == 2.5)
  }

  test("table macro expands to a parameterized query, scalar macros inside expand too") {
    Macros.define(spark, "CREATE MACRO m_double(x) AS x * 2")
    Macros.createTable(spark,
      "CREATE MACRO m_range(n) AS TABLE SELECT id, m_double(id) AS d FROM range(n)")
    val rows = Macros.callTable(spark, "m_range(4)").orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 2L, 4L, 6L))
  }

  test("table macro arity and unknown-name errors mirror the bind errors") {
    Macros.createTable(spark,
      "CREATE MACRO m_tbl1(n) AS TABLE SELECT id FROM range(n)")
    intercept[IllegalArgumentException] { Macros.callTable(spark, "m_tbl1(1, 2)") }
    intercept[IllegalArgumentException] { Macros.callTable(spark, "m_nope(1)") }
    intercept[IllegalArgumentException] {
      Macros.createTable(spark, "CREATE MACRO m_scalar(x) AS x + 1")
    }
  }
}
