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

  test("default parameters: positional fill, p := v named args, defaults") {
    Macros.define(spark, "CREATE MACRO m_def(a, b := 10) AS a + b")
    assert(Macros.expand(spark, "SELECT m_def(1)") == "SELECT ((1) + (10))")
    assert(Macros.expand(spark, "SELECT m_def(1, 2)") == "SELECT ((1) + (2))")
    assert(Macros.expand(spark, "SELECT m_def(1, b := 5)")
      == "SELECT ((1) + (5))")
    intercept[IllegalArgumentException] { Macros.expand(spark, "SELECT m_def()") }
    intercept[IllegalArgumentException] {
      Macros.expand(spark, "SELECT m_def(1, 2, 3)")
    }
  }

  test("expandAll inlines table macros as derived tables in SQL text") {
    Macros.defineAny(spark,
      "CREATE MACRO m_ids(n) AS TABLE SELECT id FROM range(n)")
    val sql = Macros.expandAll(spark, "SELECT count(*) AS c FROM m_ids(5)")
    assert(spark.sql(sql).collect().head.getLong(0) == 5L)
  }

  test("overloads dispatch on argument count (reference multi-signature DDL)") {
    Macros.define(spark,
      "CREATE MACRO m_multi() AS 0, (a) AS a, (a, b) AS a + b")
    assert(Macros.expand(spark, "SELECT m_multi()") == "SELECT (0)")
    assert(Macros.expand(spark, "SELECT m_multi(7)") == "SELECT ((7))")
    assert(Macros.expand(spark, "SELECT m_multi(1, 2)") == "SELECT ((1) + (2))")
    intercept[IllegalArgumentException] {
      Macros.expand(spark, "SELECT m_multi(1, 2, 3)")
    }
  }

  test("scalar and table namespaces are separate; FROM-context dispatch") {
    Macros.clear(spark)
    Macros.defineAny(spark, "CREATE MACRO m_ns() AS 42")
    Macros.defineAny(spark, "CREATE MACRO m_ns() AS TABLE SELECT 7 AS t")
    // scalar position → scalar macro; FROM position → table macro
    assert(spark.sql(Macros.expandAll(spark, "SELECT m_ns() AS v"))
      .collect().head.getInt(0) == 42)
    assert(spark.sql(Macros.expandAll(spark, "SELECT t FROM m_ns()"))
      .collect().head.getInt(0) == 7)
    // DROP removes the scalar entry first, table on the second drop
    Macros.drop(spark, "DROP MACRO m_ns")
    assert(Macros.expandAll(spark, "SELECT m_ns()") == "SELECT m_ns()")
    assert(spark.sql(Macros.expandAll(spark, "SELECT t FROM m_ns()"))
      .collect().head.getInt(0) == 7)
    Macros.drop(spark, "DROP MACRO m_ns")
    assert(Macros.expandAll(spark, "SELECT t FROM m_ns()")
      == "SELECT t FROM m_ns()")
  }

  test("defaults must be constants; param-column conflicts error at create") {
    intercept[IllegalArgumentException] {
      Macros.define(spark, "CREATE MACRO m_bad(a, b := a) AS a + b")
    }
    intercept[IllegalArgumentException] {
      Macros.define(spark, "CREATE MACRO m_bad2(a := some_col) AS a")
    }
    Macros.define(spark, "CREATE MACRO m_okd(a := pi(), b := 'x') AS a || b")
    spark.range(1).selectExpr("id AS cx").createOrReplaceTempView("m_conflict_t")
    intercept[IllegalArgumentException] {
      Macros.define(spark,
        "CREATE MACRO m_cc(cx) AS (SELECT cx + cx FROM m_conflict_t)")
    }
  }

  test("defineAny dispatch, DROP MACRO, and clear") {
    Macros.defineAny(spark, "CREATE MACRO m_sc9(x) AS x + 1")
    assert(Macros.expand(spark, "SELECT m_sc9(1)") == "SELECT ((1) + 1)")
    Macros.drop(spark, "DROP MACRO m_sc9")
    assert(Macros.expand(spark, "SELECT m_sc9(1)") == "SELECT m_sc9(1)")
    intercept[IllegalArgumentException] { Macros.drop(spark, "DROP MACRO m_sc9") }
    Macros.drop(spark, "DROP MACRO IF EXISTS m_sc9") // no error
    Macros.defineAny(spark, "CREATE MACRO m_sc10(x) AS x + 1")
    Macros.clear(spark)
    assert(Macros.expand(spark, "SELECT m_sc10(1)") == "SELECT m_sc10(1)")
  }

  // --- window relocation (reference window-macro semantics) -------------

  test("OVER relocates into the unique aggregate of a macro expansion") {
    Macros.clear(spark)
    Macros.define(spark, "CREATE MACRO m_wagg(x) AS SUM(x * 2)")
    val out = spark.sql(Macros.expandAll(spark,
      "SELECT m_wagg(id) OVER () AS s FROM range(3)")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(6L)) // (0+1+2)*2 per row
  }

  test("OVER through a non-aggregate wrapper finds the inner aggregate") {
    val sql = Macros.expandAll(spark,
      "SELECT sort_array(collect_list(id)) OVER (PARTITION BY id % 2) AS l " +
        "FROM range(4)")
    val rows = spark.sql(sql).collect().map(_.getSeq[Long](0)).toSet
    assert(rows == Set(Seq(0L, 2L), Seq(1L, 3L)))
  }

  test("call-site FILTER folds into CASE inside the windowed aggregate") {
    val sql = Macros.expandAll(spark,
      "SELECT sum(id) FILTER (WHERE id > 1) OVER () AS s FROM range(4)")
    assert(spark.sql(sql).collect().map(_.getLong(0)).toSet == Set(5L))
  }

  test("COUNT(DISTINCT) over a window becomes size(collect_set)") {
    val sql = Macros.expandAll(spark,
      "SELECT count(DISTINCT id % 3) OVER () AS c FROM range(10)")
    assert(spark.sql(sql).collect().map(_.getInt(0)).toSet == Set(3))
  }

  test("zero aggregates under a relocating OVER is the reference bind error") {
    Macros.define(spark, "CREATE MACRO m_wnone(x) AS x + 1")
    intercept[IllegalArgumentException] {
      Macros.expandAll(spark, "SELECT m_wnone(id) OVER () FROM range(3)")
    }
  }

  test("plain windowed aggregates and ranking functions pass through") {
    val s1 = "SELECT sum(id) OVER (ORDER BY id) FROM range(3)"
    assert(Macros.expandAll(spark, s1) == s1)
    val s2 = "SELECT row_number() OVER (ORDER BY id) FROM range(3)"
    assert(Macros.expandAll(spark, s2) == s2)
  }

  test("order-requiring window fns over an unordered window get ORDER BY 1") {
    val sql = Macros.expandAll(spark,
      "SELECT lead(id) OVER () AS x FROM range(2)")
    assert(sql.contains("ORDER BY 1"))
    assert(spark.sql(sql).count() == 2)
  }
}
