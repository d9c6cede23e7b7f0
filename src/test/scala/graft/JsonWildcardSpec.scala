package graft

import org.scalatest.funsuite.AnyFunSuite

/** JSON path wildcard extraction (reference json_common.cpp
  * GetWildcardPathInternal): `$.*` / `$[*]` return a LIST of matches
  * (verified against the DuckDB oracle), and the recursive `$.**` /
  * `$..key` forms follow the reference's breadth-first traversal (the
  * installed oracle predates them, so they are pinned here).
  */
class JsonWildcardSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark

  private def strings(sql: String): Seq[String] = {
    val r = spark.sql(sql).collect().head
    r.getSeq[String](0).map(s => if (s == null) "NULL" else s)
  }

  test("$.* fans out over object values (oracle-checked shape)") {
    assert(strings("""SELECT json_extract('{"a":1,"b":{"c":2}}', '$.*') AS v""") ==
      Seq("1", """{"c":2}"""))
    assert(strings("""SELECT json_extract('5', '$.*') AS v""") == Seq())
  }

  test("$[*] fans out over array elements only") {
    assert(strings("""SELECT json_extract('[1,[2,3],{"x":4}]', '$[*]') AS v""") ==
      Seq("1", "[2,3]", """{"x":4}"""))
    assert(strings("""SELECT json_extract('{"a":1}', '$[*]') AS v""") == Seq())
  }

  test("wildcards compose with trailing segments, missing keys drop") {
    assert(strings("""SELECT json_extract('{"a":[10,20],"c":[30]}', '$.*[0]') AS v""") ==
      Seq("10", "30"))
    assert(strings("""SELECT json_extract('[{"a":1},{"b":3},{"a":2}]', '$[*].a') AS v""") ==
      Seq("1", "2"))
  }

  test("json_extract_string keeps JSON-null matches as NULL elements") {
    assert(strings(
      """SELECT json_extract_string('[{"a":"x"},{"a":null},{"b":3}]', '$[*].a') AS v""") ==
      Seq("x", "NULL"))
  }

  test("json_type over a wildcard path lists per-match type names") {
    assert(strings("""SELECT json_type('[{"a":1},{"a":"s"}]', '$[*].a') AS v""") ==
      Seq("UBIGINT", "VARCHAR"))
  }

  test("recursive $.** collects all strict descendants breadth-first") {
    assert(strings(
      """SELECT json_extract('{"a":{"b":1},"c":[2]}', '$.**') AS v""") ==
      Seq("""{"b":1}""", "[2]", "1", "2"))
  }

  test("recursive $..key matches at every depth including the root") {
    assert(strings(
      """SELECT json_extract('{"b":0,"a":{"b":1},"c":[{"b":2},5]}', '$..b') AS v""") ==
      Seq("0", "1", "2"))
    assert(strings(
      """SELECT json_extract('{"a":{"b":1},"c":[{"b":2},5]}', '$.**.b') AS v""") ==
      Seq("1", "2"))
  }

  test("recursive $..[i] indexes every array descendant") {
    assert(strings(
      """SELECT json_extract('{"a":[10,20],"c":[30]}', '$..[0]') AS v""") ==
      Seq("10", "30"))
  }

  test("non-constant wildcard path raises (bind-time-only LIST typing)") {
    val e = intercept[Exception] {
      spark.sql("""SELECT json_extract('{"a":1}', p) AS v
                  |FROM (SELECT '$.*' AS p)""".stripMargin).collect()
    }
    assert(e.getMessage.contains("wildcard") ||
      e.getCause != null && e.getCause.getMessage.contains("wildcard"))
  }
}
