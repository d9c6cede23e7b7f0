package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import graft.functions.{StringFunctions => SF, VectorFunctions => VF}

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("vec_dot/cosine/l2/norm match scala reference (codegen path)") {
    import spark.implicits._
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val df = Seq((a, b)).toDF("a", "b")
    val dot = one[Double](df.select(VF.vec_dot(col("a"), col("b"))))
    val cos = one[Double](df.select(VF.vec_cosine(col("a"), col("b"))))
    val l2 = one[Double](df.select(VF.vec_l2(col("a"), col("b"))))
    val nrm = one[Double](df.select(VF.vec_norm(col("a"))))
    val refDot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    assert(math.abs(dot - refDot) < 1e-12)
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    assert(math.abs(cos - refDot / (na * nb)) < 1e-12)
    assert(math.abs(l2 - math.sqrt(a.zip(b).map { case (x, y) =>
      val d = x.toDouble - y; d * d }.sum)) < 1e-12)
    assert(math.abs(nrm - na) < 1e-12)
  }

  test("vec expressions null-propagate and handle interpreted path") {
    import spark.implicits._
    val df = Seq((Array(1.0f), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(VF.vec_dot(col("a"), col("b"))).collect().head.isNullAt(0))
    // interpreted (non-codegen) path via eval on filter
    val r = df.filter(VF.vec_norm(col("a")) > 0).count()
    assert(r == 1)
  }

  test("string similarity known values") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("kitten", "sitting"), ("ca", "abc"))
      .toDF("a", "b")
    val rows = df.select(
      SF.jaro_winkler(col("a"), col("b")).as("jw"),
      SF.damerau_levenshtein(col("a"), col("b")).as("dl"),
      SF.jaccard_sim(col("a"), col("b")).as("jac")).collect()
    // martha/marhta: classic JW = 0.9611
    assert(math.abs(rows(0).getAs[Double]("jw") - 0.9611111111111111) < 1e-9)
    assert(rows(0).getAs[Long]("dl") == 1) // one transposition
    // kitten/sitting: DL = 3
    assert(rows(1).getAs[Long]("dl") == 3)
    // ca/abc: unrestricted DL = 2 (OSA would give 3)
    assert(rows(2).getAs[Long]("dl") == 2)
    // hamming: equal-length distance; unequal length is an error like the
    // reference's Mismatch Function (hamming.cpp)
    val ham = df.filter(length(col("a")) === length(col("b")))
      .select(SF.hamming_distance(col("a"), col("b")).as("ham")).collect()
    assert(ham(0).getAs[Long]("ham") == 2)
    intercept[Exception] {
      df.select(SF.hamming_distance(col("a"), col("b"))).collect()
    }
  }

  test("jaccard is byte-set based like the reference") {
    import spark.implicits._
    val df = Seq(("aab", "ab"), ("abc", "xyz")).toDF("a", "b")
    val r = df.select(SF.jaccard_sim(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) == 1.0) // {a,b} vs {a,b}
    assert(r(1).getDouble(0) == 0.0)
  }

  test("gcd/lcm properties") {
    import spark.implicits._
    // property check with scalacheck generators, driven manually
    val gen = org.scalacheck.Gen.chooseNum(Int.MinValue + 1, Int.MaxValue)
    val seed = org.scalacheck.rng.Seed(42L)
    val params = org.scalacheck.Gen.Parameters.default
    var s = seed
    (1 to 200).foreach { _ =>
      val a = gen.pureApply(params, s).toLong; s = s.next
      val b = gen.pureApply(params, s).toLong; s = s.next
      val g = org.apache.spark.sql.graft.Gcd.compute(a, b)
      if (a != 0 || b != 0) assert(g > 0 && a % g == 0 && b % g == 0)
      else assert(g == 0)
    }
    val df = Seq((12L, 18L)).toDF("a", "b")
    val r = df.select(expr("gcd(a, b)"), expr("lcm(a, b)")).collect().head
    assert(r.getLong(0) == 6 && r.getLong(1) == 36)
  }

  test("json_merge_patch: RFC 7386 delete/merge/replace semantics") {
    graft.engine.EngineSession.configure(spark)
    def m(a: String, b: String): String =
      spark.sql(s"SELECT json_merge_patch('$a', '$b')").collect().head.getString(0)
    assert(m("""{"k":1}""", """{"x":2}""") == """{"k":1,"x":2}""")
    assert(m("""{"k":1,"d":2}""", """{"d":null}""") == """{"k":1}""")
    assert(m("""{"o":{"a":1}}""", """{"o":{"b":2}}""") == """{"o":{"a":1,"b":2}}""")
    assert(m("""{"o":{"a":1}}""", """{"o":[1,2]}""") == """{"o":[1,2]}""")
    assert(m("""[1,2]""", """{"a":1}""") == """{"a":1}""") // non-object target
  }

  test("uuidv7: version and variant bits, time-ordered prefix") {
    graft.engine.EngineSession.configure(spark)
    val ids = spark.range(100).selectExpr("uuidv7() AS u").collect().map(_.getString(0))
    assert(ids.distinct.length == 100) // no collisions in 100 draws
    ids.foreach { u =>
      assert(u.charAt(14) == '7', s"version nibble: $u")
      assert("89ab".contains(u.charAt(19)), s"variant bits: $u")
    }
    // millisecond prefix is non-decreasing when drawn over time
    val a = spark.sql("SELECT uuidv7()").collect().head.getString(0)
    Thread.sleep(5)
    val b = spark.sql("SELECT uuidv7()").collect().head.getString(0)
    assert(a.substring(0, 13) <= b.substring(0, 13))
  }

  test("simhash: identical token sets collide, disjoint sets differ") {
    import spark.implicits._
    import graft.functions.TextHash
    val df = Seq(
      ("a", Seq("spark", "query", "engine")),
      ("b", Seq("engine", "spark", "query")), // order-insensitive
      ("c", Seq("totally", "different", "words", "here", "now"))).toDF("id", "toks")
    val out = df.select(col("id"), TextHash.simhash(col("toks")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") == out("b"))
    assert(out("a") != out("c"))
  }

  test("json_structure: reference merge semantics") {
    def st(j: String): String =
      spark.sql(s"SELECT json_structure('${j.replace("'", "''")}')")
        .collect().head.getString(0)
    // scalar typing (uint/sint/real split like yyjson)
    assert(st("""{"a":1,"b":"s","c":[1,2],"d":{"e":1.5},"f":null,"g":true,"h":-2}""") ==
      """{"a":"UBIGINT","b":"VARCHAR","c":["UBIGINT"],"d":{"e":"DOUBLE"},"f":"NULL","g":"BOOLEAN","h":"BIGINT"}""")
    // array-element merging: key union in first-seen order; NULL absorbs
    assert(st("""[{"a":1},{"b":2}]""") == """[{"a":"UBIGINT","b":"UBIGINT"}]""")
    assert(st("""[{"a":null},{"a":1}]""") == """[{"a":"UBIGINT"}]""")
    // numeric promotion and irreconcilable types
    assert(st("""[1,2.5]""") == """["DOUBLE"]""")
    assert(st("""[1,-2]""") == """["BIGINT"]""")
    assert(st("""[1,"a"]""") == """["JSON"]""")
    assert(st("""[{"a":1},{"a":"s"}]""") == """[{"a":"JSON"}]""")
    // degenerate containers match the oracle
    assert(st("[]") == """["NULL"]""")
    assert(st("{}") == "\"JSON\"")
    assert(st("18446744073709551615") == "\"UBIGINT\"")
    // malformed input -> NULL
    assert(spark.sql("SELECT json_structure('not json')").collect().head.isNullAt(0))
  }

  test("json_pretty: yyjson 4-space format, round-trips, literal numbers kept") {
    def pp(j: String): String =
      spark.sql(s"SELECT json_pretty('${j.replace("'", "''")}')")
        .collect().head.getString(0)
    assert(pp("""{"a":1,"b":[1,{"c":null}],"s":"x"}""") ==
      "{\n    \"a\": 1,\n    \"b\": [\n        1,\n        {\n            \"c\": null\n        }\n    ],\n    \"s\": \"x\"\n}")
    assert(pp("[]") == "[]" && pp("{}") == "{}" && pp("3") == "3")
    assert(pp("""{"e":1e5,"n":-2.50}""") == "{\n    \"e\": 1e5,\n    \"n\": -2.50\n}")
    // escapes fed through a Column literal (SQL single-quote literals
    // apply their own backslash processing)
    val esc = spark.range(1).select(
      org.apache.spark.sql.graft.Bridge.column(
        org.apache.spark.sql.graft.JsonPretty(
          org.apache.spark.sql.graft.Bridge.expression(
            lit("""{"q":"a\"b\\c"}""")))))
      .collect().head.getString(0)
    assert(esc == "{\n    \"q\": \"a\\\"b\\\\c\"\n}")
    assert(spark.sql("SELECT json_pretty('{bad')").collect().head.isNullAt(0))
  }

  test("json_transform lowers to from_json; strict raises; scalars unwrap") {
    val r = spark.sql(
      """SELECT json_transform('{"a": 7, "b": [1, 2], "s": {"x": "y"}}',
        |  '{"a": "BIGINT", "b": ["INTEGER"], "s": {"x": "VARCHAR"}}') AS v"""
        .stripMargin).collect().head.getStruct(0)
    assert(r.getLong(0) == 7L)
    assert(r.getSeq[Int](1) == Seq(1, 2))
    assert(r.getStruct(2).getString(0) == "y")
    // non-strict: mistyped field nulls out
    val lax = spark.sql(
      """SELECT json_transform('{"a": "notanint"}', '{"a": "INTEGER"}') AS v""")
      .collect().head.getStruct(0)
    assert(lax.isNullAt(0))
    // scalar template unwraps
    assert(spark.sql("""SELECT json_transform('42', '"BIGINT"')""")
      .collect().head.getLong(0) == 42L)
    // strict raises on malformed input
    assertThrows[Exception] {
      spark.sql("""SELECT json_transform_strict('{"a": [}', '{"a": "INTEGER"}')""")
        .collect()
    }
  }

  test("json_serialize_sql round-trips through json_deserialize_sql") {
    val rt = spark.sql(
      "SELECT json_deserialize_sql(json_serialize_sql('SELECT 1 + 2 AS x')) AS s")
      .collect().head.getString(0)
    assert(rt == "SELECT 1 + 2 AS x")
    // document carries the engine-native plan AST and error=false
    val doc = spark.sql("SELECT json_serialize_sql('SELECT 1') AS d")
      .collect().head.getString(0)
    assert(doc.contains("\"error\":false") && doc.contains("\"plan\""))
    // unparseable SQL -> error document, and deserialize of it raises
    val bad = spark.sql("SELECT json_serialize_sql('SELECT SELECT SELECT x FROM') AS d")
      .collect().head.getString(0)
    assert(bad.contains("\"error\":true"))
    assertThrows[Exception] {
      spark.sql(s"SELECT json_deserialize_sql('${bad.replace("'", "''")}')").collect()
    }
  }
}
