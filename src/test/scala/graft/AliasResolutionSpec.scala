package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reference SELECT-alias binder extensions
  * (test/sql/filter/test_alias_filter.test,
  * test/sql/binder/alias_qualification_{where,group_by,having}.test).
  */
class AliasResolutionSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark

  private def rows(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().toSeq.map(r => (0 until r.length).map(r.get))

  test("SELECT alias is usable in WHERE; columns take priority") {
    spark.sql("SELECT 1 AS i UNION ALL SELECT 2 UNION ALL SELECT 3 UNION ALL SELECT CAST(NULL AS INT)")
      .createOrReplaceTempView("ints_af")
    assert(rows("SELECT i % 2 AS k FROM ints_af WHERE k <> 0").flatten == Seq(1, 1))
    // columns win over the alias of the same name
    assert(rows("SELECT i % 2 AS i FROM ints_af WHERE i <> 0").flatten.toSet == Set(1, 0))
    // an alias may appear on both sides
    assert(rows("SELECT i % 2 AS k FROM ints_af WHERE k = k").flatten.length == 3)
    // table-qualified alias never resolves (reference binder error)
    intercept[Exception](rows("SELECT i % 2 AS k FROM ints_af WHERE ints_af.k <> 0"))
  }

  test("alias to an aggregate in WHERE is a binder error") {
    val e = intercept[Exception](
      rows("SELECT i % 2 AS o, COUNT(i) AS c FROM ints_af WHERE c = 0 GROUP BY o"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // ours when the splice is resolved, Spark's INVALID_WHERE_CONDITION
    // when the aggregate reaches its own WHERE check unresolved — either
    // way the reference's "no aggregates in WHERE" rule holds
    assert(msgs(e).exists(m => m.contains("cannot contain aggregates") ||
      m.contains("INVALID_WHERE_CONDITION") || m.toLowerCase.contains("aggregate")),
      msgs(e).mkString(" | "))
  }

  test("alias.x qualifier in WHERE / GROUP BY / HAVING") {
    assert(rows("SELECT a AS x FROM (VALUES (1),(2),(3)) t(a) WHERE alias.x > 1 ORDER BY a")
      .flatten == Seq(2, 3))
    assert(rows(
      """SELECT a % 2 AS x, COUNT(*) AS cnt FROM (VALUES (1),(2),(3),(4)) t(a)
        |GROUP BY alias.x ORDER BY x""".stripMargin)
      == Seq(Seq(0, 2L), Seq(1, 2L)))
    assert(rows(
      """SELECT a % 2 AS x, SUM(a) AS s FROM (VALUES (1),(2),(3),(4)) t(a)
        |GROUP BY alias.x HAVING alias.s >= 6 ORDER BY x""".stripMargin)
      == Seq(Seq(0, 6L)))
  }

  test("a real relation named `alias` keeps priority over alias refs") {
    spark.sql("SELECT 10 AS v UNION ALL SELECT 20").createOrReplaceTempView("alias")
    try
      assert(rows("SELECT v AS x FROM alias WHERE alias.v > 10 ORDER BY v")
        .flatten == Seq(20))
    finally spark.catalog.dropTempView("alias")
  }

  test("unknown alias.x still errors") {
    intercept[Exception](rows("SELECT 5 AS x, alias.nope FROM (VALUES (1)) t(a)"))
  }
}
