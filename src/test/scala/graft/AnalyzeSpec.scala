package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** ANALYZE/VACUUM statements (reference test/sql/vacuum/test_analyze
  * .test) + the CBO effect the lowering exists for: post-ANALYZE stats
  * drive join reorder. */
class AnalyzeSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  private def exec(sql: String) = graft.functions.Analyze.execute(spark, sql)

  test("statement surface: bare + ANALYSE + VACUUM forms") {
    exec("ANALYZE;")
    exec("ANALYSE;")
    exec("VACUUM;")
    exec("VACUUM ANALYSE;")
  }

  test("missing table and views reject like the reference binder") {
    val e1 = intercept[Exception](exec("VACUUM analyzespec_missing"))
    assert(e1.getMessage.contains("does not exist"))
    val e2 = intercept[Exception](exec("ANALYZE analyzespec_missing"))
    assert(e2.getMessage.contains("does not exist"))
    spark.sql("DROP TABLE IF EXISTS anz_t")
    spark.sql("CREATE TABLE anz_t(i INT, j INT) USING parquet")
    spark.sql("CREATE OR REPLACE VIEW anz_view AS SELECT * FROM anz_t")
    try {
      exec("ANALYZE anz_t")
      exec("ANALYSE anz_t")
      val e3 = intercept[Exception](exec("ANALYZE anz_view"))
      assert(e3.getMessage.contains("Can only vacuum or analyze base tables"))
    } finally {
      spark.sql("DROP VIEW IF EXISTS anz_view")
      spark.sql("DROP TABLE IF EXISTS anz_t")
    }
  }

  test("ANALYZE attaches row/column statistics the optimizer can read") {
    spark.sql("DROP TABLE IF EXISTS anz_stats")
    spark.sql("CREATE TABLE anz_stats(i INT) USING parquet")
    spark.sql("INSERT INTO anz_stats SELECT id FROM range(1000)")
    try {
      exec("ANALYZE anz_stats")
      val stats = spark.table("anz_stats").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(1000)), stats)
      assert(stats.attributeStats.nonEmpty, "expected column-level stats")
    } finally spark.sql("DROP TABLE IF EXISTS anz_stats")
  }

  test("post-ANALYZE a 3-table catalog join reorders by stats") {
    for (t <- Seq("anz_big", "anz_mid", "anz_tiny"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql("CREATE TABLE anz_big(k INT, pad STRING) USING parquet")
    spark.sql("CREATE TABLE anz_mid(k INT) USING parquet")
    spark.sql("CREATE TABLE anz_tiny(k INT) USING parquet")
    spark.sql("INSERT INTO anz_big SELECT CAST(id % 100 AS INT), repeat('x', 50) FROM range(20000)")
    spark.sql("INSERT INTO anz_mid SELECT CAST(id AS INT) FROM range(2000)")
    spark.sql("INSERT INTO anz_tiny SELECT CAST(id AS INT) FROM range(3)")
    try {
      exec("ANALYZE anz_big"); exec("ANALYZE anz_mid"); exec("ANALYZE anz_tiny")
      // written join order puts the two big relations together first;
      // stats-driven reorder should join big⋈tiny before big⋈mid
      val df = spark.sql(
        """SELECT count(*) FROM anz_big b
          |JOIN anz_mid m ON b.k = m.k
          |JOIN anz_tiny t ON b.k = t.k""".stripMargin)
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
      assert(joins.nonEmpty)
      def tablesOf(p: LogicalPlan): Set[String] =
        p.collectLeaves().flatMap(l => Seq("anz_big", "anz_mid", "anz_tiny")
          .filter(l.toString.contains)).toSet
      // innermost join = last in collect order; it must pair anz_big
      // with anz_tiny (the stats-cheapest pair), not the written order
      val innermost = joins.last
      val inner = tablesOf(innermost.left) ++ tablesOf(innermost.right)
      assert(inner == Set("anz_big", "anz_tiny"),
        s"expected stats-driven (big, tiny) innermost, got $inner\n" +
          df.queryExecution.optimizedPlan)
    } finally
      for (t <- Seq("anz_big", "anz_mid", "anz_tiny"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
