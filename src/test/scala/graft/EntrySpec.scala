package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has either an oracle or is intentionally rows-only") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs))
    val rowsOnly = qs -- os
    // approximate / nondeterministic / custom-expression ops only
    assert(rowsOnly.forall(n =>
      n.contains("approx") || n.contains("sample") || n.contains("simhash") ||
        n.contains("lsh") || n.contains("embedding") || n.contains("multimodal") ||
        n.contains("lttb") || n.contains("reservoir") || n.contains("ivf")),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("all queries run at sf0.001 and return rows") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        if (fn(spark, GraftTest.sf).count() >= 0) None else Some(name)
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
