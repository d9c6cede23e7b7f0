package graft

import org.scalatest.funsuite.AnyFunSuite

/** Out-of-core correctness — the Spark analogue of the reference's
  * `debug_force_external` tests (BASELINE.md: external hash join /
  * external sort exercised under forced spill;
  * `/root/reference/test/sql/join/inner/test_join.test`): drive the
  * spill thresholds of the window buffer, sort-merge join buffer, and
  * in-memory sorter down to a few rows, re-run real queries, and demand
  * bit-identical results. At 100 TB these paths are not an edge case —
  * a partition that outgrows executor memory MUST take them.
  */
class SpillSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark

  private val spillConfs = Seq(
    "spark.sql.windowExec.buffer.spill.threshold" -> "64",
    "spark.sql.windowExec.buffer.in.memory.threshold" -> "64",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "64",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "64",
    "spark.sql.cartesianProductExec.buffer.spill.threshold" -> "64",
    // object-hash aggregates (collect_list/sorted-agg kernels) fall back
    // to the sort-based external path after 1 in-memory row
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "1")

  private def withForcedSpill[A](body: => A): A = {
    val saved = spillConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    spillConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def rowsOf(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, GraftTest.sf)
      .collect().map(_.toString).sorted.toSeq

  test("window aggregates are identical under forced buffer spill") {
    val expected = rowsOf("q_window_running")
    val spilled = withForcedSpill { rowsOf("q_window_running") }
    assert(spilled == expected)
    assert(expected.nonEmpty)
  }

  test("joins and ranking windows survive forced spill unchanged") {
    for (name <- Seq("q_join_inner", "q_window_ranking", "q_join_asof")) {
      val expected = rowsOf(name)
      val spilled = withForcedSpill { rowsOf(name) }
      assert(spilled == expected, s"$name diverged under forced spill")
    }
  }

  test("custom operator kernels are identical under forced external sort") {
    // the CUSTOM operators: two-heap running median/quantile, the banded
    // range-join sweep, IEJoin, and the chunked partition-less window —
    // every sort/shuffle feeding their mapPartitions kernels is forced
    // external (reference analogue: debug_force_external,
    // test/sql/join/inner/test_join.test:5-6)
    for (name <- Seq("q_window_median_unbounded", "q_window_quantile_unbounded",
        "q_join_range", "q_join_iejoin", "q_window_global")) {
      val expected = rowsOf(name)
      val spilled = withForcedSpill { rowsOf(name) }
      assert(spilled == expected, s"$name diverged under forced spill")
      assert(expected.nonEmpty, s"$name returned no rows")
    }
  }
}
