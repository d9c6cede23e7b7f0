package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Holistic
import graft.functions.Holistic.Pt

class HolisticSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark

  test("lttb keeps endpoints, length n, x-monotone selection") {
    val pts = (0 until 200).map(i => Pt(i, math.sin(i / 7.0) * 10)).toIndexedSeq
    val out = Holistic.lttbSelect(pts, 20)
    assert(out.length == 20)
    assert(out.head == pts.head && out.last == pts.last)
    assert(out.map(_.x) == out.map(_.x).sorted)
  }

  test("lttb keeps an outlier spike (largest triangle wins its bucket)") {
    val pts = (0 until 100).map(i =>
      Pt(i, if (i == 55) 1000.0 else 1.0)).toIndexedSeq
    val out = Holistic.lttbSelect(pts, 10)
    assert(out.exists(_.y == 1000.0), s"spike dropped: $out")
  }

  test("lttb returns everything when the series fits") {
    val pts = (0 until 5).map(i => Pt(i, i * 2.0)).toIndexedSeq
    assert(Holistic.lttbSelect(pts, 10) == pts)
  }

  test("lttb aggregator over a grouped frame sorts by x before selecting") {
    import spark.implicits._
    // feed x out of order; the aggregate must still pick endpoints 0 and 99
    val df = scala.util.Random.shuffle((0 until 100).toList)
      .map(i => (1L, i.toDouble, (i % 13).toDouble)).toDF("g", "x", "y")
    val out = df.groupBy("g")
      .agg(Holistic.lttb(8)(col("x"), col("y")).as("pts"))
      .selectExpr("inline(pts)")
      .collect().map(_.getDouble(0))
    assert(out.length == 8 && out.head == 0.0 && out.last == 99.0)
    assert(out.toSeq == out.sorted.toSeq)
  }

  test("reservoir quantile is exact when the reservoir holds everything") {
    import spark.implicits._
    val df = (1 to 50).map(_.toDouble).toDF("v").repartition(7)
    val rq = Holistic.reservoirQuantile(0.5, 100)
    val out = df.agg(rq(col("v"))).collect().head.getDouble(0)
    // discrete lower median of 1..50 = element at floor(0.5*49) = 25
    assert(out == 25.0)
  }

  test("reservoir quantile approximates the median within tolerance") {
    import spark.implicits._
    val df = (1 to 10000).map(_.toDouble).toDF("v").repartition(16)
    val rq = Holistic.reservoirQuantile(0.5, 256)
    val out = df.agg(rq(col("v"))).collect().head.getDouble(0)
    assert(math.abs(out - 5000.0) < 1500.0, s"median estimate too far: $out")
  }

  // --- SQL-name group aggregates over the ListAggr kernels (r9) -------

  test("histogram / binned histogram SQL aggregates") {
    val m = spark.sql(
      "SELECT histogram(v) FROM VALUES (1), (2), (2), (3) t(v)")
      .collect().head.getMap[Int, Long](0)
    assert(m == Map(1 -> 1L, 2 -> 2L, 3 -> 1L))
    val b = spark.sql(
      "SELECT histogram(v, array(10, 20)) FROM VALUES (1), (11), (25) t(v)")
      .collect().head.getMap[Int, Long](0)
    assert(b == Map(10 -> 1L, 20 -> 1L, Int.MaxValue -> 1L))
    // NULL bin entries are the reference's runtime error
    intercept[Exception] {
      spark.sql("SELECT histogram(v, array(10, NULL)) FROM VALUES (1) t(v)")
        .collect()
    }
  }

  test("mad / entropy / product / sem SQL aggregates") {
    val r = spark.sql(
      "SELECT mad(v), entropy(v), product(v), sem(v) " +
        "FROM VALUES (1.0D), (2.0D), (3.0D), (4.0D) t(v)").collect().head
    assert(r.getDouble(0) == 1.0) // median 2.5, |devs| {1.5,0.5,0.5,1.5}
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-12) // 4 equal frequencies
    assert(r.getDouble(2) == 24.0)
    // sem is population-based: sqrt(var_pop/n)
    assert(math.abs(r.getDouble(3) - math.sqrt(1.25) / 2.0) < 1e-12)
    // empty input: entropy 0, the others NULL
    val e = spark.sql(
      "SELECT entropy(v), mad(v) FROM VALUES (CAST(NULL AS DOUBLE)) t(v)")
      .collect().head
    assert(e.getDouble(0) == 0.0 && e.isNullAt(1))
  }

  test("quantile family maps to exact percentiles") {
    val q = spark.sql(
      "SELECT quantile_cont(v, 0.5), quantile_disc(v, 0.5), quantile(v, 0.5) " +
        "FROM VALUES (1), (2), (3), (4) t(v)").collect().head
    assert(q.getDouble(0) == 2.5)
    assert(q.getDouble(1) == 2.0 && q.getDouble(2) == 2.0)
  }

  test("time_bucket buckets on the reference origins") {
    val r = spark.sql(
      "SELECT time_bucket(INTERVAL '10' DAY, DATE '2024-03-15'), " +
        "time_bucket(INTERVAL '2' MONTH, DATE '2024-03-15'), " +
        "time_bucket(INTERVAL '1' HOUR, TIMESTAMP '2024-03-15 13:47:11')")
      .collect().head
    // micros axis anchored at 2000-01-03; month axis at 2000-01-01
    assert(r.getDate(0).toString == "2024-03-07")
    assert(r.getDate(1).toString == "2024-03-01")
    assert(r.getTimestamp(2).toString == "2024-03-15 13:00:00.0")
  }
}
