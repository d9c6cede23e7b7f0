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
}
