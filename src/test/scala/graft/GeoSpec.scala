package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Geo

/** Brute-force oracle for the planar ST_* surface: the Spark-side HOF
  * implementations must agree with direct Scala computations on a grid
  * of points / generated rings, including the non-convex ray-cast.
  */
class GeoSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import spark.implicits._

  private val ring: Seq[(Double, Double)] =
    Seq((0.0, 0.0), (60.0, 0.0), (60.0, 40.0), (30.0, 40.0), (30.0, 80.0), (0.0, 80.0), (0.0, 0.0))

  private def refContains(px: Double, py: Double): Boolean = {
    var crossings = 0
    ring.sliding(2).foreach { case Seq((xi, yi), (xj, yj)) =>
      if ((yi > py) != (yj > py) && px < (xj - xi) * (py - yi) / (yj - yi) + xi)
        crossings += 1
    }
    crossings % 2 == 1
  }

  test("stContains matches a scala ray-cast on a 2d grid incl. the concave notch") {
    val pts = for (x <- -5 to 70 by 3; y <- -5 to 90 by 4) yield (x.toDouble, y.toDouble)
    val df = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Geo.stContains(Geo.ringLit(ring), Geo.stPoint(col("x"), col("y"))).as("c"))
    val got = df.collect().map(r => ((r.getDouble(0), r.getDouble(1)), r.getBoolean(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == refContains(x, y), s"($x,$y)")
    }
    // spot-check the notch (grid points): (46, 59) is outside the L's
    // cut-out corner, (16, 59) inside the upright arm
    assert(!refContains(46, 59) && got((46.0, 59.0)) == false)
    assert(refContains(16, 59) && got((16.0, 59.0)) == true)
  }

  test("stArea/stPerimeter/stCentroid match closed forms on random right triangles") {
    val rows = (1 to 50).map { k => (k, (1 + k % 11).toDouble, (1 + k % 6).toDouble) }
    val df = rows.toDF("k", "x", "y")
    val tri = array(Geo.stPoint(lit(0.0), lit(0.0)), Geo.stPoint(col("x"), lit(0.0)),
      Geo.stPoint(col("x"), col("y")), Geo.stPoint(lit(0.0), lit(0.0)))
    val out = df.select(col("x"), col("y"), Geo.stArea(tri).as("a"),
        Geo.stPerimeter(tri).as("p"),
        Geo.stX(Geo.stCentroid(tri)).as("cx"), Geo.stY(Geo.stCentroid(tri)).as("cy"))
      .collect()
    out.foreach { r =>
      val (x, y) = (r.getDouble(0), r.getDouble(1))
      assert(r.getDouble(2) == x * y / 2)
      assert(r.getDouble(3) == x + y + math.sqrt(x * x + y * y))
      assert(r.getDouble(4) == 2 * x / 3)
      assert(r.getDouble(5) == y / 3)
    }
  }

  test("WKT round-trips through parse + emit") {
    val df = Seq("POINT (3.5 -2.0)", "POINT(10 4)").toDF("wkt")
    val out = df.select(Geo.stAsText(Geo.stPointFromText(col("wkt"))).as("o"))
      .as[String].collect()
    assert(out.sameElements(Array("POINT (3.5 -2.0)", "POINT (10.0 4.0)")))
  }
}
