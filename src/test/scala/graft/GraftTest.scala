package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared by every suite (same JVM, sequential). */
object GraftTest {
  lazy val spark: SparkSession = {
    val s = graft.engine.EngineSession.create("local[4]")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
